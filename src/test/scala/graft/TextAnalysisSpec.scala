package graft

import graft.operators.TextAnalysis
import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def deflateLen(s: String): Long = {
    val d = new java.util.zip.Deflater()
    d.setInput(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.finish()
    val buf = new Array[Byte](8192)
    var n = 0L
    while (!d.finished()) n += d.deflate(buf)
    d.end()
    n
  }

  test("compressionRatio matches a direct Deflater fold exactly") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog and keeps on running",
      2L -> ("spam " * 200).trim, // highly repetitive
      3L -> (1 to 120).map(i => (i * 2654435761L % 977).toString).mkString(" "),
      4L -> "")
    val got = texts.toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(got, "doc_id", "text")
      .orderBy("doc_id").collect()
    texts.zip(out).foreach { case ((id, t), row) =>
      val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong
      val comp = deflateLen(t)
      assert(row.getLong(0) == id)
      assert(row.getLong(1) == raw, s"raw bytes for doc $id")
      assert(row.getLong(2) == comp, s"deflate bytes for doc $id")
      val ratio = if (raw == 0) 1.0 else math.rint(comp.toDouble / raw * 1e6) / 1e6
      assert(row.getDouble(3) == ratio, s"ratio for doc $id")
    }
    // the repetitiveness signal orders as expected
    val byId = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byId(2L) < byId(1L) && byId(1L) < 1.0)
  }

  test("tfIdfTopTerms: hand-computed scores, tie-break by term, global df") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a", "apple banana APPLE"),
      (2L, "a", "banana cherry"),
      (3L, "b", "apple dog")
    ).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", "lang", k = 2)
      .orderBy("lang", "rank").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getInt(3)))
    def sc(tf: Long, df: Long) = math.rint(tf * math.log(3.0 / df) * 1e6) / 1e6
    // lang a: cherry tf1 df1 = ln3; apple tf2 df2 ties banana tf2 df2 → term asc
    // lang b: dog tf1 df1 = ln3; apple tf1 df2 (df is GLOBAL: doc 1 has it too)
    assert(got.toSeq == Seq(
      ("a", "cherry", sc(1, 1), 1),
      ("a", "apple", sc(2, 2), 2),
      ("b", "dog", sc(1, 1), 1),
      ("b", "apple", sc(1, 2), 2)))
  }

  test("bpeTrain: deterministic merges with count-desc, pair-asc tie-break") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    // word freqs: aa×2 → [a,a,</w>], ab×1 → [a,b,</w>]
    // r1: (a,</w>)=2 ties (a,a)=2, "</w>" < "a" → merge (a,</w>)
    // r2: (a,a</w>)=2 wins → merge; r3: (a,b)=1 beats (b,</w>)=1 by pair asc
    val got = graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = 3)
    assert(got == Seq(
      (0, "a", "</w>", 2L), (1, "a", "a</w>", 2L), (2, "a", "b", 1L)))
    // loop stops early once nothing is left to merge
    assert(graft.operators.TextAnalysis.bpeTrain(docs, "text", merges = 50).length <= 5)
  }

  test("bpeSegment applies trained merges in rank order, handles unseen words") {
    val s = spark
    import s.implicits._
    val train = Seq((1L, "aa aa ab")).toDF("doc_id", "text")
    val merges = graft.operators.TextAnalysis.bpeTrain(train, "text", merges = 3)
    // merges: (a,</w>) → a</w>; (a,a</w>) → aa</w>; (a,b) → ab
    val out = graft.operators.TextAnalysis.bpeSegment(
        Seq((1L, "aa ab ba"), (2L, "aaa")).toDF("doc_id", "text"), "doc_id", "text", merges)
      .orderBy("doc_id").collect()
    // "aa" → [aa</w>]; "ab" → [ab,</w>]; "ba" (unseen shape) → [b,a</w>]
    assert(out(0).getSeq[String](1) == Seq("aa</w>", "ab", "</w>", "b", "a</w>"))
    assert(out(0).getInt(2) == 5)
    // "aaa" → chars a,a,a,</w> → r1: a,a,a</w> → r2 (a,a</w>): a,aa</w>
    assert(out(1).getSeq[String](1) == Seq("a", "aa</w>"))
  }

  test("bpeTrain minFreq/maxVocab bound the driver dictionary deterministically") {
    val s = spark
    import s.implicits._
    // Pathological high-cardinality tail: 50 distinct singleton "words"
    // (hash-like junk) around a real repeated vocabulary.
    val junk = (0 until 50).map(i => f"zz$i%02d").mkString(" ")
    val dirty = Seq((1L, s"aa aa ab $junk")).toDF("doc_id", "text")
    val clean = Seq((1L, "aa aa")).toDF("doc_id", "text")
    // minFreq=2 drops every singleton (junk AND ab): training must equal
    // training on the clean repeated-words-only corpus.
    assert(TextAnalysis.bpeTrain(dirty, "text", merges = 3, minFreq = 2L) ==
      TextAnalysis.bpeTrain(clean, "text", merges = 3))
    // maxVocab=1 keeps only the (count desc, word asc) top word — the
    // collect is capped at one row no matter how wide the junk tail is.
    assert(TextAnalysis.bpeTrain(dirty, "text", merges = 3, maxVocab = 1) ==
      TextAnalysis.bpeTrain(clean, "text", merges = 3))
    // Defaults leave the fixture's behavior untouched (cap ≫ vocabulary).
    assert(TextAnalysis.bpeTrain(dirty, "text", merges = 1) ==
      Seq((0, "z", "z", 50L)))
  }

  test("bpeSegment rejects null/non-numeric ids with a clear error") {
    val s = spark
    import s.implicits._
    val merges = TextAnalysis.bpeTrain(Seq((1L, "aa aa")).toDF("doc_id", "text"), "text", 1)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val badNull = s.createDataFrame(
      java.util.Arrays.asList(Row(1L, "aa"), Row(null, "ab")),
      StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))
    val e1 = intercept[Exception] {
      TextAnalysis.bpeSegment(badNull, "doc_id", "text", merges).collect()
    }
    assert(e1.getMessage.contains("bpeSegment"))
    val badStr = Seq(("not-a-number", "aa")).toDF("doc_id", "text")
    val e2 = intercept[Exception] {
      TextAnalysis.bpeSegment(badStr, "doc_id", "text", merges).collect()
    }
    assert(e2.getMessage.contains("bpeSegment"))
  }

  test("buildVocab ranks by count desc then token asc; encodeIds maps OOV to 0") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "b b b a a c"),
      (2L, "a c d x")
    ).toDF("doc_id", "text")
    val vocab = TextAnalysis.buildVocab(docs, "text", size = 3)
      .orderBy("id").collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    // counts: a=3 b=3 c=2 d=1 x=1 → ties broken token-asc, top-3 cut
    assert(vocab.toSeq == Seq(("a", 1, 3L), ("b", 2, 3L), ("c", 3, 2L)))
    val enc = TextAnalysis.encodeIds(docs, "doc_id", "text",
        TextAnalysis.buildVocab(docs, "text", size = 3))
      .orderBy("doc_id").collect()
    assert(enc(0).getSeq[Int](1) == Seq(2, 2, 2, 1, 1, 3))
    assert(enc(0).getLong(2) == 6 && enc(0).getLong(3) == 0)
    assert(enc(1).getSeq[Int](1) == Seq(1, 3, 0, 0)) // d, x are OOV
    assert(enc(1).getLong(2) == 4 && enc(1).getLong(3) == 2)
  }

  // Driver-side robust-winnowing model: same polynomial gram hash, same
  // rightmost-min selection — an independent oracle for the HOF pipeline.
  private def winnowModel(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    if (text.length < k) return Set.empty
    val hs = (0 to text.length - k).map { p =>
      text.substring(p, p + k).foldLeft(0L)((a, c) => (a * 257 + c.toLong) % 1000000007L)
    }
    val we = math.min(w, hs.length)
    (0 to hs.length - we).flatMap { i =>
      val win = hs.slice(i, i + we)
      val mn = win.min
      val j = win.lastIndexOf(mn)
      Some((i + j + 1, mn)) // 1-based char pos of the selected gram
    }.toSet
  }

  test("winnow matches the driver model on random text (fuzz) and edge lengths") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13L)
    val alphabet = "abcdef gh"
    def randText(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // lengths straddling every edge: < k, == k, < k+w-1, long
    val docs = (Seq(3, 8, 9, 10, 11, 40) ++ Seq.fill(20)(30 + rnd.nextInt(200)))
      .zipWithIndex.map { case (n, i) => (i.toLong, randText(n)) }
    val got = TextAnalysis.winnow(docs.toDF("doc_id", "text"), "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      val exp = winnowModel(text, 8, 4)
      assert(got.getOrElse(id, Set.empty) == exp, s"doc $id (len ${text.length})")
    }
  }

  test("winnow: code-point semantics on non-ASCII text (incl. supplementary chars)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(29L)
    val cps = "aé中𝄞 bß".codePoints().toArray
    def randText(n: Int) = {
      val sb = new StringBuilder
      (0 until n).foreach(_ => sb.appendAll(Character.toChars(cps(rnd.nextInt(cps.length)))))
      sb.toString
    }
    def model(text: String, k: Int, w: Int): Set[(Int, Long)] = {
      val cp = text.codePoints().toArray
      if (cp.length < k) return Set.empty
      val hs = (0 to cp.length - k).map(p =>
        (0 until k).foldLeft(0L)((a, i) => (a * 257 + cp(p + i)) % 1000000007L))
      val we = math.min(w, hs.length)
      (0 to hs.length - we).map { i =>
        val win = hs.slice(i, i + we)
        (i + win.lastIndexOf(win.min) + 1, win.min)
      }.toSet
    }
    val docs = (Seq(5, 8, 12) ++ Seq.fill(10)(20 + rnd.nextInt(150)))
      .zipWithIndex.map { case (n, i) => (i.toLong, randText(n)) }
    val got = TextAnalysis.winnow(docs.toDF("doc_id", "text"), "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getLong(2))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docs.foreach { case (id, text) =>
      assert(got.getOrElse(id, Set.empty) == model(text, 8, 4), s"doc $id")
    }
  }

  test("winnow guarantee: docs sharing >= w+k-1 chars share a fingerprint") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(17L)
    val alphabet = "abcdefghij klmno"
    def randText(n: Int) = (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    // plant an 11-char (= w+k-1 for k=8,w=4) common substring in distinct noise
    val shared = "the same 11"
    assert(shared.length == 11)
    val docs = (0 until 10).map { i =>
      val pre = randText(20 + rnd.nextInt(30))
      val post = randText(20 + rnd.nextInt(30))
      (i.toLong, pre + shared + post)
    }
    val fps = TextAnalysis.winnow(docs.toDF("doc_id", "text"), "doc_id", "text", k = 8, w = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (a <- 0 until 10; b <- (a + 1) until 10) {
      assert((fps(a.toLong) & fps(b.toLong)).nonEmpty,
        s"docs $a and $b share an 11-char substring but no fingerprint")
    }
    // density sanity: winnowing keeps roughly 2/(w+1) of gram positions
    val doc0Len = docs.head._2.length
    val density = fps(0L).size.toDouble / (doc0Len - 7)
    assert(density < 0.8, s"winnowing should be sparse, got density $density")
  }

  test("fused document-at-a-time bm25TopK equals the postings-join reference") {
    val s = spark
    import s.implicits._
    // adversarial: multi-term overlaps, tab/newline whitespace, null and
    // empty texts, a query term absent from the corpus, score ties
    // (docs 7/8 identical), unicode case folding
    val corpus = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana\tcherry  cherry"),
      (3L, "cherry cherry cherry cherry"),
      (4L, ""),
      (5L, null: String),
      (6L, "CAFÉ apple\nbanana"),
      (7L, "apple banana"),
      (8L, "apple banana")).toDF("doc_id", "text")
    val queries = Seq(
      (10L, "apple cherry zebra"),
      (11L, "banana café"),
      (12L, "zebra")).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))
    val fused = graft.operators.TextAnalysis.bm25TopK(
      corpus, queries, "doc_id", "text", "doc_id", "text", topK = 3)
      .orderBy("q_id", "rank").collect().map(key).toSeq
    val ref = graft.operators.TextAnalysis.bm25TopKViaPostings(
      corpus, queries, "doc_id", "text", "doc_id", "text", topK = 3)
      .orderBy("q_id", "rank").collect().map(key).toSeq
    assert(fused == ref)
    assert(fused.nonEmpty)
    // tie-break pinned: identical docs 7/8 rank adjacently, lower id first
    val q11 = fused.filter(_._1 == 11L)
    val i7 = q11.indexWhere(_._3 == 7L)
    assert(i7 >= 0 && i7 + 1 < q11.length && q11(i7 + 1)._3 == 8L)
  }

  test("bm25TopK: oversized query sets fall back to postings with equal results; non-positive cap refused") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      1L -> "apple banana apple cherry",
      2L -> "banana cherry cherry",
      3L -> "cherry zebra apple").toDF("doc_id", "text")
    val queries = Seq(
      10L -> "apple cherry zebra",
      11L -> "banana apple").toDF("doc_id", "text")
    def run() = graft.operators.TextAnalysis.bm25TopK(
        corpus, queries, "doc_id", "text", "doc_id", "text", topK = 2)
      .orderBy("q_id", "rank")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq
    val fused = run() // default cap: the fused document-at-a-time scorer
    val conf = spark.conf
    try {
      conf.set("graft.bm25.maxQueryTerms", "2") // 5 (q, term) rows > 2
      assert(run() == fused) // the postings fallback is result-identical
      conf.set("graft.bm25.maxQueryTerms", "0")
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains("graft.bm25.maxQueryTerms"))
    } finally conf.unset("graft.bm25.maxQueryTerms")
  }

  test("bm25TopK matches an independent scalar BM25 model, ranks and rounds alike") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val corpus = Seq(
      1L -> "apple banana apple",
      2L -> "banana cherry",
      3L -> "cherry cherry cherry cherry").toDF("doc_id", "text")
    val queries = Seq(10L -> "apple cherry", 11L -> "banana").toDF("doc_id", "text")
    val out = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text", "doc_id", "text",
      topK = 2).orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))

    // independent model: same formula, per-term 6dp rounding before the sum
    val docs = Map(1L -> Seq("apple", "banana", "apple"),
      2L -> Seq("banana", "cherry"), 3L -> Seq("cherry", "cherry", "cherry", "cherry"))
    val n = docs.size
    val avgdl = docs.values.map(_.size).sum.toDouble / n
    def df(t: String) = docs.values.count(_.contains(t))
    def score(q: Seq[String], d: Seq[String]): Double =
      q.distinct.map { t =>
        val tf = d.count(_ == t)
        if (tf == 0) BigDecimal(0)
        else {
          val idf = math.log(1.0 + (n - df(t) + 0.5) / (df(t) + 0.5))
          val tfn = tf * (1.2 + 1) / (tf + 1.2 * (1 - 0.75 + 0.75 * d.size / avgdl))
          BigDecimal(idf * tfn).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        }
      }.sum.toDouble
    val want = Seq(10L -> Seq("apple", "cherry"), 11L -> Seq("banana")).flatMap {
      case (qid, q) =>
        docs.toSeq.map { case (d, toks) => (d, score(q, toks)) }
          .filter(_._2 > 0)
          .sortBy { case (d, sc) => (-sc, d) }.take(2).zipWithIndex
          .map { case ((d, sc), i) => (qid, i + 1, d, sc) }
    }
    assert(out.toSeq == want)
  }

  test("fused postings equal the declarative explode+shuffle form, and are exchange-free") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{col, count, lit, lower, size, sum}
    // adversarial whitespace/case/unicode: tabs, newlines, runs of spaces,
    // trailing blanks (split limit -1 semantics), empty and null text,
    // repeated terms, non-ASCII uppercase
    val corpus = Seq(
      (1L, "Apple banana APPLE"),
      (2L, "  leading and\ttab\nnewline trailing  "),
      (3L, "\u00c9L\u00c9PHANT caf\u00e9 CAF\u00c9"),
      (4L, ""),
      (5L, null: String),
      (6L, "x x x  y\t\ty")
    ).toDF("doc_id", "text")
    val sel = corpus.select(col("doc_id").cast("long").as("_id"),
      TextAnalysis.tokens(lower(col("text"))).as("_w"))
    val exp = TextAnalysis.bm25Posts(sel)
      .as[(Long, Int, String, Long)].collect().toSet
    val fused = TextAnalysis.bm25PostsFused(corpus, "doc_id", "text")
    val got = fused.where(col("term").isNotNull)
      .as[(Long, Int, String, Long)].collect().toSet
    assert(got == exp)
    // stats sentinels reproduce the old second-scan aggregate exactly,
    // including the null-text row (counted in _n, null _dl skipped by sum)
    val expStats = sel.agg(count(lit(1)), sum(size(col("_w")))).head()
    val gotStats = fused.where(col("term").isNull)
      .agg(count(lit(1)), sum(col("_dl"))).head()
    assert(gotStats == expStats)
    // the postings side must be shuffle-free: tf is intra-document state
    val plan = fused.where(col("term").isNotNull)
      .queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    assert(nEx <= 1 && (nEx == 0 || plan.contains("REPARTITION")),
      s"postings must not shuffle (fanOut repartition is the only allowed exchange):\n$plan")
  }
}

