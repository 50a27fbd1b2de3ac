package graft

import graft.operators.{Bucketing, Checks, Curation}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CurationSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("qualityFlags: each rule trips independently and keep is their AND") {
    // 25 words, all distinct: 20× 5-char + 5 stopwords → mwl 4.4, stop 0.2
    val good = ((1 to 20).map(i => f"wrd$i%02d") ++ Seq("the", "a", "of", "is", "in")).mkString(" ")
    val out = Curation.qualityFlags(
      docs(
        1L -> good,                                   // passes all rules
        2L -> "too short",                            // fails flag_len (2 words)
        3L -> Seq.fill(4)(good).mkString(" "),        // fails flag_len (100 words)
        4L -> Seq.fill(40)("ab the").mkString(" "),   // mwl 2.5 → fails flag_word_len
        5L -> Seq.fill(20)("quick brown alpha").map(w => w).mkString(" "), // no stopwords
        6L -> ("the " + Seq.fill(39)("spam").mkString(" "))), // distinct 3/40 → repetition
      "doc_id", "text").orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).getAs[Int]("keep") == 1)
    assert(byId(2L).getAs[Int]("flag_len") == 0 && byId(2L).getAs[Int]("keep") == 0)
    assert(byId(3L).getAs[Int]("flag_len") == 0)
    assert(byId(4L).getAs[Int]("flag_word_len") == 0)
    assert(byId(5L).getAs[Int]("flag_stopword") == 0)
    assert(byId(6L).getAs[Int]("flag_repetition") == 0)
  }

  test("repetitionStats: hand-computed fractions") {
    val out = Curation.repetitionStats(
      docs(1L -> "a a a b", 2L -> "x y z w"), "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 4 && out(0).getLong(2) == 2)
    assert(out(0).getDouble(3) == 0.5 && out(0).getDouble(4) == 0.75)
    assert(out(1).getDouble(3) == 1.0 && out(1).getDouble(4) == 0.25)
  }

  test("dupNgramStats: hand-computed duplicate fractions, short-doc nulls") {
    val out = Curation.dupNgramStats(
      docs(
        1L -> "a b a b a",  // bigrams all repeat; "a b a" twice of 3; 4-grams distinct
        2L -> "p q r s t",  // nothing repeats
        3L -> "x y"),       // only one bigram; no tri/quad grams
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getDouble(1) == 1.0)
    assert(out(0).getDouble(2) == 0.666667)
    assert(out(0).getDouble(3) == 0.0)
    assert(out(1).getDouble(1) == 0.0 && out(1).getDouble(2) == 0.0 && out(1).getDouble(3) == 0.0)
    assert(out(2).getDouble(1) == 0.0 && out(2).isNullAt(2) && out(2).isNullAt(3))
  }

  test("dupNgramStats: fused pass equals the declarative model (both gram paths)") {
    val corpus = docs(
      1L -> "the quick brown fox jumps over the quick brown fox again and again",
      2L -> "alpha beta gamma alpha beta gamma alpha beta delta",
      3L -> "one two three four five six seven eight nine ten",
      4L -> "  tab\tand\nnewline  splits  like spaces tab\tand\nnewline  ",
      5L -> "solo")
    val fused = Curation.dupNgramStats(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val model = Curation.dupNgramStatsModel(corpus, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val hashed = Curation.dupNgramStatsModel(corpus, "doc_id", "text", hashGrams = true)
      .orderBy("doc_id").collect().toSeq
    assert(fused == model)
    assert(fused == hashed)
    // zero exchanges: repetition state never leaves its partition
    val plan = Curation.dupNgramStats(corpus, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    assert(nEx <= 1 && (nEx == 0 || plan.contains("REPARTITION")), plan)
  }

  // independent model of cdcChunks' boundary rule, for differential checks
  private def cdcModel(text: String, k: Int, divisor: Int): Seq[(Int, Int)] = {
    def hashAt(p: Int): Long =
      (0 until k).foldLeft(0L)((acc, i) => (acc * 257 + text.charAt(p - 1 + i).toInt) % 1000000007L)
    val cuts = (2 to text.length - k + 1).filter(p => hashAt(p) % divisor == 0)
    val starts = 1 +: cuts
    starts.zipWithIndex.map { case (s, i) =>
      val next = if (i + 1 < starts.length) starts(i + 1) else text.length + 1
      (s, next - s)
    }
  }

  test("cdcChunks: chunks partition each doc and match an independent model") {
    val rnd = new scala.util.Random(11)
    val words = Seq("spark", "merge", "table", "join", "scan", "row", "agg", "key")
    val corpus = (1L to 5L).map(i =>
      i -> Seq.fill(60)(words(rnd.nextInt(words.length))).mkString(" "))
    val out = Curation.cdcChunks(docs(corpus: _*), "doc_id", "text", k = 8, divisor = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    val byDoc = out.groupBy(_.getLong(0))
    corpus.foreach { case (id, text) =>
      val got = byDoc(id).map(r => (r.getInt(2), r.getInt(3)))
      assert(got.toSeq == cdcModel(text, 8, 16), s"doc $id boundary mismatch")
      // chunks tile the doc: contiguous, full-cover, md5s match the slices
      assert(got.map(_._2).sum == text.length)
      byDoc(id).foreach { r =>
        val slice = text.substring(r.getInt(2) - 1, r.getInt(2) - 1 + r.getInt(3))
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(slice.getBytes("UTF-8")).map("%02x".format(_)).mkString
        assert(r.getString(4) == md)
      }
    }
  }

  test("stripHtml: blocks, tags, entity order, double-escaping, malformed nesting") {
    val cases = Seq(
      1L -> "<p>plain</p>",
      2L -> "<script>if (a<b) alert('x')</script>keep",     // inner < inside script
      3L -> "A&amp;B and &amp;lt; stays escaped",           // double-escaped entity
      4L -> "<style>p{}</style><!-- gone -->1&nbsp;2 &quot;q&quot; &#39;a&#39;",
      5L -> "<div><p>no closing order</div></p>tail",       // malformed nesting
      6L -> "x &lt;not-a-tag&gt; y")
    val got = Curation.stripHtml(docs(cases: _*), "text", "clean")
      .orderBy("doc_id").collect().map(_.getAs[String]("clean")).toSeq
    assert(got == Seq(
      "plain",
      "keep",
      "A&B and &lt; stays escaped",
      "1 2 \"q\" 'a'",
      "no closing order tail",
      "x <not-a-tag> y"))
  }

  test("corpusDiff: status per id, formatting-only edits are unchanged") {
    val old = docs(1L -> "Hello, World!", 2L -> "stays put", 3L -> "will vanish")
    val neu = docs(1L -> "hello   world", 2L -> "stays put edited", 4L -> "brand new")
    val got = Curation.corpusDiff(old, neu, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toSeq
    // doc 1: punctuation/case/whitespace differences normalize away
    assert(got == Seq(1L -> "unchanged", 2L -> "modified", 3L -> "removed", 4L -> "added"))
  }

  test("cdcChunks: code-point semantics on non-ASCII text (incl. supplementary chars)") {
    // `substr`/`ascii`/`length` count CODE POINTS; 𝄞 (U+1D11E) is two Java
    // chars but ONE unit everywhere in the operator's contract.
    val rnd = new scala.util.Random(23)
    val alphabet = "aé中𝄞 bß"
    def randText(n: Int) = {
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        val cps = alphabet.codePoints().toArray
        sb.appendAll(Character.toChars(cps(rnd.nextInt(cps.length))))
      }
      sb.toString
    }
    val corpus = (1L to 6L).map(i => i -> randText(40 + rnd.nextInt(120)))
    def model(text: String, k: Int, divisor: Int): Seq[(Int, Int, String)] = {
      val cp = text.codePoints().toArray
      def hashAt(p: Int): Long = // 1-based code-point position
        (0 until k).foldLeft(0L)((acc, i) => (acc * 257 + cp(p - 1 + i)) % 1000000007L)
      val cuts = (2 to cp.length - k + 1).filter(p => hashAt(p) % divisor == 0)
      val starts = 1 +: cuts
      starts.zipWithIndex.map { case (s, i) =>
        val next = if (i + 1 < starts.length) starts(i + 1) else cp.length + 1
        val chunk = new String(cp, s - 1, next - s)
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(chunk.getBytes("UTF-8")).map("%02x".format(_)).mkString
        (s, next - s, md)
      }
    }
    val out = Curation.cdcChunks(docs(corpus: _*), "doc_id", "text", k = 6, divisor = 8)
      .orderBy("doc_id", "chunk_idx").collect().groupBy(_.getLong(0))
    corpus.foreach { case (id, text) =>
      val got = out(id).map(r => (r.getInt(2), r.getInt(3), r.getString(4))).toSeq
      assert(got == model(text, 6, 8), s"doc $id")
    }
  }

  test("cdcChunks: content-defined boundaries survive a prefix insertion") {
    val rnd = new scala.util.Random(13)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val base = Seq.fill(120)(words(rnd.nextInt(words.length))).mkString(" ")
    val shifted = "breaking news paragraph inserted up top " + base
    val out = Curation.cdcChunks(
      docs(1L -> base, 2L -> shifted), "doc_id", "text", k = 8, divisor = 16)
      .collect()
    val h1 = out.filter(_.getLong(0) == 1L).map(_.getString(4)).toSet
    val h2 = out.filter(_.getLong(0) == 2L).map(_.getString(4)).toSet
    // a fixed-offset chunker shares ZERO chunks after the insertion; CDC
    // re-synchronizes at the first boundary past the edit
    val shared = (h1 & h2).size
    assert(shared >= h1.size - 2 && h1.size >= 4,
      s"expected near-total chunk reuse, got $shared of ${h1.size}")
  }

  test("cdcChunks: short docs come back as one whole-doc chunk") {
    val out = Curation.cdcChunks(docs(1L -> "tiny", 2L -> "abcdefgh"), "doc_id", "text",
      k = 8, divisor = 16).orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out.forall(r => r.getInt(1) == 0 && r.getInt(2) == 1))
    assert(out(0).getInt(3) == 4 && out(1).getInt(3) == 8)
  }

  test("ngramContamination: containment fractions against a benchmark set") {
    // bench has grams: "a b c", "b c d"
    val bench = docs(100L -> "a b c d")
    val corpus = docs(
      1L -> "a b c x y",  // grams: abc, bcx, cxy → 1/3 contaminated
      2L -> "p q r",      // grams: pqr → 0/1
      3L -> "a b")        // < 3 words → no grams, absent from output
    val out = Curation.ngramContamination(corpus, bench, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 2)
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 3L &&
      out(0).getLong(2) == 1L && out(0).getDouble(3) == 0.333333)
    assert(out(1).getLong(0) == 2L && out(1).getLong(2) == 0L)
  }

  test("ngramContamination counts DISTINCT grams once per doc") {
    val bench = docs(100L -> "a b c")
    val corpus = docs(1L -> "a b c a b c a b c") // abc appears 3×, counted once
    val out = Curation.ngramContamination(corpus, bench, "doc_id", "text", n = 3)
      .collect()
    // distinct grams of doc 1: abc, bca, cab → 7 raw, 3 distinct
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 1L)
  }

  test("ngramContamination: hashed-gram scale path matches the string path") {
    val s = spark
    import s.implicits._
    val corpus = TestSpark.spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = corpus.where(col("doc_id") % 97 === 0)
    val rest = corpus.where(col("doc_id") % 97 =!= 0)
    val str = Curation.ngramContamination(rest, bench, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val hashed = Curation.ngramContamination(rest, bench, "doc_id", "text",
      hashGrams = true).orderBy("doc_id").collect().toSeq
    assert(str == hashed)
  }

  test("chunkWords: boundaries, overlap, and short-doc floor") {
    val words120 = (1 to 120).map(i => s"w$i").mkString(" ")
    val out = Curation.chunkWords(docs(1L -> words120, 2L -> "a b c"),
      "doc_id", "text", chunkSize = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx").collect()
    // doc 1: ceil((120-16)/48) = 3 chunks at starts 1, 49, 97
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getInt(1)).toSeq == Seq(0, 1, 2))
    assert(d1(0).getString(2).startsWith("w1 ") && d1(0).getInt(3) == 64)
    assert(d1(1).getString(2).startsWith("w49 ") && d1(1).getInt(3) == 64)
    assert(d1(2).getString(2).startsWith("w97 ") && d1(2).getInt(3) == 24)
    // consecutive chunks overlap by exactly `overlap` words
    val c0 = d1(0).getString(2).split(" ")
    val c1 = d1(1).getString(2).split(" ")
    assert(c0.takeRight(16).toSeq == c1.take(16).toSeq)
    // a doc shorter than one chunk still yields exactly one chunk
    val d2 = out.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getString(2) == "a b c" && d2(0).getInt(3) == 3)
  }

  test("domainMixSample: quotas track weights, ids stable under repartition") {
    val s = spark
    import s.implicits._
    val df = (0L until 3000L).map(i => (i, s"src${i % 3}")).toDF("id", "domain")
    val picked = Curation.domainMixSample(
      df, "id", "domain",
      weight = regexp_extract(col("domain"), "(\\d+)", 1).cast("long") + 1,
      targetTotal = lit(1200L))
    val byDom = picked.groupBy("domain").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // target shares: 1/6, 2/6, 3/6 of 1200 = 200/400/600 out of 1000 per dom;
    // hash sampling is approximate — allow 15% slack
    assert(math.abs(byDom("src0") - 200.0) < 60, s"src0=${byDom("src0")}")
    assert(math.abs(byDom("src1") - 400.0) < 60, s"src1=${byDom("src1")}")
    assert(math.abs(byDom("src2") - 600.0) < 90, s"src2=${byDom("src2")}")
    // membership is a pure function of the id: repartitioning changes nothing
    val again = Curation.domainMixSample(
      df.repartition(13), "id", "domain",
      weight = regexp_extract(col("domain"), "(\\d+)", 1).cast("long") + 1,
      targetTotal = lit(1200L))
    assert(again.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      picked.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("domainMixSample caps at keeping the whole domain") {
    val s = spark
    import s.implicits._
    val df = (0L until 100L).map(i => (i, "only")).toDF("id", "domain")
    val picked = Curation.domainMixSample(df, "id", "domain",
      weight = lit(1L), targetTotal = lit(10000L))
    assert(picked.count() == 100L)
    // target = 0 keeps nothing — the T = 0 edge of the threshold form
    // (u ≤ (T−1) div D would keep u = 0 without the T ≥ 1 clause)
    val none = Curation.domainMixSample(df, "id", "domain",
      weight = lit(1L), targetTotal = lit(0L))
    assert(none.count() == 0L)
  }

  test("zscoreOutliers flags exactly the planted anomalies") {
    val s = spark
    import s.implicits._
    val base = (1 to 500).map(i => (i.toLong, "m", 100.0 + (i % 11) - 5))
    val planted = Seq((9001L, "m", 500.0), (9002L, "m", -300.0), (9003L, "other", 1.0))
    val df = (base ++ planted).toDF("id", "grp", "v")
    val out = Checks.zscoreOutliers(df, "grp", "v", threshold = 3.0)
      .select("id").collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(9001L, 9002L))
  }

  test("relativeFilter keeps exactly the per-domain top quantile") {
    val s = spark
    import s.implicits._
    // dom a: scores 1..8 (cd = i/8; >= 0.75 keeps 6, 7, 8); dom b: all
    // ties, cd = 1.0 everywhere, so the whole domain survives
    val df = ((1 to 8).map(i => (i.toLong, "a", i.toLong)) ++
      (9 to 12).map(i => (i.toLong, "b", 5L))).toDF("id", "dom", "score")
    val kept = Curation.relativeFilter(df, "dom", "score", 0.75)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(6L, 7L, 8L, 9L, 10L, 11L, 12L))
  }

  test("incrementalDedup drops batch rows already fingerprinted in the corpus") {
    val s = spark
    import s.implicits._
    val corpus = Seq(
      (1L, "Hello, World!"),     // normalizes like doc 10
      (2L, "unrelated corpus text")).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "hello world"),       // dup of 1 after normalization
      (11L, "hello world"),       // intra-batch copy of the same dup
      (12L, "genuinely new"),
      (13L, "genuinely new")      // intra-batch copies both survive (gate is vs corpus)
    ).toDF("doc_id", "text")
    val kept = graft.operators.Dedup.incrementalDedup(batch, corpus, "text")
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept == Seq(12L, 13L))
  }

  test("tableExists probes library members gracefully") {
    assert(graft.sources.Catalog.tableExists(spark, "/root/testdata/sf0.001", "lineitem"))
    assert(!graft.sources.Catalog.tableExists(spark, "/root/testdata/sf0.001", "dsfx"))
    assert(!graft.sources.Catalog.tableExists(spark, "/no/such/dir", "lineitem"))
  }

  test("observed checks ride the main pass and report violation counts") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (Some(1L), 10.0), (Some(2L), 60.0), (None, 20.0), (Some(4L), -5.0))
      .toDF("id", "qty")
    val obs = new org.apache.spark.sql.Observation()
    val checked = Checks.observed(df, obs,
      notNull = Seq("id"), ranges = Seq(("qty", 0.0, 50.0)))
    checked.write.format("noop").mode("overwrite").save() // the single pass
    val m = obs.get
    assert(m("notnull:id") == 1L, m.toString)
    assert(m("range:qty") == 2L, m.toString)
  }

  test("bucketed join plans with no shuffle exchange") {
    val s = spark
    import s.implicits._
    val facts = (1L to 1000L).map(i => (i, i % 50, i * 1.5)).toDF("fid", "key", "amt")
    val dims = (0L until 50L).map(i => (i, s"seg${i % 4}")).toDF("key", "seg")
    Bucketing.writeBucketed(facts, "spec_bkt_facts", "key", buckets = 4)
    Bucketing.writeBucketed(dims, "spec_bkt_dims", "key", buckets = 4)
    // force SMJ so co-location (not a broadcast) is what's being proven
    val joined = Bucketing.readBucketed(spark, "spec_bkt_facts")
      .join(Bucketing.readBucketed(spark, "spec_bkt_dims").hint("merge"), "key")
    assert(joined.collect().length == 1000)
    val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
      case e: ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty,
      s"bucketed merge join must not shuffle, found: ${exchanges.mkString(";")}")
  }

  test("winsorize clips into per-group percentiles, leaves interior values alone") {
    val s = spark
    import s.implicits._
    // group a: 1..100 → p10=10.9, p90=90.1 (interpolated); group b untouched
    val df = ((1 to 100).map(i => ("a", i.toDouble)) ++ Seq(("b", 5.0), ("b", 6.0)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "grp", "v")
    val out = Checks.winsorize(df, "grp", "v", lo = 0.1, hi = 0.9)
      .orderBy("id").collect()
    val a = out.filter(_.getString(0) == "a").map(_.getDouble(3))
    assert(math.abs(a.min - 10.9) < 1e-9 && math.abs(a.max - 90.1) < 1e-9)
    assert(a(49) == 50.0, "interior values must pass through untouched")
    val b = out.filter(_.getString(0) == "b").map(_.getDouble(3))
    assert(math.abs(b.min - 5.1) < 1e-9 && math.abs(b.max - 5.9) < 1e-9)
  }

  test("stripBoilerplate: hashed-block scale path matches the string path on real text") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    def run(hash: Boolean) =
      Curation.stripBoilerplate(docs, "doc_id", "text",
          blockWords = 4, minDocs = 5, hashBlocks = hash)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSeq
    val strings = run(false)
    assert(strings.exists(_._3 > 0), "fixture must actually drop blocks")
    assert(run(true) == strings)
  }

  test("scaleMinMax maps each group into [0,1], degenerate groups to 0") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, "a", 10.0), (2L, "a", 20.0), (3L, "a", 15.0),
      (4L, "b", 7.0), (5L, "b", 7.0)).toDF("id", "grp", "v")
    val out = Checks.scaleMinMax(df, "grp", "v")
      .orderBy("id").collect().map(_.getDouble(3))
    assert(out.toSeq == Seq(0.0, 1.0, 0.5, 0.0, 0.0))
  }

  test("schemaDrift reports missing, added, and type-changed columns") {
    import org.apache.spark.sql.types._
    val expected = StructType(Seq(
      StructField("id", LongType), StructField("Price", DoubleType),
      StructField("tag", StringType)))
    val actual = StructType(Seq(
      StructField("id", LongType), StructField("price", StringType),
      StructField("extra", IntegerType)))
    assert(Checks.schemaDrift(expected, actual) == Seq(
      ("extra", "added", "", "int"),
      ("price", "type_changed", "double", "string"),
      ("tag", "missing", "string", "")))
    assert(Checks.schemaDrift(expected, expected).isEmpty)
  }

  test("redactPii scrubs emails, IPs, phones and counts each category") {
    val out = Curation.redactPii(
      docs(
        1L -> "mail a.b+c@ex-1.org and x@y.io ip 10.0.0.255 tel 555-0199 end",
        2L -> "nothing sensitive here 12.34 v5"),
      "doc_id", "text").orderBy("doc_id").collect()
    assert(out(0).getString(1) ==
      "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> end")
    assert(out(0).getInt(2) == 2 && out(0).getInt(3) == 1 && out(0).getInt(4) == 1)
    assert(out(1).getString(1) == "nothing sensitive here 12.34 v5")
    assert(out(1).getInt(2) == 0 && out(1).getInt(3) == 0 && out(1).getInt(4) == 0)
  }

  test("stripBoilerplate drops frequent blocks, keeps order, empties all-boiler docs") {
    val out = Curation.stripBoilerplate(
      docs(
        1L -> "hdr foo u1 a",
        2L -> "hdr foo u2 b",
        3L -> "hdr foo",
        4L -> "x y hdr foo z w"),
      "doc_id", "text", blockWords = 2, minDocs = 2)
      .orderBy("doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(byId(1L) == ((2L, 1L, "u1 a")))
    assert(byId(2L) == ((2L, 1L, "u2 b")))
    assert(byId(3L) == ((1L, 1L, "")))       // every block boilerplate
    assert(byId(4L) == ((3L, 1L, "x y z w"))) // middle block removed, order kept
  }

  test("lineDedup keeps first corpus-wide occurrence, exempts short lines") {
    val out = Curation.lineDedup(
      docs(
        1L -> "alpha beta\nshared line\ntail one",
        2L -> "shared line\nunique two\n\nshared line",
        3L -> "shared line"),
      "doc_id", "text", minLineLen = 1)
      .orderBy("doc_id").collect()
    val byId = out.map(r => (r.getLong(0), (r.getString(1), r.getInt(2)))).toMap
    // doc 1 holds the first "shared line" (lowest doc id, lowest idx)
    assert(byId(1L) == (("alpha beta\nshared line\ntail one", 0)))
    // doc 2 loses both copies; the empty line is exempt and survives
    assert(byId(2L) == (("unique two\n", 2)))
    assert(byId(3L) == (("", 1)))
  }

  test("lineDedup first-occurrence tie breaks on line index within a doc") {
    val out = Curation.lineDedup(
      docs(1L -> "dup\nmid\ndup\ndup"), "doc_id", "text")
      .collect()
    assert(out.head.getString(1) == "dup\nmid")
    assert(out.head.getInt(2) == 2)
  }

  test("lineDedupExpr: one expression evaluation per doc where text is needed") {
    val s = spark
    import s.implicits._
    // an expression-fed text column whose evaluations are COUNTED: the
    // accumulator increments once per UDF call
    val acc = spark.sparkContext.longAccumulator("textEvals")
    val counted = org.apache.spark.sql.functions.udf { (t: String) =>
      acc.add(1L); t
    }
    // 6 docs; docs 1/2/5 share "shared line" (candidates), 3/4/6 clean;
    // docs 2 and 5 lose their copies. FILE-backed on purpose: a
    // Seq-backed LocalRelation gets constant-folded by the optimizer
    // (ConvertToLocalRelation evaluates the UDF on the driver once per
    // query construction), which would confound the executor-side count.
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-ldx").toString
    docs(
      1L -> "shared line\nuniq a",
      2L -> "uniq b\nshared line",
      3L -> "clean c\nclean cc",
      4L -> "clean d",
      5L -> "shared line",
      6L -> "clean f\nclean ff")
      .write.mode("overwrite").parquet(tmpDir)
    val base = spark.read.parquet(tmpDir)
    val expr = counted(col("text"))
    // collect WITHOUT orderBy: a global sort's range partitioner runs a
    // sampling pass over the child, re-evaluating the projection once
    // more — noise that has nothing to do with lineDedupExpr
    acc.reset()
    val outExpr = Curation.lineDedupExpr(base, "doc_id", expr, "text")
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    val evalsExpr = acc.value
    // the naive shape: the expression baked into the input df, every
    // phase re-evaluating it under the joins
    acc.reset()
    val outPlain = Curation.lineDedup(
      base.select(col("doc_id"), expr.as("text")), "doc_id", "text")
      .as[(Long, String, Int)].collect().toSeq.sortBy(_._1)
    val evalsPlain = acc.value
    assert(outExpr == outPlain, "lineDedupExpr must not change the output")
    // expr path: phase-1 hash pass (6 docs) + candidates-only cache fill
    // (3) + final projection for non-loser docs (4: docs 1,3,4,6) = 13.
    // Retried/speculative tasks could only ADD counts.
    assert(evalsExpr <= 13, s"lineDedupExpr evaluated $evalsExpr times (> 13)")
    assert(evalsPlain > evalsExpr,
      s"baked-in=$evalsPlain should exceed lineDedupExpr=$evalsExpr")
  }
}
