package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz: each curation operator vs an independent plain-Scala
  * model over seeded random word soups (the same style that caught the
  * null-time bug in the as-of encodings in round 2). */
class CurationPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val rng = new scala.util.Random(20260812L)
  private val vocab = Vector("the", "a", "of", "alpha", "beta", "gamma", "delta",
    "epsilon", "zz", "workbench", "q", "metric", "value", "stream", "table")

  private def randDoc(maxWords: Int): String =
    Seq.fill(1 + rng.nextInt(maxWords))(vocab(rng.nextInt(vocab.size))).mkString(" ")

  private def corpus(n: Int, maxWords: Int): Seq[(Long, String)] =
    (0L until n).map(i => i -> randDoc(maxWords))

  test("chunkWords fuzz: coverage, overlap, and count vs model on 200 docs") {
    val s = spark
    import s.implicits._
    val data = corpus(200, 140)
    val out = Curation.chunkWords(data.toDF("doc_id", "text"), "doc_id", "text",
      chunkSize = 64, overlap = 16)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getInt(1)).map(r => (r.getString(2), r.getInt(3)))).toMap
    data.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val stride = 48
      val expChunks = math.max(math.ceil((words.size - 16) / 48.0).toLong, 1L)
      val got = out(id)
      assert(got.length == expChunks, s"doc $id chunk count")
      got.zipWithIndex.foreach { case ((chunk, nw), gIdx) =>
        val exp = words.slice(gIdx * stride, gIdx * stride + 64)
        assert(chunk == exp.mkString(" "), s"doc $id chunk $gIdx text")
        assert(nw == exp.size, s"doc $id chunk $gIdx n_words")
      }
      // every word position is covered by at least one chunk
      val covered = got.zipWithIndex.flatMap { case ((_, nw), gIdx) =>
        (gIdx * stride) until (gIdx * stride + nw)
      }.toSet
      assert(covered == words.indices.toSet, s"doc $id coverage")
    }
  }

  test("qualityFlags fuzz: flags and ratios vs model on 300 docs") {
    val s = spark
    import s.implicits._
    val data = corpus(300, 120)
    val stop = Set("the", "a", "an", "and", "of", "is", "in", "to")
    val got = Curation.qualityFlags(data.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    data.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val n = words.size
      val mwl = words.map(_.length).sum.toDouble / n
      val stopR = words.count(stop).toDouble / n
      val distR = words.distinct.size.toDouble / n
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      val row = got(id)
      assert(row.getAs[Int]("n_words") == n)
      assert(row.getAs[Double]("mean_word_len") == r6(mwl), s"doc $id mwl")
      assert(row.getAs[Double]("stopword_ratio") == r6(stopR), s"doc $id stop")
      assert(row.getAs[Double]("distinct_ratio") == r6(distR), s"doc $id dist")
      val keep = (n >= 20 && n <= 80) && (mwl >= 4.2 && mwl <= 4.8) &&
        stopR >= 0.02 && distR >= 0.35
      assert(row.getAs[Int]("keep") == (if (keep) 1 else 0), s"doc $id keep")
    }
  }

  test("repetitionStats fuzz: vs model on 300 docs") {
    val s = spark
    import s.implicits._
    val data = corpus(300, 90)
    val got = Curation.repetitionStats(data.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
    data.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val counts = words.groupBy(identity).view.mapValues(_.size).toMap
      def r6(x: Double) = math.rint(x * 1e6) / 1e6
      val row = got(id)
      assert(row.getAs[Long]("n_words") == words.size)
      assert(row.getAs[Long]("n_distinct") == counts.size)
      assert(row.getAs[Double]("distinct_frac") == r6(counts.size.toDouble / words.size))
      assert(row.getAs[Double]("top_word_frac") == r6(counts.values.max.toDouble / words.size))
    }
  }

  test("ngramContamination fuzz: vs set model on 150 docs") {
    val s = spark
    import s.implicits._
    val data = corpus(150, 60)
    def grams(text: String): Set[String] =
      text.trim.split("\\s+").toSeq.sliding(3).filter(_.size == 3)
        .map(_.mkString(" ")).toSet
    val (benchRows, corpusRows) = data.partition(_._1 % 7 == 0)
    val benchSet = benchRows.flatMap(d => grams(d._2)).toSet
    val got = Curation.ngramContamination(
      corpusRows.toDF("doc_id", "text"), benchRows.toDF("doc_id", "text"),
      "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r).toMap
    corpusRows.foreach { case (id, text) =>
      val g = grams(text)
      if (g.isEmpty) assert(!got.contains(id), s"doc $id should be absent")
      else {
        val hits = g.count(benchSet)
        val row = got(id)
        assert(row.getAs[Long]("n_ngrams") == g.size, s"doc $id n_ngrams")
        assert(row.getAs[Long]("n_contaminated") == hits, s"doc $id hits")
      }
    }
  }

  test("domainMixSample fuzz: keep set EXACTLY matches the integer model") {
    val s = spark
    import s.implicits._
    val data = (0L until 2000L).map(i => (i, s"dom${(i * 7) % 5}"))
    val got = Curation.domainMixSample(
      data.toDF("id", "domain"), "id", "domain",
      weight = regexp_extract(col("domain"), "(\\d+)", 1).cast("long") + 1,
      targetTotal = lit(800L))
      .select("id").collect().map(_.getLong(0)).toSet
    // independent Scala model of the pure-integer predicate
    val nS = data.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val wS = nS.keys.map(d => d -> (d.filter(_.isDigit).toLong + 1)).toMap
    val sumW = wS.values.sum
    val expected = data.filter { case (id, dom) =>
      val u = ((id % 1000000007L) * 2654435761L % 1000000007L) % 1000000L
      u * nS(dom) * sumW < 1000000L * 800L * wS(dom)
    }.map(_._1).toSet
    assert(got == expected)
  }

  test("stripBoilerplate fuzz: block accounting vs model on 250 docs") {
    val s = spark
    import s.implicits._
    val (bw, minDocs) = (3, 4)
    val data = corpus(250, 60)
    // independent model: same split → non-overlapping blocks → df count → strip
    val modelBlocks: Map[Long, Seq[String]] = data.map { case (id, text) =>
      id -> text.trim.split("\\s+").toSeq.grouped(bw).map(_.mkString(" ")).toSeq
    }.toMap
    val boiler = modelBlocks.values.flatMap(_.distinct)
      .groupBy(identity).view.mapValues(_.size).filter(_._2 >= minDocs).keySet
    val out = Curation.stripBoilerplate(data.toDF("doc_id", "text"),
        "doc_id", "text", blockWords = bw, minDocs = minDocs)
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(boiler.nonEmpty, "fuzz fixture must actually produce boilerplate")
    data.foreach { case (id, _) =>
      val blocks = modelBlocks(id)
      val kept = blocks.filterNot(boiler)
      val (nB, nD, clean) = out(id)
      assert(nB == blocks.size, s"doc $id n_blocks")
      assert(nD == (blocks.size - kept.size), s"doc $id n_dropped")
      assert(clean == kept.mkString(" "), s"doc $id clean_text")
    }
  }

  test("encodeIds fuzz: id sequences vs model on 250 docs") {
    val s = spark
    import s.implicits._
    val data = corpus(250, 80)
    val df = data.toDF("doc_id", "text")
    val size = 8 // smaller than the 15-word vocab → real OOVs
    val counts = data.flatMap(_._2.split("\\s+")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val modelVocab = counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(size)
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1) }.toMap
    val enc = graft.operators.TextAnalysis.encodeIds(df, "doc_id", "text",
        graft.operators.TextAnalysis.buildVocab(df, "text", size))
      .collect().map(r =>
        r.getLong(0) -> ((r.getSeq[Int](1), r.getLong(2), r.getLong(3)))).toMap
    data.foreach { case (id, text) =>
      val words = text.trim.split("\\s+").toSeq
      val ids = words.map(w => modelVocab.getOrElse(w, 0))
      val (gotIds, nTok, nOov) = enc(id)
      assert(gotIds == ids, s"doc $id ids")
      assert(nTok == words.size && nOov == ids.count(_ == 0), s"doc $id counts")
    }
  }
}
