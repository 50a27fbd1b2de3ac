package graft

import graft.operators.{TextAnalysis, TextIndex}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_tix_$name")
    d.toFile.deleteOnExit()
    d.toString + "/idx"
  }

  private val corpus = (1L to 80L).map { i =>
    val shared = if (i % 3 == 0) "common shared words" else "other filler text"
    (i, s"doc$i $shared token${i % 7} token${i % 11} tail")
  }.toDF("doc_id", "text")
  private val queries = Seq(
    100L -> "common shared token3",
    101L -> "filler token5 doc9").toDF("doc_id", "text")

  // AQE-aware walk to every file scan (the SimilaritySpec helper)
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  private def parquetFilesUnder(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      here.filter(_.isDirectory).flatMap(parquetFilesUnder)
  }

  test("indexed search equals ad-hoc bm25TopK, and the scan is bucket-pruned") {
    val path = tmp("eq")
    TextIndex.write(corpus, "doc_id", "text", path, buckets = 32)
    // lazy twin: the public search localCheckpoints (hiding the scan behind
    // a LogicalRDD) so the qterms cache can be released
    val (got, qterms) = TextIndex.searchPlan(spark, path, queries, "doc_id", "text", topK = 5)
    val want = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "doc_id", "text", topK = 5)
    val g = got.orderBy("q_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    val w = want.orderBy("q_id", "rank")
      .as[(Long, Int, Long, Double)].collect().toSeq
    assert(g == w)
    assert(g.nonEmpty)

    // the scale property: only the query terms' bucket dirs are read
    got.collect()
    val scan = allScans(got.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("postings"))
    assert(scan.nonEmpty, "no postings scan found")
    val postingsDir = new java.io.File(s"$path/postings")
    val totalFiles = parquetFilesUnder(postingsDir).size
    val bucketDirs = postingsDir.listFiles().count(_.getName.startsWith("bucket="))
    assert(bucketDirs > 8, s"fixture vocabulary must spread buckets, got $bucketDirs")
    val filesRead = scan.map(_.metrics("numFiles").value).max
    assert(filesRead < totalFiles,
      s"search scanned the whole postings set: $filesRead of $totalFiles files")
    assert(scan.head.metadata("PartitionFilters").contains("bucket"),
      scan.head.metadata.toString)
    qterms.unpersist()
  }

  test("append equals a from-scratch rebuild (postings, stats, and scores)") {
    val (half1, half2) = (corpus.where(col("doc_id") <= 40),
      corpus.where(col("doc_id") > 40))
    val pInc = tmp("inc")
    TextIndex.write(half1, "doc_id", "text", pInc, buckets = 16)
    TextIndex.append(half2, "doc_id", "text", pInc)
    val pFull = tmp("full")
    TextIndex.write(corpus, "doc_id", "text", pFull, buckets = 16)
    val inc = TextIndex.search(spark, pInc, queries, "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    val full = TextIndex.search(spark, pFull, queries, "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(inc == full)
    assert(inc.nonEmpty)
  }

  test("compact collapses per-append files to one per bucket; searches unchanged") {
    val path = tmp("cmp")
    val parts = (0 until 4).map(i => corpus.where(col("doc_id") % 4 === i))
    TextIndex.write(parts.head, "doc_id", "text", path, buckets = 8)
    parts.tail.foreach(p => TextIndex.append(p, "doc_id", "text", path))
    def res() = TextIndex.search(spark, path, queries, "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    val before = res()
    val postings = new java.io.File(s"$path/postings")
    val filesBefore = parquetFilesUnder(postings).size
    TextIndex.compact(spark, path)
    val filesAfter = parquetFilesUnder(postings).size
    val bucketDirs = postings.listFiles().count(_.getName.startsWith("bucket="))
    assert(filesAfter < filesBefore, s"$filesAfter !< $filesBefore")
    assert(filesAfter == bucketDirs, s"expected one file per bucket dir")
    assert(res() == before, "compaction changed search results")
    assert(before.nonEmpty)
  }

  test("hot-bucket splitting: hot terms fan out over sub dirs, df stays exact, pruning holds") {
    val path = tmp("hot")
    // "common"/"shared"/"words" appear in every third doc (df=26 at 80 docs)
    TextIndex.write(corpus, "doc_id", "text", path, buckets = 32,
      hotDf = 20, hotSubs = 4)
    // hot terms' buckets hold multiple sub dirs; cold buckets only sub=0
    val postingsDir = new java.io.File(s"$path/postings")
    val subCounts = postingsDir.listFiles().filter(_.getName.startsWith("bucket="))
      .map(b => b.getName -> b.listFiles().count(_.getName.startsWith("sub=")))
    assert(subCounts.exists(_._2 > 1), s"no bucket split: ${subCounts.toSeq}")
    assert(subCounts.exists(_._2 == 1), s"everything split: ${subCounts.toSeq}")

    // scores identical to the unsplit index AND the ad-hoc pass — df is
    // computed over every sub of a pruned bucket, so it stays exact
    val got = TextIndex.search(spark, path, queries, "doc_id", "text", topK = 5)
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    val want = TextAnalysis.bm25TopK(corpus, queries, "doc_id", "text",
      "doc_id", "text", topK = 5)
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.nonEmpty)

    // bucket pruning still prunes across the two-level layout
    val (lazyRes, qterms) = TextIndex.searchPlan(spark, path, queries, "doc_id", "text", topK = 5)
    lazyRes.collect()
    val scan = allScans(lazyRes.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("postings"))
    assert(scan.nonEmpty)
    val totalFiles = parquetFilesUnder(postingsDir).size
    val filesRead = scan.map(_.metrics("numFiles").value).max
    assert(filesRead < totalFiles,
      s"search scanned the whole split postings set: $filesRead of $totalFiles")
    assert(scan.head.metadata("PartitionFilters").contains("bucket"),
      scan.head.metadata.toString)
    qterms.unpersist()

    // appends into the split layout keep score equality with a rebuild
    val pInc = tmp("hotinc")
    TextIndex.write(corpus.where(col("doc_id") <= 40), "doc_id", "text", pInc,
      buckets = 32, hotDf = 10, hotSubs = 4)
    TextIndex.append(corpus.where(col("doc_id") > 40), "doc_id", "text", pInc,
      hotDf = 10, hotSubs = 4)
    val inc = TextIndex.search(spark, pInc, queries, "doc_id", "text", topK = 5)
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(inc == want)
  }

  test("phraseCount: consecutive-token matches incl. overlapping and repeated-term phrases") {
    val path = tmp("pos")
    val corpus = Seq(
      (1L, "the quick brown fox and the quick brown cat"),
      (2L, "a a a b"),                  // "a a" overlaps: 2 occurrences
      (3L, "quick brown"),              // exact doc == phrase
      (4L, "brown quick"),              // reversed: no match
      (5L, "The QUICK  brown\tfox"),    // case + whitespace folding
      (6L, null: String)
    ).toDF("doc_id", "text")
    TextIndex.writePositional(corpus, "doc_id", "text", path, buckets = 8)
    def counts(p: String): Map[Long, Int] =
      TextIndex.phraseCount(spark, path, p)
        .as[(Long, Int)].collect().toMap
    assert(counts("quick brown") == Map(1L -> 2, 3L -> 1, 5L -> 1))
    assert(counts("a a") == Map(2L -> 2))
    assert(counts("a a a") == Map(2L -> 1))
    assert(counts("quick brown fox") == Map(1L -> 1, 5L -> 1))
    assert(counts("brown") == Map(1L -> 2, 3L -> 1, 4L -> 1, 5L -> 1)) // single term = tf
    assert(counts("missing phrase entirely") == Map.empty)
    val e = intercept[IllegalArgumentException] {
      TextIndex.phraseCount(spark, path, "   ")
    }
    assert(e.getMessage.contains("non-empty"))
  }

  test("proximityCount: in-order within-window matches; window=1 equals phraseCount") {
    val path = tmp("prox")
    val corpus = Seq(
      (1L, "alpha x beta"),          // gap 2: matches window>=2 only
      (2L, "alpha beta"),            // adjacent
      (3L, "beta alpha"),            // wrong order: never
      (4L, "alpha x y z beta"),      // gap 4
      (5L, "alpha x beta y beta")    // two qualifying end positions at w>=2
    ).toDF("doc_id", "text")
    TextIndex.writePositional(corpus, "doc_id", "text", path, buckets = 8)
    def prox(w: Int): Map[Long, Int] =
      TextIndex.proximityCount(spark, path, Seq("alpha", "beta"), w)
        .as[(Long, Int)].collect().toMap
    assert(prox(1) == Map(2L -> 1))
    assert(prox(2) == Map(1L -> 1, 2L -> 1, 5L -> 1))
    assert(prox(4) == Map(1L -> 1, 2L -> 1, 4L -> 1, 5L -> 2))
    // window = 1 degenerates to the exact phrase semantics
    val phrase = TextIndex.phraseCount(spark, path, "alpha beta")
      .as[(Long, Int)].collect().toMap
    assert(prox(1) == phrase)
  }

  test("phrase/proximity fuzz: random corpora vs a brute token-scan model") {
    val rnd = new scala.util.Random(23L)
    val alphabet = Seq("a", "b", "c", "d")
    def brutePhrase(doc: Seq[String], ph: Seq[String]): Int =
      if (doc.length < ph.length) 0
      else (0 to doc.length - ph.length).count(i => doc.slice(i, i + ph.length) == ph)
    def bruteProx(doc: Seq[String], ts: Seq[String], w: Int): Int = {
      // distinct qualifying end positions of in-order within-w chains
      var ends = doc.zipWithIndex.collect { case (t, i) if t == ts.head => i }
      ts.drop(1).foreach { t =>
        val prev = ends
        ends = doc.zipWithIndex.collect {
          case (x, i) if x == t && prev.exists(m => i - m >= 1 && i - m <= w) => i
        }
      }
      ends.length
    }
    for (trial <- 1 to 3) {
      val docs = (1L to 25L).map(i =>
        (i, Seq.fill(5 + rnd.nextInt(30))(alphabet(rnd.nextInt(4))).mkString(" ")))
      val path = tmp(s"fz$trial")
      TextIndex.writePositional(docs.toDF("doc_id", "text"), "doc_id", "text", path, 8)
      val toks = docs.map { case (i, t) => i -> t.split(" ").toSeq }.toMap
      for (_ <- 1 to 5) {
        val ph = Seq.fill(1 + rnd.nextInt(3))(alphabet(rnd.nextInt(4)))
        val gotP = TextIndex.phraseCount(spark, path, ph.mkString(" "))
          .as[(Long, Int)].collect().toMap
        val wantP = toks.map { case (i, d) => i -> brutePhrase(d, ph) }.filter(_._2 > 0)
        assert(gotP == wantP, s"phrase $ph trial $trial")
        val w = 1 + rnd.nextInt(4)
        val gotX = TextIndex.proximityCount(spark, path, ph, w)
          .as[(Long, Int)].collect().toMap
        val wantX = toks.map { case (i, d) => i -> bruteProx(d, ph, w) }.filter(_._2 > 0)
        assert(gotX == wantX, s"prox $ph w=$w trial $trial")
      }
    }
  }
}
