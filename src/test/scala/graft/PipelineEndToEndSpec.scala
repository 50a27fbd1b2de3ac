package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The whole training-data pipeline in one pass, through the public
  * facade only: WARC crawl segments → clean text → quality gate → exact
  * dedup → deterministic shuffle-sharding → TFRecord export → verified
  * read-back. Every stage is an operator with its own oracle/spec; this
  * test pins that they COMPOSE — schemas line up, no stage drops or
  * duplicates rows it shouldn't, and the bytes that come back out are
  * the bytes that went in. */
class PipelineEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("crawl to TFRecord shards end to end") {
    val s = spark
    import s.implicits._

    // 1. synthesize a small crawl: 30 pages, 6 of them near-identical
    //    boilerplate duplicates, via the WARC writer grammar
    def record(id: Int, body: String): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
        s"<html><body><p>$body</p></body></html>")
      val payload = http.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\n" +
        f"WARC-Record-ID: <urn:uuid:00000000-0000-0000-0000-${id}%012d>\r\n" +
        s"WARC-Date: 2026-08-14T10:00:00Z\r\n" +
        s"WARC-Target-URI: http://site/$id\r\n" +
        s"Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8") ++
        payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val bodies = (1 to 24).map(i =>
      (i, s"unique article number $i with enough running words to pass the " +
        s"gate threshold for document $i in the corpus body text here")) ++
      (25 to 30).map(i => (i, "duplicated boilerplate page content that " +
        "repeats across mirror sites with enough words to pass the gate"))
    val dir = java.nio.file.Files.createTempDirectory("graft-e2e")
    java.nio.file.Files.write(dir.resolve("crawl.warc"),
      bodies.map { case (i, b) => record(i, b) }.reduce(_ ++ _))

    // 2. ingest + clean
    val docs = Graft.ingestCrawlHtml(spark, dir.toString)
      .withColumn("doc_id",
        regexp_extract(col("record_id"), "(\\d+)>", 1).cast("long"))
      .select("doc_id", "text")
    assert(docs.count() == 30)
    assert(!docs.head.getString(1).contains("<"), "HTML must be stripped")

    // 3. quality gate (wide bounds: keep everything that is a real doc)
    val gated = graft.operators.Curation.qualityFlags(
      docs, "doc_id", "text", minWords = 5, maxWords = 100,
      minMeanWordLen = 1.0, maxMeanWordLen = 10.0,
      minStopwordRatio = 0.0, minDistinctRatio = 0.1)
      .where(col("keep") === 1).select("doc_id")
      .join(docs, "doc_id")
    assert(gated.count() == 30)

    // 4. exact dedup: the 6 boilerplate mirrors collapse to one survivor
    val deduped = Graft.dedupCorpus(gated, "doc_id", "text", n = 3, tau = 0.99)
    val n = deduped.count()
    assert(n == 25, s"expected 24 unique + 1 boilerplate survivor, got $n")

    // 5. deterministic shuffle-shard + TFRecord export
    val sharded = Graft.shuffleShards(
      deduped.withColumn("payload", col("text").cast("binary")),
      "doc_id", shards = 4)
    val out = java.nio.file.Files.createTempDirectory("graft-e2e-tfr").toString
    val manifest = Graft.writeTfRecords(sharded, out, "payload", "shard", Seq("pos"))
    assert(manifest.agg(sum("n_rows")).head.getLong(0) == n)

    // 6. read back, verify bytes round-tripped exactly
    val back = Graft.readTfRecords(spark, out)
      .select(col("record").cast("string").as("text"))
      .as[String].collect().sorted
    val want = deduped.select("text").as[String].collect().sorted
    assert(back.toSeq == want.toSeq, "export must round-trip the corpus bytes")
  }
}
