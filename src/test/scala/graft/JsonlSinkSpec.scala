package graft

import graft.sinks.JsonlSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JsonlSinkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def mkDocs(n: Int): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(7L)
    (0L until n.toLong).map(i => (i, ("w" + i + " ") * (5 + rnd.nextInt(40))))
  }

  test("writeSharded: one file per shard, manifest bytes equal disk bytes, round-trip") {
    val s = spark
    import s.implicits._
    val docs = mkDocs(200)
    val df = docs.toDF("doc_id", "text")
    val out = tmp("jsonl")
    val manifest = JsonlSink.writeSharded(df, out, Seq("doc_id"), budgetBytes = 4096L)
      .collect()
    assert(manifest.length > 1, "budget should split this corpus into several shards")
    // one data file per shard dir, and its size is exactly the manifest bytes
    manifest.foreach { m =>
      val shard = m.getLong(0)
      val dir = new java.io.File(s"$out/shards/shard=$shard")
      val files = dir.listFiles().filter(f => f.getName.endsWith(".txt"))
      assert(files.length == 1, s"shard $shard has ${files.length} data files")
      assert(files.head.length() == m.getLong(2),
        s"shard $shard: disk ${files.head.length()} != manifest ${m.getLong(2)}")
    }
    // every row accounted for exactly once, in contiguous doc_id ranges
    assert(manifest.map(_.getLong(1)).sum == docs.length)
    val ranges = manifest.sortBy(_.getLong(0)).map(m => (m.getLong(3), m.getLong(4)))
    ranges.sliding(2).foreach {
      case Array((_, e), (s2, _)) => assert(s2 == e + 1, "shards must tile doc_id space")
      case _ =>
    }
    // round-trip: parse the lines back and compare values
    val schema = df.schema
    val back = JsonlSink.readSharded(s, out)
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.doc_id"), col("r.text"))
      .as[(Long, String)].collect().toSet
    assert(back == docs.toSet)
  }

  test("over-budget row lands in exactly one shard; nulls serialize explicitly") {
    val s = spark
    import s.implicits._
    val big = (0L, "x" * 5000)
    val df = (Seq(big) ++ mkDocs(20).map { case (i, t) => (i + 1, t) })
      .toDF("doc_id", "text")
      .withColumn("text", when(col("doc_id") === 3, lit(null)).otherwise(col("text")))
    val out = tmp("jsonl-edge")
    val manifest = JsonlSink.writeSharded(df, out, Seq("doc_id"), budgetBytes = 1024L)
      .collect()
    assert(manifest.map(_.getLong(1)).sum == 21)
    val lines = JsonlSink.readSharded(s, out).select("value").as[String].collect()
    assert(lines.count(_.contains("\"text\":null")) == 1,
      "null field must be kept explicit for reproducible byte weights")
    assert(lines.length == 21)
  }

  test("multibyte text: manifest bytes still equal UTF-8 disk bytes, round-trip exact") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "héllo wörld"), (2L, "中文文本 with mixed ascii"),
      (3L, "clef: 𝄞 and emoji 😀"), (4L, "plain"))
    val out = tmp("jsonl-utf8")
    val manifest = JsonlSink.writeSharded(docs.toDF("doc_id", "text"), out,
      Seq("doc_id"), budgetBytes = 96L).collect()
    manifest.foreach { m =>
      val dir = new java.io.File(s"$out/shards/shard=${m.getLong(0)}")
      val files = dir.listFiles().filter(_.getName.endsWith(".txt"))
      assert(files.length == 1 && files.head.length() == m.getLong(2),
        s"shard ${m.getLong(0)}: UTF-8 byte accounting must match the disk")
    }
    val schema = docs.toDF("doc_id", "text").schema
    val back = JsonlSink.readSharded(s, out)
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.doc_id"), col("r.text")).as[(Long, String)].collect().toSet
    assert(back == docs.toSet)
  }

  test("gzip codec: manifest keeps uncompressed budget bytes, round-trip transparent") {
    val s = spark
    import s.implicits._
    val docs = mkDocs(120)
    val out = tmp("jsonl-gz")
    val manifest = JsonlSink.writeSharded(docs.toDF("doc_id", "text"), out,
      Seq("doc_id"), budgetBytes = 4096L, codec = Some("gzip")).collect()
    manifest.foreach { m =>
      val dir = new java.io.File(s"$out/shards/shard=${m.getLong(0)}")
      val files = dir.listFiles().filter(_.getName.endsWith(".txt.gz"))
      assert(files.length == 1, s"shard ${m.getLong(0)} must hold one gzipped file")
      assert(files.head.length() < m.getLong(2),
        "compressed file should undercut the uncompressed manifest bytes")
    }
    val schema = docs.toDF("doc_id", "text").schema
    val back = JsonlSink.readSharded(s, out)
      .select(from_json(col("value"), schema).as("r"))
      .select(col("r.doc_id"), col("r.text")).as[(Long, String)].collect().toSet
    assert(back == docs.toSet)
    // identical packing with and without the codec
    val plain = JsonlSink.manifestOnly(docs.toDF("doc_id", "text"), Seq("doc_id"), 4096L)
      .collect().map(_.toSeq).toSeq
    assert(manifest.map(_.toSeq).toSeq == plain)
  }

  test("manifestOnly equals the manifest writeSharded returns") {
    val d2 = spark.createDataFrame(mkDocs(50)).toDF("doc_id", "text")
    val a = JsonlSink.manifestOnly(d2, Seq("doc_id"), 2048L).collect().map(_.toSeq)
    val out = tmp("jsonl-dry")
    val b = JsonlSink.writeSharded(d2, out, Seq("doc_id"), 2048L).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }
}
