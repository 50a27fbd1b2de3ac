package graft

import graft.sinks.TfRecordSink
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TfRecordSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** INDEPENDENT table-driven CRC32C (Castagnoli polynomial 0x1EDC6F41,
    * reflected 0x82F63B78) + the published mask — shares nothing with the
    * JDK implementation the sink uses. */
  private lazy val crcTable: Array[Int] = Array.tabulate(256) { n =>
    var c = n
    for (_ <- 0 until 8)
      c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
    c
  }
  private def refMaskedCrc(bytes: Array[Byte]): Int = {
    var c = 0xFFFFFFFF
    bytes.foreach(b => c = crcTable((c ^ b) & 0xFF) ^ (c >>> 8))
    val v = c ^ 0xFFFFFFFF
    ((v >>> 15) | (v << 17)) + 0xa282ead8
  }

  test("masked CRC32C equals an independent table-driven implementation") {
    val cases = Seq(
      Array.empty[Byte],
      "hello tfrecord".getBytes("UTF-8"),
      Array.tabulate(1000)(i => (i * 31 % 251).toByte))
    cases.foreach { b =>
      assert(TfRecordSink.maskedCrc32c(b) == refMaskedCrc(b))
    }
  }

  test("sharded write + read round-trips payloads in order; manifest matches disk") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tfr").toString
    val docs = (1L to 200L).map(i => (i, i % 4, s"payload number $i with body ${"x" * (i % 7).toInt}"))
      .toDF("doc_id", "shard", "text")
      .withColumn("payload", col("text").cast("binary"))
    val manifest = TfRecordSink.writeSharded(
      docs, path, "payload", "shard", Seq("doc_id"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(manifest.keySet == Set(0L, 1L, 2L, 3L))
    assert(manifest.values.map(_._1).sum == 200L)
    // manifest bytes equal the on-disk shard file sizes EXACTLY
    manifest.foreach { case (shard, (_, bytes)) =>
      val f = new java.io.File(s"$path/shards/shard=$shard/data.tfrecord")
      assert(f.length() == bytes, s"shard $shard: disk ${f.length()} != manifest $bytes")
    }
    // round-trip: every payload back, in doc order within its shard
    val back = TfRecordSink.read(spark, path)
      .select(col("shard"), col("record").cast("string").as("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1))
    assert(back.length == 200)
    val grouped = back.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    (0L to 3L).foreach { sh =>
      val expect = (1L to 200L).filter(_ % 4 == sh)
        .map(i => s"payload number $i with body ${"x" * (i % 7).toInt}")
      assert(grouped(sh) == expect, s"shard $sh order/content")
    }
    // manifest sidecar persisted
    assert(spark.read.parquet(s"$path/manifest").count() == 4)
  }

  test("a null shard value refuses loudly instead of landing in shard 0") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tfr-nullshard").toString
    val docs = Seq((1L, Some(0L), "a"), (2L, None, "b"))
      .toDF("doc_id", "shard", "text")
      .withColumn("payload", col("text").cast("binary"))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSink.writeSharded(docs, path, "payload", "shard", Seq("doc_id"))
    }
    assert(String.valueOf(e.getCause.getMessage).contains("null shard value"),
      s"got: ${e.getCause}")
  }

  test("a flipped byte fails loudly with shard and offset, never truncates silently") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tfr-bad").toString
    val docs = (1L to 10L).map(i => (i, 0L, s"record $i")).toDF("doc_id", "shard", "text")
      .withColumn("payload", col("text").cast("binary"))
    TfRecordSink.writeSharded(docs, path, "payload", "shard", Seq("doc_id"))
    val f = java.nio.file.Paths.get(s"$path/shards/shard=0/data.tfrecord")
    val bytes = java.nio.file.Files.readAllBytes(f)
    bytes(20) = (bytes(20) ^ 0x01).toByte // inside the first payload
    java.nio.file.Files.write(f, bytes)
    // drop Hadoop's LocalFS .crc sidecar so the corruption reaches OUR
    // record-level verification (on a real object store there is no
    // transparent per-file checksum layer to hide behind)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(s"$path/shards/shard=0/.data.tfrecord.crc"))
    val e = intercept[org.apache.spark.SparkException] {
      TfRecordSink.read(spark, path).collect()
    }
    assert(String.valueOf(e.getCause.getMessage).contains("CRC mismatch"),
      String.valueOf(e.getCause))
  }

  test("empty payloads and single-shard corpora round-trip") {
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-tfr-e").toString
    val docs = Seq((1L, 0L, Array.empty[Byte]), (2L, 0L, "x".getBytes("UTF-8")))
      .toDF("doc_id", "shard", "payload")
    val m = TfRecordSink.writeSharded(docs, path, "payload", "shard", Seq("doc_id"))
      .collect()
    assert(m.length == 1 && m.head.getLong(1) == 2L)
    assert(m.head.getLong(2) == (16L + 0) + (16L + 1))
    val back = TfRecordSink.read(spark, path).collect()
    assert(back.map(_.getAs[Array[Byte]](1).length).toSeq == Seq(0, 1))
  }
}
