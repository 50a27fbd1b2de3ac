package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.security.MessageDigest

/** Multimodal column plumbing: opaque binary payloads with typed metadata.
  *
  * Image/audio/video payloads are carried as `binary` columns next to a
  * metadata struct; feature extraction runs per-partition over the iterator
  * (the Scala analog of a batched pandas UDF — one decoder instantiation per
  * partition, streaming through rows without materializing the partition).
  *
  * The actual media decode is STUBBED (`stubDecode`) — no image/audio codecs
  * ship in this environment — but the Spark-side plumbing (schema, partition
  * batching, per-partition setup amortization) is real and tested. At 100 TB
  * the payload column dominates I/O: keep payloads in their own parquet
  * column (column pruning skips them unless extracted) and size
  * `maxPartitionBytes` so a partition of payloads fits executor memory.
  */
object Binary {

  /** Wraps a text column as a binary payload with a metadata struct —
    * the ingest shape a real media pipeline would produce. */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast(BinaryType))
      .withColumn("meta", struct(
        lit("text/plain").as("mime"),
        octet_length(col(textCol).cast(BinaryType)).as("n_bytes")))

  /** Deterministic stand-in for a media decoder: a real pipeline would
    * decode pixels/samples here; we derive a stable pseudo-feature from the
    * payload bytes so the batching/schema path is exercised end-to-end. */
  def stubDecode(payload: Array[Byte]): Double =
    if (payload.isEmpty) 0.0
    else payload.foldLeft(0L)((acc, b) => acc + (b & 0xFF)).toDouble / payload.length

  private val featureSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", LongType),
    StructField("header_hex", StringType),
    StructField("content_md5", StringType),
    StructField("mean_byte", DoubleType)))

  private val frameSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("frame_bytes", LongType),
    StructField("frame_md5", StringType)))

  /** Frame sampling over an opaque "video" payload: every `stride` bytes,
    * take a `frameBytes` window and fingerprint it. The decode step is
    * stubbed (fixed-size byte windows stand in for decoded frames) but the
    * plumbing is the real shape: one row in → many frame rows out via a
    * per-partition flatMap, decoder state (here the digest) allocated once
    * per partition, output exploded AFTER the payload column is pruned away
    * so the shuffle never carries payload bytes. */
  def frameSample(
      spark: SparkSession, df: DataFrame, idCol: String,
      frameBytes: Int, stride: Int): DataFrame = {
    val rows = df.select(col(idCol).cast(LongType), col("payload"))
    val out = rows.rdd.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty // failed fetch/decode: no frames
        else (0 until payload.length by stride).iterator.zipWithIndex.map { case (off, idx) =>
          val frame = payload.slice(off, math.min(off + frameBytes, payload.length))
          md.reset()
          Row(id, idx.toLong, frame.length.toLong,
            md.digest(frame).map("%02x".format(_)).mkString)
        }
      }
    }
    spark.createDataFrame(out, frameSchema)
  }

  private val resizeSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("sig_hex", StringType)))

  /** "Resize" stub: nearest-neighbor downsample of the payload byte stream
    * to a fixed `target`-byte signature (out[i] = payload[floor(i*len/target)]),
    * hex-encoded. A real pipeline would decode pixels and resample here; the
    * deterministic byte form keeps the exact shape (fixed-size output per
    * row, per-partition batch loop) testable end-to-end against a SQL
    * oracle. Rows shorter than `target` bytes produce no signature (null). */
  def resizeStub(
      spark: SparkSession, df: DataFrame, idCol: String, target: Int): DataFrame = {
    val rows = df.select(col(idCol).cast(LongType), col("payload"))
    val out = rows.rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        val sig =
          if (payload == null || payload.length < target) null
          else {
            val b = new Array[Byte](target)
            var i = 0
            while (i < target) {
              b(i) = payload((i.toLong * payload.length / target).toInt)
              i += 1
            }
            b.map("%02x".format(_)).mkString
          }
        Row(id, sig)
      }
    }
    spark.createDataFrame(out, resizeSchema)
  }

  /** Per-partition feature extraction over (id, payload) rows: byte length,
    * header peek, content hash, stubbed decode feature. The MessageDigest is
    * allocated once per partition — the setup-amortization pattern a real
    * decoder needs. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    val rows = df.select(col(idCol).cast(LongType), col("payload"))
    val out = rows.rdd.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { r =>
        val id = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        if (payload == null) Iterator.empty else Iterator.single {
        md.reset()
        val hex = md.digest(payload).map("%02x".format(_)).mkString
        val header = payload.take(4).map("%02x".format(_)).mkString
        Row(id, payload.length.toLong, header, hex, stubDecode(payload))
        }
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** 64-bit average hash (aHash) of a payload: nearest-neighbor downsample
    * to 64 bytes (same sampling as [[resizeStub]] — a real pipeline would
    * decode to an 8×8 luma grid here), bit i set iff sample i is at or
    * above the sample mean. Robust to small local edits the way exact
    * digests (q73's frame md5) are not — the perceptual-dedup primitive.
    * Payloads shorter than 64 bytes hash to 0 (match-nothing sentinel). */
  private[multimodal] def aHashOf(payload: Array[Byte]): Long = {
    if (payload.length < 64) 0L
    else {
      val s = new Array[Int](64)
      var i = 0
      var sum = 0L
      while (i < 64) {
        s(i) = payload((i.toLong * payload.length / 64).toInt) & 0xFF
        sum += s(i)
        i += 1
      }
      var h = 0L
      i = 0
      while (i < 64) {
        if (s(i) * 64L >= sum) h |= (1L << i) // integer compare vs mean — no float
        i += 1
      }
      h
    }
  }

  /** (_id, simhash) aHash signatures per payload — one fused per-partition
    * pass, payload pruned before anything shuffles. */
  def aHashes(spark: SparkSession, df: DataFrame, idCol: String): DataFrame = {
    // Hash within the scan's own partitions — repartitioning first would
    // shuffle the full payload bytes, exactly what this pass exists to avoid.
    val rows = df.select(col(idCol).cast(LongType), col("payload"))
    val out = rows.rdd.mapPartitions(_.flatMap { r =>
      val payload = r.getAs[Array[Byte]](1)
      if (payload == null) Iterator.empty
      else Iterator.single(Row(r.getLong(0), aHashOf(payload)))
    })
    spark.createDataFrame(out, StructType(Seq(
      StructField("_id", LongType), StructField("simhash", LongType))))
  }

  /** Perceptual near-dup payload pairs (a < b, hamming <= maxHamming) via
    * the shared pigeonhole banding ([[graft.operators.SimHash.hammingPairs]]):
    * candidates from a (block, value) equi-join over 4×16-bit aHash blocks,
    * exact bit_count verify — never all-pairs, and the 0-hash short-payload
    * sentinel rows are dropped before banding. */
  def perceptualNearDups(
      spark: SparkSession, df: DataFrame, idCol: String,
      maxHamming: Int = 3): DataFrame =
    graft.operators.SimHash.hammingPairs(
      aHashes(spark, df, idCol).where(col("simhash") =!= 0L), maxHamming)
}
