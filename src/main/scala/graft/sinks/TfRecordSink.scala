package graft.sinks

import java.util.zip.CRC32C

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TFRecord shard export/ingest — the delivery format training jobs
  * actually mount (the public TensorFlow record framing): each record is
  *
  *   uint64-LE length · uint32-LE masked_crc32c(length bytes)
  *   · payload · uint32-LE masked_crc32c(payload)
  *
  * with `masked(c) = ((c >>> 15) | (c << 17)) + 0xa282ead8` (the
  * published mask; CRC32C itself ships in the JDK since 9). Pairs with
  * [[graft.operators.Sampling.shuffleShards]] /
  * [[graft.operators.Packing]]: shuffle or budget-pack upstream, export
  * the shards here, feed the manifest to the loader.
  *
  * Scale shape (the [[JsonlSink]] discipline): the write repartitions BY
  * the shard column and streams each shard into exactly ONE
  * `shard=N/data.tfrecord` file (a task holding several shards rolls
  * files on the boundary — ordered within, no small-file spray); the
  * manifest is a per-shard aggregate computed from the same pass.
  * Reading is one task per shard file with BOTH CRCs verified per
  * record — corruption refuses loudly, never yields silent truncation.
  */
object TfRecordSink {

  /** The published TFRecord CRC mask. */
  private[graft] def maskedCrc32c(bytes: Array[Byte]): Int = {
    val c = new CRC32C()
    c.update(bytes, 0, bytes.length)
    val v = c.getValue.toInt // CRC32C fits in 32 bits
    ((v >>> 15) | (v << 17)) + 0xa282ead8
  }

  private def le64(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
    b
  }

  private def le32(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = ((v >>> (8 * i)) & 0xFF).toByte; i += 1 }
    b
  }

  private def readLe64(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v |= (b(i) & 0xFFL) << (8 * i); i += 1 }
    v
  }

  private def readLe32(b: Array[Byte]): Int = {
    var v = 0
    var i = 0
    while (i < 4) { v |= (b(i) & 0xFF) << (8 * i); i += 1 }
    v
  }

  /** On-disk bytes of one record: 16 bytes of framing + the payload. */
  def recordBytes(payloadLen: Long): Long = 16L + payloadLen

  /** Export `payloadCol` (binary) as TFRecord shard files under
    * `path/shards/shard=N/data.tfrecord`, rows ordered by `orderCols`
    * within each shard; returns (and persists under `path/manifest`) the
    * manifest (shard, n_rows, bytes). Overwrite semantics: any previous
    * shards/manifest under `path` are replaced. */
  def writeSharded(
      df: DataFrame, path: String, payloadCol: String,
      shardCol: String, orderCols: Seq[String]): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val spark = df.sparkSession
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val root = new Path(path)
    val fs = root.getFileSystem(conf)
    fs.delete(new Path(s"$path/shards"), true)
    fs.delete(new Path(s"$path/manifest"), true)

    val rows = df
      .select((col(shardCol).cast("long").as("_shard") +:
        orderCols.map(col) :+ col(payloadCol).cast("binary").as("_p")): _*)
      .repartition(col("_shard"))
      .sortWithinPartitions((col("_shard") +: orderCols.map(col)): _*)
      .select(col("_shard"), col("_p"))
    // ship the SESSION Hadoop conf into the write tasks (ADVICE r6 — a
    // fresh executor-side Configuration() drops credential/endpoint
    // settings the driver-side delete above used)
    val confBc = spark.sparkContext.broadcast(
      new graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration))
    val manifestRows = rows.queryExecution.toRdd.mapPartitions { it =>
      // executor-side FS; one open file per shard, rolled on the boundary
      val conf2 = confBc.value.value
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var cur = -1L
      var stream: org.apache.hadoop.fs.FSDataOutputStream = null
      var nRows = 0L
      var nBytes = 0L
      def close(): Unit = if (stream != null) {
        stream.close(); out += ((cur, nRows, nBytes)); stream = null
      }
      it.foreach { ir =>
        // a null (or null-casting) shard value would read as 0 via
        // getLong and silently land in shard=0 — refuse loudly instead
        // (ADVICE r6; the repo convention is loud refusal, and a quiet
        // mis-shard changes training data)
        require(!ir.isNullAt(0),
          s"TfRecordSink: null shard value in '$shardCol' — shard ids " +
            "must be non-null longs (fix the shard column or filter nulls)")
        val shard = ir.getLong(0)
        // null payloads emit no record (the null-text convention every
        // text operator here follows); TFRecord has no null notion and
        // an empty record would silently change training data
        val payload = if (ir.isNullAt(1)) null else ir.getBinary(1)
        if (payload != null) {
        if (shard != cur) {
          close()
          cur = shard; nRows = 0L; nBytes = 0L
          val p = new Path(s"$path/shards/shard=$shard/data.tfrecord")
          stream = p.getFileSystem(conf2).create(p, true)
        }
        val len = le64(payload.length.toLong)
        stream.write(len)
        stream.write(le32(maskedCrc32c(len)))
        stream.write(payload)
        stream.write(le32(maskedCrc32c(payload)))
        nRows += 1
        nBytes += recordBytes(payload.length.toLong)
        }
      }
      close()
      out.iterator
    }.collect()

    val manifest = spark.createDataFrame(
      java.util.Arrays.asList(
        manifestRows.sortBy(_._1).map(t => Row(t._1, t._2, t._3)): _*),
      StructType(Seq(
        StructField("shard", LongType, nullable = false),
        StructField("n_rows", LongType, nullable = false),
        StructField("bytes", LongType, nullable = false))))
    manifest.coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    manifest
  }

  /** Read exported shards back: (shard, record binary), one task per
    * shard file, records in file order; BOTH CRCs verified per record —
    * a flipped byte fails loudly with the offending shard and offset. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val root = new Path(s"$path/shards")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(root), s"no TFRecord shards under $path")
    val files = fs.listStatus(root)
      .filter(_.getPath.getName.startsWith("shard="))
      .map(d => (d.getPath.getName.stripPrefix("shard=").toLong,
        new Path(d.getPath, "data.tfrecord").toString))
      .sortBy(_._1).toSeq
    require(files.nonEmpty, s"no shard directories under $path/shards")
    val confBc = spark.sparkContext.broadcast(
      new graft.core.SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)) // session conf, not a fresh default (ADVICE r6)
    val rdd = spark.sparkContext
      .parallelize(files, files.size)
      .flatMap { case (shard, file) =>
        val conf2 = confBc.value.value
        val p = new Path(file)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(p.getFileSystem(conf2).open(p), 1 << 16))
        // close with the task if the consumer stops early (limit/take)
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit] { _ =>
            try in.close() catch { case _: java.io.IOException => () }
          })
        new Iterator[Row] {
          private var offset = 0L
          private var nextRec: Array[Byte] = fetch()
          private def fail(msg: String): Nothing =
            throw new IllegalArgumentException(
              s"TFRecord corruption in $file at offset $offset: $msg")
          private def fetch(): Array[Byte] = {
            val lenB = new Array[Byte](8)
            val first = in.read(lenB, 0, 1)
            if (first < 0) { in.close(); return null }
            in.readFully(lenB, 1, 7)
            val crcL = new Array[Byte](4)
            in.readFully(crcL)
            if (readLe32(crcL) != maskedCrc32c(lenB)) fail("length CRC mismatch")
            val len = readLe64(lenB)
            if (len > Int.MaxValue) fail(s"record of $len bytes")
            val payload = new Array[Byte](len.toInt)
            in.readFully(payload)
            val crcD = new Array[Byte](4)
            in.readFully(crcD)
            if (readLe32(crcD) != maskedCrc32c(payload)) fail("payload CRC mismatch")
            offset += recordBytes(len)
            payload
          }
          def hasNext: Boolean = nextRec != null
          def next(): Row = {
            val r = Row(shard, nextRec)
            nextRec = fetch()
            r
          }
        }
      }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("record", BinaryType, nullable = false))))
  }
}
