package graft.sinks

import graft.operators.Packing
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Budget-sharded JSONL export — the pipeline-ending step that turns a
  * curated corpus into the newline-delimited shard files a training job
  * consumes, plus the manifest its data loader schedules from.
  *
  * Rows are serialized once with `to_json(struct(cols…))` (compact, null
  * fields kept explicit so an ANSI engine reproduces the bytes), weighted
  * by UTF-8 byte length + 1 (the newline), and packed into contiguous
  * byte-budgeted shards in caller order via [[Packing.packByBudget]] —
  * the distributed prefix sum, not a single-partition window. The write
  * repartitions BY the shard column so each `shard=` directory receives
  * exactly ONE file from exactly one task (the materialized-index layout
  * discipline: parallel, no small-file spray), with rows in order inside
  * each file. `sum(manifest.bytes)` equals the on-disk shard bytes
  * exactly — the spec asserts it against the filesystem.
  *
  * Scale shape: one range shuffle (the packing) + one hash shuffle on
  * `shard` for the write; the manifest aggregate reuses the packing's
  * shuffle files (same RDD lineage, boundaries sampled once).
  */
object JsonlSink {

  /** Write `df` under `path` as `shards/shard=N/` JSONL files of at most
    * `budgetBytes` each (a single over-budget row still lands in exactly
    * one shard) plus a one-file `manifest/` parquet sidecar; returns the
    * manifest: (shard, n_rows, bytes, first_key, last_key over
    * `order.head`).
    *
    * `bytes` is always the UNCOMPRESSED line total — the loader-budget
    * unit — so with `codec` set (e.g. `Some("gzip")`; shard files gain
    * the codec extension and `readSharded` decompresses transparently)
    * the manifest arithmetic and the DuckDB oracle are unchanged; only
    * the disk-equality invariant is codec-free.
    *
    * @param order columns forming a TOTAL order (add a unique tiebreak) */
  def writeSharded(
      df: DataFrame, path: String, order: Seq[String],
      budgetBytes: Long, codec: Option[String] = None): DataFrame = {
    require(order.nonEmpty, "need at least one order column")
    val manifest = shardManifest(df, order, budgetBytes, keepJson = true)
    val writer = manifest._2
      .repartition(col("shard"))
      .sortWithinPartitions((col("shard") +: order.map(col)): _*)
      .select(col("_json").as("value"), col("shard"))
      .write.mode("overwrite").partitionBy("shard")
    codec.fold(writer)(c => writer.option("compression", c)).text(s"$path/shards")
    val m = manifest._1
    m.coalesce(1).write.mode("overwrite").parquet(s"$path/manifest")
    m
  }

  /** The manifest alone (no files written) — the dry-run/planning view
    * and the oracle surface: identical packing arithmetic to
    * [[writeSharded]]. */
  def manifestOnly(df: DataFrame, order: Seq[String], budgetBytes: Long): DataFrame =
    shardManifest(df, order, budgetBytes, keepJson = false)._1

  private[graft] def shardManifest(
      df: DataFrame, order: Seq[String], budgetBytes: Long,
      keepJson: Boolean): (DataFrame, DataFrame) = {
    val json = to_json(
      struct(df.columns.map(col).toIndexedSeq: _*),
      // keep nulls so the byte weights are reproducible by engines that
      // always emit null fields (the DuckDB oracle does)
      java.util.Collections.singletonMap("ignoreNullFields", "false"))
    val js = df.select(
      (order.map(col) :+ json.as("_json")).toIndexedSeq: _*)
      .withColumn("_w", octet_length(col("_json")).cast("long") + 1L)
    val packed = Packing.packByBudget(js, order, "_w", budgetBytes, "_cum", "shard")
    val m = packed.groupBy("shard").agg(
      count(lit(1)).as("n_rows"),
      sum("_w").as("bytes"),
      min(col(order.head)).as("first_key"),
      max(col(order.head)).as("last_key"))
      .orderBy("shard")
    (m, packed)
  }

  /** Read back an exported corpus: (shard, value) raw lines — callers
    * parse with `from_json` against their schema (JSONL keeps no schema
    * of its own). */
  def readSharded(spark: SparkSession, path: String): DataFrame =
    spark.read.text(s"$path/shards")
      .select(col("shard").cast("long").as("shard"), col("value"))
}
