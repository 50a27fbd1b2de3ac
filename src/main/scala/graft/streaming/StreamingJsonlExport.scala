package graft.streaming

import graft.sinks.JsonlSink
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming JSONL shard export — [[graft.sinks.JsonlSink]]'s ingest twin
  * (tenth streaming twin): each micro-batch is serialized and byte-packed
  * into batch-local shards exactly like the batch sink, published under
  * `shards/batch_id=<id>/shard=<n>/`, and described by a manifest
  * partition `manifest/batch_id=<id>` — so a training loader schedules
  * from the manifest across every batch, and the per-batch shard files
  * never rewrite (append-only at the directory level, the layout a
  * 100 TB rolling export needs: O(batch) work per batch, no compaction of
  * history).
  *
  * ==Replay safety==
  * `foreachBatch` is at-least-once; both writes are `batch_id`-keyed
  * dynamic-partition overwrites of a DETERMINISTIC recomputation (packing
  * is order-defined, serialization is value-defined), so any crash window
  * replays to the identical files. The manifest partition publishes LAST
  * as the commit point — shard files from a half-written batch are
  * invisible to manifest-driven readers and overwritten on replay (the
  * [[StreamingCdcIngest]] discipline).
  */
object StreamingJsonlExport {

  def shardsPath(path: String): String = s"$path/shards"
  def manifestPath(path: String): String = s"$path/manifest"

  /** Process one micro-batch idempotently (package-private so the replay
    * spec can stage crash windows directly). */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String,
      order: Seq[String], budgetBytes: Long): Unit = {
    val (manifest, packed) =
      JsonlSink.shardManifest(batch, order, budgetBytes, keepJson = true)
    packed
      .repartition(col("shard"))
      .sortWithinPartitions((col("shard") +: order.map(col)): _*)
      .select(col("_json").as("value"), lit(batchId).as("batch_id"), col("shard"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "shard").text(shardsPath(path))
    // manifest LAST — the commit point
    manifest.withColumn("batch_id", lit(batchId))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(manifestPath(path))
    ()
  }

  /** Start exporting `stream` as budget-sharded JSONL under `path`. */
  def appendSharded(
      stream: DataFrame, path: String, order: Seq[String],
      budgetBytes: Long): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, order, budgetBytes)
    }.start()

  /** All committed manifests: (batch_id, shard, n_rows, bytes, first_key,
    * last_key). */
  def readManifest(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(manifestPath(path))
      .withColumn("batch_id", col("batch_id").cast("long")) // dir-discovered int

  /** Raw exported lines of the COMMITTED batches only: shard dirs are
    * joined through the manifest, so a crashed batch's orphan files are
    * never served. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(shardsPath(path))
      .join(readManifest(spark, path).select("batch_id", "shard").distinct(),
        Seq("batch_id", "shard"), "left_semi")
      .select(col("batch_id").cast("long").as("batch_id"),
        col("shard").cast("long").as("shard"), col("value"))
}
