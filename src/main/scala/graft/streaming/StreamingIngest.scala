package graft.streaming

import graft.operators.TextAnalysis
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus ingestion: the recurring-crawl append loop, composed
  * from the batch operators — each micro-batch is deduped WITHIN itself
  * (first id per normalization fingerprint wins, the deterministic q30
  * argmax) and AGAINST everything previously persisted, then appended.
  *
  * The "seen" probe reads a FINGERPRINT SIDECAR (`<corpusPath>_fps`, one
  * 32-hex column partitioned by ingest batch), not the corpus itself — so
  * steady-state ingest cost is batch size plus a scan of fixed-width
  * fingerprints, independent of document sizes; the corpus text is
  * write-only on this path. A corpus without a sidecar (legacy / external
  * bootstrap) gets one rebuilt from a single corpus scan on the first
  * batch.
  *
  * `foreachBatch` (not a stateful streaming join) is the right tool: the
  * dedup horizon here is "everything ever persisted", which must survive
  * restarts and is unbounded — state-store state is the wrong place for
  * it; the persisted fingerprint set is the state.
  *
  * ==Replay safety (exactly-once)==
  * foreachBatch is at-least-once: after a crash the SAME batchId is
  * re-run, so every write below is keyed by batchId and convergent under
  * replay — no commit marker needed, a replay simply re-produces the same
  * end state from any crash point:
  *
  *  1. the fresh set is computed against the sidecar EXCLUDING this
  *     batch's own partition, so a half-written prior attempt can neither
  *     shrink nor grow it (deterministic source replay + the deterministic
  *     argmin make it bit-identical);
  *  1. corpus files are staged then RENAMED to deterministic
  *     `graft_batch<id>_part<i>` names (this batch's old names deleted
  *     first), so a re-publish replaces rather than duplicates — the same
  *     rename-as-publish assumption Spark's own file commit protocol
  *     makes;
  *  1. the sidecar partition `batch_id=<id>` is written LAST with dynamic
  *     partition overwrite — only a fully published batch ever marks its
  *     fingerprints seen, so the crash-between-writes window can neither
  *     duplicate documents (corpus republish overwrites) nor lose them
  *     (fingerprints land only after the documents did).
  */
object StreamingIngest {

  /** The sidecar directory path for a corpus. */
  def fingerprintPath(corpusPath: String): String = s"${corpusPath}_fps"

  /** Sidecar partition value used for fingerprints bootstrapped from a
    * pre-existing corpus (no ingest batch of their own). */
  val BootstrapBatchId: Long = -1L

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def hasParquet(spark: SparkSession, path: String): Boolean = {
    val (fs, p) = fsOf(spark, path)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName.endsWith(".parquet") ||
        (st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    }
  }

  /** Process one micro-batch idempotently (see class doc for the replay
    * analysis). Package-private so the replay spec can drive it directly —
    * a real crash window can't be staged through MemoryStream. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, corpusPath: String,
      idCol: String, textCol: String): Unit = {
    val spark = batch.sparkSession
    val cols = batch.columns.toSeq
    val fp = TextAnalysis.fingerprint(col(textCol))
    val fpsDir = fingerprintPath(corpusPath)

    // within-batch dedup: deterministic argmin on (id, payload) per fp
    val ordered = (idCol +: cols.filterNot(_ == idCol)).map(col)
    val batchDeduped = batch
      .groupBy(fp.as("_fp"))
      .agg(min(struct(ordered: _*)).as("_m"))
      .select(col("_fp") +: cols.map(c => col(s"_m.$c").as(c)): _*)

    // Bootstrap a missing sidecar from the corpus (one-time legacy scan).
    // Marker-gated rather than existence-gated: a crash mid-rebuild leaves
    // a partial batch_id=-1 partition, and dynamic overwrite of that same
    // partition on the retry converges; only a completed rebuild (or a
    // first batch with no pre-existing corpus) sets the marker.
    val (fpsFs, _) = fsOf(spark, fpsDir)
    val bootMarker = new Path(s"${fpsDir}_bootstrapped")
    if (!fpsFs.exists(bootMarker)) {
      if (hasParquet(spark, corpusPath))
        spark.read.parquet(corpusPath).select(fp.as("_fp")).distinct()
          .withColumn("batch_id", lit(BootstrapBatchId))
          .write.mode(SaveMode.Overwrite)
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("batch_id").parquet(fpsDir)
      fpsFs.create(bootMarker, true).close()
    }

    // cross-batch dedup: anti-join against every fingerprint EXCEPT this
    // batch's own (possibly half-written) sidecar partition
    val fresh =
      if (hasParquet(spark, fpsDir))
        batchDeduped.join(
          spark.read.parquet(fpsDir)
            .where(col("batch_id") =!= lit(batchId))
            .select("_fp").distinct(),
          Seq("_fp"), "left_anti")
      else batchDeduped
    fresh.cache()
    try {
      // corpus publish: stage, then rename to deterministic per-batch names
      // (replacing any prior attempt's files for this batch)
      val stageDir = s"${corpusPath}_stage"
      fresh.select(cols.map(col): _*)
        .write.mode(SaveMode.Overwrite).parquet(stageDir)
      val (fs, corpus) = fsOf(spark, corpusPath)
      fs.mkdirs(corpus)
      val prefix = s"graft_batch${batchId}_"
      fs.listStatus(corpus).filter(_.getPath.getName.startsWith(prefix))
        .foreach(st => fs.delete(st.getPath, false))
      val parts = fs.listStatus(new Path(stageDir)).map(_.getPath)
        .filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
      parts.zipWithIndex.foreach { case (p, i) =>
        fs.rename(p, new Path(corpus, s"${prefix}part$i.snappy.parquet"))
      }
      fs.delete(new Path(stageDir), true)
      // sidecar LAST: this batch's fingerprints become visible only once
      // its documents are fully published
      fresh.select("_fp").withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(fpsDir)
    } finally fresh.unpersist()
    ()
  }

  /** Start the append-deduped ingestion of `stream` into the parquet
    * corpus at `corpusPath` (+ fingerprint sidecar). The id column breaks
    * within-batch ties (lowest wins). */
  def appendDeduped(
      stream: DataFrame, corpusPath: String,
      idCol: String, textCol: String): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, corpusPath, idCol, textCol)
    }.start()
}
