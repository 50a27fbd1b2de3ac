package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus ingestion: the recurring-crawl append loop, composed
  * from the batch operators — each micro-batch is deduped WITHIN itself
  * (first id per normalization fingerprint wins, the deterministic q30
  * argmax) and AGAINST everything previously persisted, then appended.
  *
  * The "seen" probe reads a FINGERPRINT SIDECAR (`<corpusPath>_fps`, one
  * 32-hex column, appended in lockstep with the corpus), not the corpus
  * itself — so steady-state ingest cost is batch size plus a scan of
  * fixed-width fingerprints, independent of document sizes; the corpus
  * text is write-only on this path. A corpus without a sidecar (legacy /
  * external bootstrap) gets one rebuilt from a single corpus scan on the
  * first batch.
  *
  * `foreachBatch` (not a stateful streaming join) is the right tool: the
  * dedup horizon here is "everything ever persisted", which must survive
  * restarts and is unbounded — state-store state is the wrong place for
  * it; the persisted fingerprint set is the state.
  */
object StreamingIngest {

  /** The sidecar directory path for a corpus. */
  def fingerprintPath(corpusPath: String): String = s"${corpusPath}_fps"

  private def hasParquet(spark: org.apache.spark.sql.SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
  }

  /** Start the append-deduped ingestion of `stream` into the parquet
    * corpus at `corpusPath` (+ fingerprint sidecar). The id column breaks
    * within-batch ties (lowest wins). */
  def appendDeduped(
      stream: DataFrame, corpusPath: String,
      idCol: String, textCol: String): StreamingQuery = {
    val cols = stream.columns.toSeq
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val fp = TextAnalysis.fingerprint(col(textCol))
      val fpsDir = fingerprintPath(corpusPath)
      // within-batch dedup: deterministic argmin on (id, payload) per fp
      val ordered = (idCol +: cols.filterNot(_ == idCol)).map(col)
      val batchDeduped = batch
        .groupBy(fp.as("_fp"))
        .agg(min(struct(ordered: _*)).as("_m"))
        .select(col("_fp") +: cols.map(c => col(s"_m.$c").as(c)): _*)
      // bootstrap a missing sidecar from the corpus (one-time legacy scan)
      if (!hasParquet(spark, fpsDir) && hasParquet(spark, corpusPath))
        spark.read.parquet(corpusPath).select(fp.as("_fp")).distinct()
          .write.mode(SaveMode.Append).parquet(fpsDir)
      val fresh =
        if (hasParquet(spark, fpsDir))
          batchDeduped.join(
            spark.read.parquet(fpsDir).select("_fp").distinct(),
            Seq("_fp"), "left_anti")
        else batchDeduped
      fresh.cache()
      try {
        fresh.select(cols.map(col): _*)
          .write.mode(SaveMode.Append).parquet(corpusPath)
        fresh.select("_fp").write.mode(SaveMode.Append).parquet(fpsDir)
      } finally fresh.unpersist()
      ()
    }.start()
  }
}
