package graft.streaming

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming corpus ingestion: the recurring-crawl append loop, composed
  * from the batch operators — each micro-batch is deduped WITHIN itself
  * (first id per normalization fingerprint wins, the deterministic q30
  * argmax) and AGAINST the already-persisted corpus
  * ([[Dedup.incrementalDedup]]'s fingerprint anti-join), then appended.
  *
  * Scale shape per micro-batch: the corpus side reduces to DISTINCT
  * fingerprints before the anti-join (its text never leaves the scan), the
  * batch side is small in steady state, and the append writes only
  * survivors — so ingest cost tracks batch size plus one fingerprint
  * column scan of the corpus, never a corpus rewrite. Maintaining the
  * fingerprint set as its own compact sidecar table (or bucketed table,
  * [[graft.operators.Bucketing]]) removes even that scan's width.
  *
  * `foreachBatch` (not a stateful streaming join) is the right tool: the
  * dedup horizon here is "everything ever persisted", which must survive
  * restarts and is unbounded — state-store state is the wrong place for
  * it; the corpus itself is the state.
  */
object StreamingIngest {

  /** Start the append-deduped ingestion of `stream` into the parquet
    * corpus at `corpusPath`. The id column breaks within-batch ties
    * (lowest wins). */
  def appendDeduped(
      stream: DataFrame, corpusPath: String,
      idCol: String, textCol: String): StreamingQuery = {
    val cols = stream.columns.toSeq
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      val spark = batch.sparkSession
      val fp = TextAnalysis.fingerprint(col(textCol))
      // within-batch dedup: deterministic argmin on (id, payload) per fp
      val ordered = (idCol +: cols.filterNot(_ == idCol)).map(col)
      val batchDeduped = batch
        .groupBy(fp.as("_fp"))
        .agg(min(struct(ordered: _*)).as("_m"))
        .select(cols.map(c => col(s"_m.$c").as(c)): _*)
      val fs = new org.apache.hadoop.fs.Path(corpusPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val corpusExists = fs.exists(new org.apache.hadoop.fs.Path(corpusPath)) &&
        fs.listStatus(new org.apache.hadoop.fs.Path(corpusPath))
          .exists(_.getPath.getName.endsWith(".parquet"))
      val fresh =
        if (corpusExists)
          Dedup.incrementalDedup(batchDeduped, spark.read.parquet(corpusPath), textCol)
        else batchDeduped
      fresh.write.mode("append").parquet(corpusPath)
      ()
    }.start()
  }
}
