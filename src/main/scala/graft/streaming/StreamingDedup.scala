package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of exact dedup (`Dedup.exact` / q30): drop documents whose
  * normalization fingerprint was already seen within the watermark horizon.
  *
  * Scale design: state is one small row (fingerprint hash) per distinct doc
  * inside the horizon, partitioned by fingerprint — the only shuffle.
  * `dropDuplicatesWithinWatermark` lets the engine evict state once the
  * watermark passes, so state is bounded by (arrival rate × horizon), not
  * by the stream's full history. */
object StreamingDedup {

  /** @param timeCol event-time column used for the watermark
    * @param horizon how long a fingerprint is remembered (watermark delay) */
  def distinctDocs(docs: DataFrame, textCol: String, timeCol: String, horizon: String): DataFrame =
    docs
      .withColumn("_fp", TextAnalysis.fingerprint(col(textCol)))
      .withWatermark(timeCol, horizon)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp")
}
