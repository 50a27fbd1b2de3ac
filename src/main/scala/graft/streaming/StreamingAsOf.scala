package graft.streaming

import graft.operators.AsOfJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Streaming as-of enrichment: attach to each streamed event the
  * latest-at-or-before row of a STATIC reference table (rates, quotes,
  * dimension history).
  *
  * Built on [[graft.plans.AsOfBroadcastJoinExec]], which is stateless per
  * micro-batch: the reference side is broadcast once per batch and the
  * stream side resolves matches with hash + binary search — no stream-side
  * shuffle, no state store, no watermark requirement (the static side never
  * changes mid-query, so every batch sees the same index). This is the
  * stream twin of the batch enrichment `q53_asof_broadcast`; stream-stream
  * as-of (both sides moving) needs watermarked state and is intentionally
  * out of scope here.
  *
  * Reference behavior: wrds2pg refreshes point-in-time research tables in
  * batch (wrds2pg/api.py:37 wrds_update); this operator is the
  * continuous version of the same enrichment.
  */
object StreamingAsOf {

  def enrich(
      stream: DataFrame,
      static: DataFrame,
      streamKey: String,
      staticKey: String,
      streamTime: String,
      staticTime: String,
      valueCols: Seq[String]): DataFrame =
    AsOfJoin.leftAsOfNative(
      stream, broadcast(static),
      streamKey, staticKey, streamTime, staticTime, valueCols)
}
