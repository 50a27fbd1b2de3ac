package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming twin of the sketch profile (`Sketches.profile` / q88):
  * per-group running distinct-estimate and row count over an unbounded
  * stream, refreshed every micro-batch.
  *
  * Scale design: `hll_sketch_agg` is a TypedImperativeAggregate, so the
  * state store holds ONE fixed-size HLL binary (2^lgK registers) plus a
  * long per group — state is bounded by group count, never by row or
  * distinct-value count, and each micro-batch merges its map-side partial
  * sketches into state exactly like the batch map-side combine. Update
  * output mode emits refreshed rows per batch; downstream can union the
  * latest per-group sketches into corpus totals with `hll_union_agg`
  * (same zero-rescan property as the batch path).
  */
object StreamingSketch {

  /** Running per-`groupCol` profile of a streaming DataFrame: row count
    * and HLL distinct estimate of `distinctCol`. Write with
    * `outputMode("update")` (a complete-mode sink also works for small
    * group counts). */
  def runningProfile(
      stream: DataFrame, groupCol: String, distinctCol: String,
      lgK: Int = 12): DataFrame =
    stream.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      hll_sketch_estimate(hll_sketch_agg(col(distinctCol), lit(lgK)))
        .as("approx_distinct"))
}
