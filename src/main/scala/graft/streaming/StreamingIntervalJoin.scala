package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream WINDOW join — the attribution/funnel join (every right
  * event within a horizon after its left event, e.g. "clicks within 1 h
  * of a view", the streaming face of [[graft.operators.IntervalJoin]] /
  * q87) — deliberately built on Spark's NATIVE stream-stream symmetric
  * hash join rather than custom state, because the built-in operator
  * expresses these semantics exactly (the architectural bargain
  * [[StreamStreamAsOf]] could NOT take: "latest at-or-before" needs
  * unbounded lookback and ordered finalization, so it carries custom
  * `flatMapGroupsWithState`; "all pairs within a bounded window" is
  * precisely what the planner's join-with-time-bounds state pruning was
  * built for).
  *
  * State bounds, derived by Spark from the join condition itself: the
  * left side retains `watermark + horizon`, the right side `watermark` —
  * both evicted by the engine, no TTL knobs, no state store code. Each
  * side shuffles once on the key (co-partitioned symmetric hash), so at
  * 100 TB/day the state is O(key-hot window), not O(history).
  */
object StreamingIntervalJoin {

  /** All (left, right) pairs with equal `key` and `rTs` in
    * `[lTs, lTs + horizonSec]`. Column names must be disjoint across the
    * two inputs (alias upstream); both time columns must be event-time
    * TIMESTAMPs.
    *
    * @param watermarkDelay max expected lateness on both streams */
  def within(
      left: DataFrame, right: DataFrame, leftKey: String, rightKey: String,
      lTs: String, rTs: String, horizonSec: Long,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    require(horizonSec >= 0, "need horizonSec >= 0")
    val l = left.withWatermark(lTs, watermarkDelay)
    val r = right.withWatermark(rTs, watermarkDelay)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rTs) >= col(lTs) &&
        col(rTs) <= col(lTs) + expr(s"INTERVAL $horizonSec SECONDS"))
  }
}
