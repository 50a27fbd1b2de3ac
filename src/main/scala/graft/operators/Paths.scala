package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Top user paths — the "what do sessions actually do" product-analytics
  * staple next to [[Funnel]] (which checks ONE prescribed sequence; this
  * discovers the frequent ones): each session's first `maxSteps` events
  * in time order join into a path string, paths rank by frequency.
  *
  * Scale shape: [[Sessionize.assign]]'s one key shuffle + window passes,
  * then ONE (key, session) aggregate whose `sort_array`/`slice`/
  * `array_join` run inside the aggregate's projection (no second
  * window), then a path-keyed count that combines map-side (path
  * cardinality ≪ session count) and a TakeOrdered top-k — no global
  * sort. Determinism: events sort by (time, tiebreak), ties impossible
  * by construction; path strings are engine-reproducible, so the whole
  * pipeline carries an exact SQL oracle.
  */
object Paths {

  /** Top-`k` session paths by frequency (ties to the lexicographically
    * smaller path): (path, n_sessions). */
  def topPaths(
      events: DataFrame, key: String, time: String, typeCol: String,
      gapSeconds: Long, tiebreak: String, maxSteps: Int, k: Int): DataFrame = {
    require(maxSteps > 0 && k > 0, "need maxSteps > 0 and k > 0")
    val stepCol = graft.functions.TimeCols.epochMicros(events, time)
    Sessionize.assign(events, key, time, gapSeconds, tiebreak)
      .groupBy(col(key), col("session_id"))
      .agg(collect_list(struct(stepCol.as("_t"),
        col(tiebreak).as("_tb"), col(typeCol).as("_e"))).as("_evs"))
      .select(array_join(
        transform(slice(array_sort(col("_evs")), 1, maxSteps), e => e.getField("_e")),
        "->").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }
}
