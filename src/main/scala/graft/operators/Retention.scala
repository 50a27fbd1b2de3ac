package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention analysis over an event stream.
  *
  * Users are cohorted by the week of their first event (weeks are
  * `datediff(day, epochDate) div 7` — calendar-free integer math that any
  * engine reproduces bit-for-bit); the report counts, for every
  * (cohort_week, week_offset), the distinct users from that cohort active
  * in that week.
  *
  * Scale shape: the raw event table collapses to DISTINCT (user, week)
  * FIRST — a hash aggregate with map-side combine, the only pass over the
  * full data. Cohorts are a per-user min over that reduced set, the join
  * back is user-keyed on week-level rows, and the final count groups
  * (cohort, offset). Every shuffle moves user×week rows, never raw events.
  */
object Retention {

  /** @param epochDate ISO date literal anchoring week 0 (e.g. "2024-01-01") */
  def weeklyCohorts(
      events: DataFrame, userCol: String, tsCol: String, epochDate: String): DataFrame = {
    val week = expr(s"datediff(cast($tsCol as date), date'$epochDate') div 7")
    val uw = events.select(col(userCol).as("_u"), week.as("_w")).distinct()
    val cohort = uw.groupBy("_u").agg(min("_w").as("cohort_week"))
    uw.join(cohort, "_u")
      .groupBy(col("cohort_week"), (col("_w") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("users")) // (_u, _w) is distinct → count == distinct users
  }
}
