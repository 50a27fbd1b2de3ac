package graft.operators

import graft.functions.TimeCols
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: events more than `gapSeconds` apart (per key)
  * start a new session.
  *
  * Scale design (SURVEY §4): one shuffle on the key, then two in-order
  * window passes (lag → running sum) — no self-join, no range join. Gap
  * comparison uses exact microsecond integers ([[graft.functions.TimeCols
  * .epochMicros]], NTZ-safe) so the
  * boundary semantics are bit-identical to the SQL oracle.
  */
object Sessionize {

  /** Adds a 1-based `session_id` column per key.
    *
    * @param tiebreak extra ordering column for events with identical
    *                 timestamps (keeps session assignment deterministic)
    */
  def assign(
      events: DataFrame,
      key: String,
      time: String,
      gapSeconds: Long,
      tiebreak: String): DataFrame = {
    val order = Window.partitionBy(key).orderBy(col(time).asc, col(tiebreak).asc)
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val micros = TimeCols.epochMicros(events, time)
    val prev = lag(micros, 1).over(order)
    val isNew = when(prev.isNull || micros - prev > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("_new", isNew)
      .withColumn("session_id", sum(col("_new")).over(run))
      .drop("_new")
  }

  /** Per-session summary: event count, start, end. */
  def summarize(
      events: DataFrame,
      key: String,
      time: String,
      gapSeconds: Long,
      tiebreak: String): DataFrame =
    assign(events, key, time, gapSeconds, tiebreak)
      .groupBy(col(key), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col(time)).as("session_start"),
        max(col(time)).as("session_end"))
}
