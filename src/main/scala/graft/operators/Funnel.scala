package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** First-touch funnel analysis over an event stream.
  *
  * Step 1 is each user's earliest `steps(0)` event; step i+1 is their
  * earliest `steps(i)` event STRICTLY after their step-i time (optionally
  * within `horizonSec` of it). The result is the classic funnel report:
  * one row per step with the number of users who reached it.
  *
  * Scale design: one filtered aggregate + one equi-join per step. Each
  * step's scan reads only that step's event type (the filter pushes to the
  * source), the join key is the user — so the big event table is never
  * windowed or sorted as a whole, and the running per-user frame stays one
  * row per surviving user. The final report is a single-row aggregate over
  * that frame, exploded to long form. No driver-side loops over data; the
  * step loop only builds the plan.
  */
object Funnel {

  /** @param steps      ordered event types forming the funnel (length >= 1;
    *                    repeated types allowed — strict `>` keeps them sane)
    * @param horizonSec  optional max seconds between consecutive steps */
  def funnelCounts(
      events: DataFrame, userCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], horizonSec: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("_u")).agg(min(col(tsCol)).as("_t0"))
    steps.zipWithIndex.drop(1).foreach { case (stepType, i) =>
      val prev = s"_t${i - 1}"
      val nxt = events.where(col(typeCol) === stepType)
        .select(col(userCol).as("_nu"), col(tsCol).as("_nts"))
      val within = horizonSec.map(h =>
        col("_nts") <= col(prev) + expr(s"INTERVAL $h SECONDS")).getOrElse(lit(true))
      val prevCols = (0 until i).map(j => max(col(s"_t$j")).as(s"_t$j"))
      cur = cur
        .join(nxt, col("_u") === col("_nu") && col("_nts") > col(prev) && within, "left")
        .groupBy(col("_u"))
        .agg(prevCols.head, prevCols.tail :+ min(col("_nts")).as(s"_t$i"): _*)
    }
    val one = cur.agg(
      count(col("_t0")).as("_c0"),
      steps.indices.drop(1).map(i => count(col(s"_t$i")).as(s"_c$i")): _*)
    val entries = steps.zipWithIndex.map { case (s, i) =>
      struct(lit(s).as("step"), lit(i + 1).as("step_idx"), col(s"_c$i").as("users"))
    }
    one.select(explode(array(entries: _*)).as("_e")).select(col("_e.*"))
  }
}
