package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event inside a user's funnel stream (projected input schema). */
case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** Per-user funnel state between micro-batches (epoch micros):
  * `stepTimes(i)` is the finalized first-touch time of step i (funnel
  * progress so far), `pending` buffers events still above the watermark. */
case class FunnelState(stepTimes: Seq[Long], pending: Seq[(Long, String)])

/** A completed conversion, emitted once per user. */
case class FunnelOut(user_id: Long, t_first: Timestamp, t_converted: Timestamp)

/** Structured Streaming twin of [[graft.operators.Funnel]]: per-user
  * first-touch funnel with strict ordering and an optional per-step
  * horizon, emitting one row when a user completes the last step.
  *
  * Correctness forces the same bargain as [[StreamStreamAsOf]]: first-touch
  * means the MINIMUM qualifying event time, and an out-of-order earlier
  * event can still lower that minimum (shifting every later horizon
  * window), so events buffer per user until the watermark passes them and
  * are folded through the step machine in event-time order only then —
  * the streaming result equals the batch operator's on the same data,
  * spec-checked against the same Scala model the batch fuzz uses.
  *
  * Scale design: state per user is the fixed step-time vector plus the
  * events inside the watermark delay — O(user's recent traffic), not
  * O(history); converted users drop their state entirely. The only shuffle
  * is the groupByKey on user.
  */
object StreamingFunnel {

  /** @param steps      ordered event types (length >= 1)
    * @param horizonSec optional max seconds between consecutive steps
    * @param watermarkDelay max expected event lateness */
  def conversions(
      events: DataFrame,
      steps: Seq[String],
      horizonSec: Option[Long] = None,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelOut] = {
    require(steps.nonEmpty, "need at least one funnel step")
    val spark = events.sparkSession
    import spark.implicits._
    val horizonUs = horizonSec.map(_ * 1000000L)
    val stepArr = steps.toIndexedSeq

    events
      .select(col("user_id").cast("long").as("user_id"),
        col("ts").cast("timestamp").as("ts"), col("event_type").cast("string").as("event_type"))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(us / 1000)
            t.setNanos(((us % 1000000L) * 1000L).toInt)
            t
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val prev = state.getOption.getOrElse(FunnelState(Nil, Nil))
          val pending = prev.pending ++
            batch.map(e => (toUs(e.ts), e.event_type)).toSeq

          // Fold every finalized event (<= watermark) through the step
          // machine in event-time order; keep the rest buffered.
          val (ripe, stillPending) = pending.partition(_._1 <= wmUs)
          var times = prev.stepTimes
          ripe.sortBy(identity).foreach { case (us, typ) =>
            val i = times.length
            if (i < stepArr.length && typ == stepArr(i)) {
              val ok =
                if (i == 0) true
                else us > times.last && horizonUs.forall(h => us - times.last <= h)
              if (ok) times = times :+ us
            }
          }

          val out =
            if (times.length == stepArr.length && prev.stepTimes.length < stepArr.length)
              Iterator.single(FunnelOut(userId, toTs(times.head), toTs(times.last)))
            else Iterator.empty

          // Converted (and drained) users need no state, and a user who
          // never entered the funnel carries nothing worth keeping. A
          // STALLED funnel's progress vector, however, must be retained:
          // first-touch semantics pin t0 to the user's earliest step-0
          // event, so forgetting a dead funnel would let a later step-0
          // event restart it and convert where the batch operator would
          // not. The cost is one short vector per stalled user — the same
          // unbounded-keys trade [[StreamStreamAsOf]] documents, and an
          // idle-TTL could bound it identically if ever needed.
          val converted = times.length == stepArr.length
          if (stillPending.isEmpty && (converted || times.isEmpty)) {
            state.remove()
          } else {
            state.update(FunnelState(times, stillPending))
            // wake when the watermark passes the earliest buffered event so
            // finalization needs no further traffic on this user
            stillPending.map(_._1).minOption.foreach { us =>
              state.setTimeoutTimestamp(us / 1000L + 1L)
            }
          }
          out
      }
  }
}
