package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event inside a user's stream (projected input schema). */
case class SessionEvent(user_id: Long, ts: Timestamp)

/** Open-session state carried between micro-batches (epoch micros). */
case class SessionState(startUs: Long, endUs: Long, n: Long)

/** A closed session emitted downstream. */
case class SessionOut(
    user_id: Long,
    session_start: Timestamp,
    session_end: Timestamp,
    n_events: Long)

/** Structured Streaming twins of the batch operators: gap sessionization
  * (same semantics as [[graft.operators.Sessionize]] — a gap strictly
  * greater than `gapSeconds` starts a new session) and a watermarked
  * tumbling-window aggregation (same semantics as batch `q22_time_window`).
  *
  * Scale design (SURVEY §4): state is partitioned by user key — the only
  * shuffle is the groupByKey; per-key state is one open session (3 longs),
  * so state size is O(active users), not O(events). Sessions close either
  * by an in-batch gap or by event-time timeout once the watermark passes
  * `session_end + gap`, so state cannot grow unboundedly with stragglers.
  */
object EventSessions {

  /** Gap-based sessionization over a (possibly streaming) DataFrame with
    * `user_id` and event-time column `ts`. Emits a session only when it is
    * CLOSED (by a later event or by watermark timeout) — append semantics. */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapSeconds * 1000000L

    events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(us / 1000)
            t.setNanos(((us % 1000000L) * 1000L).toInt)
            t
          }
          def close(s: SessionState): SessionOut =
            SessionOut(userId, toTs(s.startUs), toTs(s.endUs), s.n)

          if (batch.isEmpty && state.hasTimedOut) {
            // Watermark passed end+gap with no new events: session is final.
            val out = state.getOption.map(close).toList
            state.remove()
            out.iterator
          } else {
            val closed = List.newBuilder[SessionOut]
            var cur = state.getOption.orNull
            batch.map(e => toUs(e.ts)).toArray.sorted.foreach { us =>
              if (cur == null) cur = SessionState(us, us, 1L)
              else if (us - cur.endUs > gapUs) { closed += close(cur); cur = SessionState(us, us, 1L) }
              else if (us < cur.startUs) cur = cur.copy(startUs = us, n = cur.n + 1) // late, in-gap
              else cur = SessionState(cur.startUs, math.max(cur.endUs, us), cur.n + 1)
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.endUs / 1000L + gapSeconds * 1000L)
            }
            closed.result().iterator
          }
      }
  }

  /** Tumbling-window event counts/sums with a watermark — the streaming
    * twin of batch `q22_time_window`. Append mode: a window row is emitted
    * once the watermark passes its end. */
  def windowedAgg(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_events"), col("sum_value"))
}
