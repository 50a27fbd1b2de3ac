package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** One row of either input, tagged by side (0 = left/event, 1 = right/ref). */
case class AsOfStreamIn(side: Int, key: Long, ts: Timestamp, id: Long, v: Double)

/** Per-key buffers between micro-batches (epoch micros). Lefts await
  * finalization; rights are the reference history still able to win. */
case class AsOfStreamState(lefts: Seq[(Long, Long)], rights: Seq[(Long, Double)])

/** A finalized enrichment: the left event with the latest right value at or
  * before its event time (None when no prior right row exists). */
case class AsOfStreamOut(id: Long, key: Long, ts: Timestamp, v: Option[Double])

/** Stream-STREAM as-of join — both sides moving, watermarked state.
  *
  * The stream-static case is [[StreamingAsOf]] (stateless broadcast). With a
  * moving right side, correctness forces buffering: a left event at time t
  * is only final once the watermark passes t (no right row <= t can still
  * arrive), so lefts buffer until the watermark releases them — the same
  * bargain Spark's own stream-stream interval join makes, specialized to
  * as-of ("latest at-or-before") semantics, which Spark does not offer.
  *
  * Scale design (SURVEY §4): state per key is O(pending lefts within the
  * watermark delay) + O(rights above the watermark) + exactly ONE right row
  * below it — each trigger evicts every older right row, because a right row
  * older than the newest sub-watermark right can never again be "latest
  * at-or-before" for any future left (future lefts have t > watermark).
  * Emission is append-mode and deterministic: each left is emitted exactly
  * once, with the value the batch operator would have attached.
  */
object StreamStreamAsOf {

  /** @param left  streaming DataFrame with (id, key, ts)
    * @param right streaming DataFrame with (key, ts, v)
    * @param watermarkDelay max expected lateness on BOTH streams
    * @param idleStateTtlMs optional event-time TTL for keys with no pending
    *        lefts: exact as-of semantics need the latest right row retained
    *        FOREVER (unbounded lookback), which at billions of keys is a
    *        real cost — with a TTL, a key idle longer than this loses its
    *        retained match and later lefts see None past the horizon. Off
    *        (None) by default = exact.
    * @param toleranceUs optional bounded staleness in event-time MICROSECONDS,
    *        mirroring the batch execs' tolerance: a left matches only a right
    *        within `lt - rt <= tolerance`, else None. Doubles as a state
    *        bound — a right more than `tolerance` below the watermark can
    *        never match any future left, so it is evicted outright instead
    *        of being retained forever. */
  def enrich(
      left: DataFrame, right: DataFrame,
      watermarkDelay: String = "10 minutes",
      idleStateTtlMs: Option[Long] = None,
      toleranceUs: Option[Long] = None): Dataset[AsOfStreamOut] = {
    require(toleranceUs.forall(_ >= 0L), "tolerance must be >= 0")
    val spark = left.sparkSession
    import spark.implicits._

    val l = left
      .select(col("id").cast("long"), col("key").cast("long"), col("ts").cast("timestamp"))
      .select(lit(0).as("side"), col("key"), col("ts"), col("id"), lit(0.0).as("v"))
    val r = right
      .select(col("key").cast("long"), col("ts").cast("timestamp"), col("v").cast("double"))
      .select(lit(1).as("side"), col("key"), col("ts"), lit(0L).as("id"), col("v"))

    // ONE watermark over the union, not one per side: with per-side
    // watermarks the global minimum stalls whenever one stream goes quiet,
    // deferring every finalization indefinitely. A single event-time budget
    // covers lateness on both streams; rows later than it are dropped —
    // the standard lateness trade, stated once instead of hidden in a min().
    l.unionByName(r)
      .withWatermark("ts", watermarkDelay)
      .as[AsOfStreamIn]
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfStreamState, AsOfStreamOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[AsOfStreamIn], state) =>
          def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
          def toTs(us: Long): Timestamp = {
            val t = new Timestamp(us / 1000)
            t.setNanos(((us % 1000000L) * 1000L).toInt)
            t
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L

          val newLefts = Seq.newBuilder[(Long, Long)]
          val newRights = Seq.newBuilder[(Long, Double)]
          var sawData = false
          batch.foreach { e =>
            sawData = true
            if (e.side == 0) newLefts += ((toUs(e.ts), e.id))
            else newRights += ((toUs(e.ts), e.v))
          }
          val prev = state.getOption.getOrElse(AsOfStreamState(Nil, Nil))
          val st = AsOfStreamState(
            prev.lefts ++ newLefts.result(), prev.rights ++ newRights.result())

          // Finalize lefts the watermark has passed: every right row <= their
          // time has arrived, so the match is the batch operator's match.
          val (ready, pending) = st.lefts.partition(_._1 <= wmUs)
          val out = ready.sortBy(identity).map { case (lt, id) =>
            // latest at-or-before, then the tolerance gate — identical to the
            // batch execs (if the latest is too stale, every earlier one is)
            val m = st.rights.filter(_._1 <= lt).sortBy(_._1).lastOption
              .filter { case (rt, _) => toleranceUs.forall(lt - rt <= _) }
            AsOfStreamOut(id, key, toTs(lt), m.map(_._2))
          }

          // Evict rights: keep everything above the watermark plus the single
          // latest at-or-below it (the only one still able to win). With a
          // tolerance, even that one goes once it is > tolerance below the
          // watermark: any future left has lt > wm, so lt - rt > tolerance.
          val (rOld, rLive) = st.rights.partition(_._1 <= wmUs)
          val keptOld = rOld.sortBy(_._1).lastOption
            .filter { case (rt, _) => toleranceUs.forall(wmUs - rt <= _) }
          val rights = (keptOld.toSeq ++ rLive).sortBy(_._1)

          val idleExpired = idleStateTtlMs.isDefined && !sawData &&
            state.hasTimedOut && pending.isEmpty
          if ((pending.isEmpty && rights.isEmpty) || idleExpired) {
            state.remove()
          } else {
            state.update(AsOfStreamState(pending, rights))
            // Wake when the watermark passes the earliest pending left (so
            // finalization never needs another row on this key), else — with
            // a TTL — when the key has sat idle past the horizon.
            pending.map(_._1).minOption match {
              case Some(us) => state.setTimeoutTimestamp(us / 1000L + 1L)
              case None => idleStateTtlMs.foreach { ttl =>
                // idle horizon counts from the key's own last right row (the
                // global watermark may lag far behind its event times)
                val lastMs = rights.map(_._1 / 1000L).maxOption
                  .getOrElse(state.getCurrentWatermarkMs())
                state.setTimeoutTimestamp(
                  math.max(lastMs + ttl, state.getCurrentWatermarkMs() + 1L))
              }
            }
          }
          out.iterator
      }
  }
}
