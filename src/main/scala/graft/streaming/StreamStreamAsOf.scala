package graft.streaming

import java.sql.Timestamp

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** A finalized enrichment: the left event with the latest right value at or
  * before its event time (None when no prior right row exists). */
case class AsOfStreamOut(id: Long, key: Long, ts: Timestamp, v: Option[Double])

/** Generic envelope: one row of either stream, exactly one payload set. */
case class AsOfEnv[K, L, R](key: K, ts: Timestamp, left: Option[L], right: Option[R])

/** Per-key buffers between micro-batches (epoch micros). Lefts await
  * finalization; rights are the reference history still able to win. */
case class AsOfEnvState[L, R](lefts: Seq[(Long, L)], rights: Seq[(Long, R)])

/** A finalized left payload with its matched right payload (if any). */
case class AsOfJoined[K, L, R](key: K, ts: Timestamp, left: L, right: Option[R])

/** Row shapes for the untyped [[StreamStreamAsOf.enrich]] convenience
  * (top-level: encoder codegen needs public constructors). */
case class AsOfLeftEvt(id: Long, key: Long, ts: Timestamp)
case class AsOfRightRef(key: Long, ts: Timestamp, v: Double)

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
  *
  * [[enrichTyped]] is the generic operator (any key / payload case classes,
  * encoders derived from `TypeTag`s); [[enrich]] is the untyped DataFrame
  * convenience over (id, key, ts) × (key, ts, v) columns.
  */
object StreamStreamAsOf {

  /** Payload-generic stream-stream as-of enrichment.
    *
    * @param left      event stream to enrich (each row emitted exactly once)
    * @param right     reference stream ("latest at-or-before" side)
    * @param leftKey/leftTs, rightKey/rightTs  key + event-time extractors
    * @param watermarkDelay max expected lateness on BOTH streams — a single
    *        watermark rides the union, not one per side: with per-side
    *        watermarks the global minimum stalls whenever one stream goes
    *        quiet, deferring every finalization indefinitely
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
  def enrichTyped[K: TypeTag, L: TypeTag, R: TypeTag](
      left: Dataset[L], right: Dataset[R],
      leftKey: L => K, leftTs: L => Timestamp,
      rightKey: R => K, rightTs: R => Timestamp,
      watermarkDelay: String = "10 minutes",
      idleStateTtlMs: Option[Long] = None,
      toleranceUs: Option[Long] = None): Dataset[AsOfJoined[K, L, R]] = {
    require(toleranceUs.forall(_ >= 0L), "tolerance must be >= 0")
    implicit val envEnc: Encoder[AsOfEnv[K, L, R]] = ExpressionEncoder()
    implicit val stEnc: Encoder[AsOfEnvState[L, R]] = ExpressionEncoder()
    implicit val outEnc: Encoder[AsOfJoined[K, L, R]] = ExpressionEncoder()
    implicit val kEnc: Encoder[K] = ExpressionEncoder()

    val l = left.map(x => AsOfEnv[K, L, R](leftKey(x), leftTs(x), Some(x), None))
    val r = right.map(x => AsOfEnv[K, L, R](rightKey(x), rightTs(x), None, Some(x)))

    def toUs(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000) % 1000
    def toTs(us: Long): Timestamp = {
      val t = new Timestamp(us / 1000)
      t.setNanos(((us % 1000000L) * 1000L).toInt)
      t
    }

    l.union(r)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.key)
      .flatMapGroupsWithState[AsOfEnvState[L, R], AsOfJoined[K, L, R]](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: K, batch: Iterator[AsOfEnv[K, L, R]], state) =>
          val wmUs = state.getCurrentWatermarkMs() * 1000L

          val newLefts = Seq.newBuilder[(Long, L)]
          val newRights = Seq.newBuilder[(Long, R)]
          var sawData = false
          batch.foreach { e =>
            sawData = true
            e.left.foreach(p => newLefts += ((toUs(e.ts), p)))
            e.right.foreach(p => newRights += ((toUs(e.ts), p)))
          }
          val prev = state.getOption.getOrElse(AsOfEnvState[L, R](Nil, Nil))
          val st = AsOfEnvState(
            prev.lefts ++ newLefts.result(), prev.rights ++ newRights.result())

          // Finalize lefts the watermark has passed: every right row <= their
          // time has arrived, so the match is the batch operator's match.
          val (ready, pending) = st.lefts.partition(_._1 <= wmUs)
          val out = ready.sortBy(_._1).map { case (lt, payload) =>
            // latest at-or-before, then the tolerance gate — identical to the
            // batch execs (if the latest is too stale, every earlier one is)
            val m = st.rights.filter(_._1 <= lt).sortBy(_._1).lastOption
              .filter { case (rt, _) => toleranceUs.forall(lt - rt <= _) }
            AsOfJoined(key, toTs(lt), payload, m.map(_._2))
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
            state.update(AsOfEnvState(pending, rights))
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

  /** Untyped convenience: @param left (id, key, ts), @param right (key, ts, v);
    * see [[enrichTyped]] for the parameters and the state/eviction contract. */
  def enrich(
      left: DataFrame, right: DataFrame,
      watermarkDelay: String = "10 minutes",
      idleStateTtlMs: Option[Long] = None,
      toleranceUs: Option[Long] = None): Dataset[AsOfStreamOut] = {
    val spark = left.sparkSession
    import spark.implicits._
    val l = left
      .select(col("id").cast("long"), col("key").cast("long"), col("ts").cast("timestamp"))
      .as[AsOfLeftEvt]
    val r = right
      .select(col("key").cast("long"), col("ts").cast("timestamp"), col("v").cast("double"))
      .as[AsOfRightRef]
    enrichTyped[Long, AsOfLeftEvt, AsOfRightRef](
      l, r, _.key, _.ts, _.key, _.ts, watermarkDelay, idleStateTtlMs, toleranceUs)
      .map(j => AsOfStreamOut(j.left.id, j.key, j.ts, j.right.map(_.v)))
  }
}
