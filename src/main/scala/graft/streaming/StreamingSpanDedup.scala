package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One window site flowing through the duplicate detector. */
case class SpanSiteIn(k: Long, doc_id: Long, pos: Int)

/** Per-window-key state between micro-batches — FIXED SIZE, the scale
  * property: the first site seen and whether it has been emitted. No
  * buffering, no per-site history. */
case class SpanKeyState(firstId: Long, firstPos: Int, emittedFirst: Boolean)

/** A site whose window text occurs at more than one site across the
  * stream's whole history. */
case class SpanSiteOut(doc_id: Long, pos: Int)

/** Structured Streaming twin of [[graft.operators.SpanDedup]]'s hashed
  * scale path (`dupSpanSitesHashed`): incremental corpus-crossing
  * duplicated-span detection — boilerplate, licenses, quoted chunks —
  * over a document stream, without ever re-scanning history.
  *
  * Each arriving document explodes into its stride-`s` `l`-char window
  * keys (pure codegen: `sequence` + `substring` + `xxhash64` — the SAME
  * key as the batch operator, so streaming output is set-equal to the
  * batch sites on the union of all batches, spec-pinned). The stateful
  * core groups by window key: the FIRST site of a key is held back
  * (most windows are never duplicated — emitting them would be wrong,
  * and batch parity demands the first site surface only once the key
  * proves duplicated); when a second site arrives, the held first site
  * is emitted RETROACTIVELY alongside it, and every later site streams
  * straight through. Exactly the batch contract: a key with n ≥ 2 sites
  * contributes all n sites, a unique key contributes none.
  *
  * Scale design: state per distinct window key is one fixed-size triple
  * — the streaming analogue of the batch two-phase hash spine, held in
  * the state store (RocksDB on a real cluster) instead of a shuffle.
  * The only shuffle is the groupByKey on the 8-byte window key. State
  * grows with the DISTINCT-window vocabulary of the stream, not its
  * volume — unbounded over an infinite stream (the same unbounded-keys
  * trade [[StreamStreamAsOf]] documents); a dedup horizon can bound it
  * via idle TTL ([[dupSpanSites]]' `idleTtl`), trading cross-horizon
  * recall, which is how production boilerplate detectors behave anyway.
  *
  * Like the batch hashed path, sites are keyed by `xxhash64` of the
  * window text with no string re-confirmation (a corpus-wide collision
  * needs ~2^32 distinct windows); the batch exact path remains the
  * oracle-comparable form. */
object StreamingSpanDedup {

  /** Duplicated (doc_id, pos) sites over a streaming corpus, Append
    * mode. `idleTtl` (e.g. "7 days"), when set, expires window keys
    * idle longer than the TTL via processing-time timeout — bounding
    * state for horizon-scoped dedup at the cost of missing duplicates
    * that straddle a quiet gap longer than the TTL. */
  def dupSpanSites(
      docs: DataFrame, idCol: String, textCol: String, l: Int, s: Int,
      idleTtl: Option[String] = None): Dataset[SpanSiteOut] = {
    require(l >= 2, "need window length l >= 2")
    require(s >= 1, "need stride s >= 1")
    val spark = docs.sparkSession
    import spark.implicits._
    val timeout =
      if (idleTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).cast("string").as("_t"))
      .where(length(col("_t")) >= l)
      .select(col("doc_id"),
        explode(sequence(lit(1), length(col("_t")) - (l - 1), lit(s))).as("pos"),
        col("_t"))
      .select(xxhash64(expr(s"substring(_t, pos, $l)")).as("k"),
        col("doc_id"), col("pos").cast("int").as("pos"))
      .as[SpanSiteIn]
      .groupByKey(_.k)
      .flatMapGroupsWithState[SpanKeyState, SpanSiteOut](OutputMode.Append, timeout)(
        transition(idleTtl))
  }

  /** The per-key state transition, extracted so the spec can drive it
    * directly under an injected clock (`TestGroupState` with explicit
    * `batchProcessingTimeMs` / `hasTimedOut`) — the TTL-expiry branch is
    * unreachable from a MemoryStream without hours of wall-clock. */
  private[graft] def transition(idleTtl: Option[String])(
      k: Long, batch: Iterator[SpanSiteIn],
      state: GroupState[SpanKeyState]): Iterator[SpanSiteOut] = {
    val _ = k
    if (state.hasTimedOut) {
      // idle-TTL expiry: drop the key's memory (horizon semantics)
      state.remove()
      Iterator.empty
    } else {
      // deterministic fold order inside a batch (sites of one key
      // can arrive from any partition of the upstream explode)
      val sites = batch.toSeq.sortBy(e => (e.doc_id, e.pos))
      val out = state.getOption match {
        case None if sites.lengthCompare(1) == 0 =>
          // a key's lone first site: hold it back — emitting now
          // would mark a (probably) unique window duplicated
          state.update(SpanKeyState(sites.head.doc_id, sites.head.pos,
            emittedFirst = false))
          Iterator.empty
        case None =>
          // key born duplicated inside one batch: all sites out
          val h = sites.head
          state.update(SpanKeyState(h.doc_id, h.pos, emittedFirst = true))
          sites.iterator.map(e => SpanSiteOut(e.doc_id, e.pos))
        case Some(st) =>
          // known key: new sites stream through; the held-back
          // first site surfaces retroactively exactly once
          val retro =
            if (st.emittedFirst) Iterator.empty
            else Iterator.single(SpanSiteOut(st.firstId, st.firstPos))
          if (!st.emittedFirst)
            state.update(st.copy(emittedFirst = true))
          retro ++ sites.iterator.map(e => SpanSiteOut(e.doc_id, e.pos))
      }
      idleTtl.foreach(state.setTimeoutDuration)
      out
    }
  }
}
