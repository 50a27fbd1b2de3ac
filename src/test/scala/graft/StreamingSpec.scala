package graft

import java.sql.Timestamp

import graft.streaming.{EventSessions, SessionOut}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

// payloads for the generic stream-stream as-of spec (top-level so the
// TypeTag-derived encoders resolve)
case class SpecTrade(tradeId: String, sym: String, ts: Timestamp, qty: Int)
case class SpecQuote(sym: String, ts: Timestamp, bid: Double, ask: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming as-of enrichment against a static reference table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val rates = Seq( // (ccy, valid_from, rate)
      ("eur", ts("2024-01-01 00:00:00"), 1.09),
      ("eur", ts("2024-01-02 00:00:00"), 1.10),
      ("jpy", ts("2024-01-01 12:00:00"), 0.007)
    ).toDF("ccy", "valid_from", "rate")
    val input = MemoryStream[(String, Timestamp, Double)]
    val enriched = graft.streaming.StreamingAsOf.enrich(
      input.toDF().toDF("pay_ccy", "pay_ts", "amount"), rates,
      streamKey = "pay_ccy", staticKey = "ccy",
      streamTime = "pay_ts", staticTime = "valid_from",
      valueCols = Seq("rate"))
    val q = enriched.writeStream
      .format("memory").queryName("asof_out").outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ("eur", ts("2024-01-01 06:00:00"), 100.0), // before Jan-2 bump → 1.09
        ("eur", ts("2024-01-02 06:00:00"), 100.0), // after → 1.10
        ("jpy", ts("2024-01-01 06:00:00"), 500.0)) // before first jpy rate → null
      q.processAllAvailable()
      input.addData(("jpy", ts("2024-01-01 18:00:00"), 500.0)) // second batch → 0.007
      q.processAllAvailable()
      val out = spark.table("asof_out")
        .select("pay_ccy", "pay_ts", "rate").collect()
        .map(r => (r.getString(0), r.getTimestamp(1), Option(r.get(2)))).toSet
      assert(out == Set(
        ("eur", ts("2024-01-01 06:00:00"), Some(1.09)),
        ("eur", ts("2024-01-02 06:00:00"), Some(1.10)),
        ("jpy", ts("2024-01-01 06:00:00"), None),
        ("jpy", ts("2024-01-01 18:00:00"), Some(0.007))))
    } finally q.stop()
  }

  test("stream-stream as-of: watermark finalization, eviction, timeout") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, Timestamp)] // (id, key, ts)
    val rights = MemoryStream[(Long, Timestamp, Double)] // (key, ts, v)
    val out = graft.streaming.StreamStreamAsOf.enrich(
      lefts.toDF().toDF("id", "key", "ts"),
      rights.toDF().toDF("key", "ts", "v"),
      watermarkDelay = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("ss_asof").outputMode(OutputMode.Append()).start()
    try {
      def collected(): Map[Long, Option[Double]] =
        spark.table("ss_asof").as[graft.streaming.AsOfStreamOut]
          .collect().map(o => o.id -> o.v).toMap
      // B1: a quote then a trade after it — nothing final yet (wm behind)
      rights.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      lefts.addData((1L, 1L, ts("2024-01-01 10:05:00")))
      q.processAllAvailable()
      // B2: trade at 11:00 runs with wm=10:05 → id=1 finalizes with 1.0
      lefts.addData((2L, 1L, ts("2024-01-01 11:00:00")))
      q.processAllAvailable()
      assert(collected().get(1L).contains(Some(1.0)))
      // B3: quote at 11:30 runs with wm=11:00 → id=2 finalizes against the
      // 10:00 quote (the 11:30 one is after its event time)
      rights.addData((1L, ts("2024-01-01 11:30:00"), 2.0))
      q.processAllAvailable()
      assert(collected().get(2L).contains(Some(1.0)))
      // B4/B5: pending trades on key 1 (12:30) and key 2 (no quotes ever)
      lefts.addData((3L, 1L, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      lefts.addData((4L, 2L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      // B6: key-3 traffic advances the wm → key-1's TIMEOUT fires and id=3
      // must see the evicted-down-to-latest 11:30 quote
      lefts.addData((5L, 3L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      assert(collected().get(3L).contains(Some(2.0)))
      // B7: wm passes 13:00 → key-2's timeout finalizes id=4 with no match
      lefts.addData((6L, 3L, ts("2024-01-01 15:00:00")))
      q.processAllAvailable()
      assert(collected().get(4L).contains(None))
    } finally q.stop()
  }

  test("stream-stream as-of: generic payloads and string keys round-trip intact") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val trades = MemoryStream[SpecTrade]
    val quotes = MemoryStream[SpecQuote]
    val out = graft.streaming.StreamStreamAsOf.enrichTyped[String, SpecTrade, SpecQuote](
      trades.toDS(), quotes.toDS(),
      _.sym, _.ts, _.sym, _.ts,
      watermarkDelay = "0 seconds")
    val q = out.writeStream
      .format("memory").queryName("ss_asof_typed").outputMode(OutputMode.Append()).start()
    try {
      quotes.addData(SpecQuote("acme", ts("2024-01-01 10:00:00"), 99.5, 100.5))
      trades.addData(SpecTrade("t1", "acme", ts("2024-01-01 10:05:00"), 7))
      trades.addData(SpecTrade("t2", "zorg", ts("2024-01-01 10:06:00"), 3))
      q.processAllAvailable()
      // advance the watermark past both trades so they finalize
      trades.addData(SpecTrade("t3", "other", ts("2024-01-01 11:00:00"), 1))
      q.processAllAvailable()
      trades.addData(SpecTrade("t4", "other", ts("2024-01-01 12:00:00"), 1))
      q.processAllAvailable()
      val got = spark.table("ss_asof_typed")
        .as[graft.streaming.AsOfJoined[String, SpecTrade, SpecQuote]]
        .collect().map(j => j.left.tradeId -> j).toMap
      // full payloads survive the state round-trip on both sides
      assert(got("t1").left == SpecTrade("t1", "acme", ts("2024-01-01 10:05:00"), 7))
      assert(got("t1").right.contains(SpecQuote("acme", ts("2024-01-01 10:00:00"), 99.5, 100.5)))
      assert(got("t1").key == "acme")
      // a key with no quote history finalizes with None
      assert(got("t2").right.isEmpty)
    } finally q.stop()
  }

  test("stream-stream as-of: tolerance bounds staleness and evicts stale rights") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, Timestamp)]
    val rights = MemoryStream[(Long, Timestamp, Double)]
    val out = graft.streaming.StreamStreamAsOf.enrich(
      lefts.toDF().toDF("id", "key", "ts"),
      rights.toDF().toDF("key", "ts", "v"),
      watermarkDelay = "0 seconds",
      toleranceUs = Some(60L * 60 * 1000000L)) // 1 hour
    val q = out.writeStream
      .format("memory").queryName("ss_asof_tol").outputMode(OutputMode.Append()).start()
    try {
      def got(): Map[Long, Option[Double]] =
        spark.table("ss_asof_tol").as[graft.streaming.AsOfStreamOut]
          .collect().map(o => o.id -> o.v).toMap
      rights.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      // within tolerance (30 min after the quote) and beyond it (2 h after)
      lefts.addData((1L, 1L, ts("2024-01-01 10:30:00")))
      lefts.addData((2L, 1L, ts("2024-01-01 12:00:00")))
      q.processAllAvailable()
      // advance wm past both trades to finalize them
      lefts.addData((3L, 2L, ts("2024-01-01 13:00:00")))
      q.processAllAvailable()
      lefts.addData((4L, 2L, ts("2024-01-01 14:00:00")))
      q.processAllAvailable()
      assert(got().get(1L).contains(Some(1.0)), got().toString) // 30 min stale: match
      assert(got().get(2L).contains(None), got().toString)      // 2 h stale: no match
    } finally q.stop()
  }

  test("stream-stream as-of: idle-state TTL expires a quiet key's history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val lefts = MemoryStream[(Long, Long, Timestamp)]
    val rights = MemoryStream[(Long, Timestamp, Double)]
    val out = graft.streaming.StreamStreamAsOf.enrich(
      lefts.toDF().toDF("id", "key", "ts"),
      rights.toDF().toDF("key", "ts", "v"),
      watermarkDelay = "0 seconds",
      idleStateTtlMs = Some(30L * 60 * 1000)) // 30 min
    val q = out.writeStream
      .format("memory").queryName("ss_asof_ttl").outputMode(OutputMode.Append()).start()
    try {
      // key 1 gets one quote, then goes idle; key 5 traffic drives the wm
      rights.addData((1L, ts("2024-01-01 10:00:00"), 1.0))
      lefts.addData((9L, 5L, ts("2024-01-01 10:00:00")))
      q.processAllAvailable()
      lefts.addData((10L, 5L, ts("2024-01-01 11:30:00")))
      q.processAllAvailable()
      lefts.addData((11L, 5L, ts("2024-01-01 12:00:00"))) // wm 11:30 > 10:30 TTL
      q.processAllAvailable()
      // key 1's retained quote is gone: a late trade finds nothing
      lefts.addData((7L, 1L, ts("2024-01-01 12:30:00")))
      q.processAllAvailable()
      lefts.addData((12L, 5L, ts("2024-01-01 13:30:00")))
      q.processAllAvailable()
      val got = spark.table("ss_asof_ttl").as[graft.streaming.AsOfStreamOut]
        .collect().map(o => o.id -> o.v).toMap
      assert(got.get(7L).contains(None), got.toString)
    } finally q.stop()
  }

  test("streaming funnel: converts once, respects horizon, survives out-of-order delivery") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val out = graft.streaming.StreamingFunnel.conversions(
      input.toDF().toDF("user_id", "ts", "event_type"),
      steps = Seq("view", "click", "purchase"),
      horizonSec = Some(3600L), watermarkDelay = "30 minutes")
    val q = out.writeStream
      .format("memory").queryName("funnel_out").outputMode(OutputMode.Append()).start()
    try {
      def got(): Map[Long, (Timestamp, Timestamp)] =
        spark.table("funnel_out").as[graft.streaming.FunnelOut]
          .collect().map(o => o.user_id -> (o.t_first, o.t_converted)).toMap
      // B1: both users enter the funnel; wm trails 30 min behind
      input.addData((1L, ts("2024-01-01 10:00:00"), "view"))
      input.addData((2L, ts("2024-01-01 10:00:00"), "view"))
      q.processAllAvailable()
      // B2: user 1's purchase arrives BEFORE its click → wm 10:15
      input.addData((1L, ts("2024-01-01 10:45:00"), "purchase"))
      q.processAllAvailable()
      assert(got().isEmpty, "nothing finalizes until the watermark passes it")
      // B3: the out-of-order click (10:30 > wm 10:15, inside the lateness
      // budget) plus user 2's beyond-horizon steps → wm 12:00
      input.addData((1L, ts("2024-01-01 10:30:00"), "click"))
      input.addData((2L, ts("2024-01-01 12:00:00"), "click"))
      input.addData((2L, ts("2024-01-01 12:30:00"), "purchase"))
      q.processAllAvailable()
      q.processAllAvailable()
      assert(got() == Map(
        1L -> (ts("2024-01-01 10:00:00"), ts("2024-01-01 10:45:00"))), got().toString)
      // B4: wm passes user 2's purchase — 2h-stale click stays rejected
      input.addData((9L, ts("2024-01-01 14:00:00"), "view"))
      q.processAllAvailable()
      input.addData((9L, ts("2024-01-01 15:00:00"), "view"))
      q.processAllAvailable()
      assert(got().size == 1, got().toString)
      // a lone late purchase must NOT re-emit user 1 (state dropped on
      // conversion; re-entry needs a fresh view→click→purchase chain)
      input.addData((1L, ts("2024-01-01 15:30:00"), "purchase"))
      input.addData((9L, ts("2024-01-01 16:00:00"), "view"))
      q.processAllAvailable()
      assert(got().size == 1)
    } finally q.stop()
  }

  test("streaming funnel matches the batch Scala model on a replayed slice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val types = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(7L)
    val base = 1704103200000L // 2024-01-01 10:00 UTC
    val rows = (1 to 400).map { _ =>
      (rnd.nextInt(25).toLong,
        new Timestamp(base + rnd.nextInt(4 * 3600) * 1000L),
        types(rnd.nextInt(types.length)))
    }
    val horizon = Some(1800L)
    val input = MemoryStream[(Long, Timestamp, String)]
    // 4h lateness budget = the whole event window: arbitrary cross-batch
    // disorder, yet nothing is ever dropped as late
    val out = graft.streaming.StreamingFunnel.conversions(
      input.toDF().toDF("user_id", "ts", "event_type"),
      steps = types, horizonSec = horizon, watermarkDelay = "4 hours")
    val q = out.writeStream
      .format("memory").queryName("funnel_replay").outputMode(OutputMode.Append()).start()
    try {
      rows.grouped(60).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      // advance the watermark far past every buffered event
      input.addData((999L, new Timestamp(base + 100L * 3600 * 1000), "view"))
      q.processAllAvailable()
      input.addData((999L, new Timestamp(base + 101L * 3600 * 1000), "view"))
      q.processAllAvailable()
      val streamed = spark.table("funnel_replay")
        .as[graft.streaming.FunnelOut].collect().map(_.user_id).toSet
      // same per-user fold model as the batch fuzz spec
      val expected = rows.groupBy(_._1).collect(Function.unlift { case (u, evs) =>
        var prev: Option[Long] = None
        var alive = true
        types.foreach { t =>
          if (alive) {
            val cand = evs.filter(_._3 == t).map(_._2.getTime)
              .filter(ms => prev.forall(p =>
                ms > p && horizon.forall(h => ms <= p + h * 1000)))
            if (cand.nonEmpty) prev = Some(cand.min) else alive = false
          }
        }
        if (alive) Some(u) else None
      }).toSet
      assert(streamed == expected,
        s"streamed=$streamed expected=$expected diff=${streamed.diff(expected)}/${expected.diff(streamed)}")
    } finally q.stop()
  }

  test("streaming sessionize: gap close within batch, timeout close via watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val sessions = EventSessions.sessionize(
      input.toDF().toDF("user_id", "ts"), gapSeconds = 1800, watermarkDelay = "0 seconds")
    val q = sessions.writeStream
      .format("memory").queryName("sess_out").outputMode(OutputMode.Append()).start()
    try {
      // Batch 1: user 7 has two sessions split by a >30min gap (first closes
      // in-batch); user 9 opens one.
      input.addData(
        7L -> ts("2024-01-01 00:00:00"),
        7L -> ts("2024-01-01 00:10:00"),
        7L -> ts("2024-01-01 01:00:00"),
        9L -> ts("2024-01-01 00:05:00"))
      q.processAllAvailable()
      // the >30min in-batch gap closes user 7's first session immediately
      // (user 9's may also close here via the post-batch watermark bump)
      val afterB1 = spark.table("sess_out").as[SessionOut].collect().toSet
      assert(afterB1.contains(
        SessionOut(7L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L)))

      // Batch 2: push the watermark far past end+gap → open sessions time out.
      input.addData(1L -> ts("2024-01-01 09:00:00"))
      q.processAllAvailable()
      // Batch 3: one more batch so timed-out state is flushed.
      input.addData(1L -> ts("2024-01-01 23:00:00"))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[SessionOut].collect().toSet
      assert(all.contains(SessionOut(7L, ts("2024-01-01 01:00:00"), ts("2024-01-01 01:00:00"), 1L)))
      assert(all.contains(SessionOut(9L, ts("2024-01-01 00:05:00"), ts("2024-01-01 00:05:00"), 1L)))
    } finally q.stop()
  }

  test("streaming sessionize matches batch Sessionize on a replayed slice") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = "/root/testdata/sf0.001"
    val events = graft.core.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("ts")).orderBy("ts").limit(500)
    val rows = events.as[(Long, Timestamp)].collect()

    val input = MemoryStream[(Long, Timestamp)]
    val q = EventSessions.sessionize(
        input.toDF().toDF("user_id", "ts"), gapSeconds = 1800, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_replay")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows.toIndexedSeq)
      q.processAllAvailable()
      // A far-future event forces every open session to close.
      input.addData(-1L -> ts("2030-01-01 00:00:00"))
      q.processAllAvailable()
      input.addData(-1L -> ts("2031-01-01 00:00:00"))
      q.processAllAvailable()
      val streamed = spark.table("sess_replay").as[SessionOut].collect()
        .filter(_.user_id >= 0)
        .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet

      val batch = graft.operators.Sessionize
        .summarize(events.withColumn("event_id", col("user_id")), "user_id", "ts", 1800, "event_id")
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming dedup drops re-seen fingerprints within the horizon") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String, Timestamp)]
    val q = graft.streaming.StreamingDedup.distinctDocs(
        input.toDF().toDF("doc_id", "text", "ts"), "text", "ts", horizon = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox", ts("2024-01-01 00:00:00")),
        (2L, "The quick brown fox!", ts("2024-01-01 00:05:00")), // same fingerprint
        (3L, "something else entirely", ts("2024-01-01 00:10:00")))
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().toSet
      assert(ids.size === 2)
      assert(ids.contains(3L))
      assert((ids & Set(1L, 2L)).size === 1) // exactly one of the dup pair survives
    } finally q.stop()
  }

  test("streaming windowed agg emits closed tumbling windows") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Double)]
    val q = EventSessions.windowedAgg(
        input.toDF().toDF("ts", "value"), windowLength = "1 hour", watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("win_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        ts("2024-01-01 00:10:00") -> 1.5,
        ts("2024-01-01 00:50:00") -> 2.0,
        ts("2024-01-01 01:10:00") -> 4.0)
      q.processAllAvailable()
      input.addData(ts("2024-01-01 03:00:00") -> 0.0) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("win_out")
        .as[(Timestamp, Long, Double)].collect().toSet
      assert(rows.contains((ts("2024-01-01 00:00:00"), 2L, 3.5)))
      assert(rows.contains((ts("2024-01-01 01:00:00"), 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming ingest appends only fingerprint-fresh docs across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = java.nio.file.Files.createTempDirectory("graft-ingest").toString
    // seed corpus: one existing doc
    Seq((100L, "existing corpus doc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpus)
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingIngest.appendDeduped(
      input.toDF().toDF("doc_id", "text"), corpus, "doc_id", "text")
    try {
      // batch 1: a corpus dup, an internal dup pair (min id wins), a fresh doc
      input.addData(
        1L -> "Existing corpus DOC!", // normalizes to the seeded fingerprint
        3L -> "brand new doc",
        2L -> "brand NEW doc",        // internal dup of 3 → 2 wins (min id)
        4L -> "another fresh one")
      q.processAllAvailable()
      val after1 = spark.read.parquet(corpus).as[(Long, String)].collect().toMap
      assert(after1.keySet == Set(100L, 2L, 4L), s"got ${after1.keySet}")
      // batch 2: replays batch 1 + one genuinely new doc
      input.addData(2L -> "brand new doc", 4L -> "another fresh one", 9L -> "truly new")
      q.processAllAvailable()
      val after2 = spark.read.parquet(corpus).as[(Long, String)].collect().toMap
      assert(after2.keySet == Set(100L, 2L, 4L, 9L), s"got ${after2.keySet}")
      // the fingerprint sidecar tracks the corpus 1:1 (bootstrap included),
      // so steady-state probes never touch corpus text
      val fps = spark.read
        .parquet(graft.streaming.StreamingIngest.fingerprintPath(corpus))
        .distinct().count()
      assert(fps == 4L, s"sidecar should hold 4 distinct fingerprints, got $fps")
    } finally q.stop()
  }

  test("streaming ingest batch replay is exactly-once from any crash window") {
    import spark.implicits._
    val corpus = java.nio.file.Files.createTempDirectory("graft-ingest-replay").toString
    Seq((100L, "seed doc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(corpus)
    def docs() = spark.read.parquet(corpus)
      .as[(Long, String)].collect().sorted.toSeq
    val b0 = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    graft.streaming.StreamingIngest.processBatch(b0, 0L, corpus, "doc_id", "text")
    val after0 = docs()
    assert(after0.map(_._1) == Seq(1L, 2L, 100L))
    // full replay of a committed batch (crash before checkpoint commit):
    // converges to the identical corpus, no duplicates
    graft.streaming.StreamingIngest.processBatch(b0, 0L, corpus, "doc_id", "text")
    assert(docs() == after0)
    // crash BETWEEN corpus publish and sidecar write: simulate by running
    // the batch then deleting its sidecar partition before the replay
    val b1 = Seq((3L, "gamma"), (2L, "beta")).toDF("doc_id", "text")
    graft.streaming.StreamingIngest.processBatch(b1, 1L, corpus, "doc_id", "text")
    val fpsDir = graft.streaming.StreamingIngest.fingerprintPath(corpus)
    val p = new org.apache.hadoop.fs.Path(s"$fpsDir/batch_id=1")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(p, true), "expected a batch_id=1 sidecar partition")
    graft.streaming.StreamingIngest.processBatch(b1, 1L, corpus, "doc_id", "text")
    assert(docs().map(_._1) == Seq(1L, 2L, 3L, 100L)) // gamma exactly once
    // sidecar restored: a later batch replaying b1's content adds nothing
    graft.streaming.StreamingIngest.processBatch(b1, 2L, corpus, "doc_id", "text")
    assert(docs().map(_._1) == Seq(1L, 2L, 3L, 100L))
  }

  test("streaming sketch profile: per-group HLL state merges across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, String)]
    val q = graft.streaming.StreamingSketch.runningProfile(
        input.toDF().toDF("src", "fp"), "src", "fp")
      .writeStream.format("memory").queryName("sketch_out")
      .outputMode(OutputMode.Complete()).start()
    try {
      input.addData((1 to 500).map(i => ("a", s"fp$i")) ++
        (1 to 100).map(i => ("b", s"fp$i")): _*)
      q.processAllAvailable()
      // batch 2 overlaps batch 1 half-way: distinct grows to 750, rows to 1000
      input.addData((251 to 750).map(i => ("a", s"fp$i")): _*)
      q.processAllAvailable()
      val out = spark.table("sketch_out")
        .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
      assert(out("a")._2 == 1000L, "row count must span both batches")
      assert(math.abs(out("a")._3 - 750.0) / 750.0 < 0.05,
        s"running estimate ${out("a")._3} must track 750 cross-batch distincts")
      assert(math.abs(out("b")._3 - 100.0) / 100.0 < 0.05)
    } finally q.stop()
  }

  test("streaming semantic dedup: drift monitor triggers staged re-bootstrap") {
    import graft.streaming.StreamingSemDedup
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-semdrift").toString
    def vecs(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")
    StreamingSemDedup.bootstrap(
      vecs(1L -> Array(1.0f, 0.0f), 2L -> Array(0.0f, 1.0f)),
      "vec_id", "embedding", c = 2, iters = 2, path)

    // nothing streamed yet → no drift, no rebuild
    assert(StreamingSemDedup.driftReport(spark, path)
      == StreamingSemDedup.DriftReport(0.0, 1.0, 2, 0))
    assert(!StreamingSemDedup.rebootstrapIfDrifted(
      spark, path, "vec_id", "embedding", c = 2, iters = 2))

    // stream a fan of new directions (9° apart and ≥15° off every
    // bootstrap vector — below tau on all sides, all survive) that ALL
    // land in bucket 0: streamed occupancy (1, 0) vs bootstrap (½, ½)
    // → tv = 0.5, skew = 2
    val drifted = (0 until 4).map { i =>
      val a = math.toRadians(15.0 + 9 * i)
      (10L + i) -> Array(math.cos(a).toFloat, math.sin(a).toFloat)
    }
    StreamingSemDedup.processBatch(
      vecs(drifted: _*), 0L, path, "vec_id", "embedding", tau = 0.99)
    val hot = StreamingSemDedup.driftReport(spark, path)
    assert(hot.streamedRows == 4 && hot.tvDistance == 0.5 && hot.occupancySkew == 2.0)

    // rebuild: survivors unchanged, all rows re-canonicalized, index
    // re-balanced (both buckets live again), drift reads clean
    assert(StreamingSemDedup.rebootstrapIfDrifted(
      spark, path, "vec_id", "embedding", c = 2, iters = 2))
    val after = spark.read.parquet(s"$path/corpus")
    assert(after.select("vec_id").as[Long].collect().toSet
      == (Set(1L, 2L) ++ drifted.map(_._1)))
    assert(after.select("batch_id").distinct().as[Long].collect().toSeq == Seq(-1L))
    val stats = StreamingSemDedup.driftStats(spark, path)
      .select("bucket", "n_bootstrap").as[(Int, Long)].collect().toMap
    assert(stats.size == 2 && stats.values.forall(_ > 0), s"unbalanced: $stats")
    assert(StreamingSemDedup.driftReport(spark, path)
      == StreamingSemDedup.DriftReport(0.0, 1.0, 6, 0))
    // and ingest keeps working against the rebuilt index
    StreamingSemDedup.processBatch(
      vecs(50L -> Array(-1.0f, 0.0f)), 1L, path, "vec_id", "embedding", tau = 0.99)
    assert(spark.read.parquet(s"$path/corpus").count() == 7L)
  }

  test("streaming semantic dedup: within-batch, cross-batch, replay, stale cleanup") {
    import graft.streaming.StreamingSemDedup
    val s = spark
    import s.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-semstream").toString
    def vecs(rows: (Long, Array[Float])*) = rows.toDF("vec_id", "embedding")
    def ids(): Set[Long] = spark.read.parquet(s"$path/corpus")
      .select("vec_id").as[Long].collect().toSet

    // seed: one vector per cluster (axis directions), canonical as-is
    StreamingSemDedup.bootstrap(
      vecs(1L -> Array(1.0f, 0.05f), 2L -> Array(0.05f, 1.0f)),
      "vec_id", "embedding", c = 2, iters = 2, path)
    assert(ids() === Set(1L, 2L))

    // batch 0: 10 ≈ persisted 1 (dropped), 11 new (kept), 20/21 a
    // within-batch near-identical pair (min-id 20 kept)
    val b0 = vecs(
      10L -> Array(0.9f, 0.1f), 11L -> Array(0.5f, 0.87f),
      20L -> Array(0.7f, 0.25f), 21L -> Array(1.4f, 0.5f))
    StreamingSemDedup.processBatch(b0, 0L, path, "vec_id", "embedding", tau = 0.99)
    assert(ids() === Set(1L, 2L, 11L, 20L))

    // replay of batch 0 (at-least-once crash window): converges, no dupes
    StreamingSemDedup.processBatch(b0, 0L, path, "vec_id", "embedding", tau = 0.99)
    assert(ids() === Set(1L, 2L, 11L, 20L))
    assert(spark.read.parquet(s"$path/corpus").count() === 4L, "no duplicate rows")

    // batch 1: 30 ≈ batch-0 survivor 20 (cross-batch dup), 31 genuinely new
    val b1 = vecs(30L -> Array(0.71f, 0.253f), 31L -> Array(0.05f, -1.0f))
    StreamingSemDedup.processBatch(b1, 1L, path, "vec_id", "embedding", tau = 0.99)
    assert(ids() === Set(1L, 2L, 11L, 20L, 31L))

    // crash window: a half-written batch_id=2 partition exists, then the
    // retry finds every batch-2 row duplicated → stale partition cleared
    vecs(99L -> Array(0.7f, 0.25f)).withColumn("bucket", lit(0))
      .withColumn("batch_id", lit(2L))
      .write.mode("append").partitionBy("bucket", "batch_id")
      .parquet(s"$path/corpus")
    assert(ids().contains(99L))
    val b2 = vecs(40L -> Array(1.4f, 0.5f)) // ≈ survivor 20 → dropped
    StreamingSemDedup.processBatch(b2, 2L, path, "vec_id", "embedding", tau = 0.99)
    assert(ids() === Set(1L, 2L, 11L, 20L, 31L), "stale half-write must clear")

    // drift monitor: stats/report on the corpus built above (streamed
    // rows 11/20/31 spread across both buckets → low drift)
    val calm = StreamingSemDedup.driftReport(spark, path)
    assert(calm.bootstrapRows == 2 && calm.streamedRows == 3)
    assert(calm.tvDistance <= 0.25)

    // wiring smoke: the same batches through a real MemoryStream query
    val path2 = java.nio.file.Files.createTempDirectory("graft-semstream2").toString
    StreamingSemDedup.bootstrap(
      vecs(1L -> Array(1.0f, 0.05f), 2L -> Array(0.05f, 1.0f)),
      "vec_id", "embedding", c = 2, iters = 2, path2)
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamingSemDedup.appendDeduped(
      input.toDF().toDF("vec_id", "embedding"), path2, "vec_id", "embedding", tau = 0.99)
    try {
      input.addData(10L -> Array(0.9f, 0.1f), 11L -> Array(0.5f, 0.87f))
      q.processAllAvailable()
      val got = spark.read.parquet(s"$path2/corpus")
        .select("vec_id").as[Long].collect().toSet
      assert(got === Set(1L, 2L, 11L))
    } finally q.stop()
  }

  test("streaming CDC ingest: chunk store dedups within and across batches, docs round-trip") {
    import spark.implicits._
    import graft.streaming.StreamingCdcIngest
    val path = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    val rnd = new scala.util.Random(17)
    val words = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val base = Seq.fill(150)(words(rnd.nextInt(words.length))).mkString(" ")
    val other = Seq.fill(80)(words(rnd.nextInt(words.length))).mkString(" ")

    // batch 0: two docs sharing a long block → within-batch chunk reuse
    val b0 = Seq((1L, base), (2L, s"$other $base")).toDF("doc_id", "text")
    StreamingCdcIngest.processBatch(b0, 0L, path, "doc_id", "text", k = 8, divisor = 16)
    val manifest0 = spark.read.parquet(StreamingCdcIngest.manifestPath(path))
    val store0 = spark.read.parquet(StreamingCdcIngest.storePath(path))
    assert(store0.count() == store0.select("chunk_md5").distinct().count(),
      "store holds each chunk once")
    assert(store0.count() < manifest0.count(),
      "shared chunks referenced twice but stored once")

    // round trip: reassembled docs equal the originals byte-for-byte
    val docs0 = StreamingCdcIngest.readDocs(spark, path, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(docs0 == Map(1L -> base, 2L -> s"$other $base"))

    // batch 1: a recrawl of doc 1 with an edit up top → only the chunks
    // touching the edit are new; the tail re-synchronizes and is reused
    val edited = s"edited headline $base"
    val b1 = Seq((3L, edited)).toDF("doc_id", "text")
    StreamingCdcIngest.processBatch(b1, 1L, path, "doc_id", "text", k = 8, divisor = 16)
    val newChunks = spark.read.parquet(StreamingCdcIngest.storePath(path))
      .where(col("batch_id") === 1L).count()
    val doc3Chunks = spark.read.parquet(StreamingCdcIngest.manifestPath(path))
      .where(col("doc_id") === 3L).count()
    assert(newChunks <= 3 && doc3Chunks >= 4,
      s"expected near-total reuse: $newChunks new of $doc3Chunks referenced")

    // replay batch 1 (at-least-once): store and manifest converge unchanged
    val storeBefore = spark.read.parquet(StreamingCdcIngest.storePath(path))
      .collect().map(_.toString).sorted.toSeq
    StreamingCdcIngest.processBatch(b1, 1L, path, "doc_id", "text", k = 8, divisor = 16)
    val storeAfter = spark.read.parquet(StreamingCdcIngest.storePath(path))
      .collect().map(_.toString).sorted.toSeq
    assert(storeBefore == storeAfter, "replayed batch must not grow the store")
    val docsAll = StreamingCdcIngest.readDocs(spark, path, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(docsAll(3L) == edited)

    // crash window: a half-written store partition for batch 2 is
    // overwritten by the batch's own replay, never double-counted
    Seq(("deadbeef", "junk", 2L)).toDF("chunk_md5", "chunk_text", "batch_id")
      .write.mode("append").partitionBy("batch_id")
      .parquet(StreamingCdcIngest.storePath(path))
    val b2 = Seq((4L, s"fresh tail $other")).toDF("doc_id", "text")
    StreamingCdcIngest.processBatch(b2, 2L, path, "doc_id", "text", k = 8, divisor = 16)
    val junk = spark.read.parquet(StreamingCdcIngest.storePath(path))
      .where(col("chunk_md5") === "deadbeef").count()
    assert(junk == 0L, "stale half-write must be replaced by the replay")
    val docs4 = StreamingCdcIngest.readDocs(spark, path, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(docs4(4L) == s"fresh tail $other")

    // a batch carrying the same id twice keeps ONE version (deterministic
    // min-text), never an interleaved chimera of both manifests
    val b3 = Seq((9L, "version b of the page"), (9L, "version a of the page"))
      .toDF("doc_id", "text")
    StreamingCdcIngest.processBatch(b3, 3L, path, "doc_id", "text", k = 8, divisor = 16)
    val doc9 = StreamingCdcIngest.readDocs(spark, path, "doc_id", "text")
      .as[(Long, String)].collect().toMap.apply(9L)
    assert(doc9 == "version a of the page")
  }

  test("streaming CDC ingest wired through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingCdcIngest
    val path = java.nio.file.Files.createTempDirectory("graft-cdcq").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingCdcIngest.appendChunked(
      input.toDF().toDF("doc_id", "text"), path, "doc_id", "text", k = 8, divisor = 16)
    try {
      input.addData(1L -> "one streamed document body here", 2L -> "two streamed bodies")
      q.processAllAvailable()
      val docs = StreamingCdcIngest.readDocs(spark, path, "doc_id", "text")
        .as[(Long, String)].collect().toMap
      assert(docs == Map(1L -> "one streamed document body here",
        2L -> "two streamed bodies"))
    } finally q.stop()
  }

  test("streaming JSONL export: per-batch shards, manifest commit point, replay converges") {
    import spark.implicits._
    import graft.streaming.StreamingJsonlExport
    val path = java.nio.file.Files.createTempDirectory("graft-sjsonl").toString
    val b0 = (0L until 40L).map(i => (i, s"doc $i " + ("pad " * (i % 7).toInt)))
      .toDF("doc_id", "text")
    StreamingJsonlExport.processBatch(b0, 0L, path, Seq("doc_id"), budgetBytes = 512L)
    val m0 = StreamingJsonlExport.readManifest(spark, path).collect()
    assert(m0.forall(_.getAs[Long]("batch_id") == 0L) && m0.length > 1)
    // disk bytes equal manifest bytes per shard (one file per shard dir)
    m0.foreach { m =>
      val dir = new java.io.File(
        s"${StreamingJsonlExport.shardsPath(path)}/batch_id=0/shard=${m.getAs[Long]("shard")}")
      val files = dir.listFiles().filter(_.getName.endsWith(".txt"))
      assert(files.length == 1 && files.head.length() == m.getAs[Long]("bytes"))
    }
    // a second batch appends without touching batch 0's files
    val b1 = (100L until 120L).map(i => (i, s"later $i")).toDF("doc_id", "text")
    StreamingJsonlExport.processBatch(b1, 1L, path, Seq("doc_id"), budgetBytes = 512L)
    val lines = StreamingJsonlExport.readLines(spark, path)
    assert(lines.count() == 60)
    assert(lines.where(col("batch_id") === 0L).count() == 40)
    // at-least-once replay of batch 1: identical end state
    val before = StreamingJsonlExport.readLines(spark, path)
      .collect().map(_.toString).sorted.toSeq
    StreamingJsonlExport.processBatch(b1, 1L, path, Seq("doc_id"), budgetBytes = 512L)
    val after = StreamingJsonlExport.readLines(spark, path)
      .collect().map(_.toString).sorted.toSeq
    assert(before == after, "replay must converge to the same export")
    // orphan shard files without a manifest row are invisible to readers
    val orphanDir = new java.io.File(
      s"${StreamingJsonlExport.shardsPath(path)}/batch_id=9/shard=0")
    orphanDir.mkdirs()
    val w = new java.io.PrintWriter(new java.io.File(orphanDir, "part-orphan.txt"))
    w.println("{\"doc_id\":999}"); w.close()
    assert(StreamingJsonlExport.readLines(spark, path).count() == 60,
      "uncommitted batch must not be served")
  }

  test("stream-stream interval join: pairs within horizon, across batches, none outside") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingIntervalJoin
    def ts(s: Long) = new Timestamp(s * 1000L)
    val views = MemoryStream[(Long, Long, Timestamp)] // (view_id, user, vts)
    val clicks = MemoryStream[(Long, Long, Timestamp)] // (click_id, cuser, cts)
    val joined = StreamingIntervalJoin.within(
      views.toDF().toDF("view_id", "user", "vts"),
      clicks.toDF().toDF("click_id", "cuser", "cts"),
      "user", "cuser", "vts", "cts", horizonSec = 3600L,
      watermarkDelay = "0 seconds")
    val q = joined.select("view_id", "click_id").writeStream
      .format("memory").queryName("sij").outputMode(OutputMode.Append()).start()
    try {
      views.addData((1L, 7L, ts(1000)), (2L, 8L, ts(5000)))
      clicks.addData((10L, 7L, ts(1500)))        // within 1 h of view 1
      q.processAllAvailable()
      // cross-batch: a later click still lands inside view 1's horizon
      clicks.addData((11L, 7L, ts(4500)))        // within (4600 > 1000+3600 would miss)
      clicks.addData((12L, 7L, ts(4601)))        // OUTSIDE view 1's horizon
      clicks.addData((13L, 9L, ts(1200)))        // key with no view
      clicks.addData((14L, 8L, ts(4999)))        // before view 2 → excluded
      q.processAllAvailable()
      val got = spark.table("sij").as[(Long, Long)].collect().toSet
      assert(got == Set((1L, 10L), (1L, 11L)),
        s"expected exactly the in-horizon pairs, got $got")
    } finally q.stop()
  }

  test("streaming JSONL export wired through foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.StreamingJsonlExport
    val path = java.nio.file.Files.createTempDirectory("graft-sjsonlq").toString
    val input = MemoryStream[(Long, String)]
    val q = StreamingJsonlExport.appendSharded(
      input.toDF().toDF("doc_id", "text"), path, Seq("doc_id"), budgetBytes = 256L)
    try {
      input.addData(1L -> "streamed one", 2L -> "streamed two")
      q.processAllAvailable()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType)))
      val back = StreamingJsonlExport.readLines(spark, path)
        .select(from_json(col("value"), schema).as("r"))
        .select(col("r.doc_id"), col("r.text"))
        .as[(Long, String)].collect().toMap
      assert(back == Map(1L -> "streamed one", 2L -> "streamed two"))
    } finally q.stop()
  }

  test("streaming text index: append equals ad-hoc BM25, replay-safe, meta is the commit point") {
    import spark.implicits._
    import graft.streaming.StreamingTextIndex
    val path = java.nio.file.Files.createTempDirectory("graft-stix").toString
    val half1 = (1L to 40L).map(i =>
      (i, s"doc$i ${if (i % 3 == 0) "common shared words" else "filler body text"} t${i % 7}"))
    val half2 = (41L to 80L).map(i =>
      (i, s"doc$i ${if (i % 3 == 0) "common shared words" else "filler body text"} t${i % 7}"))
    val queries = Seq(100L -> "common shared t3", 101L -> "filler t5").toDF("doc_id", "text")

    StreamingTextIndex.processBatch(
      half1.toDF("doc_id", "text"), 0L, path, "doc_id", "text", buckets = 16)
    StreamingTextIndex.processBatch(
      half2.toDF("doc_id", "text"), 1L, path, "doc_id", "text", buckets = 16)

    def results() = StreamingTextIndex.search(spark, path, queries, "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    val want = graft.operators.TextAnalysis.bm25TopK(
      (half1 ++ half2).toDF("doc_id", "text"), queries, "doc_id", "text", "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(results() == want)
    assert(want.nonEmpty)

    // at-least-once replay: re-running batch 1 must not duplicate postings
    StreamingTextIndex.processBatch(
      half2.toDF("doc_id", "text"), 1L, path, "doc_id", "text", buckets = 16)
    assert(results() == want, "replayed batch changed search results")

    // crash window: postings published but meta (the commit point) not —
    // the batch must be fully invisible, scored as if it never happened
    val metaDir = new java.io.File(s"${StreamingTextIndex.metaPath(path)}/batch_id=1")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(metaDir)
    val only1 = graft.operators.TextAnalysis.bm25TopK(
      half1.toDF("doc_id", "text"), queries, "doc_id", "text", "doc_id", "text")
      .orderBy("q_id", "rank").as[(Long, Int, Long, Double)].collect().toSeq
    assert(results() == only1, "uncommitted batch leaked into search")
    // replay converges back
    StreamingTextIndex.processBatch(
      half2.toDF("doc_id", "text"), 1L, path, "doc_id", "text", buckets = 16)
    assert(results() == want)
  }

  test("streaming overlap: per-batch novelty exact under k, replay-safe") {
    import spark.implicits._
    import graft.streaming.StreamingOverlap
    val path = java.nio.file.Files.createTempDirectory("graft-novel").toString
    // batch 0: 100 fresh docs; batch 1: 50 repeats + 50 fresh; batch 2: all repeats
    val b0 = (1 to 100).map(i => s"doc $i").toDF("text")
    val b1 = ((51 to 100) ++ (101 to 150)).map(i => s"doc $i").toDF("text")
    val b2 = (1 to 40).map(i => s"doc $i").toDF("text")
    StreamingOverlap.processBatch(b0, 0L, path, "text", k = 4096)
    StreamingOverlap.processBatch(b1, 1L, path, "text", k = 4096)
    StreamingOverlap.processBatch(b2, 2L, path, "text", k = 4096)
    def rows() = StreamingOverlap.novelty(spark, path)
      .orderBy("batch_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(5), r.getBoolean(6))).toSeq
    val got = rows()
    assert(got == Seq(
      (0L, 100L, 0L, 0L, 1.0, true),    // everything new against empty prior
      (1L, 100L, 100L, 50L, 0.5, true), // half the batch repeats
      (2L, 40L, 150L, 40L, 0.0, true))) // fully stale batch
    // at-least-once replay: re-running batch 1 replaces its row, not adds
    StreamingOverlap.processBatch(b1, 1L, path, "text", k = 4096)
    assert(rows() == got)
    // estimator regime flagged honestly once a sketch fills
    val big = (1 to 9000).map(i => s"x $i").toDF("text")
    StreamingOverlap.processBatch(big, 3L, path, "text", k = 4096)
    val last = StreamingOverlap.novelty(spark, path).orderBy("batch_id")
      .collect().last
    assert(!last.getBoolean(6), "an over-k sketch must drop the exact certificate")
    assert(math.abs(last.getLong(1) - 9000L).toDouble / 9000 < 0.1,
      s"distinct estimate ${last.getLong(1)} too far from 9000")
  }

  test("streaming WARC ingest: segments to deduped clean-text corpus, replay + re-announce safe") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val warcDir = new java.io.File("src/test/resources/warc").getAbsolutePath
    val a = s"$warcDir/sample_a.warc"
    val b = s"$warcDir/sample_b.warc.gz"
    val corpus = java.nio.file.Files.createTempDirectory("graft-warc-ingest").toString
    def docs() = spark.read.parquet(corpus)
      .select("record_id", "text").as[(String, String)].collect().toMap

    val input = MemoryStream[String]
    val q = graft.streaming.StreamingWarcIngest.ingestHtml(input.toDF(), corpus)
    try {
      input.addData(a)
      q.processAllAvailable()
      val after1 = docs()
      // sample_a holds ONE non-empty 200 text/html response (record 2)
      assert(after1.keySet == Set("<urn:uuid:00000000-0000-0000-0000-000000000002>"),
        s"got ${after1.keySet}")
      assert(after1.values.head == "Página uno Hello crawl world & friends")
      // batch 2: segment b (empty-body html response only -> its clean text
      // is "", a fresh fingerprint) plus segment a RE-ANNOUNCED — the
      // at-least-once queue case; a's docs must not duplicate
      input.addData(b, a)
      q.processAllAvailable()
      val after2 = docs()
      assert(after2.keySet == Set(
        "<urn:uuid:00000000-0000-0000-0000-000000000002>",
        "<urn:uuid:00000000-0000-0000-0000-000000000006>"), s"got ${after2.keySet}")
    } finally q.stop()

    // crash-window replay: re-running a committed batch converges (the
    // StreamingIngest discipline, driven through the WARC twin)
    val before = docs()
    graft.streaming.StreamingWarcIngest.processBatch(
      Seq(a).toDF("value"), 0L, corpus, 64 << 20)
    assert(docs() == before, "replay must not change the corpus")
  }

  test("streaming quantiles: batch states merge to the exact distribution; drift flags a shift") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val path = java.nio.file.Files.createTempDirectory("graft-sq").toString
    val input = MemoryStream[Double]
    val q = graft.streaming.StreamingQuantiles.monitor(
      input.toDF().toDF("v"), path, "v", k = 1024)
    try {
      // two uniform batches, then a shifted one
      input.addData((1 to 500).map(_.toDouble): _*)
      q.processAllAvailable()
      input.addData((501 to 1000).map(_.toDouble): _*)
      q.processAllAvailable()
      val dist = graft.streaming.StreamingQuantiles.distribution(
        spark, path, Seq(0.5, 0.9)).head()
      // k > n: certified exact, median of 1..1000 = 500
      assert(dist.getLong(0) == 1000 && dist.getBoolean(2))
      assert(dist.getDouble(3) == 500.0 && dist.getDouble(4) == 900.0)
      // the shifted batch moves the latest-vs-history quantiles up
      input.addData((5001 to 5500).map(_.toDouble): _*)
      q.processAllAvailable()
      val d = graft.streaming.StreamingQuantiles.drift(spark, path, Seq(0.5))
        .head()
      assert(d.getDouble(1) == 500.0)           // history median
      assert(d.getDouble(2) == 5250.0)          // shifted batch median
      assert(d.getDouble(3) == 4750.0)          // delta flags the shift
      val alert = graft.streaming.StreamingQuantiles.driftAlert(
        spark, path, Seq(0.5), minShiftFrac = 0.2).head()
      assert(alert.getBoolean(2), "the 10x-shifted batch must certify as a shift")
      assert(alert.getDouble(1) >= 0.5, s"gap frac ${alert.getDouble(1)}")
    } finally q.stop()

    // a same-distribution batch must NOT certify (fresh monitor so the
    // shifted batch above doesn't contaminate the history baseline)
    val calmPath = java.nio.file.Files.createTempDirectory("graft-sq-calm").toString
    graft.streaming.StreamingQuantiles.processBatch(
      (1 to 1000).map(_.toDouble).toDF("v"), 0L, calmPath, "v", 2048)
    graft.streaming.StreamingQuantiles.processBatch(
      (1 to 1000).map(_.toDouble).toDF("v"), 1L, calmPath, "v", 2048)
    val calm = graft.streaming.StreamingQuantiles.driftAlert(
      spark, calmPath, Seq(0.5)).head()
    assert(!calm.getBoolean(2), "same-distribution batch must not alert")

    // replay convergence: re-running a batch id replaces its own row
    graft.streaming.StreamingQuantiles.processBatch(
      (1 to 500).map(_.toDouble).toDF("v"), 0L, path, "v", 1024)
    val n = graft.streaming.StreamingQuantiles.distribution(spark, path, Seq(0.5))
      .head().getLong(0)
    assert(n == 1500, s"replay must not double-count: n=$n")

    // mixed-k refusal, the StreamingTextIndex lesson
    graft.streaming.StreamingQuantiles.processBatch(
      Seq(1.0).toDF("v"), 99L, path, "v", 512)
    val e = intercept[IllegalArgumentException] {
      graft.streaming.StreamingQuantiles.distribution(spark, path, Seq(0.5))
    }
    assert(e.getMessage.contains("mixed k"), e.getMessage)
  }

  test("streaming span dedup: within-batch dups, retroactive first site, set-equal to batch hashed sites") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamingSpanDedup.dupSpanSites(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text", l = 6, s = 1)
    val q = out.writeStream.format("memory").queryName("span_stream_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: doc 3 repeats C="ABCDEFGH" internally (duplicates WITHIN
      // the batch); doc 1 carries B="0123456789" whose first sites must be
      // HELD BACK (nothing else shares B yet); doc 4 is clean
      input.addData(
        (1L, "abcde0123456789fghij"),
        (3L, "zzABCDEFGHwwABCDEFGHvv"),
        (4L, "uniquetextwithnorepeats!"))
      q.processAllAvailable()
      val after1 = spark.table("span_stream_out")
        .as[(Long, Int)].collect().toSet
      assert(after1.nonEmpty && after1.forall(_._1 == 3L),
        s"batch 1 must emit only doc 3's internal repeats, got $after1")
      // batch 2: doc 2 shares B — doc 1's held-back sites surface
      // retroactively alongside doc 2's, exactly once
      input.addData((2L, "klmno0123456789pqrst"))
      q.processAllAvailable()
      val after2 = spark.table("span_stream_out")
        .as[(Long, Int)].collect().toSet
      assert(after2.exists(_._1 == 1L) && after2.exists(_._1 == 2L))
      // the stream's cumulative output is set-equal to the batch hashed
      // operator on the union of all batches
      val all = Seq(
        (1L, "abcde0123456789fghij"), (3L, "zzABCDEFGHwwABCDEFGHvv"),
        (4L, "uniquetextwithnorepeats!"), (2L, "klmno0123456789pqrst"))
        .toDF("doc_id", "text")
      val batchSites = graft.operators.SpanDedup
        .dupSpanSitesHashed(all, "doc_id", "text", l = 6, s = 1)
        .select(col("doc_id").cast("long"), col("pos").cast("int"))
        .as[(Long, Int)].collect().toSet
      assert(after2 == batchSites,
        s"stream $after2 != batch $batchSites")
      // and no duplicate emissions: every site appears exactly once
      val rows = spark.table("span_stream_out").count()
      assert(rows == after2.size.toLong, s"$rows rows for ${after2.size} sites")
    } finally q.stop()
  }

  test("streaming span dedup idle-TTL: eviction under an injected clock, non-evicted keys unchanged") {
    import graft.streaming.{SpanKeyState, SpanSiteIn, SpanSiteOut, StreamingSpanDedup}
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ttl = Some("10 seconds")
    val fn = StreamingSpanDedup.transition(ttl) _
    def freshState(st: Option[SpanKeyState], nowMs: Long, timedOut: Boolean) =
      TestGroupState.create[SpanKeyState](
        st.map(Optional.of[SpanKeyState]).getOrElse(Optional.empty[SpanKeyState]()),
        GroupStateTimeout.ProcessingTimeTimeout, nowMs,
        Optional.empty[Long](), timedOut)

    // 1) a lone first site is held back and arms the TTL off the injected
    //    batch clock: timeout fires at now + 10s exactly
    val s1 = freshState(None, nowMs = 100000L, timedOut = false)
    val out1 = fn(7L, Iterator(SpanSiteIn(7L, 1L, 4)), s1).toSeq
    assert(out1.isEmpty && s1.isUpdated)
    assert(s1.get == SpanKeyState(1L, 4, emittedFirst = false))
    assert(s1.getTimeoutTimestampMs.get() == 110000L)

    // 2) the quiet key times out: state removed, nothing emitted — the
    //    previously-untested expiry branch
    val s2 = freshState(Some(SpanKeyState(1L, 4, emittedFirst = false)),
      nowMs = 200000L, timedOut = true)
    val out2 = fn(7L, Iterator.empty, s2).toSeq
    assert(out2.isEmpty && s2.isRemoved, "TTL expiry must drop the key silently")

    // 3) horizon semantics after eviction: the key is reborn with no
    //    memory — a later duplicated pair emits ITS OWN sites only, never
    //    the pre-horizon first site
    val s3 = freshState(None, nowMs = 300000L, timedOut = false)
    val out3 = fn(7L, Iterator(SpanSiteIn(7L, 9L, 2), SpanSiteIn(7L, 8L, 6)), s3).toSeq
    assert(out3 == Seq(SpanSiteOut(8L, 6), SpanSiteOut(9L, 2)),
      "reborn key emits the new duplicate pair, not the evicted site")

    // 4) set-equality for NON-evicted keys: with the TTL armed but never
    //    fired, every transition emits exactly what the no-TTL fn emits
    val noTtl = StreamingSpanDedup.transition(None) _
    val seqs = Seq(
      (None, Seq(SpanSiteIn(7L, 1L, 4))),
      (Some(SpanKeyState(1L, 4, emittedFirst = false)), Seq(SpanSiteIn(7L, 2L, 8))),
      (Some(SpanKeyState(1L, 4, emittedFirst = true)), Seq(SpanSiteIn(7L, 3L, 1))))
    seqs.foreach { case (st, batch) =>
      val a = freshState(st, 400000L, timedOut = false)
      val b = TestGroupState.create[SpanKeyState](
        st.map(Optional.of[SpanKeyState]).getOrElse(Optional.empty[SpanKeyState]()),
        GroupStateTimeout.NoTimeout, 400000L,
        Optional.empty[Long](), false)
      assert(fn(7L, batch.iterator, a).toSeq == noTtl(7L, batch.iterator, b).toSeq)
      assert(a.getOption == b.getOption)
    }
  }
}
