package graft

import graft.operators.{AsOfJoin, Sessionize, SkewJoin}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("AsOfJoin: inclusive backward match, NULL before first right row") {
    val left = Seq(
      (1L, "a", ts("2024-01-01 00:00:00")),
      (2L, "a", ts("2024-01-01 01:00:00")),
      (3L, "a", ts("2024-01-01 02:00:00")),
      (4L, "b", ts("2024-01-01 00:30:00"))
    ).toDF("id", "k", "t")
    val right = Seq(
      ("a", ts("2024-01-01 01:00:00"), 10.0), // equal-ts: inclusive
      ("a", ts("2024-01-01 01:30:00"), 20.0),
      ("b", ts("2024-01-01 01:00:00"), 30.0)  // after b's only left row
    ).toDF("k", "rt", "v")

    val out = AsOfJoin.leftAsOf(left, right, "k", "k", "t", "rt", Seq("v"))
      .orderBy("id").select("id", "v").as[(Long, Option[Double])].collect()
    assert(out === Seq(1L -> None, 2L -> Some(10.0), 3L -> Some(20.0), 4L -> None))
  }

  test("AsOfJoin: ties among right rows resolve to latest value at that time") {
    val left = Seq((1L, "a", ts("2024-01-01 02:00:00"))).toDF("id", "k", "t")
    val right = Seq(("a", ts("2024-01-01 01:00:00"), 1.0), ("a", ts("2024-01-01 01:00:00"), 1.0))
      .toDF("k", "rt", "v")
    val out = AsOfJoin.leftAsOf(left, right, "k", "k", "t", "rt", Seq("v"))
    assert(out.select("v").as[Double].collect() === Array(1.0))
  }

  test("Sessionize: gap threshold is exclusive, per-key sessions are 1-based") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:29:00")), // 29 min gap: same session
      (3L, 7L, ts("2024-01-01 00:59:00")), // 30 min gap exactly: same (exclusive >)
      (4L, 7L, ts("2024-01-01 01:29:01")), // 30m1s: new session
      (5L, 9L, ts("2024-01-01 09:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.assign(ev, "user_id", "ts", 1800, "event_id")
      .orderBy("event_id").select("event_id", "session_id").as[(Long, Long)].collect()
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }

  test("SkewJoin.saltedJoin equals the plain join, including unmatched-left rows") {
    val probe = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (3L, "e"))
      .toDF("k", "tag") // key 1 is the heavy hitter
    val build = Seq((1L, 10), (2L, 20)).toDF("bk", "v")
    val plain = probe.join(build, col("k") === col("bk"))
      .select("k", "tag", "v").orderBy("k", "tag").collect().toSeq
    val salted = SkewJoin.saltedJoin(probe, build, "k", "bk", buckets = 4, saltBy = col("tag"))
      .select("k", "tag", "v").orderBy("k", "tag").collect().toSeq
    assert(salted === plain)
    assert(salted.map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("Sessionize.summarize aggregates per session") {
    val ev = Seq(
      (1L, 7L, ts("2024-01-01 00:00:00")),
      (2L, 7L, ts("2024-01-01 00:10:00")),
      (3L, 7L, ts("2024-01-01 05:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val got = Sessionize.summarize(ev, "user_id", "ts", 1800, "event_id")
      .orderBy("session_id")
      .select("session_id", "n_events", "session_start", "session_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
    assert(got === Seq(
      (1L, 2L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00")),
      (2L, 1L, ts("2024-01-01 05:00:00"), ts("2024-01-01 05:00:00"))))
  }

  test("Funnel: strict ordering, per-step horizon, first-touch semantics") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      (1L, "view", "2024-01-01 10:00:00"), (1L, "click", "2024-01-01 10:30:00"),
      (1L, "purchase", "2024-01-01 10:45:00"),
      (2L, "view", "2024-01-01 10:00:00"), (2L, "click", "2024-01-01 12:00:00"), // > 1h
      (3L, "click", "2024-01-01 09:00:00"), // click BEFORE the view: ignored
      (3L, "view", "2024-01-01 10:00:00"), (3L, "click", "2024-01-01 10:10:00"),
      (3L, "purchase", "2024-01-01 11:30:00"), // > 1h after the 10:10 click
      (4L, "purchase", "2024-01-01 10:00:00"), // never entered the funnel
      (5L, "view", "2024-01-01 10:00:00"), (5L, "click", "2024-01-01 10:00:00") // not strictly after
    ).map { case (u, e, t) => (u, e, ts(t)) }.toDF("user_id", "event_type", "ts")
    val got = graft.operators.Funnel.funnelCounts(
      ev, "user_id", "ts", "event_type",
      steps = Seq("view", "click", "purchase"), horizonSec = Some(3600L))
      .orderBy("step_idx")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("view", 1, 4L), ("click", 2, 2L), ("purchase", 3, 1L)))
    // no horizon: user 2's late click now converts
    val open = graft.operators.Funnel.funnelCounts(
      ev, "user_id", "ts", "event_type", steps = Seq("view", "click"))
      .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
    assert(open == Seq(4L, 3L))
  }

  test("Funnel fuzz: join-based plan matches a per-user Scala fold model") {
    val s = spark
    import s.implicits._
    val types = Seq("view", "click", "purchase")
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 5) {
      val horizon = if (rnd.nextBoolean()) Some(600L + rnd.nextInt(7200)) else None
      val n = 200 + rnd.nextInt(800)
      val rows = (1 to n).map { _ =>
        (rnd.nextInt(40).toLong,
          types(rnd.nextInt(types.length)),
          new java.sql.Timestamp(1704067200000L + rnd.nextInt(6 * 3600) * 1000L))
      }
      val ev = rows.toDF("user_id", "event_type", "ts").repartition(1 + rnd.nextInt(7))
      val got = graft.operators.Funnel.funnelCounts(
        ev, "user_id", "ts", "event_type", types, horizon)
        .orderBy("step_idx").collect().map(_.getLong(2)).toSeq
      // model: per user, earliest step-0 event, then earliest later event of
      // each next type within the horizon
      val byUser = rows.groupBy(_._1)
      val reached = Array.fill(types.length)(0L)
      byUser.values.foreach { evs =>
        var prev: Option[Long] = None
        var alive = true
        types.zipWithIndex.foreach { case (t, i) =>
          if (alive) {
            val cand = evs.filter(_._2 == t).map(_._3.getTime)
              .filter(ts => prev.forall(p =>
                ts > p && horizon.forall(h => ts <= p + h * 1000)))
            if (cand.nonEmpty) { reached(i) += 1; prev = Some(cand.min) }
            else alive = false
          }
        }
      }
      assert(got == reached.toSeq, s"funnel fuzz trial $trial (horizon=$horizon n=$n)")
    }
  }

  test("Retention fuzz: distinct-week plan matches a Scala model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 4) {
      val n = 100 + rnd.nextInt(500)
      val rows = (1 to n).map { _ =>
        (rnd.nextInt(30).toLong,
          new java.sql.Timestamp(1704067200000L + rnd.nextLong(45L * 86400 * 1000)))
      }
      val ev = rows.toDF("user_id", "ts").repartition(1 + rnd.nextInt(5))
      val got = graft.operators.Retention.weeklyCohorts(ev, "user_id", "ts", "2024-01-01")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      // model over UTC-day weeks (session timezone is UTC)
      val uw = rows.map { case (u, t) =>
        (u, (t.getTime / 86400000L - 19723L) / 7L) // 19723 = 2024-01-01 epoch day
      }.distinct
      val cohort = uw.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
      val model = uw.groupBy { case (u, w) => (cohort(u), w - cohort(u)) }
        .map { case (k, v) => k -> v.map(_._1).distinct.size.toLong }
      assert(got == model, s"retention fuzz trial $trial (n=$n)")
    }
  }

  test("Retention: cohort by first-event week, multi-week activity counted once") {
    val s = spark
    import s.implicits._
    val ev = Seq(
      // user 1: cohort week 0, active weeks 0, 1, 1 (dup within week) and 3
      (1L, "2024-01-02 10:00:00"), (1L, "2024-01-08 10:00:00"),
      (1L, "2024-01-09 10:00:00"), (1L, "2024-01-24 10:00:00"),
      // user 2: cohort week 0, never returns
      (2L, "2024-01-03 10:00:00"),
      // user 3: cohort week 1, active weeks 1 and 2
      (3L, "2024-01-10 10:00:00"), (3L, "2024-01-16 10:00:00")
    ).map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
    val got = graft.operators.Retention.weeklyCohorts(ev, "user_id", "ts", "2024-01-01")
      .orderBy("cohort_week", "week_offset").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(
      (0L, 0L, 2L), // users 1 and 2 in week 0
      (0L, 1L, 1L), // user 1 back in week 1 (the two events count once)
      (0L, 3L, 1L), // user 1 back in week 3
      (1L, 0L, 1L), // user 3's cohort
      (1L, 1L, 1L))) // user 3 back the next week
  }
}
