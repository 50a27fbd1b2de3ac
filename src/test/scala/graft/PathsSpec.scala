package graft

import java.sql.Timestamp

import graft.operators.Paths
import org.scalatest.funsuite.AnyFunSuite

class PathsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("topPaths: gap splits sessions, maxSteps truncates, frequency-then-path order") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    // user 1: one session view->click->buy->x->y->Z (truncated at 5 steps),
    // then a gap > 30 min starts session 2: view->click
    // user 2: view->click (same path as user 1's session 2)
    val events = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(10), "click"), (3L, 1L, ts(20), "buy"),
      (4L, 1L, ts(30), "x"), (5L, 1L, ts(40), "y"), (6L, 1L, ts(50), "Z"),
      (7L, 1L, ts(4000), "view"), (8L, 1L, ts(4010), "click"),
      (9L, 2L, ts(0), "view"), (10L, 2L, ts(5), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Paths.topPaths(events, "user_id", "ts", "event_type",
      gapSeconds = 1800L, tiebreak = "event_id", maxSteps = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("view->click", 2L), ("view->click->buy->x->y", 1L)))
  }

  test("topPaths: same-timestamp events order by the tiebreak") {
    val s = spark
    import s.implicits._
    def ts(sec: Long) = new Timestamp(sec * 1000L)
    val events = Seq(
      (2L, 1L, ts(0), "b"), (1L, 1L, ts(0), "a"), (3L, 1L, ts(0), "c"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Paths.topPaths(events, "user_id", "ts", "event_type",
      gapSeconds = 60L, tiebreak = "event_id", maxSteps = 5, k = 1)
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("a->b->c"))
  }
}
