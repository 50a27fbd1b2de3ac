package graft

import graft.operators.IntervalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def intervals(prefix: String, rows: (Long, Long, Long, Long)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("key", s"${prefix}_id", s"${prefix}_s", s"${prefix}_e")
  }

  private def run(l: org.apache.spark.sql.DataFrame,
      r: org.apache.spark.sql.DataFrame, w: Long) =
    IntervalJoin.overlapJoin(l, r, Seq("key"), "a_s", "a_e", "b_s", "b_e", w)
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted

  test("banded overlap join matches the naive range join, no duplicate pairs") {
    val rnd = new scala.util.Random(42)
    def gen(n: Int) = (1L to n).map { i =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(5).toLong, i, s, s + rnd.nextInt(3000))
    }
    val l = intervals("a", gen(300): _*)
    val r = intervals("b", gen(300): _*)
    val banded = run(l, r, 500L)
    val naive = l.join(r, "key")
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(banded.distinct.size == banded.size, "emitted a duplicate pair")
    assert(banded == naive)
  }

  test("an interval spanning many bins pairs exactly once; touching endpoints overlap") {
    val l = intervals("a", (1L, 10L, 0L, 10000L))   // spans 11 bins at w=1000
    val r = intervals("b",
      (1L, 20L, 9500L, 9600L),  // inside the tail
      (1L, 21L, 10000L, 10500L), // touches at the closed endpoint
      (1L, 22L, 10001L, 10500L)) // just past: no overlap
    assert(run(l, r, 1000L) == Seq((10L, 20L), (10L, 21L)))
  }

  test("negative coordinates bin correctly (floor, not truncate-toward-zero)") {
    val rnd = new scala.util.Random(99)
    def gen(n: Int) = (1L to n).map { i =>
      val s = rnd.nextInt(8000).toLong - 4000 // spans negative and positive
      (rnd.nextInt(3).toLong, i, s, s + rnd.nextInt(1500))
    }
    val l = intervals("a", gen(150): _*)
    val r = intervals("b", gen(150): _*)
    val banded = run(l, r, 700L)
    val naive = l.join(r, "key")
      .where(col("a_s") <= col("b_e") && col("b_s") <= col("a_e"))
      .select("a_id", "b_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
    assert(banded.distinct.size == banded.size, "emitted a duplicate pair")
    assert(banded == naive)
  }

  test("results are invariant to bin width") {
    val rnd = new scala.util.Random(7)
    def gen(n: Int) = (1L to n).map { i =>
      val s = rnd.nextInt(5000).toLong
      (rnd.nextInt(3).toLong, i, s, s + rnd.nextInt(2000))
    }
    val l = intervals("a", gen(100): _*)
    val r = intervals("b", gen(100): _*)
    val w1 = run(l, r, 100L)
    assert(w1 == run(l, r, 1700L) && w1 == run(l, r, 100000L))
  }
}
