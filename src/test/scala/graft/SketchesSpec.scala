package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def data = {
    val s = spark
    import s.implicits._
    // 3 groups; group g has 2000 rows over g*1000 distinct values
    (0 until 3).flatMap { g =>
      (0 until 2000).map(i => (s"g$g", s"v${g}_${i % ((g + 1) * 1000)}", i.toLong))
    }.toDF("grp", "v", "x")
  }

  test("profile: HLL distinct within 5% of exact, quantiles near exact") {
    val out = Sketches.profile(data, "grp", col("v"), col("x"))
      .orderBy("grp").collect()
    val exact = data.groupBy("grp").agg(count_distinct(col("v")).as("d"))
      .orderBy("grp").collect().map(_.getLong(1))
    out.zip(exact).foreach { case (r, ex) =>
      assert(r.getLong(1) == 2000)
      val est = r.getLong(2).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"estimate $est vs exact $ex")
      // x is uniform 0..1999 per group
      assert(math.abs(r.getLong(3) - 1000L) < 50 && math.abs(r.getLong(4) - 1900L) < 50)
    }
  }

  test("union of persisted group sketches estimates the global distinct") {
    val sk = Sketches.groupSketches(data, "grp", col("v"))
    assert(sk.count() == 3) // one fixed-size row per group — the reusable state
    val est = Sketches.unionEstimate(sk).collect()(0).getLong(0).toDouble
    val exact = data.agg(count_distinct(col("v"))).collect()(0).getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"union estimate $est vs exact $exact")
  }
}
