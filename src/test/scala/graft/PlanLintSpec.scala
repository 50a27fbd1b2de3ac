package graft

import graft.tools.PlanLint
import org.scalatest.funsuite.AnyFunSuite

class PlanLintSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("fullWidthScans fires on an unpruned wide scan and not on a pruned one") {
    val li = "/root/testdata/sf0.001/lineitem.parquet"
    // positive control: selecting every column really is a full-width scan
    val full = spark.read.parquet(li)
    full.collect()
    val hitsFull = PlanLint.fullWidthScans(full.queryExecution.executedPlan)
    assert(hitsFull.map(t => (t._1, t._2)) == Seq(("lineitem", 11)))
    // negative control: a 2-column projection prunes and must not flag
    val pruned = spark.read.parquet(li).select("l_orderkey", "l_quantity")
    pruned.collect()
    assert(PlanLint.fullWidthScans(pruned.queryExecution.executedPlan).isEmpty)
  }
}
