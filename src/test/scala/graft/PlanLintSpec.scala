package graft

import graft.tools.PlanLint
import org.apache.spark.sql.functions.col
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

  test("closure self-join rule: fires on the double-decode shape, silent once materialized") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lint-sj").toString
    (1L to 100L).map(i => (i, s"payload-$i-${"x" * (i % 7).toInt}"))
      .toDF("id", "text").write.mode("overwrite").parquet(s"$dir/t")
    def closureFrame = spark.read.parquet(s"$dir/t").as[(Long, String)]
      .mapPartitions(_.map { case (i, t) => (i, t.length % 5) })
      .toDF("id", "k")
    // regression fixture: both join sides re-run the mapPartitions pass
    // over the same parquet root, and the closures can't canonicalize so
    // nothing is reused — the q143/q145 double-decode shape
    val bad = closureFrame.as("a").join(closureFrame.as("b"), "k")
      .where(col("a.id") < col("b.id"))
    bad.collect()
    assert(PlanLint.unsharedClosureSelfJoins(bad.queryExecution.executedPlan).nonEmpty,
      "double-decode self-join must be flagged")
    // the fix: materialize the slim closure output, THEN self-join
    val fixed = closureFrame.localCheckpoint()
    val good = fixed.as("a").join(fixed.as("b"), "k")
      .where(col("a.id") < col("b.id"))
    good.collect()
    assert(PlanLint.unsharedClosureSelfJoins(good.queryExecution.executedPlan).isEmpty,
      "checkpointed self-join must pass")
    // genuinely different closures over different sources are not a self-join
    (1L to 100L).map(i => (i, i % 5)).toDF("id", "k")
      .write.mode("overwrite").parquet(s"$dir/u")
    val other = spark.read.parquet(s"$dir/u").as[(Long, Long)]
      .mapPartitions(_.map { case (i, k) => (i, (k % 5).toInt) })
      .toDF("id", "k")
    val cross = closureFrame.as("a").join(other.as("b"), "k")
      .where(col("a.id") < col("b.id"))
    cross.collect()
    assert(PlanLint.unsharedClosureSelfJoins(cross.queryExecution.executedPlan).isEmpty,
      "distinct-source closure joins must pass")
  }
}
