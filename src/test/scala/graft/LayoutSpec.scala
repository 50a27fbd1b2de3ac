package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LayoutSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tmp(tag: String) =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  test("zValue interleaves bits (hand-computed Morton codes)") {
    val s = spark
    import s.implicits._
    val out = Seq((3L, 1L), (5L, 3L), (0L, 0L), (65535L, 65535L))
      .toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    // x=3 → bits 0,2 → 5; y=1 → bit 1 → 2; z=7
    // x=5 → bits 0,4 → 17; y=3 → bits 1,3 → 10; z=27
    assert(out == Seq(7L, 27L, 0L, (1L << 32) - 1))
  }

  test("zValue fuzz: matches a bit-twiddling Scala Morton model") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3L)
    def morton(x: Long, y: Long): Long =
      (0 until 16).map(i => (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1)))
        .reduce(_ | _)
    val pts = Seq.fill(500)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == pts.map { case (x, y) => morton(x, y) })
  }

  test("z-order layout prunes a y-only filter that an x-sorted layout cannot") {
    val s = spark
    import s.implicits._
    val grid = (0 until 256).flatMap(x => (0 until 256).map(y => (x, y)))
      .toDF("x", "y")
    val zDir = tmp("zlay")
    val xDir = tmp("xlay")
    Layout.writeZOrdered(grid, "x", "y", zDir, files = 16)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xDir)

    def scanRows(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir).where(col("y").between(0, 10))
      val n = df.collect().length.toLong
      (n, allScans(df.queryExecution.executedPlan).head.metrics("numOutputRows").value)
    }
    val (zN, zScan) = scanRows(zDir)
    val (xN, xScan) = scanRows(xDir)
    assert(zN == 256L * 11 && xN == zN, "both layouts must return identical results")
    // x-sorted files span all y → stats can't prune; z-ordered files are
    // (x, y) boxes → most row groups skip on the y predicate alone.
    assert(xScan == 65536L, s"x-sorted layout unexpectedly pruned: $xScan")
    assert(zScan <= 65536L / 2, s"z-order pruned too little: $zScan of 65536")
  }

  test("compact and zorderRewrite refuse a source missing its _SUCCESS commit marker") {
    val s = spark
    import s.implicits._
    val src = tmp("crash-src")
    val dst = tmp("crash-dst")
    (1L to 100L).map(i => (i, i % 7)).toDF("id", "g")
      .repartition(4).write.mode("overwrite").parquet(src)
    // stage the crash window: the upstream job died inside its commit —
    // part files present, completeness receipt absent
    val marker = new java.io.File(src, "_SUCCESS")
    assert(marker.exists, "fixture should have committed with _SUCCESS")
    assert(marker.delete())
    val e1 = intercept[IllegalArgumentException] {
      Layout.compact(spark, src, dst, targetBytes = Long.MaxValue)
    }
    assert(e1.getMessage.contains("_SUCCESS"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Layout.zorderRewrite(spark, src, dst, "id", "g", files = 2)
    }
    assert(e2.getMessage.contains("_SUCCESS"), e2.getMessage)
    // nothing was published under the destination
    assert(!new java.io.File(dst, "_SUCCESS").exists)
    // restoring the receipt unblocks both verbs (the refusal is the
    // marker check, not a side effect of the staged layout)
    assert(marker.createNewFile())
    val (_, after) = Layout.compact(spark, src, dst, targetBytes = Long.MaxValue)
    assert(after == 1)
    Layout.zorderRewrite(spark, src, tmp("crash-zdst"), "id", "g", files = 2)
  }

  test("compact rewrites to the byte-targeted file count, losslessly") {
    val s = spark
    import s.implicits._
    val src = tmp("compact-src")
    val dst = tmp("compact-dst")
    val data = (1L to 5000L).map(i => (i, s"row$i")).toDF("id", "v")
    data.repartition(60).write.mode("overwrite").parquet(src)
    val (before, after) = Layout.compact(spark, src, dst, targetBytes = Long.MaxValue)
    assert(before == 60 && after == 1, s"got ($before, $after)")
    val back = spark.read.parquet(dst).orderBy("id").collect()
    assert(back.length == 5000 && back(0).getLong(0) == 1L &&
      back(4999).getString(1) == "row5000")
  }
}
