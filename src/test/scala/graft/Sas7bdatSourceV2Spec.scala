package graft

import graft.sources.Sas7bdat
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The DataSource V2 face of the native sas7bdat reader:
  * `spark.read.format("sas7bdat")`. Beyond equality with the RDD-based
  * [[Sas7bdat.read]] (itself value-pinned against pandas-validated
  * fixtures in Sas7bdatSpec), this pins the V2-only property — column
  * pruning reaches the byte decoder, so the scan's readSchema shrinks to
  * the selected columns. */
class Sas7bdatSourceV2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = new java.io.File("src/test/resources/sas7bdat").getAbsolutePath

  private def v2(path: String) = spark.read.format("sas7bdat").load(path)

  test("format(\"sas7bdat\") matches the RDD reader on every fixture") {
    for (f <- Seq("u64_pages", "u64_mix", "x86_mix", "u64_bigend",
        "u64_rle", "u64_rdc", "u64_dates")) {
      val p = s"$dir/$f.sas7bdat"
      val a = v2(p)
      val b = Sas7bdat.read(spark, p)
      assert(a.schema == b.schema, f)
      assert(a.orderBy("id").collect().toSeq ==
        b.orderBy("id").collect().toSeq, f)
    }
  }

  test("column pruning reaches the scan (readSchema = selected columns)") {
    val df = v2(s"$dir/u64_pages.sas7bdat").select("name")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScanExec in plan"))
    assert(scan.readSchema() == StructType(Seq(StructField("name", StringType))))
    assert(df.orderBy("name").head().getString(0) == "row_000")
    // pruned date/timestamp columns skip conversion entirely and the kept
    // one still converts correctly
    val d = v2(s"$dir/u64_dates.sas7bdat").select("d1")
      .where(col("d1").isNotNull).orderBy("d1").head()
    assert(d.getDate(0).toLocalDate ==
      java.time.LocalDate.of(1960, 1, 1).plusDays(20000))
  }

  test("filters evaluate correctly above the pruned scan") {
    val df = v2(s"$dir/u64_rle.sas7bdat")
      .where(col("flag") === "Y").agg(sum("id").as("s"))
    // ids 1..40, odd ids have flag Y (i % 2 == 0 -> id = i+1 odd)
    assert(df.head().getDouble(0) == (1 to 40 by 2).sum.toDouble)
  }

  test("directory load: one partition per file, schema drift fails at planning") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sasv2")
    for (f <- Seq("u64_pages.sas7bdat", "x86_mix.sas7bdat"))
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(dir, f), tmp.resolve(f))
    val df = v2(tmp.toString)
    assert(df.count() == 225)
    assert(df.rdd.getNumPartitions == 2, "expected one input partition per file")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(dir, "u64_dates.sas7bdat"),
      tmp.resolve("u64_dates.sas7bdat"))
    val e = intercept[IllegalArgumentException] {
      v2(tmp.toString).collect()
    }
    assert(e.getMessage.contains("schema mismatch"))
  }
}
