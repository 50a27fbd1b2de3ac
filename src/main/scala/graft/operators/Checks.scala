package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table-level data-quality constraint report (the Deequ-style guardrail a
  * training pipeline runs before shipping a corpus snapshot).
  *
  * Scale design: every not-null and range constraint is a conditional sum
  * inside ONE full-scan aggregate (map-side partials, one row out); each
  * uniqueness constraint is one groupBy counting surplus copies. No
  * constraint adds a pass over the data beyond those, and the report is a
  * few rows regardless of input size.
  */
object Checks {

  /** @param notNull  columns that must never be NULL
    * @param ranges   (column, lo, hi) closed-interval numeric bounds
    * @param unique   column groups that must identify rows uniquely
    * @return (chk, violations) rows, one per constraint, ordered by chk */
  def report(
      df: DataFrame,
      notNull: Seq[String],
      ranges: Seq[(String, Double, Double)],
      unique: Seq[Seq[String]]): DataFrame = {
    val spark = df.sparkSession

    val scanMetrics =
      notNull.map(c => (s"notnull:$c",
        sum(when(col(c).isNull, 1L).otherwise(0L)))) ++
      ranges.map { case (c, lo, hi) => (s"range:$c",
        sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L))) }

    val scanReport =
      if (scanMetrics.isEmpty) spark.emptyDataFrame.select(lit("").as("chk"), lit(0L).as("violations")).limit(0)
      else {
        val agged = df.agg(scanMetrics.head._2.as("m0"),
          scanMetrics.tail.zipWithIndex.map { case ((_, m), i) => m.as(s"m${i + 1}") }: _*)
        agged.select(explode(array(scanMetrics.zipWithIndex.map { case ((name, _), i) =>
          struct(lit(name).as("chk"), coalesce(col(s"m$i"), lit(0L)).as("violations"))
        }: _*)).as("r")).select("r.chk", "r.violations")
      }

    val uniqueReports = unique.map { cols =>
      df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))
        .where(col("n") > 1)
        .agg(coalesce(sum(col("n") - 1), lit(0L)).as("violations"))
        .select(lit(s"unique:${cols.mkString(",")}").as("chk"), col("violations"))
    }

    uniqueReports.foldLeft(scanReport)(_ unionByName _).orderBy("chk")
  }

  /** Rows whose `valueCol` sits more than `threshold` sample standard
    * deviations from its group mean — the metric-anomaly sweep a pipeline
    * runs over event/telemetry tables before trusting them.
    *
    * Shape: one hash aggregate reduces the table to a per-group (mean, sd)
    * pair (map-side partials; group count rows out), which broadcasts back
    * onto the unreduced table as a pure filter — two scans, zero shuffles of
    * the big side, so the cost is the two passes regardless of scale. The
    * output keeps only raw input columns (no derived floats) so results are
    * bit-comparable across engines.
    */
  def zscoreOutliers(
      df: DataFrame, groupCol: String, valueCol: String,
      threshold: Double = 3.0): DataFrame = {
    val stats = df.groupBy(col(groupCol)).agg(
      avg(col(valueCol)).as("_m"), stddev_samp(col(valueCol)).as("_sd"))
    df.join(broadcast(stats), groupCol)
      .where(abs(col(valueCol) - col("_m")) > lit(threshold) * col("_sd"))
      .drop("_m", "_sd")
  }
}
