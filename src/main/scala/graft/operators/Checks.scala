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

  /** Piggy-back the scan-shaped constraints (not-null + range) onto a
    * dataframe the caller is about to run ANYWAY — `df.observe` folds the
    * conditional sums into the existing pass, so shipping a 100 TB corpus
    * snapshot and checking it costs ONE scan, not two ([[report]] is the
    * standalone-pass variant; uniqueness needs its own aggregate either
    * way). After any action on the returned frame,
    * `observation.get("notnull:c")` etc. hold the violation counts.
    *
    * Usage: {{{
    *   val obs = new org.apache.spark.sql.Observation("graft_checks")
    *   val checked = Checks.observed(df, obs, notNull = Seq("id"),
    *     ranges = Seq(("qty", 0, 50)))
    *   checked.write.parquet(out)            // the one and only pass
    *   val violations = obs.get               // Map[String, Any]
    * }}} */
  def observed(
      df: DataFrame,
      observation: org.apache.spark.sql.Observation,
      notNull: Seq[String] = Nil,
      ranges: Seq[(String, Double, Double)] = Nil): DataFrame = {
    val metrics =
      notNull.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"notnull:$c")) ++
      ranges.map { case (c, lo, hi) =>
        sum(when(col(c) < lo || col(c) > hi, 1L).otherwise(0L)).as(s"range:$c") }
    require(metrics.nonEmpty, "need at least one constraint")
    df.observe(observation, metrics.head, metrics.tail: _*)
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

  /** Winsorization: clip `valueCol` into its per-group [lo, hi] exact
    * interpolated percentiles — the outlier treatment that keeps rows
    * (unlike [[zscoreOutliers]]'s sweep) while bounding heavy tails before
    * aggregation or model features.
    *
    * Same broadcast topology as zscoreOutliers: one aggregate reduces the
    * table to a per-group percentile pair, broadcast back as a pure
    * projection — the big side never shuffles. Exact percentiles are
    * bit-identical to `quantile_cont` (q46-proven), so the clipped values
    * are cross-engine exact: each output is either an untouched input or a
    * bit-matched boundary.
    */
  def winsorize(
      df: DataFrame, groupCol: String, valueCol: String,
      lo: Double = 0.01, hi: Double = 0.99): DataFrame = {
    require(0 <= lo && lo < hi && hi <= 1, "need 0 <= lo < hi <= 1")
    val stats = df.groupBy(col(groupCol)).agg(
      expr(s"percentile(`$valueCol`, $lo)").as("_lo"),
      expr(s"percentile(`$valueCol`, $hi)").as("_hi"))
    df.join(broadcast(stats), groupCol)
      .withColumn(s"${valueCol}_w",
        least(greatest(col(valueCol), col("_lo")), col("_hi")))
      .drop("_lo", "_hi")
  }

  /** Schema-drift report between an expected schema and an incoming
    * DataFrame — the ingest guardrail run before an append lands (the
    * reference re-derives schemas from PROC CONTENTS every refresh,
    * wrds2pg/sas/metadata.py:8; at 100 TB an upstream column change must
    * fail fast, not corrupt a partition).
    *
    * Pure metadata — no jobs, no scans. Returns one row per drift:
    * (column, kind, expected, actual) with kind ∈ {missing, added,
    * type_changed}, ordered by column; empty result = schemas compatible.
    * Column name matching is case-insensitive (Spark's resolution
    * default); type comparison is on catalogString. */
  def schemaDrift(
      expected: org.apache.spark.sql.types.StructType,
      actual: org.apache.spark.sql.types.StructType): Seq[(String, String, String, String)] = {
    def norm(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => f.name.toLowerCase -> f.dataType.catalogString).toMap
    val (e, a) = (norm(expected), norm(actual))
    val missing = (e.keySet -- a.keySet).toSeq.sorted
      .map(c => (c, "missing", e(c), ""))
    val added = (a.keySet -- e.keySet).toSeq.sorted
      .map(c => (c, "added", "", a(c)))
    val changed = (e.keySet & a.keySet).toSeq.sorted
      .filter(c => e(c) != a(c)).map(c => (c, "type_changed", e(c), a(c)))
    (missing ++ added ++ changed).sortBy(_._1)
  }

  /** Min-max feature scaling per group: `valueCol` mapped into [0, 1] by
    * its group's (min, max) — the normalization step before features meet
    * a model. A degenerate group (min == max) scales to 0.
    *
    * Same broadcast topology as [[winsorize]]. Min/max (unlike mean/std)
    * are ORDER-INDEPENDENT aggregates, so the scaled values are
    * bit-identical across engines and partition orders — one IEEE
    * subtract-divide on identical inputs, no float-association
    * nondeterminism anywhere.
    */
  def scaleMinMax(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val stats = df.groupBy(col(groupCol)).agg(
      min(col(valueCol)).as("_mn"), max(col(valueCol)).as("_mx"))
    df.join(broadcast(stats), groupCol)
      .withColumn(s"${valueCol}_scaled",
        when(col("_mx") > col("_mn"),
          (col(valueCol) - col("_mn")) / (col("_mx") - col("_mn")))
          .otherwise(lit(0.0)))
      .drop("_mn", "_mx")
  }
}
