package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch corpus profiling: per-group cardinality (Apache
  * DataSketches HLL, via Spark's `hll_sketch_agg`) and approximate
  * quantiles (`percentile_approx`) in ONE pass.
  *
  * The point at 100 TB is mergeability, not just approximation: every
  * sketch state combines map-side, so the shuffle moves one fixed-size
  * sketch per (partition, group) regardless of row count — and persisted
  * group sketches can later be `hll_union_agg`'d into corpus totals
  * WITHOUT rescanning the data (the incremental corpus-stats pattern:
  * profile each ingest batch, union the profiles). Exact distinct counts
  * (q28's expand + two-phase plan) shuffle every distinct value; that is
  * the right tool for small keyspaces, this is the right tool for
  * billions-of-fingerprints dashboards and joins-cardinality planning.
  *
  * Approximate by nature → no cross-engine oracle (DuckDB's HLL is a
  * different implementation); the driver gate is rows-only and the spec
  * pins estimates within tolerance of exact counts, plus the
  * union-of-parts == whole property.
  */
object Sketches {

  /** Per-`groupCol` profile of `df`: row count, HLL distinct estimate of
    * `distinctCol` (rounded to long), and approx p50/p95 of `quantCol`.
    * `lgK` is the HLL precision knob (state = 2^lgK bytes-ish; 12 ≈ ±1.6%).
    */
  def profile(
      df: DataFrame, groupCol: String, distinctCol: Column,
      quantCol: Column, lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n_rows"),
      hll_sketch_estimate(hll_sketch_agg(distinctCol, lit(lgK)))
        .as("approx_distinct"),
      percentile_approx(quantCol, lit(0.5), lit(10000)).as("p50"),
      percentile_approx(quantCol, lit(0.95), lit(10000)).as("p95"))

  /** Group sketches as reusable state: one row per group holding the HLL
    * binary. Union later with [[unionEstimate]] — no rescan. */
  def groupSketches(
      df: DataFrame, groupCol: String, distinctCol: Column,
      lgK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(distinctCol, lit(lgK)).as("sketch"))

  /** Corpus-wide distinct estimate from persisted group sketches: unions
    * the fixed-size binaries, touching zero source rows. */
  def unionEstimate(sketches: DataFrame): DataFrame =
    sketches.agg(
      hll_sketch_estimate(hll_union_agg(col("sketch"), lit(false)))
        .as("approx_distinct"))
}
