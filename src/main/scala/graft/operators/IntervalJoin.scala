package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed interval-OVERLAP join — pairs (l, r) sharing a key whose
  * [start, end] ranges intersect (closed-interval semantics:
  * `l.start <= r.end AND r.start <= l.end`).
  *
  * Spark has no native range join, and the naive key-equi-join +
  * range-predicate plan degenerates to per-key all-pairs — at 100 TB a
  * single hot key (one user, one chromosome, one day) makes that
  * quadratic. This is the classic banding rewrite (the shape every
  * genomics/temporal engine uses, e.g. Hail and DuckDB's IEJoin
  * alternatives):
  *
  *   1. each interval emits one row per `binWidth`-wide timeline bin it
  *      touches (cost = interval length / binWidth, bounded for bounded
  *      intervals);
  *   2. candidates come from an EQUI-join on (keys…, bin) — shuffled,
  *      AQE-splittable, never all-pairs beyond what co-occupies a bin;
  *   3. the exact predicate filters candidates, and duplicates (a pair
  *      sharing several bins) are eliminated ARITHMETICALLY — a pair is
  *      kept only in the first bin both intervals occupy,
  *      `bin == max(l.binOf(start), r.binOf(start))` — so there is no
  *      distinct/dedupe shuffle at all.
  *
  * `binWidth` tunes the emit-factor vs candidate-density trade: pick it
  * near the typical interval length so most intervals emit O(1) rows and
  * bins hold few candidates. Reference has no interval surface
  * (wrds2pg/api.py:37 wrds_update copies tables whole); this generalizes the
  * point-in-interval lookup (q57, rewritten to as-of) to true
  * interval × interval overlap, which as-of cannot express.
  */
object IntervalJoin {

  /** Overlap-join `left` and `right` on equal `keys` and intersecting
    * [startCol, endCol] ranges. Start/end columns must be integral (e.g.
    * epoch micros; negative coordinates are handled — binning is true
    * floor division); the two inputs must not share any non-key column
    * name. */
  def overlapJoin(
      left: DataFrame, right: DataFrame, keys: Seq[String],
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // True FLOOR division: SQL `div` truncates toward zero, which would
    // mis-bin negative coordinates (pre-1970 epochs, signed offsets) —
    // correct the quotient down when a negative value has a remainder.
    // Pure integer arithmetic: exact at any magnitude, no double rounding.
    def bin(name: String): Column = {
      val c = col(name)
      val q = expr(s"`$name` div ${binWidth}L")
      when(pmod(c, lit(binWidth)) =!= 0 && c < 0, q - 1).otherwise(q)
    }
    def banded(df: DataFrame, s: String, e: String) =
      df.withColumn("_bin", explode(sequence(bin(s), bin(e))))
    banded(left, lStart, lEnd)
      .join(banded(right, rStart, rEnd), keys :+ "_bin")
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .where(col("_bin") === greatest(bin(lStart), bin(rStart)))
      .drop("_bin")
  }
}
