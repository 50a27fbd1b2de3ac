package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model quality scoring — the CCNet-style perplexity
  * filter (Wenzek et al., LREC 2020: a small LM trained on a trusted
  * corpus scores every crawled document; high perplexity ⇒ far from the
  * target distribution ⇒ drop or down-weight). The reference has no LM
  * surface (it copies tables whole, wrds2pg/api.py:37); this is part
  * of the training-data-pipeline extension, shaped for 100 TB corpora.
  *
  * Model: add-½ ("Jeffreys") smoothed bigram LM over whitespace tokens,
  *
  *   p(cur | prev) = (c2(prev,cur) + ½) / (c1(prev) + ½·(V+1))
  *                 = (2·c2 + 1) / (2·c1 + V + 1)
  *
  * where c2 is the reference bigram count, c1 = Σ_cur c2(prev,cur) the
  * context count, and V the reference vocabulary size (the +1 reserves a
  * slot for unseen types). The second form is a ratio of INTEGERS — the
  * reason add-½ was chosen: both engines evaluate ln() on the identical
  * exactly-representable ratio, so the only cross-engine float hazard is
  * libm's final ulp (≈1e-16 relative, vanishing against the 6dp rounding
  * below).
  *
  * Cross-engine determinism of the per-document SUM of log-probs is the
  * real trap: float addition is non-associative and neither engine
  * guarantees an accumulation order, so two correct engines can disagree
  * in the last bits (and a 6dp round can then flip). The fix: each
  * bigram's log-prob is rounded to 6dp and cast to DECIMAL(20,6) BEFORE
  * aggregation — decimal addition is exact integer arithmetic, hence
  * order-free, hence engine-exact. Only after the exact sum does the
  * result return to double for the per-token normalization.
  *
  * Scale shape (no all-pairs, nothing corpus-sized on the driver):
  *   1. reference counts are two stacked hash aggregates (bigram counts
  *      combine map-side; context counts aggregate the already-reduced
  *      bigram table) — shuffles bounded by reference VOCABULARY, not
  *      tokens; V rides along as a broadcast one-row aggregate.
  *   2. scoring joins corpus bigrams to the model on (prev, cur) then
  *      (prev) — equi-joins AQE broadcasts when the model is small; with
  *      `hashKeys` the join keys are 8-byte xxhash64 values instead of
  *      word strings (the 100 TB default, spec-checked equal; keep
  *      strings when the oracle must reproduce the keys).
  *   3. one doc-keyed aggregate emits (n_bigrams, cross_entropy, ppl).
  * The corpus-side bigram explode is CPU-bound and fans out first
  * ([[graft.core.Par.fanOut]] — no-op on already-split cluster inputs).
  */
object LanguageModel {

  import TextAnalysis.tokens

  /** (cols..., prev, cur) bigram rows of `textCol`; documents shorter
    * than two tokens yield nothing. Pure projection + explode (codegen). */
  private def bigramRows(df: DataFrame, textCol: String, cols: Column*): DataFrame =
    df.select(cols :+ tokens(col(textCol)).as("_w"): _*)
      .where(size(col("_w")) >= 2)
      .select(cols :+ col("_w") :+
        explode(sequence(lit(1), size(col("_w")) - 1)).as("_g"): _*)
      .select(cols :+
        element_at(col("_w"), col("_g")).as("prev") :+
        element_at(col("_w"), col("_g") + 1).as("cur"): _*)

  /** Per-document perplexity of `corpus` under the add-½ bigram LM trained
    * on `ref`: (idCol, n_bigrams, cross_entropy, ppl), one row per corpus
    * document with ≥2 tokens. `cross_entropy` is the mean negative
    * log-prob per bigram (6dp), `ppl` = exp(cross_entropy) (4dp).
    *
    * @param hashKeys shuffle/join 8-byte xxhash64 bigram keys instead of
    *        word strings — identical output modulo a 2^-64 per-pair
    *        collision chance (spec-checked equal on real text). */
  def perplexity(
      corpus: DataFrame, ref: DataFrame,
      idCol: String, textCol: String,
      hashKeys: Boolean = false): DataFrame = {
    def key2(df: DataFrame): DataFrame =
      if (hashKeys) df.withColumn("_k2", xxhash64(col("prev"), col("cur"))).drop("prev", "cur")
      else df.withColumn("_k2", struct(col("prev"), col("cur"))).drop("prev", "cur")
    def key1of(prev: Column): Column =
      if (hashKeys) xxhash64(prev) else prev.cast("string")

    val refBg = bigramRows(ref.select(col(textCol)), textCol)
    val c2 = key2(refBg.groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("_c2"))
      .withColumn("_k1", key1of(col("prev"))))
    val c1 = c2.groupBy(col("_k1")).agg(sum(col("_c2")).as("_c1"))
    val v = ref.select(explode(tokens(col(textCol))).as("_t"))
      .agg(count_distinct(col("_t")).as("_v"))

    val docBg = key2(
      bigramRows(graft.core.Par.fanOut(corpus.select(col(idCol), col(textCol))),
        textCol, col(idCol))
        .withColumn("_k1", key1of(col("prev"))))
    // add-½ log-prob as an exact integer ratio; 6dp DECIMAL before the sum
    // so per-doc aggregation is order-free (exact) in any engine
    val lp6 = round(log(
      (lit(2) * coalesce(col("_c2"), lit(0L)) + 1).cast("double") /
        (lit(2) * coalesce(col("_c1"), lit(0L)) + col("_v") + 1)), 6)
      .cast("decimal(20,6)")
    // cross-entropy's final 6dp round runs in EXACT int64 arithmetic:
    // _sum_lp is a 6dp DECIMAL = an exact integer count of micro-units
    // (A = -sum · 10^6, positive since log-probs are negative), and
    // HALF_UP(A / n) = (2A + n) div (2n) for positive ints — identical
    // in any 64-bit engine. Rounding the double quotient instead left a
    // boundary hazard: Spark (shortest-string HALF_UP) and DuckDB
    // (multiply-based) disagree when the quotient sits within an ulp of
    // an x.xxxxxx5 boundary — measured once across 5000 docs at sf0.1.
    val ce = col("_cem").cast("double") / lit(1000000.0)
    docBg
      .join(c2.select(col("_k2"), col("_c2")), Seq("_k2"), "left")
      .join(c1, Seq("_k1"), "left")
      .crossJoin(broadcast(v))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_bigrams"),
        sum(lp6).as("_sum_lp"))
      .withColumn("_a", (-col("_sum_lp") * lit(1000000)).cast("long"))
      .withColumn("_cem", expr("(2 * _a + n_bigrams) div (2 * n_bigrams)"))
      .select(col(idCol), col("n_bigrams"),
        ce.as("cross_entropy"),
        round(exp(ce), 4).as("ppl"))
  }
}
