package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Linear bag-of-words document classifier — the "quality classifier"
  * stage of LLM data pipelines (GPT-3 / LLaMA filter crawled pages by a
  * linear classifier trained to recognize a trusted corpus; CCNet ships
  * the same idea as fastText). The reference has no classifier surface
  * (wrds2pg/api.py:37 wrds_update copies tables whole); this is part of the
  * training-data-pipeline extension.
  *
  * The trainer is multinomial Naive Bayes with add-½ smoothing — the
  * closed-form member of the linear-classifier family (no SGD loop, no
  * iteration): per-token log-odds weights
  *
  *   w(t) = ln p(t|pos) − ln p(t|neg),
  *   p(t|class) = (c_class(t) + ½) / (N_class + ½·(V+1))
  *              = (2·c + 1) / (2·N + V + 1)
  *
  * plus a document-count prior ln(D_pos/D_neg). A document's score is the
  * prior plus the sum of its tokens' weights (occurrence-weighted, like
  * fastText's mean-of-embeddings with a bag size of |vocab|); sign gives
  * the predicted class. Every probability is a ratio of INTEGERS (the
  * add-½ trick of [[LanguageModel]]), weights are rounded to 6dp DECIMAL,
  * and the per-document sum is exact integer arithmetic — so scores and
  * the sign decision are engine-exact, SQL-reproducible, and the whole
  * operator has a full DuckDB oracle.
  *
  * Scale shape: training is ONE hash aggregate over exploded train tokens
  * (map-side combine; the shuffle moves train VOCABULARY, not tokens) plus
  * two one-row aggregates (class totals, doc counts). The weight table is
  * vocab-bounded and BROADCASTS onto the exploded corpus; the only
  * corpus-sized shuffle is the per-document score aggregate. The corpus
  * explode fans out first ([[graft.core.Par.fanOut]] — no-op on split
  * cluster inputs).
  */
object Classifier {

  import TextAnalysis.tokens

  /** Score every `corpus` document with an NB log-odds classifier trained
    * on `train` (`labelCol` boolean-castable: true = positive class).
    * Returns (idCol, n_tokens, score, pred) — `score` the 6dp log-odds
    * (prior + Σ token weights, > 0 ⇒ positive), `pred` its sign as 0/1.
    * Out-of-vocabulary tokens score at c_pos = c_neg = 0 (a pure
    * smoothing weight), so unseen text leans toward the larger class
    * denominator rather than dropping silently. Both classes must be
    * non-empty in `train` (a one-class training set has no odds to take).
    */
  def nbScore(
      corpus: DataFrame, train: DataFrame,
      idCol: String, textCol: String, labelCol: String): DataFrame = {
    val y = col(labelCol).cast("boolean")
    val trainToks = train.select(y.as("_y"), explode(tokens(col(textCol))).as("_t"))
    val cnt = trainToks.groupBy(col("_t")).agg(
      count(when(col("_y"), 1)).as("_cp"),
      count(when(!col("_y"), 1)).as("_cn"))
    val totals = trainToks.agg(
      count(when(col("_y"), 1)).as("_np"),
      count(when(!col("_y"), 1)).as("_nn"),
      count_distinct(col("_t")).as("_v"))
    val docCounts = train.agg(
      count(when(y, 1)).as("_dp"),
      count(when(!y, 1)).as("_dn"))

    // identical float shape on both engines: one ln per class of an
    // exactly-representable integer ratio, subtract, round to 6dp DECIMAL
    def w6(cp: Column, cn: Column): Column =
      round(
        log(cp.cast("double") / (lit(2) * col("_np") + col("_v") + 1)) -
          log(cn.cast("double") / (lit(2) * col("_nn") + col("_v") + 1)), 6)
        .cast("decimal(20,6)")
    val weights = cnt.crossJoin(broadcast(totals))
      .select(col("_t"),
        w6(lit(2) * col("_cp") + 1, lit(2) * col("_cn") + 1).as("_w"))
    val oovAndPrior = totals.crossJoin(docCounts).select(
      w6(lit(1), lit(1)).as("_w_oov"),
      round(log(col("_dp").cast("double") / col("_dn")), 6)
        .cast("decimal(20,6)").as("_prior"))

    val scoreDec = col("_sw") + col("_prior")
    graft.core.Par.fanOut(corpus.select(col(idCol), col(textCol)))
      .select(col(idCol), explode(tokens(col(textCol))).as("_t"))
      .join(broadcast(weights), Seq("_t"), "left")
      .crossJoin(broadcast(oovAndPrior))
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_tokens"),
        sum(coalesce(col("_w"), col("_w_oov"))).as("_sw"),
        first(col("_prior")).as("_prior"))
      .select(col(idCol), col("n_tokens"),
        round(scoreDec.cast("double"), 6).as("score"),
        (scoreDec > 0).cast("int").as("pred"))
  }
}
