package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — DSIR (Xie et al., NeurIPS
  * 2023, arXiv:2302.03169), re-expressed Spark-first: select raw-corpus
  * documents whose hashed-n-gram feature distribution looks like a small
  * trusted TARGET corpus, by importance-resampling with weights
  * p_target(doc)/p_raw(doc) under bag-of-hashed-ngram unigram+bigram
  * models. The reference has no selection surface (wrds2pg copies tables
  * whole); this is part of the training-data-pipeline extension.
  *
  * Model: features are whitespace unigrams plus space-joined bigrams,
  * hashed to `16^hexChars` buckets via the leading hex chars of md5 —
  * md5 is byte-identical in every engine (unlike xxhash64/murmur,
  * which are Spark-specific), so the feature hashing itself is part of
  * the oracle. Per-bucket probabilities use the add-½ integer-ratio form
  * of [[LanguageModel]]: p(b) = (2·c(b)+1) / (2·N + B); a document's log
  * importance weight is the sum over its feature OCCURRENCES of
  * round_6dp(ln p_t(b) − ln p_r(b)) as DECIMAL — exact, order-free,
  * engine-reproducible.
  *
  * Resampling: Gumbel top-k — equivalent to weighted sampling WITHOUT
  * replacement with probability ∝ exp(logw) (Efraimidis–Spirakis in
  * Gumbel form) — with the Gumbel noise g = −ln(−ln u) derived from the
  * SQL-portable Knuth hash of the doc id ([[Sampling.hashBucket]]), not
  * rand(): deterministic, repartition-stable, reproducible in the oracle.
  *
  * Scale shape: both bucket-count tables are ≤ B rows (one map-side
  * combining aggregate each), MATERIALIZED on the driver — they are
  * broadcast onto the exploded corpus anyway, so fitting in driver
  * memory is already a requirement, and collecting them once means each
  * side's feature explode runs exactly once for statistics (a lazy
  * two-branch formulation recomputed the full feature scan per total;
  * the spec pins the single-scan plan). Totals become literals — no
  * scalar crossJoins in the plan at all. The raw side's (id, bucket)
  * rows are persisted so ONE explode feeds both its counts and the
  * scoring join (previously two full text scans). The only corpus-sized
  * shuffle is the per-document weight aggregate, and the final top-k is
  * a TakeOrdered (no global sort). The feature explode fans out first
  * ([[graft.core.Par.fanOut]] — no-op on split inputs).
  */
object Importance {

  import TextAnalysis.tokens

  /** (cols..., f) unigram + bigram feature occurrences of `textCol`. */
  private def featureRows(df: DataFrame, textCol: String, cols: Column*): DataFrame = {
    val text = col(textCol)
    df.select(cols :+ explode(
      concat(tokens(text), Curation.wordNgrams(text, 2))).as("f"): _*)
  }

  /** Resample `raw` toward `target`'s hashed-feature distribution: the
    * `sampleN` documents with the largest round_6dp(logw + gumbel(id)).
    * Returns (idCol, n_features, logw, sel_key) in selection order.
    *
    * @param hexChars md5 hex prefix length; buckets B = 16^hexChars. */
  def dsirResample(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String,
      sampleN: Int, hexChars: Int = 3): DataFrame = {
    // materialize the ≤ sampleN selection, then release the rawRows cache —
    // a lazily returned plan over it leaked the cache for the session's
    // lifetime (ADVICE r5). The lazy twin below stays inspectable for the
    // no-crossJoin plan spec.
    val (plan, rawRows) = dsirResamplePlan(raw, target, idCol, textCol, sampleN, hexChars)
    val out = plan.localCheckpoint()
    rawRows.unpersist()
    out
  }

  /** The lazy scoring plan plus the persisted rawRows intermediate backing
    * it — callers MUST materialize the plan before unpersisting rawRows
    * (the public [[dsirResample]] does exactly that). */
  private[graft] def dsirResamplePlan(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String,
      sampleN: Int, hexChars: Int = 3): (DataFrame, DataFrame) = {
    require(hexChars >= 1 && hexChars <= 8, "need 1 <= hexChars <= 8")
    require(sampleN > 0, "need sampleN > 0")
    val b = 1L << (4 * hexChars)
    def bucket(f: Column): Column = substring(md5(f.cast("binary")), 1, hexChars)

    // Bucket counts are driver-materialized: they're broadcast below, so
    // driver-fit is already required, and collecting them once means one
    // statistics scan per side (a lazy totals branch re-ran the full
    // feature explode — measured, no exchange reuse survived pruning).
    def countsFrom(bucketed: DataFrame, cnt: String): (DataFrame, Long) = {
      val spark = bucketed.sparkSession
      val rows = bucketed
        .groupBy(col("_b")).agg(count(lit(1)).as(cnt))
        .collect()
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("_b",
          org.apache.spark.sql.types.StringType, nullable = true),
        org.apache.spark.sql.types.StructField(cnt,
          org.apache.spark.sql.types.LongType, nullable = false)))
      (spark.createDataFrame(
        java.util.Arrays.asList(rows: _*), schema),
        rows.map(_.getLong(1)).sum)
    }
    val (ct, nt) = countsFrom(
      featureRows(target.select(col(textCol)), textCol)
        .select(bucket(col("f")).as("_b")), "_ct")
    // The raw side feeds BOTH its bucket counts and the scoring join, so
    // its (id, bucket) rows are exploded+md5-hashed ONCE and persisted;
    // the counts collect doubles as the cache-populating action. The
    // cached rows are exactly what the scoring shuffle carries anyway —
    // this trades a full second text scan (tokenize + md5 per feature)
    // for a spill-able cache of the same volume.
    val rawRows = featureRows(
      graft.core.Par.fanOut(raw.select(col(idCol), col(textCol))),
      textCol, col(idCol))
      .select(col(idCol), bucket(col("f")).as("_b"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (cr, nr) = countsFrom(rawRows, "_cr")

    // identical float shape to the oracle: one ln per side of an exact
    // integer ratio, subtract, 6dp DECIMAL before the per-doc sum
    val lw6 = round(
      log((lit(2) * coalesce(col("_ct"), lit(0L)) + 1).cast("double") /
        lit(2L * nt + b)) - // long literal: same double promotion as the oracle's (2N+B)
        log((lit(2) * coalesce(col("_cr"), lit(0L)) + 1).cast("double") /
          lit(2L * nr + b)), 6)
      .cast("decimal(20,6)")
    val u = (Sampling.hashBucket(col(idCol), 1000000) + lit(0.5)) / lit(1000000)
    val selKey = round(col("_slw").cast("double") + -log(-log(u)), 6)

    (rawRows
      .join(broadcast(ct), Seq("_b"), "left")
      .join(broadcast(cr), Seq("_b"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_features"),
        sum(lw6).as("_slw"))
      .select(col(idCol), col("n_features"),
        round(col("_slw").cast("double"), 6).as("logw"),
        selKey.as("sel_key"))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(sampleN),
      rawRows)
  }
}
