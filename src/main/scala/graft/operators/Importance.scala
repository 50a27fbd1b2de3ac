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
    // Document-at-a-time fused scorer (round 13, the q120 discipline): the
    // explode form (kept as [[dsirResamplePlan]], the spec's reference and
    // the fallback) materialized one (id, bucket) row PER FEATURE
    // OCCURRENCE — an sf10 corpus is ~10⁸ exploded md5-hashed rows through
    // a MEMORY_AND_DISK cache plus two broadcast joins and a per-doc
    // aggregate (205 s of q107's sf10 wall). Both bucket-count tables are
    // ≤ B longs, so with B = 16^hexChars small enough for a plain array
    // (hexChars ≤ 6) the whole model is two fused counting passes merged
    // executor-side, a B-long broadcast of per-bucket 6dp fixed-point
    // weight micros — bit-identical to the explode form's
    // round+DECIMAL(20,6) per-feature terms — and ONE scoring pass that
    // sums micros in a local long per doc. Per-task state is B longs;
    // nothing is cached and the only shuffle carries one row per doc.
    // Integral id required for the fused encoder — exotic id types take
    // the explode path, as does hexChars > 6 (array too big).
    // argument contract holds on BOTH paths (ADVICE r13): without these,
    // the fused path silently degenerated at hexChars=0 (single bucket,
    // pure-Gumbel selection), died with an index error at negative
    // hexChars, and returned empty at sampleN=0
    require(hexChars >= 1 && hexChars <= 8, "need 1 <= hexChars <= 8")
    require(sampleN > 0, "need sampleN > 0")
    val idField = raw.schema.find(_.name == idCol)
    val integralId = idField.map(_.dataType).exists {
      case _: org.apache.spark.sql.types.LongType => true
      case _: org.apache.spark.sql.types.IntegerType => true
      case _: org.apache.spark.sql.types.ShortType => true
      case _ => false
    }
    if (hexChars > 6 || !integralId) {
      // materialize the ≤ sampleN selection, then release the rawRows
      // cache — a lazily returned plan over it leaked the cache for the
      // session's lifetime (ADVICE r5). The lazy twin stays inspectable
      // for the no-crossJoin plan spec.
      val (plan, rawRows) = dsirResamplePlan(raw, target, idCol, textCol, sampleN, hexChars)
      val out = plan.localCheckpoint()
      rawRows.unpersist()
      return out
    }
    val spark = raw.sparkSession
    import spark.implicits._
    val b = 1L << (4 * hexChars)
    val bInt = b.toInt
    def countsOf(side: DataFrame): Array[Long] =
      graft.core.Par.fanOut(side.select(col(textCol).cast("string")))
        .as[String]
        .mapPartitions { it =>
          val c = new Array[Long](bInt)
          val md = java.security.MessageDigest.getInstance("MD5")
          it.foreach { text =>
            if (text != null) foreachFeature(text, hexChars, md)(c(_) += 1)
          }
          Iterator.single(c)
        }
        // treeReduce, not Dataset.reduce (ADVICE r13): reduce ships one
        // full 16^hexChars long array PER PARTITION to the driver — at the
        // allowed hexChars=6 that is ~134 MB × tasks, past the default
        // driver.maxResultSize on a real cluster. The tree merges
        // executor-side; exactly one array reaches the driver.
        .rdd
        .treeReduce({ (x, y) =>
          val out = new Array[Long](bInt)
          var i = 0
          while (i < bInt) { out(i) = x(i) + y(i); i += 1 }
          out
        }, depth = 2)
    val ctArr = countsOf(target)
    val crArr = countsOf(raw)
    val nt = ctArr.sum
    val nr = crArr.sum
    // per-bucket weight micros — op order mirrors the explode form's lw6
    // Catalyst tree exactly (long 2c+1 then cast, long 2N+B denominator)
    val micros = Array.tabulate(bInt) { i =>
      val d = math.log((2 * ctArr(i) + 1).toDouble / (2L * nt + b)) -
        math.log((2 * crArr(i) + 1).toDouble / (2L * nr + b))
      java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
    }
    val bcM = spark.sparkContext.broadcast(micros)
    val perDoc = graft.core.Par.fanOut(
        raw.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bcM.value
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            var nf = 0L
            var s = 0L
            foreachFeature(text, hexChars, md) { idx => nf += 1; s += m(idx) }
            Iterator.single((id, nf, s))
          }
        }
      }
      .toDF(idCol, "_nf", "_m")
    val u = (Sampling.hashBucket(col(idCol), 1000000) + lit(0.5)) / lit(1000000)
    val selKey = round(col("_slw").cast("double") + -log(-log(u)), 6)
    perDoc.groupBy(col(idCol)).agg(
        sum(col("_nf")).as("n_features"), sum(col("_m")).as("_mm"))
      // exact micros → DECIMAL: long × 0.000001 (decimal(1,6)) widens
      // losslessly, so _slw is the same decimal value the explode form sums
      .withColumn("_slw", col("_mm") * lit(java.math.BigDecimal.valueOf(1L, 6)))
      // the fused encoder widened the id to long; return the caller's
      // declared type so both paths yield one schema (ADVICE r13)
      .select(col(idCol).cast(idField.get.dataType).as(idCol), col("n_features"),
        round(col("_slw").cast("double"), 6).as("logw"),
        selKey.as("sel_key"))
      .orderBy(col("sel_key").desc, col(idCol).asc)
      .limit(sampleN)
      .localCheckpoint()
  }

  /** Streams `text`'s DSIR features — whitespace unigrams plus
    * space-joined bigrams, INCLUDING empty-string tokens, exactly the
    * rows `explode(concat(tokens(text), wordNgrams(text, 2)))` produces
    * (SQL trim strips 0x20 only; split("\\s+", -1) keeps leading/trailing
    * empties from tab/newline edges) — into `f` as md5-hex-prefix bucket
    * indices. One shared MessageDigest, reset per feature by `digest`. */
  private def foreachFeature(
      text: String, hexChars: Int, md: java.security.MessageDigest)(
      f: Int => Unit): Unit = {
    val arr = org.apache.spark.unsafe.types.UTF8String
      .fromString(text).trim().toString.split("\\s+", -1)
    def bump(feature: String): Unit = {
      val dig = md.digest(feature.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var idx = 0
      var k = 0
      while (k < hexChars) {
        val nib = if (k % 2 == 0) (dig(k / 2) >> 4) & 0xF else dig(k / 2) & 0xF
        idx = (idx << 4) | nib
        k += 1
      }
      f(idx)
    }
    var i = 0
    while (i < arr.length) { bump(arr(i)); i += 1 }
    i = 0
    while (i < arr.length - 1) { bump(arr(i) + " " + arr(i + 1)); i += 1 }
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
