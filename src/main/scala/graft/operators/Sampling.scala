package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, partitioning-independent sampling/splitting for dataset
  * curation.
  *
  * `rand(seed)`-based sampling (`df.sample`, `sampleBy`) draws per-row in
  * partition order, so the SAME row can land in a different split after a
  * repartition, a scale-up, or a source re-bucketing — unacceptable for
  * train/val/test hygiene where a row must keep its assignment for the life
  * of the corpus. Hash-based assignment depends only on the row's id: a
  * narrow codegen'd projection, no shuffle, no state, stable at any scale.
  *
  * The mix is plain modular arithmetic (Knuth multiplicative hashing modulo
  * a prime) rather than xxhash64 so the exact assignment is reproducible in
  * ANY engine with 64-bit integer SQL — the id is reduced mod p first, so
  * the product stays below 2^63 for any id (no overflow wrap to depend on).
  *
  * Reference behavior: wrds2pg has no sampling surface (it copies tables
  * whole, wrds2pg/api.py:37 wrds_update); this is part of the
  * training-data-pipeline extension surface.
  */
object Sampling {

  private val P = 1000000007L // prime modulus
  private val A = 2654435761L // Knuth's 2^32 / phi multiplier

  /** Uniform bucket in [0, buckets) from an integral id — the SQL-portable
    * mix `((id mod p) * a mod p) mod buckets`. */
  def hashBucket(id: Column, buckets: Int): Column =
    pmod(pmod(pmod(id.cast("long"), lit(P)) * lit(A), lit(P)), lit(buckets))

  /** Deterministic global shuffle + sharding — the "randomize the corpus
    * order before training" step (domain- and time-ordered corpora bias
    * early training; shuffling must be reproducible across reruns and
    * engines, so `rand()` is out). Every row gets a `shard` in
    * [0, shards) and a dense 1-based `pos` within its shard; reading
    * shards in pos order IS the shuffled corpus.
    *
    * The shuffle key is the seeded portable mix (id+seed) mod p · a
    * mod p — same family as [[hashBucket]], reproducible in any 64-bit
    * SQL engine. The ORDER uses the full mod-p value (~10^9 key space):
    * a truncated key would leave million-row id-ordered tie runs at
    * 10^12-row scale, quietly preserving the very time/domain order the
    * operator exists to break; residual ties (two ids, one key) break
    * on id. Shard ASSIGNMENT keeps the mod-10^6 reduction (uniformity
    * only needs the residue, and it preserves existing assignments).
    * Scale shape: one hash projection + one window keyed BY SHARD — each
    * shard's position numbering is independent, so parallelism is the
    * shard count (hundreds-to-thousands of output files at corpus
    * scale), never a single global sort. `pos` is a 32-bit row_number:
    * size shards so each holds < 2^31 rows (at 10^12 rows that is
    * ≥ ~500 shards — well under the natural shard count anyway). */
  def shuffleShards(
      df: DataFrame, idCol: String, shards: Int, seed: Long = 0L): DataFrame = {
    require(shards >= 1, s"shuffleShards: need shards >= 1, got $shards")
    require(!df.columns.contains("shard") && !df.columns.contains("pos") &&
      !df.columns.contains("_sk"),
      "shuffleShards: input already has a shard/pos/_sk column")
    val key = pmod(pmod(col(idCol).cast("long") + lit(seed), lit(P)) * lit(A), lit(P))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_sk").asc, col(idCol).asc)
    df.withColumn("_sk", key)
      .withColumn("shard",
        pmod(pmod(col("_sk"), lit(1000000L)), lit(shards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("_sk")
  }

  /** Adds a `split` column ("train"/"val"/"test") with the given percentage
    * cut points over 100 hash buckets, e.g. (80, 10) → 80/10/10. */
  def deterministicSplit(
      df: DataFrame, idCol: String, trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 < valPct, trainPct + valPct < 100")
    val b = hashBucket(col(idCol), 100)
    df.withColumn("split",
      when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Train/val/test split whose assignment unit is the NEAR-DUP CLUSTER
    * ([[Dedup.nearDupClusters]] min-id label), not the document: every
    * member of a near-duplicate group lands in the same split, so the
    * held-out set can never contain a near-copy of a training doc — the
    * leakage failure a per-doc hash split ([[deterministicSplit]]) cannot
    * prevent. Returns (doc_id, cluster_id, split); join back by id for
    * full columns. Topology = the q35 cluster pass (shingle equi-join +
    * edge-bounded components) plus one pure projection — the split
    * expression is the same SQL-portable hash, keyed by cluster id. */
  def leakageSafeSplit(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      trainPct: Int, valPct: Int): DataFrame = {
    require(trainPct > 0 && valPct > 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 < valPct, trainPct + valPct < 100")
    val b = hashBucket(col("cluster_id"), 100)
    Dedup.nearDupClusters(df, idCol, textCol, n, tau)
      .withColumn("split",
        when(b < trainPct, "train").when(b < trainPct + valPct, "val").otherwise("test"))
  }

  /** Deterministic fraction sample: keeps ids whose bucket (out of `den`)
    * falls below `num` — e.g. (1, 10) keeps a stable 10%. */
  def hashSample(df: DataFrame, idCol: String, num: Int, den: Int): DataFrame = {
    require(num > 0 && num < den, "need 0 < num < den")
    df.where(hashBucket(col(idCol), den) < num)
  }

  /** Deterministic stratified sample: exactly `perStratum` rows from each
    * stratum (fewer when the stratum is smaller), chosen as the rows with
    * the smallest id-hash — so membership is stable under repartitioning and
    * re-runs, unlike `sampleBy`. Balanced-corpus curation (per language, per
    * domain) at scale: the rank-limit filter triggers Spark's partial+final
    * `WindowGroupLimit`, so each map task keeps at most `perStratum` rows
    * per stratum before the shuffle. */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, idCol: String, perStratum: Int,
      seed: Long = 0L): DataFrame = {
    require(perStratum > 0, "need perStratum > 0")
    // seed shifts the id before the mix: a different reproducible draw
    // per seed, and seed = 0 is exactly the unseeded legacy assignment
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(hashBucket(col(idCol) + lit(seed), 1000000007).asc, col(idCol).asc)
    df.withColumn("_ss_rn", row_number().over(w))
      .where(col("_ss_rn") <= perStratum)
      .drop("_ss_rn")
  }

  /** Deterministic WEIGHTED stratified sample — Efraimidis–Spirakis
    * (2006) algorithm A-ES: per stratum, keep the `k` rows with the
    * smallest −ln(u)/w, where u ∈ (0,1) is this file's portable uniform
    * ((id+seed) mod p · a mod p, midpoint-shifted) and w > 0 the row's
    * weight. A-ES proves the draw is a weighted sample without
    * replacement — inclusion odds track weights — while staying
    * reproducible across engines, reruns, and repartitionings (the
    * rand()-based weighted samplers are partition-order-dependent, the
    * same defect [[stratifiedSample]] exists to fix). Quality-weighted
    * corpus draws ("sample 10k docs per language ∝ quality score") are
    * the training-data use.
    *
    * Scale shape: one narrow codegen projection + the rank-limit window
    * — Spark's partial+final `WindowGroupLimit` keeps ≤ k rows per
    * stratum per map task before the shuffle, so the exchange carries
    * O(strata · k · tasks), never the corpus. Rows with w ≤ 0 are
    * excluded (A-ES undefined there). Output: input columns + `es_key`
    * (the selection key, full precision; round for display). */
  def weightedSample(
      df: DataFrame, stratumCol: String, idCol: String, weight: Column,
      k: Int, seed: Long = 0L): DataFrame = {
    require(k > 0, s"weightedSample: need k > 0, got $k")
    val mix = pmod(pmod(col(idCol).cast("long") + lit(seed), lit(P)) * lit(A), lit(P))
    val u = (mix.cast("double") + lit(0.5)) / lit(P.toDouble)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
    df.where(weight.cast("double") > 0.0)
      .withColumn("es_key", -log(u) / weight.cast("double"))
      .withColumn("_es_rn", row_number().over(w))
      .where(col("_es_rn") <= k)
      .drop("_es_rn")
  }
}
