package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash signatures + LSH banding for near-duplicate candidate generation.
  *
  * Scale design (SURVEY §4): the k=64 signature is computed in ONE pass over
  * the hashed shingles — 64 `min(xxhash64(seed_i, sh))` aggregate
  * expressions with map-side partial aggregation, so the shuffle carries one
  * 64-long row per doc, not the shingles. Each permutation re-hashes the
  * 8-byte base shingle hash (one codegen'd hashLong round), never the
  * string. Banding emits b rows per doc (not k), candidate generation is an
  * equi-join on (band, band_hash) buckets — never a cross join — and only
  * candidate pairs are re-joined against the hashed shingle sets for exact
  * Jaccard verification.
  */
object MinHashLSH {

  /** (id, signature array<long>) — one row per doc, k minhash values.
    * `shingleHashes` must be (_id, sh) distinct rows (Dedup.shingleHashes). */
  def signatures(shingleHashes: DataFrame, k: Int): DataFrame = {
    val mins = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"_h$i"))
    shingleHashes.groupBy("_id")
      .agg(mins.head, mins.tail: _*)
      .select(col("_id"), array((0 until k).map(i => col(s"_h$i")): _*).as("sig"))
  }

  /** Candidate pairs (a < b) sharing at least one LSH band bucket.
    * bands * rowsPerBand must equal the signature length. */
  def candidatePairs(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame = {
    val bandHashes = array((0 until bands).map { j =>
      val slice = (0 until rowsPerBand).map(r => col("sig").getItem(j * rowsPerBand + r))
      xxhash64((lit(j) +: slice): _*)
    }: _*)
    val banded = sigs.select(col("_id"), posexplode(bandHashes).as(Seq("band", "bh")))
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .distinct()
  }

  /** End-to-end near-dup pairs: MinHash/LSH candidates, then exact Jaccard
    * verification (>= tau) against the shingle sets. */
  def nearDupPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int, k: Int, bands: Int, tau: Double): DataFrame = {
    // materialize the (edge-bounded) pair list, then release the shingle
    // cache — a lazily returned plan over it would leak the cache into the
    // session (the ADVICE r5 class; see Dedup.ngramJaccardPairs)
    val sh = Dedup.shingleHashes(df, idCol, textCol, n).cache()
    val out = nearDupPairsFromHashes(sh, k, bands, tau).localCheckpoint()
    sh.unpersist()
    out
  }

  /** [[nearDupPairs]] over a precomputed (_id, sh) intermediate (caller
    * controls caching — see [[graft.Graft.dedupSuite]]). */
  def nearDupPairsFromHashes(
      sh: DataFrame, k: Int, bands: Int, tau: Double): DataFrame = {
    require(k % bands == 0, "k must be divisible by bands")
    val cands = candidatePairs(signatures(sh, k), bands, k / bands)
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("sz"))
    val common = cands
      .join(sh.as("x"), col("a") === col("x._id"))
      .join(sh.as("y"), col("b") === col("y._id") && col("x.sh") === col("y.sh"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sa") + col("sb") - col("common")))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }
}
