package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document/embedding corpora.
  *
  * Scale design (SURVEY §4): every variant avoids the O(N²) cross join —
  * exact dedup is a single hash aggregation; n-gram near-dup generates
  * candidates through an equi-join on shared shingles (only docs that share
  * at least one shingle ever meet); embedding near-dup is the one
  * intentionally exact/quadratic variant (the approximate scale path is
  * MinHashLSH / SimHash / Similarity IVF).
  */
object Dedup {

  /** Exact dedup: keep the minimum id per identical text. One hash-agg
    * shuffle, map-side partial aggregation, no sort. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "n_copies")

  /** Distinct word n-gram shingles, exploded to (id, shingle) rows.
    * Docs shorter than n tokens produce no rows. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val sh = array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
    df.where(size(toks) >= n)
      .select(col(idCol).as("_id"), explode(sh).as("shingle"))
  }

  /** Word n-gram Jaccard near-duplicate pairs (similarity >= tau).
    *
    * Candidates come from an equi-join on shingle — a doc pair is compared
    * exactly once per shared shingle and aggregated, so the cost is bounded
    * by shingle collision counts, not N². At 100 TB, frequent-shingle skew is
    * handled by AQE skew-join splitting; ultra-frequent shingles can
    * additionally be dropped as stop-shingles upstream. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val sh = shingles(df, idCol, textCol, n).cache()
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("sz"))
    val common = sh.as("x").join(sh.as("y"), col("x.shingle") === col("y.shingle"))
      .where(col("x._id") < col("y._id"))
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sa") + col("sb") - col("common")))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Cosine of two float-vector columns, computed in double with a
    * sequential left fold (bit-identical to the SQL oracle's list_reduce). */
  def cosine(a: Column, b: Column): Column = {
    def d(v: Column) = transform(v, x => x.cast("double"))
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    val (da, db) = (d(a), d(b))
    dot(da, db) / (sqrt(dot(da, da)) * sqrt(dot(db, db)))
  }

  /** Embedding cosine near-duplicate pairs (cosine >= tau), exact.
    *
    * Deliberately all-pairs within the corpus: exactness is the contract
    * here (the oracle is exact SQL). The self-join shuffles both sides on
    * nothing — Spark plans a broadcast-nested-loop with the smaller side
    * broadcast; for corpora too large for that, use MinHashLSH / Similarity
    * (IVF) which trade exactness for an equi-join shape. */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    val x = df.select(col(idCol).as("a"), col(vecCol).as("_va"))
    val y = df.select(col(idCol).as("b"), col(vecCol).as("_vb"))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine", cosine(col("_va"), col("_vb")))
      .where(col("cosine") >= tau)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
  }
}
