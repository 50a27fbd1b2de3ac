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

  /** EXACT global top-`n` items at sketch shuffle cost — the two-phase
    * q45 shape with the exact first phase swapped for [[graft.functions
    * .MisraGries]]: phase 1 aggregates ≤ `k` counters per (mapper, group)
    * into one candidate superset (where an exact first phase shuffles
    * every distinct item — the difference between k and billions of
    * fingerprints at 100 TB), phase 2 recounts ONLY the candidates
    * exactly and takes the top `n` with a deterministic (count desc,
    * item asc) tie order.
    *
    * Sound, not heuristic: MG guarantees every item with true count
    * > total/(k+1) is a candidate, so the result is provably the exact
    * top-n whenever the n-th count clears that bar — require()d from the
    * exact phase-2 counts, with "raise k" in the message (the [[Dedup
    * .topNgrams]] tieCap bargain: loud failure, never a silent
    * approximation). */
  def exactTopN(df: DataFrame, item: Column, n: Int, k: Int = 1024): DataFrame = {
    require(n >= 1 && k > n, s"need k > n >= 1 (got n=$n, k=$k)")
    val spark = df.sparkSession
    val sk = df.agg(
      graft.functions.MisraGries.sketch(item, k).as("cands"),
      count(item).as("total")).head()
    val cands = sk.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val total = sk.getLong(1)
    val counts = df.select(item.as("item")).where(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("n_occurrences"))
      .collect() // ≤ k rows
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }
    val top = counts.take(n)
    // certified iff the candidates account for the whole stream (they ARE
    // the item universe — exact by construction), or the rank-n exact
    // count clears the MG slack (everything outside the candidate set is
    // provably below it)
    val covered = counts.map(_._2).sum == total
    if (!covered)
      require(top.length == n && top.last._2 > total / (k + 1),
        s"top-$n not certified: rank-${top.length} count " +
          s"${top.lastOption.map(_._2).getOrElse(0L)} is within the " +
          s"Misra-Gries slack ${total / (k + 1)} — raise k (=$k)")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        top.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_occurrences",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** [[exactTopN]] for bigint item streams (fingerprints, hashed keys,
    * numeric ids) — phase 1 runs the primitive-counter
    * [[graft.functions.MisraGries.sketchLong]] (no per-update boxing),
    * same certification bargain. */
  def exactTopNLong(df: DataFrame, item: Column, n: Int, k: Int = 1024): DataFrame = {
    require(n >= 1 && k > n, s"need k > n >= 1 (got n=$n, k=$k)")
    val spark = df.sparkSession
    val sk = df.agg(
      graft.functions.MisraGries.sketchLong(item, k).as("cands"),
      count(item).as("total")).head()
    val cands = sk.getSeq[org.apache.spark.sql.Row](0).map(_.getLong(0))
    val total = sk.getLong(1)
    val counts = df.select(item.as("item")).where(col("item").isin(cands: _*))
      .groupBy("item").agg(count(lit(1)).as("n_occurrences"))
      .collect() // ≤ k rows
      .map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }
    val top = counts.take(n)
    val covered = counts.map(_._2).sum == total
    if (!covered)
      require(top.length == n && top.last._2 > total / (k + 1),
        s"top-$n not certified: rank-${top.length} count " +
          s"${top.lastOption.map(_._2).getOrElse(0L)} is within the " +
          s"Misra-Gries slack ${total / (k + 1)} — raise k (=$k)")
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        top.toSeq.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("item",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_occurrences",
          org.apache.spark.sql.types.LongType, nullable = false))))
  }

  /** Per-group [[exactTopN]] — exact top-`n` items WITHIN each group, with
    * the certification fully inside the plan: phase 1 is one groupBy
    * producing each group's MG candidates + total (map-side-merged
    * sketches — k counters per (mapper, group) on the wire), the candidate
    * (group, item) pairs broadcast back for the exact recount, and a group
    * is certified when its candidates cover its whole stream OR its exact
    * rank-n count clears the group's n/(k+1) slack. Any uncertified group
    * fails the job loudly (collected flags are ≤ one row per group) —
    * same bargain as [[exactTopN]], distributed per group. */
  def exactTopNPerGroup(
      df: DataFrame, groupCol: String, item: Column, n: Int,
      k: Int = 1024): DataFrame = {
    require(n >= 1 && k > n, s"need k > n >= 1 (got n=$n, k=$k)")
    val g = col(groupCol)
    val sk = df.groupBy(g).agg(
      graft.functions.MisraGries.sketch(item, k).as("_cands"),
      count(item).as("_total"))
    val pairs = sk.select(g, explode(col("_cands")).as("_c"))
      .select(g, col("_c.item").as("item"))
    val exact = df.select(g, item.as("item"))
      .join(broadcast(pairs), Seq(groupCol, "item"))
      .groupBy(g, col("item")).agg(count(lit(1)).as("n_occurrences"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g).orderBy(col("n_occurrences").desc, col("item").asc)
    val ranked = exact.withColumn("rank", row_number().over(w))
    val cert = ranked.groupBy(g).agg(
        sum("n_occurrences").as("_cand_sum"),
        max(when(col("rank") === n, col("n_occurrences"))).as("_nth"),
        count(lit(1)).as("_n_cands"))
      .join(sk.select(g, col("_total")), groupCol)
      .where(col("_cand_sum") =!= col("_total") && // not fully covered...
        (col("_n_cands") < n || // ...and either too few candidates
          col("_nth") <= col("_total") / (k + 1))) // ...or rank-n in the slack
      .select(g).collect()
    require(cert.isEmpty,
      s"top-$n not certified for group(s) ${cert.map(_.get(0)).mkString(", ")} " +
        s"— raise k (=$k)")
    ranked.where(col("rank") <= n)
      .select(g, col("item"), col("n_occurrences"), col("rank"))
  }

  /** Exact top-`k` rows per group by (score desc, id asc) via the bounded
    * [[graft.functions.TopK]] aggregate — the scale replacement for the
    * window idiom `row_number() OVER (PARTITION BY g ORDER BY s DESC)`,
    * which shuffles and per-partition-SORTS the entire input. Here the
    * shuffle moves ≤ k (score, id) pairs per (mapper, group) — partials
    * heap-reduce map-side — and nothing is ever globally sorted; at
    * 10^12 rows the window plan moves the corpus, this moves k·groups
    * tiny structs. Exact (total order, no sketch slack). Output:
    * (group..., rank, id, score), rank 1-based best-first. */
  def topKPerGroup(
      df: DataFrame, groupCols: Seq[String], score: Column, id: Column,
      k: Int): DataFrame = {
    val g = groupCols.map(col)
    df.groupBy(g: _*)
      .agg(graft.functions.TopK.topK(score, id, k).as("_top"))
      .select(g :+ posexplode(col("_top")).as(Seq("_pos", "_e")): _*)
      .select(g ++ Seq((col("_pos") + 1).cast("int").as("rank"),
        col("_e.id").as("id"), col("_e.score").as("score")): _*)
  }
}
