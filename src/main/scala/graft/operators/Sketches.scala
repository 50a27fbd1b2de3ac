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

  /** The k smallest DISTINCT xxhash64 values of `key` — a KMV (bottom-k)
    * sketch (Bar-Yossef et al. 2002; Beyer et al. SIGMOD'07 for the
    * unbiased estimator). Scale shape: each partition keeps a capped
    * TreeSet (≤ k longs on the wire — the corpus never shuffles), then
    * one distinct + TakeOrdered over the ≤ k·P bounded rows. Returns a
    * sorted ascending array; length < k means the sketch IS the full
    * distinct hash set (the exact regime). */
  private[graft] def kmvValues(df: DataFrame, key: Column, k: Int): Array[Long] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(xxhash64(key).as("h")).as[Long]
      .mapPartitions { it =>
        val set = new java.util.TreeSet[java.lang.Long]()
        it.foreach { h =>
          if (set.size < k) { set.add(h); () }
          else if (h < set.last) { if (set.add(h)) { set.pollLast(); () } }
        }
        import scala.jdk.CollectionConverters._
        set.iterator.asScala.map(Long.unbox)
      }
      .toDF("h").distinct().orderBy("h").limit(k).as[Long].collect()
  }

  /** Pairwise overlap stats from two sorted-ascending KMV sketches
    * (shared by [[corpusOverlap]], [[overlapMatrix]], and the streaming novelty twin): (n_a, n_b,
    * n_union, n_intersection, jaccard@6dp, is_exact). */
  private[graft] def kmvPairStats(sa: Array[Long], sb: Array[Long], k: Int)
      : (Long, Long, Long, Long, Double, Boolean) = {
    def frac(h: Long): Double = // rank of h in (0, 1]: position of the hash
      (h.toDouble - Long.MinValue.toDouble + 1.0) / math.pow(2.0, 64)
    def estDistinct(s: Array[Long]): Long =
      if (s.length < k) s.length.toLong
      else math.round((k - 1).toDouble / frac(s.last))
    def r6(x: Double): Double =
      java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
        .doubleValue()
    val exact = sa.length < k && sb.length < k
    if (exact) {
      val setA = sa.toSet; val setB = sb.toSet
      val union = setA ++ setB
      val inter = setA & setB
      val j = if (union.isEmpty) 0.0 else inter.size.toDouble / union.size
      (setA.size.toLong, setB.size.toLong, union.size.toLong,
        inter.size.toLong, r6(j), true)
    } else {
      val merged = (sa ++ sb).distinct.sorted.take(k) // == bottom-k(A∪B)
      val inBoth = merged.count(h =>
        java.util.Arrays.binarySearch(sa, h) >= 0 &&
          java.util.Arrays.binarySearch(sb, h) >= 0)
      val j = inBoth.toDouble / k
      val union = math.round((k - 1).toDouble / frac(merged.last))
      (estDistinct(sa), estDistinct(sb), union,
        math.round(j * union).longValue, r6(j), false)
    }
  }

  /** Overlap profile of two corpora WITHOUT joining them: distinct
    * counts, union, intersection, and Jaccard over `textCol`'s xxhash64
    * identity, from one bounded KMV sketch per side.
    *
    * HLL ([[profile]]) unions but cannot intersect; KMV can: the k
    * smallest of A∪B are a uniform sample of the union, every one of
    * them testable for membership in A and B against the two sketches
    * (h ≤ τ_union ≤ each side's own τ, so sketch membership IS set
    * membership there). J ≈ |bottom-k(A∪B) ∩ A ∩ B| / k, distinct(X) ≈
    * (k−1)/τ_X, intersection ≈ J · union — the standard KMV estimators,
    * ±O(1/√k) relative error.
    *
    * CERTIFIED exactness: when BOTH sides' sketches are under k, they
    * are the complete distinct-hash sets and every output is exact
    * (`is_exact` = true) up to xxhash64 collisions (~n²/2^64) — which is
    * what makes the operator oracle-checkable at test scale while the
    * estimator regime is spec-pinned. Estimated counts round to long;
    * jaccard rounds to 6dp in both regimes.
    *
    * At 100 TB this is the "how much does this crawl snapshot overlap
    * the last one / the benchmark suite" question answered with two
    * scans, two ≤k·P-row shuffles, and 2k longs on the driver. */
  def corpusOverlap(
      a: DataFrame, b: DataFrame, textCol: String, k: Int = 1 << 16): DataFrame = {
    require(k >= 2, s"corpusOverlap: need k >= 2, got $k")
    val spark = a.sparkSession
    val sa = kmvValues(a, col(textCol), k)
    val sb = kmvValues(b, col(textCol), k)
    val (nA, nB, nUnion, nInter, jac, exact) = kmvPairStats(sa, sb, k)
    spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(nA, nB, nUnion, nInter, jac, exact)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("n_a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_union",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_intersection",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("is_exact",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

  /** Per-group KMV sketches via the NATIVE [[graft.functions.KmvAgg]]
    * aggregate: one row per group holding the sorted bottom-k hash array.
    * State merges map-side (≤ k longs per mapper-group), so N groups over
    * a 100 TB corpus cost one combining aggregate — the grouped upgrade
    * of [[corpusOverlap]]'s two-corpus driver combine. Persist the result
    * and diff snapshots without rescanning either. */
  def groupKmv(
      df: DataFrame, groupCol: String, key: Column, k: Int): DataFrame =
    df.groupBy(col(groupCol))
      .agg(graft.functions.Kmv.sketch(xxhash64(key), k).as("kmv"))
      // k travels WITH the sketch (the streaming SketchSchema discipline):
      // a sketch is only interpretable against the k it was built with —
      // estimators and the exact-regime test are meaningless under any other
      .withColumn("k", lit(k))

  /** Pairwise overlap matrix over [[groupKmv]] output: one row per
    * unordered group pair (ga < gb by name) with the [[corpusOverlap]]
    * stats. Driver-side by design — the matrix is |groups|² and each
    * sketch is ≤ k longs, so the driver holds |groups|·k longs; the
    * corpus itself was touched exactly once, by the grouped aggregate. */
  def overlapMatrix(sketches: DataFrame, k: Int): DataFrame = {
    val spark = sketches.sparkSession
    // Refuse mismatched k loudly: a sketch built under a SMALLER k than the
    // one passed here is truncated — its length satisfies the exact-regime
    // test (< passed k) and would certify is_exact=true with badly wrong
    // counts. The k column groupKmv now emits makes the check airtight; a
    // k-less input (pre-upgrade sketches) still gets the length guard.
    val kIdx = sketches.columns.indexOf("k")
    val rows = sketches.collect()
      .map { r =>
        if (kIdx >= 0) {
          val rk = r.getInt(kIdx)
          require(rk == k,
            s"overlapMatrix: sketch for group '${r.get(0)}' was built with " +
              s"k=$rk but k=$k was passed — estimators and the exact-regime " +
              s"test are only valid under the sketch's own k")
        }
        val s = r.getSeq[Long](1).toArray
        require(s.length <= k,
          s"overlapMatrix: sketch for group '${r.get(0)}' holds ${s.length} " +
            s"values > k=$k — it was built with a larger k than passed")
        (String.valueOf(r.get(0)), s)
      }
      .sortBy(_._1)
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    for (i <- rows.indices; j <- i + 1 until rows.length) {
      val (ga, sa) = rows(i)
      val (gb, sb) = rows(j)
      val (nA, nB, nUnion, nInter, jac, exact) = kmvPairStats(sa, sb, k)
      out.add(org.apache.spark.sql.Row(ga, gb, nA, nB, nUnion, nInter, jac, exact))
    }
    spark.createDataFrame(out,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("ga",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("gb",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("n_a",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_b",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_union",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("n_intersection",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("jaccard",
          org.apache.spark.sql.types.DoubleType, nullable = false),
        org.apache.spark.sql.types.StructField("is_exact",
          org.apache.spark.sql.types.BooleanType, nullable = false))))
  }

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
