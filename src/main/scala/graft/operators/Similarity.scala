package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design (SURVEY §4): brute force is a single O(N) scan with a
  * codegen'd dot product against the (tiny, literal-broadcast) query vector,
  * finished by TakeOrdered top-k — no shuffle of the corpus. IVF buckets the
  * corpus by nearest centroid (broadcast centroid list, argmax in
  * expressions); a query then scans only the `nprobe` closest buckets. On a
  * real cluster the assignment is written bucket-partitioned so a probe
  * prunes to nprobe partitions of ~N/C vectors.
  */
object Similarity {

  private def litVec(v: Seq[Double]): Column = array(v.map(lit): _*)

  /** Cosine between a vector column and a literal query vector. */
  def cosineToQuery(vecCol: Column, query: Seq[Double]): Column =
    Dedup.cosine(vecCol, litVec(query))

  /** Exact top-k by cosine against `query` (excluding `excludeId` if set). */
  def bruteTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, excludeId: Option[Long] = None): DataFrame = {
    val base = excludeId.map(i => df.where(col(idCol) =!= i)).getOrElse(df)
    base
      .withColumn("cosine", round(cosineToQuery(col(vecCol), query), 6))
      .select(col(idCol), col("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Batch k-NN join: for every query row, the k nearest corpus rows by
    * cosine. The query side is broadcast (queries are the small side by
    * construction); corpus and query norms are computed ONCE per row before
    * the pair expansion, so each of the |Q|·|N| candidate pairs costs a
    * single codegen'd dot product. Per-query top-k is a window row_number —
    * the only shuffle, keyed by query_id. */
  def knnJoin(
      corpus: DataFrame, idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String, k: Int): DataFrame = {
    import graft.functions.ArrayMath
    val c = corpus.select(col(idCol), col(vecCol).as("_cv"))
      .withColumn("_cn", ArrayMath.norm2(col("_cv")))
    val q = queries.select(col(qIdCol).as("query_id"), col(qVecCol).as("_qv"))
      .withColumn("_qn", ArrayMath.norm2(col("_qv")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col(idCol).asc)
    c.join(broadcast(q), col(idCol) =!= col("query_id"))
      .withColumn("cosine", ArrayMath.dot(col("_cv"), col("_qv")) / (col("_cn") * col("_qn")))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col(idCol), round(col("cosine"), 6).as("cosine"), col("rank"))
  }

  /** Assigns each vector to its nearest centroid (cosine argmax; ties take
    * the lowest centroid index). Centroids are a driver-side list — they are
    * tiny (C × dim) and become literal expressions, i.e. broadcast for free. */
  def assignBuckets(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]]): DataFrame = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      cosineToQuery(col(vecCol), c).as(s"_c$i")
    }
    val best = greatest(centroids.indices.map(i => col(s"_c$i")): _*)
    val bucket = coalesce(centroids.indices.map(i =>
      when(col(s"_c$i") === best, lit(i))): _*)
    df.select((col(idCol) +: col(vecCol).as("_vec") +: sims): _*)
      .withColumn("bucket", bucket)
      .select(col(idCol), col("_vec").as(vecCol), col("bucket"))
  }

  /** Deterministic k-means-lite (Lloyd) centroid training for IVF.
    *
    * Init is the first C vectors by id (deterministic, no RNG); each round
    * assigns every vector to its nearest centroid (codegen cosine argmax,
    * broadcast centroids) and recomputes centroids as per-bucket means —
    * ONE groupBy shuffle per round carrying C×dim doubles per partition
    * after map-side partial aggregation. Rounds are few and fixed (the
    * centroids only gate recall, not correctness). Empty buckets keep
    * their previous centroid. */
  def kMeans(
      df: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int): Seq[Seq[Double]] = {
    // Lloyd re-scans the corpus every round (dim probe + init + one agg per
    // iteration): cache the two columns it reads for the loop's lifetime —
    // the classic iterative-ML persist — and release before returning.
    val vecs = df.select(col(idCol), col(vecCol)).cache()
    // the columnar round builds C cosine columns and dim sum-aggregates —
    // fine at IVF-coarse shapes, codegen-hostile once C reaches the
    // hundreds; the treeAggregate path has no per-centroid expressions
    try
      if (c > 64) kMeansTreeCached(vecs, idCol, vecCol, c, iters)
      else kMeansCached(vecs, idCol, vecCol, c, iters)
    finally { vecs.unpersist(); () }
  }

  /** Lloyd rounds via RDD `treeAggregate` — the large-C path ([[kMeans]]
    * dispatches here above C = 64, or call directly). Semantics match the
    * columnar rounds: first-C-by-id init, cosine argmax with first-max
    * (lowest index) ties — NaN ordered greatest, as Spark's `greatest`
    * orders doubles — and empty buckets keep their previous centroid.
    *
    * Per partition ONE flat (c×dim sums, c counts) accumulator is filled
    * in a tight JVM loop (no per-centroid Columns, no codegen blowup);
    * partials combine in a depth-2 tree, so the driver merges
    * O(√partitions) buffers instead of every partition's — the classic
    * treeAggregate bargain for C in the thousands. Float caveat: combine
    * order is scheduler-dependent, so centroid sums carry the usual
    * last-ulp addition-order jitter (the columnar path's shuffled partial
    * aggregation has the same property — neither is bit-pinned).
    */
  def kMeansTree(
      df: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int, depth: Int = 2): Seq[Seq[Double]] = {
    val vecs = df.select(col(idCol), col(vecCol)).cache()
    try kMeansTreeCached(vecs, idCol, vecCol, c, iters, depth)
    finally { vecs.unpersist(); () }
  }

  /** Vector dimensionality from the first row — a loud, named refusal on
    * an empty corpus (training/banding cannot infer a dim from nothing;
    * an empty input otherwise surfaces as a bare NoSuchElementException
    * deep in a driver-side head()). */
  private[graft] def vecDim(df: DataFrame, vecCol: String, who: String): Int = {
    val row = df.select(size(col(vecCol))).limit(1).collect()
    require(row.nonEmpty, s"$who: input has no rows - cannot infer vector dimension")
    row.head.getInt(0)
  }

  private def kMeansTreeCached(
      df: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int, depth: Int = 2): Seq[Seq[Double]] = {
    val spark = df.sparkSession
    import spark.implicits._
    val dim = vecDim(df, vecCol, "kMeans")
    var centroids: Array[Array[Double]] = df.orderBy(col(idCol)).limit(c)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val data = df.select(col(vecCol)).as[Array[Float]].rdd
    (1 to iters).foreach { _ =>
      val bc = spark.sparkContext.broadcast(centroids)
      val (sums, counts) = data.treeAggregate(
        (new Array[Double](c * dim), new Array[Long](c)))(
        seqOp = { case ((s, n), v) =>
          val cs = bc.value
          // argmax of dot/(|v||c|): same fold order as the codegen cosine
          var best = Double.NegativeInfinity
          var bestI = 0
          var vn = 0.0
          var i = 0
          while (i < dim) { vn += v(i).toDouble * v(i).toDouble; i += 1 }
          val vnorm = math.sqrt(vn)
          var b = 0
          while (b < cs.length) {
            val cv = cs(b)
            var dot = 0.0
            var cn = 0.0
            i = 0
            while (i < dim) {
              dot += v(i).toDouble * cv(i); cn += cv(i) * cv(i); i += 1
            }
            val sim = dot / (vnorm * math.sqrt(cn))
            // Double.compare orders NaN greatest — Spark greatest() parity
            if (java.lang.Double.compare(sim, best) > 0) { best = sim; bestI = b }
            b += 1
          }
          i = 0
          while (i < dim) { s(bestI * dim + i) += v(i).toDouble; i += 1 }
          n(bestI) += 1
          (s, n)
        },
        combOp = { case ((s1, n1), (s2, n2)) =>
          var i = 0
          while (i < s1.length) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < n1.length) { n1(i) += n2(i); i += 1 }
          (s1, n1)
        },
        depth = depth)
      bc.destroy()
      centroids = centroids.zipWithIndex.map { case (prev, b) =>
        if (counts(b) == 0L) prev
        else Array.tabulate(dim)(i => sums(b * dim + i) / counts(b))
      }
    }
    centroids.map(_.toSeq).toSeq
  }

  private def kMeansCached(
      df: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int): Seq[Seq[Double]] = {
    val dim = vecDim(df, vecCol, "kMeans")
    var centroids: Seq[Seq[Double]] = df.orderBy(col(idCol)).limit(c)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq
    (1 to iters).foreach { _ =>
      val assigned = assignBuckets(df, idCol, vecCol, centroids)
      val sums = assigned
        .select(col("bucket"), transform(col(vecCol), x => x.cast("double")).as("_v"))
        .groupBy("bucket")
        .agg(
          count(lit(1)).as("_n"),
          array((0 until dim).map(i => sum(col("_v").getItem(i))): _*).as("_s"))
        .collect()
      val next = centroids.toArray
      sums.foreach { r =>
        val b = r.getInt(0)
        val n = r.getLong(1).toDouble
        next(b) = r.getSeq[Double](2).map(_ / n).toSeq
      }
      centroids = next.toSeq
    }
    centroids
  }

  /** The `nprobe` bucket indices whose centroids are cosine-closest to the
    * query (driver-side — C×dim doubles; ties take the lower index). */
  private[operators] def probeBuckets(
      centroids: Seq[Seq[Double]], query: Seq[Double], nprobe: Int): Seq[Int] = {
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    centroids.zipWithIndex
      .sortBy { case (c, i) => (-cos(c, query), i) }
      .take(nprobe).map(_._2)
  }

  /** IVF top-k: search only the `nprobe` buckets whose centroids are closest
    * to the query. Approximate — recall vs bruteTopK is measured in specs.
    *
    * NOTE: this variant re-derives bucket assignments from the raw corpus —
    * one full (codegen, shuffle-free) scan per query. That is the right shape
    * for ad-hoc queries over data that is already in memory or queried once;
    * for repeated queries at scale use [[VectorIndex.writeIvf]] +
    * [[VectorIndex.ivfTopK]], where the probe reads only nprobe
    * bucket-partitioned directories. */
  def ivfTopK(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], query: Seq[Double],
      nprobe: Int, k: Int, excludeId: Option[Long] = None): DataFrame = {
    val probe = probeBuckets(centroids, query, nprobe)
    val buckets = assignBuckets(df, idCol, vecCol, centroids)
      .where(col("bucket").isin(probe: _*))
    bruteTopK(buckets, idCol, vecCol, query, k, excludeId)
  }

  /** Seeded Gaussian hyperplanes for random-hyperplane (cosine) LSH —
    * java.util.Random's sequence is specified, so every executor and every
    * run derives identical planes from the seed. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket of a vector column under the given hyperplanes
    * (bit j set iff dot(vec, plane_j) >= 0) — one codegen'd dot per plane,
    * no shuffle. */
  def lshBucket(vecCol: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (p, j) =>
      when(graft.functions.ArrayMath.dot(vecCol, litVec(p)) >= 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Per-table multiprobe bucket sequence (Lv et al., "Multi-Probe LSH",
    * VLDB 2007): the query's own sign bucket first, then single-bit
    * perturbations in increasing |margin| order — a near-boundary
    * hyperplane is the one most likely to have put a true neighbor on the
    * other side, so flipping the smallest-margin bits first buys the most
    * recall per extra bucket probed. Driver-side (bits × dim doubles). */
  private[graft] def multiprobeBuckets(
      planes: Seq[Seq[Double]], query: Seq[Double], nprobe: Int): Seq[Int] = {
    val dots = planes.map(_.zip(query).foldLeft(0.0) { case (a, (x, y)) => a + x * y })
    val qBucket = dots.zipWithIndex.map { case (d, j) => if (d >= 0) 1 << j else 0 }.sum
    val flips = dots.zipWithIndex.sortBy { case (d, j) => (math.abs(d), j) }
      .map { case (_, j) => qBucket ^ (1 << j) }
    qBucket +: flips.take(nprobe - 1)
  }

  /** Multi-table random-hyperplane LSH ANN — the bucketed alternative scale
    * path to [[ivfTopK]]. The classic amplification: `tables` independent
    * sign-hashes of `bitsPerTable` bits each; a corpus vector is a candidate
    * if it lands in any of the query's `nprobe` probed buckets in ANY table
    * (few bits per table keeps per-table match probability workable, many
    * tables drive recall up), then exact cosine runs only over candidates.
    * `nprobe` > 1 turns on MULTIPROBE ([[multiprobeBuckets]]): each table
    * also probes the nprobe−1 hamming-1 neighbor buckets with the smallest
    * hyperplane margins, lifting recall at ~nprobe× the candidate count
    * WITHOUT more tables (i.e. without growing the index). Each table's
    * bucket is a pure projection, so at scale the corpus is written
    * `tables` times partitioned by bucket (or one table with bucket-array +
    * explode) and a query probes `tables × nprobe` partitions of ~N/2^bits
    * rows. Approximate — recall AND candidates-scanned vs [[bruteTopK]]
    * are measured in specs.
    *
    * NOTE: like [[ivfTopK]], this variant hashes the raw corpus per query;
    * the repeated-query scale path is [[VectorIndex.writeLsh]] +
    * [[VectorIndex.lshTopK]], which reads exactly `tables × nprobe` bucket
    * directories of a materialized index. */
  def lshTopK(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], bitsPerTable: Int, tables: Int, seed: Long, k: Int,
      excludeId: Option[Long] = None, nprobe: Int = 1): DataFrame = {
    require(bitsPerTable > 0 && bitsPerTable < 31 && tables > 0, "bad LSH shape")
    val byTable = hyperplanes(bitsPerTable * tables, query.length, seed)
      .grouped(bitsPerTable).toSeq
    lshTopKPlanes(df, idCol, vecCol, query, byTable, k, excludeId, nprobe)
  }

  /** [[lshTopK]] with the hyperplanes INJECTED (`byTable(t)(b)` = plane
    * `b` of table `t`) instead of seed-derived — the exact same bucketing
    * ([[lshBucket]]), multiprobe ([[multiprobeBuckets]]) and re-rank
    * machinery, exposed so a caller (q158's full-oracle gate) can plant
    * engine-replicable planes. */
  def lshTopKPlanes(
      df: DataFrame, idCol: String, vecCol: String,
      query: Seq[Double], byTable: Seq[Seq[Seq[Double]]], k: Int,
      excludeId: Option[Long] = None, nprobe: Int = 1): DataFrame = {
    require(byTable.nonEmpty, "bad LSH shape")
    val bitsPerTable = byTable.head.length
    require(bitsPerTable > 0 && bitsPerTable < 31 &&
      byTable.forall(_.length == bitsPerTable), "bad LSH shape")
    require(nprobe >= 1 && nprobe <= bitsPerTable + 1,
      s"nprobe must be in [1, bitsPerTable + 1 = ${bitsPerTable + 1}]")
    val candidateCond = byTable.map { planes =>
      val probes = multiprobeBuckets(planes, query, nprobe)
      lshBucket(col(vecCol), planes).isin(probes: _*)
    }.reduce(_ || _)
    bruteTopK(df.where(candidateCond), idCol, vecCol, query, k, excludeId)
  }
}
