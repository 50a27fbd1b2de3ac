package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Queries run in sorted name order; the cache is cleared between queries so
  * one operator's cached lineage can't distort (or subsidize) another's
  * time. Results are fully materialized through the `noop` sink — a count()
  * would let column pruning skip most of the computed projections.
  *
  * The suite runs SPARK_GRAFT_BENCH_REPS (default 2) full passes and
  * reports the per-query MINIMUM: this host shows multi-minute windows of
  * hypervisor CPU steal that inflate whatever queries happen to be running
  * 10-50× (the same binary measured 101 s and 366 s total back-to-back);
  * min-over-passes estimates the unperturbed cost. "value" is the sum of
  * the reported per-query times.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark: SparkSession = graft.core.GraftSession
      .builder(master = s"local[$cpus]", shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the session (scheduler, parquet reader, codegen pipeline) so the
    // alphabetically-first query doesn't absorb one-time JVM init costs
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    val names = SparkEntry.queries.toSeq.sortBy(_._1)
    // Only SUCCESSFUL runs feed the per-query minimum: a throwing query's
    // near-zero elapsed time must not masquerade as a speedup. A query with
    // zero successful reps is reported in "failed" (value -1) and excluded
    // from the total, so a regression that breaks a query is visible in the
    // JSON rather than flattering it.
    val best = scala.collection.mutable.Map[String, Double]()
    val worst = scala.collection.mutable.Map[String, Double]()
    val everFailed = scala.collection.mutable.Set[String]()
    (1 to reps).foreach { _ =>
      names.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
          catch { case e: Throwable => System.err.println(s"[bench] $name failed: $e"); false }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        if (ok) {
          best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
          worst(name) = math.max(worst.getOrElse(name, 0.0), dt)
        } else everFailed += name
      }
    }
    val failed = names.map(_._1).filterNot(best.contains)
    val qs = names.map { case (k, _) => "\"" + k + "\":" + best.getOrElse(k, -1.0) }
      .mkString("{", ",", "}")
    val total = best.values.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Per-query max/min ratio across reps: a CPU-steal window shows up as a
    // handful of queries with spread ≫ 1 while their min stays sane, letting
    // a reader distinguish host noise from a real regression without re-runs.
    val spread = names.collect { case (k, _) if best.contains(k) =>
      "\"" + k + "\":" + math.round(worst(k) / best(k) * 100.0) / 100.0
    }.mkString("{", ",", "}")
    // Approximate-ANN recall@10 vs brute force at this SF (SURVEY §9):
    // timings alone can't show an index trading away its recall, so the
    // floor is tracked longitudinally alongside them.
    val recallJson = try {
      import graft.operators.Similarity
      import org.apache.spark.sql.functions.col
      val emb = graft.core.Tables.load(spark, sfDir, "embeddings")
      val q = emb.where(col("vec_id") === 0L)
        .select("embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
      def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.select("vec_id").collect().map(_.getLong(0)).toSet
      val brute = ids(Similarity.bruteTopK(emb, "vec_id", "embedding", q, 10, Some(0L)))
      val centroids = Similarity.kMeans(emb, "vec_id", "embedding", c = 8, iters = 2)
      val ivf = ids(Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, q, 2, 10, Some(0L)))
      val lsh = ids(Similarity.lshTopK(emb, "vec_id", "embedding", q, 4, 6, 42L, 10, Some(0L)))
      def r(s: Set[Long]) = (s & brute).size.toDouble / brute.size
      s""","recall":{"ivf_c8_nprobe2":${r(ivf)},"lsh_4bit_6tab":${r(lsh)}}"""
    } catch { case e: Throwable => System.err.println(s"[bench] recall failed: $e"); "" }
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"spread":$spread,"failed":$failedJson$recallJson,"sf":"$sfDir","reps":$reps}""")
    spark.stop()
  }
}
