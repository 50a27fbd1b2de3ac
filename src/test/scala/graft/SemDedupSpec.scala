package graft

import graft.operators.{Dedup, SemDedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Three well-separated clusters in R^4 (axis directions), one vector per
    * cluster among ids 0-2 so the deterministic first-C kMeans init starts
    * with one seed per cluster. Ids 10/11 and 20/21 are planted near-identical
    * pairs (scaled copies, cosine 1) inside clusters 0 and 1. */
  private def clustered = Seq(
    (0L, Array(1.0f, 0.02f, 0.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f, 0.03f, 0.0f)),
    (2L, Array(0.0f, 0.0f, 1.0f, 0.04f)),
    (10L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
    (11L, Array(1.8f, 0.2f, 0.0f, 0.0f)), // = 2 × vec 10 → cosine 1
    (12L, Array(0.95f, 0.0f, 0.05f, 0.0f)),
    (20L, Array(0.1f, 0.9f, 0.05f, 0.0f)),
    (21L, Array(0.2f, 1.8f, 0.1f, 0.0f)), // = 2 × vec 20 → cosine 1
    (30L, Array(0.0f, 0.1f, 0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("pairs: exact precision, and equals the quadratic scan on clustered data") {
    val centroids = Similarity.kMeans(clustered, "vec_id", "embedding", c = 3, iters = 3)
    val got = SemDedup.pairs(clustered, "vec_id", "embedding", centroids, tau = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingCosinePairs(clustered, "vec_id", "embedding", tau = 0.999)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 11L), (20L, 21L)))
    assert(got === exact) // in-cluster dups: the blocked pass loses nothing
  }

  test("semDedup keeps the min-id exemplar, all columns, and a cluster id") {
    val withTag = clustered.withColumn("tag", concat(lit("doc"), col("vec_id")))
    val out = SemDedup.semDedup(withTag, "vec_id", "embedding", c = 3, iters = 3, tau = 0.999)
    assert(out.columns.toSeq === Seq("vec_id", "embedding", "tag", "bucket"))
    val survivors = out.select("vec_id").as[Long].collect().toSet
    assert(survivors === Set(0L, 1L, 2L, 10L, 12L, 20L, 30L)) // 11 and 21 lose
    // cluster labels: planted pair members share their exemplar's bucket
    val buckets = out.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(buckets.values.toSet.size === 3)
    // every survivor kept its original tag
    val tags = out.select("vec_id", "tag").as[(Long, String)].collect().toMap
    assert(tags(12L) === "doc12")
  }

  test("semDedupWith: planted centroids drive the same machinery, hand-checked survivors") {
    // q161's seam: axis centroids planted directly (no k-means), so bucket
    // assignment and survivors are fully hand-computable
    val centroids = Seq(
      Seq(1.0, 0.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0, 0.0), Seq(0.0, 0.0, 1.0, 0.0))
    val out = SemDedup.semDedupWith(clustered, "vec_id", "embedding", centroids, tau = 0.999)
    val survivors = out.select("vec_id").as[Long].collect().toSet
    assert(survivors === Set(0L, 1L, 2L, 10L, 12L, 20L, 30L)) // 11 and 21 lose
    val buckets = out.select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    // axis centroids: bucket = argmax coordinate direction
    assert(buckets(0L) === 0 && buckets(10L) === 0 && buckets(12L) === 0)
    assert(buckets(1L) === 1 && buckets(20L) === 1)
    assert(buckets(2L) === 2 && buckets(30L) === 2)
    // and the trained verb is literally this machinery under its own centroids
    val trained = SemDedup.semDedup(clustered, "vec_id", "embedding",
      c = 3, iters = 3, tau = 0.999).select("vec_id").as[Long].collect().toSet
    assert(trained === survivors)
  }

  test("boundary-split pairs are the documented recall trade") {
    // A near-dup pair straddling two fixed centroids: each member lands in a
    // different bucket, so the blocked pass misses it while the exact scan
    // finds it — the trade SemDeDup accepts by design (measured, not hidden).
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val straddle = Seq(
      (1L, Array(1.0f, 0.98f)), // bucket 0 side of the diagonal
      (2L, Array(0.98f, 1.0f))  // bucket 1 side; cosine(1,2) ≈ 0.9996
    ).toDF("vec_id", "embedding")
    val blocked = SemDedup.pairs(straddle, "vec_id", "embedding", centroids, tau = 0.99)
    val exact = Dedup.embeddingCosinePairs(straddle, "vec_id", "embedding", tau = 0.99)
    assert(blocked.count() === 0L)
    assert(exact.count() === 1L)
  }

  test("fuzz: pairs == exact pairs restricted to same-bucket, random vectors") {
    val rng = new scala.util.Random(20260813L)
    val vecs = (0L until 150L).map { i =>
      (i, Array.fill(6)(rng.nextFloat() * 2f - 1f))
    }.toDF("vec_id", "embedding")
    val centroids = Seq(
      Seq(1.0, 0, 0, 0, 0, 0), Seq(0, 1.0, 0, 0, 0, 0),
      Seq(0, 0, 1.0, 0, 0, 0), Seq(-1.0, 0, 0, 0, 0, 0))
    val tau = 0.7
    val blocked = SemDedup.pairs(vecs, "vec_id", "embedding", centroids, tau)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val bucketOf = Similarity.assignBuckets(vecs, "vec_id", "embedding", centroids)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    val exactPairs: Set[(Long, Long)] =
      Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", tau)
        .select("a", "b").as[(Long, Long)].collect().toSet
    val exactSameBucket = exactPairs.filter { case (a, b) => bucketOf(a) == bucketOf(b) }
    assert(blocked === exactSameBucket && blocked.nonEmpty)
  }

  test("sf0.001 corpus: within-cluster pairs are a subset of exact pairs at the same tau") {
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = Similarity.kMeans(emb, "vec_id", "embedding", c = 8, iters = 3)
    val blocked = SemDedup.pairs(emb, "vec_id", "embedding", centroids, tau = 0.45)
      .select("a", "b").as[(Long, Long)].collect().toSet
    val exact = Dedup.embeddingCosinePairs(emb, "vec_id", "embedding", tau = 0.45)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(blocked.subsetOf(exact))
  }
}
