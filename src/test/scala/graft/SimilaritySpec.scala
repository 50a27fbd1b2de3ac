package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bruteTopK orders by cosine desc with id tiebreak and excludes self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f)),  // cos 0.8
      (2L, Array(1.0f, 0.1f)),  // cos ~0.995
      (3L, Array(0.0f, 1.0f)),  // cos 0
      (4L, Array(2.0f, 0.2f))   // same direction as 2 → same cosine, id tiebreak
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(vecs, "vec_id", "embedding",
      query = Seq(1.0, 0.0), k = 3, excludeId = Some(0L))
      .select("vec_id").as[Long].collect()
    assert(got === Seq(2L, 4L, 1L))
  }

  test("assignBuckets picks nearest centroid, lowest index on ties") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f)),
      (2L, Array(0.05f, 1.0f)),
      (3L, Array(1.0f, 1.0f)) // equidistant from both centroids → bucket 0
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val got = Similarity.assignBuckets(vecs, "vec_id", "embedding", centroids)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("kMeans: deterministic across runs, right shape, assigns all buckets") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val c1 = Similarity.kMeans(emb, "vec_id", "embedding", c = 4, iters = 2)
    val c2 = Similarity.kMeans(emb, "vec_id", "embedding", c = 4, iters = 2)
    assert(c1 === c2)
    assert(c1.length === 4 && c1.forall(_.length === 64))
    val buckets = Similarity.assignBuckets(emb, "vec_id", "embedding", c1)
      .select("bucket").distinct().as[Int].collect().toSet
    assert(buckets.nonEmpty && buckets.subsetOf((0 until 4).toSet))
  }

  test("IVF recall vs brute force on the sf0.001 embeddings corpus") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val byId = emb.where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val centroids = (0L until 8L).map(byId)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", byId(0L), k = 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, byId(0L),
      nprobe = 2, k = 10, excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall (ivf=$ivf brute=$brute)")
  }

  test("LSH recall vs brute force; buckets deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", q, k = 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall@10 too low: $recall (lsh=$lsh brute=$brute)")
    // determinism: identical plane seed → identical result set
    val again = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    assert(lsh == again)
    // the query's own bucket must contain the query vector itself
    val planes = Similarity.hyperplanes(10, q.length, 42L)
    val selfBucket = Similarity.lshBucket(col("embedding"), planes)
    val self = emb.where(col("vec_id") === 0L).select(selfBucket).as[Int].head()
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0) 1 << j else 0
    }.sum
    assert(self == qBucket, "Scala-side and column-side bucket computation must agree")
  }
}
