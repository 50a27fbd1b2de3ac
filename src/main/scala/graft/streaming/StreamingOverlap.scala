package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming corpus-novelty monitoring — the thirteenth twin: each
  * micro-batch stores ONE bounded KMV sketch of its text identity
  * ([[graft.functions.KmvAgg]], ≤ k longs however large the batch), and
  * [[novelty]] answers "how much of batch N was already in batches
  * < N?" from the stored sketches alone — no corpus re-scan, no join,
  * state bounded by batches × k longs. The monitoring complement to
  * [[StreamingIngest]]'s exact dedup: ingest DROPS duplicates, this
  * CHARTS the duplication rate so a collapsing-novelty crawl is visible
  * before anyone inspects the corpus.
  *
  * Replay safety: the sketch row is batch_id-keyed and written with
  * dynamic partition overwrite — a replayed batch deterministically
  * recomputes and replaces its own row (the KMV of a set is
  * layout-independent), so at-least-once delivery converges.
  *
  * Estimation: per-batch distinct, prior-union distinct, intersection
  * and Jaccard via the standard KMV estimators (exact and certified
  * when every sketch stayed under k — small batches — ±1/√k otherwise;
  * [[graft.operators.Sketches]] hosts the shared math).
  */
object StreamingOverlap {

  private val SketchSchema = StructType(Seq(
    StructField("kmv", ArrayType(LongType, containsNull = false), nullable = true),
    StructField("k", IntegerType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  def sketchPath(path: String): String = s"$path/sketches"

  /** Process one micro-batch idempotently. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String, textCol: String,
      k: Int): Unit = {
    require(k >= 2, s"StreamingOverlap: need k >= 2, got $k")
    val spark = batch.sparkSession
    batch.agg(graft.functions.Kmv.sketch(xxhash64(col(textCol)), k).as("kmv"))
      .select(col("kmv"), lit(k).as("k"), lit(batchId).as("batch_id"))
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(sketchPath(path))
  }

  /** Start novelty monitoring over a document stream. */
  def monitor(
      stream: DataFrame, path: String, textCol: String,
      k: Int = 1 << 14): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, textCol, k)
    }.start()

  /** Per-batch novelty from the stored sketches (driver-side — the state
    * is batches × k longs): for each batch in id order, its estimated
    * distinct count, the distinct count of the UNION of all prior
    * batches, their intersection and Jaccard, and `new_frac` =
    * 1 − |batch ∩ prior| / |batch| (the chart a crawl operator watches).
    * `is_exact` certifies rows where every contributing sketch stayed
    * under k. */
  def novelty(spark: SparkSession, path: String): DataFrame = {
    val rows = spark.read.schema(SketchSchema).parquet(sketchPath(path))
      .collect()
      .map(r => (r.getLong(2),
        if (r.isNullAt(0)) Array.empty[Long] else r.getSeq[Long](0).toArray,
        r.getInt(1)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"StreamingOverlap: no sketches under $path")
    val k = rows.head._3
    require(rows.forall(_._3 == k),
      "StreamingOverlap: mixed k across batches - rebuild with one k")
    var prior = Array.empty[Long] // bottom-k of the union of prior batches
    var priorExact = true
    val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
    rows.foreach { case (bid, sk, _) =>
      val stats = graft.operators.Sketches.kmvPairStats(sk, prior, k)
      val (nB, nPrior, _, nInter, jac, exact) = stats
      val newFrac =
        if (nB == 0L) 0.0
        else java.math.BigDecimal.valueOf(1.0 - nInter.toDouble / nB)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      out.add(org.apache.spark.sql.Row(
        bid, nB, nPrior, nInter, jac, newFrac, exact && priorExact))
      // fold this batch into the prior-union sketch (bounded to k)
      priorExact = priorExact && sk.length < k && prior.length < k
      prior = (prior ++ sk).distinct.sorted.take(k)
    }
    spark.createDataFrame(out, StructType(Seq(
      StructField("batch_id", LongType, nullable = false),
      StructField("n_batch", LongType, nullable = false),
      StructField("n_prior", LongType, nullable = false),
      StructField("n_intersection", LongType, nullable = false),
      StructField("jaccard", DoubleType, nullable = false),
      StructField("new_frac", DoubleType, nullable = false),
      StructField("is_exact", BooleanType, nullable = false))))
  }
}
