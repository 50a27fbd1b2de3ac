package graft.streaming

import graft.functions.QuantileSketch
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Streaming distribution monitoring — the fifteenth streaming twin:
  * each micro-batch reduces a value column to ONE serialized
  * quantile-sketch state row ([[QuantileSketch.stateSketch]] —
  * ≤ k·log2(n/k) doubles regardless of batch size), landed batch-keyed;
  * history merges DRIVER-side on demand, so "what does the corpus
  * distribution look like, and did the latest batch drift?" never
  * rescans data — the [[StreamingOverlap]] shape with quantiles instead
  * of novelty.
  *
  * ==Replay safety==
  * One row per batch at `batch_id=<id>`, dynamic-partition-overwritten:
  * a replay replaces its own row and cannot double-count. (The replayed
  * STATE bytes may differ benignly — merge order inside an aggregation
  * is scheduler-dependent in the estimator regime — but any produced
  * state is a VALID sketch of exactly the batch's rows with a sound
  * certificate, so every downstream answer stays within its reported
  * bound; in the exact regime the answers are bit-identical. The
  * certificate is what makes "converges to a valid state" as strong as
  * bit-convergence here.)
  *
  * Mixed-k refusal: states are only mergeable under one k
  * ([[QuantileSketch.merged]] enforces it; the [[StreamingTextIndex]]
  * mixed-bucket lesson).
  */
object StreamingQuantiles {

  private val SketchSchema = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("state", BinaryType, nullable = true),
    StructField("batch_id", LongType, nullable = false)))

  /** Process one micro-batch idempotently. Package-private so the replay
    * spec can drive it directly. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String,
      valueCol: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val r = batch
      .agg(count(col(valueCol)).as("n"),
        QuantileSketch.stateSketch(col(valueCol).cast("double"), k).as("state"))
      .head()
    spark.createDataFrame(
      java.util.Arrays.asList(Row(r.getLong(0), k, r.getAs[Array[Byte]](1), batchId)),
      SketchSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(path)
  }

  /** Start monitoring `stream`'s `valueCol`. */
  def monitor(
      stream: DataFrame, path: String, valueCol: String,
      k: Int = 4096): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, valueCol, k)
    }.start()

  private def load(spark: SparkSession, path: String): Seq[Row] = {
    val rows = spark.read.schema(SketchSchema).parquet(path).collect().toSeq
    require(rows.nonEmpty, s"StreamingQuantiles: no published batches under $path")
    val ks = rows.map(_.getInt(1)).distinct
    require(ks.size == 1,
      s"StreamingQuantiles: mixed k across published batches " +
        s"(${ks.sorted.mkString(", ")}) — rebuild the monitor under one k")
    rows
  }

  /** Quantiles of EVERYTHING published: one row
    * (n, max_rank_err, is_exact, q_1, …) — merged driver-side from the
    * per-batch states (≤ batches × k·log doubles; no data rescan). */
  def distribution(
      spark: SparkSession, path: String, probs: Seq[Double]): DataFrame = {
    val rows = load(spark, path)
    val m = QuantileSketch.merged(rows.map(_.getAs[Array[Byte]](2)))
    val qs = QuantileSketch.quantilesOf(m, probs)
    spark.createDataFrame(
      java.util.Arrays.asList(Row.fromSeq(
        Seq(m.n, m.errBound, m.errBound == 0L) ++ qs.map(_.map(Double.box).orNull))),
      StructType(
        Seq(StructField("n", LongType, nullable = false),
          StructField("max_rank_err", LongType, nullable = false),
          StructField("is_exact", BooleanType, nullable = false)) ++
          probs.indices.map(i => StructField(s"q$i", DoubleType, nullable = true))))
  }

  /** CERTIFIED drift verdicts — [[drift]]'s deltas upgraded to a sound
    * test under the sketches' own rank certificates: for each p, take
    * history's quantile BAND (its values at ranks p·n_H ± err_H — the
    * widest interval history's true p-quantile can occupy), locate that
    * band's rank interval inside the LATEST batch's sketch, widen it by
    * the latest certificate, and flag `shift_certified` only when
    * p·n_L falls outside the widened interval by more than
    * `minShiftFrac·n_L`. A certified flag can never be certificate noise
    * — under the sound bounds, NO pair of true distributions consistent
    * with both sketches places history's p-quantile at p in the latest
    * batch. Coarse sketches (large bounds) therefore refuse to cry wolf
    * rather than alert on noise. `rank_gap_frac` is the signed distance
    * (in latest-mass fractions) from p·n_L to the widened interval. */
  def driftAlert(
      spark: SparkSession, path: String, probs: Seq[Double],
      minShiftFrac: Double = 0.0): DataFrame = {
    require(minShiftFrac >= 0, s"minShiftFrac must be >= 0, got $minShiftFrac")
    val rows = load(spark, path)
    require(rows.size >= 2,
      s"StreamingQuantiles: driftAlert needs >= 2 published batches, got ${rows.size}")
    val latestId = rows.map(_.getLong(3)).max
    val (latest, history) = rows.partition(_.getLong(3) == latestId)
    val h = QuantileSketch.merged(history.map(_.getAs[Array[Byte]](2)))
    val l = QuantileSketch.merged(latest.map(_.getAs[Array[Byte]](2)))
    val out = probs.map { p =>
      val target = math.ceil(p * h.n).toLong.max(1L)
      val hLo = QuantileSketch.valueAtRank(h, target - h.errBound)
      val hHi = QuantileSketch.valueAtRank(h, target + h.errBound)
      (hLo, hHi) match {
        case (Some(lo), Some(hi)) if l.n > 0 =>
          val (rLo, _) = QuantileSketch.rankBounds(l, lo)
          val (_, rHi) = QuantileSketch.rankBounds(l, hi)
          val intervalLo = rLo - l.errBound
          val intervalHi = rHi + l.errBound
          val tL = math.ceil(p * l.n).toLong.max(1L)
          val gap =
            if (tL < intervalLo) (tL - intervalLo).toDouble / l.n
            else if (tL > intervalHi) (tL - intervalHi).toDouble / l.n
            else 0.0
          Row(p, Double.box(math.abs(gap)), Boolean.box(
            math.abs(gap) > minShiftFrac && gap != 0.0))
        case _ => Row(p, null, Boolean.box(false))
      }
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("p", DoubleType, nullable = false),
        StructField("rank_gap_frac", DoubleType, nullable = true),
        StructField("shift_certified", BooleanType, nullable = false))))
  }

  /** Distribution drift of the LATEST batch against all earlier history:
    * per-probability (history quantile, latest quantile, delta). The
    * single-batch monitor answer to "did today's crawl shift the
    * distribution the corpus was curated under?". */
  def drift(
      spark: SparkSession, path: String, probs: Seq[Double]): DataFrame = {
    val rows = load(spark, path)
    require(rows.size >= 2,
      s"StreamingQuantiles: drift needs >= 2 published batches, got ${rows.size}")
    val latestId = rows.map(_.getLong(3)).max
    val (latest, history) = rows.partition(_.getLong(3) == latestId)
    val hq = QuantileSketch.quantilesOf(
      QuantileSketch.merged(history.map(_.getAs[Array[Byte]](2))), probs)
    val lq = QuantileSketch.quantilesOf(
      QuantileSketch.merged(latest.map(_.getAs[Array[Byte]](2))), probs)
    val out = probs.indices.map { i =>
      Row(probs(i), hq(i).map(Double.box).orNull, lq(i).map(Double.box).orNull,
        (hq(i), lq(i)) match {
          case (Some(a), Some(b)) => Double.box(b - a)
          case _ => null
        })
    }
    spark.createDataFrame(
      java.util.Arrays.asList(out: _*),
      StructType(Seq(
        StructField("p", DoubleType, nullable = false),
        StructField("history_q", DoubleType, nullable = true),
        StructField("latest_q", DoubleType, nullable = true),
        StructField("delta", DoubleType, nullable = true))))
  }
}
