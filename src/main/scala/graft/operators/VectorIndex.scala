package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Materialized ANN indexes — the scale path [[Similarity]]'s scaladocs
  * promise.
  *
  * [[Similarity.ivfTopK]]/[[Similarity.lshTopK]] recompute bucket
  * assignments over the full corpus at query time: fine for a one-shot
  * query at test SF, but at 100 TB that is a full scan wearing an index
  * costume. Here the assignment runs ONCE at build time and the corpus is
  * written hive-partitioned by bucket; a probe then reads only the probed
  * bucket directories — Catalyst partition pruning, no corpus scan, no
  * shuffle — and finishes with the same codegen'd brute-force cosine over
  * ~nprobe/C of the data. Index parameters (centroids / hyperplane seed)
  * ride along in a `_meta` parquet sidecar so a reader needs only the path.
  *
  * Layout: `<path>/corpus/bucket=<b>/…` (IVF) or
  * `<path>/corpus/table=<t>/bucket=<b>/…` (LSH, corpus written `tables`
  * times), plus `<path>/meta/` (one small parquet).
  */
object VectorIndex {

  // ------------------------------------------------------------------ IVF

  /** Builds the IVF index: one assignment pass (broadcast centroids,
    * codegen argmax) + one write repartitioned BY BUCKET, so each bucket
    * directory is one task's single file — parallel across buckets and
    * no small-file spray, whatever the input split count. */
  def writeIvf(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], path: String): Unit = {
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/corpus")
    writeCentroidMeta(df.sparkSession, centroids, path)
  }

  def readIvfCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(s"$path/meta").orderBy("bucket").collect()
      .map(_.getSeq[Double](1).toSeq).toSeq

  /** Incremental append to a written IVF index — the ingest-side twin of
    * [[writeIvf]]: the new batch is assigned against the SIDECAR centroids
    * (no rebuild, no touch of existing rows) and appended into the same
    * `bucket=` partition directories, so probes keep their pruning and see
    * old + new rows alike. At 100 TB this is what makes the index
    * maintainable — a nightly embedding batch appends in O(batch), while a
    * rebuild would rewrite the corpus. (Centroids drift as the
    * distribution shifts; re-running [[writeIvf]] occasionally re-balances
    * — the standard IVF maintenance bargain.) */
  def appendIvf(
      df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val centroids = readIvfCentroids(df.sparkSession, path)
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/corpus")
  }

  /** Compact an appended index ([[TextIndex.compact]]'s twin): each
    * [[appendIvf]]/[[appendLsh]] batch lands one file per touched bucket
    * (or table×bucket) directory; this rewrites the corpus at one file
    * per partition directory via stage + swap. Sidecar meta (centroids /
    * hyperplane params) is untouched, so probes and future appends keep
    * working unchanged. */
  def compact(spark: SparkSession, path: String): Unit = {
    val live = s"$path/corpus"
    val staged = s"$path/corpus_compact"
    val df = spark.read.parquet(live)
    val partCols = Seq("table", "bucket").filter(df.columns.contains)
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(staged)
    val conf = spark.sparkContext.hadoopConfiguration
    val p0 = new org.apache.hadoop.fs.Path(live)
    val fs = p0.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"$path/corpus_old")
    // a crashed prior compact may leave a stale _old dir; clear it, and
    // CHECK each rename — a silent false here would swap in nothing
    fs.delete(old, true)
    require(fs.rename(p0, old), s"compact: could not stage out $live")
    require(fs.rename(new org.apache.hadoop.fs.Path(staged), p0),
      s"compact: could not swap in $staged (live data is at ${old})")
    fs.delete(old, true)
    ()
  }

  /** Top-k probe against a written IVF index: centroid ranking happens on
    * the driver (C×dim doubles), then ONLY the `nprobe` nearest bucket
    * directories are scanned (partition-pruned — spec-checked via the scan's
    * file count). */
  def ivfTopK(
      spark: SparkSession, path: String, idCol: String, vecCol: String,
      query: Seq[Double], nprobe: Int, k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    val probe = Similarity.probeBuckets(centroids, query, nprobe)
    val corpus = spark.read.parquet(s"$path/corpus")
      .where(col("bucket").isin(probe: _*))
    Similarity.bruteTopK(corpus, idCol, vecCol, query, k, excludeId)
  }

  /** Int8-quantized IVF build — the storage/IO lever at 100 TB: each
    * vector stores as (tinyint[dim], float32 scale), ~4× smaller than
    * float32 on disk AND over the probe's wire. Symmetric per-vector
    * max-abs quantization: q_i = round(x_i / scale × 127), so every
    * element reconstructs within scale/254. Quantization is a build-time
    * projection (the higher-order `transform` lambdas are interpreted, but
    * run once per ingested vector, off the query path). */
  def writeIvfQuantized(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], path: String): Unit = {
    val q8 = transform(col(vecCol),
      x => round(x.cast("double") / col("scale") * 127.0).cast("byte"))
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .withColumn("scale",
        greatest(array_max(transform(col(vecCol), x => abs(x))), lit(1e-30f)))
      .select(col(idCol), q8.as("q8"), col("scale"), col("bucket"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/corpus")
    writeCentroidMeta(df.sparkSession, centroids, path)
  }

  /** Top-k probe against a quantized index: identical pruning to
    * [[ivfTopK]]; ONLY the nprobe-pruned candidates dequantize (one
    * multiply per element) before the same codegen'd exact cosine. Recall
    * vs the float32 index is spec-measured; the error bound is
    * deterministic (scale/254 per element). */
  def ivfTopKQuantized(
      spark: SparkSession, path: String, idCol: String,
      query: Seq[Double], nprobe: Int, k: Int,
      excludeId: Option[Long] = None): DataFrame = {
    val centroids = readIvfCentroids(spark, path)
    val probe = Similarity.probeBuckets(centroids, query, nprobe)
    val corpus = spark.read.parquet(s"$path/corpus")
      .where(col("bucket").isin(probe: _*))
      .withColumn("_vec",
        transform(col("q8"), b => b.cast("double") * col("scale") / 127.0))
    Similarity.bruteTopK(corpus, idCol, "_vec", query, k, excludeId)
  }

  // --------------------------------------------------------------- IVF-PQ

  /** Builds the IVF-PQ index — the two scale levers composed, the shape a
    * 100 TB ANN corpus actually ships (coarse pruning picks WHICH bucket
    * dirs a probe reads; product codes shrink WHAT the scan of those dirs
    * costs). Each bucket file stores `(id, pq_code, pq_norm, vec)`:
    * parquet column pruning means the ADC pass reads ~8 bytes/row (codes +
    * norm) and the full-precision `vec` column is touched ONLY by the
    * shortlist re-rank's pushed-down id filter. Codebooks and coarse
    * centroids both live in sidecars — a probe (or an append) needs no
    * driver state beyond the path. */
  def writeIvfPq(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], model: ProductQuantizer.PqModel,
      path: String, residual: Boolean = false): Unit = {
    // a prior OPQ index at this path would leave a stale rotation sidecar
    // that readers would wrongly apply to the fresh plain codes. Publish
    // order mirrors [[writeIvfPqOpq]] (r9 ADVICE): pending marker FIRST —
    // a crash anywhere inside this rewrite (old rotation deleted, corpus
    // half-overwritten) must refuse loudly, not read torn state — then the
    // stale rotation out, then the corpus, then the marker's removal. A
    // completed plain publish is a valid index, so the final clear also
    // absorbs any flag a crashed earlier OPQ publish left behind.
    markOpqPending(df.sparkSession, path)
    deleteOpqMeta(df.sparkSession, path)
    writeIvfPqEncoded(df, idCol, vecCol, centroids, model, path, residual,
      rotation = None)
    clearOpqPending(df.sparkSession, path)
  }

  /** [[writeIvfPq]] with an OPQ rotation composed in (Ge et al. 2013,
    * [[Opq]]): codes quantize `R·v` (or `R·(v − c_b)` when `residual`) so
    * the deployed partitioned index gets OPQ's code-quality win at the
    * SAME byte budget and the SAME probe plan. The rotation rides in a
    * third sidecar (`<path>/opqmeta`); [[ivfTopKPq]] and [[appendIvfPq]]
    * discover it from the path alone — rotate the query once at probe,
    * rotate each batch row once at append. `pq_norm` stays `‖v‖` (R is
    * orthogonal), and the residual ADC offset `q·c_b` is computed in the
    * UNROTATED space: `(R·q)·(R·(v−c_b)) = q·v − q·c_b` exactly. */
  def writeIvfPqOpq(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], opq: Opq.OpqModel,
      path: String, residual: Boolean = false): Unit = {
    // publish order: PENDING marker FIRST, then the stale rotation out,
    // then the corpus, the new rotation, and the marker's removal LAST.
    // The marker must precede the sidecar delete (r9 ADVICE): deleting
    // first left a window where a crash strands a previously-OPQ index's
    // rotated codes with neither sidecar nor marker — readable as plain,
    // silently degrading recall. With the marker up before ANY mutation,
    // every crash inside the publish leaves the path refusing loudly
    // until [[repairIvfPqOpq]] (or a publish re-run) restores consistency.
    markOpqPending(df.sparkSession, path)
    deleteOpqMeta(df.sparkSession, path)
    writeIvfPqEncoded(df, idCol, vecCol, centroids, opq.pq, path, residual,
      rotation = Some(opq))
    writeOpqMeta(df.sparkSession, opq, path)
    clearOpqPending(df.sparkSession, path)
  }

  private def writeIvfPqEncoded(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], model: ProductQuantizer.PqModel,
      path: String, residual: Boolean,
      rotation: Option[Opq.OpqModel]): Unit = {
    val raw =
      if (residual) ProductQuantizer.residualCol(col(vecCol), col("bucket"), centroids)
      else col(vecCol)
    val codeSrc = rotation.map(_.rotateCol(raw)).getOrElse(raw)
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .select(col(idCol),
        ProductQuantizer.codeCol(codeSrc, model).as("pq_code"),
        ProductQuantizer.normCol(col(vecCol)).as("pq_norm"),
        col(vecCol), col("bucket"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/corpus")
    writeCentroidMeta(df.sparkSession, centroids, path)
    writePqMeta(df.sparkSession, model, path, residual)
  }

  /** Incremental append to a written IVF-PQ index — [[appendIvf]]'s twin
    * for the coded layout: the batch is assigned, (residual-)rotated, and
    * encoded purely from the path's three sidecars (centroids, codebooks,
    * optional rotation) — no rebuild, no driver state, O(batch) work —
    * and appended into the same `bucket=` dirs so probes keep pruning
    * over old + new rows. */
  def appendIvfPq(
      df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val centroids = readIvfCentroids(spark, path)
    val model = readPqMeta(spark, path)
    val residual = readPqResidual(spark, path)
    val raw =
      if (residual) ProductQuantizer.residualCol(col(vecCol), col("bucket"), centroids)
      else col(vecCol)
    val codeSrc = readOpqRotation(spark, path) match {
      case Some((d, flat)) => graft.functions.ArrayMath.matVec(raw, new graft.functions.RotMat(d, flat))
      case None => raw
    }
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .select(col(idCol),
        ProductQuantizer.codeCol(codeSrc, model).as("pq_code"),
        ProductQuantizer.normCol(col(vecCol)).as("pq_norm"),
        col(vecCol), col("bucket"))
      .repartition(col("bucket"))
      .write.mode("append").partitionBy("bucket").parquet(s"$path/corpus")
  }

  /** OPQ codebooks for a RESIDUAL rotated index — [[trainResidualPq]]'s
    * twin: one assignment pass tags buckets, then [[Opq.train]] learns the
    * rotation + books on `v − centroid(bucket)` (bounded id-ordered
    * sample; same jobs, same shuffle shape). Pass the result to
    * [[writeIvfPqOpq]] with `residual = true`. */
  def trainResidualOpq(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], m: Int, k: Int = 256,
      lloydIters: Int = 8, opqIters: Int = 4,
      maxSample: Int = 16384): Opq.OpqModel = {
    val assigned = Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .withColumn("_res",
        ProductQuantizer.residualCol(col(vecCol), col("bucket"), centroids))
    Opq.train(assigned, idCol, "_res", m, k, lloydIters, opqIters, maxSample)
  }

  /** Codebooks for a RESIDUAL IVF-PQ index ([[ProductQuantizer.residualCol]]):
    * one assignment pass tags each vector's bucket, then the shared Lloyd
    * loop trains on `v − centroid(bucket)` — same jobs, same shuffle
    * shape, ~1 bit/dim better use of the code budget on clustered data
    * (the classic FAISS IndexIVFPQ layout). Pass the result to
    * [[writeIvfPq]] with `residual = true`. */
  def trainResidualPq(
      df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[Seq[Double]], m: Int, k: Int = 16, iters: Int = 2)
      : ProductQuantizer.PqModel = {
    val assigned = Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .withColumn("_res",
        ProductQuantizer.residualCol(col(vecCol), col("bucket"), centroids))
    ProductQuantizer.train(assigned, idCol, "_res", m, k, iters)
  }

  /** Top-k probe: prune to `nprobe` bucket dirs, ADC-score their code
    * columns (m lookups/row off the narrow scan), broadcast the
    * `shortlist` ids back as a pushed-down semi-join on the SAME pruned
    * dirs to fetch raw vectors, exact-rank those. Recall is spec-measured;
    * cost per probe is (pruned rows × 8 B) + (shortlist × dim × 4 B). */
  def ivfTopKPq(
      spark: SparkSession, path: String, idCol: String, vecCol: String,
      query: Seq[Double], nprobe: Int, k: Int, shortlist: Int = 100,
      excludeId: Option[Long] = None): DataFrame = {
    require(shortlist >= k, "shortlist must cover k")
    val centroids = readIvfCentroids(spark, path)
    val model = readPqMeta(spark, path)
    val residual = readPqResidual(spark, path)
    // OPQ index: codes live in rotated space, so the ADC query rotates
    // ONCE here; the exact re-rank below stays in raw space untouched
    val adcQuery = readOpqRotation(spark, path) match {
      case Some((d, flat)) => Opq.OpqModel(d, flat, model).rotate(query)
      case None => query
    }
    val probe = Similarity.probeBuckets(centroids, query, nprobe)
    val pruned = spark.read.parquet(s"$path/corpus")
      .where(col("bucket").isin(probe: _*))
    // residual codes reconstruct v − c_b, so the ADC dot gets the
    // per-bucket constant q·c_b back (C-length literal, indexed by the
    // partition column — still a narrow codes+norm scan)
    val offset =
      if (residual) {
        val qDotC = centroids.map(c => c.zip(query).map { case (a, b) => a * b }.sum)
        element_at(array(qDotC.map(lit): _*), col("bucket").cast("int") + 1)
      } else lit(0.0)
    val short = ProductQuantizer.adcTopK(
      pruned.select(col(idCol), col("pq_code"), col("pq_norm"), col("bucket")),
      idCol, model, adcQuery, shortlist, excludeId, dotOffset = offset)
      .select(col(idCol))
    Similarity.bruteTopK(
      pruned.join(broadcast(short), Seq(idCol), "left_semi"),
      idCol, vecCol, query, k, excludeId)
  }

  private def writePqMeta(
      spark: SparkSession, model: ProductQuantizer.PqModel, path: String,
      residual: Boolean = false): Unit = {
    val rows = for {
      (book, j) <- model.books.zipWithIndex
      (cent, c) <- book.zipWithIndex
    } yield Row(j, c, cent, residual)
    val schema = StructType(Seq(
      StructField("subspace", IntegerType, nullable = false),
      StructField("cell", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false),
      StructField("residual", BooleanType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows.toSeq, 1), schema)
      .write.mode("overwrite").parquet(s"$path/pqmeta")
  }

  private def writeOpqMeta(
      spark: SparkSession, opq: Opq.OpqModel, path: String): Unit = {
    val rows = (0 until opq.d).map { r =>
      Row(r, opq.rotFlat.slice(r * opq.d, (r + 1) * opq.d).toSeq)
    }
    val schema = StructType(Seq(
      StructField("row", IntegerType, nullable = false),
      StructField("coeffs", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$path/opqmeta")
  }

  private def deleteOpqMeta(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$path/opqmeta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    ()
  }

  /** `<path>/_opq_pending`: exists exactly while a publish window is open
    * over a path whose codes and rotation sidecar may disagree — from
    * before the first sidecar/corpus mutation until the matched pair is
    * fully on disk (both the OPQ and the plain-over-OPQ rewrite paths). */
  private def opqPendingPath(path: String) =
    new org.apache.hadoop.fs.Path(s"$path/_opq_pending")

  private def markOpqPending(spark: SparkSession, path: String): Unit = {
    val p = opqPendingPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.create(p, true).close()
  }

  private def clearOpqPending(spark: SparkSession, path: String): Unit = {
    val p = opqPendingPath(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, false)
    ()
  }

  /** The index's OPQ rotation, if one was written — `(dim, row-major
    * d×d)`; `None` means plain (unrotated) codes. Probes and appends call
    * this, so an index's rotation is part of the path like everything
    * else. */
  def readOpqRotation(spark: SparkSession, path: String): Option[(Int, Array[Double])] = {
    val fs = opqPendingPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(!fs.exists(opqPendingPath(path)),
      s"$path: partially published OPQ index (a publish crashed between " +
        "its corpus write and its rotation sidecar) — run repairIvfPqOpq " +
        "(or re-run writeIvfPqOpq) before probing or appending; decoding " +
        "these codes without their rotation would silently degrade recall")
    readOpqRotationUnchecked(spark, path)
  }

  /** [[readOpqRotation]] WITHOUT the pending-marker refusal — only the
    * repair path may look at a torn publish's sidecar state. */
  private def readOpqRotationUnchecked(
      spark: SparkSession, path: String): Option[(Int, Array[Double])] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/opqmeta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val rows = spark.read.parquet(s"$path/opqmeta").orderBy("row").collect()
      val d = rows.length
      Some((d, rows.flatMap(_.getSeq[Double](1)).toArray))
    }
  }

  /** Recovery verb for a torn publish ([[readOpqRotation]]'s refusal):
    * re-derives a CONSISTENT index from what survived on disk, with no
    * driver state and no re-training. The corpus always carries the
    * full-precision `vec` column (the re-rank reads it), so the codes are
    * never the only copy — repair re-encodes every row from `vec` against
    * the sidecars AS THEY STAND (centroids + codebooks + whichever
    * rotation sidecar the crash left, or none), stages the rewritten
    * corpus, swaps it in ([[compact]]'s checked stage+swap), and clears
    * the marker. Every crash window lands somewhere sound: marker-only →
    * the old index is republished unchanged; rotation deleted but codes
    * still old-rotated → codes re-derive as PLAIN (recall degrades to
    * plain-PQ loudly-then-repaired, never silently torn); rotation and
    * codes both new → the OPQ publish completes. The one thing repair
    * cannot restore is a rotation whose sidecar never hit disk — that
    * requires re-running [[writeIvfPqOpq]] with the trained model — and a
    * corpus whose own job commit never finished (no `_SUCCESS`): rows, not
    * codes, are missing there, so repair refuses and points the caller at
    * a publish re-run rather than blessing a partial row set. */
  def repairIvfPqOpq(
      spark: SparkSession, path: String, idCol: String, vecCol: String): Unit = {
    val fs = opqPendingPath(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(opqPendingPath(path)),
      s"$path: no pending marker — nothing to repair")
    // repair re-encodes whatever rows are on disk, so the corpus must be a
    // COMPLETE committed write: a crash inside the original publish's
    // job commit leaves partially committed part files (no _SUCCESS), and
    // re-encoding those would republish a hole-y index as "sound" (r10
    // ADVICE). The _SUCCESS marker is the committer's own completeness
    // receipt; nothing short of a finished corpus job writes it.
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$path/corpus/_SUCCESS")),
      s"$path: corpus has no _SUCCESS commit marker — the crashed publish " +
        "died inside its corpus write, so the rows on disk may be a " +
        "partial set repair would silently bless. Re-run the original " +
        "writeIvfPq/writeIvfPqOpq publish (repair only re-derives " +
        "consistent CODES from a complete corpus; it cannot restore rows)")
    val centroids = readIvfCentroids(spark, path)
    val model = readPqMeta(spark, path)
    val residual = readPqResidual(spark, path)
    val corpus = spark.read.parquet(s"$path/corpus")
    val raw =
      if (residual) ProductQuantizer.residualCol(col(vecCol), col("bucket"), centroids)
      else col(vecCol)
    val codeSrc = readOpqRotationUnchecked(spark, path) match {
      case Some((d, flat)) =>
        graft.functions.ArrayMath.matVec(raw, new graft.functions.RotMat(d, flat))
      case None => raw
    }
    val staged = s"$path/corpus_repair"
    corpus.select(col(idCol),
        ProductQuantizer.codeCol(codeSrc, model).as("pq_code"),
        ProductQuantizer.normCol(col(vecCol)).as("pq_norm"),
        col(vecCol), col("bucket"))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(staged)
    val live = new org.apache.hadoop.fs.Path(s"$path/corpus")
    val old = new org.apache.hadoop.fs.Path(s"$path/corpus_old")
    fs.delete(old, true)
    require(fs.rename(live, old), s"repair: could not stage out $live")
    require(fs.rename(new org.apache.hadoop.fs.Path(staged), live),
      s"repair: could not swap in $staged (live data is at $old)")
    fs.delete(old, true)
    clearOpqPending(spark, path)
  }

  /** Whether the index's codes quantize residuals (older sidecars without
    * the column read as plain-PQ). */
  def readPqResidual(spark: SparkSession, path: String): Boolean = {
    val meta = spark.read.parquet(s"$path/pqmeta")
    if (meta.columns.contains("residual")) meta.select("residual").head().getBoolean(0)
    else false
  }

  def readPqMeta(spark: SparkSession, path: String): ProductQuantizer.PqModel = {
    val rows = spark.read.parquet(s"$path/pqmeta")
      .orderBy("subspace", "cell").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val books = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
      .map(_._2.sortBy(_.getInt(1)).map(_.getSeq[Double](2).toSeq).toSeq)
    ProductQuantizer.PqModel(m, books.head.head.length, books)
  }

  private def writeCentroidMeta(
      spark: SparkSession, centroids: Seq[Seq[Double]], path: String): Unit = {
    val rows = centroids.zipWithIndex.map { case (c, i) => Row(i, c) }
    val schema = StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  // ------------------------------------------------------------------ LSH

  /** Builds the multi-table LSH index: each vector lands in `tables`
    * buckets (its sign-hash per table), so the corpus is written `tables`
    * times under `table=<t>/bucket=<b>` — the classic space-for-probes
    * trade. One projection + explode, then a write repartitioned BY
    * (table, bucket): each cell directory is one task's single file —
    * parallel across cells, no small-file spray. */
  def writeLsh(
      df: DataFrame, idCol: String, vecCol: String,
      bitsPerTable: Int, tables: Int, seed: Long, path: String): Unit = {
    require(bitsPerTable > 0 && bitsPerTable < 31 && tables > 0, "bad LSH shape")
    val dim = Similarity.vecDim(df, vecCol, "VectorIndex")
    val byTable = Similarity.hyperplanes(bitsPerTable * tables, dim, seed)
      .grouped(bitsPerTable).toSeq
    val entries = byTable.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("table"), Similarity.lshBucket(col(vecCol), planes).as("bucket"))
    }
    df.select(col(idCol), col(vecCol), explode(array(entries: _*)).as("_e"))
      .select(col(idCol), col(vecCol), col("_e.table").as("table"), col("_e.bucket").as("bucket"))
      .repartition(col("table"), col("bucket"))
      .write.mode("overwrite").partitionBy("table", "bucket").parquet(s"$path/corpus")
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("bits_per_table", IntegerType, nullable = false),
      StructField("tables", IntegerType, nullable = false),
      StructField("seed", LongType, nullable = false),
      StructField("dim", IntegerType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(Seq(Row(bitsPerTable, tables, seed, dim)), 1), schema)
      .write.mode("overwrite").parquet(s"$path/meta")
  }

  /** Incremental append to a written LSH index — [[appendIvf]]'s twin:
    * the batch is bucketed with the SIDECAR's hyperplane seed (identical
    * planes, no rebuild) and appended into the same `table=/bucket=`
    * partition dirs; probes keep their `tables`-directory pruning over
    * old + new rows. O(batch × tables) writes. */
  def appendLsh(
      df: DataFrame, idCol: String, vecCol: String, path: String): Unit = {
    val spark = df.sparkSession
    val m = spark.read.parquet(s"$path/meta").head()
    val (bits, tables, seed, dim) = (m.getInt(0), m.getInt(1), m.getLong(2), m.getInt(3))
    val byTable = Similarity.hyperplanes(bits * tables, dim, seed)
      .grouped(bits).toSeq
    val entries = byTable.zipWithIndex.map { case (planes, t) =>
      struct(lit(t).as("table"), Similarity.lshBucket(col(vecCol), planes).as("bucket"))
    }
    df.select(col(idCol), col(vecCol), explode(array(entries: _*)).as("_e"))
      .select(col(idCol), col(vecCol), col("_e.table").as("table"), col("_e.bucket").as("bucket"))
      .repartition(col("table"), col("bucket"))
      .write.mode("append").partitionBy("table", "bucket").parquet(s"$path/corpus")
  }

  /** Top-k probe against a written LSH index: the query's probe buckets
    * per table are computed on the driver from the sidecar's seed, the
    * scan reads exactly `tables × nprobe` bucket directories
    * (partition-pruned OR of per-table membership), candidates seen in
    * several tables dedupe by id, and exact cosine runs only over
    * candidates. `nprobe` > 1 is multiprobe
    * ([[Similarity.multiprobeBuckets]]): the smallest-margin hamming-1
    * neighbor buckets are probed too, buying recall per extra directory
    * instead of per extra index copy. */
  def lshTopK(
      spark: SparkSession, path: String, idCol: String, vecCol: String,
      query: Seq[Double], k: Int, excludeId: Option[Long] = None,
      nprobe: Int = 1): DataFrame = {
    val m = spark.read.parquet(s"$path/meta").head()
    val (bits, tables, seed, dim) = (m.getInt(0), m.getInt(1), m.getLong(2), m.getInt(3))
    require(query.length == dim, s"query dim ${query.length} != index dim $dim")
    require(nprobe >= 1 && nprobe <= bits + 1,
      s"nprobe must be in [1, bits_per_table + 1 = ${bits + 1}]")
    val byTable = Similarity.hyperplanes(bits * tables, dim, seed)
      .grouped(bits).toSeq
    val cond = byTable.zipWithIndex.map { case (planes, t) =>
      val probes = Similarity.multiprobeBuckets(planes, query, nprobe)
      col("table") === lit(t) && col("bucket").isin(probes: _*)
    }.reduce(_ || _)
    val candidates = spark.read.parquet(s"$path/corpus")
      .where(cond)
      .dropDuplicates(idCol)
    Similarity.bruteTopK(candidates, idCol, vecCol, query, k, excludeId)
  }
}
