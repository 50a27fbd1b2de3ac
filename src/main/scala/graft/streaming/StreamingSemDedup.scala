package graft.streaming

import graft.operators.{Dedup, SemDedup, Similarity, VectorIndex}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming semantic dedup — [[graft.operators.SemDedup]]'s ingest twin:
  * a stream of embeddings grows a MATERIALIZED IVF corpus
  * ([[VectorIndex]] layout) while dropping semantic near-duplicates, both
  * within each micro-batch and against everything previously persisted.
  *
  * The scale story is the index layout itself: the persisted corpus lives
  * hive-partitioned as `bucket=<b>/batch_id=<m>`, so a batch probes ONLY
  * the bucket directories its vectors were assigned to (Catalyst
  * partition pruning — steady-state probe cost tracks the batch's cluster
  * footprint, ~batch × N/C vectors, never the corpus), and appends in
  * O(batch). Centroids ride in the [[VectorIndex]] `meta` sidecar and are
  * fixed at bootstrap — the standard streaming-IVF bargain (re-bootstrap
  * to re-balance drifted clusters), same as [[VectorIndex.appendIvf]].
  *
  * `foreachBatch` (not state-store state) for the same reason as
  * [[StreamingIngest]]: the dedup horizon is "everything ever persisted",
  * unbounded and restart-surviving — the index IS the state.
  *
  * ==Replay safety (exactly-once)==
  * foreachBatch is at-least-once; every write here is keyed by batchId
  * and convergent under replay:
  *  1. the fresh set is computed against the corpus EXCLUDING this
  *     batch's own `batch_id` partitions (a half-written prior attempt
  *     can neither shrink nor grow it; assignment, within-batch
  *     components and the cosine gate are all deterministic);
  *  1. any prior attempt's `batch_id=<id>` partition directories are
  *     deleted, then survivors land via dynamic partition overwrite into
  *     exactly those partitions — so a replay replaces rather than
  *     duplicates, and a batch whose survivors are empty still clears its
  *     stale half-writes.
  */
object StreamingSemDedup {

  /** Sidecar batch id for rows bootstrapped from a pre-existing corpus. */
  val BootstrapBatchId: Long = -1L

  private def fsOf(spark: SparkSession, path: String): (FileSystem, Path) = {
    val p = new Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** One-time index bootstrap: train centroids on the seed corpus (or pass
    * pre-trained ones), write it bucket+batch partitioned plus the
    * centroid sidecar. The seed corpus is NOT deduped — it is taken as the
    * canonical starting set. */
  def bootstrap(
      df: DataFrame, idCol: String, vecCol: String,
      c: Int, iters: Int, path: String): Unit = {
    val centroids = Similarity.kMeans(df, idCol, vecCol, c, iters)
    Similarity.assignBuckets(df, idCol, vecCol, centroids)
      .withColumn("batch_id", lit(BootstrapBatchId))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("bucket", "batch_id").parquet(s"$path/corpus")
    val spark = df.sparkSession
    import org.apache.spark.sql.types._
    val rows = centroids.zipWithIndex.map { case (ct, i) =>
      org.apache.spark.sql.Row(i, ct)
    }
    val schema = StructType(Seq(
      StructField("bucket", IntegerType, nullable = false),
      StructField("centroid", ArrayType(DoubleType), nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** Process one micro-batch idempotently (see class doc). Package-private
    * so the replay spec can drive crash windows directly. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String,
      idCol: String, vecCol: String, tau: Double): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val centroids = VectorIndex.readIvfCentroids(spark, path)

    // within-batch dedup: min-id exemplar per within-cluster component
    // (the deterministic SemDedup policy)
    val pairs = SemDedup.pairs(batch, idCol, vecCol, centroids, tau)
    val losers = Dedup.connectedComponents(pairs, "a", "b")
      .where(col("id") =!= col("comp"))
      .select(col("id").as("_loser"))
    val assigned = Similarity.assignBuckets(batch, idCol, vecCol, centroids)
      .join(broadcast(losers), col(idCol).cast("long") === col("_loser"), "left_anti")

    // cross-batch dedup: probe ONLY the assigned buckets' directories,
    // excluding this batch's own (possibly half-written) partitions
    val buckets = assigned.select("bucket").distinct().as[Int].collect().toSeq
    val dupIds =
      if (buckets.isEmpty) spark.emptyDataFrame.select(lit(0L).as("_dup")).limit(0)
      else {
        val corpus = spark.read.parquet(s"$path/corpus")
          .where(col("batch_id") =!= lit(batchId) && col("bucket").isin(buckets: _*))
          .select(col("bucket"), col(vecCol).as("_cv"))
        assigned.join(corpus, Seq("bucket"))
          .where(Dedup.cosine(col(vecCol), col("_cv")) >= tau)
          .select(col(idCol).cast("long").as("_dup")).distinct()
      }
    val fresh = assigned
      .join(broadcast(dupIds), col(idCol).cast("long") === col("_dup"), "left_anti")

    // clear any prior attempt's partitions, then publish into exactly
    // bucket=*/batch_id=<id> via dynamic overwrite
    val (fs, corpusRoot) = fsOf(spark, s"$path/corpus")
    if (fs.exists(corpusRoot))
      fs.listStatus(corpusRoot).filter(_.isDirectory).foreach { b =>
        val stale = new Path(b.getPath, s"batch_id=$batchId")
        if (fs.exists(stale)) fs.delete(stale, true)
      }
    fresh.withColumn("batch_id", lit(batchId))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket", "batch_id").parquet(s"$path/corpus")
    ()
  }

  /** Start semantic-deduped ingestion of `stream` into the IVF corpus at
    * `path` (bootstrap first). Survivors keep (id, vec, bucket, batch_id). */
  def appendDeduped(
      stream: DataFrame, path: String,
      idCol: String, vecCol: String, tau: Double): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, idCol, vecCol, tau)
    }.start()
}
