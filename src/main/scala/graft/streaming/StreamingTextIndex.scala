package graft.streaming

import graft.operators.{TextAnalysis, TextIndex}
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Streaming maintenance of a materialized inverted text index
  * ([[graft.operators.TextIndex]]) — the twelfth streaming twin: each
  * micro-batch's postings land in the bucket layout, and searches stay
  * partition-pruned while the index grows.
  *
  * ==Replay safety (exactly-once)==
  * [[TextIndex.append]]'s plain `mode(Append)` would DUPLICATE postings
  * when foreachBatch replays a batch (at-least-once delivery) — the
  * classic streaming-append hazard. Here every write is batch-keyed and
  * convergent, the [[StreamingIngest]]/[[StreamingCdcIngest]]
  * discipline:
  *
  *  1. postings: `postings/batch_id=<id>/bucket=<b>/…`, written with
  *     DYNAMIC partition overwrite — a replay replaces its own batch's
  *     partitions with identical content (deterministic source replay),
  *     never touching other batches;
  *  1. meta: one row PER BATCH at `meta/batch_id=<id>/…` (n_docs,
  *     sumdl, buckets), dynamic-overwritten LAST. Global stats are the
  *     SUM over published meta rows — an increment-in-place meta would
  *     double-count when a crash lands after meta but before the
  *     checkpoint commit; a keyed row cannot.
  *  1. search gates postings on published batch ids (a broadcast-tiny
  *     semi-filter on the `batch_id` partition column): a crash between
  *     the postings write and the meta write leaves the batch fully
  *     INVISIBLE, not half-scored — meta is the commit point.
  *
  * Bucket pruning is unaffected by the extra partition level: Catalyst
  * prunes on any partition column, so a search reads
  * (published batches) × (query-term buckets) directories only.
  *
  * History is append-only by design (the [[StreamingCdcIngest]]
  * bargain): [[graft.operators.TextIndex.compact]] must NOT be pointed
  * at this layout while the stream runs — merging batch directories
  * would break the batch-keyed replay convergence. Compact by draining
  * the stream, rebuilding via the batch [[graft.operators.TextIndex
  * .write]], and restarting from a fresh checkpoint.
  */
object StreamingTextIndex {

  private val MetaSchema = StructType(Seq(
    StructField("n_docs", LongType, nullable = false),
    StructField("sumdl", LongType, nullable = true),
    StructField("buckets", IntegerType, nullable = false),
    StructField("batch_id", LongType, nullable = false)))

  private val PostingsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("dl", IntegerType, nullable = true),
    StructField("term", StringType, nullable = true),
    StructField("tf", LongType, nullable = true),
    StructField("batch_id", LongType, nullable = true),
    StructField("bucket", LongType, nullable = true)))

  def postingsPath(path: String): String = s"$path/postings"
  def metaPath(path: String): String = s"$path/meta"

  /** Process one micro-batch idempotently (see class doc). Package-
    * private so the replay spec can drive crash windows directly. */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String,
      idCol: String, textCol: String, buckets: Int): Unit = {
    require(buckets >= 1, s"StreamingTextIndex: need buckets >= 1, got $buckets")
    val spark = batch.sparkSession
    val fused = TextAnalysis.bm25PostsFused(batch, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val stats = fused.where(col("term").isNull)
      .agg(count(lit(1)), sum(col("_dl"))).head()
    fused.where(col("term").isNotNull)
      .select(col("_id").as("doc_id"), col("_dl").as("dl"),
        col("term"), col("_tf").as("tf"),
        lit(batchId).as("batch_id"),
        pmod(xxhash64(col("term")), lit(buckets.toLong)).as("bucket"))
      .repartition(col("bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "bucket")
      .parquet(postingsPath(path))
    // meta row LAST — the commit point
    spark.createDataFrame(
      java.util.Arrays.asList(Row(stats.getLong(0),
        if (stats.isNullAt(1)) null else Long.box(stats.getLong(1)),
        buckets, batchId)),
      MetaSchema)
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(metaPath(path))
    fused.unpersist()
  }

  /** Start index maintenance over a document stream. */
  def appendIndexed(
      stream: DataFrame, path: String, idCol: String, textCol: String,
      buckets: Int): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, idCol, textCol, buckets)
    }.start()

  /** BM25 top-k against the streaming index: postings gated on PUBLISHED
    * batch ids (meta is the commit point), stats summed over the same
    * rows, buckets pruned exactly like the batch search — identical
    * scores to [[TextIndex.search]] over the same published documents. */
  def search(
      spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    val meta = spark.read.schema(MetaSchema).parquet(metaPath(path)).collect()
    require(meta.nonEmpty, s"StreamingTextIndex: no published batches under $path")
    val buckets = meta.head.getInt(2)
    // A stream restarted with a different `buckets` hashed earlier batches'
    // postings under a DIFFERENT bucket count — partition pruning would then
    // silently drop them from scoring (wrong df, missing docs). Refuse loudly,
    // the StreamingOverlap mixed-k discipline.
    require(meta.forall(_.getInt(2) == buckets),
      s"StreamingTextIndex: mixed bucket counts across published batches " +
        s"(${meta.map(_.getInt(2)).distinct.sorted.mkString(", ")}) — earlier " +
        "batches were hashed under a different `buckets`; rebuild the index " +
        "with one bucket count (drain + batch TextIndex.write + fresh checkpoint)")
    val published = meta.map(_.getLong(3))
    val n = meta.map(_.getLong(0)).sum
    val sumdls = meta.filter(!_.isNullAt(1)).map(_.getLong(1))
    val sumdl = if (sumdls.isEmpty) None else Some(sumdls.sum)
    val qterms = TextAnalysis.bm25QueryTerms(queries, qIdCol, qTextCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val posts = spark.read.schema(PostingsSchema).parquet(postingsPath(path))
      .where(col("batch_id").isin(published.map(Long.box): _*) &&
        col("bucket").isin(TextIndex.neededBuckets(qterms, buckets): _*))
    // materialize the (≤ queries × topK)-row result, then release the qterms
    // cache — a lazily returned plan over it would leak the cache into the
    // session for good (ADVICE r5); localCheckpoint keeps the result cheap to
    // re-consume while truncating lineage off the cached intermediate
    val out = TextIndex.scorePruned(posts, qterms, n, sumdl, k1, b, topK)
      .localCheckpoint()
    qterms.unpersist()
    out
  }
}
