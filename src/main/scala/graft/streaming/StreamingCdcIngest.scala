package graft.streaming

import graft.operators.Curation
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming content-addressed chunk store — [[graft.operators.Curation
  * .cdcChunks]]' ingest twin, and the storage-dedup loop every crawl
  * recrawl runs: each micro-batch of documents is CDC-chunked, chunks
  * whose `chunk_md5` already exists anywhere in the persisted store are
  * NOT stored again (only referenced), and each document lands as a
  * manifest of chunk pointers it can be reassembled from. Because CDC
  * boundaries are content-defined, a recrawled page with one edited
  * paragraph stores only the chunks touching the edit — the fixed-offset
  * chunker would re-store the whole tail ([[graft.operators.Curation
  * .chunkWords]] vs `cdcChunks`, the same bargain shifted to storage).
  *
  * Layout: `<path>/store` holds `(chunk_md5, chunk_text)` partitioned by
  * ingest `batch_id` — the content-addressed heap; `<path>/manifest`
  * holds `(doc_id, chunk_idx, chunk_md5)` per batch — the document
  * skeletons. Steady-state probe cost is a scan of the store's md5
  * COLUMN (parquet-pruned, 32 hex chars per stored chunk), independent
  * of chunk sizes; chunk text is write-only on this path. [[readDocs]]
  * reassembles originals exactly (spec-pinned round trip).
  *
  * ==Replay safety==
  * `foreachBatch` is at-least-once, so both writes are `batch_id`-keyed
  * dynamic-partition overwrites and the batch recomputes deterministically
  * (the freshness anti-join EXCLUDES this batch's own — possibly
  * half-written — store partition, the [[StreamingIngest]] argument): any
  * crash window replays to the identical end state. The manifest partition
  * publishes LAST as the commit point — a document becomes visible only
  * after every chunk it references is durably in the store; orphan chunks
  * from a crash before the manifest are invisible and overwritten on
  * replay.
  */
object StreamingCdcIngest {

  def storePath(path: String): String = s"$path/store"
  def manifestPath(path: String): String = s"$path/manifest"

  private def hasParquet(spark: SparkSession, dir: String): Boolean = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists { st =>
      st.getPath.getName.endsWith(".parquet") ||
        (st.isDirectory && st.getPath.getName.startsWith("batch_id="))
    }
  }

  /** Process one micro-batch idempotently (package-private so the replay
    * spec can stage crash windows directly). */
  private[graft] def processBatch(
      batch: DataFrame, batchId: Long, path: String,
      idCol: String, textCol: String, k: Int, divisor: Int): Unit = {
    val spark = batch.sparkSession
    // within-batch id dedup (deterministic min-text wins): two versions of
    // one id in a batch would otherwise interleave their manifest rows and
    // readDocs would concatenate both versions' chunks
    val docs = batch.groupBy(col(idCol))
      .agg(min(struct(col(textCol))).getField(textCol).as(textCol))
    val chunks = Curation.cdcChunks(docs, idCol, textCol, k, divisor, withText = true)
      .select(col(idCol), col("chunk_idx"), col("chunk_md5"), col("chunk_text"))
      .cache()
    try {
      // within-batch: store each distinct chunk once (md5-identified; the
      // struct-min keeps the selection deterministic under replay)
      val batchChunks = chunks.groupBy("chunk_md5")
        .agg(min(struct(col("chunk_text"))).getField("chunk_text").as("chunk_text"))
      // cross-batch: only chunks the store has never seen, judged against
      // every partition EXCEPT this batch's own (replay safety)
      val store = storePath(path)
      val fresh =
        if (hasParquet(spark, store))
          batchChunks.join(
            spark.read.parquet(store)
              .where(col("batch_id") =!= lit(batchId))
              .select("chunk_md5").distinct(),
            Seq("chunk_md5"), "left_anti")
        else batchChunks
      fresh.withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(store)
      // manifest LAST — the commit point
      chunks.select(col(idCol), col("chunk_idx"), col("chunk_md5"))
        .withColumn("batch_id", lit(batchId))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id").parquet(manifestPath(path))
    } finally { chunks.unpersist(); () }
    ()
  }

  /** Start chunk-deduped ingestion of `stream` (docs with `idCol`,
    * `textCol`) into the content-addressed store at `path`. */
  def appendChunked(
      stream: DataFrame, path: String, idCol: String, textCol: String,
      k: Int = 8, divisor: Int = 64): StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, path, idCol, textCol, k, divisor)
    }.start()

  /** Reassemble every ingested document exactly: manifest pointers join
    * the store heap on `chunk_md5` (the store side is the dedup-shrunken
    * one), chunks regroup per doc in `chunk_idx` order. */
  def readDocs(spark: SparkSession, path: String, idCol: String,
      textCol: String): DataFrame =
    spark.read.parquet(manifestPath(path))
      .join(spark.read.parquet(storePath(path)).select("chunk_md5", "chunk_text"),
        "chunk_md5")
      .groupBy(col(idCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text")))),
        s => s.getField("chunk_text")), "").as(textCol))
}
