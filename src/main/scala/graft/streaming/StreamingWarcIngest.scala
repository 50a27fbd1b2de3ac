package graft.streaming

import graft.operators.Curation
import graft.sources.Warc
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming crawl ingestion — the fourteenth streaming twin: WARC
  * segment paths arrive on a notification stream (the queue-of-segments
  * pattern real crawlers publish), each micro-batch reads its segments
  * with the native [[graft.sources.Warc]] reader, reduces 200/text-html
  * responses to clean text ([[Curation.stripHtml]]), and lands them in
  * the deduped parquet corpus through [[StreamingIngest.processBatch]] —
  * inheriting its entire exactly-once replay discipline (within-batch
  * argmin dedup, sidecar-gated cross-batch dedup, stage+rename publish,
  * fingerprints last).
  *
  * Replay safety on top of that: a replayed batch carries the SAME
  * segment paths, [[Warc]] decoding is deterministic, and stripHtml is a
  * pure projection — so the replayed batch DataFrame is bit-identical
  * and [[StreamingIngest]]'s convergence argument applies verbatim. A
  * segment re-announced in a LATER batch (at-least-once queues do this)
  * is also harmless: its documents fingerprint-match the earlier
  * publish and the cross-batch anti-join drops them.
  *
  * Scale shape: per-batch work is one task per segment file (the
  * [[Warc]] contract) + the ingest anti-join against the fixed-width
  * fingerprint sidecar; the corpus itself stays write-only.
  */
object StreamingWarcIngest {

  /** Process one micro-batch of segment paths idempotently. Package-
    * private so the replay spec can drive crash windows directly. */
  private[graft] def processBatch(
      paths: DataFrame, batchId: Long, corpusPath: String,
      maxRecordBytes: Int): Unit = {
    val spark = paths.sparkSession
    val files = paths.select(col(paths.columns.head).cast("string"))
      .collect().map(_.getString(0)).filter(f => f != null && f.nonEmpty)
      .distinct.sorted
    if (files.isEmpty) return
    val docs = files.toSeq
      .map(f => Warc.htmlDocs(spark, f, maxRecordBytes))
      .reduce(_ unionByName _)
    val clean = Curation.stripHtml(docs, "html", "text")
      .select(col("record_id"), col("target_uri"), col("warc_date"), col("text"))
    StreamingIngest.processBatch(clean, batchId, corpusPath, "record_id", "text")
  }

  /** Start crawl ingestion: `pathStream`'s first column is a WARC segment
    * path per row; clean text documents land append-deduped at
    * `corpusPath` (+ fingerprint sidecar). */
  def ingestHtml(
      pathStream: DataFrame, corpusPath: String,
      maxRecordBytes: Int = 64 << 20): StreamingQuery =
    pathStream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      processBatch(batch, batchId, corpusPath, maxRecordBytes)
    }.start()
}
