package graft.tools

import org.apache.spark.sql.functions._

/** Measure the winnow-gated candidate-span economy behind q101 at a scale
  * dir: total candidate rows, distinct spans, and the duplicated share
  * (rows in spans with sites >= 2) — hashed (xxhash64) so the probe
  * shuffles 8-byte keys, not strings. The split decides whether a
  * dup-hash pre-gate can cut the raw-span string shuffle (singletons
  * dominate → gate wins) or the duplicated mass IS the volume (gate
  * cannot help). Usage: `graft.tools.SpanMassProbe <sfdir> [l] [k]`. */
object SpanMassProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf10")
    val l = if (args.length > 1) args(1).toInt else 40
    val k = if (args.length > 2) args(2).toInt else 32
    val spark = graft.core.GraftSession
      .builder(master = "local[32]", shufflePartitions = 64).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.core.Tables.load(spark, dir, "documents")
    val t0 = System.nanoTime()
    val cand = graft.operators.SpanDedup
      .winnowCandSpans(docs, "doc_id", "text", l, k)
      .select(xxhash64(col("span")).as("_h"))
    val row = cand.repartition(col("_h"))
      .groupBy("_h").agg(count(lit(1)).as("c"))
      .agg(
        coalesce(sum(col("c")), lit(0L)).as("rows"),
        count(lit(1)).as("distinct_spans"),
        coalesce(sum(when(col("c") > 1, col("c"))), lit(0L)).as("dup_rows"),
        coalesce(sum(when(col("c") > 1, 1L)), lit(0L)).as("dup_spans"),
        max(col("c")).as("max_sites"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    val rows = row.getLong(0)
    val dupRows = row.getLong(2)
    println(f"[spanmass] dir=$dir l=$l k=$k cand_rows=$rows " +
      f"distinct=${row.getLong(1)} dup_rows=$dupRows " +
      f"dup_spans=${row.getLong(3)} max_sites=${row.getLong(4)} " +
      f"dup_frac=${if (rows == 0) 0.0 else dupRows.toDouble / rows}%.3f " +
      f"probe_s=$secs%.1f")
    spark.stop()
  }
}
