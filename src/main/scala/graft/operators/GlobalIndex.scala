package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Scalable global row numbering / ranking.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY plans as a
  * single-partition window — every row moves to ONE task that sorts the
  * whole dataset, the canonical 100 TB non-starter. For a total ordering
  * (include a unique tiebreak column) the same numbering is computed
  * distributed in two jobs over ONE range shuffle:
  *
  *   1. `repartitionByRange(order).sortWithinPartitions(order)` splits the
  *      sort order contiguously across partitions and sorts each slice
  *      locally — the physical plan is instantiated ONCE (a single RDD),
  *      so the RangePartitioner samples its boundaries a single time and
  *      the shuffle map output is written once;
  *   2. a count job reads that shuffle output and collects one long per
  *      partition, prefix-summed into offsets on the driver;
  *   3. the emit job reads the SAME shuffle output (Spark reuses map
  *      output across jobs on the same RDD — the map stage shows as
  *      "skipped") and streams each partition adding offset + local index.
  *
  * Because both jobs consume one materialized shuffle, there is no
  * re-sampling of range boundaries between passes — the failure mode where
  * pass-1 offsets get added to pass-2's differently-bounded partitions
  * cannot occur, at any data size, without caching anything in executor
  * memory. Global rank = local rank + offset, exactly; q59's DuckDB oracle
  * checks the full numbering bit-for-bit.
  */
object GlobalIndex {

  /** @param order    columns forming a TOTAL order (add a unique tiebreak —
    *                 numbering under a partial order is nondeterministic in
    *                 any engine)
    * @param rnCol    name of the appended 1-based global row number */
  def withRowNumbers(df: DataFrame, order: Seq[String], rnCol: String): DataFrame =
    withRowNumbersAndTotal(df, order, rnCol)._1

  /** Exact NTILE(k) in the same distributed fashion: global rank plus the
    * closed-form SQL-standard bucket arithmetic (the first n mod k buckets
    * take one extra row), so no single-partition window ever exists.
    * Matches `NTILE(k) OVER (ORDER BY ...)` bit-for-bit for total orders. */
  def withNtile(df: DataFrame, order: Seq[String], k: Int, bucketCol: String): DataFrame = {
    require(k > 0, "need k > 0")
    require(!df.columns.contains(bucketCol),
      s"output column $bucketCol already exists on the input")
    val rn = "_gi_ntile_rn"
    require(!df.columns.contains(rn),
      s"input already has a column named $rn (reserved scratch name)")
    val (numbered, n) = withRowNumbersAndTotal(df, order, rn)
    val q = n / k
    val r = n % k
    val bucket =
      if (q == 0) col(rn) // fewer rows than buckets: rank IS the bucket
      else expr(s"""CASE WHEN ($rn - 1) < ${(q + 1) * r}
                   |  THEN ($rn - 1) div ${q + 1} + 1
                   |  ELSE $r + (($rn - 1) - ${(q + 1) * r}) div $q + 1 END""".stripMargin)
    numbered.withColumn(bucketCol, bucket.cast("int")).drop(rn)
  }

  private def withRowNumbersAndTotal(
      df: DataFrame, order: Seq[String], rnCol: String): (DataFrame, Long) = {
    // schema.add below would happily produce a duplicate column name, which
    // then fails (ambiguous reference) only when the CALLER selects it.
    require(!df.columns.contains(rnCol),
      s"output column $rnCol already exists on the input")
    val spark = df.sparkSession
    val ordCols = order.map(col)
    val sorted = df
      .repartitionByRange(ordCols: _*)
      .sortWithinPartitions(ordCols.map(_.asc): _*)

    // Instantiate the physical plan exactly once. Both jobs below run over
    // this RDD, so the range shuffle (and its sampled boundaries) exists
    // once and the emit job reuses the count job's map output from shuffle
    // files — no persist/localCheckpoint needed.
    val rdd = sorted.rdd

    // Job 1: per-partition counts (one long per partition) → prefix sums.
    val counts = rdd
      .mapPartitions(it => Iterator.single(it.foldLeft(0L)((a, _) => a + 1)),
        preservesPartitioning = true)
      .collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val total = offsets.last

    // Job 2: stream each (already sorted) partition, appending offset+i.
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var rn = offsets(pid)
      it.map { row => rn += 1; Row.fromSeq(row.toSeq :+ rn) }
    }
    val numbered = spark.createDataFrame(out, sorted.schema.add(rnCol, LongType, nullable = false))
    (numbered, total)
  }
}
