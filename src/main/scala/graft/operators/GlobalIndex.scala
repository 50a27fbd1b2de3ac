package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable global row numbering / ranking.
  *
  * `row_number() OVER (ORDER BY ...)` with no PARTITION BY plans as a
  * single-partition window — every row moves to ONE task that sorts the
  * whole dataset, the canonical 100 TB non-starter. For a total ordering
  * (include a unique tiebreak column) the same numbering is computed
  * distributed in two passes over a range shuffle:
  *
  *   1. `repartitionByRange(order)` splits the sort order contiguously
  *      across partitions (boundary sampling is seeded deterministically,
  *      so both passes see identical boundaries);
  *   2. a count pass collects per-partition row counts (one tiny row per
  *      partition) and prefix-sums them into offsets;
  *   3. the emit pass computes the partition-local row_number — each task
  *      sorts only its own slice — and adds the broadcast offset.
  *
  * Global rank = local rank + offset, exactly; q59's DuckDB oracle checks
  * the full numbering bit-for-bit. Two shuffles of the projected columns
  * replace one impossible shuffle-to-one.
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
    val rn = "_gi_ntile_rn"
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
    val spark = df.sparkSession
    val ordCols = order.map(col)
    val pid = "_gi_pid"
    val ranged = df.repartitionByRange(ordCols: _*).withColumn(pid, spark_partition_id())

    // Pass 1: per-partition counts → prefix-sum offsets (driver-side, one
    // long per partition).
    val counts = ranged.groupBy(pid).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (p, n)) => (p, acc + n) }
    val offsetRows = counts.map(_._1).zip(offsets.map(_._2)).map { case (p, off) => (p, off) }
    val offsetDf = spark.createDataFrame(offsetRows.toSeq).toDF(pid + "_k", "_gi_offset")

    // Pass 2: partition-local window (each task sorts its own slice only)
    // + broadcast offset join.
    val w = Window.partitionBy(pid).orderBy(ordCols.map(_.asc): _*)
    val numbered = ranged
      .withColumn("_gi_local", row_number().over(w))
      .join(broadcast(offsetDf), col(pid) === col(pid + "_k"))
      .withColumn(rnCol, col("_gi_offset") + col("_gi_local"))
      .drop(pid, pid + "_k", "_gi_offset", "_gi_local")
    (numbered, counts.map(_._2).sum)
  }
}
