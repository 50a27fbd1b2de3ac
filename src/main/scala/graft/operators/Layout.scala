package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout verbs — the write-side levers that decide how much a
  * 100 TB scan actually reads:
  *
  *  - [[zValue]] / [[writeZOrdered]]: Z-order (Morton) clustering. Parquet
  *    pruning is per-row-group min/max; a layout sorted on one column
  *    prunes filters on THAT column only. Interleaving the bits of two
  *    dimensions makes files/row-groups tight boxes in BOTH, so a 2-d box
  *    filter skips most row groups on either predicate — the standard
  *    lakehouse trick (Delta/Iceberg `OPTIMIZE ZORDER BY`), here as a
  *    plain column expression + range-partitioned write, no table format
  *    needed. The z-value is pure codegen'd bit arithmetic.
  *
  *  - [[compact]]: small-file compaction. Streaming ingest and fine
  *    partitioning leave thousands of KB-sized files; every one costs a
  *    task, a footer read, and a name-node round-trip, so scan cost
  *    becomes file count, not byte count. Rewriting to
  *    ceil(bytes / targetBytes) files restores byte-bound scans.
  *    Listing/size metadata comes from the filesystem, the data move is
  *    one distributed repartition — the driver never touches rows.
  *
  * Reference has no layout surface (wrds2pg writes whatever COPY emits);
  * this is part of the training-corpus extension surface.
  */
object Layout {

  /** Morton z-value of two non-negative int columns, interleaving the low
    * `bits` bits of each (x even positions, y odd). Monotone boxes in
    * (x, y) map to compact z ranges; 16+16 bits fills a positive int64. */
  def zValue(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits > 0 && bits <= 31, "bits must be in [1, 31]")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      val xb = shiftleft(shiftright(xl, i).bitwiseAND(1L), 2 * i)
      val yb = shiftleft(shiftright(yl, i).bitwiseAND(1L), 2 * i + 1)
      xb.bitwiseOR(yb)
    }.reduce(_ bitwiseOR _)
  }

  /** Refuse to rewrite a directory that is not a COMPLETE committed
    * write. A crash inside an upstream job's commit leaves partially
    * committed part files and no `_SUCCESS`; a layout rewrite would read
    * that partial set and republish it under a fresh `_SUCCESS` of its
    * own — laundering the hole into a directory every later reader
    * trusts. Same discipline as the index repair verbs
    * ([[VectorIndex]]'s repair `_SUCCESS` precondition): the marker is
    * the committer's own completeness receipt. */
  private def requireCommitted(
      fs: org.apache.hadoop.fs.FileSystem, srcPath: String, verb: String): Unit =
    require(fs.exists(new org.apache.hadoop.fs.Path(s"$srcPath/_SUCCESS")),
      s"$verb: $srcPath has no _SUCCESS commit marker — the upstream " +
        "write died inside its job commit, so the part files may be a " +
        "partial set this rewrite would silently bless as complete. " +
        "Re-run (or clean up) the upstream write first")

  /** Write `df` z-clustered on (xCol, yCol) into `files` parquet files:
    * range-partition + sort by z-value so each file (and each row group
    * inside it) covers a tight (x, y) box, then drop the helper column.
    * One range shuffle; parallelism = `files`. */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String,
      path: String, files: Int, bits: Int = 16): Unit =
    df.withColumn("_z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(files, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** [[writeZOrdered]] as a DIRECTORY rewrite (read `srcPath`, publish
    * z-clustered into `destPath`) — the form a table-maintenance job
    * runs. Refuses a source with no `_SUCCESS` commit marker
    * ([[requireCommitted]]): a z-order rewrite of a partially committed
    * corpus would bless the hole under its own fresh commit. */
  def zorderRewrite(
      spark: SparkSession, srcPath: String, destPath: String,
      xCol: String, yCol: String, files: Int, bits: Int = 16): Unit = {
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    requireCommitted(fs, srcPath, "zorderRewrite")
    writeZOrdered(spark.read.parquet(srcPath), xCol, yCol, destPath, files, bits)
  }

  /** Compact a parquet directory to ceil(totalBytes / targetBytes) files
    * (at least 1), rewriting into `destPath`. Returns (filesBefore,
    * filesAfter). Row order is not preserved — compaction is a layout
    * operation; pair with [[writeZOrdered]] when clustering matters.
    *
    * Merging DOWN uses `coalesce`, not `repartition`: each output task
    * reads several input files and writes one — NO shuffle, which at
    * 100 TB is the difference between a metadata-cost rewrite and moving
    * the corpus over the network. (`repartition` only when the target
    * exceeds the scan's parallelism, where coalesce cannot grow.) */
  def compact(
      spark: SparkSession, srcPath: String, destPath: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(srcPath)
    val fs = src.getFileSystem(conf)
    requireCommitted(fs, srcPath, "compact")
    val parts = fs.listStatus(src)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val target = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val scan = spark.read.parquet(srcPath)
    val sized =
      if (target <= scan.rdd.getNumPartitions) scan.coalesce(target)
      else scan.repartition(target)
    sized.write.mode(SaveMode.Overwrite).parquet(destPath)
    val after = fs.listStatus(new org.apache.hadoop.fs.Path(destPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
