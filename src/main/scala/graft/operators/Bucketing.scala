package graft.operators

import org.apache.spark.sql.DataFrame

/** Bucketed-table co-location: write fact/dimension tables hash-bucketed
  * (and sorted) on their join key so repeated joins and aggregations on that
  * key run WITHOUT a shuffle — the warehouse-layout half of the scale story,
  * complementing the per-query plans elsewhere in this package.
  *
  * On a 100 TB corpus the dominant recurring cost is re-shuffling the same
  * fact table on the same key for every downstream query; bucketing pays
  * that shuffle ONCE at write time. Two tables bucketed into the same number
  * of buckets on their join key sort-merge-join with zero Exchange operators
  * (Spark's bucketed scan exposes the hash-partitioning to the planner), and
  * `sortBy` additionally removes the per-task Sort when bucket files are
  * single (exact bucket-file pruning also applies to point predicates on
  * the bucket key).
  *
  * Reference behavior: wrds2pg materializes plain tables and indexes
  * downstream in PostgreSQL (wrds2pg/api.py:37 wrds_update); bucketing
  * is the Spark-native equivalent of "build the index at load time".
  */
object Bucketing {

  /** Writes `df` as a bucketed, sorted parquet table in the session catalog
    * (replacing any previous version). Bucket count should be sized so one
    * bucket of the LARGEST co-located table fits an executor core's working
    * memory at target scale. */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // An in-memory catalog forgets managed tables across JVMs but their
    // warehouse directories survive; clear any orphaned location so the
    // CREATE TABLE AS doesn't refuse to reuse it.
    val loc = new org.apache.hadoop.fs.Path(spark.sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .format("parquet")
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir
  }

  /** Reads a bucketed table back from the session catalog. */
  def readBucketed(spark: org.apache.spark.sql.SparkSession, table: String): DataFrame =
    spark.table(table)
}
