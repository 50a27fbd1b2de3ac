package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table enumeration — the reference's `get_wrds_tables` lists a SAS
  * library's members via dictionary.tables (wrds2pg/sas/metadata.py:293-328).
  * graft's libraries are directories of parquet/csv tables, so the analog is
  * a filesystem listing surfaced as a DataFrame (sorted, like the
  * reference's ORDER BY memname).
  */
object Catalog {
  def listTables(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val names =
      if (!fs.exists(p)) Seq.empty[String]
      else fs.listStatus(p).toSeq
        .map(_.getPath.getName)
        .filterNot(n => n.startsWith("_") || n.startsWith("."))
        .map(n => n.replaceAll("\\.(parquet|csv|csv\\.gz)$", ""))
        .distinct.sorted
    names.toDF("table_name")
  }

  /** Whether `table` exists in the library — the reference's graceful
    * missing-table probe (`get_modified_str`/`proc_contents` print "Table
    * x.y not found." and return None, test_missing_table.ipynb;
    * wrds2pg/sas/metadata.py:79-113). Callers gate `Update.*` on this
    * instead of letting a 100 TB pipeline die on an AnalysisException. */
  def tableExists(spark: SparkSession, dir: String, table: String): Boolean = {
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq(table, s"$table.parquet", s"$table.csv", s"$table.csv.gz")
      .exists(n => fs.exists(new Path(dir, n)))
  }
}
