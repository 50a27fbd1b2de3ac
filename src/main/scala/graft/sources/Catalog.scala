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
}
