package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Gzipped-CSV sink — graft's equivalent of `wrds_to_csv` / `wrds_update_csv`
  * (wrds2pg/files/csv.py:86-128).
  *
  * The reference writes ONE `.csv.gz` through one gzip stream; graft writes a
  * directory of gzipped part files, one per partition — at 100 TB a single
  * gzip stream is the bottleneck, a parquet-style parallel layout is not.
  * Readers (including graft's own SasCsvReader and DuckDB's `read_csv`) take
  * the directory/glob transparently.
  */
object CsvSink {
  def write(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .option("header", header.toString)
      .option("compression", "gzip")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)
}
