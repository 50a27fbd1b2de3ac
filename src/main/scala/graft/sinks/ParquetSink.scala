package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import java.nio.charset.StandardCharsets

/** Parquet sink carrying the reference's `last_modified` stamp.
  *
  * The reference stores the WRDS "Last modified" string in parquet key-value
  * schema metadata (wrds2pg/files/parquet.py:28-40, 92-95) and uses it to skip
  * up-to-date tables. Round 6: the stamp now lands in the TRUE file-level
  * footer KV of every part file ([[ParquetKvStamp]] — the exact surface
  * `pq.read_schema(file).metadata[b"last_modified"]` reads, so a reference
  * user's own tooling sees the stamp), plus the `_graft_meta.json` sidecar
  * kept as the directory-level convenience and the legacy fallback
  * (underscore-prefixed, invisible to Spark/Hive/DuckDB scans). Reads
  * prefer the footer and fall back to the sidecar.
  */
object ParquetSink {
  private val MetaFile = "_graft_meta.json"
  private[graft] val StampKey = "last_modified"

  def write(df: DataFrame, path: String, lastModified: String): Unit = {
    df.write.mode(SaveMode.Overwrite).parquet(path)
    setModified(df.sparkSession, path, lastModified)
  }

  /** Hive-layout partitioned write (`partitionBy` directories). At 100 TB
    * this is how the artifact should land: partition columns (date, source,
    * language, ...) become directories, so downstream reads with a
    * partition-column filter prune whole subtrees before any I/O. The
    * modified stamp still lives once at the table root. */
  def writePartitioned(
      df: DataFrame, path: String, partitionCols: Seq[String], lastModified: String): Unit = {
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)
    setModified(df.sparkSession, path, lastModified)
  }

  def setModified(spark: SparkSession, path: String, lastModified: String): Unit = {
    // the reference-readable footer stamp on every part file…
    ParquetKvStamp.addKeyValues(spark, path, Map(StampKey -> lastModified))
    // …plus the directory-level sidecar (legacy fallback + human-readable)
    val p = new Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s"""{"last_modified": ${jsonStr(lastModified)}}""".getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read back the stamp; "" if absent (matches get_modified_pq,
    * parquet.py:28-40). Footer KV first (the reference surface), sidecar
    * as the legacy fallback. */
  def getModified(spark: SparkSession, path: String): String = {
    val fromFooter = ParquetKvStamp.readKeyValue(spark, path, StampKey)
    if (fromFooter.nonEmpty) return fromFooter
    val p = new Path(path, MetaFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return ""
    val in = fs.open(p)
    val text =
      try new String(in.readAllBytes(), StandardCharsets.UTF_8)
      finally in.close()
    // minimal parse of {"last_modified": "..."}
    val m = """"last_modified"\s*:\s*"((?:[^"\\]|\\.)*)"""".r
    m.findFirstMatchIn(text).map(g => unescape(g.group(1))).getOrElse("")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb += '"'; i += 2
          case '\\' => sb += '\\'; i += 2
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case o => sb += o; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}
