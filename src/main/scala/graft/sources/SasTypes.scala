package graft.sources

import org.apache.spark.sql.types._

/** SAS PROC CONTENTS metadata → column types.
  *
  * Mirrors the reference's inference semantics (`code_row_dict`,
  * wrds2pg/sas/metadata.py:256-291): SAS exposes per-variable
  * (type, format, formatl, formatd); the reference maps those to PostgreSQL
  * type names, and the parquet sink maps PG names to Arrow types
  * (wrds2pg/files/parquet.py:12-26). graft keeps the PG names as its portable
  * type vocabulary and maps them to Spark `DataType`s.
  */
object SasTypes {

  /** One PROC CONTENTS row: `name,type,format,formatl,formatd,length`
    * (wrds2pg/sas/metadata.py:43 keeps exactly these). type=2 is character. */
  final case class ContentsRow(
      name: String,
      sasType: Int,
      format: String = "",
      formatl: Int = 0,
      formatd: Int = 0,
      length: Int = 8
  )

  /** PG type name for a metadata row — same decision tree as the reference. */
  def pgType(row: ContentsRow): String = {
    val fmt = Option(row.format).getOrElse("").trim
    if (row.sasType == 2) return "text"
    if (fmt.nonEmpty) {
      val f = fmt.toUpperCase
      if (f.contains("DATETIME")) return "timestamp"
      if (f == "TIME8." || f == "TOD" || f.contains("TIME")) return "time"
      if (f.contains("DATE") || f.contains("YYMMDD") || f.contains("MMDDYY")) return "date"
    }
    if (fmt.toUpperCase == "BEST") "float8"
    else if (row.formatd != 0) "float8"
    else if (row.formatl != 0) "integer"
    else "float8"
  }

  /** PG type name → Spark DataType. Strips length suffixes like `varchar(8)`
    * the way the reference's Arrow mapping does (parquet.py:47). SAS `time`
    * has no Spark column type; like the reference's Arrow map we carry it as
    * string (parquet.py:19-22). */
  def sparkType(pg: String): DataType = {
    val t = pg.trim.toLowerCase.replaceAll("\\(.*\\)$", "").trim
    t match {
      case "text" | "varchar" | "char" | "character varying" => StringType
      case "integer" | "int" | "int4"                        => IntegerType
      case "bigint" | "int8"                                 => LongType
      case "float8" | "double precision" | "double" | "real" | "float4" => DoubleType
      case "date"                                            => DateType
      case "time"                                            => StringType
      case "timestamp" | "timestamptz"                       => TimestampType
      case "boolean" | "bool"                                => BooleanType
      case other => throw new IllegalArgumentException(s"unknown type name: $other")
    }
  }

  /** Infer a full Spark schema from PROC CONTENTS rows + user overrides
    * (the reference's `get_table_metadata`: inferred types, then `col_types`
    * overrides win — wrds2pg/sas/metadata.py:247-254). Names lowercased. */
  def inferSchema(rows: Seq[ContentsRow], colTypes: Map[String, String] = Map.empty): StructType = {
    val overrides = colTypes.map { case (k, v) => (k.toLowerCase, v) }
    StructType(rows.map { r =>
      val name = r.name.trim.toLowerCase
      val pg = overrides.getOrElse(name, pgType(r))
      StructField(name, sparkType(pg), nullable = true)
    })
  }
}
