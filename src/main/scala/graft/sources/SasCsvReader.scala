package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reads SAS-PROC-EXPORT-style CSV (optionally gzipped — Spark handles the
  * codec from the extension) into a typed DataFrame.
  *
  * This is graft's equivalent of the reference's ingest boundary: the
  * reference streams `proc export ... dbms=csv` output into Postgres COPY /
  * Arrow CSV (wrds2pg/files/parquet.py:61-99, postgres/copy.py:12-55), forcing
  * canonical lowercase column names and the inferred types. graft reads the
  * same CSV shape distributed: every partition parses independently, and the
  * typed schema means no inference pass over 100 TB.
  *
  * Cleaning semantics:
  *  - `fixMissing`: SAS special missing values (`.`, `.A`–`.Z`, `._`, or the
  *    bare letter SAS prints for them) become NULL in non-text columns
  *    (reference: wrds2pg/sas/codegen.py:117-126 zaps them pre-export).
  *  - `fixCr`: embedded CR/LF in character columns are stripped
  *    (reference: codegen.py:20-26 `compress(_char,,'kw')`).
  *  - empty string → NULL everywhere except text columns
  *    (reference: parquet.py:55-58 `null_values=[""]`).
  *
  * All cleaning uses built-in codegen'd expressions (`when`/`regexp_replace`/
  * `try_cast`) — no UDFs, so the whole read stage stays in WholeStageCodegen.
  */
object SasCsvReader {

  private val specialMissing = "^(\\.|\\.?[A-Za-z_])$" // ".", ".A".."Z", "._", "A".."Z", "_"

  /** Read csv(.gz) at `path` applying `schema` (names are positional,
    * header row is skipped — like the reference forcing canonical names,
    * parquet.py:74-76).
    *
    * @param encoding charset of the file bytes — the reference's
    *                 `encoding`/`sas_encoding` parameters (wrds2pg/api.py:48-49,
    *                 sas/stream.py:14); WRDS SAS exports are frequently
    *                 latin1, which mis-reads under the UTF-8 default. */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      fixMissing: Boolean = false,
      fixCr: Boolean = false,
      header: Boolean = true,
      encoding: String = "UTF-8"
  ): DataFrame = {
    // Parse as raw strings; apply typing ourselves so cleaning happens first.
    val rawSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    // fixCr implies fields may contain embedded newlines (quoted): parse
    // multiline, then strip. (An *unquoted* CR corrupts the physical line —
    // the reference has to fix that inside SAS before export, codegen.py:18-26;
    // no reader on either side can recover it after the fact.)
    val raw = spark.read
      .option("header", header.toString)
      .option("nullValue", "")
      .option("multiLine", fixCr.toString)
      .option("encoding", encoding)
      .schema(rawSchema)
      .csv(path)

    val cols = schema.fields.map { f =>
      val c = col(f.name)
      typed(c, f.dataType, fixMissing, fixCr).as(f.name)
    }
    raw.select(cols.toIndexedSeq: _*)
  }

  /** Clean + cast a raw string column to its target type. */
  def typed(c: Column, dt: DataType, fixMissing: Boolean, fixCr: Boolean): Column = dt match {
    case StringType =>
      if (fixCr) regexp_replace(c, "[\\r\\n]", "") else c
    case _ =>
      // non-text: blank/"." are missing; with fixMissing, special missings too
      val cleaned =
        if (fixMissing) when(c.rlike(specialMissing), lit(null).cast(StringType)).otherwise(c)
        else when(c === ".", lit(null).cast(StringType)).otherwise(c)
      tryCast(cleaned, dt)
  }

  /** ANSI-safe cast (Spark 4 defaults to ANSI mode, where a bad cast throws;
    * SAS CSV can always contain surprises, so parse failures become NULL). */
  def tryCast(c: Column, dt: DataType): Column = c.try_cast(dt)
}
