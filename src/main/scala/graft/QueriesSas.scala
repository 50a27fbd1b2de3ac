package graft

import graft.core.Tables
import graft.multimodal.Binary
import graft.operators.{AsOfJoin, Bucketing, Checks, Classifier, Curation, Dedup, Funnel, GlobalIndex, Graph, Importance, IntervalJoin, LanguageModel, Layout, Merge, MinHashLSH, Packing, Paths, ProductQuantizer, Retention, Sampling, Sessionize, SimHash, Similarity, SkewJoin, Sketches, TextAnalysis, Urls, VectorIndex}
import graft.sinks.{CsvSink, ParquetSink}
import graft.sources.{Catalog, SasCsvReader, SasOptions, SasTypes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** §2.1 — SAS-boundary ETL queries (keep/rename/where/obs, type
  * inference, roundtrips, catalog). */
private[graft] trait QueriesSas extends QueryHelpers {

  // ---------------------------------------------------------------- §2.1

  /** Native WARC crawl-archive ingest (ISO 28500 — the Common Crawl
    * boundary, the training-pipeline entry point the text stack consumes):
    * plain and per-record-gzip member layouts, length-driven payload
    * parsing (bodies legally contain the record delimiter), HTTP
    * head/body split for response/request records, one task per file.
    * Oracle: an independent spec-driven python re-parser's expected-value
    * CSV (tools/make_warc_fixtures.py); composition with stripHtml and
    * refusal paths are spec-pinned. */
  def q137WarcIngest(spark: SparkSession, dir: String): DataFrame = {
    val fixture = Seq(
      "src/test/resources/warc", "/root/repo/src/test/resources/warc")
      .map(new java.io.File(_)).find(_.exists())
      .getOrElse(sys.error("warc fixture dir not found")).getAbsolutePath
    graft.sources.Warc.read(spark, fixture)
      .select(col("record_id"), col("warc_type"), col("target_uri"),
        col("warc_date"), col("content_length"), col("http_status"),
        col("http_content_type"),
        md5(col("body")).as("body_md5"),
        length(col("body")).cast("long").as("body_bytes"))
      .orderBy("record_id")
  }

  /** q137's gzip segment ingested through [[graft.sources.Warc.readSplit]]
    * — the single-giant-segment parallel path: verified gzip-member split
    * discovery cuts the file into ranges, each task decodes whole members
    * through a byte-limited stream, and the union of ranges is
    * record-identical to the sequential read. Same full oracle as q137
    * restricted to the segment's records, so the split path is proven
    * end-to-end by the gate, not just the spec. */
  def q147WarcSplitIngest(spark: SparkSession, dir: String): DataFrame = {
    val fixture = Seq(
      "src/test/resources/warc", "/root/repo/src/test/resources/warc")
      .map(new java.io.File(_)).find(_.exists())
      .getOrElse(sys.error("warc fixture dir not found"))
    val seg = new java.io.File(fixture, "sample_b.warc.gz").getAbsolutePath
    graft.sources.Warc.readSplit(spark, seg, splits = 3)
      .select(col("record_id"), col("warc_type"), col("target_uri"),
        col("warc_date"), col("content_length"), col("http_status"),
        col("http_content_type"),
        md5(col("body")).as("body_md5"),
        length(col("body")).cast("long").as("body_bytes"))
      .orderBy("record_id")
  }

  /** keep= with prefix wildcards + rename= (SasOptions). */
  def q01SasKeepRename(spark: SparkSession, dir: String): DataFrame =
    SasOptions.apply(
      t(spark, dir, "lineitem"),
      keep = Some("l_orderkey l_linenumber l_ship: l_ret: l_quantity"),
      rename = Some("l_quantity=qty")
    ).orderBy("l_orderkey", "l_linenumber")

  /** drop= wildcard + SAS where= clause compiled to a pushed-down predicate. */
  def q02SasDropWhere(spark: SparkSession, dir: String): DataFrame =
    SasOptions.apply(
      t(spark, dir, "lineitem"),
      drop = Some("l_part: l_supp: l_tax l_linestatus"),
      where = Some("l_quantity between 30 and 40 and l_returnflag ne 'N' and l_discount gt 0.05")
    ).orderBy("l_orderkey", "l_linenumber")

  /** obs=N on an ordered view (deterministic limit → TakeOrderedAndProject). */
  def q03SasObs(spark: SparkSession, dir: String): DataFrame =
    SasOptions.apply(
      t(spark, dir, "orders").orderBy("o_orderkey"),
      obs = Some(100L)
    ).orderBy("o_orderkey")

  /** fix_missing: special SAS missings (.A etc.) → NULL through a CSV hop. */
  def q04FixMissing(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    // simulate a SAS extract where every 10th customer has special-missing acctbal
    val sasCsv = cust.select(
      col("c_custkey"),
      col("c_name"),
      when(col("c_custkey") % 10 === 0, lit(".A"))
        .otherwise(col("c_acctbal").cast(StringType)).as("c_acctbal")
    )
    val out = tempDir("q04") + "/csv"
    CsvSink.write(sasCsv, out)
    val schema = StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    SasCsvReader.read(spark, out, schema, fixMissing = true).orderBy("c_custkey")
  }

  /** col_types override: PG type names → casts (SasTypes vocabulary). */
  def q05ColTypes(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag")
    val colTypes = Map("l_orderkey" -> "integer", "l_linenumber" -> "bigint", "l_shipdate" -> "date")
    val cast = li.columns.map { c =>
      colTypes.get(c).map(pg => col(c).cast(SasTypes.sparkType(pg)).as(c)).getOrElse(col(c))
    }
    li.select(cast.toIndexedSeq: _*).orderBy("l_orderkey", "l_linenumber")
  }

  /** gzipped-CSV sink → typed re-read roundtrip. */
  def q06CsvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "customer")
    val out = tempDir("q06") + "/csv"
    CsvSink.write(cust, out)
    SasCsvReader.read(spark, out, cust.schema).orderBy("c_custkey")
  }

  /** parquet sink with last_modified stamp; data round-trips. */
  def q07ParquetModified(spark: SparkSession, dir: String): DataFrame = {
    val sup = t(spark, dir, "supplier")
    val out = tempDir("q07") + "/pq"
    ParquetSink.write(sup, out, "Last modified: 03/01/2024 10:00:00")
    require(ParquetSink.getModified(spark, out) == "Last modified: 03/01/2024 10:00:00")
    spark.read.parquet(out).orderBy("s_suppkey")
  }

  /** PROC-CONTENTS-style metadata → inferred schema drives an untyped CSV read. */
  def q08TypeInference(spark: SparkSession, dir: String): DataFrame = {
    val ord = t(spark, dir, "orders")
    val out = tempDir("q08") + "/csv"
    CsvSink.write(ord.select(
      col("o_orderkey").cast(StringType),
      col("o_custkey").cast(StringType),
      col("o_orderstatus"),
      col("o_totalprice").cast(StringType),
      date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate")
    ), out)
    val meta = Seq(
      SasTypes.ContentsRow("o_orderkey", 1, "", formatl = 8),
      SasTypes.ContentsRow("o_custkey", 1, "", formatl = 8),
      SasTypes.ContentsRow("o_orderstatus", 2),
      SasTypes.ContentsRow("o_totalprice", 1, "", formatl = 12, formatd = 2),
      SasTypes.ContentsRow("o_orderdate", 1, "DATETIME20."))
    val schema = SasTypes.inferSchema(meta, colTypes = Map("o_orderkey" -> "bigint", "o_custkey" -> "bigint"))
    SasCsvReader.read(spark, out, schema).orderBy("o_orderkey")
  }

  /** get_wrds_tables analog: enumerate the library's tables. */
  def q09ListTables(spark: SparkSession, dir: String): DataFrame =
    Catalog.listTables(spark, dir).orderBy("table_name")

}
