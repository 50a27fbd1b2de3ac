package graft

import graft.core.Tables
import graft.sinks.{CsvSink, ParquetSink}
import graft.sources.{Catalog, SasCsvReader, SasOptions, SasTypes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Driver contract — see /root/repo/SURVEY.md §2 (one queries entry per
  * inventory row) and §6 (aliasing + ordering rules). */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.q10AggPricing(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  def oracleSql: Map[String, String] = Queries.oracles
}

/** §2 operator inventory implementations. Every query orders its output
  * deterministically and aliases computed columns identically to its oracle. */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  private def tempDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  // ---------------------------------------------------------------- §2.1

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

  // ---------------------------------------------------------------- §2.2

  /** TPC-H Q1-shaped pricing summary (map-side partial agg → one shuffle). */
  def q10AggPricing(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 6).as("avg_qty"),
        round(avg("l_discount"), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- registry

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_sas_keep_rename" -> q01SasKeepRename _,
    "q02_sas_drop_where" -> q02SasDropWhere _,
    "q03_sas_obs" -> q03SasObs _,
    "q04_fix_missing" -> q04FixMissing _,
    "q05_col_types" -> q05ColTypes _,
    "q06_csv_roundtrip" -> q06CsvRoundtrip _,
    "q07_parquet_modified" -> q07ParquetModified _,
    "q08_type_inference" -> q08TypeInference _,
    "q09_list_tables" -> q09ListTables _,
    "q10_agg_pricing" -> q10AggPricing _
  )

  val oracles: Map[String, String] = Map(
    "q01_sas_keep_rename" ->
      """SELECT l_orderkey, l_linenumber, l_quantity AS qty, l_returnflag, l_shipdate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q02_sas_drop_where" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_returnflag, l_shipdate
        |FROM lineitem
        |WHERE l_quantity BETWEEN 30 AND 40 AND l_returnflag <> 'N' AND l_discount > 0.05
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q03_sas_obs" ->
      "SELECT * FROM orders ORDER BY o_orderkey LIMIT 100",
    "q04_fix_missing" ->
      """SELECT c_custkey, c_name,
        |       CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q05_col_types" ->
      """SELECT CAST(l_orderkey AS INTEGER) AS l_orderkey,
        |       CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |       CAST(l_shipdate AS DATE) AS l_shipdate,
        |       l_returnflag
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_csv_roundtrip" ->
      "SELECT * FROM customer ORDER BY c_custkey",
    "q07_parquet_modified" ->
      "SELECT * FROM supplier ORDER BY s_suppkey",
    "q08_type_inference" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q09_list_tables" ->
      """SELECT * FROM (VALUES ('customer'),('documents'),('embeddings'),('events'),('lineitem'),
        |('nation'),('orders'),('part'),('region'),('supplier')) AS t(table_name)
        |ORDER BY table_name""".stripMargin,
    "q10_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS sum_qty,
        |       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
        |       ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS sum_disc_price,
        |       ROUND(AVG(l_quantity), 6) AS avg_qty,
        |       ROUND(AVG(l_discount), 6) AS avg_disc,
        |       COUNT(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
