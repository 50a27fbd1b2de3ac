package graft

import graft.sources.SasTypes
import graft.sources.SasTypes.ContentsRow
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SasTypesSpec extends AnyFunSuite {

  test("character type wins over everything (type=2 → text)") {
    assert(SasTypes.pgType(ContentsRow("s", 2, "DATETIME20.")) == "text")
  }

  test("datetime/time/date format detection, same precedence as reference") {
    assert(SasTypes.pgType(ContentsRow("x", 1, "DATETIME20.")) == "timestamp")
    assert(SasTypes.pgType(ContentsRow("x", 1, "E8601DT19.")) == "float8") // no 'datetime' in name
    assert(SasTypes.pgType(ContentsRow("x", 1, "TIME8.")) == "time")
    assert(SasTypes.pgType(ContentsRow("x", 1, "TOD")) == "time")
    assert(SasTypes.pgType(ContentsRow("x", 1, "YYMMDD10.")) == "date")
    assert(SasTypes.pgType(ContentsRow("x", 1, "MMDDYY10.")) == "date")
    assert(SasTypes.pgType(ContentsRow("x", 1, "DATE9.")) == "date")
  }

  test("numeric heuristics: BEST→float8, formatd≠0→float8, formatl≠0→integer, bare→float8") {
    assert(SasTypes.pgType(ContentsRow("x", 1, "BEST")) == "float8")
    assert(SasTypes.pgType(ContentsRow("x", 1, "", formatl = 8, formatd = 2)) == "float8")
    assert(SasTypes.pgType(ContentsRow("x", 1, "", formatl = 8, formatd = 0)) == "integer")
    assert(SasTypes.pgType(ContentsRow("x", 1, "")) == "float8")
  }

  test("sparkType mapping incl. length-suffix strip and aliases") {
    assert(SasTypes.sparkType("text") == StringType)
    assert(SasTypes.sparkType("varchar(255)") == StringType)
    assert(SasTypes.sparkType("integer") == IntegerType)
    assert(SasTypes.sparkType("bigint") == LongType)
    assert(SasTypes.sparkType("float8") == DoubleType)
    assert(SasTypes.sparkType("date") == DateType)
    assert(SasTypes.sparkType("time") == StringType) // reference maps time→string too
    assert(SasTypes.sparkType("timestamp") == TimestampType)
  }

  test("inferSchema lowercases names and honors col_types overrides (overrides win)") {
    val rows = Seq(
      ContentsRow("PERMNO", 1, "", formatl = 8),
      ContentsRow("Price", 1, "", formatl = 8, formatd = 2),
      ContentsRow("date", 1, "YYMMDD10.")
    )
    val st = SasTypes.inferSchema(rows, Map("PERMNO" -> "bigint"))
    assert(st == StructType(Seq(
      StructField("permno", LongType),
      StructField("price", DoubleType),
      StructField("date", DateType))))
  }
}
