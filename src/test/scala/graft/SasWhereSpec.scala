package graft

import graft.sources.SasWhere
import org.scalatest.funsuite.AnyFunSuite

class SasWhereSpec extends AnyFunSuite {

  test("date and datetime literals: 'ddMONyyyy'd / '...'dt forms") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-01-01"), java.sql.Timestamp.valueOf("2024-01-01 09:00:00")),
      (2L, java.sql.Date.valueOf("2024-06-15"), java.sql.Timestamp.valueOf("2024-06-15 12:30:00")),
      (3L, java.sql.Date.valueOf("2025-01-01"), java.sql.Timestamp.valueOf("2025-01-01 00:00:00"))
    ).toDF("id", "d", "ts")
    def ids(w: String) =
      df.filter(SasWhere.compile(w)).select(col("id")).as[Long].collect().toSet
    assert(ids("d ge '15JUN2024'd") === Set(2L, 3L))
    assert(ids("d between '01jan2024'd and '31DEC2024'd") === Set(1L, 2L))
    assert(ids("ts gt '01JAN2024:10:00:00'dt") === Set(2L, 3L))
    assert(ids("d in ('01JAN2024'd, '01JAN2025'd)") === Set(1L, 3L))
    // SAS accepts single-digit days and any case — no fixed-position slicing
    assert(ids("d ge '1jan2025'd") === Set(3L))
    assert(ids("d lt '5Jan2024'd") === Set(1L))
    assert(ids("ts gt '1JAN2024:10:00:00'dt") === Set(2L, 3L))
    val bad = intercept[IllegalArgumentException] { ids("d ge 'JAN2024'd") }
    assert(bad.getMessage.contains("bad SAS date literal"))
    val badDt = intercept[IllegalArgumentException] { ids("ts gt '99JAN2024:10:00:00'dt") }
    assert(badDt.getMessage.contains("bad SAS datetime literal"))
  }
  private lazy val spark = TestSpark.spark

  private def df = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, 10.0, "R", Some("alpha beta")),
      (2L, 20.0, "N", Some("gamma")),
      (3L, 30.0, "A", None),
      (4L, 40.0, "R", Some("beta")),
      (5L, 50.0, "N", Some("delta"))
    ).toDF("id", "qty", "flag", "txt")
  }

  private def ids(where: String): Seq[Long] =
    df.filter(SasWhere.compile(where)).select("id").collect().map(_.getLong(0)).toSeq.sorted

  test("word comparison ops: eq ne gt lt ge le")(
    assert(ids("qty ge 30 and flag ne 'N'") == Seq(3L, 4L)))

  test("symbol ops incl. SAS ^= and <>")(
    assert(ids("qty >= 20 and flag ^= 'R' and flag <> 'A'") == Seq(2L, 5L)))

  test("in-list with numbers and strings") {
    assert(ids("id in (1, 3, 5)") == Seq(1L, 3L, 5L))
    assert(ids("flag in ('R')") == Seq(1L, 4L))
    assert(ids("id not in (1, 3, 5)") == Seq(2L, 4L))
  }

  test("between-and")(assert(ids("qty between 20 and 40") == Seq(2L, 3L, 4L)))

  test("contains and like") {
    assert(ids("txt contains 'beta'") == Seq(1L, 4L))
    assert(ids("txt like 'g%'") == Seq(2L))
  }

  test("is missing / is null / missing() / not") {
    assert(ids("txt is missing") == Seq(3L))
    assert(ids("txt is not null") == Seq(1L, 2L, 4L, 5L))
    assert(ids("missing(txt)") == Seq(3L))
    assert(ids("not (txt is missing)") == Seq(1L, 2L, 4L, 5L))
  }

  test("and/or precedence with parentheses") {
    assert(ids("flag = 'R' or flag = 'N' and qty > 30") == Seq(1L, 4L, 5L))
    assert(ids("(flag = 'R' or flag = 'N') and qty > 30") == Seq(4L, 5L))
  }

  test("arithmetic in predicates")(
    assert(ids("qty * 2 + 5 > 65") == Seq(4L, 5L)))

  test("quoted string escapes (doubled quotes)")(
    assert(ids("txt = 'alpha beta' or txt = 'it''s'") == Seq(1L)))

  test("reference docstring example shape: where with dates as strings") {
    // SAS where= snippets routinely compare against literals; reference
    // forwards them verbatim (codegen.py:62-65)
    assert(ids("qty gt 10 and qty lt 50 and not missing(txt)") == Seq(2L, 4L))
  }
}
