package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extract: options + colTypes compose like reference dataset options") {
    val df = Seq(
      (1L, 10.0, "A", "keep"),
      (2L, 55.0, "B", "keep"),
      (3L, 90.0, "A", "keep")
    ).toDF("permno", "prc", "exch", "junk_col")
    val out = Graft.extract(df,
      drop = Some("junk:"),
      rename = Some("prc=price"),
      where = Some("price ge 20 and exch eq 'A'"),
      colTypes = Map("permno" -> "integer"))
    assert(out.columns.toSeq === Seq("permno", "price", "exch"))
    assert(out.schema("permno").dataType.typeName === "integer")
    assert(out.select("permno").as[Int].collect().toSeq === Seq(3))
  }

  test("extract: where references post-rename names, obs limits") {
    val df = (1L to 100L).map(i => (i, i * 2.0)).toDF("k", "v")
    val out = Graft.extract(df, obs = Some(7L))
    assert(out.count() === 7)
  }

  test("listTables and splitSqlFile delegate correctly") {
    assert(Graft.listTables(spark, "/root/testdata/sf0.001").count() === 10)
    assert(Graft.splitSqlFile("CREATE TABLE a (x int);\nDROP TABLE b; ;") ===
      Seq("CREATE TABLE a (x int)", "DROP TABLE b"))
  }
}
