package graft

import graft.sources.SasOptions
import org.scalatest.funsuite.AnyFunSuite

class SasOptionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import SasOptions._

  private def df = {
    val s = spark
    import s.implicits._
    Seq((1L, "a", 2.0, "x"), (2L, "b", 3.0, "y"))
      .toDF("usdval", "name", "usdcnt", "match_score")
  }

  test("parseVarList: exact + prefix wildcard") {
    val ms = parseVarList("usdval usdcnt match: closest:")
    assert(ms == Seq(Exact("usdval"), Exact("usdcnt"), Prefix("match"), Prefix("closest")))
    assert(ms.exists(_.matches("MATCH_fwd")))
    assert(!ms.exists(_.matches("usd")))
  }

  test("drop with wildcards (reference example: drop='match: closest: prior:')") {
    val out = drop(df, "usdval usdcnt match:")
    assert(out.columns.toSeq == Seq("name"))
  }

  test("keep preserves original column order") {
    val out = keep(df, "match: usdval")
    assert(out.columns.toSeq == Seq("usdval", "match_score"))
  }

  test("rename pairs with loose whitespace (reference: rename='fee=mgt_fee')") {
    assert(parseRename("fee=mgt_fee  a =  b") == Seq(("fee", "mgt_fee"), ("a", "b")))
    val out = rename(df, "name=label usdval = value")
    assert(out.columns.toSeq == Seq("value", "label", "usdcnt", "match_score"))
  }

  test("apply: drop/keep before rename, then where + obs") {
    val out = SasOptions.apply(df,
      keep = Some("usdval name"),
      rename = Some("usdval=v"),
      where = Some("v ge 2"),
      obs = Some(1L))
    assert(out.columns.toSeq == Seq("v", "name"))
    assert(out.count() == 1)
  }
}
