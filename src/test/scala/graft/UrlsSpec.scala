package graft

import graft.operators.Urls
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def canon(urls: String*): Seq[String] = {
    val s = spark
    import s.implicits._
    urls.toDF("url").select(Urls.canonicalize(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
  }

  test("canonicalize: case, www, fragment, trailing slash, utm params") {
    assert(canon("HTTPS://WWW.Ex.COM/a/b/?x=1#frag") == Seq("https://ex.com/a/b?x=1"))
    assert(canon("http://ex.com/a") == Seq("http://ex.com/a"))
    // only the LEADING www. is stripped — a www elsewhere is content
    assert(canon("https://www.www2.ex.com/p") == Seq("https://www2.ex.com/p"))
    // utm-only query: the '?' goes too
    assert(canon("https://ex.com/p?utm_source=feed") == Seq("https://ex.com/p"))
    // back-to-back tracking params both go (regex-iteration canonicalizers miss this)
    assert(canon("https://ex.com/p?utm_a=1&utm_b=2&x=3&utm_c=4") == Seq("https://ex.com/p?x=3"))
    // surviving param order preserved
    assert(canon("https://ex.com/p?b=2&utm_x=0&a=1") == Seq("https://ex.com/p?b=2&a=1"))
    // no path, no query
    assert(canon("HTTPS://EX.com#top") == Seq("https://ex.com"))
  }

  test("dedupByUrl keeps min id per canonical form with counts") {
    val s = spark
    import s.implicits._
    val crawl = Seq(
      (10L, "https://ex.com/p?x=1"),
      (3L, "HTTPS://WWW.EX.COM/p/?x=1#f"),
      (7L, "https://ex.com/p?utm_s=1&x=1"),
      (5L, "https://ex.com/q")).toDF("doc_id", "url")
    val out = Urls.dedupByUrl(crawl, "doc_id", "url")
      .orderBy("canon_url").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "https://ex.com/p?x=1")
    assert(out(0).getLong(1) == 3L && out(0).getLong(2) == 3L)
    assert(out(1).getString(0) == "https://ex.com/q")
    assert(out(1).getLong(1) == 5L && out(1).getLong(2) == 1L)
  }
}
