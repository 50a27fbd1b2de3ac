package graft

import graft.functions.TextNorm
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TextNormSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("NFC composes, NFKC folds compatibility chars, forms match java.text.Normalizer") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "cafe\u0301",   // NFD: e + combining acute
      "caf\u00e9",     // already NFC
      "\ufb01le \u2460", // fi ligature + circled one (NFKC folds both)
      "𝄞 mixed 中文 text",
      "plain ascii")
    val df = texts.toDF("t")
    Seq("NFC", "NFD", "NFKC", "NFKD").foreach { form =>
      val got = df.select(TextNorm.unicodeNormalize(col("t"), form)).as[String].collect()
      val want = texts.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.valueOf(form)))
      assert(got.toSeq == want, form)
    }
    // the dedup motivation: NFD and NFC spellings fingerprint identically after NFC
    val fps = df.limit(2)
      .select(md5(TextNorm.unicodeNormalize(col("t")).cast("binary"))).as[String].collect()
    assert(fps(0) == fps(1), "canonically-equal spellings must share a fingerprint")
  }

  test("null passthrough and invalid form rejection") {
    val s = spark
    import s.implicits._
    val got = Seq(Option.empty[String], Some("x")).toDF("t")
      .select(TextNorm.unicodeNormalize(col("t"))).collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) == "x")
    val e = intercept[Exception] {
      Seq("x").toDF("t").select(TextNorm.unicodeNormalize(col("t"), "NFX")).collect()
    }
    assert(e.getMessage.contains("NFC|NFD|NFKC|NFKD"), e.getMessage)
  }
}
