package graft

import graft.operators.Classifier
import org.scalatest.funsuite.AnyFunSuite

class ClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def labeled(rows: (Long, String, Boolean)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "label")
  }

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("nbScore: hand-computed add-half log-odds weights, prior, OOV") {
    // pos tokens: good×2; neg: bad×1 → V=2, Np=2, Nn=1, prior ln(1/1)=0
    // w(good) = ln(5/7) − ln(1/5) = ln(25/7)  ≈  1.272966
    // w(bad)  = ln(1/7) − ln(3/5) = ln(5/21)  ≈ −1.435085
    // w(oov)  = ln(1/7) − ln(1/5) = ln(5/7)   ≈ −0.336472
    val train = labeled((100L, "good good", true), (101L, "bad", false))
    val out = Classifier.nbScore(
      docs(1L -> "good", 2L -> "good bad", 3L -> "zzz"),
      train, "doc_id", "text", "label")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(2) == 1.272966 && out(0).getInt(3) == 1)
    assert(out(1).getDouble(2) == -0.162119 && out(1).getInt(3) == 0)
    assert(out(2).getDouble(2) == -0.336472 && out(2).getInt(3) == 0)
    assert(out.map(_.getLong(1)).toSeq == Seq(1L, 2L, 1L))
  }

  test("nbScore: prior shifts scores by the log doc-count ratio") {
    // same token counts per class, 3:1 positive doc majority → prior ln 3
    val train = labeled(
      (1L, "x", true), (2L, "x", true), (3L, "x", true), (4L, "x", false))
    val out = Classifier.nbScore(docs(10L -> "q"), train, "doc_id", "text", "label")
      .collect()
    // w_oov = ln(1/(2·3+1+1)) − ln(1/(2·1+1+1)) = ln(4/8) = −ln 2 ≈ −0.693147
    // score = ln 3 − ln 2 ≈ 1.098612 − 0.693147
    assert(out(0).getDouble(2) == 0.405465 && out(0).getInt(3) == 1)
  }

  test("nbScore: separable vocabularies classify held-out docs correctly") {
    val train = labeled(
      (1L to 10L).map(i => (i, s"alpha beta gamma t$i", true)) ++
        (11L to 20L).map(i => (i, s"rojo verde azul t$i", false)): _*)
    val out = Classifier.nbScore(
      docs(100L -> "alpha gamma beta beta", 101L -> "verde rojo azul verde",
        102L -> "alpha rojo"), // one token each side + equal priors → tie to neg
      train, "doc_id", "text", "label")
      .orderBy("doc_id").collect()
    assert(out(0).getInt(3) == 1)
    assert(out(1).getInt(3) == 0)
    // symmetric token counts cancel exactly: score is bit-zero → pred 0
    assert(out(2).getDouble(2) == 0.0 && out(2).getInt(3) == 0)
  }
}
