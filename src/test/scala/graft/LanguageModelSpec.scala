package graft

import graft.operators.LanguageModel
import org.scalatest.funsuite.AnyFunSuite

class LanguageModelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("perplexity: hand-computed add-half bigram probabilities") {
    // ref tokens a b a c → V=3; bigrams (a,b),(b,a),(a,c) each once;
    // contexts c1(a)=2, c1(b)=1
    val ref = docs(100L -> "a b a c")
    val out = LanguageModel.perplexity(
      docs(1L -> "a b", 2L -> "z z"), ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    // doc 1: p(b|a) = (2·1+1)/(2·2+3+1) = 3/8 → ce = ln(8/3) ≈ 0.980829
    assert(out(0).getLong(1) == 1L)
    assert(out(0).getDouble(2) == 0.980829)
    assert(out(0).getDouble(3) == 2.6667) // exp(ce) = 8/3
    // doc 2: both tokens OOV → p = 1/(V+1) = 1/4 → ce = ln 4, ppl = 4
    assert(out(1).getDouble(2) == 1.386294)
    assert(out(1).getDouble(3) == 4.0)
  }

  test("perplexity: docs under two tokens are absent; ref incl. short docs in V") {
    val ref = docs(100L -> "a b", 101L -> "q") // q counts in V, no bigram
    val out = LanguageModel.perplexity(
      docs(1L -> "solo", 2L -> "a b"), ref, "doc_id", "text")
      .collect()
    assert(out.map(_.getLong(0)).toSet == Set(2L))
    // V=3: p(b|a) = (2·1+1)/(2·1+3+1) = 3/6 → ce = ln 2
    assert(out(0).getDouble(2) == 0.693147)
  }

  test("perplexity: in-domain text scores below out-of-domain") {
    val ref = docs((0L until 20L).map(i =>
      i -> s"the cat sat on the mat and the dog ran off item$i"): _*)
    val out = LanguageModel.perplexity(
      docs(1L -> "the cat sat on the mat", 2L -> "zorp blik quux narg flib zim"),
      ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out(0).getDouble(3) < out(1).getDouble(3))
  }

  test("perplexity: hashKeys joins 8-byte keys, identical output") {
    val corpus = docs((1L until 40L).map(i =>
      i -> s"w${i % 7} w${(i * 3) % 11} w${(i * 5) % 13} w${i % 7} tail$i"): _*)
    val ref = docs((1L until 25L).map(i =>
      (100 + i) -> s"w${i % 7} w${(i * 3) % 11} w${(i * 2) % 13}"): _*)
    val plain = LanguageModel.perplexity(corpus, ref, "doc_id", "text")
      .orderBy("doc_id").collect()
    val hashed = LanguageModel.perplexity(corpus, ref, "doc_id", "text", hashKeys = true)
      .orderBy("doc_id").collect()
    assert(plain.toSeq == hashed.toSeq)
  }
}
