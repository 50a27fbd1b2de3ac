package graft

import graft.multimodal.Binary
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BinarySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("perceptual banding returns EXACTLY the brute-force hamming<=3 pairs") {
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    val p = Binary.withPayload(docs, "text")
    val sigs = Binary.aHashes(spark, p, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).filter(_._2 != 0L)
    val brute = (for {
      (a, ha) <- sigs; (b, hb) <- sigs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (a, b)).toSet
    val banded = Binary.perceptualNearDups(spark, p, "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(banded == brute, "pigeonhole banding must be exact for hamming <= 3")
  }

  test("a 1-byte perturbation stays a near-dup; short payloads never pair") {
    val s = spark
    import s.implicits._
    val base = ("w" * 300) + (1 to 60).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      1L -> base,
      2L -> (base.dropRight(1) + "x"), // perceptually same
      3L -> (1 to 80).map(i => s"zz$i").mkString(" "), // unrelated
      4L -> "tiny", 5L -> "tiny" // short → 0-sentinel, must not self-pair
    ).toDF("doc_id", "text")
    val pairs = Binary.perceptualNearDups(
        spark, Binary.withPayload(corpus, "text"), "doc_id", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "perturbed copy must be recovered")
    assert(!pairs.exists(p => p._1 >= 4L || p._2 >= 4L),
      "short-payload sentinels must never pair")
  }
}
