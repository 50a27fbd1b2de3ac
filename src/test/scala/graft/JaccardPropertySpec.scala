package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz for the adaptive Jaccard pair generator: across
  * randomized corpora spanning the three routing regimes — Zipfian with
  * a hot head (prefix path), uniform tiny-vocabulary sharing (tier-0
  * dense), and sparse near-unique text (tier-1 prefix, trivial mass) —
  * the routed output must equal BOTH the dense reference join and an
  * independent plain-Scala model, at every τ, on every path the limit
  * knob can force. The model recomputes exact Jaccard over true shingle
  * SETS, so it also re-derives the xxhash64-collision-free contract the
  * engine's hashed paths assume at these corpus sizes. */
class JaccardPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260815L)

  private def words(v: Int, prefix: String) = (0 until v).map(i => s"$prefix$i")

  /** One corpus per regime; each plants exact + mutated copies so every
    * τ cut lands inside a family. */
  private def corpora: Seq[(String, Seq[(Long, String)])] = {
    def doc(vocab: IndexedSeq[String], len: Int) =
      Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
    def withFamilies(base: Seq[(Long, String)], vocab: IndexedSeq[String]) = {
      val fams = base.take(8).zipWithIndex.flatMap { case ((id, t), i) =>
        val m = 1 + i % 3
        val w = t.split(" ")
        (0 until m).foreach(_ => w(rng.nextInt(w.length)) = vocab(rng.nextInt(vocab.size)))
        Seq((id + 5000L, t), (id + 6000L, w.mkString(" ")))
      }
      base ++ fams
    }
    val zipfV = words(400, "z")
    val zipf = withFamilies((0L until 40L).map { i =>
      // rank ~ i^2 sampling skews toward the head — a crude Zipf
      val t = (0 until 25).map { _ =>
        zipfV(math.min(399, (math.pow(rng.nextDouble(), 2) * 400).toInt))
      }.mkString(" ")
      (i, t)
    }, zipfV)
    val uniV = words(10, "u")
    val uniform = withFamilies(
      (0L until 50L).map(i => (i, doc(uniV, 30))), uniV)
    val sparseV = words(5000, "s")
    val sparse = withFamilies(
      (0L until 40L).map(i => (i, doc(sparseV, 20))), sparseV)
    Seq(("zipf", zipf), ("uniform", uniform), ("sparse", sparse))
  }

  /** Independent model: true shingle sets, exact pairwise Jaccard. */
  private def modelPairs(
      docs: Seq[(Long, String)], n: Int, tau: Double): Set[(Long, Long)] = {
    val sets = docs.map { case (id, t) =>
      val toks = t.trim.split("\\s+")
      id -> (if (toks.length < n) Set.empty[String]
             else toks.sliding(n).map(_.mkString(" ")).toSet)
    }.filter(_._2.nonEmpty)
    (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      inter = (sa & sb).size
      if inter > 0 && inter.toDouble / (sa.size + sb.size - inter) >= tau - 1e-12
    } yield (a, b)).toSet
  }

  test("adaptive jaccard fuzz: routed == dense reference == model, every regime, every tau, both limits") {
    corpora.foreach { case (regime, docs) =>
      val df = docs.toDF("doc_id", "text")
      val sh = Dedup.shingleHashes(df, "doc_id", "text", n = 3).cache()
      for (tau <- Seq(0.4, 0.7, 0.9, 1.0)) {
        val model = modelPairs(docs, 3, tau)
        val dense = Dedup.ngramJaccardPairsFromHashes(sh, tau)
          .select("a", "b").as[(Long, Long)].collect().toSet
        assert(dense == model, s"$regime tau=$tau: dense != model")
        // default limit (router picks), and limit 0 (forces dense tier-0
        // on hot-empty corpora, tier-1 fallback otherwise)
        for (limit <- Seq(1 << 20, 0)) {
          val routed = Dedup.ngramJaccardPairsPrefixFromHashes(sh, tau, limit)
            .select("a", "b").as[(Long, Long)].collect().toSet
          assert(routed == model, s"$regime tau=$tau limit=$limit: routed != model")
        }
      }
      assert(modelPairs(docs, 3, 0.9).nonEmpty, s"$regime plants must survive tau=0.9")
      sh.unpersist()
    }
  }
}
