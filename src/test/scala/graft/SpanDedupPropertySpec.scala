package graft

import graft.operators.SpanDedup
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz: SpanDedup vs an independent plain-Scala model over
  * seeded random texts with planted cross-doc and within-doc repeats —
  * small alphabets force natural window collisions too, so the model must
  * agree on organically-duplicated spans, not just the planted ones. */
class SpanDedupPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rng = new scala.util.Random(20260813L)

  /** Random corpus over a 6-char alphabet: short docs, shared blocks
    * planted between random doc pairs, blocks re-planted inside one doc. */
  private def corpus(n: Int): Seq[(Long, String)] = {
    def rand(len: Int) = Seq.fill(len)(('a' + rng.nextInt(6)).toChar).mkString
    val base = (0L until n).map(i => i -> rand(12 + rng.nextInt(30))).toMap
    val planted = (1 to n / 3).foldLeft(base) { (acc, _) =>
      val block = rand(8 + rng.nextInt(8))
      val (x, y) = (rng.nextInt(n).toLong, rng.nextInt(n).toLong)
      acc + (x -> (acc(x) + block)) + (y -> (block + acc(y)))
    }
    planted.toSeq.sortBy(_._1)
  }

  /** The model: enumerate every l-window at stride s, group by text. */
  private def modelSites(
      docs: Seq[(Long, String)], l: Int, s: Int): Map[String, Seq[(Long, Int)]] =
    docs.flatMap { case (id, t) =>
      (1 to t.length - l + 1 by s).map(p => (t.substring(p - 1, p - 1 + l), (id, p)))
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("dupSpanStats fuzz: per-doc counts match the model on 120 docs") {
    val docs = corpus(120)
    for ((l, s) <- Seq((6, 1), (5, 2))) {
      val model = modelSites(docs, l, s)
      val expected = docs.map { case (id, _) =>
        id -> model.valuesIterator
          .filter(_.size > 1).flatten.count(_._1 == id).toLong
      }.toMap
      val got = SpanDedup.dupSpanStats(docs.toDF("doc_id", "text"), "doc_id", "text", l, s)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"l=$l s=$s")
    }
  }

  test("stripDupSpans fuzz: survivors match the model's first-site policy") {
    val docs = corpus(120)
    val l = 6
    val model = modelSites(docs, l, 1)
    // model: every non-first site (ordered by id, then pos) of a duplicated
    // window marks [pos, pos+l) for removal; merged ranges cut per doc
    val cuts: Map[Long, Seq[Int]] = model.valuesIterator
      .filter(_.size > 1)
      .flatMap(_.sortBy(identity).drop(1))
      .toSeq.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val expected = docs.map { case (id, t) =>
      val marked = Array.fill(t.length)(false)
      cuts.getOrElse(id, Nil).foreach(p =>
        (p - 1 until math.min(p - 1 + l, t.length)).foreach(marked(_) = true))
      id -> t.zipWithIndex.collect { case (c, i) if !marked(i) => c }.mkString
    }.toMap
    val got = SpanDedup.stripDupSpans(docs.toDF("doc_id", "text"), "doc_id", "text", l, 1)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(got === expected)
  }

  test("winnow-gated fuzz: stats and strip equal the ungated pass across (l, k)") {
    // 6-char alphabet + planted blocks + organic collisions — exactly the
    // corpus where a LOSSY gate would slip: the gate must be a superset
    // filter, so gated output === ungated output for every (l, k) shape.
    val docs = corpus(120)
    val df = docs.toDF("doc_id", "text")
    for ((l, k) <- Seq((6, 3), (6, 5), (8, 4), (10, 8))) {
      val stats = SpanDedup.dupSpanStats(df, "doc_id", "text", l, 1)
        .as[(Long, Long)].collect().toMap
      val statsG = SpanDedup.dupSpanStatsWinnowed(df, "doc_id", "text", l, k)
        .as[(Long, Long)].collect().toMap
      assert(statsG === stats, s"stats l=$l k=$k")
      val strip = SpanDedup.stripDupSpans(df, "doc_id", "text", l, 1)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      val stripG = SpanDedup.stripDupSpansWinnowed(df, "doc_id", "text", l, k)
        .select("doc_id", "text").as[(Long, String)].collect().toMap
      assert(stripG === strip, s"strip l=$l k=$k")
    }
  }
}
