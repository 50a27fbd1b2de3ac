package graft

import graft.operators.Importance
import org.scalatest.funsuite.AnyFunSuite

class ImportanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def docs(rows: (Long, String)*) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text")
  }

  test("dsirResample: selection enriches toward the target vocabulary") {
    // raw corpus: ids 1..40 in target vocabulary, 41..80 out of it
    val raw = docs(
      (1L to 40L).map(i => i -> s"alpha beta gamma delta u$i alpha beta") ++
        (41L to 80L).map(i => i -> s"rojo verde azul lila u$i rojo verde"): _*)
    val target = docs((100L to 119L).map(i => i -> s"alpha beta gamma delta t$i"): _*)
    val sel = Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 20)
      .collect()
    assert(sel.length == 20)
    val inVocab = sel.count(_.getLong(0) <= 40)
    assert(inVocab >= 18, s"expected >=18/20 target-vocabulary docs, got $inVocab")
    // weights really separate the populations
    val aW = sel.filter(_.getLong(0) <= 40).map(_.getDouble(2))
    val bW = sel.filter(_.getLong(0) > 40).map(_.getDouble(2))
    if (bW.nonEmpty) assert(aW.min > bW.max)
  }

  test("dsirResample: argument contract holds on the fused path; caller id type preserved") {
    val raw = docs((1L to 10L).map(i => i -> s"alpha beta u$i"): _*)
    val target = docs(100L -> "alpha beta gamma")
    // integral long id + hexChars<=6 routes to the fused scorer — the
    // requires must fire BEFORE the path split (ADVICE r13)
    intercept[IllegalArgumentException](
      Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 5, hexChars = 0))
    intercept[IllegalArgumentException](
      Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 5, hexChars = 9))
    intercept[IllegalArgumentException](
      Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 0))
    // the fused encoder widens ids to long internally; the returned schema
    // must carry the caller's declared type, same as the explode path
    val intRaw = raw.withColumn("doc_id",
      org.apache.spark.sql.functions.col("doc_id").cast("int"))
    val sel = Importance.dsirResample(intRaw, target, "doc_id", "text", sampleN = 5)
    assert(sel.schema("doc_id").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(sel.count() == 5)
  }

  test("dsirResample: identical distributions give logw 0 and pure-Gumbel order") {
    val corpus = docs((1L to 30L).map(i => i -> s"w${i % 5} w${(i * 7) % 11} end"): _*)
    val sel = Importance.dsirResample(corpus, corpus, "doc_id", "text", sampleN = 10)
      .collect()
    assert(sel.forall(_.getDouble(2) == 0.0)) // ct==cr, nt==nr → every lw6 = 0
    // selection = top-10 by the hand-computed deterministic Gumbel key
    def gumbel(id: Long): Double = {
      val u = (((id % 1000000007L) * 2654435761L % 1000000007L % 1000000L) + 0.5) / 1000000L
      val g = -math.log(-math.log(u))
      math.rint(g * 1e6) / 1e6
    }
    val expect = (1L to 30L).map(i => (i, gumbel(i)))
      .sortBy { case (id, g) => (-g, id) }.take(10).map(_._1)
    assert(sel.map(_.getLong(0)).toSeq == expect)
  }

  test("dsirResample: stable under repartitioning; n_features = uni + bi") {
    val raw = docs((1L to 25L).map(i => i -> s"a b c tail$i"): _*)
    val target = docs(200L -> "a b c")
    val once = Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 25)
      .collect()
    val again = Importance.dsirResample(
      raw.repartition(7), target, "doc_id", "text", sampleN = 25)
      .collect()
    assert(once.toSeq == again.toSeq)
    assert(once.forall(_.getLong(1) == 4 + 3)) // 4 unigrams + 3 bigrams
  }

  test("fused dsirResample equals the explode-plan reference on adversarial text") {
    val s = spark
    import s.implicits._
    // tab/newline whitespace (leading empties survive SQL trim), empty and
    // null texts, unicode, shared and doc-unique vocabulary, id gaps
    val raw = Seq(
      (1L, "alpha beta alpha"),
      (2L, "\tbeta gamma\nalpha "),
      (3L, ""),
      (4L, null: String),
      (5L, "café δ alpha"),
      (7L, "beta beta beta"),
      (9L, "solo")).toDF("doc_id", "text")
    val target = Seq(
      (100L, "alpha beta"),
      (101L, "café alpha\tgamma"),
      (102L, null: String)).toDF("doc_id", "text")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))
    val fused = Importance.dsirResample(raw, target, "doc_id", "text", sampleN = 6)
      .collect().map(key).toSeq
    val (plan, rawRows) = Importance.dsirResamplePlan(
      raw, target, "doc_id", "text", sampleN = 6)
    val ref = plan.collect().map(key).toSeq
    rawRows.unpersist()
    assert(fused == ref)
    assert(fused.nonEmpty)
  }

  test("dsirResample scoring plan: no scalar crossJoins, totals are literals") {
    val s = spark
    import s.implicits._
    val raw = (1L to 40L).map(i => i -> s"alpha beta doc$i gamma").toDF("doc_id", "text")
    val target = (1L to 10L).map(i => i -> "alpha beta gamma delta").toDF("doc_id", "text")
    // the lazy twin: the public dsirResample localCheckpoints (hiding the
    // scoring plan behind a LogicalRDD) so the cache can be released
    val (out, rawRows) = Importance.dsirResamplePlan(raw, target, "doc_id", "text", sampleN = 10)
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    rawRows.unpersist()
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "driver-materialized totals must leave no scalar crossJoin in the scoring plan")
    // exactly the two bucket-count broadcasts remain (final plan section —
    // the AQE string repeats nodes in its initial-plan dump)
    val finalPlan = plan.split("== Initial Plan", 2)(0)
    assert("BroadcastExchange".r.findAllIn(finalPlan).length == 2,
      finalPlan.linesIterator.take(8).mkString("\n"))
  }
}
