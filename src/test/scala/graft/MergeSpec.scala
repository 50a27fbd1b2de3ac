package graft

import graft.operators.Merge
import org.scalatest.funsuite.AnyFunSuite

class MergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("upsert: update wins by version, inserts land, tombstones delete") {
    val s = spark
    import s.implicits._
    val snap = Seq(
      (1L, "a", 1L, false),
      (2L, "b", 1L, false),
      (3L, "c", 1L, false)
    ).toDF("k", "v", "version", "deleted")
    val changes = Seq(
      (2L, "b2", 2L, false), // update
      (3L, "c", 2L, true),   // delete
      (4L, "d", 2L, false)   // insert
    ).toDF("k", "v", "version", "deleted")
    val out = Merge.upsert(snap, changes, Seq("k"), "version", Some("deleted"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "a", 1L), (2L, "b2", 2L), (4L, "d", 2L)))
  }

  test("upsert: a stale changeset row loses to the snapshot's newer version") {
    val s = spark
    import s.implicits._
    val snap = Seq((1L, "fresh", 5L)).toDF("k", "v", "version")
    val late = Seq((1L, "stale", 3L)).toDF("k", "v", "version")
    val out = Merge.upsert(snap, late, Seq("k"), "version")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, "fresh", 5L)))
  }

  test("upsert fuzz: matches a per-key Scala fold over random change streams") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11L)
    val snap = (1L to 200L).map(k => (k, s"s$k", 1L, false))
    val changes = (1 to 300).map { i =>
      val k = 1L + rnd.nextInt(250) // some keys are pure inserts
      (k, s"c$i", 2L + rnd.nextInt(5), rnd.nextInt(10) == 0)
    }
    // model: highest (version, v-string) wins per key — the same total
    // order the struct-max uses, so ties resolve identically
    val model = (snap ++ changes).groupBy(_._1).view
      .mapValues(_.maxBy(r => (r._3, r._2))).toMap
      .values.filterNot(_._4).map(r => (r._1, r._2, r._3)).toSet
    val out = Merge.upsert(
        snap.toDF("k", "v", "version", "deleted"),
        changes.toDF("k", "v", "version", "deleted"),
        Seq("k"), "version", Some("deleted"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == model)
  }
}
