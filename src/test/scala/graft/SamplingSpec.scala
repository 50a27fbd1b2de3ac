package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("split proportions approximate 80/10/10 and cover every row") {
    val out = Sampling.deterministicSplit(ids(10000), "id", 80, 10)
      .groupBy("split").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 10000L)
    assert(out("train") > 7800 && out("train") < 8200, out.toString)
    assert(out("val") > 800 && out("val") < 1200, out.toString)
    assert(out("test") > 800 && out("test") < 1200, out.toString)
  }

  test("assignment is stable under repartitioning (rand-sample is not)") {
    val base = Sampling.deterministicSplit(ids(2000), "id", 80, 10)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val shuffled = Sampling.deterministicSplit(ids(2000).repartition(7), "id", 80, 10)
      .select("id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(base == shuffled)
  }

  test("hashSample keeps a stable subset consistent with its fraction") {
    val kept = Sampling.hashSample(ids(10000), "id", 1, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept.size > 800 && kept.size < 1200, kept.size.toString)
    // idempotent: sampling again keeps exactly the same rows
    val again = Sampling.hashSample(ids(10000), "id", 1, 10)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == again)
  }

  test("GlobalIndex equals a single-partition row_number, without one") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1L to 5000L).map(i => ((i * 2654435761L) % 9973, i)).toDF("v", "id")
      .repartition(7)
    val got = graft.operators.GlobalIndex.withRowNumbers(df, Seq("v", "id"), "rn")
    val expected = df.withColumn("rn",
      row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(got.orderBy("rn").collect().toSeq == expected.orderBy("rn").collect().toSeq)
    got.collect()
    val planStr = got.queryExecution.executedPlan.toString
    assert(!planStr.contains("SinglePartition"),
      s"global numbering must not shuffle to one partition\n$planStr")
  }

  test("withNtile edge cases: fewer rows than buckets; remainder spread") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // n=3 < k=5: rank is the bucket
    val tiny = Seq(30L, 10L, 20L).toDF("v")
    val got3 = graft.operators.GlobalIndex.withNtile(tiny, Seq("v"), 5, "b")
      .orderBy("v").collect().map(_.getInt(1)).toSeq
    assert(got3 == Seq(1, 2, 3))
    // n=10, k=4 → sizes 3,3,2,2 — must equal the built-in ntile
    val df = (1L to 10L).map(i => (i * 37 % 11, i)).toDF("v", "id").repartition(3)
    val got = graft.operators.GlobalIndex.withNtile(df, Seq("v", "id"), 4, "b")
      .orderBy("v", "id").collect().map(_.getInt(2)).toSeq
    val exp = df.withColumn("b", ntile(4).over(Window.orderBy(col("v").asc, col("id").asc)))
      .orderBy("v", "id").collect().map(_.getInt(2)).toSeq
    assert(got == exp)
  }

  test("stratifiedSample: exact per-stratum counts, stable under repartition") {
    val s = spark
    import s.implicits._
    val df = (1L to 300L).map(i => (s"s${i % 3}", i)).toDF("g", "id")
    val a = graft.operators.Sampling.stratifiedSample(df, "g", "id", 10)
    assert(a.groupBy("g").count().collect().map(_.getLong(1)).toSeq == Seq(10L, 10L, 10L))
    val b = graft.operators.Sampling.stratifiedSample(df.repartition(13), "g", "id", 10)
    assert(a.orderBy("g", "id").collect().toSeq == b.orderBy("g", "id").collect().toSeq)
    // stratum smaller than the ask → all of it, no padding
    val small = graft.operators.Sampling.stratifiedSample(
      df.where(col("id") <= 5), "g", "id", 10)
    assert(small.count() == 5)
  }

  test("GlobalIndex fuzz: rank and ntile match single-partition windows") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260812L)
    for (trial <- 1 to 6) {
      val n = 1 + rnd.nextInt(3000)
      val k = 1 + rnd.nextInt(12)
      val parts = 1 + rnd.nextInt(9)
      // duplicate-heavy order values + unique id tiebreak = total order
      val df = (1L to n.toLong).map(i => (rnd.nextInt(40).toLong, i))
        .toDF("v", "id").repartition(parts)
      val w = Window.orderBy(col("v").asc, col("id").asc)
      val gotRn = graft.operators.GlobalIndex.withRowNumbers(df, Seq("v", "id"), "rn")
        .orderBy("id").collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      val expRn = df.withColumn("rn", row_number().over(w).cast("long"))
        .orderBy("id").collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(gotRn == expRn, s"rank mismatch, trial $trial (n=$n parts=$parts)")
      val gotNt = graft.operators.GlobalIndex.withNtile(df, Seq("v", "id"), k, "b")
        .orderBy("id").collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      val expNt = df.withColumn("b", ntile(k).over(w))
        .orderBy("id").collect().map(r => r.getLong(1) -> r.getInt(2)).toMap
      assert(gotNt == expNt, s"ntile mismatch, trial $trial (n=$n k=$k parts=$parts)")
    }
  }

  test("GlobalIndex stays exact under partial boundary sampling (one shuffle, two jobs)") {
    // Force the RangePartitioner to sample only a handful of rows per input
    // partition: with the old two-execution design (count pass and emit pass
    // each re-planning the range shuffle) boundaries re-sample differently
    // per job and offsets land on the wrong partitions. The fixed design
    // materializes ONE RDD, so both jobs share one set of boundaries.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val old = s.conf.getOption(key)
    s.conf.set(key, "2")
    try {
      val rnd = new scala.util.Random(7L)
      // skewed, duplicate-heavy order values; unique id tiebreak
      val df = (1L to 60000L).map(i => (math.abs(rnd.nextGaussian() * 10).toLong, i))
        .toDF("v", "id").repartition(16)
      val got = graft.operators.GlobalIndex.withRowNumbers(df, Seq("v", "id"), "rn")
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val exp = df.withColumn("rn",
          row_number().over(Window.orderBy(col("v").asc, col("id").asc)).cast("long"))
        .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == exp)
    } finally {
      old match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }

  test("Packing.packByBudget equals a single-partition running-sum window") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(11L)
    val df = (1L to 4000L).map(i => (i, 1L + rnd.nextInt(500))).toDF("id", "w")
      .repartition(7)
    val budget = 10000L
    val got = graft.operators.Packing.packByBudget(
      df, Seq("id"), "w", budget, "cum", "shard")
      .select("id", "cum", "shard").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val w = Window.orderBy(col("id").asc).rowsBetween(Window.unboundedPreceding, 0)
    val exp = df.withColumn("cum", sum(col("w")).over(w))
      .withColumn("shard", expr(s"(cum - 1) div $budget"))
      .select("id", "cum", "shard").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == exp)
    // shards respect the budget except single over-budget rows
    val byShard = got.values.groupBy(_._2)
    byShard.foreach { case (_, rows) =>
      val tot = rows.map(_._1).max - rows.map(_._1).min
      assert(tot < budget, s"shard spans more than a budget of cum-range: $tot")
    }
  }

  test("Packing/GlobalIndex reject adversarial column names instead of clobbering") {
    val s = spark
    import s.implicits._
    // A pre-existing _pk_w would be silently replaced by withColumn and the
    // WRONG column dropped at emit — must fail loudly instead.
    val pkw = Seq((1L, 2L, 3L)).toDF("id", "w", "_pk_w")
    val e1 = intercept[IllegalArgumentException] {
      graft.operators.Packing.packByBudget(pkw, Seq("id"), "w", 10L, "cum", "shard")
    }
    assert(e1.getMessage.contains("_pk_w"))
    // Output-name collisions: duplicate columns fail only when later selected.
    val plain = Seq((1L, 2L)).toDF("id", "w")
    intercept[IllegalArgumentException] {
      graft.operators.Packing.packByBudget(plain, Seq("id"), "w", 10L, "w", "shard")
    }
    intercept[IllegalArgumentException] {
      graft.operators.GlobalIndex.withRowNumbers(plain, Seq("id"), "w")
    }
    intercept[IllegalArgumentException] {
      graft.operators.GlobalIndex.withNtile(plain, Seq("id"), 2, "id")
    }
    val scratch = Seq((1L, 2L)).toDF("id", "_gi_ntile_rn")
    intercept[IllegalArgumentException] {
      graft.operators.GlobalIndex.withNtile(scratch, Seq("id"), 2, "b")
    }
  }

  test("Packing stays exact under partial boundary sampling (shared machinery proof)") {
    // Same failure mode GlobalIndex was redesigned for: if the count and
    // emit jobs re-sampled range boundaries independently, prefix offsets
    // would land on the wrong partitions exactly at scale. Force tiny
    // boundary samples and prove the weighted variant holds too.
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    val old = s.conf.getOption(key)
    s.conf.set(key, "2")
    try {
      val rnd = new scala.util.Random(13L)
      val df = (1L to 60000L).map(i =>
          (math.abs(rnd.nextGaussian() * 10).toLong, i, 1L + rnd.nextInt(200)))
        .toDF("v", "id", "w").repartition(16)
      val got = graft.operators.Packing.packByBudget(
          df, Seq("v", "id"), "w", budget = 5000L, "cum", "shard")
        .select("id", "cum", "shard").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val w = Window.orderBy(col("v").asc, col("id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val exp = df.withColumn("cum", sum(col("w")).over(w))
        .withColumn("shard", expr("(cum - 1) div 5000"))
        .select("id", "cum", "shard").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == exp)
    } finally {
      old match { case Some(v) => s.conf.set(key, v); case None => s.conf.unset(key) }
    }
  }

  test("split column is a pure projection: no shuffle in the plan") {
    val df = Sampling.deterministicSplit(ids(100), "id", 80, 10)
    val plan = df.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, plan.toString)
  }

  test("leakageSafeSplit: near-dup groups never straddle splits; singletons match q54") {
    val s = spark
    import s.implicits._
    val base = "the quick brown fox jumps over the lazy dog by the river"
    // ids chosen so a naive per-doc split WOULD separate the pair
    val docs = (0L until 40L).map { i =>
      val text =
        if (i == 7L || i == 23L) base // exact near-dups (jaccard 1)
        else f"unique$i%02d " * 8 + f"tail$i%02d"
      (i, text)
    }.toDF("doc_id", "text")
    val out = graft.operators.Sampling.leakageSafeSplit(
      docs, "doc_id", "text", n = 3, tau = 0.6, trainPct = 80, valPct = 10)
      .as[(Long, Long, String)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out.size === 40)
    // the planted pair shares cluster AND split, keyed by the min id
    assert(out(7L) === out(23L) && out(7L)._1 === 7L)
    // singletons: cluster = own id, split identical to the per-doc split
    val perDoc = graft.operators.Sampling.deterministicSplit(
      docs.select("doc_id"), "doc_id", trainPct = 80, valPct = 10)
      .as[(Long, String)].collect().toMap
    out.foreach { case (id, (cl, sp)) =>
      if (id != 23L) { assert(cl === id); assert(sp === perDoc(id), s"doc $id") }
    }
  }

  test("shuffleShards: deterministic, dense per-shard positions, layout-stable") {
    val sp = spark
    import sp.implicits._
    val df = (1L to 500L).map(i => (i, s"d$i")).toDF("id", "v")
    val out = graft.operators.Sampling.shuffleShards(df, "id", shards = 8, seed = 42L)
    val rows = out.select("id", "shard", "pos")
      .as[(Long, Int, Int)].collect().toSeq
    assert(rows.map(_._1).sorted == (1L to 500L)) // nothing lost or duplicated
    // dense 1..n_s positions within every shard
    rows.groupBy(_._2).foreach { case (s, g) =>
      assert(g.map(_._3).sorted == (1 to g.size), s"shard $s positions not dense")
    }
    assert(rows.map(_._2).distinct.size == 8, "all shards populated")
    // a different seed produces a different order; the same seed is stable
    val again = graft.operators.Sampling.shuffleShards(
      df.repartition(7), "id", shards = 8, seed = 42L)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect().toSeq
    assert(again.toSet == rows.toSet, "repartitioning changed the shuffle")
    val other = graft.operators.Sampling.shuffleShards(df, "id", shards = 8, seed = 7L)
      .select("id", "shard", "pos").as[(Long, Int, Int)].collect().toSeq
    assert(other.toSet != rows.toSet, "seed must matter")
    // the order is actually shuffled, not id order
    val shard0 = rows.filter(_._2 == 0).sortBy(_._3).map(_._1)
    assert(shard0 != shard0.sorted, "shard read order should not be id order")
    // collision guard
    val e = intercept[IllegalArgumentException] {
      graft.operators.Sampling.shuffleShards(
        df.withColumnRenamed("v", "pos"), "id", shards = 4)
    }
    assert(e.getMessage.contains("shard/pos"))
  }

  test("weightedSample: A-ES draw matches the driver model, stable under repartition") {
    val s = spark
    import s.implicits._
    val rows = for (st <- Seq("en", "de", "fr"); i <- 1 to 40)
      yield (st, (st.hashCode.abs % 1000) * 1000L + i, (i % 5).toDouble)
    val df = rows.toDF("lang", "id", "w")
    val got = Sampling.weightedSample(df, "lang", "id", col("w"), k = 5, seed = 7L)
      .select("lang", "id", "es_key")
      .as[(String, Long, Double)].collect().toSet
    // driver model: same portable mix, same A-ES key, top-5 per stratum
    val P = 1000000007L; val A = 2654435761L
    def key(id: Long, w: Double) =
      -math.log((((id + 7L) % P) * A % P + 0.5) / P.toDouble) / w
    val want = rows.filter(_._3 > 0).groupBy(_._1).flatMap { case (_, rs) =>
      rs.map { case (st, id, w) => (st, id, key(id, w)) }
        .sortBy { case (_, id, k2) => (k2, id) }.take(5)
    }.toSet
    assert(got.map(t => (t._1, t._2)) === want.map(t => (t._1, t._2)))
    got.foreach { case (st, id, k2) =>
      val wk = want.find(w => w._1 == st && w._2 == id).get._3
      assert(math.abs(k2 - wk) < 1e-12, s"key mismatch for $st/$id")
    }
    // zero/negative weights never selected (A-ES undefined there)
    assert(!got.exists { case (_, id, _) => id % 5 == 0 })
    // partition-order independence — the defect rand()-samplers have
    val re = Sampling.weightedSample(df.repartition(7), "lang", "id", col("w"),
      k = 5, seed = 7L)
      .select("lang", "id", "es_key").as[(String, Long, Double)].collect().toSet
    assert(re === got)
    // a different seed is a different (reproducible) draw
    val other = Sampling.weightedSample(df, "lang", "id", col("w"), k = 5, seed = 8L)
      .select("lang", "id").as[(String, Long)].collect().toSet
    assert(other !== got.map(t => (t._1, t._2)))
    // heavier rows dominate: with one huge weight per stratum it is
    // always drawn (u^(1/w) -> 1 as w -> inf)
    val heavy = (rows ++ Seq(("en", 999999L, 1e12), ("de", 888888L, 1e12),
      ("fr", 777777L, 1e12))).toDF("lang", "id", "w")
    val hsel = Sampling.weightedSample(heavy, "lang", "id", col("w"), k = 5, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(Set(999999L, 888888L, 777777L).subsetOf(hsel))
  }
}
