package graft

import graft.functions.QuantileSketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val probs = Seq(0.1, 0.5, 0.9, 1.0)

  /** Driver-side lower nearest-rank quantile. */
  private def exactQ(xs: Seq[Double], p: Double): Double = {
    val s = xs.sorted
    s((math.ceil(p * s.length).toLong.max(1L) - 1).toInt)
  }

  test("exact regime: k > n certifies is_exact and equals nearest-rank quantiles") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(500)(rnd.nextDouble() * 100 - 50)
    val df = xs.toDF("x")
    def run(d: org.apache.spark.sql.DataFrame) =
      d.agg(QuantileSketch.sketch(col("x"), k = 1024, probs).as("s"))
        .select("s.n", "s.max_rank_err", "s.is_exact", "s.qs").head()
    val r = run(df)
    assert(r.getLong(0) == 500 && r.getLong(1) == 0L && r.getBoolean(2))
    val qs = r.getSeq[Double](3)
    probs.zipWithIndex.foreach { case (p, i) =>
      assert(qs(i) == exactQ(xs, p), s"p=$p")
    }
    // repartitioning only reroutes merges; the exact regime stays exact
    val r7 = run(df.repartition(7))
    assert(r7.getBoolean(2) && r7.getSeq[Double](3) == qs)
  }

  test("estimator regime: the self-certified rank bound holds and is useful") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(100000)(rnd.nextGaussian() * 10)
    val r = xs.toDF("x").repartition(16)
      .agg(QuantileSketch.sketch(col("x"), k = 256, probs).as("s"))
      .select("s.n", "s.max_rank_err", "s.is_exact", "s.qs").head()
    val n = r.getLong(0)
    val err = r.getLong(1)
    assert(n == 100000 && !r.getBoolean(2) && err > 0)
    assert(err.toDouble / n <= 0.05, s"certificate too weak to be useful: $err/$n")
    val sorted = xs.sorted
    val qs = r.getSeq[Double](3)
    probs.zipWithIndex.foreach { case (p, i) =>
      // true rank of the reported value must lie within ±err of the target
      val target = math.ceil(p * n).toLong.max(1L)
      val lo = sorted.count(_ < qs(i)).toLong + 1 // lowest rank holding the value
      val hi = sorted.count(_ <= qs(i)).toLong
      assert(lo - err <= target && target <= hi + err,
        s"p=$p reported=${qs(i)} true-rank=[$lo,$hi] target=$target err=$err")
    }
    // weight conservation: the p=1.0 answer is a real value whose true
    // rank reaches within the certificate of n — an inflated weight total
    // would stop early, a deflated one would fall off the end
    assert(qs.last <= sorted.last)
    assert(sorted.count(_ <= qs.last).toLong >= n - err,
      s"p=1.0 answer rank ${sorted.count(_ <= qs.last)} not within $err of n=$n")
  }

  test("per-group sketches, null handling, empty groups") {
    val s = spark
    import s.implicits._
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)), ("a", None),
      ("b", Some(10.0))).toDF("g", "x")
      .select(col("g"), col("x").cast("double").as("x"))
    val out = df.groupBy("g")
      .agg(QuantileSketch.sketch(col("x"), k = 16, Seq(0.5)).as("s"))
      .select(col("g"), col("s.n"), col("s.qs").getItem(0).as("q50"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out("a") == ((3L, 2.0))) // null skipped; median of 1,2,3
    assert(out("b") == ((1L, 10.0)))
    // all-null group: n = 0, quantile null
    val empty = Seq(("c", null.asInstanceOf[java.lang.Double])).toDF("g", "x")
      .groupBy("g").agg(QuantileSketch.sketch(col("x"), k = 16, Seq(0.5)).as("s"))
      .select(col("s.n"), col("s.qs").getItem(0)).head()
    assert(empty.getLong(0) == 0L && empty.isNullAt(1))
  }

  test("tail sketch: extreme quantiles certify EXACT where the KLL baseline cannot") {
    val s = spark
    import s.implicits._
    // 50k values in a deterministic shuffled order: deep estimator regime
    // for k=32 (many compactions), tails well inside t=512
    val xs = (0 until 50000).map(i => ((i.toLong * 104729) % 50000).toDouble)
    val df = xs.toDF("x").repartition(8)
    val tailProbs = Seq(0.001, 0.5, 0.999, 0.9999)
    val r = df.agg(QuantileSketch.tailSketch(col("x"), k = 32, t = 512, tailProbs).as("s"))
      .select("s.n", "s.max_rank_err", "s.qs", "s.q_exact").head()
    assert(r.getLong(0) == 50000)
    val kllErr = r.getLong(1)
    assert(kllErr > 0, "50k values through k=32 must be in the estimator regime")
    val qs = r.getSeq[Double](2)
    val ex = r.getSeq[Boolean](3)
    // p0.001 (rank 50), p0.999 (rank 49950), p0.9999 (rank 49995) live in
    // the exact tails: certified rank error 0 AND actually exact
    Seq(0, 2, 3).foreach { i =>
      assert(ex(i), s"prob ${tailProbs(i)} must certify exact")
      assert(qs(i) == exactQ(xs, tailProbs(i)),
        s"prob ${tailProbs(i)}: ${qs(i)} != ${exactQ(xs, tailProbs(i))}")
    }
    // the median is out of tail reach: it must SAY estimator (q_exact
    // false) and carry the KLL certificate, which must hold
    assert(!ex(1), "p0.5 cannot be tail-exact at t=512, n=50k")
    val trueRank = xs.sorted.indexWhere(_ >= qs(1)) + 1L
    assert(math.abs(trueRank - 25000L) <= kllErr,
      s"median estimate rank $trueRank outside certified ±$kllErr")

    // the KLL baseline at the SAME k cannot certify the tails: its
    // certificate is ±kllErr > 0, while the tail sketch certifies 0
    val base = df.agg(QuantileSketch.sketch(col("x"), k = 32, tailProbs).as("s"))
      .select("s.max_rank_err", "s.is_exact").head()
    assert(base.getLong(0) > 0 && !base.getBoolean(1),
      "baseline must be unable to certify exactness here")

    // merge path: same answers regardless of partition layout
    val r1 = xs.toDF("x").coalesce(1)
      .agg(QuantileSketch.tailSketch(col("x"), k = 32, t = 512, tailProbs).as("s"))
      .select("s.qs", "s.q_exact").head()
    Seq(0, 2, 3).foreach { i =>
      assert(r1.getSeq[Double](0)(i) == qs(i) && r1.getSeq[Boolean](1)(i),
        s"tail answers must be layout-independent (prob ${tailProbs(i)})")
    }
  }

  test("tail sketch: small corpora are exact everywhere; mixed shapes refuse to merge") {
    val s = spark
    import s.implicits._
    val xs = Seq(5.0, 1.0, 9.0, 3.0, 7.0)
    val r = xs.toDF("x")
      .agg(QuantileSketch.tailSketch(col("x"), k = 8, t = 4, Seq(0.2, 0.5, 1.0)).as("s"))
      .select("s.qs", "s.q_exact").head()
    assert(r.getSeq[Double](0) == Seq(1.0, 5.0, 9.0))
    assert(r.getSeq[Boolean](1).forall(identity), "n <= 2t: everything tail-exact")
  }

  test("tail sketch: t >> group size and 2t-boundary sizes under skewed merge layouts") {
    val s = spark
    import s.implicits._
    // (a) per-group with the PRODUCTION t=4096 while groups hold 1..40
    // rows — every rank is tail-served, certificates all true, answers
    // exactly the nearest-rank values, regardless of which group a row
    // merges through (state is 2t doubles per group — SURVEY §4.c)
    val probs = Seq(0.001, 0.5, 0.9999)
    val grouped = (0 until 60).map { i =>
      val g = if (i == 0) "one" else if (i < 4) "three" else "many"
      (g, ((i.toLong * 7919) % 97).toDouble)
    }
    val gvals = grouped.groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2) }
    val gout = grouped.toDF("g", "x").repartition(16)
      .groupBy("g")
      .agg(QuantileSketch.tailSketch(col("x"), k = 64, t = 4096, probs).as("s"))
      .select(col("g"), col("s.qs"), col("s.q_exact"))
      .collect().map(r => (r.getString(0), r.getSeq[Double](1), r.getSeq[Boolean](2)))
    gout.foreach { case (g, qs, ex) =>
      assert(ex.forall(identity), s"group $g: t >> n must certify exact everywhere")
      probs.zipWithIndex.foreach { case (p, i) =>
        assert(qs(i) == exactQ(gvals(g), p), s"group $g prob $p") }
    }
    // (b) 2t-boundary sizes: with t = 32, n = 2t is the LAST size where
    // every rank is tail-served; at n = 2t+1 the exact-middle rank
    // (target = t+1: not in lo, n-target = t not < t) must flip to the
    // estimator WITH a sound certificate — and every answer must be
    // identical across balanced, single, and maximally-skewed layouts
    // (merge order cannot move a certificate or a value)
    val t = 32
    for (n <- Seq(2 * t - 1, 2 * t, 2 * t + 1, 2 * t + 17)) {
      val xs = (0 until n).map(i => ((i.toLong * 104729) % n).toDouble)
      val layouts = Seq(
        xs.toDF("x").coalesce(1),
        xs.toDF("x").repartition(64),
        // maximal skew: one partition holds a single row, the other all
        // the rest — the small side merges INTO a full sketch
        xs.zipWithIndex.toDF("x", "i")
          .repartition(2, (col("i") === 0).cast("int")).select("x"))
      val res = layouts.map(_.agg(
          QuantileSketch.tailSketch(col("x"), k = 8, t = t, probs).as("s"))
        .select("s.qs", "s.q_exact", "s.max_rank_err").head())
      val midTarget = math.ceil(0.5 * n).toLong.max(1L)
      val midTailServed = midTarget <= math.min(t, n) || n - midTarget < math.min(t, n)
      // TAIL answers and certificates are layout-independent (global
      // top-t/bottom-t are merge-order-free); the estimator MIDDLE may
      // legally differ per layout — the deterministic KLL compacts in
      // input order — as long as each layout's own certificate holds
      val (qs0, ex0) = (res.head.getSeq[Double](0), res.head.getSeq[Boolean](1))
      res.tail.foreach { r =>
        Seq(0, 2).foreach { i =>
          assert(r.getSeq[Double](0)(i) == qs0(i) &&
            r.getSeq[Boolean](1)(i) == ex0(i),
            s"n=$n: tail answers must be layout-independent")
        }
        assert(r.getSeq[Boolean](1)(1) == midTailServed,
          s"n=$n: the p0.5 certificate must flip identically in every layout")
      }
      assert(ex0(0) && ex0(2), s"n=$n: extreme tails always exact")
      assert(qs0(0) == exactQ(xs, 0.001) && qs0(2) == exactQ(xs, 0.9999))
      assert(ex0(1) == midTailServed,
        s"n=$n: p0.5 exactness must flip exactly at the 2t boundary")
      res.foreach { r =>
        val (qsL, exL) = (r.getSeq[Double](0), r.getSeq[Boolean](1))
        if (exL(1)) assert(qsL(1) == exactQ(xs, 0.5), s"n=$n: tail-served median exact")
        else {
          val err = r.getLong(2)
          val rank = xs.sorted.indexWhere(_ >= qsL(1)) + 1L
          assert(math.abs(rank - midTarget) <= err,
            s"n=$n: estimator median rank $rank outside certified ±$err")
        }
      }
    }
  }

  test("type and parameter validation refuse loudly") {
    val s = spark
    import s.implicits._
    val df = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException](QuantileSketch.sketch(col("x"), 3, Seq(0.5)))
    intercept[IllegalArgumentException](QuantileSketch.sketch(col("x"), 16, Seq(0.0)))
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("s").toDF("x").agg(QuantileSketch.sketch(col("x"), 16, Seq(0.5))).head()
    }
    assert(e.getMessage.contains("double"))
  }
}
