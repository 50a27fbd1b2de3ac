package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def data = {
    val s = spark
    import s.implicits._
    // 3 groups; group g has 2000 rows over g*1000 distinct values
    (0 until 3).flatMap { g =>
      (0 until 2000).map(i => (s"g$g", s"v${g}_${i % ((g + 1) * 1000)}", i.toLong))
    }.toDF("grp", "v", "x")
  }

  // Zipf-ish adversarial stream: heavy items drowned in a long tail of
  // distinct singletons, vocabulary far larger than the sketch's k.
  private def zipfish = {
    val s = spark
    import s.implicits._
    val heavy = (0 until 20).flatMap(i => Seq.fill(400 - 15 * i)(s"hot$i"))
    val tail = (0 until 6000).map(i => s"cold$i")
    new scala.util.Random(3).shuffle(heavy ++ tail).toDF("item")
  }

  test("MisraGries sketch: every above-slack item survives, k bounds the state") {
    val df = zipfish.repartition(8)
    val n = df.count()
    val k = 64
    val got = df.agg(graft.functions.MisraGries.sketch(col("item"), k).as("s"))
      .selectExpr("explode(s) AS e").select("e.item", "e.count")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size <= k, s"state exceeded k: ${got.size}")
    val exact = zipfish.groupBy("item").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val slack = n / (k + 1)
    exact.filter(_._2 > slack).keys.foreach(item =>
      assert(got.contains(item), s"guaranteed item $item missing (count ${exact(item)})"))
    // counters never overestimate, and underestimate by at most the slack
    got.foreach { case (item, c) =>
      assert(c <= exact(item) && c >= exact(item) - slack, s"$item: $c vs ${exact(item)}")
    }
  }

  test("MisraGries guarantee holds under any partition layout (merge path)") {
    val k = 32
    Seq(1, 4, 32).foreach { parts =>
      val df = zipfish.repartition(parts)
      val got = df.agg(graft.functions.MisraGries.sketch(col("item"), k).as("s"))
        .selectExpr("explode(s) AS e").select("e.item")
        .collect().map(_.getString(0)).toSet
      val n = zipfish.count()
      val exact = zipfish.groupBy("item").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.filter(_._2 > n / (k + 1)).keys.foreach(item =>
        assert(got.contains(item), s"parts=$parts: guaranteed item $item missing"))
    }
  }

  test("MisraGries rejects non-string items at analysis, not mid-task") {
    val err = intercept[Exception] {
      zipfish.select(length(col("item")).as("n"))
        .agg(graft.functions.MisraGries.sketch(col("n"), 8)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("type"), err.getMessage)
  }

  test("MisraGries composes with groupBy for per-group candidates") {
    val s = spark
    import s.implicits._
    val df = (0 until 500).map(i => ("a", if (i % 2 == 0) "x" else s"t$i")).toDF("g", "item")
      .union((0 until 500).map(i => ("b", if (i % 2 == 0) "y" else s"u$i")).toDF("g", "item"))
    val got = df.groupBy("g")
      .agg(graft.functions.MisraGries.sketch(col("item"), 16).as("s"))
      .selectExpr("g", "s[0].item AS top").orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "x"), ("b", "y")))
  }

  test("exactTopN: exact counts and order; uncertifiable n fails loudly") {
    val df = zipfish
    val got = Sketches.exactTopN(df, col("item"), n = 10, k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val want = zipfish.groupBy("item").count()
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }.take(10).toSeq
    assert(got == want)
    // rank-n inside the slack → loud refusal naming k, never a silent result
    val err = intercept[IllegalArgumentException] {
      Sketches.exactTopN(df, col("item"), n = 30, k = 40)
    }
    assert(err.getMessage.contains("raise k"))
  }

  test("exactTopNPerGroup: per-group exact results; uncertified group fails naming it") {
    val s = spark
    import s.implicits._
    // group A: skewed with long tail; group B: small closed vocabulary
    val a = (0 until 10).flatMap(i => Seq.fill(300 - 20 * i)(("A", s"hot$i"))) ++
      (0 until 3000).map(i => ("A", s"cold$i"))
    val b = (0 until 900).map(i => ("B", s"word${i % 6}"))
    val df = new scala.util.Random(9).shuffle(a ++ b).toDF("g", "item").repartition(8)
    val got = Sketches.exactTopNPerGroup(df, "g", col("item"), n = 5, k = 64)
      .orderBy("g", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3))).toSeq
    def want(rows: Seq[(String, String)], g: String) =
      rows.groupBy(_._2).view.mapValues(_.size.toLong).toSeq
        .sortBy { case (i, c) => (-c, i) }.take(5).zipWithIndex
        .map { case ((i, c), r) => (g, i, c, r + 1) }
    assert(got == want(a, "A") ++ want(b, "B"))
    // group A's rank-30 is deep in the tail: the group is named in the error
    val err = intercept[IllegalArgumentException] {
      Sketches.exactTopNPerGroup(df, "g", col("item"), n = 30, k = 40)
    }
    assert(err.getMessage.contains("A") && err.getMessage.contains("raise k"))
  }

  test("profile: HLL distinct within 5% of exact, quantiles near exact") {
    val out = Sketches.profile(data, "grp", col("v"), col("x"))
      .orderBy("grp").collect()
    val exact = data.groupBy("grp").agg(count_distinct(col("v")).as("d"))
      .orderBy("grp").collect().map(_.getLong(1))
    out.zip(exact).foreach { case (r, ex) =>
      assert(r.getLong(1) == 2000)
      val est = r.getLong(2).toDouble
      assert(math.abs(est - ex) / ex < 0.05, s"estimate $est vs exact $ex")
      // x is uniform 0..1999 per group
      assert(math.abs(r.getLong(3) - 1000L) < 50 && math.abs(r.getLong(4) - 1900L) < 50)
    }
  }

  test("union of persisted group sketches estimates the global distinct") {
    val sk = Sketches.groupSketches(data, "grp", col("v"))
    assert(sk.count() == 3) // one fixed-size row per group — the reusable state
    val est = Sketches.unionEstimate(sk).collect()(0).getLong(0).toDouble
    val exact = data.agg(count_distinct(col("v"))).collect()(0).getLong(0).toDouble
    assert(math.abs(est - exact) / exact < 0.05, s"union estimate $est vs exact $exact")
  }

  // Long-keyed twin of zipfish: heavy ids drowned in distinct singletons,
  // ids spread by a splitmix-style multiply so slots collide realistically.
  private def zipfishLong = {
    val s = spark
    import s.implicits._
    val heavy = (0 until 20).flatMap(i => Seq.fill(400 - 15 * i)(i.toLong * 0x9E3779B9L + 7L))
    val tail = (0 until 6000).map(i => 1000000L + i * 0x85EBCA6BL)
    new scala.util.Random(3).shuffle(heavy ++ tail).toDF("item")
  }

  test("MisraGriesLong: guarantee and k-bound hold under any partition layout") {
    val n = zipfishLong.count()
    val exact = zipfishLong.groupBy("item").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- Seq(32, 64); parts <- Seq(1, 4, 32)) {
      val got = zipfishLong.repartition(parts)
        .agg(graft.functions.MisraGries.sketchLong(col("item"), k).as("s"))
        .selectExpr("explode(s) AS e").select("e.item", "e.count")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.size <= k, s"state exceeded k=$k: ${got.size}")
      val slack = n / (k + 1)
      exact.filter(_._2 > slack).keys.foreach(item =>
        assert(got.contains(item), s"k=$k parts=$parts: guaranteed item $item missing"))
      got.foreach { case (item, c) =>
        assert(c <= exact(item) && c >= exact(item) - slack,
          s"k=$k parts=$parts: $item counter $c vs exact ${exact(item)}")
      }
    }
  }

  test("exactTopNLong: certified exact top-n equals the full groupBy") {
    val s = spark
    import s.implicits._
    val exp = zipfishLong.groupBy("item").count()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (i, c) => (-c, i) }.take(10).toSeq
    val got = Sketches.exactTopNLong(zipfishLong.repartition(8), col("item"), n = 10, k = 256)
      .as[(Long, Long)].collect().toSeq
    assert(got == exp)
    // below the certifiable bar the operator refuses instead of guessing
    val e = intercept[IllegalArgumentException] {
      Sketches.exactTopNLong(zipfishLong, col("item"), n = 30, k = 31).collect()
    }
    assert(e.getMessage.contains("raise k"), e.getMessage)
  }

  test("MisraGriesLong rejects non-bigint items at analysis, not mid-task") {
    val err = intercept[Exception] {
      zipfishLong.select(col("item").cast("int").as("i"))
        .agg(graft.functions.MisraGries.sketchLong(col("i"), 8)).collect()
    }
    assert(err.getMessage.toLowerCase.contains("bigint"), err.getMessage)
  }

  test("TopK heap: matches sort-based reference on random data") {
    val rnd = new scala.util.Random(7)
    val rows = (0 until 500).map(i => (rnd.nextInt(40).toDouble, i.toLong))
    val heap = new graft.functions.TopKHeap(10)
    rows.foreach { case (s, i) => heap.offer(s, i) }
    val got = (0 until heap.size).map(i => (heap.scores(i), heap.ids(i)))
      .sortBy { case (s, i) => (-s, i) }
    val want = rows.sortBy { case (s, i) => (-s, i) }.take(10)
    assert(got == want)
  }

  test("topKPerGroup: exact per-group winners, ties break on id, merge across partitions") {
    val s = spark
    import s.implicits._
    // group "a": scores with ties at 9.0 (ids 3, 13, 23 — keep 3 then 13);
    // group "b": fewer rows than k
    val df = (Seq((9.0, 3L), (9.0, 13L), (9.0, 23L), (7.0, 1L), (10.0, 99L))
      .map { case (sc, id) => ("a", sc, id) } ++
      Seq(("b", 1.0, 7L)))
      .toDF("g", "sc", "id").repartition(8)
    val out = Sketches.topKPerGroup(df, Seq("g"), col("sc"), col("id"), k = 3)
      .orderBy("g", "rank").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("a", 1, 99L, 10.0), ("a", 2, 3L, 9.0), ("a", 3, 13L, 9.0),
      ("b", 1, 7L, 1.0)))
  }

  test("TopK ignores null scores and survives a shuffle-merged plan") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).map(i => (i % 5, if (i % 97 == 0) None else Some(i.toDouble), i.toLong))
      .toDF("g", "sc", "id").repartition(16)
    val out = Sketches.topKPerGroup(df, Seq("g"), col("sc"), col("id"), k = 2)
      .orderBy("g", "rank").collect()
    // per residue class g, the largest non-filtered values of i with i%5==g
    val want = (1 to 1000).filter(_ % 97 != 0).groupBy(_ % 5).flatMap { case (g, is) =>
      is.sortBy(-_).take(2).zipWithIndex.map { case (i, r) => (g, r + 1, i.toLong, i.toDouble) }
    }.toSeq.sortBy(t => (t._1, t._2))
    assert(out.map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq == want)
  }

  test("corpusOverlap exact regime: certified counts equal brute-force sets") {
    val sp = spark
    import sp.implicits._
    val a = ((1 to 600).map(i => s"doc $i") ++ Seq("dup", "dup")).toDF("text")
    val b = (401 to 1000).map(i => s"doc $i").toDF("text")
    val out = graft.operators.Sketches.corpusOverlap(a, b, "text", k = 4096)
      .head()
    assert(out.getLong(0) == 601) // 600 + "dup", dups collapse
    assert(out.getLong(1) == 600)
    assert(out.getLong(2) == 1001)
    assert(out.getLong(3) == 200)
    assert(out.getDouble(4) == math.BigDecimal(200.0 / 1001)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(out.getBoolean(5), "under-k sketches must certify exactness")
  }

  test("corpusOverlap estimator regime: within the 1/sqrt(k) band, layout-stable") {
    val sp = spark
    import sp.implicits._
    // 8k-vs-8k with exactly 4k shared values: true J = 4096/12288
    val a = (1 to 8192).map(i => s"item $i").toDF("text")
    val b = (4097 to 12288).map(i => s"item $i").toDF("text")
    val k = 512
    val out = graft.operators.Sketches.corpusOverlap(a, b, "text", k = k).head()
    assert(!out.getBoolean(5))
    val trueJ = 4096.0 / 12288
    val tol = 3.0 / math.sqrt(k) // ~3 sigma
    assert(math.abs(out.getDouble(4) - trueJ) < tol,
      s"jaccard ${out.getDouble(4)} vs $trueJ")
    for ((est, truth) <- Seq((out.getLong(0), 8192L), (out.getLong(1), 8192L),
        (out.getLong(2), 12288L))) {
      assert(math.abs(est - truth).toDouble / truth < tol,
        s"estimate $est vs $truth")
    }
    // partitioning must not change the sketch: bottom-k distinct is global
    val again = graft.operators.Sketches.corpusOverlap(
      a.repartition(7), b.repartition(3), "text", k = k).head()
    assert(again == out)
  }

  test("corpusOverlap degenerate inputs: disjoint and empty corpora") {
    val sp = spark
    import sp.implicits._
    val a = (1 to 50).map(i => s"a $i").toDF("text")
    val b = (1 to 50).map(i => s"b $i").toDF("text")
    val disjoint = graft.operators.Sketches.corpusOverlap(a, b, "text", k = 256).head()
    assert(disjoint.getLong(3) == 0L && disjoint.getDouble(4) == 0.0)
    val none = a.limit(0)
    val empty = graft.operators.Sketches.corpusOverlap(none, none, "text", k = 16).head()
    assert(empty.getLong(2) == 0L && empty.getDouble(4) == 0.0 && empty.getBoolean(5))
  }

  test("KmvAgg: native grouped sketch equals the dataset-level kmvValues, layout-stable") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    val df = (1 to 3000).map(i => (s"g${i % 3}", s"item ${i % 700}")).toDF("g", "v")
    val k = 64
    for (parts <- Seq(1, 7)) {
      val got = graft.operators.Sketches.groupKmv(df.repartition(parts), "g", col("v"), k)
        .collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSeq).toMap
      (0 until 3).foreach { g =>
        val want = graft.operators.Sketches.kmvValues(
          df.where(col("g") === s"g$g").select("v"), col("v"), k).toSeq
        assert(got(s"g$g") == want, s"g$g parts=$parts")
      }
    }
    // analysis-time type gate: a non-long key is rejected, not a task crash
    val e = intercept[Exception] {
      df.groupBy("g").agg(graft.functions.Kmv.sketch(col("v"), k)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("long"))
  }

  test("graft_kmv is SQL-callable and equals the column form") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.{col, xxhash64}
    (1 to 500).map(i => s"v${i % 90}").toDF("v").createOrReplaceTempView("kmv_in")
    val viaSql = sp.sql("SELECT graft_kmv(xxhash64(v), 32) AS s FROM kmv_in")
      .head().getSeq[Long](0).toSeq
    val viaCol = (1 to 500).map(i => s"v${i % 90}").toDF("v")
      .agg(graft.functions.Kmv.sketch(xxhash64(col("v")), 32).as("s"))
      .head().getSeq[Long](0).toSeq
    assert(viaSql == viaCol && viaSql.length == 32)
  }

  test("overlapMatrix: exact regime equals brute pairwise sets; estimator within band") {
    val sp = spark
    import sp.implicits._
    import org.apache.spark.sql.functions.col
    // three snapshots over 1..1000 with designed overlaps
    val snaps = ((1 to 600).map(i => ("a", s"d$i")) ++
      (301 to 900).map(i => ("b", s"d$i")) ++
      (601 to 1000).map(i => ("c", s"d$i")) ++ (1 to 100).map(i => ("c", s"d$i")))
      .toDF("g", "v")
    val k = 4096 // over every group size -> exact
    val m = graft.operators.Sketches.overlapMatrix(
      graft.operators.Sketches.groupKmv(snaps, "g", col("v"), k), k)
      .orderBy("ga", "gb").collect()
    def stats(a: Set[Int], b: Set[Int]) =
      (a.size.toLong, b.size.toLong, (a ++ b).size.toLong, (a & b).size.toLong)
    val sets = Map("a" -> (1 to 600).toSet, "b" -> (301 to 900).toSet,
      "c" -> ((601 to 1000).toSet ++ (1 to 100).toSet))
    val pairs = Seq(("a", "b"), ("a", "c"), ("b", "c"))
    assert(m.length == 3)
    m.zip(pairs).foreach { case (r, (ga, gb)) =>
      assert(r.getString(0) == ga && r.getString(1) == gb)
      val (na, nb, nu, ni) = stats(sets(ga), sets(gb))
      assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)) == ((na, nb, nu, ni)))
      assert(r.getBoolean(7), "under-k sketches must certify exactness")
    }
    // estimator regime: small k, tolerance 3/sqrt(k)
    val k2 = 256
    val est = graft.operators.Sketches.overlapMatrix(
      graft.operators.Sketches.groupKmv(snaps, "g", col("v"), k2), k2)
      .orderBy("ga", "gb").collect()
    est.zip(pairs).foreach { case (r, (ga, gb)) =>
      assert(!r.getBoolean(7))
      val (na, nb, nu, ni) = stats(sets(ga), sets(gb))
      val trueJ = ni.toDouble / nu
      assert(math.abs(r.getDouble(6) - trueJ) < 3.0 / math.sqrt(k2),
        s"$ga-$gb jaccard ${r.getDouble(6)} vs $trueJ")
    }
  }
}
