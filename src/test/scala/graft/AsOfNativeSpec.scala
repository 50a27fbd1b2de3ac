package graft

import graft.operators.AsOfJoin
import graft.plans.AsOfMergeJoinExec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native as-of join (custom AsOfJoinPlan → AsOfMergeJoinExec) must agree
  * with the union+window encoding on every input shape, plan through the
  * injected strategy, and prune columns through the custom node.
  */
class AsOfNativeSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = TestSpark.spark

  private def trades: DataFrame = {
    val s = spark
    import s.implicits._
    Seq( // (id, key, t, qty)
      (1, "a", 10L, 100), (2, "a", 20L, 200), (3, "a", 30L, 300),
      (4, "b", 5L, 50), (5, "b", 15L, 150),
      (6, "c", 7L, 70), // key with no quotes at all
      (7, "a", 1L, 10) // before any quote for its key
    ).toDF("id", "key", "t", "qty")
  }

  private def quotes: DataFrame = {
    val s = spark
    import s.implicits._
    Seq( // (key, t, px)
      ("a", 2L, 1.0), ("a", 20L, 2.0), ("a", 25L, 3.0),
      ("b", 5L, 4.0), // equal-timestamp match (inclusive <=)
      ("d", 1L, 9.0) // key with no trades
    ).toDF("key", "t", "px")
  }

  private def runNative(l: DataFrame, r: DataFrame): DataFrame =
    AsOfJoin.leftAsOfNative(l, r, "key", "key", "t", "t", Seq("px"))

  test("native merge matches union+window encoding and hand oracle") {
    val native = runNative(trades, quotes).orderBy("id").collect()
    val composed = AsOfJoin
      .leftAsOf(trades, quotes, "key", "key", "t", "t", Seq("px"))
      .orderBy("id").collect()
    assert(native.toSeq == composed.toSeq)
    val byId = native.map(row => row.getInt(0) -> Option(row.get(4))).toMap
    assert(byId == Map(
      1 -> Some(1.0), // t=10: quote at 2
      2 -> Some(2.0), // t=20: equal-timestamp quote (inclusive)
      3 -> Some(3.0), // t=30: quote at 25
      4 -> Some(4.0), // t=5: equal-timestamp quote
      5 -> Some(4.0), // t=15: still the t=5 quote
      6 -> None, // key with no quotes
      7 -> None // before any quote for its key
    ))
  }

  test("plans as AsOfMergeJoinExec with co-partitioned children") {
    val df = runNative(trades, quotes)
    df.collect() // materialize so AQE finalizes the plan
    val execs = collectWithSubqueries(df.queryExecution.executedPlan) {
      case e: AsOfMergeJoinExec => e
    }
    assert(execs.nonEmpty, df.queryExecution.executedPlan.toString)
  }

  test("empty right side leaves all left rows unmatched") {
    val out = runNative(trades, quotes.where(col("px") < 0)).collect()
    assert(out.length == trades.count())
    assert(out.forall(_.isNullAt(4)))
  }

  test("null keys and null times never match") {
    val s = spark
    import s.implicits._
    val l = Seq((1, Option("a"), Option(10L)), (2, Option.empty[String], Option(10L)),
      (3, Option("a"), Option.empty[Long])).toDF("id", "key", "t")
    val r = Seq((Option("a"), Option(5L), 1.0), (Option.empty[String], Option(1L), 2.0),
      (Option("a"), Option.empty[Long], 3.0)).toDF("key", "t", "px")
    val got = AsOfJoin.leftAsOfNative(l, r, "key", "key", "t", "t", Seq("px"))
      .orderBy("id").collect()
    assert(Option(got(0).get(3)) == Some(1.0)) // normal match
    assert(got(1).isNullAt(3)) // null left key
    assert(got(2).isNullAt(3)) // null left time
  }

  test("PruneAsOfJoinColumns drops unreferenced columns below the join") {
    val l = trades.withColumn("heavy_l", lit("x" * 10))
    val r = quotes.withColumn("heavy_r", lit("y" * 10))
    val thin = AsOfJoin.leftAsOfNative(l, r, "key", "key", "t", "t", Seq("px"))
      .select("id", "px")
    val optimized = thin.queryExecution.optimizedPlan
    val joinNode = optimized.collect { case j: graft.plans.AsOfJoinPlan => j }.head
    val colsBelow = (joinNode.left.output ++ joinNode.right.output).map(_.name).toSet
    assert(!colsBelow.contains("heavy_l") && !colsBelow.contains("heavy_r"), optimized.toString)
    assert(colsBelow.contains("key") && colsBelow.contains("t"))
    // Semantics unchanged after pruning.
    assert(thin.orderBy("id").collect().map(r0 => Option(r0.get(1))).toSeq ==
      Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(4.0), None, None))
  }

  test("inner as-of drops unmatched left rows; agrees with left variant") {
    val innerRows = AsOfJoin.innerAsOfNative(trades, quotes, "key", "key", "t", "t", Seq("px"))
      .orderBy("id").collect()
    val leftMatched = runNative(trades, quotes)
      .where(col("px").isNotNull).orderBy("id").collect()
    assert(innerRows.toSeq == leftMatched.toSeq)
    assert(innerRows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4, 5)) // ids 6,7 unmatched
  }

  test("tolerance bounds staleness (left: null-padded; inner: dropped)") {
    // staleness per id: 1→8, 2→0, 3→5, 4→0, 5→10; tolerance 5 is inclusive
    val tol = Some(5L)
    val l = AsOfJoin.leftAsOfNative(trades, quotes, "key", "key", "t", "t", Seq("px"), tol)
      .orderBy("id").collect().map(r => r.getInt(0) -> Option(r.get(4))).toMap
    assert(l(1) == None && l(2) == Some(2.0) && l(3) == Some(3.0) && l(5) == None)
    val i = AsOfJoin.innerAsOfNative(trades, quotes, "key", "key", "t", "t", Seq("px"), tol)
      .collect().map(_.getInt(0)).toSet
    assert(i == Set(2, 3, 4)) // 1 and 5 too stale, 6/7 unmatched
  }

  test("PushFilterThroughAsOfJoin: left predicate reaches the parquet scan") {
    val dir = java.nio.file.Files.createTempDirectory("asof_push").toString
    trades.write.mode("overwrite").parquet(s"$dir/trades")
    quotes.write.mode("overwrite").parquet(s"$dir/quotes")
    val df = runNative(
      spark.read.parquet(s"$dir/trades"), spark.read.parquet(s"$dir/quotes"))
      .where(col("qty") > 100 && col("px") > 1.0)
    assert(df.orderBy("id").collect().map(_.getInt(0)).toSeq == Seq(2, 3, 5))
    val scans = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // left-only predicate (qty) pushed through the join into the trades scan
    val tradeScan = scans.find(_.output.exists(_.name == "qty")).get
    assert(tradeScan.metadata("PushedFilters").contains("GreaterThan(qty,100)"),
      tradeScan.metadata.toString)
    // right-side predicate (px) must NOT be pushed — it would change which
    // quote is "latest at-or-before" — so the quotes scan stays unfiltered
    val quoteScan = scans.find(_.output.exists(_.name == "px")).get
    assert(!quoteScan.metadata("PushedFilters").contains("px"),
      quoteScan.metadata.toString)
  }

  test("broadcast path agrees with merge path and shuffles nothing") {
    import org.apache.spark.sql.functions.broadcast
    val viaBroadcast = AsOfJoin.leftAsOfNative(
      trades, broadcast(quotes), "key", "key", "t", "t", Seq("px"))
    val got = viaBroadcast.orderBy("id").collect()
    val viaMerge = runNative(trades, quotes).orderBy("id").collect()
    assert(got.toSeq == viaMerge.toSeq)
    viaBroadcast.collect()
    val plan = viaBroadcast.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: graft.plans.AsOfBroadcastJoinExec => e
    }.nonEmpty, plan.toString)
    assert(collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, plan.toString) // left side must not move
    // inner + tolerance semantics match the merge exec too
    val ib = AsOfJoin.innerAsOfNative(
      trades, broadcast(quotes), "key", "key", "t", "t", Seq("px"), Some(5L))
      .collect().map(_.getInt(0)).toSet
    assert(ib == Set(2, 3, 4))
  }

  test("salted as-of equals unsalted on skewed and uniform keys") {
    val s = spark
    import s.implicits._
    val plain = runNative(trades, quotes).orderBy("id").collect()
    val salted = AsOfJoin.leftAsOfNativeSalted(
      trades, quotes, "key", "key", "t", "t", Seq("px"), buckets = 3, saltBy = "id")
      .orderBy("id").collect()
    assert(salted.toSeq == plain.toSeq)
    // hot-key shape: every left row on one key, many right rows
    val hotL = (1 to 200).map(i => (i, "hot", i.toLong * 2)).toDF("id", "key", "t")
    val hotR = (0 to 50).map(i => ("hot", i.toLong * 7, i * 1.0)).toDF("key", "t", "px")
    val hotPlain = AsOfJoin.leftAsOfNative(hotL, hotR, "key", "key", "t", "t", Seq("px"))
      .orderBy("id").collect()
    val hotSalted = AsOfJoin.leftAsOfNativeSalted(
      hotL, hotR, "key", "key", "t", "t", Seq("px"), buckets = 4, saltBy = "id")
      .orderBy("id").collect()
    assert(hotSalted.toSeq == hotPlain.toSeq)
  }

  test("bucketed+sorted tables: as-of merge plans with zero exchanges") {
    val s = spark
    import s.implicits._
    // repartition on the bucket expression first → one file per bucket, so
    // the scan reports both hash partitioning AND the (key, t) sort order
    val l = (1L to 400L).map(i => (i % 20, i, i * 3 % 97)).toDF("key", "id", "t")
      .repartition(8, col("key"))
    val r = (1L to 100L).map(i => (i % 20, i * 7 % 89, i * 1.0)).toDF("key", "t", "px")
      .repartition(8, col("key"))
    l.write.mode("overwrite").bucketBy(8, "key").sortBy("key", "t").saveAsTable("graft_asof_lb")
    r.write.mode("overwrite").bucketBy(8, "key").sortBy("key", "t").saveAsTable("graft_asof_rb")
    try {
      // scans only report bucket sort order behind this (off-by-default) conf
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val lt = s.table("graft_asof_lb")
      val rt = s.table("graft_asof_rb")
      val native = AsOfJoin.leftAsOfNative(lt, rt, "key", "key", "t", "t", Seq("px"))
      val expected = AsOfJoin.leftAsOf(lt, rt, "key", "key", "t", "t", Seq("px"))
      assert(native.orderBy("id").collect().toSeq == expected.orderBy("id").collect().toSeq)
      native.collect()
      val planStr = native.queryExecution.executedPlan.toString
      assert(!planStr.linesIterator.exists(_.contains("Exchange")),
        s"bucketed as-of must not shuffle either side\n$planStr")
      assert(!planStr.linesIterator.exists(_.contains("Sort [")),
        s"bucket sort order should elide merge sorts\n$planStr")
    } finally {
      s.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
      s.sql("DROP TABLE IF EXISTS graft_asof_lb")
      s.sql("DROP TABLE IF EXISTS graft_asof_rb")
    }
  }

  test("API misuse fails fast with actionable messages") {
    val noCol = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOfNative(trades, quotes, "key", "nope", "t", "t", Seq("px"))
    }
    assert(noCol.getMessage.contains("nope") && noCol.getMessage.contains("key"))
    val typeMismatch = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOfNative(
        trades, quotes.withColumn("key", col("key").cast("int")),
        "key", "key", "t", "t", Seq("px"))
    }
    assert(typeMismatch.getMessage.toLowerCase.contains("key types differ"))
    val collide = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOfNative(trades, quotes.withColumnRenamed("px", "qty"),
        "key", "key", "t", "t", Seq("qty"))
    }
    assert(collide.getMessage.contains("collide"))
  }

  test("self-join (same source both sides) resolves without ambiguity") {
    val s = spark
    import s.implicits._
    val ev = Seq((1, "u1", 10L, "view"), (2, "u1", 5L, "signup"),
      (3, "u2", 7L, "view")).toDF("event_id", "user_id", "ts", "event_type")
    val signups = ev.where(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("ts").as("signup_ts"))
    val out = AsOfJoin.leftAsOfNative(
      ev.select("event_id", "user_id", "ts", "event_type"), signups,
      "user_id", "user_id", "ts", "ts", Seq("signup_ts"))
      .orderBy("event_id").collect()
    assert(Option(out(0).get(4)) == Some(5L)) // u1 view at 10 sees signup at 5
    assert(Option(out(1).get(4)) == Some(5L)) // the signup row matches itself (<=)
    assert(out(2).isNullAt(4)) // u2 never signed up
  }

  test("broadcast index memo does not leak across applications sharing a JVM") {
    // Broadcast ids restart from 0 per SparkContext; two sessions in one JVM
    // therefore reuse ids. The memo must key on the application identity so
    // "app B, broadcast 0" never sees the index built for "app A, broadcast 0".
    def emptyIndex() = new java.util.HashMap[
      org.apache.spark.sql.catalyst.expressions.UnsafeRow,
      scala.collection.mutable.ArrayBuffer[(
        org.apache.spark.sql.catalyst.expressions.UnsafeRow,
        org.apache.spark.sql.catalyst.InternalRow)]]
    val m = classOf[graft.plans.AsOfBroadcastJoinExec]
    val cached = graft.plans.AsOfBroadcastJoinExec // touch companion
    var builds = 0
    val a0 = cached.cachedIndex("spec-app-A", 9999999L, () => { builds += 1; emptyIndex() })
    val a0Again = cached.cachedIndex("spec-app-A", 9999999L, () => { builds += 1; emptyIndex() })
    assert(builds == 1 && (a0 eq a0Again), "same app + id must memoize")
    val b0 = cached.cachedIndex("spec-app-B", 9999999L, () => { builds += 1; emptyIndex() })
    assert(builds == 2, "a second application with the same broadcast id must rebuild")
    assert(!(b0 eq a0), "app B must not observe app A's index")
    assert(m != null)
  }
}
