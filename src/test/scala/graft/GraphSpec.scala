package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Driver-side power-iteration twin of [[Graph.pageRank]] — the same
    * formulation (distinct edges, dangling mass redistributed uniformly)
    * in plain Scala, so the distributed result must agree to float noise. */
  private def model(
      edges: Seq[(Long, Long)], iters: Int, d: Double): Map[Long, Double] = {
    val e = edges.distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.length.toDouble
    val outdeg = e.groupBy(_._1).map { case (s, es) => s -> es.length }
    val in = e.groupBy(_._2)
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = nodes.filter(v => !outdeg.contains(v)).map(r).sum
      r = nodes.map { v =>
        val c = in.getOrElse(v, Nil).map { case (s, _) => r(s) / outdeg(s) }.sum
        v -> ((1.0 - d) / n + d * (c + dm / n))
      }.toMap
    }
    r
  }

  /** Cyclic 5-node graph with a dangling sink (4 has no out-edges) and a
    * parallel edge (0→1 twice) that must collapse. */
  private val g = Seq(
    (0L, 1L), (0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (2L, 3L),
    (3L, 0L), (3L, 4L), (1L, 4L))

  private def run(edges: Seq[(Long, Long)], iters: Int, d: Double = 0.85) =
    Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters, d)
      .as[(Long, Double)].collect().toMap

  test("pageRank matches the driver power-iteration model on a cyclic graph with a sink") {
    for (iters <- Seq(1, 3, 5)) {
      val got = run(g, iters)
      val want = model(g, iters, 0.85)
      assert(got.keySet === want.keySet)
      got.foreach { case (v, r) =>
        assert(math.abs(r - want(v)) < 1e-12, s"node $v at iters=$iters")
      }
    }
  }

  test("12-iteration pageRank matches the model (lineage-truncation regression guard)") {
    // 12 iterations on a small mixed graph: correctness at depth AND an
    // implicit perf guard — before contribs were localCheckpoint'ed, the
    // per-iteration analysis walked an ever-deeper plan and 10+ iterations
    // took minutes regardless of data size; with truncation this test is
    // seconds. If it ever hangs, the lineage fix regressed.
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 4L), (2L, 6L), (7L, 1L)) // 7 dangles into the cycle
    val got = Graph.pageRank(edges.toDF("s", "t"), "s", "t", iters = 12)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = model(edges, 12, 0.85)
    assert(got.keySet == want.keySet)
    got.foreach { case (v, r) =>
      assert(math.abs(r - want(v)) < 1e-9, s"node $v: $r vs ${want(v)}")
    }
  }

  test("rank mass is conserved at 1 (dangling mass redistributed, not lost)") {
    val got = run(g, 5)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("all-dangling target side: a pure bipartite graph still sums to 1 and ranks in-link mass") {
    // 1,2,3 → 10 and 3 → 11: node 10 has three in-links, 11 one; both dangle.
    val bi = Seq((1L, 10L), (2L, 10L), (3L, 10L), (3L, 11L))
    val got = run(bi, 4)
    val want = model(bi, 4, 0.85)
    got.foreach { case (v, r) => assert(math.abs(r - want(v)) < 1e-12, s"node $v") }
    assert(got(10L) > got(11L))
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("hub gains rank: the node every other node links to ranks highest") {
    val star = Seq((1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (9L, 1L))
    val got = run(star, 5)
    assert(got(9L) === got.values.max)
  }

  test("damping and iteration validation") {
    intercept[IllegalArgumentException](run(g, 0))
    intercept[IllegalArgumentException](run(g, 3, d = 1.0))
  }

  test("pageRankTol converges to the fixed-point and matches a long fixed run") {
    val tol = 1e-9
    val got = Graph.pageRankTol(g.toDF("s", "t"), "s", "t", tol = tol, maxIters = 200)
      .as[(Long, Double)].collect().toMap
    // a long fixed-iteration run is within tol-scale of the same fixed point
    val fixed = run(g, 100)
    val l1 = got.keySet.map(k => math.abs(got(k) - fixed(k))).sum
    assert(l1 <= 10 * tol, s"L1(tol-run, 100-iter run) = $l1")
    assert(math.abs(got.values.sum - 1.0) < 1e-9, "rank mass must stay 1")
    // and it agrees with the driver model run to convergence
    val m = model(g, 100, 0.85)
    got.foreach { case (k, v) => assert(math.abs(v - m(k)) < 1e-7, s"node $k") }
  }

  test("pageRankTol refuses loudly when maxIters runs out before tol") {
    val e = intercept[IllegalArgumentException] {
      Graph.pageRankTol(g.toDF("s", "t"), "s", "t", tol = 1e-15, maxIters = 2)
    }
    assert(e.getMessage.contains("no convergence"), e.getMessage)
    intercept[IllegalArgumentException] {
      Graph.pageRankTol(g.toDF("s", "t"), "s", "t", tol = 0.0)
    }
  }

  test("null endpoints are dropped, not ranked") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)),
      (null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(3L)),
      (java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Long]))
      .toDF("s", "t")
    val got = Graph.pageRank(df, "s", "t", 2).as[(Long, Double)].collect().toMap
    assert(got.keySet === Set(1L, 2L))
  }

  test("returned vector survives forced cache eviction: recompute never walks a released checkpoint") {
    // the loop releases every intermediate checkpoint except the LAST —
    // the lineage the returned persisted frame recomputes through (ADVICE
    // r7 fix at Graph.scala). Evicting the returned cache forces exactly
    // that recomputation: if the live checkpoint had been released with
    // the others, this collect would die on a missing checkpoint block.
    val fixedFrame = Graph.pageRank(g.toDF("s", "t"), "s", "t", iters = 5)
    val before = fixedFrame.as[(Long, Double)].collect().toMap
    fixedFrame.unpersist(blocking = true) // forced eviction of every cached partition
    val after = fixedFrame.as[(Long, Double)].collect().toMap
    assert(after === before, "post-eviction recompute must reproduce the vector")

    val tolFrame = Graph.pageRankTol(g.toDF("s", "t"), "s", "t", tol = 1e-10, maxIters = 200)
    val beforeT = tolFrame.as[(Long, Double)].collect().toMap
    tolFrame.unpersist(blocking = true)
    val afterT = tolFrame.as[(Long, Double)].collect().toMap
    assert(afterT === beforeT, "tol path: post-eviction recompute must reproduce the vector")
  }
}
