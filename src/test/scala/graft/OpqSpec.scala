package graft

import graft.operators.{Opq, ProductQuantizer, Similarity}
import org.scalatest.funsuite.AnyFunSuite

class OpqSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // Anisotropic clustered fixture — the data shape OPQ exists for: an
  // 8-dim clustered latent with decaying variance, embedded in 64 dims
  // through a FIXED dense rotation so every subspace of the naive
  // dimension split sees correlated mixtures (plain PQ's worst case).
  private lazy val fixture: (Seq[(Long, Seq[Float])], org.apache.spark.sql.DataFrame) = {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(11L)
    val dim = 64
    val latentDim = 8
    // fixed orthonormal 64x64 basis via Gram-Schmidt over seeded Gaussians
    val basis = {
      val raw = Array.fill(dim)(Array.fill(dim)(rnd.nextGaussian()))
      for (i <- 0 until dim) {
        for (j <- 0 until i) {
          val d = raw(i).zip(raw(j)).map { case (a, b) => a * b }.sum
          for (k <- 0 until dim) raw(i)(k) -= d * raw(j)(k)
        }
        val n = math.sqrt(raw(i).map(x => x * x).sum)
        for (k <- 0 until dim) raw(i)(k) /= n
      }
      raw
    }
    val centers = IndexedSeq.fill(8)(Array.fill(latentDim)(rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 8)
      // latent: clustered in 8 dims, then fast-decaying noise dims
      val z = Array.tabulate(dim) { d =>
        if (d < latentDim) c(d) + 0.2 * rnd.nextGaussian()
        else 0.5 / (d - latentDim + 2) * rnd.nextGaussian()
      }
      // embed: x = Bᵀ z — spreads every latent dim across all subspaces
      val x = Array.tabulate(dim)(k => basis.indices.map(d => basis(d)(k) * z(d)).sum)
      (i.toLong, x.map(_.toFloat).toSeq)
    }
    (vecs, vecs.toDF("vec_id", "embedding").cache())
  }

  test("rotation is orthogonal, norm-preserving, and deterministic") {
    val (_, df) = fixture
    val model = Opq.train(df, "vec_id", "embedding", m = 4, k = 16)
    val d = model.d
    // RᵀR = I
    for (i <- 0 until d; j <- 0 until d) {
      val dot = (0 until d).map(r => model.rotFlat(r * d + i) * model.rotFlat(r * d + j)).sum
      assert(math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-9, s"RtR($i,$j)=$dot")
    }
    // column mat-vec == driver rotate, and norms survive
    val s = spark
    import s.implicits._
    val rows = df.limit(5).select(
      org.apache.spark.sql.functions.col("embedding"),
      model.rotateCol(org.apache.spark.sql.functions.col("embedding")).as("r"))
      .as[(Seq[Float], Seq[Double])].collect()
    rows.foreach { case (v, rv) =>
      val expect = model.rotate(v.map(_.toDouble))
      rv.zip(expect).foreach { case (a, b) => assert(math.abs(a - b) < 1e-12) }
      val n0 = math.sqrt(v.map(x => x.toDouble * x).sum)
      val n1 = math.sqrt(rv.map(x => x * x).sum)
      assert(math.abs(n0 - n1) < 1e-9, s"rotation changed the norm: $n0 -> $n1")
    }
    // deterministic under repartitioning (sample is an id-ordered TakeOrdered)
    val again = Opq.train(df.repartition(7), "vec_id", "embedding", m = 4, k = 16)
    assert(model.rotFlat.toSeq == again.rotFlat.toSeq)
    assert(model.pq.books == again.pq.books)
  }

  test("OPQ lifts raw ADC recall over plain PQ on anisotropic data; rerank >= 0.9") {
    val s = spark
    import s.implicits._
    val (vecs, df) = fixture
    val plain = ProductQuantizer.train(df, "vec_id", "embedding", m = 4, k = 16, iters = 2)
    val encP = ProductQuantizer.encode(df, "vec_id", "embedding", plain).cache()
    val opq = Opq.train(df, "vec_id", "embedding", m = 4, k = 16)
    val encO = Opq.encode(df, "vec_id", "embedding", opq).cache()
    val qIds = Seq(0L, 3L, 10L, 17L, 21L, 30L)
    var rPlain = 0.0
    var rOpq = 0.0
    var rRerank = 0.0
    qIds.foreach { qid =>
      val q = vecs(qid.toInt)._2.map(_.toDouble)
      val brute = Similarity.bruteTopK(df, "vec_id", "embedding", q, 10, Some(qid))
        .select("vec_id").as[Long].collect().toSet
      def r(ids: Set[Long]) = (ids & brute).size.toDouble / brute.size
      rPlain += r(ProductQuantizer.adcTopK(encP, "vec_id", plain, q, 10, Some(qid))
        .select("vec_id").as[Long].collect().toSet)
      rOpq += r(Opq.adcTopK(encO, "vec_id", opq, q, 10, Some(qid))
        .select("vec_id").as[Long].collect().toSet)
      rRerank += r(Opq.rerankTopK(df, "vec_id", "embedding", encO, opq, q,
          k = 10, shortlist = 60, excludeId = Some(qid))
        .select("vec_id").as[Long].collect().toSet)
    }
    rPlain /= qIds.size; rOpq /= qIds.size; rRerank /= qIds.size
    info(s"raw ADC recall@10: plain=$rPlain opq=$rOpq; opq rerank=$rRerank")
    assert(rOpq > rPlain + 0.05,
      s"OPQ must beat plain PQ's codes on anisotropic data: $rOpq vs $rPlain")
    assert(rRerank >= 0.9, s"OPQ shortlist+rerank recall too low: $rRerank")
    encP.unpersist(); encO.unpersist(); ()
  }

  test("codes are the driver-side assignment of the rotated vectors") {
    val (vecs, df) = fixture
    val opq = Opq.train(df, "vec_id", "embedding", m = 4, k = 16)
    val got = Opq.encode(df, "vec_id", "embedding", opq)
      .collect().map(r => r.getLong(0) -> r.getSeq[Byte](1)).toMap
    def cell(j: Int, sv: Seq[Double]): Int =
      opq.pq.books(j).zipWithIndex.maxBy { case (c, i) =>
        (c.zip(sv).map { case (a, b) => a * b }.sum - c.map(x => x * x).sum / 2, -i)
      }._2
    vecs.take(40).foreach { case (id, v) =>
      val rv = opq.rotate(v.map(_.toDouble))
      val expect = (0 until 4).map(j => cell(j, rv.slice(j * 16, (j + 1) * 16)).toByte)
      assert(got(id) == expect, s"id=$id")
    }
  }

  test("full-byte budget: k=256 codes at the same 4-byte payload") {
    val (_, df) = fixture
    val opq = Opq.train(df, "vec_id", "embedding", m = 4, k = 256)
    assert(opq.pq.k == 256)
    val enc = Opq.encode(df, "vec_id", "embedding", opq)
    val codes = enc.select("pq_code").collect().map(_.getSeq[Byte](0))
    assert(codes.forall(_.length == 4), "4 tinyints per row — the same budget as k=16")
    assert(enc.schema("pq_code").dataType.simpleString == "array<tinyint>")
  }

  // Fixture for the ROTATED-RESIDUAL claim: the main fixture's anisotropy
  // lives in the cluster centers, which the coarse centroids absorb — its
  // residuals are near-isotropic and a rotation buys nothing there
  // (measured: OPQ-residual 0.22 vs plain-residual 0.28, a wash). Here the
  // centers separate cleanly (the coarse quantizer's job) and the RESIDUAL
  // itself is a basis-mixed decaying-variance latent — anisotropy the
  // centroids cannot absorb, exactly what composing OPQ into the residual
  // index is for.
  private lazy val residualFixture: (Seq[(Long, Seq[Float])], org.apache.spark.sql.DataFrame) = {
    val s = spark
    import s.implicits._
    val rnd = new java.util.Random(13L)
    val dim = 64
    val basis = {
      val raw = Array.fill(dim)(Array.fill(dim)(rnd.nextGaussian()))
      for (i <- 0 until dim) {
        for (j <- 0 until i) {
          val d = raw(i).zip(raw(j)).map { case (a, b) => a * b }.sum
          for (k <- 0 until dim) raw(i)(k) -= d * raw(j)(k)
        }
        val n = math.sqrt(raw(i).map(x => x * x).sum)
        for (k <- 0 until dim) raw(i)(k) /= n
      }
      raw
    }
    val centers = IndexedSeq.fill(8)(Array.fill(dim)(3.0 * rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 8)
      val z = Array.tabulate(dim) { d =>
        if (d < 8) rnd.nextGaussian() else 0.05 * rnd.nextGaussian()
      }
      val x = Array.tabulate(dim) { k =>
        c(k) + basis.indices.map(d => basis(d)(k) * z(d)).sum
      }
      (i.toLong, x.map(_.toFloat).toSeq)
    }
    (vecs, vecs.toDF("vec_id", "embedding").cache())
  }

  test("OPQ composes into the materialized IVF-PQ index: sidecar, append, recall") {
    import graft.operators.VectorIndex
    import org.apache.spark.sql.functions.col
    val s = spark
    import s.implicits._
    val (vecs, df) = residualFixture
    val centroids = Similarity.kMeans(df, "vec_id", "embedding", c = 8, iters = 2)
    val opq = VectorIndex.trainResidualOpq(df, "vec_id", "embedding", centroids, m = 4, k = 16)
    val plain = VectorIndex.trainResidualPq(df, "vec_id", "embedding", centroids, m = 4, k = 16, iters = 8)

    val pathO = java.nio.file.Files.createTempDirectory("graft-ivfpqopq").toString
    val pathP = java.nio.file.Files.createTempDirectory("graft-ivfpqres").toString
    VectorIndex.writeIvfPqOpq(df, "vec_id", "embedding", centroids, opq, pathO, residual = true)
    VectorIndex.writeIvfPq(df, "vec_id", "embedding", centroids, plain, pathP, residual = true)

    // all three sidecars round-trip from the path alone
    val rot = VectorIndex.readOpqRotation(spark, pathO)
    assert(rot.isDefined, "OPQ index must carry a rotation sidecar")
    assert(rot.get._1 == 64 && rot.get._2.toSeq == opq.rotFlat.toSeq,
      "rotation must round-trip exactly")
    assert(VectorIndex.readPqMeta(spark, pathO).books == opq.pq.books)
    assert(VectorIndex.readPqResidual(spark, pathO))
    assert(VectorIndex.readOpqRotation(spark, pathP).isEmpty,
      "a plain index must read as unrotated")

    // shortlist == k isolates code quality: the rotated residual codes
    // must beat unrotated residual codes on the anisotropic fixture, at
    // the SAME byte budget through the SAME probe plan
    val qIds = Seq(0L, 3L, 10L, 17L, 21L, 30L)
    def recallOf(path: String, shortlist: Int): Double = {
      var r = 0.0
      qIds.foreach { qid =>
        val q = vecs(qid.toInt)._2.map(_.toDouble)
        val brute = Similarity.bruteTopK(df, "vec_id", "embedding", q, 10, Some(qid))
          .select("vec_id").as[Long].collect().toSet
        val got = VectorIndex.ivfTopKPq(spark, path, "vec_id", "embedding", q,
            nprobe = 8, k = 10, shortlist = shortlist, excludeId = Some(qid))
          .select("vec_id").as[Long].collect().toSet
        r += (got & brute).size.toDouble / brute.size
      }
      r / qIds.size
    }
    val (rp, ro) = (recallOf(pathP, 10), recallOf(pathO, 10))
    info(s"raw-ADC recall@10 inside the index: plain-residual=$rp opq-residual=$ro")
    assert(ro > rp + 0.05,
      s"OPQ-composed index ($ro) must beat plain residual ($rp) on anisotropic data")
    assert(recallOf(pathO, 60) >= 0.9, "deployed shortlist+rerank recall floor")

    // append composes through the rotation: half-build + append == one-shot
    // build, byte-equal probe output
    val pathA = java.nio.file.Files.createTempDirectory("graft-ivfpqopq-app").toString
    VectorIndex.writeIvfPqOpq(df.where(col("vec_id") < 160), "vec_id", "embedding",
      centroids, opq, pathA, residual = true)
    VectorIndex.appendIvfPq(df.where(col("vec_id") >= 160), "vec_id", "embedding", pathA)
    val q3 = vecs(3)._2.map(_.toDouble)
    def probeRows(path: String) =
      VectorIndex.ivfTopKPq(spark, path, "vec_id", "embedding", q3,
          nprobe = 8, k = 10, shortlist = 60, excludeId = Some(3L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(probeRows(pathA) == probeRows(pathO),
      "appended index must probe identically to the one-shot build")

    // stale-sidecar guard: a plain rewrite at the same path removes the
    // rotation, so probes never rotate against fresh unrotated codes
    VectorIndex.writeIvfPq(df, "vec_id", "embedding", centroids, plain, pathO, residual = true)
    assert(VectorIndex.readOpqRotation(spark, pathO).isEmpty,
      "plain rewrite must clear the rotation sidecar")
  }

  test("a partially published OPQ index fails loudly, and publishes clear the marker") {
    import graft.operators.VectorIndex
    val (_, df) = residualFixture
    val centroids = Similarity.kMeans(df, "vec_id", "embedding", c = 8, iters = 2)
    val opq = VectorIndex.trainResidualOpq(df, "vec_id", "embedding", centroids, m = 4, k = 16)
    val path = java.nio.file.Files.createTempDirectory("graft-opq-pending").toString
    VectorIndex.writeIvfPqOpq(df, "vec_id", "embedding", centroids, opq, path, residual = true)
    // completed publish leaves no marker, probes fine
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_opq_pending")))
    assert(VectorIndex.readOpqRotation(spark, path).isDefined)
    // simulate the crash window: rotated codes on disk, sidecar gone,
    // marker still standing — the exact state the round-8 ADVICE flagged
    // as silently mis-decoding
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/opqmeta"), true)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_opq_pending"), true).close()
    val err = intercept[IllegalArgumentException] {
      VectorIndex.readOpqRotation(spark, path)
    }
    assert(err.getMessage.contains("partially published"))
    // re-running the publish repairs the index end-to-end
    VectorIndex.writeIvfPqOpq(df, "vec_id", "embedding", centroids, opq, path, residual = true)
    assert(VectorIndex.readOpqRotation(spark, path).isDefined)
    // and a completed PLAIN publish over a crashed OPQ one also clears it
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_opq_pending"), true).close()
    val plain = VectorIndex.trainResidualPq(df, "vec_id", "embedding", centroids, m = 4, k = 16, iters = 2)
    VectorIndex.writeIvfPq(df, "vec_id", "embedding", centroids, plain, path, residual = true)
    assert(VectorIndex.readOpqRotation(spark, path).isEmpty)
  }

  test("repairIvfPqOpq: crash → refuse → repair → probe, in every torn state") {
    import graft.operators.VectorIndex
    import org.apache.spark.sql.functions.col
    val (_, df) = residualFixture
    val centroids = Similarity.kMeans(df, "vec_id", "embedding", c = 8, iters = 2)
    val opq = VectorIndex.trainResidualOpq(df, "vec_id", "embedding", centroids, m = 4, k = 16)
    val q = df.where(col("vec_id") === 3L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    def probeRows(path: String) =
      VectorIndex.ivfTopKPq(spark, path, "vec_id", "embedding", q,
          nprobe = 8, k = 10, shortlist = 60, excludeId = Some(3L))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft-opq-repair").toString
    VectorIndex.writeIvfPqOpq(df, "vec_id", "embedding", centroids, opq, path, residual = true)
    val healthyProbe = probeRows(path)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def markPending(): Unit =
      fs.create(new org.apache.hadoop.fs.Path(s"$path/_opq_pending"), true).close()

    // no marker → nothing to repair, refuse rather than churn a live index
    val errNone = intercept[IllegalArgumentException] {
      VectorIndex.repairIvfPqOpq(spark, path, "vec_id", "embedding")
    }
    assert(errNone.getMessage.contains("nothing to repair"))

    // torn state A — crash right after the marker, everything else intact:
    // repair republishes the SAME index (probe is byte-identical)
    markPending()
    intercept[IllegalArgumentException] { probeRows(path) } // refuses while torn
    VectorIndex.repairIvfPqOpq(spark, path, "vec_id", "embedding")
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_opq_pending")))
    assert(probeRows(path) == healthyProbe,
      "repair of a marker-only tear must republish the identical index")

    // torn state B — the r8-ADVICE window: rotation sidecar gone, codes
    // still rotated, marker standing. Repair re-encodes from raw vectors,
    // landing a CONSISTENT plain-coded index — byte-identical probes to a
    // one-shot plain build with the same books
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/opqmeta"), true)
    markPending()
    VectorIndex.repairIvfPqOpq(spark, path, "vec_id", "embedding")
    assert(VectorIndex.readOpqRotation(spark, path).isEmpty,
      "a tear that lost the rotation must repair to a plain index")
    val pathPlain = java.nio.file.Files.createTempDirectory("graft-opq-repair-p").toString
    VectorIndex.writeIvfPq(df, "vec_id", "embedding", centroids, opq.pq, pathPlain, residual = true)
    assert(probeRows(path) == probeRows(pathPlain),
      "repaired plain index must probe identically to a one-shot plain build")

    // torn state C — the r10-ADVICE window: the crash hit INSIDE the
    // corpus job commit itself (partially committed part files, no
    // _SUCCESS receipt). Repair must REFUSE — re-encoding a partial row
    // set would republish a hole-y index as sound — and direct the caller
    // at a publish re-run, which is what restores service.
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/corpus/_SUCCESS"), false)
    markPending()
    val errTorn = intercept[IllegalArgumentException] {
      VectorIndex.repairIvfPqOpq(spark, path, "vec_id", "embedding")
    }
    assert(errTorn.getMessage.contains("_SUCCESS"), errTorn.getMessage)
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(path, "_opq_pending")),
      "a refused repair must leave the marker standing (the path stays loud)")
    VectorIndex.writeIvfPqOpq(df, "vec_id", "embedding", centroids, opq, path, residual = true)
    assert(probeRows(path) == healthyProbe,
      "the directed remedy (publish re-run) must restore the healthy index")
  }

  test("planted reversal rotation (q160 fixture): mat-vec == exact element reversal") {
    // The q160 oracle's load-bearing identity: with a permutation matrix
    // the codegen'd mat-vec fold produces EXACTLY the permuted elements
    // (±0.0 terms never move the accumulator), so DuckDB's list_reverse
    // replays the rotation bit for bit — both the column path (rotateCol
    // over doubles and floats) and the driver path (rotate).
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val pq = ProductQuantizer.PqModel(m = 4, dsub = 16, graft.QueryFixtures.pqGridBooks)
    val opq = Opq.OpqModel(64, graft.QueryFixtures.reversalRotation, pq)
    val rnd = new java.util.Random(31L)
    val vecs = Seq.fill(20)(Seq.fill(64)(rnd.nextGaussian().toFloat))
    val gotCol = vecs.toDF("v")
      .select(opq.rotateCol(col("v")).as("r"))
      .collect().map(_.getSeq[Double](0))
    vecs.zip(gotCol).foreach { case (v, r) =>
      assert(r == v.reverse.map(_.toDouble), "column mat-vec must equal exact reversal")
    }
    val q = Seq.tabulate(64)(i => (i - 31.5) / 10.0)
    assert(opq.rotate(q) == q.reverse, "driver rotate must equal exact reversal")
  }
}
