package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bruteTopK orders by cosine desc with id tiebreak and excludes self") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.8f, 0.6f)),  // cos 0.8
      (2L, Array(1.0f, 0.1f)),  // cos ~0.995
      (3L, Array(0.0f, 1.0f)),  // cos 0
      (4L, Array(2.0f, 0.2f))   // same direction as 2 → same cosine, id tiebreak
    ).toDF("vec_id", "embedding")
    val got = Similarity.bruteTopK(vecs, "vec_id", "embedding",
      query = Seq(1.0, 0.0), k = 3, excludeId = Some(0L))
      .select("vec_id").as[Long].collect()
    assert(got === Seq(2L, 4L, 1L))
  }

  test("assignBuckets picks nearest centroid, lowest index on ties") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.05f)),
      (2L, Array(0.05f, 1.0f)),
      (3L, Array(1.0f, 1.0f)) // equidistant from both centroids → bucket 0
    ).toDF("vec_id", "embedding")
    val centroids = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val got = Similarity.assignBuckets(vecs, "vec_id", "embedding", centroids)
      .select("vec_id", "bucket").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 0))
  }

  test("kMeans: deterministic across runs, right shape, assigns all buckets") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val c1 = Similarity.kMeans(emb, "vec_id", "embedding", c = 4, iters = 2)
    val c2 = Similarity.kMeans(emb, "vec_id", "embedding", c = 4, iters = 2)
    assert(c1 === c2)
    assert(c1.length === 4 && c1.forall(_.length === 64))
    val buckets = Similarity.assignBuckets(emb, "vec_id", "embedding", c1)
      .select("bucket").distinct().as[Int].collect().toSet
    assert(buckets.nonEmpty && buckets.subsetOf((0 until 4).toSet))
  }

  test("kMeansTree: matches the columnar rounds; large-C dispatch works") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val columnar = Similarity.kMeans(emb, "vec_id", "embedding", c = 8, iters = 3)
    val tree = Similarity.kMeansTree(emb, "vec_id", "embedding", c = 8, iters = 3)
    assert(tree.length == 8 && tree.forall(_.length == 64))
    // same assignments + means modulo combine-order float jitter
    val maxDiff = columnar.zip(tree)
      .flatMap { case (a, b) => a.zip(b).map { case (x, y) => math.abs(x - y) } }
      .max
    assert(maxDiff < 1e-9, s"centroid drift $maxDiff")
    // c > 64 routes kMeans through the tree path and still converges
    val big = Similarity.kMeans(emb, "vec_id", "embedding", c = 70, iters = 1)
    assert(big.length == 70 && big.forall(_.length == 64))
  }

  test("IVF recall vs brute force on the sf0.001 embeddings corpus") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val byId = emb.where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val centroids = (0L until 8L).map(byId)
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", byId(0L), k = 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val ivf = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, byId(0L),
      nprobe = 2, k = 10, excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val recall = (brute & ivf).size.toDouble / brute.size
    assert(recall >= 0.5, s"IVF recall@10 too low: $recall (ivf=$ivf brute=$brute)")
  }

  test("LSH recall vs brute force; buckets deterministic across runs") {
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val brute = Similarity.bruteTopK(emb, "vec_id", "embedding", q, k = 10,
      excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    val recall = (brute & lsh).size.toDouble / brute.size
    assert(recall >= 0.3, s"LSH recall@10 too low: $recall (lsh=$lsh brute=$brute)")
    // determinism: identical plane seed → identical result set
    val again = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    assert(lsh == again)
    // the query's own bucket must contain the query vector itself
    val planes = Similarity.hyperplanes(10, q.length, 42L)
    val selfBucket = Similarity.lshBucket(col("embedding"), planes)
    val self = emb.where(col("vec_id") === 0L).select(selfBucket).as[Int].head()
    val qBucket = planes.zipWithIndex.map { case (p, j) =>
      if (p.zip(q).map { case (a, b) => a * b }.sum >= 0) 1 << j else 0
    }.sum
    assert(self == qBucket, "Scala-side and column-side bucket computation must agree")
  }

  test("multiprobe LSH: recall vs candidates-scanned across nprobe, clustered vectors") {
    // SURVEY §9 blamed the LSH recall floor on isotropic synthetic
    // vectors; cluster-structured data is what LSH exists for. Build 8
    // seeded Gaussian clusters and measure BOTH recall and candidate
    // count per nprobe — the multiprobe claim is "more recall per extra
    // bucket", so both sides of the trade are asserted.
    val rnd = new java.util.Random(5L)
    val dim = 64
    val centers = IndexedSeq.fill(8)(Array.fill(dim)(rnd.nextGaussian()))
    val vecs = (0 until 320).map { i =>
      val c = centers(i % 8)
      (i.toLong, c.map(x => (x + 0.25 * rnd.nextGaussian()).toFloat).toSeq)
    }
    val df = vecs.toDF("vec_id", "embedding").cache()
    val byTable = Similarity.hyperplanes(4 * 6, dim, 42L).grouped(4).toSeq
    val qIds = Seq(0L, 3L, 10L, 17L, 21L, 30L)
    val stats = (1 to 3).map { np =>
      var rec = 0.0
      var cand = 0L
      qIds.foreach { qid =>
        val q = vecs(qid.toInt)._2.map(_.toDouble)
        val brute = Similarity.bruteTopK(df, "vec_id", "embedding", q, 10, Some(qid))
          .select("vec_id").as[Long].collect().toSet
        val got = Similarity.lshTopK(df, "vec_id", "embedding", q,
            bitsPerTable = 4, tables = 6, seed = 42L, k = 10,
            excludeId = Some(qid), nprobe = np)
          .select("vec_id").as[Long].collect().toSet
        rec += (got & brute).size.toDouble / brute.size
        val cond = byTable.map { planes =>
          Similarity.lshBucket(col("embedding"), planes)
            .isin(Similarity.multiprobeBuckets(planes, q, np): _*)
        }.reduce(_ || _)
        cand += df.where(cond).count()
      }
      (rec / qIds.size, cand / qIds.size)
    }
    val recalls = stats.map(_._1)
    val cands = stats.map(_._2)
    // recall climbs monotonically and clears the 0.8 bar by nprobe=2
    assert(recalls(0) <= recalls(1) && recalls(1) <= recalls(2), recalls.toString)
    assert(recalls(1) >= 0.8, s"multiprobe np=2 recall ${recalls(1)} < 0.8 ($recalls)")
    // ... at bounded candidate cost: probing np buckets per table scans at
    // most np× (and strictly more than 1×) the exact-bucket candidates
    assert(cands(0) < cands(1) && cands(1) < cands(2), cands.toString)
    assert(cands(1) <= 2 * cands(0) && cands(2) <= 3 * cands(0), cands.toString)
    // IVF on the same clustered corpus: the operator reaches ~full recall
    // when neighbor structure exists (the sf embeddings' mean ivf recall
    // is data-limited — their true top-10 neighbors share the query's
    // cluster label only ~16% of the time, so ANY fixed coarse partition
    // degrades toward its scan fraction there; this pins that the
    // OPERATOR, not the data, is sound)
    val cents = Similarity.kMeans(df, "vec_id", "embedding", c = 8, iters = 3)
    var ivfRec = 0.0
    qIds.foreach { qid =>
      val q = vecs(qid.toInt)._2.map(_.toDouble)
      val brute = Similarity.bruteTopK(df, "vec_id", "embedding", q, 10, Some(qid))
        .select("vec_id").as[Long].collect().toSet
      val got = Similarity.ivfTopK(df, "vec_id", "embedding", cents, q, 2, 10, Some(qid))
        .select("vec_id").as[Long].collect().toSet
      ivfRec += (got & brute).size.toDouble / brute.size
    }
    assert(ivfRec / qIds.size >= 0.9,
      s"IVF recall on clustered vectors: ${ivfRec / qIds.size}")
    df.unpersist()
    // probe-sequence properties: head is the exact bucket, perturbations
    // are hamming-1, no duplicates, margin order is deterministic
    val q0 = vecs(0)._2.map(_.toDouble)
    val probes = Similarity.multiprobeBuckets(byTable.head, q0, 5)
    assert(probes.size == 5 && probes.distinct.size == 5)
    probes.tail.foreach(b =>
      assert(java.lang.Integer.bitCount(b ^ probes.head) == 1, probes.toString))
    assert(probes == Similarity.multiprobeBuckets(byTable.head, q0, 5))
  }

  // Walk through AQE wrappers and materialized query stages to every scan.
  private def allScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(allScans)
  }

  private def parquetFilesUnder(dir: java.io.File): Seq[java.io.File] = {
    val here = Option(dir.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
    here.filter(f => f.isFile && f.getName.endsWith(".parquet")) ++
      here.filter(_.isDirectory).flatMap(parquetFilesUnder)
  }

  test("VectorIndex quantized IVF: per-element error bound holds, recall tracks float index") {
    import graft.operators.VectorIndex
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val centroids = Similarity.kMeans(emb, "vec_id", "embedding", c = 8, iters = 2)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfq8").toString
    VectorIndex.writeIvfQuantized(emb, "vec_id", "embedding", centroids, path)

    // storage really is int8 + one float scale
    val stored = spark.read.parquet(s"$path/corpus")
    assert(stored.schema("q8").dataType ===
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.ByteType))

    // deterministic reconstruction bound: |x - q*scale/127| <= scale/254 (+eps)
    val bad = stored.join(emb, "vec_id")
      .select(expr(
        """exists(zip_with(embedding, q8, (x, q) ->
          |  abs(cast(x as double) - cast(q as double) * scale / 127.0)
          |    > scale / 254.0 + 1e-9), b -> b)""".stripMargin).as("viol"))
      .where(col("viol")).count()
    assert(bad === 0L, "quantization error bound violated")

    // probing EVERY bucket isolates pure quantization effect on the ranking
    val q = emb.where(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0).map(_.toDouble).toSeq
    val qTop = VectorIndex.ivfTopKQuantized(spark, path, "vec_id", q,
      nprobe = 8, k = 10, excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    val fTop = Similarity.bruteTopK(emb, "vec_id", "embedding", q,
      k = 10, excludeId = Some(0L)).select("vec_id").as[Long].collect().toSet
    assert((qTop & fTop).size >= 8, s"recall@10 too low: ${(qTop & fTop).size}/10")
  }

  test("VectorIndex IVF: probe equals unindexed IVF and scans only nprobe buckets") {
    import graft.operators.VectorIndex
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val byId = emb.where(col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val centroids = (0L until 8L).map(byId)
    val q = byId(0L)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfidx").toString

    VectorIndex.writeIvf(emb, "vec_id", "embedding", centroids, path)
    assert(VectorIndex.readIvfCentroids(spark, path) == centroids,
      "centroid sidecar must round-trip")

    val indexed = VectorIndex.ivfTopK(spark, path, "vec_id", "embedding",
      q, nprobe = 2, k = 10, excludeId = Some(0L))
    val got = indexed.select("vec_id").as[Long].collect().toSeq
    val want = Similarity.ivfTopK(emb, "vec_id", "embedding", centroids, q,
      nprobe = 2, k = 10, excludeId = Some(0L)).select("vec_id").as[Long].collect().toSeq
    assert(got == want, "indexed probe must return the unindexed IVF result")

    // the hard scale property: the scan reads ONLY the probed bucket dirs
    indexed.collect()
    val scan = allScans(indexed.queryExecution.executedPlan).head
    val corpus = new java.io.File(s"$path/corpus")
    val allBuckets = corpus.listFiles().filter(_.getName.startsWith("bucket=")).toSeq
    assert(allBuckets.size > 2, s"fixture must have >nprobe buckets, got ${allBuckets.size}")
    val totalFiles = parquetFilesUnder(corpus).size
    val filesRead = scan.metrics("numFiles").value
    assert(filesRead < totalFiles,
      s"probe scanned the whole corpus: $filesRead of $totalFiles files")
    // exactly the files under the 2 cosine-nearest bucket directories
    val probedFiles = allBuckets.sortBy(_.getName)
      .map(b => b.getName.stripPrefix("bucket=").toInt -> parquetFilesUnder(b).size).toMap
    assert(scan.metadata("PartitionFilters").contains("bucket"),
      scan.metadata.toString)
    val twoSmallestPossible = probedFiles.values.toSeq.sorted.take(2).sum
    val twoLargestPossible = probedFiles.values.toSeq.sorted.takeRight(2).sum
    assert(filesRead >= twoSmallestPossible && filesRead <= twoLargestPossible,
      s"filesRead=$filesRead outside any-2-bucket range [$twoSmallestPossible,$twoLargestPossible]")
  }

  test("VectorIndex IVF append: new vectors land pruned-probe-visible, no rebuild") {
    import graft.operators.VectorIndex
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val byId = emb.where(col("vec_id") < 4)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val centroids = (0L until 4L).map(byId)
    val q = byId(0L)
    val path = java.nio.file.Files.createTempDirectory("graft-ivfapp").toString
    val base = emb.where(col("vec_id") < 100)
    val batch = emb.where(col("vec_id") >= 100 && col("vec_id") < 150)

    VectorIndex.writeIvf(base, "vec_id", "embedding", centroids, path)
    VectorIndex.appendIvf(batch, "vec_id", "embedding", path)

    // append must be invisible vs a full build over the union
    val full = java.nio.file.Files.createTempDirectory("graft-ivffull").toString
    VectorIndex.writeIvf(emb.where(col("vec_id") < 150), "vec_id", "embedding", centroids, full)
    def probe(p: String) = VectorIndex.ivfTopK(spark, p, "vec_id", "embedding",
        q, nprobe = 2, k = 15, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(probe(path) == probe(full),
      "appended index must answer exactly like a full rebuild")
    // and the appended rows are actually reachable (some id >= 100 in top-15
    // of SOME probe — use a batch vector as its own query, rank 1 = itself)
    val q120 = emb.where(col("vec_id") === 120L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val self = VectorIndex.ivfTopK(spark, path, "vec_id", "embedding",
        q120, nprobe = 4, k = 1)
      .select("vec_id").as[Long].collect()
    assert(self.headOption.contains(120L), "appended vector must be findable")
  }

  test("VectorIndex LSH append: identical to a full rebuild, batch findable") {
    import graft.operators.VectorIndex
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val inc = java.nio.file.Files.createTempDirectory("graft-lshapp").toString
    val full = java.nio.file.Files.createTempDirectory("graft-lshfull").toString
    VectorIndex.writeLsh(emb.where(col("vec_id") < 100), "vec_id", "embedding",
      bitsPerTable = 3, tables = 4, seed = 7L, path = inc)
    VectorIndex.appendLsh(emb.where(col("vec_id") >= 100 && col("vec_id") < 150),
      "vec_id", "embedding", inc)
    VectorIndex.writeLsh(emb.where(col("vec_id") < 150), "vec_id", "embedding",
      bitsPerTable = 3, tables = 4, seed = 7L, path = full)
    def probe(p: String) = VectorIndex.lshTopK(spark, p, "vec_id", "embedding",
        q, k = 15, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSeq
    assert(probe(inc) == probe(full),
      "appended LSH index must answer exactly like a full rebuild")
    val q130 = emb.where(col("vec_id") === 130L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val self = VectorIndex.lshTopK(spark, inc, "vec_id", "embedding", q130, k = 1)
      .select("vec_id").as[Long].collect()
    assert(self.headOption.contains(130L), "appended vector must be findable")
  }

  test("VectorIndex LSH: probe equals unindexed LSH and scans only the tables' buckets") {
    import graft.operators.VectorIndex
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val q = emb.where(col("vec_id") === 0L)
      .select("embedding").collect()(0).getSeq[Float](0).map(_.toDouble).toSeq
    val path = java.nio.file.Files.createTempDirectory("graft-lshidx").toString

    VectorIndex.writeLsh(emb, "vec_id", "embedding",
      bitsPerTable = 4, tables = 6, seed = 42L, path = path)
    val indexed = VectorIndex.lshTopK(spark, path, "vec_id", "embedding",
      q, k = 10, excludeId = Some(0L))
    val got = indexed.select("vec_id").as[Long].collect().toSet
    val want = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L))
      .select("vec_id").as[Long].collect().toSet
    assert(got == want, "indexed probe must return the unindexed LSH result")

    indexed.collect()
    val scan = allScans(indexed.queryExecution.executedPlan).head
    val corpus = new java.io.File(s"$path/corpus")
    val totalFiles = parquetFilesUnder(corpus).size
    val filesRead = scan.metrics("numFiles").value
    // 6 tables × 1 bucket each out of 6×2^4 = 96 partitions
    assert(filesRead < totalFiles / 4,
      s"probe scanned too much: $filesRead of $totalFiles files")
    assert(scan.metadata("PartitionFilters").contains("bucket"), scan.metadata.toString)

    // multiprobe (nprobe=2): indexed equals unindexed, and the scan grows
    // to at most 2× the exact-probe directories — still partition-pruned
    val indexed2 = VectorIndex.lshTopK(spark, path, "vec_id", "embedding",
      q, k = 10, excludeId = Some(0L), nprobe = 2)
    val got2 = indexed2.select("vec_id").as[Long].collect().toSet
    val want2 = Similarity.lshTopK(emb, "vec_id", "embedding", q,
      bitsPerTable = 4, tables = 6, seed = 42L, k = 10, excludeId = Some(0L),
      nprobe = 2).select("vec_id").as[Long].collect().toSet
    assert(got2 == want2, "indexed multiprobe must return the unindexed result")
    indexed2.collect()
    val files2 = allScans(indexed2.queryExecution.executedPlan).head
      .metrics("numFiles").value
    assert(files2 >= filesRead && files2 <= 2 * filesRead,
      s"multiprobe np=2 read $files2 files vs $filesRead at np=1")

    // a sparse index (3 vectors → ≤18 occupied of 96 partitions): probing
    // buckets whose directories were never written prunes to nothing
    // instead of erroring on the missing paths
    val tiny = Seq(
      (1L, Array.tabulate(64)(i => if (i % 2 == 0) 1.0f else -1.0f)),
      (2L, Array.tabulate(64)(i => (i % 5).toFloat - 2f)),
      (3L, Array.fill(64)(1.0f))).toDF("vec_id", "embedding")
    val sparsePath = java.nio.file.Files.createTempDirectory("graft-lshsparse").toString
    VectorIndex.writeLsh(tiny, "vec_id", "embedding",
      bitsPerTable = 4, tables = 6, seed = 42L, path = sparsePath)
    val sparse = VectorIndex.lshTopK(spark, sparsePath, "vec_id", "embedding",
      Array.tabulate(64)(i => math.sin(i + 1.0)).toSeq, k = 5)
      .select("vec_id").as[Long].collect().toSet
    assert(sparse.subsetOf(Set(1L, 2L, 3L)), sparse.toString)
  }

  test("VectorIndex.compact: appended bucket files collapse, probes unchanged") {
    import graft.operators.{Similarity, VectorIndex}
    val dir = "/root/testdata/sf0.001"
    val emb = graft.core.Tables.load(spark, dir, "embeddings")
    val path = java.nio.file.Files.createTempDirectory("graft-vcmp").toString + "/idx"
    val centroids = Similarity.kMeans(emb, "vec_id", "embedding", c = 4, iters = 1)
    val q = emb.where(col("vec_id") === 1L).select("embedding")
      .head().getSeq[Float](0).map(_.toDouble).toSeq
    VectorIndex.writeIvf(emb.where(col("vec_id") % 3 === 0), "vec_id", "embedding", centroids, path)
    VectorIndex.appendIvf(emb.where(col("vec_id") % 3 === 1), "vec_id", "embedding", path)
    VectorIndex.appendIvf(emb.where(col("vec_id") % 3 === 2), "vec_id", "embedding", path)
    def probe() = VectorIndex.ivfTopK(spark, path, "vec_id", "embedding", q,
      nprobe = 2, k = 10, excludeId = Some(1L)).select("vec_id").as[Long].collect().toSeq
    val before = probe()
    val corpusDir = new java.io.File(s"$path/corpus")
    val filesBefore = parquetFilesUnder(corpusDir).size
    VectorIndex.compact(spark, path)
    val filesAfter = parquetFilesUnder(corpusDir).size
    val bucketDirs = corpusDir.listFiles().count(_.getName.startsWith("bucket="))
    assert(filesAfter < filesBefore && filesAfter == bucketDirs,
      s"$filesBefore -> $filesAfter over $bucketDirs buckets")
    assert(probe() == before)
    assert(before.nonEmpty)
  }

  test("lshTopKPlanes with planted axis-difference planes == driver model (q158 fixture)") {
    // The q158 oracle's load-bearing identities: with plane p = e_{2p} −
    // e_{2p+1}, each sign bit is exactly v[2p] − v[2p+1] >= 0, and the
    // nprobe=2 multiprobe flip is the lowest-|margin| plane (lowest-index
    // ties). The injected-planes entry point must equal a plain driver
    // model of buckets + probes + brute re-rank over candidates.
    val rnd = new java.util.Random(29L)
    val vecs = (0 until 240).map(i => (i.toLong, Seq.fill(64)(rnd.nextGaussian().toFloat)))
    val df = vecs.toDF("vec_id", "embedding")
    val query = vecs.head._2.map(_.toDouble)
    val planes = QueryFixtures.lshGridPlanes
    val got = Similarity.lshTopKPlanes(df, "vec_id", "embedding", query, planes,
      k = 10, excludeId = Some(0L), nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSeq

    def buckets(v: Seq[Double]): Seq[Int] = (0 until 6).map { t =>
      (0 until 4).map { b =>
        val p = 4 * t + b
        if (v(2 * p) - v(2 * p + 1) >= 0) 1 << b else 0
      }.sum
    }
    val qDiffs = (0 until 24).map(p => query(2 * p) - query(2 * p + 1))
    val qBkts = buckets(query)
    val probes: Seq[Set[Int]] = (0 until 6).map { t =>
      val flipB = (0 until 4).minBy(b => (math.abs(qDiffs(4 * t + b)), b))
      Set(qBkts(t), qBkts(t) ^ (1 << flipB))
    }
    val cand = vecs.filter { case (id, v) =>
      id != 0L && buckets(v.map(_.toDouble)).zip(probes).exists { case (bk, pr) => pr(bk) }
    }
    def cos(v: Seq[Double]): Double = {
      val d = v.zip(query).map { case (a, b) => a * b }.sum
      d / (math.sqrt(v.map(x => x * x).sum) * math.sqrt(query.map(x => x * x).sum))
    }
    val want = cand
      .map { case (id, v) =>
        (id, BigDecimal(cos(v.map(_.toDouble)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
    assert(got == want, s"got=$got want=$want")
    assert(got.nonEmpty)
  }
}
