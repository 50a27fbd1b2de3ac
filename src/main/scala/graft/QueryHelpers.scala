package graft

import graft.core.Tables
import graft.multimodal.Binary
import graft.operators.{AsOfJoin, Bucketing, Checks, Classifier, Curation, Dedup, Funnel, GlobalIndex, Graph, Importance, IntervalJoin, LanguageModel, Layout, Merge, MinHashLSH, Packing, Paths, ProductQuantizer, Retention, Sampling, Sessionize, SimHash, Similarity, SkewJoin, Sketches, TextAnalysis, Urls, VectorIndex}
import graft.sinks.{CsvSink, ParquetSink}
import graft.sources.{Catalog, SasCsvReader, SasOptions, SasTypes}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.nio.file.Files

/** Shared fixtures/paths for the [[Queries]] section traits: table loads,
  * temp dirs, one-job vector fetches, deterministic per-SF index paths. */
private[graft] trait QueryHelpers {

  protected def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(spark, dir, name)

  protected def tempDir(tag: String): String =
    Files.createTempDirectory(s"graft-$tag").toString

  /** Fetch several vectors by id in ONE job (a per-id head() would rescan
    * the corpus once per vector). */
  protected def vecsByIds(spark: SparkSession, dir: String, ids: Seq[Long]): Map[Long, Seq[Double]] =
    t(spark, dir, "embeddings").where(col("vec_id").isin(ids: _*))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap

  protected def queryVec(spark: SparkSession, dir: String, id: Long): Seq[Double] =
    vecsByIds(spark, dir, Seq(id)).getOrElse(id,
      throw new IllegalArgumentException(
        s"query vector vec_id=$id not found in embeddings (empty or filtered table?)"))

  /** Deterministic per-SF path for materialized ANN indexes (q64/q65). */
  protected def indexPath(dir: String, kind: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_index/${new java.io.File(dir).getName}/$kind"

  /** Materialize, then globally order — for a query whose final orderBy
    * sits directly over a map-only (exchange-free) projection with a
    * TINY output: the range partitioner SAMPLES its child by executing it
    * in full (the q152 lesson, round 14 board-wide), so the
    * un-materialized form ran the projection twice — once for the sample
    * pass, once for the real shuffle. The checkpoint is output-sized
    * (id + a few scalars per doc, ≪ input at every scale), so it stays
    * cheap at 100 TB; queries whose output is PAYLOAD-sized instead move
    * the sort BELOW the projection (q85/q124/q125 — same shuffle bytes,
    * compute once, nothing materialized).
    *
    * SIZE BOUND per call site (r14 ADVICE): the "tiny" premise is
    * per-DOC-output ≪ per-doc input. Frame-explosion callers (q71
    * frameSample, q144 gifFrames) emit ~1 fingerprint row per 64 payload
    * bytes, so their checkpoint materializes roughly input/2-scale bytes
    * in executor MEMORY_AND_DISK — acceptable at board SFs, but on a
    * cluster localCheckpoint blocks are NOT fault-tolerant (an executor
    * loss fails the query). For those two the alternative that preserves
    * the single-codec-pass win at cluster scale is `.checkpoint()` (a
    * reliable checkpoint dir) or writing the fingerprint table out; the
    * remaining callers' outputs are O(docs) rows of scalars and the bound
    * holds trivially. */
  protected def ckptOrderBy(df: DataFrame, keys: String*): DataFrame =
    df.localCheckpoint().orderBy(keys.map(col): _*)

  /** [[ckptOrderBy]] with the RANGE EXCHANGE user-numbered from the
    * materialized row count (round 15, r14 VERDICT item 5): a plain
    * orderBy's sort partitioning follows AQE's byte-based sizing, and a
    * pair-list output is ~24 compressed bytes/row — q162's 3.6 GB sf10
    * spill was its own output sort running in a handful of fat
    * partitions. The checkpoint is already paid (the sampler fix); its
    * count prices the sort at `rowsPerPartition` rows/task (the family's
    * mass-sizing discipline), and repartitionByRange + in-partition sort
    * IS a global sort — identical row order, partitions row-proportional
    * at every scale. */
  protected def massOrderBy(df: DataFrame, keys: String*): DataFrame = {
    val mat = df.localCheckpoint()
    val p = graft.core.GraftSession.iterPartitions(
      mat.sparkSession, mat.count(), 2L * 1000 * 1000)
    mat.repartitionByRange(p, keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
  }
}

/** Fixture constants shared between a query and the oracle SQL generated
  * from the SAME values — the only way an index-family key gets a full
  * (rows+schema+hash) gate row. */
private[graft] object QueryFixtures {
  /** q156's PLANTED IVF centroids: 8 axis-block indicators over the 64-dim
    * embeddings (centroid j = 1.0 on dims [8j, 8(j+1)), else 0.0) — a
    * deterministic grid, not k-means output, so bucket assignment is
    * replicable arithmetic in any engine: cosine argmax ≡ block-sum argmax
    * (all centroids share norm √8), margins far above float noise, and the
    * DuckDB oracle regenerates these exact literals. */
  val gridCentroids: Seq[Seq[Double]] =
    (0 until 8).map(j => (0 until 64).map(i => if (i / 8 == j) 1.0 else 0.0))

  /** q157's PLANTED PQ codebooks (m=4 subspaces × dsub=16 dims × k=16
    * cells): cell c of every subspace is the one-hot vector e_c, so the
    * L2 assignment score `sv·c − |c|²/2` collapses to `sv[c] − 0.5` and
    * cell assignment ≡ per-subspace argmax with lowest-index ties —
    * replicable arithmetic in any engine (the zero terms of the
    * sequential-fold dot are exact: 0.0·x contributes ±0.0 and the
    * accumulator is unchanged). The ADC lookup table likewise collapses
    * exactly: LUT[j][c] = q[16j+c]. */
  val pqGridBooks: Seq[Seq[Seq[Double]]] =
    Seq.fill(4)((0 until 16).map(c => (0 until 16).map(i => if (i == c) 1.0 else 0.0).toSeq))

  /** q158's PLANTED LSH hyperplanes (6 tables × 4 sign bits): plane p
    * (global index, p = 4t + b) is the axis difference e_{2p} − e_{2p+1},
    * so its dot with any vector is EXACTLY v[2p] − v[2p+1] (the
    * sequential-fold dot's zero terms contribute ±0.0 and never move the
    * accumulator) — sign bits, multiprobe margins (|v[2p] − v[2p+1]|,
    * lowest-index ties) and bucket ids are all engine-replicable
    * arithmetic. 24 planes cover dims 0..47 of the 64-dim embeddings. */
  val lshGridPlanes: Seq[Seq[Seq[Double]]] =
    (0 until 6).map(t => (0 until 4).map { b =>
      val p = 4 * t + b
      (0 until 64).map(i =>
        if (i == 2 * p) 1.0 else if (i == 2 * p + 1) -1.0 else 0.0).toSeq
    })

  /** q160's PLANTED OPQ rotation: the 64×64 REVERSAL permutation matrix
    * (row r = e_{63−r}, row-major flat). A permutation IS orthogonal, and
    * the mat-vec fold collapses exactly — out[r] = v[63−r] (the zero
    * terms contribute ±0.0 and never move the accumulator; +0.0 survives
    * where the true element is −0.0, which IEEE comparison and addition
    * treat identically) — so rotated encode, the rotated ADC query, and
    * the rotation-sidecar round-trip are all engine-replicable
    * (`list_reverse` in the DuckDB oracle). Fresh array per call: the
    * codegen mat-vec holds it by reference. */
  def reversalRotation: Array[Double] = {
    val m = new Array[Double](64 * 64)
    (0 until 64).foreach(r => m(r * 64 + (63 - r)) = 1.0)
    m
  }
}
