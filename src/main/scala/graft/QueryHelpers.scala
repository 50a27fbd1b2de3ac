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
}
