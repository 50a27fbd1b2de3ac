package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.storage.StorageLevel

/** Materialized inverted text index — [[VectorIndex]]'s discipline applied
  * to BM25 retrieval ([[TextAnalysis.bm25TopK]]).
  *
  * The ad-hoc `bm25TopK` re-tokenizes the whole corpus per query batch:
  * fine for a one-shot decontamination sweep, a full scan wearing an index
  * costume when the same corpus serves many retrieval rounds. Here the
  * postings list is built ONCE (the same fused zero-shuffle pass) and
  * written hive-partitioned by `bucket = pmod(xxhash64(term), B)`; a
  * search then reads ONLY the bucket directories its query terms hash
  * into — Catalyst partition pruning, no corpus scan — and scores the
  * pruned postings with the identical BM25 arithmetic. Per-term document
  * frequency is computed from the pruned postings and is EXACT: every
  * posting of a term lives in that term's bucket by construction.
  *
  * Layout: `<path>/postings/bucket=<b>/…` (doc_id, dl, term, tf — `dl`
  * denormalized into the posting row so scoring needs no doc-length
  * join), plus `<path>/meta/` (one row: n_docs, sumdl, buckets). Corpus
  * stats live in the sidecar because BM25's idf/avgdl are corpus-global —
  * a search must not have to scan anything outside its buckets.
  *
  * [[append]] grows the index in O(batch): new postings land in their
  * bucket partitions and the meta row is replaced LAST (the commit point —
  * a reader that wins a race sees consistent-if-stale stats, and scoring
  * weights shift only when the meta lands).
  *
  * ==Hot-bucket splitting==
  * A stopword term's bucket is bounded by its true posting count, but at
  * corpus scale that is still ONE directory written by one task and ONE
  * skew unit at search. The layout carries a second partition level
  * `sub`: terms whose df in the written batch reaches `hotDf` spread
  * their postings over `hotSubs` sub-directories by
  * `pmod(xxhash64(doc_id), hotSubs)`; everything else lands in `sub=0`.
  * Pure LAYOUT change — searches prune on `bucket` only and read every
  * `sub` of a pruned bucket, so per-term df stays exact; the write gains
  * `hotSubs`-way parallelism exactly where the skew is. Each write/append
  * decides hotness from its own batch (a term hot corpus-wide but cold in
  * a batch just lands in that batch's `sub=0` — harmless, since `sub` is
  * never a pruning key).
  */
object TextIndex {

  private val MetaSchema = StructType(Seq(
    StructField("n_docs", LongType, nullable = false),
    StructField("sumdl", LongType, nullable = true),
    StructField("buckets", IntegerType, nullable = false)))

  /** Read schema for the postings dirs (incl. the partition column) — an
    * EMPTY index (built from a fully-filtered corpus) has no part files
    * to infer from, and must still search cleanly to zero rows. */
  private val PostingsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("dl", IntegerType, nullable = true),
    StructField("term", StringType, nullable = true),
    StructField("tf", LongType, nullable = true),
    StructField("bucket", LongType, nullable = true),
    StructField("sub", IntegerType, nullable = true)))

  /** Build the index: one fused tokenize pass over the corpus; postings
    * written repartitioned BY (bucket, sub) (one task per directory — no
    * small-file spray, hot buckets get `hotSubs`-way write parallelism),
    * stats sentinels from the same pass into the meta sidecar. */
  def write(
      df: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int, hotDf: Long = Long.MaxValue, hotSubs: Int = 8): Unit = {
    require(buckets >= 1, s"TextIndex: need buckets >= 1, got $buckets")
    val spark = df.sparkSession
    val fused = TextAnalysis.bm25PostsFused(df, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nDocs, sumdl, hot) = statsAndHot(fused, hotDf, hotSubs)
    postings(fused, buckets, hot, hotSubs)
      .write.mode("overwrite").partitionBy("bucket", "sub").parquet(s"$path/postings")
    writeMeta(spark, nDocs, sumdl, buckets, path)
    fused.unpersist()
  }

  /** Incremental append: the batch's postings are assigned against the
    * SIDECAR bucket count (no rebuild, no touch of existing rows) and
    * appended into the same partition directories; the meta row is
    * summed and replaced last. */
  def append(
      df: DataFrame, idCol: String, textCol: String, path: String,
      hotDf: Long = Long.MaxValue, hotSubs: Int = 8): Unit = {
    val spark = df.sparkSession
    val (n0, sumdl0, buckets) = readMeta(spark, path)
    val fused = TextAnalysis.bm25PostsFused(df, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (nDocs, batchSum, hot) = statsAndHot(fused, hotDf, hotSubs)
    postings(fused, buckets, hot, hotSubs)
      .write.mode("append").partitionBy("bucket", "sub").parquet(s"$path/postings")
    val sumdl = (sumdl0, batchSum) match {
      case (Some(a), Some(b)) => Some(a + b)
      case (a, b) => a.orElse(b)
    }
    writeMeta(spark, n0 + nDocs, sumdl, buckets, path)
    fused.unpersist()
  }

  /** ONE pass over the persisted fused rows serves BOTH the sidecar stats
    * and hot-term detection (SURVEY §12.b): the vocabulary aggregate
    * groups the stats sentinels (term IS NULL) alongside per-term batch
    * dfs, and only the sentinel row plus the stopword-scale hot tail
    * (≤ batchPostings/hotDf terms by construction) come back to the
    * driver. The previous shape paid a second full scan of the fused
    * cache for a separate stats job. With splitting off, the vocabulary
    * shuffle is skipped entirely and stats stay a shuffle-free filter. */
  private def statsAndHot(
      fused: DataFrame, hotDf: Long, hotSubs: Int): (Long, Option[Long], Seq[String]) = {
    require(hotDf >= 1, s"TextIndex: need hotDf >= 1, got $hotDf")
    require(hotSubs >= 1, s"TextIndex: need hotSubs >= 1, got $hotSubs")
    if (hotSubs <= 1 || hotDf == Long.MaxValue) {
      val r = fused.where(col("term").isNull)
        .agg(count(lit(1)), sum(col("_dl"))).head()
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), Nil)
    } else {
      val rows = fused.groupBy("term")
        .agg(count(lit(1)).as("_cnt"), sum(col("_dl")).as("_sdl"))
        .where(col("term").isNull || col("_cnt") >= hotDf)
        .collect()
      val (sentinel, hotRows) = rows.partition(_.isNullAt(0))
      val n = sentinel.headOption.map(_.getLong(1)).getOrElse(0L)
      val sumdl = sentinel.headOption
        .flatMap(r => if (r.isNullAt(2)) None else Some(r.getLong(2)))
      (n, sumdl, hotRows.map(_.getString(0)).toSeq)
    }
  }

  private def postings(
      fused: DataFrame, buckets: Int, hot: Seq[String], hotSubs: Int): DataFrame = {
    val base = fused.where(col("term").isNotNull)
      .select(col("_id").as("doc_id"), col("_dl").as("dl"),
        col("term"), col("_tf").as("tf"),
        pmod(xxhash64(col("term")), lit(buckets.toLong)).as("bucket"))
    val subCol = pmod(xxhash64(col("doc_id")), lit(hotSubs.toLong)).cast("int")
    val withSub =
      if (hot.isEmpty) base.withColumn("sub", lit(0))
      else if (hot.size <= 10000)
        // stopword-scale hot set: a codegen'd InSet probe per posting —
        // no broadcast exchange, no join, stays in the write's stage
        base.withColumn("sub",
          when(col("term").isin(hot: _*), subCol).otherwise(lit(0)))
      else {
        // pathological hotDf (huge hot vocabulary): fall back to a
        // broadcast join rather than an InSet literal of that size
        val spark = fused.sparkSession
        import spark.implicits._
        val hotD = hot.toDF("term").withColumn("_hot", lit(true))
        base.join(broadcast(hotD), Seq("term"), "left")
          .withColumn("sub", when(col("_hot"), subCol).otherwise(lit(0)))
          .drop("_hot")
          .select("doc_id", "dl", "term", "tf", "bucket", "sub")
      }
    withSub.repartition(col("bucket"), col("sub"))
  }

  private def writeMeta(
      spark: SparkSession, n: Long, sumdl: Option[Long], buckets: Int,
      path: String): Unit =
    spark.createDataFrame(
      java.util.Arrays.asList(Row(n, sumdl.map(Long.box).orNull, buckets)),
      MetaSchema)
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")

  private def readMeta(spark: SparkSession, path: String): (Long, Option[Long], Int) = {
    val r = spark.read.schema(MetaSchema).parquet(s"$path/meta").head()
    (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getInt(2))
  }

  /** BM25 top-k against the written index. The needed bucket list comes
    * from ONE tiny Spark job over the query terms (so the bucket hash is
    * Spark's own xxhash64 — no driver-side reimplementation to drift);
    * the postings scan then prunes to those partition directories
    * (spec-checked via scanned-file counts). Scores are identical to
    * [[TextAnalysis.bm25TopK]] on the same corpus: same postings, exact
    * per-term df (a term's postings never leave its bucket), sidecar
    * (n, sumdl) as literals, same 6dp-DECIMAL-before-sum arithmetic. */
  def search(
      spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): DataFrame = {
    // materialize the (≤ queries × topK)-row result, then release the qterms
    // cache — returning a lazy plan over it leaked the cache into the session
    // for the caller's lifetime (ADVICE r5)
    val (plan, qterms) = searchPlan(spark, path, queries, qIdCol, qTextCol, k1, b, topK)
    val out = plan.localCheckpoint()
    qterms.unpersist()
    out
  }

  /** The lazy scoring plan plus the persisted qterms intermediate backing it
    * — callers MUST materialize the plan before unpersisting qterms (the
    * public [[search]] does exactly that); the bucket-pruning spec reads the
    * scan metrics off this twin. */
  private[graft] def searchPlan(
      spark: SparkSession, path: String, queries: DataFrame,
      qIdCol: String, qTextCol: String, k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 10): (DataFrame, DataFrame) = {
    val (n, sumdl, buckets) = readMeta(spark, path)
    val qterms = TextAnalysis.bm25QueryTerms(queries, qIdCol, qTextCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val posts = spark.read.schema(PostingsSchema).parquet(s"$path/postings")
      .where(col("bucket").isin(neededBuckets(qterms, buckets): _*))
    (scorePruned(posts, qterms, n, sumdl, k1, b, topK), qterms)
  }

  /** Compact an appended index: each [[append]] lands one file per
    * touched (bucket, sub) directory, so N batches leave N files per —
    * harmless for a while (searches read only pruned buckets), listing-
    * and open-cost noise at crawl cadence. Rewrites the postings at one
    * file per bucket via a staging directory + atomic-enough rename
    * (write staged, swap, drop old); meta is untouched. Run on the same
    * cadence as [[graft.operators.Layout.compact]] for plain tables. */
  def compact(spark: SparkSession, path: String): Unit = {
    val (_, _, buckets) = readMeta(spark, path)
    val live = s"$path/postings"
    val staged = s"$path/postings_compact"
    spark.read.schema(PostingsSchema).parquet(live)
      .repartition(col("bucket"), col("sub"))
      .write.mode("overwrite").partitionBy("bucket", "sub").parquet(staged)
    val conf = spark.sparkContext.hadoopConfiguration
    val p0 = new org.apache.hadoop.fs.Path(live)
    val fs = p0.getFileSystem(conf)
    val old = new org.apache.hadoop.fs.Path(s"$path/postings_old")
    // a crashed prior compact may leave a stale _old dir; clear it, and
    // CHECK each rename — a silent false here would swap in nothing
    fs.delete(old, true)
    require(fs.rename(p0, old), s"compact: could not stage out $live")
    require(fs.rename(new org.apache.hadoop.fs.Path(staged), p0),
      s"compact: could not swap in $staged (live data is at ${old})")
    fs.delete(old, true)
    ()
  }

  // ------------------------------------------------------- positional

  private val PositionalSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("dl", IntegerType, nullable = true),
    StructField("term", StringType, nullable = true),
    StructField("tf", LongType, nullable = true),
    StructField("positions", ArrayType(IntegerType, containsNull = false),
      nullable = true),
    StructField("bucket", LongType, nullable = true)))

  /** Positional index build: same fused zero-shuffle pass, but each
    * posting row carries the term's 1-based TOKEN positions — the layout
    * phrase/proximity search needs. ~2-3× the postings bytes of
    * [[write]]; build it when exact-phrase decontamination (find
    * benchmark QUOTES, not just high-BM25 docs) is on the menu. */
  def writePositional(
      df: DataFrame, idCol: String, textCol: String, path: String,
      buckets: Int): Unit = {
    require(buckets >= 1, s"TextIndex: need buckets >= 1, got $buckets")
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Par.fanOut(
      df.select(col(idCol).cast("long").as("_id"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val u = org.apache.spark.unsafe.types.UTF8String
              .fromString(text).toLowerCase.trim()
            val arr = u.toString.split("\\s+", -1)
            val pos = new java.util.LinkedHashMap[String, scala.collection.mutable.ArrayBuffer[Int]]()
            var i = 0
            while (i < arr.length) {
              if (arr(i).nonEmpty)
                pos.computeIfAbsent(arr(i), _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += (i + 1)
              i += 1
            }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Int, String, Long, Seq[Int])]
            pos.forEach((t, ps) => out += ((id, arr.length, t, ps.size.toLong, ps.toSeq)))
            out.iterator
          }
        }
      }
      .toDF("doc_id", "dl", "term", "tf", "positions")
      .withColumn("bucket", pmod(xxhash64(col("term")), lit(buckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(s"$path/postings")
    writeMeta(spark, 0L, None, buckets, path) // stats unused by phrase search
  }

  /** Exact phrase-occurrence counts against a [[writePositional]] index:
    * (doc_id, n_occurrences) for every document containing the phrase's
    * tokens CONSECUTIVELY, counting overlapping occurrences. The scan
    * prunes to the phrase terms' buckets; the adjacency chain is pure
    * codegen array arithmetic — match_i = positions(t_i) ∩ (match_{i-1}
    * shifted by one token) — so an m-term phrase costs m−1 doc-keyed
    * joins over single-term postings, never a text scan. The exact-quote
    * complement to [[search]]'s ranked-overlap retrieval. */
  def phraseCount(
      spark: SparkSession, path: String, phrase: String): DataFrame = {
    val terms = org.apache.spark.unsafe.types.UTF8String
      .fromString(phrase).toLowerCase.trim().toString
      .split("\\s+").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "phraseCount: need a non-empty phrase")
    val (_, _, buckets) = readMeta(spark, path)
    import spark.implicits._
    val qterms = terms.distinct.toDF("term")
    val posts = spark.read.schema(PositionalSchema).parquet(s"$path/postings")
      .where(col("bucket").isin(neededBuckets(qterms, buckets): _*))
    def termPosts(t: String, as: String): DataFrame =
      posts.where(col("term") === lit(t))
        .select(col("doc_id"), col("positions").as(as))
    val first = termPosts(terms.head, "_m")
    val chained = terms.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(termPosts(t, s"_p$i"), "doc_id")
          .select(col("doc_id"),
            array_intersect(
              transform(col("_m"), x => x + lit(1)), col(s"_p$i")).as("_m"))
    }
    chained.select(col("doc_id"), size(col("_m")).as("n_occurrences"))
      .where(col("n_occurrences") > 0)
  }

  /** Ordered proximity search: documents containing `terms` IN ORDER
    * with each successive term at most `window` tokens after the
    * previous ([[phraseCount]] is the window = 1 special case — the
    * adjacency chain generalized to match_i = { p ∈ positions(t_i) :
    * ∃ m ∈ match_{i−1}, 1 ≤ p − m ≤ window }, all codegen HOFs over the
    * same bucket-pruned positional postings). `n_matches` counts the
    * distinct end positions of qualifying chains — near-quote detection
    * looser than exact phrases, for paraphrase-leak triage. */
  def proximityCount(
      spark: SparkSession, path: String, terms: Seq[String],
      window: Int): DataFrame = {
    require(terms.nonEmpty, "proximityCount: need at least one term")
    require(window >= 1, s"proximityCount: need window >= 1, got $window")
    val toks = terms.map(t => org.apache.spark.unsafe.types.UTF8String
      .fromString(t).toLowerCase.trim().toString).filter(_.nonEmpty)
    require(toks.nonEmpty, "proximityCount: need non-empty terms")
    val (_, _, buckets) = readMeta(spark, path)
    import spark.implicits._
    val qterms = toks.distinct.toDF("term")
    val posts = spark.read.schema(PositionalSchema).parquet(s"$path/postings")
      .where(col("bucket").isin(neededBuckets(qterms, buckets): _*))
    def termPosts(t: String, as: String): DataFrame =
      posts.where(col("term") === lit(t))
        .select(col("doc_id"), col("positions").as(as))
    val first = termPosts(toks.head, "_m")
    val chained = toks.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (t, i)) =>
        acc.join(termPosts(t, s"_p$i"), "doc_id")
          .select(col("doc_id"),
            filter(col(s"_p$i"), p =>
              exists(col("_m"), m =>
                p - m >= lit(1) && p - m <= lit(window))).as("_m"))
    }
    chained.select(col("doc_id"), size(col("_m")).as("n_matches"))
      .where(col("n_matches") > 0)
  }

  /** The query terms' bucket values, via ONE tiny Spark job (so the
    * bucket hash is Spark's own xxhash64 — nothing to drift). */
  private[graft] def neededBuckets(qterms: DataFrame, buckets: Int): Array[Long] =
    qterms.select(
      pmod(xxhash64(col("term")), lit(buckets.toLong)).as("b"))
      .distinct().collect().map(_.getLong(0))

  /** BM25 scoring over already-pruned postings (doc_id, dl, term, tf) —
    * shared by the batch search and the streaming twin's meta-gated
    * search. Identical arithmetic to [[TextAnalysis.bm25TopK]]. */
  private[graft] def scorePruned(
      posts: DataFrame, qterms: DataFrame, n: Long, sumdl: Option[Long],
      k1: Double, b: Double, topK: Int): DataFrame = {
    val filtered = posts.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = filtered.groupBy("term").agg(count(lit(1)).as("_df"))
    val cands = filtered
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .select(col("q_id"), col("doc_id").as("_id"),
        col("tf").as("_tf"), col("dl").as("_dl"), col("_df"))
      .withColumn("_n", lit(n))
      .withColumn("_sumdl", lit(sumdl.map(Long.box).orNull).cast("long"))
    TextAnalysis.bm25Rank(cands, k1, b, topK)
  }
}
