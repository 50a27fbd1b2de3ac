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

/** §2.8 — the LLM training-data curation pipeline: quality, repetition,
  * contamination, packing, chunking, redaction, indexes, sketches,
  * classifiers, importance resampling, layout. */
private[graft] trait QueriesPipeline extends QueryHelpers {

  // ------------------------------------------------------- §2.8 (curation)

  /** Gopher-style quality rule flags + keep decision: one codegen'd
    * projection, zero shuffles. Exact SQL oracle (INT flags, 6dp ratios). */
  def q76QualityFilter(spark: SparkSession, dir: String): DataFrame =
    Curation.qualityFlags(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Repetition profile (distinct-word + top-word mass): two stacked hash
    * aggregates; what shuffles is bounded by per-doc vocabulary. */
  def q77Repetition(spark: SparkSession, dir: String): DataFrame =
    Curation.repetitionStats(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Benchmark decontamination measurement: distinct word-3-gram containment
    * of every corpus doc against the doc_id % 97 == 0 "benchmark" slice.
    * Both sides reduce to distinct grams before the equi-join. */
  def q78Contamination(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Curation.ngramContamination(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0),
      "doc_id", "text", n = 3)
      .orderBy("doc_id")
  }

  /** Weighted domain mixing toward total/2 rows at per-source weight
    * (srcnum % 3 + 1): pure integer keep predicate, corpus never shuffles. */
  def q79DomainMix(spark: SparkSession, dir: String): DataFrame =
    Curation.domainMixSample(
      t(spark, dir, "documents").select("doc_id", "source"), "doc_id", "source",
      weight = regexp_extract(col("source"), "(\\d+)", 1).cast("long") % 3 + 1,
      targetTotal = floor(count(lit(1)) / 2))
      .orderBy("doc_id")

  /** Fixed-size chunking (64-word chunks, 16-word overlap): pure
    * projection + explode, blow-up bounded by 1/stride of token count. */
  def q80Chunking(spark: SparkSession, dir: String): DataFrame =
    Curation.chunkWords(t(spark, dir, "documents"), "doc_id", "text",
      chunkSize = 64, overlap = 16)
      .orderBy("doc_id", "chunk_idx")

  /** Metric anomaly sweep: |value − mean| > 3·sd per event_type; per-group
    * stats broadcast back, big side never shuffles. */
  def q81Outliers(spark: SparkSession, dir: String): DataFrame =
    Checks.zscoreOutliers(
      t(spark, dir, "events").select("event_id", "event_type", "value"),
      "event_type", "value", threshold = 3.0)
      .select("event_id", "event_type", "value")
      .orderBy("event_id")

  /** Incremental ingest dedup: the doc_id % 10 == 7 slice plays the new
    * crawl batch; rows whose normalized fingerprint already exists in the
    * rest of the corpus are dropped. Corpus side reduces to distinct
    * fingerprints before the anti-join. */
  def q84IncrementalDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.incrementalDedup(
      docs.where(pmod(col("doc_id"), lit(10)) === 7),
      docs.where(pmod(col("doc_id"), lit(10)) =!= 7),
      "text")
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** q84's semantics with the steady-state recurring-crawl plan: a
    * prebuilt corpus bloom gates the batch (`might=false` rows are
    * definitely new), one shuffle-free corpus confirmation scan kills the
    * false positives — the result is exact, identical to q84's oracle. */
  def q115BloomDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 7)
    val bloom = Dedup.corpusBloom(corpus, "text", expectedItems = 1 << 20)
    Dedup.bloomIncrementalDedup(
      docs.where(pmod(col("doc_id"), lit(10)) === 7), corpus, "text", bloom)
      .select("doc_id", "text", "lang", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** C4/RefinedWeb-style corpus-level LINE dedup: docs are re-lined
    * deterministically (3 words per line — the injection pattern of
    * q85/q109, since the synthetic corpus is single-line), then every
    * non-first occurrence of a line corpus-wide is excised and the doc
    * rebuilt. Corpus never shuffles: 8-byte hashed lines count, only
    * hash-candidates re-group by text (collision-proof), loser index
    * lists join back by doc id. ~19% of injected lines are repeats at
    * sf0.01, so the pass does real work. */
  def q119LineDedup(spark: SparkSession, dir: String): DataFrame = {
    val words = split(col("text"), " ")
    val nl = ceil(size(words) / lit(3.0)).cast("int")
    val injected = array_join(
      transform(sequence(lit(0), nl - 1), i => array_join(slice(words, i * 3 + 1, lit(3)), " ")),
      "\n")
    // text is an EXPRESSION here (synthesized lines) — lineDedupExpr
    // evaluates it once per doc where text is genuinely needed (phase-1
    // hashes, candidates-only cache fill, non-loser output) instead of
    // re-running the transform chain in the extraction and the rebuild
    // (spec-proven by accumulator count)
    Curation.lineDedupExpr(
      t(spark, dir, "documents").select(col("doc_id"), col("text")),
      "doc_id", injected, "text")
      .orderBy("doc_id")
  }

  /** Per-source relative quality gate: keep docs at/above the P75 of
    * n_chars WITHIN their source (cume_dist = rank/count, ratio-of-ints
    * exact across engines). One window shuffle partitioned by source. */
  def q83RelativeFilter(spark: SparkSession, dir: String): DataFrame =
    Curation.relativeFilter(
      t(spark, dir, "documents").select("doc_id", "source", "n_chars"),
      "source", "n_chars", minQuantile = 0.75)
      .orderBy("doc_id")

  /** Co-located join over bucketed warehouse tables: orders ⋈ customer on
    * custkey after both are written hash-bucketed (8 buckets) on the key —
    * the write pays the shuffle once; the join itself plans with no
    * Exchange (spec-proven). Oracle is the plain join aggregate. */
  def q82BucketedJoin(spark: SparkSession, dir: String): DataFrame = {
    Bucketing.writeBucketed(
      t(spark, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "graft_bkt_orders", "o_custkey", buckets = 8)
    Bucketing.writeBucketed(
      t(spark, dir, "customer").select("c_custkey", "c_mktsegment"),
      "graft_bkt_customer", "c_custkey", buckets = 8)
    val o = Bucketing.readBucketed(spark, "graft_bkt_orders")
    val c = Bucketing.readBucketed(spark, "graft_bkt_customer")
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** PII redaction over synthetically-injected addresses (the corpus text
    * itself is clean word-soup, so 2-in-3 docs get a deterministic
    * email/phone/IP appended in BOTH engines before scrubbing — making the
    * oracle prove the redaction, not a no-op). Zero shuffles. */
  def q85PiiRedact(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val pii = concat(
      col("text"), lit(" contact user"), s(d),
      lit("@mail"), s(pmod(d, lit(5))), lit(".com or 555-"),
      lpad(s(pmod(d, lit(10000))), 4, "0"),
      lit(" from 10."), s(pmod(d, lit(256))),
      lit("."), s(pmod(d * 7, lit(256))),
      lit("."), s(pmod(d * 13, lit(256))))
    // sort BELOW the projection (round 14): the output is payload-sized,
    // so ordering the raw rows first costs the same shuffle bytes while
    // the regex pass runs ONCE, post-sort — un-reordered, the range
    // sampler executed the whole redaction a second time (the q152
    // lesson); a projection preserves its child's (doc_id-unique) order
    val injected = t(spark, dir, "documents").orderBy("doc_id").select(
      d, when(pmod(d, lit(3)) =!= 2, pii).otherwise(col("text")).as("text"))
    Curation.redactPii(injected, "doc_id", "text")
  }

  /** Corpus-level boilerplate removal: 4-word blocks occurring in >= 5
    * distinct docs stripped; frequency pass combines map-side, boilerplate
    * set broadcasts, reassembly is the one corpus-sized shuffle. */
  def q86Boilerplate(spark: SparkSession, dir: String): DataFrame =
    Curation.stripBoilerplate(t(spark, dir, "documents"), "doc_id", "text",
      blockWords = 4, minDocs = 5)
      .orderBy("doc_id")

  /** Banded interval-overlap join: view intervals × click intervals per
    * user (duration = value×600 s), candidates from an equi-join on
    * (user, day-bin), duplicates killed arithmetically (first shared bin) —
    * never per-key all-pairs, no dedupe shuffle. */
  def q87IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev87 = t(spark, dir, "events")
    val m87 = graft.functions.TimeCols.epochMicros(ev87, "ts")
    val e = ev87.select(
      col("event_id"), col("user_id"), col("event_type"),
      m87.as("s"),
      (m87 + round(col("value") * 6e8).cast("long")).as("e"))
    val v = e.where(col("event_type") === "view").select(
      col("user_id"), col("event_id").as("view_id"),
      col("s").as("view_s"), col("e").as("view_e"))
    val c = e.where(col("event_type") === "click").select(
      col("user_id"), col("event_id").as("click_id"),
      col("s").as("click_s"), col("e").as("click_e"))
    IntervalJoin.overlapJoin(v, c, Seq("user_id"),
      "view_s", "view_e", "click_s", "click_e", binWidth = 86400000000L)
      .select(col("user_id"), col("view_id"), col("click_id"),
        (least(col("view_e"), col("click_e")) -
          greatest(col("view_s"), col("click_s"))).as("overlap_us"))
      .orderBy("view_id", "click_id")
  }

  /** Vocabulary build (top-50 tokens, count-desc/token-asc ids) + document
    * encoding to id sequences (OOV → 0): one corpus-vocabulary aggregate,
    * broadcast token→id join, one doc-keyed reassembly shuffle. The id
    * array is emitted space-joined so the cross-engine compare is a plain
    * string. */
  def q91VocabEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val vocab = TextAnalysis.buildVocab(docs, "text", size = 50)
    TextAnalysis.encodeIds(docs, "doc_id", "text", vocab)
      .select(col("doc_id"),
        array_join(transform(col("ids"), _.cast("string")), " ").as("ids_str"),
        col("n_tokens"), col("n_oov"))
      .orderBy("doc_id")
  }

  /** Per-type winsorization of event values into [p01, p99]: exact
    * percentile pair broadcast back as a pure projection; the big side
    * never shuffles. Clipped output is either an untouched input or a
    * bit-matched boundary (rounded 6dp for the compare). */
  def q92Winsorize(spark: SparkSession, dir: String): DataFrame =
    Checks.winsorize(
      t(spark, dir, "events").select("event_id", "event_type", "value"),
      "event_type", "value", lo = 0.01, hi = 0.99)
      .select(col("event_id"), col("event_type"),
        round(col("value_w"), 6).as("value_w"))
      .orderBy("event_id")

  /** Training-sequence assembly (the capstone of the chunk→pack chain):
    * q80's chunks packed into 256-word budget sequences by the q75
    * distributed prefix-sum machinery (no single-partition window), each
    * sequence assembled in (doc, chunk) order with an <eos> separator.
    * One doc-order range shuffle + one seq-keyed reassembly. */
  def q96PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val chunks = Curation.chunkWords(
      t(spark, dir, "documents"), "doc_id", "text", chunkSize = 64, overlap = 16)
    Packing.packByBudget(chunks, order = Seq("doc_id", "chunk_idx"),
      weightCol = "n_words", budget = 256L,
      cumCol = "cum_words", shardCol = "seq_id")
      .groupBy("seq_id").agg(
        count(lit(1)).as("n_chunks"),
        sum("n_words").as("n_words"),
        array_join(
          transform(
            array_sort(collect_list(
              struct(col("doc_id"), col("chunk_idx"), col("chunk_text")))),
            s => s.getField("chunk_text")),
          " <eos> ").as("seq_text"))
      .orderBy("seq_id")
  }

  /** Per-type min-max feature scaling into [0,1]: min/max are
    * order-independent aggregates, so the scaled floats are bit-identical
    * across engines — no rounding needed, compared raw. */
  def q95MinmaxScale(spark: SparkSession, dir: String): DataFrame =
    Checks.scaleMinMax(
      t(spark, dir, "events").select("event_id", "event_type", "value"),
      "event_type", "value")
      .select("event_id", "event_type", "value", "value_scaled")
      .orderBy("event_id")

  /** MERGE INTO semantics (Merge.upsert): a changeset (every 7th order
    * repriced at version 2, every 7·13th tombstoned) folds into the
    * snapshot via ONE struct-max hash aggregate — map-side combining, no
    * per-key window sort, soft deletes dropped after the argmax. */
  def q94Upsert(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders").select(
      col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      lit(1L).as("version"), lit(false).as("deleted"))
    val changes = t(spark, dir, "orders")
      .where(pmod(col("o_orderkey"), lit(7)) === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_totalprice") + 100.0).as("o_totalprice"),
        lit(2L).as("version"),
        (pmod(col("o_orderkey"), lit(13)) === 0).as("deleted"))
    Merge.upsert(base, changes, Seq("o_orderkey"), "version", Some("deleted"))
      .orderBy("o_orderkey")
  }

  /** END-TO-END curation: Graft.curateCorpus (scrub → quality gate → exact
    * dedup → decontamination → chunk) over the %97 corpus/bench split. The
    * oracle recomposes every stage from its proven per-stage SQL; the Spark
    * side runs the hashed-gram decontamination (scale default) against the
    * oracle's string grams — equal modulo 2^-64 collisions (q78-proven). */
  def q93CurateCorpus(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Graft.curateCorpus(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0).select("doc_id", "text"),
      "doc_id", "text",
      docs.where(pmod(col("doc_id"), lit(97)) === 0).select("doc_id", "text"),
      maxContam = 0.2)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Z-order-clustered write + 2-d box-filtered read-back: events laid out
    * by interleaved (user_id, day) bits so parquet min/max stats prune on
    * BOTH dimensions (spec proves the pruning; this oracle proves the
    * layout loses nothing and the filter semantics are exact). */
  def q89Zorder(spark: SparkSession, dir: String): DataFrame = {
    val out = tempDir("zorder")
    val ev89 = t(spark, dir, "events")
    val e = ev89.select(col("event_id"), col("user_id"),
      (graft.functions.TimeCols.epochMicros(ev89, "ts") / lit(86400000000L))
        .cast("long").as("day"))
    Layout.writeZOrdered(e, "user_id", "day", out, files = 8)
    spark.read.parquet(out)
      .where(col("user_id").between(10, 20) && col("day").between(19730, 19739))
      .orderBy("event_id")
  }

  /** Small-file compaction: documents fragmented into 16 files, compacted
    * to byte-targeted file count; oracle proves the rewrite is lossless.
    * File-count arithmetic is spec-pinned in LayoutSpec. */
  def q90Compact(spark: SparkSession, dir: String): DataFrame = {
    val frag = tempDir("frag")
    val comp = tempDir("compact")
    t(spark, dir, "documents").repartition(16)
      .write.mode("overwrite").parquet(frag)
    Layout.compact(spark, frag, comp, targetBytes = 512L * 1024 * 1024)
    spark.read.parquet(comp).select("doc_id", "source", "n_chars")
      .orderBy("doc_id")
  }

  /** Mergeable-sketch profile per source: HLL distinct fingerprints +
    * approx n_chars quantiles, one map-side-combining pass. Approximate by
    * nature → rows-only at the gate; tolerance pinned in SketchesSpec. */
  def q88SketchProfile(spark: SparkSession, dir: String): DataFrame =
    Sketches.profile(t(spark, dir, "documents"), "source",
      TextAnalysis.fingerprint(col("text")), col("n_chars"))
      .orderBy("source")

  /** BPE merge training (tokenizer-train side of q91's vocab/encode): one
    * distributed word-frequency pass, then the textbook merge loop over
    * the vocabulary-sized dict on the driver (deterministic count-desc/
    * pair-asc tie-break, spec-pinned). Oracle: an INDEPENDENT python BPE
    * trainer's merge table, keyed by a corpus fingerprint the oracle SQL
    * recomputes from `documents` itself (tools/make_oracle_fixtures.py). */
  def q98BpeMerges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    TextAnalysis.bpeTrain(t(spark, dir, "documents"), "text", merges = 30)
      .toDF("rank", "left", "right", "pair_count")
      .orderBy("rank")
  }

  /** Native sas7bdat ingest: the binary SAS dataset boundary read
    * directly (no export step), through the DataSource V2 face
    * (`spark.read.format("sas7bdat")`, sources.Sas7bdatSourceV2) so the
    * gate exercises the registered source with column pruning in the
    * scan; value-equality with the RDD reader and pandas-validated
    * fixtures is spec-pinned. Oracle: pandas.read_sas's own CSV dump of
    * the fixture (tools/make_oracle_fixtures.py) — DuckDB reads what an
    * independent public reader decoded; the spec additionally pins every
    * value, type and the date/datetime epoch conversions. */
  def q99Sas7bdat(spark: SparkSession, dir: String): DataFrame = {
    val fixture = Seq(
      "src/test/resources/sas7bdat/u64_pages.sas7bdat",
      "/root/repo/src/test/resources/sas7bdat/u64_pages.sas7bdat")
      .map(new java.io.File(_)).find(_.exists())
      .getOrElse(sys.error("sas7bdat fixture not found")).getAbsolutePath
    spark.read.format("sas7bdat").load(fixture)
      .where(col("ratio").isNotNull)
      .orderBy("id")
  }

  /** SemDeDup (Abbas et al. 2023): k-means the embedding space, near-dup
    * only within clusters, keep the min-id exemplar per duplicate group.
    * Deterministic end-to-end (kMeans init is the first C vectors by id),
    * but k-means is not SQL-expressible so the oracle is rows-only; the
    * spec pins survivors against the exact quadratic pass on clustered
    * vectors and measures the boundary-split recall trade. */
  def q100SemDedup(spark: SparkSession, dir: String): DataFrame =
    operators.SemDedup.semDedup(t(spark, dir, "embeddings"), "vec_id", "embedding",
      c = 8, iters = 3, tau = 0.45)
      .select(col("vec_id"), col("label"), col("bucket"))
      .orderBy("vec_id")

  /** q100's assign → within-cluster pair → connected-components →
    * exemplar-keep machinery under a FULL oracle (round 12 — the
    * q156-q160 planted-fixture discipline extended to SemDedup): the
    * centroids are [[QueryFixtures.gridCentroids]] instead of k-means
    * output, so bucket assignment is replicable block-sum argmax
    * (lowest-index ties), within-cluster cosines are the shared fold
    * arithmetic every embedding oracle replays, and the min-id exemplar
    * groups are a recursive-CTE transitive closure in DuckDB. The
    * trained verb (q100) stays rows-only by nature — k-means is
    * initialization-dependent. */
  def q161SemdedupGrid(spark: SparkSession, dir: String): DataFrame =
    operators.SemDedup.semDedupWith(t(spark, dir, "embeddings"), "vec_id",
      "embedding", QueryFixtures.gridCentroids, tau = 0.45)
      .select(col("vec_id"), col("label"), col("bucket"))
      .orderBy("vec_id")

  /** Substring-span duplication profile (Lee et al. 2022 re-expressed):
    * per-doc count of 40-char windows (stride 1) whose text occurs at more
    * than one site corpus-wide. WINNOW-GATED (the SIGMOD'03 guarantee:
    * every doc owning a duplicated ≥l-char site also shares a winnow
    * fingerprint, so docs outside the gate are provably clean and the
    * stride-1 pass enumerates only the gated subset) — output identical
    * to the ungated pass (same DuckDB oracle; equality + gate-soundness
    * spec-pinned, window-count cut measured in spec). The hashed scale
    * path and the span REMOVAL verb (stripDupSpans) are spec-pinned
    * equal/correct. */
  def q101DupSpans(spark: SparkSession, dir: String): DataFrame =
    operators.SpanDedup.dupSpanStatsWinnowed(t(spark, dir, "documents"), "doc_id", "text",
      l = 40, k = 32)
      .orderBy("doc_id")

  /** Span-granular benchmark decontamination (the q78 gate refined from
    * doc-drop to span-strip): per-corpus-doc count of 40-char windows
    * whose text occurs anywhere in the benchmark split. The benchmark
    * window set broadcasts, so the corpus never shuffles; exact DuckDB
    * oracle. The REMOVAL verb (stripContamSpans) is spec-pinned. */
  def q102ContamSpans(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.SpanDedup.contamSpanStats(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0), "doc_id", "text",
      docs.where(pmod(col("doc_id"), lit(97)) === 0), "text", l = 40, s = 1)
      .orderBy("doc_id")
  }

  /** BM25 decontamination-by-retrieval: every corpus doc scored against
    * the broadcast benchmark split (doc_id % 97 == 0, q102's convention),
    * top-10 leak suspects per benchmark query. Per-term scores are 6dp
    * DECIMAL before the order-free sum (q105 discipline) → exact oracle;
    * the final per-query top-k is the bounded TopK aggregate, not a
    * window sort. */
  def q120Bm25(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    // query set CAPPED at 500 (round 10 — the sf10 audit's first catch):
    // %97 alone makes the query COUNT grow with the corpus, so retrieval
    // work scales queries × postings ∝ N² by benchmark construction
    // (sf10 ran 5155 query docs against a 495k-doc corpus — wall ×100+).
    // A fixed query load against a growing corpus is the honest retrieval
    // shape; ≤ sf1 the cap is not binding, so small-SF oracles are
    // unchanged. Deterministic: min-doc_id 500.
    TextAnalysis.bm25TopK(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0)
        .orderBy("doc_id").limit(500),
      "doc_id", "text", "doc_id", "text")
      .orderBy("q_id", "rank")
  }

  /** q120's retrieval against a MATERIALIZED inverted index: postings
    * built once, hive-partitioned by term-hash bucket; the search reads
    * only the query terms' bucket directories (partition pruning,
    * spec-checked by file count). Identical scores — same oracle. */
  def q130TextIndex(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = indexPath(dir, "text")
    // a SMALL query batch (mod 487: 2-11 queries across SFs) — the
    // repeated-retrieval shape the index exists for; q120's broad
    // benchmark split touches every bucket and belongs to the ad-hoc path
    // hotDf=100: stopword-grade terms split over 4 sub-dirs (layout-only —
    // the oracle is unchanged because search reads every sub of a bucket)
    operators.TextIndex.write(
      docs.where(pmod(col("doc_id"), lit(487)) =!= 0), "doc_id", "text",
      path, buckets = 32, hotDf = 100, hotSubs = 4)
    // query batch capped at 12 (round 10): %487 alone grows the batch
    // with the corpus (sf1 ran 102, sf10 would run 1027 — a "small
    // repeated-retrieval batch" in name only); the cap keeps the index
    // probe what it claims to be, and is non-binding at gate SFs
    operators.TextIndex.search(spark, path,
      docs.where(pmod(col("doc_id"), lit(487)) === 0)
        .orderBy("doc_id").limit(12), "doc_id", "text")
      .orderBy("q_id", "rank")
  }

  /** Leakage-safe split: the q35 near-dup clusters as the split unit, so
    * near-copies never straddle train/val/test (the held-out set stays
    * honest). Oracle = q35's recursive-CTE clusters + q54's portable hash
    * split keyed by cluster id. */
  def q103LeakageSafeSplit(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.leakageSafeSplit(
      t(spark, dir, "documents"), "doc_id", "text", n = 3, tau = 0.6,
      trainPct = 80, valPct = 10)
      .orderBy("doc_id")

  /** Perceptual near-dup payloads: every 5th doc gets a 1-byte-perturbed
    * copy planted at −(id+1) — negated, not a fixed +1e6 offset, so the
    * planted ids stay disjoint from real doc_ids at EVERY scale (the
    * offset collided past 1M docs, inside the decade-audit range; r10
    * ADVICE on q74, same fixture shape). aHash + pigeonhole hamming join
    * recovers the planted pairs that exact digests (q73) cannot
    * (different md5). Full oracle: the stub-hash arithmetic is pure SQL. */
  def q97PhashDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val perturbed = docs.where(pmod(col("doc_id"), lit(5)) === 0)
      .select((-col("doc_id") - 1L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("x")).as("text"))
    val corpus = docs.select("doc_id", "text").unionByName(perturbed)
    Binary.perceptualNearDups(
      spark, Binary.withPayload(corpus, "text"), "doc_id", maxHamming = 3)
      .orderBy("a", "b")
  }

  /** CCNet-style LM quality scoring (Wenzek et al., LREC 2020): add-½
    * bigram LM trained on the trusted slice (English docs, train split),
    * per-doc cross-entropy/perplexity over the whole corpus. Per-bigram
    * log-probs are 6dp DECIMALs before summing, so the oracle compare is
    * engine-exact (order-free integer addition, not float association). */
  def q105LmPerplexity(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    LanguageModel.perplexity(
      docs.select("doc_id", "text"),
      docs.where(col("lang") === "en" && pmod(col("doc_id"), lit(10)) < 8),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  /** GPT-3/LLaMA-style quality classifier: add-½ Naive-Bayes log-odds
    * (the closed-form linear BoW classifier) trained on the train slice
    * labeled "looks English", scored over the whole corpus. Integer-ratio
    * probabilities + 6dp DECIMAL weight sums make score AND sign
    * engine-exact — full DuckDB oracle. */
  def q106NbClassifier(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Classifier.nbScore(
      docs.select("doc_id", "text"),
      docs.where(pmod(col("doc_id"), lit(10)) < 8)
        .select(col("doc_id"), col("text"), (col("lang") === "en").as("label")),
      "doc_id", "text", "label")
      .orderBy("doc_id")
  }

  /** DSIR importance resampling (Xie et al., NeurIPS 2023): hashed
    * unigram+bigram bucket models (md5-prefix buckets — engine-portable
    * hashing), add-½ integer-ratio log importance weights summed as 6dp
    * DECIMALs, Gumbel top-k selection seeded by the Knuth id hash. The
    * whole select-toward-target pipeline has an exact DuckDB oracle. */
  def q107DsirResample(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Importance.dsirResample(
      docs.select("doc_id", "text"),
      docs.where(col("lang") === "en" && pmod(col("doc_id"), lit(10)) < 8)
        .select("doc_id", "text"),
      "doc_id", "text", sampleN = 100)
  }

  /** Crawl-level URL dedup: synthetic crawl URLs (deterministic in BOTH
    * engines — scheme/host case noise, www. prefixes, utm_* tracking
    * params incl. back-to-back ones, fragments, trailing slashes) are
    * canonicalized and collapsed to one kept doc per canonical URL.
    * Exact oracle: every canonicalization step is a portable primitive. */
  def q109UrlDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = col("doc_id")
    def s(c: org.apache.spark.sql.Column) = c.cast("string")
    val url = concat(
      lit("HTTPS://"),
      when(pmod(d, lit(3)) === 0, lit("WWW.")).otherwise(lit("")),
      col("source"), lit(".Example.com/p/"), s(pmod(d, lit(50))),
      when(pmod(d, lit(4)) === 0, lit("/")).otherwise(lit("")),
      when(pmod(d, lit(5)) === 0, concat(lit("?utm_source=feed&ref="), s(pmod(d, lit(7)))))
        .when(pmod(d, lit(5)) === 1, concat(lit("?ref="), s(pmod(d, lit(7)))))
        .when(pmod(d, lit(5)) === 2,
          concat(lit("?ref="), s(pmod(d, lit(7))), lit("&utm_campaign=x&utm_x=1")))
        .otherwise(lit("")),
      when(pmod(d, lit(6)) === 0, lit("#frag")).otherwise(lit("")))
    val crawl = t(spark, dir, "documents").select(d, url.as("url"))
    Urls.dedupByUrl(crawl, "doc_id", "url").orderBy("canon_url")
  }

  /** Exact global top-15 words at sketch shuffle cost: Misra-Gries
    * candidate pass (a native TypedImperativeAggregate — ≤ k counters per
    * mapper on the wire) + exact recount of the ≤ k candidates, certified
    * against the MG slack or failed loudly. Exact output → exact oracle. */
  def q113HeavyHitters(spark: SparkSession, dir: String): DataFrame =
    Sketches.exactTopN(
      t(spark, dir, "documents").select(explode(TextAnalysis.tokens(col("text"))).as("w")),
      col("w"), n = 15, k = 64)

  /** Exact top-20 users by event count via the LONG-keyed Misra-Gries
    * (primitive counters — no boxing, no string materialization on the
    * update path; the shape fingerprint/id streams use). Certified exact
    * (here by coverage: distinct users ≤ k at every test SF; at scale an
    * uncertified result fails loudly) → exact oracle. */
  def q117TopUsers(spark: SparkSession, dir: String): DataFrame =
    Sketches.exactTopNLong(
      t(spark, dir, "events"), col("user_id"), n = 20, k = 4096)

  /** Per-source exact top-5 words via grouped Misra-Gries: one groupBy of
    * mergeable sketches, broadcast candidate pairs, exact recount, window
    * top-n — certification (coverage or slack) runs inside the plan and
    * any uncertified group fails loudly. Exact output → exact oracle. */
  def q114HeavyHittersGrouped(spark: SparkSession, dir: String): DataFrame =
    Sketches.exactTopNPerGroup(
      t(spark, dir, "documents")
        .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("w")),
      "source", col("w"), n = 5, k = 64)
      .orderBy("source", "rank")

  /** Exact top-3 orders by price per priority via the bounded TopK
    * aggregate (functions.TopK) — k pairs per (mapper, group) on the
    * wire instead of the window idiom's whole-table shuffle + sort.
    * Total order (price desc, key asc) ⇒ exact, so an exact oracle. */
  def q121TopkGroup(spark: SparkSession, dir: String): DataFrame =
    Sketches.topKPerGroup(
      t(spark, dir, "orders"), Seq("o_orderpriority"),
      col("o_totalprice"), col("o_orderkey"), k = 3)
      .select(col("o_orderpriority"), col("rank"),
        col("id").as("o_orderkey"), col("score").as("o_totalprice"))
      .orderBy("o_orderpriority", "rank")

  /** JSONL export manifest: (doc_id, text) rows serialized to compact
    * JSON (nulls explicit), byte-weighted (+1 newline), packed into
    * contiguous 64 KiB shards in doc_id order by the distributed prefix
    * sum — the manifest a training loader schedules from. The oracle
    * recomputes the BYTES from its own `to_json`, so the serialized
    * length arithmetic (not just the packing) is cross-engine exact;
    * the physical one-file-per-shard write is spec-pinned against the
    * filesystem in JsonlSinkSpec. */
  def q122JsonlManifest(spark: SparkSession, dir: String): DataFrame =
    graft.sinks.JsonlSink.manifestOnly(
      t(spark, dir, "documents").select(col("doc_id"), col("text")),
      Seq("doc_id"), budgetBytes = 65536L)

  /** Top-15 session paths (first 5 event types per 30-min-gap session,
    * joined with `->`), ranked by frequency — the discovery twin of
    * q68's prescribed funnel. Exact SQL oracle (same session rule as
    * q21, ordered string_agg). */
  def q126TopPaths(spark: SparkSession, dir: String): DataFrame =
    Paths.topPaths(t(spark, dir, "events"), "user_id", "ts", "event_type",
      gapSeconds = 1800L, tiebreak = "event_id", maxSteps = 5, k = 15)

  /** PageRank over the purchase graph: customer → supplier edges from
    * orders⋈lineitem, plus supplier → customer back-edges on returned
    * items (l_returnflag = 'R') so the graph is cyclic with genuine
    * dangling nodes (suppliers nobody returned to). Fixed 5 iterations;
    * ranks scaled to mean 1 and rounded so both engines' IEEE results
    * collide at 6 decimals. Supplier nodes are NEGATED keys (suppkey ≥ 1,
    * custkey ≥ 1, so the spaces are disjoint at every SF — the old +1e6
    * offset aliased suppliers onto customers once custkey passed 1M,
    * sf≈10; same fixture lesson as q74/q97, r10 ADVICE). */
  def q127PageRank(spark: SparkSession, dir: String): DataFrame = {
    val joined = t(spark, dir, "orders").join(
      t(spark, dir, "lineitem"),
      col("o_orderkey") === col("l_orderkey"))
    val supplierNode = -col("l_suppkey")
    val fwd = joined.select(col("o_custkey").as("src"), supplierNode.as("dst"))
    val back = joined.where(col("l_returnflag") === lit("R"))
      .select(supplierNode.as("src"), col("o_custkey").as("dst"))
    val pr = Graph.pageRank(fwd.unionAll(back), "src", "dst",
      iters = 5, damping = 0.85)
    val n = pr.count().toDouble
    pr.select(col("node"), round(col("rank") * lit(n), 6).as("rank_n"))
      .orderBy("node")
  }

  /** Per-document curation lineage over the same corpus/benchmark split as
    * [[q93CurateCorpus]]: one row per input doc naming the first stage
    * that dropped it (quality / duplicate / contaminated) or 'kept'. */
  def q128CurationAudit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Graft.curateCorpusAudit(
      docs.where(pmod(col("doc_id"), lit(97)) =!= 0).select("doc_id", "text"),
      "doc_id", "text",
      docs.where(pmod(col("doc_id"), lit(97)) === 0).select("doc_id", "text"),
      maxContam = 0.2)
      .orderBy("doc_id")
  }

  /** HTML-to-text extraction over a deterministically built page wrapper
    * (script/style/comment/tag strip, entity decode with `&amp;` last,
    * whitespace collapse) — every pattern RE2-compatible, so the oracle
    * runs the identical `regexp_replace` chain. */
  def q125HtmlStrip(spark: SparkSession, dir: String): DataFrame = {
    val html = concat(
      lit("<html><head><style>p{color:red}</style><script>var x=1<2;</script></head><body><h1>Doc "),
      col("doc_id").cast("string"),
      lit("</h1><p>"), col("text"),
      lit("</p><!-- note --> A&amp;B &lt;tag&gt; 1&nbsp;2</body></html>"))
    // sort below the projection (payload-sized output — see q85's note)
    Curation.stripHtml(
      t(spark, dir, "documents").orderBy("doc_id")
        .select(col("doc_id"), html.as("html")),
      "html", "clean_text")
      .select("doc_id", "clean_text")
  }

  /** Unicode NFC normalization (native codegen expression — Spark has no
    * builtin): canonically-equal text in different normal forms defeats
    * exact dedup (different bytes → different md5s/shingles), so curation
    * normalizes before fingerprints. A combining-accent suffix is
    * injected deterministically in both engines; JVM Normalizer NFC is
    * byte-compatible with DuckDB's nfc_normalize, so the md5 of the
    * composed text is oracle-exact. */
  def q124NfcNormalize(spark: SparkSession, dir: String): DataFrame = {
    val injected = concat(col("text"), lit(" caf"), lit("e"), lit("\u0301"), lit(" nfd"))
    // sort below the projection (payload-sized output \u2014 see q85's note)
    t(spark, dir, "documents").orderBy("doc_id").select(
      col("doc_id"),
      graft.functions.TextNorm.unicodeNormalize(injected).as("norm_text"))
      .withColumn("fp", md5(col("norm_text").cast("binary")))
  }

  /** Corpus snapshot diff — the release audit (added/removed/modified/
    * unchanged per doc id, identity = normalized-text fingerprint so
    * formatting edits don't count). Both snapshots derive
    * deterministically from `documents` in both engines; text never
    * shuffles (both sides reduce to (id, fp) before the one full-outer
    * equi-join). */
  /** Two-corpus overlap profile via a KMV bottom-k sketch: 60%/60% doc
    * splits with a designed 20% overlap band; neither corpus ever joins
    * or shuffles (bounded per-partition sketches only). k exceeds every
    * tested SF's distinct count, so the output is CERTIFIED exact
    * (`is_exact` = true) and the oracle is plain distinct-set SQL; the
    * estimator regime is spec-pinned within its 1/sqrt(k) bound. */
  /** Deterministic global shuffle + sharding of the corpus (8 shards,
    * seed 42): reproducible training order, shard-parallel windows, no
    * global sort. Exact oracle: the portable Knuth mix and the
    * (key, id) tie-break are plain int64 SQL. */
  def q132ShuffleShards(spark: SparkSession, dir: String): DataFrame =
    operators.Sampling.shuffleShards(
      t(spark, dir, "documents").select("doc_id", "lang"),
      "doc_id", shards = 8, seed = 42L)
      .select("doc_id", "lang", "shard", "pos")
      .orderBy("shard", "pos")

  def q131CorpusOverlap(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    operators.Sketches.corpusOverlap(
      docs.where(pmod(col("doc_id"), lit(10)) < 6),
      docs.where(pmod(col("doc_id"), lit(10)) >= 4),
      "text", k = 1 << 13)
  }

  /** Per-snapshot overlap MATRIX from ONE grouped aggregate: three
    * overlapping doc snapshots sketched by the native [[functions.KmvAgg]]
    * bottom-k aggregate (state merges map-side; the corpus is read once),
    * pairwise stats from the driver-combined sketches. k exceeds every
    * tested SF's distinct count → certified exact, plain SQL oracle; the
    * estimator regime shares [[operators.Sketches]]' spec-pinned math. */
  def q134OverlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val m = pmod(col("doc_id"), lit(10))
    val snaps = docs.where(m < 6).withColumn("snap", lit("s1"))
      .unionByName(docs.where(m >= 3 && m < 9).withColumn("snap", lit("s2")))
      .unionByName(docs.where(m >= 6 || m < 2).withColumn("snap", lit("s3")))
    val k = 1 << 13
    operators.Sketches.overlapMatrix(
      operators.Sketches.groupKmv(snaps, "snap", col("text"), k), k)
      .orderBy("ga", "gb")
  }

  /** Exact phrase-occurrence search against a POSITIONAL inverted index:
    * every doc containing "slow hash batch" consecutively, with
    * overlapping occurrences counted — the exact-quote decontamination
    * complement to q120/q130's ranked retrieval. Oracle counts 3-gram
    * start positions with plain list arithmetic. */
  def q135PhraseSearch(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val path = indexPath(dir, "textpos")
    operators.TextIndex.writePositional(
      docs.where(pmod(col("doc_id"), lit(487)) =!= 0), "doc_id", "text",
      path, buckets = 32)
    operators.TextIndex.phraseCount(spark, path, "slow hash batch")
      .orderBy("doc_id")
  }

  def q123CorpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = t(spark, dir, "documents")
    val old = d.where(col("doc_id") % 7 =!= 3).select(col("doc_id"), col("text"))
    val neu = d.where(col("doc_id") % 5 =!= 2).select(
      col("doc_id"),
      when(col("doc_id") % 11 === 0, concat(col("text"), lit(" version two")))
        .otherwise(col("text")).as("text"))
    Curation.corpusDiff(old, neu, "doc_id", "text").orderBy("doc_id")
  }

  /** Content-defined chunking: boundaries set by a window-hash predicate,
    * so chunk identity survives insertions (shift-resistant dedup chunks —
    * the storage-side complement of q80's fixed word chunker). Pure
    * integer polynomial hash → exact DuckDB oracle for boundaries, lens,
    * and chunk md5s. */
  def q111CdcChunks(spark: SparkSession, dir: String): DataFrame =
    Curation.cdcChunks(t(spark, dir, "documents"), "doc_id", "text", k = 8, divisor = 64)
      .orderBy("doc_id", "chunk_idx")

  /** Gopher repetition signals the per-word stats miss: fraction of each
    * document's n-gram occurrences (n = 2, 3, 4) belonging to an n-gram
    * repeated within the doc. String gram keys here so the DuckDB oracle
    * reproduces them; `hashGrams = true` is the 100 TB form (spec-proven
    * equal). Integer ratios at 6dp — exact oracle. */
  def q108DupNgrams(spark: SparkSession, dir: String): DataFrame =
    Curation.dupNgramStats(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

}
