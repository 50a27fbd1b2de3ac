package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for document/embedding corpora.
  *
  * Scale design (SURVEY §4): every variant avoids the O(N²) cross join —
  * exact dedup is a single hash aggregation; n-gram near-dup generates
  * candidates through an equi-join on shared shingles (only docs that share
  * at least one shingle ever meet); embedding near-dup is the one
  * intentionally exact/quadratic variant (the approximate scale path is
  * MinHashLSH / SimHash / Similarity IVF).
  */
/** Open-addressing long→long counter for [[Dedup.densePairCounts]]' fused
  * pair generator: packed-pair keys (a<<32|b, a<b, both in [0,2^31)) are
  * never 0 (b > a ≥ 0 forces a nonzero low word or a nonzero high word),
  * so 0 marks an empty slot. Linear probing over byteswap64-spread
  * hashes, load factor ≤ ½, grow-by-doubling until `maxEntries` — past
  * it [[add]] returns false and the caller drains (the partial
  * aggregate's spill-to-shuffle analogue: per-task memory stays bounded
  * regardless of posting skew, and the downstream sum over fragments is
  * exact). Instantiated per task inside mapPartitions — never serialized. */
private[operators] final class PairCountMap(initialCap: Int, maxEntries: Int) {
  private var cap = Integer.highestOneBit(math.max(initialCap, 64))
  private var mask = cap - 1
  private var keys = new Array[Long](cap)
  private var vals = new Array[Long](cap)
  private var n = 0

  def add(k: Long): Boolean = {
    var i = (scala.util.hashing.byteswap64(k) & mask).toInt
    while (true) {
      val kk = keys(i)
      if (kk == k) { vals(i) += 1; return true }
      if (kk == 0L) {
        if (n >= maxEntries) return false
        keys(i) = k; vals(i) = 1L; n += 1
        // stop doubling at 2×maxEntries slots (≤ ~0.5 load at the flush
        // cap): the last grow would double peak task memory for probe
        // chains the flush makes unnecessary
        if (n.toLong * 2 >= cap && cap < 2L * maxEntries) grow()
        return true
      }
      i = (i + 1) & mask
    }
    true
  }

  private def grow(): Unit = {
    val ok = keys; val ov = vals
    cap *= 2; mask = cap - 1
    keys = new Array[Long](cap); vals = new Array[Long](cap)
    var i = 0
    while (i < ok.length) {
      val k = ok(i)
      if (k != 0L) {
        var j = (scala.util.hashing.byteswap64(k) & mask).toInt
        while (keys(j) != 0L) j = (j + 1) & mask
        keys(j) = k; vals(j) = ov(i)
      }
      i += 1
    }
  }

  /** Snapshot every entry, then reset to empty (capacity kept). */
  def drainAndReset(): Iterator[(Long, Long)] = {
    val out = new Array[(Long, Long)](n)
    var i = 0; var o = 0
    while (i < cap) {
      if (keys(i) != 0L) { out(o) = (keys(i), vals(i)); o += 1 }
      i += 1
    }
    java.util.Arrays.fill(keys, 0L)
    n = 0
    out.iterator
  }

  /** Live view of the remaining entries — the caller's FINAL drain. */
  def iterator: Iterator[(Long, Long)] = new Iterator[(Long, Long)] {
    private var i = 0
    private def seek(): Unit = { while (i < cap && keys(i) == 0L) i += 1 }
    seek()
    def hasNext: Boolean = i < cap
    def next(): (Long, Long) = {
      val r = (keys(i), vals(i)); i += 1; seek(); r
    }
  }
}

object Dedup {

  /** Exact dedup: keep the minimum id per identical text. One hash-agg
    * shuffle, map-side partial aggregation, no sort. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(col(textCol))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .select(idCol, "n_copies")

  /** Incremental ingest dedup: rows of `batch` whose normalized-text
    * fingerprint ([[TextAnalysis.fingerprint]]) does not already occur in
    * `corpus` — the "don't re-add what we have" gate every recurring crawl
    * ingest runs before appending.
    *
    * Scale shape: the corpus side reduces to DISTINCT 32-hex fingerprints
    * before the anti-join (text never leaves its scan), so the shuffle
    * moves fixed-width keys off the corpus regardless of document size;
    * the batch — tiny relative to the corpus in steady state — rides
    * through one anti-join. With the corpus fingerprint set maintained as
    * a bucketed table ([[Bucketing]]) the corpus-side shuffle also
    * disappears from the recurring run. */
  def incrementalDedup(
      batch: DataFrame, corpus: DataFrame, textCol: String): DataFrame = {
    val fp = TextAnalysis.fingerprint(col(textCol))
    val seen = corpus.select(fp.as("_fp")).distinct()
    batch.withColumn("_fp", fp)
      .join(seen, Seq("_fp"), "left_anti")
      .drop("_fp")
  }

  /** Serialized Bloom filter over the corpus' normalized-text fingerprints
    * (xxhash64 of [[TextAnalysis.fingerprint]]), built by Spark's own
    * runtime-filter aggregate (`BloomFilterAggregate` — the machinery
    * behind `spark.sql.optimizer.runtimeFilter.bloomFilter`): partials
    * merge map-side, so the one-partition final merge moves one bloom per
    * mapper, never a per-row shuffle. No DISTINCT is needed — inserting a
    * fingerprint twice is idempotent.
    *
    * Sizing: `expectedItems` may overestimate (fpp only improves); bits
    * follow the textbook optimum for (n, fpp). At 10⁹ distinct docs and
    * 1% fpp the filter is ~1.2 GB — broadcastable; beyond that, shard the
    * corpus and keep one bloom per shard, or fall back to the bucketed
    * anti-join ([[incrementalDedup]] + [[Bucketing]]). The aggregate
    * clamps silently at `spark.sql.optimizer.runtime.bloomFilter
    * .maxNumItems`/`.maxNumBits`, which would quietly raise the measured
    * fpp — so this `require`s the request fits and names the confs. */
  def corpusBloom(
      corpus: DataFrame, textCol: String,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftshim.ColumnShim
    require(expectedItems > 0, s"expectedItems must be positive, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0, 1), got $fpp")
    val numBits = org.apache.spark.util.sketch.BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val conf = corpus.sparkSession.conf
    val maxItems = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      .map(_.toLong).getOrElse(4000000L)
    val maxBits = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    require(expectedItems <= maxItems && numBits <= maxBits,
      s"bloom of $expectedItems items @ fpp=$fpp needs $numBits bits, over the session caps " +
        "(spark.sql.optimizer.runtime.bloomFilter.maxNumItems/.maxNumBits) — raise them, or " +
        "the aggregate would clamp silently and the real fpp would exceed the requested one")
    val key = ColumnShim.expression(xxhash64(TextAnalysis.fingerprint(col(textCol))))
    val agg = ColumnShim.column(
      new BloomFilterAggregate(key, Literal(expectedItems), Literal(numBits))
        .toAggregateExpression())
    corpus.select(agg).head.getAs[Array[Byte]](0)
  }

  /** [[incrementalDedup]] semantics (batch rows whose fingerprint is not
    * in the corpus) gated by a prebuilt corpus bloom — the steady-state
    * recurring-ingest shape, and the plan is shuffle-FREE:
    *
    *   1. probe: every batch row tests the broadcast-literal bloom
    *      (`BloomFilterMightContain`, codegen). No false negatives, so
    *      `might = false` rows are DEFINITELY new — emitted untouched.
    *      In steady state (most of a recrawl batch is dupes, the rest
    *      misses) the maybe set is |dupes| + fpp·|new|.
    *   2. confirm: one corpus SCAN probes the broadcast maybe-set
    *      fingerprints (semi join) — the corpus never shuffles, never
    *      sorts; duplicates collapse inside the broadcast hash relation,
    *      so no DISTINCT shuffle either. Bloom false positives die here:
    *      the final result is EXACT, identical to [[incrementalDedup]].
    *
    * Versus [[incrementalDedup]], which shuffles the corpus' distinct
    * fingerprints every batch: here the recurring cost is one corpus scan
    * + broadcast-sized joins, and the bloom itself amortizes across
    * batches (build once with [[corpusBloom]], then add each appended
    * batch's keys — or rebuild on the compaction cadence). */
  def bloomIncrementalDedup(
      batch: DataFrame, corpus: DataFrame, textCol: String,
      bloom: Array[Byte]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftshim.ColumnShim
    import org.apache.spark.sql.types.BinaryType
    val fp = TextAnalysis.fingerprint(col(textCol))
    def might(fpCol: Column): Column = ColumnShim.column(
      BloomFilterMightContain(
        Literal(bloom, BinaryType), ColumnShim.expression(xxhash64(fpCol))))
    val tagged = batch.withColumn("_fp", fp)
    val definiteNew = tagged.where(!might(col("_fp")))
    val maybe = tagged.where(might(col("_fp")))
    val confirmedDup = corpus.select(fp.as("_fp"))
      .join(broadcast(maybe.select("_fp")), Seq("_fp"), "left_semi")
    definiteNew
      .unionByName(maybe.join(broadcast(confirmedDup), Seq("_fp"), "left_anti"))
      .drop("_fp")
  }

  /** Distinct word n-gram shingles, exploded to (id, shingle) rows.
    * Docs shorter than n tokens produce no rows. */
  def shingles(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val toks = split(trim(col(textCol)), "\\s+")
    val sh = array_distinct(
      transform(
        sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
    df.where(size(toks) >= n)
      .select(col(idCol).as("_id"), explode(sh).as("shingle"))
  }

  /** [[shingles]] as one fused mapPartitions pass (tokenize → window →
    * per-doc string dedup), preceded by a width repartition — the
    * [[shingleHashes]] treatment for the STRING-keyed path. The
    * declarative chain's higher-order functions are interpreted and
    * allocate per shingle, and a local corpus arrives as a handful of
    * parquet splits, so q162's shingle pass ran ~45 s on 2 tasks at sf1
    * (ProbeStages r14) — the cost the round-13 board misattributed to
    * md5. Output rows are identical to [[shingles]] (same tokenizer
    * regex, same per-doc distinct-string set, `_id` cast to long);
    * DedupSpec pins fused == declarative on fuzzed text. */
  def shinglesFused(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String] else text.trim.split("\\s+")
          if (toks.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[String]()
            val sb = new java.lang.StringBuilder()
            (0 to toks.length - n).iterator.flatMap { i =>
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j))
                j += 1
              }
              val s = sb.toString
              if (seen.add(s)) Iterator.single((id, s)) else Iterator.empty
            }
          }
        }
      }
      .toDF("_id", "shingle")
  }

  /** Distinct shingles reduced to 64-bit xxhash64 tokens: (_id, sh) rows.
    * All downstream set arithmetic (sizes, intersections, equi-joins) runs
    * on fixed-width longs — the shuffle carries 8-byte keys instead of
    * full shingle strings. Cross-doc hash collisions are possible in
    * principle (~1e-6 expected over 10M shingles) but never observed at
    * test scale; the string-keyed `shingles` path remains available.
    *
    * Computed in one fused mapPartitions pass (tokenize → window → hash →
    * per-doc dedup) instead of the declarative explode(array_distinct(
    * transform(...))) chain: the higher-order functions are interpreted and
    * allocate a string per shingle, which made this the dominant cost (and
    * GC load) of every shingle-based operator. Hashes are identical to SQL
    * `xxhash64(shingle)` (seed 42), so results are unchanged. The input is
    * repartitioned to the session default parallelism first — local corpus
    * files arrive as a single split, which would otherwise serialize this
    * CPU-bound pass on one core (at scale, inputs are already split). */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .repartition(spark.sparkContext.defaultParallelism)
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val toks = if (text == null) Array.empty[String] else text.trim.split("\\s+")
          if (toks.length < n) Iterator.empty
          else {
            val seen = new java.util.HashSet[Long]()
            val sb = new java.lang.StringBuilder()
            (0 to toks.length - n).iterator.flatMap { i =>
              sb.setLength(0)
              var j = 0
              while (j < n) {
                if (j > 0) sb.append(' ')
                sb.append(toks(i + j))
                j += 1
              }
              val u = UTF8String.fromString(sb.toString)
              val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
              if (seen.add(h)) Iterator.single((id, h)) else Iterator.empty
            }
          }
        }
      }
      .toDF("_id", "sh")
  }

  /** HOT shingle hashes of a corpus — document frequency above
    * `hotMinDf`, worst offenders first, capped at `maxHot` (the bound
    * that keeps the driver collect and the InSet probe small; past the
    * cap the TOP offenders are still taken, so the filter degrades
    * gracefully, never silently). One map-side-combined aggregate over
    * the 8-byte hash rows. */
  private def hotShingles(
      sh: DataFrame, hotMinDf: Int, maxHot: Int): Array[Long] =
    sh.groupBy("sh").agg(count(lit(1)).as("_df"))
      .where(col("_df") > hotMinDf)
      .orderBy(col("_df").desc, col("sh").asc)
      .limit(maxHot)
      .select("sh").collect().map(_.getLong(0))

  /** Per-doc PPJoin prefixes under the FREQUENCY-AWARE global order
    * (cold-by-hash, then hot-by-hash): the prefix theorem holds for ANY
    * fixed total order of the shingle universe, and ordering frequent
    * shingles LAST keeps them out of prefixes — the classic refinement
    * (Chaudhuri et al. ICDE'06 order by ascending df). Under plain hash
    * order a corpus whose documents share stock phrases degenerates: the
    * round-8 sf1 audit measured 57M candidate pairs on 50k docs (near
    * all-pairs) because common 3-grams land in prefixes as often as rare
    * ones. With hot shingles (df > hotMinDf, broadcast InSet) pushed to
    * the back of the order, prefixes hold the rarest shingles and
    * candidates collapse to near-dups plus rare coincidences. Emits
    * (_id, sh) prefix rows. */
  private def freqOrderedPrefix(
      sh: DataFrame, tau: Double, hot: Array[Long]): DataFrame = {
    val plen = (col("_sz") - ceil(lit(tau) * col("_sz") - lit(1e-9)) + lit(1))
      .cast("int")
    val isHot: Column => Column =
      if (hot.isEmpty) _ => lit(false) else h => h.isin(hot.toSeq: _*)
    sh.groupBy("_id")
      .agg(collect_list(col("sh")).as("_hs"), count(lit(1)).as("_sz"))
      .withColumn("_ord", concat(
        sort_array(filter(col("_hs"), h => !isHot(h))),
        sort_array(filter(col("_hs"), h => isHot(h)))))
      .select(col("_id"), explode(slice(col("_ord"), lit(1), plen)).as("sh"))
  }

  /** xxhash64 (seed 42) of a string — identical to SQL `xxhash64(s)` and
    * to [[shingleHashes]]' fused-pass hashing. */
  private def xxh64(s: String): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    val u = UTF8String.fromString(s)
    XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
  }

  /** Corpus-wide top-k word n-grams by document frequency, two-phase
    * hashed so shingle TEXT never enters a corpus-wide shuffle (SURVEY §9):
    *
    * Phase 1 aggregates per-doc-distinct 8-byte xxhash64 shingle tokens
    * ([[shingleHashes]]' fused pass — the wide shuffle carries longs); the
    * k-th document-frequency threshold comes from one TakeOrdered over the
    * counts, and every hash at-or-above it (winners plus boundary ties) is
    * collected — bounded by `tieCap`, and a tie width beyond the cap FAILS
    * with a clear error rather than silently truncating a boundary whose
    * order needs strings. Phase 2 re-scans the corpus resolving ONLY
    * winner strings through a broadcast hash map (emit-once per
    * partition), so the final exact (n_docs DESC, shingle ASC) top-k sort
    * runs over at most winners × partitions short rows. Equal to the
    * single-phase string aggregate modulo xxhash64 collisions (the same
    * contract as the q31/q78 hashed paths). Returns (shingle, n_docs). */
  def topNgrams(
      df: DataFrame, idCol: String, textCol: String, n: Int, k: Int,
      tieCap: Int = 10000): DataFrame =
    topNgramsFromHashes(df, textCol, shingleHashes(df, idCol, textCol, n), n, k, tieCap)

  /** [[topNgrams]] over a precomputed (_id, sh) intermediate — the shape
    * [[graft.Graft.dedupSuite]] shares one shingle pass through. `df` /
    * `textCol` are still needed for the phase-2 winner-string resolution
    * scan. */
  def topNgramsFromHashes(
      df: DataFrame, textCol: String, shingleHashes: DataFrame, n: Int, k: Int,
      tieCap: Int = 10000): DataFrame = {
    require(k > 0, "need k > 0")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = shingleHashes
      .groupBy("sh").agg(count(lit(1)).as("n_docs"))
    val kth = counts.orderBy(col("n_docs").desc, col("sh").asc).limit(k)
      .agg(min(col("n_docs")).as("_kth"))
    // one plan → the counts aggregate's exchange is built once and reused
    // by both the threshold and the filter side
    val winners = counts.crossJoin(broadcast(kth))
      .where(col("n_docs") >= col("_kth"))
      .limit(k + tieCap + 1)
      .collect()
    require(winners.length <= k + tieCap,
      s"tie width at the k-th n-gram count exceeds tieCap=$tieCap — " +
        "raise it (or use the string-aggregate path) for this corpus")
    val winMap = winners.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bc = spark.sparkContext.broadcast(winMap)
    df.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val m = bc.value
        val emitted = new java.util.HashSet[Long]()
        val out = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        val sb = new java.lang.StringBuilder()
        it.foreach { text =>
          if (text != null && emitted.size < m.size) {
            val toks = text.trim.split("\\s+")
            if (toks.length >= n) {
              var i = 0
              while (i <= toks.length - n) {
                sb.setLength(0)
                var j = 0
                while (j < n) {
                  if (j > 0) sb.append(' ')
                  sb.append(toks(i + j))
                  j += 1
                }
                val s = sb.toString
                val h = xxh64(s)
                if (m.contains(h) && emitted.add(h)) out += ((s, m(h)))
                i += 1
              }
            }
          }
        }
        out.iterator
      }
      .toDF("shingle", "n_docs")
      .distinct()
      .orderBy(col("n_docs").desc, col("shingle").asc)
      .limit(k)
  }

  /** Word n-gram Jaccard near-duplicate pairs (similarity >= tau).
    *
    * Routed through the prefix-filtered candidate generator
    * ([[ngramJaccardPairsPrefix]]) — provably the same output (the prefix
    * theorem, plus the q129 spec's per-τ identity check against the dense
    * equi-join) at a fraction of the candidate volume: the dense
    * shared-shingle join meets every near-dup pair once per COMMON
    * shingle, which is exactly where a near-dup corpus is densest. The
    * dense generator survives as [[ngramJaccardPairsFromHashes]] for
    * callers with a precomputed shingle pass (and as the spec's reference
    * implementation).
    *
    * EAGER (r12): the result is materialized (localCheckpoint) at call
    * time — the candidate-volume stages run inside a mass-pinned shuffle
    * scope that must close before returning, so composition over the
    * returned pair list is NOT lazy, and the rows live in non-reliable
    * executor storage (recomputed-from-nothing on executor loss; on a
    * real cluster, persist the result before long downstream pipelines
    * if executors may decommission). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double): DataFrame =
    ngramJaccardPairsPrefix(df, idCol, textCol, n, tau)

  /** Exact meeting-pair intersection counts (a, b, sa, sb, common) for
    * every pair a < b sharing ≥ 1 shingle — the PRE-AGGREGATED POSTINGS
    * dense generator shared by the Jaccard and containment fallbacks.
    *
    * Structure (round 12, replacing the sort-merge self-join): the
    * exploded (_id, sh) rows are regrouped by shingle ONCE into a sorted
    * posting array of (id, setSize) structs; every C(df, 2) candidate
    * pair is then GENERATED from its posting row (codegen'd posexplode ×
    * tail-slice explode) straight into the map-side partial count — the
    * exploded rows are never re-shuffled, and set sizes RIDE the
    * postings as struct fields, so the billion-row pair stream never
    * joins a sizes table (a < b and sa/sb functionally depend on a/b, so
    * grouping by all four keeps pair cardinality unchanged).
    *
    * The sf10 probe that motivated this (round 12, ProbeStages on q31):
    * the old self-join's join+partial-count stage ran as 33 tasks —
    * AQE coalesces a stage by its INPUT bytes (0.75 GB of 8-byte
    * hashes), but this stage's OUTPUT is the ~1B-row meet volume, so
    * each task aggregated ~30M pairs and spilled 350 GB (42 GB disk,
    * 493 s of the query's 691 s); the downstream sizes joins sorted the
    * pair stream twice more (another ~70 GB spill). A stage whose
    * output is 1000× its input must be sized by its output: the meet
    * mass Σ C(df, 2) is known EXACTLY from the routing aggregate, so the
    * whole dense plan runs under [[graft.core.GraftSession
    * .withShufflePartitions]] pinned to mass / `pairsPerPartition`
    * tasks (clamped to [cores, AQE ceiling] by [[graft.core.GraftSession
    * .iterPartitions]] — on a cluster the ceiling scales with the
    * session's initialPartitionNum). `finish` completes the per-pair
    * plan (threshold filter, direction explode) INSIDE the pinned scope
    * so the materialization never checkpoints unfiltered pair volume.
    *
    * Per-shingle skew bound: one shingle's posting array is ONE row, so
    * its C(df, 2) pairs cannot split across tasks — `pairsPerPartition`
    * is an AVERAGE, and the true per-task bound is
    * max(pairsPerPartition, max_sh C(df_sh, 2)). The routed callers keep
    * that bound tight structurally: the prefix path demotes every
    * shingle with df > hotMinDf=64 (≤ 2016 pairs per posting), and the
    * dense route is taken exactly when sharing is UNIFORM (no dominant
    * shingle) or template-saturated via the hot-overflow exit — in the
    * overflow case a single hot shingle CAN still concentrate C(df, 2)
    * pairs in one task (AQE skew-split cannot help: pinned scope, single
    * row). If that corpus shape ever shows up in a board, split
    * oversized postings into chunked sub-arrays before the tail-slice
    * explode (chunking the OUTER posexplode side preserves the a < b
    * enumeration). */
  /** Disk budget for the dense generator's pair-stream shuffle (bytes).
    * Knob `graft.dedup.maxPairShuffleBytes` (-1 = unlimited); default on a
    * `local[*]` master is HALF the usable space of the first shuffle
    * local dir — every shuffle byte lands on this one host's disk, and
    * the r12 sf30 attempt showed what ignoring that costs (ENOSPC ~70 GB
    * into a ~150 GB pair shuffle, three dead queries and a poisoned
    * board). On a real cluster the default is unlimited: the same bytes
    * distribute across the executors' disks and the driver cannot see
    * that aggregate, so a budget there is the operator's to declare. */
  private def pairShuffleBudget(spark: org.apache.spark.sql.SparkSession): Long =
    spark.conf.getOption("graft.dedup.maxPairShuffleBytes").map(_.toLong)
      .filter(_ != -1L)
      .getOrElse {
        if (spark.sparkContext.isLocal) {
          val dir = spark.conf.getOption("spark.local.dir")
            .map(_.split(",").head)
            .getOrElse(System.getProperty("java.io.tmpdir", "/tmp"))
          new java.io.File(dir).getUsableSpace / 2
        } else Long.MaxValue
      }

  private[graft] def densePairCounts(
      sh: DataFrame, massHint: Long,
      pairsPerPartition: Long = 2L * 1000 * 1000)(
      finish: DataFrame => DataFrame): DataFrame = {
    val spark = sh.sparkSession
    val mass =
      if (massHint >= 0L) massHint
      else sh.groupBy("sh").agg(count(lit(1)).as("_df"))
        .agg(coalesce(sum(expr("(_df * (_df - 1)) DIV 2")), lit(0L)))
        .head().getLong(0)
    // Certify-or-refuse pre-flight (round 14, r12 VERDICT item 6): the
    // generated pair stream is near-unique (candidates are mostly
    // singleton meets), so the partial aggregate writes ~mass rows of
    // (a, b, sa, sb, count) to the shuffle. On DISK those are
    // lz4-compressed blocks, not UnsafeRows: calibrated against the r12
    // sf10 board — 2.75e9 pairs (MassProbe) → ~17 GB/query measured ≈
    // 6.2 B/pair — the default charges 8 B/pair (knob
    // graft.dedup.bytesPerPair; margin for less-compressible id
    // distributions). When the estimate cannot fit the budget, refuse
    // LOUDLY naming the bytes instead of dying with ENOSPC mid-shuffle
    // an hour in — the r12 sf30 attempt wrote ~70 GB of a ~150 GB
    // (= 3×2.75e9 pairs × ~6.2 B) trio shuffle into 69 GB of free disk
    // (the q113/q115 certify-or-refuse house style).
    val bytesPerPair = spark.conf.getOption("graft.dedup.bytesPerPair")
      .map(_.toLong).getOrElse(8L)
    val estBytes =
      if (bytesPerPair > 0 && mass > Long.MaxValue / bytesPerPair) Long.MaxValue
      else mass * bytesPerPair
    val budget = pairShuffleBudget(spark)
    if (estBytes > budget) throw new IllegalStateException(
      s"dense pair generation refused: estimated pair-stream shuffle " +
        s"$estBytes bytes ($mass pairs x $bytesPerPair B/pair) exceeds " +
        s"the shuffle-disk budget $budget bytes. Raise " +
        s"graft.dedup.maxPairShuffleBytes (or set -1 to disable), free " +
        s"local-dir disk, or cut the meet mass (higher tau / hotter " +
        s"hot-shingle cutoff).")
    val p = graft.core.GraftSession.iterPartitions(spark, mass, pairsPerPartition)
    // SLIM pair stream (round 15, r14 VERDICT item 1): the legacy stream
    // shuffles (a, b, sa, sb) + count — five longs per generated pair —
    // and the r15 sf10 ProbeStages put 360 s of q31's 448 s wall in
    // exactly that stage pair (49.6 GB partial-agg shuffle ≈ 18 B/pair ×
    // 2.75e9 pairs, then a 55 s final aggregate over it). sa/sb are
    // FUNCTIONS of a/b (they ride the key only so the threshold filter
    // can see them), and the set sizes live in a doc-sized table — so
    // when that table is provably broadcastable, shuffle NOTHING but the
    // pair identity: ids narrowed to int (§2.3 narrower types), the pair
    // packed into ONE long key (a<<32|b — hash/compare one word instead
    // of four), postings as plain sorted int arrays (halves the regroup
    // exchange and the collect_list peak), and sa/sb re-attached AFTER
    // the aggregate by two broadcast hash joins in the same stage.
    // Identical pair enumeration (ascending id order either way) and
    // identical output columns; DedupSpec pins slim == legacy. The
    // legacy shape remains THE path whenever the corpus is too big or
    // the ids don't fit: > slimSizesLimit docs (the broadcast budget —
    // ~16M rows ≈ 0.5 GB built relation), or ids outside [0, 2^31).
    // The decision costs one doc-stats aggregate over the (caller-
    // cached) hash rows — linear, ~1% of the pair stage it sizes.
    val sizesPlan = sh.groupBy("_id").agg(count(lit(1)).as("sz"))
    val slimLimit = spark.conf.getOption("graft.dedup.slimSizesLimit")
      .map(_.toLong).getOrElse(16L * 1000 * 1000)
    val slimOn = spark.conf.getOption("graft.dedup.slimPairs")
      .forall(_.toBoolean) // default true; the spec's A/B kill-switch
    val st = sizesPlan
      .agg(count(lit(1)).as("n"), min(col("_id")).as("lo"),
        max(col("_id")).as("hi")).head()
    val nDocs = st.getLong(0)
    val idsFit = nDocs == 0L ||
      (st.getLong(1) >= 0L && st.getLong(2) < (1L << 31))
    val slim = slimOn && nDocs <= slimLimit && idsFit
    // PINNED (coalesce disabled), not just sized: AQE coalesces stages by
    // map-output bytes, and the postings exchange is ~1000× smaller than
    // the pair volume its consumer generates — the r12 sf10 probe
    // measured the sized-but-coalescible variant collapsing back to
    // ~cores tasks with 426 GB of aggregation spill.
    graft.core.GraftSession.withPinnedShuffle(spark, p) {
      if (slim) {
        val spark2 = spark
        import spark2.implicits._
        val sizes = sizesPlan.localCheckpoint() // ≤ slimLimit rows
        val postings = sh
          .select(col("_id").cast("int").as("i"), col("sh"))
          .groupBy("sh")
          .agg(sort_array(collect_list(col("i"))).as("ps"))
        // FUSED generation + partial count (round 15): the declarative
        // posexplode × slice-explode chain carries the FULL posting array
        // on every outer row and allocates a fresh tail slice per
        // position — measured ~4 µs/pair of codegen+GC (355 s for
        // 2.75e9 pairs at sf10, the board's dominant stage). One
        // mapPartitions pass enumerates i<j directly off the primitive
        // int array and partial-counts into an open-addressing
        // long→long map (the Tungsten partial aggregate's role, minus
        // per-pair row traffic); the map flushes at a bounded entry
        // count, so per-task memory stays capped regardless of posting
        // skew, and the exchange carries (packed pair, partial count) —
        // the downstream sum is exact over flush fragments.
        val counts = postings
          .select(col("ps")).as[Array[Int]]
          .mapPartitions { it =>
            val m = new PairCountMap(1 << 16, 4 << 20)
            it.flatMap { a =>
              var flushed: Iterator[(Long, Long)] = Iterator.empty
              var i = 0
              val n = a.length
              while (i < n - 1) {
                val hi = a(i).toLong << 32
                var j = i + 1
                while (j < n) {
                  val pk = hi | a(j)
                  if (!m.add(pk)) { // at cap: drain, then the add retries
                    flushed = flushed ++ m.drainAndReset()
                    m.add(pk)
                  }
                  j += 1
                }
                i += 1
              }
              flushed
            } ++ m.iterator
          }
          .toDF("pk", "_pc")
          .groupBy("pk").agg(sum(col("_pc")).as("common"))
          .select(shiftrightunsigned(col("pk"), 32).cast("long").as("a"),
            col("pk").bitwiseAND(lit(0xFFFFFFFFL)).as("b"), col("common"))
          .join(broadcast(sizes.select(col("_id").as("a"), col("sz").as("sa"))), "a")
          .join(broadcast(sizes.select(col("_id").as("b"), col("sz").as("sb"))), "b")
          .select(col("a"), col("b"), col("sa"), col("sb"), col("common"))
        graft.core.GraftSession.dumpPlanIfAsked(
          finish(counts), "densePairCounts_slim").localCheckpoint()
      } else {
        val sizes = sizesPlan
        val postings = sh.join(sizes, "_id") // AQE broadcasts the doc-sized side
          .groupBy("sh")
          .agg(sort_array(collect_list(struct(col("_id").as("i"), col("sz").as("z"))))
            .as("ps"))
        val counts = postings
          .select(posexplode(col("ps")).as(Seq("_p", "x")), col("ps"))
          .select(col("x"), explode(slice(col("ps"), col("_p") + lit(2),
            size(col("ps")) - col("_p") - lit(1))).as("y"))
          .groupBy(col("x.i").as("a"), col("y.i").as("b"),
            col("x.z").as("sa"), col("y.z").as("sb"))
          .agg(count(lit(1)).as("common"))
        graft.core.GraftSession.dumpPlanIfAsked(
          finish(counts), "densePairCounts_legacy").localCheckpoint()
      }
    }
  }

  /** [[ngramJaccardPairs]] over a precomputed (_id, sh) intermediate
    * (caller controls caching — see [[graft.Graft.dedupSuite]]). The
    * dense postings generator ([[densePairCounts]]) with the Jaccard
    * threshold applied inside the mass-pinned scope; result is
    * materialized (localCheckpoint), so the caller may release `sh`
    * immediately. `massHint` lets the router pass the meet mass it
    * already computed instead of re-aggregating the vocabulary. */
  def ngramJaccardPairsFromHashes(
      sh: DataFrame, tau: Double, massHint: Long = -1L): DataFrame =
    densePairCounts(sh, massHint) { counts =>
      counts
        .withColumn("jaccard",
          col("common").cast("double") / (col("sa") + col("sb") - col("common")))
        .where(col("jaccard") >= tau)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
    }

  /** Prefix-filtered exact Jaccard pairs — same output as
    * [[ngramJaccardPairs]], far fewer candidate pairs at corpus scale.
    *
    * The shared-shingle equi-join generates one candidate row per COMMON
    * shingle of every meeting pair; near-duplicate pairs (the very pairs
    * we're hunting) share most of their shingles, so the candidate volume
    * is ~Σ common(a,b) — quadratic in similarity density. The prefix
    * filter (Chaudhuri/Ganti/Kaushik, ICDE 2006; Xiao et al.'s PPJoin
    * family builds on it) cuts that to at most one meeting per pair and
    * joins only a (1−τ)-fraction of each document's shingles:
    *
    * Under ANY fixed global order of the shingle universe, if J(A,B) ≥ τ
    * then |A∩B| ≥ ⌈τ·max(|A|,|B|)⌉, and by pigeonhole the smallest
    * common shingle must lie within the first |A| − ⌈τ·|A|⌉ + 1 shingles
    * of A AND the first |B| − ⌈τ·|B|⌉ + 1 of B — so joining
    * prefix×prefix loses no qualifying pair. The order is
    * FREQUENCY-AWARE ([[freqOrderedPrefix]]): hot shingles
    * (df > hotMinDf, one vocab aggregate + broadcast InSet) sort LAST so
    * prefixes hold the rarest shingles — without it a corpus of
    * stock-phrase-sharing documents degenerates toward all-pairs
    * candidates (57M pairs on 50k docs in the round-8 sf1 audit; ~2k
    * with the ordering). Verification then counts TRUE intersections
    * only for docs that produced a candidate: the full shingle sets are
    * semi-joined down to candidate docs before the counting join, and
    * the counting join itself is semi-joined to the candidate pair list
    * (broadcast — near-dup candidates are edge-bounded), so no
    * non-candidate pair is ever counted. Exact completeness AND exact
    * precision; the corpus-wide shuffle carries only 8-byte hashes.
    *
    * τ·|A| is computed with a 1e-9 downward guard before ⌈⌉ so a binary
    * rounding error can only LENGTHEN a prefix (safe), never shorten it. */
  def ngramJaccardPairsPrefix(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      broadcastPairLimit: Int = 1 << 20): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, n).cache()
    val out = ngramJaccardPairsPrefixFromHashes(sh, tau, broadcastPairLimit)
    sh.unpersist()
    out
  }

  /** Candidate pairs (a, b) from the frequency-ordered prefix×prefix
    * join alone — exposed so the spec can measure the candidate
    * reduction vs the full equi-join. The hot set comes from
    * [[jaccardDfRouting]] ITSELF (not a re-derivation), so the measured
    * candidate set provably uses the same frequency order as the routed
    * production path; the regroup is cached across the self-join sides
    * and the materialized result released before returning (one regroup
    * in the executed plan, not two). */
  private[graft] def prefixCandidates(sh: DataFrame, tau: Double): DataFrame = {
    val (hot, _, _) = jaccardDfRouting(sh, broadcastPairLimit = Int.MaxValue)
    val prefix = freqOrderedPrefix(sh, tau, hot).cache()
    val out = prefix.as("x").join(prefix.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
      .select(col("x._id").as("a"), col("y._id").as("b"))
      .distinct().localCheckpoint()
    prefix.unpersist()
    out
  }

  /** One vocab-sized df aggregate feeding BOTH routing tiers: the hot
    * set (df > `hotMinDf`, worst offenders first, capped) and the DENSE
    * meet mass Σ C(df, 2) — the exact row count of the dense equi-join's
    * shared-shingle meets. Returns (hot, tier0Dense): tier0Dense is true
    * when the hot set is EMPTY yet the dense mass already exceeds the
    * candidate limit — a corpus whose sharing is both pervasive and
    * UNIFORM (no shingle frequent enough to demote; the round-8 sf1
    * audit's 40-word-vocab synthetic, max df 25, candidates ≈ meets at
    * 57M on 50k docs). With nothing for the frequency order to push out
    * of prefixes, the filter provably has no lever, so the router goes
    * dense WITHOUT paying the prefix regroup it would only throw away.
    * Routing is performance-only — every path emits identical pairs
    * (spec-pinned per τ), and verifyPairs carries its own limit-probe
    * broadcast guard independent of this decision.
    *
    * Also returns the dense meet mass itself (third element): it is the
    * EXACT pair-row count of the dense generator, so the dense path
    * sizes its explosive stage from it ([[densePairCounts]]) instead of
    * letting AQE coalesce by input bytes — a stage whose output is
    * 1000× its input must be sized by its output. */
  private[graft] def jaccardDfRouting(
      sh: DataFrame, broadcastPairLimit: Int,
      hotMinDf: Int = 64, maxHot: Int = 1 << 16): (Array[Long], Boolean, Long) = {
    // ONE scan, ZERO storage: the dense mass rides the hot-set collect as
    // an Observation (the TakeOrdered child evaluates every vocab row, so
    // the metric sees them all). Persisting the vocab aggregate instead
    // measurably starved the dense join of execution memory — a marker-
    // heavy sf1 corpus has a ~100M-row shingle vocabulary, and its cache
    // forced 1.6 GB of aggregate spill per query.
    val obs = org.apache.spark.sql.Observation()
    // DIV (integral) — Divide would cast to double and lose exactness for
    // df beyond ~9.5e7, right where a 100M-row vocabulary puts routing
    // decisions near the threshold (r8 ADVICE)
    val hot = sh.groupBy("sh").agg(count(lit(1)).as("_df"))
      .observe(obs, coalesce(sum(expr("(_df * (_df - 1)) DIV 2")), lit(0L))
        .as("mass"))
      .where(col("_df") > hotMinDf)
      .orderBy(col("_df").desc, col("sh").asc).limit(maxHot + 1)
      .select("sh").collect().map(_.getLong(0))
    val denseMass = obs.get("mass").asInstanceOf[Long]
    // MORE hot shingles than the demotion list holds → take the dense
    // exit outright (round-10 sf10 audit: the cap used to TRUNCATE
    // silently, leaving every overflow hot shingle inside the prefixes —
    // the prefix join then meets their C(df, 2) pairs each, the exact
    // blowup demotion exists to prevent; q129 measured 25× linear with
    // ~200k hot shingles against the 65k cap. A corpus with > maxHot
    // demotable shingles is template-saturated: the filter provably has
    // no lever left, and dense meets stay Σ df² — linear in copies.)
    if (hot.length > maxHot) (Array.empty[Long], true, denseMass)
    else (hot, hot.isEmpty && denseMass > broadcastPairLimit.toLong, denseMass)
  }

  /** [[ngramJaccardPairsPrefix]] over a precomputed (_id, sh)
    * intermediate (caller keeps it cached — the hot-shingle aggregate,
    * the prefix regroup, and verification all consume it).
    *
    * ADAPTIVE, two-tier ([[jaccardDfRouting]] decides tier 0 from the df
    * aggregate alone): when the candidate list outgrows
    * `broadcastPairLimit`, the prefix filter has failed to filter — a
    * corpus whose documents share shingles UNIFORMLY (small
    * vocabularies, templated text; the round-8 sf1 audit measured 57M
    * candidates on 50k docs with NO shingle above df 25, where
    * frequency ordering has nothing to demote) makes candidates ≈
    * meets, and the prefix path would then pay the dense counting join
    * PLUS its own distinct and semi-join shuffles. Tier 0 catches the
    * hot-empty degenerate case before any prefix is built; tier 1
    * (below) decides the rest exactly on the prefix join's meet mass.
    * Past either probe the plan falls back to the single-shuffle dense
    * aggregate ([[ngramJaccardPairsFromHashes]]) — identical output by
    * the same theorem, strictly fewer exchanges. Zipfian corpora (real
    * text) stay on the prefix path with broadcast-sized candidates. */
  def ngramJaccardPairsPrefixFromHashes(
      sh: DataFrame, tau: Double, broadcastPairLimit: Int = 1 << 20): DataFrame =
    jaccardRoute(sh, tau, broadcastPairLimit) match {
      case (_, None, mass) =>
        // already materialized by the dense generator (checkpoint inside
        // its mass-pinned scope), so releasing `sh` afterwards is safe
        ngramJaccardPairsFromHashes(sh, tau, mass)
      case (_, Some(prefix), _) =>
        val cands = prefix.as("x").join(prefix.as("y"), col("x.sh") === col("y.sh"))
          .where(col("x._id") < col("y._id"))
          .select(col("x._id").as("a"), col("y._id").as("b"))
          .distinct().cache()
        val v = verifyPairs(sh, sh.groupBy("_id").agg(count(lit(1)).as("sz")),
          cands, tau, broadcastPairLimit)
          .localCheckpoint() // materialize, then release the cache (ADVICE r5)
        cands.unpersist()
        prefix.unpersist()
        v
    }

  /** The full routing decision and, on the prefix tier, the cached
    * prefix frame it was made from — ONE code path shared by the board
    * queries and the Bench regime probe, so the probe can never diverge
    * from what production executes (the probe ASSERTS tier choice and
    * exits non-zero on a routing regression — r8 VERDICT #4).
    * Tiers: 0 = dense before any prefix work (hot set empty AND dense
    * meet mass already over the limit); 1 = dense after the prefix
    * meet-mass probe; 2 = prefix. The tier-1 decision quantity is the
    * prefix join's MEET MASS Σ C(df_pfx, 2) — one vocab-sized aggregate
    * over the prefix rows, no pair join, and an upper bound on distinct
    * candidate pairs (so it also proves the broadcast safe on the
    * filtered path); probing the candidate list itself would execute
    * the very join the fallback exists to avoid. On tier 2 the returned
    * prefix frame is CACHED — the caller must unpersist it. The third
    * element is the DENSE meet mass Σ C(df, 2) from the routing
    * aggregate — on a dense tier the fallback sizes its explosive
    * stage from it ([[densePairCounts]]). */
  private[graft] def jaccardRoute(
      sh: DataFrame, tau: Double,
      broadcastPairLimit: Int): (Int, Option[DataFrame], Long) = {
    val (hot, tier0Dense, denseMass) = jaccardDfRouting(sh, broadcastPairLimit)
    if (tier0Dense) return (0, None, denseMass)
    val prefix = freqOrderedPrefix(sh, tau, hot).cache()
    val meetMass = prefix.groupBy("sh").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("(c * (c - 1)) DIV 2")), lit(0L)))
      .head().getLong(0)
    if (meetMass > broadcastPairLimit.toLong) {
      prefix.unpersist()
      (1, None, denseMass)
    } else (2, Some(prefix), denseMass)
  }

  /** Directed word-n-gram CONTAINMENT pairs: C(a→b) = |Sa∩Sb| / |Sa| ≥
    * `tau` — near-superset detection (Broder 1997's containment next to
    * q31's resemblance): a quoted-in-full document, a page embedded in a
    * crawl of its aggregator, a chunk extracted from its source. Jaccard
    * misses all of these when the container is much larger; containment
    * is the quantity contamination and provenance checks actually want.
    *
    * Same scale skeleton as the Jaccard family, asymmetric where the
    * math is: the prefix theorem holds one-sided — |Sa∩Sb| ≥ ⌈τ·|Sa|⌉
    * forces a's first |Sa| − ⌈τ·|Sa|⌉ + 1 shingles (ANY fixed order) to
    * intersect Sb, with NO constraint on b — so candidates come from
    * a-prefix × full-b, under the same frequency-aware order (hot
    * shingles demoted out of prefixes, [[jaccardDfRouting]]'s one vocab
    * scan). Routing compares the prefix join's meet mass Σ pfx_df·(df−1)
    * against the dense directed mass Σ df·(df−1) — both from vocab
    * aggregates, no pair join — and falls back to the single-shuffle
    * dense aggregate when the filter provably has no lever (identical
    * output either way; the verification counts true intersections only
    * for candidate pairs, broadcast-guarded by the same limit-probe
    * discipline as [[ngramJaccardPairsPrefixFromHashes]]).
    * Returns (a, b, containment), a ≠ b, containment rounded to 6dp.
    * EAGER like [[ngramJaccardPairs]]: materialized at call time (every
    * branch checkpoints), not a lazy plan. */
  def ngramContainmentPairs(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      broadcastPairLimit: Int = 1 << 20): DataFrame = {
    val sh = shingleHashes(df, idCol, textCol, n).cache()
    val out = ngramContainmentPairsFromHashes(sh, tau, broadcastPairLimit)
    sh.unpersist()
    out
  }

  /** [[ngramContainmentPairs]] over a precomputed (_id, sh) intermediate
    * (caller keeps it cached). */
  def ngramContainmentPairsFromHashes(
      sh: DataFrame, tau: Double, broadcastPairLimit: Int = 1 << 20): DataFrame = {
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("sz"))
    val (hot, hotOverflow, denseMass) = jaccardDfRouting(sh, broadcastPairLimit)
    // the Jaccard twin's tier-0 exit, honored here too (round 10): with
    // the hot set overflowed the prefix filter provably has no lever —
    // building the prefix anyway pays a regroup the meet-mass probe
    // immediately throws away
    if (hotOverflow)
      return denseContainment(sh, tau, denseMass)
    val prefix = freqOrderedPrefix(sh, tau, hot).cache()
    // both decision masses from vocab-sized aggregates — never a pair join
    val dfc = sh.groupBy("sh").agg(count(lit(1)).as("_df"))
    val pm = prefix.groupBy("sh").agg(count(lit(1)).as("_pdf"))
      .join(dfc, "sh")
      .agg(coalesce(sum(expr("_pdf * (_df - 1)")), lit(0L)))
      .head().getLong(0)
    val out =
      // every branch returns MATERIALIZED (the dense generator checkpoints
      // inside its mass-pinned scope; the prefix branch checkpoints here —
      // r9 ADVICE): the caller unpersists `sh` before any action on the
      // result, so a lazily-returned plan would re-run the whole shingle
      // pass on every action
      if (pm > broadcastPairLimit.toLong)
        denseContainment(sh, tau, denseMass)
      else {
        val cands = prefix.as("x").join(sh.as("y"), col("x.sh") === col("y.sh"))
          .where(col("x._id") =!= col("y._id"))
          .select(col("x._id").as("a"), col("y._id").as("b"))
          .distinct().cache()
        val v = verifyContainment(sh, sizes, cands, tau, broadcastPairLimit)
          .localCheckpoint()
        cands.unpersist()
        v
      }
    prefix.unpersist()
    out
  }

  /** Dense directed containment (the fallback and the spec's reference
    * implementation) — [[densePairCounts]]' postings generator (the
    * intersection is symmetric, so each pair is counted once under
    * a < b), with both directions materialized from the grouped row in
    * one projection: a→b divides by |Sa|, b→a by |Sb|, each filtered on
    * its own threshold, all inside the mass-pinned scope. */
  private[graft] def denseContainment(
      sh: DataFrame, tau: Double, massHint: Long = -1L): DataFrame =
    densePairCounts(sh, massHint) { counts =>
      counts
        // filter BEFORE the direction explode (round 15): the explode
        // doubles the ~mass-row aggregated stream only for the per-
        // direction filter to drop almost all of it; a pair can survive
        // in SOME direction iff the greater of the two quotients passes,
        // computed with the IDENTICAL cast/divide expressions, so the
        // per-direction filter below keeps exactly the same rows while
        // the explode runs over qualifying pairs only
        .where(greatest(col("common").cast("double") / col("sa"),
          col("common").cast("double") / col("sb")) >= tau)
        .select(explode(array(
          struct(col("a"), col("b"),
            (col("common").cast("double") / col("sa")).as("containment")),
          struct(col("b").as("a"), col("a").as("b"),
            (col("common").cast("double") / col("sb")).as("containment")))).as("r"))
        .select(col("r.a").as("a"), col("r.b").as("b"), col("r.containment"))
        .where(col("containment") >= tau)
        .select(col("a"), col("b"), round(col("containment"), 6).as("containment"))
    }

  /** Exact containment verification restricted to candidate pairs —
    * [[verifyPairs]]' discipline, directed: full sets semi-joined to
    * candidate docs, the counting join semi-joined to the (a, b) list,
    * divisor |Sa| only. */
  private[graft] def verifyContainment(
      sh: DataFrame, sizes: DataFrame, cands: DataFrame,
      tau: Double, broadcastPairLimit: Int): DataFrame = {
    val small = withinLimit(cands, broadcastPairLimit)
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val candIds = cands.select(col("a").as("_id"))
      .unionByName(cands.select(col("b").as("_id"))).distinct()
    val shc = sh.join(hint(candIds), Seq("_id"))
    shc.as("x").join(shc.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") =!= col("y._id"))
      .join(hint(cands),
        col("x._id") === col("a") && col("y._id") === col("b"), "left_semi")
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("common"))
      .join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sa"), "a")
      .withColumn("containment", col("common").cast("double") / col("sa"))
      .where(col("containment") >= tau)
      .select(col("a"), col("b"), round(col("containment"), 6).as("containment"))
  }

  /** True iff `df` (cached/checkpointed by the caller, so the probe does
    * not recompute an expensive plan) holds at most `limit` rows — a
    * limit-probe, never a full count of an oversized set. The shared
    * guard for "edge-bounded, so it broadcasts" claims: above the limit
    * the caller falls back to an unhinted (shuffle) join instead of
    * force-broadcasting an unbounded frame into the driver. */
  private def withinLimit(df: DataFrame, limit: Int): Boolean = {
    val l = math.min(limit, Int.MaxValue - 1) // limit+1 must not overflow
    df.limit(l + 1).count() <= l
  }

  /** Exact Jaccard verification restricted to candidate pairs: full sets
    * semi-joined to candidate docs, the counting join semi-joined to the
    * pair list — no non-candidate pair is ever counted, and completeness
    * is the prefix filter's theorem. The pair list is edge-bounded BY
    * CONTRACT; `broadcastPairLimit` enforces it with a limit-probe — a
    * pathological corpus whose candidates outgrow the knob degrades to
    * distributed (shuffle) semi-joins with identical output
    * (spec-proven) instead of an OOM'd driver broadcast. */
  private def verifyPairs(
      sh: DataFrame, sizes: DataFrame, cands: DataFrame,
      tau: Double, broadcastPairLimit: Int): DataFrame = {
    val small = withinLimit(cands, broadcastPairLimit)
    def hint(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    val candIds = cands.select(col("a").as("_id"))
      .unionByName(cands.select(col("b").as("_id"))).distinct()
    val shc = sh.join(hint(candIds), Seq("_id"))
    val common = shc.as("x").join(shc.as("y"), col("x.sh") === col("y.sh"))
      .where(col("x._id") < col("y._id"))
      .join(hint(cands),
        col("x._id") === col("a") && col("y._id") === col("b"), "left_semi")
      .groupBy(col("x._id").as("a"), col("y._id").as("b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(sizes.withColumnRenamed("_id", "a").withColumnRenamed("sz", "sa"), "a")
      .join(sizes.withColumnRenamed("_id", "b").withColumnRenamed("sz", "sb"), "b")
      .withColumn("jaccard",
        col("common").cast("double") / (col("sa") + col("sb") - col("common")))
      .where(col("jaccard") >= tau)
      .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Connected components over an undirected edge list, as (id, comp) with
    * comp = the minimum node id reachable from `id`.
    *
    * Hybrid by edge count — the right call at 100 TB, not just locally: a
    * near-dup EDGE list is orders of magnitude smaller than the corpus (edges
    * exist only where pairs passed a similarity gate), so the common case is
    * a few thousand-to-million edges hanging off billions of documents.
    * - `<= driverEdgeLimit` edges (checked with a limit-probe, not a full
    *   count): collect and run union-find (path compression + min-root
    *   union, so every root is its component's minimum id) — one Spark job
    *   total, and the resulting label table is broadcast-sized for the
    *   downstream join.
    * - larger: distributed min-label propagation — each round joins frontier
    *   labels across edges and keeps the per-node minimum, converging in
    *   O(component diameter) rounds (2-4 for the shallow stars/chains real
    *   duplicate clusters form). `localCheckpoint` truncates lineage each
    *   round so plans don't grow. At much larger diameters, alternating star
    *   contraction (Kiveris et al., "Connected Components in MapReduce")
    *   halves rounds; not needed at cluster shapes seen here.
    * Both paths produce identical deterministic labels. */
  def connectedComponents(
      edges: DataFrame, srcCol: String, dstCol: String, maxIter: Int = 50,
      driverEdgeLimit: Int = 1 << 20): DataFrame = {
    val typed = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
    val probe = typed.limit(driverEdgeLimit + 1).collect()
    if (probe.length <= driverEdgeLimit) {
      val spark = edges.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var root = x
        while (parent.getOrElse(root, root) != root) root = parent(root)
        var cur = x // path compression
        while (parent.getOrElse(cur, cur) != cur) { val nxt = parent(cur); parent(cur) = root; cur = nxt }
        root
      }
      probe.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = probe.iterator.flatMap(r => Iterator(r.getLong(0), r.getLong(1)))
        .toArray.distinct.sorted
      return nodes.map(nd => (nd, find(nd))).toSeq.toDF("id", "comp")
    }
    val spark = edges.sparkSession
    // Explicit iterative sizing (the q127 lesson, Graph.scala): each
    // round's min-label aggregate is the final stage of a localCheckpoint,
    // which AQE never coalesces (`.rdd`-consumed), and a cached final
    // stage materializes at the full wide-start ceiling — so the loop must
    // not inherit the global confs. The symmetric edge list lands at
    // hash(dst, cores) in the SAME pass that counts it (explicit
    // repartitions are never AQE-resized); the per-round propagation joins
    // on dst, so the edge side (the big one) never re-shuffles mid-loop.
    // Only a graph whose row count justifies more width re-lands at p.
    val cores = spark.sparkContext.defaultParallelism
    val sym0 = typed
      .unionByName(typed.select(col("dst").as("src"), col("src").as("dst")))
      .repartition(cores, col("dst"))
      .persist()
    val mSym = sym0.count()
    val p = graft.core.GraftSession.iterPartitions(spark, mSym)
    val sym =
      if (p == cores) sym0
      else {
        val s = sym0.repartition(p, col("dst")).persist()
        s.count()
        sym0.unpersist()
        s
      }
    graft.core.GraftSession.withShufflePartitions(spark, p) {
    try {
    var labels = sym.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("id"), least(col("src"), col("nmin")).as("comp"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val prop = sym.join(labels, col("dst") === col("id"))
        .groupBy("src").agg(min("comp").as("pcomp"))
        .select(col("src").as("pid"), col("pcomp"))
      // carry the previous label through the checkpoint so convergence is
      // an Observation riding the checkpoint's own job (round 14 — was a
      // separate filter+count job per round, pure driver latency at
      // O(diameter) rounds; metrics fire on localCheckpoint's
      // SQLExecution, same mechanism as Graph.pageRankImpl)
      val obs = org.apache.spark.sql.Observation()
      val next = labels.join(prop, col("id") === col("pid"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("pcomp"), col("comp"))).as("comp"),
          col("comp").as("ocomp"))
        .observe(obs, coalesce(
          sum(when(col("comp") =!= col("ocomp"), 1L).otherwise(0L)),
          lit(0L)).as("changed"))
        .localCheckpoint()
      // bounded wait + fallback job (r14 ADVICE): a dropped
      // SQLExecutionEnd must degrade to the old one-row count, not a hang
      changed = graft.core.GraftSession.observedOrElse[Long](obs, "changed")(
        next.agg(coalesce(
          sum(when(col("comp") =!= col("ocomp"), 1L).otherwise(0L)),
          lit(0L))).head().getLong(0))
      labels = next.select("id", "comp")
      iter += 1
    }
    // exhausting maxIter without convergence would return SILENTLY WRONG
    // labels (nodes > maxIter hops from their component's min id keep a
    // stale label) — a real shape at corpus scale, where chains of
    // successive near-identical edits have diameter ~ version count
    require(changed == 0,
      s"connectedComponents: not converged after $maxIter rounds - the " +
        "graph has a component of diameter > maxIter; raise maxIter " +
        "(rounds are O(diameter)) or pre-contract with star contraction")
    labels
    } finally sym.unpersist() // released on the refusal path too
    }
  }

  /** Near-duplicate clusters: every document labeled with the minimum doc id
    * of its n-gram-Jaccard component (singletons label themselves). This is
    * the "keep one per cluster" primitive a corpus dedup pipeline ends with:
    * survivors are rows where doc_id = cluster_id. */
  def nearDupClusters(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, tau)
    val comp = connectedComponents(pairs, "a", "b")
    df.select(col(idCol).cast("long").as("doc_id"))
      .join(comp, col("doc_id") === col("id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("cluster_id"))
  }

  /** Embedding cosine near-duplicate pairs via multi-table sign-LSH
    * blocking — the bucketed SCALE path to [[embeddingCosinePairs]]'
    * exact-but-quadratic scan.
    *
    * Candidates are pairs sharing a (table, bucket) cell in ANY of the
    * `tables` sign-hashes. The shuffle is SKINNY by design: rows entering
    * the self-equi-join carry only (id, bucket arrays) — never the
    * vectors — and a pair colliding in several tables is kept exactly
    * once by ARITHMETIC (the q87/IntervalJoin discipline: only the FIRST
    * table where both sides collide emits the pair), so there is no
    * dropDuplicates exchange at all. Vectors are re-attached to the
    * (edge-bounded, broadcast-guarded) candidate list ONCE, for the one
    * codegen'd cosine that verifies each candidate — PRECISION is exact
    * (every returned pair truly >= tau); only recall is approximate,
    * rising with `tables` (near-identical vectors collide in every table
    * w.h.p.).
    *
    * Hot cells — the TextIndex hot-bucket discipline: a clustered corpus
    * can funnel far more than its share of rows into one (table, bucket)
    * cell, and the self-join then goes quadratic in that cell. Cells
    * whose occupancy exceeds `hotCellLimit` (found by one skinny count —
    * there are at most N·tables/hotCellLimit of them, an arithmetic
    * bound, so the flag frame broadcasts) are sub-split by a SECOND
    * independent `bitsPerTable`-bit sign hash: collision in a hot cell
    * additionally requires the sub-buckets to match. True near-dups
    * agree on the sub-bits w.h.p. (identical vectors always), so the
    * split trades a sliver of hot-cell recall for a 2^bits reduction of
    * the quadratic term; cool cells are byte-identical to the unsplit
    * plan. */
  def embeddingCosinePairsLsh(
      df: DataFrame, idCol: String, vecCol: String, tau: Double,
      bitsPerTable: Int = 8, tables: Int = 4, seed: Long = 42L,
      hotCellLimit: Int = 4096, broadcastPairLimit: Int = 1 << 20): DataFrame = {
    import graft.functions.ArrayMath
    // lshCandidates returns its pair list ALREADY localCheckpointed — a
    // second checkpoint here would materialize the candidates twice (r8
    // ADVICE); the limit-probe below reads the one materialization
    val cands = lshCandidates(
      df, idCol, vecCol, bitsPerTable, tables, seed, hotCellLimit)
    val hintC =
      if (withinLimit(cands, broadcastPairLimit)) broadcast(cands) else cands
    val out = hintC
      .join(df.select(col(idCol).cast("long").as("a"), col(vecCol).as("_va")), Seq("a"))
      .join(df.select(col(idCol).cast("long").as("b"), col(vecCol).as("_vb")), Seq("b"))
      .withColumn("cosine", ArrayMath.cosine(col("_va"), col("_vb")))
      .where(col("cosine") >= tau)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
    out
  }

  /** Candidate pairs (a, b) for [[embeddingCosinePairsLsh]] — each pair
    * exactly once (first-shared-table arithmetic), vectors never
    * shuffled. Exposed so the spec can measure hot-cell candidate
    * reduction directly. */
  private[graft] def lshCandidates(
      df: DataFrame, idCol: String, vecCol: String,
      bitsPerTable: Int, tables: Int, seed: Long,
      hotCellLimit: Int): DataFrame = {
    val dim = Similarity.vecDim(df, vecCol, "embeddingCosinePairsLsh")
    val basePlanes = Similarity.hyperplanes(bitsPerTable * tables, dim, seed)
      .grouped(bitsPerTable).toSeq
    // independent second hash per table for hot-cell refinement; the
    // golden-ratio xor keeps it deterministic in `seed` but uncorrelated
    val subPlanes = Similarity
      .hyperplanes(bitsPerTable * tables, dim, seed ^ 0x9E3779B97F4A7C15L)
      .grouped(bitsPerTable).toSeq
    val baseArr = array(basePlanes.map(p =>
      Similarity.lshBucket(col(vecCol), p).cast("long")): _*)
    val subArr = array(subPlanes.map(p =>
      Similarity.lshBucket(col(vecCol), p).cast("long")): _*)
    // ONE pass computes every table's buckets; vectors are dropped here
    // and never enter a shuffle again
    val slim = graft.core.Par.fanOut(df.select(col(idCol), col(vecCol)))
      .select(col(idCol).cast("long").as("_id"),
        baseArr.as("_bb"), subArr.as("_sb"))
      .cache()
    val hotFrame = slim
      .select(posexplode(col("_bb")).as(Seq("_t", "_b")))
      .groupBy("_t", "_b").agg(count(lit(1)).as("_n"))
      .where(col("_n") > hotCellLimit)
      .select(col("_t"), col("_b"))
    // there are at most N·tables/hotCellLimit hot cells by arithmetic —
    // one bounded collect both detects hotness and (in the overwhelmingly
    // common small case) hands the sets to a codegen'd InSet probe with
    // ZERO extra joins; a pathological corpus past the collect limit
    // degrades to broadcast-join flagging with identical output
    val hotCollectLimit = 1 << 14
    val hotRows = hotFrame.limit(hotCollectLimit + 1).collect()
    val flagged =
      if (hotRows.isEmpty)
        slim.withColumn("_hot",
          array((0 until tables).map(_ => lit(false)): _*))
      else if (hotRows.length <= hotCollectLimit) {
        val byT = hotRows.groupBy(_.getInt(0))
          .map { case (t, rs) => t -> rs.map(_.getLong(1)) }
        slim.withColumn("_hot",
          array((0 until tables).map { t =>
            byT.get(t) match {
              case Some(bs) => col("_bb")(t).isin(bs.toSeq: _*)
              case None => lit(false)
            }
          }: _*))
      } else {
        val withFlags = (0 until tables).foldLeft(slim) { (acc, t) =>
          acc.join(
            broadcast(hotFrame.where(col("_t") === t)
              .select(col("_b").as(s"_hb$t"), lit(true).as(s"_ishot$t"))),
            acc("_bb")(t) === col(s"_hb$t"), "left")
            .drop(s"_hb$t")
        }
        withFlags.withColumn("_hot",
          array((0 until tables).map(t =>
            coalesce(col(s"_ishot$t"), lit(false))): _*))
          .drop((0 until tables).map(t => s"_ishot$t"): _*)
      }
    // cell key per table: (t, base, sub-if-hot) — cool cells keep the
    // plain base key, hot cells require the refinement hash to agree too
    val keyed = flagged.select(col("_id"), col("_bb"), col("_sb"), col("_hot"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("t"), col("_bb")(t).as("b"),
          when(col("_hot")(t), col("_sb")(t)).otherwise(lit(-1L)).as("s"))): _*))
        .as("_cell"))
    val x = keyed.select(col("_id").as("a"), col("_bb").as("_ba"),
      col("_sb").as("_sa"), col("_hot").as("_ha"), col("_cell"))
    val y = keyed.select(col("_id").as("b"), col("_bb").as("_bc"),
      col("_sb").as("_sc"), col("_cell"))
    // first-shared-table: a pair colliding in several tables survives only
    // in the smallest one — pure arithmetic over the carried bucket arrays,
    // no distinct/dropDuplicates exchange. Collision at t' means equal base
    // buckets AND (cell cool OR equal sub buckets); hotness is a property
    // of the CELL, so when the bases agree both rows carry the same flag.
    val noEarlier = !exists(
      filter(sequence(lit(0), lit(tables - 1)), i => i < col("_cell.t")),
      i => col("_ba")(i) === col("_bc")(i) &&
        (!col("_ha")(i) || col("_sa")(i) === col("_sc")(i)))
    val out = x.join(y, Seq("_cell"))
      .where(col("a") < col("b"))
      .where(noEarlier)
      .select(col("a"), col("b"))
      .localCheckpoint()
    slim.unpersist()
    out
  }

  /** The end-to-end pipeline verb: `df` minus every non-canonical
    * near-duplicate — the minimum-id member of each Jaccard component (and
    * every singleton) survives with ALL its original columns.
    *
    * Scale shape: the loser list is bounded by the EDGE set (only documents
    * that matched some pair can lose), which after the similarity gate is
    * orders of magnitude smaller than the corpus — so it broadcasts, and the
    * anti-join never shuffles the corpus. */
  def dedupCorpus(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      broadcastLoserLimit: Int = 1 << 20): DataFrame = {
    // localCheckpoint: materialize the loser list once so the
    // edge-bounded-broadcast guard's limit-probe costs a cached count,
    // not a recompute of the whole clustering
    val losers = nearDupClusters(df, idCol, textCol, n, tau)
      .where(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("_loser"))
      .localCheckpoint()
    val hinted = if (withinLimit(losers, broadcastLoserLimit)) broadcast(losers) else losers
    df.join(hinted, col(idCol).cast("long") === col("_loser"), "left_anti")
  }

  /** [[dedupCorpus]] with a QUALITY-AWARE keeper: within each near-dup
    * cluster the survivor is the member with the highest `score` (ties:
    * min id) instead of the min id — the curation-grade choice when
    * duplicates differ (keep the longest / least-boilerplate / highest-
    * classifier-score copy, drop the truncated mirror).
    *
    * Same 100 TB shape as [[dedupCorpus]]: cluster members are the
    * edge-bounded connected-component table (docs that matched SOME pair
    * — orders of magnitude smaller than the corpus), scores attach via a
    * broadcast semi-join of that table onto the corpus scan, the winner
    * per cluster is ONE struct-max aggregate (score, then −id, carrying
    * the id — no window sort), and the corpus itself only ever feels one
    * broadcast anti-join of the loser list. Singletons never enter any
    * join. `score` must be computable from the doc row (a Column over
    * `df`'s columns). */
  def dedupCorpusBy(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      score: Column, broadcastLoserLimit: Int = 1 << 20): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, tau)
    // (id, comp), edge-bounded by contract; localCheckpoint so the
    // broadcast guard's probe and the three downstream uses share one
    // materialization (the driver union-find path is already local)
    val comp = connectedComponents(pairs, "a", "b").localCheckpoint()
    val small = withinLimit(comp, broadcastLoserLimit)
    def hint(d: DataFrame): DataFrame = if (small) broadcast(d) else d
    // join FIRST, score AFTER (round 15, §1.2 "don't compute what you
    // throw away"): scores are only consumed for cluster MEMBERS (the
    // edge-bounded comp table), but scoring before the join computed the
    // score column — size(tokens(text)) for q133 — over the ENTIRE
    // corpus scan. With the projection above the broadcast join, the
    // expensive expression runs on members only; same rows, same values.
    val memberScores = df
      .select(col(idCol).cast("long").as("id") +: df.columns.map(col): _*)
      .join(hint(comp), Seq("id"))
      .select(col("id"), col("comp"), score.as("_score"))
    val winners = memberScores.groupBy(col("comp"))
      .agg(max(struct(col("_score"), (-col("id")).as("_nid"),
        col("id").as("_win"))).as("_m"))
      .select(col("_m._win").as("_winner"))
    val losers = comp.select(col("id").as("_loser"))
      .join(hint(winners), col("_loser") === col("_winner"), "left_anti")
    df.join(hint(losers), col(idCol).cast("long") === col("_loser"), "left_anti")
  }

  /** Directed containment CONSUMED into a curation label ([[
    * ngramContainmentPairs]]'s pair list was previously a dead end — the
    * aggregator/quoted-in-full user story ends at a verb, not a list):
    * one row per EMBEDDED document — a doc whose shingle set is (≥ tau)
    * contained in some other doc's — labeled `embedded_in` = its minimum
    * qualifying container. MUTUAL containment (near-identical docs, both
    * directions ≥ tau) keeps the min id and labels the larger — the q66
    * min-id-survives convention, so exact duplicates behave identically
    * under both verbs. A container may itself be embedded elsewhere;
    * lineage follows the chain, exactly as `dup_of` does in
    * [[graft.Graft.curateCorpusAudit]].
    *
    * Scale shape: the pair list is gate-bounded (only ≥-tau pairs exist
    * at all), the mutual check is a self-join of that bounded list with
    * itself — the corpus is never touched past the shared shingle pass. */
  def embeddedDocs(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double): DataFrame = {
    val pairs = ngramContainmentPairs(df, idCol, textCol, n, tau)
    val rev = pairs.select(col("a").as("_ra"), col("b").as("_rb"))
    pairs
      .join(rev, col("a") === col("_rb") && col("b") === col("_ra"), "left")
      .where(col("_ra").isNull || col("a") > col("b"))
      .groupBy(col("a").as("id")).agg(min(col("b")).as("embedded_in"))
  }

  /** [[dedupCorpus]] for the CONTAINMENT relation: `df` minus every
    * embedded document ([[embeddedDocs]]) — containers survive with all
    * their columns. Same 100 TB shape: the embedded list is edge-bounded,
    * so it broadcasts and the corpus only feels one anti-join. */
  def dedupCorpusContainment(
      df: DataFrame, idCol: String, textCol: String, n: Int, tau: Double,
      broadcastLoserLimit: Int = 1 << 20): DataFrame = {
    val emb = embeddedDocs(df, idCol, textCol, n, tau)
      .select(col("id").as("_loser"))
      .localCheckpoint()
    val hinted = if (withinLimit(emb, broadcastLoserLimit)) broadcast(emb) else emb
    df.join(hinted, col(idCol).cast("long") === col("_loser"), "left_anti")
  }

  /** Cosine of two float-vector columns, computed in double with a
    * sequential left fold (bit-identical to the SQL oracle's list_reduce).
    * Codegen'd — see [[graft.functions.DotProduct]]. */
  def cosine(a: Column, b: Column): Column = graft.functions.ArrayMath.cosine(a, b)

  /** Embedding cosine near-duplicate pairs (cosine >= tau), exact.
    *
    * Deliberately all-pairs within the corpus: exactness is the contract
    * here (the oracle is exact SQL). Norms are computed once per row BEFORE
    * the pair join (O(N·d), not O(N²·d)), so each surviving pair costs one
    * codegen'd dot product. The a<b self-join plans as a broadcast nested
    * loop with the smaller side broadcast; for corpora too large for that,
    * use MinHashLSH / SimHash / Similarity (IVF), which trade exactness for
    * an equi-join shape. */
  def embeddingCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, tau: Double): DataFrame = {
    import graft.functions.ArrayMath
    val withNorm = df.select(col(idCol), col(vecCol))
      .withColumn("_n", ArrayMath.norm2(col(vecCol)))
    // stream side repartitioned: a single-file corpus would otherwise probe
    // the whole broadcast nested loop from one task
    val x = withNorm.repartition(df.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("a"), col(vecCol).as("_va"), col("_n").as("_na"))
    val y = withNorm.select(col(idCol).as("b"), col(vecCol).as("_vb"), col("_n").as("_nb"))
    x.join(y, col("a") < col("b"))
      .withColumn("cosine", ArrayMath.dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")))
      .where(col("cosine") >= tau)
      .select(col("a"), col("b"), round(col("cosine"), 6).as("cosine"))
  }
}
