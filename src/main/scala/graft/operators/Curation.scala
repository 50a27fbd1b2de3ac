package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation verbs for training-data pipelines: rule-based quality
  * filtering (Gopher-style), repetition profiling, benchmark-contamination
  * measurement, fixed-size chunking, and weighted domain mixing.
  *
  * Reference behavior: wrds2pg has no curation surface (it copies tables
  * whole, wrds2pg/api.py:37 wrds_update); these are part of the
  * training-data-pipeline extension surface, shaped for 100 TB corpora:
  *
  *  - `qualityFlags` and `chunkWords` are pure codegen'd projections — zero
  *    shuffles, scale with input splits, filters/pruning push to the scan.
  *  - `repetitionStats` is two hash aggregates over REDUCED data (word
  *    counts combine map-side before either shuffle moves anything).
  *  - `ngramContamination` never materializes a cross product: documents
  *    meet the benchmark set through an equi-join on the n-gram string,
  *    and the benchmark side (distinct n-grams of a small eval suite) is
  *    broadcastable in practice — AQE picks that up from its actual size.
  *  - `domainMixSample` decides membership with pure 64-bit integer
  *    arithmetic on the row id (same Knuth mix as [[Sampling]]), so the
  *    sample is reproducible in any engine and stable under repartitioning;
  *    the per-domain rates ride in on a broadcast of a tiny counts table.
  */
object Curation {

  import TextAnalysis.tokens

  /** Gopher-style quality rule flags (word count window, mean-word-length
    * window, stopword floor, distinct-word-ratio floor) plus the combined
    * `keep` decision. Flags are INTs (0/1) so downstream aggregation
    * (`sum(flag)`) and cross-engine comparison are trivial.
    *
    * One codegen'd projection per row — no shuffle; a `WHERE keep = 1`
    * composed on top pushes nothing extra over the scan.
    */
  def qualityFlags(
      df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 20, maxWords: Int = 80,
      minMeanWordLen: Double = 4.2, maxMeanWordLen: Double = 4.8,
      minStopwordRatio: Double = 0.02,
      minDistinctRatio: Double = 0.35): DataFrame = {
    val text = col(textCol)
    val toks = tokens(text)
    val nWords = size(toks)
    val meanLen = TextAnalysis.meanWordLen(text)
    val stopR = TextAnalysis.stopwordRatio(text)
    val distR = size(array_distinct(toks)).cast("double") / nWords
    val flagLen = (nWords >= minWords && nWords <= maxWords).cast("int")
    val flagMwl = (meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen).cast("int")
    val flagStop = (stopR >= minStopwordRatio).cast("int")
    val flagRep = (distR >= minDistinctRatio).cast("int")
    df.select(
      col(idCol),
      nWords.as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(stopR, 6).as("stopword_ratio"),
      round(distR, 6).as("distinct_ratio"),
      flagLen.as("flag_len"),
      flagMwl.as("flag_word_len"),
      flagStop.as("flag_stopword"),
      flagRep.as("flag_repetition"),
      (flagLen === 1 && flagMwl === 1 && flagStop === 1 && flagRep === 1)
        .cast("int").as("keep"))
  }

  /** Per-document repetition profile: distinct-word fraction and the mass of
    * the single most frequent word — the classic boilerplate/spam signals a
    * quality filter thresholds on alongside [[TextAnalysis.compressionRatio]].
    *
    * Shape: explode → two stacked hash aggregates. The (doc, word) partial
    * counts combine map-side inside the first aggregate, so what shuffles is
    * bounded by per-document VOCABULARY, not token count; the second
    * aggregate reduces that to one row per document.
    */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(tokens(col(textCol))).as("w"))
      .groupBy(col(idCol), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol)).agg(
        sum("c").as("n_words"),
        count(lit(1)).as("n_distinct"),
        round(count(lit(1)).cast("double") / sum("c"), 6).as("distinct_frac"),
        round(max("c").cast("double") / sum("c"), 6).as("top_word_frac"))

  /** Word n-grams of `text` as space-joined strings (empty array when the
    * document is shorter than `n` words). */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Benchmark-contamination measurement: for every corpus document, the
    * fraction of its DISTINCT word n-grams that also occur anywhere in the
    * benchmark set (the decontamination gate run before training — docs
    * above a containment threshold get dropped or scrubbed).
    *
    * Both sides reduce to distinct n-grams BEFORE meeting: the corpus side
    * to (doc, ngram) pairs, the benchmark side to a bare ngram set that is
    * tiny relative to the corpus (an eval suite, not another corpus) and so
    * broadcasts — there is never a token-level or all-pairs intermediate.
    */
  /** @param hashGrams shuffle 8-byte xxhash64 gram keys instead of gram
    *        strings — the 100 TB default (distinct + join move fixed-width
    *        longs, not ~n·avg-word-len strings). Identical counts modulo a
    *        2^-64 per-pair collision chance (spec-checked equal on real
    *        text); keep strings when the oracle must reproduce the keys. */
  def ngramContamination(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int = 3,
      hashGrams: Boolean = false): DataFrame = {
    def grams(df: DataFrame, cols: Column*): DataFrame = {
      val exploded = df.select(cols :+ explode(wordNgrams(col(textCol), n)).as("_ng"): _*)
      val key = if (hashGrams) xxhash64(col("_ng")) else col("_ng")
      exploded.select(cols :+ key.as("ng"): _*)
    }
    val benchGrams = grams(benchmark)
      .distinct()
      .withColumn("hit", lit(1))
    // corpus side fans out first: the gram explode is CPU-bound and local
    // single-split inputs would otherwise run it on one core (core.Par)
    grams(graft.core.Par.fanOut(corpus.select(col(idCol), col(textCol))), col(idCol))
      .distinct()
      .join(benchGrams, Seq("ng"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_ngrams"),
        count(col("hit")).as("n_contaminated"),
        round(count(col("hit")).cast("double") / count(lit(1)), 6)
          .as("contam_frac"))
  }

  /** Fixed-size word chunking with overlap: document → (chunk_idx,
    * chunk_text, n_words) rows, the pre-tokenization step that turns a
    * filtered corpus into training sequences.
    *
    * Chunks start every `chunkSize - overlap` words; a document always
    * yields at least one chunk, and no chunk starts inside the final
    * `overlap` tail (so the last chunk may be short but never redundant).
    * Pure projection + explode: no shuffle, parallelism = input splits, and
    * the blow-up factor is bounded by 1/(chunkSize - overlap) of the token
    * count regardless of document skew.
    */
  def chunkWords(
      df: DataFrame, idCol: String, textCol: String,
      chunkSize: Int = 64, overlap: Int = 16): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      "need chunkSize > overlap >= 0")
    val stride = chunkSize - overlap
    val toks = tokens(col(textCol))
    val nChunks = greatest(
      ceil((size(toks) - overlap).cast("double") / stride), lit(1L))
    val chunk = slice(col("_toks"),
      (col("chunk_idx") * stride + 1).cast("int"), lit(chunkSize))
    // null text -> no chunks (explode-of-null semantics); without the
    // filter it yields one all-null chunk row whose null n_words breaks
    // downstream packing arithmetic
    df.where(col(textCol).isNotNull)
      .select(col(idCol), toks.as("_toks"),
        explode(sequence(lit(0L), nChunks - 1)).as("chunk_idx"))
      .select(col(idCol), col("chunk_idx").cast("int").as("chunk_idx"),
        array_join(chunk, " ").as("chunk_text"),
        size(chunk).as("n_words"))
  }

  /** Content-defined chunking (the FastCDC/LBFS family re-expressed):
    * chunk boundaries are set by the TEXT, not by offsets — a window-hash
    * boundary predicate cuts wherever the local content says so, which
    * makes chunk identity shift-resistant: insert a paragraph at the top
    * of a document and every downstream chunk of [[chunkWords]] changes,
    * while here only the chunks touching the edit do, so cross-version /
    * cross-doc chunk dedup (by `chunk_md5`) still hits. The storage-side
    * complement to the training-side fixed chunker.
    *
    * The boundary hash is a polynomial rolling form over `k` chars with a
    * per-step modulus — every value a ratio-free 63-bit integer, so the
    * DuckDB oracle reproduces boundaries (and therefore chunks) exactly.
    * One fused per-partition pass (the [[graft.operators.TextAnalysis
    * .winnow]] shape): a rolling hash over code points finds the cut
    * list in O(len) JVM work, chunk rows are emitted directly — zero
    * shuffles end-to-end, cost scales with input splits
    * ([[graft.core.Par.fanOut]] guards the single-split local case).
    * (The first cut computed every position's hash with an O(k)
    * higher-order fold — O(len·k) Catalyst nodes per doc and one of the
    * slowest queries on the sf0.1 board.)
    *
    * A window can only start at positions `2 .. L-k+1`, so docs shorter
    * than `k+1` chars are one whole-doc chunk — no minimum-size pathology.
    */
  /** @param withText also emit the chunk's text (`chunk_text`) — for
    *        consumers that store chunk content (the streaming chunk
    *        store); off by default so the stats/dedup path ships only
    *        offsets + md5. */
  def cdcChunks(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 8, divisor: Int = 64, withText: Boolean = false): DataFrame = {
    require(k >= 2 && divisor >= 2, "need window k >= 2 and divisor >= 2")
    val M = 1000000007L
    val pow = (1 until k).foldLeft(1L)((a, _) => a * 257 % M)
    val in = graft.core.Par.fanOut(df.select(col(idCol), col(textCol)))
    import org.apache.spark.sql.types._
    val outSchema = StructType(Seq(
      in.schema.head,
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("chunk_start", IntegerType, nullable = false),
      StructField("chunk_len", IntegerType, nullable = false),
      StructField("chunk_md5", StringType, nullable = true)) ++
      (if (withText) Seq(StructField("chunk_text", StringType, nullable = true)) else Nil))
    in.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = "0123456789abcdef".toCharArray
      it.flatMap { row =>
        val text = if (row.isNullAt(1)) null else row.getString(1)
        if (text == null || text.isEmpty) Iterator.empty
        else {
          // `substr`/`length`/`ascii` count code points; chunk offsets and
          // hash values must match that unit exactly.
          val n = text.codePointCount(0, text.length)
          val charAt = new Array[Int](n + 1) // code-point index -> char offset
          var ci = 0
          var cpi = 0
          while (cpi < n) { charAt(cpi) = ci; ci = text.offsetByCodePoints(ci, 1); cpi += 1 }
          charAt(n) = text.length
          def cp(i: Int): Int = text.codePointAt(charAt(i))
          val starts = scala.collection.mutable.ArrayBuffer(1)
          if (n >= k + 1) {
            var h = 0L
            var i = 0
            while (i < k) { h = (h * 257 + cp(i)) % M; i += 1 }
            var p = 2 // 1-based start of the NEXT window (p-1 is 0-based)
            while (p <= n - k + 1) {
              var t = (h - cp(p - 2) * pow % M) % M
              if (t < 0) t += M
              h = (t * 257 + cp(p + k - 2)) % M
              if (h % divisor == 0) starts += p
              p += 1
            }
          }
          val id = row.get(0)
          (0 until starts.length).iterator.map { i =>
            val s = starts(i)
            val e = if (i + 1 < starts.length) starts(i + 1) else n + 1
            val chunk = text.substring(charAt(s - 1), charAt(e - 1))
            md.reset()
            val dig = md.digest(chunk.getBytes(java.nio.charset.StandardCharsets.UTF_8))
            val sb = new java.lang.StringBuilder(32)
            var b = 0
            while (b < dig.length) {
              sb.append(hex((dig(b) >> 4) & 0xf)); sb.append(hex(dig(b) & 0xf)); b += 1
            }
            val base = Seq(id, i, s, e - s, sb.toString)
            org.apache.spark.sql.Row.fromSeq(if (withText) base :+ chunk else base)
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** PII-redaction patterns, deliberately restricted to syntax that parses
    * identically under Java regex (Spark) and RE2 (DuckDB, the oracle):
    * character classes + bounded repetition only — no lookaround, no
    * backreferences. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  private[graft] val PhoneRe = "555-[0-9]{4}"

  /** PII redaction: emails, IPv4 addresses, and (NANP-reserved 555-prefix)
    * phone numbers replaced with `<EMAIL>`/`<IP>`/`<PHONE>` tokens, with
    * per-category match counts kept for audit — the scrubbing step a corpus
    * runs between crawl and training.
    *
    * One codegen'd projection (three `regexp_count` + three chained
    * `regexp_replace` per row) — zero shuffles, scales with input splits.
    * Counts are taken on the ORIGINAL text; replacement order
    * email → IP → phone means an address is tokenized before the bare-IP
    * pattern could bite a dotted hostname tail.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val text = col(textCol)
    val clean = regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")
    df.select(
      col(idCol),
      clean.as("clean_text"),
      regexp_count(text, lit(EmailRe)).cast("int").as("n_emails"),
      regexp_count(text, lit(Ipv4Re)).cast("int").as("n_ips"),
      regexp_count(text, lit(PhoneRe)).cast("int").as("n_phones"))
  }

  /** Corpus-level boilerplate removal: split every document into
    * NON-overlapping `blockWords`-word blocks, count each block's document
    * frequency across the corpus, and strip block instances whose text
    * occurs in at least `minDocs` distinct documents — the header/footer/
    * template scrubber run after exact dedup (which only catches whole-doc
    * copies) and before quality scoring.
    *
    * Scale shape (three stages, no all-pairs anywhere):
    *   1. blocks are a pure projection + explode (no shuffle);
    *   2. the document-frequency pass aggregates (block, doc) pairs that
    *      combine map-side, and only blocks crossing `minDocs` survive —
    *      a tiny set by construction (true boilerplate), so
    *   3. the strip join broadcasts that set and the only corpus-sized
    *      shuffle is the per-document reassembly groupBy, which moves each
    *      block exactly once.
    * At 100 TB the frequency pass should hash blocks to 8-byte keys first
    * (as [[ngramContamination]]'s `hashGrams` does); string keys are kept
    * here so the SQL oracle can reproduce them verbatim.
    *
    * Returns (id, clean_text, n_blocks, n_dropped); a document whose every
    * block is boilerplate comes back with an empty `clean_text`.
    *
    * @param hashBlocks run the frequency pass (and the strip join) on
    *        8-byte xxhash64 block keys instead of block strings — the
    *        100 TB default, as with [[ngramContamination]]'s `hashGrams`
    *        (identical output modulo a 2^-64 per-block collision chance,
    *        spec-checked equal on real text); keep strings when the
    *        oracle must reproduce the keys. */
  def stripBoilerplate(
      df: DataFrame, idCol: String, textCol: String,
      blockWords: Int = 4, minDocs: Int = 5,
      hashBlocks: Boolean = false): DataFrame = {
    require(blockWords > 0 && minDocs > 1, "need blockWords > 0, minDocs > 1")
    val toks = tokens(col(textCol))
    val nBlocks = greatest(
      ceil(size(toks).cast("double") / blockWords), lit(1L))
    val blkText = array_join(slice(col("_toks"),
      (col("_g") * blockWords + 1).cast("int"), lit(blockWords)), " ")
    val blocks = graft.core.Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(col(idCol), toks.as("_toks"),
        explode(sequence(lit(0L), nBlocks - 1)).as("_g"))
      .select(col(idCol), col("_g"), blkText.as("_blk"),
        (if (hashBlocks) xxhash64(blkText) else blkText).as("_key"))
    val boiler = blocks
      .groupBy("_key").agg(count_distinct(col(idCol)).as("_df"))
      .where(col("_df") >= minDocs)
      .select(col("_key"), lit(1).as("_hit"))
    blocks.join(broadcast(boiler), Seq("_key"), "left")
      .groupBy(col(idCol)).agg(
        count(lit(1)).as("n_blocks"),
        count(col("_hit")).as("n_dropped"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("_hit").isNull, struct(col("_g"), col("_blk"))))),
            s => s.getField("_blk")),
          " ").as("clean_text"))
  }

  /** Group-relative quality gate: keep rows whose `scoreCol` sits at or
    * above the `minQuantile` cumulative-distribution point WITHIN its
    * domain — "top quartile by quality per source", the relative
    * counterpart to [[qualityFlags]]'s absolute thresholds (absolute rules
    * over-prune weak domains and under-prune strong ones).
    *
    * cume_dist = rank/count is a ratio of integers, so the kept set is
    * engine-exact (no float-accumulation boundary). One window shuffle
    * partitioned by domain; Spark's WindowExec streams each partition
    * sorted, so cost is a sort per domain, not a global one.
    */
  def relativeFilter(
      df: DataFrame, domainCol: String, scoreCol: String,
      minQuantile: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol)).orderBy(col(scoreCol).asc)
    df.withColumn("score_cd", round(cume_dist().over(w), 6))
      .where(col("score_cd") >= minQuantile)
  }

  /** Weighted domain mixing: keep a deterministic sample of each domain
    * sized toward `weight(domain) / totalWeight` of `targetTotal` rows —
    * the "mix web/code/books at 5:3:2" step of corpus assembly.
    *
    * Membership for row id `i` in domain `s` is the pure integer predicate
    *
    *   knuth(i) mod 10^6  ≤  (10^6 · targetTotal · w_s − 1) div (Σw · n_s)
    *
    * — the threshold form of `u · Σw · n_s < 10^6 · target · w_s` (for
    * nonnegative integers, `u·D < T  ⟺  T ≥ 1 ∧ u ≤ (T−1) div D`, an
    * identity with no remainder slack), so it is exactly reproducible in
    * any 64-bit-integer engine, stable under repartitioning, and caps at
    * keeping the whole domain when the quota exceeds it. Unlike the
    * multiplied-through form, `u` (up to 10^6) never enters a product: the
    * only overflow bounds are 10^6 · target · w_s < 2^63 (10^12 rows at
    * single-digit weights leaves ~100× room) and n_s · Σw < 2^63 (trivial —
    * that's row count times total weight). The per-domain counts are one
    * small aggregate broadcast back onto the corpus — the corpus itself
    * never shuffles.
    */
  /** Gopher-style duplicate n-gram fractions (Rae et al. 2021, "Scaling
    * Language Models", table A1's repetition signals; reference analog:
    * wrds2pg has no text stats — this extends the quality-gate family of
    * [[qualityFlags]]): for each n in `ns`, the fraction of the document's
    * n-gram OCCURRENCES that belong to an n-gram appearing more than once
    * in that document. High values mark the looping/boilerplate docs that
    * per-word stats ([[repetitionStats]]) miss — a doc can have a healthy
    * distinct-word ratio while cycling the same 3-gram.
    *
    * Topology: ZERO shuffles — every count here is intra-document state
    * and a document never spans rows, so one fused per-partition pass
    * (tokenize once, then a local gram→count map per n) emits the final
    * per-doc fractions directly; there is no exploded intermediate and no
    * gram ever crosses the wire. The fractions are integer ratios rounded
    * at 6dp (Spark's valueOf + HALF_UP round), so the DuckDB oracle
    * reproduces them exactly; [[dupNgramStatsModel]] keeps the
    * explode + aggregate formulation as the spec's independent model.
    * Ids are cast to long (the fused pass is typed); short docs (< min n
    * words) and null text emit nothing, exactly like the model.
    */
  def dupNgramStats(
      df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "need n-gram sizes >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val nsL = ns.toList
    graft.core.Par.fanOut(
      df.select(col(idCol).cast("long").as("_id"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val toks = org.apache.spark.unsafe.types.UTF8String
              .fromString(text).trim().toString.split("\\s+", -1)
            val fr = nsL.map { n =>
              if (toks.length < n) None
              else {
                val m = new java.util.HashMap[String, Long]()
                val sb = new java.lang.StringBuilder
                var i = 0
                while (i <= toks.length - n) {
                  sb.setLength(0)
                  var j = 0
                  while (j < n) {
                    if (j > 0) sb.append(' ')
                    sb.append(toks(i + j)); j += 1
                  }
                  m.merge(sb.toString, 1L, Long.box(_) + _)
                  i += 1
                }
                var dup = 0L
                m.values.forEach(c => if (c > 1) dup += c)
                val total = (toks.length - n + 1).toDouble
                // Spark round(double, 6) codegen: valueOf + HALF_UP
                Some(java.math.BigDecimal.valueOf(dup / total)
                  .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
              }
            }
            if (fr.forall(_.isEmpty)) Iterator.empty
            else Iterator.single((id, fr))
          }
        }
      }
      .toDF("_id", "_fr")
      .select(col("_id").as(idCol) +:
        nsL.zipWithIndex.map { case (n, i) =>
          col("_fr")(i).as(s"dup_frac_$n") }: _*)
  }

  /** The declarative explode + shuffle form of [[dupNgramStats]] — kept as
    * the spec's independent model (and the shape a SQL engine would run).
    * @param hashGrams shuffle 8-byte xxhash64 gram keys instead of gram
    *        strings; identical modulo a 2^-64 per-pair collision chance. */
  private[graft] def dupNgramStatsModel(
      df: DataFrame, idCol: String, textCol: String,
      ns: Seq[Int] = Seq(2, 3, 4), hashGrams: Boolean = false): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "need n-gram sizes >= 1")
    val tagged = graft.core.Par.fanOut(df.select(col(idCol), col(textCol)))
      .select(
        col(idCol),
        explode(flatten(array(ns.map(n =>
          transform(wordNgrams(col(textCol), n),
            g => struct(lit(n).as("n"), g.as("gram")))): _*))).as("_ng"))
      .select(col(idCol), col("_ng.n").as("_n"),
        (if (hashGrams) xxhash64(col("_ng.gram")) else col("_ng.gram")).as("_g"))
    val counts = tagged.groupBy(col(idCol), col("_n"), col("_g"))
      .agg(count(lit(1)).as("_c"))
    val perN = counts.groupBy(col(idCol), col("_n")).agg(
      sum("_c").as("_total"),
      coalesce(sum(when(col("_c") > 1, col("_c"))), lit(0L)).as("_dup"))
    val pivots = ns.map(n =>
      round(max(when(col("_n") === n,
        col("_dup").cast("double") / col("_total"))), 6).as(s"dup_frac_$n"))
    perN.groupBy(col(idCol)).agg(pivots.head, pivots.tail: _*)
  }

  /** Corpus-level exact LINE deduplication (the C4 / RefinedWeb pass that
    * whole-doc and span dedup both miss at their granularity): every
    * occurrence of a line — a `sep`-delimited segment — except the FIRST
    * corpus-wide (min doc id, then min line index) is removed from its
    * document; lines shorter than `minLineLen` chars are exempt (blank
    * lines and separators stay put). Output keeps every input column,
    * rebuilds `textCol`, and appends `lines_removed`.
    *
    * Scale shape — the corpus never shuffles: the exploded (id, idx,
    * xxhash64(line)) rows carry 8-byte keys into the ONE counting
    * aggregate; only the hash-candidate lines (dupes + collisions, a few
    * % of a real corpus) re-group by their actual text, so collisions
    * cannot delete an innocent line (the q45/SpanDedup two-phase
    * discipline); per-doc loser-index arrays join back by doc id and the
    * rebuild is one codegen'd filter-with-index + array_join projection.
    *
    * For an EXPRESSION-fed text column use [[lineDedupExpr]]. */
  def lineDedup(
      df: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minLineLen: Int = 1): DataFrame =
    lineDedupCore(df, idCol, col(textCol), textCol, sep, minLineLen,
      cacheCandidates = false)

  /** [[lineDedup]] for a text column that is an EXPRESSION over `df`
    * (synthesized lines, a decode, a normalization chain) rather than a
    * stored column: the expression is evaluated exactly ONCE per doc
    * where the algorithm genuinely needs text — the phase-1 hash pass
    * (every doc), a candidates-only cache fill placed ABOVE the candidate
    * join (so non-candidates never evaluate it there), and the final
    * projection for non-loser docs; loser docs rebuild from the cache.
    * Spec-proven by accumulator count. With a STORED column prefer
    * [[lineDedup]] — re-scanning a table column is cheaper than caching.
    *
    * Output: `df`'s columns with `outCol` holding the deduplicated text
    * (replaced in place if `df` already has that column) plus
    * `lines_removed`. */
  def lineDedupExpr(
      df: DataFrame, idCol: String, textExpr: Column, outCol: String,
      sep: String = "\n", minLineLen: Int = 1): DataFrame =
    lineDedupCore(df, idCol, textExpr, outCol, sep, minLineLen,
      cacheCandidates = true)

  private def lineDedupCore(
      df: DataFrame, idCol: String, textExpr: Column, outCol: String,
      sep: String, minLineLen: Int, cacheCandidates: Boolean): DataFrame = {
    require(sep.nonEmpty, "need a non-empty line separator")
    require(!df.columns.contains("_cuts"), "input already has a _cuts column")
    val spark = df.sparkSession
    import spark.implicits._
    val sepRe = java.util.regex.Pattern.quote(sep)
    // Phase 1 is a fused per-partition pass emitting (id, idx, hash) ONLY
    // — no line string is allocated into a cache or shuffle (the q101
    // discipline); ids cast to long. Phase 2 re-extracts candidate lines
    // by index from the candidate DOCS alone, and the string-keyed window
    // makes exactness unconditional under hash collisions.
    val keyed = graft.core.Par.fanOut(
      df.select(col(idCol).cast("long").as("_id"), textExpr.cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        import org.apache.spark.sql.catalyst.expressions.XXH64
        import org.apache.spark.unsafe.types.UTF8String
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty
          else {
            val parts = text.split(java.util.regex.Pattern.quote(sep), -1)
            parts.iterator.zipWithIndex.collect {
              case (line, idx) if line.length >= minLineLen =>
                val u = UTF8String.fromString(line)
                (id, idx,
                  XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L))
            }
          }
        }
      }
      .toDF("_id", "idx", "_k").cache()
    // expr mode: fill the keyed cache deterministically before its two
    // readers (dupK, candIdx) can race concurrent stages into computing
    // the phase-1 pass — and the expression — twice
    if (cacheCandidates) keyed.count()
    val dupK = keyed.groupBy("_k").agg(count(lit(1)).as("_c"))
      .where(col("_c") > 1).select("_k")
    val candIdx = keyed.join(dupK, "_k")
      .groupBy(col("_id")).agg(collect_list(col("idx")).as("_cand"))
    // the text projection sits ABOVE the candidate join, so only candidate
    // docs evaluate the expression here; with a stored column the placement
    // is cost-identical
    val candTexts = df
      .join(candIdx.withColumnRenamed("_id", "__cid"),
        col(idCol).cast("long") === col("__cid"))
      .select(col("__cid").as("_id"), textExpr.cast("string").as("_t"), col("_cand"))
    // candidates-only: the ONE evaluation an expression-fed text column
    // gets for extraction AND rebuild. The eager count() fills the cache
    // deterministically before the two downstream subtrees read it (a
    // lazy fill could race in concurrent stages and evaluate twice).
    val candSrc =
      if (cacheCandidates) {
        val c = candTexts.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count()
        c
      } else candTexts
    val candLines = candSrc
      .select(col("_id"), explode(col("_cand")).as("idx"),
        element_at(split(col("_t"), sepRe), col("idx") + lit(1)).as("line"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("line").orderBy(col("_id").asc, col("idx").asc)
    val losersIdx = candLines
      .withColumn("_r", row_number().over(w))
      .where(col("_r") > 1)
      .groupBy(col("_id"))
      .agg(sort_array(collect_list(col("idx"))).as("_cuts"))
    // loser rows carry their text OUT of the cache (cached mode) so the
    // rebuild never re-evaluates the expression; then materialize the
    // bounded loser set and release every intermediate (ADVICE r5 — a
    // lazily returned plan over a cache leaks it into the session)
    val losers =
      (if (cacheCandidates)
        losersIdx.join(candSrc.select(col("_id"), col("_t").as("_lt")), Seq("_id"))
      else losersIdx.withColumn("_lt", lit(null).cast("string")))
        .withColumnRenamed("_id", idCol)
        .localCheckpoint()
    if (cacheCandidates) { candSrc.unpersist(); () }
    keyed.unpersist()
    val srcText = if (cacheCandidates) col("_lt") else textExpr.cast("string")
    val rebuilt = array_join(
      filter(split(srcText, sepRe), (x, i) => !array_contains(col("_cuts"), i)),
      sep)
    df.join(losers, Seq(idCol), "left")
      .withColumn(outCol, when(col("_cuts").isNull, textExpr).otherwise(rebuilt))
      .withColumn("lines_removed",
        when(col("_cuts").isNull, lit(0)).otherwise(size(col("_cuts"))))
      .drop("_cuts", "_lt")
  }

  def domainMixSample(
      df: DataFrame, idCol: String, domainCol: String,
      weight: Column, targetTotal: Column): DataFrame = {
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("_n_s"))
      .withColumn("_w_s", weight)
    val sumW = counts.agg(sum("_w_s").as("_sum_w"))
    val target = df.agg(targetTotal.cast("long").as("_target"))
    df.join(broadcast(counts), domainCol)
      .crossJoin(broadcast(sumW))
      .crossJoin(broadcast(target))
      .withColumn("_u", Sampling.hashBucket(col(idCol), 1000000))
      .where(expr("_target * _w_s > 0 AND " +
        "_u <= (1000000 * _target * _w_s - 1) div (_n_s * _sum_w)"))
      .drop("_n_s", "_w_s", "_sum_w", "_target", "_u")
  }

  /** HTML-to-text extraction — the step between crawl and every text
    * operator here: script/style/comment blocks removed, tags become
    * spaces, the five ubiquitous named entities (+ nbsp + &#39;) decode
    * (`&amp;` LAST so `&amp;lt;` yields the literal `&lt;`, per the HTML
    * spec's double-escaping), whitespace collapses. One codegen'd
    * projection (chained `regexp_replace`, zero shuffles); every pattern
    * is RE2-compatible with inline `(?is)` flags, so the DuckDB oracle
    * runs the identical chain. NOT a browser-grade parser — it is the
    * deterministic, engine-portable 99% case (malformed nesting degrades
    * to extra whitespace, never to dropped text). */
  def stripHtml(df: DataFrame, htmlCol: String, outCol: String = "text"): DataFrame = {
    val steps: Seq[(String, String)] = Seq(
      "(?is)<script[^>]*>.*?</script>" -> " ",
      "(?is)<style[^>]*>.*?</style>" -> " ",
      "(?s)<!--.*?-->" -> " ",
      "<[^>]+>" -> " ",
      "&lt;" -> "<",
      "&gt;" -> ">",
      "&quot;" -> "\"",
      "&#39;" -> "'",
      "&nbsp;" -> " ",
      "&amp;" -> "&",
      "\\s+" -> " ")
    val cleaned = steps.foldLeft(col(htmlCol)) {
      case (c, (pat, repl)) => regexp_replace(c, pat, repl)
    }
    df.withColumn(outCol, trim(cleaned))
  }

  /** Snapshot diff between two corpus versions — the audit a dataset
    * release runs before publishing (what changed since v1?), and the
    * read-only complement of [[graft.operators.Merge]]'s MERGE upsert
    * (which APPLIES changes): per doc id, `added` (new only), `removed`
    * (old only), `modified` (both, normalized fingerprint differs), or
    * `unchanged`. Content identity is [[TextAnalysis.fingerprint]] — md5
    * of the normalized text, the q84/q93 discipline — so formatting-only
    * edits don't count as modifications.
    *
    * Scale shape: both sides project to (id, 32-hex fp) BEFORE the one
    * full-outer equi-join on id — document text never shuffles; at 100 TB
    * the join co-locates if both snapshots are id-bucketed
    * ([[Bucketing]]), and the output is id+status+fingerprints only.
    */
  def corpusDiff(
      oldDf: DataFrame, newDf: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol).as("_id"),
      TextAnalysis.fingerprint(col(textCol)).as("old_fp"))
    val n = newDf.select(col(idCol).as("_id"),
      TextAnalysis.fingerprint(col(textCol)).as("new_fp"))
    o.join(n, Seq("_id"), "full_outer")
      .select(
        col("_id").as(idCol),
        when(col("old_fp").isNull, lit("added"))
          .when(col("new_fp").isNull, lit("removed"))
          .when(col("old_fp") =!= col("new_fp"), lit("modified"))
          .otherwise(lit("unchanged")).as("status"),
        col("old_fp"), col("new_fp"))
  }
}
