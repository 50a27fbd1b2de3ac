package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for document corpora: tokenization, quality
  * scoring, marker-based language ID, and normalization fingerprints.
  *
  * Everything here is built from codegen'd built-in functions (split,
  * regexp_*, higher-order array functions) — no UDFs, so the whole pipeline
  * stays inside WholeStageCodegen and scales linearly with input splits.
  */
object TextAnalysis {

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation. */
  val BpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Minimal English stopword list (quality scoring). */
  val Stopwords: Seq[String] = Seq("the", "a", "an", "and", "of", "is", "in", "to")

  /** Marker words per language for the language-ID heuristic; alphabetical
    * key order doubles as the deterministic tiebreak. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "is", "and", "of"),
    "es" -> Seq("el", "la", "los", "las", "y"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCountWs(text: Column): Column = size(tokens(text))

  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(0)))

  private def countIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(lit(words.toArray), t)))

  /** Fraction of tokens that are stopwords. */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    countIn(toks, Stopwords).cast("double") / size(toks)
  }

  /** Fraction of characters that are ASCII punctuation. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[.,;:!?'\"()\\[\\]{}-]", "")))
      .cast("double") / length(text)

  /** Mean token length (non-whitespace chars / token count). */
  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s", "")).cast("double") / size(tokens(text))

  /** Marker-word language ID: count marker hits per language, pick the
    * argmax; ties resolve to the alphabetically first language. */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangMarkers.map { case (lang, markers) => lang -> countIn(toks, markers) }
    val best = greatest(scores.map(_._2): _*)
    coalesce(scores.map { case (lang, s) => when(s === best, lit(lang)) }: _*)
  }

  /** Canonical text form: lowercase, punctuation → space, collapsed
    * whitespace, trimmed. */
  /** Top-k terms per group by TF-IDF (natural log, global document
    * frequency): score(term, g) = tf(term, g) · ln(N / df(term)).
    *
    * Scale shape: three shuffles, each over REDUCED data — token counts
    * aggregate map-side before moving (term-level rows, not token-level),
    * document frequency aggregates distinct (term, doc) pairs, and the
    * final top-k is a per-group window that Spark 4 optimizes with
    * WindowGroupLimit (partial top-k before the shuffle). N rides along as
    * a broadcast one-row aggregate, never a driver-side count. Scores are
    * rounded to 6dp BEFORE ranking so the ordering is engine-portable. */
  def tfIdfTopTerms(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      groupCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    val toks = df
      .select(col(groupCol), col(idCol),
        explode(tokens(lower(col(textCol)))).as("term"))
      .where(col("term") =!= "")
    val tf = toks.groupBy(col(groupCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = toks.select(col("term"), col(idCol)).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val n = df.agg(count(lit(1)).cast("double").as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col("tfidf").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf") * log(col("n") / col("df")), 6))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col(groupCol), col("term"), col("tfidf"), col("rank"))
  }

  /** Okapi BM25 retrieval of the `topK` corpus documents per query — the
    * decontamination-by-retrieval primitive (score every training doc
    * against a benchmark question set; high scorers are leak suspects),
    * complementing q78/q102's exact n-gram/span matching with ranked
    * lexical overlap.
    *
    * Scale shape (round 13 — document-at-a-time): the QUERY set is the
    * small side (benchmark suites are thousands of rows) and rides as a
    * broadcast term → (idf, query list) map; the corpus NEVER shuffles
    * and is never cached — two fused tokenize passes (stats + df, then
    * scoring) accumulate per-query 6dp fixed-point scores in primitive
    * arrays and prefilter to a per-partition top-k under the SAME
    * (score desc, id asc) total order as the final bounded
    * [[graft.functions.TopK]] aggregate, so only partitions × queries × k
    * rows ever cross the wire. Per-task state is queries-proportional,
    * independent of corpus size. (The postings-join form survives as
    * [[bm25TopKViaPostings]], the spec's reference — equal output,
    * row-level auditable, but its dense (q, doc, term) candidate stream
    * hash-aggregates the whole meet volume.)
    *
    * Cross-engine exactness (the q105 discipline): every per-term score
    * is rounded to 6dp and summed as exact fixed-point micros — the same
    * values the reference form's round + DECIMAL(20,6) sum produces, so
    * per-(query, doc) aggregation is order-free exact integer arithmetic;
    * libm's ln ulp vanishes against the 6dp round. */
  def bm25TopK(
      corpus: org.apache.spark.sql.DataFrame, queries: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, qIdCol: String, qTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): org.apache.spark.sql.DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // Document-at-a-time fused scorer (round 13). The postings-join form
    // (kept below as [[bm25TopKViaPostings]], the spec's reference) built
    // candidate ROWS — one per (query, matching doc, shared term) — and
    // summed them through a hash aggregate keyed by (q_id, _id). A
    // decontamination workload is DENSE (a 500-doc benchmark split shares
    // vocabulary with essentially every corpus doc), so at sf10 that was
    // ~2B candidate rows into a partial aggregate whose per-task state
    // (~millions of distinct (q, doc) keys) overflowed into sort-fallback:
    // ProbeStages measured 39.8 GB of spill and 670 of q120's 702 s in
    // that single stage, on top of a 15 GB MEMORY_AND_DISK postings cache
    // competing with it for unified memory.
    //   Here the same arithmetic runs as primitive-array accumulation
    // inside ONE corpus pass: the bounded query-term table (the side the
    // old path already broadcast) is collected and inverted to
    // term → (idf, query indices); each doc tokenizes once (identical
    // UTF8String lower/trim + split), bumps a long[] of 6dp-fixed-point
    // micro-scores per touched query — exactly the decimal(20,6) sum the
    // postings form computed, in exact integer arithmetic — and offers
    // (score, doc) into a per-partition [[graft.functions.TopKHeap]] per
    // query under TopK's own (score desc, id asc) total order, which
    // makes the per-partition prefilter lossless. Only ≤ partitions ×
    // queries × k rows reach the final [[graft.functions.TopK]]
    // aggregate: the corpus never shuffles, nothing is cached, and the
    // per-task state is queries × (8B accumulator + k heap slots),
    // independent of corpus size. Two narrow corpus passes total (stats +
    // df, then scoring) replace the postings cache round-trip.
    // Bounded collect (round 14): the fused scorer's contract is a
    // benchmark-sized query split, but an oversized query set must not
    // silently OOM the driver (the q113/q115 certify-or-refuse style).
    // The collect itself is LIMIT-bounded so at most cap+1 rows can ever
    // reach the driver, and past the cap — knob: graft.bm25.maxQueryTerms,
    // default 4M (q_id, term) rows ≈ ~100 MB heap — the call falls back to
    // [[bm25TopKViaPostings]], the spec-pinned-equal distributed form.
    val cap = spark.conf.getOption("graft.bm25.maxQueryTerms")
      .map(_.toInt).getOrElse(4 * 1000 * 1000)
    require(cap > 0, "graft.bm25.maxQueryTerms must be positive")
    val qt = bm25QueryTerms(queries, qIdCol, qTextCol)
      .select(col("q_id"), col("term")).limit(cap + 1).as[(Long, String)].collect()
    if (qt.length > cap)
      return bm25TopKViaPostings(
        corpus, queries, idCol, textCol, qIdCol, qTextCol, k1, b, topK)
    val qIds: Array[Long] = qt.map(_._1).distinct
    val vocab: Array[String] = qt.map(_._2).distinct
    if (qt.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("q_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("rank",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("score",
            org.apache.spark.sql.types.DoubleType))))
    // pass 1: corpus stats (N over ALL rows, Σdl over non-null texts) and
    // per-query-term doc frequencies, one fused tokenize, merged
    // executor-side (Dataset.reduce — one tuple reaches the driver)
    val vIdx: Map[String, Int] = vocab.zipWithIndex.toMap
    val bcV = spark.sparkContext.broadcast(vIdx)
    val (nDocs, sumdl, dfArr) = graft.core.Par.fanOut(
        corpus.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val m = bcV.value
        val df = new Array[Long](m.size)
        var n = 0L
        var dl = 0L
        it.foreach { case (_, text) =>
          n += 1
          if (text != null) {
            val u = org.apache.spark.unsafe.types.UTF8String
              .fromString(text).toLowerCase.trim()
            val arr = u.toString.split("\\s+", -1)
            dl += arr.length
            val seen = new java.util.HashSet[String]()
            var i = 0
            while (i < arr.length) {
              val t = arr(i)
              if (t.nonEmpty) {
                val idx = m.getOrElse(t, -1)
                if (idx >= 0 && seen.add(t)) df(idx) += 1
              }
              i += 1
            }
          }
        }
        Iterator.single((n, dl, df))
      }
      .reduce { (a, b) =>
        val df = new Array[Long](a._3.length)
        var i = 0
        while (i < df.length) { df(i) = a._3(i) + b._3(i); i += 1 }
        (a._1 + b._1, a._2 + b._2, df)
      }
    // term → (idf, queries containing it); idf replicates the postings
    // form's Catalyst expression op-for-op: long (n - df), then + 0.5
    val avgdl = sumdl.toDouble / nDocs
    val qIdxOf: Map[Long, Int] = qIds.zipWithIndex.toMap
    val termQs: Array[Array[Int]] = {
      val bs = Array.fill(vocab.length)(List.empty[Int])
      qt.foreach { case (q, t) => val vi = vIdx(t); bs(vi) = qIdxOf(q) :: bs(vi) }
      bs.map(_.reverse.toArray)
    }
    val scoringMap: Map[String, (Double, Array[Int])] =
      vocab.indices.iterator.map { vi =>
        val df = dfArr(vi)
        val idf = math.log(1.0 + ((nDocs - df) + 0.5) / (df + 0.5))
        vocab(vi) -> (idf, termQs(vi))
      }.toMap
    val bcScore = spark.sparkContext.broadcast(scoringMap)
    val bcQIds = spark.sparkContext.broadcast(qIds)
    val nQ = qIds.length
    // pass 2: score + per-partition lossless top-k prefilter
    val prefiltered = graft.core.Par.fanOut(
        corpus.select(col(idCol).cast("long"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        val sm = bcScore.value
        val ids = bcQIds.value
        val acc = new Array[Long](nQ)
        val touched = new Array[Int](nQ)
        // per-doc generation marker: O(1) "already a candidate for q this
        // doc?" without rescanning `touched` (a zero-micro term still
        // makes the pair a candidate, so acc==0 can't stand in for it)
        val gen = new Array[Int](nQ)
        var docGen = 0
        val heaps = new Array[graft.functions.TopKHeap](nQ)
        it.foreach { case (docId, text) =>
          if (text != null) {
            val u = org.apache.spark.unsafe.types.UTF8String
              .fromString(text).toLowerCase.trim()
            val arr = u.toString.split("\\s+", -1)
            val dlD = arr.length.toDouble
            // tf over MATCHED terms only (others cannot score)
            val tf = new java.util.HashMap[String, Long]()
            var i = 0
            while (i < arr.length) {
              val t = arr(i)
              if (t.nonEmpty && sm.contains(t)) tf.merge(t, 1L, Long.box(_) + _)
              i += 1
            }
            var nTouched = 0
            docGen += 1
            val en = tf.entrySet().iterator()
            while (en.hasNext) {
              val e = en.next()
              val (idf, qs) = sm(e.getKey)
              val tfD = e.getValue.toDouble
              // op order mirrors bm25Rank's Catalyst tree exactly
              val tfn = tfD * (k1 + 1.0) /
                (tfD + k1 * ((1.0 - b) + b * dlD / avgdl))
              val micros = java.math.BigDecimal.valueOf(idf * tfn)
                .setScale(6, java.math.RoundingMode.HALF_UP)
                .movePointRight(6).longValueExact()
              var j = 0
              while (j < qs.length) {
                val q = qs(j)
                if (gen(q) != docGen) {
                  gen(q) = docGen
                  touched(nTouched) = q
                  nTouched += 1
                }
                acc(q) += micros
                j += 1
              }
            }
            var s = 0
            while (s < nTouched) {
              val q = touched(s)
              if (heaps(q) == null) heaps(q) = new graft.functions.TopKHeap(topK)
              heaps(q).offer(
                java.math.BigDecimal.valueOf(acc(q), 6).doubleValue(), docId)
              acc(q) = 0L
              s += 1
            }
          }
        }
        (0 until nQ).iterator.flatMap { q =>
          val h = heaps(q)
          if (h == null) Iterator.empty
          else (0 until h.size).iterator.map(i => (ids(q), h.ids(i), h.scores(i)))
        }
      }
      .toDF("q_id", "_id", "_s")
    Sketches.topKPerGroup(prefiltered, Seq("q_id"), col("_s"), col("_id"), topK)
      .select(col("q_id"), col("rank"), col("id").as("doc_id"), col("score"))
      .localCheckpoint()
  }

  /** The postings-join form of [[bm25TopK]] — identical output
    * (spec-pinned), kept as the declarative reference implementation: at
    * dense decontamination scale its (q, doc, term) candidate stream and
    * postings cache lose badly to the fused scorer (sf10: 702 → see
    * bm25TopK's scaladoc), but its row-level plan is independently
    * auditable against the formula. */
  private[graft] def bm25TopKViaPostings(
      corpus: org.apache.spark.sql.DataFrame, queries: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, qIdCol: String, qTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 10): org.apache.spark.sql.DataFrame = {
    // ONE fused tokenize pass, zero corpus shuffles: postings come out of
    // [[bm25PostsFused]] per-partition (tf is intra-document state), the
    // stats sentinels in the same cached pass replace the old second
    // tokenize scan, and totals become literals (the DSIR pattern — no
    // scalar crossJoin). The only shuffles left carry query-term rows.
    val fused = bm25PostsFused(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val statsRow = fused.where(col("term").isNull)
      .agg(count(lit(1)).as("_n"), sum(col("_dl")).as("_sumdl"))
      .head() // populates the cache
    val nDocs = statsRow.getLong(0)
    val sumdl: Any = if (statsRow.isNullAt(1)) null else statsRow.getLong(1)
    val posts = fused.where(col("term").isNotNull)
    val qterms = bm25QueryTerms(queries, qIdCol, qTextCol)
    // Restrict postings to query terms BEFORE the df count: per-term doc
    // counts are unchanged by a term filter, but the df shuffle now carries
    // only query-term postings instead of the full corpus vocabulary (the
    // dominant exchange at corpus scale — decontamination query sets are
    // small). Both branches read the SAME persisted fused pass; df keeps a
    // map-side-combining groupBy so a stopword-heavy query term cannot
    // pile one task high.
    val filtered = posts.join(broadcast(qterms.select("term").distinct()), Seq("term"))
    val dfreq = filtered.groupBy("term").agg(count(lit(1)).as("_df"))
    val cands = filtered
      .join(broadcast(qterms), Seq("term"))
      .join(broadcast(dfreq), Seq("term"))
      .withColumn("_n", lit(nDocs))
      .withColumn("_sumdl", lit(sumdl).cast("long"))
    // materialize the (≤ queries × topK)-row result, then release the
    // fused-postings cache — a lazily returned plan over it leaked the
    // cache into the session for the caller's lifetime (the ADVICE r5
    // class; the TextIndex.search discipline)
    val out = bm25Rank(cands, k1, b, topK).localCheckpoint()
    fused.unpersist()
    out
  }

  /** Tokenized corpus rows (`_id`, `_w`) → the BM25 postings list
    * (`_id`, `_dl`, `term`, `_tf`) — the declarative (explode + shuffle)
    * form, kept as the spec's independent model for [[bm25PostsFused]]. */
  private[graft] def bm25Posts(
      sel: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sel.select(col("_id"), size(col("_w")).as("_dl"), explode(col("_w")).as("term"))
      .where(col("term") =!= "")
      .groupBy("_id", "_dl", "term").agg(count(lit(1)).as("_tf"))

  /** The postings list computed with ZERO shuffle: term frequency is
    * intra-document state, and a document never spans rows, so one fused
    * per-partition pass (tokenize → local hash count) emits exactly the
    * rows the explode + groupBy shuffle produced. Each input row also
    * emits one null-term sentinel carrying `_dl` (null for null text,
    * mirroring `size(null)`), so corpus stats (_n, _sumdl) come from the
    * SAME single tokenize — no second text scan, no stats branch
    * re-execution. Tokenization reuses Spark's own UTF8String
    * lower/trim (byte parity with the `tokens(lower(text))` column form
    * by construction) and `split("\\s+", -1)` limit semantics. */
  private[graft] def bm25PostsFused(
      df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    graft.core.Par.fanOut(
      df.select(col(idCol).cast("long").as("_id"), col(textCol).cast("string")))
      .as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          if (text == null)
            Iterator.single((id, None: Option[Int], null: String, 0L))
          else {
            val u = org.apache.spark.unsafe.types.UTF8String
              .fromString(text).toLowerCase.trim()
            val arr = u.toString.split("\\s+", -1)
            val tf = new java.util.LinkedHashMap[String, Long]()
            var i = 0
            while (i < arr.length) {
              if (arr(i).nonEmpty) tf.merge(arr(i), 1L, Long.box(_) + _)
              i += 1
            }
            val out = scala.collection.mutable.ArrayBuffer
              .empty[(Long, Option[Int], String, Long)]
            out += ((id, Some(arr.length), null, 0L)) // stats sentinel
            tf.forEach((t, c) => out += ((id, Some(arr.length), t, c)))
            out.iterator
          }
        }
      }
      .toDF("_id", "_dl", "term", "_tf")
  }

  /** Distinct (q_id, term) pairs of the query set — the broadcast side. */
  private[graft] def bm25QueryTerms(
      queries: org.apache.spark.sql.DataFrame, qIdCol: String,
      qTextCol: String): org.apache.spark.sql.DataFrame =
    queries
      .select(col(qIdCol).cast("long").as("q_id"),
        explode(array_distinct(tokens(lower(col(qTextCol))))).as("term"))
      .where(col("term") =!= "")

  /** Candidate rows (q_id, _id, _tf, _dl, _df, _n, _sumdl) → the final
    * ranked top-k per query, scored with the Robertson/Zaragoza formula
    * (Lucene idf). Per-term scores round to 6dp DECIMAL before the sum
    * (order-free exact aggregation — the q105 discipline) and the top-k
    * runs on the bounded [[graft.functions.TopK]] aggregate. */
  private[graft] def bm25Rank(
      cands: org.apache.spark.sql.DataFrame, k1: Double, b: Double,
      topK: Int): org.apache.spark.sql.DataFrame = {
    val avgdl = col("_sumdl").cast("double") / col("_n")
    val idf = log(lit(1.0) + (col("_n") - col("_df") + lit(0.5)) / (col("_df") + lit(0.5)))
    val tfn = col("_tf") * (lit(k1) + lit(1)) /
      (col("_tf") + lit(k1) * (lit(1) - lit(b) + lit(b) * col("_dl") / avgdl))
    val scored = cands
      .withColumn("_s6", round(idf * tfn, 6).cast("decimal(20,6)"))
      .groupBy("q_id", "_id").agg(sum(col("_s6")).as("_s"))
    Sketches.topKPerGroup(scored, Seq("q_id"), col("_s").cast("double"), col("_id"), topK)
      .select(col("q_id"), col("rank"), col("id").as("doc_id"), col("score"))
  }

  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Robust winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    * 2003 — the MOSS selector): hash every char `k`-gram, slide a window
    * of `w` consecutive gram hashes, keep each window's minimum (ties to
    * the RIGHTMOST occurrence), dedup. Output (id, pos, fp) — the sparse
    * ~2/(w+1) fingerprint density with the paper's guarantee: any two
    * docs sharing a substring of ≥ w + k − 1 chars share at least one
    * selected fingerprint, so an equi-join on `fp` is a complete
    * candidate generator for local (substring-level) overlap — the
    * sparser cousin of [[graft.operators.Dedup.shingleHashes]]' dense
    * index and of [[graft.operators.SpanDedup]]'s stride-1 windows.
    *
    * One fused per-partition pass per doc (the [[compressionRatio]]
    * shape): a rolling polynomial hash over code points plus a monotonic
    * deque for the sliding minimum — O(len) JVM work, no shuffle;
    * `Par.fanOut` only rebalances unsplit local inputs. (The first cut
    * materialized gram hashes as an array column and walked each window
    * with slice/min/reverse-position higher-order functions; that is
    * O(len·(w+k)) Catalyst array allocations per doc and was the
    * slowest query on the board at sf0.1 — 4× the fused pass.) The gram
    * hash is the q111 polynomial (base 257 mod 1e9+7) over `ascii`
    * code-point values, so a SQL engine reproduces it verbatim. Docs
    * with fewer than `w` grams winnow one whole-doc window; docs
    * shorter than `k` emit nothing. */
  def winnow(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      k: Int = 8, w: Int = 4): org.apache.spark.sql.DataFrame = {
    require(k >= 2 && w >= 1, s"need gram size k >= 2 and window w >= 1 (got k=$k, w=$w)")
    val M = 1000000007L
    // 257^(k-1) mod M, the leading-coefficient weight the rolling update removes.
    val pow = (1 until k).foldLeft(1L)((a, _) => a * 257 % M)
    val in = graft.core.Par.fanOut(df.select(col(idCol), col(textCol)))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      in.schema.head,
      org.apache.spark.sql.types.StructField("pos", org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("fp", org.apache.spark.sql.types.LongType, nullable = false)))
    in.mapPartitions { it =>
      it.flatMap { row =>
        val text = if (row.isNullAt(1)) null else row.getString(1)
        if (text == null) Iterator.empty
        else {
          val cp = text.codePoints().toArray // `ascii`/`length` count code points
          val n = cp.length
          if (n < k) Iterator.empty
          else {
            val m = n - k + 1
            val hs = new Array[Long](m)
            var h = 0L
            var i = 0
            while (i < k) { h = (h * 257 + cp(i)) % M; i += 1 }
            hs(0) = h
            var p = 1
            while (p < m) {
              var t = (h - cp(p - 1) * pow % M) % M
              if (t < 0) t += M
              h = (t * 257 + cp(p + k - 1)) % M
              hs(p) = h
              p += 1
            }
            val we = math.min(w, m)
            // Deque of gram indices with increasing hash front→back; popping
            // `>=` on push makes the front the RIGHTMOST minimum of its window.
            val dq = new Array[Int](m)
            var head = 0
            var tail = 0 // exclusive
            val seen = new java.util.LinkedHashSet[(Int, Long)]()
            var g = 0
            while (g < m) {
              while (tail > head && hs(dq(tail - 1)) >= hs(g)) tail -= 1
              dq(tail) = g; tail += 1
              if (g >= we - 1) {
                while (dq(head) < g - we + 1) head += 1
                val sel = dq(head)
                seen.add((sel + 1, hs(sel))) // 1-based char pos of the gram
              }
              g += 1
            }
            val id = row.get(0)
            val out = new Array[org.apache.spark.sql.Row](seen.size)
            var o = 0
            val itr = seen.iterator()
            while (itr.hasNext) {
              val (pos, fp) = itr.next()
              out(o) = org.apache.spark.sql.Row(id, pos, fp)
              o += 1
            }
            out.iterator
          }
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Deflate compression ratio per document — the classic repetitiveness /
    * boilerplate signal (highly repetitive machine text compresses far below
    * natural prose; quality filters threshold on it).
    *
    * A narrow fused per-partition pass like the shingle hashers: one reused
    * `Deflater` (default level, no per-row allocation beyond the output
    * buffer walk), emitting fixed-width numerics only — the text column is
    * dropped before anything downstream shuffles. Deterministic for a given
    * zlib level; the oracle joins a content-addressed python-zlib fixture
    * (independent binding of the same algorithm — see
    * tools/make_oracle_fixtures.py), so the values are cross-implementation
    * checked, not Spark-vs-Spark.
    */
  def compressionRatio(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val deflater = new java.util.zip.Deflater()
        val buf = new Array[Byte](8192)
        it.flatMap { case (id, text) =>
          if (text == null) Iterator.empty else Iterator.single {
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          deflater.reset()
          deflater.setInput(bytes)
          deflater.finish()
          var compressed = 0L
          while (!deflater.finished()) compressed += deflater.deflate(buf)
          val ratio = if (bytes.length == 0) 1.0 else compressed.toDouble / bytes.length
          (id, bytes.length.toLong, compressed, math.rint(ratio * 1e6) / 1e6)
          }
        }
      }
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "compress_ratio")
  }

  /** Frequency vocabulary of the corpus: the `size` most frequent
    * whitespace tokens, ids 1..size assigned in (count DESC, token ASC)
    * order — the deterministic tie-break makes the vocabulary (and hence
    * every encoding) reproducible across engines and runs.
    *
    * The corpus-sized work is ONE hash aggregate over exploded tokens
    * (map-side combine; the shuffle moves corpus VOCABULARY, not tokens).
    * The top-`size` cut is a TakeOrdered (no global sort), and the
    * row_number window after it runs over `size` rows — a bounded
    * single-partition window on an already-reduced table, the justified
    * kind. Returns (token, id, cnt).
    */
  def buildVocab(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      size: Int): org.apache.spark.sql.DataFrame = {
    require(size > 0, "vocab size must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt").desc, col("token").asc)
    df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token").asc)
      .limit(size)
      .withColumn("id", row_number().over(w).cast("int"))
      .select("token", "id", "cnt")
  }

  /** Byte-pair-encoding merge training — the tokenizer-TRAIN side of the
    * pipeline ([[buildVocab]]/[[encodeIds]] are the apply side).
    *
    * The corpus-sized work is ONE distributed pass: the word-frequency
    * aggregate (map-side combining; the shuffle moves corpus VOCABULARY,
    * not tokens). BPE's merge loop then operates on that frequency dict —
    * the textbook formulation — which is vocabulary-sized, orders of
    * magnitude below the corpus, so it runs on the driver exactly like
    * [[Dedup]]'s small-side union-find: deterministic, one job, no
    * per-round shuffles.
    *
    * Clean corpora have a bounded word vocabulary, but raw web text does
    * not (URLs, hashes, typos), so the driver-side dictionary is EXPLICITLY
    * bounded before the collect, inside the distributed plan: `minFreq`
    * drops hapax-style noise (the standard BPE frequency floor — rare
    * words contribute ~nothing to pair counts anyway), and `maxVocab` is a
    * hard cap taking the (count DESC, word ASC) top slice via
    * TakeOrdered — no global sort, and a guarantee the collect is ≤
    * `maxVocab` rows REGARDLESS of corpus pathology. Defaults keep every
    * word with a 2^20 cap; set `maxVocab = Int.MaxValue` only for corpora
    * known to be vocabulary-bounded.
    *
    * Words are split into characters with a `</w>` end marker; each round
    * merges the (count DESC, pair ASC)-best adjacent symbol pair — the
    * deterministic tie-break makes training reproducible. Returns the
    * ordered merge list: (rank, left, right, pair_count).
    */
  def bpeTrain(
      df: org.apache.spark.sql.DataFrame, textCol: String,
      merges: Int, minFreq: Long = 1L,
      maxVocab: Int = 1 << 20): Seq[(Int, String, String, Long)] = {
    require(merges > 0, "need merges > 0")
    require(minFreq >= 1, "need minFreq >= 1")
    require(maxVocab > 0, "need maxVocab > 0")
    val freq = df.select(explode(tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .where(col("c") >= minFreq)
    val cut = // TakeOrderedAndProject when capped — never a global sort
      if (maxVocab == Int.MaxValue) freq
      else freq.orderBy(col("c").desc, col("w").asc).limit(maxVocab)
    val wordFreq: Array[(Array[String], Long)] =
      cut.collect()
        .map(r => (r.getString(0).map(_.toString).toArray :+ "</w>", r.getLong(1)))
    val words = wordFreq.map(_._1.toBuffer)
    val out = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 0
    var continueLoop = true
    while (rank < merges && continueLoop) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      var i = 0
      while (i < words.length) {
        val w = words(i); val c = wordFreq(i)._2
        var j = 0
        while (j < w.length - 1) {
          val k = (w(j), w(j + 1))
          counts(k) = counts.getOrElse(k, 0L) + c
          j += 1
        }
        i += 1
      }
      if (counts.isEmpty) continueLoop = false
      else {
        val ((l, r), n) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += ((rank, l, r, n))
        val merged = l + r
        words.foreach { w =>
          var j = 0
          while (j < w.length - 1) {
            if (w(j) == l && w(j + 1) == r) { w(j) = merged; w.remove(j + 1) }
            else j += 1
          }
        }
        rank += 1
      }
    }
    out.result()
  }

  /** Apply trained BPE merges ([[bpeTrain]]'s output) to segment documents
    * into subword tokens — the tokenize step itself. The merge list rides
    * in as a broadcast (it is merge-count-sized); each partition keeps a
    * word→segmentation memo, so the per-word merge loop runs once per
    * DISTINCT word per partition, not per occurrence — the same
    * vocabulary-not-corpus cost shape as training. Requires a numeric
    * non-null id (the typed memo pass deserializes it as a primitive
    * long); a null or non-castable id fails with a CLEAR error at the
    * offending row rather than an NPE deep in the deserializer. Returns
    * (id, subwords: array<string>, n_subwords).
    */
  def bpeSegment(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      merges: Seq[(Int, String, String, Long)]): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ranked = merges.sortBy(_._1).map(m => (m._2, m._3)).toArray
    val bc = spark.sparkContext.broadcast(ranked)
    val idLong = col(idCol).cast("long")
    val checkedId = when(idLong.isNull, raise_error(concat(
      lit(s"bpeSegment: $idCol must be a non-null numeric id, got "),
      coalesce(col(idCol).cast("string"), lit("NULL"))))).otherwise(idLong)
    df.select(checkedId.as(idCol), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ms = bc.value
        val memo = scala.collection.mutable.HashMap.empty[String, Array[String]]
        def segment(word: String): Array[String] = memo.getOrElseUpdate(word, {
          val w = word.map(_.toString).toBuffer :+ "</w>"
          ms.foreach { case (l, r) =>
            var j = 0
            while (j < w.length - 1) {
              if (w(j) == l && w(j + 1) == r) { w(j) = l + r; w.remove(j + 1) }
              else j += 1
            }
          }
          w.toArray
        })
        it.map { case (id, text) =>
          val subs =
            if (text == null) Array.empty[String]
            else text.trim.split("\\s+").flatMap(segment)
          (id, subs, subs.length)
        }
      }
      .toDF(idCol, "subwords", "n_subwords")
  }

  /** Encode each document as the id sequence of its tokens under `vocab`
    * (out-of-vocabulary → 0) — the tokenizer front-end that turns a
    * curated corpus into model input.
    *
    * The vocabulary is bounded (`buildVocab` size), so the token→id map
    * rides in as a BROADCAST hash join against position-exploded tokens;
    * the only corpus-sized shuffle is the per-document reassembly, which
    * moves each (pos, id) pair once. Returns (idCol, ids: array<int>,
    * n_tokens, n_oov).
    */
  def encodeIds(
      df: org.apache.spark.sql.DataFrame, idCol: String, textCol: String,
      vocab: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.select(col(idCol), posexplode(tokens(col(textCol))).as(Seq("pos", "token")))
      .join(broadcast(vocab.select(col("token"), col("id"))), Seq("token"), "left")
      .withColumn("id", coalesce(col("id"), lit(0)))
      .groupBy(col(idCol)).agg(
        transform(array_sort(collect_list(struct(col("pos"), col("id")))),
          s => s.getField("id")).as("ids"),
        count(lit(1)).as("n_tokens"),
        count(when(col("id") === 0, 1)).as("n_oov"))
}
