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
  def normalize(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Document fingerprint: md5 of the normalized text. */
  def fingerprint(text: Column): Column = md5(normalize(text).cast("binary"))

  /** Deflate compression ratio per document — the classic repetitiveness /
    * boilerplate signal (highly repetitive machine text compresses far below
    * natural prose; quality filters threshold on it).
    *
    * A narrow fused per-partition pass like the shingle hashers: one reused
    * `Deflater` (default level, no per-row allocation beyond the output
    * buffer walk), emitting fixed-width numerics only — the text column is
    * dropped before anything downstream shuffles. Deterministic for a given
    * zlib level, but not reproducible across engines, so the driver check is
    * rows-only (no DuckDB oracle exists for deflate).
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
        it.map { case (id, text) =>
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
      .toDF("doc_id", "raw_bytes", "deflate_bytes", "compress_ratio")
  }
}
