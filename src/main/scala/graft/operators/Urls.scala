package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + per-URL dedup — the first gate of a crawl
  * pipeline (reference analog: wrds2pg keys everything on table names and
  * has no crawl surface; this extends the corpus-curation family).
  *
  * A crawl sees the same page under many spellings: scheme/host case,
  * `www.` prefixes, tracking parameters (`utm_*`), fragments, and trailing
  * slashes. [[canonicalize]] folds those into one canonical form and
  * [[dedupByUrl]] keeps one document per canonical URL — cutting the exact
  * crawl-level duplicates BEFORE any text-level dedup spends a shuffle on
  * them.
  *
  * Everything is a codegen'd projection over portable primitives
  * (`split_part`-style prefixes, one anchored regexp_extract/replace in
  * Java-regex ∩ RE2 syntax, higher-order `filter` over the split query
  * string — no UDF, no driver round-trip), so a DuckDB oracle reproduces
  * the canonical form byte-for-byte and the dedup is exact-oracled
  * end-to-end. The parameter filter is list-based, not regex-iteration:
  * it drops every `utm_*` parameter regardless of count or position
  * (Java's replaceAll resumes after each replacement, so a separator-
  * consuming regex would miss back-to-back tracking params — the classic
  * canonicalizer bug).
  */
object Urls {

  private val schemeHostRe = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

  /** Canonical form of `url`:
    *  - fragment dropped;
    *  - scheme and host lowercased, one leading `www.` stripped;
    *  - every `utm_*` query parameter removed (the `?` goes too when
    *    nothing survives);
    *  - trailing `/` on the path dropped.
    * Parameter ORDER among survivors is preserved (reordering would merge
    * URLs whose servers may treat order as meaningful; a stricter profile
    * can sort — the oracle covers the preserving form). */
  def canonicalize(url: Column): Column = {
    val noFrag = substring_index(url, "#", 1)
    val rawHost = regexp_extract(noFrag, s"($schemeHostRe)", 1)
    val host = regexp_replace(lower(rawHost), "^([a-z][a-z0-9+.-]*://)www\\.", "$1")
    val pathQuery = regexp_replace(noFrag, schemeHostRe, "")
    val path = regexp_replace(substring_index(pathQuery, "?", 1), "/+$", "")
    val query = when(pathQuery.contains("?"),
      substring(pathQuery, length(substring_index(pathQuery, "?", 1)) + 2, lit(1 << 24)))
      .otherwise(lit(""))
    val kept = filter(split(query, "&"),
      p => substring(p, 1, 4) =!= lit("utm_") && p =!= lit(""))
    val canonQuery = when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
      .otherwise(lit(""))
    concat(host, path, canonQuery)
  }

  /** One row per canonical URL: the kept document (min id — deterministic,
    * engine-portable), the duplicate count, and the canonical key. A single
    * hash aggregate with map-side combining — the payload never rides along
    * (join back on `keep_id` to fetch it), so the shuffle carries one short
    * row per distinct URL per mapper, not per crawl record. */
  def dedupByUrl(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.select(col(idCol), canonicalize(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_docs"))
}
