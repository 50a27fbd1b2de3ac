package graft.sources

import org.apache.spark.sql.DataFrame

/** SAS dataset options (`drop=`, `keep=`, `rename=`, `obs=`) compiled to
  * Catalyst projections.
  *
  * Grammar follows the reference's SAS snippets (wrds2pg/sas/codegen.py:45-76):
  * variable lists are space-separated; a trailing colon is a prefix wildcard
  * (e.g. `drop="match: closest: prior:"` — wrds2pg/api.py:150). `rename` is
  * a space-separated list of `old=new` pairs (wrds2pg/api.py:104-106). SAS
  * names are case-insensitive; like the reference we normalize to lowercase.
  *
  * Spark-first: keep/drop become a `select` (column pruning reaches the
  * parquet scan — at 100 TB this is the difference between reading 3 columns
  * and 300), rename is a metadata-only projection, `obs` is a `limit`.
  */
object SasOptions {

  sealed trait VarMatcher { def matches(col: String): Boolean }
  final case class Exact(name: String) extends VarMatcher {
    def matches(col: String): Boolean = col.equalsIgnoreCase(name)
  }
  final case class Prefix(prefix: String) extends VarMatcher {
    def matches(col: String): Boolean = col.toLowerCase.startsWith(prefix.toLowerCase)
  }

  /** Parse a SAS variable list: space-separated names, `name:` = prefix wildcard. */
  def parseVarList(spec: String): Seq[VarMatcher] =
    spec.trim.split("\\s+").toSeq.filter(_.nonEmpty).map { tok =>
      if (tok.endsWith(":")) Prefix(tok.dropRight(1)) else Exact(tok)
    }

  /** Parse a SAS rename spec `old1=new1 old2=new2` (whitespace around `=` ok). */
  def parseRename(spec: String): Seq[(String, String)] = {
    // normalize "a = b" to "a=b" then split on whitespace
    val compact = spec.trim.replaceAll("\\s*=\\s*", "=")
    compact.split("\\s+").toSeq.filter(_.nonEmpty).map { pair =>
      pair.split("=") match {
        case Array(o, n) => (o.toLowerCase, n.toLowerCase)
        case _ => throw new IllegalArgumentException(s"bad rename pair: '$pair' in '$spec'")
      }
    }
  }

  def keep(df: DataFrame, spec: String): DataFrame = {
    val ms = parseVarList(spec)
    val cols = df.columns.filter(c => ms.exists(_.matches(c)))
    df.select(cols.map(df.col).toIndexedSeq: _*)
  }

  def drop(df: DataFrame, spec: String): DataFrame = {
    val ms = parseVarList(spec)
    val cols = df.columns.filterNot(c => ms.exists(_.matches(c)))
    df.select(cols.map(df.col).toIndexedSeq: _*)
  }

  def rename(df: DataFrame, spec: String): DataFrame = {
    val pairs = parseRename(spec).toMap
    val renamed = df.columns.map(c => pairs.getOrElse(c.toLowerCase, c))
    df.toDF(renamed.toIndexedSeq: _*)
  }

  /** Apply options in SAS dataset-option order: drop/keep (pre-rename names),
    * then rename, then where, then obs. */
  def apply(
      df: DataFrame,
      drop: Option[String] = None,
      keep: Option[String] = None,
      rename: Option[String] = None,
      where: Option[String] = None,
      obs: Option[Long] = None
  ): DataFrame = {
    var out = df
    drop.foreach(s => out = this.drop(out, s))
    keep.foreach(s => out = this.keep(out, s))
    rename.foreach(s => out = this.rename(out, s))
    where.foreach(s => out = out.filter(SasWhere.compile(s)))
    obs.foreach(n => out = out.limit(n.toInt))
    out
  }
}
