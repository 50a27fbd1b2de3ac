package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Compiles a SAS `where=` clause (the subset the reference forwards to SAS —
  * wrds2pg/sas/codegen.py:62-65, api.py:108-111) into a Catalyst `Column`
  * predicate.
  *
  * Because the result is a plain Catalyst predicate, Spark pushes it into the
  * file scan (parquet row-group / page skipping) — at 100 TB the where-clause
  * runs *inside the scan*, not after it.
  *
  * Supported grammar (SAS WHERE expression subset):
  *   expr     := or ;  or := and (OR and)* ;  and := not (AND not)*
  *   not      := NOT not | cmp
  *   cmp      := sum ((=|eq|^=|~=|<>|ne|>|gt|<|lt|>=|ge|<=|le) sum
  *               | [NOT] IN '(' lit (',' lit)* ')'
  *               | [NOT] BETWEEN sum AND sum
  *               | [NOT] (CONTAINS|?) str
  *               | [NOT] LIKE str
  *               | IS [NOT] (MISSING|NULL))
  *               | 'missing(' ident ')'
  *   sum      := prod (('+'|'-') prod)* ;  prod := atom (('*'|'/') atom)*
  *   atom     := number | string | date | datetime | ident | '(' expr ')'
  *   date     := 'ddMONyyyy'd ;  datetime := 'ddMONyyyy:HH:MM:SS'dt
  * Identifiers are case-insensitive (lowercased, as everywhere in graft).
  */
object SasWhere {

  // ---------------- lexer ----------------
  sealed trait Tok
  final case class TNum(v: Double) extends Tok
  final case class TStr(v: String) extends Tok
  final case class TDate(v: java.sql.Date) extends Tok          // '01JAN2024'd
  final case class TTimestamp(v: java.sql.Timestamp) extends Tok // '01JAN2024:10:30:00'dt
  final case class TId(v: String) extends Tok   // lowercased identifier / keyword
  final case class TOp(v: String) extends Tok   // punctuation operator
  case object TLParen extends Tok
  case object TRParen extends Tok
  case object TComma extends Tok

  // SAS accepts 1- or 2-digit days and any month-abbreviation case
  // ('1JAN2024'd, '01jan2024'd, '15Mar1999'd are all legal), so the pattern
  // uses single-letter `d` (1-2 digits) and a case-insensitive builder
  // rather than fixed slicing.
  private def sasFmt(pattern: String) =
    new java.time.format.DateTimeFormatterBuilder()
      .parseCaseInsensitive()
      .appendPattern(pattern)
      .toFormatter(java.util.Locale.US)
  private val DateFmt = sasFmt("dMMMuuuu")
  private val DtFmt = sasFmt("dMMMuuuu:H:mm:ss")

  /** SAS date/datetime constants: '01JAN2024'd / '01JAN2024:10:30:00'dt. */
  private def dateTok(raw: String, suffix: String): Tok =
    try {
      suffix match {
        case "d" => TDate(java.sql.Date.valueOf(
          java.time.LocalDate.parse(raw, DateFmt)))
        case "dt" => TTimestamp(java.sql.Timestamp.valueOf(
          java.time.LocalDateTime.parse(raw, DtFmt)))
      }
    } catch {
      case e: java.time.format.DateTimeParseException =>
        val kind = if (suffix == "d") "date" else "datetime"
        throw new IllegalArgumentException(
          s"bad SAS $kind literal '$raw'$suffix — expected [d]dMMMyyyy" +
            (if (suffix == "dt") ":HH:mm:ss" else "") + s", e.g. '01JAN2024'$suffix", e)
    }

  def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(') { out += TLParen; i += 1 }
      else if (c == ')') { out += TRParen; i += 1 }
      else if (c == ',') { out += TComma; i += 1 }
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var done = false
        while (!done) {
          if (i >= n) throw new IllegalArgumentException(s"unterminated string in where: $s")
          val ch = s.charAt(i)
          if (ch == quote) {
            // SAS doubles the quote char to escape it
            if (i + 1 < n && s.charAt(i + 1) == quote) { sb += quote; i += 2 }
            else { done = true; i += 1 }
          } else { sb += ch; i += 1 }
        }
        // date/datetime constant suffix: '…'d or '…'dt (immediately after quote)
        def idChar(j: Int) = j < n && (s.charAt(j).isLetterOrDigit || s.charAt(j) == '_')
        val isDt = i + 1 < n && "dD".indexOf(s.charAt(i)) >= 0 &&
          "tT".indexOf(s.charAt(i + 1)) >= 0 && !idChar(i + 2)
        val isD = !isDt && i < n && "dD".indexOf(s.charAt(i)) >= 0 && !idChar(i + 1)
        if (isDt) { out += dateTok(sb.toString, "dt"); i += 2 }
        else if (isD) { out += dateTok(sb.toString, "d"); i += 1 }
        else out += TStr(sb.toString)
      }
      else if (c.isDigit || (c == '.' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        // scientific notation
        if (i < n && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
          var j = i + 1
          if (j < n && (s.charAt(j) == '+' || s.charAt(j) == '-')) j += 1
          if (j < n && s.charAt(j).isDigit) { i = j; while (i < n && s.charAt(i).isDigit) i += 1 }
        }
        out += TNum(s.substring(start, i).toDouble)
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += TId(s.substring(start, i).toLowerCase)
      }
      else {
        // punctuation operators, longest-match
        val two = if (i + 1 < n) s.substring(i, i + 2) else ""
        if (Set(">=", "<=", "^=", "~=", "<>", "=>", "=<").contains(two)) {
          out += TOp(two match { case "=>" => ">="; case "=<" => "<="; case o => o }); i += 2
        } else if ("=<>+-*/?".indexOf(c) >= 0) { out += TOp(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"unexpected char '$c' in where: $s")
      }
    }
    out.toList
  }

  // ---------------- parser ----------------
  private class Parser(tokens: List[Tok]) {
    private var toks = tokens
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = { val h = toks.head; toks = toks.tail; h }
    private def expect(t: Tok): Unit = {
      if (peek.contains(t)) { next(); () }
      else throw new IllegalArgumentException(s"expected $t, got $peek")
    }
    private def isKw(t: Tok, kw: String): Boolean = t == TId(kw)

    def parse(): Column = {
      val e = orExpr()
      if (toks.nonEmpty) throw new IllegalArgumentException(s"trailing tokens: $toks")
      e
    }

    private def orExpr(): Column = {
      var left = andExpr()
      while (peek.exists(isKw(_, "or")) || peek.contains(TOp("|"))) { next(); left = left || andExpr() }
      left
    }

    private def andExpr(): Column = {
      var left = notExpr()
      while (peek.exists(isKw(_, "and")) || peek.contains(TOp("&"))) { next(); left = left && notExpr() }
      left
    }

    private def notExpr(): Column =
      if (peek.exists(isKw(_, "not")) || peek.contains(TOp("^")) || peek.contains(TOp("~"))) {
        next(); !notExpr()
      } else comparison()

    private val cmpKw = Map("eq" -> "=", "ne" -> "<>", "gt" -> ">", "lt" -> "<", "ge" -> ">=", "le" -> "<=")

    private def comparison(): Column = {
      // missing(x) function form
      peek match {
        case Some(TId("missing")) if toks.drop(1).headOption.contains(TLParen) =>
          next(); expect(TLParen)
          val c = sum(); expect(TRParen)
          return c.isNull
        case _ =>
      }
      val left = sum()
      var negate = false
      if (peek.exists(isKw(_, "not"))) { next(); negate = true }
      val res: Column = peek match {
        case Some(TOp(op)) if Set("=", "<>", "^=", "~=", ">", "<", ">=", "<=").contains(op) =>
          next(); binCmp(left, op, sum())
        case Some(TId(kw)) if cmpKw.contains(kw) =>
          next(); binCmp(left, cmpKw(kw), sum())
        case Some(TId("in")) =>
          next(); expect(TLParen)
          val vals = scala.collection.mutable.ListBuffer[Any]()
          var done = false
          while (!done) {
            next() match {
              case TNum(v) => vals += v
              case TStr(v) => vals += v
              case TDate(v) => vals += v
              case TTimestamp(v) => vals += v
              case t => throw new IllegalArgumentException(s"bad IN list element: $t")
            }
            peek match {
              case Some(TComma) => next()
              case Some(TRParen) => next(); done = true
              case t => throw new IllegalArgumentException(s"bad IN list: $t")
            }
          }
          left.isin(vals.toSeq: _*)
        case Some(TId("between")) =>
          next()
          val lo = sum()
          if (!peek.exists(isKw(_, "and"))) throw new IllegalArgumentException("BETWEEN requires AND")
          next()
          val hi = sum()
          left.between(lo, hi)
        case Some(TId("contains")) | Some(TOp("?")) =>
          next()
          next() match {
            case TStr(v) => left.contains(v)
            case t => throw new IllegalArgumentException(s"CONTAINS requires a string, got $t")
          }
        case Some(TId("like")) =>
          next()
          next() match {
            case TStr(v) => left.like(v)
            case t => throw new IllegalArgumentException(s"LIKE requires a string, got $t")
          }
        case Some(TId("is")) =>
          next()
          var isNeg = false
          if (peek.exists(isKw(_, "not"))) { next(); isNeg = true }
          peek match {
            case Some(TId("missing")) | Some(TId("null")) =>
              next(); if (isNeg) left.isNotNull else left.isNull
            case t => throw new IllegalArgumentException(s"IS requires MISSING/NULL, got $t")
          }
        case _ if !negate =>
          left // bare boolean column
        case t => throw new IllegalArgumentException(s"expected comparison after NOT, got $t")
      }
      if (negate) !res else res
    }

    private def binCmp(l: Column, op: String, r: Column): Column = op match {
      case "=" => l === r
      case "<>" | "^=" | "~=" => l =!= r
      case ">" => l > r
      case "<" => l < r
      case ">=" => l >= r
      case "<=" => l <= r
    }

    private def sum(): Column = {
      var left = prod()
      var cont = true
      while (cont) peek match {
        case Some(TOp("+")) => next(); left = left + prod()
        case Some(TOp("-")) => next(); left = left - prod()
        case _ => cont = false
      }
      left
    }

    private def prod(): Column = {
      var left = atom()
      var cont = true
      while (cont) peek match {
        case Some(TOp("*")) => next(); left = left * atom()
        case Some(TOp("/")) => next(); left = left / atom()
        case _ => cont = false
      }
      left
    }

    private def atom(): Column = next() match {
      case TNum(v) => if (v == v.toLong.toDouble) lit(v.toLong) else lit(v)
      case TStr(v) => lit(v)
      case TDate(v) => lit(v)
      case TTimestamp(v) => lit(v)
      case TId(name) => col(name)
      case TLParen =>
        val e = orExpr()
        expect(TRParen)
        e
      case TOp("-") => negate(atom())
      case t => throw new IllegalArgumentException(s"unexpected token: $t")
    }
  }

  /** Compile a SAS where-clause string into a Catalyst predicate. */
  def compile(where: String): Column = new Parser(tokenize(where)).parse()
}
