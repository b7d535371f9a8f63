package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Postgres-style timestamp format tokens for `to_char` / `to_timestamp`
  * (reference: common/src/ttime.c:2032-2100 keyword table, tm2char at
  * ttime.c:2240; builtins.c:6621-6713 registers the function pair).
  *
  * The format string is a plan-time literal, so we translate it ONCE on
  * the driver into a `concat(...)` of built-in Spark SQL primitives
  * (`date_format`, `rpad`, `upper`, …) — every piece stays inside
  * whole-stage codegen; no UDF, no per-row parsing. `to_timestamp`
  * translates to a single java.time pattern consumed by Spark's native
  * parser.
  *
  * Semantics mirrored from tm2char: MONTH/Day families are space-padded
  * to width 9 (`%-9s`); HH/HH12 map 0→12; D is 1=Sunday..7=Saturday;
  * MS/US/NS are zero-padded fractions (ns shows µs resolution — the
  * engine's timestamps are µs); YYY/Y are the low digits of the year;
  * double-quoted runs are literal text.
  */
object TimeFormat {

  /** keyword → builder of a Spark SQL fragment over timestamp expr `x`.
    * Ordered longest-first so the tokenizer is greedy like the
    * reference's prefix search (ttime.c:2149 keywordSearch). */
  private def piece(x: String, kw: String): String = {
    def df(p: String) = s"date_format($x, '$p')"
    def pad9(s: String) = s"rpad($s, 9, ' ')"
    kw match {
      case "YYYY" | "yyyy" => df("yyyy")
      case "YYY" | "yyy" => s"substring(${df("yyyy")}, -3, 3)"
      case "YY" | "yy" => df("yy")
      case "Y" | "y" => s"substring(${df("yyyy")}, -1, 1)"
      case "MONTH" => pad9(s"upper(${df("MMMM")})")
      case "Month" => pad9(df("MMMM"))
      case "month" => pad9(s"lower(${df("MMMM")})")
      case "MON" => s"upper(${df("MMM")})"
      case "Mon" => df("MMM")
      case "mon" => s"lower(${df("MMM")})"
      case "MM" | "mm" => df("MM")
      case "DAY" => pad9(s"upper(${df("EEEE")})")
      case "Day" => pad9(df("EEEE"))
      case "day" => pad9(s"lower(${df("EEEE")})")
      case "DY" => s"upper(${df("EEE")})"
      case "Dy" => df("EEE")
      case "dy" => s"lower(${df("EEE")})"
      case "DDD" | "ddd" => df("DDD")
      case "DD" | "dd" => df("dd")
      case "D" | "d" => s"cast(dayofweek($x) as string)"
      case "HH24" | "hh24" => df("HH")
      case "HH12" | "hh12" | "HH" | "hh" => df("hh")
      case "MI" | "mi" => df("mm")
      case "SS" | "ss" => df("ss")
      case "MS" | "ms" => df("SSS")
      case "US" | "us" => df("SSSSSS")
      // µs-precision engine: nanos are micros ×1000 (ttime.c:2404 NS)
      case "NS" | "ns" => s"concat(${df("SSSSSS")}, '000')"
      case "AM" | "PM" => s"if(${df("a")} = 'AM', 'AM', 'PM')"
      case "am" | "pm" => s"if(${df("a")} = 'AM', 'am', 'pm')"
      case "A.M." | "P.M." => s"if(${df("a")} = 'AM', 'A.M.', 'P.M.')"
      case "a.m." | "p.m." => s"if(${df("a")} = 'AM', 'a.m.', 'p.m.')"
      // signed zone hour, e.g. "+00" (java 'xxx' prints "+00:00")
      case "TZH" | "tzh" => s"substring(${df("xxx")}, 1, 3)"
      case "TZ" | "tz" => df("zzz")
      case other =>
        throw new IllegalArgumentException(s"to_char token $other")
    }
  }

  /** java.time pattern fragment for the PARSE direction. */
  private def parsePiece(kw: String): String = kw match {
    case "YYYY" | "yyyy" => "yyyy"
    case "YY" | "yy" => "yy"
    case "MONTH" | "Month" | "month" => "MMMM"
    case "MON" | "Mon" | "mon" => "MMM"
    case "MM" | "mm" => "MM"
    case "DAY" | "Day" | "day" => "EEEE"
    case "DY" | "Dy" | "dy" => "EEE"
    case "DDD" | "ddd" => "DDD"
    case "DD" | "dd" => "dd"
    case "HH24" | "hh24" => "HH"
    case "HH12" | "hh12" | "HH" | "hh" => "hh"
    case "MI" | "mi" => "mm"
    case "SS" | "ss" => "ss"
    case "MS" | "ms" => "SSS"
    case "US" | "us" => "SSSSSS"
    case "AM" | "PM" | "am" | "pm" => "a"
    case "TZH" | "tzh" => "x"
    case other =>
      throw new IllegalArgumentException(s"to_timestamp token $other")
  }

  /** Tokens the reference parses-and-IGNORES in char2ts: day-of-week
    * numbers and names always (ttime.c:2783-2830 set tm_wday, which
    * taosTm2Ts never reads), and day-of-year when a DD supplies the
    * month day (with no DD the reference errors "not supported",
    * ttime.c:2875-2878 — but the plain java `DDD` pattern handles that
    * shape, so we stay a superset there). */
  private def isIgnored(kw: String, hasDD: Boolean): Boolean = kw match {
    case "D" | "d" | "DY" | "Dy" | "dy" | "DAY" | "Day" | "day" => true
    case "DDD" | "ddd" => hasDD
    case _ => false
  }

  /** What one token consumes from the input string, as a regex
    * fragment (mirrors tsFormatStr2Int32's 1..max digit scan and
    * strArrayCaseSearch name matching). */
  private def consumeRe(kw: String): String = kw match {
    case "YYYY" | "yyyy" => "[0-9]{1,4}"
    case "YYY" | "yyy" | "DDD" | "ddd" | "MS" | "ms" => "[0-9]{1,3}"
    case "YY" | "yy" | "MM" | "mm" | "DD" | "dd" | "HH24" | "hh24" |
         "HH12" | "hh12" | "HH" | "hh" | "MI" | "mi" | "SS" | "ss" =>
      "[0-9]{1,2}"
    case "Y" | "y" | "D" | "d" => "[0-9]"
    case "US" | "us" => "[0-9]{1,6}"
    case "NS" | "ns" => "[0-9]{1,9}"
    case "MON" | "Mon" | "mon" | "DY" | "Dy" | "dy" => "[A-Za-z]{3}"
    case "MONTH" | "Month" | "month" | "DAY" | "Day" | "day" =>
      "[A-Za-z]+"
    case "AM" | "PM" | "am" | "pm" => "[AaPp][Mm]"
    case "A.M." | "P.M." | "a.m." | "p.m." => "[AaPp]\\.[Mm]\\."
    case "TZH" | "tzh" => "[+-]?[0-9]{1,2}"
    case other =>
      throw new IllegalArgumentException(s"to_timestamp token $other")
  }

  /** Rebuild plan for formats that carry ignore-tokens: one anchored
    * regex consumes the whole shape; the kept fields re-concatenate
    * (group extracts + literal text + defaults for absent date parts,
    * char2ts defaults year=0/mon=1/md=1) into a canonical string
    * parsed by a plain java pattern. */
  private case class Rebuild(regex: String,
      parts: Seq[Either[String, Int]], pattern: String)

  private def rebuildPlan(toks: Seq[Tok]): Option[Rebuild] = {
    val hasDD = toks.exists {
      case Kw(k) => k == "DD" || k == "dd"
      case _ => false
    }
    val anyIgnored = toks.exists {
      case Kw(k) => isIgnored(k, hasDD)
      case _ => false
    }
    if (!anyIgnored) return None
    val re = new StringBuilder("^")
    toks.foreach {
      case Lit(s) => re ++= java.util.regex.Pattern.quote(s)
      case Kw(k) if isIgnored(k, hasDD) => re ++= consumeRe(k)
      case Kw(k) => re ++= "(" + consumeRe(k) + ")"
    }
    // the kept stream: drop ignored tokens, then MERGE adjacent
    // literals — separate quoted runs around a dropped token would
    // otherwise read as an escaped quote in the java pattern
    val kept = toks.filter {
      case Kw(k) => !isIgnored(k, hasDD)
      case _ => true
    }.foldLeft(Vector.empty[Tok]) {
      case (acc :+ Lit(a), Lit(b)) => acc :+ Lit(a + b)
      case (acc, t) => acc :+ t
    }
    val parts = Seq.newBuilder[Either[String, Int]]
    val pat = new StringBuilder
    var gi = 0
    kept.foreach {
      case Lit(s) =>
        parts += Left(s)
        pat ++= "'" + s.replace("'", "''") + "'"
      case Kw(k) =>
        gi += 1
        parts += Right(gi)
        pat ++= parsePiece(k)
    }
    def has(kws: String*) = toks.exists {
      case Kw(k) => kws.contains(k)
      case _ => false
    }
    // inject char2ts defaults for absent date fields so java.time can
    // resolve a date (it has no field defaults; the reference does)
    var prefixLit = ""; var prefixPat = ""
    if (!has("DD", "dd")) { prefixLit = "01 " + prefixLit
      prefixPat = "dd " + prefixPat }
    if (!has("MM", "mm", "MON", "Mon", "mon", "MONTH", "Month", "month")) {
      prefixLit = "01 " + prefixLit; prefixPat = "MM " + prefixPat }
    if (!has("YYYY", "yyyy", "YYY", "yyy", "YY", "yy", "Y", "y")) {
      prefixLit = "0000 " + prefixLit; prefixPat = "yyyy " + prefixPat }
    val body = parts.result()
    val allParts =
      if (prefixLit.isEmpty) body else Left(prefixLit) +: body
    Some(Rebuild(re.toString, allParts, prefixPat + pat.toString))
  }

  /** All keywords, longest-first (greedy tokenize). */
  private val keywords: Seq[String] = Seq(
    "A.M.", "P.M.", "a.m.", "p.m.",
    "HH24", "hh24", "HH12", "hh12", "YYYY", "yyyy",
    "MONTH", "Month", "month",
    "DAY", "Day", "day", "DDD", "ddd", "MON", "Mon", "mon",
    "TZH", "tzh", "YYY", "yyy",
    "AM", "PM", "am", "pm", "DD", "dd", "DY", "Dy", "dy",
    "HH", "hh", "MI", "mi", "MM", "mm", "MS", "ms", "NS", "ns",
    "SS", "ss", "TZ", "tz", "US", "us", "YY", "yy",
    "D", "d", "Y", "y").sortBy(-_.length)

  private sealed trait Tok
  private case class Kw(s: String) extends Tok
  private case class Lit(s: String) extends Tok

  /** Greedy tokenizer mirroring parseTsFormat (ttime.c:2171): keyword
    * match first; `"…"` is literal (with backslash escapes); any other
    * char passes through. */
  private def tokenize(fmt: String): Seq[Tok] = {
    val out = Seq.newBuilder[Tok]
    var i = 0
    while (i < fmt.length) {
      keywords.find(k => fmt.startsWith(k, i)) match {
        case Some(k) => out += Kw(k); i += k.length
        case None =>
          if (fmt(i) == '"') {
            i += 1
            val sb = new StringBuilder
            while (i < fmt.length && fmt(i) != '"') {
              if (fmt(i) == '\\' && i + 1 < fmt.length) i += 1
              sb += fmt(i); i += 1
            }
            if (i < fmt.length) i += 1 // closing quote
            if (sb.nonEmpty) out += Lit(sb.toString)
          } else if (fmt(i) == '\\' && i + 1 < fmt.length) {
            out += Lit(fmt(i + 1).toString); i += 2
          } else {
            out += Lit(fmt(i).toString); i += 1
          }
      }
    }
    // merge adjacent literals
    out.result().foldLeft(Vector.empty[Tok]) {
      case (acc :+ Lit(a), Lit(b)) => acc :+ Lit(a + b)
      case (acc, t) => acc :+ t
    }
  }

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Spark SQL text for `to_char(x, fmt)`; `x` is a SQL expression of
    * timestamp type. */
  def toCharSql(x: String, fmt: String): String = {
    val parts = tokenize(fmt).map {
      case Kw(k) => piece(s"($x)", k)
      case Lit(s) => sqlLit(s)
    }
    if (parts.isEmpty) "''"
    else if (parts.length == 1 && parts.head.startsWith("'")) parts.head
    else parts.mkString("concat(", ", ", ")")
  }

  /** Spark SQL text for `to_timestamp(x, fmt)`. Formats carrying the
    * reference's parse-and-ignore tokens (D/DY/DAY, DDD next to DD)
    * take the rebuild path: consume via one anchored regex, keep only
    * the real fields. */
  def toTimestampSql(x: String, fmt: String): String = {
    val toks = tokenize(fmt)
    rebuildPlan(toks) match {
      case Some(Rebuild(re, parts, pattern)) =>
        val reLit = sqlLit(re)
        val pieces = parts.map {
          case Left(s) => sqlLit(s)
          case Right(g) => s"regexp_extract($x, $reLit, $g)"
        }
        val cleaned =
          if (pieces.length == 1) pieces.head
          else pieces.mkString("concat(", ", ", ")")
        s"to_timestamp($cleaned, ${sqlLit(pattern)})"
      case None =>
        // literal runs become java.time quoted sections; the whole
        // pattern is then embedded as a SQL string literal
        val pat = toks.map {
          case Kw(k) => parsePiece(k)
          case Lit(s) => "'" + s.replace("'", "''") + "'"
        }.mkString
        s"to_timestamp($x, '${pat.replace("'", "''")}')"
    }
  }

  /** Column-API form: same token stream, built with functions._ (the
    * new Column API cannot render arbitrary columns back to SQL text,
    * so the dialect path and this one share only the tokenizer). */
  def toChar(ts: Column, fmt: String): Column = {
    def df(p: String) = date_format(ts, p)
    def pad9(c: Column) = rpad(c, 9, " ")
    def ampm(up: String, lo: String) =
      when(df("a") === "AM", lit(up)).otherwise(lit(lo))
    val parts: Seq[Column] = tokenize(fmt).map {
      case Lit(s) => lit(s)
      case Kw(k) => k match {
        case "YYYY" | "yyyy" => df("yyyy")
        case "YYY" | "yyy" => substring(df("yyyy"), -3, 3)
        case "YY" | "yy" => df("yy")
        case "Y" | "y" => substring(df("yyyy"), -1, 1)
        case "MONTH" => pad9(upper(df("MMMM")))
        case "Month" => pad9(df("MMMM"))
        case "month" => pad9(lower(df("MMMM")))
        case "MON" => upper(df("MMM"))
        case "Mon" => df("MMM")
        case "mon" => lower(df("MMM"))
        case "MM" | "mm" => df("MM")
        case "DAY" => pad9(upper(df("EEEE")))
        case "Day" => pad9(df("EEEE"))
        case "day" => pad9(lower(df("EEEE")))
        case "DY" => upper(df("EEE"))
        case "Dy" => df("EEE")
        case "dy" => lower(df("EEE"))
        case "DDD" | "ddd" => df("DDD")
        case "DD" | "dd" => df("dd")
        case "D" | "d" => dayofweek(ts).cast("string")
        case "HH24" | "hh24" => df("HH")
        case "HH12" | "hh12" | "HH" | "hh" => df("hh")
        case "MI" | "mi" => df("mm")
        case "SS" | "ss" => df("ss")
        case "MS" | "ms" => df("SSS")
        case "US" | "us" => df("SSSSSS")
        case "NS" | "ns" => concat(df("SSSSSS"), lit("000"))
        case "AM" | "PM" => ampm("AM", "PM")
        case "am" | "pm" => ampm("am", "pm")
        case "A.M." | "P.M." => ampm("A.M.", "P.M.")
        case "a.m." | "p.m." => ampm("a.m.", "p.m.")
        case "TZH" | "tzh" => substring(df("xxx"), 1, 3)
        case "TZ" | "tz" => df("zzz")
        case other =>
          throw new IllegalArgumentException(s"to_char token $other")
      }
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  def toTimestamp(s: Column, fmt: String): Column = {
    val toks = tokenize(fmt)
    rebuildPlan(toks) match {
      case Some(Rebuild(re, parts, pattern)) =>
        val pieces = parts.map {
          case Left(t) => lit(t)
          case Right(g) => regexp_extract(s, re, g)
        }
        val cleaned =
          if (pieces.length == 1) pieces.head else concat(pieces: _*)
        org.apache.spark.sql.functions.to_timestamp(cleaned, pattern)
      case None =>
        val pat = toks.map {
          case Kw(k) => parsePiece(k)
          case Lit(t) => "'" + t.replace("'", "''") + "'"
        }.mkString
        org.apache.spark.sql.functions.to_timestamp(s, pat)
    }
  }
}
