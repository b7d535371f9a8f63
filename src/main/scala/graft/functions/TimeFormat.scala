package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
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
      // full offset "±HH:MM" (ttime.c:2418 tm2char TZ)
      case "TZ" | "tz" => df("xxx")
      case other =>
        throw new IllegalArgumentException(s"to_char token $other")
    }
  }

  /** Tokens the reference parses-and-IGNORES in char2ts: day-of-week
    * numbers and names (ttime.c:2783-2830 set tm_wday, which taosTm2Ts
    * never reads), and day-of-year (tm_yday — likewise never read when
    * DD is present; without DD the reference errors "not supported",
    * ttime.c:2875-2878, and the strict parse of a 000 default yields
    * the matching error here). */
  private def isIgnored(kw: String): Boolean = kw match {
    case "D" | "d" | "DY" | "Dy" | "dy" | "DAY" | "Day" | "day" => true
    case _ => false
  }

  /** char2ts (ttime.c:2560-2900) is far looser than java.time: digit
    * runs may fall short of the token width ("2023-1-1"), separators
    * match ANY separator characters (ttime.c:2579-2582), leading
    * input whitespace is skipped per token, an exhausted input leaves
    * the remaining fields at their defaults (year 0, month 1, day 1,
    * time 0), a repeated field keeps its LAST value, ms/us/ns
    * accumulate into one fraction, and 1-3-digit years pivot through
    * adjustYearTo2020 (ttime.c:2518).
    *
    * The parse plan therefore (a) consumes the input with one anchored
    * regex whose tail degrades gracefully at end-of-input, (b)
    * computes each FIELD numerically from its last capture, and (c)
    * reassembles a canonical `yyyy-MM-dd HH:mm:ss.SSSSSSSSSx` string
    * for one strict java parse — whose range errors then surface
    * exactly where the reference errors (-2). */
  private[functions] case class FieldPlan(regex: String,
      yearG: Option[(Int, Boolean)], // (group, pivots through 2020)
      monthG: Option[(Int, Boolean)], // (group, is a month NAME)
      dayG: Option[Int], hourG: Option[Int],
      minG: Option[Int], secG: Option[Int],
      msG: Option[Int], usG: Option[Int], nsG: Option[Int],
      merG: Option[Int],
      tzG: Option[(Int, Boolean)]) // (group, is the full TZ form)

  private def widthOf(kw: String): Int = kw.toUpperCase match {
    case "YYYY" => 4
    case "YYY" | "DDD" | "MS" => 3
    case "Y" | "D" => 1
    case "US" => 6
    case "NS" => 9
    case _ => 2 // YY MM DD HH24 HH12 HH MI SS
  }

  private def isDigitKw(kw: String): Boolean = kw.toUpperCase match {
    case "YYYY" | "YYY" | "YY" | "Y" | "MM" | "DDD" | "DD" | "D" |
         "HH24" | "HH12" | "HH" | "MI" | "SS" | "MS" | "US" | "NS" |
         "TZH" => true
    case _ => false
  }

  private[functions] def fieldPlan(toks: Seq[Tok]): FieldPlan = {
    // needMoreDigits (ttime.c:2546): a digit token is width-strict only
    // when the NEXT node also starts with a digit
    def needMore(i: Int): Boolean = toks.lift(i + 1).exists {
      case Kw(k) => isDigitKw(k)
      case Lit(s) => s.headOption.exists(_.isDigit)
    }
    var p = FieldPlan("", None, None, None, None, None, None,
      None, None, None, None, None)
    val frags = Seq.newBuilder[String]
    var g = 0
    toks.zipWithIndex.foreach { case (tok, i) =>
      tok match {
        case Lit(s) =>
          // char2ts literal handling is position-, not content-based:
          // separator runs match ANY separator characters or none
          // (ttime.c:2579-2582), and other literal text consumes that
          // many characters without comparing them (:2584-2594) — so
          // "yyyyMM1/dd" parses "210001/2" (commonTests.cpp:757)
          s.foldLeft(Vector.empty[(Boolean, Int)]) { (acc, ch) =>
            val isSep = !ch.isLetterOrDigit
            acc match {
              case init :+ ((`isSep`, n)) => init :+ (isSep, n + 1)
              case _ => acc :+ (isSep, 1)
            }
          }.foreach { case (isSep, n) =>
            frags +=
              (if (isSep) s"[^A-Za-z0-9]{0,$n}" else s"[\\s\\S]{0,$n}")
          }
        case Kw(k) =>
          val cap = { g += 1; g }
          val frag = k.toUpperCase match {
            case "MON" | "DY" => "([A-Za-z]{3})"
            case "MONTH" | "DAY" => "([A-Za-z]++)"
            case "AM" | "PM" => "([AaPp][Mm])"
            case "A.M." | "P.M." => "([AaPp]\\.[Mm]\\.)"
            case "TZH" => "([+-]?[0-9]{1,2}+)"
            // Z, ±HH, ±HH:MM, ±HHMM (ttime.c:2706-2744 char2ts TZ)
            case "TZ" => "([Zz]|[+-][0-9]{2}(?::[0-9]{2}|[0-9]{2})?)"
            case _ if isDigitKw(k) =>
              val w = widthOf(k)
              if (needMore(i)) s"([0-9]{$w})" else s"([0-9]{1,$w}+)"
            case other => throw new IllegalArgumentException(
              s"to_timestamp token $other")
          }
          frags += "\\s*+" + frag
          if (!isIgnored(k)) k.toUpperCase match {
            case "YYYY" => p = p.copy(yearG = Some((cap, false)))
            case "YYY" | "YY" | "Y" => p = p.copy(yearG = Some((cap, true)))
            case "MM" => p = p.copy(monthG = Some((cap, false)))
            case "MON" | "MONTH" => p = p.copy(monthG = Some((cap, true)))
            case "DDD" => // consumed; tm_yday is never read (see above)
            case "DD" => p = p.copy(dayG = Some(cap))
            case "HH24" | "HH12" | "HH" => p = p.copy(hourG = Some(cap))
            case "MI" => p = p.copy(minG = Some(cap))
            case "SS" => p = p.copy(secG = Some(cap))
            case "MS" => p = p.copy(msG = Some(cap))
            case "US" => p = p.copy(usG = Some(cap))
            case "NS" => p = p.copy(nsG = Some(cap))
            case "AM" | "PM" | "A.M." | "P.M." => p = p.copy(merG = Some(cap))
            case "TZH" => p = p.copy(tzG = Some((cap, false)))
            case "TZ" => p = p.copy(tzG = Some((cap, true)))
            case other => throw new IllegalArgumentException(
              s"to_timestamp token $other")
          }
      }
    }
    // nested end-tolerance: past any point, end-of-input is a match
    // (char2ts's loop stops at '\0' and keeps the field defaults)
    val re = frags.result().foldRight("")((f, tail) => s"(?:\\z|$f$tail)")
    p.copy(regex = "^" + re)
  }

  private[functions] val CanonicalPattern =
    "yyyy-MM-dd HH:mm:ss.SSSSSSSSSxxx"

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

  private[functions] sealed trait Tok
  private case class Kw(s: String) extends Tok
  private case class Lit(s: String) extends Tok

  /** Greedy tokenizer mirroring parseTsFormat (ttime.c:2171): keyword
    * match first; `"…"` is literal (with backslash escapes); any other
    * char passes through. */
  private[functions] def tokenize(fmt: String): Seq[Tok] = {
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

  /** Spark SQL text for `to_timestamp(x, fmt)`: the one-pass
    * canonicalizer ([[CanonicalTsString]], registered as
    * `graft_ts_canon` by NativeFunctions.register before any dialect
    * parse) + Spark's native strict parse of the canonical rebuild. A
    * shape-level mismatch yields NULL; a range-invalid field errors,
    * matching the reference's -1/-2 split as closely as SQL null
    * semantics allow. */
  def toTimestampSql(x: String, fmt: String): String =
    s"to_timestamp(graft_ts_canon(($x), ${sqlLit(fmt)}), " +
      s"'$CanonicalPattern')"

  /** The original SQL-text lowering (one `regexp_extract` per field
    * reference) — kept as the executable char2ts spec the native
    * canonicalizer is cross-checked against in TimeFormatSpec. */
  def toTimestampSqlViaExtracts(x: String, fmt: String): String = {
    val p = fieldPlan(tokenize(fmt))
    val reLit = sqlLit(p.regex)
    def gS(g: Int) = s"regexp_extract($x, $reLit, $g)"
    def num(gOpt: Option[Int], dflt: Int): String = gOpt match {
      case None => dflt.toString
      case Some(g) =>
        s"coalesce(CAST(nullif(${gS(g)}, '') AS BIGINT), $dflt)"
    }
    val year = p.yearG match {
      case Some((g, true)) =>
        val i = s"CAST(nullif(${gS(g)}, '') AS BIGINT)"
        s"(CASE WHEN $i IS NULL THEN 0 WHEN $i < 70 THEN $i + 2000 " +
          s"WHEN $i < 100 THEN $i + 1900 WHEN $i < 520 THEN $i + 2000 " +
          s"ELSE $i + 1000 END)"
      case g => num(g.map(_._1), 0)
    }
    val month = p.monthG match {
      case Some((g, true)) =>
        s"(CASE WHEN ${gS(g)} = '' THEN 1 " +
          s"WHEN length(${gS(g)}) < 3 THEN 0 " +
          s"ELSE (instr('janfebmaraprmayjunjulaugsepoctnovdec', " +
          s"lower(substring(${gS(g)}, 1, 3))) + 2) DIV 3 END)"
      case g => num(g.map(_._1), 1)
    }
    val hourRaw = num(p.hourG, 0)
    val hour = p.merG match {
      case None => hourRaw
      case Some(g) =>
        val m = s"upper(replace(${gS(g)}, '.', ''))"
        s"(CASE WHEN $m = '' THEN $hourRaw " +
          s"WHEN $m = 'PM' AND $hourRaw < 12 THEN $hourRaw + 12 " +
          s"WHEN $m <> 'PM' AND $hourRaw = 12 THEN 0 " +
          s"ELSE $hourRaw END)"
    }
    val fracNs = s"(${num(p.msG, 0)} * 1000000 + " +
      s"${num(p.usG, 0)} * 1000 + ${num(p.nsG, 0)})"
    val tz = p.tzG match {
      case None => "'+00:00'"
      case Some((g, true)) =>
        val v = gS(g)
        s"(CASE WHEN $v = '' OR upper($v) = 'Z' THEN '+00:00' " +
          s"WHEN length($v) = 3 THEN concat($v, ':00') " +
          s"WHEN length($v) = 5 THEN concat(substring($v, 1, 3), ':', " +
          s"substring($v, 4, 2)) ELSE $v END)"
      case Some((g, false)) =>
        val v = gS(g)
        s"(CASE WHEN $v = '' THEN '+00:00' " +
          s"WHEN $v LIKE '-%' " +
          s"THEN concat('-', lpad(substring($v, 2), 2, '0'), ':00') " +
          s"WHEN $v LIKE '+%' " +
          s"THEN concat('+', lpad(substring($v, 2), 2, '0'), ':00') " +
          s"ELSE concat('+', lpad($v, 2, '0'), ':00') END)"
    }
    def pad(e: String, w: Int) = s"lpad(CAST($e AS STRING), $w, '0')"
    val cleaned = Seq(
      pad(year, 4), "'-'", pad(month, 2), "'-'", pad(num(p.dayG, 1), 2),
      "' '", pad(hour, 2), "':'", pad(num(p.minG, 0), 2), "':'",
      pad(num(p.secG, 0), 2), "'.'", pad(fracNs, 9), tz)
      .mkString("concat(", ", ", ")")
    s"to_timestamp(CASE WHEN ($x) RLIKE $reLit THEN $cleaned END, " +
      s"'$CanonicalPattern')"
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
        case "TZ" | "tz" => df("xxx")
        case other =>
          throw new IllegalArgumentException(s"to_char token $other")
      }
    }
    if (parts.isEmpty) lit("") else concat(parts: _*)
  }

  /** to_timestamp via the one-pass canonicalizer: ONE codegen'd regex
    * match per row ([[CanonicalTsString]]) computes every field and
    * rebuilds the canonical string, which Spark's own native parser
    * consumes — the final parse is bit-identical to the regex-extract
    * form below. The extract form ran the SAME anchored regex once per
    * field reference (~11 full matches per call: Spark's subexpression
    * elimination skips CaseWhen branch bodies, the r21 negative
    * result), at ~1.15 ms/row for four calls; the native pass is one
    * match. [[toTimestampViaExtracts]] is kept as the cross-check
    * reference (TimeFormatSpec asserts bit-equality). */
  def toTimestamp(s: Column, fmt: String): Column =
    org.apache.spark.sql.functions.to_timestamp(
      org.apache.spark.sql.GraftColumnShim.column(CanonicalTsString(
        org.apache.spark.sql.GraftColumnShim.expression(s), fmt)),
      CanonicalPattern)

  /** Column-API twin of [[toTimestampSql]] (same FieldPlan, built with
    * functions._ since the new Column API cannot render arbitrary
    * columns back to SQL text). The original lowering — kept as the
    * executable spec of char2ts semantics that [[CanonicalTsString]]
    * must reproduce bit-for-bit. */
  def toTimestampViaExtracts(s: Column, fmt: String): Column = {
    val p = fieldPlan(tokenize(fmt))
    def gS(g: Int): Column = regexp_extract(s, p.regex, g)
    def num(gOpt: Option[Int], dflt: Int): Column = gOpt match {
      case None => lit(dflt).cast("bigint")
      case Some(g) =>
        coalesce(nullif(gS(g), lit("")).cast("bigint"),
          lit(dflt).cast("bigint"))
    }
    val year = p.yearG match {
      case Some((g, true)) =>
        val i = nullif(gS(g), lit("")).cast("bigint")
        when(i.isNull, 0L).when(i < 70, i + 2000)
          .when(i < 100, i + 1900).when(i < 520, i + 2000)
          .otherwise(i + 1000)
      case g => num(g.map(_._1), 0)
    }
    val month = p.monthG match {
      case Some((g, true)) =>
        when(gS(g) === "", 1L)
          .when(length(gS(g)) < 3, 0L)
          .otherwise(((instr(lit("janfebmaraprmayjunjulaugsepoctnovdec"),
            lower(substring(gS(g), 1, 3))) + 2) / 3).cast("bigint"))
      case g => num(g.map(_._1), 1)
    }
    val hourRaw = num(p.hourG, 0)
    val hour = p.merG match {
      case None => hourRaw
      case Some(g) =>
        val m = upper(translate(gS(g), ".", ""))
        when(m === "", hourRaw)
          .when(m === "PM" && hourRaw < 12, hourRaw + 12)
          .when(m =!= "PM" && hourRaw === 12, 0L)
          .otherwise(hourRaw)
    }
    val fracNs = num(p.msG, 0) * 1000000L + num(p.usG, 0) * 1000L +
      num(p.nsG, 0)
    val tz = p.tzG match {
      case None => lit("+00:00")
      case Some((g, true)) =>
        val v = gS(g)
        when(v === "" || upper(v) === "Z", "+00:00")
          .when(length(v) === 3, concat(v, lit(":00")))
          .when(length(v) === 5, concat(v.substr(lit(1), lit(3)),
            lit(":"), v.substr(lit(4), lit(2))))
          .otherwise(v)
      case Some((g, false)) =>
        val v = gS(g)
        when(v === "", "+00:00")
          .when(v.startsWith("-"), concat(lit("-"),
            lpad(v.substr(lit(2), lit(2)), 2, "0"), lit(":00")))
          .when(v.startsWith("+"), concat(lit("+"),
            lpad(v.substr(lit(2), lit(2)), 2, "0"), lit(":00")))
          .otherwise(concat(lit("+"), lpad(v, 2, "0"), lit(":00")))
    }
    def pad(e: Column, w: Int) = lpad(e.cast("string"), w, "0")
    val cleaned = concat(
      pad(year, 4), lit("-"), pad(month, 2), lit("-"),
      pad(num(p.dayG, 1), 2), lit(" "), pad(hour, 2), lit(":"),
      pad(num(p.minG, 0), 2), lit(":"), pad(num(p.secG, 0), 2),
      lit("."), pad(fracNs, 9), tz)
    org.apache.spark.sql.functions.to_timestamp(
      when(s.rlike(p.regex), cleaned), CanonicalPattern)
  }
}

/** One-pass char2ts canonicalizer: matches the FieldPlan's anchored
  * regex ONCE per row and rebuilds the canonical
  * `yyyy-MM-dd HH:mm:ss.SSSSSSSSS±HH:MM` string in JVM code —
  * bit-identical to the `regexp_extract`-per-field Column lowering
  * ([[TimeFormat.toTimestampViaExtracts]], asserted in TimeFormatSpec)
  * but ~11× fewer regex passes: Spark's subexpression elimination
  * cannot merge the per-field extracts because they sit inside
  * CaseWhen branches (the r21 negative result). NULL when the regex
  * does not match, mirroring the `when(s.rlike(re), …)` guard. The
  * format string is the only state, so the expression serializes
  * trivially; plan and pattern recompile lazily per executor. */
case class CanonicalTsString(child: Expression, fmt: String)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val plan: TimeFormat.FieldPlan =
    TimeFormat.fieldPlan(TimeFormat.tokenize(fmt))
  @transient private lazy val pattern: java.util.regex.Pattern =
    java.util.regex.Pattern.compile(plan.regex)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.StringType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a string input, got $t")
    }
  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ts_canon"

  /** Spark-`lpad` semantics: left-pad with '0' to width w, TRUNCATING
    * to the first w chars when longer (lpad('1234',2)='12'). */
  private def lpad0(s: String, w: Int): String =
    if (s.length >= w) s.substring(0, w)
    else ("0" * (w - s.length)) + s

  def compute(input: UTF8String): UTF8String = {
    val s = input.toString
    val m = pattern.matcher(s)
    if (!m.find()) return null // the rlike guard of the extract form
    // regexp_extract semantics: a non-participating group reads as ""
    def g(i: Int): String = {
      val v = m.group(i); if (v == null) "" else v
    }
    // coalesce(cast(nullif(g,'') as bigint), dflt): captures are
    // sign/digit-only by construction, so parseLong is the cast
    def num(gOpt: Option[Int], dflt: Long): Long = gOpt match {
      case None => dflt
      case Some(i) =>
        val v = g(i)
        if (v.isEmpty) dflt else java.lang.Long.parseLong(v)
    }
    val year: Long = plan.yearG match {
      case Some((gi, true)) => // 1-3 digit years pivot (adjustYearTo2020)
        val v = g(gi)
        if (v.isEmpty) 0L
        else {
          val i = java.lang.Long.parseLong(v)
          if (i < 70) i + 2000
          else if (i < 100) i + 1900
          else if (i < 520) i + 2000
          else i + 1000
        }
      case other => num(other.map(_._1), 0L)
    }
    val month: Long = plan.monthG match {
      case Some((gi, true)) => // month NAME: 3-letter prefix lookup
        val v = g(gi)
        if (v.isEmpty) 1L
        else if (v.length < 3) 0L
        else {
          val pool = "janfebmaraprmayjunjulaugsepoctnovdec"
          val instr = pool.indexOf(
            v.substring(0, 3).toLowerCase(java.util.Locale.ROOT)) + 1
          // ((instr + 2) / 3).cast(bigint): double division truncated
          ((instr + 2).toDouble / 3.0).toLong
        }
      case other => num(other.map(_._1), 1L)
    }
    val hourRaw = num(plan.hourG, 0L)
    val hour: Long = plan.merG match {
      case None => hourRaw
      case Some(gi) =>
        val mer = g(gi).replace(".", "").toUpperCase(java.util.Locale.ROOT)
        if (mer.isEmpty) hourRaw
        else if (mer == "PM" && hourRaw < 12) hourRaw + 12
        else if (mer != "PM" && hourRaw == 12) 0L
        else hourRaw
    }
    val fracNs = num(plan.msG, 0L) * 1000000L +
      num(plan.usG, 0L) * 1000L + num(plan.nsG, 0L)
    val tz: String = plan.tzG match {
      case None => "+00:00"
      case Some((gi, true)) => // Z | ±HH | ±HH:MM | ±HHMM
        val v = g(gi)
        if (v.isEmpty || v.equalsIgnoreCase("z")) "+00:00"
        else if (v.length == 3) v + ":00"
        else if (v.length == 5)
          v.substring(0, 3) + ":" + v.substring(3, 5)
        else v
      case Some((gi, false)) => // TZH: signed hour
        val v = g(gi)
        if (v.isEmpty) "+00:00"
        else if (v.startsWith("-"))
          "-" + lpad0(v.substring(1), 2) + ":00"
        else if (v.startsWith("+"))
          "+" + lpad0(v.substring(1), 2) + ":00"
        else "+" + lpad0(v, 2) + ":00"
    }
    val sb = new java.lang.StringBuilder(34)
    sb.append(lpad0(year.toString, 4)).append('-')
      .append(lpad0(month.toString, 2)).append('-')
      .append(lpad0(num(plan.dayG, 1L).toString, 2)).append(' ')
      .append(lpad0(hour.toString, 2)).append(':')
      .append(lpad0(num(plan.minG, 0L).toString, 2)).append(':')
      .append(lpad0(num(plan.secG, 0L).toString, 2)).append('.')
      .append(lpad0(fracNs.toString, 9)).append(tz)
    UTF8String.fromString(sb.toString)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    // top-level class, so the binary name is valid Java source for the
    // reference slot's declared type
    val ref = ctx.addReferenceObj("graftTsCanon", this,
      classOf[CanonicalTsString].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = $ref.compute($c);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
