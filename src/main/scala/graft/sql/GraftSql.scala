package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{FillOps, TimeOps}

/** TDengine-dialect SQL front end (SURVEY §7.1 module 9): parses the
  * dialect's signature clauses — PARTITION BY, INTERVAL(d[,o])
  * SLIDING(s), SESSION(ts,gap), STATE_WINDOW(col), COUNT_WINDOW(n),
  * EVENT_WINDOW START WITH … END WITH …, FILL(mode[,v]), SLIMIT — and
  * lowers them onto the DataFrame operator layer (TimeOps / FillOps),
  * delegating every scalar/aggregate expression leaf to Spark SQL's
  * own parser via `expr()`. TDengine-only functions are rewritten to
  * their Spark lowerings first (first/last → min_by/max_by on the ts
  * key; sum/avg → exact-decimal forms so results are deterministic).
  *
  * The FROM clause accepts a bare table or the dialect's join forms
  * (sql.y:2726-2804): `a ASOF JOIN b ON … [JLIMIT n]`, `a WINDOW JOIN
  * b WINDOW_OFFSET(lo,hi) [ON …]`, and plain `a [INNER|LEFT] JOIN b ON
  * …` — all lowered onto [[graft.ops.JoinOps]] / `DataFrame.join`,
  * with right payload columns surfaced as `r_<col>`.
  *
  * Scope notes: join ON conditions are same-name equi keys plus (for
  * ASOF) one ts condition; `FROM ( <query> ) [alias]` recurses the
  * full dialect (sql.y:3095-3100), with the alias ignored — a subquery
  * as one SIDE of a join still goes through the DataFrame API. FILL
  * needs a literal `ts >= a AND ts < b` range in WHERE (the
  * reference likewise only fills inside the query range) and exactly
  * one filled value column; HAVING/ORDER BY reference output aliases.
  */
object GraftSql {

  // monotone id for chainedJoinSql's synthetic temp-view names — keeps
  // concurrent chained-join queries on one session from colliding
  private val chainSeq = new java.util.concurrent.atomic.AtomicLong(0)

  // ---------------------------------------------------------------- durations
  // b = nanoseconds (taosParseTime unit table; ttime.c TIME_UNIT_NANO)
  private val unitNs = Map("b" -> 1L, "u" -> 1000L, "a" -> 1000000L,
    "s" -> 1000000000L, "m" -> 60000000000L, "h" -> 3600000000000L,
    "d" -> 86400000000000L, "w" -> 604800000000000L)

  /** "10m" → ticks of the table's precision (`perSecond` ticks/second —
    * the reference's per-database PRECISION ms/us/ns, sql.y:923). Bare
    * integers are already native ticks. A duration finer than the
    * precision can represent ("500u" on a ms table) fails loudly
    * rather than silently truncating. */
  def durNative(s: String, perSecond: Long): Long = {
    // quoted form: INTERVAL('1s') etc. (24-distinguished.md — "time
    // units in string form")
    val t = s.trim.stripPrefix("'").stripSuffix("'").trim.toLowerCase
    val m = "^(\\d+)([buasmhdw]?)$".r
    t match {
      case m(n, "") => n.toLong
      case m(n, u) =>
        val ns = n.toLong * unitNs(u)
        val div = 1000000000L / perSecond
        require(ns % div == 0,
          s"duration $s is finer than the table's precision " +
            s"($perSecond ticks/s)")
        ns / div
      case _ => throw new IllegalArgumentException(s"bad duration: $s")
    }
  }

  /** "10m" → microseconds (the default table precision). */
  def durUs(s: String): Long = durNative(s, 1000000L)

  // ------------------------------------------------------------ clause split

  /** Positions of top-level (depth-0, unquoted) occurrences of `kw`. */
  private def topLevelIndex(upper: String, kw: String): Option[Int] = {
    var depth = 0; var i = 0; var inStr = false
    while (i < upper.length) {
      val c = upper(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ =>
          if (depth == 0 && upper.startsWith(kw, i) &&
              (i == 0 || !upper(i - 1).isLetterOrDigit && upper(i - 1) != '_') &&
              (i + kw.length == upper.length ||
                !upper(i + kw.length).isLetterOrDigit &&
                upper(i + kw.length) != '_'))
            return Some(i)
      }
      i += 1
    }
    None
  }

  /** True when `s` contains a comparison operator (=, <, >, !=, <=, >=,
    * <>) at paren depth 0 outside string literals — used to reject an
    * IN-subquery lhs that is itself a predicate. */
  private def hasTopLevelComparison(s: String): Boolean = {
    var depth = 0; var i = 0; var inStr = false
    while (i < s.length) {
      val c = s(i)
      if (inStr) { if (c == '\'') inStr = false }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1
        case '=' | '<' | '>' if depth == 0 => return true
        case '!' if depth == 0 && i + 1 < s.length && s(i + 1) == '=' =>
          return true
        case _ =>
      }
      i += 1
    }
    false
  }

  private val clauseKws = Seq("SELECT", "FROM", "WHERE", "PARTITION BY",
    "INTERVAL", "SLIDING", "SESSION", "STATE_WINDOW", "COUNT_WINDOW",
    "EVENT_WINDOW", "ANOMALY_WINDOW", "EXTERNAL_WINDOW",
    "EXTEND", "ZEROTH_STATE",
    "TRUE_FOR", "RANGE", "EVERY", "FILL", "SURROUND",
    "GROUP BY", "HAVING", "ORDER BY", "SLIMIT", "SOFFSET", "LIMIT",
    "OFFSET")

  /** sql → map(keyword → clause text after the keyword). */
  private def clauses(sql: String): Map[String, String] = {
    val norm = sql.replaceAll("\\s+", " ").trim
    val upper = norm.toUpperCase
    val found = clauseKws.flatMap(k =>
      topLevelIndex(upper, k).map(i => (k, i))).sortBy(_._2)
    found.zipWithIndex.map { case ((k, i), idx) =>
      val end = if (idx + 1 < found.length) found(idx + 1)._2 else norm.length
      k -> norm.substring(i + k.length, end).trim
    }.toMap
  }

  /** Pull `lhs [NOT] IN (SELECT …)` conjuncts out of a WHERE clause
    * (parTranslater.c translates these to semi/anti joins; Spark's
    * `expr()` can't host a correlated list). Returns (plain conjuncts,
    * (lhsExpr, negated, subquerySql) triples). Only top-level AND
    * conjunction is rewritten — an OR over an IN-subquery stays
    * unsupported, loudly. `BETWEEN a AND b` pieces are re-merged after
    * the AND split so their inner AND survives. */
  private def whereInSubqueries(w: String)
      : (Seq[String], Seq[(String, Boolean, String)]) = {
    val inSub = "(?i)^(.+?)\\s+(NOT\\s+)?IN\\s*\\(\\s*SELECT\\b".r
    if (inSub.findFirstIn(w.trim).isEmpty &&
        !w.toUpperCase.contains("( SELECT") &&
        !w.toUpperCase.contains("(SELECT")) return (Seq(w), Nil)
    // split top-level ANDs
    var pieces = Seq.newBuilder[String]
    var rest = w.trim
    var more = true
    while (more) topLevelIndex(rest.toUpperCase, "AND") match {
      case Some(i) =>
        pieces += rest.substring(0, i).trim
        rest = rest.substring(i + 3).trim
      case None => pieces += rest; more = false
    }
    // re-merge BETWEEN … AND …
    val merged = pieces.result().foldLeft(Vector.empty[String]) {
      case (acc, p) =>
        val needsMerge = acc.nonEmpty && {
          val prevUp = acc.last.toUpperCase
          topLevelIndex(prevUp, "BETWEEN").isDefined &&
            topLevelIndex(prevUp, "AND").isEmpty
        }
        if (needsMerge) acc.init :+ (acc.last + " AND " + p) else acc :+ p
    }
    val plain = Seq.newBuilder[String]
    val subs = Seq.newBuilder[(String, Boolean, String)]
    merged.foreach { p =>
      inSub.findFirstMatchIn(p) match {
        case Some(m) if p.trim.endsWith(")") =>
          val lhs = m.group(1).trim
          // the non-greedy lhs regex would happily swallow an OR/NOT
          // disjunct (`a = 1 OR b IN (SELECT…)` → lhs "a = 1 OR b"),
          // turning an unsupported shape into a silently-wrong
          // semi-join — fail loudly instead (only top-level AND
          // conjunction over IN-subqueries is supported)
          val lhsUp = lhs.toUpperCase
          require(Seq("OR", "NOT").forall(k =>
            topLevelIndex(lhsUp, k).isEmpty) &&
            !hasTopLevelComparison(lhs),
            s"IN-subquery under OR/NOT/comparison is unsupported: $p")
          val at = p.indexOf('(', m.group(1).length)
          // body = text inside the outermost paren group
          val body = p.substring(at + 1, p.lastIndexOf(')')).trim
          subs += ((lhs, m.group(2) != null, body))
        case _ => plain += p
      }
    }
    (plain.result(), subs.result())
  }

  /** The reference rejects ANY correlated reference inside an
    * IN/quantified subquery ("Not supported subquery as expr",
    * ans/test_in_sub_query2.2.csv, ans/test_quantified_sub_query4.2
    * .csv — every correlatedSqls entry errors) — a qualifier naming
    * an OUTER table/alias that is not also a table of the subquery's
    * own FROM clause must fail loudly rather than silently resolve
    * as if unqualified. */
  private def assertUncorrelated(subSql: String,
      outerFrom: String): Unit = {
    val kw = Set("as", "join", "on", "inner", "left", "right", "full",
      "outer", "asof", "window", "and", "or", "select", "from", "where")
    val outer = "[A-Za-z_]\\w*".r.findAllIn(
        outerFrom.replaceAll("'(?:[^']|'')*'", " "))
      .map(_.toLowerCase).filterNot(kw).toSet
    val maskedSub = subSql.replaceAll("'(?:[^']|'')*'", " ")
    // the subquery's own FROM segment legitimises its own qualifiers
    val own: Set[String] =
      topLevelIndex(maskedSub.toUpperCase, "FROM") match {
        case Some(i) =>
          val tail = maskedSub.substring(i + 4)
          val stops = Seq("WHERE", "GROUP", "PARTITION", "ORDER",
            "LIMIT", "HAVING", "INTERVAL", "SESSION", "STATE_WINDOW",
            "COUNT_WINDOW", "EVENT_WINDOW", "SLIMIT", "FILL")
          val end = stops.flatMap(k => topLevelIndex(tail.toUpperCase, k))
            .reduceOption(_ min _).getOrElse(tail.length)
          "[A-Za-z_]\\w*".r.findAllIn(tail.substring(0, end))
            .map(_.toLowerCase).toSet
        case None => Set.empty
      }
    "\\b([A-Za-z_]\\w*)\\s*\\.\\s*[A-Za-z_]".r.findAllMatchIn(maskedSub)
      .foreach { m =>
        val q = m.group(1).toLowerCase
        require(!outer.contains(q) || own.contains(q),
          "Not supported subquery as expr (correlated reference " +
            s"$q.… inside an IN-subquery): $subSql")
      }
  }

  /** TDengine's regex operators (sql.y operator grammar; filter.c
    * regex eval): `col MATCH 'pat'` → Spark `RLIKE`, `col NMATCH
    * 'pat'` → `NOT … RLIKE` (NOT binds tighter than AND/OR, so the
    * inline negation is safe inside a conjunct). Both engines speak
    * POSIX-extended-compatible regex for the patterns these ops see. */
  private def rewriteRegexOps(p: String): String = {
    import java.util.regex.Matcher.quoteReplacement
    val lhs = "([A-Za-z_][A-Za-z0-9_]*)"
    val pat = "('(?:[^']|'')*')"
    val m = s"(?i)\\b$lhs\\s+MATCH\\s+$pat".r
    val n = s"(?i)\\b$lhs\\s+NMATCH\\s+$pat".r
    m.replaceAllIn(
      n.replaceAllIn(p, x =>
        quoteReplacement(s"NOT ${x.group(1)} RLIKE ${x.group(2)}")),
      x => quoteReplacement(s"${x.group(1)} RLIKE ${x.group(2)}"))
  }

  /** Replace every `(SELECT …)` group in a predicate with its computed
    * scalar literal (sql.y:3095 scalar subquery; the reference's
    * planner evaluates these as uncorrelated one-row subplans). The
    * subquery must return exactly one row and one column — a
    * broadcast-sized value, so inlining it as a literal is the same
    * plan the reference builds, with Catalyst then free to push the
    * folded predicate into the scan. */
  /** `[NOT] EXISTS (SELECT …)` (21-operators.md rows 17-18, 3.4.1.0):
    * uncorrelated existence test — the subquery evaluates once
    * (limit 1) and the predicate folds to a boolean literal, the same
    * one-row-subplan shape as the scalar-subquery inlining below. */
  private def inlineExistsSubqueries(spark: SparkSession,
      resolve: String => DataFrame, pred: String, tsCol: String,
      perSecond: Long): String = {
    val ex = "(?i)\\b(NOT\\s+)?EXISTS\\s*\\(\\s*SELECT\\b".r
    var p = pred
    var m = ex.findFirstMatchIn(p)
    while (m.isDefined) {
      val at = m.get.start
      val negated = m.get.group(1) != null
      val parenAt = p.indexOf('(', at)
      var depth = 0; var inStr = false; var close = -1; var i = parenAt
      while (close < 0 && i < p.length) {
        val ch = p(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, s"unbalanced EXISTS subquery in: $pred")
      val sub = p.substring(parenAt + 1, close).trim
      val nonEmpty =
        query(spark, resolve, sub, tsCol, perSecond).limit(1).count() > 0
      val lit = if (nonEmpty != negated) "true" else "false"
      p = p.substring(0, at) + lit + p.substring(close + 1)
      m = ex.findFirstMatchIn(p)
    }
    p
  }

  private def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case other => other.toString
  }

  /** Quantified subquery comparisons `lhs <op> ANY|SOME|ALL (SELECT …)`
    * (test_quantified_sub3/4.py; sql.y quantified comparison, 3.4.x).
    * `= ANY` / `<> ALL` were rewritten to IN / NOT IN upstream; the
    * ordering forms fold against the subquery's min/max — one
    * driver-side aggregate row, never the value list — with SQL
    * three-valued logic preserved via an explicit NULL term:
    * `x > ANY(s)` ⟺ x > min(s) [else UNKNOWN if s has NULLs],
    * `x > ALL(s)` ⟺ x > max(s) [AND UNKNOWN if NULLs],
    * `x = ALL(s)` ⟺ x = min(s) AND x = max(s),
    * `x <> ANY(s)` ⟺ NOT(x = min(s) AND x = max(s)). Empty set:
    * ANY → FALSE, ALL → TRUE. */
  private def rewriteQuantifiedSubqueries(spark: SparkSession,
      resolve: String => DataFrame, pred: String, tsCol: String,
      perSecond: Long): String = {
    val re = ("(?i)(=|<>|!=|>=|<=|>|<)\\s*(ANY|SOME|ALL)" +
      "\\s*\\(\\s*SELECT\\b").r
    var p = pred
    var m = re.findFirstMatchIn(p)
    while (m.isDefined) {
      val op0 = m.get.group(1)
      val quant = m.get.group(2).toUpperCase
      val parenAt = p.indexOf('(', m.get.start + op0.length)
      var depth = 0; var inStr = false; var close = -1; var i = parenAt
      while (close < 0 && i < p.length) {
        val ch = p(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, s"unbalanced quantified subquery in: $pred")
      val lhs = p.substring(0, m.get.start).trim
      require(lhs.nonEmpty && p.substring(close + 1).trim.isEmpty &&
        Seq("AND", "OR", "NOT").forall(k =>
          topLevelIndex(lhs.toUpperCase, k).isEmpty),
        s"quantified subquery must be a whole conjunct: $pred")
      val sub = query(spark, resolve, p.substring(parenAt + 1, close)
        .trim, tsCol, perSecond)
      val kc = sub.columns.head
      require(sub.columns.length == 1,
        s"quantified subquery must select one column: $pred")
      val st = sub.agg(min(col(kc)), max(col(kc)), count(lit(1)),
        count(col(kc))).collect().head
      val (mn, mx) = (sqlLit(st.get(0)), sqlLit(st.get(1)))
      val (cnt, cntNN) = (st.getLong(2), st.getLong(3))
      val hasNull = cnt > cntNN
      val nullB = "CAST(NULL AS BOOLEAN)"
      val isAny = quant != "ALL"
      val op = if (op0 == "!=") "<>" else op0
      val folded: String =
        if (cnt == 0) { if (isAny) "1=2" else "1=1" }
        else if (cntNN == 0) nullB
        else op match {
          case ">" | ">=" | "<" | "<=" =>
            val bound =
              if (isAny == (op == ">" || op == ">=")) mn else mx
            val base = s"(($lhs) $op $bound)"
            if (!hasNull) base
            else if (isAny) s"($base OR $nullB)"
            else s"($base AND $nullB)"
          case "=" if !isAny => // = ALL
            val base = s"((($lhs) = $mn) AND (($lhs) = $mx))"
            if (hasNull) s"($base AND $nullB)" else base
          case "<>" if isAny => // <> ANY
            val base = s"(NOT ((($lhs) = $mn) AND (($lhs) = $mx)))"
            if (hasNull) s"($base OR $nullB)" else base
          case other => throw new IllegalArgumentException(
            s"unsupported quantified comparison: $other $quant")
        }
      p = s"($folded)"
      m = re.findFirstMatchIn(p)
      require(m.isEmpty, s"nested quantified subquery in: $pred")
    }
    p
  }

  private def inlineScalarSubqueries(spark: SparkSession,
      resolve: String => DataFrame, pred: String, tsCol: String,
      perSecond: Long): String = {
    val open = "(?i)\\(\\s*SELECT\\b".r
    var p = pred
    var m = open.findFirstMatchIn(p)
    while (m.isDefined) {
      val at = m.get.start
      // matching close paren, string-aware
      var depth = 0; var inStr = false; var close = -1; var i = at
      while (close < 0 && i < p.length) {
        val ch = p(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, s"unbalanced scalar subquery in: $pred")
      val rows = query(spark, resolve, p.substring(at + 1, close).trim,
        tsCol, perSecond).collect()
      require(rows.length == 1 && rows.head.length == 1,
        s"scalar subquery must return 1 row x 1 column: $pred")
      val lit = rows.head.get(0) match {
        case null => "NULL"
        case s: String => "'" + s.replace("'", "''") + "'"
        case v => v.toString
      }
      p = p.substring(0, at) + lit + p.substring(close + 1)
      m = open.findFirstMatchIn(p)
    }
    p
  }

  /** True when the select-items text carries a scalar subquery whose
    * body references a qualifier OUTSIDE its own FROM tables/aliases —
    * the correlated form the DataFrame-building pipeline cannot lower
    * (the uncorrelated form collects once; see scalar-subquery
    * handling above). */
  private def hasCorrelatedScalarSub(selectTxt: String): Boolean = {
    val open = "(?i)\\(\\s*select\\b".r
    var from = 0
    while (from < selectTxt.length) {
      val next = open.findFirstMatchIn(selectTxt.substring(from))
      if (next.isEmpty) return false
      val at = from + next.get.start
      var depth = 0; var inStr = false; var close = -1; var i = at
      while (close < 0 && i < selectTxt.length) {
        val ch = selectTxt(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) return false
      val body = selectTxt.substring(at + 1, close)
      val own = ("(?i)\\b(?:from|join)\\s+([A-Za-z_][\\w.]*)" +
        "(?:\\s+(?:as\\s+)?([A-Za-z_]\\w*))?").r
        .findAllMatchIn(body).flatMap(mm =>
          Seq(Option(mm.group(1)), Option(mm.group(2))).flatten)
        .flatMap(t => Seq(t, t.substring(t.indexOf('.') + 1)))
        .map(_.toLowerCase).toSet
      val quals = "([A-Za-z_]\\w*)\\.[A-Za-z_]\\w*".r
        .findAllMatchIn(body.replaceAll("'[^']*'", ""))
        .map(_.group(1).toLowerCase).toSet
      if ((quals -- own).nonEmpty) return true
      from = close + 1
    }
    false
  }

  /** Lowers a correlated-subquery statement through spark.sql: every
    * FROM/JOIN table registers as a temp view, dialect scalar
    * functions rewrite, the statement runs verbatim. Narrow by design:
    * only the correlated select-list pattern routes here. */
  private def correlatedRoute(spark: SparkSession,
      resolve: String => DataFrame, sqlR: String, tsCol: String,
      perSecond: Long): DataFrame = {
    var text = sqlR
    val tables = ("(?i)\\b(?:from|join)\\s+([A-Za-z_][\\w.]*)").r
      .findAllMatchIn(sqlR).map(_.group(1)).toSeq.distinct
    tables.foreach { t =>
      val view = t.replace('.', '_') + "_gcv"
      resolve(t).createOrReplaceTempView(view)
      text = ("(?i)\\b(from|join)\\s+" +
        java.util.regex.Pattern.quote(t) + "(?![\\w.])").r
        .replaceAllIn(text, "$1 " + view)
      // qualified column refs through the ORIGINAL table name
      // re-point at the view (alias-qualified refs stay)
      text = ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(t) +
        "\\.(?=[A-Za-z_])").r.replaceAllIn(text, view + ".")
    }
    spark.sql(rewriteFuncs(text, tsCol, perSecond))
  }

  /** Split on top-level commas. */
  private[sql] def splitArgs(s: String): Seq[String] = {
    var depth = 0; var inStr = false; val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inStr) {
        cur += c
        // backslash escapes the next char inside a literal ('a\'b')
        if (c == '\\' && i + 1 < s.length) { i += 1; cur += s(i) }
        else if (c == '\'') inStr = false
      }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private[sql] def stripOuterParens(s: String): String = {
    val t = s.trim
    if (t.startsWith("(") && t.endsWith(")")) t.substring(1, t.length - 1)
    else t
  }

  /** Evaluate one FILL(VALUE …) entry to a constant double (None =
    * NULL). The reference folds constant arithmetic at parse time and
    * coerces non-numeric operands C-style: booleans → 1/0, strings →
    * their longest leading numeric prefix, else 0 (taosStr2Double;
    * exercised by fill suites with `fill(value, 1 + 2)`,
    * `fill(value, 'abc')`, `fill(value, true)`). Identifiers and any
    * other non-constant input stay loud rejects, matching the
    * reference's parse errors. */
  private[graft] def fillConst(raw: String): Option[Double] = {
    val s = raw.trim
    var i = 0
    def fail(msg: String): Nothing = throw new IllegalArgumentException(
      s"FILL(VALUE…) literals must be constant: $msg in '$raw'")
    def ws(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    val numRe = "(\\d+(\\.\\d*)?|\\.\\d+)([eE][-+]?\\d+)?".r
    val prefixRe = "[-+]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][-+]?\\d+)?".r
    def atom(): Option[Double] = {
      ws()
      if (i >= s.length) fail("unexpected end")
      s(i) match {
        case '(' =>
          i += 1; val v = expr(); ws()
          if (i >= s.length || s(i) != ')') fail("missing )")
          i += 1; v
        case q @ ('\'' | '"') =>
          val j = s.indexOf(q, i + 1)
          if (j < 0) fail("unterminated string")
          val body = s.substring(i + 1, j).trim; i = j + 1
          Some(prefixRe.findPrefixOf(body).map(_.toDouble).getOrElse(0.0))
        case c if c.isDigit || c == '.' =>
          val m = numRe.findPrefixOf(s.substring(i))
            .getOrElse(fail("bad number"))
          i += m.length; Some(m.toDouble)
        case c if c.isLetter =>
          val st = i
          while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_'))
            i += 1
          s.substring(st, i).toLowerCase match {
            case "true" => Some(1.0)
            case "false" => Some(0.0)
            case "null" => None
            case w => fail(s"not a constant: $w")
          }
        case c => fail(s"unexpected '$c'")
      }
    }
    def unary(): Option[Double] = {
      ws()
      if (i < s.length && (s(i) == '-' || s(i) == '+')) {
        val neg = s(i) == '-'; i += 1
        unary().map(v => if (neg) -v else v)
      } else atom()
    }
    def term(): Option[Double] = {
      var v = unary(); ws()
      while (i < s.length && "*/%".indexOf(s(i)) >= 0) {
        val op = s(i); i += 1; val r = unary()
        v = for (a <- v; b <- r) yield op match {
          case '*' => a * b
          case '/' => a / b
          case _ => a % b
        }
        ws()
      }
      v
    }
    def expr(): Option[Double] = {
      var v = term(); ws()
      while (i < s.length && (s(i) == '+' || s(i) == '-')) {
        val op = s(i); i += 1; val r = term()
        v = for (a <- v; b <- r)
          yield if (op == '+') a + b else a - b
        ws()
      }
      v
    }
    val v = expr(); ws()
    if (i < s.length) fail(s"trailing input at '${s.substring(i)}'")
    v
  }

  // -------------------------------------------------- function rewrites

  /** Rewrite one TDengine call `name(args)` everywhere in `e` via
    * `build(args)` — with real paren matching, not regex. Whitespace
    * between the name and `(` is legal SQL (`sum ( value )`); missing
    * it here would silently skip the rewrite and change semantics
    * (caught by DialectFuzzSpec's ws mutations). */
  private def rewriteCall(e: String, name: String,
      build: String => String): String = {
    val lower = e.toLowerCase
    val n = name.toLowerCase
    var at = lower.indexOf(n)
    while (at >= 0) {
      val boundary = at == 0 ||
        (!lower(at - 1).isLetterOrDigit && lower(at - 1) != '_')
      var open = at + n.length
      while (open < e.length && e(open) == ' ') open += 1
      if (boundary && open < e.length && e(open) == '(') {
        var depth = 0; var i = open
        var end = -1
        while (end < 0 && i < e.length) {
          e(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) end = i
            case _ =>
          }
          i += 1
        }
        require(end >= 0,
          s"unbalanced parentheses in call to $name: ${e.substring(at)}")
        val args = e.substring(open + 1, end)
        return e.substring(0, at) + build(args) +
          rewriteCall(e.substring(end + 1), name, build)
      }
      at = lower.indexOf(n, at + 1)
    }
    e
  }

  /** `'fmt'` argument literal → raw string. TDengine also accepts
    * DOUBLE-quoted string literals (identifiers use backticks), so
    * `statecount(v, "GT", 0)` is legal text. */
  private def unquote(s: String): String = {
    val t = s.trim
    require(t.length >= 2 &&
      ((t.head == '\'' && t.last == '\'') ||
        (t.head == '"' && t.last == '"')),
      s"expected a string literal, got: $s")
    if (t.head == '"') t.substring(1, t.length - 1).replace("\"\"", "\"")
    else t.substring(1, t.length - 1).replace("''", "'")
  }

  /** Runs a textual rewrite with quoted string literals masked out, so
    * a regex-based rewrite can never fire inside user string data
    * (e.g. `WHERE note = 'db.tbl.x'` or a 20-digit run inside a quoted
    * string). Masks both quote styles; placeholders are control-char
    * delimited so they can't collide with SQL text. */
  private def maskingLiterals(s: String)(f: String => String): String = {
    val lits = scala.collection.mutable.ArrayBuffer[String]()
    val masked = "'(?:[^']|'')*'|\"(?:[^\"]|\"\")*\"".r
      .replaceAllIn(s, m => {
        lits += m.matched
        java.util.regex.Matcher
          .quoteReplacement(s"${lits.length - 1}")
      })
    val out = f(masked)
    "(\\d+)".r.replaceAllIn(out, m =>
      java.util.regex.Matcher.quoteReplacement(lits(m.group(1).toInt)))
  }

  /** Columns `*` expands to: regular columns (plus tags on STABLE
    * reads) — internal `_` columns and star-hidden fields (subtable
    * tags, tbname) stay out (20-select.md:183 wildcard rules). */
  private def starCols(df: DataFrame): Seq[String] =
    df.schema.fields.filterNot(f => f.name.startsWith("_") ||
      f.metadata.contains("graft.star_hidden")).map(_.name).toSeq

  /** Timezone arguments get re-embedded verbatim into generated SQL
    * string literals; unquote's `''` handling means user text could
    * smuggle a quote (and thus expression text) into the query.
    * Whitelist instead of escaping — every legal IANA name or fixed
    * offset matches, anything else fails loudly. */
  private def tzSafe(z: String): String = {
    require(z.matches("[A-Za-z0-9_/+:-]*"),
      s"unsupported timezone spelling: $z")
    z
  }

  /** `cols(selectFunc(x), out1 [AS a1], out2…)` (builtins.c:6831;
    * parTranslater.c:11820 rewriteColsFunction): every output
    * expression is evaluated at the single row the selection function
    * picks, which the reference rewrites to per-output "select value"
    * aggregates. The Spark lowering is `max_by`/`min_by` with the
    * selector (or the timestamp, for first/last/last_row) as the
    * ordering key — one hash aggregate, no self-join. Expands in place
    * to a comma-joined item list, so one `cols()` yields N select
    * items exactly as the reference's projection-bind list does. */
  private def expandColsArgs(a: String, tsCol: String,
      tableCols: Seq[String],
      modeCountCol: String => String): String = {
    val parts = splitArgs(a)
    require(parts.length >= 2, s"cols() needs a selector and outputs: $a")
    val selPat = "(?i)^(max|min|first|last|last_row|mode)\\s*\\((.+)\\)$".r
    val (fn, sx) = parts.head.trim match {
      case selPat(f, x) => (f.toLowerCase, x.trim)
      case other => throw new IllegalArgumentException(
        s"cols() selector must be max/min/first/last/last_row/mode: " +
          other)
    }
    val asPat = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    // bare-space alias form (`c0 cc`, sql.y column_alias without AS):
    // the trailing token aliases when what precedes is a bare column
    val spacePat = "^([A-Za-z_]\\w*)\\s+([A-Za-z_]\\w*)$".r
    // `cols(last(ts), *)` takes every table column from the selected
    // row, each under its own name (rewriteColsFunction expands the
    // star before binding)
    val outs = parts.tail.flatMap { out =>
      if (out.trim == "*") tableCols else Seq(out)
    }
    val seen = scala.collection.mutable.HashSet[String]()
    outs.zipWithIndex.map { case (out, oi) =>
      val (e, alias) = out.trim match {
        case asPat(e0, al) => (e0.trim, Some(al))
        case spacePat(e0, al) => (e0, Some(al))
        case e0 => (e0.trim, None)
      }
      val agg = fn match {
        case "max" => s"max_by($e, $sx)"
        case "min" => s"min_by($e, $sx)"
        // first/last skip NULL selector rows (builtins.c firstFunction
        // semantics); a NULL ordering key is ignored by min_by/max_by
        case "first" =>
          s"min_by($e, CASE WHEN ($sx) IS NOT NULL THEN $tsCol END)"
        case "last" =>
          s"max_by($e, CASE WHEN ($sx) IS NOT NULL THEN $tsCol END)"
        case "last_row" => s"max_by($e, $tsCol)"
        // mode is a selection function (builtins.c:4495): the output
        // reads from the LAST row carrying the most-frequent selector
        // value (test_fun_select_cols.py:456 `cols(mode(c0), ts as t2,
        // c1 c21) … group by tbname`). A per-(group, value) count
        // window column (created by the caller) makes the pick ONE
        // max_by over a lexicographic (count, value, ts) struct —
        // count desc, ties to the larger value (the sf_mode pin),
        // last occurrence; NULL selector rows are skipped via the
        // NULL ordering key
        case "mode" =>
          val cnt = modeCountCol(sx)
          s"max_by($e, CASE WHEN ($sx) IS NULL THEN NULL ELSE " +
            s"struct(`$cnt`, $sx, $tsCol) END)"
      }
      alias match {
        case Some(al) => s"$agg AS $al"
        case None if e.matches("[A-Za-z_][A-Za-z0-9_]*") =>
          s"$agg AS $e"
        case None =>
          // un-aliased expression outputs auto-name from the
          // expression text (the reference defaults aliasName to the
          // expression's own name; identifier-sanitized here so the
          // name survives every column-reference path). Sanitizing
          // can collide distinct expressions (`length(a)+1` and
          // `length(a)-1` both flatten to `length_a_1`) — a collision
          // gains a positional `_c<i>` suffix instead of emitting an
          // ambiguous duplicate column
          val nm0 = e.replaceAll("[^A-Za-z0-9_]+", "_")
            .replaceAll("^_+|_+$", "")
          val nm1 = if (nm0.isEmpty || nm0.head.isDigit) "_c" + nm0
            else nm0
          val nm = if (seen.add(nm1.toLowerCase)) nm1
            else s"${nm1}_c$oi"
          s"$agg AS $nm"
      }
    }.mkString(", ")
  }

  /** TDengine function surface → Spark SQL, deterministic forms.
    * `perSecond` = the surface's ticks/second (db PRECISION): unit
    * arguments like elapsed's scale relative to it. */
  /** Searched-CASE numeric conditions are truthy when non-zero
    * (test_query_case_when.py:113-163: `case when 1 then`, `case when
    * 1-1 then` → NULL branch, `case when abs(3) then`): wrap a
    * comparison-free WHEN condition as `(cond) <> 0` — Spark's CASE
    * requires a boolean. The simple `CASE expr WHEN v` form matches
    * VALUES, not conditions, and is left untouched; conditions that
    * already contain a comparison/boolean operator (incl. boolean
    * columns spelled `c = true`) pass through. */
  private def rewriteCaseNumericConds(s0: String): String = {
    if (!s0.toUpperCase.contains("CASE")) return s0
    val s = s0
    val up = s.toUpperCase
    def isWordAt(i: Int, w: String): Boolean =
      up.startsWith(w, i) &&
        (i == 0 || !(up(i - 1).isLetterOrDigit || up(i - 1) == '_')) &&
        (i + w.length >= up.length ||
          !(up(i + w.length).isLetterOrDigit || up(i + w.length) == '_'))
    // frames: (isSearched, openWhenStart or -1)
    val stack = scala.collection.mutable.Stack[(Boolean, Int)]()
    val spans = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    var i = 0
    var inStr = false
    while (i < s.length) {
      val ch = s(i)
      if (inStr) { if (ch == '\'') inStr = false; i += 1 }
      else if (ch == '\'') { inStr = true; i += 1 }
      else if (isWordAt(i, "CASE")) {
        var j = i + 4
        while (j < s.length && s(j).isWhitespace) j += 1
        stack.push((isWordAt(j, "WHEN"), -1))
        i += 4
      } else if (isWordAt(i, "WHEN") && stack.nonEmpty) {
        if (stack.top._1)
          stack.push(stack.pop() match { case (f, _) => (f, i + 4) })
        i += 4
      } else if (isWordAt(i, "THEN") && stack.nonEmpty) {
        val (f, st) = stack.pop()
        if (f && st >= 0) spans += ((st, i))
        stack.push((f, -1))
        i += 4
      } else if (isWordAt(i, "END") && stack.nonEmpty) {
        stack.pop(); i += 3
      } else i += 1
    }
    val boolish = ("(?i)=|<|>|!|\\bLIKE\\b|\\bIN\\b|\\bIS\\b|" +
      "\\bBETWEEN\\b|\\bAND\\b|\\bOR\\b|\\bNOT\\b|\\bRLIKE\\b|" +
      "\\bMATCH\\b|\\bNMATCH\\b|\\bEXISTS\\b|\\bTRUE\\b|\\bFALSE\\b").r
    var out = s
    // applied spans shift later offsets; processing by DESCENDING
    // start means every prior application starts at or after this
    // span's start — those inside (a,b) adjust b (nested CASE conds)
    val applied = scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    spans.sortBy(-_._1).foreach { case (a, b) =>
      val bAdj = b +
        applied.filter(p => p._1 >= a && p._1 < b).map(_._2).sum
      val cond = out.substring(a, bAdj)
      val masked = cond.replaceAll("'(?:[^']|'')*'", " ")
      if (boolish.findFirstIn(masked).isEmpty && cond.trim.nonEmpty) {
        val rep = s" (${cond.trim}) <> 0 "
        out = out.substring(0, a) + rep + out.substring(bAdj)
        applied += ((a, rep.length - (bAdj - a)))
      }
    }
    out
  }

  def rewriteFuncs(e: String, tsCol: String,
      perSecond: Long = 1000000L): String = {
    var r = rewriteCaseNumericConds(e)
    // TDengine string types in CAST positions: NCHAR(n)/NCHAR are
    // unicode strings; BINARY(n) is a byte-string the tests treat as
    // text — both lower to Spark varchar/string (Spark's BINARY is
    // raw bytes, a different thing)
    r = r.replaceAll("(?i)\\bnchar\\s*\\(", "varchar(")
    r = r.replaceAll("(?i)\\bAS\\s+nchar\\b", "AS string")
    r = r.replaceAll("(?i)\\bAS\\s+binary\\s*\\(", "AS varchar(")
    // TDengine's BOOL type name in CASTs (tdataformat.h) is BOOLEAN
    // in Spark's parser
    r = r.replaceAll("(?i)\\bAS\\s+bool\\b", "AS boolean")
    // BLOB/MEDIUMBLOB (tdataformat.h blob types) are raw bytes
    r = r.replaceAll("(?i)\\bAS\\s+(?:medium)?blob\\b", "AS binary")
    // length-less VARCHAR in a CAST (legal in the reference, where it
    // defaults) — Spark requires a length, STRING is the same thing
    r = r.replaceAll("(?i)\\bAS\\s+varchar\\b(?!\\s*\\()", "AS string")
    // an integer literal wider than 19 digits overflows DECIMAL(38)
    // in Spark's parser; the reference reads it as a DOUBLE — append
    // an exponent so Spark does too (timestamps max out at 19 digits,
    // so no ts literal can match); literal-masked so a 20-digit run
    // INSIDE a quoted string is never touched
    r = maskingLiterals(r)(_.replaceAll(
      "(?<![\\w.'\"])(\\d{20,}(?:\\.\\d+)?)(?![\\w.])", "$1E0"))
    // PG-token timestamp formatting (ttime.c:2032): the format is a
    // literal, so the whole call lowers to built-ins at plan time
    r = rewriteCall(r, "to_char", a => {
      val parts = splitArgs(a)
      // dialect timestamps are µs bigints; to_char needs TIMESTAMP
      graft.functions.TimeFormat.toCharSql(
        s"timestamp_micros(CAST((${parts(0)}) AS BIGINT))",
        unquote(parts(1)))
    })
    r = rewriteCall(r, "to_timestamp", a => {
      val parts = splitArgs(a)
      if (parts.length < 2) s"to_timestamp($a)"
      else if (!parts(1).trim.startsWith("'") &&
          !parts(1).trim.startsWith("\"")) {
        // per-row format COLUMN (test_fun_sca_to_timestamp.py
        // `to_timestamp(c8, c9)`): the codegen token compiler needs a
        // literal, so translate the Postgres-style tokens to Spark
        // pattern letters rowwise and parse with the native function
        // staged via placeholder chars: SS/MS and HH/HH24 overlap, so
        // the longer tokens park on control chars until the short
        // ones are done (Spark: SS = fraction, not seconds)
        val f = Seq("HH24" -> "", "hh24" -> "",
          "HH12" -> "hh", "hh12" -> "hh", "MS" -> "",
          "ms" -> "", "YYYY" -> "yyyy", "MI" -> "mm",
          "mi" -> "mm", "SS" -> "ss", "HH" -> "hh", "DD" -> "dd",
          "AM" -> "a", "PM" -> "a", "am" -> "a", "pm" -> "a",
          "" -> "SSS", "" -> "HH")
          .foldLeft(s"(${parts(1)})") { case (acc, (t, sp)) =>
            s"replace($acc, '$t', '$sp')" }
        s"to_timestamp((${parts(0)}), $f)"
      } else graft.functions.TimeFormat
        .toTimestampSql(parts(0), unquote(parts(1)))
    })
    // greatest/least defaults (translateGreatestleast, builtins.c:2831;
    // tglobal.c:243-244 tsCompareAsStrInGreatest=true,
    // tsIgnoreNullInGreatest=false):
    //  - a string literal mixing with non-string args compares AS
    //    STRINGS (GTL-CFG-001: greatest(2,'10') = '2') — Spark's own
    //    coercion would compare numerically; cast every arg to string
    //  - any NULL argument makes the result NULL (GTL-IGN-001) —
    //    Spark's greatest/least SKIP nulls; wrap in a null-propagating
    //    CASE. Mixed string COLUMNS (no literal) aren't detectable in
    //    this textual pass and keep Spark's numeric coercion.
    for (fn <- Seq("greatest", "least"))
      r = rewriteCall(r, fn, body => {
        val args = splitArgs(body).map(_.trim)
        if (args.length < 2) s"$fn($body)"
        else {
          val isStrLit = (a: String) => a.matches("'(?:[^']|'')*'")
          val args2 =
            if (args.exists(isStrLit) && !args.forall(isStrLit))
              args.map(a =>
                if (isStrLit(a)) a else s"cast(($a) as string)")
            else args
          val nullCheck =
            args2.map(a => s"($a) IS NULL").mkString(" OR ")
          s"(CASE WHEN $nullCheck THEN NULL ELSE " +
            s"$fn(${args2.mkString(", ")}) END)"
        }
      })
    r = rewriteCall(r, "first", a => s"min_by($a, $tsCol)")
    r = rewriteCall(r, "last_row", a => s"max_by($a, $tsCol)")
    r = rewriteCall(r, "last", a => s"max_by($a, $tsCol)")
    // fill_forward(x) OVER … (builtins.c:8187): last non-null carried
    // forward — emitted AFTER the `last` rewrite so the generated
    // last(x, true) survives untouched; an explicit OVER spec governs
    r = rewriteCall(r, "fill_forward", a => s"last($a, true)")
    r = rewriteCall(r, "spread", a => s"(max($a) - min($a))")
    // percentile(c, p) takes p in 0..100 (builtins.c:3216
    // percentileFunction; Spark's percentile takes a 0..1 fraction);
    // exact, linear interpolation in both engines
    // apercentile(col, p[, 'default'|'t-digest']) (builtins.c:3250):
    // both algo spellings serve the same estimator contract here (the
    // registered mergeable t-digest UDAF) — strip the literal
    r = rewriteCall(r, "apercentile", a => {
      val p = splitArgs(a)
      p.lift(2).map(unquote(_).toLowerCase).foreach(alg =>
        require(alg == "default" || alg == "t-digest",
          s"unknown apercentile algo: $alg"))
      s"apercentile(${p(0)}, ${p(1)})"
    })
    r = rewriteCall(r, "percentile", a => {
      val p = splitArgs(a)
      require(p.length >= 2 && p.length <= 11,
        s"percentile needs (col, p[, p2 …]): $a")
      if (p.length == 2) s"percentile(${p(0)}, (${p(1)}) / 100.0)"
      else {
        // multi-p form returns ONE varchar "[v1, v2, …]" with %.6lf
        // formatting (builtinsimpl.c:2106 percentileFinalize); the
        // fractions must be FOLDABLE for Spark's percentile, so the
        // /100 scaling happens here (the reference requires literal
        // p values too)
        val arr = p.tail.map(x => (x.trim.toDouble / 100.0).toString)
          .mkString("array(", ", ", ")")
        s"concat('[', array_join(transform(percentile(${p(0)}, $arr), " +
          "v -> format_string('%.6f', v)), ', '), ']')"
      }
    })
    // hyperloglog (builtins.c HLL) ≈ Spark's HLL++ estimator — the
    // distinct-count contract, not a bit-identical register layout
    r = rewriteCall(r, "hyperloglog", a => s"approx_count_distinct($a)")
    // TDengine's bare stddev IS population stddev (builtins.c:3038;
    // stddev_samp is the separate :7476 spelling, which passes
    // through — `stddev(` cannot match inside `stddev_samp(`) —
    // Spark's bare stddev is SAMPLE, the silent-wrong-answer trap
    r = rewriteCall(r, "stddev", a => s"stddev_pop($a)")
    // std is an alias of the same POPULATION stddev (builtins.c:7389
    // FUNCTION_TYPE_STDDEV) — Spark's std is SAMPLE, the same silent
    // trap as bare stddev
    r = rewriteCall(r, "std", a => s"stddev_pop($a)")
    // elapsed(ts[, unit]) (builtins.c elapsedFunction): window/group
    // time span in NATIVE ticks, scaled to `unit` ticks (default: db
    // precision). The divisor must be the unit's length in the
    // surface's own precision — durUs would be 1000x off on a ms or
    // ns surface.
    r = rewriteCall(r, "elapsed", a => {
      val p = splitArgs(a)
      val span = s"(max(${p(0)}) - min(${p(0)}))"
      p.lift(1)
        .map(u => s"(CAST($span AS DOUBLE) / ${
          durNative(u.trim, perSecond)})")
        .getOrElse(span)
    })
    // capacity bound, intentional: DECIMAL(18,2) holds |sum| < 10^16.
    // Inputs here are the dialect's metric doubles (2dp, < 10^6), so a
    // group needs ~10^10 rows to saturate — far beyond any per-group
    // cardinality this surface serves. Above it, ANSI-off yields NULL
    // (not a wrong number); spark.sql.ansi.enabled turns it into a
    // runtime error. The exactness (order-independent sums, the reason
    // for the DECIMAL hop) is worth that loud edge.
    r = rewriteCall(r, "sum", a =>
      s"CAST(CAST(sum(CAST(($a) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)")
    r = rewriteCall(r, "avg", a =>
      s"(CAST(CAST(sum(CAST(($a) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) / count($a))")
    rewriteTimeScalars(r)
  }

  /** TDengine time/misc scalars Spark lacks or spells differently
    * (sclfunc.c:4870 timediff, 4076 to_iso8601, 4941 today, 4954
    * timezone, 5044 dayofweek, 5113 week family, 5323 truncate):
    * lowered to Spark built-ins over the dialect's bigint-µs
    * timestamps. Also applied to WHERE conjuncts so now()/today()
    * bounds work in filters. */
  def rewriteTimeScalars(e0: String): String = {
    // literal datetime strings parse via to_timestamp; columns are µs
    def tsUs(x: String): String = {
      val t = x.trim
      if (t.startsWith("'")) s"unix_micros(to_timestamp($t))"
      else s"CAST(($t) AS BIGINT)"
    }
    def asTs(x: String): String = s"timestamp_micros(${tsUs(x)})"
    // reference decimalFn: trunc(x * 10^d) / 10^d, toward zero
    def truncSql(a: String): String = {
      val p = splitArgs(a)
      val d = p.lift(1).map(_.trim.toInt).getOrElse(0)
      require(d >= 0 && d <= 15, s"truncate digits out of range: $a")
      val sc = BigInt(10).pow(d)
      // CAST first: decimal inputs would otherwise keep decimal scale
      val x = s"(CAST((${p(0)}) AS DOUBLE))"
      // divide by a DOUBLE: a bare `$sc.0` literal parses as DECIMAL
      // and would turn the result column decimal-typed
      s"(CASE WHEN $x < 0 THEN -floor(-($x) * $sc) / CAST($sc AS DOUBLE) " +
        s"ELSE floor($x * $sc) / CAST($sc AS DOUBLE) END)"
    }
    var r = e0
    r = rewriteCall(r, "timediff", a => {
      val p = splitArgs(a)
      require(p.length >= 2, s"timediff needs 2+ args: $a")
      val d = s"(${tsUs(p(0))} - ${tsUs(p(1))})"
      if (p.length == 2) d
      else { // C division truncates toward zero; Spark DIV does too,
             // but guard the sign explicitly for clarity with floor-div
             // oracle spellings
        val u = durUs(p(2).trim)
        s"(CASE WHEN $d >= 0 THEN $d DIV $u ELSE -((-$d) DIV $u) END)"
      }
    })
    r = rewriteCall(r, "to_unixtimestamp", a =>
      s"unix_micros(to_timestamp(${splitArgs(a).head}))")
    r = rewriteCall(r, "to_iso8601", a => {
      val p = splitArgs(a)
      val t0 = tsUs(p(0))
      def render(tsExpr: String, suffix: String): String = {
        val t = s"timestamp_micros($tsExpr)"
        s"concat(date_format($t, 'yyyy-MM-dd'), 'T', " +
          s"date_format($t, 'HH:mm:ss.SSSSSS'), $suffix)"
      }
      p.lift(1).map(z => tzSafe(unquote(z))) match {
        case None => render(t0, "'+0000'")
        // z/Z: zero offset, suffix verbatim (sclfunc.c toISO8601)
        case Some(z) if z.equalsIgnoreCase("z") => render(t0, s"'$z'")
        case Some(z0) =>
          // UTC-prefixed fixed offsets normalize by stripping 'UTC'
          // and zero-padding a single-digit hour ('UTC+8' → '+08');
          // bare fixed offsets keep the user's spelling as the suffix
          val z =
            if (z0.toUpperCase.startsWith("UTC+") ||
                z0.toUpperCase.startsWith("UTC-")) {
              val o = z0.substring(3)
              if (o.length == 2 && o(1).isDigit) s"${o(0)}0${o(1)}" else o
            } else if (z0.equalsIgnoreCase("UTC")) "+0000"
            else z0
          "^([+-])(\\d{1,2})(?::?(\\d{2}))?$".r.findFirstMatchIn(z) match {
            case Some(m) =>
              // fixed offset: shift the wall clock, suffix verbatim —
              // '+08:00' shows UTC+8h local time (ISO sign convention)
              val sign = if (m.group(1) == "-") -1L else 1L
              val offUs = sign * (m.group(2).toLong * 3600L +
                Option(m.group(3)).map(_.toLong).getOrElse(0L) * 60L) *
                1000000L
              render(s"(($t0) + ${offUs}L)", s"'$z'")
            case None =>
              // IANA zone: DST-aware local time; suffix = the target
              // instant's actual offset as ±HHMM (+0000 for zero)
              val local =
                s"unix_micros(from_utc_timestamp(timestamp_micros($t0)," +
                  s" '$z'))"
              val off = s"(($local) - ($t0)) DIV 1000000"
              val suffix =
                s"(CASE WHEN $off = 0 THEN '+0000' ELSE concat(" +
                  s"CASE WHEN $off > 0 THEN '+' ELSE '-' END, " +
                  s"lpad(CAST(abs($off) DIV 3600 AS STRING), 2, '0'), " +
                  s"lpad(CAST((abs($off) % 3600) DIV 60 AS STRING), 2, " +
                  s"'0')) END)"
              render(local, suffix)
          }
      }
    })
    // timetruncate(ts, dur[, use_current_timezone | 'tz']) (sclfunc.c
    // timeTruncateFunction): floor to a duration multiple. The third
    // arg is either the use-current-timezone flag (session is UTC, so
    // a no-op) or an explicit timezone string — truncation then
    // happens on that zone's wall clock, DST-aware (taosLocalTime).
    // Calendar units n/q/y truncate to month-grid starts. Week
    // truncation anchors to the Sunday before epoch (1969-12-28,
    // firstDayOfWeek default 0 — sclfunc.c:4839).
    r = rewriteCall(r, "timetruncate", a => {
      val p = splitArgs(a)
      require(p.length >= 2, s"timetruncate needs (ts, duration): $a")
      val t = tsUs(p(0))
      val unit = p(1).trim.stripPrefix("'").stripSuffix("'")
      val tzArg = p.lift(2).map(_.trim)
        .filter(x => x.startsWith("'") || x.startsWith("\""))
        .map(z => tzSafe(unquote(z))).filterNot(_.matches("[01]"))
      val calK = "(?i)^(\\d+)([nqy])$".r.findFirstMatchIn(unit).map(m =>
        m.group(1).toLong * (m.group(2).toLowerCase match {
          case "n" => 1L
          case "q" => 3L
          case _ => 12L
        }))
      (calK, tzArg) match {
        case (Some(k), tz) =>
          val lt = tz match {
            case Some(z) => s"from_utc_timestamp(timestamp_micros($t), '$z')"
            case None => s"timestamp_micros($t)"
          }
          val ms = s"((year($lt) - 1970) * 12 + month($lt) - 1)"
          // pmod, not %: pre-epoch months are negative and Spark's %
          // takes the dividend's sign — `%` would round toward zero
          // (1969-11 with 1q buckets to 1970-01) and feed a negative
          // month into make_timestamp; floorMod matches the Scala-side
          // calendar twins (INTERVAL AUTO, calendar FILL bucketOf)
          val b = s"($ms - pmod($ms, $k))"
          val start = s"make_timestamp(1970 + CAST(" +
            s"($b - pmod($b, 12)) DIV 12 AS INT), " +
            s"CAST(pmod($b, 12) AS INT) + 1, 1, 0, 0, 0)"
          tz match {
            case Some(z) => s"unix_micros(to_utc_timestamp($start, '$z'))"
            case None => s"unix_micros($start)"
          }
        case (None, Some(z)) =>
          val du = durUs(unit)
          val anchor =
            if (unit.toLowerCase.endsWith("w")) -4L * 86400000000L else 0L
          val lt =
            s"unix_micros(from_utc_timestamp(timestamp_micros($t), '$z'))"
          val tr = s"(($lt) - pmod(($lt) - (${anchor}L), $du))"
          s"unix_micros(to_utc_timestamp(timestamp_micros($tr), '$z'))"
        case (None, None) =>
          val du = durUs(unit)
          if (unit.toLowerCase.endsWith("w")) {
            val anchor = -4L * 86400000000L
            s"(($t) - pmod(($t) - ($anchor), $du))"
          } else s"(($t) - pmod(($t), $du))"
      }
    })
    r = rewriteCall(r, "today", _ =>
      "unix_micros(date_trunc('DAY', current_timestamp()))")
    r = rewriteCall(r, "now", _ => "unix_micros(current_timestamp())")
    r = rewriteCall(r, "timezone", _ => "'UTC (UTC, +0000)'")
    // longer names first: their rewritten bodies must not be re-matched
    // by the shorter `week`
    r = rewriteCall(r, "weekofyear", a =>
      s"CAST(weekofyear(${asTs(a)}) AS BIGINT)")
    r = rewriteCall(r, "weekday", a =>
      s"CAST(weekday(${asTs(a)}) AS BIGINT)")
    r = rewriteCall(r, "dayofweek", a =>
      s"CAST(dayofweek(${asTs(a)}) AS BIGINT)")
    r = rewriteCall(r, "week", a => {
      val p = splitArgs(a)
      val mode = p.lift(1).map(_.trim.toInt).getOrElse(0)
      val t = asTs(p(0))
      mode match {
        case 3 => s"CAST(weekofyear($t) AS BIGINT)"
        case 0 =>
          // MySQL WEEK(d,0) (sclfunc.c:5073 calculateWeekNum):
          // Sunday-first, range 0..53; days before the year's first
          // Sunday are week 0
          val fs = s"(1 + (8 - dayofweek(date_trunc('YEAR', $t))) % 7)"
          s"(CASE WHEN dayofyear($t) < $fs THEN CAST(0 AS BIGINT) " +
            s"ELSE CAST((dayofyear($t) - $fs) DIV 7 + 1 AS BIGINT) END)"
        case m if m >= 1 && m <= 7 =>
          // remaining MySQL modes: native WeekNum expression
          // (registered per session by GraftSql.query)
          s"graft_week(${tsUs(p(0))}, $m)"
        case other => throw new IllegalArgumentException(
          s"week(): mode must be 0..7, got $other")
      }
    })
    r = rewriteCall(r, "truncate", truncSql)
    r = rewriteCall(r, "trunc", truncSql)
    // sign (builtins.c signFunction: outputType = inputType; Spark's
    // signum is always DOUBLE — wrong for integral inputs, where the
    // reference returns the integer type). The CASE arithmetic keeps
    // the input's own type: BIGINT→BIGINT, DOUBLE→DOUBLE. (x)-(x) is
    // exactly 0 for any finite input.
    r = rewriteCall(r, "sign", a =>
      s"(CASE WHEN ($a) > 0 THEN (($a) - ($a)) + 1 " +
        s"WHEN ($a) < 0 THEN (($a) - ($a)) - 1 ELSE ($a) - ($a) END)")
    // CHAR(n1[, n2…]) (sclfunc.c charFunction): code points → string
    r = rewriteCall(r, "char", a => splitArgs(a)
      .map(x => s"char(CAST(($x) AS INT))").mkString("concat(", ", ", ")"))
    r = rewriteCall(r, "to_base64", a =>
      s"base64(CAST((${splitArgs(a).head}) AS BINARY))")
    r = rewriteCall(r, "from_base64", a =>
      s"CAST(unbase64(${splitArgs(a).head}) AS STRING)")
    // crc32 (builtins.c:6149; sclfunc.c:2338 — the standard zlib
    // polynomial with ~0 init/final, which is exactly what Spark's
    // crc32 computes; the reference's UINT32 widens to BIGINT here)
    r = rewriteCall(r, "crc32", a =>
      s"crc32(CAST((${splitArgs(a).head}) AS BINARY))")
    // sha / sha1 → hex SHA-1; sha2(expr, bits) (builtins.c:7723-7786)
    r = rewriteCall(r, "sha2", a => { val p = splitArgs(a)
      s"sha2(CAST((${p(0)}) AS BINARY), CAST(${p(1)} AS INT))" })
    r = rewriteCall(r, "sha1", a =>
      s"sha1(CAST((${splitArgs(a).head}) AS BINARY))")
    r = rewriteCall(r, "sha", a =>
      s"sha1(CAST((${splitArgs(a).head}) AS BINARY))")
    // session/system info (builtins.c FUNC_MGT_SYSTEM_INFO_FUNC family).
    // first_day_of_week() reports the session config; the engine pins
    // the reference default 0 = Sunday (tglobal.c:409 tsFirstDayOfWeek).
    r = rewriteCall(r, "first_day_of_week", _ => "CAST(0 AS BIGINT)")
    r = rewriteCall(r, "server_version", _ => "'3.3.6.0'")
    r = rewriteCall(r, "client_version", _ => "'3.3.6.0'")
    // server_status() returns 1 while the server answers at all
    // (qPlan.c SERVER_STATUS; a dead server never returns a row)
    r = rewriteCall(r, "server_status", _ => "CAST(1 AS INT)")
    r = rewriteCall(r, "current_user", _ => "'root'")
    r = rewriteCall(r, "user", _ => "'root'")
    // database(): the catalog front end substitutes its current db
    // before delegating (GraftCatalog.sql); the bare dialect runs with
    // no USE state, where the reference returns the unset default
    r = rewriteCall(r, "database", _ => "'default'")
    // bare `now` / `today` keywords (sql.y NOW/TODAY tokens work with
    // and without parens)
    r = r.replaceAll("(?i)(?<![A-Za-z0-9_'])now(?![A-Za-z0-9_('])",
      "unix_micros(current_timestamp())")
    r = r.replaceAll("(?i)(?<![A-Za-z0-9_'])today(?![A-Za-z0-9_('])",
      "unix_micros(date_trunc('DAY', current_timestamp()))")
    // duration literals in ± timestamp arithmetic: `now - 10d`,
    // `ts + 1h` (parser NK_VARIABLE durations). Only fixed-size units;
    // rewritten to their µs value so the arithmetic stays integral.
    // Without this, Spark would read `10d` as the DOUBLE 10.0 — a
    // silently-wrong 10-microsecond bound instead of 10 days.
    r = "(?i)([+-]\\s*)(\\d+)([buasmhdw])(?![A-Za-z0-9_'])".r
      .replaceAllIn(r, m => java.util.regex.Matcher.quoteReplacement(
        m.group(1) + durUs(m.group(2) + m.group(3).toLowerCase)))
    r
  }

  // ---------------------------------------------------------- FROM clause

  /** FROM: a bare table, `a ASOF JOIN b ON a.ts <op> b.ts [AND equi…]
    * [JLIMIT n]`, or `a WINDOW JOIN b WINDOW_OFFSET(lo, hi) [ON equi…]`.
    * Right-side payload columns surface as `r_<col>` (JoinOps
    * convention); plain table names only (subqueries go through the
    * DataFrame API). */
  private def fromClause(resolve: String => DataFrame, from: String,
      tsCol: String, perSecond: Long = 1000000L): DataFrame = {
    val up = from.toUpperCase
    // LEFT|RIGHT prefixes (25-join.md: the reference spells its asof /
    // window joins `LEFT ASOF JOIN`, `RIGHT WINDOW JOIN`; bare spelling
    // = LEFT). RIGHT mirrors the roles: the preserved side swaps, and
    // the main-condition operator meanings mirror with it — which the
    // preserved-side-first normalization below yields for free.
    def joinSplit(kw: String): Option[(String, String, Boolean)] =
      Seq(s" RIGHT $kw ", s" LEFT $kw ", s" $kw ").view.flatMap { sep =>
        val i = up.indexOf(sep)
        if (i < 0) None
        else Some((from.substring(0, i).trim,
          from.substring(i + sep.length).trim, sep.startsWith(" RIGHT")))
      }.headOption
    val asofSplit = joinSplit("ASOF JOIN")
    val winSplit = joinSplit("WINDOW JOIN")
    val asofAt = if (asofSplit.isDefined) 0 else -1
    val winAt = if (winSplit.isDefined) 0 else -1
    val plainAt = up.indexOf(" JOIN ")
    if (asofAt < 0 && winAt < 0 && plainAt < 0)
      return resolve(from.split(" ")(0))

    // (plain same-name keys, same-expression keys). An expression key
    // (`a.t->'tag1' = b.t->'tag1'` → matching get_json_object calls,
    // test_join_full.py:10481) materializes as a synthetic column on
    // BOTH sides and joins by that name.
    def equiKeysSplit(conds: Seq[String]): (Seq[String], Seq[String]) = {
      val plainB = Seq.newBuilder[String]
      val exprB = Seq.newBuilder[String]
      val m = "(?i)^\\s*\\w+\\.(\\w+)\\s*=\\s*\\w+\\.(\\w+)\\s*$".r
      def stripQuals(e: String): String =
        "(?i)\\b[A-Za-z_]\\w*\\.(?=[A-Za-z_])".r.replaceAllIn(e, "")
      def topEqSplit(s: String): Option[(String, String)] = {
        var depth = 0; var inS = false; var i = 0
        while (i < s.length) {
          val ch = s(i)
          if (inS) { if (ch == '\'') inS = false }
          else ch match {
            case '\'' => inS = true
            case '(' => depth += 1
            case ')' => depth -= 1
            case '=' if depth == 0 &&
                (i == 0 || !"<>!=".contains(s(i - 1))) &&
                (i + 1 >= s.length || s(i + 1) != '=') =>
              return Some((s.substring(0, i), s.substring(i + 1)))
            case _ =>
          }
          i += 1
        }
        None
      }
      conds.foreach { c =>
        c match {
          // unquoted identifiers are case-insensitive (fuzz-found: a
          // case-mutated `ON T1.Id = t2.id` must stay an equi key)
          case m(k1, k2) if k1.equalsIgnoreCase(k2) => plainB += k1
          case other =>
            topEqSplit(other) match {
              case Some((e1, e2))
                  if normExprKey(stripQuals(e1)) ==
                    normExprKey(stripQuals(e2)) &&
                    e1.trim.contains("(") =>
                exprB += stripQuals(e1).trim
              case _ => throw new IllegalArgumentException(
                s"only same-name equi keys supported in join ON: $other")
            }
        }
      }
      (plainB.result(), exprB.result())
    }
    def equiKeys(conds: Seq[String]): Seq[String] = {
      val (plain, exprs) = equiKeysSplit(conds)
      require(exprs.isEmpty,
        s"only same-name equi keys supported in join ON here: " +
          exprs.mkString(", "))
      plain
    }

    if (asofAt >= 0) {
      val (lTxt, rest0, isRight) = asofSplit.get
      // optional ON: the reference's ASOF default condition is
      // `left.ts >= right.ts` with no grouping keys (25-join.md:15)
      val onAt = rest0.toUpperCase.indexOf(" ON ")
      val rTxt = (if (onAt >= 0) rest0.substring(0, onAt) else {
        // strip a trailing JLIMIT from the table tokens when ON absent
        "(?i)\\s+JLIMIT\\s+\\d+$".r.replaceAllIn(rest0, "")
      }).trim
      // preserved side first — RIGHT swaps the roles; "events e":
      // token 0 is the table, an optional token 1 its alias; the
      // ts-condition qualifier may use either
      val (presTxt, probeTxt) = if (isRight) (rTxt, lTxt) else (lTxt, rTxt)
      val leftToks = presTxt.split("\\s+")
      val leftNames = leftToks.map(_.toLowerCase).toSet
      val left = resolve(leftToks(0))
      val right = resolve(probeTxt.split("\\s+")(0))
      var tail =
        if (onAt >= 0) rest0.substring(onAt + 4).trim
        else s"${leftToks(0)}.$tsCol >= ${probeTxt.split("\\s+")(0)}.$tsCol"
      val jlimitSrc = if (onAt >= 0) tail else rest0
      val jlimit = {
        val m = "(?i)^(.*?)\\s+JLIMIT\\s+(\\d+)$".r
        jlimitSrc match {
          case m(t, n) => if (onAt >= 0) tail = t; n.toInt
          case _ => 1
        }
      }
      val conds = tail.split("(?i)\\s+AND\\s+").toSeq
      val tsPat = s"(?i)^\\s*(\\w+)\\.($tsCol)\\s*(>=|>|<=|<|=)\\s*(\\w+)\\.($tsCol)\\s*$$".r
      val (tsConds, eqConds) = conds.partition(tsPat.findFirstIn(_).isDefined)
      require(tsConds.length == 1, s"ASOF JOIN needs one ts condition")
      val tm = tsPat.findFirstMatchIn(tsConds.head).get
      // normalize to preserved.ts <op> probe.ts — a condition written
      // probe-side-first flips the operator, not the join direction;
      // for RIGHT joins this same flip realizes the reference's
      // "operator meanings are the opposite" rule
      val op0 = tm.group(3)
      val op =
        if (leftNames.contains(tm.group(1).toLowerCase)) op0
        else op0 match {
          case ">=" => "<="; case "<=" => ">="
          case ">" => "<"; case "<" => ">"; case "=" => "="
        }
      val keys = equiKeys(eqConds)
      val rightCols = right.columns.toSeq
        .filterNot(keys.contains)
      // the non-ts payload columns double as the tie-break so the pick
      // among right rows at equal ts is deterministic (they make the
      // right order total whenever right rows are distinct)
      val tie = rightCols.filterNot(_ == tsCol)
      if (jlimit == 1)
        graft.ops.JoinOps.asofJoin(left, right, keys, tsCol, tsCol, op,
          rightCols, rightTieBreak = tie)
      else
        graft.ops.JoinOps.asofJoinN(left, right, keys, tsCol, tsCol, op,
          jlimit, rightCols, rightTieBreak = tie)
    } else if (winAt >= 0) {
      val (lTxt, rest, isRight) = winSplit.get
      // accepted orders (sql.y:2775 spells ON before WINDOW_OFFSET;
      // examples also write it after): `tbl [alias] [ON cond]
      // WINDOW_OFFSET(lo, hi) [ON cond] [JLIMIT n]`
      var restTxt = rest.trim
      var jlimit: Option[Int] = None
      "(?i)\\s+JLIMIT\\s+(\\d+)\\s*$".r.findFirstMatchIn(restTxt)
        .foreach { jm =>
          jlimit = Some(jm.group(1).toInt)
          restTxt = restTxt.substring(0, jm.start).trim
        }
      val wom = "(?i)\\bWINDOW_OFFSET\\s*\\(([^)]*)\\)".r
        .findFirstMatchIn(restTxt)
        .getOrElse(throw new IllegalArgumentException(
          s"WINDOW JOIN needs `tbl [ON …] WINDOW_OFFSET(lo, hi)`: $rest"))
      val segB = restTxt.substring(0, wom.start).trim
      val segA = restTxt.substring(wom.end).trim
      val onAtB = segB.toUpperCase.indexOf(" ON ")
      val (tblTxt, onTxt) =
        if (onAtB >= 0)
          (segB.substring(0, onAtB).trim,
            Some(segB.substring(onAtB + 4).trim))
        else if (segA.toUpperCase.startsWith("ON "))
          (segB, Some(segA.substring(3).trim))
        else {
          require(segA.isEmpty,
            s"WINDOW JOIN: unexpected trailing clause: $segA")
          (segB, None)
        }
      val rightName = tblTxt.split("\\s+")(0)
      // RIGHT WINDOW JOIN anchors the window on the other side;
      // WINDOW_OFFSET stays relative to the preserved row's ts
      val (presName, probeName) =
        if (isRight) (rightName, lTxt.split("\\s+")(0))
        else (lTxt.split("\\s+")(0), rightName)
      var left = resolve(presName)
      var right = resolve(probeName)
      val bounds = splitArgs(wom.group(1))
        .map(s => signedDurNative(s, perSecond))
      val (plainKeys, exprKeys) = onTxt.toSeq
        .map(o => equiKeysSplit(o.split("(?i)\\s+AND\\s+").toSeq))
        .foldLeft((Seq.empty[String], Seq.empty[String])) {
          case ((p, e), (p2, e2)) => (p ++ p2, e ++ e2) }
      val keys = plainKeys ++ exprKeys.zipWithIndex.map { case (ex, i) =>
        val nm = s"_jk$i"
        val kc = expr(rewriteFuncs(ex, tsCol, perSecond))
        left = left.withColumn(nm, kc)
        right = right.withColumn(nm, kc)
        nm
      }
      val rightCols = right.columns.toSeq.filterNot(keys.contains)
      // `_wjlid` identifies the preserved ROW for the implicit
      // per-window aggregation route (25-join.md: aggregates in a
      // window-join select aggregate EACH left row's window set);
      // query() drops it unused, so plans without aggregation only
      // carry a pruned-away column
      val lid0 = left.withColumn("_wjlid", monotonically_increasing_id())
      jlimit match {
        case Some(n) =>
          // JLIMIT caps matches per left row; a synthetic row id keys
          // the per-row rank (the dialect has no unique-left contract)
          graft.ops.JoinOps.windowJoinLimited(lid0, right, keys, tsCol,
              tsCol, bounds(0), bounds(1), rightCols, n, Seq("_wjlid"),
              rightTieBreak = rightCols.filterNot(_ == tsCol))
            .drop("jrank")
        case None =>
          graft.ops.JoinOps.windowJoin(lid0, right, keys, tsCol, tsCol,
            bounds(0), bounds(1), rightCols)
      }
    } else {
      // plain [INNER|LEFT|RIGHT|FULL|LEFT/RIGHT SEMI|LEFT/RIGHT ANTI]
      // JOIN on same-name equi keys; right payload surfaces as r_<col>,
      // matching the other join forms (sql.y:2726-2804 join_type).
      // Non-equi ON conjuncts are accepted for INNER joins as
      // post-join residual filters (equivalent there); outer/semi/anti
      // ON-residuals change match semantics and stay loud errors.
      val arms = Seq(
        (" LEFT SEMI JOIN ", "left_semi", false),
        (" RIGHT SEMI JOIN ", "left_semi", true),
        (" LEFT ANTI JOIN ", "left_anti", false),
        (" RIGHT ANTI JOIN ", "left_anti", true),
        (" LEFT JOIN ", "left", false),
        (" RIGHT JOIN ", "right", false),
        (" FULL JOIN ", "full", false),
        (" INNER JOIN ", "inner", false))
      val (at, kw, joinType, swap) = arms
        .collectFirst { case (k, t, sw) if up.indexOf(k) >= 0 =>
          (up.indexOf(k), k, t, sw) }
        .getOrElse((plainAt, " JOIN ", "inner", false))
      val leftToks = from.substring(0, at).trim.split("\\s+")
      val leftTbl = leftToks(0)
      val rest = from.substring(at + kw.length).trim
      val onAt = rest.toUpperCase.indexOf(" ON ")
      require(onAt >= 0, "JOIN needs ON")
      val rightToks = rest.substring(0, onAt).trim.split("\\s+")
      val rightTbl = rightToks(0)
      // RIGHT SEMI/ANTI = the mirrored left form (the preserved side
      // is the right table); aliases travel with their tables
      val (lToks, rToks) =
        if (swap) (rightToks, leftToks) else (leftToks, rightToks)
      val left = resolve(lToks(0))
      val right = resolve(rToks(0))
      val leftQuals = (Set(lToks(0)) ++ lToks.lift(1)).map(_.toLowerCase)
      val rightQuals = (Set(rToks(0)) ++ rToks.lift(1)).map(_.toLowerCase)
      val conds = rest.substring(onAt + 4).trim
        .split("(?i)\\s+AND\\s+").toSeq
      val eqRe = "(?i)^\\s*\\w+\\.(\\w+)\\s*=\\s*\\w+\\.(\\w+)\\s*$".r
      val (eqConds, residual) = conds.partition {
        case eqRe(k1, k2) => k1.equalsIgnoreCase(k2)
        case _ => false
      }
      // normalize key spelling to the frame's own column case —
      // downstream filterNot(keys.contains) comparisons are exact
      val keys = equiKeys(eqConds).map(k =>
        left.columns.find(_.equalsIgnoreCase(k)).getOrElse(k))
      // residual conjunct with right-side refs `r_`-renamed (keys
      // included) and left-side refs bared, for a condition join;
      // time scalars (`now`, duration arithmetic) lower first
      def condSide(cnd: String): String =
        "(?i)\\b(\\w+)\\.(\\w+)\\b".r.replaceAllIn(
          rewriteTimeScalars(cnd), m => {
          val q = m.group(1).toLowerCase; val c = m.group(2)
          if (rightQuals.contains(q)) s"r_$c"
          else if (leftQuals.contains(q)) c
          else m.matched
        })
      joinType match {
        case "left_semi" | "left_anti" if residual.nonEmpty =>
          // ON residuals participate in MATCHING (standard ON
          // semantics — for anti, a residual is NOT a pre-filter: a
          // left-side-false conjunct makes every right row a non-match
          // and KEEPS the row). A condition join states exactly that;
          // Catalyst still pushes side-local conjuncts down where
          // equivalent and extracts the equi keys for hash joins.
          val r = right.select(right.columns.toSeq
            .map(c => col(c).as(s"r_$c")): _*)
          val condTxt = (keys.map(k => s"$k = r_$k") ++
            residual.map(condSide)).mkString(" AND ")
          left.join(r, expr(condTxt), joinType)
        case "left_semi" | "left_anti" =>
          left.join(right.select(keys.map(col): _*), keys, joinType)
        case _ if residual.isEmpty || joinType == "inner" =>
          val rightCols = right.columns.toSeq.filterNot(keys.contains)
          val r = right.select(keys.map(col) ++
            rightCols.map(c => col(c).as(s"r_$c")): _*)
          var joined = left.join(r, keys, joinType)
          // on outer joins the using-join keeps only the preserved
          // side's key value — a key ref qualified by the NULL-
          // producing side is NOT representable in this flattened
          // output (it must read NULL on unmatched rows). Mark the
          // merged keys so the qualified-ref rewrite fails loudly on
          // such refs instead of silently reading the preserved value.
          val lostSide = joinType match {
            case "left" => Some("right")
            case "right" => Some("left")
            case "full" => Some("both")
            case _ => None
          }
          lostSide.foreach { side =>
            val md = new org.apache.spark.sql.types.MetadataBuilder()
              .putString("graft.merged_key_lost", side).build()
            joined = joined.select(joined.columns.toSeq.map(cn =>
              if (keys.contains(cn)) col(cn).as(cn, md)
              else col(cn)): _*)
          }
          // inner residuals: post-join filters (equivalent for inner);
          // `q.c` resolves by q's side — right columns are r_-prefixed
          // except the shared equi keys
          residual.foreach { cnd =>
            val rewritten = "(?i)\\b(\\w+)\\.(\\w+)\\b".r
              .replaceAllIn(rewriteTimeScalars(cnd), m => {
                val q = m.group(1).toLowerCase; val c = m.group(2)
                if (rightQuals.contains(q))
                  if (keys.exists(_.equalsIgnoreCase(c))) c else s"r_$c"
                else if (leftQuals.contains(q)) c
                else m.matched
              })
            joined = joined.filter(expr(rewritten))
          }
          joined
        case _ =>
          // outer join with ON residuals (test_join_boundary.py forms
          // like `full join … on t1.ts = t2.ts and t2.ts <= now`):
          // residuals are MATCH conditions, so they join as part of
          // the condition — never a post-filter, which would drop
          // unmatched outer rows. The merged key column of the
          // residual-free using-join shape is reconstructed (left keys
          // for LEFT, right for RIGHT, coalesce for FULL) while the
          // right side's own keys stay addressable as `r_<key>` — a
          // right-qualified key ref must read NULL on unmatched rows,
          // not the merged value.
          val r = right.select(right.columns.toSeq
            .map(c => col(c).as(s"r_$c")): _*)
          val condTxt = (keys.map(k => s"$k = r_$k") ++
            residual.map(condSide)).mkString(" AND ")
          var joined = left.join(r, expr(condTxt), joinType)
          joined = joinType match {
            case "right" => keys.foldLeft(joined)((d, k) =>
              d.withColumn(k, col(s"r_$k")))
            case "full" => keys.foldLeft(joined)((d, k) =>
              d.withColumn(k, coalesce(col(k), col(s"r_$k"))))
            case _ => joined
          }
          // the right/full overwrite above discards the LEFT side's
          // own key value (right refs stay addressable via r_<key>);
          // mark it so a left-qualified key ref fails loudly rather
          // than reading the merged value on unmatched rows
          if (joinType == "right" || joinType == "full") {
            val md = new org.apache.spark.sql.types.MetadataBuilder()
              .putString("graft.merged_key_lost", "left").build()
            joined = joined.select(joined.columns.toSeq.map(cn =>
              if (keys.contains(cn)) col(cn).as(cn, md)
              else col(cn)): _*)
          }
          joined
      }
    }
  }

  /** `SELECT [keys,] [_frowts,] FORECAST(col, 'algo=…,rows=…,start=…,
    * every=…') FROM t [PARTITION BY k]` (sql.y FORECAST token; TDgpt
    * fc surface): routes to [[graft.ops.AnalyticsOps]] — `linear`
    * (default, OLS with `_flow`/`_fhigh`) or `holtwinters` (Holt
    * linear-trend fold). `rows` = horizon (default 10), `every` = a
    * dialect duration, `start` = first forecast ts in native ticks
    * (the reference defaults start/every from the series cadence; this
    * dialect requires them explicitly so results are reproducible).
    * The FORECAST(...) span in each select item is replaced by the
    * op's `forecast` output column, so wrappers like ROUND(...) work. */
  private def forecastSelect(spark: SparkSession, df: DataFrame,
      c: Map[String, String], tsCol: String, perSecond: Long): DataFrame = {
    val sel = c("SELECT").trim
    val m = "(?i)\\bFORECAST\\s*\\(".r.findFirstMatchIn(sel).get
    val open = sel.indexOf('(', m.start)
    var depth = 0; var inStr = false; var close = -1; var i = open
    while (close < 0 && i < sel.length) {
      val ch = sel(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > 0, s"unbalanced FORECAST call: $sel")
    val args = splitArgs(sel.substring(open + 1, close))
    require(args.nonEmpty, "FORECAST needs a value column")
    val valueCol = args.head.trim
    val opts = args.drop(1).map(_.trim)
      .find(a => a.startsWith("'") || a.startsWith("\""))
      .map(_.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\""))
      .getOrElse("")
    val om = opts.split(",").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k.trim.toLowerCase -> v.trim
    }.toMap
    val partCols = c.get("PARTITION BY").toSeq.flatMap(splitArgs)
      .map(_.trim)
    val rows = om.getOrElse("rows", "10").toInt
    // start/every omitted (the documented default — fc infers the
    // cadence from the series): every = the series' mean tick spacing
    // (span / (n-1), deterministic), start = last ts + every. Keyed
    // forecasts must spell them out — per-key cadences differ.
    val inferred: Option[(Long, Long)] =
      if (om.contains("start")) None
      else {
        require(partCols.isEmpty,
          "FORECAST with PARTITION BY needs explicit start=/every= " +
            "(per-key cadences differ)")
        val r = df.agg(min(col(tsCol)).cast("long"),
          max(col(tsCol)).cast("long"), count(lit(1))).head
        require(!r.isNullAt(0) && r.getLong(2) >= 2,
          "FORECAST needs >= 2 rows to infer start/every")
        // mean spacing, floored to whole seconds (the forecast grid
        // contract) — deterministic for any input
        val raw = math.max(1L,
          (r.getLong(1) - r.getLong(0)) / (r.getLong(2) - 1))
        val ev = math.max(perSecond, raw - raw % perSecond)
        Some((r.getLong(1) + ev, ev))
      }
    val every = om.get("every").map(durNative(_, perSecond))
      .orElse(inferred.map(_._2))
      .getOrElse(durNative("1d", perSecond))
    val start = om.get("start").map(_.toLong)
      .orElse(inferred.map(_._1)).get
    // tiebreak=col1;col2 orders duplicate timestamps inside a series
    // deterministically — without it the sequential Holt fold's result
    // depends on shuffle arrival order when ts ties exist
    val tieBreak = om.get("tiebreak").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
    // a keyless holt/arima forecast is ONE series: a constant key
    // satisfies the per-key fold, then drops from the output.
    // TDgpt model-server algos (06-tdgpt/05-forecast: theta and the
    // anode TSFMs moirai / chronos / timesfm / moment / timemoe-* /
    // tdtsfm_*) delegate to an external ML service in the reference;
    // this engine substitutes its deterministic Holt trend fold — the
    // documented equivalence-class stand-in (SURVEY §2.10), loud for
    // truly unknown names
    val algoRaw = om.getOrElse("algo", "linear")
    val tsfm = Set("theta", "moirai", "chronos", "timesfm", "moment",
      "lstm", "mlp")
    val algo =
      if (tsfm.contains(algoRaw) || algoRaw.startsWith("timemoe") ||
        algoRaw.startsWith("tdtsfm")) "holtwinters"
      else algoRaw
    val (dfF, keysF, synthKey) =
      if (partCols.isEmpty && (algo == "holtwinters" || algo == "arima"))
        (df.withColumn("_fg", lit(1)), Seq("_fg"), true)
      else (df, partCols, false)
    val out0 = algo match {
      case "holtwinters" => graft.ops.AnalyticsOps.forecastHolt(
        dfF, col(tsCol), valueCol, keysF, rows, every, start,
        tieBreak = tieBreak)
      case "arima" => graft.ops.AnalyticsOps.forecastAr1(
        dfF, col(tsCol), valueCol, keysF, rows, every, start)
      case "linear" => graft.ops.AnalyticsOps.forecast(
        df, col(tsCol), valueCol, partCols, rows, every, start)
      case other =>
        throw new IllegalArgumentException(s"unknown forecast algo: $other")
    }
    val out = if (synthKey) out0.drop("_fg") else out0
    // project: the FORECAST span collapses to the op's output column
    val sel2 = sel.substring(0, m.start) + "forecast" +
      sel.substring(close + 1)
    val asRe = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    var res = out.select(splitArgs(sel2).map(_.trim).map {
      case asRe(e, a) => expr(e.trim).as(a)
      case e => expr(e).as(e)
    }: _*)
    c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
    c.get("LIMIT").foreach(n => res = applyLimit(res, n))
    res
  }

  /** Locate `fname(args…)` in a select list: (matchStart, args,
    * closeParenIndex), quote-aware like forecastSelect's scanner. */
  private def analyticCallSpan(sel: String, fname: String)
      : (Int, Seq[String], Int) = {
    val m = s"(?i)\\b$fname\\s*\\(".r.findFirstMatchIn(sel).get
    val open = sel.indexOf('(', m.start)
    var depth = 0; var inStr = false; var close = -1; var i = open
    while (close < 0 && i < sel.length) {
      val ch = sel(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > 0, s"unbalanced $fname call: $sel")
    (m.start, splitArgs(sel.substring(open + 1, close)), close)
  }

  private def analyticOpts(args: Seq[String]): Map[String, String] =
    args.drop(1).map(_.trim)
      .find(a => a.startsWith("'") || a.startsWith("\""))
      .map(_.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\""))
      .getOrElse("").split(",").filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k.trim.toLowerCase -> v.trim
      }.toMap

  /** Project the analytic op's full-row output through the original
    * select list, with the op call span replaced by `replacement` and
    * pseudo-column spellings rewritten. */
  private def analyticProject(out: DataFrame, c: Map[String, String],
      sel: String, start: Int, close: Int, replacement: String,
      pseudo: Map[String, String]): DataFrame = {
    var sel2 = sel.substring(0, start) + replacement +
      sel.substring(close + 1)
    pseudo.foreach { case (k, v) =>
      sel2 = sel2.replaceAll(
        s"(?i)(?<![A-Za-z0-9_])$k(?![A-Za-z0-9_])", v)
    }
    val asRe = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
    var res = out.select(splitArgs(sel2).map(_.trim).map {
      case asRe(e, a) => expr(e.trim).as(a)
      case e => expr(e).as(e)
    }: _*)
    c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
    c.get("LIMIT").foreach(n => res = applyLimit(res, n))
    res
  }

  /** `SELECT [_improwts,] IMPUTATION(col[, 'opts'])[, _impmark] …`
    * (builtins.c imputation; imputationoperator.c:105; clientTests.cpp
    * :1150 text form): every input row back with gaps filled. Only the
    * deterministic linear model is in-engine (SURVEY §2.10). */
  private def imputationSelect(df: DataFrame, c: Map[String, String],
      tsCol: String): DataFrame = {
    val sel = c("SELECT").trim
    val (start, args, close) = analyticCallSpan(sel, "IMPUTATION")
    require(args.nonEmpty, "IMPUTATION needs a value column")
    val valueCol = args.head.trim
    val om = analyticOpts(args)
    val algoRaw = om.getOrElse("algo", "linear")
    // `moment` is TDgpt's anode-served imputation foundation model
    // (06-tdgpt/08-imputation.md) — this engine substitutes its
    // deterministic linear imputation, the same equivalence-class
    // stand-in contract as the forecast TSFMs
    val algo = if (algoRaw == "moment") "linear" else algoRaw
    require(algo == "linear", s"unknown imputation algo: $algo")
    val tieBreak = om.get("tiebreak").toSeq
      .flatMap(_.split(";")).map(_.trim).filter(_.nonEmpty)
    val partCols = c.get("PARTITION BY").toSeq.flatMap(splitArgs)
      .map(_.trim)
    val out = graft.ops.AnalyticsOps.imputeLinear(
      df, col(tsCol), valueCol, partCols, tieBreak)
    analyticProject(out, c, sel, start, close, valueCol,
      Map("_improwts" -> tsCol))
  }

  /** `SELECT ANOMALYCHECK(col[, 'opts'])[, _anomalymark] …`
    * (builtins.c:7291; `_anomalymark` :7592): row stream back with the
    * detector verdict; z= tunes the threshold. */
  private def anomalycheckSelect(df: DataFrame, c: Map[String, String],
      tsCol: String): DataFrame = {
    val sel = c("SELECT").trim
    val (start, args, close) = analyticCallSpan(sel, "ANOMALYCHECK")
    require(args.nonEmpty, "ANOMALYCHECK needs a value column")
    val valueCol = args.head.trim
    val om = analyticOpts(args)
    val z = om.get("z").map(_.toDouble).getOrElse(2.0)
    val partCols = c.get("PARTITION BY").toSeq.flatMap(splitArgs)
      .map(_.trim)
    val out = graft.ops.AnalyticsOps.anomalyMark(df, valueCol, partCols, z)
    analyticProject(out, c, sel, start, close, valueCol, Map.empty)
  }

  /** Deterministic tiebreaker for series/selection order when ts
    * collides: the row-id column when the table has one, else EVERY
    * remaining sortable column — shuffle arrival order must never
    * decide diff/csum/lag/top results on tables without an event_id
    * (ADVICE r14: the old event_id-only rule left other tables
    * nondeterministic under duplicate ts). */
  private def seriesTie(df: DataFrame, tsCol: String): Seq[Column] = {
    // orderable = no MapType anywhere in the type tree (Spark's
    // orderBy throws on maps, including maps nested in structs/arrays)
    def orderable(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt match {
        case _: org.apache.spark.sql.types.MapType => false
        case s: org.apache.spark.sql.types.StructType =>
          s.fields.forall(f => orderable(f.dataType))
        case a: org.apache.spark.sql.types.ArrayType =>
          orderable(a.elementType)
        case _ => true
      }
    df.columns.find(_.equalsIgnoreCase("event_id"))
      .map(c => Seq(col(c)))
      .getOrElse(df.schema.fields.toSeq
        .filter(f => !f.name.equalsIgnoreCase(tsCol) &&
          orderable(f.dataType))
        // stable schema-order prefix bounds the sort cost on wide
        // tables; rows identical across 16 columns AND ts are
        // interchangeable for every series function routed here
        .take(16)
        .map(f => col(f.name)))
  }

  /** Row-producing selection functions `TOP/BOTTOM(col, k)`,
    * `TAIL(col, k[, offset])`, `UNIQUE(col)` (builtins.c:4431 tail,
    * :4471 unique; topbotoperator semantics): each keeps a subset of
    * input rows, so the rest of the select list projects the kept rows
    * directly. Skipped when a window/group clause is present — those
    * compose differently and are not routed here. */
  private def seriesSelect(df: DataFrame, c: Map[String, String],
      tsCol: String, perSecond: Long): Option[DataFrame] = {
    val windowed = Seq("INTERVAL", "SESSION", "STATE_WINDOW",
      "COUNT_WINDOW", "EVENT_WINDOW", "ANOMALY_WINDOW")
      .exists(c.contains)
    if (windowed) return None
    val sel = c("SELECT").trim
    val fname = Seq("top", "bottom", "tail", "unique", "statecount",
      "stateduration").find(f =>
      s"(?i)\\b$f\\s*\\(".r.findFirstIn(sel).isDefined)
    if (fname.isEmpty && c.contains("GROUP BY")) return None
    fname.map { f =>
      val (start, args, close) = analyticCallSpan(sel, f)
      val valueCol = args.head.trim
      // GROUP BY on a selection function groups the SELECTION, i.e.
      // behaves exactly like PARTITION BY (20-select.md top/bottom
      // examples group by tbname)
      val partCols = (c.get("PARTITION BY").toSeq ++
        c.get("GROUP BY").toSeq).flatMap(splitArgs).map(_.trim)
      val keys = partCols.map(col)
      import graft.ops.SeriesOps
      // a row-id tiebreaker keeps the selection total when ts collides
      // within a key (ADVICE r11: µs-level collisions in a future
      // layout would otherwise flake the oracle hash)
      val tie = seriesTie(df, tsCol)
      f match {
        // statecount/stateduration(col, 'op', val[, unit])
        // (builtins.c:4256/:4296): every row back with the running
        // true-streak count / duration, -1 on non-matching rows
        case "statecount" | "stateduration" =>
          val opName = unquote(args(1).trim).toUpperCase
          require(args(2).trim.matches("[-+]?\\d+(\\.\\d+)?"),
            s"$f threshold must be a numeric literal: ${args(2).trim}")
          val v = args(2).trim.toDouble
          val x = col(valueCol)
          val pred = opName match {
            case "LT" => x < v
            case "GT" => x > v
            case "LE" => x <= v
            case "GE" => x >= v
            case "EQ" => x === v
            case "NE" => x =!= v
            case other =>
              throw new IllegalArgumentException(s"state op: $other")
          }
          // unit converts to ticks of the surface's native precision
          // (22-function.md: omitted unit = the database precision);
          // durUs here would be 1000x off for a PRECISION 'ms'/'ns' db
          val unit = args.lift(3)
            .map(u => durNative(u.trim, perSecond)).getOrElse(1L)
          val stated =
            if (keys.isEmpty)
              // keyless: one global run-length series — two-pass fold,
              // never an unpartitioned (single-partition) window
              SeriesOps.keylessState(df, pred, col(tsCol), tie,
                if (f == "statecount") "count" else "duration",
                unit, "_state")
            else df.withColumn("_state",
              if (f == "statecount")
                SeriesOps.statecount(pred, col(tsCol), keys)
              else SeriesOps.stateduration(pred, col(tsCol), keys, unit))
          analyticProject(stated, c, sel, start, close, "_state",
            Map.empty)
        case _ =>
          // loud arity/shape errors (the reference rejects at parse
          // time — builtins.c translateTopBot/translateTail): k (and
          // tail's offset) must be integer LITERALS
          def kArg(fn: String): Int = {
            require(args.length >= 2,
              s"$fn(col, k) needs a row-count argument")
            val t = args(1).trim
            require(t.matches("-?\\d+"),
              s"$fn(col, k): k must be an integer literal, got: $t")
            t.toInt
          }
          val out = f match {
            case "top" => SeriesOps.topK(df, col(valueCol), col(tsCol),
              keys, kArg("top"), tie = tie)
            case "bottom" => SeriesOps.topK(df, col(valueCol),
              col(tsCol), keys, kArg("bottom"), bottom = true,
              tie = tie)
            case "tail" => SeriesOps.tail(df, col(tsCol), keys,
              kArg("tail"),
              args.lift(2).map { o =>
                require(o.trim.matches("-?\\d+"),
                  s"tail(col, k, offset): offset must be an integer " +
                    s"literal, got: ${o.trim}")
                o.trim.toInt
              }.getOrElse(0), tie = tie)
            case "unique" => SeriesOps.unique(df, col(valueCol),
              col(tsCol), keys, tie = tie)
          }
          analyticProject(out.drop("_rank"), c, sel, start, close,
            valueCol, Map.empty)
      }
    }
  }

  /** Bin boundaries for the HISTOGRAM text form
    * (builtinsimpl.c:5948 getHistogramBinDesc): `user_input` takes an
    * ascending JSON array of edges; `linear_bin`/`log_bin` take
    * `{"start","width"|"factor","count","infinity"}` and generate
    * `count` edges arithmetically / geometrically, ±∞-padded when
    * `infinity` is true (:6041). Descending generations (negative
    * width, factor<1) normalize to ascending — the reference builds
    * the same bin set via per-bin lower/upper min/max (:6099). */
  private def histogramBounds(binType: String, desc: String)
      : Seq[Double] = {
    val t = desc.trim
    if (binType == "user_input") {
      require(t.startsWith("[") && t.endsWith("]"),
        s"user_input bins must be a JSON array: $desc")
      val bs = t.substring(1, t.length - 1).split(",")
        .map(_.trim.toDouble).toSeq
      require(bs.size >= 2 &&
        bs.sliding(2).forall(p => p(0) < p(1)),
        s"user_input bins must be strictly ascending: $desc")
      bs
    } else {
      def field(k: String): Option[String] =
        ("\"" + k + "\"\\s*:\\s*([^,}\\s\"]+)").r
          .findFirstMatchIn(t).map(_.group(1))
      def need(k: String): String = field(k).getOrElse(
        sys.error(s"histogram $binType desc needs \"$k\": $desc"))
      val start = need("start").toDouble
      val count = need("count").toDouble.toInt
      require(count > 0 && count <= 1000,
        s"histogram bin count out of range (1..1000): $desc")
      val inf = field("infinity").exists(_.toBoolean)
      val core: Seq[Double] = binType match {
        case "linear_bin" =>
          val width = need("width").toDouble
          require(width != 0, s"linear_bin width must be non-zero")
          (0 to count).map(i => start + i * width)
        case "log_bin" =>
          val factor = need("factor").toDouble
          require(start != 0 && factor > 0 && factor != 1,
            s"log_bin needs start!=0 and factor>0, !=1: $desc")
          (0 to count).map(i => start * math.pow(factor, i))
        case other => sys.error(s"invalid histogram bin type: $other")
      }
      val asc = if (core.head <= core.last) core else core.reverse
      val all = if (inf)
        (Double.NegativeInfinity +: asc) :+ Double.PositiveInfinity
      else asc
      require(all.sliding(2).forall(p => p(0) < p(1)),
        s"histogram bins must be strictly monotonic: $desc")
      all
    }
  }

  /** `SELECT HISTOGRAM(col, 'user_input'|'linear_bin'|'log_bin',
    * 'desc', normalized) FROM t [PARTITION BY keys]` (builtins.c:4032;
    * membership is first-match "lower < v <= upper"
    * builtinsimpl.c:6170, every bin is emitted including zero counts
    * :6244, normalized percentages divide by the binned total only
    * :6236). Spark-first: the boundaries are plan-time literals, so
    * bin assignment is one codegen'd boundary scan per row (no UDF),
    * counts are a single hash aggregate on (keys, bin), and a tiny
    * broadcast bins frame restores empty bins — one shuffle total at
    * any scale. The reference prints each bin as a JSON varchar; we
    * emit typed (lower_bin, upper_bin, cnt|percentage) columns — the
    * same information, columnar. */
  private def histogramSelect(df: DataFrame, c: Map[String, String],
      tsCol: String): Option[DataFrame] = {
    val sel = c("SELECT").trim
    if ("(?i)^HISTOGRAM\\s*\\(".r.findFirstIn(sel).isEmpty) return None
    val windowed = Seq("INTERVAL", "SESSION", "STATE_WINDOW",
      "COUNT_WINDOW", "EVENT_WINDOW", "ANOMALY_WINDOW", "GROUP BY")
      .exists(c.contains)
    require(!windowed, "HISTOGRAM composes with PARTITION BY only")
    val (_, args, close) = analyticCallSpan(sel, "HISTOGRAM")
    require(sel.substring(close + 1).trim.isEmpty,
      s"HISTOGRAM must be the whole select list: $sel")
    require(args.length == 4,
      s"HISTOGRAM needs (col, bin_type, bin_desc, normalized): $sel")
    val binType = unquote(args(1).trim).toLowerCase
    require(Seq("user_input", "linear_bin", "log_bin").contains(binType),
      s"HISTOGRAM bin_type must be user_input|linear_bin|log_bin: " +
        s"$binType")
    require(args(3).trim.matches("[01]"),
      s"HISTOGRAM normalized flag must be 0 or 1: ${args(3).trim}")
    val normalized = args(3).trim.toInt == 1
    val bounds = histogramBounds(binType, unquote(args(2).trim))
    val nb = bounds.size - 1
    val partCols = c.get("PARTITION BY").toSeq.flatMap(splitArgs)
      .map(_.trim)
    val v = expr(args(0).trim).cast("double")
    // ascending disjoint bins ⇒ first-match == #boundaries below v;
    // out-of-range rows get a NULL bin, keeping their group alive in
    // the aggregate without contributing to any bin (or the total)
    val bArr = array(bounds.map(lit(_)): _*)
    val idx = (size(filter(bArr, b => v > b)) - 1).cast("int")
    val binned = when(v.isNotNull && v > lit(bounds.head) &&
      v <= lit(bounds.last), idx)
    val counts = df.withColumn("_bin", binned)
      .groupBy((partCols :+ "_bin").map(col): _*)
      .agg(count(lit(1)).as("_n"))
    val bins = df.sparkSession.createDataFrame(
      (0 until nb).map(i => (i, bounds(i), bounds(i + 1))))
      .toDF("_bin", "lower_bin", "upper_bin")
    val joined =
      if (partCols.isEmpty)
        broadcast(bins).join(counts, Seq("_bin"), "left")
      else counts.select(partCols.map(col): _*).distinct()
        .crossJoin(broadcast(bins))
        .join(counts, partCols :+ "_bin", "left")
    val cnt = coalesce(col("_n"), lit(0L))
    val valued =
      if (!normalized) joined.withColumn("cnt", cnt)
      else {
        val w = Window.partitionBy(partCols.map(col): _*)
        joined.withColumn("percentage",
          when(sum(cnt).over(w) === 0, lit(0d))
            .otherwise(cnt.cast("double") / sum(cnt).over(w)))
      }
    var res = valued.select((partCols ++ Seq("lower_bin", "upper_bin") :+
      (if (normalized) "percentage" else "cnt")).map(col): _*)
    c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
    c.get("LIMIT").foreach(n => res = applyLimit(res, n))
    Some(res)
  }

  private def signedDurNative(s: String, perSecond: Long): Long = {
    val t = s.trim.stripPrefix("'").stripSuffix("'").trim
    if (t.startsWith("-")) -durNative(t.substring(1), perSecond)
    else durNative(t, perSecond)
  }

  /** ORDER BY items with DESC support. */
  /** ORDER BY items: [ASC|DESC] [NULLS FIRST|LAST] (sql.y
    * ordering_specification_opt / null_ordering_opt; defaults match
    * the reference: ASC, and NULLS LAST for ASC / NULLS FIRST for
    * DESC — the same defaults Spark uses). */
  /** `aliases` maps a NORMALIZED select-item expression text to its
    * output alias, so `ORDER BY count(*)` after GROUP BY resolves to
    * the projected aggregate column instead of asking Spark to sort a
    * projection by an aggregate it no longer contains. `positional`
    * (the ordered output columns) resolves `ORDER BY <n>` ordinals —
    * without it a bare integer would sort by a constant, silently. */
  private def orderCols(o: String,
      aliases: Map[String, String] = Map.empty,
      positional: Seq[String] = Nil): Seq[Column] = {
    def resolved(e: String): Column = {
      val t = e.trim
      if (t.matches("\\d+") && positional.nonEmpty) {
        val n = t.toInt
        require(n >= 1 && n <= positional.length,
          s"ORDER BY $n exceeds the select list")
        col(positional(n - 1))
      } else aliases.get(normExprKey(t)).map(col).getOrElse(expr(t))
    }
    splitArgs(o).map { s =>
      val m = ("(?i)^(.*?)(?:\\s+(ASC|DESC))?" +
        "(?:\\s+NULLS\\s+(FIRST|LAST))?\\s*$").r
      s.trim match {
        case m(e, dir, nulls) =>
          val desc = dir != null && dir.equalsIgnoreCase("DESC")
          Option(nulls).map(_.toUpperCase) match {
            case Some("FIRST") =>
              if (desc) resolved(e).desc_nulls_first
              else resolved(e).asc_nulls_first
            case Some("LAST") =>
              if (desc) resolved(e).desc_nulls_last
              else resolved(e).asc_nulls_last
            case _ => if (desc) resolved(e).desc else resolved(e).asc
          }
        case e => resolved(e).asc
      }
    }
  }

  /** LIMIT n | LIMIT off, n (sql.y limit_clause_opt: the comma form
    * abbreviates OFFSET off LIMIT n). */
  private def limitParts(raw: String): (Int, Option[Int]) =
    splitArgs(raw) match {
      case Seq(n) => (n.trim.toInt, None)
      case Seq(o, n) => (n.trim.toInt, Some(o.trim.toInt))
      case other =>
        throw new IllegalArgumentException(s"bad LIMIT: $other")
    }

  private def applyLimit(df: DataFrame, raw: String): DataFrame = {
    val (n, off) = limitParts(raw)
    off.map(df.offset).getOrElse(df).limit(n)
  }

  /** Whitespace-and-case-insensitive key for matching an ORDER BY
    * expression against a select item's expression text. */
  private def normExprKey(e: String): String =
    e.toLowerCase.replaceAll("\\s+", "")

  /** Parse a datetime literal ('2024-01-05', '2024-01-05 12:30:00.25',
    * ISO T/Z forms) to native ticks in UTC — the reference accepts
    * quoted datetimes anywhere a primary-ts value appears
    * (parTranslater.c translateTimeRange; taos shell docs). Returns
    * None for strings that are not datetime-shaped. */
  private[sql] def tsLitTicks(lit0: String, perSecond: Long): Option[Long] = {
    val s = lit0.stripPrefix("'").stripSuffix("'").trim
    // ISO-8601 zone suffix (taosParseTime accepts ±hh[:mm] and Z):
    // shift the wall-clock fields back to UTC by the offset
    val re = ("^(\\d{4})-(\\d{2})-(\\d{2})" +
      "(?:[ T](\\d{2}):(\\d{2}):(\\d{2})(\\.\\d+)?)?" +
      "(Z|[+-]\\d{2}(?::?\\d{2})?)?$").r
    s match {
      case re(y, mo, d, h, mi, se, fr, zone) =>
        try {
          val ldt = java.time.LocalDateTime.of(y.toInt, mo.toInt, d.toInt,
            if (h == null) 0 else h.toInt,
            if (mi == null) 0 else mi.toInt,
            if (se == null) 0 else se.toInt)
          val offSec = zone match {
            case null | "Z" => 0L
            case z =>
              val sign = if (z.head == '-') -1L else 1L
              val body = z.tail.replace(":", "")
              val hh = body.substring(0, 2).toLong
              val mm = if (body.length >= 4)
                body.substring(2, 4).toLong else 0L
              sign * (hh * 3600 + mm * 60)
          }
          val sec = ldt.toEpochSecond(java.time.ZoneOffset.UTC) - offSec
          val frac = Option(fr).map(f =>
            math.round(f.toDouble * perSecond)).getOrElse(0L)
          Some(Math.addExact(Math.multiplyExact(sec, perSecond), frac))
        } catch { case _: Exception => None }
      case _ => None
    }
  }

  /** Rewrite `ts <op> 'datetime'` / `'datetime' <op> ts` /
    * `ts BETWEEN 'a' AND 'b'` to native-tick literals so both the
    * Spark filter and the query-range extraction see plain integers. */
  private def rewriteTsLiterals(e: String, tsCol: String,
      perSecond: Long): String = {
    import java.util.regex.Matcher.quoteReplacement
    val q = java.util.regex.Pattern.quote(tsCol)
    def ticks(m: String): Option[Long] = tsLitTicks(m, perSecond)
    var r = e
    r = ("(?i)(?<![A-Za-z0-9_])(" + q +
      "\\s*(?:>=|<=|<>|!=|==|=|<|>)\\s*)'([^']*)'").r.replaceAllIn(r,
      m => quoteReplacement(ticks(m.group(2))
        .map(t => m.group(1) + t).getOrElse(m.matched)))
    r = ("(?i)'([^']*)'(\\s*(?:>=|<=|<>|!=|==|=|<|>)\\s*" + q +
      ")(?![A-Za-z0-9_])").r.replaceAllIn(r,
      m => quoteReplacement(ticks(m.group(1))
        .map(t => t + m.group(2)).getOrElse(m.matched)))
    r = ("(?i)(?<![A-Za-z0-9_])(" + q +
      "\\s+BETWEEN\\s+)'([^']*)'(\\s+AND\\s+)'([^']*)'").r.replaceAllIn(r,
      m => quoteReplacement((ticks(m.group(2)), ticks(m.group(4))) match {
        case (Some(a), Some(b)) => m.group(1) + a + m.group(3) + b
        case _ => m.matched
      }))
    // `ts IN ('2022-07-10 16:31:00', 1657441840000, …)`: every quoted
    // datetime element rewrites to ticks (parTranslater IN-list on the
    // primary key; a bare ANSI cast of the string would throw)
    r = ("(?i)(?<![A-Za-z0-9_])(" + q +
      "\\s+(?:NOT\\s+)?IN\\s*)\\(([^()]*)\\)").r.replaceAllIn(r,
      m => quoteReplacement(m.group(1) + "(" +
        splitArgs(m.group(2)).map { el =>
          val t = el.trim
          if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
            ticks(t.substring(1, t.length - 1)).map(_.toString)
              .getOrElse(t)
          else t
        }.mkString(", ") + ")"))
    r
  }

  // ------------------------------------------------------------------ main

  /** Parse and lower a TDengine-dialect query. `resolve` maps a table
    * name to its DataFrame; `tsCol` is the timestamp primary key.
    *
    * Top-level `UNION [ALL]` chains combine by column NAME (the
    * dialect's set semantics); a trailing ORDER BY / LIMIT on the last
    * branch applies to the union result, per the reference grammar. */
  /** JSON tag operator `col->'key'` (sql.y operator table; the JSON
    * filter in builtins.c): rewritten to get_json_object before any
    * parsing, so it works in select items, WHERE, and HAVING alike. */
  private def rewriteJsonArrow(s: String): String =
    // an alias qualifier stays INSIDE the call (`b.t->'k'` →
    // get_json_object(b.t, …)) so join-side qualifier rewrites and
    // Spark SQL delegation both see a plain qualified column ref
    ("((?:[A-Za-z_][A-Za-z0-9_]*\\.)?[A-Za-z_][A-Za-z0-9_]*)" +
      "\\s*->\\s*'([^']*)'").r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        s"get_json_object(${m.group(1)}, '$$.${m.group(2)}')"))

  /** Sessions where the TDengine-named custom aggregates are already
    * registered (one spark.udf.register per session, not per query). */
  private val aggRegistered =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Register the custom-sketch aggregates under their TDengine names
    * so dialect text resolves them like built-ins: apercentile's
    * t-digest (the same sketch the Column form uses). */
  private def ensureCustomAggs(spark: SparkSession): Unit =
    if (aggRegistered.add(spark)) {
      spark.udf.register("apercentile", org.apache.spark.sql.functions
        .udaf(new graft.functions.Aggregators.TDigestPAgg))
      // sleep(sec) (builtins.c:8239 FUNCTION_TYPE_SLEEP; sclfunc.c:5240
      // sleepFunction): volatile per-row scalar — sleeps sec seconds,
      // returns 0 (1 if the task was killed mid-sleep, NULL input
      // sleeps nothing and returns 0). Sleeps in 100ms chunks checking
      // task interruption, same loop shape as the reference's
      // isTaskKilled poll. A UDF is the right vehicle: volatile and
      // never pushed down, matching FUNC_MGT_NO_PUSHDOWN_FUNC.
      spark.udf.register("sleep", (s: java.lang.Double) => {
        var result = 0
        if (s != null && s > 0) {
          val totalMs = math.min(s * 1000.0, 9.0e15).toLong
          var elapsed = 0L
          val tc = org.apache.spark.TaskContext.get()
          while (elapsed < totalMs && result == 0) {
            if (tc != null && tc.isInterrupted()) result = 1
            else {
              val chunk = math.min(100L, totalMs - elapsed)
              // a task kill can interrupt mid-sleep: the reference's
              // sleepFunction returns 1 on kill, so catch (and
              // restore) the interrupt instead of failing the task
              try { Thread.sleep(chunk); elapsed += chunk }
              catch { case _: InterruptedException =>
                Thread.currentThread().interrupt(); result = 1 }
            }
          }
        }
        result
      })
    }

  /** The reference lexer treats `"…"` exactly like `'…'` — both
    * produce TK_STRING (identifiers use backticks), so
    * `ts >= "2015-01-01 00:00:00.000"` and `HISTOGRAM(c, "USER_INPUT",
    * "[0,3,6,9]", 0)` are legal spellings (test_fun_agg_elapsed.py
    * positive queries). Normalize double-quoted literals to
    * single-quoted before any clause parsing, so every downstream
    * datetime/argument rewrite sees one quoting convention. Embedded
    * single quotes double; backslash escapes pass through with the
    * escaped quote normalized. */
  private[graft] def normalizeDoubleQuotes(s: String): String = {
    if (s.indexOf('"') < 0) return s
    val out = new StringBuilder(s.length)
    var i = 0; var mode = ' ' // ' ' | '\'' | '"' | '`'
    while (i < s.length) {
      val ch = s(i)
      mode match {
        case ' ' =>
          if (ch == '"') { out += '\''; mode = '"' }
          else { out += ch; if (ch == '\'' || ch == '`') mode = ch }
        case '\'' =>
          out += ch
          if (ch == '\\' && i + 1 < s.length) { out += s(i + 1); i += 1 }
          else if (ch == '\'') mode = ' '
        case '"' =>
          if (ch == '\\' && i + 1 < s.length) {
            // \" inside a double-quoted string is a literal quote;
            // \' must stay escaped in the single-quoted result
            if (s(i + 1) == '"') out += '"' else { out += ch; out += s(i + 1) }
            i += 1
          } else if (ch == '"') { out += '\''; mode = ' ' }
          else if (ch == '\'') out ++= "''"
          else out += ch
        case '`' =>
          out += ch
          if (ch == '`') mode = ' '
      }
      i += 1
    }
    out.toString
  }

  def query(spark: SparkSession, resolve0: String => DataFrame,
      sql: String, tsCol: String = "ts",
      perSecond: Long = 1000000L): DataFrame = {
    ensureCustomAggs(spark)
    graft.functions.NativeFunctions.register(spark)
    // unquoted identifiers are case-insensitive in the reference
    // (converted to lower case at parse time); a backtick-quoted name
    // reaches resolve0 verbatim first, so case-significant tables
    // still win when they exist
    val resolve: String => DataFrame = n =>
      try resolve0(n)
      catch {
        case e: Exception if n != n.toLowerCase =>
          try resolve0(n.toLowerCase)
          catch { case _: Exception => throw e }
      }
    // planner hints (/*+ SORT_FOR_GROUP() */ etc., sql.y hint_list):
    // advisory on the reference, and Catalyst does its own planning —
    // strip them rather than fail the statement
    val deHinted =
      normalizeDoubleQuotes(sql).replaceAll("/\\*\\+.*?\\*/", " ")
    // statement terminator (taos shell / test scripts end every
    // statement with `;`): strip before clause parsing, where a
    // trailing `;` would otherwise glue onto a LIMIT count or duration
    val norm0 = padDatetimeLiterals(
      rewriteJsonArrow(deHinted.replaceAll("\\s+", " ").trim
        .replaceAll(";+\\s*$", "")), tsCol)
    // `_c0` is the reference's first-column pseudonym — always the
    // primary ts key here (in_subq2 specSqls `where _c0 between …`);
    // masked so a string literal containing `_c0` is untouched
    val norm = maskingLiterals(norm0)(
      _.replaceAll("(?i)(?<![\\w])_c0(?![\\w])", tsCol))
    val segments = splitUnion(norm)
    if (segments.length == 1)
      return single(spark, resolve, norm, tsCol, perSecond)
    // hoist the union-level tail clauses off the LAST branch
    val lastRaw = segments.last._1
    val tailAt = topLevelIndex(lastRaw.toUpperCase, "ORDER BY")
      .orElse(topLevelIndex(lastRaw.toUpperCase, "LIMIT"))
    val lastSql = tailAt.fold(lastRaw)(i => lastRaw.substring(0, i).trim)
    val frames = (segments.init.map(_._1) :+ lastSql)
      .map(s0 => single(spark, resolve, s0, tsCol, perSecond))
    // fold left-to-right; dedup binds to its own UNION per SQL rules.
    // UNION is POSITIONAL (sql.y set_quantifier — branch column names
    // may differ, e.g. `a.ts` union `b.ts`; output names come from
    // the first branch)
    var res = frames.head
    segments.tail.zip(frames.tail).foreach { case ((_, all), f) =>
      require(f.columns.length == res.columns.length,
        s"UNION branches have ${res.columns.length} vs " +
          s"${f.columns.length} columns")
      res = res.union(f)
      if (!all) res = res.dropDuplicates()
    }
    tailAt.foreach { i =>
      val tc = clauses("SELECT _ FROM _ " + lastRaw.substring(i).trim)
      tc.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
      tc.get("LIMIT").foreach(n => res = applyLimit(res, n))
    }
    res
  }

  /** The reference's datetime parser accepts loose field widths
    * ('2024-1-1 8:1:40.5', taosParseTime) — Spark's to_timestamp does
    * not. Literals are static, so pad YY-M-D H:M[:S[.f]] quoted
    * literals to the canonical two-digit form at rewrite time — but
    * ONLY when the literal sits in a temporal position: a date-shaped
    * VARCHAR value ('2024-1-5' compared to a string column, or in an
    * INSERT value list) must keep its exact text, so the rewrite
    * requires the ts column / a window pseudo-column / a temporal
    * function in the literal's immediate context. */
  private[graft] def padDatetimeLiterals(s: String,
      tsCol: String = "ts"): String = {
    if (s.toUpperCase.startsWith("INSERT")) return s
    val re = ("'(\\d{4})-(\\d{1,2})-(\\d{1,2})" +
      "(?:([ T])(\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(\\.\\d+)?)?)?'").r
    val temporal = ("(?i)(?<![A-Za-z0-9_])(" +
      java.util.regex.Pattern.quote(tsCol) +
      "|_wstart|_wend|_rowts|_irowts|_qstart|_qend|range|every" +
      "|between|timetruncate|timediff|to_timestamp|timestamp" +
      "|cast)(?![A-Za-z0-9_])").r
    re.replaceAllIn(s, m => {
      def p(x: String) = f"${x.toInt}%02d"
      val d = s"${m.group(1)}-${p(m.group(2))}-${p(m.group(3))}"
      val t = if (m.group(4) == null) "" else {
        val sec = if (m.group(7) == null) "00" else p(m.group(7))
        val frac = Option(m.group(8)).getOrElse("")
        s" ${p(m.group(5))}:${p(m.group(6))}:$sec$frac"
      }
      val padded = s"'$d$t'"
      val keep = java.util.regex.Matcher.quoteReplacement(m.matched)
      if (padded == m.matched)
        keep // already canonical: no semantic question to answer
      else {
        val lo = math.max(0, m.start - 48)
        val hi = math.min(s.length, m.end + 48)
        if (temporal.findFirstIn(s.substring(lo, hi)).isDefined)
          java.util.regex.Matcher.quoteReplacement(padded)
        else keep
      }
    })
  }

  /** Split on top-level UNION [ALL]; returns (branchSql, isUnionAll)
    * where the flag describes the operator BEFORE the branch. */
  private def splitUnion(norm: String): Seq[(String, Boolean)] = {
    val up = norm.toUpperCase
    val out = Seq.newBuilder[(String, Boolean)]
    var start = 0
    var i = 0
    var depth = 0; var inStr = false
    var prevAll = true
    while (i < up.length) {
      val ch = up(i)
      // a doubled quote inside a literal ('it''s') is an escape, not a
      // close-reopen: consume both and stay in-string
      if (inStr) {
        if (ch == '\'' && i + 1 < up.length && up(i + 1) == '\'') i += 2
        else { if (ch == '\'') inStr = false; i += 1 }
      }
      else ch match {
        case '\'' => inStr = true; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case 'U' if depth == 0 && up.startsWith("UNION ", i) &&
            (i == 0 || !up(i - 1).isLetterOrDigit && up(i - 1) != '_') =>
          val isAll = up.startsWith("UNION ALL ", i)
          out += ((norm.substring(start, i).trim, prevAll))
          prevAll = isAll
          i += (if (isAll) "UNION ALL ".length else "UNION ".length)
          start = i
        case _ => i += 1
      }
    }
    out += ((norm.substring(start).trim, prevAll))
    out.result()
  }

  /** FROM ( <dialect query> ) [alias] — subquery table expressions
    * (sql.y:3095-3100): the parenthesized text recurses through
    * [[query]] (so set-ops/windows nest); the alias is accepted and
    * ignored — the dialect's column namespace stays flat, so inner
    * columns are referenced unqualified. Returns None when FROM is not
    * parenthesized (bare table / join forms). */
  private def subqueryFrom(spark: SparkSession,
      resolve: String => DataFrame, from: String, tsCol: String,
      perSecond: Long): Option[DataFrame] = {
    val t = from.trim
    if (!t.startsWith("(")) return None
    var depth = 0; var inStr = false; var close = -1; var i = 0
    while (close < 0 && i < t.length) {
      val ch = t(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) close = i
        case _ =>
      }
      i += 1
    }
    require(close > 0, s"unbalanced parens in FROM: $from")
    val rest = t.substring(close + 1).trim
    require(rest.isEmpty || rest.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"FROM subquery takes at most an alias after ')': $rest")
    Some(query(spark, resolve, t.substring(1, close), tsCol, perSecond))
  }

  /** Chained multi-table joins (`t1 JOIN t2 ON … JOIN t3 ON …`, or a
    * 3+-table comma list — TPC-H-shaped reference tests): the two-side
    * `r_` flattening cannot name three payloads, and Spark SQL resolves
    * qualified refs natively, so the whole statement delegates: each
    * table registers as a temp view, the dialect rewrites
    * (sum/avg-DECIMAL, time scalars) apply per clause, Spark plans the
    * join tree (+AQE). Views drop after the plan resolves. Returns None
    * for anything with dialect-specific clauses or <3 tables. */
  /** `(a ASOF/WINDOW JOIN b …) JOIN c ON …` — a special join chained
    * into further regular joins (test_join_full.py:6527). The special
    * join plans through [[fromClause]] (preserved side bare, probe
    * side `r_`-prefixed), registers as a temp view, alias qualifiers
    * rewrite (`a.x` → `view.x`, `b.x` → `view.r_x`) across every
    * clause, and the remaining plain-join chain delegates to Spark
    * SQL. Returns None when FROM is not this shape. */
  private def specialJoinChain(spark: SparkSession,
      resolve: String => DataFrame, c0: Map[String, String],
      tsCol: String, perSecond: Long): Option[DataFrame] = {
    val from = c0("FROM").trim
    val up = from.toUpperCase
    if (!up.contains("ASOF JOIN") && !up.contains("WINDOW JOIN"))
      return None
    val joinKw = ("(?i)^(LEFT|RIGHT|FULL|INNER|CROSS|JOIN)\\b").r
    var inner: String = null
    var chain: String = null
    if (from.startsWith("(")) {
      var depth = 0; var inStr = false; var close = -1; var i = 0
      while (close < 0 && i < from.length) {
        val ch = from(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      if (close < 0) return None
      val in0 = from.substring(1, close).trim
      if (!in0.toUpperCase.contains("ASOF JOIN") &&
          !in0.toUpperCase.contains("WINDOW JOIN")) return None
      var rest = from.substring(close + 1).trim
      // optional derived alias before the chain keyword
      if (rest.nonEmpty && joinKw.findFirstIn(rest).isEmpty) {
        val sp = rest.indexOf(' ')
        if (sp < 0) return None
        rest = rest.substring(sp + 1).trim
      }
      if (joinKw.findFirstIn(rest).isEmpty) return None
      inner = in0
      chain = rest
    } else {
      // bare form: the chain starts at the first top-level JOIN token
      // after the WINDOW_OFFSET(...) close (+ optional JLIMIT)
      val wom = "(?i)\\bWINDOW_OFFSET\\s*\\([^)]*\\)".r
        .findFirstMatchIn(from).getOrElse(return None)
      var at = wom.end
      val jl = "(?i)^\\s*JLIMIT\\s+\\d+".r
        .findFirstMatchIn(from.substring(at))
      jl.foreach(m => at += m.end)
      val tail = from.substring(at)
      val j = "(?i)\\s(LEFT\\s+|RIGHT\\s+|FULL\\s+|INNER\\s+)?JOIN\\s".r
        .findFirstMatchIn(tail).getOrElse(return None)
      inner = from.substring(0, at + j.start).trim
      chain = tail.substring(j.start).trim
    }
    val sides = joinQualSides(inner).getOrElse(return None)
    val innerDf = fromClause(resolve, inner, tsCol, perSecond)
    val syn = s"_sj${chainSeq.incrementAndGet()}"
    def fixQuals(s: String): String = maskingLiterals(s) { s1 =>
      var acc = s1
      sides._2.foreach { q =>
        acc = ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(q) +
          "\\.(\\w+)").r.replaceAllIn(acc, m =>
          java.util.regex.Matcher.quoteReplacement(
            if (innerDf.columns.contains("r_" + m.group(1)))
              s"$syn.r_${m.group(1)}"
            else s"$syn.${m.group(1)}"))
      }
      sides._1.foreach { q =>
        acc = ("(?i)(?<![\\w.])" + java.util.regex.Pattern.quote(q) +
          "\\.").r.replaceAllIn(acc,
          java.util.regex.Matcher.quoteReplacement(s"$syn."))
      }
      acc
    }
    val c2 = c0.map { case (k, v) =>
      if (k == "FROM") k -> s"$syn ${fixQuals(chain)}"
      else k -> fixQuals(v)
    }
    val resolve2: String => DataFrame = n =>
      if (n.equalsIgnoreCase(syn)) innerDf else resolve(n)
    chainedJoinSql(spark, resolve2, c2, tsCol, perSecond, force = true)
  }

  private def chainedJoinSql(spark: SparkSession,
      resolve: String => DataFrame, c: Map[String, String],
      tsCol: String, perSecond: Long,
      force: Boolean = false): Option[DataFrame] = {
    val from = c("FROM")
    val up = from.toUpperCase
    if (Seq("ASOF", "WINDOW_OFFSET").exists(up.contains)) return None
    val dialectKws = Seq("PARTITION BY", "INTERVAL", "SLIDING",
      "SESSION", "STATE_WINDOW", "COUNT_WINDOW", "EVENT_WINDOW",
      "ANOMALY_WINDOW", "EXTERNAL_WINDOW", "FILL", "RANGE", "EVERY",
      "SLIMIT", "SOFFSET", "SURROUND", "EXTEND", "ZEROTH_STATE",
      "TRUE_FOR")
    if (dialectKws.exists(c.contains)) return None
    val joinCount = "(?i)\\bJOIN\\b".r.findAllIn(up).length
    val commaTables =
      if (joinCount == 0 &&
          splitArgs(from).length >= (if (force) 2 else 3) &&
          splitArgs(from).forall(p =>
            "^[A-Za-z_][A-Za-z0-9_.]*( +[A-Za-z_][A-Za-z0-9_]*)?$".r
              .matches(p.trim))) splitArgs(from).map(_.trim)
      else Nil
    if (!force && joinCount < 2 && commaTables.isEmpty) return None
    if (force && commaTables.isEmpty && joinCount == 0) return None
    // table tokens: the leading token plus the token after every JOIN
    val tbls: Seq[String] =
      if (commaTables.nonEmpty) commaTables.map(_.split("\\s+")(0))
      else {
        val afterJoin = "(?i)\\bJOIN\\s+([A-Za-z_][A-Za-z0-9_.]*)".r
          .findAllMatchIn(from).map(_.group(1)).toSeq
        from.trim.split("\\s+").headOption.toSeq ++ afterJoin
      }
    if (tbls.exists(!_.matches("[A-Za-z_][A-Za-z0-9_.]*"))) return None
    // register under UNIQUE synthetic view names (never the bare table
    // names, which could silently shadow-and-drop a user's session temp
    // view, and race between concurrent chained-join queries); the
    // FROM text is rewritten to `<synthetic> <alias>`, keeping the
    // original bare name as the alias when none was written so that
    // qualified refs in ON/SELECT/WHERE still resolve
    val uniq = chainSeq.incrementAndGet()
    val viewOf = tbls.distinct.map { t =>
      val syn = s"_cj${uniq}_${t.split("\\.").last}"
      resolve(t).createOrReplaceTempView(syn)
      t -> syn
    }
    val views = viewOf.map(_._2)
    try {
      // a db-qualified table (db.tbl in FROM) may be referenced as
      // `db.tbl.col` in ON/SELECT/WHERE/…; the synthetic view only
      // resolves via the bare alias, so every `db.tbl.` column
      // qualifier rewrites to `tbl.` across ALL clauses (the pre-r15
      // replace-everywhere behavior, scoped to qualifiers)
      val dbQual = viewOf.map(_._1).filter(_.contains("."))
      def fixQuals(s: String): String = maskingLiterals(s) { s0 =>
        dbQual.foldLeft(s0) { (acc, t) =>
          val q = java.util.regex.Pattern.quote(t + ".")
          val alias = t.split("\\.").last + "."
          ("(?i)(?<![\\w.])" + q).r.replaceAllIn(acc,
            java.util.regex.Matcher.quoteReplacement(alias))
        }
      }
      def rw(k: String): Option[String] =
        c.get(k).map(v => rewriteFuncs(fixQuals(v), tsCol, perSecond))
      val fromTxt = viewOf.foldLeft(from) { case (f, (t, syn)) =>
        val q = java.util.regex.Pattern.quote(t)
        val lead = "(?i)(^|,\\s*|\\bJOIN\\s+)"
        // occurrence WITH an explicit alias keeps that alias
        val withAlias = (lead + q +
          "\\s+(?:(?i:AS)\\s+)?(?!(?i:JOIN|INNER|LEFT|RIGHT|FULL|" +
          "CROSS|SEMI|ANTI|ON)\\b)([A-Za-z_]\\w*)").r
        val f2 = withAlias.replaceAllIn(f, m =>
          java.util.regex.Matcher.quoteReplacement(
            s"${m.group(1)}$syn ${m.group(2)}"))
        // bare occurrence gains the original name as its alias
        val bare = (lead + q + "(?![\\w.])").r
        bare.replaceAllIn(f2, m =>
          java.util.regex.Matcher.quoteReplacement(
            s"${m.group(1)}$syn ${t.split("\\.").last}"))
      }
      val stmt = Seq(
        Some(s"SELECT ${rw("SELECT").get}"),
        Some(s"FROM ${fixQuals(fromTxt)}"),
        rw("WHERE").map(w => s"WHERE $w"),
        c.get("GROUP BY").map(g => s"GROUP BY ${fixQuals(g)}"),
        rw("HAVING").map(h => s"HAVING $h"),
        rw("ORDER BY").map(o => s"ORDER BY $o")
      ).flatten.mkString(" ")
      var res = spark.sql(stmt)
      c.get("OFFSET").foreach(m => res = res.offset(m.trim.toInt))
      c.get("LIMIT").foreach(n => res = applyLimit(res, n))
      Some(res)
    } finally views.foreach(spark.catalog.dropTempView(_))
  }

  /** Alias sets of the two join sides of a FROM clause — (bare-output
    * side, `r_`-prefixed side) per the join lowerings' column naming.
    * RIGHT SEMI/ANTI/ASOF/WINDOW forms mirror the preserved side, so
    * their sets swap; a single `tbl alias` FROM yields (aliases, ∅).
    * None when the FROM names no alias to resolve. */
  private def joinQualSides(from: String)
      : Option[(Set[String], Set[String])] = {
    val up = from.toUpperCase
    val kws = Seq(" LEFT SEMI JOIN ", " RIGHT SEMI JOIN ",
      " LEFT ANTI JOIN ", " RIGHT ANTI JOIN ", " LEFT ASOF JOIN ",
      " RIGHT ASOF JOIN ", " ASOF JOIN ", " LEFT WINDOW JOIN ",
      " RIGHT WINDOW JOIN ", " WINDOW JOIN ", " LEFT JOIN ",
      " RIGHT JOIN ", " FULL JOIN ", " INNER JOIN ", " JOIN ")
    def sideToks(txt: String): Set[String] =
      txt.trim.split("\\s+").take(2).map(_.toLowerCase)
        .filterNot(_ == "as").filter(_.matches("[a-z_][a-z0-9_.]*"))
        .map(_.split("\\.").last).toSet
    kws.flatMap { k =>
      val i = up.indexOf(k); if (i >= 0) Some((i, k)) else None
    }.sortBy(_._1).headOption match {
      case Some((i, k)) =>
        val rAll = from.substring(i + k.length)
        val stop = Seq(" ON ", " WINDOW_OFFSET", " JLIMIT")
          .map { s =>
            val j = rAll.toUpperCase.indexOf(s)
            if (j < 0) rAll.length else j
          }.min
        val l = sideToks(from.substring(0, i))
        val r = sideToks(rAll.substring(0, stop))
        val mirrored = k.startsWith(" RIGHT") && !k.contains("RIGHT JOIN")
        Some(if (mirrored) (r, l) else (l, r))
      case None =>
        val toks = from.trim.split("\\s+")
        // single table, with or without alias: its (unqualified) name
        // and alias both qualify the bare columns
        if (toks.length <= 2 && toks.nonEmpty &&
            toks.forall(_.matches("(?i)[A-Za-z_][A-Za-z0-9_.]*")))
          Some((sideToks(from), Set.empty[String]))
        else None
    }
  }

  /** Joins over derived tables (`FROM (SELECT …) a JOIN (SELECT …) b
    * ON …`, `(SELECT …) a, tbl b WHERE …`, subquery on either side of
    * ASOF/WINDOW joins — test_join.py leans on all of these): every
    * top-level `(SELECT …)` group is planned via [[query]] and
    * replaced by a synthetic name resolving to its DataFrame, so the
    * normal table-join paths apply unchanged. Returns None for the
    * single bare `(SELECT …) [alias]` form (the dedicated
    * [[subqueryFrom]] path) and for subquery-free FROMs. */
  private def inlineFromSubqueries(spark: SparkSession,
      resolve: String => DataFrame, from: String, tsCol: String,
      perSecond: Long): Option[(String, String => DataFrame)] = {
    val t = from.trim
    var groups = Vector.empty[(Int, Int)]
    var depth = 0; var inStr = false; var i = 0; var start = -1
    while (i < t.length) {
      val ch = t(i)
      if (inStr) { if (ch == '\'') inStr = false }
      else ch match {
        case '\'' => inStr = true
        case '(' => if (depth == 0) start = i; depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0 && start >= 0) { groups :+= ((start, i)); start = -1 }
        case _ =>
      }
      i += 1
    }
    if (depth != 0) return None // unbalanced: let subqueryFrom report
    val selGroups = groups.filter { case (s, e) =>
      // `(SELECT …)` or a parenthesized union `((SELECT …) UNION …)`
      t.substring(s + 1, e).trim.toUpperCase
        .dropWhile(ch => ch == '(' || ch == ' ').startsWith("SELECT") }
    if (selGroups.isEmpty) return None
    if (selGroups.length == 1 && selGroups.head._1 == 0 &&
        t.substring(selGroups.head._2 + 1).trim
          .matches("([A-Za-z_][A-Za-z0-9_]*)?")) return None
    val out = new StringBuilder; var pos = 0
    val sub = scala.collection.mutable.Map.empty[String, DataFrame]
    selGroups.zipWithIndex.foreach { case ((s, e), idx) =>
      out.append(t.substring(pos, s))
      val name = s"_sq$idx"
      sub(name) = query(spark, resolve, t.substring(s + 1, e), tsCol,
        perSecond)
      out.append(name)
      pos = e + 1
    }
    out.append(t.substring(pos))
    // `AS alias` after a group: AS is not part of a table token
    val newFrom = "(?i)\\b(_sq\\d+)\\s+AS\\s+".r
      .replaceAllIn(out.toString, m => m.group(1) + " ")
    Some((newFrom,
      (n: String) => sub.getOrElse(n.toLowerCase, resolve(n))))
  }

  /** Inline `WINDOW w AS (spec)[, w2 AS (spec2)…]` (sql.y:3002-3015):
    * each `rank() OVER w` becomes `rank() OVER (spec)` before the
    * `expr()` leaf hand-off — the same named-spec resolution
    * windowfuncoperator.c:1980 performs at plan time. The WINDOW
    * clause itself is cut from the text (it sits between HAVING and
    * ORDER BY, so the surrounding clauses re-join cleanly). */
  private def inlineNamedWindows(norm: String): String = {
    val upper = norm.toUpperCase
    // `WINDOW JOIN` (the join operator, JoinOps) also spells WINDOW at
    // top level — only a `WINDOW <name> AS (` occurrence is the
    // named-window clause
    @annotation.tailrec
    def findClause(base: Int): Option[Int] =
      topLevelIndex(upper.substring(base), "WINDOW") match {
        case None => None
        case Some(rel) =>
          val i = base + rel
          val after = upper.substring(i + "WINDOW".length).trim
          if (after.startsWith("JOIN")) findClause(i + "WINDOW".length)
          else Some(i)
      }
    val at = findClause(0).getOrElse(return norm)
    val defs = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = at + "WINDOW".length
    var done = false
    while (!done) {
      while (i < norm.length && norm(i) == ' ') i += 1
      val nm0 = i
      while (i < norm.length &&
          (norm(i).isLetterOrDigit || norm(i) == '_')) i += 1
      val nm = norm.substring(nm0, i)
      require(nm.nonEmpty, s"WINDOW clause needs a name: $norm")
      while (i < norm.length && norm(i) == ' ') i += 1
      require(upper.startsWith("AS", i) ,
        s"WINDOW $nm needs AS (spec): $norm")
      i += 2
      while (i < norm.length && norm(i) == ' ') i += 1
      require(i < norm.length && norm(i) == '(',
        s"WINDOW $nm AS needs a parenthesized spec: $norm")
      var depth = 0; var close = -1; var j = i
      while (close < 0 && j < norm.length) {
        norm(j) match {
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = j
          case _ =>
        }
        j += 1
      }
      require(close > 0, s"unbalanced parens in WINDOW spec: $norm")
      defs(nm) = norm.substring(i + 1, close).trim
      i = close + 1
      while (i < norm.length && norm(i) == ' ') i += 1
      if (i < norm.length && norm(i) == ',') i += 1 else done = true
    }
    var out = (norm.substring(0, at) + norm.substring(i)).trim
    defs.foreach { case (nm, spec) =>
      out = out.replaceAll(
        s"(?i)\\bOVER\\s+${java.util.regex.Pattern.quote(nm)}\\b",
        java.util.regex.Matcher.quoteReplacement(s"OVER ($spec)"))
    }
    out
  }

  private def single(spark: SparkSession, resolve0: String => DataFrame,
      sql0: String, tsCol: String, perSecond: Long): DataFrame = {
    var resolve: String => DataFrame = resolve0
    // a UNION branch may arrive fully parenthesized
    // (`(SELECT …) UNION (SELECT …)`): unwrap before clause parsing
    var sql = sql0.trim
    while (sql.startsWith("(") && {
        var depth = 0; var inStr = false; var close = -1; var i = 0
        while (close < 0 && i < sql.length) {
          val ch = sql(i)
          if (inStr) { if (ch == '\'') inStr = false }
          else ch match {
            case '\'' => inStr = true
            case '(' => depth += 1
            case ')' => depth -= 1; if (depth == 0) close = i
            case _ =>
          }
          i += 1
        }
        close == sql.length - 1
      }) sql = sql.substring(1, sql.length - 1).trim
    def dur(t: String): Long = durNative(t, perSecond)
    // _rowts (builtins.c pseudo-column family): the row's primary ts
    val sqlR = sql.replaceAll(
      "(?i)(?<![A-Za-z0-9_])_rowts(?![A-Za-z0-9_])", tsCol)
    var c = clauses(inlineNamedWindows(sqlR))
    require(c.contains("SELECT"), "need SELECT")
    // ---- correlated scalar subqueries in the select list ----
    // `select (select avg(f1) from tb2 where f1 < a.f1) from tb1 a`
    // (reference 09-DataQuerying correlated cases): the subquery
    // references the OUTER alias, so the collect-once scalar lowering
    // cannot apply. Spark plans correlated scalar subqueries natively
    // (equi and non-equi) — register the referenced tables as temp
    // views and delegate the whole statement to spark.sql.
    if (c.contains("FROM") && hasCorrelatedScalarSub(c("SELECT")))
      return correlatedRoute(spark, resolve, sqlR, tsCol, perSecond)
    // FROM-less SELECT (parTranslater translateSelect without a
    // from_clause; the reference suite leans on `SELECT
    // server_version()`, `SELECT database()`, `SELECT 1+1`): one
    // output row of scalar expressions — a one-row local scan, no
    // table resolution, no shuffle
    if (!c.contains("FROM")) {
      require(
        !Seq("GROUP BY", "PARTITION BY", "INTERVAL", "HAVING")
          .exists(c.contains),
        s"FROM-less SELECT takes only scalar items: $sql")
      val asRe = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
      val cols = splitArgs(c("SELECT")).map(_.trim).map { it =>
        val (e0, al) = it match {
          case asRe(e, a) => (e.trim, a)
          case e => (e, e)
        }
        expr(rewriteFuncs(e0, tsCol, perSecond)).as(al)
      }
      var res = spark.range(1).select(cols: _*)
      // `SELECT 1 WHERE 1=2` is legal (a constant filter over the
      // one-row frame — zero or one output rows)
      c.get("WHERE").foreach(w =>
        res = res.filter(expr(rewriteFuncs(w, tsCol, perSecond))))
      c.get("LIMIT").foreach(n => res = applyLimit(res, n))
      return res
    }
    require(c.contains("FROM"), "need SELECT/FROM")
    // derived-table joins: plan each top-level (SELECT …) group and
    // swap in a synthetic resolvable name, so the comma-join and JOIN
    // paths below see plain table tokens
    inlineFromSubqueries(spark, resolve0, c("FROM"), tsCol, perSecond)
      .foreach { case (nf, r2) =>
        c = c.updated("FROM", nf)
        resolve = r2
      }
    // an ASOF/WINDOW join chained into a further regular JOIN
    // (test_join_full.py:6527 `(sta a left asof join sta b) join sta c
    // on b.ts = c.ts`, and the bare window form): plan the special
    // join first, expose it as a temp view (preserved side bare,
    // probe side r_), rewrite the alias qualifiers in every clause,
    // then delegate the remaining plain-join chain to Spark SQL
    specialJoinChain(spark, resolve, c, tsCol, perSecond)
      .foreach(return _)
    // 3+-table join chains delegate whole statements to Spark SQL
    chainedJoinSql(spark, resolve, c, tsCol, perSecond)
      .foreach(return _)
    // ON-less INNER JOIN (`t1 a JOIN t2 b WHERE a.k = b.k` — the
    // reference translates it exactly like the comma form): rewrite to
    // the comma spelling so the WHERE hoisting below keys it. The
    // alias token must not be a join-direction keyword, so LEFT/RIGHT/
    // FULL/… JOINs never match (those keep their ON requirement).
    val noOnRe = ("(?i)^\\s*([A-Za-z_][\\w.]*(?:\\s+(?!(?i:LEFT|RIGHT|" +
      "FULL|INNER|CROSS|SEMI|ANTI|ASOF|WINDOW)\\b)[A-Za-z_]\\w*)?)\\s+" +
      "(?:INNER\\s+)?JOIN\\s+([A-Za-z_][\\w.]*" +
      "(?:\\s+[A-Za-z_]\\w*)?)\\s*$").r
    c("FROM") match {
      case noOnRe(l, r) if c.contains("WHERE") =>
        c = c.updated("FROM", s"$l, $r")
      case _ =>
    }
    // comma-join (sql.y table_reference_list): FROM t1 [a], t2 [b]
    // WHERE a.k = b.k … — the classic inner-join spelling. Rewritten
    // to JOIN … ON by hoisting the cross-table equality conjuncts out
    // of the WHERE clause; everything else about the join (aliases,
    // residuals) then flows through the normal JOIN path.
    val fromParts = splitArgs(c("FROM"))
    if (fromParts.length > 1 &&
        fromParts.forall(p =>
          "^[A-Za-z_][A-Za-z0-9_.]*( [A-Za-z_][A-Za-z0-9_]*)?$".r
            .matches(p.trim))) {
      require(fromParts.length == 2,
        "comma-join supports two tables (chain JOIN … ON for more)")
      require(c.contains("WHERE"),
        "comma-join needs WHERE join conditions")
      def quals(p: String): Set[String] =
        p.trim.split("\\s+").map(_.toLowerCase)
          .map(_.split("\\.").last).toSet
      val (q1, q2) = (quals(fromParts(0)), quals(fromParts(1)))
      val conj = c("WHERE").split("(?i)\\s+AND\\s+").map(_.trim).toSeq
      val eqRe = "(?i)^(\\w+)\\.(\\w+)\\s*=\\s*(\\w+)\\.(\\w+)$".r
      val (joinConds, residual) = conj.partition {
        case eqRe(a, _, b, _) =>
          val (al, bl) = (a.toLowerCase, b.toLowerCase)
          (q1.contains(al) && q2.contains(bl)) ||
            (q2.contains(al) && q1.contains(bl))
        case _ => false
      }
      if (joinConds.isEmpty)
        // non-plain join condition (`t1.ts = timetruncate(t2.ts, 1a)`):
        // delegate the whole statement to Spark SQL over temp views
        chainedJoinSql(spark, resolve, c, tsCol, perSecond,
            force = true)
          .foreach(return _)
      require(joinConds.nonEmpty,
        s"comma-join needs a cross-table equality in WHERE: ${c("FROM")}")
      c = c.updated("FROM", s"${fromParts(0).trim} JOIN " +
        s"${fromParts(1).trim} ON ${joinConds.mkString(" AND ")}")
      // residual conjuncts keep their qualifiers in the source text;
      // the join output namespace is flat, so strip known ones
      val qualRe = ("(?i)\\b(" + (q1 ++ q2).mkString("|") +
        ")\\.(\\w+)").r
      val bareResidual = residual.map(r =>
        qualRe.replaceAllIn(r, m => m.group(2)))
      c = if (bareResidual.isEmpty) c - "WHERE"
        else c.updated("WHERE", bareResidual.mkString(" AND "))
    }
    var df = subqueryFrom(spark, resolve, c("FROM"), tsCol, perSecond)
      .getOrElse(fromClause(resolve, c("FROM"), tsCol, perSecond))
    // qualified references (`a.ts`, `b.col`, `b.*`) in the remaining
    // clauses resolve against the flattened join output: preserved
    // side bare, probe side `r_`-prefixed (equi keys stay bare), star
    // by side expansion. The FROM text itself keeps its qualifiers —
    // the join paths consumed them already.
    joinQualSides(c("FROM")).foreach { case (lq, rq) =>
      val leftStar = df.columns.filterNot(_.startsWith("r_"))
      val rightStar = df.columns.filter(_.startsWith("r_"))
      // case-insensitive: a case-mutated `T2.Value` must still find
      // r_value (fuzz-found silent-wrong-side resolution)
      def rCol(cc: String): Option[String] =
        df.columns.find(_.equalsIgnoreCase(s"r_$cc"))
      // merged equi keys of outer joins carry metadata naming which
      // side's value the flattened output LOST — a ref qualified by
      // that side must not silently read the preserved side's value
      def mergedLost(cc: String): Option[String] =
        df.schema.fields.find(_.name.equalsIgnoreCase(cc))
          .filter(_.metadata.contains("graft.merged_key_lost"))
          .map(_.metadata.getString("graft.merged_key_lost"))
      def failLost(q: String, cc: String): Nothing =
        throw new IllegalArgumentException(
          s"unsupported: $q.$cc refers to an outer-join equi key from " +
            "the NULL-producing side — the flattened join output keeps " +
            "only the preserved side's key value; select the key " +
            "unqualified (merged) or from the preserved side")
      def rw(txt0: String): String = {
        // count(q.*) counts the rows of q's side (parTranslater
        // count-star rewrite) — BEFORE the general rule would expand
        // it to a null-sensitive multi-arg count
        val txt = "(?i)\\bcount\\s*\\(\\s*([A-Za-z_]\\w*)\\.\\*\\s*\\)".r
          .replaceAllIn(txt0, m => {
            val q = m.group(1).toLowerCase
            if (lq.contains(q)) "count(*)"
            else if (rq.contains(q))
              rightStar.headOption.map(cn => s"count($cn)")
                .getOrElse("count(*)")
            else m.matched
          })
        "(?i)\\b([A-Za-z_]\\w*)\\.(\\*|[A-Za-z_]\\w*)".r
          .replaceAllIn(txt, m => {
            val q = m.group(1).toLowerCase; val cc = m.group(2)
            val rep =
              if (lq.contains(q)) {
                if (cc == "*") leftStar.mkString(", ")
                else if (mergedLost(cc).exists(s =>
                    s == "left" || s == "both")) failLost(q, cc)
                else cc
              } else if (rq.contains(q)) {
                if (cc == "*") rightStar.mkString(", ")
                else rCol(cc).getOrElse {
                  if (mergedLost(cc).exists(s =>
                      s == "right" || s == "both")) failLost(q, cc)
                  cc
                }
              } else m.matched
            java.util.regex.Matcher.quoteReplacement(rep)
          })
      }
      // `(SELECT …)` groups in WHERE/HAVING keep their own text: an
      // outer-alias qualifier inside a subquery is a correlated
      // reference the reference REJECTS ("Not supported subquery as
      // expr", ans/test_in_sub_query2.2.csv) — stripping it here
      // would silently decorrelate; the subquery's own aliases
      // resolve in its recursive [[query]] call instead
      def rwOutsideSubselects(s: String): String = {
        val groups = scala.collection.mutable.ArrayBuffer[String]()
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          if (s.charAt(i) == '(' &&
              s.substring(i + 1).dropWhile(_.isWhitespace)
                .toUpperCase.startsWith("SELECT")) {
            var depth = 0; var j = i; var endIdx = -1
            while (j < s.length && endIdx < 0) {
              val ch = s.charAt(j)
              if (ch == '(') depth += 1
              else if (ch == ')') {
                depth -= 1; if (depth == 0) endIdx = j
              }
              j += 1
            }
            if (endIdx < 0) endIdx = s.length - 1
            groups += s.substring(i, endIdx + 1)
            sb.append('\u0002').append(groups.length - 1)
              .append('\u0002')
            i = endIdx + 1
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        "\u0002(\\d+)\u0002".r.replaceAllIn(rw(sb.toString), m =>
          java.util.regex.Matcher.quoteReplacement(
            groups(m.group(1).toInt)))
      }
      c = c.map { case (k, v) =>
        if (k == "FROM") (k, v)
        else if (k == "SELECT")
          // a bare `q.c` item keeps `c` as its OUTPUT name (the
          // reference labels by column, not by the rewritten r_ name)
          (k, splitArgs(v).map { item =>
            val t = item.trim
            val qRef = "^([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)$".r
            t match {
              case qRef(q, cc)
                  if lq.contains(q.toLowerCase) ||
                    rq.contains(q.toLowerCase) =>
                s"${rw(t)} AS $cc"
              case _ => rw(item)
            }
          }.mkString(", "))
        else (k, rwOutsideSubselects(v)) }
    }
    // a window clause under a plain row projection (test_session.py:
    // `SELECT * FROM dev_001 SESSION(ts,1w)` returns the raw rows) has
    // no aggregates to window — drop the clause and project
    locally {
      val rawWindowKws = Seq("INTERVAL", "SLIDING", "SESSION",
        "STATE_WINDOW", "COUNT_WINDOW", "EVENT_WINDOW")
      if (rawWindowKws.exists(c.contains)) {
        val items = splitArgs(c("SELECT")).map(_.trim)
        val plain = items.nonEmpty && items.forall(it =>
          it == "*" || df.columns.contains(it))
        if (plain) c = c -- rawWindowKws
      }
    }
    // tbname on a regular (non-stable) read is that table's own name,
    // constant per row (parTranslater tbname rewrite; stable reads
    // already expose a real tbname column)
    if ("(?i)(?<![A-Za-z0-9_])tbname(?![A-Za-z0-9_])".r
        .findFirstIn(sqlR).isDefined && !df.columns.contains("tbname")) {
      val bare = c("FROM").trim
      // an UNQUOTED name lowercases at parse time in the reference, so
      // tbname for `FROM EvEnTs` is 'events', not the as-written text
      if ("^[A-Za-z_][A-Za-z0-9_.]*$".r.matches(bare))
        df = df.withColumn("tbname",
          lit(bare.split("\\.").last.toLowerCase))
    }
    // first(*) / last(*) / last_row(*) (parTranslater createAllColumns
    // path): one call per source column, named <fn>_<col>
    val starFn = "(?i)\\b(first|last_row|last)\\s*\\(\\s*\\*\\s*\\)".r
    if (starFn.findFirstIn(c("SELECT")).isDefined) {
      val sel2 = starFn.replaceAllIn(c("SELECT"), m => {
        val f = m.group(1).toLowerCase
        java.util.regex.Matcher.quoteReplacement(
          starCols(df).map(cn => s"$f($cn) AS ${f}_$cn").mkString(", "))
      })
      c = c.updated("SELECT", sel2)
    }
    // multi-column selection calls expand the same way
    // (test_fun_select_last.py:1221 `select first(ts, c1), last(c1) …`
    // positive — parTranslater expands each argument to its own call)
    val multiFn = ("(?i)^(first|last_row|last)\\s*" +
      "\\(\\s*([A-Za-z_]\\w*(?:\\s*,\\s*[A-Za-z_]\\w*)+)\\s*\\)$").r
    if (splitArgs(c("SELECT")).exists(it =>
          multiFn.findFirstIn(it.trim).isDefined)) {
      // expand ONLY when the call IS the whole select item — an
      // aliased (`first(ts, c1) AS x`) or nested spelling isn't a
      // reference-accepted form and must not be silently re-aliased
      val sel2 = splitArgs(c("SELECT")).map(_.trim).map {
        case multiFn(f0, args) =>
          val f = f0.toLowerCase
          args.split(",").map(_.trim)
            .map(a => s"$f($a) AS ${f}_$a").mkString(", ")
        case it => it
      }.mkString(", ")
      c = c.updated("SELECT", sel2)
    }
    // _qstart/_qend/_qduration (builtins.c:5211-5249; 20-select.md:292):
    // the WHERE clause's primary-ts range as INCLUSIVE bounds —
    // `ts < Y` contributes qend = Y-1 — defaulting to the full int64
    // range when no ts condition exists
    var qStart = Long.MinValue
    var qEnd = Long.MaxValue
    c.get("WHERE").foreach { w0 =>
      // `= ANY|SOME (sub)` ⟺ IN (sub), `<> ALL (sub)` ⟺ NOT IN (sub)
      // (test_quantified_sub4.py): route through the semi/anti-join
      // IN-subquery machinery; the ordering quantifiers fold below
      val w =
        "(?i)(?<![<>!=])(=|<>|!=)\\s*(ANY|SOME|ALL)\\s*\\(\\s*(?=SELECT\\b)"
        .r.replaceAllIn(w0, m =>
          (m.group(1), m.group(2).toUpperCase) match {
            case ("=", "ANY" | "SOME") => " IN ("
            case ("<>" | "!=", "ALL") => " NOT IN ("
            case _ => java.util.regex.Matcher
              .quoteReplacement(m.matched)
          })
      val (plain0, subs) = whereInSubqueries(w)
      val plain = plain0
        .map(rewriteRegexOps)
        .map(p => rewriteTsLiterals(p, tsCol, perSecond))
        // the full scalar-function surface applies in WHERE too
        // (timetruncate, week, sign, … — same rewrites as select items)
        .map(p => rewriteFuncs(p, tsCol, perSecond))
        .map(p => inlineExistsSubqueries(spark, resolve, p, tsCol, perSecond))
        .map(p => rewriteQuantifiedSubqueries(spark, resolve, p, tsCol,
          perSecond))
        .map(p => inlineScalarSubqueries(spark, resolve, p, tsCol, perSecond))
      val tsCmp = ("(?i)^\\s*" + java.util.regex.Pattern.quote(tsCol) +
        "\\s*(>=|<=|<|>|=)\\s*(-?\\d+)L?\\s*$").r
      val tsBetween = ("(?i)^\\s*" + java.util.regex.Pattern.quote(tsCol) +
        "\\s+BETWEEN\\s+(-?\\d+)L?\\s+AND\\s+(-?\\d+)L?\\s*$").r
      // plain items may still hold top-level AND chains (the subquery
      // splitter only splits when an IN-subquery is present)
      def conjuncts(t: String): Seq[String] = {
        val parts = Seq.newBuilder[String]
        var rest = t.trim
        var more = true
        while (more) topLevelIndex(rest.toUpperCase, "AND") match {
          case Some(i) =>
            parts += rest.substring(0, i).trim
            rest = rest.substring(i + 3).trim
          case None => parts += rest; more = false
        }
        // re-merge BETWEEN … AND …
        parts.result().foldLeft(Vector.empty[String]) { case (acc, p) =>
          val merge = acc.nonEmpty && {
            val up = acc.last.toUpperCase
            topLevelIndex(up, "BETWEEN").isDefined &&
              topLevelIndex(up, "AND").isEmpty
          }
          if (merge) acc.init :+ (acc.last + " AND " + p) else acc :+ p
        }
      }
      plain.flatMap(conjuncts).foreach {
        case tsCmp(op, v0) =>
          val v = v0.toLong
          op match {
            case ">=" => qStart = math.max(qStart, v)
            case ">" => qStart = math.max(qStart, v + 1)
            case "<=" => qEnd = math.min(qEnd, v)
            case "<" => qEnd = math.min(qEnd, v - 1)
            case "=" => qStart = math.max(qStart, v)
              qEnd = math.min(qEnd, v)
          }
        case tsBetween(a, b) =>
          qStart = math.max(qStart, a.toLong)
          qEnd = math.min(qEnd, b.toLong)
        case _ =>
      }
      if (plain.nonEmpty) df = df.filter(expr(plain.mkString(" AND ")))
      subs.foreach { case (lhs, negated, subSql) =>
        assertUncorrelated(subSql, c("FROM"))
        val sub = query(spark, resolve, subSql, tsCol, perSecond)
        require(sub.columns.length == 1,
          s"IN subquery must select exactly one column: $subSql")
        val vals = sub.select(sub.col(sub.columns.head).as("_insub"))
        if (!negated)
          df = df.join(vals, expr(lhs) === col("_insub"), "left_semi")
        else {
          // SQL NOT IN three-valued logic: one NULL in the subquery
          // empties the result; otherwise anti-join on equality
          val hasNull = vals.filter(col("_insub").isNull).limit(1)
            .count() > 0
          val isEmpty = !hasNull && vals.limit(1).count() == 0
          // three-valued logic on the lhs too: NULL NOT IN (non-empty
          // list) is UNKNOWN, so a NULL lhs row must be dropped — a
          // plain left_anti would keep it. NOT IN (empty) is TRUE for
          // every row, NULL lhs included, so the filter only applies
          // when the subquery returned rows.
          df = if (hasNull) df.limit(0)
          else if (isEmpty) df
          else df.filter(expr(lhs).isNotNull)
            .join(vals, expr(lhs) === col("_insub"), "left_anti")
        }
      }
    }

    if ("(?i)\\bFORECAST\\s*\\(".r.findFirstIn(c("SELECT")).isDefined)
      return forecastSelect(spark, df, c, tsCol, perSecond)
    if ("(?i)\\bIMPUTATION\\s*\\(".r.findFirstIn(c("SELECT")).isDefined)
      return imputationSelect(df, c, tsCol)
    if ("(?i)\\bANOMALYCHECK\\s*\\(".r.findFirstIn(c("SELECT")).isDefined)
      return anomalycheckSelect(df, c, tsCol)
    seriesSelect(df, c, tsCol, perSecond).foreach(r => return r)
    histogramSelect(df, c, tsCol).foreach(r => return r)

    // SELECT DISTINCT: flag + strip, applied after the projection
    val selectRaw = c("SELECT").trim
    val isDistinct = selectRaw.toUpperCase.startsWith("DISTINCT ")
    val afterDistinct =
      if (isDistinct) selectRaw.substring("DISTINCT ".length) else selectRaw
    // SELECT [SCALAR|AGG] … (sql.y:2832-2834 window_mode_opt, v3.4.2):
    // explicit window-query mode keyword — consumed here, applied at
    // the projection-mode decision after the window clause lowers
    val (winModeKw, selectBody0) =
      "(?i)^(SCALAR|AGG)\\s+(.+)$".r.findFirstMatchIn(afterDistinct.trim)
        match {
          case Some(m) => (Some(m.group(1).toUpperCase), m.group(2).trim)
          case None => (None, afterDistinct)
        }
    // cols() expands to several select items BEFORE the item split —
    // the expansion is comma-joined text at the item level. A mode
    // selector needs the per-(group keys, value) occurrence count as
    // a pre-pass window column — one keyed shuffle, shared by every
    // output of that cols() call
    var colsModeN = 0
    val selectBody = rewriteCall(selectBody0, "cols",
      a => expandColsArgs(a, tsCol,
        df.columns.filterNot(_.startsWith("_")).toSeq,
        sx => {
          colsModeN += 1
          val cn = s"_colsmode$colsModeN"
          val gk = (c.get("GROUP BY").toSeq ++
            c.get("PARTITION BY").toSeq).flatMap(splitArgs).map(_.trim)
          df = df.withColumn(cn, count(expr(sx)).over(
            Window.partitionBy(gk.map(expr) :+ expr(sx): _*)))
          cn
        }))
    var selectItems = splitArgs(selectBody).map { item =>
      val m = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
      // the reference also allows AS-less column aliases (`tbname tn`,
      // sql.y column_alias) — accept a trailing identifier as an alias
      // when the preceding text is a complete expression (ends in an
      // operand, not an operator/keyword) and the word itself can
      // legally be an alias
      val bare = "^(.*\\S)\\s+([A-Za-z_][A-Za-z0-9_]*)$".r
      val notAnAlias = Set("null", "true", "false", "end", "asc",
        "desc", "unknown", "preceding", "following", "row", "rows")
      val noAliasAfter = Set("and", "or", "not", "in", "like", "is",
        "between", "then", "else", "when", "case", "div", "mod", "xor",
        "escape", "match", "nmatch", "regexp", "from", "all",
        "distinct", "as", "union", "over")
      def completeExpr(e: String): Boolean = {
        val t = e.trim
        "[A-Za-z0-9_)'\"`*\\]]$".r.findFirstIn(t).isDefined &&
          !t.split("\\s+").lastOption.map(_.toLowerCase)
            .exists(noAliasAfter.contains) &&
          t.count(_ == '(') == t.count(_ == ')') &&
          t.count(_ == '\'') % 2 == 0
      }
      item match {
        case m(e, a) => (e.trim, a)
        case bare(e, a)
            if !notAnAlias(a.toLowerCase) && completeExpr(e) =>
          (e.trim, a)
        case e => (e.trim, e.trim)
      }
    }
    // expression partition keys (24-distinguished.md: part_list takes
    // any scalar expression) materialize as hidden columns, the same
    // treatment GROUP BY expressions get below. A bare ordinal names
    // the n-th select item and an output alias names its expression
    // (test_query_partitionby_basic.py `partition by 1 having …`,
    // `select t1 as t1_alias … partition by t1_alias`) — parsed after
    // the select items so both can resolve; `(1)` stays a constant
    // expression key (slice context only).
    val partExprRemap = Seq.newBuilder[(String, String)]
    val partCols = c.get("PARTITION BY").toSeq.flatMap(splitArgs)
      .zipWithIndex.map { case (k0, i) =>
        val kt = k0.trim
        val k =
          if (kt.matches("\\d+") && kt.toInt >= 1 &&
              kt.toInt <= selectItems.length)
            selectItems(kt.toInt - 1)._1.trim
          else selectItems.find { case (e, a) =>
            a.equalsIgnoreCase(kt) &&
              normExprKey(e) != normExprKey(a) }
            .map(_._1.trim).getOrElse(kt)
        if ("^[A-Za-z_][A-Za-z0-9_]*$".r.matches(k)) k
        else {
          val nm = s"_pk$i"
          df = df.withColumn(nm, expr(rewriteFuncs(k, tsCol, perSecond)))
          partExprRemap += (normExprKey(k) -> nm)
          nm
        }
      }
    partExprRemap.result().foreach { case (key, nm) =>
      selectItems = selectItems.map { case (e, a) =>
        if (normExprKey(e) == key) (nm, if (a == e) nm else a) else (e, a)
      }
    }

    // ---- INTERP: SELECT interp(col)[, interp(col2) …] … RANGE(…)
    // EVERY(step) FILL(m) — every interp column resamples at the same
    // grid points (timesliceoperator.c fills all slice columns per row).
    // RANGE forms (sql.y:3016-3023): RANGE(t0,t1) span; RANGE(p) single
    // point (EVERY optional); RANGE(p,dur) / RANGE(t0,t1,dur) carry an
    // around-interval that acts as the SURROUND bound.
    if (c.contains("RANGE")) {
      val interpPat = "(?i)^interp\\s*\\(\\s*(\\w+)\\s*\\)$".r
      // interp(EXPR) over a non-bare-column expression (legal in the
      // reference — translateInterp takes any scalar expr): project
      // the expression as a synthetic column first, then the bare-col
      // path below applies unchanged
      val interpAny = "(?i)^interp\\s*\\((.+)\\)$".r
      val exprSyn =
        scala.collection.mutable.LinkedHashMap[String, String]()
      val rItems = selectItems.map { case (e, a) =>
        val t = e.trim
        interpAny.findFirstMatchIn(t) match {
          case Some(m) =>
            val arg = m.group(1).trim
            val balancedArg =
              arg.count(_ == '(') == arg.count(_ == ')')
            if (!balancedArg || interpPat.matches(t)) (e, a)
            else {
              val syn = exprSyn.getOrElseUpdate(arg,
                s"_interp_e${exprSyn.size}")
              (s"interp($syn)", a)
            }
          case None => (e, a)
        }
      }
      val df0 = exprSyn.foldLeft(df) { case (d, (argTxt, syn)) =>
        d.withColumn(syn, expr(rewriteFuncs(argTxt, tsCol, perSecond)))
      }
      val interpCols = rItems.collect {
        case (e, _) if interpPat.matches(e.trim) =>
          interpPat.findFirstMatchIn(e.trim).get.group(1)
      }.distinct
      require(interpCols.nonEmpty,
        "RANGE needs an interp(col) select item")
      val valueCol = interpCols.head
      val rawRange = splitArgs(stripOuterParens(c("RANGE"))).map(_.trim)
      // now[()] ± duration bounds evaluate once, at plan time (the
      // reference binds `now` per query — parTranslater folds it to a
      // constant before execution)
      val nowRe = "(?i)^now\\s*(?:\\(\\s*\\))?\\s*(?:([-+])\\s*(\\S+))?$".r
      def tsArg(a: String): Long =
        nowRe.findFirstMatchIn(a) match {
          case Some(m) =>
            val base = System.currentTimeMillis() * (perSecond / 1000L)
            Option(m.group(1)) match {
              case Some("-") => base - dur(m.group(2))
              case Some(_) => base + dur(m.group(2))
              case None => base
            }
          case None if a.startsWith("'") =>
            // quoted digit strings are epoch ticks, same as unquoted
            // (the reference's ts literals accept both spellings)
            val inner = a.stripPrefix("'").stripSuffix("'").trim
            if (inner.matches("-?\\d+")) inner.toLong
            else tsLitTicks(a, perSecond).getOrElse(throw
              new IllegalArgumentException(s"bad RANGE timestamp: $a"))
          case None => a.toLong
        }
      val durArg = "(?i)^\\d+[buasmhdw]$".r
      val (t0, t1, aroundUs) = rawRange match {
        case Seq(p) => (tsArg(p), tsArg(p), 0L)
        case Seq(p, d) if durArg.matches(d) => (tsArg(p), tsArg(p), dur(d))
        case Seq(a, b) => (tsArg(a), tsArg(b), 0L)
        case Seq(a, b, d) => (tsArg(a), tsArg(b), dur(d))
        case other => throw new IllegalArgumentException(
          s"RANGE takes 1-3 args, got $other")
      }
      val step = c.get("EVERY").map(e => dur(stripOuterParens(e)))
        .getOrElse {
          require(t0 == t1, "RANGE(t0, t1) needs EVERY(step)")
          1L
        }
      // FILL(VALUE, v1[, v2 …]): one literal per interp column (a
      // single literal broadcasts — the same contract as windowed
      // FILL below); positional per-column modes. The positional modes
      // also take a per-column fallback list — FILL(PREV|NEXT|NEAR,
      // v1[, v2 …]) (sql.y:2956-2957) — used when the reference row
      // sits outside the search bound.
      def pick(vals: Seq[String], i: Int, what: String): Option[Double] = {
        require(vals.length == 1 || vals.length == interpCols.length,
          s"FILL($what…) takes 1 or ${interpCols.length} values, " +
            s"got ${vals.length}")
        fillConst((if (vals.length == 1) vals.head else vals(i)).trim)
      }
      def posMode(m: String): FillOps.FillMode = m.toUpperCase match {
        case "PREV" => FillOps.FillPrev
        case "NEXT" => FillOps.FillNext
        case _ => FillOps.FillNear
      }
      def modeFor(i: Int): (FillOps.FillMode, Option[Double]) =
        c.get("FILL").map(f =>
          splitArgs(stripOuterParens(f)) match {
            case Seq(m0) => (m0.toUpperCase match {
              case "NONE" => FillOps.FillNone
              // interp marks every grid point, so forced/non-forced NULL
              // coincide here (timesliceoperator.c:460 fills both the same)
              case "NULL" | "NULL_F" => FillOps.FillNull
              case "PREV" => FillOps.FillPrev
              case "NEXT" => FillOps.FillNext
              case "NEAR" => FillOps.FillNear
              case "LINEAR" => FillOps.FillLinear
              case other => throw new IllegalArgumentException(s"FILL $other")
            }, None)
            case s if s.head.matches("(?i)VALUE(_F)?") =>
              (pick(s.tail, i, "VALUE") match {
                case None => FillOps.FillNull
                case Some(d) => FillOps.FillValue(d)
              }, None)
            case s if s.head.matches("(?i)(PREV|NEXT|NEAR)") =>
              (posMode(s.head), pick(s.tail, i, s.head.toUpperCase))
            case other => throw new IllegalArgumentException(
              s"FILL ${other.mkString(",")}")
          }).getOrElse((FillOps.FillLinear, None))
      val (mode, fillFb0) = modeFor(0)
      // FILL(PREV|NEXT|NEAR) SURROUND(d [, v1[, v2 …]]) (sql.y:
      // 2954-2982): bound how far the fill reference may sit from the
      // grid point, with optional per-column fallback values
      val surround = c.get("SURROUND").map { sr =>
        require(mode == FillOps.FillPrev || mode == FillOps.FillNext ||
          mode == FillOps.FillNear,
          "SURROUND needs FILL(PREV|NEXT|NEAR)")
        val a = splitArgs(stripOuterParens(sr))
        (dur(a.head), a.tail)
      }
      def surroundValFor(i: Int): Option[Double] = surround match {
        case Some((_, vals)) if vals.nonEmpty => pick(vals, i, "SURROUND")
        case _ => None
      }
      // parTranslater.c:14758: RANGE around-interval and SURROUND are
      // the same bound through two spellings — never both
      require(aroundUs == 0L || surround.isEmpty,
        "Surrounding time and range interval cannot be provided together")
      require(aroundUs == 0L || mode == FillOps.FillPrev ||
        mode == FillOps.FillNext || mode == FillOps.FillNear,
        "Only PREV/NEXT/NEAR mode is supported with surrounding time")
      // ALL interp columns ride ONE union+carry pipeline (the prev/next
      // carry is row-level, identical for every column) —
      // FillOps.interpMulti; the previous per-column interp+equi-join
      // built a complete scan+grid+window pipeline per column (2x the
      // operators and wall-clock for 2 columns, measured r21).
      // _isfilled/_irowts_origin follow the first column's mode.
      var res = FillOps.interpMulti(df0, col(tsCol),
        interpCols.zipWithIndex.map { case (vc, i) =>
          val (modeI, fbI) = modeFor(i)
          (vc, modeI, surroundValFor(i).orElse(fbI))
        }, partCols, step, t0, t1,
        surroundUs = surround.map(_._1).getOrElse(aroundUs))
      // project to the select list: interp(col) → that column's value
      val cols = rItems.map {
        case (e, a) if interpPat.matches(e.trim) =>
          col(interpPat.findFirstMatchIn(e.trim).get.group(1)).as(a)
        case (e, a) => expr(e).as(a)
      }
      res = res.select(cols: _*)
      c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
      return res
    }

    // ---- per-row series functions (IndefRowsFunc family): PARTITION
    // BY + diff/csum/mavg returns a row stream, not an aggregate
    // (docs: `SELECT DIFF(current) FROM meters PARTITION BY tbname`).
    // Lowered to the same window-function forms as SeriesOps (exact
    // decimal csum/mavg accumulation). Keyless input would collapse an
    // unpartitioned window to one partition, so the keyless form stays
    // on the DataFrame API (SeriesOps + GlobalScan).
    val indefPat =
      "(?i)\\b(diff|csum|mavg|fill_forward|lag|lead|derivative)\\s*\\(".r
    val hasWindowClause = Seq("INTERVAL", "SESSION", "STATE_WINDOW",
      "COUNT_WINDOW", "EVENT_WINDOW", "ANOMALY_WINDOW").exists(c.contains)
    if (!hasWindowClause && !c.contains("GROUP BY") &&
        // an explicit OVER means the analytic-window surface owns the
        // call (lag(x) OVER w) — the pipeline rewrite would orphan the
        // OVER clause
        "(?i)\\bOVER\\b".r.findFirstIn(c("SELECT")).isEmpty &&
        selectItems.exists { case (e, _) =>
          indefPat.findFirstIn(e).isDefined }) {
      // derivative(x, interval, 1) drops the negative-slope ROWS
      // (22-function.md DERIVATIVE ignore_negative); collect the
      // output aliases to post-filter in either route
      val ignoreNegAliases = Seq.newBuilder[String]
      if (partCols.isEmpty) {
        // keyless: the whole table is ONE series — an unpartitioned
        // window would collapse to a single partition, so route
        // through the two-pass GlobalScan fold instead (sorted
        // partitions stay parallel; only effect records serialize).
        // "lead" is lag over the REVERSED order: a second scan pass.
        val calls = scala.collection.mutable
          .LinkedHashMap[(String, String), String]()
        def collectCalls(e: String): String = {
          var r = e
          Seq("diff", "csum", "mavg", "fill_forward", "lag", "lead",
            "derivative").foreach { fn =>
            r = rewriteCall(r, fn, a => {
              val name =
                calls.getOrElseUpdate((fn, a.trim), s"_ks${calls.size}")
              // lag/lead carry an optional default: coalesce on top
              if (fn == "lag" || fn == "lead")
                splitArgs(a).lift(2).map(d => s"coalesce($name, $d)")
                  .getOrElse(name)
              else name
            })
          }
          r
        }
        val items = selectItems.map { case (e, a) => (collectCalls(e), a) }
        def mkSpec(fn: String, argTxt: String, name: String)
            : (String, org.apache.spark.sql.Column, Long, String) =
          fn match {
            case "mavg" =>
              val parts = splitArgs(argTxt)
              require(parts.length == 2, s"mavg needs (col, k): $argTxt")
              (fn, expr(parts(0)), parts(1).trim.toLong, name)
            case "lag" | "lead" =>
              val parts = splitArgs(argTxt)
              ("lag", expr(parts(0)),
                parts.lift(1).map(_.trim.toLong).getOrElse(1L), name)
            case "derivative" =>
              val parts = splitArgs(argTxt)
              require(parts.length >= 2,
                s"derivative needs (col, interval[, ignore_neg]): $argTxt")
              if (parts.lift(2).exists(_.trim == "1"))
                ignoreNegAliases += name
              (fn, expr(parts(0)),
                durNative(parts(1).trim, perSecond), name)
            case "diff" =>
              // diff(col[, ignore_option]) — 0 none, 1 ignore
              // negative, 2 ignore null, 3 both (builtins.c diff
              // ignoreOption); the option rides in the k slot
              val parts = splitArgs(argTxt)
              val opt = parts.lift(1).map(_.trim.toLong).getOrElse(0L)
              require(opt >= 0L && opt <= 3L,
                s"diff ignore option must be 0-3: $argTxt")
              (fn, expr(parts(0)), opt, name)
            case _ => (fn, expr(argTxt), 0L, name)
          }
        val (fwd, rev) = calls.toSeq.partition(_._1._1 != "lead")
        // a row-id tiebreaker totalizes the order when ts collides
        // across the (merged) series — same contract as seriesSelect
        val tie = seriesTie(df, tsCol)
        var withSeries = df
        val fwdSpecs = fwd.map { case ((fn, a), n) => mkSpec(fn, a, n) }
        // diff dictates the row-count contract: its physical-first
        // row is silent (checkRows(rows-1)); mixing diff with other
        // indef functions is a reference ERROR (test_select_all.py:500
        // rejects diff+csum), so the drop applies only to pure-diff
        // selects — the mixed form is this engine's extension and
        // keeps every row
        val allDiff = rev.isEmpty && fwdSpecs.nonEmpty &&
          fwdSpecs.forall(_._1 == "diff")
        if (fwd.nonEmpty)
          withSeries = graft.ops.SeriesOps.keylessSeries(withSeries,
            col(tsCol), tie, fwdSpecs,
            dropFirst = allDiff,
            dropNullRows = allDiff &&
              fwdSpecs.forall(s => (s._3 & 2L) != 0L))
        if (rev.nonEmpty)
          withSeries = graft.ops.SeriesOps.keylessSeries(withSeries,
            col(tsCol), tie,
            rev.map { case ((fn, a), n) => mkSpec(fn, a, n) },
            descending = true)
        // pure-derivative selects drop NULL-output rows (null inputs
        // + the first non-null row): derivativeFunction skips null
        // rows, reference row count = non-null rows minus one
        if (rev.isEmpty && fwdSpecs.nonEmpty &&
            fwdSpecs.forall(_._1 == "derivative"))
          fwdSpecs.foreach(s =>
            withSeries = withSeries.filter(col(s._4).isNotNull))
        var res = withSeries.select(items.map { case (e, a) =>
          expr(e).as(a) }: _*)
        ignoreNegAliases.result().foreach(a =>
          res = res.filter(col(a).isNull || col(a) >= 0))
        c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
          positional = res.columns.toSeq): _*))
        c.get("OFFSET").foreach(m => res = res.offset(m.trim.toInt))
        c.get("LIMIT").foreach(n => res = applyLimit(res, n))
        return res
      }
      val partTxt = s"PARTITION BY ${partCols.mkString(", ")} "
      def over(frame: String) = s"OVER (${partTxt}ORDER BY $tsCol$frame)"
      val diffSpecs = Seq.newBuilder[(String, Int)]
      def rewriteSeries(e: String): String = {
        var r = e
        // lag/lead/derivative FIRST: the diff/derivative lowerings
        // below generate `lag(...)` text themselves, which a later
        // lag rewrite would wrap a second time
        Seq("lag", "lead").foreach { fn =>
          r = rewriteCall(r, fn, a => {
            val p = splitArgs(a)
            val off = p.lift(1).map(_.trim).getOrElse("1")
            val dft = p.lift(2).map(d => s", $d").getOrElse("")
            s"$fn(${p(0)}, $off$dft) ${over("")}"
          })
        }
        // derivative(x, interval, ignore_negative) (builtins.c:3603):
        // slope scaled to `interval` ticks of the surface precision
        // derivative skips NULL-input rows entirely (derivativeFunction
        // `continue`s), so the slope is vs the last NON-NULL row; the
        // NULL outputs (null inputs + the first non-null row) are
        // filtered below for pure-derivative selects — reference
        // row-count is N-1 non-null rows per partition
        // (test_fun_ts_derivative.py checkRows)
        r = rewriteCall(r, "derivative", a => {
          val p = splitArgs(a)
          require(p.length >= 2,
            s"derivative needs (col, interval[, ignore_neg]): $a")
          val x = p(0)
          val unit = durNative(p(1).trim, perSecond)
          val prec = over(" ROWS BETWEEN UNBOUNDED PRECEDING AND " +
            "1 PRECEDING")
          val prevV =
            s"last(CASE WHEN ($x) IS NOT NULL THEN ($x) END, true) $prec"
          val prevT = s"last(CASE WHEN ($x) IS NOT NULL THEN " +
            s"($tsCol) END, true) $prec"
          s"(CASE WHEN ($x) IS NULL THEN NULL ELSE " +
            s"CAST(($x) - $prevV AS DOUBLE) * ${unit}L / " +
            s"CAST(($tsCol) - $prevT AS DOUBLE) END)"
        })
        // diff(col[, ignore_option]): delta vs the last NON-NULL value
        // (setDoDiffResult keeps prev on null input); option bit 0
        // nulls negative deltas in place, bit 1 drops null-input rows
        // (applied below with the silent-first-row filter)
        r = rewriteCall(r, "diff", a => {
          val p = splitArgs(a)
          val x = p(0)
          val opt = p.lift(1).map(_.trim.toInt).getOrElse(0)
          require(opt >= 0 && opt <= 3,
            s"diff ignore option must be 0-3: $a")
          val prevNN = s"last(($x), true) ${over(
            " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING")}"
          val base =
            s"(CASE WHEN ($x) IS NULL THEN NULL ELSE ($x) - $prevNN END)"
          val out = if ((opt & 1) != 0)
            s"(CASE WHEN $base < 0 THEN NULL ELSE $base END)"
          else base
          // the spec records the RESULT expression: bit 1's row drop
          // filters on diff-result nullness (diffResultIsNull), not
          // input nullness — see the keep filter below
          diffSpecs += ((out, opt))
          out
        })
        r = rewriteCall(r, "csum", a =>
          s"CAST(CAST(sum(CAST(($a) AS DECIMAL(18,2))) " +
            s"${over(" ROWS UNBOUNDED PRECEDING")} AS DECIMAL(18,2)) AS DOUBLE)")
        r = rewriteCall(r, "mavg", a => {
          val parts = splitArgs(a)
          val x = parts(0); val n = parts(1).trim.toInt
          val f = s" ROWS BETWEEN ${n - 1} PRECEDING AND CURRENT ROW"
          s"(CASE WHEN count($x) ${over(f)} = $n THEN " +
            s"round(CAST(CAST(sum(CAST(($x) AS DECIMAL(18,2))) ${over(f)} " +
            s" AS DECIMAL(18,2)) AS DOUBLE) / $n, 6) END)"
        })
        // fill_forward(x) (builtins.c:8187, window-function family
        // :7996-8239): carry the last non-null value forward along the
        // ts order — Spark's last(x, ignoreNulls=true) over the
        // cumulative frame
        r = rewriteCall(r, "fill_forward", a =>
          s"last($a, true) ${over(" ROWS UNBOUNDED PRECEDING")}")
        // NOT rewriteFuncs: its sum/avg aggregate rewrites would
        // mangle the window expressions just generated
        r
      }
      val ignoreNeg = Seq.newBuilder[String]
      val derivAliases = Seq.newBuilder[String]
      selectItems.foreach { case (e, a) =>
        val m = "(?i)^derivative\\s*\\(".r.findFirstIn(e.trim)
        if (m.isDefined) {
          val (_, args, close) = analyticCallSpan(e.trim, "derivative")
          if (close == e.trim.length - 1) {
            derivAliases += a
            if (args.lift(2).exists(_.trim == "1")) ignoreNeg += a
          }
        }
      }
      // window items compute via withColumn, NOT in the same select as
      // a bare `c1` item — Spark's lateral-column-alias rule would
      // otherwise resolve the OVER's partition key against the alias
      // (`SELECT c1, csum(c1) … PARTITION BY c1` failed before)
      var work = df
      val finalItems = selectItems.zipWithIndex.map { case ((e, a), i) =>
        val r = rewriteSeries(e)
        if (r == e) (e, a)
        else {
          val tmp = s"_sr$i"
          work = work.withColumn(tmp, expr(r))
          (tmp, a)
        }
      }
      // pure-diff selects drop the silent physical-first row per
      // partition (checkRows(rows-1)); ignore-null (option bit 1)
      // additionally drops null-input rows. Mixed selects (diff +
      // csum/…) are a reference ERROR (test_select_all.py:500) kept
      // as an every-row extension here.
      val dSpecs = diffSpecs.result()
      val otherFam = Seq("lag", "lead", "derivative", "csum", "mavg",
        "fill_forward").exists(f =>
        s"(?i)\\b$f\\s*\\(".r.findFirstIn(c("SELECT")).isDefined)
      if (dSpecs.nonEmpty && !otherFam) {
        if (dSpecs.forall(s => (s._2 & 2) != 0)) {
          // ignore-null (bit 1): the reference drops rows whose diff
          // RESULT is null (diffFunctionByRow/diffResultIsNull) — that
          // covers null-input rows, the first NON-NULL row (even when
          // the partition starts with null inputs), and option 3's
          // bit-0-nulled negative deltas. The result expressions are
          // window functions, so materialize them as temp columns
          // before filtering (same window spec as the select items —
          // Catalyst collapses them into the one Window operator).
          val nn = dSpecs.zipWithIndex.map { case (s, i) => s"_dnn$i" }
          dSpecs.zip(nn).foreach { case ((e, _), n) =>
            work = work.withColumn(n, expr(e)) }
          work = work.filter(nn.map(col(_).isNotNull).reduce(_ || _))
            .drop(nn: _*)
        } else {
          // no ignore-null: only the physical first row per partition
          // is silent (checkRows(rows-1))
          work = work.withColumn("_diffrn", row_number().over(
            Window.partitionBy(partCols.map(col): _*)
              .orderBy(col(tsCol).asc +: seriesTie(df, tsCol)
                .map(_.asc): _*)))
            .filter(col("_diffrn") > 1).drop("_diffrn")
        }
      }
      var res = work.select(finalItems.map { case (e, a) =>
        expr(e).as(a) }: _*)
      // pure-derivative selects drop the NULL-output rows (null
      // inputs + the first non-null row per partition) —
      // derivativeFunction skips null rows and the reference's row
      // count is non-null-rows-minus-one (checkRows(rows-1));
      // ignore_negative=1 drops the negative-slope ROWS. Mixed
      // selects keep the engine's every-row extension convention.
      val dvAll = derivAliases.result()
      val pureDeriv = dvAll.nonEmpty &&
        Seq("lag", "lead", "diff", "csum", "mavg", "fill_forward")
          .forall(f => s"(?i)\\b$f\\s*\\(".r
            .findFirstIn(c("SELECT")).isEmpty)
      if (pureDeriv)
        dvAll.foreach(a => res = res.filter(col(a).isNotNull))
      ignoreNeg.result().foreach(a =>
        res = res.filter(col(a).isNull || col(a) >= 0))
      c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
        positional = res.columns.toSeq): _*))
      c.get("OFFSET").foreach(m => res = res.offset(m.trim.toInt))
      c.get("LIMIT").foreach(n => res = applyLimit(res, n))
      return res
    }

    // ---- indefinite-rows functions PER INTERVAL WINDOW, with FILL ----
    // (test_fun_ts_interval_fill.py, feature "Since: 3.4.1.0"): the
    // function RESETS at each window boundary — per-row outputs tagged
    // with `_wstart` — and FILL(NULL/VALUE[_F]) inserts ONE row per
    // query-range window whose function OUTPUT is empty (a gap window,
    // or e.g. a one-row window under diff, which emits N-1 rows).
    // FILL(NONE)/no FILL emits data windows only; with no data in the
    // range the non-forced modes return zero rows while NULL_F/VALUE_F
    // still fill the whole grid. PREV/NEXT/LINEAR are rejected exactly
    // as the reference does; calendar-unit and SLIDING intervals fall
    // through to the aggregate path's loud reject.
    //
    // Scale shape: the per-window function is one keyed sort-shuffle
    // (codegen window functions over (keys, _wstart)); the fill grid is
    // query-ranged (fenced <= 200k windows), built driver-side and
    // anti-joined BROADCAST against the distinct output buckets — the
    // fact table is scanned once.
    val winIndefPat = ("(?i)\\b(diff|csum|mavg|derivative|statecount|" +
      "stateduration)\\s*\\(").r
    // SESSION windows take the same route (test_interval_basic.py:1224
    // `derivative(k, 6m, 1) from tm0 session(ts, 1s)` positive): the
    // session id stands in for the window key; FILL stays
    // INTERVAL-only (the grammar ties FILL to INTERVAL)
    val sessIndef = !c.contains("INTERVAL") && c.contains("SESSION") &&
      !c.contains("FILL")
    // COUNT_WINDOW(n) likewise (test_fun_win_keep_order.py:
    // `statecount(voltage,'LE',223) … count_window(3)` with
    // _wstart/_wend/_wduration): the row-count bucket id is the
    // window key; the pseudo-cols are min/max(ts) over the bucket
    val cntIndef = !c.contains("INTERVAL") && !c.contains("SESSION") &&
      c.contains("COUNT_WINDOW") && !c.contains("FILL") &&
      splitArgs(stripOuterParens(c("COUNT_WINDOW"))).length == 1
    if ((sessIndef || cntIndef ||
        (c.contains("INTERVAL") && !c.contains("SLIDING") &&
        !"(?i)\\d\\s*[ny]$".r.findFirstIn(
          splitArgs(stripOuterParens(c("INTERVAL"))).head.trim)
          .isDefined)) &&
        !c.contains("GROUP BY") &&
        "(?i)\\bOVER\\b".r.findFirstIn(c("SELECT")).isEmpty &&
        selectItems.exists { case (e, _) =>
          winIndefPat.findFirstIn(e).isDefined }) {
      val iArgs =
        if (sessIndef || cntIndef) Nil
        else splitArgs(stripOuterParens(c("INTERVAL"))).map(_.trim)
      val iv =
        if (sessIndef || cntIndef) 1L else durNative(iArgs(0), perSecond)
      require(iv > 0, s"bad INTERVAL: ${c.getOrElse("INTERVAL", "")}")
      val ioff = iArgs.lift(1).map(durNative(_, perSecond)).getOrElse(0L)
      val fArgs = c.get("FILL").map(f =>
        splitArgs(stripOuterParens(f)).map(_.trim)).getOrElse(Seq("NONE"))
      val fMode = fArgs.head.toUpperCase
      require(Set("NONE", "NULL", "NULL_F", "VALUE", "VALUE_F")
        .contains(fMode),
        s"FILL(${fArgs.head}) is not supported with indefinite-rows " +
          "functions — only NULL/VALUE[_F]/NONE (the reference rejects " +
          "PREV/NEXT/LINEAR)")
      import graft.ops.SeriesOps
      var work =
        if (sessIndef) {
          val sArgs = splitArgs(stripOuterParens(c("SESSION")))
            .map(_.trim)
          require(sArgs.length == 2, s"SESSION takes (ts, gap)")
          graft.ops.TimeOps.sessionize(df, col(tsCol),
              durNative(sArgs(1), perSecond), partCols.map(col),
              tieBreak = df.columns
                .find(_.equalsIgnoreCase("event_id")).toSeq)
            .withColumnRenamed("_session", "_wstart")
        } else if (cntIndef) {
          val n = stripOuterParens(c("COUNT_WINDOW")).trim.toInt
          require(n > 0, s"bad COUNT_WINDOW: ${c("COUNT_WINDOW")}")
          graft.ops.TimeOps.countWindows(df, n, col(tsCol),
              partCols.map(col), tieBreak = df.columns
                .find(_.equalsIgnoreCase("event_id")).toSeq)
            .withColumnRenamed("_wid", "_wstart")
        } else df.withColumn("_wstart",
          expr(s"($tsCol) - pmod(($tsCol) - ${ioff}L, ${iv}L)"))
      val keys = partCols.map(col) :+ col("_wstart")
      // count/session window pseudo-cols are the bucket's min/max(ts)
      // (timewindowoperator count/session paths; keep_order + the
      // session-indef suites select `_wstart as ws` with csum/diff/…)
      if (cntIndef || sessIndef) {
        val wb = Window.partitionBy(keys: _*)
        work = work
          .withColumn("_cw_ws", min(col(tsCol)).over(wb))
          .withColumn("_cw_we", max(col(tsCol)).over(wb))
      }
      var maxDrop = 0 // leading rows per window the function consumes
      val ignoreNeg = Seq.newBuilder[String]
      // (wif index, ignore option) per diff item: bit 1 (ignore null)
      // drops rows whose diff RESULT is null — applied after the wif
      // columns materialize (the index recorded is wi+1, the name the
      // outer loop assigns right after this match returns)
      val diffWifOpts = Seq.newBuilder[(Int, Int)]
      var wi = 0
      // (output column, alias, None = indef output / Some(text) =
      // window-identity expression re-evaluable on fill rows)
      val outItems: Seq[(Column, String, Option[String])] = selectItems.map {
        case (e0, a) =>
          val e = e0.trim
          winIndefPat.findFirstMatchIn(e) match {
            case Some(m) =>
              val fn = m.group(1).toLowerCase
              val (start0, args, close) = analyticCallSpan(e, fn)
              require(start0 == 0 && close == e.length - 1,
                "an indefinite-rows call inside a window query must be " +
                  s"a bare select item: $e")
              val colOut: Column = fn match {
                case "diff" =>
                  maxDrop = math.max(maxDrop, 1)
                  val dOpt = args.lift(1).map(_.trim.toInt).getOrElse(0)
                  diffWifOpts += ((wi + 1, dOpt))
                  SeriesOps.diff(expr(args(0)), col(tsCol), keys, dOpt)
                case "csum" =>
                  SeriesOps.csum(expr(args(0)), col(tsCol), keys)
                case "mavg" =>
                  require(args.length == 2, s"mavg needs (col, k): $e")
                  val k = args(1).trim.toInt
                  maxDrop = math.max(maxDrop, k - 1)
                  SeriesOps.mavg(expr(args(0)), col(tsCol), keys, k)
                case "derivative" =>
                  require(args.length >= 2,
                    s"derivative needs (col, interval[, ignore_neg]): $e")
                  maxDrop = math.max(maxDrop, 1)
                  if (args.lift(2).exists(_.trim == "1")) ignoreNeg += a
                  SeriesOps.derivative(expr(args(0)), col(tsCol), keys,
                    durNative(args(1).trim, perSecond))
                case sfn =>
                  require(args.length >= 3,
                    s"$sfn needs (col, 'op', val[, unit]): $e")
                  val x = expr(args(0))
                  val v = args(2).trim.toDouble
                  val pred = unquote(args(1).trim).toUpperCase match {
                    case "LT" => x < v
                    case "GT" => x > v
                    case "LE" => x <= v
                    case "GE" => x >= v
                    case "EQ" => x === v
                    case "NE" => x =!= v
                    case other =>
                      throw new IllegalArgumentException(s"state op: $other")
                  }
                  if (sfn == "statecount")
                    SeriesOps.statecount(pred, col(tsCol), keys)
                  else SeriesOps.stateduration(pred, col(tsCol), keys,
                    args.lift(3).map(u => durNative(u.trim, perSecond))
                      .getOrElse(1L))
              }
              wi += 1
              work = work.withColumn(s"_wif$wi", colOut)
              (col(s"_wif$wi"), a, None)
            case None =>
              // window-identity / key expressions: _wend and
              // _wduration rewrite onto the materialized _wstart, so
              // any expression over the pseudo-cols and partition keys
              // evaluates on data rows AND reconstructs on fill rows
              val rw =
                if (cntIndef || sessIndef) e
                  // count-window pseudos read the per-bucket min/max
                  // ts columns materialized above
                  .replaceAll("(?i)(?<![\\w])_wstart(?![\\w])",
                    "_cw_ws")
                  .replaceAll("(?i)(?<![\\w])_wend(?![\\w])",
                    "_cw_we")
                  .replaceAll("(?i)(?<![\\w])_wduration(?![\\w])",
                    "(_cw_we - _cw_ws)")
                else e
                  .replaceAll("(?i)(?<![\\w])_wend(?![\\w])",
                    s"(_wstart + ${iv}L)")
                  .replaceAll("(?i)(?<![\\w])_wduration(?![\\w])",
                    s"${iv}L")
              (expr(rw), a, Some(rw))
          }
      }
      // the leading rows each window's function consumes (diff's first
      // row, mavg's first k-1) are DROPPED, as the reference emits
      if (maxDrop > 0)
        work = work
          .withColumn("_wirn", row_number().over(
            Window.partitionBy(keys: _*).orderBy(col(tsCol))))
          .filter(col("_wirn") > maxDrop)
      // diff ignore-null (option bit 1): rows whose diff RESULT is
      // null drop (diffResultIsNull) — null-input rows, each window's
      // first non-null row, and option 3's nulled negative deltas.
      // The per-window first row is already gone via maxDrop (its
      // result is null regardless), so this only removes additional
      // null-result rows. Same gating as the non-windowed route:
      // mixing diff with other indef functions is a reference ERROR
      // (test_select_all.py:500), so the drop applies only to
      // pure-diff selects — the mixed form is this engine's extension
      // and keeps every row for the non-diff columns.
      val dWifs = diffWifOpts.result()
      if (dWifs.nonEmpty && dWifs.size == wi &&
          dWifs.forall(d => (d._2 & 2) != 0))
        work = work.filter(
          dWifs.map(d => col(s"_wif${d._1}").isNotNull).reduce(_ || _))
      val hidden = partCols.zipWithIndex.map { case (pc, i) =>
        col(pc).as(s"_ps$i") } ++
        Seq(col("_wstart").as("_wsort"), col(tsCol).as("_tsort"))
      var res = work.select(outItems.map { case (cc, a, _) =>
        cc.as(a) } ++ hidden: _*)
      ignoreNeg.result().foreach(a =>
        res = res.filter(col(a).isNull || col(a) >= 0))
      if (fMode != "NONE") {
        val forced = fMode.endsWith("_F")
        val haveData = forced || df.limit(1).count() > 0
        if (!haveData) {
          // non-forced fill with NO data in range: zero rows
          res = res.limit(0)
        } else {
          def floorW(t: Long): Long =
            t - java.lang.Math.floorMod(t - ioff, iv)
          // grid bounds: the WHERE ts-range when bounded, else the
          // (already computed) output extent
          val (bLo, bHi) =
            if (qStart != Long.MinValue && qEnd != Long.MaxValue)
              (floorW(qStart), floorW(qEnd))
            else {
              val mm = work.agg(min(col("_wstart")),
                max(col("_wstart"))).head
              if (mm.isNullAt(0)) (0L, -1L)
              else (mm.getLong(0), mm.getLong(1))
            }
          val nWins = if (bHi < bLo) 0L else (bHi - bLo) / iv + 1
          require(nWins <= 200000,
            s"indefinite-rows FILL grid too large: $nWins windows")
          if (nWins > 0) {
            val spark0 = df.sparkSession
            import spark0.implicits._
            val grid0 = (bLo to bHi by iv).toDF("_wsort")
            // the occupied-bucket side's cardinality is windows×keys
            // (the windowed OUTPUT size) — only hint broadcast when
            // that bound is provably small; above it, let AQE pick
            // the build side so a 100 TB key space can't blow the
            // driver
            var occupiedBound = nWins
            val grid =
              if (partCols.isEmpty) grid0
              else {
                val parts = df.select(
                  partCols.zipWithIndex.map { case (pc, i) =>
                    col(pc).as(s"_ps$i") }: _*).distinct()
                occupiedBound = nWins * parts.count()
                grid0.crossJoin(parts)
              }
            val gridKeys = "_wsort" +:
              partCols.indices.map(i => s"_ps$i")
            val occupied = res.select(gridKeys.map(col): _*).distinct()
            val missing = grid.join(
              if (occupiedBound <= 1000000L) broadcast(occupied)
              else occupied,
              gridKeys.toSeq, "left_anti")
            val resTypes = res.schema.fields.map(f =>
              f.name -> f.dataType).toMap
            val fillLits: Map[String, Column] = {
              val indefAliases = outItems.collect {
                case (_, a, None) => a }
              val lits = fArgs.tail match {
                case Seq() => indefAliases.map(_ => "0")
                case Seq(x) => indefAliases.map(_ => x)
                case many =>
                  require(many.length == indefAliases.length,
                    s"FILL(VALUE …) carries ${many.length} literals " +
                      s"for ${indefAliases.length} function columns")
                  many
              }
              indefAliases.zip(lits).map { case (a, l) =>
                a -> (if (fMode.startsWith("VALUE"))
                  expr(l).cast(resTypes(a))
                else lit(null).cast(resTypes(a)))
              }.toMap
            }
            // a fill row carries the grid's window identity and key —
            // re-evaluate the SAME window-identity expressions over a
            // frame where _wstart is the grid bucket
            val withCtx = partCols.zipWithIndex.foldLeft(
              missing.withColumn("_wstart", col("_wsort"))) {
              case (d, (pc, i)) => d.withColumn(pc, col(s"_ps$i")) }
            val fillRows = outItems.foldLeft(withCtx) {
              case (d, (_, a, Some(rw))) => d.withColumn(a, expr(rw))
              case (d, (_, a, None)) => d.withColumn(a, fillLits(a))
            }.withColumn("_tsort", lit(null).cast(resTypes("_tsort")))
              .select(res.columns.map(col): _*)
            res = res.unionByName(fillRows)
          }
        }
      }
      val sortCols = partCols.indices.map(i => col(s"_ps$i")) ++
        Seq(col("_wsort"), col("_tsort"))
      res = c.get("ORDER BY") match {
        case Some(o) => res.orderBy(orderCols(o,
          positional = res.columns.toSeq): _*)
        case None => res.orderBy(sortCols: _*)
      }
      res = res.drop("_wsort", "_tsort")
        .drop(partCols.indices.map(i => s"_ps$i"): _*)
      c.get("OFFSET").foreach(m => res = res.offset(m.trim.toInt))
      c.get("LIMIT").foreach(n => res = applyLimit(res, n))
      return res
    }
    // sample() rejects EVERY fill mode inside a window query
    // (test_fun_ts_interval_fill.py test_sample_fill_unsupported)
    require(!(c.contains("FILL") && c.contains("INTERVAL") &&
      "(?i)\\bsample\\s*\\(".r.findFirstIn(c("SELECT")).isDefined),
      "sample() does not support FILL")

    // ---- a SELECTION function carrying scalar columns, no GROUP BY --
    // (parTranslater selection semantics; 20-select.md: `SELECT
    // abs(c1), max(c1) FROM t` evaluates every other select item ON
    // THE SELECTED ROW). Engages only for exactly ONE selection call
    // with a plain argument, no other aggregate, no window clause —
    // anything else keeps its existing route. tbname rides like any
    // scalar (test_fun_select_last_row.py:901: `select tbname,
    // last_row(c1) from stb1` returns the LAST ROW's tbname 'ct4',
    // not an any-row pick). Keyless lowers to orderBy+limit(1)
    // (TakeOrdered — no single-partition collapse); PARTITION BY
    // lowers to a per-key row_number pick.
    {
      // mode is a SELECTION function too (builtins.c:4495
      // FUNC_MGT_SELECT_FUNC): `select ts, mode(c1) from tb` returns
      // ONE row — the mode value with the accompanying columns read
      // from the LAST row carrying it (doModeAdd updateTupleData on
      // every occurrence; test_fun_select_mode.py checkRows(1),
      // test_join_pk.py:322 joins on the riding ts)
      val selFnRe = "(?i)\\b(first|last_row|last|min|max|mode)\\s*\\(".r
      val otherAggRe = ("(?i)\\b(count|sum|avg|stddev|stdvar|std|var|" +
        "spread|twa|irate|elapsed|hyperloglog|percentile|" +
        "apercentile|histogram|leastsquares|sample|top|bottom|diff|" +
        "csum|mavg|derivative|statecount|stateduration|tail|unique|" +
        "interp|cols)\\s*\\(").r
      val hasWinKw = Seq("INTERVAL", "SESSION", "STATE_WINDOW",
        "COUNT_WINDOW", "EVENT_WINDOW", "EXTERNAL_WINDOW",
        "ANOMALY_WINDOW").exists(c.contains)
      val selTxt = c("SELECT")
      val anchorItem = selectItems.zipWithIndex.find { case ((e, _), _) =>
        selFnRe.findFirstIn(e).isDefined }
      val baseCols0 = df.columns.filterNot(_.startsWith("_"))
      def refsBase0(e: String): Boolean = {
        val s = e.replaceAll("'[^']*'", "")
        baseCols0.exists(cn =>
          ("(?i)(?<![\\w])" + java.util.regex.Pattern.quote(cn) +
            "(?![\\w])").r.findFirstIn(s).isDefined)
      }
      if (!hasWinKw && !c.contains("GROUP BY") &&
          selFnRe.findAllIn(selTxt).length == 1 &&
          otherAggRe.findFirstIn(selTxt).isEmpty &&
          "(?i)\\bOVER\\b".r.findFirstIn(selTxt).isEmpty &&
          anchorItem.isDefined &&
          // `*` accompanies like a bare column: every base column
          // evaluates on the selected row (test_normal.py
          // `select *, last(ts) + 2 from stb` = one row)
          selectItems.zipWithIndex.exists { case ((e, _), i) =>
            i != anchorItem.get._2 && (refsBase0(e) || e.trim == "*") }) {
        val ((aTxt, _), aIdx) = anchorItem.get
        val fn = selFnRe.findFirstMatchIn(aTxt).get.group(1).toLowerCase
        val (aStart, aArgs, aClose) = analyticCallSpan(aTxt, fn)
        if (aArgs.length == 1 && aArgs.head.trim != "*" &&
            !aArgs.head.contains("*")) {
          val x = expr(aArgs.head.trim)
          val tie = seriesTie(df, tsCol)
          val (flt, ord0) = fn match {
            case "max" => (Some(x.isNotNull),
              Seq(x.desc, col(tsCol).asc) ++ tie.map(_.asc))
            case "min" => (Some(x.isNotNull),
              Seq(x.asc, col(tsCol).asc) ++ tie.map(_.asc))
            case "first" => (Some(x.isNotNull),
              Seq(col(tsCol).asc) ++ tie.map(_.asc))
            case "last" | "mode" => (Some(x.isNotNull),
              Seq(col(tsCol).desc) ++ tie.map(_.desc))
            case _ => (None, Seq(col(tsCol).desc) ++ tie.map(_.desc))
          }
          var base = flt.map(df.filter).getOrElse(df)
          // mode: most-frequent value wins (ties: larger value, the
          // same pin as sf_mode); within the winning value the LAST
          // row by ts carries the ride. One keyed window shuffle +
          // TakeOrdered(1) — no value list leaves the executors.
          val ord = if (fn == "mode") {
            base = base.withColumn("_mcnt", count(x).over(
              Window.partitionBy((partCols.map(col) :+ x): _*)))
            Seq(col("_mcnt").desc, x.desc) ++ ord0
          } else ord0
          base =
            if (partCols.isEmpty) base.orderBy(ord: _*).limit(1)
            else base.withColumn("_selrn", row_number().over(
                Window.partitionBy(partCols.map(col): _*)
                  .orderBy(ord: _*)))
              .filter(col("_selrn") === 1).drop("_selrn")
          // the anchor call collapses to its argument — the selected
          // row IS the aggregate
          val items = selectItems.zipWithIndex.map { case ((e, a), i) =>
            if (i == aIdx)
              (e.substring(0, aStart) + s"(${aArgs.head.trim})" +
                e.substring(aClose + 1), a)
            else (e, a)
          }
          // ORDER BY may reference the selection aggregate itself
          // (`select *, last(ts) + 2 from stb order by last(ts) desc`,
          // test_normal.py / test_orderby_basic.py): each output row
          // IS its selection row, so the call collapses to its
          // argument — sorted PRE-projection, where the argument
          // column still exists; the narrow select preserves order
          val anchorCallRe = ("(?i)\\b" + fn + "\\s*\\(\\s*" +
            java.util.regex.Pattern.quote(aArgs.head.trim) +
            "\\s*\\)").r
          var sortedPre = false
          var base2 = base
          c.get("ORDER BY").foreach { o =>
            if (anchorCallRe.findFirstIn(o).isDefined) {
              val o2 = anchorCallRe.replaceAllIn(o,
                java.util.regex.Matcher
                  .quoteReplacement(s"(${aArgs.head.trim})"))
              base2 = base2.orderBy(orderCols(o2): _*)
              sortedPre = true
            }
          }
          var res = base2.select(items.flatMap { case (e, a) =>
            if (e.trim == "*") starCols(df).map(col)
            else Seq(expr(rewriteFuncs(e, tsCol, perSecond)).as(a))
          }: _*)
          if (!sortedPre)
            c.get("ORDER BY").foreach(o => res = res.orderBy(orderCols(o,
              positional = res.columns.toSeq): _*))
          c.get("OFFSET").foreach(m => res = res.offset(m.trim.toInt))
          c.get("LIMIT").foreach(n => res = applyLimit(res, n))
          return res
        }
      }
    }

    // ---- windowing ----
    var groupKeys: Seq[String] = partCols
    var postAgg: DataFrame => DataFrame = identity
    // raw STATE_WINDOW expression texts: a select item that IS one of
    // them is constant within its window, so it may be selected bare
    // (docs 06-window examples) — lowered to first(…)
    var stateTexts: Seq[String] = Nil
    // textual rewrites; the query-range pseudo columns are visible in
    // every branch (windowed or not), window pseudos merge per branch
    // _qduration is the INCLUSIVE tick count ekey - skey + 1, and
    // INT64_MIN when either bound is unbounded (reference
    // parTranslater.c rewriteQdurationFunc) — qEnd - qStart would be
    // one short, and with no ts predicate would overflow to -1
    val qDuration =
      if (qStart == Long.MinValue || qEnd == Long.MaxValue) Long.MinValue
      else qEnd - qStart + 1
    val qPseudo: Map[String, String] = Map(
      "_qstart" -> s"${qStart}L", "_qend" -> s"${qEnd}L",
      "_qduration" -> s"${qDuration}L")
    var pseudo: Map[String, String] = qPseudo
    var intervalSpec: Option[(Long, Long)] = None // (intervalUs, offsetUs)
    // the declared window set of an EXTERNAL_WINDOW clause — FILL over
    // external windows emits every declared window, not a time grid
    var extWins: Option[DataFrame] = None
    // calendar INTERVAL grid for FILL: (k months, offsetMonths, offsetTicks)
    var calFillSpec: Option[(Long, Long, Long)] = None

    // TRUE_FOR(d | COUNT n | d AND/OR COUNT n [, START(limit)]
    // [, END(limit)]) (sql.y true_for_opt :3028-3060; executor.c
    // isTrueForSatisfied): the window limit filters emitted windows
    // (a hidden aggregate predicate); START/END limits gate the
    // event-window open/close streaks — parsed here so the
    // EVENT_WINDOW branch below can thread them into the operator
    val (trueFor, tfStart, tfEnd): (Option[String],
        Option[TimeOps.TrueForLimit], Option[TimeOps.TrueForLimit]) =
      c.get("TRUE_FOR") match {
        case None => (None, None, None)
        case Some(t) =>
          require(c.contains("STATE_WINDOW") ||
            c.contains("EVENT_WINDOW"),
            "TRUE_FOR needs STATE_WINDOW or EVENT_WINDOW")
          val mCount = "(?i)^COUNT\\s+(\\d+)$".r
          val mAnd = "(?i)^(\\S+)\\s+AND\\s+COUNT\\s+(\\d+)$".r
          val mOr = "(?i)^(\\S+)\\s+OR\\s+COUNT\\s+(\\d+)$".r
          def parseLimit(b0: String): TimeOps.TrueForLimit =
            b0.trim match {
              case mCount(n) => TimeOps.TrueForLimit(0, n.toLong, "cnt")
              case mAnd(d, n) =>
                TimeOps.TrueForLimit(dur(d), n.toLong, "and")
              case mOr(d, n) =>
                TimeOps.TrueForLimit(dur(d), n.toLong, "or")
              case d => TimeOps.TrueForLimit(dur(d), 0, "dur")
            }
          def pred(l: TimeOps.TrueForLimit): String = {
            val ds = s"(max($tsCol) - min($tsCol)) >= ${l.duration}L"
            val cs = s"count(1) >= ${l.count}L"
            l.mode match {
              case "cnt" => cs
              case "and" => s"($ds AND $cs)"
              case "or" => s"($ds OR $cs)"
              case _ => ds
            }
          }
          var w: Option[String] = None
          var sL: Option[TimeOps.TrueForLimit] = None
          var eL: Option[TimeOps.TrueForLimit] = None
          val startRe = "(?i)^START\\s*\\((.*)\\)$".r
          val endRe = "(?i)^END\\s*\\((.*)\\)$".r
          splitArgs(stripOuterParens(t)).map(_.trim).foreach {
            case startRe(b) =>
              require(c.contains("EVENT_WINDOW"),
                "TRUE_FOR START(…) limits need EVENT_WINDOW")
              sL = Some(parseLimit(b))
            case endRe(b) =>
              require(c.contains("EVENT_WINDOW"),
                "TRUE_FOR END(…) limits need EVENT_WINDOW")
              eL = Some(parseLimit(b))
            case b => w = Some(pred(parseLimit(b)))
          }
          (w, sL, eL)
      }

    val calRe = "(?i)^(\\d+)([nqy])$".r
    // WINDOW JOIN implicit aggregation (25-join.md: aggregate
    // functions in a window-join select aggregate EACH preserved
    // row's window set — no GROUP BY required): synthesize a GROUP BY
    // over the preserved row id (_wjlid, attached by fromClause) plus
    // every non-aggregate select item, then reuse the normal grouping
    // machinery below
    if (df.columns.contains("_wjlid") && !c.contains("GROUP BY") &&
        !Seq("INTERVAL", "SESSION", "STATE_WINDOW", "COUNT_WINDOW",
          "EVENT_WINDOW", "ANOMALY_WINDOW", "EXTERNAL_WINDOW")
          .exists(c.contains)) {
      val aggRe = ("(?i)\\b(count|sum|avg|min|max|first|last|last_row|" +
        "stddev|stdvar|spread|mode|twa|irate|elapsed|hyperloglog|" +
        "percentile|apercentile|histogram|leastsquares)\\s*\\(").r
      def isAggItem(e: String) = aggRe.findFirstIn(e).isDefined
      if (selectItems.exists { case (e, _) => isAggItem(e) }) {
        // count(*) must count WINDOW rows — the left join's
        // null-extension row for an empty window carries a null right
        // ts, so count(_rts) gives the reference's 0
        selectItems = selectItems.map { case (e, a) =>
          ("(?i)\\bcount\\s*\\(\\s*\\*\\s*\\)".r
            .replaceAllIn(e, "count(_rts)"), a)
        }
        val keyTxt = "_wjlid" +: selectItems.collect {
          case (e, _) if !isAggItem(e) && e.trim != "*" => e }
        c = c.updated("GROUP BY", keyTxt.mkString(", "))
      }
    }
    if (c.contains("INTERVAL") &&
        calRe.findFirstIn(
          splitArgs(stripOuterParens(c("INTERVAL"))).head.trim)
          .isDefined) {
      // calendar INTERVAL units (20-select.md v3.4.2: n = months,
      // q = quarters, y = years): buckets are CALENDAR-aligned, not
      // fixed-duration — _wstart = the 1st 00:00 UTC of the bucket's
      // opening month, computed from months-since-epoch DIV k. An
      // offset (taosTimeTruncate's offset step) shifts every boundary:
      // fixed-duration offsets shift the tick axis, calendar offsets
      // shift the month index. SLIDING+offset has no fixed grid and
      // stays loud.
      val args = splitArgs(stripOuterParens(c("INTERVAL"))).map(_.trim)
      require(args.length <= 2,
        s"INTERVAL takes (duration[, offset]): ${c("INTERVAL")}")
      val calRe(numTxt, unit) = args.head
      def calMonths(n: String, u: String): Long =
        n.toLong * (u.toLowerCase match {
          case "n" => 1L
          case "q" => 3L
          case _ => 12L
        })
      val k = calMonths(numTxt, unit)
      val offMonths = args.lift(1).collect {
        case calRe(n2, u2) => calMonths(n2, u2) }.getOrElse(0L)
      val offTicks = args.lift(1) match {
        case Some(a) if a.equalsIgnoreCase("AUTO") =>
          // calendar INTERVAL(kn, AUTO): the reference computes a
          // FIXED tick offset skey - taosTimeTruncate(skey) with the
          // calendar-aware truncation (ttime.c:1746-1768), so the
          // shifted-axis lowering below applies unchanged
          if (qStart == Long.MinValue) 0L
          else {
            val secs = java.lang.Math.floorDiv(qStart, perSecond)
            val z = java.time.Instant.ofEpochSecond(secs)
              .atZone(java.time.ZoneOffset.UTC)
            val m = (z.getYear - 1970) * 12 + z.getMonthValue - 1
            val b = m - java.lang.Math.floorMod(m.toLong, k)
            val start = java.time.ZonedDateTime.of(
              1970 + java.lang.Math.floorDiv(b, 12L).toInt,
              java.lang.Math.floorMod(b, 12L).toInt + 1,
              1, 0, 0, 0, 0, java.time.ZoneOffset.UTC)
              .toEpochSecond * perSecond
            qStart - start
          }
        case Some(a) if !calRe.matches(a) => dur(a)
        case _ => 0L
      }
      val slideTicks = c.get("SLIDING").map { s0 =>
        val s = stripOuterParens(s0).trim
        require(!calRe.matches(s),
          "SLIDING cannot use calendar units (parTranslater.c:13304)")
        // a fixed-duration offset composes with SLIDING (the grid
        // shifts by the offset: test_interval_basic.py `interval(1n,
        // 1w) sliding(2w)` positive); a CALENDAR offset with SLIDING
        // is the reference's own error case (`interval(1y, 6n)
        // sliding(6n)` errors)
        require(offMonths == 0,
          "calendar INTERVAL with SLIDING takes a fixed-duration " +
            "offset only")
        dur(s)
      }
      slideTicks match {
        case None =>
          // ticks → seconds → calendar fields (UTC session);
          // sub-second digits cannot move a month boundary. The
          // window containing t satisfies monthStart(m)+off <= t <
          // monthStart(m+k)+off ⟺ m = monthBucket(t - off) — bucket
          // on the shifted axis, emit boundaries shifted back.
          val t =
            s"timestamp_seconds((($tsCol) - ${offTicks}L) DIV ${perSecond}L)"
          val ms =
            s"((year($t) - 1970) * 12 + month($t) - 1 - ${offMonths}L)"
          def bucketStart(b: String): String =
            s"(unix_timestamp(make_timestamp(1970 + " +
              s"CAST(($b) / 12 AS INT)," +
              s" CAST(($b) % 12 AS INT) + 1, 1, 0, 0, 0)) * ${perSecond}L)"
          val bucket = s"($ms - ($ms % $k))"
          df = df.withColumn("_wstart", expr(
            s"(${bucketStart(s"$bucket + ${offMonths}L")} + ${offTicks}L)"))
          groupKeys = partCols :+ "_wstart"
          // _wend/_wduration must derive from the GROUP KEY (_wstart),
          // not raw row columns — re-read the bucket from the key
          val tW = s"timestamp_seconds(((_wstart) - ${offTicks}L) " +
            s"DIV ${perSecond}L)"
          val msW = s"((year($tW) - 1970) * 12 + month($tW) - 1)"
          val wend = s"(${bucketStart(s"($msW + $k)")} + ${offTicks}L)"
          pseudo = qPseudo ++
            Map("_wend" -> wend, "_wduration" -> s"($wend - _wstart)")
          calFillSpec = Some((k, offMonths, offTicks))
        case Some(sl) =>
          // calendar INTERVAL + fixed SLIDING (ttime.c:1640 branch of
          // taosTimeTruncate): window starts sit on the EPOCH-ALIGNED
          // sliding grid; each spans k calendar months from its own
          // start, with mktime's day-overflow normalization (Jan 31
          // + 1n rolls into March) — reproduced via date_add from the
          // month's 1st. A row joins every grid window whose span
          // covers it, so the explode is ceil(span/sliding) wide.
          def calEnd(st: String): String = {
            val tsec = s"(($st) DIV ${perSecond}L)"
            val rem = s"(($st) % ${perSecond}L)"
            val t = s"timestamp_seconds($tsec)"
            val mon = s"((year($t) - 1970) * 12 + month($t) - 1 + $k)"
            val base = s"date_add(make_date(1970 + " +
              s"CAST(($mon) DIV 12 AS INT), " +
              s"CAST(($mon) % 12 AS INT) + 1, 1), day($t) - 1)"
            s"((unix_timestamp(CAST($base AS TIMESTAMP)) + " +
              s"hour($t) * 3600 + minute($t) * 60 + second($t)) * " +
              s"${perSecond}L + $rem)"
          }
          // widest possible span in ticks bounds the candidate count.
          // The reference caps SLIDING at 1%..100% of INTERVAL
          // (sliding cannot be smaller than interval/100); without the
          // fence an INTERVAL(100n) SLIDING(1s) query would build
          // multi-million-element candidate arrays per row and OOM
          // instead of failing loudly.
          val nWin = (k * 31L * 86400L * perSecond) / sl + 2
          require(nWin <= 128,
            s"SLIDING is too small for INTERVAL(${k}n): up to $nWin " +
              "candidate windows per row (reference bounds SLIDING to " +
              ">= 1% of INTERVAL); raise SLIDING")
          // grid starts sit at j*sliding + offset (taosTimeTruncate
          // applies the interval offset after grid alignment)
          val j0 = s"((($tsCol) - ${offTicks}L) DIV ${sl}L)"
          val starts = s"filter(transform(sequence($j0 - ${nWin}L + 1, " +
            s"$j0), j -> j * ${sl}L + ${offTicks}L), " +
            s"st -> st <= $tsCol AND ${calEnd("st")} > $tsCol)"
          df = df.withColumn("_wstart", explode(expr(starts)))
          groupKeys = partCols :+ "_wstart"
          pseudo = qPseudo ++ Map("_wend" -> calEnd("_wstart"),
            "_wduration" -> s"(${calEnd("_wstart")} - _wstart)")
      }
    } else if (c.contains("INTERVAL")) {
      val rawArgs = splitArgs(stripOuterParens(c("INTERVAL"))).map(_.trim)
      val iv = dur(rawArgs.head)
      val slide = c.get("SLIDING")
        .map(s => dur(stripOuterParens(s))).getOrElse(iv)
      val off = rawArgs.lift(1) match {
        case Some(a) if a.equalsIgnoreCase("AUTO") =>
          // INTERVAL(d, AUTO) (sql.y:2883; ttime.c:1732
          // calcIntervalAutoOffset, v3.3.5+): align the window grid to
          // the WHERE clause's primary-ts lower bound when one exists —
          // offset = skey - (largest sliding-grid start <= skey), grid
          // anchored at the epoch-aligned interval truncation of skey;
          // no clear lower bound -> offset 0
          if (qStart == Long.MinValue) 0L
          else {
            val base = qStart - java.lang.Math.floorMod(qStart, iv)
            val start =
              base + java.lang.Math.floorDiv(qStart - base, slide) * slide
            qStart - start
          }
        case Some(a) => dur(a)
        case None => 0L
      }
      df = TimeOps.assignIntervals(df, col(tsCol), iv, slide, off)
      groupKeys = partCols :+ "_wstart"
      intervalSpec = Some((iv, off))
      pseudo = qPseudo ++ Map("_wduration" -> iv.toString,
        "_wend" -> s"(_wstart + $iv)")
    } else if (c.contains("SESSION")) {
      val args = splitArgs(stripOuterParens(c("SESSION")))
      require(args.length == 2,
        s"SESSION needs (ts_col, gap): SESSION${c("SESSION")}")
      df = TimeOps.sessionize(df, col(args(0)), dur(args(1)),
        partCols.map(col))
      groupKeys = partCols :+ "_session"
      pseudo = qPseudo ++ Map("_wstart" -> s"min($tsCol)", "_wend" -> s"max($tsCol)")
    } else if (c.contains("STATE_WINDOW")) {
      // STATE_WINDOW(e1[, e2 …]) (sql.y:2874 state_window_expr_list):
      // multiple expressions window on the TUPLE — a new window opens
      // when ANY component changes; a tuple with a NULL component is a
      // NULL state (matching the single-expr null semantics)
      stateTexts = splitArgs(stripOuterParens(c("STATE_WINDOW")))
        .map(_.trim)
      val stParts = stateTexts.map(expr)
      val st =
        if (stParts.length == 1) stParts.head
        else when(stParts.map(_.isNull).reduce(_ || _), lit(null))
          .otherwise(struct(stParts: _*))
      if (c.contains("EXTEND")) {
        // EXTEND(0|1|2) (sql.y:2938): where a null-state row goes
        val ext = stripOuterParens(c("EXTEND")).trim.toInt
        df = TimeOps.stateWindowsExtend(df, st, col(tsCol),
          partCols.map(col), ext)
      } else if (c.contains("ZEROTH_STATE")) {
        // ZEROTH_STATE(v[, v2 …]) (sql.y:2905): baseline-state windows
        // drop; arity follows the state expression list
        val zvals =
          splitArgs(stripOuterParens(c("ZEROTH_STATE"))).map(_.trim)
        require(zvals.length == stateTexts.length,
          s"ZEROTH_STATE arity ${zvals.length} != state exprs " +
            s"${stateTexts.length}")
        def zlit(t: String): Column =
          if (t.startsWith("'")) lit(unquote(t))
          else if (t.matches("-?\\d+")) lit(t.toLong)
          else lit(t.toDouble)
        // cast the literal (tuple) onto the state's exact type —
        // struct null-safe equality requires identical field types
        val stType = df.select(st.as("_z")).schema.head.dataType
        val z = (if (zvals.length == 1) zlit(zvals.head)
          else struct(zvals.map(zlit): _*)).cast(stType)
        df = TimeOps.stateWindowsZerothC(df, st, col(tsCol),
          partCols.map(col), z)
      } else
        df = TimeOps.stateWindows(df, st, col(tsCol), partCols.map(col))
      groupKeys = partCols :+ "_wid"
      pseudo = qPseudo ++ Map("_wstart" -> s"min($tsCol)", "_wend" -> s"max($tsCol)")
    } else if (c.contains("EXTERNAL_WINDOW")) {
      // EXTERNAL_WINDOW ( (subquery) alias ) (sql.y:2895-2900,
      // externalwindowoperator.c): the window set comes from a
      // subquery yielding _wstart/_wend; rows join into the half-open
      // [start, end) span (broadcast — a window list is small next to
      // the fact table). Windows may overlap, so the window identity
      // is BOTH bounds.
      val body = stripOuterParens(c("EXTERNAL_WINDOW")).trim
      require(body.startsWith("("),
        s"EXTERNAL_WINDOW needs ( (subquery) alias ): $body")
      var depth = 0; var inStr = false; var close = -1; var i = 0
      while (close < 0 && i < body.length) {
        val ch = body(i)
        if (inStr) { if (ch == '\'') inStr = false }
        else ch match {
          case '\'' => inStr = true
          case '(' => depth += 1
          case ')' => depth -= 1; if (depth == 0) close = i
          case _ =>
        }
        i += 1
      }
      require(close > 0, s"unbalanced EXTERNAL_WINDOW subquery: $body")
      val sub = body.substring(1, close).trim
      var wins = query(spark, resolve, sub, tsCol, perSecond)
      // positional form (13-TimeSeriesExt/08-ExternalWindow
      // test_external.py `(select ts, endtime, mark …)`): when the
      // subquery doesn't NAME the bounds, its first two columns are
      // (start, end) — but never a single-column or agg-only result
      // (those are the reference's own error cases)
      if (!wins.columns.contains("_wstart") ||
          !wins.columns.contains("_wend")) {
        require(wins.columns.length >= 2 &&
          !wins.columns.take(2).exists(c =>
            c.startsWith("first(") || c.startsWith("last(")),
          "the EXTERNAL_WINDOW subquery must yield _wstart and _wend " +
            "(or lead with two plain bound columns)")
        // positional rename via toDF — the bounds may share a name
        // (`select ts, ts, first(c1) …`), which withColumnRenamed
        // would rename together
        wins = wins.toDF(wins.columns.zipWithIndex.map {
          case (_, 0) => "_wstart"
          case (_, 1) => "_wend"
          case (n, _) => n
        }.toIndexedSeq: _*)
      }
      // the subquery's EXTRA columns (mark etc.) ride along: constant
      // per window, selectable through the window alias (`w.mark` —
      // test_external_fill._check_fill_mark_reference) in both data
      // and filled windows. Names colliding with source columns are
      // dropped (unreferencable without real qualification anyway).
      val winAlias = body.substring(close + 1).trim
        .split("\\s+").headOption.filter(_.matches("\\w+"))
      val extras = wins.columns
        .filterNot(Set("_wstart", "_wend"))
        .filterNot(cn => df.columns.exists(_.equalsIgnoreCase(cn)))
        .toSeq
      // dedup on the BOUNDS alone: extras are constant per window by
      // construction, but two subquery rows sharing (_wstart,_wend)
      // with divergent extra values must still yield ONE window (a
      // full-row dedup would duplicate the aggregate rows)
      val winBounds = wins
        .select(("_wstart" +: "_wend" +: extras).map(col): _*)
        .dropDuplicates("_wstart", "_wend")
      extWins = Some(winBounds)
      df = TimeOps.externalWindows(df, winBounds, col(tsCol))
      groupKeys = partCols ++ Seq("_wstart", "_wend") ++ extras
      // rewrite `w.col` refs (the window alias) to the bare ride-along
      // names everywhere downstream text is consumed
      winAlias.foreach { al =>
        val aRe = ("(?i)(?<![\\w.])" +
          java.util.regex.Pattern.quote(al) + "\\.(\\w+)").r
        def fixAl(s: String): String = aRe.replaceAllIn(s, "$1")
        selectItems = selectItems.map { case (e, a) =>
          (fixAl(e), if (a == e) fixAl(a).replaceAll("[^A-Za-z0-9_]+",
            "_") else a)
        }
        c = c.map { case (k, v) =>
          if (Set("ORDER BY", "HAVING").contains(k)) (k, fixAl(v))
          else (k, v)
        }
      }
      pseudo = qPseudo ++ Map("_wduration" -> "(_wend - _wstart)")
    } else if (c.contains("ANOMALY_WINDOW")) {
      // ANOMALY_WINDOW(col[, 'algo=zscore[,z=k]']) (sql.y:2887): the
      // z-score Detector; the algo literal may override the threshold
      val args = splitArgs(stripOuterParens(c("ANOMALY_WINDOW")))
      require(args.nonEmpty,
        s"ANOMALY_WINDOW needs (col[, 'opts']): ${c("ANOMALY_WINDOW")}")
      val z = args.lift(1).map(unquote)
        .flatMap("z=([0-9.]+)".r.findFirstMatchIn(_))
        .map(_.group(1).toDouble).getOrElse(2.0)
      df = graft.ops.AnalyticsOps.anomalyRows(df, col(tsCol),
        args(0).trim, partCols, z)
      groupKeys = partCols :+ "_wgrp"
      pseudo = qPseudo ++ Map("_wstart" -> s"min($tsCol)", "_wend" -> s"max($tsCol)")
    } else if (c.contains("COUNT_WINDOW")) {
      // COUNT_WINDOW(n[, sliding][, col1, col2 …]) (sql.y:2893): an
      // integer second arg is the row-slide; trailing column args
      // restrict counted rows to those with any col non-null
      val args = splitArgs(stripOuterParens(c("COUNT_WINDOW")))
        .map(_.trim)
      val n = args.head.toInt
      val slide = args.lift(1).filter(_.matches("\\d+")).map(_.toInt)
      val colArgs = args.drop(if (slide.isDefined) 2 else 1)
      df =
        if (colArgs.nonEmpty) {
          slide.foreach(s => require(s >= 1 && s <= n,
            s"COUNT_WINDOW sliding must be in [1, $n], got $s"))
          TimeOps.countWindowsCols(df, n, col(tsCol),
            partCols.map(col), colArgs.map(a => expr(a)),
            sliding = slide.filter(_ != n).getOrElse(0))
        } else slide match {
          case Some(s) if s != n =>
            require(s >= 1 && s <= n,
              s"COUNT_WINDOW sliding must be in [1, $n], got $s")
            TimeOps.slidingCountWindows(df, n, s, col(tsCol),
              partCols.map(col))
          case _ =>
            TimeOps.countWindows(df, n, col(tsCol), partCols.map(col))
        }
      groupKeys = partCols :+ "_wid"
      pseudo = qPseudo ++ Map("_wstart" -> s"min($tsCol)", "_wend" -> s"max($tsCol)")
    } else if (c.contains("EVENT_WINDOW")) {
      val body = c("EVENT_WINDOW")
      val m = "(?i)^START WITH (.*) END WITH (.*)$".r
      body match {
        case m(s0, e0) =>
          df =
            if (tfStart.isDefined || tfEnd.isDefined)
              TimeOps.eventWindowsLimits(df, expr(s0), expr(e0),
                col(tsCol), partCols, tfStart, tfEnd,
                tie = if (partCols.isEmpty) seriesTie(df, tsCol)
                      else Nil)
            else TimeOps.eventWindows(df, expr(s0), expr(e0),
              col(tsCol), partCols)
          groupKeys = partCols :+ "_wstart"
          pseudo = qPseudo ++ Map("_wend" -> s"max($tsCol)")
        case _ => throw new IllegalArgumentException(
          "EVENT_WINDOW needs START WITH … END WITH …")
      }
    } else if (c.contains("GROUP BY")) {
      // expression group keys (GROUP BY timetruncate(ts, 1d), …):
      // materialize as hidden columns, re-point matching select items
      // (sql.y group_by_clause takes arbitrary group_by_expr)
      val ident = "^[A-Za-z_][A-Za-z0-9_]*$".r
      val mapped = splitArgs(c("GROUP BY")).zipWithIndex.map {
        case (k00, i) =>
          // GROUP BY <ordinal> names the n-th select item (sql.y
          // group_by_expr positions), NOT an integer literal key
          val k = k00.trim match {
            case ord if ord.matches("\\d+") =>
              val n = ord.toInt
              require(n >= 1 && n <= selectItems.length,
                s"GROUP BY $n exceeds the select list")
              selectItems(n - 1)._1.trim
            case t => t
          }
          if (ident.matches(k)) k
          else {
            val nm = s"_gk$i"
            df = df.withColumn(nm, expr(rewriteFuncs(k, tsCol, perSecond)))
            selectItems = selectItems.map { case (e, a) =>
              if (normExprKey(e) == normExprKey(k))
                (nm, if (a == e) nm else a)
              else (e, a)
            }
            nm
          }
      }
      groupKeys = partCols ++ mapped
    }

    // ---- window projection mode (24-distinguished.md "Window
    // Projection Mode", v3.4.2; sql.y:2832-2834 window_mode_opt) ----
    // Aggregation mode (the default) emits one row per window;
    // projection mode emits every ORIGINAL row, with the window
    // pseudo-columns computed rowwise — value pseudos directly,
    // aggregate pseudos as window functions over the window identity.
    // Detection per the docs: aggregates => aggregation; base-column
    // expressions => projection; ambiguous select lists (pseudo/tag/
    // constant only) default to aggregation except EXTERNAL_WINDOW,
    // with the SCALAR/AGG keywords deciding explicitly.
    val winClauseKw = Seq("INTERVAL", "SESSION", "STATE_WINDOW",
      "COUNT_WINDOW", "EVENT_WINDOW", "EXTERNAL_WINDOW").find(c.contains)
    if (winClauseKw.isDefined && groupKeys.length > partCols.length &&
        !c.contains("GROUP BY") && !df.columns.contains("_wjlid")) {
      val aggRe = ("(?i)\\b(count|sum|avg|min|max|min_by|max_by|first|" +
        "last|last_row|stddev|stdvar|std|var|spread|mode|twa|irate|" +
        "elapsed|hyperloglog|percentile|apercentile|histogram|" +
        "leastsquares|sample)\\s*\\(").r
      val hasAgg = selectItems.exists { case (e, _) =>
        aggRe.findFirstIn(e).isDefined }
      val indefRe = ("(?i)\\b(diff|csum|mavg|derivative|statecount|" +
        "stateduration|tail|unique|fill_forward|lag|lead)\\s*\\(").r
      val hasIndef = selectItems.exists { case (e, _) =>
        indefRe.findFirstIn(e).isDefined }
      val baseCols = df.columns.filterNot(cn => cn.startsWith("_") ||
        groupKeys.exists(_.equalsIgnoreCase(cn)) ||
        partCols.exists(_.equalsIgnoreCase(cn)) ||
        stateTexts.exists(_.equalsIgnoreCase(cn)) ||
        cn.equalsIgnoreCase("tbname"))
      def refsBase(e: String): Boolean = {
        val s = e.replaceAll("'[^']*'", "")
        baseCols.exists(cn =>
          ("(?i)(?<![\\w])" + java.util.regex.Pattern.quote(cn) +
            "(?![\\w])").r.findFirstIn(s).isDefined)
      }
      val colExpr = selectItems.exists { case (e, _) =>
        aggRe.findFirstIn(e).isEmpty && (e.trim == "*" || refsBase(e)) }
      val projection =
        if (hasAgg) {
          require(!winModeKw.contains("SCALAR"),
            "SCALAR (projection) mode cannot carry aggregate functions")
          false
        } else if (hasIndef &&
            (colExpr || winModeKw.contains("SCALAR")))
          throw new IllegalArgumentException(
            "per-window indefinite-rows functions (diff/csum/…) are " +
              "not supported inside window queries yet")
        else if (colExpr) true
        else winModeKw match {
          case Some("SCALAR") => true
          case Some("AGG") => false
          case None => winClauseKw.contains("EXTERNAL_WINDOW")
        }
      if (projection) {
        require(!c.contains("FILL"),
          "FILL in window projection mode is not supported yet")
        require(!c.contains("HAVING"),
          "HAVING needs aggregation mode (one row per window)")
        val partExpr = groupKeys.map(k => s"`$k`").mkString(", ")
        pseudo = pseudo.map { case (k, v) =>
          k -> ("(?i)\\b(min|max|count|sum)\\s*\\(([^()]*)\\)".r
            .replaceAllIn(v, m =>
              java.util.regex.Matcher.quoteReplacement(
                s"${m.group(1)}(${m.group(2)}) OVER " +
                  s"(PARTITION BY $partExpr)")))
        }
        groupKeys = Nil
      }
    }

    // the window-join row id only survives as an implicit group key —
    // or as the HAVING group for a non-aggregate select
    // (test_join_full.py:3932 `select a.ts … window join … having
    // (count(a.ts) > 0)`); ungrouped reads without that drop it here
    // (Catalyst prunes the unused id)
    val wjlHavingRe = ("(?i)\\b(count|sum|avg|min|max|first|last|" +
      "spread|stddev|stdvar)\\s*\\(").r
    val wjlHaving = df.columns.contains("_wjlid") &&
      groupKeys.isEmpty &&
      c.get("HAVING").exists(h => wjlHavingRe.findFirstIn(h).isDefined)
    if (df.columns.contains("_wjlid") && !groupKeys.contains("_wjlid") &&
        !wjlHaving)
      df = df.drop("_wjlid")

    // ---- aggregation ----
    val isAgg = groupKeys.nonEmpty
    // fill_forward is an INDEFINITE_ROWS function (builtins.c:8187):
    // inside a windowed/grouped aggregate its last(x, true) lowering
    // would be row-order-nondeterministic, and the reference rejects
    // indef-rows functions there — fail loudly instead
    require(!(isAgg && selectItems.exists { case (e, _) =>
      "(?i)\\bfill_forward\\s*\\(".r.findFirstIn(e).isDefined }),
      "fill_forward is per-row (indefinite-rows) — not allowed inside " +
        "a window/GROUP BY aggregate")
    // HAVING over aggregates not in the select list computes as a hidden
    // boolean aggregate column, filtered then dropped; HAVING over
    // output aliases filters post-projection. Decide once, here.
    val havingAgg = if (isAgg) c.get("HAVING").filter(h =>
      ("(?i)\\b(sum|count|avg|min|max|first|last|last_row|spread|" +
        "stddev|stdvar|std|var|twa|irate|elapsed|hyperloglog|" +
        "percentile|apercentile|histogram|leastsquares|mode)\\s*\\(").r
        .findFirstIn(h).isDefined) else None
    def rewritten(e: String): String = {
      var r = e
      pseudo.foreach { case (k, v) =>
        r = r.replaceAll(s"(?i)(?<![A-Za-z0-9_])${k}(?![A-Za-z0-9_])",
          v.replace("$", "\\$"))
      }
      rewriteFuncs(r, tsCol, perSecond)
    }
    // a CONSTANT pseudo-column may accompany true aggregates without
    // GROUP BY (`SELECT tbname, count(*) FROM t1` — parTranslater
    // treats tbname as per-table constant; surfaced by corpus probe
    // receipts): lower the bare tbname item as min(tbname), making the
    // query a plain global aggregate
    if (!isAgg) {
      val trueAggRe = ("(?i)\\b(count|sum|avg|stddev|stdvar|spread|" +
        "mode|twa|irate|elapsed|hyperloglog|percentile|apercentile|" +
        "histogram|leastsquares)\\s*\\(").r
      def bareTb(e: String) = e.trim.equalsIgnoreCase("tbname") ||
        e.trim.toLowerCase.matches("[a-z_][a-z0-9_]*\\.tbname")
      // bare TAG columns ride the same way (`select t1, t2, count(*)
      // from stb` — constant per child; catalog reads mark tags in the
      // schema metadata)
      def tagName(e: String): Option[String] = {
        val t = e.trim.replaceFirst("^[A-Za-z_]\\w*\\.", "")
        df.schema.fields.find(f => f.name.equalsIgnoreCase(t) &&
          f.metadata.contains("graft.tag")).map(_.name)
      }
      // an EXPRESSION over tags only (`cast(t2 as binary(12))`,
      // test_query_partitionby_basic.py:814) is also constant per
      // child — the whole item wraps in min()
      val tagCols = df.schema.fields
        .filter(_.metadata.contains("graft.tag")).map(_.name)
      def refs(e: String, cn: String): Boolean =
        ("(?i)(?<![\\w])" + java.util.regex.Pattern.quote(cn) +
          "(?![\\w])").r.findFirstIn(e.replaceAll("'[^']*'", ""))
          .isDefined
      def tagOnlyExpr(e: String): Boolean =
        tagCols.exists(refs(e, _)) &&
          !df.columns.filterNot(cn =>
            tagCols.exists(_.equalsIgnoreCase(cn))).exists(refs(e, _)) &&
          trueAggRe.findFirstIn(e).isEmpty &&
          ("(?i)\\b(first|last|last_row|min|max|top|bottom|sample|" +
            "diff|csum|mavg|derivative|tail|unique)\\s*\\(").r
            .findFirstIn(e).isEmpty
      // tbname/tags may also accompany cols()-EXPANDED selection
      // items (`select tbname, t1, cols(last(ts), c0) … from child`,
      // test_fun_select_cols.py:1376 checkRows(1)): ride the FIRST
      // expanded anchor's min_by/max_by key so a stable read reads
      // the anchor row's tbname, not an any-row pick
      val colsAnchor = selectItems.collectFirst {
        case (e, _) if trueAggRe.findFirstIn(e).isEmpty &&
            "(?i)^(max_by|min_by)\\s*\\(".r.findFirstIn(e.trim)
              .isDefined =>
          val fnName = e.trim.substring(0, 6).toLowerCase
          val (_, argsA, _) = analyticCallSpan(e.trim, fnName)
          (fnName, argsA.lift(1))
      }.collect { case (f, Some(k)) => (f, k) }
      def rideWrap(inner: String): String = colsAnchor match {
        case Some((f, k)) => s"$f($inner, $k)"
        case None => s"min($inner)"
      }
      if ((selectItems.exists { case (e, _) =>
            trueAggRe.findFirstIn(e).isDefined } ||
           colsAnchor.isDefined) &&
          selectItems.exists { case (e, _) =>
            bareTb(e) || tagName(e).isDefined || tagOnlyExpr(e) })
        selectItems = selectItems.map { case (e, a) =>
          if (bareTb(e))
            (rideWrap("tbname"), if (a == e) "tbname" else a)
          else tagName(e) match {
            case Some(t) => (rideWrap(s"`$t`"), if (a == e) t else a)
            case None =>
              if (tagOnlyExpr(e) && trueAggRe.findFirstIn(e).isEmpty)
                (rideWrap(e), a)
              else (e, a)
          }
        }
    }
    var hiddenKeys: Seq[String] = Nil
    val out: DataFrame =
      if (!isAgg) {
        // selection functions accompanied by bare columns
        // (test_orderby_basic.py `SELECT last(ts), ts FROM t1` = one
        // row; the bare column reads from the SELECTED row). Exactly
        // one distinct anchor may govern — the reference rejects
        // mixed-anchor accompaniment (`first(ts), ts … last(ts)`).
        val selAnchor =
          "(?i)^(first|last_row|last|min|max)\\s*\\((.+)\\)$".r
        // the anchor call must span the WHOLE item — `last(v) + 1` or
        // `last(v), first(w)` fragments must not match
        def wholeCall(e: String): Boolean = {
          val i = e.indexOf('(')
          var d = 0
          var j = i
          while (i >= 0 && j < e.length) {
            if (e(j) == '(') d += 1
            else if (e(j) == ')') { d -= 1; if (d == 0) return j == e.length - 1 }
            j += 1
          }
          false
        }
        val wholeAnchors = selectItems.flatMap { case (e, _) =>
          selAnchor.findFirstMatchIn(e.trim)
            .filter(_ => wholeCall(e.trim))
            .map(m => (m.group(1).toLowerCase, m.group(2).trim)) }
          .distinct
        // an anchor EMBEDDED in arithmetic (`2 + last(ts)`) also
        // governs accompaniment — extract via the call-span walker so
        // nested parens can't fool the arg capture
        val looseAnchors =
          if (wholeAnchors.nonEmpty) wholeAnchors
          else selectItems.flatMap { case (e, _) =>
            "(?i)\\b(first|last_row|last|min|max)\\s*\\(".r
              .findFirstMatchIn(e).map { m =>
                val (_, argsA, _) = analyticCallSpan(e, m.group(1))
                (m.group(1).toLowerCase,
                  argsA.headOption.getOrElse(tsCol).trim)
              }
          }.distinct
        val anchors = wholeAnchors
        // a parenthesized bare column `(ts)` accompanies like `ts`
        def stripP(e: String): String = {
          val t = e.trim
          if (t.startsWith("(") && t.endsWith(")") &&
            wholeCall(t)) stripP(t.substring(1, t.length - 1))
          else t
        }
        def isBare(e: String) =
          df.columns.exists(_.equalsIgnoreCase(stripP(e)))
        val hasStar = selectItems.exists(_._1.trim == "*")
        val accAnchors =
          if (anchors.nonEmpty) anchors
          else if (hasStar) looseAnchors
          else Nil
        // a pure scalar EXPRESSION over base columns accompanies
        // like a bare column (test_fun_select_last_row.py:968
        // `select tbname, last_row(c1), abs(c1) from stb1`;
        // `select last_row(*), abs(c1/2)+100 …`): it evaluates ON
        // the selected row — but never an item carrying its own
        // aggregate/anchor call (those rewrite via rewritten())
        val anyAggRe = ("(?i)\\b(first|last_row|last|min|max|" +
          "count|sum|avg|stddev|stdvar|std|var|spread|mode|twa|" +
          "irate|elapsed|hyperloglog|percentile|apercentile|" +
          "histogram|leastsquares|sample|top|bottom|diff|csum|" +
          "mavg|derivative|statecount|stateduration|tail|unique|" +
          "interp|cols)\\s*\\(").r
        def refsBaseCol(e: String): Boolean = {
          val s = e.replaceAll("'[^']*'", "")
          df.columns.exists(cn => ("(?i)(?<![\\w])" +
            java.util.regex.Pattern.quote(cn) + "(?![\\w])").r
            .findFirstIn(s).isDefined)
        }
        def exprRide(e: String): Boolean = refsBaseCol(e) &&
          anyAggRe.findFirstIn(e).isEmpty &&
          "(?i)\\bOVER\\b".r.findFirstIn(e).isEmpty
        val cols =
          if (accAnchors.nonEmpty && selectItems.exists { case (e, _) =>
              isBare(e) || e.trim == "*" || exprRide(e) }) {
            // last_row(*) star-expands to one call per column, all
            // reading THE same physical last row — row-consistent, so
            // the expanded set accompanies as one anchor
            // (test_fun_select_last_row.py `select last_row(*), ts,
            // 'abc', 123.981, tbname from m1`)
            require(accAnchors.length == 1 ||
              accAnchors.forall(_._1 == "last_row"),
              s"bare columns accompany exactly one selection function," +
                s" got: ${accAnchors.map(_._1).mkString(", ")}")
            val (fn, arg) = accAnchors.head
            // same row choice as the rewriteFuncs anchor lowerings;
            // min/max anchors may carry an expression arg
            // (`max(cast(ts as bigint))`) — rewrite it like any item
            def acc(cT: String): String = fn match {
              case "first" => s"min_by($cT, $tsCol)"
              case "last" | "last_row" => s"max_by($cT, $tsCol)"
              case "min" => s"min_by($cT, ${rewritten(arg)})"
              case _ => s"max_by($cT, ${rewritten(arg)})"
            }
            selectItems.flatMap { case (e, a) =>
              // `*` expands to every column, each accompanying
              if (e.trim == "*") starCols(df).map(cn =>
                expr(acc(cn)).as(cn))
              else if (isBare(e)) Seq(expr(acc(stripP(e))).as(a))
              else if (exprRide(e))
                Seq(expr(acc(s"(${rewritten(e)})")).as(a))
              else Seq(expr(rewritten(e)).as(a)) }
          } else selectItems.flatMap {
            case ("*", _) => starCols(df).map(col)
            case (e, a) => Seq(expr(rewritten(e)).as(a)) }
        // OVER items compute via withColumn: a bare `voltage` item
        // followed by `rank() OVER (ORDER BY voltage)` would otherwise
        // hit Spark's lateral-column-alias restriction (the window
        // would resolve `voltage` against the projected alias)
        val hasOver = selectItems.exists { case (e, _) =>
          "(?i)\\bOVER\\b".r.findFirstIn(e).isDefined }
        val proj =
          if (hasOver && anchors.isEmpty) {
            var work = df
            val colSeqs = selectItems.zipWithIndex.map {
              case (("*", _), _) => df.columns.toSeq.map(col)
              case ((e, a), i) =>
                val r = rewritten(e)
                if ("(?i)\\bOVER\\b".r.findFirstIn(r).isDefined) {
                  val tmp = s"_ov$i"
                  work = work.withColumn(tmp, expr(r))
                  Seq(col(tmp).as(a))
                } else Seq(expr(r).as(a))
            }
            work.select(colSeqs.flatten: _*)
          } else df.select(
            (if (wjlHaving) cols :+ col("_wjlid") else cols): _*)
        if (isDistinct) proj.distinct() else proj
      } else {
        // identifier matching is case-insensitive (unquoted identifiers
        // lowercase in the reference), so SELECT/GROUP BY/STATE_WINDOW
        // spellings may differ in case
        def isKey(e: String) = groupKeys.exists(_.equalsIgnoreCase(e))
        val keyItems = selectItems.filter { case (e, _) => isKey(e) }
        val aggItems = selectItems.filterNot { case (e, _) => isKey(e) }
        // plain columns / `*` under bare PARTITION BY also pass rows
        // through (test_partition.py `SELECT * FROM meters PARTITION
        // BY c1`) — partitions only scope SLIMIT / per-shard LIMIT
        val plainRows = !c.contains("GROUP BY") &&
          selectItems.forall { case (e, _) =>
            e.trim == "*" || df.columns.exists(_.equalsIgnoreCase(e.trim)) }
        if ((aggItems.isEmpty || plainRows) &&
            // window pseudo keys (_wstart/_session/…) never pass rows
            // through, but synthetic PARTITION BY expression keys
            // (_pk<i>, e.g. `PARTITION BY f1, (1)`) are slice context
            // only — rows still pass (test_partition.py)
            groupKeys.forall(k =>
              !k.startsWith("_") || partCols.contains(k))) {
          // key-only select list (test_partition.py `SELECT c1 FROM
          // meters PARTITION BY c1 SLIMIT 2`): GROUP BY collapses to
          // one row per group; PARTITION BY passes the rows through —
          // the partitions exist as SLIMIT/LIMIT context only
          val proj =
            if (c.contains("GROUP BY")) {
              var g = df.select(groupKeys.map(col): _*).distinct()
              keyItems.foreach { case (e, a) =>
                if (e != a) g = g.withColumnRenamed(e, a) }
              g.select(selectItems.map { case (_, a) => col(a) }: _*)
            } else df.select(selectItems.flatMap {
              case ("*", _) => starCols(df).map(col)
              case (e, a) => Seq(expr(rewritten(e)).as(a)) }: _*)
          var res2 = proj
          c.get("HAVING").foreach { h =>
            val hvAggRe = ("(?i)\\b(count|sum|avg|min|max|first|last|" +
              "last_row|spread|stddev|stdvar|twa|elapsed|" +
              "hyperloglog)\\s*\\(").r
            if (hvAggRe.findFirstIn(h).isDefined) {
              // key-only select + aggregate HAVING collapses to one
              // row per group/partition
              // (test_query_partitionby_basic.py `select tbname from
              // stb partition by tbname having count(*)>=0` = one row
              // per child): aggregate the predicate per key, filter,
              // emit the keys
              var g = df.groupBy(groupKeys.map(col): _*)
                .agg(expr(rewritten(h)).as("__hv"))
                .filter(col("__hv")).drop("__hv")
              keyItems.foreach { case (e, a) =>
                if (e != a) g = g.withColumnRenamed(e, a) }
              res2 = g.select(selectItems.map { case (_, a) => col(a) }: _*)
            } else res2 = res2.filter(expr(h))
          }
          // the partition keys as they appear in the output (via `*`
          // every key column survives) — the SLIMIT slice identity and
          // the per-shard LIMIT partition
          val sliceKeys =
            if (selectItems.exists(_._1.trim == "*")) groupKeys
            else selectItems.collect { case (e, a) if isKey(e) => a }
          c.get("SLIMIT").foreach { raw =>
            val (sOff, sN) = splitArgs(raw) match {
              case Seq(o, n) => (o.trim.toInt, n.trim.toInt)
              case Seq(n) => (c.get("SOFFSET").map(_.trim.toInt)
                .getOrElse(0), n.trim.toInt)
              case other =>
                throw new IllegalArgumentException(s"bad SLIMIT: $other")
            }
            if (sliceKeys.nonEmpty) {
              val slices = res2.select(sliceKeys.map(col): _*).distinct()
                .orderBy(sliceKeys.map(col): _*).offset(sOff).limit(sN)
              res2 = res2.join(broadcast(slices), sliceKeys, "left_semi")
            } else {
              // the slice key need not appear in the select list
              // (test_ts_partitonby.py `select ts from mt1 partition
              // by tbname slimit 2`): slice the PRE-projection frame
              // on the partition keys, then re-project
              val slices = df.select(groupKeys.map(col): _*).distinct()
                .orderBy(groupKeys.map(col): _*).offset(sOff).limit(sN)
              val sliced = df.join(broadcast(slices), groupKeys,
                "left_semi")
              res2 = sliced.select(selectItems.flatMap {
                case ("*", _) => starCols(df).map(col)
                case (e, a) => Seq(expr(rewritten(e)).as(a)) }: _*)
            }
          }
          c.get("ORDER BY").foreach(o => res2 = res2.orderBy(orderCols(o,
            positional = res2.columns.toSeq): _*))
          c.get("LIMIT").foreach { nRaw =>
            if (partCols.nonEmpty && !c.contains("GROUP BY") &&
                sliceKeys.nonEmpty) {
              // LIMIT under PARTITION BY caps rows PER SHARD
              // (20-select.md:141); rank within the shard, ts-ordered
              // when the row stream carries ts
              val (nLim, commaOff) = limitParts(nRaw)
              val off = commaOff
                .orElse(c.get("OFFSET").map(_.trim.toInt)).getOrElse(0)
              val ord =
                if (res2.columns.contains(tsCol)) Seq(col(tsCol))
                else res2.columns.toSeq.map(col)
              val w = Window.partitionBy(sliceKeys.map(col): _*)
                .orderBy(ord: _*)
              res2 = res2.withColumn("_srn", row_number().over(w))
                .filter(col("_srn") > off && col("_srn") <= off + nLim)
                .drop("_srn")
              // the window shuffle above destroys the global sort —
              // re-apply ORDER BY after the per-shard slice (same as
              // the agg-path branch below)
              c.get("ORDER BY").foreach(o => res2 = res2.orderBy(
                orderCols(o, positional = res2.columns.toSeq): _*))
            } else res2 = applyLimit(res2, nRaw)
          }
          return res2
        }
        require(aggItems.nonEmpty || winClauseKw.isDefined,
          "grouped query needs at least one aggregate select item")
        // a pseudo-only AGG-mode window select (`SELECT [AGG] _wstart
        // FROM … INTERVAL(…)`, 24-distinguished.md ambiguous case) has
        // zero aggregate items — the group identity alone is the row;
        // a throwaway count keeps the groupBy shape and never reaches
        // the output projection
        val aggCols = (if (aggItems.isEmpty)
            Seq(count(lit(1)).as("__noagg"))
          else aggItems.map { case (e, a) =>
            // a bare state expression is constant within its window
            val e2 = if (stateTexts.exists(_.equalsIgnoreCase(e.trim)))
              s"first($e)" else if (c.contains("FILL") &&
                e.trim.equalsIgnoreCase("_isfilled"))
              // fill pseudo-column: aggregated windows are real rows
              // (false); spine rows get the marker from the fill
              // machinery afterwards
              "min(false)" else e
            expr(rewritten(e2)).as(a) }) ++
          havingAgg.map(h => expr(rewritten(h)).as("__having")).toSeq ++
          trueFor.map(p => expr(p).as("__truefor")).toSeq
        var g = df.groupBy(groupKeys.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
        havingAgg.foreach(_ => g = g.filter(col("__having")))
        trueFor.foreach(_ => g = g.filter(col("__truefor")))
        // ---- FILL over EXTERNAL_WINDOW (externalwindowoperator.c
        // fill path; 13-TimeSeriesExt/08-ExternalWindow/
        // test_external_fill.py): empty DECLARED windows materialize
        // per observed partition — NULL/VALUE substitute into the
        // aggregate slots (count(*) too), PREV/NEXT carry the
        // neighboring non-empty window's aggregates, the non-forced
        // variants restrict to windows inside the partition's data
        // extent, and LINEAR/NEAR/SURROUND are the reference's own
        // error cases. Runs pre-projection, where the window identity
        // columns still exist; select items that are pure functions of
        // the identity (`cast(_wstart as bigint)`) are COMPUTED on
        // filled rows, everything else fills. The frame is
        // window-list x partition sized — driver-safe by construction.
        if (extWins.isDefined && c.contains("FILL")) {
          import org.apache.spark.sql.expressions.{Window => W}
          val fArgs = splitArgs(stripOuterParens(c("FILL"))).map(_.trim)
          val fMode = fArgs.head.toUpperCase
          if (fMode != "NONE") {
            require(Set("NULL", "NULL_F", "VALUE", "VALUE_F",
              "PREV", "NEXT")(fMode),
              s"FILL($fMode) is not supported with EXTERNAL_WINDOW")
            val aggRe2 = ("(?i)\\b(count|sum|avg|min|max|first|last|" +
              "last_row|stddev|stdvar|spread|mode|twa|irate|elapsed|" +
              "hyperloglog|percentile|apercentile|histogram|" +
              "leastsquares|sample)\\s*\\(").r
            def keyDerived(e: String) =
              aggRe2.findFirstIn(e).isEmpty &&
                "(?i)\\b(_wstart|_wend|_wduration)\\b".r
                  .findFirstIn(e).isDefined
            val fillItems = aggItems
              .filterNot { case (e, _) => keyDerived(e) }.map(_._2)
            // group keys = partCols + bounds + the window ride-along
            // columns; the universe carries them all
            val keyCols = groupKeys
            val parts =
              if (partCols.isEmpty) None
              else Some(g.select(partCols.map(col): _*).dropDuplicates())
            val universe = parts
              .map(_.crossJoin(broadcast(extWins.get)))
              .getOrElse(extWins.get)
            var missing = universe.join(g,
              partCols ++ Seq("_wstart", "_wend"), "left_anti")
            if (!fMode.endsWith("_F") && fMode != "PREV" &&
                fMode != "NEXT") {
              // non-forced: only windows inside the partition's own
              // data extent fill (fillGetWindowRange semantics)
              val ext0 =
                if (partCols.isEmpty)
                  g.agg(min(col("_wstart")).as("_lo"),
                    max(col("_wstart")).as("_hi"))
                else g.groupBy(partCols.map(col): _*)
                  .agg(min(col("_wstart")).as("_lo"),
                    max(col("_wstart")).as("_hi"))
              missing =
                (if (partCols.isEmpty) missing.crossJoin(broadcast(ext0))
                 else missing.join(broadcast(ext0), partCols))
                  .filter(col("_wstart") > col("_lo") &&
                    col("_wstart") < col("_hi"))
                  .drop("_lo", "_hi")
            }
            val gTypes =
              g.schema.fields.map(f => f.name -> f.dataType).toMap
            val fillVals: Map[String, Option[Double]] = fMode match {
              case "VALUE" | "VALUE_F" =>
                val lits = fArgs.tail match {
                  case Seq() => Seq.fill(fillItems.length)("0")
                  case Seq(x) => Seq.fill(fillItems.length)(x)
                  case many =>
                    require(many.length == fillItems.length,
                      s"FILL(VALUE …) carries ${many.length} literals " +
                        s"for ${fillItems.length} fillable columns")
                    many
                }
                fillItems.zip(lits.map(fillConst)).toMap
              case _ => fillItems.map(_ -> None).toMap
            }
            val filledRows = missing.select(g.columns.map { cn =>
              if (keyCols.exists(_.equalsIgnoreCase(cn))) col(cn)
              else aggItems.find(_._2 == cn) match {
                case Some((e, a)) if keyDerived(e) =>
                  expr(rewritten(e)).cast(gTypes(cn)).as(a)
                case Some((_, a)) =>
                  fillVals.getOrElse(a, None) match {
                    case Some(d) => lit(d).cast(gTypes(cn)).as(a)
                    case None => lit(null).cast(gTypes(cn)).as(a)
                  }
                case None => lit(null).cast(gTypes(cn)).as(cn)
              }
            }: _*)
            if (fMode == "PREV" || fMode == "NEXT") {
              // leading (PREV) / trailing (NEXT) gaps with nothing to
              // carry stay as NULL rows — the reference emits them for
              // every OBSERVED partition (partition t1=2's first
              // window in the partitioned test). A keyless frame with
              // NO data at all emits nothing: the empty `g` makes the
              // universe empty via the guard below.
              val anyData =
                if (partCols.nonEmpty) true // universe ⊆ observed parts
                else !g.isEmpty
              if (anyData) {
                val marked = g.withColumn("_gapfill", lit(false))
                  .unionByName(
                    filledRows.withColumn("_gapfill", lit(true)))
                val w0 =
                  (if (partCols.isEmpty) W.partitionBy(lit(1))
                   else W.partitionBy(partCols.map(col): _*))
                    .orderBy(col("_wstart"), col("_wend"))
                val (frame, pick) =
                  if (fMode == "PREV")
                    (w0.rowsBetween(W.unboundedPreceding, 0),
                      (c0: Column) => last(c0, ignoreNulls = true))
                  else
                    (w0.rowsBetween(0, W.unboundedFollowing),
                      (c0: Column) => first(c0, ignoreNulls = true))
                var m2 = marked
                fillItems.foreach { a =>
                  m2 = m2.withColumn(a,
                    when(col("_gapfill"),
                      pick(when(!col("_gapfill"), col(a))).over(frame))
                      .otherwise(col(a)))
                }
                g = m2.drop("_gapfill")
              }
            } else g = g.unionByName(filledRows)
          }
        }
        // expose key aliases, then project to the select list (drops
        // internal group ids like _session/_wid and __having) — but
        // RETAIN unselected plain group keys: the reference lets
        // ORDER BY / SLIMIT name a partition key that is not in the
        // select list (`SELECT _wstart, count(*) … PARTITION BY
        // tbname … ORDER BY tbname`); they drop again after the tail
        // clauses have sorted/sliced
        keyItems.foreach { case (e, a) =>
          if (e != a) g = g.withColumnRenamed(e, a) }
        // a FILL needs the raw window key even when the select list
        // carries it only through an expression (`cast(_wstart as
        // bigint)`) or not at all — retain it hidden for the spine
        // join, dropped again with the other hidden keys
        hiddenKeys = groupKeys.filter(k => (!k.startsWith("_") ||
            (k.equalsIgnoreCase("_wstart") && c.contains("FILL"))) &&
          !selectItems.exists { case (_, a) => a.equalsIgnoreCase(k) } &&
          g.columns.contains(k))
        g.select((selectItems.map { case (_, a) => col(a) } ++
          hiddenKeys.map(col)): _*)
      }

    var res = out
    if (wjlHaving) {
      // HAVING over a window join without aggregate select items
      // filters per-left-row WINDOW SETS (test_join_full.py:3932):
      // each aggregate call evaluates over the row's _wjlid group;
      // surviving groups emit one row
      c.get("HAVING").foreach { h =>
        var hw = rewritten(h)
        Seq("count", "sum", "avg", "min", "max", "min_by", "max_by",
          "stddev", "stdvar").foreach { fn =>
          hw = rewriteCall(hw, fn, a =>
            s"($fn($a) OVER (PARTITION BY _wjlid))")
        }
        res = res.withColumn("__hv", expr(hw)).filter(col("__hv"))
          .drop("__hv")
      }
      res = res.dropDuplicates("_wjlid").drop("_wjlid")
    } else if (havingAgg.isEmpty)
      c.get("HAVING").foreach(h => res = res.filter(expr(h)))

    // ---- FILL over an interval grid ----
    (c.get("FILL"), intervalSpec) match {
      case (Some(f), Some((iv, off))) =>
        val args = splitArgs(stripOuterParens(f))
        // case-insensitive: a select item spelled `_WSTART` is still
        // the group key, not a fillable value column — and so is a
        // RENAMED key (`select _wstart ts, count(*) …`): exclude the
        // aliases of key-expression select items too
        // a select item is KEY-DERIVED when it references a window
        // pseudo-col and no data column (`cast(_wstart as bigint)`,
        // `_wstart + 1d`): not a fillable value — reconstructed on the
        // spine rows below instead
        def keyDerived(e0: String): Boolean = {
          val et = e0.trim
          val hasWin = ("(?i)(?<![\\w])(_wstart|_wend|_wduration)" +
            "(?![\\w])").r.findFirstIn(et).isDefined
          hasWin && !df.columns.filterNot(_.startsWith("_")).exists(cn =>
            ("(?i)(?<![\\w])" + java.util.regex.Pattern.quote(cn) +
              "(?![\\w])").r.findFirstIn(et).isDefined)
        }
        val keyAliases = selectItems.collect {
          case (e, a) if groupKeys.exists(_.equalsIgnoreCase(e.trim)) ||
            keyDerived(e) || e.trim.equalsIgnoreCase("_isfilled") => a
        }
        val valueCols = res.columns
          .filterNot(cn => groupKeys.exists(_.equalsIgnoreCase(cn)))
          .filterNot(cn => keyAliases.exists(_.equalsIgnoreCase(cn)))
          .filterNot(_.equalsIgnoreCase("_isfilled")).toSeq
        // FILL(VALUE, v1[, v2 …]): one literal per value column; a
        // single literal (or none — the grammar permits bare
        // FILL(VALUE), filling 0) broadcasts to every column
        def valueList(forced: Boolean): Seq[FillOps.FillMode] = {
          // a NULL literal in the VALUE list fills NULL for that
          // column (fill.c fillGenerateData NULL branch); constant
          // arithmetic and C-style coercions fold via fillConst
          def one(t0: String): FillOps.FillMode = fillConst(t0) match {
            case None => FillOps.FillNull
            case Some(d) =>
              if (forced) FillOps.FillValueF(d) else FillOps.FillValue(d)
          }
          // CONSTANT select items (`select _wstart, 't1', 1, count(*)
          // …` — test_notify trigger shapes) do not consume positional
          // literals: numeric constants fill themselves, string
          // constants fill NULL (rendering-only gap)
          val constFill: Map[String, FillOps.FillMode] =
            selectItems.collect {
              case (e, a) if e.trim.matches("[-+]?\\d+(\\.\\d+)?") &&
                valueCols.contains(a) => a -> one(e.trim)
              case (e, a) if e.trim.matches("'[^']*'") &&
                valueCols.contains(a) =>
                a -> (FillOps.FillNull: FillOps.FillMode)
            }.toMap
          args.tail.map(_.trim) match {
            case Seq() => Seq.fill(valueCols.length)(one("0"))
            case Seq(x) => Seq.fill(valueCols.length)(one(x))
            case many =>
              val targets = valueCols.filterNot(constFill.contains)
              require(many.length == targets.length ||
                many.length == valueCols.length,
                s"FILL(VALUE …) carries ${many.length} literals for " +
                  s"${targets.length} value columns")
              if (many.length == valueCols.length) many.map(one)
              else {
                val byCol = targets.zip(many.map(one)).toMap
                valueCols.map(cn => byCol.getOrElse(cn, constFill(cn)))
              }
          }
        }
        val modes: Seq[FillOps.FillMode] = args.head.toUpperCase match {
          case "NONE" => Seq.fill(valueCols.length)(FillOps.FillNone)
          case "NULL" => Seq.fill(valueCols.length)(FillOps.FillNull)
          case "NULL_F" => Seq.fill(valueCols.length)(FillOps.FillNullF)
          case "VALUE" => valueList(forced = false)
          case "VALUE_F" => valueList(forced = true)
          case "PREV" => Seq.fill(valueCols.length)(FillOps.FillPrev)
          case "NEXT" => Seq.fill(valueCols.length)(FillOps.FillNext)
          case "NEAR" => Seq.fill(valueCols.length)(FillOps.FillNear)
          case "LINEAR" => Seq.fill(valueCols.length)(FillOps.FillLinear)
          case other => throw new IllegalArgumentException(s"FILL $other")
        }
        // the key may already carry its output alias (`_wstart ts`)
        val wsName =
          if (res.columns.exists(_.equalsIgnoreCase("_wstart"))) "_wstart"
          else selectItems.collectFirst {
            case (e, a) if e.trim.equalsIgnoreCase("_wstart") => a
          }.getOrElse("_wstart")
        // fill span = the WHERE ts-range when bounded (qStart/qEnd
        // already absorbed every conjunct ORDER and datetime spelling
        // — `ts<'…' and ts>='…'` included), else the RESULT's own
        // window extent (fillGetWindowRange). One tiny agg over the
        // already-aggregated frame; empty input fills nothing.
        val (t0, t1) =
          if (qStart != Long.MinValue && qEnd != Long.MaxValue)
            (qStart, qEnd + 1)
          else {
            val mm = res.agg(min(col(wsName)), max(col(wsName))).head
            if (mm.isNullAt(0)) (0L, 0L) else (mm.getLong(0), mm.getLong(1) + iv)
          }
        if (t1 > t0) {
          res = FillOps.fillIntervalMulti(res, wsName,
            valueCols.zip(modes),
            groupKeys.filterNot(_ == "_wstart"), iv, t0, t1 - 1,
            offsetUs = off)
          // KEY-DERIVED ride-alongs (`_wend te`, `cast(_wstart as
          // bigint) ws`, `_wstart + 1d`) reconstruct on the spine rows
          // from the grid bucket — the same rewritten expression the
          // aggregate path evaluated (pseudo map folds _wend/
          // _wduration onto _wstart)
          selectItems.foreach { case (e, a) =>
            val et = e.trim
            if (res.columns.contains(a) &&
                !a.equalsIgnoreCase("_wstart") &&
                !groupKeys.exists(_.equalsIgnoreCase(et)) &&
                keyDerived(e)) {
              val rw0 = rewritten(et)
              val rw =
                if (wsName == "_wstart") rw0
                else rw0.replaceAll("(?i)(?<![\\w])_wstart(?![\\w])",
                  s"`$wsName`")
              res = res.withColumn(a, coalesce(col(a), expr(rw)))
            }
          }
        }
      case (Some(f), None) if calFillSpec.isDefined =>
        // FILL over a CALENDAR interval grid (INTERVAL 1n/1q/1y): the
        // month-boundary window starts between the query range (or the
        // result's own extent) enumerate driver-side — a query-ranged,
        // small list — and feed the spine as a literal array
        val args = splitArgs(stripOuterParens(f))
        val isFilledAliases = selectItems.collect {
          case (e, a) if e.trim.equalsIgnoreCase("_isfilled") => a }
        val valueCols = res.columns
          .filterNot(cn => groupKeys.exists(_.equalsIgnoreCase(cn)))
          .filterNot(cn => isFilledAliases.exists(_.equalsIgnoreCase(cn)))
          .filterNot(_.equalsIgnoreCase("_isfilled")).toSeq
        def valueList(forced: Boolean): Seq[FillOps.FillMode] = {
          def one(t0: String): FillOps.FillMode = fillConst(t0) match {
            case None => FillOps.FillNull
            case Some(d) =>
              if (forced) FillOps.FillValueF(d) else FillOps.FillValue(d)
          }
          args.tail.map(_.trim) match {
            case Seq() => Seq.fill(valueCols.length)(one("0"))
            case Seq(x) => Seq.fill(valueCols.length)(one(x))
            case many =>
              require(many.length == valueCols.length,
                s"FILL(VALUE …) carries ${many.length} literals for " +
                  s"${valueCols.length} value columns")
              many.map(one)
          }
        }
        val modes: Seq[FillOps.FillMode] = args.head.toUpperCase match {
          case "NONE" => Seq.fill(valueCols.length)(FillOps.FillNone)
          case "NULL" => Seq.fill(valueCols.length)(FillOps.FillNull)
          case "NULL_F" => Seq.fill(valueCols.length)(FillOps.FillNullF)
          case "VALUE" => valueList(forced = false)
          case "VALUE_F" => valueList(forced = true)
          case "PREV" => Seq.fill(valueCols.length)(FillOps.FillPrev)
          case "NEXT" => Seq.fill(valueCols.length)(FillOps.FillNext)
          case "NEAR" => Seq.fill(valueCols.length)(FillOps.FillNear)
          case "LINEAR" => Seq.fill(valueCols.length)(FillOps.FillLinear)
          case other => throw new IllegalArgumentException(s"FILL $other")
        }
        val (k, offM, offT) = calFillSpec.get
        def bucketOf(t: Long): Long = {
          val secs = java.lang.Math.floorDiv(t - offT, perSecond)
          val z = java.time.Instant.ofEpochSecond(secs)
            .atZone(java.time.ZoneOffset.UTC)
          val m = (z.getYear - 1970) * 12L + z.getMonthValue - 1 - offM
          m - java.lang.Math.floorMod(m, k)
        }
        def startOf(b: Long): Long = java.time.ZonedDateTime.of(
          1970 + java.lang.Math.floorDiv(b + offM, 12L).toInt,
          java.lang.Math.floorMod(b + offM, 12L).toInt + 1,
          1, 0, 0, 0, 0, java.time.ZoneOffset.UTC)
          .toEpochSecond * perSecond + offT
        val range =
          s"(?i).*\\b$tsCol\\s*>=\\s*(\\d+)\\s*AND\\s*$tsCol\\s*<\\s*(\\d+).*".r
        val rangeTs =
          s"(?i).*\\b$tsCol\\s*>=\\s*'([^']+)'\\s*AND\\s*$tsCol\\s*<\\s*'([^']+)'.*".r
        val (bLo, bHi) = c.get("WHERE") match {
          case Some(range(a, b)) => (bucketOf(a.toLong), bucketOf(b.toLong - 1))
          case Some(rangeTs(a, b))
              if tsLitTicks(s"'$a'", perSecond).isDefined &&
                 tsLitTicks(s"'$b'", perSecond).isDefined =>
            (bucketOf(tsLitTicks(s"'$a'", perSecond).get),
              bucketOf(tsLitTicks(s"'$b'", perSecond).get - 1))
          case _ =>
            val mm = res.agg(min(col("_wstart")), max(col("_wstart"))).head
            if (mm.isNullAt(0)) (0L, -1L)
            else (bucketOf(mm.getLong(0)), bucketOf(mm.getLong(1)))
        }
        val nBuckets = if (bHi < bLo) 0L else (bHi - bLo) / k + 1
        require(nBuckets <= 200000,
          s"calendar FILL grid too large: $nBuckets windows")
        val grid = (bLo to bHi by k).map(startOf)
        if (grid.nonEmpty)
          res = FillOps.fillIntervalMulti(res, "_wstart",
            valueCols.zip(modes),
            groupKeys.filterNot(_ == "_wstart"), 1L, 0L, 0L,
            gridStarts = Some(grid))
      case (Some(_), None) if extWins.isDefined =>
        () // applied at the aggregation stage (external-window fill)
      case (Some(_), None) =>
        throw new IllegalArgumentException("FILL requires INTERVAL")
      case _ =>
    }
    // the reference emits `_isfilled` ONLY when the select list names
    // it (a fill pseudo-column, not an implicit output) — aliased
    // selections copy from the fill machinery's marker, then the
    // marker itself drops unless named verbatim. Also keeps FILL
    // branches union-compatible with non-FILL branches
    // (test_fun_agg_elapsed.py `elapsed … interval(10s) union all
    // elapsed … interval(10s) fill(prev)` positives).
    if (res.columns.contains("_isfilled")) {
      selectItems.foreach { case (e, a) =>
        if (e.trim.equalsIgnoreCase("_isfilled") &&
            !a.equalsIgnoreCase("_isfilled") && res.columns.contains(a))
          res = res.withColumn(a, col("_isfilled"))
      }
      if (!selectItems.exists { case (e, a) =>
          a.equalsIgnoreCase("_isfilled") &&
            e.trim.equalsIgnoreCase("_isfilled") })
        res = res.drop("_isfilled")
    }

    // SLIMIT limits the NUMBER of output partition slices, not rows per
    // slice (docs/en/14-reference/03-taos-sql/20-select.md:140,665-666:
    // "control the number of output slices"; `SLIMIT o, n` abbreviates
    // `SLIMIT n SOFFSET o`). Slices are ordered by the partition key so
    // the selection is deterministic across engines. The legacy
    // one-slice-under-ORDER-BY restriction (20-select.md:668) is not
    // enforced — ORDER BY here only orders the output. The slice list is
    // small by construction (≤ soffset+n keys), so it broadcasts.
    c.get("SLIMIT").foreach { raw =>
      // slices are the PARTITION BY cols or — reference parity
      // (sql.y:3111-3114 attaches slimit_clause_opt to any partitioned
      // query, GROUP BY included; e.g. `… GROUP BY tbname, ts ORDER BY
      // ts SLIMIT 1`) — the GROUP BY keys when there is no PARTITION
      // BY. Window pseudo keys are never slice identity.
      val sliceCols =
        if (partCols.nonEmpty) partCols
        else groupKeys.filterNot(Set("_wstart", "_wend", "_session",
          "_wgrp", "_wid"))
      require(sliceCols.nonEmpty, "SLIMIT needs PARTITION BY or GROUP BY")
      val (sOff, sN) = splitArgs(raw) match {
        case Seq(o, n) => (o.trim.toInt, n.trim.toInt)
        case Seq(n) =>
          (c.get("SOFFSET").map(_.trim.toInt).getOrElse(0), n.trim.toInt)
        case other =>
          throw new IllegalArgumentException(s"bad SLIMIT: $other")
      }
      val slices = res.select(sliceCols.map(col): _*).distinct()
        .orderBy(sliceCols.map(col): _*).offset(sOff).limit(sN)
      res = res.join(broadcast(slices), sliceCols, "left_semi")
    }
    // select-item expr -> alias map lets ORDER BY name an aggregate
    // expression verbatim (e.g. ORDER BY count(*) after GROUP BY)
    val orderAliases = selectItems
      .map { case (e, a) => normExprKey(e) -> a }.toMap
    c.get("ORDER BY").foreach(o =>
      res = res.orderBy(orderCols(o, orderAliases,
        res.columns.toSeq): _*))
    c.get("LIMIT").foreach { nRaw =>
      val (nLim, commaOff) = limitParts(nRaw)
      if (partCols.nonEmpty) {
        // under PARTITION BY, LIMIT caps rows WITHIN each slice
        // (20-select.md:141,660: "LIMIT controls the output within each
        // partition slice"). Rows are taken in group-key order (window
        // starts are ts-monotone), matching the reference's per-slice
        // scan order.
        val ord: Seq[Column] = {
          val out = res.columns.toSeq
          val o = groupKeys.filterNot(partCols.contains).filter(out.contains)
            .map(col)
          val fallback = out.filterNot(partCols.contains).map(col)
          if (o.nonEmpty) o
          else if (fallback.nonEmpty) fallback
          else Seq(lit(1))
        }
        val off = commaOff
          .orElse(c.get("OFFSET").map(_.trim.toInt)).getOrElse(0)
        val w = Window.partitionBy(partCols.map(col): _*).orderBy(ord: _*)
        res = res.withColumn("_srn", row_number().over(w))
          .filter(col("_srn") > off && col("_srn") <= off + nLim)
          .drop("_srn")
        c.get("ORDER BY").foreach(o =>
          res = res.orderBy(orderCols(o, orderAliases,
        res.columns.toSeq): _*))
      } else {
        commaOff.orElse(c.get("OFFSET").map(_.trim.toInt))
          .foreach(m => res = res.offset(m))
        res = res.limit(nLim)
      }
    }
    // retained-but-unselected group keys leave the output now that
    // ORDER BY / SLIMIT / per-slice LIMIT have used them
    if (hiddenKeys.nonEmpty) res = res.drop(hiddenKeys: _*)
    res
  }
}
