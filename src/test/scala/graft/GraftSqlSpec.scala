package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

class GraftSqlSpec extends AnyFunSuite {
  import SparkTestSession._

  private def resolve(name: String): DataFrame = Tables(spark, sf, name)
  private def q(sql: String): DataFrame =
    GraftSql.query(spark, resolve, sql)

  private def sameResult(a: DataFrame, b: DataFrame): Unit = {
    val ca = a.collect().map(_.toSeq).toSeq
    val cb = b.collect().map(_.toSeq).toSeq
    assert(ca == cb, s"dialect result differs: ${ca.take(3)} vs ${cb.take(3)}")
  }

  test("FILL(VALUE…) entries fold constants with C-style coercion") {
    assert(GraftSql.fillConst("3") == Some(3.0))
    assert(GraftSql.fillConst("1 + 2") == Some(3.0))
    assert(GraftSql.fillConst("123 + 123") == Some(246.0))
    assert(GraftSql.fillConst("2 * (3 - 1)") == Some(4.0))
    assert(GraftSql.fillConst("-8") == Some(-8.0))
    assert(GraftSql.fillConst("'-8'") == Some(-8.0))
    assert(GraftSql.fillConst("'1e'") == Some(1.0))   // strtod prefix
    assert(GraftSql.fillConst("'1e1'") == Some(10.0))
    assert(GraftSql.fillConst("'abc'") == Some(0.0))  // no prefix -> 0
    assert(GraftSql.fillConst("1 + '2.0'") == Some(3.0))
    assert(GraftSql.fillConst("'2' + '1abc'") == Some(3.0))
    assert(GraftSql.fillConst("true") == Some(1.0))
    assert(GraftSql.fillConst("False") == Some(0.0))
    assert(GraftSql.fillConst("NULL") == None)
    assert(GraftSql.fillConst("1 + NULL") == None)
    // identifiers and garbage stay loud rejects (reference parse errors)
    intercept[IllegalArgumentException](GraftSql.fillConst("abc"))
    intercept[IllegalArgumentException](GraftSql.fillConst("1 ^ 2"))
    intercept[IllegalArgumentException](GraftSql.fillConst("1sa"))
  }

  test("durations parse with TDengine units") {
    assert(GraftSql.durUs("90s") == 90000000L)
    assert(GraftSql.durUs("10m") == 600000000L)
    assert(GraftSql.durUs("1h") == 3600000000L)
    assert(GraftSql.durUs("250a") == 250000L)
    assert(GraftSql.durUs("42") == 42L)
  }

  test("calendar INTERVAL + fixed SLIDING: grid starts, mktime ends") {
    import spark.implicits._
    val us = 1000000L
    def ts(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    // one row on 2024-02-25: grid = epoch-aligned 10d steps
    val df = Seq((1L, ts("2024-02-25T12:00:00Z"), 1.0))
      .toDF("event_id", "ts", "value")
    val rows = graft.sql.GraftSql.query(spark, _ => df,
      "SELECT _wstart, _wend, count(*) AS n FROM t " +
        "INTERVAL(1n) SLIDING(10d) ORDER BY _wstart")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every window start is a 10d-grid multiple covering the row
    val tenD = 10L * 86400 * us
    assert(rows.nonEmpty && rows.forall(_._1 % tenD == 0))
    assert(rows.forall { case (s0, e0, _) =>
      s0 <= ts("2024-02-25T12:00:00Z") && e0 > ts("2024-02-25T12:00:00Z") })
    // ttime.c taosTimeAdd normalizes day overflow via mktime: a grid
    // start on Jan 31 + 1 month rolls to Mar 2 (2024 is a leap year),
    // NOT a clamped Feb 29 — grid day 19753 = 2024-01-31
    val jan31 = 19753L * 86400 * us
    assert(jan31 % tenD != 0 || true) // grid membership irrelevant here
    val df2 = Seq((1L, ts("2024-03-01T00:00:00Z"), 1.0))
      .toDF("event_id", "ts", "value")
    val r2 = graft.sql.GraftSql.query(spark, _ => df2,
      "SELECT _wstart, _wend, count(*) AS n FROM t " +
        "INTERVAL(1n) SLIDING(1d) ORDER BY _wstart")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val w31 = r2.find(_._1 == jan31)
    assert(w31.isDefined, "the Jan 31 window must cover Mar 1")
    assert(w31.get._2 == ts("2024-03-02T00:00:00Z"),
      "Jan 31 + 1n must mktime-normalize to Mar 2 (leap Feb has 29)")
  }

  test("HISTOGRAM bin generation: descending + infinity forms") {
    import spark.implicits._
    val df = Seq(1L -> -5.0, 2L -> 0.0, 3L -> 3.0, 4L -> 12.0,
      5L -> 30.0, 6L -> 120.0).map { case (id, v) => (id, 0L, v) }
      .toDF("event_id", "ts", "value")
    def rows(sql: String): Seq[(Double, Double, Long)] =
      GraftSql.query(spark, _ => df, sql).collect()
        .map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    // negative width generates descending edges; the engine serves the
    // same bin set ascending (builtinsimpl.c:6099 lower/upper min-max)
    val desc = rows("""SELECT HISTOGRAM(value, 'linear_bin',
      '{"start":20, "width":-10, "count":2, "infinity":true}', 0)
      FROM t ORDER BY lower_bin""")
    assert(desc.map(t => (t._1, t._2)) == Seq(
      (Double.NegativeInfinity, 0.0), (0.0, 10.0), (10.0, 20.0),
      (20.0, Double.PositiveInfinity)))
    // membership is lower < v <= upper: 0.0 lands in (-inf,0], empty
    // (0,10] bin still emitted with its zero count
    assert(desc.map(_._3) == Seq(2L, 1L, 1L, 2L))
    // factor < 1 descends too: start*f^i = 16,8,4,2 → (2,4],(4,8],(8,16]
    val logd = rows("""SELECT HISTOGRAM(value, 'log_bin',
      '{"start":16, "factor":0.5, "count":3, "infinity":false}', 0)
      FROM t ORDER BY lower_bin""")
    assert(logd.map(t => (t._1, t._2)) ==
      Seq((2.0, 4.0), (4.0, 8.0), (8.0, 16.0)))
    assert(logd.map(_._3) == Seq(1L, 0L, 1L))
  }

  test("TRUE_FOR COUNT / AND / OR limit forms filter windows") {
    // reference executor.c isTrueForSatisfied: duration = span >= d,
    // count = rows >= n, AND/OR combine them
    val base = """SELECT user_id, _wstart, _wend, count(*) AS n
       FROM events PARTITION BY user_id
       EVENT_WINDOW START WITH value > 90 END WITH value < 10"""
    val tail = " ORDER BY user_id, _wstart"
    val all = q(base + tail).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(all.nonEmpty)
    val h = 3600000000L
    def got(opt: String) = q(base + opt + tail).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got(" TRUE_FOR(COUNT 8)").toSeq ==
      all.filter(_._4 >= 8).toSeq)
    assert(got(" TRUE_FOR(1h AND COUNT 8)").toSeq ==
      all.filter(w => w._3 - w._2 >= h && w._4 >= 8).toSeq)
    assert(got(" TRUE_FOR(1h OR COUNT 8)").toSeq ==
      all.filter(w => w._3 - w._2 >= h || w._4 >= 8).toSeq)
    // the filtered sets genuinely differ, or the test proves nothing
    assert(all.count(_._4 >= 8) != all.length)
  }

  test("calendar INTERVAL units bucket on month boundaries") {
    import spark.implicits._
    // 14 monthly points: 2023-11-15 .. 2024-12-15 (UTC, µs ticks)
    val pts = (0 until 14).map { i =>
      val y = 2023 + (10 + i) / 12; val m = (10 + i) % 12 + 1
      val ts = java.time.LocalDateTime.of(y, m, 15, 12, 0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
      (i.toLong, ts)
    }
    val df = pts.toDF("event_id", "ts")
    def buckets(sql: String): Seq[(Long, Long)] =
      GraftSql.query(spark, _ => df, sql).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
    // 1n: one bucket per calendar month, _wend = next month's 1st
    val m1 = buckets("SELECT _wstart, count(*) AS n FROM t " +
      "INTERVAL(1n) ORDER BY _wstart")
    assert(m1.length == 14 && m1.forall(_._2 == 1))
    val jan24 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(m1.map(_._1).contains(jan24))
    // 1q: quarter-aligned (2023-Q4 holds Nov+Dec here)
    val q1 = buckets("SELECT _wstart, count(*) AS n FROM t " +
      "INTERVAL(1q) ORDER BY _wstart")
    val oct23 = java.time.LocalDateTime.of(2023, 10, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(q1.head == (oct23, 2L)) // Nov 15 + Dec 15
    assert(q1.map(_._2).sum == 14)
    // 1y: calendar years 2023 (2 pts) / 2024 (12 pts)
    val y1 = buckets("SELECT _wstart, count(*) AS n FROM t " +
      "INTERVAL(1y) ORDER BY _wstart")
    assert(y1.map(_._2).toSeq == Seq(2L, 12L))
    // _wend is the NEXT calendar boundary, not start + fixed span
    val we = GraftSql.query(spark, _ => df,
      "SELECT _wstart, _wend FROM t INTERVAL(1n) ORDER BY _wstart")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val feb24 = java.time.LocalDateTime.of(2024, 2, 1, 0, 0)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    assert(we.contains((jan24, feb24))) // January is 31 days
    // a CALENDAR-unit SLIDING is rejected (parTranslater.c:13304);
    // fixed-duration SLIDING over a calendar interval is supported
    // (see the dedicated sliding test)
    intercept[IllegalArgumentException] {
      GraftSql.query(spark, _ => df,
        "SELECT _wstart, count(*) AS n FROM t INTERVAL(1y) SLIDING(1n)")
    }
  }

  test("multi-expression STATE_WINDOW windows on the tuple") {
    import graft.ops.TimeOps
    // tuple state + bare state columns in the select (docs 06-window)
    val dialect = q("""SELECT user_id, _wstart, _wend, count(*) AS n,
          event_type, value > 50 AS hi
        FROM events PARTITION BY user_id
        STATE_WINDOW(event_type, value > 50)
        ORDER BY user_id, _wstart""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getBoolean(5)))
    val e = resolve("events")
    val st = struct(col("event_type"), col("value") > 50)
    val direct = TimeOps.stateWindows(e, st, col("ts"),
        Seq(col("user_id")))
      .groupBy(col("user_id"), col("_wid"))
      .agg(min(col("ts")).as("_wstart"), max(col("ts")).as("_wend"),
        count(lit(1)).as("n"),
        min_by(col("event_type"), col("ts")).as("event_type"),
        min_by(col("value") > 50, col("ts")).as("hi"))
      .orderBy(col("user_id"), col("_wstart")).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), r.getBoolean(6)))
    assert(dialect.nonEmpty && dialect.toSeq == direct.toSeq)
    // multi-arg ZEROTH_STATE drops the baseline tuple
    val z = q("""SELECT user_id, count(*) AS n, event_type, hi
        FROM (SELECT user_id, ts, event_type,
                CAST(value > 50 AS INT) AS hi FROM events)
        PARTITION BY user_id STATE_WINDOW(event_type, hi)
        ZEROTH_STATE('click', 1)
        ORDER BY user_id, n, event_type, hi LIMIT 50""").collect()
    assert(z.nonEmpty)
    assert(!z.exists(r =>
      r.getString(2) == "click" && r.getInt(3) == 1))
  }

  test("SEMI/ANTI join text, ON residuals, and hint stripping") {
    val e = resolve("events")
    // LEFT SEMI with residuals on both sides (20-join.md example shape)
    val semi = q("""SELECT event_id FROM events a
        LEFT SEMI JOIN events b
        ON a.user_id = b.user_id AND a.value > 50 AND b.value > 95
        ORDER BY event_id""").collect().map(_.getLong(0))
    val hotUsers = e.filter(col("value") > 95)
      .select("user_id").distinct()
    val wantSemi = e.filter(col("value") > 50)
      .join(hotUsers, Seq("user_id"), "left_semi")
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    assert(semi.nonEmpty && semi.toSeq == wantSemi.toSeq)
    // LEFT ANTI with a right-side residual
    val anti = q("""SELECT event_id FROM events a
        LEFT ANTI JOIN events b
        ON a.user_id = b.user_id AND b.value > 95
        ORDER BY event_id""").collect().map(_.getLong(0))
    val wantAnti = e.join(hotUsers, Seq("user_id"), "left_anti")
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    assert(anti.toSeq == wantAnti.toSeq)
    // an anti LEFT-side ON residual is a semantics trap: it is NOT a
    // pre-filter — a false left conjunct voids every match and KEEPS
    // the row. The condition join realizes exactly that: every user
    // matches itself, so the anti keeps precisely the NOT(value > 95)
    // rows.
    val antiL = q("""SELECT event_id FROM events a
        LEFT ANTI JOIN events b
        ON a.user_id = b.user_id AND a.value > 95
        ORDER BY event_id""").collect().map(_.getLong(0))
    val wantAntiL = e.filter(!coalesce(col("value") > 95, lit(false)))
      .select("event_id").orderBy("event_id").collect().map(_.getLong(0))
    assert(antiL.toSeq == wantAntiL.toSeq)
    // INNER residual = post-join filter; hints strip cleanly
    val inner = q("""SELECT /*+ PARTITION_FIRST() */ count(*) AS n
        FROM events a JOIN events b
        ON a.event_id = b.event_id AND b.value > 95""")
      .collect()(0).getLong(0)
    assert(inner == e.filter(col("value") > 95).count())
  }

  test("chained join resolves db-qualified table AND column refs " +
      "(db.tbl.col in SELECT/ON/WHERE rewrites to the view alias)") {
    // a catalog-style resolve: strips the db prefix like
    // GraftCatalog.bare does
    val res: String => DataFrame =
      n => Tables(spark, sf, n.substring(n.indexOf('.') + 1))
    val got = GraftSql.query(spark, res,
      """SELECT testdb.orders.o_orderkey AS ok,
           testdb.customer.c_custkey AS ck, testdb.lineitem.l_linenumber AS ln
         FROM testdb.orders JOIN testdb.customer
           ON testdb.orders.o_custkey = testdb.customer.c_custkey
           JOIN testdb.lineitem
           ON testdb.lineitem.l_orderkey = testdb.orders.o_orderkey
         WHERE testdb.orders.o_orderkey <= 100
         ORDER BY ok, ln""")
    val want = q(
      """SELECT orders.o_orderkey AS ok, customer.c_custkey AS ck,
           lineitem.l_linenumber AS ln
         FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey
           JOIN lineitem ON lineitem.l_orderkey = orders.o_orderkey
         WHERE orders.o_orderkey <= 100
         ORDER BY ok, ln""")
    assert(got.collect().map(_.toSeq).toSeq ==
      want.collect().map(_.toSeq).toSeq)
    assert(got.count() > 0)
  }

  test("WINDOW JOIN implicit aggregation: per-left-row window aggs " +
      "without GROUP BY; empty window counts 0") {
    import spark.implicits._
    val l = Seq((1L, 1000000L), (1L, 9000000L), (2L, 1000000L))
      .toDF("k", "ts")
    val r = Seq((1L, 1500000L, 10.0), (1L, 2000000L, 20.0),
      (2L, 8000000L, 5.0)).toDF("k", "ts", "v")
    val res = GraftSql.query(spark,
      n => if (n == "L") l else r,
      """SELECT k, ts, count(*) AS n, count(r_v) AS nv
         FROM L WINDOW JOIN R WINDOW_OFFSET(-1s, 1s) ON L.k = R.k
         ORDER BY k, ts""")
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    // row (1, 1s): window [0s,2s] catches both right rows; (1, 9s)
    // and (2, 1s): empty windows -> count(*) = 0, not 1
    assert(res.toSeq == Seq((1L, 1000000L, 2L, 2L),
      (1L, 9000000L, 0L, 0L), (2L, 1000000L, 0L, 0L)))
    // the synthetic row id never leaks into an ungrouped read
    val plain = GraftSql.query(spark, n => if (n == "L") l else r,
      """SELECT k, ts, r_v FROM L WINDOW JOIN R
         WINDOW_OFFSET(-1s, 1s) ON L.k = R.k ORDER BY k, ts, r_v""")
    assert(!plain.columns.contains("_wjlid"))
  }

  test("window projection mode: column expressions emit every row " +
      "with rowwise pseudo-columns; SCALAR/AGG decide ambiguity") {
    import spark.implicits._
    val us = 1000000L
    val t = Seq((1L, 0L * us, 1.0), (2L, 1L * us, 2.0),
      (3L, 4L * us, 3.0), (4L, 5L * us, 4.0)).toDF("event_id", "ts", "v")
    def q2(sql: String) = GraftSql.query(spark, _ => t, sql)
    // auto projection: base column in the select list
    val proj = q2("SELECT _wstart, _wend, ts, v FROM t INTERVAL(3s) " +
      "ORDER BY ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(proj.toSeq == Seq(
      (0L, 3L * us, 0L, 1.0), (0L, 3L * us, 1L * us, 2.0),
      (3L * us, 6L * us, 4L * us, 3.0), (3L * us, 6L * us, 5L * us, 4.0)))
    // ambiguous (pseudo-only): default = aggregation, one row/window
    val agg = q2("SELECT _wstart FROM t INTERVAL(3s) ORDER BY _wstart")
      .collect().map(_.getLong(0))
    assert(agg.toSeq == Seq(0L, 3L * us))
    // SCALAR forces projection in the ambiguous case
    val sc = q2("SELECT SCALAR _wstart FROM t INTERVAL(3s) " +
      "ORDER BY _wstart").collect().map(_.getLong(0))
    assert(sc.toSeq == Seq(0L, 0L, 3L * us, 3L * us))
    // AGG keyword in the ambiguous case keeps aggregation
    val ag = q2("SELECT AGG _wstart FROM t INTERVAL(3s) " +
      "ORDER BY _wstart").collect().map(_.getLong(0))
    assert(ag.toSeq == Seq(0L, 3L * us))
    // SESSION projection: aggregate pseudos compute as window
    // functions over the session identity
    val se = q2("SELECT _wstart, _wend, event_id FROM t " +
      "SESSION(ts, 2s) ORDER BY event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(se.toSeq == Seq((0L, 1L * us, 1L), (0L, 1L * us, 2L),
      (4L * us, 5L * us, 3L), (4L * us, 5L * us, 4L)))
    // aggregates + SCALAR is contradictory — loud
    intercept[IllegalArgumentException] {
      q2("SELECT SCALAR _wstart, count(*) AS n FROM t INTERVAL(3s)")
    }
  }

  test("fill_forward inside a windowed aggregate is rejected loudly") {
    intercept[IllegalArgumentException] {
      q("SELECT _wstart, fill_forward(value) AS ff FROM events " +
        "INTERVAL(1h)")
    }
    intercept[IllegalArgumentException] {
      q("SELECT user_id, fill_forward(value) AS ff FROM events " +
        "GROUP BY user_id")
    }
  }

  test("TRUE_FOR START/END streak limits route to eventWindowsLimits") {
    import graft.ops.TimeOps
    import graft.ops.TimeOps.TrueForLimit
    val e = resolve("events")
    val dialect = q("""SELECT user_id, _wstart, _wend, count(*) AS n
       FROM events PARTITION BY user_id
       EVENT_WINDOW START WITH value > 70 END WITH value < 30
       TRUE_FOR(COUNT 2, START(COUNT 2), END(1h OR COUNT 2))
       ORDER BY user_id, _wstart""").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val direct = TimeOps.eventWindowsLimits(e, col("value") > 70,
        col("value") < 30, col("ts"), Seq("user_id"),
        Some(TrueForLimit(0, 2, "cnt")),
        Some(TrueForLimit(3600000000L, 2, "or")))
      .groupBy(col("user_id"), col("_wstart"))
      .agg(max(col("ts")).as("_wend"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .orderBy(col("user_id"), col("_wstart")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(dialect.nonEmpty)
    assert(dialect.toSeq == direct.toSeq)
  }

  test("_qduration is the inclusive tick count; INT64_MIN unbounded") {
    // reference parTranslater.c rewriteQdurationFunc: ekey - skey + 1
    // when both bounds resolve, INT64_MIN when either is unbounded
    val lo = resolve("events").agg(min("ts")).collect()(0).getLong(0)
    val hi = lo + 3600000000L
    val bounded = q(s"""SELECT _qstart AS qs, _qend AS qe,
        _qduration AS qd FROM events
        WHERE ts >= $lo AND ts <= $hi LIMIT 1""")
      .collect()(0)
    assert(bounded.getLong(0) == lo && bounded.getLong(1) == hi)
    assert(bounded.getLong(2) == hi - lo + 1)
    val open = q(s"""SELECT _qduration AS qd FROM events
        WHERE ts >= $lo LIMIT 1""").collect()(0)
    assert(open.getLong(0) == Long.MinValue)
    val none = q("SELECT _qduration AS qd FROM events LIMIT 1").collect()(0)
    assert(none.getLong(0) == Long.MinValue)
  }

  test("INTERVAL(1h) tumbling matches the direct lowering") {
    val dialect = q("""SELECT _wstart, count(*) AS n, sum(value) AS s
      FROM events INTERVAL(1h) ORDER BY _wstart""")
    val direct = graft.ops.TimeOps
      .assignIntervals(resolve("events"), col("ts"), 3600000000L)
      .groupBy(col("_wstart"))
      .agg(count(lit(1)).as("n"), Lowering.dsum(col("value")).as("s"))
      .orderBy(col("_wstart"))
    sameResult(dialect, direct)
  }

  test("PARTITION BY + INTERVAL + SLIDING matches, incl. _wend pseudo") {
    val dialect = q("""SELECT user_id, _wstart, _wend, avg(value) AS a
      FROM events PARTITION BY user_id INTERVAL(10m) SLIDING(5m)
      ORDER BY user_id, _wstart""")
    val direct = graft.ops.TimeOps
      .assignIntervals(resolve("events"), col("ts"), 600000000L, 300000000L)
      .groupBy(col("user_id"), col("_wstart"))
      .agg((Lowering.dsum(col("value")) / count(col("value"))).as("a"))
      .withColumn("_wend", col("_wstart") + 600000000L)
      .select("user_id", "_wstart", "_wend", "a")
      .orderBy("user_id", "_wstart")
    sameResult(dialect, direct)
  }

  test("WHERE + SESSION window with first/last rewrites") {
    val dialect = q("""SELECT user_id, _wstart AS ws, _wend AS we,
        first(value) AS fv, last(value) AS lv
      FROM events WHERE event_type = 'click'
      PARTITION BY user_id SESSION(ts, 30m) ORDER BY user_id, ws""")
    val base = resolve("events").filter(col("event_type") === "click")
    val direct = graft.ops.TimeOps
      .sessionize(base, col("ts"), 1800000000L, Seq(col("user_id")))
      .groupBy(col("user_id"), col("_session"))
      .agg(min(col("ts")).as("ws"), max(col("ts")).as("we"),
        min_by(col("value"), col("ts")).as("fv"),
        max_by(col("value"), col("ts")).as("lv"))
      .drop("_session")
      .orderBy("user_id", "ws")
    sameResult(dialect, direct.select("user_id", "ws", "we", "fv", "lv"))
  }

  test("STATE_WINDOW and COUNT_WINDOW lower to the window ops") {
    // LIMIT under PARTITION BY caps rows per slice (20-select.md:660)
    val st = q("""SELECT user_id, count(*) AS n FROM events
      PARTITION BY user_id STATE_WINDOW(event_type)
      ORDER BY user_id, n DESC LIMIT 5""")
    val perUser = st.collect().groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perUser.nonEmpty && perUser.values.forall(_ <= 5))
    val cw = q("""SELECT user_id, _wstart AS ws, count(*) AS n FROM events
      PARTITION BY user_id COUNT_WINDOW(50) ORDER BY user_id, ws""")
    // every full window has exactly 50 rows
    val sizes = cw.groupBy("n").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sizes.keys.max == 50)
  }

  test("FILL(PREV) inside a literal ts range matches FillOps") {
    val t0 = 1704067200000000L
    val t1 = t0 + 5L * 86400000000L
    // `_isfilled` is selected explicitly: the reference (and r19 on)
    // emits the fill marker only when the select list names it
    val dialect = q(s"""SELECT user_id, _wstart, sum(value) AS v,
      _isfilled
      FROM events WHERE ts >= $t0 AND ts < $t1
      PARTITION BY user_id INTERVAL(1d) FILL(PREV)
      ORDER BY user_id, _wstart""")
    val agg = graft.ops.TimeOps
      .assignIntervals(
        resolve("events").filter(col("ts") >= t0 && col("ts") < t1),
        col("ts"), 86400000000L)
      .groupBy(col("user_id"), col("_wstart"))
      .agg(Lowering.dsum(col("value")).as("v"))
    val direct = graft.ops.FillOps.fillInterval(agg, "_wstart", "v",
        Seq("user_id"), 86400000000L, t0, t1 - 1, graft.ops.FillOps.FillPrev)
      .select("user_id", "_wstart", "v", "_isfilled")
      .orderBy("user_id", "_wstart")
    sameResult(dialect, direct)
  }

  test("ASOF JOIN clause lowers to the union-trick asof join") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1"), (1L, 200L, "p2")).toDF("k", "ts", "pid")
    val r = Seq((1L, 90L, "c1"), (1L, 150L, "c2"), (1L, 210L, "c3"))
      .toDF("k", "ts", "cid")
    def res(n: String) = n match { case "L" => l; case "R" => r }
    val dialect = GraftSql.query(spark, res,
      "SELECT k, ts, pid, r_cid AS cid FROM L ASOF JOIN R " +
        "ON L.ts >= R.ts AND L.k = R.k ORDER BY ts")
    val got = dialect.collect().map(x => (x.getLong(1), x.getString(3)))
    assert(got.toSeq == Seq((100L, "c1"), (200L, "c2")))
    val withLimit = GraftSql.query(spark, res,
      "SELECT k, ts, pid, jrank, r_cid AS cid FROM L ASOF JOIN R " +
        "ON L.ts >= R.ts AND L.k = R.k JLIMIT 2 ORDER BY ts, jrank")
    assert(withLimit.collect().map(_.getString(4)).toSeq ==
      Seq("c1", "c2", "c1"))
  }

  test("ASOF JOIN normalizes a right-side-first ts condition") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1")).toDF("k", "ts", "pid")
    val r = Seq((1L, 90L, "c1"), (1L, 150L, "c2")).toDF("k", "ts", "cid")
    def res(n: String) = n match { case "L" => l; case "R" => r }
    // R.ts <= L.ts is the same join as L.ts >= R.ts
    val flipped = GraftSql.query(spark, res,
      "SELECT k, ts, r_cid AS cid FROM L ASOF JOIN R " +
        "ON R.ts <= L.ts AND L.k = R.k")
    assert(flipped.head.getString(2) == "c1")
    // table aliases: the condition qualifier may be the alias, and the
    // direction must still resolve to the LEFT side (not flip)
    val aliased = GraftSql.query(spark, res,
      "SELECT k, ts, r_cid AS cid FROM L a ASOF JOIN R b " +
        "ON a.ts >= b.ts AND a.k = b.k")
    assert(aliased.head.getString(2) == "c1")
  }

  test("ASOF JOIN JLIMIT with a forward operator takes the earliest " +
      "matches") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1")).toDF("k", "ts", "pid")
    val r = Seq((1L, 90L, "c0"), (1L, 150L, "c1"), (1L, 210L, "c2"),
      (1L, 300L, "c3")).toDF("k", "ts", "cid")
    def res(n: String) = n match { case "L" => l; case "R" => r }
    val out = GraftSql.query(spark, res,
      "SELECT k, ts, jrank, r_cid AS cid FROM L ASOF JOIN R " +
        "ON L.ts <= R.ts AND L.k = R.k JLIMIT 2 ORDER BY jrank")
    assert(out.collect().map(x => (x.getLong(2), x.getString(3))).toSeq ==
      Seq((1L, "c1"), (2L, "c2")))
  }

  test("TRUE_FOR keeps only windows meeting the duration") {
    import spark.implicits._
    // key 1: state a spans 0..5s (too short), then b spans 10..130s
    val t = Seq((1L, 0L, "a"), (1L, 5000000L, "a"),
      (1L, 10000000L, "b"), (1L, 130000000L, "b")).toDF("k", "ts", "st")
    def res(n: String) = n match { case "T" => t }
    val out = GraftSql.query(spark, res,
      """SELECT k, first(st) AS state, count(*) AS n
         FROM T PARTITION BY k STATE_WINDOW(st) TRUE_FOR(90s)
         ORDER BY k, state""").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("b"))
    intercept[IllegalArgumentException] {
      GraftSql.query(spark, res,
        "SELECT k, count(*) AS n FROM T PARTITION BY k TRUE_FOR(90s)")
    }
  }

  test("PARTITION BY + diff/csum returns a row stream, not an aggregate") {
    import spark.implicits._
    val t = Seq((1L, 10L, 1.0), (1L, 20L, 4.0), (1L, 30L, 9.0),
      (2L, 10L, 5.0)).toDF("k", "ts", "v")
    def res(n: String) = n match { case "T" => t }
    val out = GraftSql.query(spark, res,
      """SELECT k, ts, diff(v) AS d, csum(v) AS c
         FROM T PARTITION BY k ORDER BY k, ts""")
      .collect().map(r => (r.getLong(0), Option(r.get(2)), r.getDouble(3)))
    assert(out.toSeq == Seq(
      (1L, None, 1.0), (1L, Some(3.0), 5.0), (1L, Some(5.0), 14.0),
      (2L, None, 5.0)))
    // keyless row-stream form: the whole frame is ONE ts-ordered
    // series, routed through GlobalScan.twoPass (never a
    // single-partition window) — diff crosses the k=1/k=2 boundary
    // because there is no key
    val t2 = Seq((1L, 10L, 1.0), (2L, 15L, 5.0), (1L, 20L, 4.0),
      (1L, 30L, 9.0)).toDF("k", "ts", "v")
    def res2(n: String) = n match { case "T" => t2 }
    val keyless = GraftSql.query(spark, res2,
      """SELECT ts, diff(v) AS d, csum(v) AS c FROM T ORDER BY ts""")
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2)))
    assert(keyless.toSeq == Seq(
      (10L, None, 1.0), (15L, Some(4.0), 6.0), (20L, Some(-1.0), 10.0),
      (30L, Some(5.0), 19.0)))
  }

  test("top-level UNION ALL / UNION with a union-level ORDER BY") {
    import spark.implicits._
    val a = Seq((2L, "y"), (1L, "x")).toDF("k", "v")
    def res(n: String) = n match { case "A" => a }
    val all = GraftSql.query(spark, res,
      "SELECT k, v FROM A UNION ALL SELECT k, v FROM A ORDER BY k")
    assert(all.collect().map(_.getLong(0)).toSeq == Seq(1L, 1L, 2L, 2L))
    val dedup = GraftSql.query(spark, res,
      "SELECT k, v FROM A UNION SELECT k, v FROM A ORDER BY k LIMIT 1")
    assert(dedup.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("plain equi JOIN surfaces right payload as r_ columns") {
    import spark.implicits._
    val l = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    val r = Seq((1L, "x"), (3L, "y")).toDF("k", "rv")
    def res(n: String) = n match { case "L" => l; case "R" => r }
    val inner = GraftSql.query(spark, res,
      "SELECT k, lv, r_rv AS rv FROM L JOIN R ON L.k = R.k ORDER BY k")
    assert(inner.collect().map(x => (x.getLong(0), x.getString(2))).toSeq ==
      Seq((1L, "x"), (3L, "y")))
    val left = GraftSql.query(spark, res,
      "SELECT k, lv, r_rv AS rv FROM L LEFT JOIN R ON L.k = R.k ORDER BY k")
    assert(left.collect().map(x =>
        (x.getLong(0), Option(x.getString(2)))).toSeq ==
      Seq((1L, Some("x")), (2L, None), (3L, Some("y"))))
  }

  test("WINDOW JOIN clause with WINDOW_OFFSET bounds") {
    import spark.implicits._
    val l = Seq((1L, 100L, "p1")).toDF("k", "ts", "pid")
    val r = Seq((1L, 40L, "early"), (1L, 90L, "in1"), (1L, 120L, "in2"),
      (1L, 200L, "late")).toDF("k", "ts", "cid")
    def res(n: String) = n match { case "L" => l; case "R" => r }
    val out = GraftSql.query(spark, res,
      "SELECT k, ts, pid, r_cid AS cid FROM L WINDOW JOIN R " +
        "WINDOW_OFFSET(-50u, 50u) ON L.k = R.k ORDER BY cid")
    assert(out.collect().map(_.getString(3)).toSeq == Seq("in1", "in2"))
  }

  test("INTERP with RANGE/EVERY/FILL matches the direct lowering") {
    val t0 = 1704067200000000L
    val t1 = t0 + 2L * 86400000000L
    val dialect = q(s"""SELECT user_id, _irowts, interp(value) AS v,
        _isfilled
      FROM events PARTITION BY user_id RANGE($t0, $t1) EVERY(12h)
      FILL(LINEAR) ORDER BY user_id, _irowts""")
    val direct = graft.ops.FillOps.interp(resolve("events"), col("ts"),
        "value", Seq("user_id"), 43200000000L, t0, t1,
        graft.ops.FillOps.FillLinear)
      .select(col("user_id"), col("_irowts"), col("value").as("v"),
        col("_isfilled"))
      .orderBy("user_id", "_irowts")
    sameResult(dialect, direct)
  }

  test("HAVING over an aggregate not in the select list") {
    val out = q("""SELECT user_id, count(*) AS n FROM events
      PARTITION BY user_id GROUP BY event_type
      HAVING sum(value) > 300 ORDER BY user_id, n""")
    val check = Tables(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"), Lowering.dsum(col("value")).as("s"))
      .filter(col("s") > 300)
    assert(out.count() == check.count() && out.count() > 0)
    assert(!out.columns.contains("__having"))
  }

  test("plain GROUP BY + HAVING + SLIMIT path") {
    // SLIMIT limits output SLICES (20-select.md:665): only the first 2
    // user_id partitions survive, each with all its groups
    val dialect = q("""SELECT user_id, event_type, count(*) AS n
      FROM events PARTITION BY user_id GROUP BY event_type
      HAVING n > 1 ORDER BY user_id, event_type SLIMIT 2""")
    val rows = dialect.collect()
    val users = rows.map(_.getLong(0)).distinct.sorted
    assert(users.length == 2 && users.sameElements(Array(0L, 1L)))
    assert(rows.forall(_.getLong(2) > 1))
  }

  test("SLIMIT o, n abbreviation and SOFFSET skip slices") {
    val a = q("""SELECT user_id, count(*) AS n FROM events
      PARTITION BY user_id GROUP BY event_type SLIMIT 3 SOFFSET 2""")
    val b = q("""SELECT user_id, count(*) AS n FROM events
      PARTITION BY user_id GROUP BY event_type SLIMIT 2, 3""")
    val ua = a.collect().map(_.getLong(0)).distinct.sorted
    assert(ua.sameElements(Array(2L, 3L, 4L)))
    assert(b.collect().map(_.getLong(0)).distinct.sorted.sameElements(ua))
  }

  test("FROM subquery recurses the dialect, aliased or not") {
    val sub = q("""SELECT user_id, count(*) AS n
      FROM (SELECT user_id, ts FROM events WHERE value > 50) t
      GROUP BY user_id ORDER BY user_id""")
    val flat = q("""SELECT user_id, count(*) AS n
      FROM events WHERE value > 50
      GROUP BY user_id ORDER BY user_id""")
    sameResult(sub, flat)
    // nesting two levels, no alias, and a window over the inner result
    val nested = q("""SELECT user_id, max(n) AS mx
      FROM (SELECT user_id, count(*) AS n
            FROM (SELECT user_id, ts FROM events) PARTITION BY user_id
            INTERVAL(1d))
      GROUP BY user_id ORDER BY user_id""")
    assert(nested.columns.toSeq == Seq("user_id", "mx"))
    assert(nested.count() > 0)
  }

  test("FROM subquery: join continuation works; unbalanced parens " +
      "fail loudly") {
    // `(SELECT …) a JOIN tbl b ON …` inlines the derived table
    val j = q("""SELECT n FROM (SELECT user_id, count(*) AS n
          FROM events GROUP BY user_id) a JOIN events b
        ON a.user_id = b.user_id ORDER BY n LIMIT 3""")
    assert(j.count() == 3)
    intercept[IllegalArgumentException] {
      q("SELECT user_id FROM (SELECT user_id FROM events").collect()
    }
  }

  test("FORECAST routes algo=linear and algo=arima; linear exposes " +
      "_flow/_fhigh") {
    val q = "SELECT user_id, _frowts, FORECAST(value, " +
      "'algo=%s,rows=2,start=1704067200000000,every=1d') AS fc, %s " +
      "FROM events PARTITION BY user_id ORDER BY user_id, _frowts"
    val lin = GraftSql.query(spark,
      name => Tables(spark, sf, name), q.format("linear", "_flow"))
    assert(lin.columns.toSeq == Seq("user_id", "_frowts", "fc", "_flow"))
    assert(lin.count() > 0)
    val ar = GraftSql.query(spark,
      name => Tables(spark, sf, name),
      q.format("arima", "user_id AS uid2"))
    assert(ar.columns.toSeq == Seq("user_id", "_frowts", "fc", "uid2"))
    assert(ar.count() > 0)
  }

  test("NOT IN with a NULL in the subquery yields no rows; BETWEEN " +
      "survives the AND split around an IN subquery") {
    import spark.implicits._
    val t = Seq((1L, Option(1L)), (2L, Option.empty[Long]),
      (3L, Option(3L))).toDF("id", "ref")
    val resolve: String => org.apache.spark.sql.DataFrame = _ => t
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE id NOT IN (SELECT ref FROM t)").count() == 0)
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE id NOT IN (SELECT ref FROM t " +
        "WHERE ref IS NOT NULL) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE id BETWEEN 1 AND 2 AND id IN " +
        "(SELECT id FROM t WHERE id < 2) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("NOT IN drops NULL-lhs rows against a non-empty subquery but " +
      "keeps every row against an empty one") {
    import spark.implicits._
    val t = Seq((Option(1L), 1L), (Option.empty[Long], 2L),
      (Option(5L), 3L)).toDF("ref", "id")
    val resolve: String => org.apache.spark.sql.DataFrame = _ => t
    // ref=NULL is UNKNOWN against {1}: only ref=5 survives
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE ref NOT IN (SELECT id FROM t " +
        "WHERE id = 1) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // empty subquery: NOT IN is TRUE for all rows, NULL lhs included
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE ref NOT IN (SELECT id FROM t " +
        "WHERE id > 99) ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
  }

  test("an IN-subquery under OR/NOT/comparison fails loudly instead " +
      "of silently semi-joining the swallowed disjunct") {
    import spark.implicits._
    val t = Seq((1L, 1L)).toDF("x", "y")
    val resolve: String => org.apache.spark.sql.DataFrame = _ => t
    val e = intercept[IllegalArgumentException](GraftSql.query(spark,
      resolve,
      "SELECT x FROM t WHERE x = 1 OR y IN (SELECT y FROM t)"))
    assert(e.getMessage.contains("unsupported"))
  }

  test("MATCH / NMATCH rewrite to RLIKE semantics in WHERE") {
    import spark.implicits._
    val t = Seq(("click", 1L), ("purchase", 2L), ("view", 3L))
      .toDF("et", "id")
    val resolve: String => org.apache.spark.sql.DataFrame = _ => t
    assert(GraftSql.query(spark, resolve,
      "SELECT id FROM t WHERE et MATCH '^(cl|pu)' AND " +
        "et NMATCH 'ick$' ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("TOP/BOTTOM/TAIL/UNIQUE select the kept rows, matching the " +
      "direct SeriesOps lowerings") {
    import graft.ops.SeriesOps
    val ev = resolve("events")
    val uKey = Seq(col("user_id"))

    val top = q("""SELECT ts, user_id, TOP(value, 3) AS v FROM events
      PARTITION BY user_id ORDER BY user_id, v DESC, ts""")
    val topD = SeriesOps.topK(ev, col("value"), col("ts"), uKey, 3)
      .select(col("ts"), col("user_id"), col("value").as("v"))
      .orderBy(col("user_id"), col("v").desc, col("ts"))
    sameResult(top, topD)

    val bot = q("""SELECT ts, user_id, BOTTOM(value, 3) AS v FROM events
      PARTITION BY user_id ORDER BY user_id, v, ts""")
    val botD = SeriesOps.topK(ev, col("value"), col("ts"), uKey, 3,
        bottom = true)
      .select(col("ts"), col("user_id"), col("value").as("v"))
      .orderBy(col("user_id"), col("v"), col("ts"))
    sameResult(bot, botD)

    val tl = q("""SELECT ts, user_id, TAIL(value, 5, 2) AS v FROM events
      PARTITION BY user_id ORDER BY user_id, ts""")
    val tlD = SeriesOps.tail(ev, col("ts"), uKey, 5, 2)
      .select(col("ts"), col("user_id"), col("value").as("v"))
      .orderBy(col("user_id"), col("ts"))
    sameResult(tl, tlD)

    val uq = q("""SELECT user_id, UNIQUE(event_type) AS et, ts FROM events
      PARTITION BY user_id ORDER BY user_id, et""")
    val uqD = SeriesOps.unique(ev, col("event_type"), col("ts"), uKey)
      .select(col("user_id"), col("event_type").as("et"), col("ts"))
      .orderBy(col("user_id"), col("et"))
    sameResult(uq, uqD)

    // windowed/grouped selects do NOT take this route — the aggregate
    // path still owns them
    val grouped = q("""SELECT user_id, count(*) AS n FROM events
      GROUP BY user_id ORDER BY user_id""")
    assert(grouped.columns.toSeq == Seq("user_id", "n"))
  }

  test("rand() passes through and draws uniform in [0, 1)") {
    val r = q("SELECT rand() AS r FROM customer WHERE c_custkey <= 50")
      .collect().map(_.getDouble(0))
    assert(r.length == 51)
    assert(r.forall(x => x >= 0.0 && x < 1.0))
    assert(r.distinct.length > 1, "rand() must vary per row")
  }

  test("datetime padding applies only in temporal contexts") {
    import graft.sql.GraftSql.padDatetimeLiterals
    // loose literal next to the ts column: padded
    assert(padDatetimeLiterals("SELECT * FROM t WHERE ts > '2024-1-5'")
      .contains("'2024-01-05'"))
    // loose literal on the LEFT of the ts comparison: padded too
    assert(padDatetimeLiterals("SELECT * FROM t WHERE '2024-1-5' < ts")
      .contains("'2024-01-05'"))
    // VARCHAR comparison with no temporal neighbour: untouched
    val vc = "SELECT * FROM t WHERE name = '2024-1-5'"
    assert(padDatetimeLiterals(vc) == vc)
    // INSERT value lists never rewrite string payloads
    val ins = "INSERT INTO t VALUES ('2024-1-5', 7)"
    assert(padDatetimeLiterals(ins) == ins)
    // already-canonical literals are untouched byte-for-byte anywhere
    val canon = "SELECT * FROM t WHERE name = '2024-01-05'"
    assert(padDatetimeLiterals(canon) == canon)
    // loose time fields pad in BETWEEN ranges
    assert(padDatetimeLiterals(
      "SELECT * FROM t WHERE ts BETWEEN '2024-1-1 8:1:40.5' AND '2024-2-1'")
      .contains("'2024-01-01 08:01:40.5'"))
  }

  test("calendar INTERVAL with a too-small SLIDING fails loudly") {
    // INTERVAL(2n) SLIDING(1h) would be ~1500 candidate windows/row —
    // the reference bounds SLIDING at >= 1% of INTERVAL; we must fail,
    // not OOM building per-row candidate arrays
    val e = intercept[IllegalArgumentException] {
      q("""SELECT _wstart, count(*) AS n FROM events
           INTERVAL(2n) SLIDING(1h) ORDER BY _wstart""").collect()
    }
    assert(e.getMessage.contains("SLIDING"))
    // the legal ratio still plans and runs
    assert(q("""SELECT _wstart, count(*) AS n FROM events
      INTERVAL(1n) SLIDING(15d) ORDER BY _wstart""").count() > 0)
  }

  test("calendar timetruncate floors pre-epoch timestamps (pmod)") {
    // 1969-11-15 00:00:00 UTC = -4,060,800 s; 1q buckets must floor to
    // 1969-10-01, not round toward zero onto 1970-01-01
    val nov69 = -4060800000000L
    val r = q(s"SELECT timetruncate(CAST($nov69 AS BIGINT), 1q) AS t")
      .head().getLong(0)
    val oct69 = java.time.Instant.parse("1969-10-01T00:00:00Z")
      .toEpochMilli * 1000L
    assert(r == oct69, s"got $r, want $oct69")
    // 1n: 1969-11-15 -> 1969-11-01
    val r2 = q(s"SELECT timetruncate(CAST($nov69 AS BIGINT), 1n) AS t")
      .head().getLong(0)
    val nov1 = java.time.Instant.parse("1969-11-01T00:00:00Z")
      .toEpochMilli * 1000L
    assert(r2 == nov1, s"got $r2, want $nov1")
  }

  test("textual rewrites never fire inside string literals") {
    // a 20+-digit run inside a quoted string must come through intact
    val lit20 = "12345678901234567890123"
    val got = q(s"SELECT '$lit20' AS s").head().getString(0)
    assert(got == lit20, s"literal corrupted: $got")
    // and a db.tbl-looking string survives the qualifier rewrite when
    // a db-qualified table IS in FROM (fixQuals active)
    val res: String => DataFrame =
      n => Tables(spark, sf, n.substring(n.indexOf('.') + 1))
    val got2 = GraftSql.query(spark, res,
      """SELECT 'testdb.orders.x' AS tag, testdb.orders.o_orderkey AS ok
         FROM testdb.orders JOIN testdb.customer
           ON testdb.orders.o_custkey = testdb.customer.c_custkey
           JOIN testdb.lineitem
           ON testdb.lineitem.l_orderkey = testdb.orders.o_orderkey
         WHERE testdb.orders.o_orderkey <= 100
         ORDER BY ok LIMIT 1""").head()
    assert(got2.getString(0) == "testdb.orders.x",
      s"string literal corrupted: ${got2.getString(0)}")
  }

  test("timezone arguments reject quote smuggling") {
    val e = intercept[Exception] {
      q("SELECT to_iso8601(ts, 'x'' || evil') AS s FROM events LIMIT 1")
        .collect()
    }
    assert(e.getMessage.contains("timezone") ||
      e.getMessage.contains("literal"))
  }

  test("correlated scalar subqueries: the corpus's alias forms run") {
    // the exact shapes the probe receipts carried (aliased outer,
    // non-equi correlation) — Spark decorrelates; count vs a manual
    // join cross-checks one of them
    val r = q(
      """SELECT c_custkey,
           (SELECT count(*) FROM orders
            WHERE orders.o_custkey < customer.c_custkey) AS n
         FROM customer WHERE c_custkey <= 10 ORDER BY c_custkey""")
      .collect()
    val cust = Tables(spark, sf, "customer")
      .filter(col("c_custkey") <= 10).select("c_custkey")
    val want = cust.join(Tables(spark, sf, "orders"),
        col("o_custkey") < col("c_custkey"), "left")
      .groupBy("c_custkey").agg(count(col("o_orderkey")).as("n"))
      .orderBy("c_custkey").collect()
    assert(r.map(_.toSeq).toSeq == want.map(_.toSeq).toSeq)
    // aliased outer (`from tb1 a … a.f1`)
    val r2 = q(
      """SELECT (SELECT max(o_orderkey) FROM orders
           WHERE o_custkey = a.c_custkey) AS m
         FROM customer a WHERE a.c_custkey <= 5
         ORDER BY a.c_custkey""").count()
    assert(r2 == 6)
  }

  test("SESSION over a NULL-able joined ts skips the null rows") {
    // the corpus shape: left asof join leaves NULL b.ts on unmatched
    // rows; a session window keyed on b.ts must skip them, not crash
    val r = q(
      """SELECT _wstart, count(*) AS n
         FROM (SELECT a.ts AS ts, b.ts AS bts, a.value AS av
               FROM events a LEFT ASOF JOIN events b
                 ON a.user_id = b.user_id AND a.ts > b.ts) j
         SESSION(bts, 10m) ORDER BY _wstart LIMIT 5""")
    assert(r.count() > 0)
  }

  test("cols() auto-names disambiguate colliding expressions") {
    val df = q(
      """SELECT cols(max(value), length(event_type)+1,
           length(event_type)-1) FROM events""")
    assert(df.columns.distinct.length == df.columns.length,
      s"duplicate output columns: ${df.columns.mkString(",")}")
    val r = df.head()
    assert(math.abs(r.getInt(0) - r.getInt(1)) == 2)
  }
}
