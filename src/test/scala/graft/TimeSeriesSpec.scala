package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FillOps, JoinOps, TimeOps}
import graft.ops.TimeOps.Dur

class TimeSeriesSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables(spark, sf, "events")

  test("interp positional fills carry the adjacent ROW, nulls included") {
    import spark.implicits._
    // doKeepRows (timesliceoperator.c:73-96) tracks the immediately
    // adjacent row and fills its value even when that value is NULL —
    // it never reaches back to an older non-null sample
    val df = Seq(
      (1L, 0L, Some(10.0)),
      (1L, 100L, None: Option[Double]), // null-valued sample at t=100
      (1L, 200L, Some(30.0))
    ).toDF("k", "t", "v")
    val prev = graft.ops.FillOps.interp(df, col("t"), "v", Seq("k"),
      stepUs = 50L, t0Us = 0L, t1Us = 200L, graft.ops.FillOps.FillPrev)
      .orderBy("_irowts")
      .select("_irowts", "v", "_isfilled").collect()
    // grid 0,50,100,150,200: t=50 fills 10.0 (prev row t=0);
    // t=150 fills NULL (prev ROW is the null-valued t=100 — NOT 10.0)
    assert(prev.map(_.getLong(0)).toSeq == Seq(0L, 50L, 100L, 150L, 200L))
    assert(prev(1).getDouble(1) == 10.0)
    // exact hit at the null-valued row: NULL value, _isfilled = false
    assert(prev(2).isNullAt(1) && !prev(2).getBoolean(2))
    assert(prev(3).isNullAt(1), s"t=150 must fill the adjacent NULL")
    assert(prev(4).getDouble(1) == 30.0)
    // no-reference grid points DROP (hasInterp=false): grid before the
    // first row under FILL(PREV) emits nothing
    val early = graft.ops.FillOps.interp(df.filter(col("t") > 0L),
      col("t"), "v", Seq("k"), 50L, 0L, 200L, graft.ops.FillOps.FillPrev)
    assert(early.agg(min(col("_irowts"))).head.getLong(0) == 100L)
    // LINEAR outside the data span drops too
    val lin = graft.ops.FillOps.interp(df, col("t"), "v", Seq("k"),
      50L, -100L, 300L, graft.ops.FillOps.FillLinear)
      .agg(min(col("_irowts")), max(col("_irowts"))).head
    assert(lin.getLong(0) == 0L && lin.getLong(1) == 200L)
  }

  test("hopping windows cover each row exactly ceil(interval/sliding) times") {
    val n = events.count()
    val assigned = TimeOps.assignIntervals(events, col("ts"),
      10 * Dur.m, 5 * Dur.m)
    // every row falls in exactly 2 hopping windows (10m / 5m)
    assert(assigned.count() == 2 * n)
    // and each assignment actually contains the row
    val bad = assigned.filter(col("ts") < col("_wstart") ||
      col("ts") >= col("_wend")).count()
    assert(bad == 0)
  }

  test("tumbling window starts are aligned and contain their rows") {
    val a = TimeOps.assignIntervals(events, col("ts"), Dur.h)
    assert(a.filter(pmod(col("_wstart"), lit(Dur.h)) =!= 0).count() == 0)
    assert(a.filter(col("ts") < col("_wstart") ||
      col("ts") >= col("_wstart") + Dur.h).count() == 0)
  }

  test("sessions split exactly at gaps > threshold") {
    val gap = 30 * Dur.m
    val sess = TimeOps.sessionize(events, col("ts"), gap, Seq(col("user_id")))
      .groupBy(col("user_id"), col("_session"))
      .agg(min("ts").as("start"), max("ts").as("end"), count(lit(1)).as("n"))
    // consecutive sessions of one user must be > gap apart
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("start")
    val viol = sess.withColumn("prev_end", lag("end", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("start") - col("prev_end") <= gap)
    assert(viol.count() == 0)
    // total rows preserved
    assert(sess.agg(sum("n")).head.getLong(0) == events.count())
  }

  test("event windows: every window starts >90 and only last row <10") {
    val wins = TimeOps.eventWindows(events, col("value") > 90,
      col("value") < 10, col("ts"), Seq("user_id"))
    val perWin = wins.groupBy("user_id", "_wstart")
      .agg(min("ts").as("minTs"),
        sum(when(col("value") < 10, 1).otherwise(0)).as("nEnd"),
        max(when(col("value") < 10, col("ts"))).as("endTs"),
        max("ts").as("maxTs"),
        first(col("value"), ignoreNulls = false).as("anyVal"))
    // window start ts equals the min ts of its rows
    assert(perWin.filter(col("minTs") =!= col("_wstart")).count() == 0)
    // at most one end row, and if present it is the last row
    assert(perWin.filter(col("nEnd") > 1).count() == 0)
    assert(perWin.filter(col("nEnd") === 1 &&
      col("endTs") =!= col("maxTs")).count() == 0)
    // the opening row satisfies the start condition
    val opener = wins.filter(col("ts") === col("_wstart"))
    assert(opener.filter(col("value") <= 90).count() == 0)
  }

  test("event windows with START/END streak limits: backdated open, " +
      "first-row close, limbo flush") {
    import spark.implicits._
    import graft.ops.TimeOps.TrueForLimit
    // per-ts flags: s = start cond, e = end cond
    // ts: 1  2  3  4  5  6  7  8  9 10 11 12
    // s : T  T  F  T  T  T  F  F  F  F  F  F
    // e : F  F  F  F  F  F  T  F  T  T  F  T
    val rows = Seq(
      (1L, true, false), (2L, true, false), (3L, false, false),
      (4L, true, false), (5L, true, false), (6L, true, false),
      (7L, false, true), (8L, false, false), (9L, false, true),
      (10L, false, true), (11L, false, false), (12L, false, true))
      .map { case (t, s, e) => (1, t, s, e) }
      .toDF("k", "t", "s", "e")
    // START(COUNT 3): the ts=1..2 streak breaks at 3 (rows dropped);
    // the 4-5-6 streak completes at 6 -> window opens BACKDATED to 4.
    // END(COUNT 2): end streak 7 breaks at 8 (7 flushes back in; 8 is
    // a window row); streak 9-10 completes at 10 -> window closes with
    // last row 9 (streak first row); 10 dropped; 11-12 after close
    // (no second window: no start rows remain).
    val got = TimeOps.eventWindowsLimits(rows, col("s"), col("e"),
        col("t"), Seq("k"),
        Some(TrueForLimit(0, 3, "cnt")), Some(TrueForLimit(0, 2, "cnt")))
      .select("t", "_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq ==
      Seq((4L, 4L), (5L, 4L), (6L, 4L), (7L, 4L), (8L, 4L), (9L, 4L)))

    // duration limits: START(3) on a µs-tick axis -> streak must SPAN
    // >= 3 ticks (1,2 insufficient even as a 2-streak with span 1)
    val got2 = TimeOps.eventWindowsLimits(rows, col("s"), col("e"),
        col("t"), Seq("k"),
        Some(TrueForLimit(3, 0, "dur")), None)
      .select("t", "_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    // 1-2 streak spans 1 tick then breaks; 4-5-6 spans 2 at 6... never
    // reaches 3 within the streak -> no window at all
    assert(got2.isEmpty)

    // overlap: a row completing the start streak that also satisfies
    // the end cond with a 1-count end limit closes a 1-streak window
    val rows3 = Seq((1L, true, false), (2L, true, true),
        (3L, false, false), (4L, false, true))
      .map { case (t, s, e) => (1, t, s, e) }.toDF("k", "t", "s", "e")
    val got3 = TimeOps.eventWindowsLimits(rows3, col("s"), col("e"),
        col("t"), Seq("k"),
        Some(TrueForLimit(0, 2, "cnt")), Some(TrueForLimit(0, 1, "cnt")))
      .select("t", "_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got3.toSeq == Seq((1L, 1L), (2L, 1L)))

    // no limits -> identical to the basic event window
    val basic = TimeOps.eventWindows(rows, col("s"), col("e"),
        col("t"), Seq("k"))
      .select("t", "_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val viaLimits = TimeOps.eventWindowsLimits(rows, col("s"), col("e"),
        col("t"), Seq("k"), None, None)
      .select("t", "_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(viaLimits.toSeq == basic.toSeq)
  }

  test("fill(PREV) produces a dense spine with no null after first value") {
    val agg = TimeOps.assignIntervals(events, col("ts"), Dur.d)
      .groupBy(col("user_id"), col("_wstart"))
      .agg(Lowering.dsum(col("value")).as("v"))
    val t0 = 1704067200000000L
    val t1 = 1706659200000000L - 1
    val filled = FillOps.fillInterval(agg, "_wstart", "v", Seq("user_id"),
      Dur.d, t0, t1, FillOps.FillPrev)
    val users = events.select("user_id").distinct().count()
    val slots = ((t1 - t0) / Dur.d + 1)
    assert(filled.count() == users * slots)
  }

  test("asof(>=) match is the newest right row at-or-before each left ts") {
    val l = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val j = JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", ">=",
      Seq("ts", "event_id"))
    // matched ts never exceeds left ts
    assert(j.filter(col("r_ts") > col("ts")).count() == 0)
    // row count preserved (left asof keeps unmatched lefts)
    assert(j.count() == l.count())
    // no click at-or-before => null match
    val firstClick = r.groupBy("user_id").agg(min("ts").as("fc"))
    val shouldBeNull = l.join(firstClick, Seq("user_id"), "left")
      .filter(col("fc").isNull || col("ts") < col("fc")).count()
    assert(j.filter(col("r_ts").isNull).count() == shouldBeNull)
  }

  test("interp grid is exact and exact-hits are not filled") {
    val out = FillOps.interp(events, col("ts"), "value", Seq("user_id"),
      12 * Dur.h, 1704067200000000L, 1706659200000000L, FillOps.FillLinear)
    assert(out.filter(pmod(col("_irowts"), lit(12 * Dur.h)) =!= 0)
      .count() == 0)
    // values bounded by raw data range per construction of linear interp
    val mm = events.agg(min("value"), max("value")).head
    val (lo, hi) = (mm.getDouble(0), mm.getDouble(1))
    assert(out.filter(col("value") < lo - 1e-9 ||
      col("value") > hi + 1e-9).count() == 0)
  }

  test("state window EXTEND modes route null-state rows") {
    import SparkTestSession.spark.implicits._
    // states: A A _ B B | leading/trailing nulls
    val df = Seq((1L, 0L, "_"), (1L, 1L, "A"), (1L, 2L, "A"),
      (1L, 3L, "_"), (1L, 4L, "B"), (1L, 5L, "B"), (1L, 6L, "_"))
      .toDF("k", "ts", "s")
    val st = when(col("s") === "_", lit(null).cast("string"))
      .otherwise(col("s"))
    def windows(extend: Int): Seq[(String, Long, Long, Long)] =
      graft.ops.TimeOps.stateWindowsExtend(df, st, col("ts"),
          Seq(col("k")), extend)
        .groupBy("_wid").agg(min("_st").as("s"), min("_t").as("ws"),
          max("_t").as("we"), count(lit(1)).as("n"))
        .orderBy("ws").collect()
        .map(r => (r.getString(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
    // EXTEND(0): nulls dropped entirely
    assert(windows(0) == Seq(("A", 1, 2, 2), ("B", 4, 5, 2)))
    // EXTEND(1): interior + trailing nulls join the PREVIOUS window
    assert(windows(1) == Seq(("A", 1, 3, 3), ("B", 4, 6, 3)))
    // EXTEND(2): leading + interior nulls join the NEXT window
    assert(windows(2) == Seq(("A", 0, 2, 3), ("B", 3, 5, 3)))
  }
}
