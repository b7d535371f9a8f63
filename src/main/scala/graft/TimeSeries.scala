package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.ops.{FillOps, JoinOps, TimeOps, TsmaOps}
import graft.ops.TimeOps.Dur

/** Time-series operator surface (SURVEY.md §2.5, §2.3) over the `events`
  * table: INTERVAL/SLIDING windows, SESSION/STATE/EVENT/COUNT windows,
  * FILL, INTERP, ASOF + WINDOW joins. `user_id` plays the role of
  * `tbname` (the per-device child-table key); `ts` is Long µs since epoch
  * (see Tables.events).
  */
object TimeSeries {
  import Lowering.usToMs

  // query-range literals for the events table (2024-01-01 .. 2024-01-31 UTC)
  private val T0: Long = 1704067200000000L
  private val T1: Long = 1706659200000000L

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- INTERVAL(1h): tumbling window w/ _wstart/_wend/_wduration ----
    "interval_tumbling" -> { (s, dir) =>
      TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.h)
        .groupBy(col("_wstart"), col("_wend"))
        .agg(count(lit(1)).as("n"), Lowering.dsum(col("value")).as("sum_value"))
        .select(usToMs(col("_wstart")).as("_wstart_ms"),
          usToMs(col("_wend")).as("_wend_ms"),
          lit(Dur.h / 1000L).as("_wduration_ms"),
          col("n"), col("sum_value"))
        .orderBy(col("_wstart_ms"))
    },
    // ---- INTERVAL(10m) SLIDING(5m): hopping window ----
    "interval_sliding" -> { (s, dir) =>
      TimeOps.assignIntervals(ev(s, dir), col("ts"), 10 * Dur.m, 5 * Dur.m)
        .groupBy(col("_wstart"))
        .agg(count(lit(1)).as("n"))
        .select(usToMs(col("_wstart")).as("_wstart_ms"), col("n"))
        .orderBy(col("_wstart_ms"))
    },
    // ---- INTERVAL(1d, 6h): tumbling with grid offset ----
    "interval_offset" -> { (s, dir) =>
      TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d, 0L, 6 * Dur.h)
        .groupBy(col("_wstart"))
        .agg(count(lit(1)).as("n"))
        .select(usToMs(col("_wstart")).as("_wstart_ms"), col("n"))
        .orderBy(col("_wstart_ms"))
    },
    // ---- COUNT_WINDOW(50, 25): sliding count windows ----
    "count_window_sliding" -> { (s, dir) =>
      TimeOps.slidingCountWindows(ev(s, dir), 50, 25, col("ts"),
          Seq(col("user_id")))
        .groupBy(col("user_id"), col("_wid"))
        .agg(count(lit(1)).as("n"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"))
        .select(col("user_id"), col("_wid"), col("n"), col("_wstart_ms"),
          col("_wend_ms"))
        .orderBy(col("user_id"), col("_wid"))
    },
    // ---- PARTITION BY key + INTERVAL(6h) ----
    "interval_partitioned" -> { (s, dir) =>
      TimeOps.assignIntervals(ev(s, dir), col("ts"), 6 * Dur.h)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(count(lit(1)).as("n"), Lowering.dsum(col("value")).as("sum_value"))
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- SESSION(ts, 30m) per user ----
    "session_window" -> { (s, dir) =>
      TimeOps.sessionize(ev(s, dir), col("ts"), 30 * Dur.m, Seq(col("user_id")))
        .groupBy(col("user_id"), col("_session"))
        .agg(usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("_wstart_ms"), col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- STATE_WINDOW(event_type) per user ----
    "state_window" -> { (s, dir) =>
      TimeOps.stateWindows(ev(s, dir), col("event_type"), col("ts"),
          Seq(col("user_id")))
        .groupBy(col("user_id"), col("_wid"))
        .agg(first(col("event_type")).as("state"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("state"), col("_wstart_ms"),
          col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- STATE_WINDOW + EXTEND(1): null states join the prev window ----
    "state_window_extend" -> { (s, dir) =>
      val st = when(col("value") < 15, lit(null).cast("string"))
        .otherwise(col("event_type"))
      TimeOps.stateWindowsExtend(ev(s, dir), st, col("ts"),
          Seq(col("user_id")), extend = 1)
        .groupBy(col("user_id"), col("_wid"))
        .agg(min(col("_st")).as("state"),
          usToMs(min(col("_t"))).as("_wstart_ms"),
          usToMs(max(col("_t"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("state"), col("_wstart_ms"),
          col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- COUNT_WINDOW(50) per user ----
    "count_window" -> { (s, dir) =>
      TimeOps.countWindows(ev(s, dir), 50, col("ts"), Seq(col("user_id")))
        .groupBy(col("user_id"), col("_wid"))
        .agg(count(lit(1)).as("n"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"))
        .select(col("user_id"), col("_wid"), col("n"), col("_wstart_ms"),
          col("_wend_ms"))
        .orderBy(col("user_id"), col("_wid"))
    },
    // ---- keyless SESSION(2m): one global ts-ordered stream, session
    // ids from the GlobalScan prefix composition (boundary-straddling
    // sessions merge across partitions) ----
    "session_window_keyless" -> { (s, dir) =>
      TimeOps.sessionize(ev(s, dir), col("ts"), 2 * Dur.m, Nil,
          tieBreak = Seq("event_id"))
        .groupBy(col("_session"))
        .agg(usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("_wstart_ms"), col("_wend_ms"), col("n"))
        .orderBy(col("_wstart_ms"))
    },
    // ---- keyless STATE_WINDOW: the whole table is one globally
    // ts-ordered state stream — run-ids via the GlobalScan prefix
    // composition, not a single-partition window ----
    "state_window_keyless" -> { (s, dir) =>
      TimeOps.stateWindows(ev(s, dir), col("event_type"), col("ts"), Nil,
          tieBreak = Seq("event_id"))
        .groupBy(col("_wid"))
        .agg(first(col("event_type")).as("state"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("state"), col("_wstart_ms"), col("_wend_ms"), col("n"))
        // ms-floored window starts can collide (two 1-row windows in
        // one ms at sf>=0.1) — the state column makes the order total
        .orderBy(col("_wstart_ms"), col("state"))
    },
    // ---- keyless COUNT_WINDOW(100): global row numbering via
    // GlobalScan, windows of 100 consecutive rows across ALL users ----
    "count_window_keyless" -> { (s, dir) =>
      TimeOps.countWindows(ev(s, dir), 100, col("ts"), Nil,
          tieBreak = Seq("event_id"))
        .groupBy(col("_wid"))
        .agg(count(lit(1)).as("n"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"))
        .select(col("_wid"), col("n"), col("_wstart_ms"), col("_wend_ms"))
        .orderBy(col("_wid"))
    },
    // ---- EVENT_WINDOW START WITH value>90 END WITH value<10, per user ----
    "event_window" -> { (s, dir) =>
      TimeOps.eventWindows(ev(s, dir), col("value") > 90, col("value") < 10,
          col("ts"), Seq("user_id"))
        .groupBy(col("user_id"), col("_wstart"))
        .agg(count(lit(1)).as("n"), usToMs(max(col("ts"))).as("_wend_ms"),
          Lowering.dsum(col("value")).as("sum_value"))
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("_wend_ms"), col("n"), col("sum_value"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- EVENT_WINDOW + TRUE_FOR(1h): only windows lasting >= 1h ----
    "event_window_truefor" -> { (s, dir) =>
      TimeOps.eventWindows(ev(s, dir), col("value") > 90, col("value") < 10,
          col("ts"), Seq("user_id"))
        .groupBy(col("user_id"), col("_wstart"))
        .agg(count(lit(1)).as("n"), usToMs(max(col("ts"))).as("_wend_ms"))
        .filter(col("_wend_ms") - usToMs(col("_wstart")) >= Dur.h / 1000L)
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(PREV) per user over RANGE(T0,T1) ----
    "fill_prev" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(Lowering.dsum(col("value")).as("v"))
      FillOps.fillInterval(agg, "_wstart", "v", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillPrev)
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("v"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(VALUE, 0) ----
    "fill_value" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(count(lit(1)).cast(LongType).as("n"))
      FillOps.fillInterval(agg, "_wstart", "n", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillValue(0))
        .withColumn("n", col("n").cast(LongType))
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("n"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(LINEAR) ----
    "fill_linear" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(Lowering.dsum(col("value")).as("v"))
      FillOps.fillInterval(agg, "_wstart", "v", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillLinear)
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          round(col("v"), 6).as("v"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(NULL): gaps stay null, marked filled ----
    "fill_null" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(count(lit(1)).cast(LongType).as("n"))
      FillOps.fillInterval(agg, "_wstart", "n", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillNull)
        .withColumn("n", col("n").cast(LongType))
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("n"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(NEXT) ----
    "fill_next" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(Lowering.dsum(col("value")).as("v"))
      FillOps.fillInterval(agg, "_wstart", "v", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillNext)
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("v"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERVAL(1d) + FILL(NEAR): nearer of prev/next, tie → prev ----
    "fill_near" -> { (s, dir) =>
      val agg = TimeOps.assignIntervals(ev(s, dir), col("ts"), Dur.d)
        .groupBy(col("user_id"), col("_wstart"))
        .agg(Lowering.dsum(col("value")).as("v"))
      FillOps.fillInterval(agg, "_wstart", "v", Seq("user_id"), Dur.d,
          T0, T1 - 1, FillOps.FillNear)
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("v"), col("_isfilled"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- INTERP EVERY(12h) RANGE(T0,T1) FILL(LINEAR) per user ----
    "interp_linear" -> { (s, dir) =>
      FillOps.interp(ev(s, dir), col("ts"), "value", Seq("user_id"),
          12 * Dur.h, T0, T1, FillOps.FillLinear)
        .select(col("user_id"), usToMs(col("_irowts")).as("_irowts_ms"),
          round(col("value"), 6).as("value"), col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // ---- INTERP EVERY(12h) RANGE(T0,T1) FILL(PREV) ----
    "interp_prev" -> { (s, dir) =>
      FillOps.interp(ev(s, dir), col("ts"), "value", Seq("user_id"),
          12 * Dur.h, T0, T1, FillOps.FillPrev)
        .select(col("user_id"), usToMs(col("_irowts")).as("_irowts_ms"),
          round(col("value"), 6).as("value"), col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // ---- STATE_WINDOW(event_type) ZEROTH_STATE('click'): baseline
    // windows filtered out (sql.y:2905-2944) ----
    "state_window_zeroth" -> { (s, dir) =>
      TimeOps.stateWindowsZeroth(ev(s, dir), col("event_type"), col("ts"),
          Seq(col("user_id")), "click")
        .groupBy(col("user_id"), col("_wid"))
        .agg(first(col("event_type")).as("state"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .select(col("user_id"), col("state"), col("_wstart_ms"),
          col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- COUNT_WINDOW(50, v2) col-args: all-null rows don't count
    // (sql.y:2984-2987) ----
    "count_window_cols" -> { (s, dir) =>
      val d = ev(s, dir).withColumn("v2",
        when(col("value") >= 5, col("value")))
      TimeOps.countWindowsCols(d, 50, col("ts"), Seq(col("user_id")),
          Seq(col("v2")))
        .groupBy(col("user_id"), col("_wid"))
        .agg(count(lit(1)).as("n"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"))
        .select(col("user_id"), col("_wid"), col("n"), col("_wstart_ms"),
          col("_wend_ms"))
        .orderBy(col("user_id"), col("_wid"))
    },
    // ---- FILL(VALUE_F, 0) over an EMPTY range: forced fill still emits
    // the whole spine (filloperator.c:220, querynodes.h:717-727) ----
    "fill_value_f" -> { (s, dir) =>
      val e0 = T0 - 10 * Dur.d
      val e1 = T0 - 5 * Dur.d // events start at T0 → zero input rows
      val agg = TimeOps.assignIntervals(
          ev(s, dir).filter(col("ts") >= e0 && col("ts") < e1),
          col("ts"), Dur.d)
        .groupBy(col("_wstart"))
        .agg(count(lit(1)).cast(LongType).as("n"))
      FillOps.fillInterval(agg, "_wstart", "n", Seq.empty, Dur.d,
          e0, e1 - 1, FillOps.FillValueF(0))
        .withColumn("n", col("n").cast(LongType))
        .select(usToMs(col("_wstart")).as("_wstart_ms"), col("n"),
          col("_isfilled"))
        .orderBy(col("_wstart_ms"))
    },
    // ---- INTERP FILL(PREV) with _irowts_origin: the fill-reference
    // row's own ts (timesliceoperator.c:457, builtins.c:6788) ----
    "interp_origin" -> { (s, dir) =>
      FillOps.interp(ev(s, dir), col("ts"), "value", Seq("user_id"),
          12 * Dur.h, T0, T1, FillOps.FillPrev)
        .select(col("user_id"), usToMs(col("_irowts")).as("_irowts_ms"),
          round(col("value"), 6).as("value"),
          usToMs(col("_irowts_origin")).as("_irowts_origin_ms"),
          col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // ---- INTERP FILL(NEAR) SURROUND(1h, -1): references farther than 1h
    // from the grid point are rejected → the surround value
    // (timesliceoperator.c:315-327) ----
    "interp_near_surround" -> { (s, dir) =>
      FillOps.interp(ev(s, dir), col("ts"), "value", Seq("user_id"),
          12 * Dur.h, T0, T1, FillOps.FillNear,
          surroundUs = Dur.h, surroundVal = Some(-1.0))
        .select(col("user_id"), usToMs(col("_irowts")).as("_irowts_ms"),
          round(col("value"), 6).as("value"), col("_isfilled"))
        .orderBy(col("user_id"), col("_irowts_ms"))
    },
    // ---- ASOF JOIN (>=): purchase matched to latest prior-or-equal click --
    "asof_join_ge" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", ">=",
          Seq("ts", "event_id", "value"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"),
          col("r_value").as("click_value"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- ASOF JOIN '=' + JLIMIT (sql.y asof op list; jlimit caps the
    // per-instant multi-matches, ranked by the tiebreak) — hour-floored
    // join timestamps manufacture many right rows per instant ----
    "asof_join_eq_jlimit" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          (col("ts") - col("ts") % (3600L * 1000000L)).as("hts"),
          col("event_id"))
      val r = e.select(col("user_id"),
        (col("ts") - col("ts") % (3600L * 1000000L)).as("hts"),
        col("event_id").as("rid"))
      JoinOps.asofJoinN(l, r, Seq("user_id"), "hts", "hts", "=", 3,
          Seq("rid"), rightTieBreak = Seq("rid"))
        .select(col("user_id"), col("hts"), col("event_id"),
          col("r_rid"), col("jrank"))
        .orderBy(col("user_id"), col("hts"), col("event_id"),
          col("jrank"))
    },
    // ---- ASOF JOIN (>): strictly-before match ----
    "asof_join_gt" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", ">",
          Seq("ts", "event_id"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- ASOF JOIN (<=): earliest at-or-after match ----
    "asof_join_le" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", "<=",
          Seq("ts", "event_id"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- ASOF JOIN (<): earliest strictly-after match ----
    "asof_join_lt" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", "<",
          Seq("ts", "event_id"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- ASOF JOIN (=): exact-ts match ----
    "asof_join_eq" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoin(l, r, Seq("user_id"), "ts", "ts", "=",
          Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- ASOF JOIN (>=) JLIMIT 3: three newest at-or-before matches ----
    "asof_join_jlimit" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoinN(l, r, Seq("user_id"), "ts", "ts", ">=", 3,
          Seq("ts", "event_id"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("jrank"), usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"), col("jrank"))
    },
    // ---- ASOF JOIN (<=) JLIMIT 3: three earliest at-or-after matches ----
    "asof_join_jlimit_fwd" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      JoinOps.asofJoinN(l, r, Seq("user_id"), "ts", "ts", "<=", 3,
          Seq("ts", "event_id"), rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("jrank"), usToMs(col("r_ts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"), col("jrank"))
    },
    // ---- WINDOW JOIN JLIMIT 3: first three clicks in [-30m,+30m] ----
    "window_join_jlimit" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      JoinOps.windowJoinLimited(l, r, Seq("user_id"), "ts", "ts",
          -30 * Dur.m, 30 * Dur.m, Seq("event_id", "value"), 3,
          leftRowKey = Seq("user_id", "ts", "event_id"),
          rightTieBreak = Seq("event_id"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("jrank"), usToMs(col("_rts")).as("click_ts_ms"),
          col("r_event_id").as("click_event_id"),
          col("r_value").as("click_value"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"), col("jrank"))
    },
    // ---- TSMA (sql.y:1505, rollupoperator.c): hourly partial-state
    // rollup merged into daily windows by the query router. The oracle
    // aggregates the BASE table, so a green row proves the rollup's
    // partial states AND the merge reproduce the exact answer ----
    "tsma_rollup_served" -> { (s, dir) =>
      val e = ev(s, dir)
      val rollup = TsmaOps.createRollup(e, col("ts"), Dur.h,
        Seq("user_id"), "value")
      TsmaOps.route(e, rollup, Dur.h, col("ts"), Dur.d,
          Seq("user_id"), "value")
        .select(col("user_id"), usToMs(col("_wstart")).as("_wstart_ms"),
          col("n"), col("sum_v"), col("min_v"), col("max_v"),
          round(col("avg_v"), 6).as("avg_v"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- EXTERNAL_WINDOW: aggregate over a supplied window rowset ----
    "external_window" -> { (s, dir) =>
      val wins = s.range(8).select(col("id").as("wid"),
        (lit(T0) + col("id") * lit(3 * Dur.d)).as("_wstart"),
        (lit(T0) + col("id") * lit(3 * Dur.d) + lit(2 * Dur.d)).as("_wend"))
      TimeOps.externalWindows(ev(s, dir), wins, col("ts"))
        .groupBy(col("wid"))
        .agg(usToMs(min(col("_wstart"))).as("_wstart_ms"),
          count(lit(1)).as("n"), Lowering.dsum(col("value")).as("sum_value"))
        .select(col("wid"), col("_wstart_ms"), col("n"), col("sum_value"))
        .orderBy(col("wid"))
    },
    // ---- STATE_WINDOW + TRUE_FOR(2h): only windows lasting >= 2h ----
    "state_window_truefor" -> { (s, dir) =>
      TimeOps.stateWindows(ev(s, dir), col("event_type"), col("ts"),
          Seq(col("user_id")))
        .groupBy(col("user_id"), col("_wid"))
        .agg(first(col("event_type")).as("state"),
          usToMs(min(col("ts"))).as("_wstart_ms"),
          usToMs(max(col("ts"))).as("_wend_ms"),
          count(lit(1)).as("n"))
        .filter(col("_wend_ms") - col("_wstart_ms") >= 2 * Dur.h / 1000L)
        .select(col("user_id"), col("state"), col("_wstart_ms"),
          col("_wend_ms"), col("n"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // ---- WINDOW JOIN: clicks within [-30m,+30m] of each purchase ----
    "window_join" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("value"))
      JoinOps.windowJoin(l, r, Seq("user_id"), "ts", "ts",
          -30 * Dur.m, 30 * Dur.m, Seq("value"))
        .groupBy(col("user_id"), col("ts"), col("event_id"))
        .agg(count(col("r_value")).as("n_clicks"),
          Lowering.dsum(coalesce(col("r_value"), lit(0))).as("sum_click_value"))
        .select(col("user_id"), usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("n_clicks"), col("sum_click_value"))
        .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
    },
    // ---- keyless WINDOW JOIN: clicks of ANY user within [-2m,+2m] of a
    // sampled purchase. No equi key — exercises the time-bucketed
    // lowering (an unbucketed range join would plan nested-loop) ----
    "window_join_keyless" -> { (s, dir) =>
      val e = ev(s, dir)
      val l = e.filter(col("event_type") === "purchase" &&
          col("event_id") % 19 === 0)
        .select(col("ts"), col("event_id"))
      val r = e.filter(col("event_type") === "click")
        .select(col("ts"), col("value"))
      JoinOps.windowJoin(l, r, Nil, "ts", "ts",
          -2 * Dur.m, 2 * Dur.m, Seq("value"))
        .groupBy(col("ts"), col("event_id"))
        .agg(count(col("r_value")).as("n_clicks"),
          Lowering.dsum(coalesce(col("r_value"), lit(0)))
            .as("sum_click_value"))
        .select(usToMs(col("ts")).as("ts_ms"), col("event_id"),
          col("n_clicks"), col("sum_click_value"))
        .orderBy(col("ts_ms"), col("event_id"))
    })

  // ---------------------------------------------------------------------
  // DuckDB oracles. DuckDB truncates the parquet ns timestamps to µs on
  // read — the same truncation Tables.events applies — so epoch_us(ts)
  // on the oracle side equals our Long-µs ts exactly.
  // ---------------------------------------------------------------------
  def oracleSql: Map[String, String] = Map(
    "interval_tumbling" ->
      s"""WITH b AS (SELECT epoch_us(ts) - epoch_us(ts) % ${Dur.h} AS ws, value
            FROM events)
          SELECT ws // 1000 AS _wstart_ms, (ws + ${Dur.h}) // 1000 AS _wend_ms,
            ${Dur.h / 1000} AS _wduration_ms, count(*) AS n,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
          FROM b GROUP BY ws ORDER BY _wstart_ms""",
    "interval_sliding" ->
      s"""WITH x AS (
            SELECT epoch_us(ts) - epoch_us(ts) % ${5 * Dur.m}
                     - k.k * ${5 * Dur.m} AS ws, ts
            FROM events CROSS JOIN (SELECT unnest(range(0, 2)) AS k) k),
          w AS (SELECT ws FROM x
                WHERE ws > epoch_us(ts) - ${10 * Dur.m} AND ws <= epoch_us(ts))
          SELECT ws // 1000 AS _wstart_ms, count(*) AS n
          FROM w GROUP BY ws ORDER BY _wstart_ms""",
    "interval_offset" ->
      s"""SELECT (epoch_us(ts) - (epoch_us(ts) - ${6 * Dur.h})
             % ${Dur.d}) // 1000 AS _wstart_ms, count(*) AS n
          FROM events GROUP BY 1 ORDER BY _wstart_ms""",
    "count_window_sliding" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events),
        e AS (SELECT user_id, t, unnest(range(
            CASE WHEN rn <= 50 THEN 0 ELSE (rn - 50 + 24) // 25 END,
            (rn - 1) // 25 + 1)) AS wid FROM t)
        SELECT user_id, wid AS _wid, count(*) AS n,
          min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms
        FROM e GROUP BY user_id, wid ORDER BY user_id, _wid""",
    "interval_partitioned" ->
      s"""WITH b AS (SELECT user_id,
            epoch_us(ts) - epoch_us(ts) % ${6 * Dur.h} AS ws, value
            FROM events)
          SELECT user_id, ws // 1000 AS _wstart_ms, count(*) AS n,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
          FROM b GROUP BY user_id, ws ORDER BY user_id, _wstart_ms""",
    "session_window" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts) > ${30 * Dur.m}
                 OR lag(epoch_us(ts)) OVER
                   (PARTITION BY user_id ORDER BY ts) IS NULL
                 THEN 1 ELSE 0 END AS is_new
            FROM events),
          s AS (SELECT user_id, t,
            sum(is_new) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS sess
            FROM t)
          SELECT user_id, min(t) // 1000 AS _wstart_ms,
            max(t) // 1000 AS _wend_ms, count(*) AS n
          FROM s GROUP BY user_id, sess ORDER BY user_id, _wstart_ms""",
    "state_window" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t, event_type,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT user_id, min(event_type) AS state,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY user_id, wid ORDER BY user_id, _wstart_ms""",
    "state_window_extend" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            CASE WHEN value < 15 THEN NULL ELSE event_type END AS st
          FROM events),
        m AS (SELECT user_id, t, st,
            CASE WHEN st IS NOT NULL AND (last_value(st IGNORE NULLS) OVER
                (PARTITION BY user_id ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                IS DISTINCT FROM st)
              THEN 1 ELSE 0 END AS chg
          FROM t),
        w AS (SELECT user_id, t, st,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
          FROM m)
        SELECT user_id, min(st) AS state, min(t) // 1000 AS _wstart_ms,
          max(t) // 1000 AS _wend_ms, count(*) AS n
        FROM w WHERE wid > 0 GROUP BY user_id, wid
        ORDER BY user_id, _wstart_ms""",
    "count_window" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            (row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1) // 50
              AS wid
            FROM events)
          SELECT user_id, wid AS _wid, count(*) AS n,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms
          FROM t GROUP BY user_id, wid ORDER BY user_id, wid""",
    "event_window" ->
      """WITH RECURSIVE numbered AS (
            SELECT user_id, epoch_us(ts) AS t, value,
              value > 90 AS s, value < 10 AS e,
              row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events),
          walk AS (
            SELECT user_id, t, rn, value,
              CASE WHEN s THEN t END AS wstart,
              (s AND NOT e) AS open_after
            FROM numbered WHERE rn = 1
            UNION ALL
            SELECT n.user_id, n.t, n.rn, n.value,
              CASE WHEN w.open_after THEN w.wstart
                   WHEN n.s THEN n.t END AS wstart,
              CASE WHEN w.open_after THEN NOT n.e
                   WHEN n.s THEN NOT n.e ELSE false END AS open_after
            FROM numbered n JOIN walk w
              ON n.user_id = w.user_id AND n.rn = w.rn + 1)
          SELECT user_id, wstart // 1000 AS _wstart_ms,
            max(t) // 1000 AS _wend_ms, count(*) AS n,
            CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
          FROM walk WHERE wstart IS NOT NULL
          GROUP BY user_id, wstart ORDER BY user_id, _wstart_ms""",
    "event_window_truefor" ->
      s"""WITH RECURSIVE numbered AS (
            SELECT user_id, epoch_us(ts) AS t,
              value > 90 AS s, value < 10 AS e,
              row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
            FROM events),
          walk AS (
            SELECT user_id, t, rn,
              CASE WHEN s THEN t END AS wstart,
              (s AND NOT e) AS open_after
            FROM numbered WHERE rn = 1
            UNION ALL
            SELECT n.user_id, n.t, n.rn,
              CASE WHEN w.open_after THEN w.wstart
                   WHEN n.s THEN n.t END AS wstart,
              CASE WHEN w.open_after THEN NOT n.e
                   WHEN n.s THEN NOT n.e ELSE false END AS open_after
            FROM numbered n JOIN walk w
              ON n.user_id = w.user_id AND n.rn = w.rn + 1)
          SELECT user_id, wstart // 1000 AS _wstart_ms,
            max(t) // 1000 AS _wend_ms, count(*) AS n
          FROM walk WHERE wstart IS NOT NULL
          GROUP BY user_id, wstart
          HAVING max(t) // 1000 - wstart // 1000 >= ${Dur.h / 1000}
          ORDER BY user_id, _wstart_ms""",
    "fill_prev" -> fillOracle(
      valueExpr = "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)",
      fillExpr = "last_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ws ROWS UNBOUNDED PRECEDING)",
      outCol = "v", castOut = ""),
    "fill_value" -> fillOracle(
      valueExpr = "count(*)",
      fillExpr = "coalesce(v, 0)", outCol = "n", castOut = "::BIGINT"),
    "fill_linear" -> fillOracle(
      valueExpr = "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)",
      fillExpr =
        """CASE WHEN v IS NOT NULL THEN v ELSE
             pv.v + (nv.v - pv.v) * CAST(ws - pv.t AS DOUBLE)
               / CAST(nv.t - pv.t AS DOUBLE) END""",
      outCol = "v", castOut = "", needPrevNext = true, roundOut = true),
    "interp_linear" ->
      s"""WITH data AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v, false AS g FROM events),
          grid AS (SELECT u.user_id, gs.t, NULL::DOUBLE AS v, true AS g
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range($T0, ${T1 + 1}, ${12 * Dur.h}))
              AS t) gs),
          unioned AS (SELECT * FROM data UNION ALL SELECT * FROM grid),
          marked AS (SELECT user_id, t, g,
            last_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
            first_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next
            FROM unioned)
          SELECT user_id, t // 1000 AS _irowts_ms,
            round(CASE WHEN prev IS NOT NULL AND prev.t = t THEN prev.v
              ELSE prev.v + (next.v - prev.v) * CAST(t - prev.t AS DOUBLE)
                / CAST(next.t - prev.t AS DOUBLE) END, 6) AS value,
            NOT (prev IS NOT NULL AND prev.t = t) AS _isfilled
          FROM marked
          WHERE g AND ((prev IS NOT NULL AND prev.t = t)
            OR (prev IS NOT NULL AND next IS NOT NULL))
          ORDER BY user_id, _irowts_ms""",
    "fill_null" -> fillOracle(
      valueExpr = "count(*)",
      fillExpr = "v", outCol = "n", castOut = "::BIGINT"),
    "fill_next" -> fillOracle(
      valueExpr = "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)",
      fillExpr = "first_value(v IGNORE NULLS) OVER " +
        "(PARTITION BY user_id ORDER BY ws " +
        "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)",
      outCol = "v", castOut = ""),
    "fill_near" -> fillOracle(
      valueExpr = "CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)",
      fillExpr =
        """CASE WHEN v IS NOT NULL THEN v
             WHEN nv IS NULL THEN pv.v
             WHEN pv IS NULL THEN nv.v
             WHEN ws - pv.t <= nv.t - ws THEN pv.v
             ELSE nv.v END""",
      outCol = "v", castOut = "", needPrevNext = true),
    "interp_prev" ->
      s"""WITH data AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v, false AS g FROM events),
          grid AS (SELECT u.user_id, gs.t, NULL::DOUBLE AS v, true AS g
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range($T0, ${T1 + 1}, ${12 * Dur.h}))
              AS t) gs),
          unioned AS (SELECT * FROM data UNION ALL SELECT * FROM grid),
          marked AS (SELECT user_id, t, g,
            last_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
            FROM unioned)
          SELECT user_id, t // 1000 AS _irowts_ms,
            round(prev.v, 6) AS value,
            NOT (prev IS NOT NULL AND prev.t = t) AS _isfilled
          FROM marked WHERE g AND prev IS NOT NULL
          ORDER BY user_id, _irowts_ms""",
    "state_window_zeroth" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t, event_type,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT user_id, min(event_type) AS state,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY user_id, wid
          HAVING min(event_type) IS DISTINCT FROM 'click'
          ORDER BY user_id, _wstart_ms""",
    "count_window_cols" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS t,
            (row_number() OVER (PARTITION BY user_id ORDER BY ts) - 1) // 50
              AS wid
            FROM events WHERE value >= 5)
          SELECT user_id, wid AS _wid, count(*) AS n,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms
          FROM t GROUP BY user_id, wid ORDER BY user_id, wid""",
    "fill_value_f" ->
      s"""WITH agg AS (
            SELECT epoch_us(ts) - epoch_us(ts) % ${Dur.d} AS ws,
              count(*) AS v
            FROM events
            WHERE epoch_us(ts) >= ${T0 - 10 * Dur.d}
              AND epoch_us(ts) < ${T0 - 5 * Dur.d}
            GROUP BY 1),
          spine AS (SELECT unnest(range(${T0 - 10 * Dur.d},
            ${T0 - 5 * Dur.d}, ${Dur.d})) AS ws)
          SELECT s.ws // 1000 AS _wstart_ms,
            coalesce(a.v, 0)::BIGINT AS n, a.v IS NULL AS _isfilled
          FROM spine s LEFT JOIN agg a ON s.ws = a.ws
          ORDER BY _wstart_ms""",
    "interp_origin" ->
      s"""WITH data AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v, false AS g FROM events),
          grid AS (SELECT u.user_id, gs.t, NULL::DOUBLE AS v, true AS g
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range($T0, ${T1 + 1}, ${12 * Dur.h}))
              AS t) gs),
          unioned AS (SELECT * FROM data UNION ALL SELECT * FROM grid),
          marked AS (SELECT user_id, t, g,
            last_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
            FROM unioned)
          SELECT user_id, t // 1000 AS _irowts_ms,
            round(prev.v, 6) AS value,
            prev.t // 1000 AS _irowts_origin_ms,
            NOT (prev IS NOT NULL AND prev.t = t) AS _isfilled
          FROM marked WHERE g AND prev IS NOT NULL
          ORDER BY user_id, _irowts_ms""",
    "interp_near_surround" ->
      s"""WITH data AS (SELECT user_id, epoch_us(ts) AS t,
            CAST(value AS DOUBLE) AS v, false AS g FROM events),
          grid AS (SELECT u.user_id, gs.t, NULL::DOUBLE AS v, true AS g
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(range($T0, ${T1 + 1}, ${12 * Dur.h}))
              AS t) gs),
          unioned AS (SELECT * FROM data UNION ALL SELECT * FROM grid),
          marked AS (SELECT user_id, t, g,
            last_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
            first_value(CASE WHEN NOT g AND v IS NOT NULL THEN struct_pack(t := t, v := v) END
              IGNORE NULLS) OVER
              (PARTITION BY user_id ORDER BY t, g
               ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next
            FROM unioned),
          sel AS (SELECT user_id, t, prev,
            CASE WHEN prev IS NOT NULL AND prev.t = t THEN prev
                 WHEN next IS NULL THEN prev
                 WHEN prev IS NULL THEN next
                 WHEN t - prev.t <= next.t - t THEN prev
                 ELSE next END AS ref
            FROM marked WHERE g)
          SELECT user_id, t // 1000 AS _irowts_ms,
            round(CASE WHEN ref IS NULL THEN NULL
              WHEN abs(t - ref.t) <= ${Dur.h} THEN ref.v
              ELSE -1.0 END, 6) AS value,
            NOT (prev IS NOT NULL AND prev.t = t) AS _isfilled
          FROM sel ORDER BY user_id, _irowts_ms""",
    "asof_join_ge" -> asofOracle("<=", extra = ", b.value AS click_value"),
    "asof_join_eq_jlimit" ->
      """WITH l AS (SELECT user_id,
            epoch_us(ts) - epoch_us(ts) % 3600000000 AS hts, event_id
          FROM events WHERE event_type = 'purchase'),
        r AS (SELECT user_id,
            epoch_us(ts) - epoch_us(ts) % 3600000000 AS hts,
            event_id AS rid,
            row_number() OVER (PARTITION BY user_id,
              epoch_us(ts) - epoch_us(ts) % 3600000000
              ORDER BY event_id) AS jrank
          FROM events)
        SELECT l.user_id, l.hts, l.event_id, r.rid AS r_rid, r.jrank
        FROM l LEFT JOIN r
          ON l.user_id = r.user_id AND l.hts = r.hts AND r.jrank <= 3
        ORDER BY l.user_id, l.hts, l.event_id, r.jrank""",
    "asof_join_gt" -> asofOracle("<", extra = ""),
    "asof_join_le" -> asofOracleForward(">="),
    "asof_join_lt" -> asofOracleForward(">"),
    "asof_join_eq" ->
      """SELECT l.user_id, epoch_us(l.ts) // 1000 AS ts_ms, l.event_id,
           b.event_id AS click_event_id
         FROM (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase') l
         LEFT JOIN (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'click') b
           ON b.user_id = l.user_id AND b.ts = l.ts
         ORDER BY l.user_id, ts_ms, l.event_id""",
    "asof_join_jlimit" ->
      """WITH l AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'purchase'),
           r AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'click'),
           j AS (SELECT a.user_id, a.ts, a.event_id,
               b.ts AS bts, b.event_id AS bid,
               row_number() OVER (PARTITION BY a.user_id, a.ts, a.event_id
                 ORDER BY b.ts DESC, b.event_id DESC) AS rk
             FROM l a LEFT JOIN r b
               ON b.user_id = a.user_id AND b.ts <= a.ts)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           CASE WHEN bts IS NULL THEN NULL ELSE rk END AS jrank,
           epoch_us(bts) // 1000 AS click_ts_ms, bid AS click_event_id
         FROM j WHERE rk <= 3 OR bts IS NULL
         ORDER BY user_id, ts_ms, event_id, jrank""",
    "asof_join_jlimit_fwd" ->
      """WITH l AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'purchase'),
           r AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'click'),
           j AS (SELECT a.user_id, a.ts, a.event_id,
               b.ts AS bts, b.event_id AS bid,
               row_number() OVER (PARTITION BY a.user_id, a.ts, a.event_id
                 ORDER BY b.ts, b.event_id) AS rk
             FROM l a LEFT JOIN r b
               ON b.user_id = a.user_id AND b.ts >= a.ts)
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           CASE WHEN bts IS NULL THEN NULL ELSE rk END AS jrank,
           epoch_us(bts) // 1000 AS click_ts_ms, bid AS click_event_id
         FROM j WHERE rk <= 3 OR bts IS NULL
         ORDER BY user_id, ts_ms, event_id, jrank""",
    "window_join_jlimit" ->
      s"""WITH l AS (SELECT user_id, ts, event_id FROM events
             WHERE event_type = 'purchase'),
           r AS (SELECT user_id, ts, event_id, value FROM events
             WHERE event_type = 'click'),
           j AS (SELECT a.user_id, a.ts, a.event_id,
               b.ts AS bts, b.event_id AS bid, b.value AS bval,
               row_number() OVER (PARTITION BY a.user_id, a.ts, a.event_id
                 ORDER BY b.ts, b.event_id) AS rk
             FROM l a LEFT JOIN r b
               ON b.user_id = a.user_id
               AND epoch_us(b.ts) >= epoch_us(a.ts) - ${30 * Dur.m}
               AND epoch_us(b.ts) <= epoch_us(a.ts) + ${30 * Dur.m})
         SELECT user_id, epoch_us(ts) // 1000 AS ts_ms, event_id,
           CASE WHEN bts IS NULL THEN NULL ELSE rk END AS jrank,
           epoch_us(bts) // 1000 AS click_ts_ms, bid AS click_event_id,
           bval AS click_value
         FROM j WHERE rk <= 3 OR bts IS NULL
         ORDER BY user_id, ts_ms, event_id, jrank""",
    "tsma_rollup_served" ->
      """SELECT user_id,
           (epoch_us(ts) - epoch_us(ts) % 86400000000) // 1000
             AS _wstart_ms,
           count(value) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
           min(value) AS min_v, max(value) AS max_v,
           round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
             / count(value), 6) AS avg_v
         FROM events GROUP BY user_id, _wstart_ms
         ORDER BY user_id, _wstart_ms""",
    "external_window" ->
      s"""WITH w AS (SELECT k AS wid, $T0 + k * ${3 * Dur.d} AS ws,
             $T0 + k * ${3 * Dur.d} + ${2 * Dur.d} AS we
           FROM (SELECT unnest(range(0, 8)) AS k))
         SELECT w.wid, w.ws // 1000 AS _wstart_ms, count(*) AS n,
           CAST(CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         FROM w JOIN events e
           ON epoch_us(e.ts) >= w.ws AND epoch_us(e.ts) < w.we
         GROUP BY w.wid, w.ws ORDER BY w.wid""",
    "session_window_keyless" ->
      s"""WITH t AS (SELECT epoch_us(ts) AS t, event_id,
            CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                 OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                   > ${2 * Dur.m}
                 THEN 1 ELSE 0 END AS isnew
            FROM events WINDOW w AS (ORDER BY ts, event_id)),
          s AS (SELECT t,
            sum(isnew) OVER (ORDER BY t, event_id
              ROWS UNBOUNDED PRECEDING) AS sid
            FROM t)
          SELECT min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY sid ORDER BY _wstart_ms""",
    "state_window_keyless" ->
      """WITH t AS (SELECT epoch_us(ts) AS t, event_id, event_type,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (ORDER BY ts, event_id)),
          s AS (SELECT t, event_type,
            sum(chg) OVER (ORDER BY t, event_id
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT min(event_type) AS state,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY wid
          ORDER BY _wstart_ms, state""",
    "count_window_keyless" ->
      """WITH t AS (SELECT epoch_us(ts) AS t,
            (row_number() OVER (ORDER BY ts, event_id) - 1) // 100 AS wid
            FROM events)
          SELECT wid AS _wid, count(*) AS n,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms
          FROM t GROUP BY wid ORDER BY _wid""",
    "state_window_truefor" ->
      s"""WITH t AS (SELECT user_id, epoch_us(ts) AS t, event_type,
            CASE WHEN lag(event_type) OVER w IS NULL
                 OR lag(event_type) OVER w <> event_type
                 THEN 1 ELSE 0 END AS chg
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
          s AS (SELECT user_id, t, event_type,
            sum(chg) OVER (PARTITION BY user_id ORDER BY t
              ROWS UNBOUNDED PRECEDING) AS wid
            FROM t)
          SELECT user_id, min(event_type) AS state,
            min(t) // 1000 AS _wstart_ms, max(t) // 1000 AS _wend_ms,
            count(*) AS n
          FROM s GROUP BY user_id, wid
          HAVING max(t) // 1000 - min(t) // 1000 >= ${2 * Dur.h / 1000}
          ORDER BY user_id, _wstart_ms""",
    "window_join" ->
      s"""SELECT a.user_id, epoch_us(a.ts) // 1000 AS ts_ms, a.event_id,
            count(b.value) AS n_clicks,
            CAST(CAST(sum(CAST(coalesce(b.value, 0) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
              AS sum_click_value
          FROM (SELECT * FROM events WHERE event_type = 'purchase') a
          LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
            ON a.user_id = b.user_id
            AND epoch_us(b.ts) >= epoch_us(a.ts) - ${30 * Dur.m}
            AND epoch_us(b.ts) <= epoch_us(a.ts) + ${30 * Dur.m}
          GROUP BY a.user_id, epoch_us(a.ts), a.event_id
          ORDER BY a.user_id, ts_ms, a.event_id""",
    "window_join_keyless" ->
      s"""SELECT epoch_us(a.ts) // 1000 AS ts_ms, a.event_id,
            count(b.value) AS n_clicks,
            CAST(CAST(sum(CAST(coalesce(b.value, 0) AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
              AS sum_click_value
          FROM (SELECT * FROM events
                WHERE event_type = 'purchase' AND event_id % 19 = 0) a
          LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') b
            ON epoch_us(b.ts) >= epoch_us(a.ts) - ${2 * Dur.m}
            AND epoch_us(b.ts) <= epoch_us(a.ts) + ${2 * Dur.m}
          GROUP BY epoch_us(a.ts), a.event_id
          ORDER BY ts_ms, a.event_id""")

  /** Shared FILL oracle skeleton: daily buckets per user over [T0,T1),
    * left-joined to the dense spine, filled per `fillExpr`. */
  private def fillOracle(valueExpr: String, fillExpr: String, outCol: String,
      castOut: String, needPrevNext: Boolean = false,
      roundOut: Boolean = false): String = {
    val prevNext = if (needPrevNext)
      """,
         last_value(CASE WHEN v IS NOT NULL
             THEN struct_pack(t := s.ws, v := v) END IGNORE NULLS) OVER
           (PARTITION BY s.user_id ORDER BY s.ws
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
         first_value(CASE WHEN v IS NOT NULL
             THEN struct_pack(t := s.ws, v := v) END IGNORE NULLS) OVER
           (PARTITION BY s.user_id ORDER BY s.ws
            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv"""
    else ""
    val out = if (roundOut) s"round(($fillExpr)$castOut, 6)"
              else s"($fillExpr)$castOut"
    s"""WITH agg AS (
          SELECT user_id, epoch_us(ts) - epoch_us(ts) % ${Dur.d} AS ws,
            $valueExpr AS v
          FROM events GROUP BY user_id, 2),
        spine AS (
          SELECT u.user_id, gs.ws
          FROM (SELECT DISTINCT user_id FROM events) u
          CROSS JOIN (SELECT unnest(range($T0, $T1, ${Dur.d})) AS ws) gs),
        joined AS (
          SELECT s.user_id, s.ws, a.v, a.v IS NULL AS _isfilled $prevNext
          FROM spine s LEFT JOIN agg a
            ON s.user_id = a.user_id AND s.ws = a.ws)
        SELECT user_id, ws // 1000 AS _wstart_ms, $out AS $outCol, _isfilled
        FROM joined ORDER BY user_id, _wstart_ms"""
  }

  /** Backward asof oracle via correlated subqueries (exact, any op). */
  private def asofOracle(cmp: String, extra: String): String = {
    s"""WITH l AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
         m AS (SELECT a.user_id, a.ts, a.event_id,
             (SELECT max(b.ts) FROM r b
              WHERE b.user_id = a.user_id AND b.ts $cmp a.ts) AS mts
           FROM l a)
         SELECT m.user_id, epoch_us(m.ts) // 1000 AS ts_ms, m.event_id,
           epoch_us(b.ts) // 1000 AS click_ts_ms,
           b.event_id AS click_event_id $extra
         FROM m LEFT JOIN r b
           ON b.user_id = m.user_id AND b.ts = m.mts
         ORDER BY m.user_id, ts_ms, m.event_id"""
  }

  /** Forward asof oracle: earliest right row with b.ts `cmp` a.ts
    * (">=" for op "<=", ">" for op "<"). */
  private def asofOracleForward(cmp: String): String =
    s"""WITH l AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'click'),
         m AS (SELECT a.user_id, a.ts, a.event_id,
             (SELECT min(b.ts) FROM r b
              WHERE b.user_id = a.user_id AND b.ts $cmp a.ts) AS mts
           FROM l a)
         SELECT m.user_id, epoch_us(m.ts) // 1000 AS ts_ms, m.event_id,
           epoch_us(b.ts) // 1000 AS click_ts_ms,
           b.event_id AS click_event_id
         FROM m LEFT JOIN r b
           ON b.user_id = m.user_id AND b.ts = m.mts
         ORDER BY m.user_id, ts_ms, m.event_id"""
}
