package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-window lowerings (SURVEY.md §2.5) — the reference's signature
  * INTERVAL/SLIDING, SESSION, STATE_WINDOW, EVENT_WINDOW, COUNT_WINDOW
  * clauses, re-expressed as DataFrame transformers.
  *
  * Timestamps are Long microseconds since epoch throughout ("µs domain"),
  * mirroring the reference's per-DB precision model (sql.y:923) and keeping
  * all window arithmetic in exact integer math (`pmod`, never fp division)
  * so plans stay inside whole-stage codegen and results are bit-stable at
  * any partition count.
  *
  * Scale notes: window *assignment* is per-row and shuffle-free; the only
  * shuffles are the groupBy the caller runs afterwards (hash on
  * (keys, _wstart) — partial agg map-side) and, for the rank-based windows
  * (session/state/count/event), one sort-shuffle on the partition keys.
  * Nothing here collects to the driver or buffers unbounded state.
  */
object TimeOps {

  /** Micro-DSL for durations in the µs domain. */
  object Dur {
    val us: Long = 1L
    val ms: Long = 1000L
    val s: Long = 1000L * ms
    val m: Long = 60L * s
    val h: Long = 60L * m
    val d: Long = 24L * h
  }

  // ---------------------------------------------------------------------
  // INTERVAL(interval [, offset]) SLIDING(sliding)  (timewindowoperator.c)
  // ---------------------------------------------------------------------

  /** Exact floor division for non-negative Longs via pmod — a double
    * `/` + cast would truncate incorrectly at bucket boundaries. The
    * one shared implementation (used by window ids, timediff, forecast
    * bucketing). */
  def floorDiv(c: Column, d: Long): Column =
    ((c - pmod(c, lit(d))) / lit(d)).cast(LongType)

  /** Tumbling-window start: largest `offset`-aligned multiple of
    * `intervalUs` that is <= ts. Pure integer math. */
  def tumblingStart(tsUs: Column, intervalUs: Long, offsetUs: Long = 0L): Column =
    (tsUs - pmod(tsUs - lit(offsetUs), lit(intervalUs))).cast(LongType)

  /** Adds `_wstart`/`_wend` (µs) for a tumbling or hopping window.
    * Hopping (slidingUs < intervalUs) explodes each row into the
    * ceil(interval/sliding) windows that contain it — constant fan-out,
    * no shuffle; the caller's groupBy supplies the single exchange.
    */
  def assignIntervals(df: DataFrame, tsUs: Column, intervalUs: Long,
      slidingUs: Long = 0L, offsetUs: Long = 0L): DataFrame = {
    val slide = if (slidingUs <= 0L) intervalUs else slidingUs
    require(slide <= intervalUs, "SLIDING must be <= INTERVAL")
    val out =
      if (slide == intervalUs)
        df.withColumn("_wstart", tumblingStart(tsUs, intervalUs, offsetUs))
      else {
        val last = tumblingStart(tsUs, slide, offsetUs)
        val fanout = ((intervalUs + slide - 1) / slide).toInt
        df.withColumn("_wstart",
            explode(sequence(last - lit((fanout - 1).toLong * slide), last,
              lit(slide))))
          .filter(col("_wstart") > tsUs - lit(intervalUs))
          .filter(col("_wstart") <= tsUs)
      }
    out.withColumn("_wend", col("_wstart") + lit(intervalUs))
  }

  // ---------------------------------------------------------------------
  // SESSION(ts, gap)  (timewindowoperator.c:3018)
  // ---------------------------------------------------------------------

  /** Adds `_session`: rows closer than `gapUs` to their predecessor (per
    * key) share a session id. One sort-shuffle on `keys`. With no
    * `keys`, the session-id prefix sum distributes via
    * [[GlobalScan.twoPass]] — the effect is one (firstTs, lastTs,
    * sessionCount) record per partition, and the prefix composition
    * merges sessions straddling a partition boundary when the gap
    * across it is within `gapUs`. `tieBreak` columns order keyless rows
    * at equal ts — session membership is gap-driven so ids don't move,
    * but the scan order (and any per-row downstream) becomes a total
    * order even when timestamps collide across the whole table. */
  def sessionize(df0: DataFrame, tsUs: Column, gapUs: Long,
      keys: Seq[Column], tieBreak: Seq[String] = Nil): DataFrame = {
    // a NULL window key belongs to no window (timewindowoperator skips
    // null-ts rows) — reachable when the session key is the NULL-able
    // side of an outer join (`left asof join b … session(b.ts, 1s)`)
    val df = df0.filter(tsUs.isNotNull)
    if (keys.isEmpty) return keylessSessionize(df, tsUs, gapUs, tieBreak)
    val w = Window.partitionBy(keys: _*).orderBy(tsUs)
    val isNew = when(tsUs - lag(tsUs, 1).over(w) > lit(gapUs) ||
      lag(tsUs, 1).over(w).isNull, 1L).otherwise(0L)
    df.withColumn("_session",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Partition effect of a keyless session scan. */
  private case class SessEff(nonEmpty: Boolean, firstTs: Long,
      lastTs: Long, sessions: Long)

  private def keylessSessionize(df: DataFrame, tsUs: Column,
      gapUs: Long, tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val d = df.withColumn("_t", tsUs.cast(LongType))
    val schema = d.schema
    val tIdx = schema.fieldIndex("_t")
    val outSchema = StructType(schema.fields :+
      StructField("_session", LongType))
    GlobalScan.twoPass[SessEff](d, col("_t") +: tieBreak.map(col),
      zero = SessEff(nonEmpty = false, 0L, 0L, 0L),
      summary = { it =>
        var any = false; var first = 0L; var last = 0L; var s = 0L
        it.foreach { r =>
          val t = r.getLong(tIdx)
          if (!any || t - last > gapUs) s += 1
          if (!any) first = t
          any = true; last = t
        }
        SessEff(any, first, last, s)
      },
      combine = { (a, b) =>
        if (!b.nonEmpty) a
        else if (!a.nonEmpty) b
        else {
          // b counted its first row as a session start; undo it when
          // the boundary gap keeps the session open across partitions
          val open = b.firstTs - a.lastTs <= gapUs
          SessEff(nonEmpty = true, a.firstTs, b.lastTs,
            a.sessions + b.sessions - (if (open) 1 else 0))
        }
      },
      emit = { (in, it) =>
        var any = in.nonEmpty
        var last = in.lastTs
        var sid = in.sessions
        it.map { r =>
          val t = r.getLong(tIdx)
          if (!any || t - last > gapUs) sid += 1
          any = true; last = t
          Row.fromSeq(r.toSeq :+ sid)
        }
      },
      outSchema)
      .drop("_t")
  }

  // ---------------------------------------------------------------------
  // STATE_WINDOW(expr)  (timewindowoperator.c:2838)
  // ---------------------------------------------------------------------

  /** Adds `_wid`: consecutive runs (per key, ts order) of equal `state`
    * share a window id. With no `keys` the run-id prefix sum
    * distributes via [[GlobalScan.twoPass]] (an unpartitioned window
    * would collapse the input to one partition); the effect is one
    * (firstState, lastState, runCount) record per partition. `tieBreak`
    * columns make the keyless scan a total order at equal ts (state
    * transitions at a µs collision would otherwise be
    * partition-order nondeterministic). */
  def stateWindows(df: DataFrame, state: Column, tsUs: Column,
      keys: Seq[Column], tieBreak: Seq[String] = Nil): DataFrame = {
    if (keys.isEmpty) return keylessStateWindows(df, state, tsUs, tieBreak)
    val w = Window.partitionBy(keys: _*).orderBy(tsUs)
    val changed = when(lag(state, 1).over(w).isNull ||
      lag(state, 1).over(w) =!= state, 1L).otherwise(0L)
    df.withColumn("_wid",
      sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Partition effect of a keyless state scan: the first/last state
    * value (which may be a NULL state) and the run count inside. */
  private case class StateEff(nonEmpty: Boolean, first: Any, last: Any,
      runs: Long)

  /** Row transition rule, mirroring the keyed `lag` form exactly:
    * changed = no-previous-row OR previous state NULL OR (both non-null
    * and different). A NULL current state after a non-null one does NOT
    * open a new window (`lag =!= state` is null there → 0). */
  private def stateChanged(hasPrev: Boolean, prev: Any, cur: Any): Boolean =
    !hasPrev || prev == null || (cur != null && cur != prev)

  private def keylessStateWindows(df: DataFrame, state: Column,
      tsUs: Column, tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val d = df.withColumn("_t", tsUs.cast(LongType))
      .withColumn("_st", state)
    val schema = d.schema
    val stIdx = schema.fieldIndex("_st")
    val outSchema = StructType(schema.fields :+
      StructField("_wid", LongType))
    GlobalScan.twoPass[StateEff](d, col("_t") +: tieBreak.map(col),
      zero = StateEff(nonEmpty = false, null, null, 0L),
      summary = { it =>
        var first: Any = null; var last: Any = null
        var any = false; var runs = 0L
        it.foreach { r =>
          val st = r.get(stIdx)
          if (stateChanged(any, last, st)) runs += 1
          if (!any) first = st
          any = true; last = st
        }
        StateEff(any, first, last, runs)
      },
      combine = { (a, b) =>
        if (!b.nonEmpty) a
        else if (!a.nonEmpty) b
        else {
          // b's summary counted its first row as a run start; undo it
          // when the cross-partition transition was not a real change
          val boundary = stateChanged(hasPrev = true, a.last, b.first)
          StateEff(nonEmpty = true, a.first, b.last,
            a.runs + b.runs - (if (boundary) 0 else 1))
        }
      },
      emit = { (in, it) =>
        var hasPrev = in.nonEmpty
        var prev: Any = in.last
        var wid = in.runs
        it.map { r =>
          val st = r.get(stIdx)
          if (stateChanged(hasPrev, prev, st)) wid += 1
          hasPrev = true; prev = st
          Row.fromSeq(r.toSeq :+ wid)
        }
      },
      outSchema)
      .drop("_t", "_st")
  }

  // ---------------------------------------------------------------------
  // COUNT_WINDOW(n [, sliding])  (countwindowoperator.c)
  // ---------------------------------------------------------------------

  /** Adds `_wid`: every `n` consecutive rows (per key, ts order) form a
    * window. Keyless input numbers rows via [[GlobalScan.rowNumber]]
    * instead of an unpartitioned (single-partition) window; `tieBreak`
    * columns make that numbering a total order at equal ts. */
  def countWindows(df: DataFrame, n: Int, tsUs: Column,
      keys: Seq[Column], tieBreak: Seq[String] = Nil): DataFrame = {
    if (keys.isEmpty)
      return GlobalScan.rowNumber(df,
          tsUs.cast(LongType) +: tieBreak.map(col), "_grn")
        .withColumn("_wid", floorDiv(col("_grn") - 1, n)).drop("_grn")
    val w = Window.partitionBy(keys: _*).orderBy(tsUs)
    val rn = row_number().over(w) - lit(1)
    df.withColumn("_wid", floorDiv(rn, n))
  }

  /** STATE_WINDOW with EXTEND (sql.y:2938, timewindowoperator.c:1190):
    * controls which window a null-state row joins — EXTEND(0) drops
    * them, EXTEND(1) merges them into the previous window (backward),
    * EXTEND(2) into the next (forward). Non-null rows window by
    * effective-state change exactly as [[stateWindows]]; rows before
    * the first (resp. after the last) window drop. Adds `_wid` plus
    * the working columns `_t` (Long µs ts) and `_st` (the evaluated
    * state), which callers aggregate over. */
  def stateWindowsExtend(df: DataFrame, state: Column, tsUs: Column,
      keys: Seq[Column], extend: Int): DataFrame = {
    require(extend >= 0 && extend <= 2, s"EXTEND($extend)")
    if (keys.isEmpty)
      return keylessStateWindowsExtend(df, state, tsUs, extend)
    val wOrd = Window.partitionBy(keys: _*).orderBy(col("_t"))
    val prevEff = last(col("_st"), ignoreNulls = true)
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val chg = col("_st").isNotNull &&
      (prevEff.isNull || prevEff =!= col("_st"))
    val d = df.withColumn("_t", tsUs.cast(LongType))
      .withColumn("_st", state)
      .withColumn("_chg", when(chg, 1).otherwise(0))
    val withWid = d.withColumn("_wid",
      sum(col("_chg")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0))
        .cast(LongType))
    val out = extend match {
      case 0 => withWid.filter(col("_st").isNotNull)
      case 1 => withWid.filter(col("_wid") > 0)
      case 2 => withWid
        .withColumn("_wid", when(col("_st").isNotNull, col("_wid"))
          .otherwise(first(when(col("_st").isNotNull, col("_wid")),
            ignoreNulls = true)
            .over(wOrd.rowsBetween(1, Window.unboundedFollowing))))
        .filter(col("_wid").isNotNull)
    }
    out.drop("_chg")
  }

  /** Partition effect of the keyless EXTEND scan: the first/last
    * NON-NULL states (nulls never update the effective-state carry)
    * and the window-open count inside. */
  private case class ExtEff(first: Option[Any], last: Option[Any],
      chgs: Long)

  /** Keyless EXTEND, distributed like [[keylessStateWindows]]: an
    * ascending GlobalScan assigns `_wid` from the effective-state
    * carry (null states skip, matching the keyed ignore-nulls `last`),
    * and EXTEND(2) adds a descending pass carrying the NEXT window id
    * onto null-state rows. */
  private def keylessStateWindowsExtend(df: DataFrame, state: Column,
      tsUs: Column, extend: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    val d = df.withColumn("_t", tsUs.cast(LongType))
      .withColumn("_st", state)
    val schema = d.schema
    val stIdx = schema.fieldIndex("_st")
    val widSchema = StructType(schema.fields :+
      StructField("_wid", LongType))
    val withWid = GlobalScan.twoPass[ExtEff](d, Seq(col("_t")),
      zero = ExtEff(None, None, 0L),
      summary = { it =>
        var first: Option[Any] = None; var last: Option[Any] = None
        var c = 0L
        it.foreach { r =>
          val st = r.get(stIdx)
          if (st != null) {
            if (last.isEmpty || last.get != st) c += 1
            if (first.isEmpty) first = Some(st)
            last = Some(st)
          }
        }
        ExtEff(first, last, c)
      },
      combine = { (a, b) =>
        // b's first non-null row opened a window in b's local count;
        // undo it when a's carried effective state already matched
        val adj = if (a.last.isDefined && b.first.isDefined &&
          a.last.get == b.first.get) 1L else 0L
        ExtEff(a.first.orElse(b.first), b.last.orElse(a.last),
          a.chgs + b.chgs - adj)
      },
      emit = { (in, it) =>
        var lastEff = in.last
        var wid = in.chgs
        it.map { r =>
          val st = r.get(stIdx)
          if (st != null && (lastEff.isEmpty || lastEff.get != st))
            wid += 1
          if (st != null) lastEff = Some(st)
          Row.fromSeq(r.toSeq :+ wid)
        }
      },
      widSchema)
    extend match {
      case 0 => withWid.filter(col("_st").isNotNull)
      case 1 => withWid.filter(col("_wid") > 0)
      case 2 =>
        val stIdx2 = widSchema.fieldIndex("_st")
        val widIdx = widSchema.fieldIndex("_wid")
        val nwSchema = StructType(widSchema.fields :+
          StructField("_nw", LongType))
        // descending scan: the carry read before each row is the _wid
        // of the NEXT non-null-state row in ascending order
        GlobalScan.twoPass[Option[Long]](withWid,
          Seq(col("_t").desc),
          zero = None,
          summary = { it =>
            var v: Option[Long] = None
            it.foreach { r =>
              if (r.get(stIdx2) != null) v = Some(r.getLong(widIdx))
            }
            v
          },
          combine = GlobalScan.lastSeen,
          emit = { (c0, it) =>
            var carry = c0
            it.map { r =>
              val out = Row.fromSeq(r.toSeq :+
                carry.map(Long.box).orNull)
              if (r.get(stIdx2) != null)
                carry = Some(r.getLong(widIdx))
              out
            }
          },
          nwSchema)
          .withColumn("_wid", when(col("_st").isNotNull, col("_wid"))
            .otherwise(col("_nw")))
          .filter(col("_wid").isNotNull)
          .drop("_nw")
    }
  }

  /** STATE_WINDOW(expr) … ZEROTH_STATE(v) (sql.y:2905-2944,
    * docs/24-distinguished.md:144): v is the baseline ("zero") state the
    * user doesn't care about — windows whose state matches it are
    * filtered out entirely, neither computed nor returned. Window ids
    * are assigned over ALL rows first (a zero-state run still separates
    * its neighbours), then zero-state rows drop; since a window's state
    * is constant, dropping its rows drops the whole window. NULL states
    * never match a non-null zeroth (null-safe compare). */
  def stateWindowsZeroth(df: DataFrame, state: Column, tsUs: Column,
      keys: Seq[Column], zeroth: Any): DataFrame =
    stateWindowsZerothC(df, state, tsUs, keys, lit(zeroth))

  /** Column-typed zeroth value — the multi-expression form compares
    * the state TUPLE against a struct of literals. */
  def stateWindowsZerothC(df: DataFrame, state: Column, tsUs: Column,
      keys: Seq[Column], zeroth: Column): DataFrame =
    stateWindows(df, state, tsUs, keys).filter(!(state <=> zeroth))

  /** COUNT_WINDOW(n, sliding): window w starts at row w·sliding+1 (per
    * key, ts order) and spans n rows; each row fans out to the
    * ceil(n/sliding) windows containing it — constant fan-out, one
    * sort-shuffle, same shape as the hopping interval lowering. */
  def slidingCountWindows(df: DataFrame, n: Int, sliding: Int,
      tsUs: Column, keys: Seq[Column]): DataFrame = {
    val rn = col("_rn")
    val lo = when(rn <= n, lit(0L))
      .otherwise(floorDiv(rn - n + (sliding - 1), sliding))
    val hi = floorDiv(rn - 1, sliding)
    val numbered =
      if (keys.isEmpty) // keyless: GlobalScan numbering, no global window
        GlobalScan.rowNumber(df, Seq(tsUs.cast(LongType)), "_rn")
      else df.withColumn("_rn", row_number()
        .over(Window.partitionBy(keys: _*).orderBy(tsUs)).cast(LongType))
    numbered.withColumn("_wid", explode(sequence(lo, hi))).drop("_rn")
  }

  /** COUNT_WINDOW(n[, sliding], col …) column-args variant (sql.y:2984-2987,
    * docs/24-distinguished.md:438): a row where EVERY listed column is
    * NULL does not count toward any window and is excluded from the
    * window's rows. Pure pre-filter — the count windowing itself is
    * unchanged, so this stays one sort-shuffle. */
  def countWindowsCols(df: DataFrame, n: Int, tsUs: Column,
      keys: Seq[Column], notNullCols: Seq[Column],
      sliding: Int = 0): DataFrame = {
    require(notNullCols.nonEmpty, "COUNT_WINDOW col-args needs >= 1 column")
    val keep = notNullCols.map(_.isNotNull).reduce(_ || _)
    val kept = df.filter(keep)
    if (sliding > 0) slidingCountWindows(kept, n, sliding, tsUs, keys)
    else countWindows(kept, n, tsUs, keys)
  }

  // ---------------------------------------------------------------------
  // EVENT_WINDOW START WITH cond END WITH cond  (eventwindowoperator.c:631)
  // ---------------------------------------------------------------------

  /** Adds `_wstart` (µs of the opening row) to every row that belongs to an
    * event window; rows outside any window are dropped.
    *
    * Semantics (eventwindowoperator.c:631-700): scanning per key in ts
    * order, a row satisfying `startCond` opens a window when none is open
    * (the row is included); the first subsequent row satisfying `endCond`
    * closes it (included); a row satisfying both while closed is a
    * single-row window. This is inherently a sequential fold, so it runs as
    * one `mapPartitions` pass over key-sorted partitions — streaming, O(1)
    * state per partition, no per-group buffering.
    */
  def eventWindows(df: DataFrame, startCond: Column, endCond: Column,
      tsUs: Column, keys: Seq[String]): DataFrame = {
    val tagged = df
      .withColumn("_ts", tsUs.cast(LongType))
      .withColumn("_s", startCond.cast(BooleanType))
      .withColumn("_e", endCond.cast(BooleanType))
    val keyCols = keys.map(col)
    if (keys.isEmpty) return eventWindowsKeyless(tagged)
    val sorted = tagged.repartition(keyCols: _*)
      .sortWithinPartitions(keyCols :+ col("_ts"): _*)
    val schema = sorted.schema
    val outSchema = StructType(schema.fields :+ StructField("_wstart", LongType))
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex("_ts")
    val sIdx = schema.fieldIndex("_s")
    val eIdx = schema.fieldIndex("_e")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    import org.apache.spark.sql.Row
    val result = sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var open = false
      var wstart = 0L
      it.flatMap { r =>
        val k = keyIdx.map(r.get)
        if (k != curKey) { curKey = k; open = false }
        val s = !r.isNullAt(sIdx) && r.getBoolean(sIdx)
        val e = !r.isNullAt(eIdx) && r.getBoolean(eIdx)
        if (!open && s) { open = true; wstart = r.getLong(tsIdx) }
        if (open) {
          val out = Row.fromSeq(r.toSeq :+ wstart)
          if (e) open = false
          Some(out)
        } else None
      }
    }(enc)
    result.drop("_ts", "_s", "_e")
  }

  /** A TRUE_FOR limit sub-expression (sql.y true_for_limit_expr;
    * executor.c isTrueForSatisfied): `duration <= 0` / `count <= 0`
    * mean "not constrained"; `mode` picks the combination. */
  final case class TrueForLimit(duration: Long, count: Long,
      mode: String) {
    require(Set("dur", "cnt", "and", "or").contains(mode),
      s"bad TRUE_FOR mode: $mode")
    def satisfied(skey: Long, ekey: Long, n: Long): Boolean = {
      val ds = duration <= 0 || math.abs(ekey - skey) >= duration
      val cs = count <= 0 || n >= count
      mode match {
        case "cnt" => cs
        case "and" => ds && cs
        case "or" => ds || cs
        case _ => ds
      }
    }
  }

  /** EVENT_WINDOW with START/END streak limits (sql.y extended
    * true_for_opt; eventwindowoperator.c:631-760): the window opens
    * only once the start condition has held for a CONSECUTIVE streak
    * meeting `startLimit` — the window's `_wstart` backdates to the
    * streak's first row, and the streak rows belong to the window.
    * Symmetrically the window closes once the end condition has held
    * for a streak meeting `endLimit`; the window's last row is the
    * streak's FIRST row (`closeWindowOnEndStreak` overrides ekey with
    * endFirstTs) — later streak rows are dropped, and scanning resumes
    * after the row that completed the streak. A broken streak flushes
    * its held rows back into the open window. A row may satisfy both
    * conditions (overlap): it can complete the start streak and open
    * the end streak at once.
    *
    * Sequential per key, so one `mapPartitions` pass over key-sorted
    * partitions. Held state is bounded by the ACTIVE streak only —
    * count-mode limits hold at most `count` rows, duration-mode at
    * most one limit-window of rows — never the partition. The keyless
    * form rides the same two-pass GlobalScan fold as the other keyless
    * windows — see [[eventWindowsLimitsKeyless]]. */
  def eventWindowsLimits(df: DataFrame, startCond: Column,
      endCond: Column, tsUs: Column, keys: Seq[String],
      startLimit: Option[TrueForLimit],
      endLimit: Option[TrueForLimit],
      tie: Seq[Column] = Nil): DataFrame = {
    if (startLimit.isEmpty && endLimit.isEmpty)
      return eventWindows(df, startCond, endCond, tsUs, keys)
    val sl = startLimit.getOrElse(TrueForLimit(0, 0, "dur"))
    val el = endLimit.getOrElse(TrueForLimit(0, 0, "dur"))
    val tagged = df
      .withColumn("_ts", tsUs.cast(LongType))
      .withColumn("_s", startCond.cast(BooleanType))
      .withColumn("_e", endCond.cast(BooleanType))
    if (keys.isEmpty)
      return eventWindowsLimitsKeyless(tagged, sl, el, tie)
    val keyCols = keys.map(col)
    val sorted = tagged.repartition(keyCols: _*)
      .sortWithinPartitions(keyCols :+ col("_ts"): _*)
    val schema = sorted.schema
    val outSchema =
      StructType(schema.fields :+ StructField("_wstart", LongType))
    val keyIdx = keys.map(schema.fieldIndex)
    val tsIdx = schema.fieldIndex("_ts")
    val sIdx = schema.fieldIndex("_s")
    val eIdx = schema.fieldIndex("_e")
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    import org.apache.spark.sql.Row
    val result = sorted.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var open = false
      var wstart = 0L
      // start streak (closed state): rows held until the streak meets
      // the limit (they become the window head) or breaks (dropped)
      var sFirstTs = 0L; var sCnt = 0L
      val sBuf = scala.collection.mutable.ArrayBuffer[Row]()
      // end streak (open state): rows AFTER the streak's first row are
      // held — dropped if the streak completes, flushed into the
      // window if it breaks
      var eFirstTs = 0L; var eCnt = 0L
      val eBuf = scala.collection.mutable.ArrayBuffer[Row]()
      def resetStart(): Unit = { sCnt = 0; sBuf.clear() }
      def resetEnd(): Unit = { eCnt = 0; eBuf.clear() }
      def withW(r: Row): Row = Row.fromSeq(r.toSeq :+ wstart)
      def keyEnd(): Iterator[Row] = {
        // unfinished end streak at key end: unresolved — flush into
        // the (still-open, never-closed) window, matching the basic
        // form's emit-unclosed behavior
        val tail =
          if (open && eBuf.nonEmpty) eBuf.toArray.toIterator.map(withW)
          else Iterator.empty
        resetStart(); resetEnd(); open = false
        tail
      }
      def stepRow(r: Row): Iterator[Row] = {
        val s = !r.isNullAt(sIdx) && r.getBoolean(sIdx)
        val e = !r.isNullAt(eIdx) && r.getBoolean(eIdx)
        val ts = r.getLong(tsIdx)
        if (!open) {
          if (!s) { resetStart(); Iterator.empty }
          else {
            if (sCnt == 0) sFirstTs = ts
            sCnt += 1; sBuf += r
            if (!sl.satisfied(sFirstTs, ts, sCnt)) Iterator.empty
            else {
              open = true; wstart = sFirstTs
              val head = sBuf.toArray
              resetStart(); resetEnd()
              val out = head.iterator.map(withW)
              // overlap: this row may also begin (and even complete)
              // the end streak
              if (e) {
                eFirstTs = ts; eCnt = 1
                if (el.satisfied(eFirstTs, ts, eCnt)) {
                  open = false; resetEnd()
                }
              }
              out
            }
          }
        } else {
          if (e) {
            if (eCnt == 0) {
              // the streak's first row is the window's last row either
              // way (ekey override) — emit it now
              eFirstTs = ts; eCnt = 1
              val out = Iterator.single(withW(r))
              if (el.satisfied(eFirstTs, ts, eCnt)) {
                open = false; resetEnd()
              }
              out
            } else {
              eCnt += 1
              if (el.satisfied(eFirstTs, ts, eCnt)) {
                // streak complete: held rows (and this one) are past
                // endFirstTs — dropped; scan resumes after this row
                open = false; resetEnd()
                Iterator.empty
              } else { eBuf += r; Iterator.empty }
            }
          } else {
            // streak broke: held rows return to the window
            val held = eBuf.toArray
            resetEnd()
            (held.iterator ++ Iterator.single(r)).map(withW)
          }
        }
      }
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val r = it.next()
            val k = keyIdx.map(r.get)
            if (curKey == null) curKey = k
            if (k != curKey) {
              val tail = keyEnd()
              curKey = k
              pending = tail ++ stepRow(r)
            } else pending = stepRow(r)
          }
          if (!pending.hasNext && curKey != null) {
            val tail = keyEnd()
            curKey = null
            pending = tail
          }
        }
        def hasNext: Boolean = { fill(); pending.hasNext }
        def next(): Row = { fill(); pending.next() }
      }
    }(enc)
    result.drop("_ts", "_s", "_e")
  }

  /** The window state machine as a GlobalScan effect: (open?, wstart).
    * `inherit` means "still the wstart the partition was entered with".
    */
  private case class EvState(open: Boolean, inherit: Boolean, ws: Long)
  private case class EvEffect(fromClosed: EvState, fromOpen: EvState)

  /** Keyless EVENT_WINDOW without the single-partition bottleneck: a
    * two-pass boundary scan (GlobalScan). The partition effect is the
    * state machine evaluated from BOTH possible incoming states (closed
    * / open-with-inherited-wstart) — two booleans + a long per
    * partition, so the driver fold touches n_partitions records, never
    * rows. Both passes stream; emission stays fully parallel. */
  private def eventWindowsKeyless(tagged: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = tagged.schema
    val outSchema =
      StructType(schema.fields :+ StructField("_wstart", LongType))
    val tsIdx = schema.fieldIndex("_ts")
    val sIdx = schema.fieldIndex("_s")
    val eIdx = schema.fieldIndex("_e")

    def step(st: EvState, r: Row): EvState = {
      val s = !r.isNullAt(sIdx) && r.getBoolean(sIdx)
      val e = !r.isNullAt(eIdx) && r.getBoolean(eIdx)
      var o = st
      if (!o.open && s) o = EvState(open = true, inherit = false,
        ws = r.getLong(tsIdx))
      if (o.open && e) o = o.copy(open = false)
      o
    }
    // compose: feed `st` through effect `e`
    def apply(st: EvState, e: EvEffect): EvState =
      if (!st.open) e.fromClosed
      else if (e.fromOpen.open && e.fromOpen.inherit)
        st // window survived the whole partition untouched
      else e.fromOpen

    val zero = EvEffect(
      fromClosed = EvState(open = false, inherit = false, ws = 0L),
      fromOpen = EvState(open = true, inherit = true, ws = 0L))

    val out = GlobalScan.twoPass[EvEffect](
      tagged, Seq(col("_ts")),
      zero = zero,
      summary = { it =>
        var c = zero.fromClosed; var o = zero.fromOpen
        it.foreach { r => c = step(c, r); o = step(o, r) }
        EvEffect(c, o)
      },
      combine = (e1, e2) =>
        EvEffect(apply(e1.fromClosed, e2), apply(e1.fromOpen, e2)),
      emit = { (prefix, it) =>
        // global scan starts closed; prefix.fromClosed is concrete
        var open = prefix.fromClosed.open
        var wstart = prefix.fromClosed.ws
        it.flatMap { r =>
          val s = !r.isNullAt(sIdx) && r.getBoolean(sIdx)
          val e = !r.isNullAt(eIdx) && r.getBoolean(eIdx)
          if (!open && s) { open = true; wstart = r.getLong(tsIdx) }
          if (open) {
            val out = Row.fromSeq(r.toSeq :+ wstart)
            if (e) open = false
            Some(out)
          } else None
        }
      },
      outSchema = outSchema)
    out.drop("_ts", "_s", "_e")
  }

  /** Keyless EVENT_WINDOW with TRUE_FOR START/END streak limits
    * (sql.y:2905-2944 true_for over event windows;
    * eventwindowoperator.c:101,631-760) — the same machine as the
    * keyed fold above, WITHOUT collapsing the frame to one partition.
    *
    * Scale shape: the machine's state, however rich mid-streak,
    * collapses at every QUIET row (start and end condition both
    * false) to one of exactly two control states — closed-idle, or
    * open with only the window-start µs carried (inherited data, not
    * control flow). A partition's effect is therefore its leading
    * non-quiet triples (finite, replayed concretely during the
    * driver's prefix fold) plus the machine evaluated over the
    * remainder from both canonical states — the same
    * fromClosed/fromOpen algebra the basic keyless form uses. Rows a
    * partition still HOLDS at its right edge (an unresolved streak)
    * resolve against the suffix effect: the continuation triples up
    * to the first quiet row of the following partitions, stepped
    * through the control machine locally. Both passes stream; the
    * driver fold touches per-partition effect records, never rows. A
    * frame whose leading run exceeds [[LimMachine.LimHeadCap]] rows with no quiet
    * row fails loudly — such a condition pair windows essentially the
    * whole frame and has no parallel decomposition. */
  private def eventWindowsLimitsKeyless(tagged: DataFrame,
      sl: TrueForLimit, el: TrueForLimit,
      tie: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.Row
    val schema = tagged.schema
    val outSchema =
      StructType(schema.fields :+ StructField("_wstart", LongType))
    val tsIdx = schema.fieldIndex("_ts")
    val sIdx = schema.fieldIndex("_s")
    val eIdx = schema.fieldIndex("_e")
    def flags(r: Row): (Long, Boolean, Boolean) =
      (r.getLong(tsIdx),
        !r.isNullAt(sIdx) && r.getBoolean(sIdx),
        !r.isNullAt(eIdx) && r.getBoolean(eIdx))

    def summarize(it: Iterator[Row]): (LimEffect, LimCont) = {
      val head = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Boolean, Boolean)]
      var quiet: Option[(Long, Boolean, Boolean)] = None
      var mC = LimMachine.LimClosedIdle
      var mO = LimMachine.LimOpenInherit
      it.foreach { r =>
        val t @ (ts, s, e) = flags(r)
        if (quiet.isEmpty) {
          if (!s && !e) {
            quiet = Some(t)
            mC = LimMachine.limStep(mC, ts, s, e, sl, el)
            mO = LimMachine.limStep(mO, ts, s, e, sl, el)
          } else {
            require(head.length < LimMachine.LimHeadCap,
              s"keyless EVENT_WINDOW TRUE_FOR: no quiet row (start AND " +
                s"end false) within ${LimMachine.LimHeadCap} rows of a partition — " +
                "this condition pair has no parallel decomposition")
            head += t
          }
        } else {
          mC = LimMachine.limStep(mC, ts, s, e, sl, el)
          mO = LimMachine.limStep(mO, ts, s, e, sl, el)
        }
      }
      val headArr = head.toArray
      (LimEffect(headArr, quiet.isDefined, mC, mO),
        LimCont(headArr ++ quiet.toArray, complete = quiet.isDefined))
    }

    def applyEff(st0: LimState, eff: LimEffect): LimState = {
      var st = st0
      eff.head.foreach { case (ts, s, e) =>
        st = LimMachine.limStep(st, ts, s, e, sl, el)
      }
      if (!eff.hasBody) st
      else {
        val out = if (st.open) eff.fromOpen else eff.fromClosed
        if (out.open && out.wsInherit)
          out.copy(ws = st.ws, wsInherit = st.wsInherit)
        else out
      }
    }

    // prefix accumulator: Left of the pair = the concrete fold state
    // (always present after scanLeft's zero), Right = a partition's
    // effect awaiting composition
    type Pre = (Option[LimState], Option[LimEffect])
    val zeroPre: Pre = (Some(LimMachine.LimClosedIdle), None)

    val out = GlobalScan.twoPassBidir[Pre, LimCont](
      tagged, col("_ts") +: tie,
      zeroPre = zeroPre, zeroSuf = LimCont(Array.empty, complete = false),
      summary = { it =>
        val (eff, cont) = summarize(it)
        ((None, Some(eff)): Pre, cont)
      },
      combinePre = (a, b) => (Some(applyEff(a._1.get, b._2.get)), None),
      combineSuf = (q1, q2) =>
        if (q1.complete) q1
        else {
          require(q1.triples.length + q2.triples.length <= 2 * LimMachine.LimHeadCap,
            "keyless EVENT_WINDOW TRUE_FOR: continuation exceeds the " +
              "quiet-row fence")
          LimCont(q1.triples ++ q2.triples, q2.complete)
        },
      emit = { (pre, cont, it) =>
        val s0 = pre._1.get
        var open = s0.open
        var wstart = s0.ws
        var sFirstTs = if (!s0.open) s0.ft else 0L
        var sCnt = if (!s0.open) s0.cnt else 0L
        var eFirstTs = if (s0.open) s0.ft else 0L
        var eCnt = if (s0.open) s0.cnt else 0L
        val sBuf = scala.collection.mutable.ArrayBuffer[Row]()
        val eBuf = scala.collection.mutable.ArrayBuffer[Row]()
        def resetStart(): Unit = { sCnt = 0; sBuf.clear() }
        def resetEnd(): Unit = { eCnt = 0; eBuf.clear() }
        def withW(r: Row): Row = Row.fromSeq(r.toSeq :+ wstart)
        // identical transitions to the keyed fold; buffers hold only
        // THIS partition's rows (earlier partitions resolve their own
        // held rows via their continuation)
        def stepRow(r: Row): Iterator[Row] = {
          val (ts, s, e) = flags(r)
          if (!open) {
            if (!s) { resetStart(); Iterator.empty }
            else {
              if (sCnt == 0) sFirstTs = ts
              sCnt += 1; sBuf += r
              if (!sl.satisfied(sFirstTs, ts, sCnt)) Iterator.empty
              else {
                open = true; wstart = sFirstTs
                val headRows = sBuf.toArray
                resetStart(); resetEnd()
                val outIt = headRows.iterator.map(withW)
                if (e) {
                  eFirstTs = ts; eCnt = 1
                  if (el.satisfied(eFirstTs, ts, eCnt)) {
                    open = false; resetEnd()
                  }
                }
                outIt
              }
            }
          } else {
            if (e) {
              if (eCnt == 0) {
                eFirstTs = ts; eCnt = 1
                val outIt = Iterator.single(withW(r))
                if (el.satisfied(eFirstTs, ts, eCnt)) {
                  open = false; resetEnd()
                }
                outIt
              } else {
                eCnt += 1
                if (el.satisfied(eFirstTs, ts, eCnt)) {
                  open = false; resetEnd()
                  Iterator.empty
                } else { eBuf += r; Iterator.empty }
              }
            } else {
              val held = eBuf.toArray
              resetEnd()
              (held.iterator ++ Iterator.single(r)).map(withW)
            }
          }
        }
        // resolve rows still held at the right edge against the
        // continuation (end of data ⇒ keyed keyEnd parity: unopened
        // start-streak rows drop, an open window's held rows flush)
        def edgeResolve(): Iterator[Row] = {
          if (!open) {
            if (sCnt > 0 && sBuf.nonEmpty) {
              var st = LimState(open = false, wsInherit = false,
                0L, sFirstTs, sCnt)
              var opened = false
              var resolved = false
              var i = 0
              while (!resolved && i < cont.triples.length) {
                val (ts, s, e) = cont.triples(i)
                // detect the open transition BEFORE stepping: a row
                // that completes the start streak and immediately
                // closes the window (s and e both true, end limit
                // satisfied at count 1) steps straight to
                // LimClosedIdle, which the post-step state alone
                // cannot distinguish from a broken streak — the held
                // sBuf rows are the window head either way
                val openedThisStep = s && {
                  val ft = if (st.cnt == 0) ts else st.ft
                  sl.satisfied(ft, ts, st.cnt + 1)
                }
                st = LimMachine.limStep(st, ts, s, e, sl, el)
                if (openedThisStep) { opened = true; resolved = true }
                else if (st.cnt == 0) resolved = true
                i += 1
              }
              if (opened) { wstart = sFirstTs; sBuf.iterator.map(withW) }
              else Iterator.empty
            } else Iterator.empty
          } else if (eCnt > 0 && eBuf.nonEmpty) {
            var st = LimState(open = true, wsInherit = false,
              wstart, eFirstTs, eCnt)
            var completed = false
            var resolved = false
            var i = 0
            while (!resolved && i < cont.triples.length) {
              val (ts, s, e) = cont.triples(i)
              st = LimMachine.limStep(st, ts, s, e, sl, el)
              if (!st.open) { completed = true; resolved = true }
              else if (st.cnt == 0) resolved = true
              i += 1
            }
            if (completed) Iterator.empty
            else eBuf.iterator.map(withW)
          } else Iterator.empty
        }
        // edgeResolve must run only after stepRow has consumed the
        // partition, so it hides behind a lazily-built iterator
        it.flatMap(stepRow) ++ new Iterator[Row] {
          private var inner: Iterator[Row] = null
          private def ensure(): Unit =
            if (inner == null) inner = edgeResolve()
          def hasNext: Boolean = { ensure(); inner.hasNext }
          def next(): Row = { ensure(); inner.next() }
        }
      },
      outSchema = outSchema)
    out.drop("_ts", "_s", "_e")
  }

  /** EXTERNAL_WINDOW (sql.y:2895-2900, externalwindowoperator.c:4367):
    * windows supplied by an external rowset. `windows` must carry
    * `_wid`, `_wstart`, `_wend` (Long µs, half-open [start, end)); it is
    * broadcast — window lists are small by construction (they come from
    * a trigger or user rowset), while `df` streams at any scale.
    * Overlapping windows duplicate rows, matching the reference. */
  def externalWindows(df: DataFrame, windows: DataFrame,
      tsUs: Column): DataFrame =
    df.join(broadcast(windows),
      tsUs >= col("_wstart") && tsUs < col("_wend"))

  // ---------------------------------------------------------------------
  // Ordered final output helper: TDengine results over ts-ordered storage
  // are implicitly ordered; our API adds the explicit sort (SURVEY §7.4.8).
  // ---------------------------------------------------------------------
  def ordered(df: DataFrame, cols: String*): DataFrame =
    df.orderBy(cols.map(col): _*)
}

/** Control state of the TRUE_FOR streak machine. Closed: (ft, cnt) =
  * the pending start streak (cnt 0 = idle). Open: ws = window start
  * (`wsInherit` = still the ws the evaluation was entered with) and
  * (ft, cnt) = the pending end streak. */
private[ops] case class LimState(open: Boolean, wsInherit: Boolean,
    ws: Long, ft: Long, cnt: Long)

/** One control transition of the streak machine — the emission-free
  * twin of the keyed fold in [[eventWindowsLimits]]. Lives in a
  * serializable holder: executor-side closures call it, and a bare
  * object-method call would drag the whole (non-serializable)
  * TimeOps module into the task closure. */
private[ops] object LimMachine extends Serializable {
val LimClosedIdle: LimState = LimState(open = false, wsInherit = false,
  0L, 0L, 0L)
val LimOpenInherit: LimState = LimState(open = true, wsInherit = true,
  0L, 0L, 0L)
val LimHeadCap: Int = 1 << 16
def limStep(st: LimState, ts: Long, s: Boolean, e: Boolean,
    sl: TimeOps.TrueForLimit, el: TimeOps.TrueForLimit): LimState =
  if (!st.open) {
    if (!s) st.copy(ft = 0L, cnt = 0L)
    else {
      val ft = if (st.cnt == 0) ts else st.ft
      val cnt = st.cnt + 1
      if (!sl.satisfied(ft, ts, cnt))
        LimState(open = false, wsInherit = false, 0L, ft, cnt)
      else if (e) {
        // overlap: the opening row also starts (maybe ends) the
        // end streak
        if (el.satisfied(ts, ts, 1)) LimMachine.LimClosedIdle
        else LimState(open = true, wsInherit = false, ft, ts, 1L)
      } else LimState(open = true, wsInherit = false, ft, 0L, 0L)
    }
  } else {
    if (e) {
      val ft = if (st.cnt == 0) ts else st.ft
      val cnt = st.cnt + 1
      if (el.satisfied(ft, ts, cnt)) LimMachine.LimClosedIdle
      else st.copy(ft = ft, cnt = cnt)
    } else st.copy(ft = 0L, cnt = 0L)
  }
}

/** Per-partition effect of the streak machine. `head` = the (ts, s,
  * e) triples of the leading non-quiet rows (replayed concretely at
  * driver fold time); if a quiet row exists (`hasBody`),
  * `fromClosed`/`fromOpen` are the machine evaluated from the quiet
  * row to partition end from the two canonical states every
  * trajectory collapses to there. */
private[ops] case class LimEffect(head: Array[(Long, Boolean, Boolean)],
    hasBody: Boolean, fromClosed: LimState, fromOpen: LimState)
/** Suffix continuation: the following partitions' triples up to and
  * including the first quiet row — enough to resolve any streak held
  * at a partition's right edge. `complete` = a quiet row was found
  * (false only at end of data). */
private[ops] case class LimCont(triples: Array[(Long, Boolean, Boolean)],
    complete: Boolean)


