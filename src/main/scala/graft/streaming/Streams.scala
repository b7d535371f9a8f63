package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

/** CREATE STREAM semantics (SURVEY.md §2.11, §3.3) on Structured
  * Streaming.
  *
  * The reference separates the *trigger* (window detection on the trigger
  * table, watermark-gated) from the *calc query* (an arbitrary SELECT run
  * per fired window with `_twstart`/`_twend` placeholders bound). Mapping:
  *
  *  - INTERVAL/SLIDING + WATERMARK  → `withWatermark().groupBy(window())`
  *    in Append mode (emit-on-close ≙ window-close trigger)
  *  - SESSION(ts, gap)              → `session_window`
  *  - COUNT_WINDOW(n)               → `flatMapGroupsWithState` (below)
  *  - STATE_WINDOW(col)             → `flatMapGroupsWithState` (below)
  *  - calc-per-window + placeholders→ `foreachBatch` + [[bindCalc]]
  *  - last_row cache (CACHEMODEL)   → [[LatestRows]]
  *
  * Streaming state is bounded: count/state windows keep O(1) per key,
  * the watermark evicts interval/session state, and the fired-windows
  * stream that reaches the driver carries window *bounds*, never rows.
  */
object Streams {

  /** Validated SPARK_GRAFT_REPLAY_PARTS override for the replay gates'
    * shuffle-partition pin (parsed ONCE, loudly: a malformed value must
    * fail naming the variable at first use, not throw a bare
    * NumberFormatException deep inside query construction). */
  lazy val replayPartsOverride: Option[Int] =
    sys.env.get("SPARK_GRAFT_REPLAY_PARTS").map { v =>
      val n = try v.trim.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"SPARK_GRAFT_REPLAY_PARTS must be a positive integer, got '$v'")
      }
      require(n > 0,
        s"SPARK_GRAFT_REPLAY_PARTS must be a positive integer, got '$v'")
      n
    }

  /** The replay gates' shuffle-partition count: the env override when
    * set, else the caller's default. Results are partition-count
    * independent (keyed state is hash-partitioned, every gate ends in
    * a total ORDER BY); the count only sets how many state stores each
    * micro-batch opens and commits. */
  def replayParts(default: Int): Int =
    replayPartsOverride.getOrElse(default)

  /** INTERVAL(interval) SLIDING(slide) WATERMARK(w) trigger: windowed
    * aggregation over `valueCol` that only emits closed windows
    * (append mode). */
  def intervalTrigger(src: DataFrame, tsCol: String, interval: String,
      slide: String, watermark: String, keys: Seq[String],
      valueCol: String = "value"): DataFrame = {
    val grouped = src
      .withWatermark(tsCol, watermark)
      .groupBy(Seq(window(col(tsCol), interval, slide)) ++
        keys.map(col): _*)
    grouped.agg(count(lit(1)).as("n"), sum(col(valueCol)).as("sum_value"))
      .select(Seq(col("window.start").as("_twstart"),
        col("window.end").as("_twend")) ++ keys.map(col) ++
        Seq(col("n"), col("sum_value")): _*)
  }

  /** SESSION(ts, gap) trigger via session_window. */
  def sessionTrigger(src: DataFrame, tsCol: String, gap: String,
      watermark: String, keys: Seq[String]): DataFrame =
    src.withWatermark(tsCol, watermark)
      .groupBy(Seq(session_window(col(tsCol), gap)) ++ keys.map(col): _*)
      .agg(count(lit(1)).as("n"))
      .select(Seq(col("session_window.start").as("_twstart"),
        col("session_window.end").as("_twend")) ++ keys.map(col) ++
        Seq(col("n")): _*)

  // ---------------------------------------------------------------------
  // PERIOD(p[,offset]) trigger (sql.y:1661 createPeriodWindowNode): fires
  // on a PROCESSING-time grid — every p of wall clock, grid points at
  // offset + k·p — independent of event arrival. The fired "window" is
  // the period ending at the grid point. Spark mapping: a
  // Trigger.ProcessingTime(p) micro-batch cadence + period bounds bound
  // into the calc exactly like window bounds (_tprev_ts/_tcurrent_ts).
  // ---------------------------------------------------------------------

  /** The micro-batch trigger for PERIOD(p): Spark's processing-time
    * trigger IS the reference's period timer (the offset shifts the
    * bounds grid, not the timer phase — batch cadence stays p). */
  def periodTrigger(periodMs: Long): Trigger = {
    require(periodMs > 0, s"PERIOD must be positive: $periodMs ms")
    Trigger.ProcessingTime(periodMs)
  }

  /** Bounds of the period that closed most recently at `nowUs`:
    * `_tcurrent_ts` = the newest grid point (offset + k·p) ≤ now,
    * `_tprev_ts` = one period earlier. Pure alignment arithmetic so
    * replays bind identical bounds for the same grid point. */
  def periodBounds(nowUs: Long, periodUs: Long, offsetUs: Long = 0L)
      : WindowBounds = {
    require(periodUs > 0 && offsetUs >= 0 && offsetUs < periodUs,
      s"PERIOD($periodUs, $offsetUs): need 0 <= offset < period")
    val end = Math.floorDiv(nowUs - offsetUs, periodUs) * periodUs + offsetUs
    WindowBounds(end - periodUs, end, 0L)
  }

  /** foreachBatch body for a PERIOD stream: each firing binds the
    * just-closed period's bounds into the calc and appends to `sink`,
    * ignoring the batch contents (the reference's PERIOD trigger is
    * purely clock-driven; data reaches the calc through the bound
    * query, not through the trigger stream). `clockUs` is injectable
    * so tests replay a deterministic clock. */
  def periodCalc(periodUs: Long, offsetUs: Long,
      calc: WindowBounds => DataFrame, sink: DataFrame => Unit,
      clockUs: () => Long = () => System.currentTimeMillis() * 1000L)
      : (DataFrame, Long) => Unit =
    (_: DataFrame, _: Long) =>
      sink(calc(periodBounds(clockUs(), periodUs, offsetUs)))

  // ---------------------------------------------------------------------
  // COUNT_WINDOW(n) trigger: stateful, exactly n rows per fired window.
  // ---------------------------------------------------------------------
  case class CountState(buf: Long, minTs: Long, maxTs: Long, sum: Double)
  case class FiredCountWindow(key: Long, n: Long, startUs: Long,
      endUs: Long, sum: Double)

  /** Rows: (key, tsUs, value). Emits one record per completed group of
    * `n` rows per key. O(1) state per key (no row buffering). */
  def countWindowTrigger(rows: Dataset[(Long, Long, Double)], n: Int)
      : Dataset[FiredCountWindow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Double)],
         state: GroupState[CountState]) =>
          var s = state.getOption.getOrElse(CountState(0, Long.MaxValue,
            Long.MinValue, 0d))
          val fired = scala.collection.mutable.ArrayBuffer[FiredCountWindow]()
          // the group iterator carries no ordering guarantee — sort by
          // ts so window membership is deterministic (same as the
          // state-window trigger)
          it.toSeq.sortBy(_._2).foreach { case (_, ts, v) =>
            val buf = s.buf + 1
            val minTs = math.min(s.minTs, ts)
            val maxTs = math.max(s.maxTs, ts)
            val sum = s.sum + v
            s = if (buf == n) {
              fired += FiredCountWindow(key, buf, minTs, maxTs, sum)
              CountState(0, Long.MaxValue, Long.MinValue, 0d)
            } else CountState(buf, minTs, maxTs, sum)
          }
          state.update(s)
          fired.iterator
      }
  }

  // ---------------------------------------------------------------------
  // STATE_WINDOW(col) trigger: fires when the state value changes.
  // ---------------------------------------------------------------------
  case class StateWinState(cur: String, startUs: Long, lastUs: Long,
      n: Long)
  case class FiredStateWindow(key: Long, state: String, startUs: Long,
      endUs: Long, n: Long)

  /** Rows: (key, tsUs, stateValue), assumed ts-ordered per key within a
    * batch (the reference requires disorder handling via watermark;
    * IGNORE_DISORDER is the modeled mode here). `trueFor` drops fired
    * windows below the duration/count limit (sql.y:1657 trigger-side
    * true_for_opt; executor.c isTrueForSatisfied) — applied at emit,
    * after the window's span and rowcount are final. */
  def stateWindowTrigger(rows: Dataset[(Long, Long, String)],
      trueFor: Option[graft.ops.TimeOps.TrueForLimit] = None)
      : Dataset[FiredStateWindow] = {
    import rows.sparkSession.implicits._
    val keep = (w: FiredStateWindow) =>
      trueFor.forall(_.satisfied(w.startUs, w.endUs, w.n))
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, String)],
         state: GroupState[StateWinState]) =>
          val fired = scala.collection.mutable.ArrayBuffer[FiredStateWindow]()
          var s = state.getOption.orNull
          it.toSeq.sortBy(_._2).foreach { case (_, ts, v) =>
            s match {
              case null => s = StateWinState(v, ts, ts, 1)
              case st if st.cur == v =>
                s = st.copy(lastUs = ts, n = st.n + 1)
              case st =>
                fired += FiredStateWindow(key, st.cur, st.startUs,
                  st.lastUs, st.n)
                s = StateWinState(v, ts, ts, 1)
            }
          }
          if (s != null) state.update(s)
          fired.iterator.filter(keep)
      }
  }

  /** STATE_WINDOW trigger with IDLE_TIMEOUT(d) (sql.y:1740): a key that
    * receives no rows for d of processing time has its open window
    * force-closed and emitted — the reference's guard against a stalled
    * child table holding its window open forever. */
  def stateWindowTriggerIdle(rows: Dataset[(Long, Long, String)],
      idleMs: Long): Dataset[FiredStateWindow] = {
    import rows.sparkSession.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(
        stateWindowIdleHandler(idleMs))
  }

  /** Per-key handler for [[stateWindowTriggerIdle]], factored out so the
    * timeout path is unit-testable without a wall clock. On timeout the
    * open window is emitted and the key's state cleared; otherwise the
    * [[stateWindowTrigger]] state machine runs and the idle timer is
    * re-armed. */
  private[graft] def stateWindowIdleHandler(idleMs: Long)
      : (Long, Iterator[(Long, Long, String)], GroupState[StateWinState])
        => Iterator[FiredStateWindow] = {
    (key, it, state) =>
      if (state.hasTimedOut) {
        val out = state.getOption.map(st =>
          FiredStateWindow(key, st.cur, st.startUs, st.lastUs, st.n)).iterator
        state.remove()
        out
      } else {
        val fired = scala.collection.mutable.ArrayBuffer[FiredStateWindow]()
        var s = state.getOption.orNull
        it.toSeq.sortBy(_._2).foreach { case (_, ts, v) =>
          s match {
            case null => s = StateWinState(v, ts, ts, 1)
            case st if st.cur == v =>
              s = st.copy(lastUs = ts, n = st.n + 1)
            case st =>
              fired += FiredStateWindow(key, st.cur, st.startUs,
                st.lastUs, st.n)
              s = StateWinState(v, ts, ts, 1)
          }
        }
        if (s != null) state.update(s)
        state.setTimeoutDuration(idleMs)
        fired.iterator
      }
  }

  // ---------------------------------------------------------------------
  // EVENT_WINDOW trigger: START WITH cond … END WITH cond as a stream
  // state machine (sql.y:1656-1664 event window trigger type; batch
  // semantics mirrored from eventwindowoperator.c:631-700).
  // ---------------------------------------------------------------------
  case class EventWinState(startUs: Long, n: Long, sum: Double)
  case class FiredEventWindow(key: Long, startUs: Long, endUs: Long,
      n: Long, sum: Double)

  /** Rows: (key, tsUs, value). A row satisfying `startCond` opens a
    * window when none is open (included); the first subsequent row
    * satisfying `endCond` closes it (included) and fires; a row
    * satisfying both while closed fires a single-row window. O(1)
    * state per key; an open window survives micro-batch boundaries and
    * never fires if the stream ends first (the reference's window-close
    * trigger contract). */
  def eventWindowTrigger(rows: Dataset[(Long, Long, Double)],
      startCond: Double => Boolean, endCond: Double => Boolean,
      trueFor: Option[graft.ops.TimeOps.TrueForLimit] = None)
      : Dataset[FiredEventWindow] = {
    import rows.sparkSession.implicits._
    val keep = (w: FiredEventWindow) =>
      trueFor.forall(_.satisfied(w.startUs, w.endUs, w.n))
    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (key: Long, it: Iterator[(Long, Long, Double)],
         state: GroupState[EventWinState]) =>
          val fired = scala.collection.mutable.ArrayBuffer[FiredEventWindow]()
          var s = state.getOption.orNull
          it.toSeq.sortBy(_._2).foreach { case (_, ts, v) =>
            if (s == null) {
              if (startCond(v)) {
                if (endCond(v))
                  fired += FiredEventWindow(key, ts, ts, 1, v)
                else s = EventWinState(ts, 1, v)
              }
            } else {
              val n = s.n + 1; val sum = s.sum + v
              if (endCond(v)) {
                fired += FiredEventWindow(key, s.startUs, ts, n, sum)
                s = null
              } else s = EventWinState(s.startUs, n, sum)
            }
          }
          if (s != null) state.update(s) else state.remove()
          fired.iterator.filter(keep)
      }
  }

  // ---------------------------------------------------------------------
  // Calc-query binding: the reference runs an arbitrary SELECT per fired
  // window with stream placeholders bound (builtins.c:6877-7142).
  // ---------------------------------------------------------------------
  case class WindowBounds(startUs: Long, endUs: Long, groupId: Long)

  /** Substitutes `_twstart`/`_twend`/`_tgrpid` placeholders: the calc
    * builder receives the bounds and returns the per-window frame; the
    * union of all fired windows in the batch is the output. Bounds (not
    * data) reach the driver — the per-window calc itself stays
    * distributed. */
  def bindCalc(windows: Seq[WindowBounds],
      calc: WindowBounds => DataFrame): Option[DataFrame] =
    windows.map(calc).reduceOption(_ unionByName _)

  /** foreachBatch runner: collects fired window bounds from the trigger
    * stream batch and appends the bound calc output to `sink`. */
  def calcPerWindow(fired: DataFrame, calc: WindowBounds => DataFrame,
      sink: DataFrame => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val grp = if (batch.columns.contains("_tgrpid"))
        coalesce(col("_tgrpid"), lit(0L)) else lit(0L)
      val bounds = batch
        .select(col("_twstart").cast("long"), col("_twend").cast("long"),
          grp.cast("long"))
        .collect()
        .map(r => WindowBounds(r.getLong(0), r.getLong(1), r.getLong(2)))
      bindCalc(bounds.toSeq, calc).foreach(sink)
  }

  // ---------------------------------------------------------------------
  // FILL_HISTORY / recalculation / NOTIFY (sql.y:1715-1776,
  // RECALCULATE STREAM sql.y:1628)
  // ---------------------------------------------------------------------

  /** FILL_HISTORY: one-off batch backfill of the calc over everything
    * already ingested, written to the output table; returns the max
    * event ts (µs) processed — the offset the live stream starts from
    * (rows with ts beyond it belong to the stream). */
  def fillHistory(src: DataFrame, tsUs: Column,
      calc: DataFrame => DataFrame, sink: DataFrame => Unit): Option[Long] = {
    val maxTs = src.agg(max(tsUs.cast("long"))).head.get(0)
    if (maxTs == null) None
    else {
      sink(calc(src))
      Some(maxTs.asInstanceOf[Long])
    }
  }

  /** DELETE_RECALC / RECALCULATE STREAM [t0, t1): re-runs the batch
    * calc over the affected range and swaps those output rows —
    * existing output outside the range is preserved. `outTsUs` names
    * the output's window-start column. */
  def recalcRange(spark: SparkSession, outPath: String, outTsUs: String,
      t0Us: Long, t1Us: Long, calc: (Long, Long) => DataFrame): Unit = {
    val existing =
      try spark.read.parquet(outPath)
      catch { case _: Exception => null }
    val fresh = calc(t0Us, t1Us)
    val merged =
      if (existing == null) fresh
      else existing
        .filter(col(outTsUs) < t0Us || col(outTsUs) >= t1Us)
        .unionByName(fresh)
    swapWrite(spark, merged, outPath)
  }

  /** Staging + rename overwrite: one parquet encode, and the serving
    * path is swapped atomically-ish instead of being deleted while a
    * rewrite is in flight. The staged write materializes fully before
    * the old directory is removed, so a mid-write failure leaves the
    * previous data intact. */
  private[streaming] def swapWrite(spark: SparkSession, df: DataFrame,
      path: String, partitionCols: Seq[String] = Nil): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(path + ".__staging")
    val w = df.write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(tmp.toString)
    fs.delete(p, true)
    fs.rename(tmp, p)
  }

  /** NOTIFY(url …): webhook dispatch per fired window. The transport is
    * injectable (this container has no egress); production wires an
    * HTTP POST. Returns the foreachBatch hook. */
  def notifyHook(send: WindowBounds => Unit): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      batch.select(col("_twstart").cast("long"), col("_twend").cast("long"))
        .collect()
        .foreach(r => send(WindowBounds(r.getLong(0), r.getLong(1), 0L)))
  }

  // ---------------------------------------------------------------------
  // STREAM_OPTIONS(...) (sql.y:1715-1740): the trigger-option surface
  // beyond WATERMARK/FILL_HISTORY/DELETE_RECALC (those are above).
  // ---------------------------------------------------------------------

  /** Parsed STREAM_OPTIONS. `eventTypes` ⊆ {WINDOW_OPEN, WINDOW_CLOSE}
    * (sql.y event_type_list). */
  case class StreamOptions(
      preFilter: Option[Column] = None, // PRE_FILTER(cond)
      expiredTimeUs: Option[Long] = None, // EXPIRED_TIME(d)
      forceOutput: Boolean = false, // FORCE_OUTPUT
      ignoreNoDataTrigger: Boolean = false, // IGNORE_NODATA_TRIGGER
      eventTypes: Set[String] = Set("WINDOW_CLOSE"), // EVENT_TYPE(...)
      maxDelayMs: Option[Long] = None, // MAX_DELAY(d)
      lowLatencyCalc: Boolean = false, // LOW_LATENCY_CALC
      idleTimeoutMs: Option[Long] = None) // IDLE_TIMEOUT(d)

  /** Trigger cadence from the option surface (sql.y:1715-1740):
    * LOW_LATENCY_CALC runs the calc as soon as a micro-batch is ready
    * (zero-interval processing-time trigger — Spark's closest analog of
    * the reference's calc-immediately mode); MAX_DELAY(d) bounds result
    * staleness by re-firing at least every d; default is drain-what's-
    * available. LOW_LATENCY_CALC wins when both are set (it is the
    * stricter latency demand). */
  def resolveTrigger(opts: StreamOptions): Trigger =
    if (opts.lowLatencyCalc) Trigger.ProcessingTime(0L)
    else opts.maxDelayMs.map(Trigger.ProcessingTime(_))
      .getOrElse(Trigger.AvailableNow())

  /** MAX_DELAY(d) on a windowed aggregation: the reference emits
    * intermediate window results at most d after new data, without
    * waiting for the watermark to close the window. Spark mapping:
    * Update output mode (open windows emit their current partials every
    * micro-batch) + a processing-time trigger of d — together they
    * bound staleness by d exactly as the reference does. */
  def withMaxDelay[T](w: DataStreamWriter[T], delayMs: Long)
      : DataStreamWriter[T] =
    w.outputMode(OutputMode.Update).trigger(Trigger.ProcessingTime(delayMs))

  /** PRE_FILTER lowers to a plain filter BEFORE windowing/state — rows
    * that fail it never reach the trigger (map-side, no shuffle).
    * EXPIRED_TIME on a live stream is the watermark mechanism itself
    * (Spark's watermark both delays window close and discards
    * older-than-delay data — the reference splits these into WATERMARK
    * + EXPIRED_TIME; here the effective delay is max of the two, which
    * the caller passes as the watermark). */
  def applyPreFilter(src: DataFrame, opts: StreamOptions): DataFrame =
    opts.preFilter.map(src.filter).getOrElse(src)

  /** EXPIRED_TIME(d) on BATCH recalc paths (fill_history / recalc),
    * where no watermark exists: drop rows older than d behind the
    * newest event in the frame — the reference's "too old to trigger
    * recalculation" cut (one extra max() aggregation, no collect of
    * data rows). */
  def expiredFilter(df: DataFrame, tsUs: Column, expiredUs: Long)
      : DataFrame = {
    val mx = df.agg(max(tsUs.cast("long"))).head.get(0)
    if (mx == null) df
    else df.filter(tsUs.cast("long") >= lit(mx.asInstanceOf[Long] - expiredUs))
  }

  /** calcPerWindow with the option surface applied:
    * IGNORE_NODATA_TRIGGER skips fired windows whose trigger row count
    * is 0 (the `n` column when the trigger emits one); FORCE_OUTPUT
    * emits one all-null row (bounds bound) for windows whose calc
    * produced nothing — the reference's "always produce a result row"
    * contract (sql.y FORCE_OUTPUT). */
  def calcPerWindowOpts(fired: DataFrame, calc: WindowBounds => DataFrame,
      sink: DataFrame => Unit, opts: StreamOptions)
      : (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val b0 = if (opts.ignoreNoDataTrigger && batch.columns.contains("n"))
        batch.filter(col("n") > 0) else batch
      val grp = if (b0.columns.contains("_tgrpid"))
        coalesce(col("_tgrpid"), lit(0L)) else lit(0L)
      val bounds = b0
        .select(col("_twstart").cast("long"), col("_twend").cast("long"),
          grp.cast("long"))
        .collect()
        .map(r => WindowBounds(r.getLong(0), r.getLong(1), r.getLong(2)))
      val outs = bounds.toSeq.map { wb =>
        val out = calc(wb)
        if (opts.forceOutput && out.isEmpty) {
          // one null row, with the placeholder bounds still bound
          val spark = out.sparkSession
          val nulls = out.schema.fields.map { f =>
            val c = f.name match {
              case "_twstart" => lit(wb.startUs)
              case "_twend" => lit(wb.endUs)
              case _ => lit(null)
            }
            c.cast(f.dataType).as(f.name)
          }
          spark.range(1).select(nulls.toSeq: _*)
        } else out
      }
      outs.reduceOption(_ unionByName _).foreach(sink)
  }

  /** A notification event: `etype` ∈ {WINDOW_OPEN, WINDOW_CLOSE}. */
  case class NotifyEvent(etype: String, bounds: WindowBounds)

  /** EVENT_TYPE(...)-aware notify hook: one event per fired window per
    * requested type. (Open events dispatch at close granularity — the
    * micro-batch boundary — which is the tightest the batch runner
    * observes; the reference fires them when the first row of the
    * window arrives.) */
  def notifyHookTyped(send: NotifyEvent => Unit, opts: StreamOptions)
      : (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val rows = batch
        .select(col("_twstart").cast("long"), col("_twend").cast("long"))
        .collect()
      for (r <- rows; t <- Seq("WINDOW_OPEN", "WINDOW_CLOSE")
             if opts.eventTypes.contains(t))
        send(NotifyEvent(t, WindowBounds(r.getLong(0), r.getLong(1), 0L)))
  }
}

/** The last-row cache (CACHEMODEL / cachescanoperator.c): a compact
  * "latest row per key" table maintained incrementally — the Spark
  * answer to TDengine's last()/last_row() latency contract. */
object LatestRows {

  /** Merge a batch into the cache: keep the newest row per key.
    * `tieBreak` columns (descending, after ts) make the pick a total
    * order when a key can hold two rows at the same timestamp —
    * without it the cache pick is partition-order nondeterministic. */
  def merge(cache: DataFrame, batch: DataFrame, keys: Seq[String],
      tsCol: String, tieBreak: Seq[String] = Nil): DataFrame = {
    val all = cache.unionByName(batch)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).desc +: tieBreak.map(c => col(c).desc): _*)
    all.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** foreachBatch maintainer for a parquet-backed cache directory,
    * hash-bucketed on the cache key: `buckets` writer tasks each own
    * one `_bucket=k` directory, so there is no single-writer bottleneck
    * at 10M child tables (SURVEY §1.1) — point lookups prune to one
    * bucket via partition pruning on `_bucket`. `buckets` should track
    * key cardinality (1 row per key per bucket file; ~100k keys/bucket
    * keeps files in the MB range). */
  def maintainer(spark: SparkSession, path: String, keys: Seq[String],
      tsCol: String, buckets: Int = 1, tieBreak: Seq[String] = Nil)
      : (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val existing =
        try spark.read.parquet(path).drop("_bucket")
        catch { case _: Exception => batch.limit(0) }
      val merged = merge(existing, batch, keys, tsCol, tieBreak)
        .withColumn("_bucket",
          pmod(hash(keys.map(col): _*), lit(buckets)))
        .repartition(buckets, col("_bucket"))
      Streams.swapWrite(spark, merged, path, partitionCols = Seq("_bucket"))
  }

  /** Point lookup against the bucketed cache: computes the key's bucket
    * and filters on the `_bucket` partition column, so the read prunes
    * to a single bucket directory (asserted in ScaleLayoutSpec). */
  def lookup(spark: SparkSession, path: String, keys: Seq[String],
      keyVals: Seq[Any], buckets: Int): DataFrame = {
    val cache = spark.read.parquet(path)
    val keyEq = keys.zip(keyVals).map { case (k, v) => col(k) === lit(v) }
      .reduce(_ && _)
    val bucket = spark.range(1)
      .select(pmod(hash(keyVals.map(lit): _*), lit(buckets)).as("b"))
      .head.getInt(0)
    cache.filter(col("_bucket") === bucket && keyEq).drop("_bucket")
  }
}
