package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Indefinite-rows and selection functions (SURVEY.md §2.2 IndefRowsFunc,
  * §2.10): diff, derivative, csum, mavg, statecount, stateduration,
  * top/bottom, tail, unique — the reference applies these 1→N-row
  * functions outside GROUP BY (projectoperator.c:676); here they lower to
  * SQL window functions over `Window.partitionBy(keys).orderBy(ts)`.
  *
  * Each costs exactly one sort-shuffle on the partition keys (Catalyst
  * collapses adjacent window operators sharing a spec), stays inside
  * codegen, and buffers nothing beyond the running frame.
  */
object SeriesOps {

  private def w(keys: Seq[Column], ts: Column) =
    Window.partitionBy(keys: _*).orderBy(ts)

  /** diff (builtins.c:3747 setDoDiffResult; :3576 tryToSetInt64):
    * a NULL input emits NULL and KEEPS the previous value (the next
    * non-null diffs against the last non-null — setDoDiffResult
    * returns before doHandleDiff on null data); the first non-null
    * value emits NULL (`!hasPrev`). ignoreOpt bit 0 (=1) nulls
    * negative deltas in place. Row-level effects (the silent
    * physical-first row, ignore-null row drops) are applied by the
    * calling route — a Column can't drop rows. */
  def diff(value: Column, ts: Column, keys: Seq[Column],
      ignoreOpt: Int = 0): Column = {
    val prevNN = last(value, ignoreNulls = true)
      .over(w(keys, ts).rowsBetween(Window.unboundedPreceding, -1))
    val base = when(value.isNull, lit(null)).otherwise(value - prevNN)
    if ((ignoreOpt & 1) != 0) when(base < 0, lit(null)).otherwise(base)
    else base
  }

  /** derivative(col, unitUs): d(value)/d(ts) scaled to `unitUs`
    * (builtins.c:3603; derivativeFunction skips NULL-input rows
    * entirely — `if (row.isDataNull) continue` — so the slope is
    * always vs the last NON-NULL row). The output is NULL for null
    * inputs and the first non-null row; the caller filters those
    * rows out for reference row-count parity
    * (test_fun_ts_derivative.py checkRows(N-1) per partition),
    * `ignoreNegative` additionally drops negative slopes. */
  def derivative(value: Column, ts: Column, keys: Seq[Column],
      unitUs: Long): Column = {
    val prec = w(keys, ts).rowsBetween(Window.unboundedPreceding, -1)
    val pv = last(when(value.isNotNull, value), ignoreNulls = true)
      .over(prec)
    val pt = last(when(value.isNotNull, ts), ignoreNulls = true)
      .over(prec)
    when(value.isNull, lit(null))
      .otherwise((value - pv).cast("double") * lit(unitUs) /
        (ts - pt).cast("double"))
  }

  /** csum: running cumulative sum in ts order (builtins.c:4343). The
    * accumulation order is the frame order on both engines, so doubles
    * match bit-for-bit. */
  def csum(value: Column, ts: Column, keys: Seq[Column]): Column =
    sum(value).over(w(keys, ts).rowsBetween(Window.unboundedPreceding, 0))

  /** mavg(col, k): moving average of the last k rows; null until k rows
    * are available (builtins.c:4368). Decimal accumulation keeps the
    * sliding-frame sum order-independent. */
  def mavg(value: Column, ts: Column, keys: Seq[Column], k: Int): Column = {
    val frame = w(keys, ts).rowsBetween(-(k - 1), 0)
    when(count(value).over(frame) === k,
      round(sum(value.cast(DecimalType(18, 2))).over(frame).cast("double") /
        k, 6))
  }

  /** statecount(pred): consecutive count of rows satisfying `pred`; rows
    * failing it yield -1; NULL-input rows are SKIPPED — they emit NULL
    * and do not reset the streak (builtins.c:4256; 22-function.md
    * STATECOUNT: "adding 1 if the condition is true, resetting to -1 if
    * false, and skipping the data if it is NULL"). A NULL `pred` (NULL
    * input vs a non-NULL literal) contributes 0 to the run id, so the
    * run survives across it. */
  def statecount(pred: Column, ts: Column, keys: Seq[Column]): Column = {
    val ww = w(keys, ts)
    // only FALSE rows break a run: when(not(pred),..) sends both true
    // and null pred to the 0 branch
    val runId = sum(when(not(pred), 1L).otherwise(0L))
      .over(ww.rowsBetween(Window.unboundedPreceding, 0))
    val runW = Window.partitionBy(keys :+ runId: _*).orderBy(ts)
    val nTrue = sum(when(pred, 1L).otherwise(0L))
      .over(runW.rowsBetween(Window.unboundedPreceding, 0))
    when(pred.isNull, lit(null).cast(LongType))
      .otherwise(when(!pred, lit(-1L)).otherwise(nTrue))
  }

  /** stateduration(pred, unitTicks): elapsed time (in `unitTicks` of
    * the ts column's native precision) since the current true-run
    * began; first row of a run yields 0, non-matching rows -1,
    * NULL-input rows emit NULL without resetting the run
    * (builtins.c:4296; 22-function.md STATEDURATION — the unit
    * defaults to the database precision, i.e. 1 tick). */
  def stateduration(pred: Column, ts: Column, keys: Seq[Column],
      unitTicks: Long): Column = {
    val ww = w(keys, ts)
    val runId = sum(when(not(pred), 1L).otherwise(0L))
      .over(ww.rowsBetween(Window.unboundedPreceding, 0))
    val runW = Window.partitionBy(keys :+ runId: _*).orderBy(ts)
    val firstTrueTs = min(when(pred, ts)).over(
      runW.rowsBetween(Window.unboundedPreceding, 0))
    when(pred.isNull, lit(null).cast(LongType))
      .otherwise(when(!pred, lit(-1L))
        .otherwise(((ts - firstTrueTs) / lit(unitTicks)).cast(LongType)))
  }

  /** top/bottom(col, k): the k extreme rows per key (builtins.c:3371).
    * Ties broken by ts then value for determinism. */
  def topK(df: DataFrame, value: Column, ts: Column, keys: Seq[Column],
      k: Int, bottom: Boolean = false,
      tie: Seq[Column] = Nil): DataFrame = {
    val ord = (if (bottom) Seq(value.asc, ts.asc)
      else Seq(value.desc, ts.asc)) ++ tie.map(_.asc)
    if (keys.isEmpty) {
      // global top-k: sort-limit lowers to TakeOrdered — every
      // partition contributes its local k in parallel, no
      // single-partition window over the full table. Ranking the k
      // survivors is a constant-k window, not a scale path.
      df.orderBy(ord: _*).limit(k)
        .withColumn("_rank", row_number().over(Window.orderBy(ord: _*)))
    } else {
      val ww = Window.partitionBy(keys: _*).orderBy(ord: _*)
      df.withColumn("_rank", row_number().over(ww))
        .filter(col("_rank") <= k)
    }
  }

  /** tail(k, offset): the last k rows by ts per key, skipping `offset`
    * newest (builtins.c:4431). `tie` columns (e.g. a row id) make the
    * selection total when ts alone is not unique per key — without
    * them a µs-collision in a future data layout silently makes the
    * picked rows (and the oracle hash) nondeterministic. */
  def tail(df: DataFrame, ts: Column, keys: Seq[Column], k: Int,
      offset: Int = 0, tie: Seq[Column] = Nil): DataFrame = {
    val ord = ts.desc +: tie.map(_.desc)
    if (keys.isEmpty) {
      // keyless tail = global top-(k+offset) by ts desc (TakeOrdered,
      // parallel), then the offset filter over the k+offset survivors
      df.orderBy(ord: _*).limit(offset + k)
        .withColumn("_rank", row_number().over(Window.orderBy(ord: _*)))
        .filter(col("_rank") > offset && col("_rank") <= offset + k)
    } else {
      val ww = Window.partitionBy(keys: _*).orderBy(ord: _*)
      df.withColumn("_rank", row_number().over(ww))
        .filter(col("_rank") > offset && col("_rank") <= offset + k)
    }
  }

  /** unique(col): the first-occurrence row of each distinct value
    * (builtins.c:4471). */
  def unique(df: DataFrame, value: Column, ts: Column,
      keys: Seq[Column], tie: Seq[Column] = Nil): DataFrame = {
    val ww = Window.partitionBy(keys :+ value: _*)
      .orderBy(ts.asc +: tie.map(_.asc): _*)
    df.withColumn("_rn", row_number().over(ww))
      .filter(col("_rn") === 1).drop("_rn")
  }

  /** Deterministic uniform sample: the k rows per key with the
    * smallest md5(rowKey) — the k-minimum-values technique. Unlike the
    * reservoir [[graft.functions.Aggregators.sample]] (whose pick
    * depends on the partition layout), the KMV sample is a pure
    * function of the data: any cluster, any partitioning, any engine
    * reproduces it, so it hash-checks against the oracle. `rowKey`
    * must be unique per key for a total order (the md5 plays the role
    * of the random tag; uniformity comes from hash mixing). */
  def sampleKMV(df: DataFrame, rowKey: Column, keys: Seq[Column],
      k: Int): DataFrame = {
    val ww = Window.partitionBy(keys: _*)
      .orderBy(md5(rowKey.cast("string")), rowKey)
    df.withColumn("_rank", row_number().over(ww))
      .filter(col("_rank") <= k).drop("_rank")
  }

  /** Keyless statecount/stateduration: run-length state over the WHOLE
    * frame in ts order, no partition key — via [[GlobalScan.twoPass]],
    * not a single-partition window. The partition effect is the state
    * of the TRAILING run: `sawFalse` marks whether the partition
    * resets the run (making its effect absolute), otherwise it extends
    * the incoming run. NULL rows emit NULL and neither count nor reset
    * (22-function.md STATECOUNT/STATEDURATION skip semantics).
    *
    * `mode` "count" appends the running true-streak count;
    * "duration" appends (ts - first true ts of the run) / unitTicks.
    * The appended column is `outCol` (LongType, nullable). */
  def keylessState(df: DataFrame, pred: Column, ts: Column,
      tie: Seq[Column], mode: String, unitTicks: Long,
      outCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{BooleanType, StructField, StructType}
    val withP = df.withColumn("_kp", pred.cast(BooleanType))
    val inSchema = withP.schema
    val pIdx = inSchema.fieldIndex("_kp")
    val tsIdx = inSchema.fieldIndex(df.select(ts).schema.head.name)
    val isDur = mode == "duration"
    val outSchema = StructType(inSchema.fields :+
      StructField(outCol, LongType))
    // effect: (sawFalse, trailingTrueCount, firstTrueTsOfTrailingRun)
    type S = (Boolean, Long, Option[Long])
    val zero: S = (false, 0L, None)
    def stepS(s: S, isNull: Boolean, p: Boolean, t: Long): S =
      if (isNull) s
      else if (!p) (true, 0L, None)
      else (s._1, s._2 + 1, s._3.orElse(Some(t)))
    def summary(it: Iterator[Row]): S = {
      var s = zero
      it.foreach { r =>
        val isNull = r.isNullAt(pIdx)
        s = stepS(s, isNull, !isNull && r.getBoolean(pIdx),
          if (r.isNullAt(tsIdx)) 0L else r.getLong(tsIdx))
      }
      s
    }
    def combine(a: S, b: S): S =
      if (b._1) b
      else (a._1, a._2 + b._2, a._3.orElse(b._3))
    def emit(prefix: S, it: Iterator[Row]): Iterator[Row] = {
      var count = prefix._2
      var firstTs = prefix._3
      it.map { r =>
        val isNull = r.isNullAt(pIdx)
        val out: Any =
          if (isNull) null
          else if (!r.getBoolean(pIdx)) {
            count = 0L; firstTs = None; java.lang.Long.valueOf(-1L)
          } else {
            val t = r.getLong(tsIdx)
            count += 1
            if (firstTs.isEmpty) firstTs = Some(t)
            java.lang.Long.valueOf(
              if (isDur) (t - firstTs.get) / unitTicks else count)
          }
        Row.fromSeq(r.toSeq :+ out)
      }
    }
    GlobalScan.twoPass[S](withP, ts +: tie, zero, summary, combine,
        emit, outSchema)
      .drop("_kp")
  }

  /** Keyless per-row series functions (diff / csum / mavg /
    * fill_forward with NO partition key): the whole frame is one
    * series, so a total ts order is inherent — but an unpartitioned
    * `Window.orderBy` would collapse to a single partition. Lowered to
    * [[GlobalScan.twoPass]] instead: one range-partitioned sort, a
    * per-partition effect record, and a parallel seeded replay — the
    * reference's single merged-vnode stream semantics at cluster
    * parallelism (projectoperator.c:676 IndefRowsFunc, keyless form).
    *
    * `specs`: (fn, argColumn, k, outName) — k is the window length for
    * mavg, the row offset for lag/lead, the unit tick count for
    * derivative. All functions share ONE two-pass scan ("lead" runs as
    * lag over the REVERSED order — pass `descending = true` with lag
    * specs only). Arithmetic matches the keyed SQL lowering
    * bit-for-bit: csum/mavg accumulate in DECIMAL(18,2) (HALF_UP cast)
    * and emit DOUBLE; mavg rounds to 6 via the same HALF_UP-on-decimal
    * rule Spark's round() applies. */
  def keylessSeries(df: DataFrame, ts: Column, tie: Seq[Column],
      specs: Seq[(String, Column, Long, String)],
      descending: Boolean = false,
      dropFirst: Boolean = false,
      dropNullRows: Boolean = false): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val argNames = specs.indices.map(i => s"_karg$i")
    var withArgs = df
    specs.zip(argNames).foreach { case ((_, c, _, _), n) =>
      withArgs = withArgs.withColumn(n, c.cast("double")) }
    val inSchema = withArgs.schema
    val argIdx = argNames.map(inSchema.fieldIndex).toArray
    val tsIdx = inSchema.fieldIndex(df.select(ts).schema.head.name)
    val fns = specs.map(_._1).toArray
    val ks = specs.map(_._3).toArray
    val outSchema = StructType(inSchema.fields ++
      specs.map(s => StructField(s._4, DoubleType)))
    def dec(v: Double) = new JBD(v).setScale(2, RoundingMode.HALF_UP)
    // per-spec partition effect:
    //   diff / derivative -> Option[(v, isNull, ts)] of the LAST row
    //   csum -> Option[JBD] partition sum of non-null values
    //   mavg / lag -> Vector[Option[JBD]] of the last <= k rows
    //   fill_forward -> Option[Double] last non-null
    // state slots 0..n-1 = per-spec effects; slot n = row count (for
    // the silent physical-first row under dropFirst)
    type S = Array[Any]
    def zero: S = (fns.map {
      case "mavg" | "lag" => Vector.empty[Option[JBD]]
      case _ => None
    } :+ (0L: Any)).toArray[Any]
    // a join-derived frame can carry NULL ts rows (left-join misses)
    def tsOf(r: Row): Long =
      if (r.isNullAt(tsIdx)) 0L else r.getLong(tsIdx)
    def step(s: S, r: Row): Unit = {
      s(fns.length) = s(fns.length).asInstanceOf[Long] + 1L
      fns.indices.foreach { i =>
      val isNull = r.isNullAt(argIdx(i))
      val v = if (isNull) 0.0 else r.getDouble(argIdx(i))
      fns(i) match {
        case "diff" | "derivative" =>
          // NULL input keeps the previous value (diff:
          // setDoDiffResult returns before doHandleDiff on null
          // data; derivative: derivativeFunction `continue`s)
          if (!isNull) s(i) = Some((v, false, tsOf(r)))
        case "csum" => if (!isNull)
          s(i) = Some(s(i).asInstanceOf[Option[JBD]]
            .map(_.add(dec(v))).getOrElse(dec(v)))
        case "mavg" =>
          s(i) = (s(i).asInstanceOf[Vector[Option[JBD]]] :+
            (if (isNull) None else Some(dec(v)))).takeRight(ks(i).toInt)
        case "lag" => // raw values — lag never re-rounds its input
          s(i) = (s(i).asInstanceOf[Vector[Option[JBD]]] :+
            (if (isNull) None else Some(JBD.valueOf(v))))
            .takeRight(ks(i).toInt)
        case _ => if (!isNull) s(i) = Some(v)
      }
      }
    }
    def summary(it: Iterator[Row]): S = {
      val s = zero; it.foreach(r => step(s, r)); s
    }
    def combine(a: S, b: S): S = (fns.indices.map { i =>
      fns(i) match {
        case "diff" | "derivative" =>
          b(i).asInstanceOf[Option[(Double, Boolean, Long)]]
            .orElse(a(i).asInstanceOf[Option[(Double, Boolean, Long)]])
        case "csum" =>
          (a(i).asInstanceOf[Option[JBD]],
            b(i).asInstanceOf[Option[JBD]]) match {
            case (Some(p), Some(q)) => Some(p.add(q))
            case (p, q) => q.orElse(p)
          }
        case "mavg" | "lag" =>
          (a(i).asInstanceOf[Vector[Option[JBD]]] ++
            b(i).asInstanceOf[Vector[Option[JBD]]]).takeRight(ks(i).toInt)
        case _ => b(i).asInstanceOf[Option[Double]]
          .orElse(a(i).asInstanceOf[Option[Double]])
      }
    } :+ ((a(fns.length).asInstanceOf[Long] +
      b(fns.length).asInstanceOf[Long]): Any)).toArray[Any]
    def emit(prefix: S, it: Iterator[Row]): Iterator[Row] = {
      val s: S = prefix.clone()
      var rowIdx = prefix(fns.length).asInstanceOf[Long]
      it.flatMap { r =>
        val isFirst = rowIdx == 0L
        rowIdx += 1
        val outs = fns.indices.map { i =>
          val isNull = r.isNullAt(argIdx(i))
          val v = if (isNull) 0.0 else r.getDouble(argIdx(i))
          fns(i) match {
            case "diff" =>
              // delta vs the last NON-NULL value; ignore-negative
              // (bit 0 of k) nulls negative deltas in place
              val out = s(i)
                .asInstanceOf[Option[(Double, Boolean, Long)]] match {
                case Some((pv, _, _)) if !isNull =>
                  val d = v - pv
                  if ((ks(i) & 1L) != 0L && d < 0) null
                  else java.lang.Double.valueOf(d)
                case _ => null
              }
              if (!isNull) s(i) = Some((v, false, tsOf(r)))
              out
            case "derivative" =>
              val t = tsOf(r)
              val out = s(i)
                .asInstanceOf[Option[(Double, Boolean, Long)]] match {
                case Some((pv, _, pt)) if !isNull && t != pt =>
                  java.lang.Double.valueOf((v - pv) * ks(i) / (t - pt))
                case _ => null
              }
              if (!isNull) s(i) = Some((v, false, t))
              out
            case "csum" =>
              if (!isNull) s(i) = Some(s(i).asInstanceOf[Option[JBD]]
                .map(_.add(dec(v))).getOrElse(dec(v)))
              s(i).asInstanceOf[Option[JBD]]
                .map(d => java.lang.Double.valueOf(d.doubleValue)).orNull
            case "mavg" =>
              val q = (s(i).asInstanceOf[Vector[Option[JBD]]] :+
                (if (isNull) None else Some(dec(v)))).takeRight(ks(i).toInt)
              s(i) = q
              if (q.length == ks(i) && q.forall(_.isDefined)) {
                val sum = q.flatten.reduce(_.add(_))
                java.lang.Double.valueOf(JBD
                  .valueOf(sum.doubleValue / ks(i))
                  .setScale(6, RoundingMode.HALF_UP).doubleValue)
              } else null
            case "lag" =>
              // value k ROWS back (22-function.md LAG): the queue holds
              // the previous <= k rows' values; full queue => its head
              // is the k-back row. NULL rows participate positionally.
              val q0 = s(i).asInstanceOf[Vector[Option[JBD]]]
              val out = if (q0.length == ks(i))
                q0.head.map(d =>
                  java.lang.Double.valueOf(d.doubleValue)).orNull
              else null
              s(i) = (q0 :+ (if (isNull) None else Some(JBD.valueOf(v))))
                .takeRight(ks(i).toInt)
              out
            case _ =>
              if (!isNull) s(i) = Some(v)
              s(i).asInstanceOf[Option[Double]]
                .map(java.lang.Double.valueOf(_)).orNull
          }
        }
        // diff's physical-first row is silent (doHandleDiff
        // trySetPreVal path — checkRows(rows-1)); ignore-null (bit 1)
        // drops rows whose diff RESULT is null (diffResultIsNull in the
        // reference): null-input rows, the first NON-NULL row, and —
        // under option 3 — bit-0-nulled negative deltas. Testing the
        // computed outputs (not input nullness) captures all three.
        if ((dropFirst && isFirst) ||
            (dropNullRows && fns.indices.forall(i =>
              outs(i) == null))) None
        else Some(Row.fromSeq(r.toSeq ++ outs))
      }
    }
    val ord = if (descending) (ts +: tie).map(_.desc) else ts +: tie
    GlobalScan.twoPass[S](withArgs, ord, zero, summary, combine,
        emit, outSchema)
      .drop(argNames: _*)
  }
}
