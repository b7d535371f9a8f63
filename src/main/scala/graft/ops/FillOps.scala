package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** FILL(...) gap-filling over interval-aggregated results and
  * INTERP point-in-time resampling (SURVEY.md §2.5; filloperator.c,
  * tfill.c, timesliceoperator.c).
  *
  * The dense timestamp spine is generated distributively: one
  * `sequence()` per key group (exploded), never a driver-side loop. The
  * spine size is (range / interval) per key — the caller controls range,
  * matching the reference where FILL only applies inside the query's
  * WHERE ts range. Fill modes lower to ignore-null window functions over
  * the spine-joined frame; everything stays in integer µs / exact input
  * values, so results are deterministic.
  */
object FillOps {

  sealed trait FillMode
  case object FillNone extends FillMode
  case object FillNull extends FillMode
  case class FillValue(v: Double) extends FillMode
  case object FillPrev extends FillMode
  case object FillNext extends FillMode
  case object FillNear extends FillMode
  case object FillLinear extends FillMode
  /** Forced variants (sql.y:2961-2968, querynodes.h:717-727). Same fill
    * values as NULL/VALUE; the batch-query difference (filloperator.c:220)
    * is that with ZERO input rows the non-forced modes emit nothing while
    * the forced modes still fill the whole requested range. */
  case object FillNullF extends FillMode
  case class FillValueF(v: Double) extends FillMode

  private def isForced(mode: FillMode): Boolean = mode match {
    case FillNullF | FillValueF(_) => true
    case _ => false
  }

  /** Densifies an interval-aggregated frame to one row per `intervalUs`
    * step in [rangeStartUs, rangeEndUs] per key combination, then fills
    * `valueCol` according to `mode`. Adds `_isfilled`.
    *
    * `agg` must have one row per (keys, wstartCol). Window starts are
    * aligned to the same grid as the spine; `offsetUs` shifts that grid
    * exactly like INTERVAL(iv, offset) shifts `_wstart`
    * (TimeOps.tumblingStart), so offset windows join the spine 1:1.
    */
  def fillInterval(agg: DataFrame, wstartCol: String, valueCol: String,
      keys: Seq[String], intervalUs: Long, rangeStartUs: Long,
      rangeEndUs: Long, mode: FillMode, offsetUs: Long = 0L): DataFrame =
    fillIntervalMulti(agg, wstartCol, Seq(valueCol -> mode), keys,
      intervalUs, rangeStartUs, rangeEndUs, offsetUs)

  /** Multi-column form: FILL applies to EVERY aggregate output column
    * (tfill.c fills each result column; FILL(VALUE, v1, v2, …) carries
    * one literal per column). One spine join serves all columns;
    * per-column fill transforms chain on the joined frame. */
  def fillIntervalMulti(agg: DataFrame, wstartCol: String,
      valueCols: Seq[(String, FillMode)], keys: Seq[String],
      intervalUs: Long, rangeStartUs: Long, rangeEndUs: Long,
      offsetUs: Long = 0L,
      gridStarts: Option[Seq[Long]] = None): DataFrame = {
    require(valueCols.nonEmpty, "fill needs at least one value column")
    val anyForced = valueCols.exists(vc => isForced(vc._2))
    val keyDf =
      if (keys.nonEmpty) agg.select(keys.map(col): _*).distinct()
      else if (anyForced)
        // forced fill emits the spine even over empty input
        agg.sparkSession.range(1).select(lit(1).as("_one"))
      else agg.limit(1).select(lit(1).as("_one"))
    // calendar grids (INTERVAL 1n/1q/1y) have no fixed tick step — the
    // caller precomputes the window starts (month boundaries are
    // query-ranged and few, so a literal array broadcast beats a join)
    val spineCol = gridStarts match {
      case Some(gs) => explode(lit(gs.toArray))
      case None =>
        val gridStart = rangeStartUs -
          Math.floorMod(rangeStartUs - offsetUs, intervalUs)
        explode(sequence(lit(gridStart), lit(rangeEndUs),
          lit(intervalUs)))
    }
    val spine = keyDf
      .withColumn(wstartCol, spineCol)
      .drop("_one")
    val marked = agg.withColumn("_present", lit(true))
    val joined = spine.join(marked, keys :+ wstartCol, "left")
      .withColumn("_isfilled", coalesce(col("_present"), lit(false)) === false)
      .drop("_present")
    // scale note: the frame here is the spine-joined AGGREGATE — one
    // row per grid step, cardinality = range/interval (query-chosen),
    // not data-sized — so the keyless global window is bounded by the
    // user's grid, unlike raw-row scans (those use GlobalScan.twoPass).
    val w =
      if (keys.isEmpty) Window.orderBy(col(wstartCol))
      else Window.partitionBy(keys.map(col): _*).orderBy(col(wstartCol))
    val filled = valueCols.foldLeft(joined) { case (d, (vc, mode)) =>
      applyFill(d, wstartCol, vc, mode, w)
    }
    // FILL(NONE) on any column means "emit only real windows"
    if (valueCols.exists(_._2 == FillNone))
      filled.filter(!col("_isfilled"))
    else filled
  }

  /** One column's fill transform over the spine-joined frame. */
  private def applyFill(joined: DataFrame, wstartCol: String,
      valueCol: String, mode: FillMode,
      w: org.apache.spark.sql.expressions.WindowSpec): DataFrame = {
    val v = col(valueCol)
    mode match {
      case FillNone => joined // row filtering happens once, in the caller
      case FillNull | FillNullF => joined
      case FillValue(x) =>
        joined.withColumn(valueCol, coalesce(v, lit(x)))
      case FillValueF(x) =>
        joined.withColumn(valueCol, coalesce(v, lit(x)))
      case FillPrev =>
        joined.withColumn(valueCol,
          last(v, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      case FillNext =>
        joined.withColumn(valueCol,
          first(v, ignoreNulls = true)
            .over(w.rowsBetween(0, Window.unboundedFollowing)))
      case FillNear =>
        val pv = lastNonNull(struct(col(wstartCol).as("_t"), v.as("_v")), v, w, before = true)
        val nv = lastNonNull(struct(col(wstartCol).as("_t"), v.as("_v")), v, w, before = false)
        // nearer of prev/next by window distance; tie prefers prev
        // (tfill.c NEAR semantics).
        joined.withColumn(valueCol,
          when(v.isNotNull, v)
            .otherwise(
              when(nv.isNull, pv.getField("_v"))
                .when(pv.isNull, nv.getField("_v"))
                .when(col(wstartCol) - pv.getField("_t") <=
                      nv.getField("_t") - col(wstartCol),
                  pv.getField("_v"))
                .otherwise(nv.getField("_v"))))
      case FillLinear =>
        val pv = lastNonNull(struct(col(wstartCol).as("_t"), v.as("_v")), v, w, before = true)
        val nv = lastNonNull(struct(col(wstartCol).as("_t"), v.as("_v")), v, w, before = false)
        joined.withColumn(valueCol,
          when(v.isNotNull, v)
            .otherwise(
              pv.getField("_v") +
                (nv.getField("_v") - pv.getField("_v")) *
                  (col(wstartCol) - pv.getField("_t")).cast("double") /
                  (nv.getField("_t") - pv.getField("_t")).cast("double")))
    }
  }

  /** Last (or first-following) non-null (ts,value) struct — the carrier
    * for PREV/NEXT/NEAR/LINEAR fills. */
  private def lastNonNull(pair: Column, guard: Column,
      w: org.apache.spark.sql.expressions.WindowSpec,
      before: Boolean): Column = {
    val payload = when(guard.isNotNull, pair)
    if (before)
      last(payload, ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
    else
      first(payload, ignoreNulls = true)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
  }

  /** Keyless prev/next sample carry for [[interp]], distributed via
    * [[GlobalScan.twoPass]]: ascending scan carries the last data ROW
    * (null values included — doKeepRows keeps every row) into
    * `outCol`; the descending variant walks the exact reverse order,
    * yielding the next-row carry. Grid markers never update the
    * carry; each row reads the carry before contributing, which
    * reproduces the exclusive window bounds of the keyed path. */
  private def keylessCarry(frame: DataFrame, vNames: Seq[String],
      ascending: Boolean, outCol: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val schema = frame.schema
    val tIdx = schema.fieldIndex("_t")
    val vIdxs = vNames.map(schema.fieldIndex).toArray
    val gIdx = schema.fieldIndex("_isgrid")
    val pairType = StructType(StructField("_t", LongType) +:
      vNames.map(vn => StructField(vn, DoubleType)))
    val outSchema =
      StructType(schema.fields :+ StructField(outCol, pairType))
    val sortCols =
      if (ascending) Seq(col("_t"), col("_isgrid"))
      else Seq(col("_t").desc, col("_isgrid").desc)
    def rowVals(r: Row): Seq[Any] = vIdxs.toSeq.map(i =>
      if (r.isNullAt(i)) null else r.getDouble(i))
    GlobalScan.twoPass[Option[(Long, Seq[Any])]](frame, sortCols,
      zero = None,
      summary = { it =>
        var lastP: Option[(Long, Seq[Any])] = None
        it.foreach { r =>
          if (!r.getBoolean(gIdx))
            lastP = Some((r.getLong(tIdx), rowVals(r)))
        }
        lastP
      },
      combine = GlobalScan.lastSeen,
      emit = { (c0, it) =>
        var carry = c0
        it.map { r =>
          val out = Row.fromSeq(r.toSeq :+
            carry.map(p => Row.fromSeq(p._1 +: p._2)).orNull)
          if (!r.getBoolean(gIdx))
            carry = Some((r.getLong(tIdx), rowVals(r)))
          out
        }
      },
      outSchema)
  }

  /** INTERP (timesliceoperator.c): resample raw (ts, value) points onto an
    * EVERY(`stepUs`) grid over RANGE(`t0`,`t1`), per key. Emits
    * `_irowts` (µs), `value`, `_isfilled`.
    *
    * Lowered with the union trick (no range join): grid markers and data
    * rows are unioned, one sort-shuffle orders them, and ignore-null
    * window functions carry the surrounding data points onto each marker.
    */
  def interp(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], stepUs: Long, t0Us: Long, t1Us: Long,
      mode: FillMode, surroundUs: Long = 0L,
      surroundVal: Option[Double] = None): DataFrame =
    interpMulti(df, tsUs, Seq((valueCol, mode, surroundVal)), keys,
      stepUs, t0Us, t1Us, surroundUs)

  /** Multi-column INTERP in ONE union+carry pipeline: the prev/next
    * carry is ROW-level (doKeepRows keeps every data row, null values
    * included), so a single pair of window carries serves EVERY interp
    * column — the per-column form built one complete scan+grid+union+
    * window pipeline per column and equi-joined the grids back
    * together, doubling every operator per extra column (measured 2x
    * wall-clock for 2 columns). `cols` is (valueColumn, fill mode,
    * surround/positional fallback value) per select item; `_isfilled`,
    * `_irowts_origin` and the row-keep rule follow the FIRST column's
    * mode exactly as the join form did (each extra column contributed
    * only its value; the inner join intersected the per-column keeps,
    * reproduced here as the conjunction of keep predicates). */
  def interpMulti(df: DataFrame, tsUs: Column,
      cols: Seq[(String, FillMode, Option[Double])], keys: Seq[String],
      stepUs: Long, t0Us: Long, t1Us: Long,
      surroundUs: Long = 0L): DataFrame = {
    require(cols.nonEmpty, "interpMulti needs at least one column")
    val keyCols = keys.map(col)
    val vNames = cols.indices.map(i => s"_v$i")
    val data = df.select(keyCols ++
        Seq(tsUs.cast(LongType).as("_t")) ++
        cols.zip(vNames).map { case ((vc, _, _), vn) =>
          col(vc).cast("double").as(vn) }: _*)
      .withColumn("_isgrid", lit(false))
    val keyDf =
      if (keys.isEmpty) df.sparkSession.range(1).select(lit(1).as("_one"))
      else df.select(keyCols: _*).distinct()
    var grid = keyDf
      .withColumn("_t", explode(sequence(lit(t0Us), lit(t1Us), lit(stepUs))))
      .drop("_one")
    vNames.foreach { vn =>
      grid = grid.withColumn(vn, lit(null).cast("double")) }
    grid = grid.withColumn("_isgrid", lit(true))
    val all = data.unionByName(grid)
    // Data row sorts before a grid marker at the same ts so an exact hit
    // is visible as "prev" (reference: interp at an existing ts returns
    // that row, _isfilled=false).
    val carried =
      if (keys.isEmpty)
        // keyless: the frame is DATA-sized, so a global Window.orderBy
        // would single-partition it — carry prev (ascending scan) and
        // next (exact reverse scan) via GlobalScan instead
        keylessCarry(keylessCarry(all, vNames, ascending = true, "_prev"),
          vNames, ascending = false, "_next")
      else {
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(col("_t"), col("_isgrid"))
        // carry EVERY data row, null values included: interp's row
        // keeper (timesliceoperator.c:73-96 doKeepRows) tracks the
        // adjacent ROW and fills that row's — possibly NULL — values;
        // it never reaches back to an older non-null sample (unlike
        // the windowed-FILL path, which follows tfill.c). ONE carry
        // pair serves every interp column.
        val dataPair = when(!col("_isgrid"),
          struct(col("_t") +: vNames.map(col): _*))
        all
          .withColumn("_prev", last(dataPair, ignoreNulls = true)
            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("_next", first(dataPair, ignoreNulls = true)
            .over(w.rowsBetween(1, Window.unboundedFollowing)))
      }
    val marked = carried
      .filter(col("_isgrid"))
      .withColumn("_exacthit",
        col("_prev").isNotNull && col("_prev").getField("_t") === col("_t"))
    val pt = col("_prev").getField("_t")
    val nt = col("_next").getField("_t")
    var filled = marked
    var origin0: Column = null
    var keep0: Column = null
    cols.zipWithIndex.foreach { case ((valueCol, mode, surroundVal), i) =>
      val pv = col("_prev").getField(vNames(i))
      val nv = col("_next").getField(vNames(i))
      // Positional modes carry a fill-reference ROW; its ts surfaces as
      // `_irowts_origin` (builtins.c:6788, timesliceoperator.c:457) and
      // SURROUND(d[,v]) rejects a reference farther than d from the grid
      // point, substituting v/NULL (timesliceoperator.c:315-327).
      val refRow: Option[Column] = mode match {
        case FillPrev => Some(col("_prev"))
        case FillNext =>
          Some(when(col("_exacthit"), col("_prev")).otherwise(col("_next")))
        case FillNear =>
          Some(when(col("_exacthit"), col("_prev"))
            .when(col("_next").isNull, col("_prev"))
            .when(col("_prev").isNull, col("_next"))
            .when(col("_t") - pt <= nt - col("_t"), col("_prev"))
            .otherwise(col("_next")))
        case _ => None
      }
      val surroundFallback =
        surroundVal.map(x => lit(x)).getOrElse(lit(null)).cast("double")
      val (interpolated, origin) = refRow match {
        case Some(ref) =>
          val refT = ref.getField("_t")
          val refV = ref.getField(vNames(i))
          val inRange =
            if (surroundUs <= 0L) lit(true)
            else abs(col("_t") - refT) <= lit(surroundUs)
          (when(ref.isNull, lit(null).cast("double"))
             .when(inRange, refV).otherwise(surroundFallback),
           when(ref.isNull || !inRange, lit(null).cast(LongType))
             .otherwise(refT))
        case None =>
          val value = mode match {
            case FillLinear =>
              when(col("_exacthit"), pv)
                .otherwise(pv + (nv - pv) * (col("_t") - pt).cast("double") /
                  (nt - pt).cast("double"))
            case FillValue(x) => when(col("_exacthit"), pv).otherwise(lit(x))
            case FillValueF(x) => when(col("_exacthit"), pv).otherwise(lit(x))
            case _ => when(col("_exacthit"), pv) // NONE / NULL / NULL_F
          }
          // non-positional fills have no reference row except an exact hit
          (value,
            when(col("_exacthit"), pt).otherwise(lit(null).cast(LongType)))
      }
      filled = filled.withColumn(valueCol, interpolated)
      // grid points with no reference basis AT ALL are dropped, not
      // NULL-filled (timesliceoperator.c:468-470 hasInterp=false for the
      // positional modes, :552-555 for LINEAR outside the data span); a
      // too-far reference inside a SURROUND bound still emits (fallback).
      // FILL(NONE): only exact hits survive (fillInterval does the same).
      val keep: Column = mode match {
        case FillPrev => col("_prev").isNotNull
        case FillNext => col("_exacthit") || col("_next").isNotNull
        case FillNear => col("_prev").isNotNull || col("_next").isNotNull
        case FillLinear => col("_exacthit") ||
          (col("_prev").isNotNull && col("_next").isNotNull)
        case FillNone => col("_exacthit")
        case _ => lit(true)
      }
      if (i == 0) { origin0 = origin; keep0 = keep }
      else keep0 = keep0 && keep // the old equi-join intersected keeps
    }
    filled = filled
      .withColumn("_irowts_origin", origin0)
      .withColumn("_isfilled", !col("_exacthit"))
    filled.filter(keep0)
      .select(keyCols ++ Seq(col("_t").as("_irowts")) ++
        cols.map(c => col(c._1)) ++
        Seq(col("_irowts_origin"), col("_isfilled")): _*)
  }
}
