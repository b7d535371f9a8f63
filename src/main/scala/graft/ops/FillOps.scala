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

  /** Densifies an interval-aggregated frame to one row per `intervalUs`
    * step in [rangeStartUs, rangeEndUs] per key combination, then fills
    * `valueCol` according to `mode`. Adds `_isfilled`.
    *
    * `agg` must have one row per (keys, wstartCol). Window starts are
    * aligned to the same grid as the spine.
    */
  def fillInterval(agg: DataFrame, wstartCol: String, valueCol: String,
      keys: Seq[String], intervalUs: Long, rangeStartUs: Long,
      rangeEndUs: Long, mode: FillMode): DataFrame = {
    val gridStart = rangeStartUs - Math.floorMod(rangeStartUs, intervalUs)
    val keyDf =
      if (keys.isEmpty) agg.sparkSession.range(1).select(lit(1).as("_one"))
      else agg.select(keys.map(col): _*).distinct()
    val spine = keyDf
      .withColumn(wstartCol,
        explode(sequence(lit(gridStart), lit(rangeEndUs), lit(intervalUs))))
      .drop("_one")
    val marked = agg.withColumn("_present", lit(true))
    val joined = spine.join(marked, keys :+ wstartCol, "left")
      .withColumn("_isfilled", coalesce(col("_present"), lit(false)) === false)
      .drop("_present")
    val w =
      if (keys.isEmpty) Window.orderBy(col(wstartCol))
      else Window.partitionBy(keys.map(col): _*).orderBy(col(wstartCol))
    val v = col(valueCol)
    val filled = mode match {
      case FillNone => joined.filter(!col("_isfilled"))
      case FillNull => joined
      case FillValue(x) =>
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
    filled
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
      mode: FillMode): DataFrame = {
    val keyCols = keys.map(col)
    val data = df.select(keyCols :+ tsUs.cast(LongType).as("_t") :+
      col(valueCol).cast("double").as("_v"): _*)
      .withColumn("_isgrid", lit(false))
    val keyDf =
      if (keys.isEmpty) df.sparkSession.range(1).select(lit(1).as("_one"))
      else df.select(keyCols: _*).distinct()
    val grid = keyDf
      .withColumn("_t", explode(sequence(lit(t0Us), lit(t1Us), lit(stepUs))))
      .drop("_one")
      .withColumn("_v", lit(null).cast("double"))
      .withColumn("_isgrid", lit(true))
    val all = data.unionByName(grid)
    // Data row sorts before a grid marker at the same ts so an exact hit
    // is visible as "prev" (reference: interp at an existing ts returns
    // that row, _isfilled=false).
    val w =
      (if (keys.isEmpty) Window.orderBy(col("_t"), col("_isgrid"))
       else Window.partitionBy(keyCols: _*).orderBy(col("_t"), col("_isgrid")))
    // null-valued data points must not block the carrier (same guard as
    // fillInterval's lastNonNull): only non-null samples ride forward
    val dataPair = when(!col("_isgrid") && col("_v").isNotNull,
      struct(col("_t"), col("_v")))
    val prev = last(dataPair, ignoreNulls = true)
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val next = first(dataPair, ignoreNulls = true)
      .over(w.rowsBetween(1, Window.unboundedFollowing))
    val marked = all
      .withColumn("_prev", prev)
      .withColumn("_next", next)
      .filter(col("_isgrid"))
      .withColumn("_exacthit",
        col("_prev").isNotNull && col("_prev").getField("_t") === col("_t"))
    val pv = col("_prev").getField("_v")
    val pt = col("_prev").getField("_t")
    val nv = col("_next").getField("_v")
    val nt = col("_next").getField("_t")
    val interpolated = mode match {
      case FillPrev => pv
      case FillNext => when(col("_exacthit"), pv).otherwise(nv)
      case FillNear =>
        when(col("_exacthit"), pv)
          .when(col("_next").isNull, pv)
          .when(col("_prev").isNull, nv)
          .when(col("_t") - pt <= nt - col("_t"), pv)
          .otherwise(nv)
      case FillLinear =>
        when(col("_exacthit"), pv)
          .otherwise(pv + (nv - pv) * (col("_t") - pt).cast("double") /
            (nt - pt).cast("double"))
      case FillValue(x) => when(col("_exacthit"), pv).otherwise(lit(x))
      case _ => when(col("_exacthit"), pv)
    }
    val filled = marked
      .withColumn(valueCol, interpolated)
      .withColumn("_isfilled", !col("_exacthit"))
    // FILL(NONE): only exact hits survive (fillInterval does the same)
    val bounded =
      if (mode == FillNone) filled.filter(col("_exacthit")) else filled
    bounded.select(keyCols :+ col("_t").as("_irowts") :+ col(valueCol) :+
      col("_isfilled"): _*)
  }
}
