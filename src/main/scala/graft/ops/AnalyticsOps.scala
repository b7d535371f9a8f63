package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** TDgpt-equivalent analytics (SURVEY §2.10: forecast / imputation /
  * anomalycheck — forecastoperator.c:1115, imputationoperator.c:105,
  * anomalywindowoperator.c:138). The reference delegates these to an
  * external ML "anode" service over HTTP; here each is a deterministic
  * in-engine model on the same operator surface (pseudo-columns
  * `_frowts/_flow/_fhigh`, `_impmark`, anomaly windows included), so
  * results are reproducible and oracle-checkable. A learned model would
  * slot in behind the same DataFrame contracts (mapPartitions → model
  * service), exactly as the reference's anode does.
  *
  * Numeric discipline: every aggregate folds in exact DECIMAL/Long
  * arithmetic; doubles appear only in the final closed-form expressions,
  * written in one canonical operation order so any engine reproduces
  * them bit-for-bit.
  */
object AnalyticsOps {

  /** FORECAST(col, algo=holtwinters): Holt's linear-trend double
    * exponential smoothing (the reference's TDgpt ships holtwinters as
    * a named algo next to the default linear —
    * tools/tdgpt/taosanalytics/algo/fc/holtwinters.py). Deterministic
    * fixed-smoothing form: level l and trend b fold left over each
    * series in ts order, `l₁=α·y + (1−α)·(l+b)`, `b₁=β·(l₁−l) +
    * (1−β)·b`, seeded l=y₀, b=0; forecast h steps out is `l + h·b`.
    *
    * Scale shape: repartition by key + sortWithinPartitions, then a
    * per-key O(1) state machine streams each partition once — no
    * collect_list, no per-key buffering, output is horizon rows per
    * key. The fold is inherently sequential per series, matching the
    * reference's per-series model fit on the anode. Null samples are
    * skipped (the reference's fc preprocessing drops them). */
  def forecastHolt(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long, t0Us: Long,
      alpha: Double = 0.5, beta: Double = 0.3,
      tieBreak: Seq[String] = Nil): DataFrame = {
    require(keys.nonEmpty, "forecastHolt needs at least one series key")
    val spark = df.sparkSession
    val d = df.select(keys.map(col) ++ Seq(tsUs.cast(LongType).as("_t"),
      col(valueCol).cast("double").as("_y")) ++ tieBreak.map(col): _*)
    val sorted = d.repartition(keys.map(col): _*)
      .sortWithinPartitions(
        keys.map(col) ++ (col("_t") +: tieBreak.map(col)): _*)
    val kN = keys.length
    val outSchema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields.take(kN) ++ Seq(
        org.apache.spark.sql.types.StructField("_frowts", LongType),
        org.apache.spark.sql.types.StructField("forecast",
          org.apache.spark.sql.types.DoubleType)))
    val rdd = sorted.rdd.mapPartitions { it =>
      new Iterator[org.apache.spark.sql.Row] {
        private var cur: Seq[Any] = null
        private var l = 0.0; private var b = 0.0; private var started = false
        private val out =
          scala.collection.mutable.Queue[org.apache.spark.sql.Row]()
        private def close(): Unit = if (started) {
          var h = 1
          while (h <= horizon) {
            // Seq[Any], not Seq(...): Scala's lub would numerically
            // widen the Long timestamp to Double next to `l + h * b`
            out += org.apache.spark.sql.Row.fromSeq(
              cur ++ Seq[Any](t0Us + (h - 1).toLong * stepUs, l + h * b))
            h += 1
          }
        }
        private def fill(): Unit = {
          while (out.isEmpty && it.hasNext) {
            val r = it.next()
            val k = r.toSeq.take(kN)
            if (cur == null || k != cur) {
              close(); cur = k; started = false
            }
            if (!r.isNullAt(kN + 1)) {
              val y = r.getDouble(kN + 1)
              if (!started) { l = y; b = 0.0; started = true }
              else {
                val l1 = alpha * y + (1 - alpha) * (l + b)
                b = beta * (l1 - l) + (1 - beta) * b
                l = l1
              }
            }
          }
          if (out.isEmpty && cur != null) { close(); cur = null }
        }
        def hasNext: Boolean = { fill(); out.nonEmpty }
        def next(): org.apache.spark.sql.Row = { fill(); out.dequeue() }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** FORECAST(col, algo=arima): AR(1)-with-mean — the deterministic
    * heart of the reference's arima algo
    * (tools/tdgpt/taosanalytics/algo/fc/arima.py fits (p,d,q); the
    * fixed (1,0,0) form keeps results closed-form and oracle-exact).
    * Per key: mean μ from exact sums, lag-1 coefficient
    * `φ = Σ(yₜ−μ)(yₜ₋₁−μ) / Σ(yₜ₋₁−μ)²` expanded into exact decimal
    * sufficient statistics (one lag window + one hash aggregate — two
    * shuffles total, one row per key out), forecast `μ + φʰ·(y_T − μ)`
    * with φʰ built by repeated multiplication, NOT libm pow — pow is
    * not correctly-rounded, so JVM and DuckDB could differ in the last
    * ulp. */
  def forecastAr1(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long,
      t0Us: Long): DataFrame = {
    require(keys.nonEmpty, "forecastAr1 needs at least one series key")
    val d = df
      .withColumn("_t", tsUs.cast(LongType))
      .withColumn("_yd", col(valueCol).cast(DecimalType(18, 2)))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("_t"))
    val p = d.withColumn("_pv", lag(col("_yd"), 1).over(w))
    val stats = p.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      sum(col("_yd")).cast("double").as("_sy"),
      max_by(col("_yd"), col("_t")).cast("double").as("_last"),
      sum(when(col("_pv").isNotNull, col("_yd"))).cast("double").as("_sa"),
      sum(col("_pv")).cast("double").as("_sb"),
      sum(col("_pv") * col("_pv")).cast("double").as("_sbb"),
      sum(col("_yd") * col("_pv")).cast("double").as("_sab"),
      count(col("_pv")).as("_m"))
    // canonical operation order, mirrored verbatim in the oracle SQL
    val mu = col("_sy") / col("_n")
    val num = col("_sab") - mu * col("_sa") - mu * col("_sb") +
      col("_m") * mu * mu
    val den = col("_sbb") - mu * col("_sb") - mu * col("_sb") +
      col("_m") * mu * mu
    val withPhi = stats
      .withColumn("_mu", mu)
      .withColumn("_phi", when(den === 0.0, 0.0).otherwise(num / den))
    // one generator per key row instead of an h-way union of
    // projections; φʰ still folds by repeated multiplication
    // (aggregate's left fold = the reduce chain's order exactly, and
    // 1.0·φ ≡ φ in IEEE) — never libm pow, which is not
    // correctly-rounded and could differ from DuckDB in the last ulp
    withPhi
      .withColumn("_h", explode(sequence(lit(1), lit(horizon))))
      .select(keys.map(col) ++ Seq(
        (lit(t0Us) + (col("_h") - 1).cast(LongType) * stepUs)
          .as("_frowts"),
        (col("_mu") + aggregate(sequence(lit(1), col("_h")),
          lit(1.0), (acc, _) => acc * col("_phi")) *
          (col("_last") - col("_mu"))).as("forecast")): _*)
  }

  /** FORECAST(col): per-key OLS linear trend extrapolated `horizon`
    * steps of `stepUs` beyond the newest sample. Emits `_frowts` (µs),
    * `forecast`, `_flow`, `_fhigh` (±1.96·residual σ). One hash
    * aggregate over exact sufficient statistics — a single shuffle of
    * one row per key, any data size. The regression runs in the whole-
    * second domain (exact decimal sums need bounded x), so `stepUs`
    * must be a whole number of seconds. */
  def forecast(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long, t0Us: Long): DataFrame = {
    require(stepUs > 0 && stepUs % 1000000L == 0,
      s"forecast step must be a positive whole-second duration: $stepUs µs")
    val xL = TimeOps.floorDiv(tsUs.cast(LongType) - lit(t0Us), 1000000L)
    val xd = xL.cast(DecimalType(18, 0))
    val yd = col(valueCol).cast(DecimalType(18, 2))
    val stepSec = stepUs / 1000000L
    val stats = df.groupBy(keys.map(col): _*).agg(
      count(lit(1)).as("_n"),
      max(xL).as("_xmax"),
      sum(xd).cast("double").as("_sx"),
      sum(yd).cast("double").as("_sy"),
      sum(xd * xd).cast("double").as("_sxx"),
      sum(xd * yd).cast("double").as("_sxy"),
      sum(yd * yd).cast("double").as("_syy"))
    stats
      .withColumn("_b", (col("_n") * col("_sxy") - col("_sx") * col("_sy")) /
        (col("_n") * col("_sxx") - col("_sx") * col("_sx")))
      .withColumn("_a", (col("_sy") - col("_b") * col("_sx")) / col("_n"))
      .withColumn("_sse", col("_syy") - lit(2) * col("_a") * col("_sy") -
        lit(2) * col("_b") * col("_sxy") +
        col("_n") * col("_a") * col("_a") +
        lit(2) * col("_a") * col("_b") * col("_sx") +
        col("_b") * col("_b") * col("_sxx"))
      .withColumn("_sigma",
        sqrt(greatest(col("_sse"), lit(0)) / (col("_n") - lit(2))))
      .withColumn("_j", explode(sequence(lit(1), lit(horizon))))
      .withColumn("_xf", col("_xmax") + col("_j") * lit(stepSec))
      .withColumn("_frowts", lit(t0Us) + col("_xf") * lit(1000000L))
      .withColumn("forecast", col("_a") + col("_b") * col("_xf"))
      .withColumn("_flow", col("forecast") - lit(1.96) * col("_sigma"))
      .withColumn("_fhigh", col("forecast") + lit(1.96) * col("_sigma"))
      .select(keys.map(col) ++ Seq(col("_frowts"), col("forecast"),
        col("_flow"), col("_fhigh")): _*)
  }

  /** IMPUTATION(col): linear interpolation of null samples between their
    * surrounding non-null neighbours per key (nearest value at the
    * edges). Emits the original rows with `valueCol` imputed and
    * `_impmark` = true where a value was filled. One sort-shuffle.
    *
    * With no `keys` a plain `Window.orderBy` would collapse the whole
    * input to one partition, so the keyless path runs the prev/next
    * sample carries as [[GlobalScan.twoPass]] scans (ascending for
    * prev, exact reverse order for next) — the same distributed shape
    * as FillOps.interp's keyless carry. `tieBreak` columns order rows
    * at equal ts (pass one to make keyless results deterministic when
    * timestamps can collide across the whole table). */
  def imputeLinear(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], tieBreak: Seq[String] = Nil): DataFrame = {
    val keyCols = keys.map(col)
    val d = df.withColumn("_t", tsUs.cast(LongType))
      .withColumn("_y", col(valueCol).cast("double"))
    val carried =
      if (keys.isEmpty) keylessCarryBoth(d, tieBreak)
      else {
        val w = Window.partitionBy(keyCols: _*)
          .orderBy(col("_t") +: tieBreak.map(col): _*)
        val pair = when(col("_y").isNotNull, struct(col("_t"), col("_y")))
        val pv = last(pair, ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, -1))
        val nv = first(pair, ignoreNulls = true)
          .over(w.rowsBetween(1, Window.unboundedFollowing))
        d.withColumn("_pv", pv).withColumn("_nv", nv)
      }
    carried
      .withColumn(valueCol,
        when(col("_y").isNotNull, col("_y"))
          .when(col("_pv").isNull && col("_nv").isNull,
            lit(null).cast("double"))
          .when(col("_pv").isNull, col("_nv").getField("_y"))
          .when(col("_nv").isNull, col("_pv").getField("_y"))
          .otherwise(col("_pv").getField("_y") +
            (col("_nv").getField("_y") - col("_pv").getField("_y")) *
              (col("_t") - col("_pv").getField("_t")).cast("double") /
              (col("_nv").getField("_t") - col("_pv").getField("_t"))
                .cast("double")))
      .withColumn("_impmark", col("_y").isNull)
      .drop("_t", "_y", "_pv", "_nv")
  }

  /** Keyless prev+next non-null (ts,value) carry for [[imputeLinear]],
    * distributed via [[GlobalScan.twoPassBidir]]: ONE range sort binds
    * both `_pv` (previous non-null sample, exclusive of the current
    * row, from the ascending replay) and `_nv` (next non-null sample,
    * exclusive, from the suffix effect + a bounded lookahead buffer).
    * The naive backward carry re-sorts the whole frame descending — a
    * second full sort-shuffle; here rows between consecutive samples
    * wait in a small pending buffer until their next sample arrives
    * (bounded by the longest null run, the same working set the linear
    * interpolation itself needs), and the partition-tail rows take the
    * first sample of the LATER partitions from the suffix effect. */
  private def keylessCarryBoth(frame: DataFrame,
      tieBreak: Seq[String]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
    val schema = frame.schema
    val tIdx = schema.fieldIndex("_t")
    val vIdx = schema.fieldIndex("_y")
    val pairType = StructType(Seq(StructField("_t", LongType),
      StructField("_y", DoubleType)))
    val outSchema = StructType(schema.fields :+
      StructField("_pv", pairType) :+ StructField("_nv", pairType))
    val sortCols = col("_t") +: tieBreak.map(col)
    type Sample = Option[(Long, Double)]
    def pairRow(p: Sample): Row = p.map(s => Row(s._1, s._2)).orNull
    GlobalScan.twoPassBidir[Sample, Sample](frame, sortCols,
      zeroPre = None, zeroSuf = None,
      summary = { it =>
        var first: Sample = None
        var last: Sample = None
        it.foreach { r =>
          if (!r.isNullAt(vIdx)) {
            val s = Some((r.getLong(tIdx), r.getDouble(vIdx)))
            if (first.isEmpty) first = s
            last = s
          }
        }
        (last, first)
      },
      combinePre = GlobalScan.lastSeen,
      combineSuf = GlobalScan.firstSeen,
      emit = { (prev0, next0, it) =>
        var carry = prev0
        // rows awaiting their _nv, paired with the _pv they saw —
        // the output Row is built ONCE, when the next sample arrives
        // (building it twice doubled the dominant allocation cost)
        val pending = scala.collection.mutable.ArrayBuffer[(Row, Row)]()
        def flush(nv: Sample): Iterator[Row] = {
          val nvRow = pairRow(nv)
          val out = pending.toArray
          pending.clear()
          out.iterator.map { case (r, pv) =>
            Row.fromSeq(r.toSeq :+ pv :+ nvRow) }
        }
        val main = it.flatMap { r =>
          val sample: Sample =
            if (r.isNullAt(vIdx)) None
            else Some((r.getLong(tIdx), r.getDouble(vIdx)))
          // rows BEFORE this sample see it as their next; the sample row
          // itself joins pending (its next is a later sample)
          val flushed =
            if (sample.isDefined) flush(sample) else Iterator.empty
          pending += ((r, pairRow(carry)))
          if (sample.isDefined) carry = sample
          flushed
        }
        main ++ flush(next0)
      },
      outSchema)
  }

  /** ANOMALY_WINDOW(col): z-score detector — a row is anomalous when
    * |value − mean| > z·σ (population σ per key, from exact sums);
    * consecutive anomalous rows merge into windows. Returns the
    * anomalous rows tagged with `_wgrp` (group id per key); aggregate
    * min/max ts per (key, _wgrp) for window bounds.
    *
    * With no `keys` a `Window.partitionBy()` would collapse the whole
    * input to one partition, so the keyless path computes the global
    * mean/σ with a one-row scalar aggregate broadcast back onto the
    * rows, then numbers all rows AND anomalous rows in a single
    * [[GlobalScan.dualRowNumber]] sorted pass (the composite effect is
    * (rows, anomalousRows) per partition) — one range sort where the
    * naive number/filter/number-again lowering sorts twice. `tieBreak`
    * orders rows at equal ts so the keyless numbering is a total
    * order. */
  /** ANOMALYCHECK(col) row marks (builtins.c:7291; `_anomalymark`
    * pseudo-column :7592): every input row back, plus `_anomalymark` =
    * the z-score detector's verdict for that row. Same decimal-stable
    * stats as [[anomalyRows]]; keyed stats ride a window aggregate
    * (one shuffle), keyless stats a broadcast one-row aggregate. */
  def anomalyMark(df: DataFrame, valueCol: String, keys: Seq[String],
      z: Double = 2.0): DataFrame = {
    val yd = col(valueCol).cast(DecimalType(18, 2))
    val d0 = df.withColumn("_y", col(valueCol).cast("double"))
    val isAnom =
      abs(col("_y") - col("_sy") / col("_cnt")) >
        lit(z) * sqrt((col("_syy") - col("_sy") * col("_sy") / col("_cnt")) /
          col("_cnt"))
    val withStats = if (keys.isEmpty) {
      val stats = d0.agg(
        sum(yd).cast("double").as("_sy"),
        sum(yd * yd).cast("double").as("_syy"),
        count(lit(1)).as("_cnt"))
      d0.crossJoin(broadcast(stats))
    } else {
      val wAll = Window.partitionBy(keys.map(col): _*)
      d0.withColumn("_sy", sum(yd).over(wAll).cast("double"))
        .withColumn("_syy", sum(yd * yd).over(wAll).cast("double"))
        .withColumn("_cnt", count(lit(1)).over(wAll))
    }
    withStats.withColumn("_anomalymark", coalesce(isAnom, lit(false)))
      .drop("_sy", "_syy", "_cnt", "_y")
  }

  def anomalyRows(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], z: Double = 2.0,
      tieBreak: Seq[String] = Nil): DataFrame = {
    val yd = col(valueCol).cast(DecimalType(18, 2))
    val d0 = df.withColumn("_t", tsUs.cast(LongType))
      .withColumn("_y", col(valueCol).cast("double"))
    val isAnom =
      abs(col("_y") - col("_sy") / col("_cnt")) >
        lit(z) * sqrt((col("_syy") - col("_sy") * col("_sy") / col("_cnt")) /
          col("_cnt"))
    if (keys.isEmpty) {
      val stats = d0.agg(
        sum(yd).cast("double").as("_sy"),
        sum(yd * yd).cast("double").as("_syy"),
        count(lit(1)).as("_cnt"))
      val ord = col("_t") +: tieBreak.map(col)
      // evaluate the detector map-side and drop the stat columns BEFORE
      // the sort so the shuffled payload carries one boolean, not three
      // doubles; the single dualRowNumber pass then yields both
      // numberings at the cost of ONE range sort
      val flagged = d0.crossJoin(broadcast(stats))
        .withColumn("_isanom", coalesce(isAnom, lit(false)))
        .drop("_sy", "_syy", "_cnt")
      GlobalScan.dualRowNumber(flagged, ord, "_isanom", "_rn", "_arn")
        .filter(col("_isanom"))
        .withColumn("_wgrp", col("_rn") - col("_arn"))
        .drop("_isanom", "_rn", "_arn", "_y")
    } else {
      val keyCols = keys.map(col)
      val wAll = Window.partitionBy(keyCols: _*)
      val wOrd = Window.partitionBy(keyCols: _*)
        .orderBy(col("_t") +: tieBreak.map(col): _*)
      val anomalous = d0
        .withColumn("_sy", sum(yd).over(wAll).cast("double"))
        .withColumn("_syy", sum(yd * yd).over(wAll).cast("double"))
        .withColumn("_cnt", count(lit(1)).over(wAll))
        .withColumn("_rn", row_number().over(wOrd).cast(LongType))
        .filter(isAnom)
      anomalous
        .withColumn("_wgrp", col("_rn") - row_number().over(wOrd))
        .drop("_sy", "_syy", "_cnt", "_rn", "_y")
    }
  }
}
