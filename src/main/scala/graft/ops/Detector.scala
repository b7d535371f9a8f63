package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Pluggable analytics backend (SURVEY §2.10; tanalytics.h — the
  * reference routes FORECAST / IMPUTATION / ANOMALY_WINDOW to an
  * external "anode" model service over HTTP). The query surface binds
  * to this trait, so a learned model — `mapPartitions`/`mapGroups`
  * calling an HTTP endpoint or an ONNX session per series — slots in
  * without touching any query code. The deterministic in-engine models
  * ([[AnalyticsOps]]) are the default binding and keep results
  * oracle-checkable.
  *
  * Contracts (column shapes the queries rely on):
  *  - [[forecast]]: keys ++ (`_frowts` µs, `forecast`, `_flow`, `_fhigh`)
  *  - [[imputeLinear]]: the input rows with `valueCol` filled and
  *    `_impmark` = true where a value was imputed
  *  - [[anomalyRows]]: the anomalous input rows tagged `_wgrp` (window
  *    group id per key; consecutive anomalies share a group)
  */
trait Detector {
  def forecast(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long, t0Us: Long): DataFrame
  def imputeLinear(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String]): DataFrame
  def anomalyRows(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], z: Double): DataFrame
}

/** One analytics-service call per series — the anode wire seam
  * (tanalytics.h: taosAnalyBufWrite* marshals {algo, opts, ts[],
  * val[]} per series to the service; forecastoperator.c:1115 binds
  * the response back into the result block). Injectable: this sandbox
  * has no egress, so production supplies an HTTP/ONNX implementation
  * while specs inject a deterministic fake — the Spark side
  * (per-key grouping, ts-ordering, bounded series buffering, output
  * schema) is identical either way and is what [[ServiceDetector]]
  * tests. */
trait AnalyticsTransport extends Serializable {
  /** Forecast `horizon` points from one ts-ascending series; returns
    * (tsUs, value, low, high) per point. */
  def forecast(algo: String, ts: Array[Long], values: Array[Double],
      horizon: Int, stepUs: Long,
      t0Us: Long): Seq[(Long, Double, Double, Double)]
  /** Fill the None slots of one series; returns one value per input
    * position (present positions echo their input). */
  def impute(algo: String, ts: Array[Long],
      values: Array[Option[Double]]): Seq[Double]
  /** Per-position anomaly verdicts for one series. */
  def anomaly(algo: String, ts: Array[Long], values: Array[Double],
      z: Double): Seq[Boolean]
}

/** [[Detector]] bound to an external analytics service through an
  * [[AnalyticsTransport]] — the CREATE ANODE serving path. Scale
  * contract: one transport call per series key, series buffered
  * whole in one task (the reference anode receives whole series the
  * same way); `maxSeriesRows` fails loudly before a runaway series
  * OOMs an executor, exactly like the fenced quadratic dedup paths. */
case class ServiceDetector(transport: AnalyticsTransport,
    algo: String = "linear",
    maxSeriesRows: Int = 1000000) extends Detector {
  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types.{BooleanType, DoubleType, LongType,
    StructField, StructType}

  /** Per-key ts-sorted partitions + a streaming group iterator:
    * repartition on the series keys, sort within partitions, buffer
    * one series at a time, call `f` once per series. */
  private def perSeries(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], outSchema: StructType,
      keepCols: Seq[String])(
      f: (Seq[Any], Array[Long], Array[Row]) => Iterator[Row]): DataFrame = {
    require(keys.nonEmpty, "ServiceDetector needs at least one series key")
    val spark = df.sparkSession
    val d = df.select(keys.map(col) ++ Seq(
      tsUs.cast(LongType).as("_t")) ++ keepCols.map(col): _*)
    val sorted = d.repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col) :+ col("_t"): _*)
    val kN = keys.length
    val cap = maxSeriesRows
    val rdd = sorted.rdd.mapPartitions { it =>
      val buf = scala.collection.mutable.ArrayBuffer[Row]()
      var cur: Seq[Any] = null
      def flush(): Iterator[Row] =
        if (buf.isEmpty) Iterator.empty
        else {
          val rows = buf.toArray
          buf.clear()
          f(cur, rows.map(_.getLong(kN)), rows)
        }
      // key comparison is field-wise against the current key — this is
      // a per-row hot path, so no per-row Seq materializes; the key
      // Seq is built once per series (for the flush callback)
      def keyOf(r: Row): IndexedSeq[Any] =
        (0 until kN).map(r.get)
      def sameKey(r: Row, k: Seq[Any]): Boolean = {
        var i = 0
        while (i < kN) {
          val a = r.get(i)
          if (if (a == null) k(i) != null else a != k(i)) return false
          i += 1
        }
        true
      }
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private def fill(): Unit = {
          while (!pending.hasNext && it.hasNext) {
            val r = it.next()
            if (cur == null) cur = keyOf(r)
            else if (!sameKey(r, cur)) { pending = flush(); cur = keyOf(r) }
            require(buf.length < cap,
              s"series $cur exceeds maxSeriesRows=$cap — raise the cap " +
                "or pre-aggregate before the service call")
            buf += r
          }
          if (!pending.hasNext && buf.nonEmpty) pending = flush()
        }
        def hasNext: Boolean = { fill(); pending.hasNext }
        def next(): Row = { fill(); pending.next() }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  def forecast(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long,
      t0Us: Long): DataFrame = {
    val base = df.select(keys.map(col) :+ col(valueCol): _*).schema
    val outSchema = StructType(base.fields.take(keys.length) ++ Seq(
      StructField("_frowts", LongType), StructField("forecast", DoubleType),
      StructField("_flow", DoubleType), StructField("_fhigh", DoubleType)))
    val a = algo
    perSeries(df.filter(col(valueCol).isNotNull), tsUs, valueCol, keys,
        outSchema, Seq(valueCol)) { (k, ts, rows) =>
      val vs = rows.map(_.getDouble(keys.length + 1))
      transport.forecast(a, ts, vs, horizon, stepUs, t0Us).iterator
        .map { case (t, v, lo, hi) => Row.fromSeq(k ++ Seq[Any](t, v, lo, hi)) }
    }
  }

  def imputeLinear(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String]): DataFrame = {
    val kN = keys.length
    val outSchema = StructType(
      df.select(keys.map(col): _*).schema.fields ++ Seq(
        StructField("_t", LongType), StructField(valueCol, DoubleType),
        StructField("_impmark", BooleanType)))
    val a = algo
    perSeries(df, tsUs, valueCol, keys, outSchema, Seq(valueCol)) {
      (k, ts, rows) =>
        val vs = rows.map(r =>
          if (r.isNullAt(kN + 1)) None else Some(r.getDouble(kN + 1)))
        val filled = transport.impute(a, ts, vs)
        rows.iterator.zip(filled.iterator).zip(vs.iterator).map {
          case ((r, v), orig) =>
            Row.fromSeq(k ++ Seq[Any](r.getLong(kN), v, orig.isEmpty))
        }
    }
  }

  def anomalyRows(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], z: Double): DataFrame = {
    val kN = keys.length
    val outSchema = StructType(
      df.select(keys.map(col): _*).schema.fields ++ Seq(
        StructField("_t", LongType), StructField(valueCol, DoubleType),
        StructField("_wgrp", LongType)))
    val a = algo
    perSeries(df.filter(col(valueCol).isNotNull), tsUs, valueCol, keys,
        outSchema, Seq(valueCol)) { (k, ts, rows) =>
      val vs = rows.map(_.getDouble(kN + 1))
      val marks = transport.anomaly(a, ts, vs, z)
      // consecutive anomalies share a window group id, per key
      var grp = -1L; var prev = false
      rows.iterator.zip(marks.iterator).flatMap { case (r, m) =>
        val out =
          if (m) {
            if (!prev) grp += 1
            Some(Row.fromSeq(k ++ Seq[Any](r.getLong(kN),
              r.getDouble(kN + 1), grp)))
          } else None
        prev = m
        out
      }
    }
  }
}

/** Default binding: the deterministic in-engine models. */
object BuiltinDetector extends Detector {
  def forecast(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], horizon: Int, stepUs: Long, t0Us: Long): DataFrame =
    AnalyticsOps.forecast(df, tsUs, valueCol, keys, horizon, stepUs, t0Us)
  def imputeLinear(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String]): DataFrame =
    AnalyticsOps.imputeLinear(df, tsUs, valueCol, keys)
  def anomalyRows(df: DataFrame, tsUs: Column, valueCol: String,
      keys: Seq[String], z: Double): DataFrame =
    AnalyticsOps.anomalyRows(df, tsUs, valueCol, keys, z)
}
