package graft.ops

import org.apache.spark.sql.{Column, DataFrame}

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
