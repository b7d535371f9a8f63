package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** TSMA / RSMA: time-range small materialized aggregates
  * (SURVEY §4.1 smaIndexOptimize/tsmaOptimize; sql.y:1505 CREATE TSMA,
  * rollupoperator.c). A rollup table holds *partial* aggregate state at
  * a fine grain; any interval query whose window is a multiple of the
  * grain re-aggregates the rollup instead of the base table — the
  * partial states merge exactly (sum-of-sums, min-of-mins …), the same
  * `_partial`/`_merge` split the reference generates for stable
  * queries.
  *
  * Spark-first form: the rollup is an explicit materialized DataFrame
  * (written as a table by the ingest stream at scale) and [[route]] is
  * the query-side router. Exactness: sums are kept as DECIMAL partials,
  * so rollup-served answers hash-match base-table answers. */
object TsmaOps {

  /** CREATE TSMA: partial aggregate state of `valueCol` per `keys` at
    * `grainUs` buckets: (_gstart, keys..., _cnt, _sum, _min, _max). */
  def createRollup(df: DataFrame, tsUs: Column, grainUs: Long,
      keys: Seq[String], valueCol: String): DataFrame = {
    val v = col(valueCol)
    df.withColumn("_gstart", TimeOps.tumblingStart(tsUs, grainUs))
      .groupBy((keys.map(col) :+ col("_gstart")): _*)
      .agg(count(v).as("_cnt"),
        sum(v.cast(DecimalType(18, 2))).as("_sum"),
        min(v).as("_min"), max(v).as("_max"))
  }

  /** The aggregate surface a TSMA can serve. */
  final case class IntervalAgg(n: Column, sum: Column, min: Column,
      max: Column, avg: Column, wstart: Column)

  /** Serve INTERVAL(`intervalUs`) count/sum/min/max/avg of the rollup's
    * value column, from the rollup when the interval is a multiple of
    * `grainUs` (partial-state merge), else from `base`. Returns the
    * grouped frame and the aggregate columns to use with `.agg`. */
  def route(base: DataFrame, rollup: DataFrame, grainUs: Long,
      tsUs: Column, intervalUs: Long, keys: Seq[String],
      valueCol: String): DataFrame = {
    if (intervalUs % grainUs == 0) {
      // merge partials: every grain bucket folds into its window
      rollup
        .withColumn("_wstart", TimeOps.tumblingStart(col("_gstart"),
          intervalUs))
        .groupBy((keys.map(col) :+ col("_wstart")): _*)
        .agg(sum(col("_cnt")).as("n"),
          sum(col("_sum")).cast("double").as("sum_v"),
          min(col("_min")).as("min_v"), max(col("_max")).as("max_v"))
        .withColumn("avg_v", col("sum_v") / col("n"))
    } else {
      val v = col(valueCol)
      base
        .withColumn("_wstart", TimeOps.tumblingStart(tsUs, intervalUs))
        .groupBy((keys.map(col) :+ col("_wstart")): _*)
        .agg(count(v).as("n"),
          sum(v.cast(DecimalType(18, 2))).cast("double").as("sum_v"),
          min(v).as("min_v"), max(v).as("max_v"))
        .withColumn("avg_v", col("sum_v") / col("n"))
    }
  }
}
