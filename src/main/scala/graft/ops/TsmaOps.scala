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

  /** Multi-column rollup (sql.y:1503 `CREATE TSMA … FUNCTION(f(c),…)`):
    * partial aggregate state per grain bucket for EVERY referenced
    * value column, suffixed `_<col>` — one shuffle builds state that
    * serves any covered (func, col) combination. */
  def createRollupMulti(df: DataFrame, tsUs: Column, grainUs: Long,
      keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "TSMA rollup needs at least one column")
    val aggs = valueCols.flatMap { c => Seq(
      count(col(c)).as(s"_cnt_$c"),
      sum(col(c).cast(DecimalType(18, 2))).as(s"_sum_$c"),
      min(col(c)).as(s"_min_$c"), max(col(c)).as(s"_max_$c")) }
    df.withColumn("_gstart", TimeOps.tumblingStart(tsUs, grainUs))
      .groupBy((keys.map(col) :+ col("_gstart")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Fold a multi-column rollup's partial state to a COARSER grain —
    * the RSMA level-(k+1) table derived from level k (sql.y:1483
    * CREATE RSMA; rollupoperator.c): counts and sums add, min of mins
    * / max of maxes — the merge is exact, so every level serves
    * hash-identical answers. Deriving each level from the previous one
    * (not the base table) is the scale property: level k+1 reads
    * |level k| rows, never the raw 100 TB. */
  def mergeRollupMulti(rollup: DataFrame, toGrainUs: Long,
      keys: Seq[String], valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "RSMA fold needs at least one column")
    val aggs = valueCols.flatMap { c => Seq(
      sum(col(s"_cnt_$c")).as(s"_cnt_$c"),
      sum(col(s"_sum_$c")).as(s"_sum_$c"),
      min(col(s"_min_$c")).as(s"_min_$c"),
      max(col(s"_max_$c")).as(s"_max_$c")) }
    rollup
      .withColumn("_gcoarse", TimeOps.tumblingStart(col("_gstart"),
        toGrainUs))
      .drop("_gstart").withColumnRenamed("_gcoarse", "_gstart")
      .groupBy((keys.map(col) :+ col("_gstart")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Merge a multi-column rollup's partials into `intervalUs` windows
    * and emit one column per requested (func, col) spec, named
    * `<func>_<col>` (`_wstart` carries the window start). `intervalUs`
    * must be a grain multiple — the router checks eligibility. avg is
    * served as exact-decimal sum over count, the same operation order
    * the base-table aggregate uses, so rollup-served answers
    * hash-match direct ones. */
  def serveFromRollup(rollup: DataFrame, grainUs: Long, intervalUs: Long,
      keys: Seq[String], specs: Seq[(String, String)]): DataFrame = {
    require(intervalUs % grainUs == 0,
      s"interval $intervalUs is not a multiple of TSMA grain $grainUs")
    val aggs = specs.map { case (f, c) =>
      val e = f.toLowerCase match {
        case "count" => sum(col(s"_cnt_$c"))
        case "sum" => sum(col(s"_sum_$c")).cast("double")
        case "min" => min(col(s"_min_$c"))
        case "max" => max(col(s"_max_$c"))
        case "avg" =>
          sum(col(s"_sum_$c")).cast("double") / sum(col(s"_cnt_$c"))
        case other => throw new IllegalArgumentException(
          s"TSMA cannot serve $other($c)")
      }
      e.as(s"${f.toLowerCase}_$c")
    }
    rollup
      .withColumn("_wstart",
        TimeOps.tumblingStart(col("_gstart"), intervalUs))
      .groupBy((keys.map(col) :+ col("_wstart")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The same (func, col) aggregate list computed straight off the
    * base table — the router's fallback when no TSMA is eligible. */
  def aggBase(base: DataFrame, tsUs: Column, intervalUs: Long,
      keys: Seq[String], specs: Seq[(String, String)]): DataFrame = {
    val aggs = specs.map { case (f, c) =>
      val e = f.toLowerCase match {
        case "count" => count(col(c))
        case "sum" => sum(col(c).cast(DecimalType(18, 2))).cast("double")
        case "min" => min(col(c))
        case "max" => max(col(c))
        case "avg" =>
          sum(col(c).cast(DecimalType(18, 2))).cast("double") /
            count(col(c))
        case other => throw new IllegalArgumentException(
          s"unsupported interval aggregate $other($c)")
      }
      e.as(s"${f.toLowerCase}_$c")
    }
    base.withColumn("_wstart", TimeOps.tumblingStart(tsUs, intervalUs))
      .groupBy((keys.map(col) :+ col("_wstart")): _*)
      .agg(aggs.head, aggs.tail: _*)
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
