package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{TimeOps, TsmaOps}
import graft.ops.TimeOps.Dur

class TsmaSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val events = Tables(spark, sf, "events")
  private lazy val rollup = TsmaOps.createRollup(events, col("ts"),
    Dur.h, Seq("user_id"), "value")

  test("rollup-served interval agg equals base-table agg exactly") {
    val viaRollup = TsmaOps.route(events, rollup, Dur.h, col("ts"),
        6 * Dur.h, Seq("user_id"), "value")
      .orderBy("user_id", "_wstart")
      .collect().map(_.toSeq)
    val viaBase = TsmaOps.route(events, rollup.limit(0), Dur.h, col("ts"),
        6 * Dur.h + 1, Seq("user_id"), "value") // non-multiple → base path
    // recompute the 6h agg from base directly for comparison
    val direct = events
      .withColumn("_wstart", TimeOps.tumblingStart(col("ts"), 6 * Dur.h))
      .groupBy(col("user_id"), col("_wstart"))
      .agg(count(col("value")).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_v"),
        min(col("value")).as("min_v"), max(col("value")).as("max_v"))
      .withColumn("avg_v", col("sum_v") / col("n"))
      .orderBy("user_id", "_wstart")
      .collect().map(_.toSeq)
    assert(viaRollup.toSeq == direct.toSeq,
      "rollup partial-state merge diverged from base aggregation")
    assert(viaBase.columns.sameElements(
      Seq("user_id", "_wstart", "n", "sum_v", "min_v", "max_v", "avg_v")))
  }

  test("rollup compacts dense data to one row per (key, grain)") {
    import spark.implicits._
    // 4 users x 2000 points inside 2 hours -> 4 x 2 rollup rows
    val dense = (0 until 8000).map(i =>
      (i % 4L, (i / 4).toLong * 3600000L, i * 0.5)).toDF(
      "user_id", "ts", "value")
    val r = TsmaOps.createRollup(dense, col("ts"), Dur.h,
      Seq("user_id"), "value")
    assert(r.count() == 8)
    assert(r.agg(sum("_cnt")).head.getLong(0) == 8000)
  }
}
