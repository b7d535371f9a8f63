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

  test("RSMA: levels fold exactly; router picks the coarsest; DDL " +
      "round-trips") {
    import graft.sql.GraftCatalog
    val cat = new GraftCatalog(spark)
    cat.register("events", events)
    cat.exec("""CREATE RSMA ev_rsma ON events
      FUNCTION(count(value), sum(value), min(value), max(value))
      INTERVAL(1h, 1d)""")
    val specs = Seq(("count", "value"), ("sum", "value"))
    // a 1d query is eligible at BOTH levels — the router must read the
    // coarser (1d) one
    assert(cat.servingGrain("events", Dur.d, specs) == Some(Dur.d))
    // a 6h query only divides the 1h level
    assert(cat.servingGrain("events", 6 * Dur.h, specs) == Some(Dur.h))
    // a 90m query divides neither -> base table
    assert(cat.servingGrain("events", 90 * Dur.m, specs).isEmpty)
    // the 1d-level fold serves the same bytes as the direct aggregate
    val served = cat.serveInterval("events", Dur.d, Seq("user_id"), specs)
      .orderBy("user_id", "_wstart").collect().map(_.toSeq)
    val direct = events
      .withColumn("_wstart", TimeOps.tumblingStart(col("ts"), Dur.d))
      .groupBy(col("user_id"), col("_wstart"))
      .agg(count(col("value")).cast("long").as("count_value"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("user_id", "_wstart").collect().map(_.toSeq)
    assert(served.toSeq == direct.toSeq)
    // DDL listing + SHOW CREATE round-trip, then DROP falls back
    assert(cat.sql("SHOW RSMAS").collect().map(_.getString(0)).toSeq ==
      Seq("ev_rsma"))
    val insRow = cat.sql("SELECT rsma_name, intervals " +
      "FROM information_schema.ins_rsmas ORDER BY rsma_name")
      .collect()(0)
    assert(insRow.getString(0) == "ev_rsma" &&
      insRow.getString(1) == "1h,1d")
    // retention listing: one row per ladder level
    assert(cat.sql("SHOW RETENTIONS").collect()
      .map(r => (r.getInt(2), r.getString(3))).toSeq ==
      Seq((0, "1h"), (1, "1d")))
    // manual rollup pass pre-materializes every level without error
    cat.exec("ROLLUP DATABASE default")
    // ALTER RSMA narrows the function list: sum-only no longer covers
    // a count request, so the router falls back to base for it
    cat.exec("ALTER RSMA ev_rsma FUNCTION(sum(value))")
    assert(cat.servingGrain("events", Dur.d,
      Seq(("sum", "value"))) == Some(Dur.d))
    assert(cat.servingGrain("events", Dur.d,
      Seq(("count", "value"))).isEmpty)
    // SHOW CREATE reflects the ALTERed list and round-trips
    val shown = cat.sql("SHOW CREATE RSMA ev_rsma")
      .collect()(0).getString(1)
    assert(shown.contains("sum(`value`)") && !shown.contains("count("))
    cat.exec("DROP RSMA ev_rsma")
    assert(cat.servingGrain("events", Dur.d,
      Seq(("sum", "value"))).isEmpty)
    cat.exec(shown)
    assert(cat.servingGrain("events", Dur.d,
      Seq(("sum", "value"))) == Some(Dur.d))
  }

  test("RECURSIVE TSMA folds the base rollup and wins eligible routes") {
    import graft.sql.GraftCatalog
    val cat = new GraftCatalog(spark)
    cat.register("events", events)
    cat.exec("CREATE TSMA t1 ON events " +
      "FUNCTION(count(value), sum(value)) INTERVAL(1h)")
    cat.exec("CREATE RECURSIVE TSMA t2 ON t1 INTERVAL(1d)")
    val specs = Seq(("count", "value"), ("sum", "value"))
    // a 1d query routes through the recursive (coarser) state
    assert(cat.servingGrain("events", Dur.d, specs) == Some(Dur.d))
    assert(cat.servingGrain("events", 6 * Dur.h, specs) == Some(Dur.h))
    val served = cat.serveInterval("events", Dur.d, Seq("user_id"), specs)
      .orderBy("user_id", "_wstart").collect().map(_.toSeq)
    val direct = events
      .withColumn("_wstart", TimeOps.tumblingStart(col("ts"), Dur.d))
      .groupBy(col("user_id"), col("_wstart"))
      .agg(count(col("value")).cast("long").as("count_value"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .orderBy("user_id", "_wstart").collect().map(_.toSeq)
    assert(served.toSeq == direct.toSeq)
    // interval not a multiple of the base grain, and dropping a base
    // with dependents, both fail loudly
    intercept[IllegalArgumentException] {
      cat.exec("CREATE RECURSIVE TSMA t3 ON t1 INTERVAL(90m)")
    }
    intercept[IllegalArgumentException] { cat.exec("DROP TSMA t1") }
    // SHOW CREATE round-trips the recursive form
    val shown = cat.sql("SHOW CREATE TSMA t2").collect()(0).getString(1)
    assert(shown.startsWith("CREATE RECURSIVE TSMA"))
    cat.exec("DROP TSMA t2")
    cat.exec(shown)
    assert(cat.servingGrain("events", Dur.d, specs) == Some(Dur.d))
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
