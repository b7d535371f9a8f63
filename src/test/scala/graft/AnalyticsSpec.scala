package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators
import graft.ops.AnalyticsOps

class AnalyticsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("forecast recovers an exact linear trend with zero band width") {
    import spark.implicits._
    // y = 2x + 5 over x = 0..9 seconds, key k
    val df = (0 until 10).map(i =>
      ("k", i * 1000000L, 2.0 * i + 5.0)).toDF("key", "ts", "value")
    val out = AnalyticsOps.forecast(df, col("ts"), "value", Seq("key"),
      horizon = 3, stepUs = 1000000L, t0Us = 0L)
      .orderBy("_frowts").collect()
    assert(out.length == 3)
    out.zipWithIndex.foreach { case (r, i) =>
      val xf = 9 + (i + 1)
      assert(r.getAs[Long]("_frowts") == xf * 1000000L)
      assert(math.abs(r.getAs[Double]("forecast") - (2.0 * xf + 5.0)) < 1e-9)
      // a perfect fit has sigma 0 -> bands collapse onto the forecast
      assert(math.abs(r.getAs[Double]("_flow") -
        r.getAs[Double]("forecast")) < 1e-9)
    }
  }

  test("imputeLinear interpolates interior nulls, copies edges") {
    import spark.implicits._
    val df = Seq(
      ("k", 0L, None: Option[Double]),      // leading edge -> next value
      ("k", 10L, Some(10.0)),
      ("k", 20L, None),                     // interior -> linear 15.0
      ("k", 30L, Some(20.0)),
      ("k", 40L, None)                      // trailing edge -> prev value
    ).toDF("key", "ts", "value")
    val out = AnalyticsOps.imputeLinear(df, col("ts"), "value", Seq("key"))
      .orderBy("ts").select("value", "_impmark").collect()
    assert(out.map(_.getDouble(0)).toSeq == Seq(10.0, 10.0, 15.0, 20.0, 20.0))
    assert(out.map(_.getBoolean(1)).toSeq ==
      Seq(true, false, true, false, true))
  }

  test("imputeLinear keyless path matches the keyed result and stays " +
      "distributed") {
    import spark.implicits._
    // 500 rows across many partitions, nulls planted every 7th row
    val df = spark.range(500)
      .select(col("id").as("seq"), (col("id") * 10L).as("ts"),
        when(col("id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("id").cast("double") * 1.5).as("value"))
      .repartition(8)
    val keyless = AnalyticsOps.imputeLinear(df, col("ts"), "value", Nil,
        tieBreak = Seq("seq"))
      .select("seq", "value", "_impmark").orderBy("seq").collect()
    // reference: the same rows under one constant key (keyed window path)
    val keyed = AnalyticsOps.imputeLinear(
        df.withColumn("k", lit(1)), col("ts"), "value", Seq("k"),
        tieBreak = Seq("seq"))
      .select("seq", "value", "_impmark").orderBy("seq").collect()
    assert(keyless.length == 500)
    keyless.zip(keyed).foreach { case (a, b) => assert(a == b) }
    // and the keyless plan must not funnel through one partition: the
    // GlobalScan frame keeps the range-partitioned layout
    assert(keyless.count(_.getBoolean(2)) == math.ceil(500.0 / 7).toInt)
  }

  test("anomalyRows flags planted spikes and merges adjacent runs") {
    import spark.implicits._
    val base = (0 until 100).map(i => ("k", i.toLong, 10.0))
    val spiked = base.map { case (k, t, v) =>
      if (t == 20 || t == 21 || t == 50) (k, t, 1000.0) else (k, t, v)
    }
    val df = spiked.toDF("key", "ts", "value")
    val wins = AnalyticsOps.anomalyRows(df, col("ts"), "value", Seq("key"))
      .groupBy("key", "_wgrp")
      .agg(min("ts").as("ws"), max("ts").as("we"), count(lit(1)).as("n"))
      .orderBy("ws").collect()
    assert(wins.length == 2) // [20,21] merge, [50] alone
    assert(wins(0).getAs[Long]("ws") == 20 && wins(0).getAs[Long]("we") == 21)
    assert(wins(1).getAs[Long]("ws") == 50 && wins(1).getAs[Long]("n") == 1)
  }

  test("anomalyRows keyless path matches the keyed result and stays " +
      "distributed") {
    import spark.implicits._
    val df = spark.range(1000)
      .select(col("id").as("seq"), (col("id") * 10L).as("ts"),
        when(col("id").isin(200L, 201L, 500L), lit(1000.0))
          .otherwise(lit(10.0)).as("value"))
      .repartition(8)
    val keyless = AnalyticsOps.anomalyRows(df, col("ts"), "value", Nil,
      tieBreak = Seq("seq"))
    // the keyless plan must not collapse upstream to one partition: the
    // GlobalScan frame keeps the range-partitioned layout
    assert(keyless.rdd.getNumPartitions > 1)
    val wins = keyless.groupBy("_wgrp")
      .agg(min("ts").as("ws"), max("ts").as("we"), count(lit(1)).as("n"))
      .orderBy("ws").collect()
    // reference: same rows under one constant key (keyed window path)
    val keyed = AnalyticsOps.anomalyRows(
        df.withColumn("k", lit(1)), col("ts"), "value", Seq("k"),
        tieBreak = Seq("seq"))
      .groupBy("k", "_wgrp")
      .agg(min("ts").as("ws"), max("ts").as("we"), count(lit(1)).as("n"))
      .orderBy("ws").collect()
    assert(wins.length == 2) // [2000,2010] merge, [5000] alone
    assert(wins.map(r => (r.getAs[Long]("ws"), r.getAs[Long]("we"),
        r.getAs[Long]("n"))).toSeq ==
      keyed.map(r => (r.getAs[Long]("ws"), r.getAs[Long]("we"),
        r.getAs[Long]("n"))).toSeq)
  }

  test("dtwPath: endpoints, monotone steps, cost matches dtwDistance") {
    val a = Seq(1.0, 3.0, 4.0, 9.0, 8.0, 2.0, 1.0, 5.0, 7.0)
    val b = Seq(1.0, 6.0, 2.0, 3.0, 0.0, 9.0, 4.0, 3.0, 6.0, 3.0)
    val p = Aggregators.dtwPath(a, b)
    assert(p.head == (0, 0) && p.last == (a.length - 1, b.length - 1))
    p.sliding(2).foreach { case Seq((i1, j1), (i2, j2)) =>
      assert((i2 - i1, j2 - j1) match {
        case (1, 1) | (1, 0) | (0, 1) => true; case _ => false
      })
    }
    val cost = p.map { case (i, j) => math.abs(a(i) - b(j)) }.sum
    assert(math.abs(cost - Aggregators.dtwDistance(a, b)) < 1e-9)
  }
}
