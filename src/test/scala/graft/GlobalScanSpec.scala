package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeOps

/** Keyless global-order scans via GlobalScan two-pass boundary
  * detection: results must match the sequential fold exactly — windows
  * spanning range-partition boundaries included — while the data stays
  * spread over many partitions. */
class GlobalScanSpec extends AnyFunSuite {
  import SparkTestSession._

  test("keyless event windows match a single-partition sequential fold") {
    import spark.implicits._
    // value cycles 0..9; windows open at v==1, close at v==8 — long
    // windows guaranteed to straddle range-partition boundaries
    val n = 50000
    val df = spark.range(n)
      .select(col("id").as("ts"), (col("id") % 10).as("v"))
    val fast = TimeOps.eventWindows(df, col("v") === 1, col("v") === 8,
      col("ts"), Nil)
      .select("ts", "v", "_wstart")
    // reference: the same fold, forced through one partition
    val one = df.repartition(1).sortWithinPartitions("ts")
      .as[(Long, Long)].collect()
    val expect = {
      var open = false; var ws = 0L
      val b = Seq.newBuilder[(Long, Long, Long)]
      one.foreach { case (ts, v) =>
        if (!open && v == 1) { open = true; ws = ts }
        if (open) { b += ((ts, v, ws)); if (v == 8) open = false }
      }
      b.result()
    }
    val got = fast.orderBy("ts").as[(Long, Long, Long)].collect().toSeq
    assert(got == expect)
    assert(got.size == n / 10 * 8) // v in 1..8 of every cycle
  }

  test("keyless event windows really run on many partitions") {
    val df = spark.range(100000)
      .select(col("id").as("ts"), (col("id") % 100).as("v"))
    val out = TimeOps.eventWindows(df, col("v") === 0, col("v") === 90,
      col("ts"), Nil)
    assert(out.rdd.getNumPartitions > 1,
      s"keyless scan collapsed to ${out.rdd.getNumPartitions} partition")
    assert(out.count() == 100000 / 100 * 91)
  }

  test("keyless asof join matches brute force for all four ops") {
    import spark.implicits._
    import graft.ops.JoinOps
    val lts = (0 until 2000).map(i => i * 10L)
    val rts = (0 until 1500).map(i => i * 13L + 1)
    val left = lts.toDF("lt")
    val right = rts.map(t => (t, t * 2.0)).toDF("rt", "v")
    for (op <- Seq(">=", ">", "<=", "<")) {
      val got = JoinOps.asofJoin(left, right, Nil, "lt", "rt", op,
          Seq("v"))
        .select(col("lt"), col("r_v"))
        .as[(Long, Option[Double])].collect().toMap
      def best(t: Long): Option[Long] = op match {
        case ">=" => rts.filter(_ <= t).lastOption
        case ">" => rts.filter(_ < t).lastOption
        case "<=" => rts.find(_ >= t)
        case "<" => rts.find(_ > t)
      }
      lts.foreach { t =>
        assert(got(t) == best(t).map(_ * 2.0), s"op $op at lt=$t")
      }
    }
  }

  test("keyless asof join stays multi-partition") {
    import graft.ops.JoinOps
    val left = spark.range(100000).select(col("id").as("lt"))
    val right = spark.range(50000)
      .select((col("id") * 2).as("rt"), col("id").cast("double").as("v"))
    val out = JoinOps.asofJoin(left, right, Nil, "lt", "rt", ">=",
      Seq("v"))
    assert(out.rdd.getNumPartitions > 1)
    assert(out.count() == 100000)
  }

  test("keyless interp matches brute force and stays multi-partition") {
    import spark.implicits._
    import graft.ops.FillOps
    val pts = (0 until 3000).map(i => (i * 7L, i.toDouble))
    val df = pts.toDF("ts", "v")
    val step = 10L
    val out = FillOps.interp(df, col("ts"), "v", Nil, step, 0L, 20000L,
      FillOps.FillLinear)
    assert(out.rdd.getNumPartitions > 1)
    val got = out.select(col("_irowts"), col("v"))
      .as[(Long, Option[Double])].collect().toMap
    val ts = pts.map(_._1)
    for (g <- 0L.to(20000L, step)) {
      val exact = ts.contains(g)
      val expect: Option[Double] =
        if (exact) Some(g / 7 * 1.0)
        else {
          val p = ts.filter(_ < g).lastOption
          val n = ts.find(_ > g)
          (p, n) match {
            case (Some(a), Some(b)) =>
              val (va, vb) = (a / 7 * 1.0, b / 7 * 1.0)
              Some(va + (vb - va) * (g - a).toDouble / (b - a).toDouble)
            case _ => None
          }
        }
      assert(got(g) == expect, s"grid $g")
    }
  }

  test("a window opened in the first partition closes in the last") {
    import spark.implicits._
    // single window spanning the entire range
    val df = spark.range(10000).select(col("id").as("ts"),
      when(col("id") === 0, 1).when(col("id") === 9999, 8).otherwise(5)
        .as("v"))
    val out = TimeOps.eventWindows(df, col("v") === 1, col("v") === 8,
      col("ts"), Nil).select("_wstart").distinct()
      .as[Long].collect().toSeq
    assert(out == Seq(0L))
  }

  test("keyless state/count windows match the constant-key keyed path") {
    import spark.implicits._
    // state runs of varying length, plus planted NULL states (which
    // must not open windows), spread over many partitions
    val n = 20000
    val df = spark.range(n)
      .select(col("id").as("ts"),
        when(col("id") % 97 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), (col("id") / 50).cast("long")
            .cast("string"))).as("st"))
      .repartition(16)
    val keyless = TimeOps.stateWindows(df, col("st"), col("ts"), Nil)
      .select("ts", "_wid").orderBy("ts").collect()
    val keyed = TimeOps.stateWindows(df.withColumn("k", lit(1)),
        col("st"), col("ts"), Seq(col("k")))
      .select("ts", "_wid").orderBy("ts").collect()
    assert(keyless.length == n)
    keyless.zip(keyed).foreach { case (a, b) => assert(a == b) }

    val cKeyless = TimeOps.countWindows(df, 137, col("ts"), Nil)
      .select("ts", "_wid").orderBy("ts").collect()
    val cKeyed = TimeOps.countWindows(df.withColumn("k", lit(1)),
        137, col("ts"), Seq(col("k")))
      .select("ts", "_wid").orderBy("ts").collect()
    cKeyless.zip(cKeyed).foreach { case (a, b) => assert(a == b) }
  }

  test("release() drops the retained sorted copies once results are " +
      "materialized") {
    import graft.ops.GlobalScan
    GlobalScan.release() // baseline: no scan-owned caches
    val before = spark.sparkContext.getPersistentRDDs.size
    val df = spark.range(20000).select(col("id").as("ts"))
    val out = GlobalScan.rowNumber(df, Seq(col("ts")), "_rn")
    assert(out.count() == 20000)
    assert(GlobalScan.retainedCount >= 1)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "twoPass should persist its sorted copy")
    GlobalScan.release()
    assert(GlobalScan.retainedCount == 0)
    assert(spark.sparkContext.getPersistentRDDs.size <= before,
      "release() must unpersist every scan-retained sorted copy")
  }

  test("Verify-style pass over the keyless SparkEntry queries retains " +
      "nothing after release()") {
    import graft.ops.GlobalScan
    GlobalScan.release()
    val sfDir = "/root/testdata/sf0.001"
    // the queries whose keyless paths route through GlobalScan —
    // driven exactly as graft.Verify drives them (materialize, then
    // release between queries)
    val keyless = Seq("imputation_keyless", "anomaly_window_keyless",
      "session_window_keyless", "state_window_keyless",
      "count_window_keyless", "window_join_keyless")
    keyless.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count()
      GlobalScan.release()
      assert(GlobalScan.retainedCount == 0,
        s"$name left ${GlobalScan.retainedCount} retained copies")
    }
  }

  test("fused keyless anomaly numbering shuffles exactly once") {
    import graft.ops.AnalyticsOps
    val df = spark.range(50000)
      .select(col("id").as("ts"),
        when(col("id") % 997 === 0, 1e6).otherwise(col("id") % 10)
          .cast("double").as("value"))
      .repartition(16)
    val out = AnalyticsOps.anomalyRows(df, col("ts"), "value", Nil)
    // ONE range sort end-to-end: the dual numbering replays the same
    // sorted partitions, so the lineage holds a single shuffle (the
    // upstream .repartition(16) is re-used, not re-shuffled per pass)
    val shuffles = out.rdd.toDebugString.linesIterator
      .count(_.contains("ShuffledRowRDD"))
    assert(shuffles <= 2, // range sort + the explicit upstream repartition
      s"expected one scan shuffle over the input, got lineage:\n" +
        out.rdd.toDebugString)
    assert(out.rdd.getNumPartitions > 1)
    // spikes every 997 rows are isolated single-row windows
    val wins = out.select("_wgrp").distinct().count()
    assert(wins == 50000 / 997 + 1)
  }

  test("bidirectional keyless carry (imputation) shuffles exactly once") {
    import graft.ops.AnalyticsOps
    val df = spark.range(30000)
      .select(col("id").as("ts"),
        when(col("id") % 7 === 0, lit(null).cast("double"))
          .otherwise(col("id").cast("double")).as("value"))
      .repartition(16)
    val out = AnalyticsOps.imputeLinear(df, col("ts"), "value", Nil)
    val shuffles = out.rdd.toDebugString.linesIterator
      .count(_.contains("ShuffledRowRDD"))
    assert(shuffles <= 2, // one range sort + the explicit repartition
      s"backward carry must not re-sort; lineage:\n" + out.rdd.toDebugString)
    // interior nulls are linearly interpolated between their neighbours
    import spark.implicits._
    val got = out.select("ts", "value").as[(Long, Double)].collect().toMap
    assert(got(7L) == 7.0 && got(14L) == 14.0)
    assert(out.count() == 30000)
  }

  test("keyless sessions merge across partition boundaries") {
    import spark.implicits._
    // gaps of 5 every 40 rows (within gap=10), gaps of 100 every 1000
    // rows (session breaks) — sessions straddle range partitions
    val n = 20000
    val df = spark.range(n)
      .select((col("id") * 3 +
        when(col("id") % 1000 === 0, 100).otherwise(0) +
        when(col("id") % 40 === 0, 5).otherwise(0)).as("ts"))
      .repartition(16)
    val keyless = TimeOps.sessionize(df, col("ts"), 10L, Nil)
      .select("ts", "_session").orderBy("ts").collect()
    val keyed = TimeOps.sessionize(df.withColumn("k", lit(1)),
        col("ts"), 10L, Seq(col("k")))
      .select("ts", "_session").orderBy("ts").collect()
    assert(keyless.length == n)
    keyless.zip(keyed).foreach { case (a, b) => assert(a == b) }
  }

  test("keyless EXTEND state windows and sliding count windows match " +
      "the constant-key keyed path") {
    import spark.implicits._
    val n = 9000
    val df = spark.range(n)
      .select(col("id").as("ts"),
        when(col("id") % 7 === 0, lit(null).cast("string"))
          .otherwise(concat(lit("s"), (col("id") / 40).cast("long")
            .cast("string"))).as("st"))
      .repartition(16)
    val keyedDf = df.withColumn("k", lit(1))
    for (ext <- 0 to 2) {
      val keyless = TimeOps.stateWindowsExtend(df, col("st"), col("ts"),
          Nil, ext)
        .select("ts", "_wid").orderBy("ts").collect()
      val keyed = TimeOps.stateWindowsExtend(keyedDf, col("st"),
          col("ts"), Seq(col("k")), ext)
        .select("ts", "_wid").orderBy("ts").collect()
      assert(keyless.length == keyed.length, s"extend=$ext row count")
      keyless.zip(keyed).foreach { case (a, b) =>
        assert(a == b, s"extend=$ext") }
    }
    val sKeyless = TimeOps.slidingCountWindows(df, 50, 20, col("ts"), Nil)
      .select("ts", "_wid").orderBy("ts", "_wid").collect()
    val sKeyed = TimeOps.slidingCountWindows(keyedDf, 50, 20, col("ts"),
        Seq(col("k")))
      .select("ts", "_wid").orderBy("ts", "_wid").collect()
    assert(sKeyless.length == sKeyed.length)
    sKeyless.zip(sKeyed).foreach { case (a, b) => assert(a == b) }
  }
}
