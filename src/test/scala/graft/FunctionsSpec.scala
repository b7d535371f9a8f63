package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Aggregators

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("dtw: identity distance is 0, symmetry, known small case") {
    val a = Seq(1.0, 2.0, 3.0, 4.0)
    val b = Seq(1.0, 2.0, 2.0, 3.0, 4.0)
    assert(Aggregators.dtwDistance(a, a) == 0.0)
    assert(Aggregators.dtwDistance(a, b) == Aggregators.dtwDistance(b, a))
    // warping absorbs the duplicated 2.0 at zero cost
    assert(Aggregators.dtwDistance(a, b) == 0.0)
    assert(Aggregators.dtwDistance(Seq(0.0, 0.0), Seq(1.0, 1.0)) == 2.0)
  }

  test("tlcc: perfectly lagged series correlate at the right lag") {
    val x = Seq.tabulate(50)(i => math.sin(i / 5.0))
    val y = Seq.tabulate(50)(i => math.sin((i - 3) / 5.0)) // y lags x by 3
    val atLag = Aggregators.tlccAt(x, y, -3)
    assert(math.abs(atLag - 1.0) < 1e-9, s"corr at matching lag was $atLag")
    assert(Aggregators.tlccAt(x, y, 0) < atLag)
  }

  test("seeded hash-rank sample: deterministic, sorted, drawn from input") {
    val events = Tables(spark, sf, "events")
    val out = SparkEntry.queries("sf_sample")(spark, sf).collect()
    assert(out.length == events.select("user_id").distinct().count())
    val byUser = events.groupBy("user_id").agg(
      collect_list("value").as("all"), count(lit(1)).as("n")).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[collection.Seq[Double]]("all").toSet, r.getAs[Long]("n"))).toMap
    out.foreach { r =>
      val s = (1 to 5).flatMap(i =>
        if (r.isNullAt(r.fieldIndex(s"s$i"))) None
        else Some(r.getAs[Double](s"s$i")))
      val (all, n) = byUser(r.getAs[Long]("user_id"))
      assert(r.getAs[Int]("sample_n") == math.min(5, n))
      assert(s.length == math.min(5, n))
      assert(s == s.sorted, "sample columns must be ascending")
      assert(s.forall(all.contains), "sample element not drawn from input")
    }
    // deterministic: a re-run over a different partitioning is identical
    val again = SparkEntry.queries("sf_sample")(spark, sf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("randomized reservoir Aggregator: exact when n<=k, uniform-ish") {
    import spark.implicits._
    // n <= k: the reservoir IS the input
    val small = Seq.tabulate(4)(i => ("g", i.toDouble)).toDF("g", "v")
    val exact = small.groupBy($"g")
      .agg(Aggregators.sample($"v", 5).as("s"))
      .head().getAs[collection.Seq[Double]]("s")
    assert(exact.sorted == Seq(0.0, 1.0, 2.0, 3.0))
    // n > k: size k, subset of input, merge across partitions holds
    val big = (1 to 400).map(i => ("g", i.toDouble)).toDF("g", "v")
      .repartition(8)
    val got = big.groupBy($"g")
      .agg(Aggregators.sample($"v", 5).as("s"))
      .head().getAs[collection.Seq[Double]]("s")
    assert(got.length == 5)
    assert(got.forall(v => v >= 1.0 && v <= 400.0 && v == v.floor))
    assert(got.distinct.length == 5, "reservoir must sample w/o replacement")
  }

  test("statecount resets on failures and counts consecutively") {
    import spark.implicits._
    val df = Seq(
      (1L, 1L, 60.0), (1L, 2L, 70.0), (1L, 3L, 10.0),
      (1L, 4L, 80.0), (1L, 5L, 90.0), (1L, 6L, 95.0)
    ).toDF("user_id", "ts", "value")
    val got = df.withColumn("sc",
      graft.ops.SeriesOps.statecount(col("value") > 50, col("ts"),
        Seq(col("user_id"))))
      .orderBy("ts").select("sc").collect().map(_.getLong(0))
    assert(got.sameElements(Array(1L, 2L, -1L, 1L, 2L, 3L)))
  }

  test("statecount skips NULL rows: NULL out, streak not reset") {
    // 22-function.md STATECOUNT: "adding 1 if the condition is true,
    // resetting to -1 if false, and skipping the data if it is NULL"
    import spark.implicits._
    val df = Seq(
      (1L, 1L, Some(60.0)), (1L, 2L, None), (1L, 3L, Some(70.0)),
      (1L, 4L, Some(10.0)), (1L, 5L, None), (1L, 6L, Some(80.0))
    ).toDF("user_id", "ts", "value")
    val got = df.withColumn("sc",
      graft.ops.SeriesOps.statecount(col("value") > 50, col("ts"),
        Seq(col("user_id"))))
      .orderBy("ts").select("sc").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    // ts2 NULL: emits NULL, run survives -> ts3 counts 2; ts4 false
    // resets; ts5 NULL emits NULL without consuming the reset; ts6
    // starts a new run at 1
    assert(got.sameElements(Array[java.lang.Long](1L, null, 2L, -1L, null, 1L)))
  }

  test("stateduration skips NULL rows and measures from the run's first true") {
    import spark.implicits._
    val df = Seq(
      (1L, 1000000L, Some(60.0)), (1L, 2000000L, None),
      (1L, 3000000L, Some(70.0)), (1L, 4000000L, Some(10.0)),
      (1L, 5000000L, Some(80.0))
    ).toDF("user_id", "ts", "value")
    val got = df.withColumn("sd",
      graft.ops.SeriesOps.stateduration(col("value") > 50, col("ts"),
        Seq(col("user_id")), 1000000L))
      .orderBy("ts").select("sd").collect()
      .map(r => if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)))
    // run starts at ts=1s; NULL at 2s skipped; at 3s elapsed 2s;
    // false at 4s resets (-1); new run at 5s starts at 0
    assert(got.sameElements(Array[java.lang.Long](0L, null, 2L, -1L, 0L)))
  }

  test("twa of a constant series equals the constant") {
    import spark.implicits._
    val df = (1 to 100).map(i => (7L, i.toLong * 1000000L, 42.0))
      .toDF("user_id", "ts", "value")
    // reuse the query lowering shape directly on a constant series
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"user_id").orderBy($"ts")
    val contrib = ($"value" + lag($"value", 1).over(w))
      .cast(org.apache.spark.sql.types.DecimalType(18, 2)) *
      ($"ts" - lag($"ts", 1).over(w))
        .cast(org.apache.spark.sql.types.DecimalType(18, 0))
    val twa = df.withColumn("_c", contrib).groupBy($"user_id")
      .agg((sum($"_c").cast("double") / 2 /
        (max($"ts") - min($"ts")).cast("double")).as("twa"))
      .head.getAs[Double]("twa")
    assert(math.abs(twa - 42.0) < 1e-9)
  }

  test("apercentile stays within tolerance of the exact percentile") {
    val e = Tables(spark, sf, "events")
    val joined = e.groupBy(col("user_id"))
      .agg(percentile_approx(col("value"), lit(0.5), lit(10000)).as("ap50"),
        expr("percentile(value, 0.5)").as("p50"),
        (max(col("value")) - min(col("value"))).as("range"))
    val bad = joined
      .filter(abs(col("ap50") - col("p50")) > col("range") * 0.05).count()
    assert(bad == 0, "apercentile(0.5) drifted > 5% of range from exact")
  }
}
