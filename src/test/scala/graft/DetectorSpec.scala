package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{AnalyticsOps, BuiltinDetector, Detector}

/** The pluggable-analytics contract (tanalytics.h: the reference's
  * anode service): a custom model implements [[Detector]] and the
  * analytics queries run unchanged against it. The custom detector here
  * is the ONNX/HTTP stand-in — a per-series `flatMapGroups` calling a
  * local scoring function, which is exactly where a model call goes. */
class DetectorSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Constant-forecast + every-5th-row-anomalous "model service". */
  private object StubModel extends Detector {
    def forecast(df: DataFrame, tsUs: Column, valueCol: String,
        keys: Seq[String], horizon: Int, stepUs: Long, t0Us: Long)
        : DataFrame =
      df.groupBy(keys.map(col): _*)
        .agg(max(tsUs.cast("long")).as("_tmax"))
        .withColumn("_j", explode(sequence(lit(1), lit(horizon))))
        .select(keys.map(col) :+
          (col("_tmax") + col("_j") * lit(stepUs)).as("_frowts") :+
          lit(42.0).as("forecast") :+ lit(41.0).as("_flow") :+
          lit(43.0).as("_fhigh"): _*)

    def imputeLinear(df: DataFrame, tsUs: Column, valueCol: String,
        keys: Seq[String]): DataFrame =
      df.withColumn("_impmark", col(valueCol).isNull)
        .withColumn(valueCol,
          coalesce(col(valueCol).cast("double"), lit(0.0)))

    // per-series model call: group rows by key, hand the series to a
    // scoring function — swap `score` for an HTTP POST / ONNX session
    // and the plumbing (shuffle by key, bounded series per task) holds
    def anomalyRows(df: DataFrame, tsUs: Column, valueCol: String,
        keys: Seq[String], z: Double): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      def score(series: Seq[(Long, Double)]): Seq[(Long, Long)] =
        series.sortBy(_._1).zipWithIndex.collect {
          case ((t, _), i) if i % 5 == 0 => (t, (i / 5).toLong)
        }
      val slim = df.select(col(keys.head).cast("long").as("_k"),
        tsUs.cast("long").as("_t"), col(valueCol).cast("double").as("_v"))
        .as[(Long, Long, Double)]
      val flagged = slim.groupByKey(_._1)
        .flatMapGroups { (k, it) =>
          score(it.map(r => (r._2, r._3)).toSeq)
            .map { case (t, g) => (k, t, g) }
        }
        .toDF(keys.head, "_t", "_wgrp")
      df.withColumn("_t", tsUs.cast("long"))
        .join(flagged, Seq(keys.head, "_t")).drop("_t")
    }
  }

  /** Deterministic stand-in for the anode wire protocol: forecasts
    * the series mean, imputes -1.0, flags values above 90. */
  private object FakeTransport extends graft.ops.AnalyticsTransport {
    def forecast(algo: String, ts: Array[Long], values: Array[Double],
        horizon: Int, stepUs: Long, t0Us: Long)
        : Seq[(Long, Double, Double, Double)] = {
      val m = values.sum / values.length
      (0 until horizon).map(h =>
        (t0Us + h.toLong * stepUs, m, m - 1.0, m + 1.0))
    }
    def impute(algo: String, ts: Array[Long],
        values: Array[Option[Double]]): Seq[Double] =
      values.toSeq.map(_.getOrElse(-1.0))
    def anomaly(algo: String, ts: Array[Long], values: Array[Double],
        z: Double): Seq[Boolean] = values.toSeq.map(_ > 90.0)
  }

  test("ServiceDetector routes whole ts-ordered series through the " +
      "transport and keeps the Detector output contracts") {
    val det = graft.ops.ServiceDetector(FakeTransport)
    val events = Tables(spark, sf, "events")

    val fc = det.forecast(events, col("ts"), "value", Seq("user_id"),
      horizon = 3, stepUs = 86400000000L, t0Us = 1704067200000000L)
    val perKey = fc.groupBy("user_id").count().collect()
    assert(perKey.nonEmpty && perKey.forall(_.getLong(1) == 3L))
    // the transport saw the whole series: forecast == per-key mean
    val means = events.groupBy("user_id")
      .agg(avg("value").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    fc.collect().foreach { r =>
      assert(math.abs(r.getAs[Double]("forecast") -
        means(r.getLong(0))) < 1e-9)
      assert(r.getAs[Double]("_fhigh") - r.getAs[Double]("_flow") == 2.0)
    }

    val gapped = events.withColumn("value",
      when(col("event_id") % 7 === 0, lit(null).cast("double"))
        .otherwise(col("value")))
    val im = det.imputeLinear(gapped, col("ts"), "value", Seq("user_id"))
    assert(im.count() == gapped.count(), "impute must keep every row")
    val marked = im.filter(col("_impmark")).collect()
    assert(marked.length ==
      gapped.filter(col("value").isNull).count().toInt)
    assert(marked.forall(_.getAs[Double]("value") == -1.0))

    val an = det.anomalyRows(events, col("ts"), "value", Seq("user_id"),
      z = 2.0)
    val expect = events.filter(col("value") > 90.0).count()
    assert(an.count() == expect, "anomaly rows must match the flag rule")
    // _wgrp groups consecutive flagged rows per key, starting at 0
    val g0 = an.groupBy("user_id").agg(min("_wgrp").as("g")).collect()
    assert(g0.forall(_.getLong(1) == 0L))
  }

  test("CREATE/UPDATE/DROP ANODE text + SHOW ANODES/ins_anodes " +
      "round out the service registration surface") {
    val cat = new graft.sql.GraftCatalog(spark)
    cat.exec("CREATE ANODE 'http://anode1:6090'")
    cat.exec("CREATE ANODE 'http://anode2:6090'")
    val shown = cat.sql("SHOW ANODES").collect()
    assert(shown.map(r => (r.getInt(0), r.getString(1))).toSeq ==
      Seq((1, "http://anode1:6090"), (2, "http://anode2:6090")))
    cat.exec("UPDATE ANODE 1")
    cat.exec("UPDATE ALL ANODES")
    assert(cat.sql("SHOW ANODES FULL")
      .filter(col("type") === "forecast").count() == 2)
    // served through the dialect information_schema path too
    assert(cat.sql("SELECT count(*) AS n FROM " +
      "information_schema.ins_anodes").head.getLong(0) == 2L)
    cat.exec("DROP ANODE 1")
    assert(cat.sql("SHOW ANODES").count() == 1)
    intercept[IllegalArgumentException](cat.exec("UPDATE ANODE 9"))
    // admin catalog rows: executors-as-dnodes, root user, cluster id
    val dn = cat.sql("SHOW DNODES").collect()
    assert(dn.nonEmpty && dn.forall(_.getAs[String]("status") == "ready"))
    assert(cat.sql("SELECT name FROM information_schema.ins_users")
      .head.getString(0) == "root")
    assert(cat.sql("SHOW CLUSTER").head.getAs[String]("name") == "graft")
  }

  test("builtin binding reproduces the in-engine models") {
    val events = Tables(spark, sf, "events")
    val a = BuiltinDetector.forecast(events, col("ts"), "value",
      Seq("user_id"), 3, 86400000000L, 1704067200000000L).collect()
    val b = AnalyticsOps.forecast(events, col("ts"), "value",
      Seq("user_id"), 3, 86400000000L, 1704067200000000L).collect()
    assert(a.toSeq == b.toSeq)
  }

  test("a custom model slots into the queries without query changes") {
    val q = Analytics.queriesWith(StubModel)
    val fc = q("forecast_linear")(spark, sf).collect()
    assert(fc.nonEmpty)
    assert(fc.forall(_.getAs[Double]("forecast") == 42.0))
    assert(fc.forall(r => r.getAs[Double]("_flow") == 41.0 &&
      r.getAs[Double]("_fhigh") == 43.0))

    val an = q("anomaly_window")(spark, sf).collect()
    assert(an.nonEmpty)
    // every 5th row per user is anomalous and isolated anomalies form
    // their own windows → every window has exactly one row
    assert(an.forall(_.getAs[Long]("n") == 1L))

    val im = q("imputation_linear")(spark, sf).collect()
    assert(im.nonEmpty)
    // the stub imputes zeros where the query planted nulls
    assert(im.filter(_.getAs[Boolean]("_impmark"))
      .forall(_.getAs[Double]("value") == 0.0))
  }
}
