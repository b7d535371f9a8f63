package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** End-to-end mirror of the reference's own stream perf scenario
  * (tools/tsbs-tdengine/resource/config/cases.yaml scenario A2):
  *
  * {{{
  * create stream ... sliding(1m) from readings
  *   stream_options(IGNORE_DISORDER) into res_a2 as
  *   select _tcurrent_ts ts, count(*), avg(fuel_consumption)
  *   from (select fuel_consumption, last(grade) cur_grade
  *         from readings
  *         where _c0 >= _tprev_ts and _c0 <= _tcurrent_ts
  *         partition by tbname)
  *   where cur_grade > 70
  * }}}
  *
  * Lowering: sliding trigger = watermarked tumbling window in append
  * mode (IGNORE_DISORDER → watermark 0); the calc binds per-window
  * bounds and runs the partition-by-tbname subquery as a window
  * function over the source table. Emits the reference harness's
  * latency metric shape (tools/tsbs-tdengine/src/outMetrics.py Delay:
  * cnt/min/avg/p50/p99/max). */
class TsbsIotSpec extends AnyFunSuite {
  import SparkTestSession._

  private case class Delay(cnt: Int, min: Long, avg: Double, p50: Long,
      p99: Long, max: Long)
  private def delayOf(lat: Seq[Long]): Delay = {
    val s = lat.sorted
    def pct(q: Double) = s(
      math.min(s.length - 1, math.max(0, math.ceil(q * s.length).toInt - 1)))
    Delay(s.length, s.head, s.sum.toDouble / s.length,
      pct(0.50), pct(0.99), s.last)
  }

  test("A2: sliding 1m trigger, per-truck last(grade) gate, delay metrics") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def t(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // readings: 3 trucks × 4 minutes × 6 samples/min. grade is chosen so
    // the per-window last(grade) gate keeps t0 always, t1 never, t2 on
    // even minutes — fuel is truck-independent so expected avgs are flat
    val readings = for {
      m <- 0 until 4; i <- 0 until 6; truck <- Seq("t0", "t1", "t2")
    } yield {
      val grade = truck match {
        case "t0" => 80.0
        case "t1" => 50.0
        case _    => if (m % 2 == 0) 90.0 else 10.0
      }
      (t(m * 60L + i * 10L), truck, 5.0 + m + i * 0.1, grade)
    }
    val batch = readings.toDF("ts", "tbname", "fuel", "grade")

    val mem = MemoryStream[(java.sql.Timestamp, String, Double, Double)]
    val src = mem.toDF().toDF("ts", "tbname", "fuel", "grade")
    val fired = Streams.intervalTrigger(src, "ts", "1 minute", "1 minute",
        "0 seconds", Nil, valueCol = "fuel")
      .select(unix_micros(col("_twstart")).as("_twstart"),
        unix_micros(col("_twend")).as("_twend"))

    // the A2 calc: subquery output is one row per reading with the
    // partition's last(grade) attached; the outer query counts and
    // averages the rows whose partition passed the gate
    def calc(wb: Streams.WindowBounds): DataFrame = {
      val w = Window.partitionBy(col("tbname")).orderBy(col("ts"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      batch
        .filter(unix_micros(col("ts")) >= wb.startUs &&
          unix_micros(col("ts")) < wb.endUs)
        .withColumn("cur_grade", last(col("grade")).over(w))
        .filter(col("cur_grade") > 70)
        .agg(count(lit(1)).as("n"), avg(col("fuel")).as("avg_fuel"))
        .withColumn("ts", lit(wb.endUs)) // _tcurrent_ts
    }

    var results = Vector.empty[(Long, Long, Double)]
    var delays = Vector.empty[Long]
    val hook = Streams.calcPerWindow(fired, calc,
      df => results ++= df.collect().map(r => (r.getAs[Long]("ts"),
        r.getAs[Long]("n"), r.getAs[Double]("avg_fuel"))))
    // per-batch trigger→result latency, one sample per fired window —
    // the harness's insert→result delay minus the ingest leg
    val timed: (DataFrame, Long) => Unit = (b, id) => {
      val nWin = b.count().toInt
      val t0 = System.nanoTime()
      hook(b, id)
      if (nWin > 0)
        delays ++= Vector.fill(nWin)((System.nanoTime() - t0) / 1000000L)
    }
    val q = fired.writeStream.outputMode("append").foreachBatch(timed).start()
    mem.addData(readings: _*)
    q.processAllAvailable()
    mem.addData((t(3600), "t0", 0.0, 0.0)) // advance watermark past all
    q.processAllAvailable()
    q.stop()

    // expected: minute m keeps 2 trucks × 6 rows on even m, 1 × 6 on
    // odd m; fuel avg per window = 5 + m + 0.25
    val expected = (0 until 4).map { m =>
      ((m + 1) * 60L * 1000000L, if (m % 2 == 0) 12L else 6L, 5.25 + m)
    }.toSet
    assert(results.size == 4, results)
    results.foreach { case (ts, n, avgFuel) =>
      val exp = expected.find(_._1 == ts)
      assert(exp.nonEmpty, s"unexpected window end $ts")
      assert(n == exp.get._2, s"window $ts: n=$n expected ${exp.get._2}")
      assert(math.abs(avgFuel - exp.get._3) < 1e-9,
        s"window $ts: avg=$avgFuel expected ${exp.get._3}")
    }

    // the reference harness's delay record over the fired windows
    val d = delayOf(delays)
    assert(d.cnt == 4)
    assert(d.min >= 0 && d.min <= d.p50 && d.p50 <= d.p99 && d.p99 <= d.max)
    assert(d.avg >= d.min && d.avg <= d.max)
  }
}
