package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{JoinOps, TimeOps}
import graft.sql.GraftSql

/** ns-precision round trips (PRECISION 'ns', sql.y:923; SURVEY §7.4
  * risk 1): timestamps are epoch Longs in the table's native tick, so
  * every window/join operator must preserve sub-µs digits end-to-end.
  * The fixtures place rows INSIDE the same microsecond — any µs
  * truncation on the path conflates them and fails. */
class NsPrecisionSpec extends AnyFunSuite {
  import SparkTestSession._

  test("interval windows split at ns boundaries") {
    import spark.implicits._
    // 500ns windows; rows 10_000, 10_499, 10_500 ns
    val df = Seq((1L, 10000L), (1L, 10499L), (1L, 10500L)).toDF("k", "ts")
    val w = TimeOps.assignIntervals(df, col("ts"), 500L)
      .groupBy(col("_wstart")).agg(count(lit(1)).as("n"))
      .orderBy(col("_wstart")).collect()
    assert(w.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((10000L, 2L), (10500L, 1L)))
  }

  test("asof join distinguishes rows within one microsecond") {
    import spark.implicits._
    // both left rows sit inside µs 10; only the later one has a
    // right match at 10_500 ns under >= (prev-pick) semantics
    val left = Seq((1L, 10000L), (1L, 10999L)).toDF("k", "ts")
    val right = Seq((1L, 10500L, "r")).toDF("k", "ts", "v")
    val j = JoinOps.asofJoin(left, right, Seq("k"), "ts", "ts", ">=",
        Seq("v"))
      .orderBy(col("ts")).collect()
    assert(j.length == 2)
    assert(j(0).getAs[String]("r_v") == null) // 10_000 < 10_500
    assert(j(1).getAs[String]("r_v") == "r") // 10_999 >= 10_500
  }

  test("dialect durations scale to the table precision") {
    assert(GraftSql.durNative("1h", 1000000000L) == 3600000000000L)
    assert(GraftSql.durNative("1u", 1000000000L) == 1000L)
    assert(GraftSql.durNative("10m", 1000L) == 600000L)
    assert(GraftSql.durNative("42", 1000000000L) == 42L) // native ticks
    // finer than the precision representable -> loud failure, never a
    // silent truncation
    intercept[IllegalArgumentException] {
      GraftSql.durNative("500u", 1000L)
    }
  }

  test("elapsed unit scales by the surface precision, not fixed µs") {
    import spark.implicits._
    // ms-precision surface: 100 events 1 s apart -> span 99000 ms ticks
    val ms = (0 until 100).map(i => (i.toLong, i * 1000L))
      .toDF("event_id", "ts")
    val gotMs = GraftSql.query(spark, _ => ms,
      """SELECT elapsed(ts) AS raw, elapsed(ts, 1m) AS mins FROM t""",
      perSecond = 1000L).collect()(0)
    assert(gotMs.getLong(0) == 99000L)
    assert(gotMs.getDouble(1) == 99000.0 / 60000.0) // NOT /60e6
    // ns surface: same span in ns ticks
    val ns = (0 until 100).map(i => (i.toLong, i * 1000000000L))
      .toDF("event_id", "ts")
    val gotNs = GraftSql.query(spark, _ => ns,
      """SELECT elapsed(ts, 1s) AS secs FROM t""",
      perSecond = 1000000000L).collect()(0)
    assert(gotNs.getDouble(0) == 99.0)
  }

  test("dialect INTERVAL at ns matches the direct ns lowering") {
    import spark.implicits._
    val df = (0 until 100).map(i => (i.toLong, i * 250L))
      .toDF("event_id", "ts") // 250ns apart
    val dialect = GraftSql.query(spark, _ => df,
      """SELECT _wstart, count(*) AS n FROM t INTERVAL(1u)
         ORDER BY _wstart""", perSecond = 1000000000L)
    val direct = TimeOps.assignIntervals(df, col("ts"), 1000L)
      .groupBy(col("_wstart")).agg(count(lit(1)).as("n"))
      .orderBy(col("_wstart"))
    assert(dialect.collect().map(_.toSeq).toSeq ==
      direct.collect().map(_.toSeq).toSeq)
  }
}
