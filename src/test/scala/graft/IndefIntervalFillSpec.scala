package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** Indefinite-rows functions (csum/diff/derivative/mavg/statecount/
  * stateduration) PER INTERVAL WINDOW with FILL, pinned to the
  * reference's own expected values (test/cases/11-Functions/
  * 04-Timeseries/test_fun_ts_interval_fill.py, feature "Since:
  * 3.4.1.0"): the function resets at each window boundary; FILL
  * inserts one row per query-range window whose function OUTPUT is
  * empty; NULL_F/VALUE_F force the grid even with no data in range;
  * PREV/NEXT/LINEAR reject, and sample() rejects every fill mode.
  */
class IndefIntervalFillSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  // 2024-01-01 00:00:00 UTC in µs; the reference dataset's rows sit at
  // second offsets 1..5 with ms-level spacing
  private val base = 1704067200000000L
  private def ts(sec: Int, ms: Int = 0): Long =
    base + sec * 1000000L + ms * 1000L

  // [1s,2s): 10,20,30,40,50; [2s,3s) gap; [3s,4s): 60,70,80;
  // [4s,5s) gap; [5s,6s): 100
  private lazy val t1: DataFrame = Seq(
    (ts(1), 10), (ts(1, 200), 20), (ts(1, 400), 30),
    (ts(1, 600), 40), (ts(1, 800), 50),
    (ts(3), 60), (ts(3, 200), 70), (ts(3, 400), 80),
    (ts(5), 100)
  ).toDF("ts", "val")

  private def resolve(n: String): DataFrame = n.toLowerCase match {
    case "t1" => t1
    case other => Tables(spark, sf, other)
  }

  private val WHERE =
    s"WHERE ts >= ${ts(1)} AND ts < ${ts(6)}"

  private def q(sql: String): Seq[Seq[Any]] =
    GraftSql.query(spark, resolve, sql).collect()
      .map(_.toSeq.map {
        case null => null
        case x: Long => x
        case x: Int => x.toLong
        case x: java.math.BigDecimal => x.doubleValue
        case x: Double => x
        case x => x
      }.toSeq).toSeq

  private def ws(rows: (Int, Any)*): Seq[Seq[Any]] =
    rows.map { case (s, v) => Seq(ts(s), v) }

  test("csum fill(null) / fill(value,0) / fill(none)") {
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$WHERE interval(1s) fill(null)") == ws(
      1 -> 10L, 1 -> 30L, 1 -> 60L, 1 -> 100L, 1 -> 150L,
      2 -> null, 3 -> 60L, 3 -> 130L, 3 -> 210L, 4 -> null, 5 -> 100L))
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$WHERE interval(1s) fill(value, 0)") == ws(
      1 -> 10L, 1 -> 30L, 1 -> 60L, 1 -> 100L, 1 -> 150L,
      2 -> 0L, 3 -> 60L, 3 -> 130L, 3 -> 210L, 4 -> 0L, 5 -> 100L))
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$WHERE interval(1s) fill(none)") == ws(
      1 -> 10L, 1 -> 30L, 1 -> 60L, 1 -> 100L, 1 -> 150L,
      3 -> 60L, 3 -> 130L, 3 -> 210L, 5 -> 100L))
  }

  test("diff fill modes: N-1 rows per window, 1-row window fills") {
    assert(q(s"select cast(_wstart as bigint) as w, diff(val) from t1 " +
      s"$WHERE interval(1s) fill(null)") == ws(
      1 -> 10L, 1 -> 10L, 1 -> 10L, 1 -> 10L,
      2 -> null, 3 -> 10L, 3 -> 10L, 4 -> null, 5 -> null))
    assert(q(s"select cast(_wstart as bigint) as w, diff(val) from t1 " +
      s"$WHERE interval(1s) fill(value, -1)") == ws(
      1 -> 10L, 1 -> 10L, 1 -> 10L, 1 -> 10L,
      2 -> -1L, 3 -> 10L, 3 -> 10L, 4 -> -1L, 5 -> -1L))
    assert(q(s"select cast(_wstart as bigint) as w, diff(val) from t1 " +
      s"$WHERE interval(1s) fill(none)") == ws(
      1 -> 10L, 1 -> 10L, 1 -> 10L, 1 -> 10L, 3 -> 10L, 3 -> 10L))
  }

  test("derivative fill(null): per-window slopes") {
    assert(q(s"select cast(_wstart as bigint) as w, " +
      s"derivative(val,1s,0) from t1 $WHERE interval(1s) fill(null)")
      == ws(
      1 -> 50.0, 1 -> 50.0, 1 -> 50.0, 1 -> 50.0,
      2 -> null, 3 -> 50.0, 3 -> 50.0, 4 -> null, 5 -> null))
  }

  test("mavg fill(value,-1): N-k+1 rows per window") {
    assert(q(s"select cast(_wstart as bigint) as w, mavg(val,2) from " +
      s"t1 $WHERE interval(1s) fill(value, -1)") == ws(
      1 -> 15.0, 1 -> 25.0, 1 -> 35.0, 1 -> 45.0,
      2 -> -1.0, 3 -> 65.0, 3 -> 75.0, 4 -> -1.0, 5 -> -1.0))
  }

  test("statecount / stateduration fill(null)") {
    assert(q(s"select cast(_wstart as bigint) as w, " +
      s"statecount(val,'GT',0) from t1 $WHERE interval(1s) fill(null)")
      == ws(
      1 -> 1L, 1 -> 2L, 1 -> 3L, 1 -> 4L, 1 -> 5L,
      2 -> null, 3 -> 1L, 3 -> 2L, 3 -> 3L, 4 -> null, 5 -> 1L))
    // 1a = 1 ms; 200 ms row spacing => 0,200,400,…
    assert(q(s"select cast(_wstart as bigint) as w, " +
      s"stateduration(val,'GT',0,1a) from t1 $WHERE interval(1s) " +
      "fill(null)") == ws(
      1 -> 0L, 1 -> 200L, 1 -> 400L, 1 -> 600L, 1 -> 800L,
      2 -> null, 3 -> 0L, 3 -> 200L, 3 -> 400L, 4 -> null, 5 -> 0L))
  }

  test("leading gap windows fill from the query range start") {
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"WHERE ts >= ${ts(0)} AND ts < ${ts(4)} interval(1s) " +
      "fill(null)") == ws(
      0 -> null, 1 -> 10L, 1 -> 30L, 1 -> 60L, 1 -> 100L, 1 -> 150L,
      2 -> null, 3 -> 60L, 3 -> 130L, 3 -> 210L))
  }

  test("NULL/VALUE give zero rows on an empty range; _F force the grid") {
    val empty = s"WHERE ts >= ${ts(6)} AND ts < ${ts(9)}"
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$empty interval(1s) fill(null)").isEmpty)
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$empty interval(1s) fill(value, 0)").isEmpty)
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$empty interval(1s) fill(null_f)") == ws(
      6 -> null, 7 -> null, 8 -> null))
    assert(q(s"select cast(_wstart as bigint) as w, csum(val) from t1 " +
      s"$empty interval(1s) fill(value_f, 0)") == ws(
      6 -> 0L, 7 -> 0L, 8 -> 0L))
  }

  test("NULL_F equals NULL when data exists in range") {
    val a = q(s"select cast(_wstart as bigint) as w, diff(val) from " +
      s"t1 $WHERE interval(1s) fill(null)")
    val b = q(s"select cast(_wstart as bigint) as w, diff(val) from " +
      s"t1 $WHERE interval(1s) fill(null_f)")
    assert(a == b)
  }

  test("PREV/NEXT/LINEAR reject for indef functions; sample rejects all") {
    for (m <- Seq("prev", "next", "linear"))
      assertThrows[IllegalArgumentException](
        q(s"select _wstart, csum(val) from t1 $WHERE interval(1s) " +
          s"fill($m)"))
    for (m <- Seq("null", "none", "value, -1", "prev"))
      intercept[Exception](
        q(s"select _wstart, sample(val,2) from t1 $WHERE interval(1s) " +
          s"fill($m)"))
  }

  test("partitioned: per-key per-window reset and per-key fill rows") {
    val st = Seq(
      ("a", ts(1), 10), ("a", ts(1, 500), 20), ("a", ts(3), 30),
      ("b", ts(1), 5), ("b", ts(2), 7), ("b", ts(2, 500), 9)
    ).toDF("tb", "ts", "val")
    def res2(n: String): DataFrame =
      if (n.equalsIgnoreCase("st")) st else resolve(n)
    val r = GraftSql.query(spark, res2,
      s"select tb, cast(_wstart as bigint) as w, csum(val) from st " +
        s"WHERE ts >= ${ts(1)} AND ts < ${ts(4)} partition by tb " +
        "interval(1s) fill(value, 0)").collect()
      .map(r0 => (r0.getString(0), r0.getLong(1), r0.getLong(2))).toSeq
    assert(r == Seq(
      ("a", ts(1), 10L), ("a", ts(1), 30L), ("a", ts(2), 0L),
      ("a", ts(3), 30L),
      ("b", ts(1), 5L), ("b", ts(2), 7L), ("b", ts(2), 16L),
      ("b", ts(3), 0L)))
  }
}
