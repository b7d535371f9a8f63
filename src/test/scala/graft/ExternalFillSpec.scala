package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** FILL over EXTERNAL_WINDOW, pinned to the reference's own expected
  * values (test/cases/13-TimeSeriesExt/08-ExternalWindow/
  * test_external_fill.py — data, windows, and every checkData row).
  */
class ExternalFillSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val t0 = 1701000000000L // ms
  private def us(ms: Long) = ms * 1000L

  private lazy val win: DataFrame = Seq(
    (us(t0), us(t0 + 600000), 101),
    (us(t0 + 600000), us(t0 + 1200000), 102),
    (us(t0 + 1200000), us(t0 + 1800000), 103),
    (us(t0 + 1800000), us(t0 + 2400000), 104)
  ).toDF("ts", "endtime", "mark")

  private lazy val src1: DataFrame = Seq(
    (us(t0 + 60000), 10, 100, 1),
    (us(t0 + 120000), 12, 120, 1),
    (us(t0 + 1260000), 30, 300, 1),
    (us(t0 + 1860000), 40, 400, 1)
  ).toDF("ts", "v", "v2", "t1")

  private lazy val src2: DataFrame = Seq(
    (us(t0 + 660000), 21, 210, 2),
    (us(t0 + 1920000), 41, 410, 2)
  ).toDF("ts", "v", "v2", "t1")

  private lazy val srcEmpty: DataFrame =
    Seq.empty[(Long, Int, Int, Int)].toDF("ts", "v", "v2", "t1")

  private def resolve(n: String): DataFrame = n.toLowerCase match {
    case "ext_fill_win" => win
    case "ext_fill_src_1" => src1
    case "ext_fill_src_2" => src2
    case "ext_fill_src_empty" => srcEmpty
    case "ext_fill_src" => src1.unionByName(src2).unionByName(srcEmpty)
    case other => Tables(spark, sf, other)
  }

  private def q(sql: String): Seq[Seq[Any]] =
    GraftSql.query(spark, resolve, sql).collect()
      .map(_.toSeq.map {
        case null => null
        case x: Long => x
        case x: Int => x.toLong
        case x: Double => x
        case x => x
      }.toSeq).toSeq

  private val winSub = "external_window((select ts, endtime, mark " +
    "from ext_fill_win) w)"

  test("fill(none) emits only non-empty windows") {
    val r = q(s"""select cast(_wstart as bigint) as ws, count(*) as c,
        sum(v) as sv from ext_fill_src_1 $winSub fill(none)
        order by ws""")
    assert(r == Seq(
      Seq(us(t0), 2L, 22.0),
      Seq(us(t0 + 1200000), 1L, 30.0),
      Seq(us(t0 + 1800000), 1L, 40.0)))
  }

  test("fill(null) fills the interior empty window") {
    val r = q(s"""select cast(_wstart as bigint) as ws, count(*) as c,
        sum(v) as sv from ext_fill_src_1 $winSub fill(null)
        order by ws""")
    assert(r == Seq(
      Seq(us(t0), 2L, 22.0),
      Seq(us(t0 + 600000), null, null),
      Seq(us(t0 + 1200000), 1L, 30.0),
      Seq(us(t0 + 1800000), 1L, 40.0)))
  }

  test("fill(null_f) forces every window on an empty source") {
    val r = q(s"""select cast(_wstart as bigint) as ws, count(*) as c,
        sum(v) as sv from ext_fill_src_empty $winSub fill(null_f)
        order by ws""")
    assert(r.map(_.head) ==
      (0 to 3).map(i => us(t0 + i * 600000L)))
    assert(r.forall(row => row(1) == null && row(2) == null))
  }

  test("fill(value) substitutes into every aggregate slot incl count") {
    val r = q(s"""select cast(_wstart as bigint) as ws, count(*) as c,
        sum(v) as sv from ext_fill_src_1 $winSub fill(value, 888, 999)
        order by ws""")
    assert(r == Seq(
      Seq(us(t0), 2L, 22.0),
      Seq(us(t0 + 600000), 888L, 999.0),
      Seq(us(t0 + 1200000), 1L, 30.0),
      Seq(us(t0 + 1800000), 1L, 40.0)))
  }

  test("fill(value_f) on an empty source fills all windows") {
    val r = q(s"""select cast(_wstart as bigint) as ws, sum(v) as sv
        from ext_fill_src_empty $winSub fill(value_f, 999)
        order by ws""")
    assert(r == (0 to 3).map(i =>
      Seq(us(t0 + i * 600000L), 999.0)))
  }

  test("fill(prev) carries the previous non-empty window's aggregates") {
    val r = q(s"""select cast(_wstart as bigint) as ws, sum(v) as sv
        from ext_fill_src_1 $winSub fill(prev) order by ws""")
    assert(r == Seq(
      Seq(us(t0), 22.0),
      Seq(us(t0 + 600000), 22.0),
      Seq(us(t0 + 1200000), 30.0),
      Seq(us(t0 + 1800000), 40.0)))
  }

  test("fill(next) takes the following non-empty window's aggregates") {
    val r = q(s"""select cast(_wstart as bigint) as ws, sum(v) as sv
        from ext_fill_src_1 $winSub fill(next) order by ws""")
    assert(r == Seq(
      Seq(us(t0), 22.0),
      Seq(us(t0 + 600000), 30.0),
      Seq(us(t0 + 1200000), 30.0),
      Seq(us(t0 + 1800000), 40.0)))
  }

  test("fill(prev/next) on an all-empty source emits nothing") {
    for (m <- Seq("prev", "next"))
      assert(q(s"""select cast(_wstart as bigint) as ws, sum(v) as sv
        from ext_fill_src_empty $winSub fill($m) order by ws""").isEmpty)
  }

  test("partitioned fill(prev) fills per partition, leading gap NULL") {
    val r = q(s"""select t1, cast(_wstart as bigint) as ws, sum(v) as sv
        from ext_fill_src partition by t1 $winSub fill(prev)
        order by t1, ws""")
    // the reference's exact 8 rows: t1=2's first window has no prev —
    // emitted with a NULL aggregate, not dropped
    assert(r == Seq(
      Seq(1L, us(t0), 22.0),
      Seq(1L, us(t0 + 600000), 22.0),
      Seq(1L, us(t0 + 1200000), 30.0),
      Seq(1L, us(t0 + 1800000), 40.0),
      Seq(2L, us(t0), null),
      Seq(2L, us(t0 + 600000), 21.0),
      Seq(2L, us(t0 + 1200000), 21.0),
      Seq(2L, us(t0 + 1800000), 41.0)))
  }

  test("w.mark rides along into data AND filled windows") {
    val r = q(s"""select cast(_wstart as bigint) as ws, w.mark,
        sum(v) as sv from ext_fill_src_1 $winSub fill(null)
        order by ws""")
    assert(r.map(x => (x(1), x(2))) == Seq(
      (101L, 22.0), (102L, null), (103L, 30.0), (104L, 40.0)))
  }

  test("reference error cases stay loud rejects") {
    for (bad <- Seq("fill(linear)", "fill(near)", "fill(value, 1, 2)"))
      intercept[Exception] {
        q(s"""select cast(_wstart as bigint) as ws, sum(v) as sv
          from ext_fill_src_1 $winSub $bad order by ws""")
      }
  }
}
