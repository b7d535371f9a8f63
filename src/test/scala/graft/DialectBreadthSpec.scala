package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** Breadth net over query shapes the reference's own test suites use
  * constantly (test/cases/09-DataQuerying, 10-Operators, 11-Functions):
  * every form here must at least parse, lower, and execute. Value-level
  * correctness for the interesting ones is oracle-gated in Dialect
  * (dialect_fill_multi / dialect_interp_multi / dialect_order_agg …);
  * this spec keeps the long tail from silently regressing.
  */
class DialectBreadthSpec extends AnyFunSuite {
  import SparkTestSession._

  private def resolve(name: String): DataFrame = Tables(spark, sf, name)
  private def q(sql: String): DataFrame =
    GraftSql.query(spark, resolve, sql)

  private val forms: Seq[(String, String)] = Seq(
    ("count distinct",
      "SELECT count(DISTINCT event_type) AS n FROM events"),
    ("positional order by",
      "SELECT user_id, event_id FROM events ORDER BY 1, 2 LIMIT 5"),
    ("== equality",
      "SELECT count(*) AS n FROM events WHERE event_type == 'click'"),
    ("between",
      "SELECT event_id FROM events WHERE value BETWEEN 10 AND 20 " +
        "ORDER BY event_id LIMIT 5"),
    ("case when",
      "SELECT event_id, CASE WHEN value > 50 THEN 'hi' ELSE 'lo' END " +
        "AS b FROM events ORDER BY event_id LIMIT 5"),
    ("MATCH regex op",
      "SELECT count(*) AS n FROM customer WHERE c_name MATCH '3'"),
    ("NMATCH regex op",
      "SELECT count(*) AS n FROM customer WHERE c_name NMATCH '3'"),
    ("NOT IN",
      "SELECT count(*) AS n FROM events " +
        "WHERE event_type NOT IN ('click', 'view')"),
    ("IS NOT NULL",
      "SELECT count(*) AS n FROM events WHERE value IS NOT NULL"),
    ("multi-column interp",
      "SELECT _irowts, interp(value), interp(user_id) FROM events " +
        "RANGE(1704067200000000, 1704067300000000) EVERY(10s) FILL(PREV)"),
    ("multi-column fill value list",
      "SELECT _wstart, first(value), first(user_id) FROM events " +
        "INTERVAL(1d) FILL(VALUE, 1, 2)"),
    ("order by aggregate expr",
      "SELECT user_id, count(*) AS n FROM events GROUP BY user_id " +
        "ORDER BY count(*) DESC, user_id LIMIT 5"),
    ("having without alias",
      "SELECT user_id, avg(value) FROM events GROUP BY user_id " +
        "HAVING avg(value) > 50 ORDER BY user_id"),
    ("count(1)", "SELECT count(1) AS n FROM events"),
    ("select distinct col",
      "SELECT DISTINCT event_type FROM events ORDER BY event_type"),
    ("<> inequality",
      "SELECT count(*) AS n FROM events WHERE event_type <> 'click'"),
    ("% modulo",
      "SELECT count(*) AS n FROM events WHERE user_id % 2 = 0"),
    ("|| concat",
      "SELECT c_custkey, c_name || '!' AS nm FROM customer " +
        "ORDER BY c_custkey LIMIT 5"),
    ("apercentile under interval",
      "SELECT _wstart, apercentile(value, 50) FROM events INTERVAL(7d)"),
    ("interval without _wstart select",
      "SELECT count(*) FROM events INTERVAL(7d)"),
    ("aggregate over subquery",
      "SELECT avg(n) AS a FROM (SELECT user_id, count(*) AS n " +
        "FROM events GROUP BY user_id)"),
    ("limit inside subquery",
      "SELECT count(*) AS n FROM (SELECT event_id FROM events LIMIT 100)"),
    ("quoted datetime ts bound",
      "SELECT count(*) AS n FROM events " +
        "WHERE ts >= '2024-01-05 00:00:00' AND ts < '2024-01-10 00:00:00'"),
    ("ISO datetime ts bound",
      "SELECT count(*) AS n FROM events WHERE ts >= '2024-01-05T00:00:00Z'"),
    ("RANGE with quoted timestamps",
      "SELECT _irowts, interp(value) FROM events " +
        "RANGE('2024-01-01 00:00:00', '2024-01-02 00:00:00') " +
        "EVERY(6h) FILL(PREV)"),
    ("RANGE single point",
      "SELECT _irowts, interp(value) FROM events " +
        "RANGE('2024-01-01 12:00:00') FILL(PREV)"),
    ("RANGE point with around-interval",
      "SELECT _irowts, interp(value) FROM events " +
        "RANGE('2024-01-01 12:00:00', 1h) FILL(PREV)"),
    ("now() arithmetic",
      "SELECT count(*) AS n FROM events WHERE ts > now() - 10d"),
    ("bare now keyword",
      "SELECT count(*) AS n FROM events WHERE ts > now - 10d"),
    ("today()",
      "SELECT count(*) AS n FROM events WHERE ts >= today()"),
    ("window over subquery",
      "SELECT _wstart, count(*) AS n FROM " +
        "(SELECT ts, value FROM events WHERE value > 50) INTERVAL(7d)"),
    ("partitioned interval fill",
      "SELECT user_id, _wstart, count(*) AS n FROM events " +
        "WHERE ts >= 1704067200000000 AND ts < 1704672000000000 " +
        "PARTITION BY user_id INTERVAL(1d) FILL(NULL)"),
    ("timetruncate in WHERE",
      "SELECT count(*) AS n FROM events " +
        "WHERE timetruncate(ts, 1d) = 1704067200000000"),
    ("BETWEEN quoted datetimes",
      "SELECT count(*) AS n FROM events WHERE ts BETWEEN " +
        "'2024-01-05 00:00:00' AND '2024-01-06 00:00:00'"),
    ("LIMIT offset, rows comma form",
      "SELECT event_id FROM events ORDER BY event_id LIMIT 5, 10"),
    ("SLIMIT comma form",
      "SELECT user_id, count(*) AS n FROM events " +
        "PARTITION BY user_id SLIMIT 1, 2"),
    ("GROUP BY scalar expression",
      "SELECT timetruncate(ts, 1d) AS d, count(*) AS n FROM events " +
        "GROUP BY timetruncate(ts, 1d) ORDER BY d LIMIT 5"),
    ("bitwise AND",
      "SELECT count(*) AS n FROM events WHERE user_id & 3 = 1"),
    ("bitwise OR",
      "SELECT event_id, user_id | 8 AS m FROM events " +
        "ORDER BY event_id LIMIT 5"),
    ("REGEXP operator",
      "SELECT count(*) AS n FROM customer WHERE c_name REGEXP '3'"),
    ("NOT REGEXP operator",
      "SELECT count(*) AS n FROM customer WHERE c_name NOT REGEXP '3'"),
    ("ISNULL()/ISNOTNULL() functions",
      "SELECT count(*) AS n FROM events " +
        "WHERE ISNOTNULL(value) AND NOT ISNULL(event_type)"),
    ("COALESCE",
      "SELECT event_id, COALESCE(value, 0) AS v FROM events " +
        "ORDER BY event_id LIMIT 5"),
    ("EXISTS subquery",
      "SELECT count(*) AS n FROM customer WHERE EXISTS " +
        "(SELECT o_orderkey FROM orders WHERE o_custkey = 1)"),
    ("NOT LIKE",
      "SELECT count(*) AS n FROM customer WHERE c_name NOT LIKE '%3%'"),
    ("NOT BETWEEN",
      "SELECT count(*) AS n FROM events WHERE value NOT BETWEEN 10 AND 90"),
    ("quoted duration INTERVAL",
      "SELECT _wstart, count(*) AS n FROM events INTERVAL('7d') " +
        "ORDER BY _wstart"),
    ("quoted duration INTERVAL offset + SLIDING",
      "SELECT _wstart, count(*) AS n FROM events " +
        "INTERVAL('1d', '6h') SLIDING('12h') ORDER BY _wstart LIMIT 5"),
    ("quoted duration SESSION",
      "SELECT user_id, _wstart, count(*) AS n FROM events " +
        "PARTITION BY user_id SESSION(ts, '30m') " +
        "ORDER BY user_id, _wstart LIMIT 5"),
    ("PARTITION BY scalar expression",
      "SELECT count(*) AS n FROM events PARTITION BY user_id % 2"),
    ("quoted duration EVERY",
      "SELECT _irowts, interp(value) FROM events " +
        "RANGE(1704067200000000, 1704070000000000) " +
        "EVERY('10m') FILL(PREV)"))

  forms.foreach { case (tag, sql) =>
    test(s"dialect executes: $tag") {
      val rows = q(sql).collect()
      assert(rows != null) // shape net: lowering + execution must succeed
    }
  }

  test("fill with no WHERE range spans the result's window extent") {
    val out = q("""SELECT _wstart, max(value) AS mx FROM events
        WHERE user_id = 3 AND event_type = 'purchase' AND value > 90
        INTERVAL(1d) FILL(PREV) ORDER BY _wstart""").collect()
    val real = q("""SELECT _wstart, max(value) AS mx FROM events
        WHERE user_id = 3 AND event_type = 'purchase' AND value > 90
        INTERVAL(1d) ORDER BY _wstart""").collect()
    assert(out.length >= real.length)
    // span = first..last real window, step 1d
    assert(out.head.getLong(0) == real.head.getLong(0))
    assert(out.last.getLong(0) == real.last.getLong(0))
    // PREV-filled rows carry the previous real value, no nulls after
    // the first real window
    assert(out.forall(r => !r.isNullAt(1)))
  }

  test("LEFT/RIGHT ASOF and WINDOW join spellings route and mirror") {
    // LEFT ASOF == bare ASOF (the reference's examples spell LEFT)
    val bare = q("""SELECT ts, user_id, r_value FROM purchasesL
        ASOF JOIN clicksL ON purchasesL.ts >= clicksL.ts
        AND purchasesL.user_id = clicksL.user_id
        ORDER BY user_id, ts""".replace("purchasesL", "events")
      .replace("clicksL", "events"))
    val leftSp = q("""SELECT ts, user_id, r_value FROM events
        LEFT ASOF JOIN events ON events.ts >= events.ts
        AND events.user_id = events.user_id
        ORDER BY user_id, ts""")
    assert(bare.collect().length == leftSp.collect().length)
    // RIGHT ASOF with the operator mirrored equals LEFT with sides
    // swapped: both preserve the same side with the same match rule
    val r = q("""SELECT ts, user_id, r_value FROM events a
        RIGHT ASOF JOIN events b ON a.ts <= b.ts
        AND a.user_id = b.user_id ORDER BY user_id, ts""")
    val l = q("""SELECT ts, user_id, r_value FROM events b
        LEFT ASOF JOIN events a ON b.ts >= a.ts
        AND b.user_id = a.user_id ORDER BY user_id, ts""")
    assert(r.collect().map(_.toSeq).toSeq == l.collect().map(_.toSeq).toSeq)
    // RIGHT WINDOW JOIN anchors on the right side
    val rw = q("""SELECT ts, user_id, count(*) AS n FROM events a
        RIGHT WINDOW JOIN events b WINDOW_OFFSET(-1h, 1h)
        ON a.user_id = b.user_id
        GROUP BY ts, user_id ORDER BY user_id, ts LIMIT 20""")
    assert(rw.collect().nonEmpty)
    // ASOF without ON: the reference's implicit default condition
    val noOn = q("""SELECT ts, user_id, r_value FROM events
        ASOF JOIN events ORDER BY user_id, ts LIMIT 10""")
    assert(noOn.collect().length == 10)
  }

  test("EXISTS folds to the subquery's emptiness, NOT EXISTS inverts") {
    val all = q("SELECT count(*) AS n FROM customer").head.getLong(0)
    val hit = q("""SELECT count(*) AS n FROM customer WHERE EXISTS
        (SELECT o_orderkey FROM orders WHERE o_custkey = 1)""")
      .head.getLong(0)
    val miss = q("""SELECT count(*) AS n FROM customer WHERE EXISTS
        (SELECT o_orderkey FROM orders WHERE o_custkey = -42)""")
      .head.getLong(0)
    val notMiss = q("""SELECT count(*) AS n FROM customer WHERE NOT EXISTS
        (SELECT o_orderkey FROM orders WHERE o_custkey = -42)""")
      .head.getLong(0)
    assert(hit == all && miss == 0L && notMiss == all)
  }

  test("quoted datetime bounds equal their numeric-epoch spelling") {
    val a = q("""SELECT count(*) AS n FROM events
        WHERE ts >= '2024-01-05 00:00:00' AND ts < '2024-01-10 00:00:00'""")
      .head.getLong(0)
    val b = q("""SELECT count(*) AS n FROM events
        WHERE ts >= 1704412800000000 AND ts < 1704844800000000""")
      .head.getLong(0)
    assert(a == b && a > 0)
  }

  test("LIMIT o, n equals LIMIT n OFFSET o") {
    val a = q("SELECT event_id FROM events ORDER BY event_id LIMIT 5, 10")
      .collect().map(_.getLong(0)).toSeq
    val b = q(
      "SELECT event_id FROM events ORDER BY event_id LIMIT 10 OFFSET 5")
      .collect().map(_.getLong(0)).toSeq
    assert(a == b && a.length == 10)
  }

  test("GROUP BY timetruncate(1d) equals the INTERVAL(1d) buckets") {
    val a = q("""SELECT timetruncate(ts, 1d) AS d, count(*) AS n
        FROM events GROUP BY timetruncate(ts, 1d) ORDER BY d""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val b = q("""SELECT _wstart AS d, count(*) AS n FROM events
        INTERVAL(1d) ORDER BY d""")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b && a.nonEmpty)
  }

  test("single-point RANGE yields exactly one grid row") {
    val rows = q("""SELECT _irowts, interp(value) AS v FROM events
        RANGE('2024-01-01 12:00:00') FILL(PREV)""").collect()
    assert(rows.length == 1)
    assert(rows.head.getLong(0) == 1704067200000000L + 12L * 3600000000L)
    assert(!rows.head.isNullAt(1))
  }

  test("duration literals in ts arithmetic are day-scaled, not doubles") {
    // ts > max(ts) - 2d must keep only the last 2 days of data; if the
    // dialect misread `2d` as the DOUBLE 2.0, the filter would keep
    // everything
    val n = q("""SELECT count(*) AS n FROM events
        WHERE ts > 1706659200000000 - 2d""").head.getLong(0)
    val all = q("SELECT count(*) AS n FROM events").head.getLong(0)
    assert(n > 0 && n < all / 5)
  }

  test("multi-column interp returns each column's own interpolation") {
    val out = q("""SELECT user_id, _irowts, interp(value) AS v1,
          interp(event_id) AS v2
        FROM events PARTITION BY user_id
        RANGE(1704067200000000, 1704153600000000) EVERY(6h) FILL(LINEAR)""")
    val a = q("""SELECT user_id, _irowts, interp(value) AS v1
        FROM events PARTITION BY user_id
        RANGE(1704067200000000, 1704153600000000) EVERY(6h) FILL(LINEAR)""")
    val b = q("""SELECT user_id, _irowts, interp(event_id) AS v2
        FROM events PARTITION BY user_id
        RANGE(1704067200000000, 1704153600000000) EVERY(6h) FILL(LINEAR)""")
    val byKey = out.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.get(2), r.get(3))).toMap
    a.collect().foreach { r =>
      assert(byKey((r.getLong(0), r.getLong(1)))._1 == r.get(2)) }
    b.collect().foreach { r =>
      assert(byKey((r.getLong(0), r.getLong(1)))._2 == r.get(2)) }
  }
}
