package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.GraftSql

/** Randomized dialect-SQL fuzz against [[GraftSql.query]] — the
  * reference's `test/crash_gen/` analog, seeded from the probed
  * corpus. Two invariants:
  *
  *  1. **Semantics-preserving mutations** (keyword case, whitespace)
  *     must return the exact same rows as the original text — a
  *     divergence is a silent misparse, the worst failure class a SQL
  *     front end can have.
  *  2. **Corruptions** (junk durations, dropped parens, deleted /
  *     duplicated tokens) must either still parse to a plan or fail
  *     LOUDLY with an intentional error — never an NPE, MatchError,
  *     StackOverflowError, or ??? leaking out of the rewriter, which
  *     would mean the splitter walked off a malformed clause instead
  *     of rejecting it.
  *
  * Deterministic: fixed RNG seed, so a failure reproduces byte-for-byte
  * (the failing SQL text is printed in the assertion message).
  */
class DialectFuzzSpec extends AnyFunSuite {
  import SparkTestSession._

  private def resolve(n: String): DataFrame = Tables(spark, sf, n)
  private def q(sql: String): DataFrame = GraftSql.query(spark, resolve, sql)

  /** Seeds: one per routed surface (windows, fills, series functions,
    * subqueries, set ops, joins, scalar families). `now`-dependent
    * texts are corruption-only (notNowSeeds) — wall-clock drift between
    * the two runs would fake a semantic diff. */
  private val seeds = Seq(
    "select 16-6 as d from events limit 1",
    "select _wstart, _wend, count(*) as n, sum(value) as sv from events count_window(4) having sum(value) > 57",
    "select ts from events where ts>='2024-1-1 8:1:40' and ts<='2024-1-2 8:1:40.500' order by ts limit 10",
    "select cast(value as bigint) as v from events order by event_id limit 5",
    "select count(*) as n from events interval(1n) sliding(15d)",
    "select avg(value) as a from events where event_type in ('click','view') group by user_id having avg(value) > 10 order by user_id",
    "select distinct event_type from events order by event_type",
    "select ts, value from events where (user_id = 1 or user_id = 2) and value between 10 and 20 order by ts limit 5",
    "select top(value, 3) as t from events group by event_type",
    "select first(*) from events",
    "select count(*) as n, event_type from events state_window(event_type) having count(*) > 2",
    "select _wstart, sum(value) as sv from events session(ts, 10m) having sum(value) > 100",
    "select tbname, count(*) as n from events group by tbname order by tbname",
    "select * from (select user_id, avg(value) as a from events group by user_id) where a > 20 order by user_id",
    "select user_id, case when value > 50 then 'hi' when value > 10 then 'mid' else 'lo' end as band from events order by event_id limit 5",
    "select concat(event_type, '-', cast(user_id as varchar(10))) as c from events order by event_id limit 3",
    "select interp(value) from events where user_id=1 range('2024-01-01 00:00:00','2024-01-05 00:00:00') every(1d) fill(null)",
    "select percentile(value, 50, 90) from events where user_id = 1",
    "select stateduration(value, 'GT', 30, 1h) as sd from events where user_id = 1 order by ts limit 5",
    "select abs(value) as a, ceil(value) as c, floor(value) as f, round(value) as r from events order by event_id limit 3",
    "select apercentile(value, 50, 't-digest') as ap from events",
    "select _rowts, value from events order by _rowts limit 3",
    "select count(*) as n from events where ts between '2024-01-01' and '2024-01-15'",
    "select user_id, value from events order by value desc, event_id limit 3 offset 2",
    "select user_id, _wstart, avg(value) as a from events partition by user_id interval(1d) fill(prev) order by user_id, _wstart limit 20",
    "select event_type, count(*) as n from events group by event_type union all select 'x' as event_type, count(*) as n from events order by event_type, n",
    "select diff(value) as d from events where user_id = 2 order by ts limit 5",
    "select timetruncate(ts, 1d) as t, count(*) as n from events group by 1 order by t limit 5",
    "select last(ts) as lt, spread(value) as sp from events group by user_id order by user_id",
    "select mode(event_type) as m from events where user_id = 3",
    "select event_type, count(*) as n from events group by 1 order by 2 desc, 1 limit 3",
    "select event_id, user_id, r_value from events a join events b on a.event_id = b.event_id order by event_id limit 10",
    "select _wstart, max(value) as mx from events where user_id = 3 interval(1d) fill(value, 1.5) order by _wstart limit 20",
    "select top(value, 4) as t, ts from events order by t desc, ts limit 4",
    "select ts, statecount(value, 'GT', 50) as sc from events where user_id = 5 order by ts limit 10",
    "select t1.ts, t2.value from events t1 left join events t2 on t1.event_id = t2.event_id and t2.value > 50 order by t1.event_id limit 10",
    "select a.event_type, b.n2 from (select event_type, count(*) as n1 from events group by event_type) a join (select event_type, count(*) as n2 from events group by event_type) b on a.event_type = b.event_type order by a.event_type",
    "select ts, event_id from events a left window join events b on a.user_id = b.user_id window_offset(-1s, 1s) jlimit 1 order by event_id limit 5",
    "select max(event_id) as me, user_id from events where user_id = 3",
    "select server_version() as v, 1+1 as s")

  private val nowSeeds = Seq(
    "select value / event_id as r from events where ts > now - 900d and ts < now limit 5",
    "select count(*) as n from events where ts > now() - 10000d")

  // exceptions an intentional reject is allowed to surface as; anything
  // else (NPE, MatchError, SOE, NotImplementedError) is a parser walking
  // off the rails rather than rejecting input
  private def loud(t: Throwable): Boolean = t match {
    case _: IllegalArgumentException | _: UnsupportedOperationException |
         _: NumberFormatException | _: NoSuchElementException => true
    case e if e.getClass.getName.startsWith("org.apache.spark.sql") => true
    case e if e.getClass.getName.contains("ParseException") => true
    case _ => false
  }

  private def mutateCase(s: String, rng: scala.util.Random): String = {
    // flip alpha case outside string literals only
    val sb = new StringBuilder
    var inStr = false
    s.foreach { ch =>
      if (ch == '\'') { inStr = !inStr; sb += ch }
      else if (!inStr && ch.isLetter && rng.nextBoolean())
        sb += (if (ch.isUpper) ch.toLower else ch.toUpper)
      else sb += ch
    }
    sb.toString
  }

  private def mutateWs(s: String, rng: scala.util.Random): String =
    s.flatMap { ch =>
      if ((ch == ',' || ch == '(' || ch == ')') && rng.nextBoolean())
        s" $ch "
      else ch.toString
    }

  private def corrupt(s: String, rng: scala.util.Random): String =
    rng.nextInt(6) match {
      case 0 => // junk duration / number suffix
        s.replaceAll("\\b(\\d+)([smhdwn])\\b", "$1q")
      case 1 => // drop a random closing paren
        val idx = s.zipWithIndex.filter(_._1 == ')').map(_._2)
        if (idx.isEmpty) s + ")"
        else { val i = idx(rng.nextInt(idx.length))
          s.substring(0, i) + s.substring(i + 1) }
      case 2 => // duplicate a clause keyword
        s.replaceFirst("(?i)\\bwhere\\b", "where where")
          .replaceFirst("(?i)\\bselect\\b", "select select")
      case 3 => // delete a random word
        val ws = s.split(" ")
        if (ws.length < 3) s
        else (ws.take(1 + rng.nextInt(ws.length - 2)) ++
          ws.drop(2 + rng.nextInt(ws.length - 2))).mkString(" ")
      case 4 => // truncate mid-text
        s.substring(0, 7 + rng.nextInt(s.length - 7))
      case _ => // swap two adjacent words
        val ws = s.split(" ")
        if (ws.length < 4) s
        else { val i = 1 + rng.nextInt(ws.length - 2)
          val sw = ws.updated(i, ws(i + 1)).updated(i + 1, ws(i))
          sw.mkString(" ") }
    }

  test("case/whitespace mutations preserve semantics exactly") {
    val rng = new scala.util.Random(20260814L)
    seeds.foreach { seed =>
      val want = q(seed).collect().map(_.toString).sorted.toSeq
      (1 to 4).foreach { _ =>
        val m = mutateCase(seed, rng)
        val got =
          try q(m).collect().map(_.toString).sorted.toSeq
          catch { case t: Throwable =>
            fail(s"case mutation broke parsing:\n  $m\n  -> $t") }
        assert(got == want, s"silent misparse on case mutation:\n  $m")
      }
      (1 to 2).foreach { _ =>
        val m = mutateWs(seed, rng)
        val got =
          try q(m).collect().map(_.toString).sorted.toSeq
          catch { case t: Throwable =>
            fail(s"whitespace mutation broke parsing:\n  $m\n  -> $t") }
        assert(got == want, s"silent misparse on ws mutation:\n  $m")
      }
    }
  }

  test("corruptions parse or fail loudly — never a crash class") {
    val rng = new scala.util.Random(4121L)
    val all = seeds ++ nowSeeds
    var parsed = 0; var rejected = 0
    all.foreach { seed =>
      (1 to 28).foreach { _ =>
        val m = corrupt(seed, rng)
        try { q(m).schema; parsed += 1 }
        catch {
          case t: Throwable =>
            assert(loud(t), s"crash-class failure (${t.getClass.getName})" +
              s" on:\n  $m\n  -> ${String.valueOf(t.getMessage).take(200)}")
            rejected += 1
        }
      }
    }
    info(s"${all.size * 28} corruptions: $parsed parsed, $rejected " +
      "rejected loudly")
    assert(parsed + rejected == all.size * 28)
  }
}
