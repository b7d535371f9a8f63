package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TimeFormat
import graft.sql.GraftSql

/** Postgres-token to_char/to_timestamp semantics against hand-computed
  * values (reference tm2char: common/src/ttime.c:2240). */
class TimeFormatSpec extends AnyFunSuite {
  import SparkTestSession._

  // 2024-03-05 14:07:09.123456 UTC — a Tuesday, day-of-year 065
  private val us = 1709647629123456L

  private def fmt(f: String): String = {
    val df = spark.range(1)
      .select(TimeFormat.toChar(timestamp_micros(lit(us)), f).as("s"))
    df.collect()(0).getString(0)
  }

  test("numeric tokens with fraction variants") {
    assert(fmt("YYYY-MM-DD HH24:MI:SS") == "2024-03-05 14:07:09")
    assert(fmt("yyyy-mm-dd hh24:mi:ss") == "2024-03-05 14:07:09")
    assert(fmt("SS.MS") == "09.123")
    assert(fmt("SS.US") == "09.123456")
    assert(fmt("SS.NS") == "09.123456000")
    assert(fmt("YYY YY Y") == "024 24 4")
    assert(fmt("DDD D") == "065 3") // Tuesday → 3 (Sunday=1)
  }

  test("12-hour clock and meridiem variants") {
    assert(fmt("HH12:MI AM") == "02:07 PM")
    assert(fmt("HH:MI am") == "02:07 pm")
    assert(fmt("HH12 A.M.") == "02 P.M.")
    // 00:30 → 12:30 AM (tm2char: 0 o'clock is 12 in 12H)
    val mid = spark.range(1).select(TimeFormat.toChar(
      timestamp_micros(lit(1709598600000000L)), "HH12:MI am").as("s"))
      .collect()(0).getString(0)
    assert(mid == "12:30 am")
  }

  test("name tokens are case-mapped and space-padded to 9") {
    assert(fmt("MONTH") == "MARCH    ")
    assert(fmt("Month") == "March    ")
    assert(fmt("month") == "march    ")
    assert(fmt("Mon MON mon") == "Mar MAR mar")
    assert(fmt("Day") == "Tuesday  ")
    assert(fmt("DAY day") == "TUESDAY   tuesday  ")
    assert(fmt("Dy DY dy") == "Tue TUE tue")
  }

  test("quoted literals and escapes pass through") {
    assert(fmt("YYYY\"MM\"DD") == "2024MM05")
    assert(fmt("\"Year: \"YYYY") == "Year: 2024")
    // \M escapes the first M; the remaining single M is not a token
    assert(fmt("YYYY\\MM") == "2024MM")
  }

  test("timezone tokens under the UTC session") {
    assert(fmt("TZH") == "+00")
  }

  test("to_timestamp parses PG tokens and round-trips") {
    val out = spark.range(1).select(unix_timestamp(TimeFormat.toTimestamp(
      lit("2024-03-05 02:07:09 PM"), "YYYY-MM-DD HH12:MI:SS AM")).as("t"))
      .collect()(0).getLong(0)
    assert(out == us / 1000000)
    val named = spark.range(1).select(unix_timestamp(TimeFormat.toTimestamp(
      lit("05 Mar 2024"), "DD Mon YYYY")).as("t")).collect()(0).getLong(0)
    assert(named == 1709596800L)
  }

  test("to_timestamp consumes-and-ignores D/DY/DAY (and DDD next to DD)") {
    def parse(s: String, f: String): Long =
      spark.range(1).select(unix_timestamp(
        TimeFormat.toTimestamp(lit(s), f)).as("t")).collect()(0).getLong(0)
    // ttime.c char2ts sets tm_wday/tm_yday, which taosTm2Ts never
    // reads (commonTests.cpp:733 "DY DDD-DD-D" leaves ts unchanged)
    assert(parse("2024/Mar/05 Tue 065-05-3 14:07:09",
      "yyyy/Mon/dd DY DDD-DD-D HH24:MI:SS") == us / 1000000)
    // even a wrong weekday name is ignored, as long as it consumes
    assert(parse("2024/Mar/05 Mon 065-05-3 00:00:00",
      "yyyy/Mon/dd DY DDD-DD-D HH24:MI:SS") == 1709596800L)
    // absent date fields take char2ts defaults (mon=1, md=1)
    assert(parse("2024-TUE-03", "yyyy-Dy-MM") ==
      java.time.Instant.parse("2024-03-01T00:00:00Z").getEpochSecond)
    // round-trip of the corpus shape: only DD survives -> year 0
    val rt = spark.range(1).select(TimeFormat.toTimestamp(
      TimeFormat.toChar(timestamp_micros(lit(us)), "D-DD-DDD DY"),
      "D-DD-DDD DY").cast("string").as("t")).collect()(0).getString(0)
    assert(rt != null && rt.endsWith("-01-05 00:00:00"), rt)
  }

  test("dialect rewrites to_char/to_timestamp textually") {
    val sql = GraftSql.rewriteFuncs(
      "to_char(ts, 'YYYY-MM-DD') AS d", "ts")
    assert(sql.contains("date_format"), sql)
    assert(!sql.toLowerCase.contains("to_char"), sql)
    val p = GraftSql.rewriteFuncs(
      "to_timestamp(s, 'DD Mon YYYY')", "ts")
    // literal runs are java-quoted: dd' 'MMM' 'yyyy
    assert(p.contains("dd") && p.contains("MMM") && p.contains("yyyy"), p)
  }
}
