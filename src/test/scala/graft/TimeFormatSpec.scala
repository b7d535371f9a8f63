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

  test("to_timestamp matches char2ts looseness (commonTests.cpp pins)") {
    def us(s: String, f: String): Long =
      spark.range(1).select(unix_micros(
        TimeFormat.toTimestamp(lit(s), f)).as("t")).collect()(0).getLong(0)
    def at(iso: String): Long =
      java.time.Instant.parse(iso).toEpochMilli * 1000L
    // digit runs short of token width (commonTests.cpp:672,676)
    assert(us("2023-1-1 12:10:10am", "yyyy-mm-dd HH12:MI:SSAM") ==
      at("2023-01-01T00:10:10Z"))
    assert(us("23-1-01 9:10:10.123p.m.", "yy-MM-dd HH12:MI:ss.msa.m.") ==
      at("2023-01-01T21:10:10.123Z"))
    // undelimited digit runs: width-strict while more digit tokens
    // follow, remaining fields default on exhausted input
    // (commonTests.cpp:744 "210012" -> 2100-12-01, :737)
    assert(us("210012", "yyyyMMdd ") == at("2100-12-01T00:00:00Z"))
    assert(us("21000101", "yyyyMMdd ") == at("2100-01-01T00:00:00Z"))
    assert(us("21001/2", "yyyyMM/dd ") == at("2100-01-02T00:00:00Z"))
    assert(us("210001/2", "yyyyMM1/dd ") == at("2100-01-02T00:00:00Z"))
    // zone hour offset (commonTests.cpp:708)
    assert(us("2100-01-01 11:10:10.124456+08",
      "yyyy-MM-dd HH24:MI:ss.usTZH") == 4102456210124456L)
    // full TZ forms: Z, ±HH:MM, ±HHMM (ttime.c:2706 char2ts TZ)
    assert(us("2024-03-05 14:07:09Z", "yyyy-MM-dd HH24:MI:SSTZ") ==
      at("2024-03-05T14:07:09Z"))
    assert(us("2024-03-05 14:07:09+05:30", "yyyy-MM-dd HH24:MI:SSTZ") ==
      at("2024-03-05T08:37:09Z"))
    assert(us("2024-03-05 14:07:09-0830", "yyyy-MM-dd HH24:MI:SSTZ") ==
      at("2024-03-05T22:37:09Z"))
    // adjustYearTo2020 pivots (ttime.c:2518): yy 70..99 -> 19xx
    assert(us("95-06-01", "yy-MM-dd") == at("1995-06-01T00:00:00Z"))
    assert(us("21-06-01", "yy-MM-dd") == at("2021-06-01T00:00:00Z"))
    // month names match case-insensitively (strArrayCaseSearch)
    assert(us("2024/FEB/01", "yyyy/Mon/dd") == at("2024-02-01T00:00:00Z"))
    assert(us("2024/february/01", "yyyy/Month/dd") ==
      at("2024-02-01T00:00:00Z"))
    // non-matching input -> NULL, not the injected defaults
    val bad = spark.range(1).select(TimeFormat.toTimestamp(
      lit("2100/2/1"), "yyyyMMdd ").as("t")).collect()(0)
    assert(bad.isNullAt(0))
  }

  test("dialect rewrites to_char/to_timestamp textually") {
    val sql = GraftSql.rewriteFuncs(
      "to_char(ts, 'YYYY-MM-DD') AS d", "ts")
    assert(sql.contains("date_format"), sql)
    assert(!sql.toLowerCase.contains("to_char"), sql)
    val p = GraftSql.rewriteFuncs(
      "to_timestamp(s, 'DD Mon YYYY')", "ts")
    // parse goes through the one-pass canonicalizer + one canonical
    // java pattern
    assert(p.contains("graft_ts_canon") &&
      p.contains("yyyy-MM-dd HH:mm:ss.SSSSSSSSSx"), p)
  }

  test("native canonicalizer is bit-identical to the extract lowering") {
    // every keyword family + the char2ts loose shapes from the pins
    // above, crossed with well-formed, short-digit, garbage, and empty
    // inputs: the one-regex-pass CanonicalTsString must agree with the
    // regexp_extract-per-field reference on every (input, fmt) cell
    val cases = Seq(
      ("yyyy-MM-dd HH24:MI:SS", Seq("2024-03-05 14:07:09", "2023-1-1",
        "garbage", "", "2024-03-05")),
      ("yy-Mon-dd hh12:mi:ss.msa.m.TZ", Seq(
        "24-Mar-05 02:07:09.123p.m.+05:30", "95-JAN-1 1:2:3.4a.m.Z",
        "24-xx-05", "24-Feb-05 02:07:09.123p.m.-0830")),
      ("yyyyMMdd ", Seq("210012", "21000101", "2100/2/1")),
      ("yyyyMM1/dd ", Seq("210001/2")),
      ("yyyy-Dy-MM", Seq("2024-TUE-03", "2024-Mon-11")),
      ("D-DD-DDD DY", Seq("3-05-065 TUE", "9-31-366 XXX")),
      ("yyyy-MM-dd HH24:MI:ss.usTZH", Seq(
        "2100-01-01 11:10:10.124456+08", "2100-01-01 11:10:10.124456-7",
        "2100-01-01 11:10:10.124456")),
      ("yyyy/Month/dd", Seq("2024/february/01")),
      ("HH12:MI AM", Seq("12:30 am", "02:07 PM", "12:00 PM")))
    cases.foreach { case (f, inputs) =>
      inputs.foreach { in =>
        val row = spark.range(1).select(
          TimeFormat.toTimestamp(lit(in), f).cast("string").as("native"),
          TimeFormat.toTimestampViaExtracts(lit(in), f).cast("string")
            .as("ref")).collect()(0)
        assert(row.getString(0) == row.getString(1),
          s"fmt='$f' input='$in': native=${row.getString(0)} " +
            s"ref=${row.getString(1)}")
      }
    }
    // range-invalid fields ERROR on both paths (the reference's -2
    // class): shape matches but the strict canonical parse rejects —
    // field out of range, and a sub-3-letter month name (month 0)
    Seq(TimeFormat.toTimestamp _, TimeFormat.toTimestampViaExtracts _)
      .foreach { form =>
        intercept[Exception] {
          spark.range(1).select(form(lit("2024-13-40 99:99:99"),
            "yyyy-MM-dd HH24:MI:SS").cast("string")).collect()
        }
        intercept[Exception] {
          spark.range(1).select(form(lit("2024/M/01"),
            "yyyy/Month/dd").cast("string")).collect()
        }
      }
  }
}
