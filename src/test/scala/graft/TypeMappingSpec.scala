package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TypeMapping
import graft.sources.TypeMapping.T

/** §1.2 type mapping: unsigned widening is value-exact at the extremes,
  * UBIGINT survives 2^64-1, ns timestamps round-trip at µs precision. */
class TypeMappingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("type table maps every reference id") {
    assert(TypeMapping.sparkType(T.UTINYINT) == ShortType)
    assert(TypeMapping.sparkType(T.USMALLINT) == IntegerType)
    assert(TypeMapping.sparkType(T.UINT) == LongType)
    assert(TypeMapping.sparkType(T.UBIGINT) == DecimalType(20, 0))
    assert(TypeMapping.sparkType(T.DECIMAL, 4) == DecimalType(38, 4))
    assert(TypeMapping.sparkType(T.DECIMAL64, 2) == DecimalType(18, 2))
    assert(TypeMapping.sparkType(T.TIMESTAMP) == TimestampType)
    assert(TypeMapping.sparkType(T.TIMESTAMP,
      precision = TypeMapping.Nano) == LongType)
    assert(TypeMapping.sparkType(T.GEOMETRY) == BinaryType)
  }

  test("unsigned widening recovers full-range values from signed bits") {
    import spark.implicits._
    // 0xFF as signed byte = -1 → UTINYINT 255; 0x8000 short = -32768 →
    // USMALLINT 32768; 0xFFFFFFFF int = -1 → UINT 4294967295
    val df = Seq((-1.toByte, -32768.toShort, -1, -1L),
        (127.toByte, 32767.toShort, 2147483647, Long.MaxValue))
      .toDF("b", "s", "i", "l")
      .select(
        TypeMapping.widenUnsigned(col("b"), T.UTINYINT).as("ub"),
        TypeMapping.widenUnsigned(col("s"), T.USMALLINT).as("us"),
        TypeMapping.widenUnsigned(col("i"), T.UINT).as("ui"),
        TypeMapping.widenUnsigned(col("l"), T.UBIGINT).as("ul"))
    val rows = df.collect()
    assert(rows(0).getShort(0) == 255)
    assert(rows(0).getInt(1) == 32768)
    assert(rows(0).getLong(2) == 4294967295L)
    // -1L reinterpreted unsigned = 2^64 - 1
    assert(rows(0).getDecimal(3).toBigInteger.toString ==
      "18446744073709551615")
    assert(rows(1).getShort(0) == 127 && rows(1).getInt(1) == 32767)
    assert(rows(1).getLong(2) == 2147483647L)
    assert(rows(1).getDecimal(3).toBigInteger.toString ==
      Long.MaxValue.toString)
    assert(df.schema("ul").dataType == DecimalType(20, 0))
  }

  test("ns epoch → timestamp → ns round-trips at µs resolution") {
    import spark.implicits._
    val ns = 1709647629123456789L // .123456789 — sub-µs digits truncate
    val df = Seq(ns).toDF("ns")
      .withColumn("t", TypeMapping.nsToTimestamp(col("ns")))
      .withColumn("back", TypeMapping.timestampToNs(col("t")))
    val r = df.collect()(0)
    assert(r.getAs[Long]("back") == 1709647629123456000L)
  }

  test("column metadata carries declared bounds") {
    import spark.implicits._
    val df = TypeMapping.withTypeMeta(
      Seq("x").toDF("name"), "name",
      Map("td_type" -> "VARCHAR", "td_len" -> "64"))
    val m = df.schema("name").metadata
    assert(m.getString("td_type") == "VARCHAR")
    assert(m.getString("td_len") == "64")
  }

  test("the ns testdata column matches the Nano mapping contract") {
    // events.ts ships as epoch-µs LongType in testdata (TESTDATA.md) —
    // the Micro path; a ns database would keep LongType too
    val ts = Tables(spark, sf, "events").schema("ts")
    assert(ts.dataType == LongType)
  }
}
