package graft

import java.math.{BigDecimal => JBig}

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the DECIMAL(38) / int128 arithmetic surface locally (reference
  * decimal.c: native 128-bit fixed-point multiply/cast/sum with HALF_UP
  * rounding). The driver-gated `scalar_decimal` query deliberately stays
  * on an int64-everywhere formulation — four rounds established that
  * wide-decimal INTERMEDIATES travel through version-sensitive paths in
  * the oracle engine — so the p>18 semantics the reference's §1.2
  * surface requires are asserted here against hand-computed BigDecimal
  * ground truth instead of a cross-engine hash.
  */
class Decimal128Spec extends AnyFunSuite {
  import SparkTestSession._

  private def oneRow(colExpr: org.apache.spark.sql.Column): Row =
    spark.range(1).select(colExpr).head()

  test("(18,2)x(8,4)x(8,4) product is exact at DECIMAL(36,10)") {
    val price = lit(new JBig("98765432109876.54")).cast(DecimalType(18, 2))
    val disc = lit(new JBig("0.0734")).cast(DecimalType(8, 4))
    val tax = lit(new JBig("0.0812")).cast(DecimalType(8, 4))
    val one = lit(1).cast(DecimalType(8, 4))
    val r = oneRow((price * (one - disc) * (one + tax)).as("p"))
    val expect = new JBig("98765432109876.54")
      .multiply(new JBig("0.9266")).multiply(new JBig("1.0812"))
    assert(r.getDecimal(0).compareTo(expect) == 0)
    // and the result type really is int128 territory (precision > 18)
    val dt = spark.range(1)
      .select((price * (one - disc) * (one + tax)).as("p"))
      .schema("p").dataType.asInstanceOf[DecimalType]
    assert(dt.precision > 18, s"expected wide decimal, got $dt")
  }

  test("CAST wide product to DECIMAL(38,6) rounds HALF_UP") {
    // exact 10dp values straddling the .5 boundary at 6dp
    val up = lit(new JBig("1.0000005000")).cast(DecimalType(38, 10))
    val down = lit(new JBig("1.0000004999")).cast(DecimalType(38, 10))
    val r = oneRow(struct(
      up.cast(DecimalType(38, 6)), down.cast(DecimalType(38, 6))))
      .getStruct(0)
    assert(r.getDecimal(0).compareTo(new JBig("1.000001")) == 0)
    assert(r.getDecimal(1).compareTo(new JBig("1.000000")) == 0)
  }

  test("negative HALF_UP rounds away from zero (decimal.c semantics)") {
    val n = lit(new JBig("-2.5000005")).cast(DecimalType(38, 7))
    val r = oneRow(n.cast(DecimalType(38, 6)))
    assert(r.getDecimal(0).compareTo(new JBig("-2.500001")) == 0)
  }

  test("sum over DECIMAL(38,6) accumulates exactly across partitions") {
    import spark.implicits._
    // 10^4 rows of 10^12-scale values: the int64 path would overflow;
    // the int128 accumulator must stay exact
    val big = new JBig("123456789012345.678901")
    val df = (1 to 10000).map(_ => big.toString).toDF("s")
      .repartition(7)
      .select($"s".cast(DecimalType(38, 6)).as("v"))
    val got = df.agg(sum($"v")).head().getDecimal(0)
    val expect = big.multiply(new JBig(10000))
    assert(got.compareTo(expect) == 0)
  }

  test("sum never silently wraps: overflow raises (ANSI default)") {
    import spark.implicits._
    // max DECIMAL(38,0) value summed twice exceeds 38 digits; Spark 4
    // runs ANSI-on by default so the accumulator must raise, never
    // wrap to a garbage int128 value
    val maxV = new JBig("9" * 38)
    val df = Seq(maxV.toString, maxV.toString).toDF("s")
      .select($"s".cast(DecimalType(38, 0)).as("v"))
    val ex = intercept[Exception] { df.agg(sum($"v")).head() }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("NUMERIC_VALUE_OUT_OF_RANGE") ||
      msg.toLowerCase.contains("overflow"), s"unexpected: $ex")
  }

  test("(38,6) x (7,0) saturates precision: documented divergence") {
    // THE channel that kept scalar_decimal red: a multiply whose
    // unadjusted result needs precision 45. Spark clamps to (38,6)
    // and keeps the value when it fits; DuckDB's handling of the same
    // saturation differs across releases. Pin Spark's behavior.
    val g = lit(new JBig("54917.805000")).cast(DecimalType(38, 6))
    val m = lit(1000000).cast(DecimalType(7, 0))
    val prod = g * m
    val dt = spark.range(1).select(prod.as("p"))
      .schema("p").dataType.asInstanceOf[DecimalType]
    assert(dt.precision == 38, s"saturated precision expected, got $dt")
    val r = oneRow(prod)
    assert(r.getDecimal(0).compareTo(new JBig("54917805000")) == 0)
  }

  test("DECIMAL64-range micro-unit round trip is lossless") {
    import spark.implicits._
    // the gated query's int64 path: (18,6) -> x10^6 -> BIGINT -> back
    val vals = Seq("0.000001", "999999999999.999999", "54917.805000")
    val df = vals.toDF("s").select($"s".cast(DecimalType(18, 6)).as("v"))
    val mega = lit(1000000).cast(DecimalType(7, 0))
    val back = df.select(($"v" * mega).cast("long").as("micro"), $"v")
      .select((col("micro").cast(DecimalType(18, 0)) / mega)
        .cast(DecimalType(18, 6)).as("rt"), $"v")
      .collect()
    back.foreach(r =>
      assert(r.getDecimal(0).compareTo(r.getDecimal(1)) == 0))
  }
}
