package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{LongDotProduct, NativeExpressions}

class NativeExpressionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("longDot computes the exact integer dot product under codegen") {
    import spark.implicits._
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),          // 4+10+18 = 32
      (Seq(1000000L, -2L), Seq(1000000L, 7L)),     // 1e12 - 14
      (Seq.empty[Long], Seq.empty[Long]))          // 0
      .toDF("a", "b")
    val out = df.select(NativeExpressions.longDot(col("a"), col("b"))
      .as("d")).collect().map(_.getLong(0))
    assert(out.toSeq == Seq(32L, 1000000000000L - 14L, 0L))
  }

  test("longDot is null-safe and truncates to the shorter array") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L)), None: Option[Seq[Long]]),
      (Some(Seq(1L, 2L, 99L)), Some(Seq(3L, 4L)))) // 3+8, 99 ignored
      .toDF("a", "b")
    val out = df.select(NativeExpressions.longDot(col("a"), col("b"))
      .as("d")).collect()
    assert(out(0).isNullAt(0))
    assert(out(1).getLong(0) == 11L)
  }

  test("interpreted eval matches codegen eval") {
    val e = LongDotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(10L, 20L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 80L)
  }

  test("minhash signature is null for sub-k docs under codegen") {
    import spark.implicits._
    val df = Seq(Seq("a", "b"), Seq("a", "b", "c", "d")).toDF("w")
    val out = df.select(NativeExpressions.minhashSig(col("w"), 3, 8)
      .as("sig")).collect()
    assert(out(0).isNullAt(0))          // 2 words < k=3 -> null, no NPE
    assert(out(1).getSeq[Long](0).length == 8)
  }

  test("microDot rescaling matches the documented 1e-12 fixed point") {
    import spark.implicits._
    val df = Seq((Seq(1500000L), Seq(2000000L))).toDF("a", "b") // 1.5 * 2.0
    val d = df.select(graft.ops.DedupOps.microDot(col("a"), col("b"))
      .as("d")).head.getDouble(0)
    assert(d == 3.0)
  }

  test("lshBuckets matches the Column bucket formula bit-for-bit") {
    val emb = Tables(spark, sf, "embeddings")
    val planes = 4; val tables = 4
    // the Column formula, table-tagged exactly like the old lowering
    val colForm = array((0 until tables).map(t =>
      graft.ops.SimilarityOps.lshBucketCol(col("embedding"), planes,
        t * planes) + lit(t.toLong << planes)): _*)
    val native = NativeExpressions.lshBuckets(col("embedding"),
      planes, tables)
    val diff = emb.select(col("vec_id"), colForm.as("a"), native.as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() == 0,
      s"native/Column bucket mismatch: ${diff.take(3).toSeq}")
  }

  test("WeekNum: mode 3 is ISO everywhere; MySQL WEEK pins; codegen") {
    import java.time.LocalDate
    import java.time.temporal.WeekFields
    import graft.functions.WeekNum
    var d = LocalDate.of(2019, 12, 20)
    while (d.isBefore(LocalDate.of(2025, 2, 1))) {
      val us = d.toEpochDay * 86400000000L
      assert(WeekNum.compute(us, 3) ==
        d.get(WeekFields.ISO.weekOfWeekBasedYear()), s"mode3 $d")
      d = d.plusDays(1)
    }
    def w(s: String, m: Int) =
      WeekNum.compute(LocalDate.parse(s).toEpochDay * 86400000000L, m)
    // MySQL WEEK() reference values
    assert(w("2024-01-01", 0) == 0)
    assert(w("2024-01-01", 1) == 1)
    assert(w("2024-01-01", 2) == 53)
    assert(w("2024-01-01", 4) == 1)
    assert(w("2024-01-01", 5) == 1)
    assert(w("2024-01-07", 0) == 1)
    assert(w("2024-01-07", 4) == 2)
    assert(w("2023-01-01", 0) == 1) // a Sunday
    assert(w("2023-01-01", 1) == 0) // Monday-first, <4 days
    assert(w("2022-01-01", 2) == 52) // Saturday -> prior year's count
    assert(w("2021-12-31", 1) == 52)
    // SQL registration + codegen path agree with compute
    graft.functions.NativeFunctions.register(spark)
    val row = spark.sql(
      "SELECT graft_week(1704067200000000, 2) AS w").head
    assert(row.getLong(0) == 53L)
  }

  test("simhash fingerprint matches the exploded md5-vote lowering") {
    val docs = Tables(spark, sf, "documents")
    val native = graft.ops.TextOps.simhash(docs, "doc_id", col("text"))
    val exploded = graft.ops.TextOps
      .simhashViaExplode(docs, "doc_id", col("text"))
    val diff = native.as("a").join(exploded.as("b"), "doc_id")
      .filter(col("a.simhash") =!= col("b.simhash"))
    assert(native.count() == exploded.count())
    assert(diff.count() == 0,
      s"native/exploded simhash mismatch: ${diff.take(3).toSeq}")
  }
}
