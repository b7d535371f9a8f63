package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SourceOps

class SourcesSpec extends AnyFunSuite {
  import SparkTestSession._

  test("csvTable reads a FILE table with the declared schema") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "data.csv")
    Files.writeString(f.toPath,
      "1|alpha|2024-01-01 00:00:00|1.5\n2|beta|2024-01-02 12:30:00|2.25\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("ts", TimestampType), StructField("v", DoubleType)))
    val df = SourceOps.csvTable(spark, f.getAbsolutePath, schema,
      header = false, delimiter = "|")
    val rows = df.orderBy("id").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1) == "alpha" && rows(1).getDouble(3) == 2.25)
    assert(df.schema == schema)
  }

  test("deleteWhere removes only the matching ts range, atomically") {
    val dir = Files.createTempDirectory("graft_del").toFile.getAbsolutePath
    import spark.implicits._
    (1L to 100L).map(i => (i, i * 10)).toDF("ts", "v")
      .write.mode("overwrite").parquet(dir)
    val deleted = SourceOps.deleteWhere(spark, dir,
      col("ts") >= 20 && col("ts") < 40)
    assert(deleted == 20)
    val left = spark.read.parquet(dir)
    assert(left.count() == 80)
    assert(left.filter(col("ts") >= 20 && col("ts") < 40).count() == 0)
    assert(left.agg(sum("v")).head.getLong(0) ==
      (1L to 100L).filterNot(i => i >= 20 && i < 40).map(_ * 10).sum)
  }

  test("virtualTable aligns per-source columns on the key") {
    import spark.implicits._
    val a = Seq((1L, 10L, 1.0), (1L, 20L, 2.0)).toDF("k", "ts", "value")
    val b = Seq((1L, 20L, 5.0), (1L, 30L, 6.0)).toDF("k", "ts", "value")
    val vt = SourceOps.virtualTable(Seq("a" -> a, "b" -> b),
      Seq("k", "ts"), "value").orderBy("ts").collect()
    assert(vt.length == 3)
    assert(vt(0).getAs[Any]("b_v") == null) // ts=10: only a
    assert(vt(1).getDouble(2) == 2.0 && vt(1).getDouble(3) == 5.0) // ts=20
    assert(vt(2).getAs[Any]("a_v") == null) // ts=30: only b
  }

  test("upsertLatest keeps the newest writer per key") {
    import spark.implicits._
    val df = Seq((1L, "old", 0L), (1L, "new", 1L), (2L, "only", 0L))
      .toDF("k", "v", "seq")
    val out = SourceOps.upsertLatest(df, Seq("k"), "seq")
      .orderBy("k").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("new", "only"))
  }

  test("block_dist reads row-group stats from footers only") {
    val bd = SourceOps.blockDist(spark, s"$sf/lineitem.parquet")
    assert(bd.count() >= 1)
    val totalRows = bd.agg(sum("n_rows")).head.getLong(0)
    assert(totalRows == Tables(spark, sf, "lineitem").count())
    assert(bd.filter(col("compressed_bytes") <= 0).count() == 0)
  }

  test("catalog tables list every testdata table and column") {
    val cols = SourceOps.insColumns(spark, sf)
    assert(cols.select("table_name").distinct().count() ==
      Tables.all.length)
    assert(cols.filter(col("table_name") === "events")
      .filter(col("col_name") === "ts").count() == 1)
    val tbls = SourceOps.insTables(spark, sf)
    assert(tbls.count() == Tables.all.length)
    assert(tbls.filter(col("table_name") === "region")
      .head.getLong(1) == 5)
  }
}
