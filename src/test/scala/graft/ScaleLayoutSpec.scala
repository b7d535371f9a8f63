package graft

import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SourceOps

/** Verifies the co-located storage layout removes exchanges — the
  * batch analog of the reference's per-vnode partitioning (SURVEY
  * §4.3): bucketed-by-key tables serve key aggregations and key joins
  * with zero shuffles. */
class ScaleLayoutSpec extends AnyFunSuite {
  import SparkTestSession._

  private def countOf(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  private lazy val setup: Unit = {
    SourceOps.writeBucketed(
      Tables(spark, sf, "events").select("user_id", "ts", "value"),
      "ev_bucketed", buckets = 4, bucketCol = "user_id",
      sortCols = Seq("user_id", "ts"))
  }

  test("aggregation on the bucket key needs no exchange") {
    setup
    val agg = spark.table("ev_bucketed").groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum("value").as("s"))
    val plan = agg.queryExecution.explainString(SimpleMode)
    assert(countOf(plan, "Exchange") == 0,
      s"bucketed aggregation still shuffles:\n$plan")
    assert(agg.count() == Tables(spark, sf, "events")
      .select("user_id").distinct().count())
  }

  test("latest-rows cache writes hash buckets; lookups prune to one") {
    import spark.implicits._
    import graft.streaming.LatestRows
    val dir = java.nio.file.Files.createTempDirectory("lr_bucketed").toString
    val path = s"$dir/cache"
    val maintain = LatestRows.maintainer(spark, path, Seq("k"), "ts",
      buckets = 4)
    maintain(Seq((1L, 10L, "a"), (2L, 10L, "b"), (3L, 10L, "c"),
      (4L, 10L, "d"), (5L, 10L, "e")).toDF("k", "ts", "v"), 0L)
    // second batch: newer rows win, bucket layout preserved
    maintain(Seq((1L, 20L, "a2"), (6L, 20L, "f")).toDF("k", "ts", "v"), 1L)
    val bucketDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("_bucket=")).map(_.getName).sorted
    assert(bucketDirs.length > 1, s"expected >1 bucket dirs: ${bucketDirs.toSeq}")
    val cache = spark.read.parquet(path)
    assert(cache.count() == 6)
    assert(cache.filter(col("k") === 1L).head.getAs[String]("v") == "a2")
    // the point lookup prunes on the _bucket partition column
    val look = LatestRows.lookup(spark, path, Seq("k"), Seq(1L), buckets = 4)
    assert(look.head.getAs[String]("v") == "a2")
    val scan = look.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") && scan.contains("_bucket"),
      s"lookup does not partition-prune:\n$scan")
  }

  test("self-join on the bucket key needs no exchange") {
    setup
    val t1 = spark.table("ev_bucketed").groupBy("user_id")
      .agg(max("value").as("mx"))
    val t2 = spark.table("ev_bucketed").groupBy("user_id")
      .agg(min("value").as("mn"))
    val joined = t1.hint("merge").join(t2, "user_id")
    val plan = joined.queryExecution.explainString(SimpleMode)
    assert(countOf(plan, "Exchange") == 0,
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() > 0)
  }
}
