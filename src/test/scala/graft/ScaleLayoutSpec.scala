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
