package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTestSession._

  test("every declared query has a runnable plan at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name produced no columns")
      assert(df.count() >= 0, s"$name failed to execute")
    }
  }

  test("q1_agg matches hand-checked aggregate") {
    val rows = SparkEntry.queries("q1_agg")(spark, sf).collect()
    assert(rows.length == 6)
    val r = rows.head // (A, F) group
    assert(r.getAs[String]("l_returnflag") == "A")
    assert(r.getAs[Long]("count_order") > 0)
  }

  test("join_semi + join_anti partition customer exactly") {
    val cust = Tables(spark, sf, "customer")
    val ord = Tables(spark, sf, "orders")
    val semiAll =
      cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi").count()
    val anti = SparkEntry.queries("join_anti")(spark, sf).count()
    assert(semiAll + anti == cust.count())
  }

  test("sort_limit returns exactly k in strict order") {
    val prices = SparkEntry.queries("sort_limit")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.length == 10)
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("entry smoke: flagship query returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
