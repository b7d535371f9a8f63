package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SourceOps

/** FederatedScan (federatedscanoperator.c:16) against an in-JVM Derby
  * database: rows arrive, filters and projection push into the remote
  * SQL, and range partitioning slices the read for parallelism. */
class FederatedSpec extends AnyFunSuite {
  import SparkTestSession._

  private val url = "jdbc:derby:memory:graftfed;create=true"
  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private lazy val seeded: Unit = {
    Class.forName(driver)
    val c = DriverManager.getConnection(url)
    val st = c.createStatement()
    st.execute(
      """CREATE TABLE metrics (
           id BIGINT NOT NULL, device VARCHAR(16), ts BIGINT, v DOUBLE)""")
    val ps = c.prepareStatement("INSERT INTO metrics VALUES (?, ?, ?, ?)")
    for (i <- 0 until 1000) {
      ps.setLong(1, i)
      ps.setString(2, s"d${i % 7}")
      ps.setLong(3, 1704067200000L + i * 1000L)
      ps.setDouble(4, i * 0.5)
      ps.addBatch()
    }
    ps.executeBatch()
    c.close()
  }

  test("federatedScan reads the remote table") {
    seeded
    val df = SourceOps.federatedScan(spark, url, "metrics", driver)
    assert(df.count() == 1000)
    assert(df.columns.map(_.toLowerCase).toSet ==
      Set("id", "device", "ts", "v"))
  }

  test("filters and projection push into the remote query") {
    seeded
    val df = SourceOps.federatedScan(spark, url, "metrics", driver)
      .filter(col("device") === "d3" && col("ts") >= 1704067500000L)
      .select("id", "v")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("DEVICE") || plan.contains("device"), plan)
    // projection pruned to the selected + filter columns only
    assert(!plan.toLowerCase.contains("select \"id\",\"device\",\"ts\",\"v\""))
    assert(df.count() == (0 until 1000)
      .count(i => i % 7 == 3 && 1704067200000L + i * 1000L >= 1704067500000L))
  }

  test("range partitioning slices the read into n parallel queries") {
    seeded
    val df = SourceOps.federatedScan(spark, url, "metrics", driver,
      partition = Some(("id", 0L, 1000L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 1000)
    // slices are disjoint and complete
    assert(df.select(countDistinct("id")).head.getLong(0) == 1000)
  }
}
