package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is one operator from SURVEY.md §2, lowered
  * Spark-first; [[oracleSql]] carries the DuckDB-equivalent SQL the driver
  * hash-compares against at sf0.01.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TimeSeries.queries ++ Functions.queries ++
      Pipeline.queries ++ Analytics.queries ++ Sources.queries ++
      Dialect.queries ++ Ddl.queries

  def oracleSql: Map[String, String] =
    Relational.oracleSql ++ TimeSeries.oracleSql ++ Functions.oracleSql ++
      Pipeline.oracleSql ++ Analytics.oracleSql ++ Sources.oracleSql ++
      Dialect.oracleSql ++ Ddl.oracleSql
}
