package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scalar + aggregate function surface (SURVEY.md §2.9, §2.10). */
object Functions {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
