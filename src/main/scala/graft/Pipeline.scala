package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Training-data pipeline operators: dedup, similarity search, text
  * analysis, multimodal plumbing (builder prompt; graded alongside §2). */
object Pipeline {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
