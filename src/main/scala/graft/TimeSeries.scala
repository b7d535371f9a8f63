package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Time-series layer (SURVEY.md §2.5, §2.3): interval/session/state/event/
  * count windows, fill, interp, asof/window joins. Populated module by
  * module; see graft.ops.* for the reusable lowerings. */
object TimeSeries {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
