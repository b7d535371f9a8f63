package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sql.GraftSql

/** Queries expressed in the TDengine SQL dialect and lowered through
  * [[graft.sql.GraftSql]] — proving the text front end produces the
  * same oracle-exact plans as the DataFrame API. */
object Dialect {

  private val T0 = 1704067200000000L
  private val T5 = T0 + 5L * 86400000000L

  private def run(s: SparkSession, dir: String, sql: String): DataFrame =
    GraftSql.query(s, name => Tables(s, dir, name), sql)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dialect_interval" -> { (s, dir) =>
      run(s, dir,
        """SELECT _wstart, count(*) AS n, sum(value) AS sum_value
           FROM events INTERVAL(1h) ORDER BY _wstart""")
    },
    "dialect_partition_fill" -> { (s, dir) =>
      run(s, dir,
        s"""SELECT user_id, _wstart, sum(value) AS v
            FROM events WHERE ts >= $T0 AND ts < $T5
            PARTITION BY user_id INTERVAL(1d) FILL(PREV)
            ORDER BY user_id, _wstart""")
    })

  def oracleSql: Map[String, String] = Map(
    "dialect_interval" ->
      """SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS _wstart,
           count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1 ORDER BY _wstart""",
    "dialect_partition_fill" ->
      s"""WITH agg AS (
            SELECT user_id,
              epoch_us(ts) - epoch_us(ts) % 86400000000 AS ws,
              CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
            FROM events
            WHERE epoch_us(ts) >= $T0 AND epoch_us(ts) < $T5
            GROUP BY 1, 2),
          spine AS (
            SELECT u.user_id, gs.ws
            FROM (SELECT DISTINCT user_id FROM agg) u
            CROSS JOIN (SELECT unnest(range($T0, $T5, 86400000000)) AS ws) gs),
          joined AS (
            SELECT s.user_id, s.ws, a.v, a.v IS NULL AS _isfilled
            FROM spine s LEFT JOIN agg a
              ON s.user_id = a.user_id AND s.ws = a.ws)
          SELECT user_id, ws AS _wstart,
            last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
              ORDER BY ws ROWS UNBOUNDED PRECEDING) AS v, _isfilled
          FROM joined ORDER BY user_id, _wstart""")
}
