package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.GraftSql
/** Scratch parse-coverage probe (test scope, not shipped). */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    def resolve(n: String): DataFrame = Tables(spark, dir, n)
    val qs = Seq(
      "select 16-6 from events",
      "select _wstart, _wend, count(*), sum(value) from events count_window(4) having sum(value) > 57",
      "select ts from events where ts>='2024-1-1 8:1:40' and ts<='2024-1-2 8:1:40.500' order by ts limit 10",
      "select value / event_id from events where ts > now - 900d and ts < now limit 5",
      "select cast(value as bigint) from events order by event_id limit 5",
      "select count(*) from events interval(1n) sliding(15d)",
      "select avg(value) from events where event_type in ('click','view') group by user_id having avg(value) > 10 order by user_id",
      "select distinct event_type from events order by event_type",
      "select ts, value from events where (user_id = 1 or user_id = 2) and value between 10 and 20 order by ts limit 5",
      "select top(value, 3) from events group by event_type",
      "select first(*) from events",
      "select last(*) from events",
      "select count(*), event_type from events state_window(event_type) having count(*) > 2",
      "select _wstart, sum(value) from events session(ts, 10m) having sum(value) > 100",
      "select tbname, count(*) from events group by tbname",
      "select * from (select user_id, avg(value) as a from events group by user_id) where a > 20 order by user_id",
      "select avg(value), count(*) from events where value is not null and event_type like 'pur%'",
      "select user_id, case when value > 50 then 'hi' when value > 10 then 'mid' else 'lo' end as band from events order by event_id limit 5",
      "select concat(event_type, '-', cast(user_id as varchar(10))) from events limit 3",
      "select count(*) from events where substr(event_type,1,1)='p'",
      "select interp(value) from events where user_id=1 range('2024-01-01 00:00:00','2024-01-05 00:00:00') every(1d) fill(null)",
      "select percentile(value, 50, 90) from events where user_id = 1",
      "select stateduration(value, 'GT', 30, 1h) from events where user_id = 1 limit 5",
      "select abs(value), ceil(value), floor(value), round(value) from events limit 3",
      "select apercentile(value, 50, 'default') from events",
      "select apercentile(value, 50, 't-digest') from events",
      "select _rowts, value from events limit 3",
      "select ts, value from events order by ts asc nulls first limit 3",
      "select count(*) from events where ts between '2024-01-01' and '2024-01-15'",
      "select user_id, value from events order by value desc limit 3 offset 2"
    )
    var ok = 0
    qs.foreach { q =>
      try {
        GraftSql.query(spark, resolve, q).limit(3).collect()
        ok += 1
      } catch { case e: Throwable =>
        println(s"FAIL: $q\n  -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(180)}")
      }
    }
    println(s"OK $ok/${qs.size}")
    spark.stop()
  }
}
