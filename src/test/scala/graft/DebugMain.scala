package graft
import org.apache.spark.sql.SparkSession
object DebugMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables(spark, "/root/testdata/sf0.001", "events")
    try {
      val df = graft.sql.GraftSql.query(spark, _ => events, args(0))
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN")) {
        df.queryExecution.toRdd.count()
        println(df.queryExecution.executedPlan.toString.take(
          sys.env.getOrElse("SPARK_GRAFT_EXPLAIN", "4000").toInt))
      } else df.show(5, false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
