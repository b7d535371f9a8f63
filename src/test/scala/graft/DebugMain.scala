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
      df.show(5, false)
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
