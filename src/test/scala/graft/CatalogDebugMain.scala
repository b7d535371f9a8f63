package graft
import org.apache.spark.sql.SparkSession
import graft.sql.GraftCatalog

/** Catalog-mode sibling of DebugMain: builds a tiny stable with a
  * tagged child, then runs each CLI arg through GraftCatalog.sql —
  * for reproducing probe receipts that need catalog context. */
object CatalogDebugMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cat = new GraftCatalog(spark)
    cat.sql("CREATE DATABASE scr")
    cat.sql("USE scr")
    cat.sql("CREATE STABLE st (ts TIMESTAMP, c0 INT, c2 INT) " +
      "TAGS (t1 VARCHAR(10))")
    cat.sql("CREATE TABLE sub_null_1 USING st TAGS ('st1')")
    cat.sql("INSERT INTO sub_null_1 VALUES (1704067200000000, 1, 5) " +
      "(1704067201000000, 2, NULL)")
    args.foreach { q =>
      println("== " + q)
      try cat.sql(q).show(10, false)
      catch { case e: Throwable =>
        println("ERR " + e.toString.take(300)) }
    }
    spark.stop()
  }
}
