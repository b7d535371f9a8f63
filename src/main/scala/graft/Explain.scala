package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** Plan-capture tool for the optimization rounds: writes the
  * `.explain("formatted")` output of each named query to
  * `$SPARK_GRAFT_PLAN_DIR/<query>_<suffix>.txt` so plan claims in
  * OPTIMIZATION notes are checkable without running Spark.
  *
  * Usage: sbt "runMain graft.Explain <suffix> <query1> [query2 ...]"
  * Env: SPARK_GRAFT_SF_DIR (data dir), SPARK_GRAFT_CPUS (cores),
  *      SPARK_GRAFT_PLAN_DIR (output dir, default plans/r21).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.Explain <suffix> <query1> [query2 ...]")
    val suffix = args(0)
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outDir = Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r21"))
    Files.createDirectories(outDir)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query: $name"))
      val df = fn(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val p = outDir.resolve(s"${name}_$suffix.txt")
      Files.write(p, txt.getBytes(StandardCharsets.UTF_8))
      println(s"wrote $p (${txt.length} chars)")
      spark.catalog.clearCache()
      graft.ops.GlobalScan.release()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
