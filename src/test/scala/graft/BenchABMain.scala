package graft
import org.apache.spark.sql.SparkSession

/** Scoped warm in-JVM A/B runner (test scope, not shipped): times the
  * named declared queries with the EXACT Bench methodology
  * (toRdd.count materialization, clearCache + blocking unpersist +
  * GC between readings) for `iters` rounds in one JVM, interleaving
  * the queries each round so host bursts hit both sides of an A/B
  * equally. Usage:
  *   sbt "Test/runMain graft.BenchABMain <iters> <query1> [query2 ...]"
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same as Bench).
  */
object BenchABMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchABMain <iters> <query...>")
    val iters = args(0).toInt
    val names = args.drop(1).toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq("lineitem", "orders", "events", "documents", "embeddings")
      .foreach(t => Tables(spark, sfDir, t).count())
    def time(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      graft.ops.GlobalScan.release()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      dt
    }
    val acc = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    // round 0 is the untimed warmup (codegen/JIT); rounds 1..iters print
    (0 to iters).foreach { it =>
      names.foreach { n =>
        val dt = time(n)
        if (it > 0) {
          acc(n) = acc(n) :+ dt
          println(f"[ab] $n%-28s iter=$it dt=$dt%.3f s")
        }
      }
    }
    names.foreach { n =>
      val v = acc(n)
      println(f"[ab] $n%-28s min=${v.min}%.3f med=${
        v.sorted.apply(v.size / 2)}%.3f max=${v.max}%.3f")
    }
    spark.stop()
  }
}
