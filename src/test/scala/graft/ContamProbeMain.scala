package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch probe (test scope): contamination candidate volume + stage
  * walls at a given SF dir — the data behind the r22 train-side
  * positional-bound decision (VERDICT r21 queue #7).
  * Usage: sbt "Test/runMain graft.ContamProbeMain" with
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. */
object ContamProbeMain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{DedupOps, TextOps}
    // mirror the declared dedup_contamination gate's inputs
    val docs = Tables(spark, sfDir, "documents")
    val train = docs.filter(col("doc_id") % 7 =!= 0)
    val eval = docs.filter(col("doc_id") % 7 === 0)
    def t[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val k = 3; val threshold = 0.8
    val tSets = DedupOps.shingleSets(train, "doc_id", "text", k)
      .filter(size(col("_set")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val eSets = DedupOps.shingleSets(eval, "doc_id", "text", k)
      .filter(size(col("_set")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tIdx = tSets.select(col("_id"), explode(col("_set")).as("_g"))
    val tDf = tIdx.groupBy("_g").agg(count(lit(1)).as("_df"))
    val pfx = DedupOps.evalPrefixIndex(tDf, eSets, threshold)
    val nPfx = t("eval prefix rows")(pfx.count())
    val cands0 = tIdx.join(broadcast(pfx), Seq("_g"))
      .filter(col("_id") =!= col("_eid"))
      .select(col("_eid"), col("_id"))
    val nPairsRaw = t("candidate join rows (pre-distinct)")(cands0.count())
    val nPairs = t("distinct candidate pairs")(cands0.distinct().count())
    // selectivity of the free length bound |T| >= ceil(t*|E|)
    val tIdxN = tSets.select(col("_id"), size(col("_set")).as("_tn"),
      explode(col("_set")).as("_g"))
    val pfxN = eSets.select(col("_id").as("_eid"),
        size(col("_set")).as("_en"), explode(col("_set")).as("_g"))
      .join(pfx.withColumnRenamed("_eid", "_pid"),
        col("_eid") === col("_pid") && pfxN_gEq)
    def pfxN_gEq = col("_g") === col("_g") // placeholder
    val nLen = 0L
    val nTrue = t("verified pairs (full gate)")(
      DedupOps.contamination(train, "doc_id", "text",
        eval, "doc_id", "text", k, threshold).count())
    println(s"[probe] sf=$sfDir prefixRows=$nPfx rawJoin=$nPairsRaw " +
      s"distinctCands=$nPairs verified=$nTrue")
    spark.stop()
  }
}
