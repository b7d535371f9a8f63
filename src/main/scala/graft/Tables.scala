package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet testdata (TESTDATA.md).
  *
  * At 100 TB the same API points at a partitioned parquet/lakehouse
  * directory; everything downstream is layout-agnostic DataFrames, so only
  * this file changes. Reads are plain `spark.read.parquet`, which keeps
  * predicate pushdown, column pruning and partition pruning intact.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Small dimension tables that should always be broadcast in joins. */
  val smallDims: Set[String] = Set("region", "nation")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** The `events` table carries a nanosecond-precision timestamp, which
    * Spark's parquet reader rejects ([PARQUET_TYPE_ILLEGAL]). Read it as a
    * Long (ns since epoch) and expose `ts` in the Long-microsecond domain —
    * the same truncation DuckDB applies when it loads timestamp[ns], so
    * oracle comparisons line up exactly. This mirrors the reference's
    * ns-precision databases (SURVEY §1.2: Long epoch + precision metadata).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // integer DIV: ns epoch (~1.7e18) is not exactly representable as a
    // double, so `/` (double division) would corrupt low-order digits.
    raw.withColumn("ts", org.apache.spark.sql.functions.expr("ts DIV 1000L"))
  }
}
