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

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
