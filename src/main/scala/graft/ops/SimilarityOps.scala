package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact integer dot products so
  * results are engine-reproducible). Scale path: sign-bit LSH — each
  * vector hashes map-side to a bucket from the signs of `planes`
  * pseudo-random hyperplane projections; queries only score their own
  * bucket (plus hamming-1 multi-probe). Planes are derived from
  * xxhash64, so the index is deterministic and needs no stored model.
  *
  * Plan shape at 100 TB: queries broadcast, candidates stream through a
  * single scan — vector quantization, bucketing, and dot products are
  * all per-row array expressions; the only exchange is the final
  * per-query top-k window over already-filtered rows. Raise `planes`
  * (buckets grow as 2^p) to keep per-bucket candidate counts bounded.
  */
object SimilarityOps {

  /** Brute-force cosine top-k of `candidates` for each query vector.
    * Queries are broadcast; candidates stream map-side. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
        DedupOps.microVec(col(vecCol)).as("_qm"))
      .withColumn("_qn2", DedupOps.microDot(col("_qm"), col("_qm")))
    val c = candidates.select(col(idCol).as("_id"),
        DedupOps.microVec(col(vecCol)).as("_m"))
      .withColumn("_n2", DedupOps.microDot(col("_m"), col("_m")))
    rankTopK(c.crossJoin(broadcast(q)), k)
  }

  /** Deterministic pseudo-random hyperplane component for a flat index:
    * xxhash64 folded to [-1, 1). Good enough for bucketing. */
  private def planeWeight(idx: Column): Column =
    (pmod(xxhash64(lit(0), idx), lit(2000001L)) - lit(1000000L))
      .cast("double") / lit(1000000.0)

  /** Sign-bit LSH bucket id from `planes` hyperplanes — a single
    * map-side expression (projections summed in array order, so the
    * bucket is fully deterministic). The weight index stride fixes the
    * plane count at <= 16; more tables (not more planes per table) is
    * the scale-out axis beyond that. */
  def lshBucketCol(vec: Column, planes: Int): Column = {
    require(planes >= 1 && planes <= 16,
      s"planes must be in [1,16] (weight-index stride): $planes")
    val projs = transform(sequence(lit(0), lit(planes - 1)), p =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double").cast(DecimalType(12, 6)).cast("double") *
            planeWeight(i * 16 + p)),
        lit(0.0), (acc, x) => acc + x))
    aggregate(
      zip_with(projs, sequence(lit(0), lit(planes - 1)), (pr, p) =>
        when(pr > 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** ANN top-k with multi-probe: queries score candidates in their own
    * LSH bucket plus every bucket within hamming distance 1 (flip one
    * plane bit) — the standard trick to buy recall without more tables.
    * Returns the same schema as bruteForceTopK (recall < 1 by design). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
        DedupOps.microVec(col(vecCol)).as("_qm"),
        lshBucketCol(col(vecCol), planes).as("_b0"))
      .withColumn("_qn2", DedupOps.microDot(col("_qm"), col("_qm")))
      .withColumn("bucket", explode(concat(array(col("_b0")),
        transform(sequence(lit(0), lit(planes - 1)),
          i => col("_b0").bitwiseXOR(pow(lit(2), i).cast("long"))))))
      .drop("_b0")
    val c = candidates.select(col(idCol).as("_id"),
        DedupOps.microVec(col(vecCol)).as("_m"),
        lshBucketCol(col(vecCol), planes).as("bucket"))
      .withColumn("_n2", DedupOps.microDot(col("_m"), col("_m")))
    rankTopK(c.join(broadcast(q), Seq("bucket")), k)
  }

  /** Shared scoring tail: exact dot, cosine, per-query rank <= k.
    * Zero-norm vectors are dropped — 0/0 would give NaN, which Spark
    * orders above every real cosine and would hijack rank 1. */
  private def rankTopK(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("_id"))
    joined.filter(col("q_id") =!= col("_id"))
      .filter(col("_n2") > 0 && col("_qn2") > 0)
      .withColumn("cosine", DedupOps.microDot(col("_m"), col("_qm")) /
        sqrt(col("_qn2") * col("_n2")))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("_id").as("cand_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
