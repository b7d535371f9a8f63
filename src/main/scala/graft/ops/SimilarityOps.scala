package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (exact-decimal dot products so
  * results are engine-reproducible). Scale path: sign-bit LSH — each
  * vector hashes to a bucket from the signs of `planes` pseudo-random
  * hyperplane projections; queries only score their own bucket. Planes
  * are derived from xxhash64, so the index is deterministic and needs no
  * stored model. At 100 TB you'd raise `planes` (buckets grow as 2^p)
  * and add multi-probe; the query plan shape (broadcast queries, one
  * hash shuffle on bucket) is unchanged.
  */
object SimilarityOps {

  /** Brute-force cosine top-k of `candidates` for each query vector.
    * Queries are broadcast; candidates stream through one shuffle. */
  def bruteForceTopK(queries: DataFrame, candidates: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val qx = DedupOps.explodedDecimal(queries, idCol, vecCol)
      .withColumnRenamed("_id", "q_id").withColumnRenamed("_x", "_qx")
    val cx = DedupOps.explodedDecimal(candidates, idCol, vecCol)
    val qn = DedupOps.norms(DedupOps.explodedDecimal(queries, idCol, vecCol))
      .withColumnRenamed("_id", "q_id").withColumnRenamed("_n2", "_qn2")
    val cn = DedupOps.norms(cx)
    val dots = cx.join(broadcast(qx), Seq("pos"))
      .filter(col("q_id") =!= col("_id"))
      .groupBy(col("q_id"), col("_id"))
      .agg(sum(col("_x") * col("_qx")).cast("double").as("_dot"))
    val scored = dots
      .join(broadcast(qn), "q_id")
      .join(cn, "_id")
      .withColumn("cosine", col("_dot") / sqrt(col("_qn2") * col("_n2")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("_id").as("cand_id"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane, dim):
    * xxhash64 folded to [-1, 1). Good enough for bucketing. */
  private def planeWeight(plane: Int, dim: org.apache.spark.sql.Column) =
    (pmod(xxhash64(lit(plane), dim), lit(2000001L)) - lit(1000000L))
      .cast("double") / lit(1000000.0)

  /** Sign-bit LSH bucket id from `planes` hyperplanes. */
  def lshBucket(exploded: DataFrame, planes: Int): DataFrame =
    exploded
      .select(col("_id"), col("pos"), col("_x"),
        explode(sequence(lit(0), lit(planes - 1))).as("_p"))
      .withColumn("_w", planeWeight(0, col("pos") * lit(16) + col("_p")))
      .groupBy("_id", "_p")
      .agg(sum(col("_x").cast("double") * col("_w")).as("_proj"))
      .groupBy("_id")
      .agg(sum(when(col("_proj") > 0,
        expr("shiftleft(1L, CAST(_p AS INT))")).otherwise(0L)).as("bucket"))

  /** ANN top-k with multi-probe: queries score candidates in their own
    * LSH bucket plus every bucket within hamming distance 1 (flip one
    * plane bit) — the standard trick to buy recall without more tables.
    * Returns the same schema as bruteForceTopK (recall < 1 by design). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4): DataFrame = {
    val qx = DedupOps.explodedDecimal(queries, idCol, vecCol)
    val cx = DedupOps.explodedDecimal(candidates, idCol, vecCol)
    val qb = lshBucket(qx, planes).withColumnRenamed("_id", "q_id")
      .withColumn("bucket", explode(concat(array(col("bucket")),
        transform(sequence(lit(0), lit(planes - 1)),
          i => col("bucket").bitwiseXOR(pow(lit(2), i).cast("long"))))))
    val cb = lshBucket(cx, planes)
    val qxb = qx.withColumnRenamed("_id", "q_id")
      .withColumnRenamed("_x", "_qx").join(broadcast(qb), "q_id")
    val cxb = cx.join(cb, "_id")
    val qn = DedupOps.norms(qx).withColumnRenamed("_id", "q_id")
      .withColumnRenamed("_n2", "_qn2")
    val cn = DedupOps.norms(cx)
    val dots = cxb.join(broadcast(qxb),
        Seq("pos", "bucket"))
      .filter(col("q_id") =!= col("_id"))
      .groupBy(col("q_id"), col("_id"))
      .agg(sum(col("_x") * col("_qx")).cast("double").as("_dot"))
    val scored = dots
      .join(broadcast(qn), "q_id")
      .join(cn, "_id")
      .withColumn("cosine", col("_dot") / sqrt(col("_qn2") * col("_n2")))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cosine").desc, col("_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("_id").as("cand_id"),
        round(col("cosine"), 6).as("cosine"))
  }
}
