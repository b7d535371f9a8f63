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
    * bucket is fully deterministic). `planeOffset` selects which slice
    * of the 16-wide deterministic plane pool the table uses — the
    * weight index stride fixes `planeOffset + planes <= 16`; more
    * tables (not more planes per table) is the scale-out axis. */
  def lshBucketCol(vec: Column, planes: Int, planeOffset: Int = 0): Column = {
    require(planes >= 1 && planeOffset >= 0 && planeOffset + planes <= 16,
      s"plane slice must fit [0,16) (weight-index stride): " +
        s"offset=$planeOffset planes=$planes")
    val projs = transform(sequence(lit(0), lit(planes - 1)), p =>
      aggregate(
        zip_with(vec, sequence(lit(0), size(vec) - 1), (x, i) =>
          x.cast("double").cast(DecimalType(12, 6)).cast("double") *
            planeWeight(i * 16 + planeOffset + p)),
        lit(0.0), (acc, x) => acc + x))
    aggregate(
      zip_with(projs, sequence(lit(0), lit(planes - 1)), (pr, p) =>
        when(pr > 0, pow(lit(2.0), p).cast("long")).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
  }

  /** ANN top-k with multi-probe and OR-amplification: `tables`
    * independent hash tables (disjoint plane slices of the
    * deterministic pool), and within each table queries probe their own
    * bucket plus every bucket at hamming distance 1. A candidate
    * colliding with the query in ANY table is scored (pairs are
    * deduplicated before ranking), so recall compounds as
    * 1-(1-r)^tables while the candidate side stays a map-side
    * expression (one bucket id per table). Returns the same schema as
    * bruteForceTopK (recall < 1 by design). */
  def lshTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, planes: Int = 4, tables: Int = 1): DataFrame = {
    require(tables >= 1 && planes * tables <= 16,
      s"plane budget: planes*tables <= 16, got $planes*$tables")
    // all table bucket ids in ONE native-expression pass over the
    // vector (graft.functions.LshBuckets — bit-identical to the
    // lshBucketCol formula); table t's ids are tagged t<<planes.
    // Flipping a low bit stays inside the table, so the hamming-1
    // probe set derives from the array with cheap bit ops.
    val buckets = graft.functions.NativeExpressions
      .lshBuckets(col(vecCol), planes, tables)
    val qProbes = flatten(transform(buckets, b =>
      concat(array(b), transform(sequence(lit(0), lit(planes - 1)),
        i => b.bitwiseXOR(pow(lit(2), i).cast("long"))))))
    val q = queries.select(col(idCol).as("q_id"),
        DedupOps.microVec(col(vecCol)).as("_qm"),
        explode(qProbes).as("bucket"))
      .withColumn("_qn2", DedupOps.microDot(col("_qm"), col("_qm")))
    val c = candidates.select(col(idCol).as("_id"),
        DedupOps.microVec(col(vecCol)).as("_m"),
        explode(buckets).as("bucket"))
      .withColumn("_n2", DedupOps.microDot(col("_m"), col("_m")))
    // a pair can collide in several tables — dedupe before ranking
    // (rows are value-identical once the bucket id is dropped)
    rankTopK(c.join(broadcast(q), Seq("bucket"))
      .drop("bucket").distinct(), k)
  }

  /** Deterministic IVF-flat ANN: k-means coarse quantizer + inverted
    * lists (the classic alternative to LSH bucketing; FAISS's IVF
    * layout re-expressed on DataFrames).
    *
    * Train: `nlist` centroids seeded from the vectors with the smallest
    * `xxhash64(id)` (a deterministic pseudo-random spread), refined by
    * `iters` Lloyd iterations whose per-dimension means fold through
    * exact DECIMAL sums — so the codebook is bit-reproducible on any
    * cluster layout. Index: every candidate is assigned map-side to its
    * nearest centroid (broadcast codebook, tie -> lowest index). Query:
    * each query probes its `nprobe` nearest lists and scores only those
    * candidates — the scan fraction is ~nprobe/nlist.
    *
    * Scale: the codebook is nlist x dim doubles (driver-tiny; at 100 TB
    * train on a deterministic id-sampled subset — the assignment pass
    * is the only full scan, and it is a map-side expression). Returns
    * the bruteForceTopK schema; recall < 1 by design. */
  def ivfTopK(queries: DataFrame, candidates: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 8, nprobe: Int = 2,
      iters: Int = 2): DataFrame = {
    require(nlist >= 1 && nprobe >= 1 && nprobe <= nlist,
      s"bad IVF config: nlist=$nlist nprobe=$nprobe")
    val spark = candidates.sparkSession
    // spherical k-means: retrieval is by cosine, so the quantizer must
    // cluster directions, not magnitudes — normalize before training
    // and assignment (L2 on unit vectors ranks exactly like cosine)
    val unit = udf { v: Seq[Double] =>
      val n = math.sqrt(v.iterator.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val cand = candidates.select(col(idCol).as("_id"),
      unit(col(vecCol).cast("array<double>")).as("_v"))
    val codebook = trainCodebook(cand, nlist, iters)
    val bc = spark.sparkContext.broadcast(codebook)
    // ---- index + probe ----
    val assign = udf((v: Seq[Double]) => nearestList(bc.value, v))
    val probe = udf((v: Seq[Double]) => nearestLists(bc.value, v, nprobe))
    // scoring stays on the ORIGINAL vectors (same micro-quantized basis
    // as bruteForceTopK/lshTopK); only list assignment is normalized
    val c = candidates
      .select(col(idCol).as("_id"),
        DedupOps.microVec(col(vecCol)).as("_m"),
        assign(unit(col(vecCol).cast("array<double>"))).as("_list"))
      .withColumn("_n2", DedupOps.microDot(col("_m"), col("_m")))
    val q = queries.select(col(idCol).as("q_id"),
        DedupOps.microVec(col(vecCol)).as("_qm"),
        explode(probe(unit(col(vecCol).cast("array<double>"))))
          .as("_list"))
      .withColumn("_qn2", DedupOps.microDot(col("_qm"), col("_qm")))
    rankTopK(c.join(broadcast(q), Seq("_list")).drop("_list"), k)
  }

  /** Unit-normalized copy of a vector column (zero vectors pass
    * through, filtered by norm guards downstream). */
  private[ops] def unitVec(vecCol: Column): Column = {
    val unit = udf { v: Seq[Double] =>
      val n = math.sqrt(v.iterator.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    unit(vecCol.cast("array<double>"))
  }

  /** Spherical k-means codebook over ("_id", unit "_v") rows — shared
    * by the IVF index and SemDeDup clustering. Deterministic by
    * construction: the seed draw orders by (xxhash64(id), id), the
    * centroid means accumulate in exact DECIMAL, and empty clusters
    * keep their previous centroid. The codebook is nlist×dim — a
    * driver-side constant, broadcast back, never data-sized. */
  private[ops] def trainCodebook(cand: DataFrame, nlist: Int,
      iters: Int): Array[Array[Double]] = {
    val spark = cand.sparkSession
    var codebook: Array[Array[Double]] = cand
      .withColumn("_h", xxhash64(col("_id")))
      .orderBy(col("_h"), col("_id")).limit(nlist)
      .collect().map(_.getSeq[Double](1).toArray)
    for (_ <- 0 until iters) {
      val bc = spark.sparkContext.broadcast(codebook)
      val assign = udf((v: Seq[Double]) => nearestList(bc.value, v))
      val stats = cand.withColumn("_c", assign(col("_v")))
        .select(col("_c"), posexplode(col("_v")).as(Seq("_p", "_x")))
        .groupBy(col("_c"), col("_p"))
        .agg(sum(col("_x").cast(DecimalType(28, 10))).as("_s"),
          count(lit(1)).as("_n"))
        .collect()
      val next = codebook.map(_.clone())
      stats.foreach { r =>
        val c = r.getInt(0); val p = r.getInt(1)
        next(c)(p) = r.getDecimal(2).doubleValue() / r.getLong(3)
      } // clusters with no members keep their previous centroid
      codebook = next
    }
    codebook
  }

  /** Cluster assignment column for `vecCol` against a trained codebook
    * (unit-normalized, nearest centroid, tie -> lowest index). */
  private[ops] def assignCol(spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Double]], vecCol: Column): Column = {
    val bc = spark.sparkContext.broadcast(codebook)
    val unit = udf { v: Seq[Double] =>
      val n = math.sqrt(v.iterator.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val assign = udf((v: Seq[Double]) => nearestList(bc.value, v))
    assign(unit(vecCol.cast("array<double>")))
  }

  /** Multi-probe assignment column: the `nprobe` nearest centroids
    * (the IVF probe rule, reused as SemDeDup's boundary-pair net). */
  private[ops] def probeCol(spark: org.apache.spark.sql.SparkSession,
      codebook: Array[Array[Double]], vecCol: Column,
      nprobe: Int): Column = {
    val bc = spark.sparkContext.broadcast(codebook)
    val unit = udf { v: Seq[Double] =>
      val n = math.sqrt(v.iterator.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val probe = udf((v: Seq[Double]) => nearestLists(bc.value, v, nprobe))
    probe(unit(vecCol.cast("array<double>")))
  }

  /** Index of the L2-nearest codebook centroid (tie -> lowest index). */
  private def nearestList(codebook: Array[Array[Double]],
      v: Seq[Double]): Int = {
    var best = 0; var bestD = Double.PositiveInfinity
    var c = 0
    while (c < codebook.length) {
      val cen = codebook(c)
      var d = 0.0; var i = 0
      val n = math.min(cen.length, v.length)
      while (i < n) { val t = v(i) - cen(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Indices of the `n` L2-nearest centroids, nearest first (ties ->
    * lowest index, via the stable sort on (distance, index)). */
  private def nearestLists(codebook: Array[Array[Double]],
      v: Seq[Double], n: Int): Seq[Int] =
    codebook.indices.map { c =>
      val cen = codebook(c)
      var d = 0.0; var i = 0
      val m = math.min(cen.length, v.length)
      while (i < m) { val t = v(i) - cen(i); d += t * t; i += 1 }
      (d, c)
    }.sorted.take(n).map(_._2)

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
