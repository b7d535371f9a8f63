package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard (exact pairwise via inverted index), MinHash+LSH
  * (banded candidate generation + exact verification), and
  * embedding-cosine near-duplicates.
  *
  * Scale notes: every stage is a hash shuffle on bounded keys. The
  * inverted-index join's worst case is a hot shingle shared by many docs;
  * at 100 TB you cap shingle document-frequency first (the standard
  * trick) — `maxShingleDf` does that here. MinHash+LSH replaces the
  * quadratic verify set with banded buckets, which is the scale path.
  */
object DedupOps {

  /** Exact dedup on the canonical text: keeps the smallest id per group. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextOps.normalize(col(textCol)).as("_canon"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .drop("_canon")

  /** Distinct (id, shingle) pairs, optionally dropping shingles that
    * occur in more than `maxShingleDf` documents (hot-key cap). */
  def shingleIndex(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      explode(TextOps.shingles(col(textCol), k)).as("_g")).distinct()
    maxShingleDf match {
      case Some(cap) =>
        val hot = sh.groupBy("_g").agg(count(lit(1)).as("_df"))
          .filter(col("_df") > cap).select("_g")
        sh.join(hot, Seq("_g"), "left_anti")
      case None => sh
    }
  }

  /** Exact n-gram Jaccard similarity for all pairs meeting `threshold`,
    * via inverted-index self-join (common-count / union-count). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.8): DataFrame = {
    val sh = shingleIndex(docs, idCol, textCol, k)
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("_n"))
    val a = sh.as("a"); val b = sh.as("b")
    val common = a.join(b, col("a._g") === col("b._g") &&
        col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(count(lit(1)).as("_c"))
    common
      .join(sizes.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("_n", "_na"), "id_a")
      .join(sizes.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("_n", "_nb"), "id_b")
      .withColumn("jaccard",
        col("_c").cast("double") / (col("_na") + col("_nb") - col("_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** MinHash signatures: `numHashes` seeded xxhash64 minima over the
    * shingle set. One shuffle (the groupBy); signature width is constant. */
  def minhashSignatures(sh: DataFrame, numHashes: Int = 32): DataFrame =
    sh.select(col("_id"), col("_g"),
        explode(sequence(lit(0), lit(numHashes - 1))).as("_seed"))
      .withColumn("_h", xxhash64(col("_seed"), col("_g")))
      .groupBy("_id", "_seed").agg(min("_h").as("_mh"))
      .groupBy("_id")
      .agg(transform(array_sort(collect_list(struct(col("_seed"), col("_mh")))),
        x => x.getField("_mh")).as("_sig"))

  /** LSH candidate pairs: split the signature into `bands`, bucket on the
    * hash of each band slice, and pair ids sharing any bucket. */
  def lshCandidates(sigs: DataFrame, numHashes: Int = 32,
      bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    val banded = sigs.select(col("_id"),
        explode(sequence(lit(0), lit(bands - 1))).as("_band"))
      .join(sigs, "_id")
      .withColumn("_bh", hash(col("_band"),
        slice(col("_sig"), col("_band") * rows + 1, lit(rows))))
      .select("_id", "_band", "_bh")
    banded.as("x").join(banded.as("y"),
        col("x._band") === col("y._band") && col("x._bh") === col("y._bh") &&
          col("x._id") < col("y._id"))
      .select(col("x._id").as("id_a"), col("y._id").as("id_b"))
      .distinct()
  }

  /** Full MinHash+LSH near-dup pipeline: banded candidates, then exact
    * Jaccard verification at `threshold`. With 32 hashes / 16 bands the
    * probability of missing a pair at j>=0.9 is ~(1-j^2)^16 ≈ 1e-11. */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, threshold: Double = 0.9): DataFrame = {
    val sh = shingleIndex(docs, idCol, textCol, k)
    val cands = lshCandidates(minhashSignatures(sh))
    val sets = sh.groupBy("_id").agg(collect_set("_g").as("_set"))
    cands
      .join(sets.select(col("_id").as("id_a"), col("_set").as("_sa")), "id_a")
      .join(sets.select(col("_id").as("id_b"), col("_set").as("_sb")), "id_b")
      .withColumn("_c", size(array_intersect(col("_sa"), col("_sb"))))
      .withColumn("jaccard", col("_c").cast("double") /
        (size(col("_sa")) + size(col("_sb")) - col("_c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** Embedding rows exploded to (id, pos, exact-decimal component).
    * DECIMAL(12,6) quantization makes every downstream dot product
    * order-independent and engine-independent. */
  def explodedDecimal(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol).as("_id"), posexplode(col(vecCol)))
      .select(col("_id"), col("pos"),
        col("col").cast("double").cast(DecimalType(12, 6)).as("_x"))

  /** Squared norms from the exploded representation. */
  def norms(exploded: DataFrame): DataFrame =
    exploded.groupBy("_id")
      .agg(sum(col("_x") * col("_x")).cast("double").as("_n2"))

  /** Cosine-similarity pairs >= `threshold` among ids < `maxId` (the
    * pairwise-exact form; the LSH path in SimilarityOps is the scale
    * route — exact pairs over everything is inherently quadratic). */
  def embeddingCosinePairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, maxId: Long): DataFrame = {
    val ex = explodedDecimal(emb.filter(col(idCol) < maxId), idCol, vecCol)
    val nn = norms(ex)
    val dots = ex.as("a").join(ex.as("b"),
        col("a.pos") === col("b.pos") && col("a._id") < col("b._id"))
      .groupBy(col("a._id").as("id_a"), col("b._id").as("id_b"))
      .agg(sum(col("a._x") * col("b._x")).cast("double").as("_dot"))
    dots
      .join(nn.select(col("_id").as("id_a"), col("_n2").as("_na")), "id_a")
      .join(nn.select(col("_id").as("id_b"), col("_n2").as("_nb")), "id_b")
      .withColumn("cosine", col("_dot") / sqrt(col("_na") * col("_nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }
}
