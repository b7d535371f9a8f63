package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-mix construction. At 100 TB a
  * data mix is specified as per-stratum keep rates ("10% of web crawl,
  * all of the curated sources") and the selection MUST be reproducible
  * across re-runs, partitionings, and engines — a `rand()` sample is
  * none of those. The accept test here is a pure per-row hash
  * comparison: keep iff the first 8 hex digits of md5(salt ++ id) fall
  * under the rate's threshold. Map-side, codegen'd, no shuffle, no
  * state; changing `salt` draws an independent sample; the SAME salt
  * re-selects byte-identical rows on any cluster size. md5 is the
  * portable hash (identical text form in Spark and DuckDB), which is
  * what makes the sample oracle-checkable.
  */
object SampleOps {

  /** 8-hex-digit threshold for `rate` of the uniform 32-bit space:
    * u < rate iff hex32(u) < thresholdHex(rate) — fixed-width
    * lowercase hex compares lexicographically, and "g" sorts above
    * every hex digit so rate 1.0 accepts all rows. */
  def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    val t = math.round(rate * 4294967296.0)
    if (t >= 4294967296L) "g" else f"$t%08x"
  }

  /** First 8 hex digits of md5(salt ++ id): a uniform 32-bit draw,
    * stable in (salt, id). */
  def hashHex(idCol: Column, salt: String): Column =
    substring(md5(concat(lit(salt), idCol.cast("string"))), 1, 8)

  /** Keep each row of stratum `s` with probability `rates(s)`
    * (`defaultRate` for unlisted strata), deterministically in
    * (salt, id). */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      salt: String = "graft"): DataFrame = {
    val th = rates.toSeq.sortBy(_._1).foldLeft(
      lit(thresholdHex(defaultRate))) { case (acc, (s, r)) =>
        when(col(strataCol) === s, lit(thresholdHex(r))).otherwise(acc)
    }
    df.filter(hashHex(col(idCol), salt) < th)
  }

  /** Exact-size deterministic mixture: per stratum keep the
    * `k_s = min(round(frac * N_total * p_s), N_s)` rows with the
    * smallest portable hash, where `p_s` are the target mixture
    * weights. Rank-based rather than threshold-based, so the drawn
    * counts hit the data-mix spec EXACTLY (a threshold sample only
    * gets the rate right in expectation — a mix spec is a contract on
    * counts). Reproducible in (salt, id) on any cluster size.
    *
    * Shape: two tiny aggregates for the stratum counts (broadcast
    * back), then one per-stratum window rank. The rank shuffle is
    * keyed by the stratum — at 100 TB with few huge strata, shard the
    * stratum column first and split k across shards, or refine a hash
    * threshold from an approx quantile instead of ranking. */
  def exactMix(df: DataFrame, idCol: String, strataCol: String,
      proportions: Map[String, Double], defaultProp: Double = 0.0,
      frac: Double = 1.0, salt: String = "graft"): DataFrame = {
    require(frac >= 0.0 && frac <= 1.0, s"frac out of [0,1]: $frac")
    val p = proportions.toSeq.sortBy(_._1).foldLeft(lit(defaultProp)) {
      case (acc, (s, w)) => when(col(strataCol) === s, lit(w)).otherwise(acc)
    }
    val perStratum = df.groupBy(col(strataCol))
      .agg(count(lit(1)).as("_cnt"))
    val counts = perStratum
      .crossJoin(broadcast(perStratum.agg(sum(col("_cnt")).as("_tot"))))
      .select(col(strataCol),
        least(round(lit(frac) * col("_tot") * p).cast("long"),
          col("_cnt")).as("_k"))
    val ranked = df.withColumn("_rn",
      org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol))
          .orderBy(hashHex(col(idCol), salt), col(idCol))))
    ranked.join(broadcast(counts), strataCol)
      .filter(col("_rn") <= col("_k"))
      .drop("_rn", "_k")
  }
}
