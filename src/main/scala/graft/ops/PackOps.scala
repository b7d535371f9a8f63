package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing for training-batch construction: assign documents
  * to fixed-token-budget bins so a trainer reads dense, deterministic
  * batches. Next-fit in id order within each group — the streaming
  * packing rule every data loader can reproduce: a document that would
  * overflow the open bin closes it and starts the next (a document
  * longer than the budget occupies a bin alone).
  *
  * Scale shape: one shuffle keyed by the group column, then a
  * streaming per-partition scan with O(1) state — group size is
  * unbounded in ROWS but never materialized (no collect_list, no
  * window over the whole group). At 100 TB the group key is sharded
  * (e.g. (source, hash(id) % k)) so no single reducer drains a whole
  * mega-source; bins never cross shards by construction, which is the
  * property trainers want anyway (shard = worker).
  */
object PackOps {

  /** Pack rows of `df` into bins of at most `budget` tokens per group.
    * Deterministic in (groupCol, idCol): rows are packed in ascending
    * id order. Returns (groupCol, idCol, n_tokens, bin).
    */
  def nextFitPack(df: DataFrame, groupCol: String, idCol: String,
      tokens: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(col(groupCol).cast("string").as("_grp"),
        col(idCol).cast("long").as("_id"), tokens.cast("long").as("_tok"))
      // secondary sort: all rows of a group land in one partition,
      // ordered by id — the packing scan is then a pure iterator pass
      .repartition(col("_grp"))
      .sortWithinPartitions(col("_grp"), col("_id"))
    in.as[(String, Long, Long)].mapPartitions { it =>
      var g: String = null
      var bin = 0L
      var cum = 0L
      it.map { case (grp, id, tok) =>
        if (grp != g) { g = grp; bin = 0L; cum = tok }
        else if (cum + tok > budget) { bin += 1; cum = tok }
        else cum += tok
        (grp, id, tok, bin)
      }
    }.toDF(groupCol, idCol, "n_tokens", "bin")
  }
}
