package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** ASOF and WINDOW joins (SURVEY.md §2.3; mergejoinoperator.c,
  * sql.y:2766-2799) as DataFrame combinators.
  *
  * The asof join uses the union trick: tag left/right rows, one
  * sort-shuffle on (keys, ts), and an ignore-null running window carries
  * the best right match onto each left row. Cost = one exchange + one
  * sort — the same as any sort-merge join, with no range-explosion and no
  * per-key buffering, so it scales to arbitrarily large sides (AsofJoinExec
  * would buy nothing: Spark's SMJ machinery already provides the layout).
  *
  * The window join is an equi-join on the keys with a range predicate on
  * ts — Catalyst plans it as a sort-merge join with the range as a
  * post-join filter; with equi keys present there is no cartesian blowup.
  */
object JoinOps {

  /** LEFT ASOF JOIN: for each left row, the single best right row with
    * `right.ts <op> left.ts` (op in >=, >, <=, <, =), matching TDengine's
    * `l ASOF JOIN r ON l.ts >= r.ts` orientation: ">=" means the newest
    * right row at-or-before the left ts.
    *
    * @param keys      equi-join keys present in both frames
    * @param rightCols right payload columns to surface (null when no match)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, op: String,
      rightCols: Seq[String]): DataFrame = {
    require(Seq(">=", ">", "<=", "<", "=").contains(op), s"bad asof op $op")
    if (op == "=") {
      val payload = rightCols.map(c => col(c).as(s"r_$c"))
      val r = right.select(keys.map(col) ++ Seq(col(rightTsUs).as("_rts")) ++
        payload: _*)
      return keys.foldLeft(left.join(r,
          keys.map(k => left(k) === r(k)).reduce(_ && _) &&
            left(leftTsUs) === r("_rts"), "left")) { (d, k) => d.drop(r(k)) }
        .drop("_rts")
    }
    val keyCols = keys.map(col)
    val lSlim = left
      .withColumn("_t", col(leftTsUs).cast(LongType))
      .withColumn("_isleft", lit(true))
    val rPayload = struct(rightCols.map(col): _*)
    val rTagged = right
      .withColumn("_t", col(rightTsUs).cast(LongType))
      .withColumn("_isleft", lit(false))
      .select(keyCols :+ col("_t") :+ col("_isleft") :+
        rPayload.as("_rp"): _*)
    val lAligned = lSlim.select(lSlim.columns.map(col) :+
      lit(null).cast(rTagged.schema("_rp").dataType).as("_rp"): _*)
    val rAligned = {
      var r0 = rTagged
      // null columns for every left-only column, to union schemas
      lSlim.columns.filterNot(rTagged.columns.contains).foreach { c =>
        r0 = r0.withColumn(c, lit(null).cast(lSlim.schema(c).dataType))
      }
      r0.select(lAligned.columns.map(col): _*)
    }
    val all = lAligned.unionByName(rAligned)
    // Tie-break at equal ts: for >= / <= the right row is eligible, so it
    // must sort on the "visible" side of the left row; for > / < it is
    // not, so it sorts on the far side.
    val rightFirst = op == ">=" || op == "<"
    val ord = if (rightFirst) col("_isleft").cast("int")
              else -col("_isleft").cast("int")
    val backward = op == ">=" || op == ">" // best match is at-or-before
    val w0 =
      if (keys.isEmpty) Window.orderBy(col("_t"), ord)
      else Window.partitionBy(keyCols: _*).orderBy(col("_t"), ord)
    val rp = when(!col("_isleft"), col("_rp"))
    val matched =
      if (backward)
        last(rp, ignoreNulls = true)
          .over(w0.rowsBetween(Window.unboundedPreceding, -1))
      else
        first(rp, ignoreNulls = true)
          .over(w0.rowsBetween(1, Window.unboundedFollowing))
    val out = all
      .withColumn("_match", matched)
      .filter(col("_isleft"))
    val withPayload = rightCols.foldLeft(out) { (d, c) =>
      d.withColumn(s"r_$c", col("_match").getField(c))
    }
    withPayload.drop("_t", "_isleft", "_rp", "_match")
  }

  /** WINDOW join (sql.y:2775): for each left row, all right rows with
    * `right.ts` in `[left.ts + loUs, left.ts + hiUs]` (plus key equality).
    * Returns the exploded pairs; aggregate per left row for the
    * per-window stats form.
    */
  def windowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, loUs: Long, hiUs: Long,
      rightCols: Seq[String]): DataFrame = {
    val r = right.select(
      keys.map(c => col(c).as(s"_rk_$c")) ++
        Seq(col(rightTsUs).cast(LongType).as("_rts")) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)
    val cond = keys.map(k => left(k) === r(s"_rk_$k")).reduceOption(_ && _)
      .map(_ && r("_rts") >= left(leftTsUs) + lit(loUs) &&
        r("_rts") <= left(leftTsUs) + lit(hiUs))
      .getOrElse(r("_rts") >= left(leftTsUs) + lit(loUs) &&
        r("_rts") <= left(leftTsUs) + lit(hiUs))
    left.join(r, cond, "left")
      .drop(keys.map(k => s"_rk_$k"): _*)
  }
}
