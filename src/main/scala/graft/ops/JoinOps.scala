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
      rightCols: Seq[String], rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(Seq(">=", ">", "<=", "<", "=").contains(op), s"bad asof op $op")
    if (op == "=") {
      // rename right keys up front: dropping by dataframe-column reference
      // after a join is ambiguous when both sides derive from one source
      val r = right.select(keys.map(c => col(c).as(s"_rk_$c")) ++
        Seq(col(rightTsUs).as("_rts")) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)
      val cond = (keys.map(k => left(k) === r(s"_rk_$k")) :+
        (left(leftTsUs) === r("_rts"))).reduce(_ && _)
      return left.join(r, cond, "left")
        .drop(keys.map(k => s"_rk_$k"): _*).drop("_rts")
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
    // not, so it sorts on the far side. Among right rows at the SAME ts,
    // `rightTieBreak` makes the pick deterministic (backward scans take
    // the last in ascending tie order, forward scans the first).
    val rightFirst = op == ">=" || op == "<"
    val ord = if (rightFirst) col("_isleft").cast("int")
              else -col("_isleft").cast("int")
    val backward = op == ">=" || op == ">" // best match is at-or-before
    val tieOrd = rightTieBreak.map(c => col("_rp").getField(c))
    val out =
      if (keys.isEmpty)
        // no partition key → a global Window.orderBy would collapse to
        // one partition; run the carry as a GlobalScan two-pass instead
        keylessAsofMatch(all, backward, col("_t") +: ord +: tieOrd)
      else {
        val w0 = Window.partitionBy(keyCols: _*)
          .orderBy(col("_t") +: ord +: tieOrd: _*)
        val rp = when(!col("_isleft"), col("_rp"))
        val matched =
          if (backward)
            last(rp, ignoreNulls = true)
              .over(w0.rowsBetween(Window.unboundedPreceding, -1))
          else
            first(rp, ignoreNulls = true)
              .over(w0.rowsBetween(1, Window.unboundedFollowing))
        all.withColumn("_match", matched).filter(col("_isleft"))
      }
    val withPayload = rightCols.foldLeft(out) { (d, c) =>
      d.withColumn(s"r_$c", col("_match").getField(c))
    }
    withPayload.drop("_t", "_isleft", "_rp", "_match")
  }

  /** Keyless asof carry distributed via [[GlobalScan.twoPass]]: the
    * partition effect is "last right payload seen" (one small record
    * per partition). A backward scan walks ascending sort order; the
    * forward variant walks the exact REVERSE total order, which turns
    * "first eligible right row after me" into the same last-seen carry.
    * Output = left rows with `_match` bound, like the keyed branch. */
  private def keylessAsofMatch(all: DataFrame, backward: Boolean,
      sortExprs: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{StructField, StructType}
    var frame = all
    val sortNames = sortExprs.zipWithIndex.map { case (e, i) =>
      frame = frame.withColumn(s"_gs$i", e); s"_gs$i"
    }
    // reversing asc-nulls-first is desc-nulls-last (the defaults)
    val sortCols = sortNames.map(n =>
      if (backward) col(n) else col(n).desc)
    val schema = frame.schema
    val leftIdx = schema.fieldIndex("_isleft")
    val rpIdx = schema.fieldIndex("_rp")
    val outSchema = StructType(schema.fields :+
      StructField("_match", schema("_rp").dataType))
    GlobalScan.twoPass[Option[Row]](frame, sortCols,
      zero = None,
      summary = { it =>
        var lastRp: Option[Row] = None
        it.foreach { r =>
          if (!r.getBoolean(leftIdx)) lastRp = Some(r.getStruct(rpIdx))
        }
        lastRp
      },
      combine = GlobalScan.lastSeen,
      emit = { (carry0, it) =>
        var carry = carry0
        it.flatMap { r =>
          if (!r.getBoolean(leftIdx)) {
            carry = Some(r.getStruct(rpIdx)); None
          } else Some(Row.fromSeq(r.toSeq :+ carry.orNull))
        }
      },
      outSchema)
      .drop(sortNames: _*)
  }

  /** ASOF JOIN with JLIMIT n (sql.y:2797-2799): for each left row, the
    * n best right rows satisfying `right.ts <op> left.ts` — the newest
    * at-or-before matches for backward ops (>=, >), the earliest
    * at-or-after matches for forward ops (<=, <) — ranked `jrank` = 1
    * for the best match.
    *
    * Bounded lowering (SURVEY §7.4 risk 4): right rows are numbered per
    * key in (ts, tie) order; the plain asof join carries only the
    * *index* of the best eligible row; the n adjacent indices (downward
    * for backward ops, upward for forward ops, clamped to [1, per-key
    * count]) are expanded with a constant-size `sequence` and
    * equi-joined back — no per-row collect_list buffers, so memory
    * stays O(n) regardless of history length.
    *
    * `rightTieBreak` orders right rows at equal ts (must make the order
    * total for deterministic results). */
  def asofJoinN(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, op: String, jlimit: Int,
      rightCols: Seq[String], rightTieBreak: Seq[String] = Nil): DataFrame = {
    require(Seq(">=", ">", "<=", "<", "=").contains(op),
      s"bad JLIMIT op $op")
    if (op == "=") {
      // ASOF '=' multi-matches at the exact ts; JLIMIT caps the match
      // count per left row, ranked by the right tiebreak. The rank
      // window partitions by (keys, ts) — per-instant groups, never a
      // global collapse, keyless included.
      val w = Window
        .partitionBy(keys.map(col) :+ col(rightTsUs): _*)
        .orderBy((if (rightTieBreak.isEmpty) Seq(col(rightTsUs))
          else rightTieBreak.map(col)): _*)
      val r2 = right
        .withColumn("_jrank", row_number().over(w).cast(LongType))
        .filter(col("_jrank") <= jlimit)
      return asofJoin(left, r2, keys, leftTsUs, rightTsUs, "=",
        rightCols :+ "_jrank", rightTieBreak)
        .withColumnRenamed("r__jrank", "jrank")
    }
    val backward = op == ">=" || op == ">"
    val keyCols = keys.map(col)
    val ord = col("_t") +: rightTieBreak.map(col)
    val tagged = right.withColumn("_t", col(rightTsUs).cast(LongType))
    val r2 =
      if (keys.isEmpty) globalRowNumber(tagged, ord, "_rn")
      else tagged.withColumn("_rn", row_number()
        .over(Window.partitionBy(keyCols: _*).orderBy(ord: _*))
        .cast(LongType))
    // backward scans take the LAST carried index at equal ts (newest),
    // forward scans the FIRST (earliest) — both are tie-broken by _rn
    val withL = asofJoin(left,
      r2.select(keyCols :+ col(rightTsUs) :+ col("_rn"): _*),
      keys, leftTsUs, rightTsUs, op, Seq("_rn"),
      rightTieBreak = Seq("_rn"))
    val expanded =
      if (backward) withL
        .withColumn("_rn", explode_outer(when(col("r__rn").isNotNull,
          sequence(greatest(col("r__rn") - (jlimit - 1), lit(1L)),
            col("r__rn")))))
        .withColumn("jrank", col("r__rn") - col("_rn") + 1)
      else {
        // forward: expand upward, clamped to the per-key right count
        // (one tiny row per key — Catalyst broadcasts it on its own)
        val counts =
          if (keys.isEmpty) withL.crossJoin(
            broadcast(r2.agg(max(col("_rn")).as("_rnmax"))))
          else withL.join(
            r2.groupBy(keyCols: _*).agg(max(col("_rn")).as("_rnmax")),
            keys, "left")
        counts
          .withColumn("_rn", explode_outer(when(col("r__rn").isNotNull,
            sequence(col("r__rn"),
              least(col("r__rn") + (jlimit - 1), col("_rnmax"))))))
          .withColumn("jrank", col("_rn") - col("r__rn") + 1)
          .drop("_rnmax")
      }
    val rPay = r2.select(keyCols ++ Seq(col("_rn")) ++
      rightCols.map(c => col(c).as(s"r_$c")): _*)
    expanded.drop("r__rn")
      .join(rPay, keys :+ "_rn", "left").drop("_rn", "_t")
  }

  /** Global 1-based row numbering without a single-partition window —
    * see [[GlobalScan.rowNumber]]. */
  private def globalRowNumber(df: DataFrame, ord: Seq[Column],
      outCol: String): DataFrame =
    GlobalScan.rowNumber(df, ord, outCol)

  /** WINDOW join (sql.y:2775): for each left row, all right rows with
    * `right.ts` in `[left.ts + loUs, left.ts + hiUs]` (plus key equality).
    * Returns the exploded pairs; aggregate per left row for the
    * per-window stats form.
    *
    * With keys the range is a post-join filter on an equi sort-merge
    * join. WITHOUT keys a bare range predicate would plan as a
    * broadcast-nested-loop/cartesian join — quadratic, the classic
    * 100 TB killer — so the keyless path manufactures an equi key: time
    * buckets of span >= the window width. A left row lives in exactly
    * one bucket; a right row can only match left timestamps in
    * `[rts-hiUs, rts-loUs]`, which spans at most 2 consecutive buckets,
    * so the right side explodes to <= 2 rows and the join is a plain
    * shuffled equi-join on the bucket id. */
  def windowJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTsUs: String, rightTsUs: String, loUs: Long, hiUs: Long,
      rightCols: Seq[String]): DataFrame = {
    val r = right.select(
      keys.map(c => col(c).as(s"_rk_$c")) ++
        Seq(col(rightTsUs).cast(LongType).as("_rts")) ++
        rightCols.map(c => col(c).as(s"r_$c")): _*)
    val range = (rr: DataFrame, l: DataFrame) =>
      rr("_rts") >= l(leftTsUs) + lit(loUs) &&
        rr("_rts") <= l(leftTsUs) + lit(hiUs)
    if (keys.nonEmpty) {
      val cond = keys.map(k => left(k) === r(s"_rk_$k")).reduce(_ && _) &&
        range(r, left)
      left.join(r, cond, "left").drop(keys.map(k => s"_rk_$k"): _*)
    } else {
      val span = math.max(hiUs - loUs, 1L)
      // floor-division via pmod keeps bucket ids exact in long arithmetic
      // (plain `x DIV span` truncates toward zero, wrong for negative ts)
      def bucket(x: Column): Column =
        ((x - pmod(x, lit(span))) / lit(span)).cast(LongType)
      val lb = left.withColumn("_lb",
        bucket(col(leftTsUs).cast(LongType)))
      val rb = r.withColumn("_rb", explode(sequence(
        bucket(col("_rts") - lit(hiUs)), bucket(col("_rts") - lit(loUs)))))
      lb.join(rb, lb("_lb") === rb("_rb") && range(rb, lb), "left")
        .drop("_lb", "_rb")
    }
  }

  /** WINDOW join with JLIMIT n: keeps the first n right rows per left
    * row, ordered by (right ts, tie-break columns). `leftRowKey` must
    * uniquely identify a left row. Unmatched left rows survive with a
    * null `jrank`. */
  def windowJoinLimited(left: DataFrame, right: DataFrame,
      keys: Seq[String], leftTsUs: String, rightTsUs: String,
      loUs: Long, hiUs: Long, rightCols: Seq[String], jlimit: Int,
      leftRowKey: Seq[String], rightTieBreak: Seq[String] = Nil): DataFrame = {
    val joined = windowJoin(left, right, keys, leftTsUs, rightTsUs,
      loUs, hiUs, rightCols)
    val w = Window.partitionBy(leftRowKey.map(col): _*)
      .orderBy(col("_rts") +: rightTieBreak.map(c => col(s"r_$c")): _*)
    joined
      .withColumn("jrank",
        when(col("_rts").isNotNull, row_number().over(w).cast(LongType)))
      .filter(col("jrank") <= jlimit || col("_rts").isNull)
  }
}
