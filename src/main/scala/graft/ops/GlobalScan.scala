package graft.ops

import scala.reflect.ClassTag

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.StructType
import org.apache.spark.storage.StorageLevel

/** Distributed globally-ordered sequential scans (two-pass boundary
  * detection) — the scale path for computations that look like "fold
  * left over ALL rows in timestamp order" with no partition key:
  * keyless EVENT_WINDOW, keyless ASOF join, keyless prefix fills.
  *
  * A naive lowering puts everything in one partition
  * (`repartition(1)` or an unpartitioned `Window.orderBy`) — correct,
  * but a single-executor bottleneck at 100 TB. The classic fix:
  *
  *   pass 1: range-partition + sort by the order columns, then reduce
  *           every partition to its *effect* — a tiny summary of how
  *           the partition transforms the scan state (one record per
  *           partition, collected to the driver);
  *   fold:   effects prefix-compose on the driver (N summaries, not N
  *           rows) giving each partition its true incoming state;
  *   pass 2: replay each partition with its incoming state broadcast —
  *           all partitions emit in parallel.
  *
  * The effect must compose associatively (`combine`). For pure carries
  * (last-seen value) the effect IS the carry; for state machines (event
  * windows) the effect is the state-transition summary evaluated for
  * every possible incoming state.
  *
  * The sorted frame is persisted between the passes so both see the
  * SAME range partitioning (range partitioning samples; recomputing
  * could shift boundaries between passes). Every persisted copy is
  * tracked in a registry; long-lived sessions composing many keyless
  * ops call [[release]] after materializing results so sorted copies
  * don't accumulate in the block manager.
  */
object GlobalScan {

  /** Sorted copies persisted by [[twoPass]]/[[twoPassBidir]] since the
    * last [[release]]. One entry per scan; each is one sorted copy of
    * that scan's input (MEMORY_AND_DISK, spill-safe). */
  private val retained =
    new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()

  /** Unpersist every sorted copy retained by scans since the last
    * release. Call AFTER the scan results are fully materialized
    * (collected / written): the results' lineage runs through the
    * persisted sort, and a recompute after release could re-sample
    * range boundaries that no longer match the broadcast effects. */
  def release(): Unit = {
    var d = retained.poll()
    while (d != null) { d.unpersist(blocking = true); d = retained.poll() }
  }

  /** Number of sorted copies currently retained (spec hook). */
  def retainedCount: Int = retained.size()

  /** Two-pass fold over `df` globally sorted by `sortCols`.
    *
    * @param summary   partition rows → effect (runs once per partition)
    * @param combine   associative effect composition (left = earlier)
    * @param zero      effect of the empty prefix
    * @param emit      (prefix effect of all EARLIER partitions, rows) →
    *                  output rows
    */
  def twoPass[S: ClassTag](df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      zero: S, summary: Iterator[Row] => S, combine: (S, S) => S,
      emit: (S, Iterator[Row]) => Iterator[Row],
      outSchema: StructType): DataFrame =
    twoPassBidir[S, Unit](df, sortCols,
      zeroPre = zero, zeroSuf = (),
      summary = it => (summary(it), ()),
      combinePre = combine, combineSuf = (_, _) => (),
      emit = (pre, _, it) => emit(pre, it),
      outSchema)

  /** Bidirectional two-pass fold: ONE range-partition + sort + persist,
    * then `emit` sees both the prefix effect of all EARLIER partitions
    * (type `P`, composed left-to-right) and the suffix effect of all
    * LATER partitions (type `Q`, composed right-to-left) while rows
    * stream in ascending `sortCols` order. This is the scale path for
    * backward-looking carries (next non-null sample, forward asof):
    * the naive lowering re-sorts the whole frame descending — a second
    * full sort-shuffle — where a suffix-composed replay of the SAME
    * sorted partitions needs zero additional exchanges.
    *
    * `summary` reduces a partition to its (prefix, suffix) effect pair
    * in a single scan. `combineSuf` composes left-to-right over later
    * partitions: `combineSuf(eff(i+1), suffixOf(i+2..))`.
    */
  def twoPassBidir[P: ClassTag, Q: ClassTag](df: DataFrame,
      sortCols: Seq[org.apache.spark.sql.Column],
      zeroPre: P, zeroSuf: Q,
      summary: Iterator[Row] => (P, Q),
      combinePre: (P, P) => P, combineSuf: (Q, Q) => Q,
      emit: (P, Q, Iterator[Row]) => Iterator[Row],
      outSchema: StructType): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, math.min(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt,
      spark.sparkContext.defaultParallelism))
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    retained.add(sorted)
    val rdd = sorted.rdd
    // pass 1: one tiny (prefix, suffix) effect record per partition
    val effects = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, summary(it))))
      .collect().sortBy(_._1).map(_._2)
    // prefix effect for partition i = zero ∘ e0 ∘ … ∘ e(i-1);
    // suffix effect for partition i = e(i+1) ∘ … ∘ e(n-1) ∘ zero
    val prefixes = effects.map(_._1).scanLeft(zeroPre)(combinePre)
    val suffixes = effects.map(_._2).scanRight(zeroSuf)(combineSuf)
    val bcP = spark.sparkContext.broadcast(prefixes)
    val bcS = spark.sparkContext.broadcast(suffixes)
    // pass 2: replay with the true incoming states, all partitions parallel
    val out = rdd.mapPartitionsWithIndex((pid, it) =>
      emit(bcP.value(pid), bcS.value(pid + 1), it))
    spark.createDataFrame(out, outSchema)
  }

  // ------------------------------------------------------------------
  // Carry effects (reusable shapes)
  // ------------------------------------------------------------------

  /** "Last seen non-null value" effect: compose = later wins. */
  def lastSeen[A](a: Option[A], b: Option[A]): Option[A] = b.orElse(a)

  /** "First seen non-null value" effect: compose = earlier wins (the
    * suffix-side dual of [[lastSeen]]). */
  def firstSeen[A](a: Option[A], b: Option[A]): Option[A] = a.orElse(b)

  /** Global 1-based row numbering in `ord` order without a
    * single-partition window: the partition effect is just its row
    * count. Shared by keyless ASOF JLIMIT and keyless COUNT_WINDOW. */
  def rowNumber(df: DataFrame, ord: Seq[org.apache.spark.sql.Column],
      outCol: String): DataFrame = {
    var frame = df
    val sortNames = ord.zipWithIndex.map { case (e, i) =>
      frame = frame.withColumn(s"_gs$i", e); s"_gs$i"
    }
    val outSchema = StructType(frame.schema.fields :+
      org.apache.spark.sql.types.StructField(outCol,
        org.apache.spark.sql.types.LongType))
    twoPass[Long](frame, sortNames.map(org.apache.spark.sql.functions.col),
      zero = 0L,
      summary = { it => var n = 0L; it.foreach(_ => n += 1); n },
      combine = _ + _,
      emit = { (before, it) =>
        var n = before
        it.map { r => n += 1; Row.fromSeq(r.toSeq :+ n) }
      },
      outSchema)
      .drop(sortNames: _*)
  }

  /** Global AND flag-conditional row numbering in one sorted pass:
    * `rnCol` numbers every row 1..N in `ord` order, `frnCol` counts
    * rows with `flagCol` = true up to and including the current row
    * (so a flagged row's `frnCol` is its 1-based rank among flagged
    * rows). The composite effect is just (rows, flaggedRows) — the
    * whole computation costs ONE range-repartition + sort where the
    * naive lowering (number all, filter, number again) sorts twice.
    * This is the keyless ANOMALY_WINDOW group-id shape:
    * `_wgrp = rn − frn` is constant across a run of flagged rows. */
  def dualRowNumber(df: DataFrame, ord: Seq[org.apache.spark.sql.Column],
      flagCol: String, rnCol: String, frnCol: String): DataFrame = {
    var frame = df
    val sortNames = ord.zipWithIndex.map { case (e, i) =>
      frame = frame.withColumn(s"_gs$i", e); s"_gs$i"
    }
    val flagIdx = frame.schema.fieldIndex(flagCol)
    def flagged(r: Row): Boolean = !r.isNullAt(flagIdx) && r.getBoolean(flagIdx)
    val outSchema = StructType(frame.schema.fields :+
      org.apache.spark.sql.types.StructField(rnCol,
        org.apache.spark.sql.types.LongType) :+
      org.apache.spark.sql.types.StructField(frnCol,
        org.apache.spark.sql.types.LongType))
    twoPass[(Long, Long)](frame,
      sortNames.map(org.apache.spark.sql.functions.col),
      zero = (0L, 0L),
      summary = { it =>
        var n = 0L; var f = 0L
        it.foreach { r => n += 1; if (flagged(r)) f += 1 }
        (n, f)
      },
      combine = (a, b) => (a._1 + b._1, a._2 + b._2),
      emit = { (before, it) =>
        var n = before._1; var f = before._2
        it.map { r =>
          n += 1; if (flagged(r)) f += 1
          Row.fromSeq(r.toSeq :+ n :+ f)
        }
      },
      outSchema)
      .drop(sortNames: _*)
  }
}
