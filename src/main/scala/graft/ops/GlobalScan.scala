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
  * could shift boundaries between passes).
  */
object GlobalScan {

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
      outSchema: StructType): DataFrame = {
    val spark = df.sparkSession
    val n = math.max(1, math.min(df.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt,
      spark.sparkContext.defaultParallelism))
    val sorted = df
      .repartitionByRange(n, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val rdd = sorted.rdd
    // pass 1: one tiny effect record per partition
    val effects = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, summary(it))))
      .collect().sortBy(_._1).map(_._2)
    // prefix-compose: incoming effect for partition i = zero ∘ e0 ∘ … ∘ e(i-1)
    val prefixes = effects.scanLeft(zero)(combine)
    val bc = spark.sparkContext.broadcast(prefixes)
    // pass 2: replay with the true incoming state, all partitions parallel
    val out = rdd.mapPartitionsWithIndex((pid, it) =>
      emit(bc.value(pid), it))
    val res = spark.createDataFrame(out, outSchema)
    // the persist backs `res` lazily; it is evicted with the session (or
    // by the caller materializing and unpersisting). Size = one sorted
    // copy of the input partition set, spill-safe.
    res
  }

  // ------------------------------------------------------------------
  // Carry effects (reusable shapes)
  // ------------------------------------------------------------------

  /** "Last seen non-null value" effect: compose = later wins. */
  def lastSeen[A](a: Option[A], b: Option[A]): Option[A] = b.orElse(a)

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
}
