package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TimeOps
import graft.ops.TimeOps.TrueForLimit

/** The keyless EVENT_WINDOW TRUE_FOR fold must be partition-count
  * invariant: the two-pass effect algebra (head-triple replay + quiet-row
  * canonical states + suffix continuation) has to reproduce the
  * sequential machine bit-for-bit however the range partitioner slices
  * the frame — including boundaries landing mid-streak. A single
  * partition IS the sequential machine, so it is the ground truth.
  */
class EventTrueForKeylessSpec extends AnyFunSuite {
  import SparkTestSession._

  private def windows(df: DataFrame, sl: Option[TrueForLimit],
      el: Option[TrueForLimit], parts: Int): Seq[(Long, Long, Long)] = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
    try {
      TimeOps.eventWindowsLimits(df, col("value") > 70,
          col("value") < 30, col("ts"), Nil, sl, el,
          tie = Seq(col("event_id")))
        .groupBy(col("_wstart"))
        .agg(max(col("ts")).as("_wend"), count(lit(1)).as("n"))
        .orderBy(col("_wstart"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  private lazy val events = Tables(spark, sf, "events")
    .select(col("event_id"), col("ts"), col("value"))

  test("multi-partition fold == sequential machine (count limits)") {
    val sl = Some(TrueForLimit(0, 2, "cnt"))
    val el = Some(TrueForLimit(0, 2, "cnt"))
    val seqRun = windows(events, sl, el, 1)
    assert(seqRun.nonEmpty, "ground truth produced no windows")
    for (p <- Seq(2, 3, 4))
      assert(windows(events, sl, el, p) == seqRun,
        s"partition count $p diverged from the sequential machine")
  }

  test("multi-partition fold == sequential machine (duration + or)") {
    val h = TimeOps.Dur.h
    val sl = Some(TrueForLimit(2 * h, 0, "dur"))
    val el = Some(TrueForLimit(h, 3, "or"))
    val seqRun = windows(events, sl, el, 1)
    for (p <- Seq(2, 4))
      assert(windows(events, sl, el, p) == seqRun,
        s"partition count $p diverged from the sequential machine")
  }

  test("multi-partition fold == sequential machine (and mode, start-only)") {
    val h = TimeOps.Dur.h
    val sl = Some(TrueForLimit(h, 2, "and"))
    val seqRun = windows(events, sl, None, 1)
    for (p <- Seq(3, 4))
      assert(windows(events, sl, None, p) == seqRun,
        s"partition count $p diverged from the sequential machine")
  }

  test("overlap: streak-completing row opens AND closes across a boundary") {
    import spark.implicits._
    // repeated 3-row blocks: quiet(10), start-only(60), start+end(90);
    // start = value > 50, end = value > 80, start limit cnt 2, no end
    // limit (always satisfied) — the 90-row completes the start streak
    // and immediately closes the window in ONE machine step
    // (LimClosedIdle), so a partition boundary landing between the 60-
    // and 90-rows makes edgeResolve replay a step that opens and
    // closes at once; the held 60-row must still emit as the window
    // head, as the sequential machine does
    val rows = (0 until 20).flatMap { b =>
      val base = b * 3L
      Seq((base, 10.0, base), (base + 1, 60.0, base + 1),
        (base + 2, 90.0, base + 2))
    }
    val df = rows.toDF("ts", "value", "event_id")
    val sl = Some(TrueForLimit(0, 2, "cnt"))
    def run(parts: Int): Seq[(Long, Long, Long)] = {
      val before = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      try TimeOps.eventWindowsLimits(df, col("value") > 50,
          col("value") > 80, col("ts"), Nil, sl, None,
          tie = Seq(col("event_id")))
        .groupBy(col("_wstart"))
        .agg(max(col("ts")).as("_wend"), count(lit(1)).as("n"))
        .orderBy(col("_wstart"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      finally spark.conf.set("spark.sql.shuffle.partitions", before)
    }
    val seqRun = run(1)
    assert(seqRun.size == 20 && seqRun.forall(_._3 == 2),
      s"ground truth unexpected: $seqRun")
    for (p <- 2 to 8)
      assert(run(p) == seqRun,
        s"partition count $p diverged from the sequential machine")
  }

  test("keyless matches the keyed machine on a single-key frame") {
    // same rows, one synthetic key: the keyed mapPartitions fold and
    // the keyless GlobalScan fold must agree exactly
    val sl = Some(TrueForLimit(0, 2, "cnt"))
    val el = Some(TrueForLimit(TimeOps.Dur.h, 2, "or"))
    val keyed = TimeOps.eventWindowsLimits(
        events.withColumn("k", lit(1)), col("value") > 70,
        col("value") < 30, col("ts"), Seq("k"), sl, el)
      .groupBy(col("_wstart"))
      .agg(max(col("ts")).as("_wend"), count(lit(1)).as("n"))
      .orderBy(col("_wstart"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(windows(events, sl, el, 4) == keyed)
  }
}
