package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Streams

/** STREAM_OPTIONS surface (sql.y:1715-1740) and the TMQ consumer
  * contract (clientTmq.c:989 consumer groups, 1770 offset commit):
  * checkpointed resume == committed offsets; distinct checkpoints ==
  * distinct consumer groups. */
class StreamOptionsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("PRE_FILTER drops rows before the trigger sees them") {
    import spark.implicits._
    val src = Seq((1L, 10L, 1.0), (1L, 20L, -5.0), (1L, 30L, 2.0))
      .toDF("k", "ts", "v")
    val opts = Streams.StreamOptions(preFilter = Some(col("v") > 0))
    assert(Streams.applyPreFilter(src, opts).count() == 2)
  }

  test("EXPIRED_TIME batch filter drops rows too far behind the newest") {
    import spark.implicits._
    val src = Seq((1L, 1000L), (1L, 5000L), (1L, 9000L)).toDF("k", "ts")
    val out = Streams.expiredFilter(src, col("ts"), 5000L)
    assert(out.collect().map(_.getLong(1)).sorted.toSeq == Seq(5000L, 9000L))
    // empty frame passes through
    assert(Streams.expiredFilter(src.filter(col("ts") < 0), col("ts"),
      10L).count() == 0)
  }

  test("FORCE_OUTPUT emits a null row for empty-calc windows") {
    import spark.implicits._
    val fired = Seq((1704067200000000L, 1704070800000000L))
      .toDF("_twstart", "_twend")
    val events = Tables(spark, sf, "events")
    var got: Array[org.apache.spark.sql.Row] = Array.empty
    val hook = Streams.calcPerWindowOpts(fired,
      wb => events.filter(col("ts") >= wb.startUs &&
          col("ts") < wb.endUs && col("value") > 1e18) // never true
        .groupBy(col("user_id"))
        .agg(sum("value").as("s"))
        .withColumn("_twstart", lit(wb.startUs)),
      df => got = df.collect(),
      Streams.StreamOptions(forceOutput = true))
    hook(fired, 0L)
    assert(got.length == 1)
    val r = got(0)
    assert(r.isNullAt(r.fieldIndex("user_id")) &&
      r.isNullAt(r.fieldIndex("s")))
    assert(r.getLong(r.fieldIndex("_twstart")) == 1704067200000000L)
  }

  test("IGNORE_NODATA_TRIGGER skips n=0 fired windows") {
    import spark.implicits._
    val fired = Seq((100L, 200L, 5L), (200L, 300L, 0L))
      .toDF("_twstart", "_twend", "n")
    var seen = Seq.empty[Long]
    val hook = Streams.calcPerWindowOpts(fired,
      wb => { seen = seen :+ wb.startUs
        spark.range(1).select(lit(wb.startUs).as("w")) },
      _ => (), Streams.StreamOptions(ignoreNoDataTrigger = true))
    hook(fired, 0L)
    assert(seen == Seq(100L))
  }

  test("EVENT_TYPE controls which notification events dispatch") {
    import spark.implicits._
    val fired = Seq((100L, 200L)).toDF("_twstart", "_twend")
    var events = Seq.empty[Streams.NotifyEvent]
    Streams.notifyHookTyped(e => events = events :+ e,
      Streams.StreamOptions(
        eventTypes = Set("WINDOW_OPEN", "WINDOW_CLOSE")))(fired, 0L)
    assert(events.map(_.etype) == Seq("WINDOW_OPEN", "WINDOW_CLOSE"))
    events = Seq.empty
    Streams.notifyHookTyped(e => events = events :+ e,
      Streams.StreamOptions(eventTypes = Set("WINDOW_CLOSE")))(fired, 0L)
    assert(events.map(_.etype) == Seq("WINDOW_CLOSE"))
  }

  test("PERIOD bounds align to the offset grid") {
    // period 1h, no offset: now lands inside [08:00, 09:00) → the
    // most recently closed period is [07:00, 08:00)
    val h = 3600000000L
    val b0 = Streams.periodBounds(nowUs = 8 * h + 123L, periodUs = h)
    assert(b0.startUs == 7 * h && b0.endUs == 8 * h)
    // offset 15m shifts grid points to hh:15; the newest grid point
    // ≤ 08:00:00.000123 is 07:15, closing the period [06:15, 07:15)
    val q = h / 4
    val b1 = Streams.periodBounds(8 * h + 123L, h, offsetUs = q)
    assert(b1.startUs == 6 * h + q && b1.endUs == 7 * h + q)
    assert(b1.endUs - b1.startUs == h)
    // exactly on a grid point: that point closes the period
    val b2 = Streams.periodBounds(8 * h, h)
    assert(b2.startUs == 7 * h && b2.endUs == 8 * h)
  }

  test("PERIOD calc fires once per grid point with bound placeholders") {
    import spark.implicits._
    val h = 3600000000L
    var clock = 8 * h + 1L
    var seen = Seq.empty[(Long, Long)]
    val hook = Streams.periodCalc(periodUs = h, offsetUs = 0L,
      calc = wb => { seen = seen :+ (wb.startUs, wb.endUs)
        spark.range(1).toDF("x") },
      sink = _.count(): Unit,
      clockUs = () => clock)
    val empty = spark.range(0).toDF("x")
    hook(empty, 0L) // wall clock inside [8h, 9h): fires for [7h, 8h)
    clock = 9 * h + 5L
    hook(empty, 1L) // next period
    assert(seen == Seq((7 * h, 8 * h), (8 * h, 9 * h)))
    assert(Streams.periodTrigger(3600000L) ==
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(3600000L))
  }

  test("LOW_LATENCY_CALC / MAX_DELAY resolve the trigger cadence") {
    import org.apache.spark.sql.streaming.Trigger
    assert(Streams.resolveTrigger(Streams.StreamOptions()) ==
      Trigger.AvailableNow())
    assert(Streams.resolveTrigger(Streams.StreamOptions(
      maxDelayMs = Some(5000L))) == Trigger.ProcessingTime(5000L))
    // LOW_LATENCY_CALC is the stricter demand and wins
    assert(Streams.resolveTrigger(Streams.StreamOptions(
      maxDelayMs = Some(5000L), lowLatencyCalc = true)) ==
      Trigger.ProcessingTime(0L))
  }

  test("MAX_DELAY emits intermediate results before the window closes") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = mem.toDF().toDF("ts", "v")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(sum("v").as("s"))
    // Update mode + processing-time cadence = partials emit every
    // micro-batch; in Append mode this window would never emit (no
    // watermark ever closes it in this test)
    val q = Streams.withMaxDelay(
        agg.writeStream.format("memory").queryName("maxdelay_out"),
        delayMs = 50L)
      .start()
    try {
      mem.addData((java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:10:00Z")), 1.5))
      q.processAllAvailable()
      val partial = spark.table("maxdelay_out").collect()
      assert(partial.length == 1 && partial(0).getDouble(1) == 1.5)
      // second batch updates the SAME open window — staleness ≤ delay
      mem.addData((java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:20:00Z")), 2.5))
      q.processAllAvailable()
      val updated = spark.table("maxdelay_out").collect()
      assert(updated.map(_.getDouble(1)).max == 4.0)
    } finally q.stop()
  }

  test("IDLE_TIMEOUT flushes the open window when a key goes idle") {
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val handler = Streams.stateWindowIdleHandler(idleMs = 1000L)
    // live batch: rows arrive, state machine runs, timer armed
    val live = TestGroupState.create[Streams.StateWinState](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 100L,
      eventTimeWatermarkMs = Optional.empty(), hasTimedOut = false)
    val fired = handler(7L,
      Iterator((7L, 10L, "a"), (7L, 20L, "a"), (7L, 30L, "b")), live).toSeq
    assert(fired == Seq(Streams.FiredStateWindow(7L, "a", 10L, 20L, 2)))
    assert(live.get == Streams.StateWinState("b", 30L, 30L, 1))
    // the armed timer surfaces as batch time + idleMs
    assert(live.getTimeoutTimestampMs.isPresent &&
      live.getTimeoutTimestampMs.get == 1100L)
    // idle timeout: the open "b" window force-closes, state clears
    val timedOut = TestGroupState.create[Streams.StateWinState](
      Optional.of(live.get),
      GroupStateTimeout.ProcessingTimeTimeout, 2000L,
      Optional.empty(), hasTimedOut = true)
    val flushed = handler(7L, Iterator.empty, timedOut).toSeq
    assert(flushed == Seq(Streams.FiredStateWindow(7L, "b", 30L, 30L, 1)))
    assert(timedOut.isRemoved)
  }

  test("TMQ: committed offsets resume; a new group replays from start") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("tmq_src").toString
    val ckptA = Files.createTempDirectory("tmq_ga").toString
    val outA = new java.util.concurrent.atomic.AtomicLong(0)
    Seq(1L, 2L, 3L).toDF("v").write.mode("append").parquet(srcDir)

    def consume(ckpt: String, counter: java.util.concurrent.atomic.AtomicLong)
        : Unit = {
      val q = spark.readStream.schema("v LONG").parquet(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: org.apache.spark.sql.DataFrame, _: Long) =>
          counter.addAndGet(b.count()): Unit)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    consume(ckptA, outA)
    assert(outA.get() == 3) // group A read the backlog
    Seq(4L, 5L).toDF("v").write.mode("append").parquet(srcDir)
    consume(ckptA, outA)
    assert(outA.get() == 5) // resume: ONLY the 2 new rows, no replay
    // a different checkpoint = a different consumer group: full replay
    val outB = new java.util.concurrent.atomic.AtomicLong(0)
    consume(Files.createTempDirectory("tmq_gb").toString, outB)
    assert(outB.get() == 5)
  }
}
