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
