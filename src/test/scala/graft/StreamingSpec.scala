package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{LatestRows, Schemaless, Streams}

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("interval trigger emits only watermark-closed windows, append mode") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val src = mem.toDF().toDF("ts", "user_id", "value")
    val out = Streams.intervalTrigger(src, "ts", "10 seconds", "10 seconds",
      "5 seconds", Seq("user_id"))
    val q = out.writeStream.format("memory").queryName("iv")
      .outputMode("append").start()
    def t(s: Long) = new java.sql.Timestamp(s * 1000)
    mem.addData((t(1), 1L, 1.0), (t(5), 1L, 2.0), (t(12), 1L, 3.0))
    q.processAllAvailable()
    // watermark = 12-5 = 7s: window [0,10) not yet closed
    assert(spark.sql("select * from iv").count() == 0)
    mem.addData((t(30), 1L, 9.0)) // watermark 25s closes [0,10) and [10,20)
    q.processAllAvailable()
    val rows = spark.sql("select * from iv order by _twstart").collect()
    q.stop()
    assert(rows.length == 2)
    assert(rows(0).getAs[Long]("n") == 2) // ts 1,5
    assert(rows(0).getAs[Double]("sum_value") == 3.0)
    assert(rows(1).getAs[Long]("n") == 1) // ts 12
  }

  test("count window trigger fires exactly every n rows with O(1) state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val out = Streams.countWindowTrigger(mem.toDS(), n = 3)
    val q = out.writeStream.format("memory").queryName("cw")
      .outputMode("append").start()
    mem.addData((1L, 100L, 1.0), (1L, 200L, 2.0))
    q.processAllAvailable()
    assert(spark.sql("select * from cw").count() == 0) // only 2 buffered
    mem.addData((1L, 300L, 3.0), (1L, 400L, 4.0), (2L, 10L, 5.0))
    q.processAllAvailable()
    val fired = spark.sql("select * from cw").collect()
    q.stop()
    assert(fired.length == 1)
    assert(fired(0).getAs[Long]("key") == 1L)
    assert(fired(0).getAs[Double]("sum") == 6.0)
    assert(fired(0).getAs[Long]("startUs") == 100L)
    assert(fired(0).getAs[Long]("endUs") == 300L)
  }

  test("state window trigger fires on state change") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    val out = Streams.stateWindowTrigger(mem.toDS())
    val q = out.writeStream.format("memory").queryName("sw")
      .outputMode("append").start()
    mem.addData((1L, 1L, "on"), (1L, 2L, "on"), (1L, 3L, "off"),
      (1L, 4L, "off"), (1L, 5L, "on"))
    q.processAllAvailable()
    val fired = spark.sql("select * from sw order by startUs").collect()
    q.stop()
    assert(fired.length == 2)
    assert(fired(0).getAs[String]("state") == "on" &&
      fired(0).getAs[Long]("n") == 2)
    assert(fired(1).getAs[String]("state") == "off" &&
      fired(1).getAs[Long]("endUs") == 4L)
  }

  test("event window trigger opens/closes across batches, drops " +
      "unclosed tail") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Double)]
    val out = Streams.eventWindowTrigger(mem.toDS(),
      startCond = _ > 90d, endCond = _ < 10d)
    val q = out.writeStream.format("memory").queryName("ew")
      .outputMode("append").start()
    // batch 1: window opens at ts=2 (95) and stays open
    mem.addData((1L, 1L, 50.0), (1L, 2L, 95.0), (1L, 3L, 50.0))
    q.processAllAvailable()
    assert(spark.sql("select * from ew").count() == 0)
    // batch 2: ts=4 (5) closes it; ts=5 (99) reopens a window that
    // never closes; key 2 opens and closes a 2-row window
    mem.addData((1L, 4L, 5.0), (1L, 5L, 99.0), (2L, 1L, 95.0),
      (2L, 2L, 3.0))
    q.processAllAvailable()
    val fired = spark.sql("select * from ew order by key").collect()
    q.stop()
    assert(fired.length == 2)
    assert(fired(0).getAs[Long]("key") == 1L &&
      fired(0).getAs[Long]("startUs") == 2L &&
      fired(0).getAs[Long]("endUs") == 4L &&
      fired(0).getAs[Long]("n") == 3L && // rows ts=2,3,4
      fired(0).getAs[Double]("sum") == 150.0)
    // key 1's reopened window at ts=5 never closes -> not fired
    assert(fired(1).getAs[Long]("key") == 2L &&
      fired(1).getAs[Long]("n") == 2L)
  }

  test("trigger-side TRUE_FOR drops short fired windows") {
    import spark.implicits._
    import graft.ops.TimeOps.TrueForLimit
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String)]
    // windows: on x2 (rows 1-2), off x1 (row 3), on x3 (rows 4-6);
    // COUNT 2 must drop the 1-row off window at emission
    val out = Streams.stateWindowTrigger(mem.toDS(),
      trueFor = Some(TrueForLimit(0, 2, "cnt")))
    val q = out.writeStream.format("memory").queryName("swtf")
      .outputMode("append").start()
    mem.addData((1L, 1L, "on"), (1L, 2L, "on"), (1L, 3L, "off"),
      (1L, 4L, "on"), (1L, 5L, "on"), (1L, 6L, "on"), (1L, 7L, "off"))
    q.processAllAvailable()
    val fired = spark.sql("select * from swtf order by startUs").collect()
    q.stop()
    assert(fired.map(r => (r.getAs[String]("state"),
      r.getAs[Long]("n"))).toSeq == Seq(("on", 2L), ("on", 3L)))

    val mem2 = MemoryStream[(Long, Long, Double)]
    // event windows: [95@2 .. 5@4] span 2 fires; [99@5 .. 5@6] span 1
    // is dropped by the duration limit
    val out2 = Streams.eventWindowTrigger(mem2.toDS(),
      startCond = _ > 90d, endCond = _ < 10d,
      trueFor = Some(TrueForLimit(2L, 0, "dur")))
    val q2 = out2.writeStream.format("memory").queryName("ewtf")
      .outputMode("append").start()
    mem2.addData((1L, 1L, 50.0), (1L, 2L, 95.0), (1L, 3L, 50.0),
      (1L, 4L, 5.0), (1L, 5L, 99.0), (1L, 6L, 5.0))
    q2.processAllAvailable()
    val fired2 = spark.sql("select * from ewtf order by startUs").collect()
    q2.stop()
    assert(fired2.map(r => (r.getAs[Long]("startUs"),
      r.getAs[Long]("endUs"))).toSeq == Seq((2L, 4L)))
  }

  test("calc binding: per-window calc query over another table") {
    val fired = Seq(Streams.WindowBounds(1704067200000000L,
      1704070800000000L, 0L))
    val events = Tables(spark, sf, "events")
    val out = Streams.bindCalc(fired, wb =>
      events.filter(col("ts") >= wb.startUs && col("ts") < wb.endUs)
        .agg(count(lit(1)).as("n"))
        .withColumn("_twstart", lit(wb.startUs))).get
    val expect = events.filter(col("ts") >= fired.head.startUs &&
      col("ts") < fired.head.endUs).count()
    assert(out.head.getAs[Long]("n") == expect)
  }

  test("latest-rows cache: newest row per key survives merges") {
    import spark.implicits._
    val c0 = Seq((1L, 10L, 1.0), (2L, 20L, 2.0)).toDF("k", "ts", "v")
    val b1 = Seq((1L, 15L, 9.0), (3L, 5L, 3.0)).toDF("k", "ts", "v")
    val merged = LatestRows.merge(c0, b1, Seq("k"), "ts")
      .orderBy("k").collect()
    assert(merged.length == 3)
    assert(merged(0).getAs[Double]("v") == 9.0) // k=1 updated
    assert(merged(1).getAs[Double]("v") == 2.0) // k=2 untouched
    assert(merged(2).getAs[Double]("v") == 3.0) // k=3 inserted
  }

  test("schemaless: influx line, telnet, tsdb-json parse to typed rows") {
    import spark.implicits._
    val line = Seq(
      "meters,location=SF,groupid=2 current=10.3,voltage=219i 1626006833639000000")
      .toDF("value")
    val p = Schemaless.parseLineProtocol(line).head
    assert(p.getAs[String]("measurement") == "meters")
    assert(p.getAs[Map[String, String]]("tags")("location") == "SF")
    assert(p.getAs[Map[String, Double]]("fields")("voltage") == 219.0)
    assert(p.getAs[Long]("ts_us") == 1626006833639000L)

    val tel = Seq("put sys.cpu 1626006833 42.5 host=web01 dc=lga")
      .toDF("value")
    val t = Schemaless.parseTelnet(tel).head
    assert(t.getAs[String]("metric") == "sys.cpu")
    assert(t.getAs[Double]("value") == 42.5)
    assert(t.getAs[Map[String, String]]("tags")("host") == "web01")
    assert(t.getAs[Long]("ts_us") == 1626006833000000L)

    val js = Seq(
      """{"metric":"m1","timestamp":1626006833,"value":7.5,"tags":{"h":"a"}}""")
      .toDF("value")
    val j = Schemaless.parseTsdbJson(js).head
    assert(j.getAs[String]("metric") == "m1")
    assert(j.getAs[Double]("value") == 7.5)
    assert(j.getAs[Long]("ts_us") == 1626006833000000L)
  }

  test("schemaless ingest evolves the table schema across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sml")
      .toFile.getAbsolutePath + "/meters"
    // batch 1: current only; batch 2 adds a voltage field (the
    // schemaless auto-add-column path -> mergeSchema on read)
    Seq((1626006833639000L, "SF", 10.3))
      .toDF("ts_us", "location", "current")
      .write.mode("append").parquet(dir)
    Seq((1626006834639000L, "LA", 11.8, 221.0))
      .toDF("ts_us", "location", "current", "voltage")
      .write.mode("append").parquet(dir)
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("ts_us", "location", "current", "voltage"))
    assert(merged.count() == 2)
    // the old row surfaces the new column as null
    assert(merged.filter(col("location") === "SF")
      .head.getAs[Any]("voltage") == null)
  }

  test("fill_history backfills and returns the stream start offset") {
    import spark.implicits._
    val src = Seq((10L, 1.0), (20L, 2.0), (35L, 3.0)).toDF("ts", "value")
    var sunk: Long = -1
    val offset = Streams.fillHistory(src, col("ts"),
      df => df.groupBy((col("ts") / 10).cast("long").as("b"))
        .agg(count(lit(1)).as("n")),
      out => sunk = out.count())
    assert(offset.contains(35L)) // live stream resumes after the max ts
    assert(sunk == 3)            // three buckets backfilled
    assert(Streams.fillHistory(src.limit(0), col("ts"), identity,
      _ => fail("sink must not run on empty history")).isEmpty)
  }

  test("recalc swaps only the affected output range") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_recalc")
      .toFile.getAbsolutePath + "/out"
    // initial output: one row per ws 0,10,20,30 with v=1
    Seq(0L, 10L, 20L, 30L).map((_, 1L)).toDF("ws", "v")
      .write.mode("overwrite").parquet(dir)
    // recalc [10, 30): those windows become v=9
    Streams.recalcRange(spark, dir, "ws", 10L, 30L,
      (t0, t1) => Seq(t0, 20L).map((_, 9L)).toDF("ws", "v"))
    val out = spark.read.parquet(dir).orderBy("ws").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(0L -> 1L, 10L -> 9L, 20L -> 9L, 30L -> 1L))
  }
}
