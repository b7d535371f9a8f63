package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.{GraftCatalog, GraftSql}

/** DDL + INSERT text surface: catalog round-trips, upsert-on-read,
  * precision metadata, and the CREATE STREAM → Structured Streaming
  * trigger wiring. */
class DdlSpec extends AnyFunSuite {
  import SparkTestSession._

  test("create stable / child / insert / select round-trips with tags " +
      "and tbname") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE d1 PRECISION 'us'")
    cat.exec("CREATE STABLE meters (ts TIMESTAMP, current DOUBLE, " +
      "voltage INT) TAGS (location VARCHAR(24), group_id INT)")
    cat.exec("CREATE TABLE d1001 USING meters TAGS ('SF', 2)")
    cat.exec("INSERT INTO d1001 VALUES (1000, 10.5, 219) (2000, 11.0, 220)")
    // named-tag form + auto-create via INSERT
    cat.exec("INSERT INTO d1002 USING meters (group_id) TAGS (3) " +
      "VALUES (1500, 9.9, 218)")
    val rows = cat.table("meters")
      .orderBy("ts").collect()
    assert(rows.length == 3)
    assert(rows.map(_.getAs[String]("tbname")).toSeq ==
      Seq("d1001", "d1002", "d1001"))
    assert(rows(1).getAs[String]("location") == null) // unnamed tag -> null
    assert(rows(1).getAs[Int]("group_id") == 3)
    // dialect SELECT over the stable
    val agg = GraftSql.query(spark, cat.table,
      "SELECT tbname, count(*) AS n FROM meters GROUP BY tbname " +
        "ORDER BY tbname").collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("d1001", 2L), ("d1002", 1L)))
  }

  test("duplicate-ts re-insert resolves last-writer-wins (upsert)") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.exec("INSERT INTO c1 USING st TAGS (1) VALUES (100, 1.0) (200, 2.0)")
    cat.exec("INSERT INTO c1 VALUES (100, 9.0)")
    val got = cat.table("c1").orderBy("ts")
      .select("ts", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq == Seq((100L, 9.0), (200L, 2.0)))
  }

  test("bound columns leave unlisted columns NULL; ms precision " +
      "parses datetime literals to ms ticks") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE msdb PRECISION 'ms'")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, a DOUBLE, b VARCHAR(8)) " +
      "TAGS (t INT)")
    cat.exec("INSERT INTO c USING st TAGS (7) (ts, a) " +
      "VALUES ('2024-01-01 00:00:00', 5.5)")
    val r = cat.table("c").head
    assert(r.getAs[Long]("ts") == 1704067200000L) // ms ticks
    assert(r.getAs[Double]("a") == 5.5)
    assert(r.getAs[String]("b") == null)
  }

  test("drop statements remove catalog objects") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.exec("CREATE TABLE c1 USING st TAGS (1)")
    cat.exec("CREATE STREAM s1 INTO o1 AS SELECT count(*) AS n FROM c1")
    assert(cat.streams.contains("s1"))
    cat.exec("DROP STREAM s1")
    cat.exec("DROP TABLE c1")
    assert(!cat.streams.contains("s1"))
    intercept[IllegalArgumentException](cat.table("c1"))
    cat.exec("DROP STABLE st")
    intercept[IllegalArgumentException](cat.table("st"))
  }

  test("CREATE STREAM wires onto a live MemoryStream interval trigger") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STREAM s2 TRIGGER WINDOW_CLOSE WATERMARK 1m " +
      "INTO out2 AS SELECT _wstart, count(*) AS n, sum(value) AS " +
      "sum_value FROM src PARTITION BY k INTERVAL(1h)")
    val mem = MemoryStream[(java.sql.Timestamp, Long, Double)]
    val src = mem.toDF().toDF("ts", "k", "value")
    val out = cat.streamTrigger("s2", src)
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("ddl_stream_spec")
      .outputMode("append").start()
    try {
      def t(min: Long) = new java.sql.Timestamp(min * 60000L)
      mem.addData((t(0), 1L, 1.0), (t(30), 1L, 2.0), (t(65), 1L, 4.0))
      q.processAllAvailable()
      // push the watermark past hour 0 and hour 1
      mem.addData((t(300), 9L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val fired = spark.table("ddl_stream_spec")
      .filter(col("k") === 1).orderBy("_twstart")
      .select(col("n"), col("sum_value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(fired.toSeq == Seq((2L, 3.0), (1L, 4.0)))
  }

  test("TRIM DATABASE enforces the KEEP horizon") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE shortk PRECISION 'us' KEEP 1")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    // one ancient row (2024) and one within the 1-day horizon
    val recent = System.currentTimeMillis() * 1000L
    cat.exec("INSERT INTO c1 USING st TAGS (1) " +
      s"VALUES (1704067200000000, 1.0) ($recent, 2.0)")
    assert(cat.table("c1").count() == 2)
    cat.exec("TRIM DATABASE shortk")
    val left = cat.table("c1").collect()
    assert(left.length == 1 && left(0).getAs[Double]("v") == 2.0)
    // a db without KEEP trims nothing
    val cat2 = new GraftCatalog(spark)
    cat2.exec("CREATE DATABASE forever PRECISION 'us'")
    cat2.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat2.exec("INSERT INTO c1 USING st TAGS (1) VALUES (1000, 1.0)")
    cat2.exec("TRIM DATABASE forever")
    assert(cat2.table("c1").count() == 1)
  }

  test("ALTER DATABASE KEEP moves the TRIM horizon; dnode/local/" +
      "cluster config text accepted") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE mutk PRECISION 'us'")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    val recent = System.currentTimeMillis() * 1000L
    cat.exec("INSERT INTO c1 USING st TAGS (1) " +
      s"VALUES (1704067200000000, 1.0) ($recent, 2.0)")
    // no KEEP yet: trim is a no-op
    cat.exec("TRIM DATABASE mutk")
    assert(cat.table("c1").count() == 2)
    // ALTER in a 1-day horizon: the 2024 row now falls outside it
    cat.exec("ALTER DATABASE mutk KEEP 1")
    cat.exec("TRIM DATABASE mutk")
    val left = cat.table("c1").collect()
    assert(left.length == 1 && left(0).getAs[Double]("v") == 2.0)
    // config spellings (sql.y:845-861) are validated + accepted
    cat.exec("ALTER DNODE 1 'debugFlag' '135'")
    cat.exec("ALTER ALL DNODES 'resetlog'")
    cat.exec("ALTER LOCAL 'timezone' 'UTC'")
    cat.exec("ALTER CLUSTER 'encrypt_algorithm' 'sm4'")
    intercept[Exception] { cat.exec("ALTER DNODE x 'k'") }
  }

  test("STOP/START STREAM lifecycle; SHOW VARIABLES/QUERIES") {
    val cat = new GraftCatalog(spark)
    cat.register("events", Tables(spark, sf, "events"))
    cat.exec("CREATE STREAM s1 TRIGGER WINDOW_CLOSE INTO s1_out AS " +
      "SELECT _wstart, count(*) AS n FROM events INTERVAL(1h)")
    assert(cat.sql("SHOW STREAMS").collect()(0)
      .getAs[String]("status") == "running")
    cat.exec("STOP STREAM s1")
    assert(cat.sql("SHOW STREAMS").collect()(0)
      .getAs[String]("status") == "stopped")
    intercept[IllegalArgumentException] {
      cat.streamTrigger("s1", Tables(spark, sf, "events"))
    }
    cat.exec("START STREAM s1")
    assert(cat.sql("SHOW STREAMS").collect()(0)
      .getAs[String]("status") == "running")
    val vars = cat.sql("SHOW VARIABLES").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(vars("timezone") == "UTC")
    assert(vars("precision_ticks_per_second") == "1000000")
    // no active jobs while idle — the listing itself must not throw
    assert(cat.sql("SHOW QUERIES").columns.toSeq ==
      Seq("job_id", "status"))
  }

  test("SMA/normal indexes, SHOW TAGS/TABLE TAGS/TABLE DISTRIBUTED") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) " +
      "TAGS (loc VARCHAR(8), g INT)")
    cat.exec("INSERT INTO c1 USING st TAGS ('SF', 1) " +
      "VALUES (100, 1.0) (200, 2.0) (100, 9.0)")
    cat.exec("INSERT INTO c2 USING st TAGS ('LA', 2) VALUES (150, 3.0)")
    // SMA index = the legacy TSMA spelling; one router serves both
    cat.exec("CREATE SMA INDEX sidx ON st " +
      "FUNCTION(count(v), sum(v)) INTERVAL(1h)")
    assert(cat.servingGrain("st", 3600000000L * 24,
      Seq(("sum", "v"))) == Some(3600000000L))
    cat.exec("CREATE INDEX tidx ON st (g)")
    assert(cat.sql("SHOW INDEXES FROM st").collect()
      .map(_.getString(0)).sorted.toSeq == Seq("sidx", "tidx"))
    cat.exec("DROP INDEX sidx")
    assert(cat.servingGrain("st", 3600000000L * 24,
      Seq(("sum", "v"))).isEmpty)
    // SHOW TAGS FROM child lists its bindings
    val tags = cat.sql("SHOW TAGS FROM c1").collect()
    assert(tags.length == 2)
    // SHOW TABLE TAGS: one row per child with tag value columns
    val tt = cat.sql("SHOW TABLE TAGS FROM st")
      .orderBy("tbname").collect()
    assert(tt.map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toSeq == Seq(("c1", "SF", 1), ("c2", "LA", 2)))
    // SHOW TABLE DISTRIBUTED: total vs upsert-visible rows
    val dist = cat.sql("SHOW TABLE DISTRIBUTED st")
      .orderBy("table_name").collect()
    assert(dist.map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq(("c1", 3L, 2L), ("c2", 1L, 1L)))
  }

  test("COMPACT DATABASE applies upsert resolution physically") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.exec("INSERT INTO c1 USING st TAGS (1) " +
      "VALUES (100, 1.0) (200, 2.0) (100, 9.0) (200, 8.0) (100, 7.0)")
    val before = cat.table("c1").orderBy("ts")
      .select("ts", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(before.toSeq == Seq((100L, 7.0), (200L, 8.0)))
    cat.exec("COMPACT DATABASE default")
    cat.exec("FLUSH DATABASE default") // accepted no-op
    // read results unchanged; superseded versions physically gone
    val after = cat.table("c1").orderBy("ts")
      .select("ts", "v").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(after.toSeq == before.toSeq)
    assert(cat.sql("SHOW TABLES").filter(col("table_name") === "c1")
      .collect()(0).getAs[Long]("n_rows") == 2L)
    // a post-compaction re-insert still wins over the compacted row
    cat.exec("INSERT INTO c1 VALUES (100, 5.5)")
    assert(cat.table("c1").filter(col("ts") === 100)
      .collect()(0).getAs[Double]("v") == 5.5)
  }

  test("CREATE STABLE BASE ON inherits parent columns and tags") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE p_device (ts TIMESTAMP, status INT) " +
      "TAGS (region INT) VIRTUAL 1")
    cat.exec("CREATE STABLE p_temp (ts TIMESTAMP, temp DOUBLE) " +
      "TAGS (sensor_id INT) BASE ON p_device VIRTUAL 1")
    // inherited first, own appended, ts dedup'd (05-virtualtable.md)
    cat.exec("INSERT INTO t1 USING p_temp TAGS (7, 100) " +
      "VALUES (1000, 1, 21.5)")
    val r = cat.table("p_temp").collect()(0)
    assert(r.getAs[Long]("ts") == 1000L)
    assert(r.getAs[Int]("status") == 1)
    assert(r.getAs[Double]("temp") == 21.5)
    assert(r.getAs[Int]("region") == 7)
    assert(r.getAs[Int]("sensor_id") == 100)
  }

  test("FILE load: quoted commas and datetime cells survive the CSV") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE ft (ts TIMESTAMP, v DOUBLE, " +
      "txt VARCHAR(32)) TAGS (city VARCHAR(32))")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    def put(n: String, s: String) = {
      val p = dir.resolve(n)
      java.nio.file.Files.write(p, s.getBytes("UTF-8")); p.toString
    }
    val subs = put("subs.csv", "'c1','San Jose, CA'\n")
    val rows = put("c1.csv",
      "'2024-01-01 00:00:00',1.5,'a, b'\n1704070800000000,2.5,'x'\n")
    cat.exec(s"CREATE TABLE USING ft (tbname, city) FILE '$subs'")
    cat.exec(s"INSERT INTO c1 FILE '$rows'")
    val got = cat.table("ft").orderBy("ts")
      .select("ts", "v", "txt", "city").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2),
        r.getString(3)))
    assert(got.toSeq == Seq(
      (1704067200000000L, 1.5, "a, b", "San Jose, CA"),
      (1704070800000000L, 2.5, "x", "San Jose, CA")))
  }

  test("RECALCULATE bounds only the stream source, not joined tables") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE src (ts TIMESTAMP, v DOUBLE) TAGS (g INT)")
    cat.exec("INSERT INTO s1 USING src TAGS (1) " +
      "VALUES (0, 1.0) (3600000000, 2.0) (7200000000, 3.0)")
    // the joined dimension carries its OWN ts column, far outside any
    // recalc range — the range bound must never apply to it
    cat.exec("CREATE STABLE dim (ts TIMESTAMP, g INT, factor DOUBLE) " +
      "TAGS (z INT)")
    cat.exec("INSERT INTO d1 USING dim TAGS (0) " +
      "VALUES (999999000000000, 1, 10.0)")
    cat.exec("CREATE STREAM sj TRIGGER WINDOW_CLOSE INTO sj_out AS " +
      "SELECT _wstart, count(*) AS n, max(r_factor) AS f " +
      "FROM src JOIN dim ON src.g = dim.g INTERVAL(1h)")
    cat.fillHistory("sj")
    val before = cat.table("sj_out").orderBy("_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(before == Seq((0L, 1L, 10.0), (3600000000L, 1L, 10.0),
      (7200000000L, 1L, 10.0)))
    // recalc just the middle window: if the resolver bounded `dim` too
    // (its ts sits outside the range), the join would go empty and the
    // recomputed window would vanish from the output
    cat.exec("RECALCULATE STREAM sj FROM 3600000000 TO 7200000000")
    val after = cat.table("sj_out").orderBy("_wstart").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(after == before,
      "recalc with an unchanged-in-range join must reproduce the output")
  }

  test("ALTER drop/modify/rename reshape columns and tags in place") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, a DOUBLE, b VARCHAR(8)) " +
      "TAGS (t1 INT, t2 VARCHAR(4))")
    cat.exec("INSERT INTO c USING st TAGS (1, 'x') VALUES (100, 1.5, 'hi')")
    cat.exec("ALTER STABLE st DROP COLUMN b")
    assert(cat.table("c").columns.toSeq ==
      Seq("ts", "a", "t1", "t2", "tbname"))
    assert(cat.table("c").head.getAs[Double]("a") == 1.5)
    cat.exec("ALTER STABLE st MODIFY COLUMN a DOUBLE")
    cat.exec("ALTER STABLE st RENAME TAG t2 t2r")
    assert(cat.table("c").head.getAs[String]("t2r") == "x")
    cat.exec("ALTER STABLE st DROP TAG t1")
    assert(!cat.table("c").columns.contains("t1"))
    cat.exec("ALTER STABLE st MODIFY TAG t2r VARCHAR(16)")
    assert(cat.describe("st").collect()
      .find(_.getString(0) == "t2r").get.getInt(2) == 16)
    intercept[IllegalArgumentException](
      cat.exec("ALTER STABLE st DROP COLUMN ts"))
  }

  test("DELETE parses datetime literals and deletes all rows without " +
      "WHERE") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE deldb PRECISION 'ms'")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.exec("INSERT INTO c USING st TAGS (1) " +
      "VALUES ('2024-01-01 00:00:00', 1.0) ('2024-01-02 00:00:00', 2.0)")
    cat.exec("DELETE FROM st WHERE ts >= '2024-01-02 00:00:00'")
    assert(cat.table("c").count() == 1)
    cat.exec("DELETE FROM c")
    assert(cat.table("c").count() == 0)
    intercept[IllegalArgumentException](
      cat.exec("DELETE FROM c WHERE v > 1")) // non-ts predicate refused
  }

  test("sql() dispatches SHOW/DESCRIBE/SELECT/DDL from one entry point") {
    val cat = new GraftCatalog(spark)
    cat.sql("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.sql("INSERT INTO c USING st TAGS (1) VALUES (100, 1.0)")
    assert(cat.sql("SHOW DATABASES").columns.contains("db_name"))
    assert(cat.sql("SHOW STABLES").count() == 1)
    assert(cat.sql("SHOW TABLES").count() == 1)
    assert(cat.sql("SHOW STREAMS").count() == 0)
    cat.sql("CREATE TOPIC tp AS SELECT * FROM st")
    assert(cat.sql("SHOW TOPICS").count() == 1)
    cat.sql("DROP TOPIC tp")
    assert(cat.sql("SHOW TOPICS").count() == 0)
    // DESCRIBE on a child resolves through its stable
    assert(cat.sql("DESC c").collect().map(_.getString(0)).toSeq ==
      Seq("ts", "v", "t"))
    // views resolve through the dialect and track later inserts
    cat.sql("CREATE VIEW vw AS SELECT ts, v FROM st WHERE v > 0")
    assert(cat.sql("SELECT count(*) AS n FROM vw").head.getLong(0) == 1L)
    cat.sql("INSERT INTO c VALUES (200, 2.0)")
    assert(cat.sql("SELECT count(*) AS n FROM vw").head.getLong(0) == 2L)
    cat.sql("DROP VIEW vw")
    intercept[IllegalArgumentException](cat.table("vw"))
    // SHOW CREATE renders runnable DDL; EXPLAIN returns the plan
    val stDdl = cat.sql("SHOW CREATE STABLE st").head.getString(1)
    assert(stDdl.contains("CREATE STABLE") && stDdl.contains("TAGS"))
    val cDdl = cat.sql("SHOW CREATE TABLE c").head.getString(1)
    assert(cDdl.contains("USING `st` TAGS (1)"), cDdl)
    assert(cat.sql("EXPLAIN SELECT count(*) AS n FROM st")
      .collect().map(_.getString(0)).mkString("\n")
      .contains("HashAggregate"))
    // information_schema is queryable through the dialect
    assert(cat.sql("SELECT count(*) AS n FROM information_schema.ins_columns " +
      "WHERE col_kind = 'tag'").head.getLong(0) == 1L)
    assert(cat.sql("SELECT stable_name FROM information_schema.ins_stables")
      .head.getString(0) == "st")
    assert(cat.sql("SELECT sum(v) AS s FROM st")
      .head.get(0).toString.toDouble == 3.0) // 1.0 + the 2.0 row above
  }

  test("CREATE TSMA routes an eligible interval through the rollup " +
      "and falls back to base otherwise") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE m (ts TIMESTAMP, v DOUBLE) TAGS (g INT)")
    cat.exec("INSERT INTO m1 USING m TAGS (1) VALUES " +
      (0 until 50).map(i => s"(${i.toLong * 600000000L}, ${i * 1.5})")
        .mkString(" "))
    cat.exec("CREATE TSMA m_tsma ON m FUNCTION(count(v), sum(v), " +
      "min(v), max(v)) INTERVAL(1h)")
    assert(cat.sql("SHOW TSMAS").count() == 1)
    val ddl = cat.sql("SHOW CREATE TSMA m_tsma").head.getString(1)
    assert(ddl.contains("FUNCTION(count(`v`)") &&
      ddl.contains("INTERVAL(1h)"), ddl)
    // eligible: 2h % 1h == 0 and every func declared (avg via
    // sum+count partials); result must equal the direct aggregate
    val served = cat.serveInterval("m", 7200000000L, Seq("tbname"),
      Seq(("count", "v"), ("sum", "v"), ("avg", "v")))
      .orderBy("_wstart").collect()
    val direct = graft.ops.TsmaOps.aggBase(cat.table("m"), col("ts"),
      7200000000L, Seq("tbname"),
      Seq(("count", "v"), ("sum", "v"), ("avg", "v")))
      .orderBy("_wstart").collect()
    assert(served.toSeq == direct.toSeq)
    // ineligible interval (90m not a grain multiple) still answers
    val odd = cat.serveInterval("m", 5400000000L, Seq("tbname"),
      Seq(("count", "v")))
    assert(odd.agg(sum("count_v")).head.getLong(0) == 50L)
    // min must NOT be served from a TSMA that never declared it…
    cat.exec("DROP TSMA m_tsma")
    cat.exec("CREATE TSMA sum_only ON m FUNCTION(sum(v)) INTERVAL(1h)")
    // …which shows as the base path giving the same correct answer
    val viaBase = cat.serveInterval("m", 7200000000L, Seq("tbname"),
      Seq(("min", "v"), ("sum", "v"))).orderBy("_wstart").collect()
    val directMin = graft.ops.TsmaOps.aggBase(cat.table("m"),
      col("ts"), 7200000000L, Seq("tbname"),
      Seq(("min", "v"), ("sum", "v"))).orderBy("_wstart").collect()
    assert(viaBase.toSeq == directMin.toSeq)
  }

  test("CREATE VTABLE joins heterogeneous column types across " +
      "type-grouped pivots") {
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.register("src_d",
      Seq((100L, 1.5), (200L, 2.5)).toDF("ts", "dv"))
    cat.register("src_i",
      Seq((100L, 7), (300L, 9)).toDF("ts", "iv"))
    cat.exec("CREATE VTABLE vt (ts TIMESTAMP, a DOUBLE FROM src_d.dv, " +
      "b INT FROM src_i.iv)")
    val rows = cat.table("vt").orderBy("ts").collect()
    assert(rows.map(r => (r.getLong(0), Option(r.get(1)),
      Option(r.get(2)))).toSeq == Seq(
      (100L, Some(1.5), Some(7)),
      (200L, Some(2.5), None),
      (300L, None, Some(9))))
    assert(cat.sql("SHOW VTABLES").count() == 1)
    val ddl = cat.sql("SHOW CREATE VTABLE vt").head.getString(1)
    assert(ddl.contains("FROM `src_d`.`dv`"), ddl)
    cat.exec("DROP VTABLE vt")
    intercept[IllegalArgumentException](cat.table("vt"))
  }

  test("SHOW CREATE TSMA / VTABLE / STABLE round-trips: the shown " +
      "text re-creates the object identically") {
    import spark.implicits._
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE m (ts TIMESTAMP, v DOUBLE) TAGS (g INT)")
    cat.exec("INSERT INTO m1 USING m TAGS (1) VALUES " +
      (0 until 20).map(i => s"(${i.toLong * 600000000L}, ${i * 1.5})")
        .mkString(" "))
    cat.exec("CREATE TSMA rt_tsma ON m FUNCTION(count(v), sum(v)) " +
      "INTERVAL(1h)")
    val tsmaDdl = cat.sql("SHOW CREATE TSMA rt_tsma").head.getString(1)
    cat.exec("DROP TSMA rt_tsma")
    cat.exec(tsmaDdl) // the backticked shown text must parse
    assert(cat.sql("SHOW CREATE TSMA rt_tsma").head.getString(1)
      == tsmaDdl, "re-created TSMA renders different DDL")
    // and it still serves: routed result == direct aggregate
    val served = cat.serveInterval("m", 7200000000L, Seq("tbname"),
      Seq(("sum", "v"))).orderBy("_wstart").collect()
    val direct = graft.ops.TsmaOps.aggBase(cat.table("m"), col("ts"),
      7200000000L, Seq("tbname"), Seq(("sum", "v")))
      .orderBy("_wstart").collect()
    assert(served.toSeq == direct.toSeq)

    cat.register("src_d", Seq((100L, 1.5), (200L, 2.5)).toDF("ts", "dv"))
    cat.exec("CREATE VTABLE vt (ts TIMESTAMP, a DOUBLE FROM src_d.dv)")
    val before = cat.table("vt").orderBy("ts").collect().toSeq
    val vtDdl = cat.sql("SHOW CREATE VTABLE vt").head.getString(1)
    cat.exec("DROP VTABLE vt")
    cat.exec(vtDdl)
    assert(cat.sql("SHOW CREATE VTABLE vt").head.getString(1) == vtDdl,
      "re-created VTABLE renders different DDL")
    assert(cat.table("vt").orderBy("ts").collect().toSeq == before)

    val stDdl = cat.sql("SHOW CREATE STABLE m").head.getString(1)
    val cat2 = new GraftCatalog(spark)
    cat2.exec(stDdl)
    assert(cat2.sql("SHOW CREATE STABLE m").head.getString(1) == stDdl,
      "re-created STABLE renders different DDL")
    // a backticked tag value inside a string literal must survive
    cat2.exec("CREATE TABLE mq USING m TAGS (3)")
    cat2.exec("CREATE STABLE s2 (ts TIMESTAMP, v DOUBLE) " +
      "TAGS (nm VARCHAR(16))")
    cat2.exec("CREATE TABLE s2c USING s2 TAGS ('O`Brien')")
    assert(cat2.sql("SHOW CREATE TABLE s2c").head.getString(1)
      .contains("O`Brien"))
  }

  test("CREATE FUNCTION validates the registry impl and its kind") {
    val cat = new GraftCatalog(spark)
    intercept[IllegalArgumentException](cat.exec(
      "CREATE FUNCTION f AS 'no.such.Impl' OUTPUTTYPE BIGINT"))
    // scalar impl declared AGGREGATE must fail at create time
    intercept[IllegalArgumentException](cat.exec(
      "CREATE AGGREGATE FUNCTION f AS 'graft.udf.Gcd64' " +
        "OUTPUTTYPE BIGINT"))
    cat.exec("CREATE FUNCTION mygcd AS 'graft.udf.Gcd64' " +
      "OUTPUTTYPE BIGINT")
    assert(cat.sql("SHOW FUNCTIONS").count() == 1)
    cat.exec("DROP FUNCTION mygcd")
    assert(cat.sql("SHOW FUNCTIONS").count() == 0)
  }

  test("whitespace inside quoted literals survives normalization") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE STABLE s (ts TIMESTAMP, note VARCHAR(64)) " +
      "TAGS (g INT)")
    cat.exec("INSERT INTO s1 USING s TAGS (1) VALUES " +
      "(100, 'a  b\tc')")
    assert(cat.table("s1").head.getAs[String]("note") == "a  b\tc")
  }

  test("ns precision database scales duration + datetime to ns ticks") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE nsdb PRECISION 'ns'")
    assert(cat.perSecond == 1000000000L)
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE) TAGS (t INT)")
    cat.exec("INSERT INTO c USING st TAGS (1) " +
      "VALUES ('2024-01-01 00:00:00', 1.0)")
    assert(cat.table("c").head.getAs[Long]("ts") == 1704067200000000000L)
  }

  test("SELECT >> file exports a headered CSV that round-trips") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE expdb")
    cat.exec("CREATE TABLE t1 (ts TIMESTAMP, v DOUBLE)")
    cat.exec("INSERT INTO t1 VALUES (1000, 1.5) (2000, 2.5)")
    val dir = java.nio.file.Files.createTempDirectory("graft_exp")
      .toString + "/out.csv"
    val df = cat.sql(s"SELECT ts, v FROM t1 ORDER BY ts >> '$dir'")
    assert(df.count() == 2)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    assert(back.columns.toSeq == Seq("ts", "v"))
    // a >> inside a string literal is NOT an export
    val lit = cat.sql("SELECT count(*) AS n FROM t1 WHERE 'a>>b' = 'a>>b'")
    assert(lit.head.getLong(0) == 2)
  }

  test("INSERT VALUES accepts now/today arithmetic, one instant per stmt") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE nowdb PRECISION 'us'")
    cat.exec("CREATE TABLE nt (ts TIMESTAMP, v DOUBLE)")
    val before = System.currentTimeMillis() * 1000L
    cat.exec("INSERT INTO nt VALUES (now-1s, 1.0)(now, 2.0)(now+1s, 3.0)")
    val after = System.currentTimeMillis() * 1000L
    val rows = cat.table("nt").orderBy("ts").collect()
    assert(rows.length == 3)
    val ts = rows.map(_.getAs[Long]("ts"))
    // one statement instant: the three rows sit exactly 1s apart
    assert(ts(1) - ts(0) == 1000000L && ts(2) - ts(1) == 1000000L)
    assert(ts(1) >= before && ts(1) <= after)
  }

  test("INSERT ... SELECT appends rows; stable target routes by tbname") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE seldb PRECISION 'us'")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v DOUBLE, w INT) " +
      "TAGS (g INT)")
    cat.exec("CREATE TABLE c1 USING st TAGS (1)")
    cat.exec("INSERT INTO c1 VALUES (1000, 1.5, 2)(2000, 2.5, 3)")
    // child target, bound column list, positional match
    cat.exec("CREATE TABLE c2 USING st TAGS (2)")
    cat.exec("INSERT INTO c2 (ts, v, w) SELECT ts, v, w FROM c1")
    val c2 = cat.table("c2").orderBy("ts").collect()
    assert(c2.map(r => (r.getAs[Long]("ts"), r.getAs[Double]("v"))).toSeq ==
      Seq((1000L, 1.5), (2000L, 2.5)))
    // stable target: tbname column routes rows (auto-creating c9)
    cat.exec("INSERT INTO st (tbname, ts, v, w) " +
      "SELECT 'c9' AS tbname, ts, v, w FROM c1")
    val c9 = cat.table("c9").orderBy("ts").collect()
    assert(c9.length == 2 && c9.head.getAs[Double]("v") == 1.5)
  }

  test("SHOW CREATE DATABASE / CONNECTIONS / APPS serve and round-trip") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE rdb PRECISION 'ms' KEEP 30")
    val ddl = cat.sql("SHOW CREATE DATABASE rdb")
      .head.getAs[String]("create_sql")
    assert(ddl.contains("PRECISION 'ms'") && ddl.contains("KEEP 30d"))
    val cat2 = new GraftCatalog(spark)
    cat2.exec(ddl.replace("`rdb`", "`rdb2`"))
    assert(cat2.sql("SHOW CREATE DATABASE rdb2")
      .head.getAs[String]("create_sql").contains("KEEP 30d"))
    assert(cat.sql("SHOW CONNECTIONS").count() == 1)
    assert(cat.sql("SHOW APPS").count() == 1)
  }

  test("%%n placeholders expand inside expressions and multi-key " +
      "PARTITION BY lists") {
    // ADVICE r13: the old key-list capture swallowed the trailing
    // STREAM_OPTIONS keyword, so %%1 only worked as a bare projection
    // (Spark read the junk as an implicit alias); %%n inside a WHERE
    // expression or a 2-key list produced invalid SQL
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE pctdb PRECISION 'us'")
    cat.exec("CREATE TABLE pct_ev (ts TIMESTAMP, user_id INT, " +
      "region INT, value DOUBLE)")
    cat.exec("INSERT INTO pct_ev VALUES " +
      "(1000000, 1, 7, 5.0) (2000000, 1, 7, 6.0) " +
      "(3000000, 2, 8, 7.0) (4000000, 2, 8, -1.0)")
    cat.exec("""CREATE STREAM pct_s INTERVAL(10s) SLIDING(10s)
      FROM pct_ev PARTITION BY user_id, region
      STREAM_OPTIONS(MAX_DELAY(3s))
      INTO pct_out
      AS SELECT _twstart AS ws, %%1 AS uid, %%2 AS reg,
        count(*) AS n
      FROM %%trows WHERE %%2 > 0 AND value > 0""")
    cat.fillHistory("pct_s")
    val rows = cat.table("pct_out").orderBy("uid").collect()
    assert(rows.map(r => (r.getAs[Int]("uid"), r.getAs[Int]("reg"),
      r.getAs[Long]("n"))).toSeq == Seq((1, 7, 2L), (2, 8, 1L)))
  }

  test("vstable tag model: CREATE VTABLE … USING with literal + ref " +
      "tags, SET TAG conversions, dynamic source-tag visibility") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE vdb PRECISION 'ms'")
    cat.exec("CREATE STABLE src (ts TIMESTAMP, val INT) " +
      "TAGS (city VARCHAR(20), code INT)")
    cat.exec("CREATE TABLE s0 USING src TAGS ('beijing', 100)")
    cat.exec("CREATE TABLE s1 USING src TAGS ('shanghai', 200)")
    cat.exec("INSERT INTO s0 VALUES (1000, 1) (2000, 2)")
    cat.exec("INSERT INTO s1 VALUES (5000, 10)")
    cat.exec("CREATE STABLE vstb (ts TIMESTAMP, val INT) TAGS " +
      "(local_tag VARCHAR(20), ref_city VARCHAR(20), ref_code INT) " +
      "VIRTUAL 1")
    cat.exec("CREATE VTABLE v0 (val FROM s0.val) USING vstb TAGS " +
      "('local0', ref_city FROM s0.city, ref_code FROM s1.code)")
    def tagsOf(t: String): (String, String, Int) = {
      val r = cat.table(t).head
      (r.getAs[String]("local_tag"), r.getAs[String]("ref_city"),
        r.getAs[Int]("ref_code"))
    }
    assert(tagsOf("v0") == ("local0", "beijing", 200))
    // literal -> ref conversion; then the source change is visible
    cat.exec("ALTER VTABLE v0 SET TAG local_tag = s0.city")
    cat.exec("ALTER TABLE s0 SET TAG city='nanjing'")
    assert(tagsOf("v0") == ("nanjing", "nanjing", 200))
    // ref -> static literal conversion sticks
    cat.exec("ALTER VTABLE v0 SET TAG ref_city='static'")
    cat.exec("ALTER TABLE s0 SET TAG city='wuhan'")
    assert(tagsOf("v0") == ("wuhan", "static", 200))
    // virtual STABLE read = union of virtual children with tags
    cat.exec("CREATE VTABLE v1 (val FROM s1.val) USING vstb TAGS " +
      "('local1', 'c1', 7)")
    val rows = cat.sql("SELECT tbname, ts, val, ref_code FROM vstb " +
      "ORDER BY tbname, ts").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getInt(3)))
    assert(rows.toSeq == Seq(("v0", 1000L, 1, 200), ("v0", 2000L, 2, 200),
      ("v1", 5000L, 10, 7)))
    // DROP removes the child registry row too
    cat.exec("DROP VTABLE v1")
    assert(cat.sql("SHOW VTABLES").count() == 1)
    assert(cat.sql("SELECT count(*) AS n FROM information_schema." +
      "ins_tags WHERE table_name = 'v1'").head.getLong(0) == 0L)
    // loud error paths: non-virtual USING target, unknown ref source
    intercept[IllegalArgumentException] {
      cat.exec("CREATE VTABLE bad (val FROM s0.val) USING src " +
        "TAGS ('x', 'y')")
    }
    intercept[IllegalArgumentException] {
      cat.exec("CREATE VTABLE bad (val FROM s0.val) USING vstb " +
        "TAGS ('x', ref_city FROM nosuch.city, 1)")
    }
    intercept[IllegalArgumentException] {
      cat.exec("ALTER VTABLE v0 SET TAG ref_code = s0.nosuch")
    }
  }

  test("VTABLE SERIES: declares round-trip through SHOW CREATE, " +
      "ADD/REMOVE SERIES, filtered transport read, loud unbound") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE sdb PRECISION 'ms'")
    import spark.implicits._
    val m = Seq((1000L, 10.0, "srv01"), (2000L, 20.0, "srv01"),
      (3000L, 99.0, "srv02")).toDF("ts", "cpu", "host")
    cat.register("src.db.m", m)
    cat.exec("CREATE VTABLE vs (ts TIMESTAMP, cpu DOUBLE FROM s1.cpu) " +
      "SERIES s1 AS src.db.m (host='srv01')")
    def createSql: String =
      cat.sql("SHOW CREATE VTABLE vs").head.getString(1)
    assert(createSql.contains("SERIES s1 AS src.db.m (host='srv01')"))
    // filtered read: only the srv01 rows
    val rows = cat.table("vs").orderBy("ts").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1000L, 10.0), (2000L, 20.0)))
    // ADD/REMOVE reflect in SHOW CREATE; REMOVE of a referenced
    // series is loud
    cat.exec("ALTER VTABLE vs ADD SERIES s2 AS src.db.m (host='srv02')")
    assert(createSql.contains("s2"))
    intercept[IllegalArgumentException] {
      cat.exec("ALTER VTABLE vs REMOVE SERIES s1")
    }
    cat.exec("ALTER VTABLE vs REMOVE SERIES s2")
    assert(!createSql.contains("s2"))
    intercept[IllegalArgumentException] {
      cat.exec("ALTER VTABLE vs REMOVE SERIES s2")
    }
    // unbound transport fails loudly at read, not silently empty
    cat.exec("CREATE VTABLE vu (ts TIMESTAMP, cpu DOUBLE FROM sx.cpu) " +
      "SERIES sx AS nosuch.db.m (host='a')")
    intercept[IllegalArgumentException] {
      cat.table("vu").collect()
    }
  }

  test("ins_vstable_inherits lists BASE ON edges with deterministic " +
      "uids") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE idb")
    cat.exec("CREATE STABLE p1 (ts TIMESTAMP, a INT) TAGS (t1 INT)")
    cat.exec("CREATE STABLE p2 (ts TIMESTAMP, b INT) TAGS (t2 INT)")
    cat.exec("CREATE STABLE kid (ts TIMESTAMP, c INT) TAGS (t3 INT) " +
      "BASE ON p1, p2")
    val rows = cat.sql("SELECT * FROM information_schema." +
      "ins_vstable_inherits ORDER BY parent_stable_name").collect()
    assert(rows.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getString(3), r.getLong(4), r.getLong(5))).toSeq == Seq(
      ("idb", "p1", 7700000000001L, "kid", 7700000000003L, 1700000003000L),
      ("idb", "p2", 7700000000002L, "kid", 7700000000003L, 1700000003000L)))
    // an inheritance-free catalog lists nothing
    assert(cat.sql("SELECT count(*) AS n FROM information_schema." +
      "ins_vstable_inherits WHERE child_stable_name = 'p1'")
      .head.getLong(0) == 0L)
  }

  test("user-supplied UDF bodies: scalar + aggregate compile from DDL " +
      "text, loud rejects for strays and arity") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE udb")
    cat.exec("CREATE TABLE m (ts TIMESTAMP, v DOUBLE, k INT)")
    cat.exec("INSERT INTO m VALUES (1000, 3.0, 1) (2000, 4.0, 1) " +
      "(3000, 12.0, 2)")
    cat.exec("CREATE FUNCTION hyp AS 'sqrt(a0 * a0 + a1 * a1)' " +
      "OUTPUTTYPE DOUBLE LANGUAGE 'sql'")
    cat.exec("CREATE AGGREGATE FUNCTION sumsq AS 'sum(a0 * a0)' " +
      "OUTPUTTYPE DOUBLE BUFSIZE 8 LANGUAGE 'sql'")
    val r = cat.sql("SELECT k, sumsq(v) AS ss FROM m GROUP BY k " +
      "ORDER BY k").collect().map(x => (x.getInt(0), x.getDouble(1)))
    assert(r.toSeq == Seq((1, 25.0), (2, 144.0)))
    val h = cat.sql("SELECT hyp(v, v) AS h FROM m WHERE k = 2")
      .head.getDouble(0)
    assert(math.abs(h - 12.0 * math.sqrt(2)) < 1e-9)
    // the function listing records the user body
    assert(cat.sql("SHOW FUNCTIONS").collect()
      .exists(_.toSeq.exists(v => String.valueOf(v).contains("sqrt"))))
    // stray column reference (not a0..aN) is rejected at CREATE time
    intercept[IllegalArgumentException] {
      cat.exec("CREATE FUNCTION bad1 AS 'v + 1' OUTPUTTYPE DOUBLE " +
        "LANGUAGE 'sql'")
    }
    // non-contiguous args rejected at CREATE time
    intercept[IllegalArgumentException] {
      cat.exec("CREATE FUNCTION bad2 AS 'a0 + a2' OUTPUTTYPE DOUBLE " +
        "LANGUAGE 'sql'")
    }
    // wrong arity at CALL time
    intercept[Exception] {
      cat.sql("SELECT hyp(v) AS h FROM m").collect()
    }
  }

  test("cluster-admin surface: tokens/mounts/node deploys mutate the " +
      "SHOW registries; guards are loud") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE adb")
    // tokens: create/alter/drop round-trip with options
    cat.exec("CREATE TOKEN t1 FROM USER root PROVIDER 'oauth' TTL 7")
    cat.exec("ALTER TOKEN t1 ENABLE 0")
    val tok = cat.sql("SHOW TOKENS").head
    assert(tok.getAs[String]("name") == "t1" &&
      tok.getAs[Int]("enable") == 0 &&
      tok.getAs[String]("provider") == "oauth")
    intercept[IllegalArgumentException] {
      cat.exec("CREATE TOKEN t1 FROM USER root")
    }
    cat.exec("CREATE TOKEN IF NOT EXISTS t1 FROM USER root") // idempotent
    cat.exec("DROP TOKEN t1")
    assert(cat.sql("SHOW TOKENS").count() == 0)
    intercept[IllegalArgumentException] { cat.exec("DROP TOKEN t1") }
    intercept[IllegalArgumentException] {
      cat.exec("CREATE TOKEN tx FROM USER nosuch")
    }
    // node deployments appear in their listings; last-mnode guarded
    cat.exec("CREATE QNODE ON DNODE 1")
    assert(cat.sql("SHOW QNODES").count() == 1)
    cat.exec("DROP QNODE ON DNODE 1")
    assert(cat.sql("SHOW QNODES").count() == 0)
    intercept[IllegalArgumentException] {
      cat.exec("DROP MNODE ON DNODE 1")
    }
    // mounts + xnodes + dnodes land in listings
    cat.exec("CREATE MOUNT m1 ON DNODE 1 FROM '/backup'")
    assert(cat.sql("SHOW MOUNTS").head.getAs[String]("path") == "/backup")
    cat.exec("DROP MOUNT m1")
    cat.exec("CREATE XNODE 'x:7000'")
    cat.exec("DRAIN XNODE 1")
    assert(cat.sql("SHOW XNODE 1").head.getAs[String]("status") ==
      "draining")
    cat.exec("CREATE DNODE 'h9:6030'")
    assert(cat.sql("SHOW DNODES").count() == 2)
    cat.exec("DROP DNODE 2")
    intercept[IllegalArgumentException] { cat.exec("DROP DNODE 1") }
    // role lock requires the role; TOTP requires the user
    intercept[IllegalArgumentException] { cat.exec("LOCK ROLE nope") }
    cat.exec("CREATE TOTP_SECRET FOR USER root")
    intercept[IllegalArgumentException] {
      cat.exec("CREATE TOTP_SECRET FOR USER ghost")
    }
    cat.exec("DROP TOTP_SECRET FROM USER root")
    // transaction brackets and validated placement verbs accept
    cat.exec("BEGIN"); cat.exec("COMMIT"); cat.exec("START TRANSACTION")
    cat.exec("BALANCE VGROUP LEADER DATABASE adb")
    intercept[IllegalArgumentException] {
      cat.exec("SSMIGRATE DATABASE nodb")
    }
  }

  test("per-engine REAL mapping: MySQL REAL is double, PG real is " +
      "float (extTypeMap.c:325,646)") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE EXTERNAL SOURCE srcmy TYPE='mysql' HOST='h' " +
      "PORT=3306 USER='u'")
    cat.exec("CREATE EXTERNAL SOURCE srcpg TYPE='postgresql' " +
      "HOST='h' PORT=5432 USER='u'")
    assert(cat.externalColumnType("srcmy", "REAL") ==
      org.apache.spark.sql.types.DoubleType)
    assert(cat.externalColumnType("srcpg", "REAL") ==
      org.apache.spark.sql.types.FloatType)
    // native DDL keeps the engine-less default (PG float4 width)
    cat.exec("CREATE TABLE treal (ts TIMESTAMP, r REAL)")
    assert(cat.table("treal").schema("r").dataType ==
      org.apache.spark.sql.types.FloatType)
  }

  test("EXTERNAL SOURCE PORT: placeholder identifier tolerated, " +
      "malformed numeric rejected loudly") {
    val cat = new GraftCatalog(spark)
    // an unexpanded harness variable is accepted as port 0
    cat.exec("CREATE EXTERNAL SOURCE s1 TYPE='mysql' HOST='h' " +
      "PORT=leader_port USER='u'")
    // malformed mixed token fails loudly, not silently port 0
    intercept[IllegalArgumentException] {
      cat.exec("CREATE EXTERNAL SOURCE s2 TYPE='mysql' HOST='h' " +
        "PORT=12x4 USER='u'")
    }
  }

  test("multi-statement split survives a backslash-escaped quote " +
      "inside a literal") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE escdb")
    cat.exec("CREATE TABLE esct (ts TIMESTAMP, s VARCHAR(32))")
    // the ; inside 'a\'b;c' must NOT tear the statement
    cat.sql("INSERT INTO esct VALUES (1000, 'a\\'b;c'); " +
      "INSERT INTO esct VALUES (2000, 'plain')")
    val rows = cat.table("esct").orderBy("ts").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("s") == "a'b;c")
  }

  test("INSERT..SELECT * trim uses the SOURCE stable's tags, not any " +
      "stable's") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE trimdb")
    // an unrelated stable whose TAG name collides with a data column
    cat.exec("CREATE STABLE other (ts TIMESTAMP, x DOUBLE) " +
      "TAGS (v2 INT)")
    cat.exec("CREATE STABLE st (ts TIMESTAMP, v1 DOUBLE, v2 DOUBLE) " +
      "TAGS (loc VARCHAR(8))")
    cat.exec("CREATE TABLE c1 USING st TAGS ('a')")
    cat.exec("CREATE TABLE c2 USING st TAGS ('b')")
    cat.exec("INSERT INTO c1 VALUES (1000, 1.5, 2.5)")
    // SELECT * ride-along trim still works (tail = source tags+tbname)
    cat.sql("INSERT INTO c2 SELECT * FROM c1")
    val rows = cat.table("c2").collect()
    assert(rows.length == 1 && rows(0).getAs[Double]("v2") == 2.5)
    // v2 is a DATA column of st that merely collides with OTHER's tag
    // name: a bound-column insert whose select carries it as a trailing
    // extra must fail the arity check loudly, not silently drop it
    intercept[IllegalArgumentException] {
      cat.sql("INSERT INTO c2 (ts, v1) SELECT ts, v1, v2 FROM c1")
    }
  }

  test("database() tracks the catalog's USE state") {
    val cat = new GraftCatalog(spark)
    cat.exec("CREATE DATABASE mixdb")
    cat.exec("CREATE TABLE t1 (ts TIMESTAMP, v DOUBLE)")
    cat.exec("INSERT INTO t1 VALUES (1000, 1.5)")
    assert(cat.sql("SELECT database() AS db FROM t1")
      .head.getString(0) == "mixdb")
    cat.exec("CREATE DATABASE otherdb")
    assert(cat.sql("SELECT database() AS db FROM t1")
      .head.getString(0) == "otherdb")
  }
}
