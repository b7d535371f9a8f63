package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.sql.{GraftCatalog, GraftSql}

/** Pins for the r19 streams-corpus receipt fixes (each a positive in
  * the reference's own tests, cited per case). Value-level checks ride
  * the new gates (`dialect_indef_session`, `ddl_tag_expr_agg_gate`);
  * this spec pins catalog semantics the oracles can't see.
  */
class StreamsCorpusR19Spec extends AnyFunSuite {
  import SparkTestSession._

  private def resolve(name: String): DataFrame = Tables(spark, sf, name)
  private def q(sql: String): DataFrame =
    GraftSql.query(spark, resolve, sql)

  private def freshCat(): GraftCatalog = {
    val cat = new GraftCatalog(spark)
    cat.sql("CREATE DATABASE scr19")
    cat.sql("USE scr19")
    cat
  }

  test("ISO T/zone datetime literals in INSERT VALUES " +
      "(tm0 corpus shapes)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE tm0 (ts TIMESTAMP, k DOUBLE)")
    cat.sql("insert into tm0 values('2015-08-18T00:00:00Z', 2.064) " +
      "('2023-10-08T22:00:00+00:00', 3.5)")
    val ts = cat.table("tm0").orderBy("ts").collect().map(_.getLong(0))
    assert(ts.toSeq == Seq(1439856000000000L, 1696802400000000L))
  }

  test("quoted-datetime ± duration in VALUES ts positions") {
    val cat = freshCat()
    cat.sql("CREATE TABLE td (ts TIMESTAMP, v INT)")
    cat.sql("insert into td values('2023-12-05 23:59:59.999' + 2a, 4)")
    cat.sql("insert into td values('1704067200000000' + 1s, 5)")
    val ts = cat.table("td").orderBy("ts").collect().map(_.getLong(0))
    assert(ts.toSeq ==
      Seq(1701820800000000L - 1000L + 2000L, 1704067201000000L))
  }

  test("DELETE with cast(epoch as timestamp) " +
      "(test_oldcase_state.py:351)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE t1 (ts TIMESTAMP, v INT)")
    cat.sql("insert into t1 values(1668073288214000, 1) " +
      "(1668073288215000, 2)")
    cat.sql("delete from t1 where ts = cast(1668073288214000 as timestamp)")
    assert(cat.table("t1").count() == 1)
  }

  test("CREATE TABLE without a TIMESTAMP first column rejects " +
      "(TSDB_CODE_PAR_INVALID_FIRST_COLUMN)") {
    val cat = freshCat()
    val e = intercept[IllegalArgumentException] {
      cat.sql("CREATE TABLE push_t (val INT, score DOUBLE)")
    }
    assert(e.getMessage.contains("first column must be the TIMESTAMP"))
  }

  test("ALTER TABLE RENAME COLUMN (test_tmq_ts6379.py:497)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE rn (ts TIMESTAMP, voltage INT)")
    cat.sql("insert into rn values(1704067200000000, 7)")
    cat.sql("alter table rn rename column voltage vol")
    val df = cat.table("rn")
    assert(df.columns.contains("vol") && !df.columns.contains("voltage"))
    assert(df.select("vol").collect().head.getInt(0) == 7)
    intercept[IllegalArgumentException] {
      cat.sql("alter table rn rename column ts ts2")
    }
  }

  test("double-quoted password in CREATE USER (rbac corpus)") {
    val cat = freshCat()
    cat.sql("""create user u1 pass "taosdata_12345"""")
    assert(cat.sql("SHOW USERS").collect()
      .exists(_.getString(0) == "u1"))
  }

  test("db-qualified vtable tag refs + empty vtable reads 0 rows " +
      "(test_vtable_child_colref_after_alter.py:61)") {
    val cat = freshCat()
    cat.sql("CREATE STABLE vstb (ts TIMESTAMP, v INT) " +
      "TAGS (region INT) VIRTUAL 1")
    cat.sql("CREATE STABLE src (ts TIMESTAMP, v INT) TAGS (region INT)")
    cat.sql("CREATE TABLE ct0 USING src TAGS (4)")
    cat.sql("insert into ct0 values(1704067200000000, 3)")
    cat.sql("create vtable vct1 (v from scr19.ct0.v) using scr19.vstb " +
      "tags(region from scr19.ct0.region)")
    cat.sql("create vtable vctb_empty using vstb tags (2)")
    val empty = cat.sql("select * from vctb_empty")
    // the reference's checkCols counts DATA columns only — the
    // subtable wildcard excludes tags/tbname (r20 parity; the same
    // test pins cols=3 for a 3-data-column vstb)
    assert(empty.count() == 0 && empty.columns.toSeq == Seq("ts", "v"))
  }

  test("EXPLAIN over a parenthesized UNION body") {
    val cat = freshCat()
    cat.sql("CREATE TABLE eu (ts TIMESTAMP, v INT)")
    cat.sql("insert into eu values(1704067200000000, 1)")
    val plan = cat.sql("explain analyze verbose true " +
      "(select v from eu) union all (select v from eu)")
    assert(plan.columns.sameElements(Array("plan_line")))
  }

  test("DROP XNODE JOB WHERE multi-conjunct forms + FORCE by endpoint " +
      "(test_xnode.py:149,452)") {
    val cat = freshCat()
    cat.sql("DROP XNODE JOB WHERE task_id = 2 and status = 'running'")
    cat.sql("DROP XNODE JOB WHERE config != ''")
    cat.sql("CREATE XNODE 'localhost:6055' user root pass 'taosdata'")
    cat.sql("DROP XNODE FORCE 'localhost:6055'")
    intercept[Exception] { cat.sql("DROP XNODE FORCE 'gone:1'") }
  }

  test("per-COUNT_WINDOW indefinite-rows: reset per n-row bucket, " +
      "pseudo-cols are the bucket's ts extent " +
      "(test_fun_win_keep_order.py)") {
    val r = q("""SELECT ts, CAST(_wstart AS BIGINT) AS w,
        CAST(_wend AS BIGINT) AS we, statecount(value, 'LE', 50) AS sc
      FROM events WHERE user_id = 3 AND event_id < 2000 COUNT_WINDOW(3)
      ORDER BY ts""").collect()
    assert(r.nonEmpty)
    // buckets of 3 consecutive rows: _wstart = the bucket's first ts,
    // _wend its last; the first row of each bucket has ts == _wstart
    r.grouped(3).foreach { g =>
      assert(g.head.getLong(0) == g.head.getLong(1))
      assert(g.last.getLong(0) == g.head.getLong(2))
      assert(g.forall(_.getLong(1) == g.head.getLong(1)))
    }
    // statecount resets per bucket: a true first row restarts at 1
    r.grouped(3).foreach { g =>
      val sc0 = g.head.getLong(3)
      assert(sc0 == 1L || sc0 == -1L)
    }
  }

  test("per-SESSION indefinite-rows: csum resets at session " +
      "boundaries (test_interval_basic.py:1224)") {
    val r = q("""SELECT ts, csum(event_id) AS cs FROM events
      WHERE user_id = 3 AND event_id < 300 SESSION(ts, 10m)
      ORDER BY ts""").collect()
    // the five matching rows are all singleton sessions (gaps >> 10m):
    // each csum equals its own row's event_id
    assert(r.nonEmpty)
    val ids = q("""SELECT event_id FROM events
      WHERE user_id = 3 AND event_id < 300 ORDER BY ts""").collect()
      .map(_.getLong(0))
    assert(r.map(_.getLong(1)).toSeq == ids.toSeq)
  }

  test("expression over tags rides aggregates (lowered to min)") {
    val cat = freshCat()
    cat.sql("CREATE STABLE stb (ts TIMESTAMP, v INT) TAGS (t2 INT)")
    cat.sql("CREATE TABLE c1 USING stb TAGS (7)")
    cat.sql("insert into c1 values(1704067200000000, 1) " +
      "(1704067201000000, 2)")
    val r = cat.sql("select cast(t2 as binary(12)), count(*) from stb")
      .collect()
    assert(r.length == 1 && r.head.getString(0) == "7" &&
      r.head.getLong(1) == 2)
  }

  test("CREATE OR REPLACE VIEW swaps the definition " +
      "(test_view_mgmt.py:279)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE st2 (ts TIMESTAMP, v INT)")
    cat.sql("insert into st2 values(1704067200000000, 1)")
    cat.sql("create or replace view view1 as select * from st2")
    assert(cat.sql("select * from view1").columns.length >= 2)
    cat.sql("create or replace view view1 as select v from st2")
    assert(cat.sql("select * from view1").columns.sameElements(
      Array("v")))
  }

  test("DELETE where ts IS NULL is a no-op; IS NOT NULL matches all " +
      "(test_write_delete.py:233)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE wd (ts TIMESTAMP, v INT)")
    cat.sql("insert into wd values(1704067200000000, 1)")
    cat.sql("delete from wd where ts is null")
    assert(cat.table("wd").count() == 1)
    cat.sql("delete from wd where ts is not null")
    assert(cat.table("wd").count() == 0)
  }

  test("vtable column defs with declared types + FROM refs " +
      "(test_vtable_decimal.py:167)") {
    val cat = freshCat()
    cat.sql("CREATE TABLE org_ntb_0 (ts TIMESTAMP, " +
      "dec64_col DECIMAL(18,2), metric INT)")
    cat.sql("insert into org_ntb_0 values(1704067200000000, 1.25, 7)")
    cat.sql("create vtable vntb (ts timestamp, " +
      "dec64_col decimal(18,2) from org_ntb_0.dec64_col, " +
      "metric int from org_ntb_0.metric)")
    val r = cat.sql("select * from vntb").collect()
    assert(r.length == 1 && r.head.getInt(2) == 7)
  }

  test("xnode-task TOPIC routes, OR'd job teardown, forced dnode drop") {
    val cat = freshCat()
    cat.sql("CREATE XNODE TASK 't1' FROM TOPIC tp1 TO " +
      "'kafka://broker:9092' WITH group_id 'g1', client_id 'c1'")
    cat.sql("DROP XNODE JOB WHERE status = 'running' OR " +
      "status = 'pending'")
    cat.sql("create dnode \"localhost:7030\"")
    cat.sql("drop dnode 2 force")
  }

  test("group-by-tbname/tag always returns one row per child — " +
      "empty children count 0, other aggregates NULL " +
      "(test_query_groupby_alwaysreturn.py)") {
    val cat = freshCat()
    cat.sql("CREATE STABLE stb (ts TIMESTAMP, c1 INT) TAGS (t2 INT)")
    cat.sql("CREATE TABLE ct1 USING stb TAGS (1)")
    cat.sql("CREATE TABLE ct2 USING stb TAGS (2)")
    cat.sql("CREATE TABLE ct3 USING stb TAGS (3)")
    cat.sql("INSERT INTO ct1 VALUES (1704067200000000, 5) " +
      "(1704067201000000, 6)")
    val r = cat.sql("select tbname, count(*) as n, sum(c1) as s " +
      "from stb group by tbname order by tbname").collect()
    assert(r.length == 3)
    assert(r.map(x => (x.getString(0), x.getLong(1))).toSeq ==
      Seq(("ct1", 2L), ("ct2", 0L), ("ct3", 0L)))
    assert(r(1).isNullAt(2) && r(2).isNullAt(2))
    // HAVING evaluates over the FILLED frame: empty children only
    val h = cat.sql("select tbname, count(*) as n from stb " +
      "partition by tbname having count(*) <= 0 order by tbname")
      .collect()
    assert(h.map(_.getString(0)).toSeq == Seq("ct2", "ct3"))
    // tag keys enumerate distinct tag values, WHERE included
    val t = cat.sql("select t2, count(*) from stb where ts < now " +
      "group by t2 order by t2").collect()
    assert(t.length == 3 && t.map(_.getLong(1)).toSeq ==
      Seq(2L, 0L, 0L))
  }

  test("HAVING with the extended aggregate surface (apercentile)") {
    val r = q("""SELECT user_id, avg(value) AS av FROM events
      GROUP BY user_id HAVING apercentile(value, 50) >= 0
      ORDER BY user_id""").collect()
    val all = q("""SELECT user_id FROM events WHERE value IS NOT NULL
      GROUP BY user_id""").collect()
    assert(r.length == all.length)
  }
}
