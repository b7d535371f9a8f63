package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sql.{GraftCatalog, GraftSql}

/** DDL / INSERT text-surface gates (reference sql.y:1066-1092 CREATE
  * STABLE, 1176-1177 CREATE TABLE USING, 1623-1711 CREATE STREAM,
  * 1889-1891 INSERT; parInsertSql.c): the catalog is built purely from
  * DDL + INSERT text, queried back through the dialect, and
  * hash-matched against DuckDB reading the same source parquet — so a
  * green row proves the whole text round-trip (parse → catalog →
  * upsert-visible read → dialect SELECT) is lossless. */
object Ddl {

  private val H = 3600000000L
  private val T0 = 1704067200000000L
  private val liveRuns = new java.util.concurrent.atomic.AtomicLong()

  private def esc(s: String): String = s.replace("'", "''")

  /** Deterministic demo catalog built ONLY through the text surface:
    * a `nat` stable (child per nation, CREATE TABLE … USING … TAGS +
    * one multi-table INSERT), a `cm` stable (INSERT … USING auto-create
    * with bound columns, then a duplicate-ts re-insert that must
    * resolve last-writer-wins), and a CREATE STREAM definition over the
    * registered events table. */
  private def demo(s: SparkSession, dir: String): GraftCatalog = {
    val cat = new GraftCatalog(s)
    cat.exec("CREATE DATABASE graftdb PRECISION 'us'")
    cat.exec("""CREATE STABLE nat (ts TIMESTAMP, v DOUBLE)
      TAGS (n_name VARCHAR(32), n_regionkey INT)""")
    val nations = Tables(s, dir, "nation")
      .select("n_nationkey", "n_name", "n_regionkey")
      .collect().sortBy(_.getInt(0))
    nations.foreach { r =>
      cat.exec(s"CREATE TABLE IF NOT EXISTS nat_${r.getInt(0)} USING nat " +
        s"TAGS ('${esc(r.getString(1))}', ${r.getInt(2)})")
    }
    // the multi-table insert fast path: every child in ONE statement
    cat.exec("INSERT INTO " + nations.map { r =>
      val k = r.getInt(0)
      s"nat_$k VALUES (${T0 + k.toLong * H}, ${k * 1.5})"
    }.mkString(" "))
    cat.exec("""CREATE STABLE cm (ts TIMESTAMP, bal DOUBLE, note VARCHAR(8))
      TAGS (seg VARCHAR(16))""")
    val custs = Tables(s, dir, "customer")
      .filter(col("c_custkey") <= 40)
      .select("c_custkey", "c_mktsegment", "c_acctbal")
      .collect().sortBy(_.getLong(0))
    // INSERT … USING TAGS auto-creates each child; (ts, bal) bound
    // columns leave `note` NULL
    cat.exec("INSERT INTO " + custs.map { r =>
      val k = r.getLong(0)
      s"cm_$k USING cm TAGS ('${esc(r.getString(1))}') (ts, bal) " +
        s"VALUES (${T0 + k * H}, ${r.getDouble(2)})"
    }.mkString(" "))
    // duplicate-ts re-insert: upsert means the +1000 values win
    cat.exec("INSERT INTO " + custs.map { r =>
      val k = r.getLong(0)
      s"cm_$k (ts, bal) VALUES (${T0 + k * H}, ${r.getDouble(2) + 1000})"
    }.mkString(" "))
    cat.register("events", Tables(s, dir, "events"))
    cat.exec("""CREATE STREAM hourly TRIGGER WINDOW_CLOSE WATERMARK 1m
      INTO hourly_out AS
      SELECT _wstart, count(*) AS n, sum(value) AS sum_value
      FROM events INTERVAL(1h)""")
    cat
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CREATE STABLE/TABLE…USING…TAGS + multi-table INSERT, read back
    // through a dialect SELECT over the stable (tags + tbname attached)
    "ddl_roundtrip_gate" -> { (s, dir) =>
      GraftSql.query(s, demo(s, dir).table,
        "SELECT tbname, n_name, n_regionkey, ts, v FROM nat ORDER BY ts")
    },
    // INSERT…USING auto-create + bound columns + duplicate-ts upsert
    "insert_autocreate_gate" -> { (s, dir) =>
      GraftSql.query(s, demo(s, dir).table,
        "SELECT tbname, seg, ts, bal, note FROM cm ORDER BY ts")
    },
    // bare TAG columns riding aggregates without GROUP BY (constant
    // per child — parTranslater allows them like tbname; catalog reads
    // mark tags in the schema metadata and the front end lowers the
    // bare tag to min(tag))
    "ddl_tag_agg_gate" -> { (s, dir) =>
      GraftSql.query(s, demo(s, dir).table,
        """SELECT n_name, count(*) AS n, sum(v) AS sv FROM nat
           WHERE n_regionkey = 2 ORDER BY n_name""")
    },
    // "group by always returns" (test_query_groupby_alwaysreturn.py;
    // countAlwaysReturnValue default): grouping a stable by tbname
    // enumerates EVERY child — empty ones count 0, other aggregates
    // NULL
    "ddl_always_return_gate" -> { (s, dir) =>
      val cat = new GraftCatalog(s)
      cat.exec("CREATE DATABASE ardb PRECISION 'us'")
      cat.exec("CREATE STABLE arstb (ts TIMESTAMP, c1 INT) " +
        "TAGS (t2 INT)")
      cat.exec("CREATE TABLE arct1 USING arstb TAGS (1)")
      cat.exec("CREATE TABLE arct2 USING arstb TAGS (2)")
      cat.exec("CREATE TABLE arct3 USING arstb TAGS (3)")
      cat.exec(s"INSERT INTO arct1 VALUES ($T0, 5) (${T0 + H}, 6)")
      cat.sql("""select tbname, count(*) as n, sum(c1) as s
        from arstb group by tbname order by tbname""")
    },
    // an EXPRESSION over tags riding aggregates
    // (test_query_partitionby_basic.py:814 `select cast(t2 as
    // binary(12)),count(*) from stb`): constant per child, wrapped
    // min() like the bare-tag form
    "ddl_tag_expr_agg_gate" -> { (s, dir) =>
      GraftSql.query(s, demo(s, dir).table,
        """SELECT concat(n_name, '!') AS nx, count(*) AS n FROM nat
           WHERE n_regionkey = 2 ORDER BY nx""")
    },
    // FILE bulk-load spellings (sql.y:1064-1065
    // createCreateSubTableFromFileClause; parInsertSql.c csv path):
    // CREATE TABLE USING … (fields) FILE batch-creates children from a
    // tbname+tags CSV (unlisted tags NULL); INSERT … FILE loads data
    // rows, including the USING auto-create form — then the stable
    // read-back must round-trip every value
    "ddl_file_load_gate" -> { (s, dir) =>
      val cat = new GraftCatalog(s)
      cat.exec("CREATE DATABASE filedb PRECISION 'us'")
      cat.exec("""CREATE STABLE mt (ts TIMESTAMP, v DOUBLE,
        note VARCHAR(16)) TAGS (loc VARCHAR(16), gid INT)""")
      val d = java.nio.file.Files.createTempDirectory("graft_file_load")
      def put(name: String, text: String): String = {
        val p = d.resolve(name)
        java.nio.file.Files.write(p,
          text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        p.toString
      }
      val subs = put("subs.csv",
        "'m1','SF'\n'm2','LA'\n")
      val d1 = put("m1.csv",
        s"${T0},1.5,'a'\n${T0 + H},2.5,'b'\n")
      val d2 = put("m2.csv",
        s"${T0 + 2 * H},3.5,NULL\n")
      val d3 = put("m3.csv",
        s"${T0 + 3 * H},4.5\n")
      // batch child creation: gid unlisted -> NULL
      cat.exec(s"CREATE TABLE USING mt (tbname, loc) FILE '$subs'")
      cat.exec(s"INSERT INTO m1 FILE '$d1'")
      cat.exec(s"INSERT INTO m2 FILE '$d2'")
      // auto-create + bound columns + FILE in one statement
      cat.exec(s"INSERT INTO m3 USING mt TAGS ('NY', 7) (ts, v) " +
        s"FILE '$d3'")
      cat.sql("SELECT tbname, loc, gid, ts, v, note FROM mt ORDER BY ts")
    },
    // CREATE STREAM text → FILL_HISTORY batch run → read the INTO table
    "ddl_stream_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.fillHistory("hourly")
      cat.table("hourly_out").orderBy("_wstart")
    },
    // RECALCULATE STREAM text (sql.y:1628; docs/41-stream.md:864):
    // backfill, then a late-data correction lands in a 2-day slice of
    // the source and the text recalc swaps exactly those windows — the
    // rest of the output must stay identical to the original backfill
    "ddl_recalc_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.fillHistory("hourly")
      val lo = T0 + 48 * H; val hi = T0 + 96 * H
      cat.register("events", Tables(s, dir, "events")
        .withColumn("value",
          when(col("ts") >= lo && col("ts") < hi, col("value") + 10)
            .otherwise(col("value"))))
      cat.exec(s"RECALCULATE STREAM hourly FROM $lo TO $hi")
      cat.table("hourly_out").orderBy("_wstart")
    },
    // ALTER STABLE ADD COLUMN/ADD TAG + ALTER TABLE SET TAG: rows from
    // before the ALTER read back with the new column NULL, rows from
    // after carry values, and the re-bound tag is visible on its child
    "ddl_alter_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("ALTER STABLE nat ADD COLUMN v2 DOUBLE")
      cat.exec("ALTER STABLE nat ADD TAG grp INT")
      cat.exec("ALTER TABLE nat_0 SET TAG grp = 7")
      val nations = Tables(s, dir, "nation")
        .select("n_nationkey").collect().map(_.getInt(0)).sorted
      cat.exec("INSERT INTO " + nations.map { k =>
        s"nat_$k VALUES (${T0 + k.toLong * H + 1800000000L}, " +
          s"${k * 2.5}, ${k * 0.5})"
      }.mkString(" "))
      cat.sql("SELECT tbname, n_name, grp, ts, v, v2 FROM nat ORDER BY ts")
    },
    // DELETE FROM: ts-range delete on the stable + whole-child delete
    "ddl_delete_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec(s"DELETE FROM nat WHERE ts >= ${T0 + 12 * H}")
      cat.exec("DELETE FROM nat_3")
      cat.sql("SELECT tbname, ts, v FROM nat ORDER BY ts")
    },
    // DESCRIBE: field/type/length/note with tags after data columns
    "ddl_describe_gate" -> { (s, dir) =>
      demo(s, dir).sql("DESCRIBE nat").orderBy("field")
    },
    // SELECT … >> export_file (20-select.md:1010): the shell's CSV
    // export suffix; the gate proves the written file round-trips
    "ddl_export_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      val out = java.nio.file.Files.createTempDirectory("graft_export")
        .toString + "/nat.csv"
      cat.sql(s"SELECT tbname, ts, v FROM nat ORDER BY ts >> '$out'")
      s.read.option("header", "true").csv(out)
        .select(col("tbname"), col("ts").cast("long").as("ts"),
          col("v").cast("double").as("v"))
        .orderBy(col("ts"))
    },
    // db-qualified SHOW listings (SHOW db.STABLES scoped to the named
    // db), the xnode admin surface with WHERE, and VTABLE VALIDATE
    "ddl_show_scoped_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE DATABASE scdb")
      cat.exec("USE scdb")
      cat.exec(
        "CREATE STABLE sc_meters (ts TIMESTAMP, v DOUBLE) TAGS (t1 INT)")
      cat.exec("CREATE TABLE sc_d0 USING sc_meters TAGS (1)")
      cat.exec("CREATE TABLE sc_d1 USING sc_meters TAGS (2)")
      cat.exec("USE graftdb")
      val st = cat.sql("SHOW scdb.STABLES")
        .select(col("stable_name"), col("db_name"), col("child_tables"))
      val xn = cat.sql("SHOW XNODES WHERE update_time <= now()")
        .agg(count(lit(1)).as("n_xnodes"))
      st.crossJoin(xn).orderBy("stable_name")
    },
    // EXTERNAL SOURCE CRUD (sql.y:3151-3190, federated-query admin):
    // create (mysql/influx token form), IF NOT EXISTS keeps the
    // original, ALTER patch-merges OPTIONS, drop, refresh, listing
    // with masked secrets
    "ddl_ext_source_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE EXTERNAL SOURCE srcm TYPE='mysql' HOST='mh' " +
        "PORT=3306 USER='u1' PASSWORD='p1' DATABASE='d1'")
      cat.exec("CREATE EXTERNAL SOURCE srci TYPE='influxdb' " +
        "HOST='ih' PORT=8086 USER='admin' DATABASE='metrics' " +
        "SCHEMA='autogen' " +
        "OPTIONS('api_token'='tok', 'protocol'='flight_sql')")
      cat.exec("CREATE EXTERNAL SOURCE IF NOT EXISTS srcm " +
        "TYPE='mysql' HOST='other' PORT=9999 USER='x'")
      cat.exec("ALTER EXTERNAL SOURCE srcm SET host='mh2' " +
        "OPTIONS('ssl_mode'='required', 'access_key'='AK123')")
      cat.exec("CREATE EXTERNAL SOURCE tmp TYPE='postgresql' " +
        "HOST='ph' PORT=5432 USER='pu' SCHEMA='public'")
      cat.exec("DROP EXTERNAL SOURCE tmp")
      cat.exec("REFRESH EXTERNAL SOURCE srci")
      cat.sql("SHOW EXTERNAL SOURCES")
        .select(col("source_name"), col("type"), col("host"),
          col("port"), col("user"), col("password"), col("database"),
          col("schema"), col("options"))
        .orderBy("source_name")
    },
    // CREATE VIEW: saved dialect query, re-planned per read
    "ddl_view_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE VIEW big_nat AS " +
        "SELECT tbname, n_regionkey, v FROM nat WHERE v > 10")
      cat.sql("SELECT n_regionkey, count(*) AS n, sum(v) AS sum_v " +
        "FROM big_nat GROUP BY n_regionkey ORDER BY n_regionkey")
    },
    // CREATE TOPIC + SHOW TOPICS (the consume path is oracle-gated by
    // tmq_subscribe_gate; this pins the text surface + listing)
    "ddl_topic_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE TOPIC nat_topic AS SELECT ts, v FROM nat")
      cat.exec("CREATE TOPIC db_topic AS DATABASE graftdb")
      cat.sql("SHOW TOPICS").orderBy("topic_name")
    },
    // CREATE TSMA text (sql.y:1503-1505; reference tests 19-TSMAs):
    // hourly partial-state rollup declared via DDL, daily windows
    // served THROUGH the router — the oracle aggregates the base
    // table, so a green row proves create-text → rollup → partial
    // merge reproduces the direct answer bit-exactly
    "ddl_tsma_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("""CREATE TSMA ev_tsma ON events
        FUNCTION(count(value), sum(value), min(value), max(value),
          avg(value)) INTERVAL(1h)""")
      cat.serveInterval("events", 24 * H, Seq("user_id"),
          Seq(("count", "value"), ("sum", "value"), ("min", "value"),
            ("max", "value"), ("avg", "value")))
        .select(col("user_id"),
          Lowering.usToMs(col("_wstart")).as("_wstart_ms"),
          col("count_value").as("n"), col("sum_value").as("sum_v"),
          col("min_value").as("min_v"), col("max_value").as("max_v"),
          round(col("avg_value"), 6).as("avg_v"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // CREATE RSMA text (sql.y:1480-1484; rollupoperator.c): 2-level
    // retention ladder (1h -> 1d); serving a 1d interval must pick the
    // COARSEST eligible level (the 1d fold of the 1h state) and still
    // hash-match the direct base-table aggregate. The served_grain
    // column pins the router's retention-aware choice in the hash.
    "ddl_rsma_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("""CREATE RSMA ev_rsma ON events
        FUNCTION(count(value), sum(value), min(value), max(value),
          avg(value)) INTERVAL(1h, 1d)""")
      val specs = Seq(("count", "value"), ("sum", "value"),
        ("min", "value"), ("max", "value"), ("avg", "value"))
      val grain = cat.servingGrain("events", 24 * H, specs)
        .getOrElse(-1L)
      cat.serveInterval("events", 24 * H, Seq("user_id"), specs)
        .select(col("user_id"),
          Lowering.usToMs(col("_wstart")).as("_wstart_ms"),
          col("count_value").as("n"), col("sum_value").as("sum_v"),
          col("min_value").as("min_v"), col("max_value").as("max_v"),
          round(col("avg_value"), 6).as("avg_v"),
          lit(grain).as("served_grain"))
        .orderBy(col("user_id"), col("_wstart_ms"))
    },
    // CREATE VTABLE text (sql.y:1074-1076, column FROM refs
    // sql.y:3253): three per-type value columns aligned on ts; the
    // oracle states the same read as a grouped pivot over the base
    // rows — virtualtablescanoperator.c's ts-merge, relationally
    "ddl_vtable_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      val e = Tables(s, dir, "events").filter(col("user_id") === 7)
      Seq("click", "view", "purchase").foreach(t =>
        cat.register("ev_" + t, e.filter(col("event_type") === t)
          .select(col("ts"), col("value"))))
      cat.exec("""CREATE VTABLE vt7 (ts TIMESTAMP,
        click_v DOUBLE FROM ev_click.value,
        view_v DOUBLE FROM ev_view.value,
        purchase_v DOUBLE FROM ev_purchase.value)""")
      cat.sql("SELECT ts AS ts_us, click_v, view_v, purchase_v " +
        "FROM vt7 ORDER BY ts_us")
    },
    // the vstable tag model (sql.y:1077-1086 createCreateVSubTableStmt
    // + sql.y:1121 createAlterTableAlterTagRef; reference
    // test/cases/05-VirtualTables/01-DDL/02-Tag): CREATE VTABLE …
    // USING vstb TAGS(…) with literal AND dynamic tag-ref values,
    // literal<->ref conversion via ALTER VTABLE SET TAG, and an ALTER
    // on the SOURCE child reflected through the refs at read time —
    // the result is read through the virtual STABLE (union of virtual
    // children, tags + tbname attached)
    "ddl_vtable_tag_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("""CREATE STABLE vsrc (ts TIMESTAMP, val INT)
        TAGS (city VARCHAR(20), code INT)""")
      cat.exec("CREATE TABLE vs0 USING vsrc TAGS ('beijing', 100)")
      cat.exec("CREATE TABLE vs1 USING vsrc TAGS ('shanghai', 200)")
      cat.exec(s"INSERT INTO vs0 VALUES ($T0, 1) (${T0 + H}, 2) " +
        s"(${T0 + 2 * H}, 3) vs1 VALUES (${T0 + 5 * H}, 10) " +
        s"(${T0 + 6 * H}, 11)")
      cat.exec("""CREATE STABLE vstb (ts TIMESTAMP, val INT)
        TAGS (local_tag VARCHAR(20), ref_city VARCHAR(20),
        ref_code INT) VIRTUAL 1""")
      cat.exec("CREATE VTABLE v0 (val FROM vs0.val) USING vstb " +
        "TAGS ('local0', ref_city FROM vs0.city, ref_code FROM vs1.code)")
      cat.exec("CREATE VTABLE v1 (val FROM vs1.val) USING vstb " +
        "TAGS ('local1', ref_city FROM vs1.city, ref_code FROM vs0.code)")
      // local literal -> dynamic ref
      cat.exec("ALTER VTABLE v0 SET TAG local_tag = vs0.city")
      // dynamic ref -> static literal
      cat.exec("ALTER VTABLE v1 SET TAG ref_city='static_city'")
      // the refs must see this source-side change on the next read
      cat.exec("ALTER TABLE vs0 SET TAG city='nanjing'")
      cat.sql("SELECT tbname, ts, val, local_tag, ref_city, ref_code " +
        "FROM vstb ORDER BY tbname, ts")
    },
    // VTABLE SERIES pipeline (sql.y:3268-3281 series_decl; reference
    // test/cases/05-VirtualTables/06-Meta/02-Series): a SERIES clause
    // names a remote external-source measurement with tag filters;
    // columns reference it like a table. The remote transport is a
    // registered frame under the full source path (the reference needs
    // a live InfluxDB here — the binding IS the federation seam), so
    // the whole text surface (CREATE + ALTER ADD/REMOVE SERIES +
    // filtered read) proves out on deterministic data
    "ddl_vtable_series_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("""CREATE EXTERNAL SOURCE ssrc TYPE='influxdb'
        HOST='ih' PORT=8086 USER='u' PASSWORD='p' DATABASE=mdb
        OPTIONS('protocol'='flight_sql')""")
      val m = Tables(s, dir, "events").filter(col("user_id") <= 2)
        .select(col("ts"), col("event_id").as("eid"),
          col("value").as("cpu"), (col("value") * 2).as("mem"),
          when(col("user_id") === 1, "srv01").otherwise("srv02")
            .as("host"),
          when(col("user_id") === 1, "us").otherwise("eu").as("region"))
      cat.register("ssrc.mdb.cpu_metrics", m)
      cat.exec("CREATE VTABLE vt_s (ts TIMESTAMP, " +
        "cpu DOUBLE FROM s1.cpu, mem DOUBLE FROM s1.mem, " +
        "eid BIGINT FROM s1.eid) " +
        "SERIES s1 AS ssrc.mdb.cpu_metrics (host='srv01', region='us')")
      // a second series registers and unregisters without touching
      // the read (column refs stay on s1)
      cat.exec("ALTER VTABLE vt_s ADD SERIES s2 AS " +
        "ssrc.mdb.cpu_metrics (host='srv02')")
      cat.exec("ALTER VTABLE vt_s REMOVE SERIES s2")
      cat.sql("SELECT ts, cpu, mem, eid FROM vt_s ORDER BY eid")
    },
    // ins_vstable_inherits (systable.h:93 vstableInheritsSchema): one
    // row per BASE ON inheritance edge, with the catalog's
    // deterministic logical uids/create clock
    "ins_vstable_inherits" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE STABLE base1 (ts TIMESTAMP, a INT) TAGS (t1 INT)")
      cat.exec("CREATE STABLE base2 (ts TIMESTAMP, b INT) TAGS (t2 INT)")
      cat.exec("CREATE STABLE derived (ts TIMESTAMP, c INT) " +
        "TAGS (t3 INT) BASE ON base1, base2")
      cat.sql("SELECT * FROM information_schema.ins_vstable_inherits " +
        "ORDER BY parent_stable_name")
    },
    // CREATE [AGGREGATE] FUNCTION text (sql.y:1589; taosudf.h runtime
    // contract through UdfRegistry): a scalar UDF in WHERE and a
    // partial/merge UDAF in the aggregate list, both bound by DDL and
    // resolved by name inside dialect expressions
    "ddl_udf_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE FUNCTION gcd64 AS 'graft.udf.Gcd64' " +
        "OUTPUTTYPE BIGINT")
      cat.exec("CREATE AGGREGATE FUNCTION bitor64 AS " +
        "'graft.udf.BitOr64' OUTPUTTYPE BIGINT BUFSIZE 8")
      cat.sql("SELECT user_id, bitor64(event_id) AS bits, " +
        "count(*) AS n FROM events WHERE gcd64(event_id, 6) = 6 " +
        "GROUP BY user_id ORDER BY user_id")
    },
    // USER-SUPPLIED UDF bodies (udfd.c / taospyudf.cpp analog: the
    // reference compiles a user script out-of-process; here the AS
    // clause IS the user's body — a SQL expression over args a0..aN,
    // compiled once at CREATE FUNCTION into a codegen-friendly
    // expression template). A scalar body runs in WHERE and inside
    // sum(); an AGGREGATE body (decimal-exact rms) runs in agg
    // position — both resolved by name through the dialect
    "ddl_udf_user_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE FUNCTION absdiff AS " +
        "'CASE WHEN a0 > a1 THEN a0 - a1 ELSE a1 - a0 END' " +
        "OUTPUTTYPE BIGINT LANGUAGE 'sql'")
      cat.exec("CREATE AGGREGATE FUNCTION rms AS " +
        "'sqrt(cast(cast(sum(cast(a0 * a0 as decimal(18,4))) " +
        "as decimal(18,4)) as double))' " +
        "OUTPUTTYPE DOUBLE BUFSIZE 8 LANGUAGE 'sql'")
      cat.sql("SELECT user_id, round(rms(value), 6) AS rms_v, " +
        "cast(sum(absdiff(event_id, user_id)) as bigint) AS sd, " +
        "count(*) AS n " +
        "FROM events WHERE absdiff(user_id, 5) <= 3 " +
        "GROUP BY user_id ORDER BY user_id")
    },
    // the reference's published sample UDF library (docs/examples/udf/
    // l2norm.c aggregate, bit_and.c scalar) bound through the same
    // CREATE FUNCTION DDL, plus server_status() (system-info family)
    "ddl_udf_sample_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE AGGREGATE FUNCTION l2norm AS " +
        "'graft.udf.L2Norm' OUTPUTTYPE DOUBLE BUFSIZE 8")
      cat.exec("CREATE FUNCTION bit_and AS 'graft.udf.BitAnd64' " +
        "OUTPUTTYPE BIGINT")
      cat.sql("SELECT user_id, round(l2norm(value), 4) AS l2, " +
        "count(*) AS n, server_status() AS alive FROM events " +
        "WHERE bit_and(event_id, 1) = 1 " +
        "GROUP BY user_id ORDER BY user_id")
    },
    // new-stream calc text (sql.y:1623, 18-StreamProcessing): trigger
    // window + FROM trigger table + %%trows calc with placeholder
    // spellings (%%1, _twrownum), STREAM_OPTIONS and OUTPUT_SUBTABLE
    // in the INTO segment
    "ddl_stream_trows_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("""CREATE STREAM trows_s INTERVAL(1d) SLIDING(1d)
        FROM events PARTITION BY user_id
        STREAM_OPTIONS(MAX_DELAY(3s) | IGNORE_DISORDER)
        INTO trows_out OUTPUT_SUBTABLE(CONCAT('u_', user_id))
        AS SELECT _twstart AS ws, %%1 AS uid, count(*) AS n,
          _twrownum AS rn, sum(value) AS sv
        FROM %%trows WHERE value > 20""")
      cat.fillHistory("trows_s")
      cat.table("trows_out").orderBy(col("uid"), col("ws"))
    },
    // admin SHOW surfaces (sql.y:1336-1430): compacts log, table-kind
    // filters with LIKE, cluster alive/machines, vgroups, node lists,
    // transactions, license grants — each surface's row count (or
    // status value) pinned
    "ddl_show_misc_gate" -> { (s, dir) =>
      import s.implicits._
      val cat = demo(s, dir)
      cat.exec("COMPACT DATABASE graftdb")
      cat.exec("COMPACT DATABASE graftdb")
      Seq(
        ("alive", cat.sql("SHOW CLUSTER ALIVE").head.getInt(0).toLong),
        ("child_tables",
          cat.sql("SHOW CHILD TABLES LIKE 'nat_1%'").count()),
        ("compact_2", cat.sql("SHOW COMPACT 2").count()),
        ("compacts", cat.sql("SHOW COMPACTS").count()),
        ("grants", cat.sql("SHOW GRANTS").count()),
        ("machines", cat.sql("SHOW CLUSTER MACHINES").count()),
        ("mnodes", cat.sql("SHOW MNODES").count()),
        ("normal_tables", cat.sql("SHOW NORMAL TABLES").count()),
        ("qnodes", cat.sql("SHOW QNODES").count()),
        ("transactions", cat.sql("SHOW TRANSACTIONS").count()),
        ("vgroups", cat.sql("SHOW VGROUPS").count()))
        .toDF("surface", "n").orderBy("surface")
    },
    // SHOW [db.]DISK_INFO / ins_disk_usage (sql.y:1429, systable.c:695
    // diskUsageSchema) + xnode attribute patches and the two-arg
    // double-quoted ALTER LOCAL form — the disk sizes are the
    // catalog's deterministic logical estimates
    "ddl_disk_info_gate" -> { (s, dir) =>
      import s.implicits._
      val cat = demo(s, dir)
      cat.exec("ALTER LOCAL \"multiResultFunctionStarReturnTags\" \"0\"")
      cat.exec("ALTER XNODE JOB 1 SET status 'running'")
      cat.exec("ALTER XNODE TASK \"1\" WITH batch 2048 AND timeout 30" +
        " labels '1'")
      val du = cat.sql("SHOW graftdb.DISK_INFO")
        .select($"db_name", $"vgroup_id".cast("long").as("vgroup_id"),
          $"wal_size", $"data1", $"cache_rdb", $"table_meta",
          $"raw_data")
      val viaIns = cat.sql(
        "SELECT count(*) AS n FROM information_schema.ins_disk_usage")
        .head.getLong(0)
      val stablesInDb = cat.sql("SHOW graftdb.STABLES").count()
      du.withColumn("ins_rows", lit(viaIns))
        .withColumn("stables_in_db", lit(stablesInDb))
        .orderBy("db_name")
    },
    // cluster-admin text surface (sql.y:368-613 tokens/roles, :845-905
    // node/vgroup admin, :1338-1339 mounts): management verbs mutate
    // the catalog's observable registries, read back through one
    // union of the SHOW surfaces — Spark owns the actual process
    // placement, the text/listing contract is what the gate pins
    "ddl_admin_ops_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE TOKEN tk1 FROM USER root PROVIDER 'oauth' TTL 30")
      cat.exec("ALTER TOKEN tk1 ENABLE 0 EXTRA_INFO 'ci'")
      cat.exec("CREATE MOUNT m1 ON DNODE 1 FROM '/data/backup'")
      cat.exec("CREATE QNODE ON DNODE 1")
      cat.exec("CREATE SNODE ON DNODE 1")
      cat.exec("CREATE XNODE 'xh:7000'")
      cat.exec("STOP XNODE 1")
      cat.exec("CREATE DNODE 'h2:6030'")
      cat.exec("BEGIN")
      cat.exec("KILL QUERY 'q-1'")
      cat.exec("COMMIT")
      cat.exec("BALANCE VGROUP LEADER DATABASE graftdb")
      cat.exec("SCAN DATABASE graftdb")
      val toks = cat.sql("SHOW TOKENS").select(lit("token").as("kind"),
        col("name"),
        concat_ws("|", col("user"), col("provider"), col("enable"),
          col("extra_info")).as("detail"))
      val mounts = cat.sql("SHOW MOUNTS").select(lit("mount").as("kind"),
        col("mount_name").as("name"),
        concat_ws("|", col("dnode_id"), col("path")).as("detail"))
      val qn = cat.sql("SHOW QNODES").select(lit("qnode").as("kind"),
        col("id").cast("string").as("name"), col("endpoint").as("detail"))
      val xn = cat.sql("SHOW XNODES").select(lit("xnode").as("kind"),
        col("id").cast("string").as("name"),
        concat_ws("|", col("url"), col("status")).as("detail"))
      val dn = cat.sql("SHOW DNODES").select(lit("dnode").as("kind"),
        col("id").cast("string").as("name"), col("endpoint").as("detail"))
        .filter(col("name") === "2")
      val sc = cat.sql("SHOW SCANS").select(lit("scan").as("kind"),
        col("scan_id").cast("string").as("name"),
        col("db_name").as("detail"))
      toks.unionByName(mounts).unionByName(qn).unionByName(xn)
        .unionByName(dn).unionByName(sc).orderBy("kind", "name")
    },
    // second admin SHOW sweep (sql.y:1350-1427): view listing +
    // SHOW CREATE VIEW round-trip, privilege listings, TMQ
    // introspection, deployment surfaces (vnodes/arbgroups/mounts/
    // encryption), LICENCES alias
    "ddl_show_misc2_gate" -> { (s, dir) =>
      import s.implicits._
      val cat = demo(s, dir)
      cat.exec("CREATE VIEW busy_days AS SELECT _wstart AS d, " +
        "count(*) AS n FROM events INTERVAL(1d)")
      cat.exec("CREATE VIEW quiet AS SELECT 1 AS one FROM events")
      cat.exec("GRANT READ ON graftdb.events TO root")
      // the rendered CREATE VIEW text must re-execute losslessly
      val ddlTxt = cat.sql("SHOW CREATE VIEW busy_days")
        .head.getString(1)
      cat.exec("DROP VIEW busy_days")
      cat.exec(ddlTxt)
      Seq(
        ("arbgroups", cat.sql("SHOW ARBGROUPS").count()),
        ("consumers", cat.sql("SHOW CONSUMERS").count()),
        ("encrypt_status", cat.sql("SHOW ENCRYPT_STATUS").count()),
        ("licences", cat.sql("SHOW LICENCES").count()),
        ("mounts", cat.sql("SHOW MOUNTS").count()),
        ("scores", cat.sql("SHOW SCORES").count()),
        ("subscriptions", cat.sql("SHOW SUBSCRIPTIONS").count()),
        ("user_privileges", cat.sql("SHOW USER PRIVILEGES").count()),
        ("views", cat.sql("SHOW VIEWS").count()),
        ("views_like", cat.sql("SHOW VIEWS LIKE 'busy%'").count()),
        ("view_rows", cat.sql("SELECT * FROM busy_days").count()),
        ("vnodes", cat.sql("SHOW VNODES").count()))
        .toDF("surface", "n").orderBy("surface")
    },
    // user / role / privilege DDL (sql.y:359-419) + the
    // ins_user_privileges introspection rows (systable.c:507)
    "ddl_user_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE USER analyst PASS 'an4lyst' SYSINFO 0")
      cat.exec("CREATE USER etl PASS 'p1pe' CREATEDB 1")
      cat.exec("ALTER USER analyst ENABLE 0")
      cat.exec("CREATE ROLE readers")
      cat.exec("GRANT ROLE readers TO analyst")
      cat.exec("GRANT READ ON graftdb.events TO analyst")
      cat.exec("GRANT READ, WRITE ON graftdb.* TO etl")
      cat.exec(
        "GRANT SUBSCRIBE ON graftdb.events WITH user_id > 100 TO analyst")
      cat.exec("GRANT CREATE TABLE, DROP TABLE TO etl")
      cat.exec("REVOKE WRITE ON graftdb.* FROM etl")
      // column-subset privilege + quoted WITH + built-in-role grantee
      cat.exec("GRANT SELECT(c3, c4) ON graftdb.st1 TO analyst")
      cat.exec(
        "GRANT READ ON graftdb.nat WITH 'n_regionkey in (1,2)' TO SYSDBA")
      // a dropped user's grants go with it — no temp rows survive
      cat.exec("CREATE USER temp PASS 'x'")
      cat.exec("GRANT ALL ON *.* TO temp")
      cat.exec("DROP USER temp")
      cat.sql("SELECT user_name, priv_type, priv_scope, db_name, " +
        "table_name, condition, columns " +
        "FROM information_schema.ins_user_privileges " +
        "ORDER BY user_name, priv_type, db_name, table_name")
    },
    // CREATE ANODE text + SHOW ANODES FULL / ins_anodes_full through
    // the dialect FROM (sql.y:689-692, systable.h:32-33)
    "ins_anodes_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE ANODE 'http://anode1:6090'")
      cat.exec("CREATE ANODE 'http://anode2:6090'")
      cat.exec("DROP ANODE 2")
      cat.sql("SELECT id, type, algo " +
        "FROM information_schema.ins_anodes_full ORDER BY id, type")
    },
    // SHOW FUNCTIONS / ins_functions through the dialect FROM
    "ins_functions_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE FUNCTION gcd64 AS 'graft.udf.Gcd64' " +
        "OUTPUTTYPE BIGINT")
      cat.exec("CREATE AGGREGATE FUNCTION bitor64 AS " +
        "'graft.udf.BitOr64' OUTPUTTYPE BIGINT BUFSIZE 8")
      cat.sql("SELECT name, func_type, impl, output_type, bufsize " +
        "FROM information_schema.ins_functions ORDER BY name")
    },
    // CREATE STREAM text → LIVE trigger (not just FILL_HISTORY): the
    // saved definition wired onto a MemoryStream replay; the fired
    // append-mode windows must hash-match the batch aggregate — the
    // end-to-end loop the reference's 18-StreamProcessing cases run
    "ddl_stream_live_gate" -> { (s, dir) =>
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      val cat = demo(s, dir)
      // Bounded harness feed: the replay driver-collects by construction
      // (MemoryStream is driver-side), so cap the slice — event_id is
      // dense, so `< 10000` keeps the feed ~5k rows at EVERY scale
      // factor instead of growing with the table (the oracle applies
      // the same bound).
      val rows = Tables(s, dir, "events")
        .filter(col("event_id") % 2 === 0 && col("event_id") < 10000)
        .select(col("ts"), col("value")).orderBy(col("ts")).collect()
        .map { r =>
          val us = r.getLong(0)
          val t = new java.sql.Timestamp(
            math.floorDiv(us, 1000000L) * 1000L)
          t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
          (t, r.getDouble(1))
        }
      val mem = MemoryStream[(java.sql.Timestamp, Double)]
      val src = mem.toDF().toDF("ts", "value")
        .withColumn("value", col("value")
          .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
      val out = cat.streamTrigger("hourly", src)
      val sink = "ddl_stream_live_" + liveRuns.incrementAndGet()
      val prev = s.conf.get("spark.sql.shuffle.partitions")
      // same replay pin (and SPARK_GRAFT_REPLAY_PARTS override) as the
      // Sources stream gates: the cost profile is state-store
      // open/commit per shuffle partition per micro-batch. 4 won the
      // r22 quiet A/B over 8/2/1 on every replay gate (~2x vs 8).
      s.conf.set("spark.sql.shuffle.partitions",
        graft.streaming.Streams.replayParts(4).toString)
      try {
        val q = out.writeStream.format("memory").queryName(sink)
          .outputMode("append").start()
        try {
          rows.grouped(math.max(1, rows.length / 2 + 1)).foreach { ch =>
            mem.addData(ch.toIndexedSeq)
            q.processAllAvailable()
          }
          // far-future sentinel closes every real window; its own
          // window never fires (nothing later advances the watermark)
          val maxTs = rows.last._1.getTime
          mem.addData((new java.sql.Timestamp(
            maxTs + 365L * 86400000L), 0.0))
          q.processAllAvailable()
        } finally q.stop()
      } finally s.conf.set("spark.sql.shuffle.partitions", prev)
      s.table(sink)
        .select((unix_micros(col("_twstart")) / 1000L).cast("long")
            .as("_twstart_ms"),
          col("n"), col("sum_value").cast("double").as("sum_value"))
        .orderBy(col("_twstart_ms"))
    },
    // information_schema over the DDL-built catalog
    "ins_stables_gate" -> { (s, dir) =>
      demo(s, dir).insStables.orderBy("stable_name")
    },
    "ins_tags_gate" -> { (s, dir) =>
      demo(s, dir).insTags.orderBy("table_name", "tag_name")
    },
    "ins_databases_gate" -> { (s, dir) =>
      demo(s, dir).insDatabases.orderBy("db_name")
    },
    // information_schema served through the dialect text path
    "ins_columns_gate" -> { (s, dir) =>
      demo(s, dir).sql("SELECT table_name, col_name, ordinal, col_type, " +
        "col_kind FROM information_schema.ins_columns " +
        "ORDER BY table_name, ordinal")
    },
    "ins_streams_gate" -> { (s, dir) =>
      demo(s, dir).sql("SELECT stream_name, target_table " +
        "FROM information_schema.ins_streams ORDER BY stream_name")
    },
    "ins_topics_gate" -> { (s, dir) =>
      val cat = demo(s, dir)
      cat.exec("CREATE TOPIC ev_topic AS SELECT ts, v FROM nat")
      cat.sql("SELECT topic_name, db_name, subject " +
        "FROM information_schema.ins_topics ORDER BY topic_name")
    })

  def oracleSql: Map[String, String] = Map(
    "ddl_alter_gate" ->
      s"""SELECT * FROM (
            SELECT 'nat_' || n_nationkey AS tbname, n_name,
              CASE WHEN n_nationkey = 0 THEN 7 END AS grp,
              $T0 + n_nationkey * $H AS ts, n_nationkey * 1.5 AS v,
              CAST(NULL AS DOUBLE) AS v2
            FROM nation
            UNION ALL
            SELECT 'nat_' || n_nationkey, n_name,
              CASE WHEN n_nationkey = 0 THEN 7 END,
              $T0 + n_nationkey * $H + 1800000000,
              n_nationkey * 2.5, n_nationkey * 0.5
            FROM nation)
          ORDER BY ts""",
    "ddl_delete_gate" ->
      s"""SELECT 'nat_' || n_nationkey AS tbname,
            $T0 + n_nationkey * $H AS ts, n_nationkey * 1.5 AS v
          FROM nation WHERE n_nationkey < 12 AND n_nationkey <> 3
          ORDER BY ts""",
    "ddl_export_gate" ->
      s"""SELECT 'nat_' || n_nationkey AS tbname,
            $T0 + n_nationkey * $H AS ts, n_nationkey * 1.5 AS v
          FROM nation ORDER BY ts""",
    "ddl_describe_gate" ->
      """SELECT * FROM (VALUES
           ('n_name', 'VARCHAR', 32, 'TAG'),
           ('n_regionkey', 'INT', 4, 'TAG'),
           ('ts', 'TIMESTAMP', 8, ''),
           ('v', 'DOUBLE', 8, ''))
         AS t(field, type, length, note) ORDER BY field""",
    "ddl_view_gate" ->
      // v is a DOUBLE column in the engine's nat table, so the oracle
      // computes in DOUBLE end-to-end: same result type as Spark and
      // no int128-backed DECIMAL(38,1) sum in the output schema (the
      // driver-side conversion channel that kept scalar_decimal red)
      """SELECT n_regionkey, count(*) AS n, sum(v) AS sum_v FROM (
           SELECT n_regionkey,
                  n_nationkey * CAST(1.5 AS DOUBLE) AS v FROM nation)
         WHERE v > 10 GROUP BY n_regionkey ORDER BY n_regionkey""",
    "ddl_topic_gate" ->
      """SELECT * FROM (VALUES
           ('db_topic', 'graftdb', 'DATABASE graftdb'),
           ('nat_topic', 'graftdb', 'SELECT ts, v FROM nat'))
         AS t(topic_name, db_name, subject) ORDER BY topic_name""",
    "ddl_show_scoped_gate" ->
      """SELECT 'sc_meters' AS stable_name, 'scdb' AS db_name,
           2 AS child_tables, CAST(0 AS BIGINT) AS n_xnodes""",
    "ddl_ext_source_gate" ->
      """SELECT * FROM (VALUES
           ('srci', 'influxdb', 'ih', 8086, 'admin', '********',
            'metrics', 'autogen',
            'api_token=********,protocol=flight_sql'),
           ('srcm', 'mysql', 'mh2', 3306, 'u1', '********', 'd1',
            CAST(NULL AS VARCHAR),
            'access_key=********,ssl_mode=required'))
         AS t(source_name, type, host, port, user, password,
           database, schema, options)
         ORDER BY source_name""",
    "ddl_roundtrip_gate" ->
      s"""SELECT 'nat_' || n_nationkey AS tbname, n_name, n_regionkey,
            $T0 + n_nationkey * $H AS ts, n_nationkey * 1.5 AS v
          FROM nation ORDER BY ts""",
    "ddl_tag_agg_gate" ->
      """SELECT min(n_name) AS n_name, CAST(count(*) AS BIGINT) AS n,
           CAST(CAST(sum(n_nationkey) AS BIGINT) AS DOUBLE) * 1.5 AS sv
         FROM nation WHERE n_regionkey = 2 ORDER BY n_name""",
    "ddl_tag_expr_agg_gate" ->
      """SELECT min(n_name) || '!' AS nx, CAST(count(*) AS BIGINT) AS n
         FROM nation WHERE n_regionkey = 2 ORDER BY nx""",
    "ddl_always_return_gate" ->
      """SELECT * FROM (VALUES
           ('arct1', CAST(2 AS BIGINT), CAST(11 AS DOUBLE)),
           ('arct2', CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)),
           ('arct3', CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)))
           t(tbname, n, s)
         ORDER BY tbname""",
    "insert_autocreate_gate" ->
      s"""SELECT 'cm_' || c_custkey AS tbname, c_mktsegment AS seg,
            $T0 + c_custkey * $H AS ts, c_acctbal + 1000 AS bal,
            CAST(NULL AS VARCHAR) AS note
          FROM customer WHERE c_custkey <= 40 ORDER BY ts""",
    // the stream's FILL_HISTORY output must equal the batch aggregate
    "ddl_stream_gate" -> Dialect.oracleSql("dialect_interval"),
    // hourly windows inside the recalc range re-aggregate the corrected
    // (+10) values; windows outside keep the original backfill
    "ddl_recalc_gate" ->
      s"""WITH b AS (SELECT
             epoch_us(ts) - epoch_us(ts) % 3600000000 AS _wstart,
             CASE WHEN epoch_us(ts) >= ${T0 + 48 * H}
                   AND epoch_us(ts) < ${T0 + 96 * H}
                  THEN value + 10 ELSE value END AS v
           FROM events)
         SELECT _wstart, count(*) AS n,
           CAST(CAST(sum(CAST(v AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         FROM b GROUP BY _wstart ORDER BY _wstart""",
    // the FILE-loaded catalog state is fully determined by the CSV
    // text the gate writes — pin it as literal rows
    "ddl_file_load_gate" ->
      s"""SELECT * FROM (VALUES
           ('m1', 'SF', CAST(NULL AS INT), CAST($T0 AS BIGINT),
             1.5, 'a'),
           ('m1', 'SF', CAST(NULL AS INT), CAST(${T0 + H} AS BIGINT),
             2.5, 'b'),
           ('m2', 'LA', CAST(NULL AS INT), CAST(${T0 + 2 * H} AS BIGINT),
             3.5, CAST(NULL AS VARCHAR)),
           ('m3', 'NY', 7, CAST(${T0 + 3 * H} AS BIGINT),
             4.5, CAST(NULL AS VARCHAR)))
         t(tbname, loc, gid, ts, v, note) ORDER BY ts""",
    // rollup-served daily aggregate == direct base-table aggregate
    "ddl_tsma_gate" -> TimeSeries.oracleSql("tsma_rollup_served"),
    // the RSMA-served daily aggregate must equal the direct daily
    // aggregate, AND the router must have read the 1d level
    "ddl_rsma_gate" ->
      """SELECT user_id,
           (epoch_us(ts) - epoch_us(ts) % 86400000000) // 1000
             AS _wstart_ms,
           count(value) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_v,
           min(value) AS min_v, max(value) AS max_v,
           round(CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE)
             / count(value), 6) AS avg_v,
           CAST(86400000000 AS BIGINT) AS served_grain
         FROM events GROUP BY user_id, _wstart_ms
         ORDER BY user_id, _wstart_ms""",
    "ddl_vtable_gate" ->
      """SELECT epoch_us(ts) AS ts_us,
           max(CASE WHEN event_type = 'click' THEN value END) AS click_v,
           max(CASE WHEN event_type = 'view' THEN value END) AS view_v,
           max(CASE WHEN event_type = 'purchase' THEN value END)
             AS purchase_v
         FROM events
         WHERE user_id = 7
           AND event_type IN ('click', 'view', 'purchase')
         GROUP BY epoch_us(ts) ORDER BY ts_us""",
    "ddl_vtable_tag_gate" ->
      """SELECT * FROM (VALUES
           ('v0', CAST(1704067200000000 AS BIGINT), CAST(1 AS INT),
            'nanjing', 'nanjing', CAST(200 AS INT)),
           ('v0', 1704070800000000, 2, 'nanjing', 'nanjing', 200),
           ('v0', 1704074400000000, 3, 'nanjing', 'nanjing', 200),
           ('v1', 1704085200000000, 10, 'local1', 'static_city', 100),
           ('v1', 1704088800000000, 11, 'local1', 'static_city', 100))
         AS t(tbname, ts, val, local_tag, ref_city, ref_code)
         ORDER BY tbname, ts""",
    "ddl_disk_info_gate" ->
      """SELECT 'graftdb' AS db_name, CAST(3 AS BIGINT) AS vgroup_id,
           CAST(67584 AS BIGINT) AS wal_size,
           CAST(270336 AS BIGINT) AS data1,
           CAST(256 AS BIGINT) AS cache_rdb,
           CAST(8448 AS BIGINT) AS table_meta,
           CAST(540672 AS BIGINT) AS raw_data,
           CAST(2 AS BIGINT) AS ins_rows,
           CAST(2 AS BIGINT) AS stables_in_db""",
    "ddl_admin_ops_gate" ->
      """SELECT * FROM (VALUES
           ('dnode', '2', 'h2:6030'),
           ('mount', 'm1', '1|/data/backup'),
           ('qnode', '1', 'localhost:6030'),
           ('scan', '1', 'graftdb'),
           ('token', 'tk1', 'root|oauth|0|ci'),
           ('xnode', '1', 'xh:7000|stopped'))
         AS t(kind, name, detail) ORDER BY kind, name""",
    "ddl_vtable_series_gate" ->
      """SELECT epoch_us(ts) AS ts, value AS cpu, value * 2 AS mem,
           event_id AS eid
         FROM events WHERE user_id = 1 ORDER BY eid""",
    "ins_vstable_inherits" ->
      """SELECT * FROM (VALUES
           ('graftdb', 'base1', CAST(7700000000003 AS BIGINT),
            'derived', CAST(7700000000005 AS BIGINT),
            CAST(1700000005000 AS BIGINT)),
           ('graftdb', 'base2', CAST(7700000000004 AS BIGINT),
            'derived', CAST(7700000000005 AS BIGINT),
            CAST(1700000005000 AS BIGINT)))
         AS t(db_name, parent_stable_name, parent_uid,
           child_stable_name, child_uid, create_time)
         ORDER BY parent_stable_name""",
    "ddl_udf_gate" ->
      """SELECT user_id, bit_or(event_id) AS bits, count(*) AS n
         FROM events WHERE gcd(event_id, 6) = 6
         GROUP BY user_id ORDER BY user_id""",
    "ddl_udf_user_gate" ->
      """SELECT user_id,
           round(sqrt(CAST(CAST(sum(CAST(value * value AS DECIMAL(18,4)))
             AS DECIMAL(18,4)) AS DOUBLE)), 6) AS rms_v,
           CAST(sum(CASE WHEN event_id > user_id THEN event_id - user_id
             ELSE user_id - event_id END) AS BIGINT) AS sd,
           count(*) AS n
         FROM events
         WHERE (CASE WHEN user_id > 5 THEN user_id - 5
           ELSE 5 - user_id END) <= 3
         GROUP BY user_id ORDER BY user_id""",
    "ddl_udf_sample_gate" ->
      """SELECT user_id, round(sqrt(sum(value * value)), 4) AS l2, count(*) AS n,
           CAST(1 AS INT) AS alive
         FROM events WHERE (event_id & 1) = 1
         GROUP BY user_id ORDER BY user_id""",
    "ddl_stream_trows_gate" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 86400000000) AS ws,
           user_id AS uid, count(*) AS n, count(*) AS rn,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sv
         FROM events WHERE value > 20
         GROUP BY 1, 2 ORDER BY uid, ws""",
    "ddl_show_misc_gate" ->
      """SELECT * FROM (VALUES
           ('alive', CAST(1 AS BIGINT)), ('child_tables', 11),
           ('compact_2', 1), ('compacts', 2), ('grants', 1),
           ('machines', 1), ('mnodes', 1), ('normal_tables', 0),
           ('qnodes', 0), ('transactions', 0), ('vgroups', 2))
         AS t(surface, n) ORDER BY surface""",
    "ddl_show_misc2_gate" ->
      """SELECT * FROM (VALUES
           ('arbgroups', CAST(0 AS BIGINT)), ('consumers', 0),
           ('encrypt_status', 1), ('licences', 1), ('mounts', 0),
           ('scores', 0), ('subscriptions', 0), ('user_privileges', 1),
           ('view_rows', (SELECT count(DISTINCT date_trunc('day', ts))
              FROM events)),
           ('views', 2), ('views_like', 1), ('vnodes', 2))
         AS t(surface, n) ORDER BY surface""",
    "ddl_user_gate" ->
      """SELECT * FROM (VALUES
           ('SYSDBA', 'read', 'table', 'graftdb', 'nat',
            'n_regionkey in (1,2)', ''),
           ('analyst', 'read', 'table', 'graftdb', 'events', '', ''),
           ('analyst', 'select', 'table', 'graftdb', 'st1', '',
            'c3,c4'),
           ('analyst', 'subscribe', 'table', 'graftdb', 'events',
            'user_id > 100', ''),
           ('etl', 'create table', 'all', '*', '*', '', ''),
           ('etl', 'drop table', 'all', '*', '*', '', ''),
           ('etl', 'read', 'db', 'graftdb', '*', '', ''))
         AS t(user_name, priv_type, priv_scope, db_name, table_name,
           condition, columns)
         ORDER BY user_name, priv_type, db_name, table_name""",
    "ins_anodes_gate" ->
      """SELECT * FROM (VALUES
           (1, 'anomaly-detection', 'zscore'),
           (1, 'forecast', 'linear,holtwinters,arima'),
           (1, 'imputation', 'linear'))
         AS t(id, type, algo) ORDER BY id, type""",
    "ins_functions_gate" ->
      """SELECT * FROM (VALUES
           ('bitor64', 'AGGREGATE', 'graft.udf.BitOr64', 'BIGINT', 8),
           ('gcd64', 'SCALAR', 'graft.udf.Gcd64', 'BIGINT', 0))
         AS t(name, func_type, impl, output_type, bufsize)
         ORDER BY name""",
    // live-triggered stream windows == the batch hourly aggregate of
    // the replayed slice (every real window closed by the sentinel)
    "ddl_stream_live_gate" ->
      """SELECT (epoch_us(ts) - epoch_us(ts) % 3600000000) // 1000
             AS _twstart_ms,
           count(*) AS n,
           CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS sum_value
         FROM events WHERE event_id % 2 = 0 AND event_id < 10000
         GROUP BY _twstart_ms ORDER BY _twstart_ms""",
    "ins_stables_gate" ->
      """SELECT * FROM (VALUES
           ('cm', 'graftdb', 3, 1, 41),
           ('nat', 'graftdb', 2, 2, 25))
         AS t(stable_name, db_name, columns, tags, child_tables)
         ORDER BY stable_name""",
    "ins_tags_gate" ->
      """SELECT * FROM (
           SELECT 'nat_' || n_nationkey AS table_name,
             'graftdb' AS db_name, 'nat' AS stable_name,
             'n_name' AS tag_name, 'VARCHAR(32)' AS tag_type,
             n_name AS tag_value
           FROM nation
           UNION ALL
           SELECT 'nat_' || n_nationkey, 'graftdb', 'nat', 'n_regionkey',
             'INT', CAST(n_regionkey AS VARCHAR)
           FROM nation
           UNION ALL
           SELECT 'cm_' || c_custkey, 'graftdb', 'cm', 'seg',
             'VARCHAR(16)', c_mktsegment
           FROM customer WHERE c_custkey <= 40)
         ORDER BY table_name, tag_name""",
    "ins_databases_gate" ->
      """SELECT * FROM (VALUES
           ('default', 'us', 0), ('graftdb', 'us', 66))
         AS t(db_name, precision, ntables)
         ORDER BY db_name""",
    "ins_streams_gate" ->
      """SELECT * FROM (VALUES ('hourly', 'hourly_out'))
         AS t(stream_name, target_table) ORDER BY stream_name""",
    "ins_topics_gate" ->
      """SELECT * FROM (VALUES
           ('ev_topic', 'graftdb', 'SELECT ts, v FROM nat'))
         AS t(topic_name, db_name, subject) ORDER BY topic_name""",
    "ins_columns_gate" ->
      """SELECT * FROM (VALUES
           ('cm', 'ts', 1, 'TIMESTAMP', 'column'),
           ('cm', 'bal', 2, 'DOUBLE', 'column'),
           ('cm', 'note', 3, 'VARCHAR(8)', 'column'),
           ('cm', 'seg', 4, 'VARCHAR(16)', 'tag'),
           ('nat', 'ts', 1, 'TIMESTAMP', 'column'),
           ('nat', 'v', 2, 'DOUBLE', 'column'),
           ('nat', 'n_name', 3, 'VARCHAR(32)', 'tag'),
           ('nat', 'n_regionkey', 4, 'INT', 'tag'))
         AS t(table_name, col_name, ordinal, col_type, col_kind)
         ORDER BY table_name, ordinal""")
}
