package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sql.GraftSql
/** Scratch parse-coverage probe (test scope, not shipped).
  *
  * No args: the historical hand-picked list. With a file arg: one
  * query per line (the reference-test corpus extract); every table
  * name resolves to `events`, so column-resolution failures are
  * expected noise — the signal is GraftSql-side parse/lowering
  * failures, tallied by exception class + message shape.
  */
object ProbeMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val events = Tables(spark, dir, "events")
    def resolve(n: String): DataFrame = events
    if (args.length == 2 && args(0) == "--catalog") {
      probeCatalog(spark, args(1)); return
    }
    if (args.nonEmpty) { probeFile(spark, resolve, args(0)); return }
    val qs = Seq(
      "select 16-6 from events",
      "select server_version()",
      "select 1+1 as s, database() as db",
      "select timezone()",
      "select count(*) as n, avg(2) as av",
      "select position('b' in 'abc') as p",
      "select _wstart, _wend, count(*), sum(value) from events count_window(4) having sum(value) > 57",
      "select ts from events where ts>='2024-1-1 8:1:40' and ts<='2024-1-2 8:1:40.500' order by ts limit 10",
      "select value / event_id from events where ts > now - 900d and ts < now limit 5",
      "select cast(value as bigint) from events order by event_id limit 5",
      "select count(*) from events interval(1n) sliding(15d)",
      "select avg(value) from events where event_type in ('click','view') group by user_id having avg(value) > 10 order by user_id",
      "select distinct event_type from events order by event_type",
      "select ts, value from events where (user_id = 1 or user_id = 2) and value between 10 and 20 order by ts limit 5",
      "select top(value, 3) from events group by event_type",
      "select first(*) from events",
      "select last(*) from events",
      "select count(*), event_type from events state_window(event_type) having count(*) > 2",
      "select _wstart, sum(value) from events session(ts, 10m) having sum(value) > 100",
      "select tbname, count(*) from events group by tbname",
      "select * from (select user_id, avg(value) as a from events group by user_id) where a > 20 order by user_id",
      "select avg(value), count(*) from events where value is not null and event_type like 'pur%'",
      "select user_id, case when value > 50 then 'hi' when value > 10 then 'mid' else 'lo' end as band from events order by event_id limit 5",
      "select concat(event_type, '-', cast(user_id as varchar(10))) from events limit 3",
      "select count(*) from events where substr(event_type,1,1)='p'",
      "select interp(value) from events where user_id=1 range('2024-01-01 00:00:00','2024-01-05 00:00:00') every(1d) fill(null)",
      "select percentile(value, 50, 90) from events where user_id = 1",
      "select stateduration(value, 'GT', 30, 1h) from events where user_id = 1 limit 5",
      "select abs(value), ceil(value), floor(value), round(value) from events limit 3",
      "select apercentile(value, 50, 'default') from events",
      "select apercentile(value, 50, 't-digest') from events",
      "select _rowts, value from events limit 3",
      "select ts, value from events order by ts asc nulls first limit 3",
      "select count(*) from events where ts between '2024-01-01' and '2024-01-15'",
      "select user_id, value from events order by value desc limit 3 offset 2"
    )
    var ok = 0
    qs.foreach { q =>
      try {
        GraftSql.query(spark, resolve, q).limit(3).collect()
        ok += 1
      } catch { case e: Throwable =>
        println(s"FAIL: $q\n  -> ${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(180)}")
      }
    }
    println(s"OK $ok/${qs.size}")
    spark.stop()
  }

  /** Optional per-statement receipts sink: every SIGNAL failure is
    * appended as `shape \t file \t statement \t message` to
    * $SPARK_GRAFT_PROBE_RECEIPTS — the statement VERBATIM as probed
    * plus its source file (streams mode), so context-dependent
    * failures can be re-run in their exact file sequence and each
    * shape adjudicated artifact-vs-bug from the receipt alone. */
  private val receiptsPath = sys.env.get("SPARK_GRAFT_PROBE_RECEIPTS")
  // separate sink for the missing-obj bucket (statements classified as
  // harness noise): lets a sampling audit bound what could hide there
  private val missReceiptsPath =
    sys.env.get("SPARK_GRAFT_PROBE_RECEIPTS_MISSING")
  private var curFile: String = "-"
  private def receiptTo(pOpt: Option[String], shape: String, q: String,
      msg: String): Unit =
    pOpt.foreach { p =>
      val line = Seq(shape, curFile, q, msg)
        .map(_.replaceAll("[\\t\\n\\r]", " "))
        .mkString("", "\t", "\n")
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
  private def receipt(shape: String, q: String, msg: String): Unit =
    receiptTo(receiptsPath, shape, q, msg)

  private def seededCatalog(spark: SparkSession): graft.sql.GraftCatalog = {
    val cat = new graft.sql.GraftCatalog(spark)
    // seed a plausible universe so object-named SHOWs have targets
    Seq(
      "CREATE DATABASE db1",
      "USE db1",
      // the documentation's demo schema — most corpus statements
      // assume it (INSERT INTO dX USING meters TAGS('loc', n)
      // VALUES(ts, current, voltage, phase))
      "CREATE STABLE meters (ts TIMESTAMP, current FLOAT, " +
        "voltage INT, phase FLOAT) " +
        "TAGS (location VARCHAR(64), groupid INT)",
      "CREATE TABLE d0 USING meters TAGS ('sj', 1)",
      "CREATE TABLE ntb (ts TIMESTAMP, v DOUBLE)"
    ).foreach(cat.sql)
    cat
  }

  /** SHOW/DESCRIBE statements against a seeded catalog: the signal is
    * parse-level failures, not missing-object errors. A `##FILE`
    * marker line (the extractor's --streams mode) RESETS the catalog —
    * each reference test file runs against fresh state, in its own
    * statement order, so creates precede the inserts/selects that
    * target them. */
  private def probeCatalog(spark: SparkSession, path: String): Unit = {
    var cat = seededCatalog(spark)
    val missing = Seq("not found", "no such", "unknown", "Unknown",
      "does not exist", "cannot be found", "Undefined", "no database",
      "missing", "already exists", "duplicate", "Duplicate",
      "DUPLICATED", "Invalid value", "out of range",
      // cross-test collisions and blanket-mapping noise, same spirit:
      // a second test's `create user u1` / `create snode on dnode 1`
      // collides with the first's; column resolution against the
      // probe's stand-in schema is noise, not a grammar gap; µs-db
      // precision guards ARE the intended behavior for the probe db
      "user exists", "already on dnode", "UNRESOLVED_COLUMN",
      "is finer than the table's precision",
      // dropping a node registration that does not exist is the same
      // missing-object class (the reference errors SNODE_NOT_EXIST)
      "no SNODE")
    val lines = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
      .getLines().toVector
    var ok = 0; var noisy = 0
    val byShape =
      scala.collection.mutable.Map.empty[String, (Int, String, String)]
    // the corpus is thousands of UNRELATED tests flattened into one
    // stream: test B's `create stable st0 (…5 tags)` collides with test
    // A's 3-tag st0, and B's child creates then fail arity — a harness
    // artifact, not a dialect gap. Model each test's intent by
    // replacing on redefinition: drop the colliding object and retry.
    val createRe =
      ("(?i)^\\s*create\\s+(database|stable|vstable|table|vtable|view)" +
        "\\s+(?:if\\s+not\\s+exists\\s+)?([A-Za-z_][\\w.]*|`[^`]+`)").r
    def run1(q: String): Unit =
      try cat.sql(q)
      catch {
        case e: Throwable
            if String.valueOf(e.getMessage).contains("already exists") =>
          createRe.findFirstMatchIn(q) match {
            case Some(m) =>
              // the colliding object's kind is ambiguous from the new
              // statement alone (CREATE TABLE + TAGS makes a STABLE);
              // sweep every kind — DROP STABLE cascades children so a
              // redefinition never leaves stale-typed child rows
              Seq("STABLE", "TABLE", "VTABLE", "VIEW", "DATABASE")
                .filter(k => k == m.group(1).toUpperCase ||
                  Set("TABLE", "STABLE", "VTABLE")(
                    m.group(1).toUpperCase) &&
                    Set("STABLE", "TABLE", "VTABLE")(k))
                .foreach { k =>
                  try cat.sql(s"DROP $k IF EXISTS ${m.group(2)}")
                  catch { case _: Throwable => () }
                }
              cat.sql(q)
            case None => throw e
          }
      }
    var files = 0
    lines.foreach { q =>
      if (q.startsWith("##FILE ")) {
        cat = seededCatalog(spark)
        curFile = q.stripPrefix("##FILE ").trim
        files += 1
      } else
      try { run1(q); ok += 1 }
      catch {
        case e: Throwable =>
          val m = String.valueOf(e.getMessage)
          // streams mode routes SELECTs through cat.sql too — the
          // column/function-resolution noise and documented intended
          // rejects classify exactly as in probeFile
          if (missing.exists(m.contains) || noise.exists(m.contains) ||
              intended.exists(m.contains)) {
            noisy += 1
            receiptTo(missReceiptsPath, "missing-obj", q, m.take(300))
          }
          else {
            val shape = e.getClass.getSimpleName + ": " + m
              .replaceAll("'[^']*'", "'_'").replaceAll("\\d+", "N")
              .replaceAll("`[^`]*`", "`_`").take(90)
            val (cnt, q0, _) = byShape.getOrElse(shape, (0, q, ""))
            byShape(shape) = (cnt + 1, q0, m.take(160))
            receipt(shape, q, m.take(300))
          }
      }
    }
    val stmtN = lines.size - files
    println(s"== probed $stmtN: ok=$ok missing-obj=$noisy " +
      s"signal-fail=${stmtN - ok - noisy}" +
      (if (files > 0) s" (streams: $files files)" else "") + " ==")
    byShape.toSeq.sortBy(-_._2._1).take(50).foreach {
      case (shape, (cnt, exq, msg)) =>
        println(f"$cnt%6d  $shape")
        println(s"        e.g. ${exq.take(140)}")
        println(s"        msg: $msg")
    }
    spark.stop()
  }

  /** Column-resolution / type noise from the blanket events mapping —
    * not dialect gaps. */
  private val noise = Seq(
    "UNRESOLVED_COLUMN", "UNRESOLVED_ROUTINE", "cannot resolve",
    "AMBIGUOUS_REFERENCE", "DATATYPE_MISMATCH", "WRONG_NUM_ARGS",
    "Column not found", "UNRESOLVED_STAR", "FIELD_NOT_FOUND",
    "NESTED_AGGREGATE_FUNCTION", "UNRESOLVED_MAP_KEY",
    "GROUP_BY_AGGREGATE", "MISSING_AGGREGATION", "UNBOUND_SQL",
    "INVALID_FORMAT", "SECONDS_PRECISION", "NON_FOLDABLE",
    "PARSE_SYNTAX_ERROR", "INVALID_ORDINAL",
    // blanket-events mapping artifacts: a self-join duplicates every
    // column so qualified-star expansion fails; `?` placeholders are
    // prepared-statement API tests, not SQL text
    "CANNOT_RESOLVE_STAR_EXPAND", "INVALID_IDENTIFIER",
    // lateral-alias fallback only engages when the referenced column
    // is MISSING from the blanket events mapping — on the test's real
    // table the name resolves against the child and never laterals
    "LATERAL_COLUMN_ALIAS_IN_AGGREGATE_FUNC",
    // extractor PLACEHOLDER values (ph_xxx identifiers) landing in
    // typed positions (TAGS(ph_tableindex) on an INT tag, VALUES(ph),
    // a whole column-def list collapsed to one `ph_col_defs` hole):
    // the original test passes real text there — placeholder noise,
    // not a grammar gap
    "For input string: \"ph",
    "bad column definition: ph",
    "cannot parse VTABLE column ref: ph",
    "unsupported column type: PH_",
    // `using 1 tags(…)` / `pk 1 primary key` / `sleep 1m` /
    // `offset ?`-style holes: the placeholder replaced a name, type,
    // or prepared-statement parameter the real test supplies
    "for ph_",
    "unsupported column type: 1",
    "bad duration: ph",
    "For input string: \"?\"")

  /** DOCUMENTED loud rejects (SURVEY §2.3) and probe-mapping
    * artifacts — failures here are the intended behavior, not gaps:
    * NULL-producing-side key refs reject by design; ASOF/ts-condition
    * shapes fail because the probe maps every table to `events`, whose
    * primary ts column is `ts`, while the test's real table names its
    * ts column differently (`time`, `w_ts`, …). */
  private val intended = Seq(
    "NULL-producing side",
    "needs one ts condition",
    // foreign-engine CREATEs in the corpus (`push_t (val INT, …)` —
    // MySQL/PG DDL in federated suites) now hit the reference's own
    // first-column rule (TSDB_CODE_PAR_INVALID_FIRST_COLUMN)
    "first column must be the TIMESTAMP",
    // the reference errors at insert on decimal overflow too; the
    // corpus hits this with placeholder values (`1` into
    // DECIMAL(18,18))
    "DECIMAL value overflow",
    // ns-duration statements (1b/1u on ns-precision reference tables)
    // land on the probe's µs events mapping — the precision guard is
    // the intended behavior for a µs table, not a dialect gap
    "is finer than the table's precision")

  private def probeFile(spark: SparkSession,
      resolve: String => DataFrame, path: String): Unit = {
    val lines = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
      .getLines().toVector
    var ok = 0; var noisy = 0; var intend = 0
    val byShape =
      scala.collection.mutable.Map.empty[String, (Int, String, String)]
    lines.foreach { q =>
      try {
        GraftSql.query(spark, resolve, q).queryExecution.analyzed
        ok += 1
      } catch {
        case e: Throwable =>
          val m = String.valueOf(e.getMessage)
          if (intended.exists(m.contains)) intend += 1
          else if (noise.exists(m.contains)) {
            noisy += 1
            if (lines.size < 50)
              println(s"NOISE: $q\n  -> ${m.take(200)}")
          }
          else {
            // shape = class + first 60 chars with numbers/quoted
            // strings blanked, so the tally groups recurring gaps
            val shape = e.getClass.getSimpleName + ": " + m
              .replaceAll("'[^']*'", "'_'").replaceAll("\\d+", "N")
              .replaceAll("`[^`]*`", "`_`").take(90)
            val (c, q0, _) =
              byShape.getOrElse(shape, (0, q, ""))
            byShape(shape) = (c + 1, q0, m.take(160))
            receipt(shape, q, m.take(300))
          }
      }
    }
    println(s"== probed ${lines.size}: ok=$ok noise=$noisy " +
      s"intended-reject=$intend " +
      s"signal-fail=${lines.size - ok - noisy - intend} ==")
    byShape.toSeq.sortBy(-_._2._1).take(60).foreach {
      case (shape, (c, exq, msg)) =>
        println(f"$c%6d  $shape")
        println(s"        e.g. ${exq.take(160)}")
        println(s"        msg: $msg")
    }
    spark.stop()
  }
}
