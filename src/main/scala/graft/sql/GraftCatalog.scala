package graft.sql

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TDengine DDL + INSERT text surface over an in-memory catalog
  * (SURVEY §2.1/§7.1 periphery; reference grammar: `CREATE STABLE …
  * TAGS(…)` sql.y:1066-1092, `CREATE TABLE … USING … TAGS(…)`
  * sql.y:1176-1177, `CREATE STREAM … INTO … AS …` sql.y:1623-1711,
  * `INSERT INTO d USING st TAGS(…) VALUES (…)` sql.y:1889-1891 +
  * parInsertSql.c).
  *
  * The catalog maps the reference's metadata model onto Spark:
  *
  *  - a STABLE is a schema (data columns, first column the ts primary
  *    key) plus a tag schema;
  *  - a child table binds tag VALUES; its rows carry an ingest
  *    sequence so duplicate-ts re-inserts resolve last-writer-wins
  *    (the reference's upsert, parInsertSql.c dedup) through
  *    [[graft.ops.SourceOps.upsertLatest]];
  *  - querying a child yields data columns + its tag columns +
  *    `tbname`; querying the STABLE unions all children — exactly the
  *    reference's super-table read path (tags denormalized onto rows);
  *  - CREATE STREAM registers the trigger/calc definition; its
  *    FILL_HISTORY run lowers the saved SELECT through [[GraftSql]],
  *    and [[streamTrigger]] wires the same definition onto a live
  *    Structured Streaming source via [[graft.streaming.Streams]].
  *
  * Scale note: VALUES-form INSERT is the reference's *client batch*
  * path — rows originate driver-side by construction, so building the
  * batch on the driver is the honest lowering, not a bottleneck. Bulk
  * ingest at 100 TB goes through INSERT…SELECT (parquet writer),
  * schemaless ingest, or streams — all distributed and gated
  * separately.
  */
class GraftCatalog(val spark: SparkSession) {

  /** `keepTicks` = the retention horizon (CREATE DATABASE … KEEP d),
    * None = keep forever; TRIM DATABASE enforces it. */
  case class Database(name: String, perSecond: Long,
      keepTicks: Option[Long] = None)
  /** `parents` = BASE ON inheritance edges (virtual-stable model,
    * sql.y:1069-1071 + ALTER ADD/DROP BASE ON sql.y:1124-1128);
    * `virtualN` = the VIRTUAL n table option; `uid`/`createSeq` are
    * deterministic logical ids (registration order) standing in for
    * the reference's wall-clock uid/createdTime — monotone like the
    * original, stable across runs so listings oracle-compare. */
  case class Stable(name: String, db: String,
      colDefs: Seq[(String, String)], tagDefs: Seq[(String, String)],
      parents: Seq[String] = Nil, virtualN: Int = 0,
      uid: Long = 0L, createSeq: Long = 0L) {
    val cols: StructType =
      StructType(colDefs.map { case (n, t) => StructField(n, sparkType(t)) })
    val tags: StructType =
      StructType(tagDefs.map { case (n, t) => StructField(n, sparkType(t)) })
    def tsCol: String = colDefs.head._1
  }
  case class StreamDef(name: String, options: String, into: String,
      select: String, status: String = "running",
      outputSubtable: Option[String] = None)
  case class TopicDef(name: String, db: String, subject: String)
  /** CREATE TSMA … FUNCTION(f(c),…) INTERVAL(d) (sql.y:1503-1507);
    * `baseTsma` set = the RECURSIVE form (sql.y:1506) — funcs/table
    * inherited, state folded from the base rollup. */
  case class TsmaDef(name: String, table: String,
      funcs: Seq[(String, String)], grainUs: Long, intervalTxt: String,
      baseTsma: Option[String] = None)
  /** CREATE RSMA … ON tbl FUNCTION(f(c),…) INTERVAL(d1, d2, …)
    * (sql.y:1480-1484; rollupoperator.c): multi-level retention
    * rollup — level k+1 folds level k's partial state. */
  case class RsmaDef(name: String, table: String,
      funcs: Seq[(String, String)], levels: Seq[Long],
      levelTxts: Seq[String])
  /** `SERIES id AS source.db.measurement (tag='v', …)` clause of
    * CREATE VTABLE (sql.y:3268-3281 series_decl; reference tests
    * 05-VirtualTables/06-Meta/02-Series): names a REMOTE external-
    * source series; vtable columns reference it like a table
    * (`cpu DOUBLE FROM s1.cpu`). The read path resolves the series
    * through a frame registered under the full source path — the
    * injectable-transport convention the federated surfaces use. */
  case class SeriesDecl(alias: String, path: String,
      filters: Seq[(String, String)])

  /** CREATE VTABLE … (ts TIMESTAMP, c t FROM tbl.col, …)
    * (sql.y:1074-1076; column_options FROM column_ref sql.y:3253). */
  case class VtableDef(name: String, tsCol: String,
      cols: Seq[(String, String, String, String)], // (name,type,srcTbl,srcCol)
      // set = virtual CHILD table (CREATE VTABLE … USING vstable TAGS
      // (…), sql.y:1077-1086 createCreateVSubTableStmt): schema comes
      // from the named virtual stable, tag values live in the shared
      // `children` registry (so ins_tags / ALTER VTABLE SET TAG reuse
      // the normal child-table paths)
      using: Option[String] = None,
      series: Seq[SeriesDecl] = Nil)
  /** CREATE [AGGREGATE] FUNCTION … AS '<impl>' OUTPUTTYPE t
    * (sql.y:1589; runtime taosudf.h via [[graft.functions.UdfRegistry]]). */
  case class UdfDef(name: String, impl: String, aggregate: Boolean,
      outputType: String, bufSize: Int)
  /** CREATE ANODE 'url' (sql.y:689-692; tanalytics.h anode service):
    * the catalog registers the endpoint and id; query-time binding is
    * [[graft.ops.ServiceDetector]] over an injectable transport. */
  case class AnodeDef(id: Int, url: String, status: String)

  private case class Child(name: String, stableName: String,
      tagVals: Seq[Any], rows: mutable.ArrayBuffer[(Seq[Any], Long)])

  /** Tag-ref marker inside a virtual child's `tagVals`: the tag
    * resolves DYNAMICALLY to the CURRENT tag value of another child
    * table (`CREATE VTABLE … TAGS (t FROM tbl.tag)` sql.y vtags
    * literal list; `ALTER VTABLE … SET TAG t = tbl.tag`
    * createAlterTableAlterTagRef — reference
    * test/cases/05-VirtualTables/01-DDL/02-Tag). Resolution happens at
    * read time, so an ALTER on the source child is reflected in the
    * virtual table's next query. */
  private case class TagRef(tbl: String, tag: String)

  /** Resolve a stored tag value: literals pass through, [[TagRef]]s
    * chase the source child's current value (chains allowed). */
  private def resolveTagVal(v: Any): Any = v match {
    case TagRef(tbl, tag) =>
      val src = children.getOrElse(tbl,
        throw new IllegalArgumentException(
          s"tag ref source table not found: $tbl"))
      val st = stables(src.stableName)
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(tag))
      require(i >= 0, s"tag ref source tag not found: $tbl.$tag")
      resolveTagVal(src.tagVals(i))
    case x => x
  }

  private val databases = mutable.LinkedHashMap[String, Database](
    "default" -> Database("default", 1000000L))
  private var currentDb = "default"
  private val stables = mutable.LinkedHashMap[String, Stable]()
  private val children = mutable.LinkedHashMap[String, Child]()
  private val external = mutable.LinkedHashMap[String, DataFrame]()
  private val materialized = mutable.LinkedHashMap[String, DataFrame]()
  private val streamDefs = mutable.LinkedHashMap[String, StreamDef]()
  private val topicDefs = mutable.LinkedHashMap[String, TopicDef]()
  private val viewDefs = mutable.LinkedHashMap[String, String]()
  private val tsmaDefs = mutable.LinkedHashMap[String, TsmaDef]()
  // rollup frames materialized lazily per (tsma, serving keys) — the
  // reference maintains its TSMA result table through an ingest-side
  // stream; the router shape (partial-state merge) is identical
  private val tsmaRollups = mutable.LinkedHashMap[String, DataFrame]()
  private val rsmaDefs = mutable.LinkedHashMap[String, RsmaDef]()
  // per (rsma, level, key-set); level k+1 builds FROM level k's frame
  private val rsmaRollups = mutable.LinkedHashMap[String, DataFrame]()
  private val vtableDefs = mutable.LinkedHashMap[String, VtableDef]()
  private val udfDefs = mutable.LinkedHashMap[String, UdfDef]()
  private val anodeDefs = mutable.LinkedHashMap[Int, AnodeDef]()
  // CREATE [SMA] INDEX (sql.y:1519-1523): (name, table, kind, detail);
  // an SMA index shares its name with the TsmaDef that serves it
  private val indexDefs =
    mutable.LinkedHashMap[String, (String, String, String)]()
  private var anodeSeq = 0
  private var seqCounter = 0L
  // logical stable uid/create clock (see [[Stable]] scaladoc)
  private var stableSeq = 0L
  private def nextStableIds(): (Long, Long) = {
    stableSeq += 1
    (7700000000000L + stableSeq, stableSeq)
  }
  // COMPACT DATABASE history for SHOW COMPACTS / SHOW COMPACT id
  private val compactLog = mutable.ArrayBuffer[(Int, String, String)]()
  private var compactSeq = 0
  // access tokens (sql.y:385-393; systable.c:744 tokenSchema)
  private case class TokenDef(name: String, user: String,
    var provider: String, var enable: Int, createSeq: Int,
    var ttlDays: Option[Int], var extraInfo: String)
  private val tokenDefs = mutable.LinkedHashMap[String, TokenDef]()
  private var tokenSeq = 0
  // mounts (sql.y:1338-1339; systable.c:707 mountSchema):
  // name -> (dnode, create_time, path)
  private val mountDefs =
    mutable.LinkedHashMap[String, (Int, Long, String)]()
  private var mountSeq = 0
  // node deployments per kind (CREATE/DROP {M,Q,S,B}NODE ON DNODE n):
  // the SHOW {M,Q,S,B}NODES listings read these
  private val nodeDeploy =
    mutable.LinkedHashMap[String, mutable.LinkedHashSet[Int]](
      "MNODE" -> mutable.LinkedHashSet(1),
      "QNODE" -> mutable.LinkedHashSet[Int](),
      "SNODE" -> mutable.LinkedHashSet[Int](),
      "BNODE" -> mutable.LinkedHashSet[Int]())
  // logical dnodes beyond the executor-derived row (CREATE DNODE
  // 'endpoint' / DROP DNODE n — placement is Spark's job, the
  // listing row is the observable contract)
  private val extraDnodes = mutable.LinkedHashMap[Int, String]()
  private var dnodeSeq = 1 // dnode 1 = the driver executor
  // xnode instances (CREATE XNODE 'url' / START/STOP/DRAIN/DROP)
  private val xnodeDefs = mutable.LinkedHashMap[Int, (String, String)]()
  private var xnodeSeq = 0
  // encryption state (CREATE/DROP ENCRYPT_ALGR, CREATE ENCRYPT_KEY)
  private val encryptAlgrs = mutable.LinkedHashSet[String]()
  private var encryptKeySet = false
  // LOCK/UNLOCK ROLE (sql.y:407-413 TSDB_ALTER_ROLE_LOCK)
  private val lockedRoles = mutable.LinkedHashSet[String]()
  // users with a TOTP secret (sql.y:397-402)
  private val totpUsers = mutable.LinkedHashSet[String]()
  // SCAN DATABASE history for SHOW SCANS / SHOW SCAN id (sql.y:885,
  // 1430-1431; systable.c:554 userScansSchema) — a scan only reads, so
  // the log row is the whole effect; start_time is the deterministic
  // create clock
  private val scanLog = mutable.ArrayBuffer[(Int, String, Long)]()
  private var scanSeq = 0
  // users / roles / privileges (sql.y:359-419, systable.c:507
  // userUserPrivilegesSchema). Authn itself is the platform's job
  // (Spark delegates to the cluster manager); the catalog keeps the
  // reference's DDL surface + introspection rows so GRANT/REVOKE
  // round-trip. Passwords are stored as an opaque SHA-256, never raw.
  private case class UserDef(name: String, var passHash: String,
    superUser: Int, var enable: Int, var sysinfo: Int, var createdb: Int)
  private val userDefs = mutable.LinkedHashMap[String, UserDef](
    "root" -> UserDef("root", shaHex("taosdata"), 1, 1, 1, 1))
  // built-in roles ship with the server (mndRole defaults)
  private val roleDefs =
    mutable.LinkedHashSet[String]("SYSDBA", "SYSSEC", "SYSAUDIT")
  // (grantee-user -> roles); GRANT ROLE r TO u
  private val userRoles = mutable.LinkedHashMap[String, mutable.LinkedHashSet[String]]()
  private case class PrivDef(user: String, privType: String,
    scope: String, db: String, table: String, condition: String,
    columns: String = "")
  private val privDefs = mutable.ArrayBuffer[PrivDef]()

  private def shaHex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Ticks/second of the current database (PRECISION 'ms'|'us'|'ns'). */
  def perSecond: Long = databases(currentDb).perSecond

  /** Register an externally-provided table (parquet-backed DataFrame)
    * so dialect queries and streams can reference it by name. */
  def register(name: String, df: DataFrame): Unit = external(name) = df

  def streams: Map[String, StreamDef] = streamDefs.toMap

  // ------------------------------------------------------------- types

  /** Column type text from a FEDERATED source → Spark type, applying
    * the per-engine aliases of extTypeMap.c: MySQL REAL is an 8-byte
    * double (extTypeMap.c:325 → TSDB_DATA_TYPE_DOUBLE), PostgreSQL
    * real is float4 (extTypeMap.c:646 → FLOAT). `sourceName` must be
    * a registered EXTERNAL SOURCE; its TYPE selects the dialect. */
  def externalColumnType(sourceName: String, t: String): DataType = {
    val src = extSourceDefs.getOrElse(sourceName.toLowerCase,
      throw new IllegalArgumentException(
        s"external source not found: ${sourceName.toLowerCase}"))
    sparkType(t, src.typ.toLowerCase)
  }

  /** TDengine column type text → Spark type (tdataformat.h type ids).
    * TIMESTAMP maps to the Long tick domain — precision is database
    * metadata, exactly as in the reference. `engine` carries the
    * source-engine dialect for federated passthrough spellings whose
    * width differs per engine (extTypeMap.c): "" = native DDL. */
  private def sparkType(t: String, engine: String = ""): DataType = {
    val u = t.trim.toUpperCase
    val dec = "DECIMAL\\s*\\((\\d+)\\s*,\\s*(\\d+)\\)".r
    u match {
      case x if x.startsWith("TIMESTAMP") => LongType
      case x if x.startsWith("BOOL") => BooleanType
      case x if x.startsWith("TINYINT UNSIGNED") ||
        x.startsWith("SMALLINT UNSIGNED") => IntegerType
      case x if x.startsWith("TINYINT") || x.startsWith("SMALLINT") =>
        IntegerType
      case x if x.startsWith("BIGINT") => LongType
      case x if x.startsWith("INT UNSIGNED") => LongType
      case x if x.startsWith("INT") => IntegerType
      case x if x.startsWith("FLOAT8") => DoubleType // PG alias
      case x if x.startsWith("FLOAT") => FloatType
      case x if x.startsWith("DOUBLE") => DoubleType
      case dec(p, s) => DecimalType(p.toInt, s.toInt)
      case x if x.startsWith("BINARY") || x.startsWith("VARCHAR") ||
        x.startsWith("NCHAR") || x.startsWith("JSON") ||
        x.startsWith("VARBINARY") || x.startsWith("GEOMETRY") ||
        // geometry SUBTYPE spellings from external-engine passthrough
        // DDL (PostGIS-style POINT/LINESTRING/POLYGON/MULTI*)
        x.startsWith("POINT") || x.startsWith("LINESTRING") ||
        x.startsWith("POLYGON") || x.startsWith("MULTI") => StringType
      // BLOB/MEDIUMBLOB (tdataformat.h blob ids; the dialect front end
      // already maps CAST … AS BLOB → binary)
      case x if x.startsWith("BLOB") || x.startsWith("MEDIUMBLOB") =>
        BinaryType
      // external-engine DDL passthrough spellings (the federated tests
      // issue MySQL/PG CREATEs through the same entry point): TEXT,
      // REAL, DATETIME/DATE map onto the native domains. FLOAT4/FLOAT8
      // are already matched by the FLOAT8/FLOAT cases above; REAL is
      // engine-dependent — MySQL's REAL is an 8-byte double
      // (extTypeMap.c:325), PostgreSQL's real is float4
      // (extTypeMap.c:646); PG width is the engine-less default.
      case x if x.startsWith("TEXT") => StringType
      case x if x.startsWith("REAL") =>
        if (engine == "mysql") DoubleType else FloatType
      case x if x.startsWith("DATETIME") || x.startsWith("DATE") =>
        LongType
      case other =>
        throw new IllegalArgumentException(s"unsupported column type: $other")
    }
  }

  // ---------------------------------------------------------- literals

  /** One SQL literal → value coerced to the target type. */
  private def literal(s0: String, dt: DataType): Any = {
    val s = s0.trim
    if (s.equalsIgnoreCase("NULL")) return null
    // backslash escapes inside literals ('a\'b' — the reference lexer
    // accepts both '' and \' spellings): one left-to-right scan so an
    // escaped backslash before a quote can't be misread
    def unescape(t: String, q: Char): String = {
      val b = new StringBuilder(t.length)
      var i = 0
      while (i < t.length) {
        val c = t(i)
        if (c == '\\' && i + 1 < t.length) { i += 1; b.append(t(i)) }
        else if (c == q && i + 1 < t.length && t(i + 1) == q) {
          i += 1; b.append(q)
        }
        else b.append(c)
        i += 1
      }
      b.toString
    }
    val unq =
      if (s.startsWith("'") && s.endsWith("'") && s.length >= 2)
        Some(unescape(s.substring(1, s.length - 1), '\''))
      else if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2)
        Some(unescape(s.substring(1, s.length - 1), '"'))
      else None
    // quoted 'NULL' on a NON-string column is the NULL value
    // (parInsertSql.c treats the token case-insensitively); on a
    // string column it stays the literal text
    if (dt != StringType &&
        unq.exists(_.equalsIgnoreCase("NULL"))) return null
    // quoted literals coerce C-style onto numeric/bool columns
    // (parInsertSql.c accepts TAGS(100, '1') for an INT tag): numerics
    // parse the unquoted text, never the quote characters; 0x-prefixed
    // integers parse as hex (taosStr2Int64 base auto-detection)
    val raw = unq.getOrElse(s)
    val baseRe = "(?i)^([+-]?)0([xb])([0-9a-f]+)$".r
    val num = raw match {
      case baseRe(sign, b, digits) =>
        val v = java.lang.Long.parseLong(digits,
          if (b.equalsIgnoreCase("x")) 16 else 2)
        (if (sign == "-") -v else v).toString
      case _ => raw
    }
    // C-style numeric coercion (taosStr2Int64 fallbacks): integer text
    // direct, float/scientific text truncates, bool text maps 1/0
    def asDouble: Option[Double] =
      if (num.equalsIgnoreCase("true")) Some(1.0)
      else if (num.equalsIgnoreCase("false")) Some(0.0)
      else try Some(num.toDouble) catch { case _: Exception => None }
    def coerceLong: Long =
      if (num.matches("[+-]?\\d+")) num.toLong
      else asDouble.map(_.toLong).getOrElse(num.toLong)
    dt match {
      case StringType => unq.getOrElse(s)
      // numeric bool coercion (taosStr2Bool: nonzero = true)
      case BooleanType =>
        if (num.matches("[+-]?\\d+")) num.toLong != 0
        else asDouble match {
          case Some(d) => d != 0.0
          case None => num.toBoolean
        }
      case LongType => unq match {
        // quoted datetime on a ts column: parse as UTC → current-db
        // ticks; quoted plain/hex/binary/scientific numerics coerce
        case Some(_) if !num.matches("[+-]?\\d+") &&
          asDouble.isEmpty => parseTs(num)
        // bare now()/today on a timestamp-typed tag (sql.y NOW in
        // tags_literal) — the creation instant
        case None if num.matches("(?i)(now|today)(\\(\\))?") =>
          val nowT = System.currentTimeMillis() * (perSecond / 1000L)
          if (num.toLowerCase.startsWith("today"))
            nowT - Math.floorMod(nowT, perSecond * 86400L)
          else nowT
        case _ => coerceLong
      }
      case IntegerType => coerceLong.toInt
      case FloatType => asDouble.map(_.toFloat).getOrElse(num.toFloat)
      case DoubleType => asDouble.getOrElse(num.toDouble)
      case d: DecimalType =>
        // eager range check (the reference errors AT INSERT on
        // overflow — without it a bad value surfaces lazily at the
        // first read, attributed to the wrong statement)
        val bd = new java.math.BigDecimal(num)
          .setScale(d.scale, java.math.RoundingMode.HALF_UP)
        require(bd.precision - bd.scale <= d.precision - d.scale,
          s"DECIMAL value overflow: $num for DECIMAL" +
            s"(${d.precision},${d.scale})")
        bd
      case BinaryType => unq.getOrElse(s).getBytes("UTF-8")
      case other =>
        throw new IllegalArgumentException(s"cannot coerce $s to $other")
    }
  }

  /** 'yyyy-MM-dd HH:mm:ss[.fff]' (UTC) → ticks at the db precision. */
  private def parseTs(txt0: String): Long = {
    // ISO forms with T separator / zone suffix ('2015-08-18T00:00:00Z',
    // '2023-10-08T22:00:00+00:00' — taosParseTime accepts both) go
    // through the shared strict parser first
    GraftSql.tsLitTicks(txt0.trim, perSecond).foreach(t => return t)
    // taosParseTime accepts loose field widths ('2018-9-17 9:0:26.5')
    // and a bare date ('2000-01-01' = midnight); canonicalize first
    val loose = ("^(\\d{4})-(\\d{1,2})-(\\d{1,2})" +
      "(?:[ T](\\d{1,2}):(\\d{1,2})(?::(\\d{1,2})(\\.\\d+)?)?)?$").r
    val txt = txt0.trim match {
      case loose(y, mo, d, h, mi, se, fr) =>
        def p(x: String) = f"${x.toInt}%02d"
        val time =
          if (h == null) " 00:00"
          else s" ${p(h)}:${p(mi)}" + (if (se == null) ""
            else s":${p(se)}" +
              Option(fr).map(f => (f + "000").take(4)).getOrElse(""))
        s"${y}-${p(mo)}-${p(d)}$time"
      case other => other
    }
    val fmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm[:ss[.SSS]]")
    val ldt = java.time.LocalDateTime.parse(txt, fmt)
    val us = ldt.toInstant(java.time.ZoneOffset.UTC).toEpochMilli * 1000L
    // µs → db ticks without overflow (ns: scale up; ms: integer down)
    if (perSecond >= 1000000L) us * (perSecond / 1000000L)
    else us / (1000000L / perSecond)
  }

  // ------------------------------------------------------------ lexing

  /** Depth-aware scan returning (parenGroupBody, afterIndex) for the
    * group opening at `at` (which must be '('). */
  private def parenGroup(s: String, at: Int): (String, Int) = {
    require(s(at) == '(', s"expected ( at $at in: $s")
    var depth = 0; var inStr = false; var i = at
    while (i < s.length) {
      val c = s(i)
      // inside a literal, a backslash escapes the next char ('a\'b')
      if (inStr) {
        if (c == '\\') i += 1
        else if (c == '\'') inStr = false
      }
      else c match {
        case '\'' => inStr = true
        case '(' => depth += 1
        case ')' =>
          depth -= 1
          if (depth == 0) return (s.substring(at + 1, i), i + 1)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced parens in: $s")
  }

  private val ident = "[A-Za-z_][A-Za-z0-9_.]*"

  /** Strip an optional `db.` qualifier (single flat namespace here —
    * the db name only selects precision via USE). */
  private def bare(name: String): String =
    name.substring(name.indexOf('.') + 1)

  /** Splits `db.tbl.col` on dots OUTSIDE backticks and strips the
    * backticks — identifiers may be backtick-quoted unicode
    * (`经度`), or contain dots/dashes inside the quotes. */
  private def splitQualified(ref: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inBt = false
    ref.foreach {
      case '`' => inBt = !inBt
      case '.' if !inBt => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private def unbt(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1)
    else t
  }

  // ------------------------------------------------------------- exec

  /** Execute one DDL / INSERT statement. */
  /** Collapse whitespace runs to single spaces OUTSIDE single-quoted
    * literals: an INSERT value like 'a  b' (or one holding a tab)
    * must reach storage byte-exact — parInsertSql.c treats quoted
    * text as opaque, and so must we. */
  /** Strip identifier backticks outside string literals, so the DDL
    * SHOW CREATE renders (backtick-quoted, as the reference prints)
    * round-trips through [[exec]] — shown text re-creates the object
    * identically. Tag values like 'O`Brien' keep their backticks. */
  private def stripBackticks(s: String): String = {
    val b = new StringBuilder(s.length)
    var inStr = false; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inStr) {
        b.append(c)
        if (c == '\\' && i + 1 < s.length) { i += 1; b.append(s(i)) }
        else if (c == '\'') inStr = false
      }
      else if (c == '`') ()
      else { b.append(c); if (c == '\'') inStr = true }
      i += 1
    }
    b.toString
  }

  private def normalizeWs(s: String): String = {
    val b = new StringBuilder(s.length)
    var inStr = false; var pendingSpace = false; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inStr) {
        b.append(c)
        if (c == '\\' && i + 1 < s.length) { i += 1; b.append(s(i)) }
        else if (c == '\'') inStr = false
      }
      else if (c.isWhitespace) pendingSpace = b.nonEmpty
      else {
        if (pendingSpace) { b.append(' '); pendingSpace = false }
        b.append(c)
        if (c == '\'') inStr = true
      }
      i += 1
    }
    b.toString
  }

  def exec(sql: String): Unit = {
    val stmt = stripBackticks(normalizeWs(sql)).trim.stripSuffix(";").trim
    val up = stmt.toUpperCase
    if (up.startsWith("CREATE DATABASE")) createDatabase(stmt)
    else if ("(?i)^DROP DATABASE (IF EXISTS )?[\\w.]+( FORCE)?$"
        .r.matches(stmt)) {
      val name = stmt.split("\\s+")
        .filterNot(t => Set("DROP", "DATABASE", "IF", "EXISTS", "FORCE")
          .contains(t.toUpperCase)).head.toLowerCase
      val ifEx = up.contains("IF EXISTS")
      if (!databases.contains(name)) {
        require(ifEx, s"database not found: $name")
      } else {
        databases.remove(name)
        val gone = stables.collect {
          case (n, st) if st.db == name => n }.toSet
        gone.foreach(stables.remove)
        children.keys.filter(c =>
          gone.contains(children(c).stableName)).toSeq
          .foreach(children.remove)
        vtableDefs.keys.filter(v => gone.contains(v)).toSeq
          .foreach(vtableDefs.remove)
      }
    }
    else if (up.startsWith("USE ")) {
      val db = bare(stmt.substring(4).trim)
      require(databases.contains(db), s"unknown database: $db")
      currentDb = db
    }
    else if (up.startsWith("CREATE STABLE")) createStable(stmt)
    else if (up.startsWith("CREATE TABLE")) createTable(stmt)
    else if (up.startsWith("CREATE STREAM")) createStream(stmt)
    else if (up.startsWith("CREATE TOPIC")) createTopic(stmt)
    else if (up.startsWith("CREATE VIEW") ||
        up.startsWith("CREATE OR REPLACE VIEW")) {
      // CREATE [OR REPLACE] VIEW v AS <select> (sql.y:1615-1618;
      // test_view_mgmt.py:279 positive OR REPLACE): saved query,
      // re-planned at each read so it tracks later DDL/DML — OR
      // REPLACE swaps the definition in place
      val kw = if (up.startsWith("CREATE OR REPLACE VIEW"))
        "CREATE OR REPLACE VIEW" else "CREATE VIEW"
      val rest = stripIfNotExists(stmt.substring(kw.length).trim)
      val tok = rest.split("\\s+")(0)
      val tail = rest.substring(tok.length).trim
      require(tail.toUpperCase.startsWith("AS "),
        s"CREATE VIEW needs AS <select>: $stmt")
      viewDefs(bare(tok)) = tail.substring(3).trim
    }
    else if (up.startsWith("DROP VIEW")) {
      viewDefs.remove(bare(stmt.split("\\s+").last)); ()
    }
    else if (up.startsWith("INSERT INTO")) insert(stmt)
    else if (up.startsWith("ALTER STABLE") || up.startsWith("ALTER TABLE")
        || up.startsWith("ALTER VTABLE"))
      alter(stmt)
    else if (up.startsWith("DELETE FROM")) delete(stmt)
    else if (up.startsWith("DROP TOPIC")) {
      topicDefs.remove(bare(stmt.split("\\s+").last)); ()
    }
    else if (up.startsWith("DROP STABLE")) {
      val n = bare(stmt.split("\\s+").last)
      stables.remove(n)
      children.filterInPlace((_, c) => c.stableName != n)
    }
    else if (up.startsWith("DROP TABLE")) {
      children.remove(bare(stmt.split("\\s+").last)); ()
    }
    else if (up.startsWith("DROP STREAM")) {
      streamDefs.remove(bare(stmt.split("\\s+").last)); ()
    }
    else if (up.startsWith("RECALCULATE STREAM")) recalcStream(stmt)
    // CREATE ANODE 'url' / UPDATE ANODE n / UPDATE ALL ANODES /
    // DROP ANODE n (sql.y:689-692): analytics-service registration.
    // UPDATE re-pulls the service's algo list on the reference; here
    // it re-validates the entry (the algo set is the Detector seam's).
    else if (up.startsWith("CREATE ANODE")) {
      val url = stmt.substring("CREATE ANODE".length).trim
      require(url.startsWith("'") && url.endsWith("'") && url.length > 2,
        s"CREATE ANODE needs a quoted endpoint: $stmt")
      anodeSeq += 1
      anodeDefs(anodeSeq) = AnodeDef(anodeSeq,
        url.substring(1, url.length - 1), "ready")
    }
    else if (up.startsWith("UPDATE ALL ANODES")) {
      anodeDefs.mapValuesInPlace((_, a) => a.copy(status = "ready")); ()
    }
    else if (up.startsWith("UPDATE ANODE ")) {
      val id = stmt.substring("UPDATE ANODE ".length).trim.toInt
      val a = anodeDefs.getOrElse(id,
        throw new IllegalArgumentException(s"unknown anode: $id"))
      anodeDefs(id) = a.copy(status = "ready")
    }
    else if (up.startsWith("DROP ANODE ")) {
      anodeDefs.remove(stmt.substring("DROP ANODE ".length).trim.toInt); ()
    }
    else if (up.startsWith("CREATE TSMA") ||
        up.startsWith("CREATE RECURSIVE TSMA")) createTsma(stmt)
    else if (up.startsWith("DROP TSMA")) {
      val n = bare(stmt.split("\\s+").last)
      tsmaDefs.values.find(_.baseTsma.contains(n)).foreach(c =>
        throw new IllegalArgumentException(
          s"cannot drop TSMA $n: recursive TSMA ${c.name} is based " +
            "on it"))
      tsmaDefs.remove(n)
      tsmaRollups.filterInPlace((k, _) => !k.startsWith(n + "|")); ()
    }
    else if (up.startsWith("CREATE RSMA")) createRsma(stmt)
    else if (up.startsWith("DROP RSMA")) {
      val n = bare(stmt.split("\\s+").last)
      rsmaDefs.remove(n)
      rsmaRollups.filterInPlace((k, _) => !k.startsWith(n + "|")); ()
    }
    else if (up.startsWith("ALTER RSMA")) {
      // ALTER RSMA name FUNCTION(f(c), …) (sql.y:1487): replace the
      // rollup's function list; cached level frames invalidate so the
      // next serve rebuilds state for the new columns
      val rest = stmt.substring("ALTER RSMA".length).trim
      val nm = bare(rest.split("[\\s(]")(0))
      val r = rsmaDefs.getOrElse(nm,
        throw new IllegalArgumentException(s"unknown RSMA: $nm"))
      val fm = "(?i)FUNCTION\\s*\\((.*)\\)\\s*$".r.findFirstMatchIn(rest)
        .getOrElse(throw new IllegalArgumentException(
          s"ALTER RSMA needs FUNCTION(…): $stmt"))
      val fnRe =
        "(?i)^([A-Za-z_]+)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
      val funcs = GraftSql.splitArgs(fm.group(1)).map(_.trim).map {
        case fnRe(f, c) => (f.toLowerCase, c)
        case other => throw new IllegalArgumentException(
          s"RSMA FUNCTION list entry not f(col): $other")
      }
      rsmaDefs(nm) = r.copy(funcs = funcs)
      rsmaRollups.filterInPlace((k, _) => !k.startsWith(nm + "|")); ()
    }
    else if (up.startsWith("STOP STREAM ") ||
        up.startsWith("START STREAM ")) {
      // START/STOP STREAM (sql.y START STREAM / STOP STREAM): the
      // lifecycle flag live wiring checks; definitions persist across
      // stop/start (the reference keeps the stream meta in mnode)
      val starting = up.startsWith("START")
      val kw = if (starting) "START STREAM " else "STOP STREAM "
      val nm = bare(stmt.substring(kw.length).trim)
      val sd = streamDefs.getOrElse(nm,
        throw new IllegalArgumentException(s"unknown stream: $nm"))
      streamDefs(nm) =
        sd.copy(status = if (starting) "running" else "stopped")
    }
    else if (up.startsWith("CREATE SMA INDEX")) {
      // CREATE SMA INDEX name ON tbl FUNCTION(…) INTERVAL(d)
      // (sql.y:1519, INDEX_TYPE_SMA): the legacy spelling of a TSMA —
      // one rollup machinery serves both (smaIndexOptimize and
      // tsmaOptimize are the same planner rewrite on the reference)
      val rest = stripIfNotExists(
        stmt.substring("CREATE SMA INDEX".length).trim)
      val nm = bare(rest.split("[\\s(]")(0))
      createTsma("CREATE TSMA " + rest)
      indexDefs(nm) = (nm, tsmaDefs(nm).table, "sma")
    }
    else if (up.startsWith("CREATE INDEX")) {
      // CREATE INDEX name ON tbl (cols) (sql.y:1521, INDEX_TYPE_NORMAL
      // — the tag index): a scan-acceleration hint on the reference;
      // here tag predicates already prune via the broadcast tag join,
      // so the catalog records the definition for listing/round-trip
      val rest = stripIfNotExists(
        stmt.substring("CREATE INDEX".length).trim)
      val nm = bare(rest.split("[\\s(]")(0))
      val m = "(?i)ON\\s+(\\S+)\\s*\\(([^)]*)\\)\\s*$".r
        .findFirstMatchIn(rest).getOrElse(
          throw new IllegalArgumentException(
            s"CREATE INDEX needs ON tbl (cols): $stmt"))
      val tbl = bare(m.group(1))
      require(stables.contains(tbl) || children.contains(tbl) ||
        external.contains(tbl), s"unknown table: $tbl")
      indexDefs(nm) = (nm, tbl, "normal:" + m.group(2).trim)
    }
    else if (up.startsWith("DROP INDEX")) {
      val nm = bare(stmt.split("\\s+").last)
      indexDefs.remove(nm).foreach { case (_, _, kind) =>
        if (kind == "sma") {
          tsmaDefs.remove(nm)
          tsmaRollups.filterInPlace((k, _) => !k.startsWith(nm + "|"))
        }
      }
    }
    else if (up.startsWith("SCAN DATABASE")) {
      val name = bare(stmt.split("\\s+")(2))
      require(databases.contains(name), s"unknown database: $name")
      scanSeq += 1
      scanLog += ((scanSeq, name, 1700000000000L + scanSeq * 1000L))
    }
    else if (up.startsWith("COMPACT DATABASE")) {
      compactSeq += 1
      compactLog += ((compactSeq, bare(stmt.split("\\s+").last),
        "finished"))
      // COMPACT DATABASE db (sql.y:880): apply the upsert resolution
      // physically — keep only the last-writer row per (child, ts),
      // so dedup-on-read stops paying for superseded versions (the
      // dedup-on-compaction preference SURVEY §8.5 records). Read
      // results are unchanged by contract; buffers shrink.
      children.values.foreach { c =>
        if (c.rows.nonEmpty) {
          val kept = c.rows.groupBy(_._1.head)
            .map { case (_, vs) => vs.maxBy(_._2) }
            .toSeq.sortBy(_._2)
          c.rows.clear()
          c.rows ++= kept
        }
      }
    }
    else if (up.startsWith("TRIM DATABASE")) {
      // TRIM DATABASE db (sql.y:884): enforce the KEEP horizon now —
      // rows older than (wall clock − KEEP) are physically dropped,
      // the reference's expired-file sweep expressed on the buffers.
      // A db without KEEP trims nothing (retention = forever).
      val nm = bare(stmt.substring("TRIM DATABASE".length).trim)
      val db = databases.getOrElse(nm,
        throw new IllegalArgumentException(s"unknown database: $nm"))
      db.keepTicks.foreach { keep =>
        val nowTicks = System.currentTimeMillis() / 1000L * db.perSecond
        val horizon = nowTicks - keep
        children.values.foreach { c =>
          if (stables(c.stableName).db == nm) {
            val kept = c.rows.filter(_._1.head
              .asInstanceOf[Long] >= horizon)
            c.rows.clear(); c.rows ++= kept
          }
        }
      }
    }
    else if (up.startsWith("FLUSH DATABASE")) {
      // FLUSH DATABASE db (sql.y:879): forces memtable → disk on the
      // reference; this catalog's buffers are already the durable
      // representation, so the statement is an accepted no-op
      ()
    }
    else if (up.startsWith("ROLLUP DATABASE")) {
      // ROLLUP DATABASE db [START WITH x] [END WITH y] (sql.y:1492
      // createRollupStmt): a manual rollup pass — build, PERSIST and
      // materialize every RSMA ladder level for the keyless key-set
      // (the cached frame in rsmaRollups is the persisted one, so
      // subsequent keyless serves read the materialized state; keyed
      // serves fill their own cache lazily as queries arrive)
      rsmaDefs.values.foreach { r =>
        r.levels.indices.foreach { i =>
          rsmaRollup(r, i, Nil)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            .count()
        }
      }
    }
    else if (up.startsWith("CREATE VTABLE")) createVtable(stmt)
    else if (up.startsWith("DROP VTABLE")) {
      val n = bare(stmt.split("\\s+").last)
      // a virtual CHILD also occupies a row in the children registry
      if (vtableDefs.get(n).exists(_.using.isDefined)) children.remove(n)
      vtableDefs.remove(n); ()
    }
    else if (up.startsWith("CREATE EXTERNAL SOURCE"))
      createExtSource(stmt)
    else if (up.startsWith("ALTER EXTERNAL SOURCE"))
      alterExtSource(stmt)
    else if (up.startsWith("DROP EXTERNAL SOURCE")) {
      // names may be backticked with dashes (fq suites
      // `drop external source if exists `fq01-fw-039-hyp``)
      // backticks strip upstream, so the bare form must accept the
      // dashed names they quoted (`fq01-fw-039-hyp`)
      val m = ("(?i)^DROP EXTERNAL SOURCE (IF EXISTS )?" +
        "(?:`([^`]+)`|([A-Za-z_][\\w-]*))$").r
      stmt match {
        case m(ife, bt, plain) =>
          val n = Option(bt).getOrElse(plain)
          if (extSourceDefs.remove(n.toLowerCase).isEmpty && ife == null)
            throw new IllegalArgumentException(
              s"external source not found: ${n.toLowerCase}")
        case _ => throw new IllegalArgumentException(
          s"bad DROP EXTERNAL SOURCE: $stmt")
      }
    }
    // REFRESH re-pulls remote metadata in the reference; the registry
    // here is self-contained, so existence is the whole contract
    else if (up.startsWith("REFRESH EXTERNAL SOURCE")) {
      val name = bare(stmt.split("\\s+").last).toLowerCase
      require(extSourceDefs.contains(name),
        s"external source not found: $name")
    }
    else if (up.startsWith("CREATE USER")) createUser(stmt)
    else if (up.startsWith("ALTER USER")) alterUser(stmt)
    // ALTER DATABASE db opts (sql.y:931): re-parse the mutable options
    // the engine models — KEEP updates the retention horizon the RSMA
    // router consults; the cluster knobs are accepted like CREATE's
    else if (up.startsWith("ALTER DATABASE ")) {
      val rest = stmt.substring("ALTER DATABASE".length).trim
      val name = bare(rest.split("\\s+")(0))
      val db = databases.getOrElse(name,
        throw new IllegalArgumentException(s"unknown database: $name"))
      val keep = "(?i)KEEP\\s+(\\d+[uasmhdw]?)".r.findFirstMatchIn(rest)
        .map { m =>
          val t = m.group(1)
          if (t.last.isDigit) GraftSql.durNative(t + "d", db.perSecond)
          else GraftSql.durNative(t, db.perSecond)
        }
      if (keep.isDefined) databases(name) = db.copy(keepTicks = keep)
    }
    // dnode/cluster/session config text (sql.y:845-861 ALTER DNODE n
    // 'key' ['value'], ALTER ALL DNODES …, ALTER LOCAL …, ALTER
    // CLUSTER …): Spark owns process config, so the statements are
    // validated and accepted — the reference applies them to tsdbCfg,
    // the analogue here is SparkConf the session was built with
    else if (("(?i)^ALTER (?:DNODE \\d+|ALL DNODES|LOCAL|CLUSTER)\\s+" +
      "(?:'[^']+'(?:\\s+(?:'[^']*'|\\S+))?|" +
      "\"[^\"]+\"(?:\\s+\"[^\"]*\")?)\\s*$")
        .r.matches(stmt)) ()
    else if (up.startsWith("DROP USER")) dropUser(stmt)
    else if (up.startsWith("CREATE ROLE")) {
      val r = bare(stmt.split("\\s+").last)
      require(stmt.toUpperCase.contains("IF NOT EXISTS") ||
        !roleDefs.contains(r), s"role exists: $r")
      roleDefs += r; ()
    }
    else if (up.startsWith("DROP ROLE")) {
      roleDefs -= bare(stmt.split("\\s+").last); ()
    }
    else if (up.startsWith("GRANT ROLE")) grantRole(stmt, grant = true)
    else if (up.startsWith("REVOKE ROLE")) grantRole(stmt, grant = false)
    else if (up.startsWith("GRANT ")) grantPriv(stmt, grant = true)
    else if (up.startsWith("REVOKE ")) grantPriv(stmt, grant = false)
    else if (fnCreateRe.findFirstIn(stmt).isDefined) createFunction(stmt)
    else if (up.startsWith("DROP FUNCTION")) {
      // the Spark function registry has no unregister; dropping removes
      // the catalog entry (listing + re-create validation) — the
      // reference's mnode drop likewise leaves live queries unaffected
      udfDefs.remove(bare(stmt.split("\\s+").last)); ()
    }
    // ---- cluster/admin text surface (sql.y:368-613 tokens/roles/
    // accounts, :845-905 node+vgroup admin, :1338-1339 mounts): Spark
    // owns process and cluster management, so the management verbs
    // VALIDATE their arguments and mutate the observable registries
    // (deploy lists, tokens, mounts, encryption state) that the SHOW
    // surfaces read — the reference applies the same statements to
    // mnode state ----
    else if (up.startsWith("CREATE TOKEN")) createToken(stmt)
    else if (up.startsWith("ALTER TOKEN ")) alterToken(stmt)
    else if (up.startsWith("DROP TOKEN")) {
      val ife = up.contains("IF EXISTS")
      val n = stmt.split("\\s+").last
      if (tokenDefs.remove(n).isEmpty && !ife)
        throw new IllegalArgumentException(s"token not found: $n")
    }
    else if (up.startsWith("CREATE MOUNT")) {
      val m = ("(?i)^CREATE MOUNT (IF NOT EXISTS )?([A-Za-z_]\\w*) ON " +
        "DNODE (\\d+) FROM '([^']+)'$").r
      stmt match {
        case m(ine, n, d, p) =>
          if (mountDefs.contains(n)) require(ine != null,
            s"mount exists: $n")
          else {
            mountSeq += 1
            mountDefs(n) = (d.toInt, 1700000000000L + mountSeq * 1000L, p)
          }
        case _ => throw new IllegalArgumentException(
          s"bad CREATE MOUNT: $stmt")
      }
    }
    else if (up.startsWith("DROP MOUNT")) {
      val ife = up.contains("IF EXISTS")
      val n = stmt.split("\\s+").last
      if (mountDefs.remove(n).isEmpty && !ife)
        throw new IllegalArgumentException(s"mount not found: $n")
    }
    else if ("(?i)^(CREATE|DROP) (MNODE|QNODE|SNODE|BNODE) ON DNODE \\d+$"
        .r.matches(stmt)) {
      val p = stmt.split("\\s+")
      val (verb, kind, dn) = (p(0).toUpperCase, p(1).toUpperCase,
        p.last.toInt)
      val set = nodeDeploy(kind)
      if (verb == "CREATE") {
        require(!set.contains(dn), s"$kind already on dnode $dn")
        set += dn
      } else {
        require(set.contains(dn), s"no $kind on dnode $dn")
        require(kind != "MNODE" || set.size > 1,
          "cannot drop the last mnode")
        set -= dn
      }
    }
    // both quote styles (the reference lexer treats " like ':
    // `create dnode "localhost:7030"` in multi-dnode suites)
    else if ("(?i)^CREATE DNODE ['\"][^'\"]+['\"]$".r.matches(stmt)) {
      dnodeSeq += 1
      extraDnodes(dnodeSeq) =
        stmt.substring("CREATE DNODE ".length).trim
          .stripPrefix("'").stripSuffix("'")
          .stripPrefix("\"").stripSuffix("\"")
    }
    // bare host + PORT form (sql.y dnode_endpoint: CREATE DNODE host
    // PORT port — the unquoted spelling of 'host:port')
    else if ("(?i)^CREATE DNODE [\\w.-]+ PORT \\d+$".r.matches(stmt)) {
      val p = stmt.split("\\s+")
      dnodeSeq += 1
      extraDnodes(dnodeSeq) = s"${p(2)}:${p.last}"
    }
    else if ("(?i)^DROP DNODE \\d+$".r.matches(stmt)) {
      val id = stmt.split("\\s+").last.toInt
      require(extraDnodes.remove(id).isDefined,
        if (id == 1) "cannot drop dnode 1 (the serving process)"
        else s"dnode not found: $id")
    }
    // optional credentials/token (test_xnode.py:416 `CREATE XNODE
    // '<ep>' user root pass '<pw>'`; `CREATE XNODE '<ep>' token '…'`)
    else if (("(?i)^CREATE XNODE '([^']+)'" +
        "(\\s+user\\s+\\S+)?(\\s+pass\\s+'[^']*')?" +
        "(\\s+token\\s+'[^']*')?$").r
        .matches(stmt)) {
      xnodeSeq += 1
      val ep = "'([^']+)'".r.findFirstMatchIn(stmt).get.group(1)
      xnodeDefs(xnodeSeq) = (ep, "ready")
    }
    else if ("(?i)^DROP XNODE TASK ('[^']*'|\\d+)$".r.matches(stmt)) ()
    else if ("(?i)^DROP XNODE AGENT ('[^']*'|\\d+)$".r.matches(stmt)) ()
    // job teardown filters (test_xnode.py: WHERE id >= 1, WHERE
    // task_id = 2 and status = 'running', WHERE config != '…' —
    // AND-ed ident-vs-literal comparisons; engine-opaque, validated
    // accept)
    // AND/OR chains with optional parenthesized groups
    // (test_xnode.py `WHERE (status = 'running' OR status =
    // 'pending') AND via = 1`) — engine-opaque, validated accept
    else if (("(?i)^DROP XNODE JOB WHERE [\\w\\s'()=!<>.:-]+$").r
        .matches(stmt) &&
        stmt.count(_ == '(') == stmt.count(_ == ')') &&
        stmt.count(_ == '\'') % 2 == 0) ()
    else if ("(?i)^DROP XNODE( FORCE)? \\d+$".r.matches(stmt)) {
      val id = stmt.split("\\s+").last.toInt
      require(xnodeDefs.remove(id).isDefined, s"xnode not found: $id")
    }
    // DROP DNODE n FORCE|UNSAFE (test_offline_reason.py:59 positive)
    else if ("(?i)^DROP DNODE \\d+ (FORCE|UNSAFE)$".r.matches(stmt)) {
      val id = stmt.split("\\s+")(2).toInt
      extraDnodes.remove(id); ()
    }
    // FORCE by quoted endpoint (test_xnode.py `DROP XNODE FORCE '<ep>'`)
    else if ("(?i)^DROP XNODE( FORCE)? '[^']*'$".r.matches(stmt)) {
      val ep = stmt.substring(stmt.indexOf('\'') + 1, stmt.length - 1)
      val id = xnodeDefs.collectFirst {
        case (k, (e, _)) if e == ep => k }
      require(id.isDefined, s"xnode not found: $ep")
      xnodeDefs.remove(id.get)
    }
    else if ("(?i)^(START|STOP|DRAIN) XNODE \\d+$".r.matches(stmt)) {
      val id = stmt.split("\\s+").last.toInt
      val x = xnodeDefs.getOrElse(id,
        throw new IllegalArgumentException(s"xnode not found: $id"))
      xnodeDefs(id) = (x._1, up.split("\\s+")(0) match {
        case "START" => "ready"
        case "STOP" => "stopped"
        case _ => "draining"
      })
    }
    else if (up == "REBALANCE XNODE") ()
    else if ("(?i)^ALTER XNODE \\d+ SET TOKEN '[^']*'$".r.matches(stmt) ||
      "(?i)^ALTER XNODE SET (USER|TOKEN) .+$".r.matches(stmt)) ()
    // agent/job/task attribute patches (xnode admin text surface):
    // validated-accept — WITH/SET carry engine-opaque key/value text
    // a TASK retarget may precede the option list (test_xnode.py
    // `ALTER XNODE TASK 1 TO 'dsn://sink2' WITH retry 3`)
    else if (("(?i)^ALTER XNODE (AGENT|JOB|TASK) ('[^']*'|\"[^\"]*\"" +
      "|\\d+)(\\s+TO\\s+'[^']*')?\\s+(WITH|SET)\\s+.+$").r
      .matches(stmt)) ()
    // agent/job creation carries the same engine-opaque WITH text
    // (CREATE XNODE AGENT '1' WITH regionA 'cn-east-1', ttl '2y' …;
    // CREATE XNODE JOB ON 1 WITH config '…' xnode_id 2)
    // a TASK may carry a FROM 'dsn' TO {'dsn' | DATABASE db} route
    // before its WITH option list (parser/batch/TRIGGER spellings are
    // engine-opaque key/value text, same validated-accept treatment)
    // FROM sources: a 'dsn' or a TOPIC (test_xnode.py:257 `CREATE
    // XNODE TASK '…' FROM TOPIC tp TO 'kafka://…' WITH group_id 'g1',
    // client_id 'c1' …`)
    else if (("(?i)^CREATE XNODE (AGENT|TASK) ('[^']*'|\"[^\"]*\"" +
      "|\\d+)(\\s+FROM\\s+('[^']*'|TOPIC\\s+[\\w.]+)\\s+TO\\s+" +
      "('[^']*'|DATABASE\\s+[\\w.]+))?(\\s+WITH\\s+.+)?$")
      .r.matches(stmt)) ()
    else if ("(?i)^CREATE XNODE JOB ON \\d+(\\s+WITH\\s+.+)?$"
      .r.matches(stmt)) ()
    // accounts are the enterprise tenant surface — accepted, validated
    else if ("(?i)^(CREATE|ALTER) ACCOUNT \\w+ .+$".r.matches(stmt)) ()
    else if ("(?i)^CREATE ENCRYPT_ALGR '[^']+'$".r.matches(stmt))
      encryptAlgrs += unquoteStr(stmt.split("\\s+").last)
    else if ("(?i)^DROP ENCRYPT_ALGR '[^']+'$".r.matches(stmt)) {
      val a = unquoteStr(stmt.split("\\s+").last)
      require(encryptAlgrs.remove(a), s"encrypt algorithm not found: $a")
    }
    else if ("(?i)^CREATE ENCRYPT_KEY '[^']+'$".r.matches(stmt))
      encryptKeySet = true
    else if ("(?i)^CREATE TOTP_SECRET FOR USER \\w+$".r.matches(stmt)) {
      val u = stmt.split("\\s+").last
      require(userDefs.contains(u), s"user not found: $u")
      totpUsers += u
    }
    else if ("(?i)^DROP TOTP_SECRET FROM USER \\w+$".r.matches(stmt)) {
      val u = stmt.split("\\s+").last
      require(totpUsers.remove(u), s"no TOTP secret for user: $u")
    }
    else if ("(?i)^(LOCK|UNLOCK) ROLE \\w+$".r.matches(stmt)) {
      val r = stmt.split("\\s+").last
      require(roleDefs.contains(r), s"role not found: $r")
      if (up.startsWith("LOCK")) lockedRoles += r else lockedRoles -= r
    }
    // single-process engine commits synchronously — the transaction
    // brackets are accepted; KILL targets must at least exist
    else if (up == "BEGIN" || up == "COMMIT" || up == "START TRANSACTION")
      ()
    else if (("(?i)^KILL (COMPACT|CONNECTION|QUERY|RETENTION|SCAN|" +
      "SSMIGRATE|TRANSACTION) .+$").r.matches(stmt)) ()
    // vgroup/vnode placement is Spark's shuffle/AQE's job — validated
    // no-ops (a named database must exist)
    else if (("(?i)^(BALANCE VGROUP( LEADER)?|ASSIGN LEADER FORCE|" +
      "ALTER DNODES RELOAD|MERGE VGROUP \\d+ \\d+|SPLIT VGROUP \\d+|" +
      "REDISTRIBUTE VGROUP \\d+( DNODE \\d+){1,3}|" +
      "(OPEN|CLOSE) VNODE \\d+|ALTER VGROUP \\d+ .+|" +
      "COMPACT VNODES IN \\([\\d, ]+\\)|" +
      "ALTER SYSTEM SET (DB_KEY|SVR_KEY) '[^']*'|" +
      "ALTER SYSTEM SET KEY_EXPIRATION \\d+)$").r.matches(stmt)) ()
    else if (("(?i)^(BALANCE VGROUP LEADER DATABASE|" +
      "SSMIGRATE DATABASE) \\w+$").r.matches(stmt)) {
      val db = stmt.split("\\s+").last
      require(databases.contains(db), s"unknown database: $db")
    }
    else if ("(?i)^DROP CONSUMER GROUP \\w+ ON \\w+$".r.matches(stmt)) {
      val tp = bare(stmt.split("\\s+").last)
      require(topicDefs.contains(tp), s"topic not found: $tp")
    }
    else throw new IllegalArgumentException(s"unsupported statement: $stmt")
  }

  private def unquoteStr(s: String): String =
    s.trim.stripPrefix("'").stripSuffix("'")

  /** CREATE TOKEN [IF NOT EXISTS] id FROM USER u [PROVIDER 's']
    * [ENABLE n] [TTL days] [EXTRA_INFO 's'] (sql.y:385-387;
    * systable.c:744 tokenSchema). */
  private def createToken(stmt: String): Unit = {
    val m = ("(?i)^CREATE TOKEN (IF NOT EXISTS )?([A-Za-z_]\\w*) " +
      "FROM USER ([A-Za-z_]\\w*)(.*)$").r
    stmt match {
      case m(ine, n, u, opts) =>
        require(userDefs.contains(u), s"user not found: $u")
        if (tokenDefs.contains(n)) {
          require(ine != null, s"token exists: $n"); return
        }
        tokenSeq += 1
        val t = TokenDef(n, u, "taosd", 1, tokenSeq, None, "")
        applyTokenOpts(t, opts)
        tokenDefs(n) = t
      case _ => throw new IllegalArgumentException(
        s"bad CREATE TOKEN (needs FROM USER): $stmt")
    }
  }

  /** ALTER TOKEN id opts (sql.y:388-390). */
  private def alterToken(stmt: String): Unit = {
    val p = stmt.split("\\s+", 4)
    val t = tokenDefs.getOrElse(p(2),
      throw new IllegalArgumentException(s"token not found: ${p(2)}"))
    require(p.length == 4 && p(3).trim.nonEmpty,
      s"ALTER TOKEN needs at least one option: $stmt")
    applyTokenOpts(t, p(3))
  }

  private def applyTokenOpts(t: TokenDef, opts0: String): Unit = {
    var rest = opts0.trim
    val optRe = ("(?i)^(PROVIDER\\s+'([^']*)'|ENABLE\\s+(\\d)|" +
      "TTL\\s+(\\d+)|EXTRA_INFO\\s+'([^']*)')\\s*").r
    while (rest.nonEmpty) {
      val m = optRe.findFirstMatchIn(rest).getOrElse(
        throw new IllegalArgumentException(s"bad token option: $rest"))
      if (m.group(2) != null) t.provider = m.group(2)
      if (m.group(3) != null) t.enable = m.group(3).toInt
      if (m.group(4) != null) t.ttlDays = Some(m.group(4).toInt)
      if (m.group(5) != null) t.extraInfo = m.group(5)
      rest = rest.substring(m.end).trim
    }
  }

  // ------------------------------------------------- users / privileges

  /** CREATE USER [IF NOT EXISTS] u PASS 'p' [SYSINFO n] [CREATEDB n]
    * [ENABLE n] (sql.y:359; user_option list :330). */
  private def createUser(stmt0: String): Unit = {
    // the reference lexer treats "…" like '…' (`create user u1 pass
    // "taosdata_12345"`, rbac suites) — normalize before matching
    val stmt = GraftSql.normalizeDoubleQuotes(stmt0)
    val re = ("(?i)^CREATE USER (?:IF NOT EXISTS )?" +
      "([A-Za-z_][A-Za-z0-9_]*) PASS '([^']*)'(.*)$").r
    stmt match {
      case re(name, pass, rest) =>
        if (userDefs.contains(name)) {
          require(stmt.toUpperCase.contains("IF NOT EXISTS"),
            s"user exists: $name")
          return
        }
        val u = UserDef(name, shaHex(pass), 0, 1, 1, 0)
        def opt(k: String): Option[Int] =
          s"(?i)\\b$k (\\d)".r.findFirstMatchIn(rest)
            .map(_.group(1).toInt)
        opt("SYSINFO").foreach(u.sysinfo = _)
        opt("CREATEDB").foreach(u.createdb = _)
        opt("ENABLE").foreach(u.enable = _)
        userDefs(name) = u
      case _ => sys.error(s"cannot parse CREATE USER: $stmt")
    }
  }

  /** ALTER USER u PASS 'p' | ENABLE n | SYSINFO n | CREATEDB n
    * (sql.y:364). */
  private def alterUser(stmt0: String): Unit = {
    val stmt = GraftSql.normalizeDoubleQuotes(stmt0)
    val re = "(?i)^ALTER USER ([A-Za-z_][A-Za-z0-9_]*) (.+)$".r
    stmt match {
      case re(name, opts) =>
        val u = userDefs.getOrElse(name,
          sys.error(s"unknown user: $name"))
        "(?i)PASS '([^']*)'".r.findFirstMatchIn(opts)
          .foreach(m => u.passHash = shaHex(m.group(1)))
        def opt(k: String): Option[Int] =
          s"(?i)\\b$k (\\d)".r.findFirstMatchIn(opts)
            .map(_.group(1).toInt)
        opt("SYSINFO").foreach(u.sysinfo = _)
        opt("CREATEDB").foreach(u.createdb = _)
        opt("ENABLE").foreach(u.enable = _)
      case _ => sys.error(s"cannot parse ALTER USER: $stmt")
    }
  }

  /** DROP USER [IF EXISTS] u (sql.y:365): root is not droppable, and
    * the user's grants go with the user. */
  private def dropUser(stmt: String): Unit = {
    val name = bare(stmt.split("\\s+").last)
    require(name != "root", "cannot drop the root superuser")
    if (userDefs.remove(name).isEmpty)
      require(stmt.toUpperCase.contains("IF EXISTS"),
        s"unknown user: $name")
    privDefs.filterInPlace(_.user != name)
    userRoles.remove(name); ()
  }

  /** GRANT ROLE r TO u / REVOKE ROLE r FROM u (sql.y:415-416). */
  private def grantRole(stmt: String, grant: Boolean): Unit = {
    val re = ("(?i)^(?:GRANT|REVOKE) ROLE ([A-Za-z_][A-Za-z0-9_]*) " +
      "(?:TO|FROM) ([A-Za-z_][A-Za-z0-9_]*)$").r
    stmt match {
      case re(role, user) =>
        require(roleDefs.contains(role), s"unknown role: $role")
        val rs = userRoles.getOrElseUpdate(user,
          mutable.LinkedHashSet[String]())
        if (grant) rs += role else rs -= role
        ()
      case _ => sys.error(s"cannot parse role grant: $stmt")
    }
  }

  /** GRANT privs [ON level] [WITH cond] TO u / REVOKE … FROM u
    * (sql.y:418-419; priv_type verbs :450-600). level `*.*` = all,
    * `db`/`db.*` = database scope, `db.tbl` = table scope — the same
    * three scopes mndUser reports in ins_user_privileges. */
  private def grantPriv(stmt: String, grant: Boolean): Unit = {
    val kw = if (grant) "TO" else "FROM"
    val re = ("(?i)^(?:GRANT|REVOKE) (.+?)" +
      "(?: ON ([A-Za-z_*][A-Za-z0-9_.*]*))?(?: WITH (.+?))? " +
      kw + " ([A-Za-z_][A-Za-z0-9_]*)$").r
    stmt match {
      case re(privList, levelOrNull, condOrNull, user) =>
        require(userDefs.contains(user) || roleDefs.contains(user),
          s"unknown user or role: $user")
        // paren-aware split: SELECT(c3,c4) carries a column subset
        val colRe = "^(\\w[\\w ]*?)\\s*\\(([^)]*)\\)$".r
        val privs = GraftSql.splitArgs(privList)
          .map(_.trim).filter(_.nonEmpty).map {
            case colRe(p, cols) =>
              (p.trim.toLowerCase,
                cols.split(",").map(_.trim).mkString(","))
            case p => (p.toLowerCase, "")
          }
        val (scope, db, tbl) =
          Option(levelOrNull).getOrElse("*.*").split("\\.") match {
            case Array("*", "*") => ("all", "*", "*")
            case Array(d, "*") => ("db", d, "*")
            case Array(d, t) => ("table", d, t)
            case Array(d) => ("db", d, "*")
            case _ => sys.error(s"bad privilege level: $levelOrNull")
          }
        // a quoted condition literal arrives with its quotes
        val cond = Option(condOrNull).map(_.trim)
          .map(c0 => if (c0.startsWith("'") && c0.endsWith("'"))
            c0.substring(1, c0.length - 1) else c0)
          .getOrElse("")
        if (grant) privs.foreach { case (p, cols) =>
          val row = PrivDef(user, p, scope, db, tbl, cond, cols)
          if (!privDefs.contains(row)) privDefs += row
        }
        else privDefs.filterInPlace(r => !(r.user == user &&
          privs.exists(_._1 == r.privType) && r.db == db &&
          r.table == tbl))
        ()
      case _ => sys.error(s"cannot parse privilege grant: $stmt")
    }
  }

  // ------------------------------------------------- TSMA / VTABLE / UDF

  /** CREATE TSMA name ON tbl FUNCTION(f1(c1), …) INTERVAL(d)
    * (sql.y:1503-1505; reference tests 19-TSMAs). The rollup's partial
    * state materializes lazily per serving key-set ([[serveInterval]]);
    * the reference fills its result stable through an ingest-side
    * stream — same state, different refresh trigger. */
  private def createTsma(stmt: String): Unit = {
    val re = ("(?i)^CREATE (?:RECURSIVE )?TSMA (?:IF NOT EXISTS )?" +
      "([A-Za-z_][A-Za-z0-9_.]*) ON ([A-Za-z_][A-Za-z0-9_.]*)" +
      "(?: FUNCTION\\s*\\((.*)\\))? INTERVAL\\s*\\(([^)]+)\\)$").r
    val recursive = stmt.toUpperCase.startsWith("CREATE RECURSIVE")
    stmt match {
      case re(name0, tbl0, funcsTxt, ivTxt) =>
        val name = bare(name0); val tbl = bare(tbl0)
        val grain = GraftSql.durNative(ivTxt.trim, perSecond)
        if (recursive) {
          // CREATE RECURSIVE TSMA name ON base_tsma INTERVAL(d)
          // (sql.y:1506; 42-tsma.md:18-24): no FUNCTION list — the
          // function set and table are inherited from the base TSMA,
          // and the interval must be an exact multiple of its grain;
          // state folds from the base rollup, never the base table
          require(funcsTxt == null,
            s"RECURSIVE TSMA takes no FUNCTION list: $stmt")
          val base = tsmaDefs.getOrElse(tbl,
            throw new IllegalArgumentException(
              s"RECURSIVE TSMA base not found: $tbl"))
          require(grain > base.grainUs && grain % base.grainUs == 0,
            s"RECURSIVE TSMA interval $ivTxt must be an exact " +
              s"multiple of base grain ${base.intervalTxt}")
          tsmaDefs(name) = TsmaDef(name, base.table, base.funcs,
            grain, ivTxt.trim, baseTsma = Some(base.name))
        } else {
          require(funcsTxt != null,
            s"CREATE TSMA needs a FUNCTION list: $stmt")
          val fnRe =
            "(?i)^([A-Za-z_]+)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
          val funcs = GraftSql.splitArgs(funcsTxt).map(_.trim).map {
            case fnRe(f, c) => (f.toLowerCase, c)
            case other => throw new IllegalArgumentException(
              s"TSMA FUNCTION list entry not f(col): $other")
          }
          require(funcs.nonEmpty, s"TSMA needs a FUNCTION list: $stmt")
          table(tbl) // validates the target exists
          tsmaDefs(name) = TsmaDef(name, tbl, funcs, grain, ivTxt.trim)
        }
      case _ => throw new IllegalArgumentException(
        s"cannot parse CREATE TSMA: $stmt")
    }
  }

  /** The rollup frame for `t` keyed by `keys`, built once per
    * (tsma, key-set) and cached. */
  private def tsmaRollup(t: TsmaDef, keys: Seq[String]): DataFrame = {
    val k = t.name + "|" + keys.mkString(",")
    tsmaRollups.getOrElseUpdate(k, {
      val cols = t.funcs.map(_._2).distinct
      t.baseTsma match {
        case Some(b) =>
          // recursive TSMA: fold the BASE TSMA's partial state to the
          // coarser grain — |base rollup| rows read, never the table
          graft.ops.TsmaOps.mergeRollupMulti(
            tsmaRollup(tsmaDefs(b), keys), t.grainUs, keys, cols)
        case None =>
          graft.ops.TsmaOps.createRollupMulti(table(t.table),
            col(tsColOf(t.table)), t.grainUs, keys, cols)
      }
    })
  }

  /** CREATE RSMA name ON tbl FUNCTION(f1(c1), …) INTERVAL(d1, d2, …)
    * (sql.y:1480-1484 createCreateRsmaStmt; rollupoperator.c): the
    * multi-level retention rollup. Levels must be strictly coarsening
    * and each must divide the next, so every level folds exactly from
    * the previous one's partial state. The grammar's empty FUNCTION()
    * form is rejected loudly — serving semantics need the list. */
  private def createRsma(stmt: String): Unit = {
    val re = ("(?i)^CREATE RSMA (?:IF NOT EXISTS )?" +
      "([A-Za-z_][A-Za-z0-9_.]*) ON ([A-Za-z_][A-Za-z0-9_.]*)" +
      "(?: FUNCTION\\s*\\((.*)\\))? INTERVAL\\s*\\(([^)]+)\\)$").r
    stmt match {
      case re(name0, tbl0, funcsTxt, ivTxt) =>
        val name = bare(name0); val tbl = bare(tbl0)
        require(funcsTxt != null && funcsTxt.trim.nonEmpty,
          s"CREATE RSMA needs a FUNCTION list: $stmt")
        val fnRe =
          "(?i)^([A-Za-z_]+)\\s*\\(\\s*([A-Za-z_][A-Za-z0-9_]*)\\s*\\)$".r
        val funcs = GraftSql.splitArgs(funcsTxt).map(_.trim).map {
          case fnRe(f, c) => (f.toLowerCase, c)
          case other => throw new IllegalArgumentException(
            s"RSMA FUNCTION list entry not f(col): $other")
        }
        val levelTxts = GraftSql.splitArgs(ivTxt).map(_.trim)
        val levels = levelTxts.map(GraftSql.durNative(_, perSecond))
        require(levels.nonEmpty, s"RSMA needs at least one level: $stmt")
        levels.sliding(2).foreach {
          case Seq(a, b) => require(b > a && b % a == 0,
            s"RSMA levels must coarsen by exact multiples: $a -> $b")
          case _ =>
        }
        table(tbl) // validates the target exists
        rsmaDefs(name) = RsmaDef(name, tbl, funcs, levels, levelTxts)
      case _ => throw new IllegalArgumentException(
        s"cannot parse CREATE RSMA: $stmt")
    }
  }

  /** The level-`lvl` rollup frame of `r` keyed by `keys`: level 0
    * aggregates the base table once; each coarser level folds the
    * previous level's partial state (reads |level k| rows, never the
    * base again — the retention-ladder scale property). */
  private def rsmaRollup(r: RsmaDef, lvl: Int,
      keys: Seq[String]): DataFrame = {
    val k = r.name + "|" + lvl + "|" + keys.mkString(",")
    rsmaRollups.getOrElseUpdate(k, {
      val cols = r.funcs.map(_._2).distinct
      if (lvl == 0)
        graft.ops.TsmaOps.createRollupMulti(table(r.table),
          col(tsColOf(r.table)), r.levels(0), keys, cols)
      else
        graft.ops.TsmaOps.mergeRollupMulti(rsmaRollup(r, lvl - 1, keys),
          r.levels(lvl), keys, cols)
    })
  }

  /** Serve INTERVAL(`intervalUs`) aggregates (`specs` = (func, col))
    * over `tableName`, per `keys` — routed through an eligible TSMA
    * when one covers the request (the planner rewrite
    * smaIndexOptimize/tsmaOptimize performs on the reference; the
    * eligibility test is the same: grain divides the interval and
    * every requested aggregate was declared). Output columns are
    * `_wstart` + `<func>_<col>`. */
  def serveInterval(tableName: String, intervalUs: Long,
      keys: Seq[String], specs: Seq[(String, String)]): DataFrame = {
    val want = specs.map { case (f, c) => (f.toLowerCase, c) }
    eligibleStates(tableName, intervalUs, keys, want)
      .sortBy(-_._1).headOption match {
      case Some((_, serve)) => serve()
      case None => graft.ops.TsmaOps.aggBase(table(tableName),
        col(tsColOf(tableName)), intervalUs, keys, want)
    }
  }

  /** Every TSMA grain and RSMA level eligible for this request, with
    * its serve closure — the ONE eligibility enumeration shared by the
    * router ([[serveInterval]], which takes the coarsest) and the
    * choice probe ([[servingGrain]]): the probe exists to pin the
    * router's decision in gate hashes, so the two must never diverge. */
  private def eligibleStates(tableName: String, intervalUs: Long,
      keys: Seq[String], want: Seq[(String, String)])
      : Seq[(Long, () => DataFrame)] = {
    val covered = (funcs: Seq[(String, String)]) =>
      want.forall { case (f, c) =>
        funcs.contains((f, c)) ||
          // avg folds from declared sum+count partials
          (f == "avg" && funcs.contains(("sum", c)) &&
            funcs.contains(("count", c)))
      }
    val tsmaCands = tsmaDefs.values.toSeq
      .filter(t => t.table == bare(tableName) &&
        intervalUs % t.grainUs == 0 && covered(t.funcs))
      .map(t => (t.grainUs, () => graft.ops.TsmaOps.serveFromRollup(
        tsmaRollup(t, keys), t.grainUs, intervalUs, keys, want)))
    val rsmaCands = rsmaDefs.values.toSeq
      .filter(r => r.table == bare(tableName) && covered(r.funcs))
      .flatMap(r => r.levels.zipWithIndex
        .filter { case (g, _) => intervalUs % g == 0 }
        .map { case (g, i) => (g, () => graft.ops.TsmaOps.serveFromRollup(
          rsmaRollup(r, i, keys), g, intervalUs, keys, want)) })
    tsmaCands ++ rsmaCands
  }

  /** The grain (ticks) of the state [[serveInterval]] would read for
    * this request, None = base table — the router's choice, exposed so
    * gates and specs can assert retention-awareness. */
  def servingGrain(tableName: String, intervalUs: Long,
      specs: Seq[(String, String)]): Option[Long] = {
    val want = specs.map { case (f, c) => (f.toLowerCase, c) }
    eligibleStates(tableName, intervalUs, Nil, want)
      .map(_._1).sorted.lastOption
  }

  /** The timestamp primary-key column of a readable table: a stable /
    * child declares it (first data column); an external registration
    * uses its `ts` column when present, else its first column. */
  private def tsColOf(name0: String): String = {
    val name = bare(name0)
    if (children.contains(name)) stables(children(name).stableName).tsCol
    else if (stables.contains(name)) stables(name).tsCol
    // a vtable can source another vtable's columns (3-hop chains,
    // test_vtable_validate_referencing.py)
    else if (vtableDefs.contains(name)) vtableDefs(name).tsCol
    else if (external.contains(name)) {
      val cols = external(name).columns
      if (cols.contains("ts")) "ts" else cols.head
    }
    else throw new IllegalArgumentException(
      s"no timestamp column known for: $name")
  }

  /** CREATE VTABLE name (ts TIMESTAMP, c t FROM [db.]tbl.col, …)
    * (sql.y:1074-1076, column reference option sql.y:3253;
    * virtualtablescanoperator.c). Definition only — the read path is
    * [[vtableDf]]. */
  private def createVtable(stmt: String): Unit = {
    val rest = stripIfNotExists(
      stmt.substring("CREATE VTABLE".length).trim)
    val tok = rest.split("[\\s(]")(0)
    val name = bare(tok)
    // the virtual CHILD form carries a top-level USING (sql.y:1077-1086
    // createCreateVSubTableStmt) — paren-depth-aware scan so a FROM
    // ref inside the column list cannot fool the router
    val tail0 = rest.substring(tok.length).trim
    var depth = 0
    var usingAt = -1
    val upTail = tail0.toUpperCase
    var i = 0
    while (i < upTail.length && usingAt < 0) {
      upTail(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case 'U' if depth == 0 && upTail.startsWith("USING ", i) &&
          (i == 0 || !upTail(i - 1).isLetterOrDigit) => usingAt = i
        case _ =>
      }
      i += 1
    }
    if (usingAt >= 0) {
      createVSubTable(name, tail0.substring(0, usingAt).trim,
        tail0.substring(usingAt + "USING ".length).trim)
      return
    }
    val at = rest.indexOf('(', tok.length)
    require(at > 0, s"CREATE VTABLE needs a column list: $stmt")
    val (body, afterCols) = parenGroup(rest, at)
    // the type may carry commas/spaces inside its parens
    // (test_vtable_decimal.py `dec64_col decimal(18,2) from …`)
    val defRe = ("(?i)^(`[^`]+`|[\\p{L}_][\\p{L}\\p{N}_]*)\\s+" +
      "([A-Za-z0-9]+(?:\\s*\\([0-9, ]*\\))?(?:\\s+UNSIGNED)?)" +
      "(?:\\s+FROM\\s+([\\p{L}\\p{N}_.`-]+))?$").r
    var tsCol: String = null
    val cols = Seq.newBuilder[(String, String, String, String)]
    GraftSql.splitArgs(body).map(_.trim).foreach {
      case defRe(cn0, tp, null) =>
        val cn = unbt(cn0)
        if (tsCol == null) {
          require(tp.equalsIgnoreCase("TIMESTAMP"),
            s"VTABLE first column must be TIMESTAMP: $cn $tp")
          tsCol = cn
        } else
          // a later column without FROM is an UNSOURCED vtable column
          // (05-VirtualTables: unbound columns read NULL until ALTER
          // binds a source) — empty source table marks it
          cols += ((cn, tp, "", ""))
      case defRe(cn, tp, ref) =>
        val parts = splitQualified(ref)
        require(parts.length >= 2,
          s"VTABLE column $cn needs FROM table.column: $ref")
        // db qualifier (if any) is advisory here — single catalog
        cols += ((unbt(cn), tp, parts(parts.length - 2), parts.last))
      case other => throw new IllegalArgumentException(
        s"cannot parse VTABLE column def: $other")
    }
    require(tsCol != null, s"CREATE VTABLE needs a TIMESTAMP column: $stmt")
    val cs = cols.result()
    require(cs.nonEmpty, s"CREATE VTABLE needs sourced columns: $stmt")
    // trailing SERIES clauses (sql.y series_clause_opt)
    val series = parseSeriesDecls(rest.substring(afterCols).trim)
    cs.foreach { case (_, _, tbl, _) =>
      // series aliases resolve at read time through their transport;
      // plain refs must name an existing table now (unsourced columns
      // have no table to check)
      if (tbl.nonEmpty &&
          !series.exists(_.alias.equalsIgnoreCase(tbl))) table(tbl)
    }
    vtableDefs(name) = VtableDef(name, tsCol, cs, series = series)
  }

  private val seriesDeclRe =
    ("(?i)\\bSERIES\\s+([A-Za-z_]\\w*)\\s+AS\\s+([A-Za-z_][\\w.]*)" +
      "\\s*\\(([^)]*)\\)").r

  /** Parse zero or more `SERIES id AS src.db.measurement (k='v', …)`
    * declarations (sql.y:3268-3281). */
  private def parseSeriesDecls(txt: String): Seq[SeriesDecl] =
    seriesDeclRe.findAllMatchIn(txt).map { m =>
      val filters = GraftSql.splitArgs(m.group(3))
        .map(_.trim).filter(_.nonEmpty).map { kv =>
          val eq = kv.indexOf('=')
          require(eq > 0, s"SERIES tag filter needs k='v': $kv")
          val v = kv.substring(eq + 1).trim
          require(v.length >= 2 && v.head == '\'' && v.last == '\'',
            s"SERIES tag value must be a string literal: $kv")
          (kv.substring(0, eq).trim,
            v.substring(1, v.length - 1).replace("''", "'"))
        }
      SeriesDecl(m.group(1), m.group(2), filters)
    }.toSeq

  /** Resolve a [[SeriesDecl]] to rows: the transport is a frame
    * registered under the FULL source path (`register("src.db.m", df)`)
    * with the series' tag filters applied as equality predicates —
    * absent binding fails loudly, never silently empty. */
  private def seriesFrame(sd: SeriesDecl): DataFrame = {
    val df = external.getOrElse(sd.path,
      throw new IllegalArgumentException(
        s"external series transport not bound: ${sd.path} — " +
          s"register(...) a frame under the full source path"))
    sd.filters.foldLeft(df) { case (d, (k, v)) =>
      d.filter(col(k) === lit(v))
    }
  }

  /** CREATE VTABLE child [(c FROM tbl.col, …)] USING vstb [(tagNames)]
    * TAGS (v | t FROM tbl.tag, …) (sql.y:1077-1086
    * createCreateVSubTableStmt; 05-VirtualTables/01-DDL): a virtual
    * CHILD of a `VIRTUAL 1` super table. Column types come from the
    * vstable's schema; a TAGS item without FROM is a positional
    * literal, one with FROM is a [[TagRef]] that resolves dynamically
    * at read time. The child lands in the shared `children` registry
    * so SET TAG / ins_tags / SHOW TABLE TAGS reuse the normal paths. */
  private def createVSubTable(name: String, colPart: String,
      usingPart: String): Unit = {
    // identifiers may be unicode (backticks are stripped before parse:
    // `经度` arrives bare); a bare qualified ref without `name FROM`
    // names the column after its source (sql.y vtable_col variants)
    val refRe = ("(?i)^(`[^`]+`|[\\p{L}_][\\p{L}\\p{N}_]*)" +
      "\\s+FROM\\s+([\\p{L}\\p{N}_.`-]+)$").r
    val bareRefRe = "^([\\p{L}\\p{N}_.`-]+\\.[\\p{L}\\p{N}_`-]+)$".r
    val colRefs: Seq[(String, String, String)] =
      if (colPart.isEmpty) Nil
      else {
        val (body, _) = parenGroup(colPart, 0)
        GraftSql.splitArgs(body).map(_.trim).map {
          case refRe(cn, ref) =>
            val ps = splitQualified(ref)
            require(ps.length >= 2,
              s"VTABLE column $cn needs FROM table.column: $ref")
            (unbt(cn), ps(ps.length - 2), ps.last)
          case bareRefRe(ref) =>
            val ps = splitQualified(ref)
            (ps.last, ps(ps.length - 2), ps.last)
          case other => throw new IllegalArgumentException(
            s"cannot parse VTABLE column ref: $other")
        }
      }
    var rest = usingPart.trim
    val stTok = rest.split("[\\s(]")(0)
    val st = stables.getOrElse(bare(stTok),
      throw new IllegalArgumentException(
        s"unknown virtual stable: $stTok"))
    require(st.virtualN > 0,
      s"USING target of CREATE VTABLE must be a VIRTUAL stable: ${st.name}")
    rest = rest.substring(stTok.length).trim
    val tagNames: Seq[String] =
      if (rest.startsWith("(")) {
        val (body, after) = parenGroup(rest, 0)
        rest = rest.substring(after).trim
        GraftSql.splitArgs(body).map(_.trim)
      } else st.tagDefs.map(_._1)
    require(rest.toUpperCase.startsWith("TAGS"),
      s"CREATE VTABLE … USING needs TAGS(…): $usingPart")
    val (tagsBody, _) = parenGroup(rest, rest.indexOf('('))
    def tagIdx(tn: String): Int = {
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(tn))
      require(i >= 0, s"unknown tag $tn on ${st.name}")
      i
    }
    var vals: Seq[Any] = st.tagDefs.map(_ => null: Any)
    GraftSql.splitArgs(tagsBody).map(_.trim).zipWithIndex.foreach {
      case (refRe(tn, ref), _) =>
        // db-qualified refs (`tags(region from db.ct0.region)`,
        // test_vtable DDL forms) strip the db part — the catalog is
        // single-db scoped, like column refs
        val ps0 = ref.split("\\.")
        val ps = if (ps0.length == 3) ps0.tail else ps0
        require(ps.length == 2,
          s"tag ref needs table.tag: $tn FROM $ref")
        val srcC = children.getOrElse(ps(0),
          throw new IllegalArgumentException(
            s"tag ref source table not found: ${ps(0)}"))
        require(stables(srcC.stableName).tagDefs
            .exists(_._1.equalsIgnoreCase(ps(1))),
          s"tag ref source tag not found: $ref")
        vals = vals.updated(tagIdx(tn), TagRef(ps(0), ps(1)))
      // positional bare `table.tag` refs — the FROM-less spelling
      // (test_vtable_tag_ref: `USING vstb TAGS (c2.t_tiny, …)`)
      case (bareRef, k)
          if "^[A-Za-z_]\\w*(\\.[A-Za-z_`][\\w`]*){1,2}$".r
            .matches(bareRef.trim) &&
            children.contains(bare(bareRef.trim
              .split("\\.").dropRight(1).mkString("."))) =>
        require(k < tagNames.length,
          s"TAGS arity exceeds ${tagNames.length} for $name")
        val parts = splitQualified(bareRef.trim)
        val (srcT, srcTag) = (parts(parts.length - 2), parts.last)
        require(stables(children(srcT).stableName).tagDefs
            .exists(_._1.equalsIgnoreCase(srcTag)),
          s"tag ref source tag not found: $bareRef")
        vals = vals.updated(tagIdx(tagNames(k)), TagRef(srcT, srcTag))
      case (litTxt, k) =>
        require(k < tagNames.length,
          s"TAGS arity exceeds ${tagNames.length} for $name")
        val i = tagIdx(tagNames(k))
        vals = vals.updated(i,
          literal(litTxt, sparkType(st.tagDefs(i)._2)))
    }
    val cols = colRefs.map { case (cn, tbl, sc) =>
      val d = st.colDefs.find(_._1.equalsIgnoreCase(cn)).getOrElse(
        throw new IllegalArgumentException(
          s"unknown column $cn on virtual stable ${st.name}"))
      table(tbl) // validate the source exists
      (cn, d._2, tbl, sc)
    }
    vtableDefs(name) =
      VtableDef(name, st.tsCol, cols, using = Some(st.name))
    children(name) = Child(name, st.name, vals, mutable.ArrayBuffer())
  }

  /** Virtual-table read (virtualtablescanoperator.c:702 ts-aligned
    * column merge). Scale shape: columns of one declared type fold
    * into a single union+pivot hash aggregate (one shuffle regardless
    * of source count — the [[graft.ops.SourceOps.virtualTable]]
    * lowering); distinct-type groups then align on ts with full-outer
    * joins, one per extra type, not one per column. */
  private def vtableDf(v: VtableDef): DataFrame = {
    // unsourced columns (declared without FROM) read typed NULL
    val (sourced, unsourced) =
      v.cols.partition { case (_, _, tbl, _) => tbl.nonEmpty }
    val frames = sourced.groupBy { case (_, tp, _, _) => tp.toUpperCase }
      .toSeq.sortBy(_._1).map { case (_, cs) =>
        val dt = sparkType(cs.head._2)
        val tagged = cs.map { case (cn, _, tbl, sc) =>
          // a source token may name a SERIES alias (remote
          // external-source series) instead of a catalog table
          val (src, tsc) =
            v.series.find(_.alias.equalsIgnoreCase(tbl)) match {
              case Some(sd) =>
                val f = seriesFrame(sd)
                (f, if (f.columns.contains("ts")) "ts"
                    else f.columns.head)
              case None => (table(tbl), tsColOf(tbl))
            }
          src.select(col(tsc).as("_vts"),
            lit(cn).as("_vsrc"), col(sc).cast(dt).as("_vv"))
        }.reduce(_ unionByName _)
        tagged.groupBy(col("_vts")).agg(
          max(when(col("_vsrc") === cs.head._1, col("_vv")))
            .as(cs.head._1),
          cs.tail.map { case (cn, _, _, _) =>
            max(when(col("_vsrc") === cn, col("_vv"))).as(cn) }: _*)
      }
    // a vtable with NO sourced columns reads as zero rows with the
    // declared schema (test_vtable_child_colref_after_alter.py
    // `vctb_empty` → 0 rows × full column set)
    val joined =
      if (frames.isEmpty)
        spark.range(0).select(col("id").as(v.tsCol))
      else frames
        .reduce((a, b) => a.join(b, Seq("_vts"), "full_outer"))
        .withColumnRenamed("_vts", v.tsCol)
    val base = unsourced
      .foldLeft(joined) { case (d, (cn, tp, _, _)) =>
        d.withColumn(cn, lit(null).cast(sparkType(tp))) }
      .select((v.tsCol +: v.cols.map(_._1)).map(col): _*)
    // a virtual CHILD (USING vstb) also exposes its inherited tags and
    // tbname, exactly like a regular child table — tag refs resolve to
    // the source child's CURRENT value here, at read time
    v.using match {
      case Some(stName) =>
        val st = stables(stName)
        val c = children(v.name)
        // unmapped vstable columns read as typed NULLs, so every
        // child exposes the FULL inherited schema (union-safe for the
        // virtual-stable read)
        val full = st.colDefs
          .filter { case (n, _) => !n.equalsIgnoreCase(st.tsCol) &&
            !v.cols.exists(_._1.equalsIgnoreCase(n)) }
          .foldLeft(base) { case (d, (n, t)) =>
            d.withColumn(n, lit(null).cast(sparkType(t))) }
        // subtable wildcard rules apply to virtual children too:
        // tags/tbname resolve by name but stay out of `*`
        st.tags.fields.zip(c.tagVals).foldLeft(full) {
          case (d, (f, tv)) =>
            d.withColumn(f.name, lit(resolveTagVal(tv)).cast(f.dataType))
        }.withColumn("tbname", lit(v.name))
          .select((st.colDefs.map(_._1).map(col) ++
            st.tagDefs.map(_._1).map(tn =>
              col(tn).as(tn, GraftCatalog.HiddenTagMeta)) :+
            col("tbname").as("tbname", GraftCatalog.HiddenMeta)): _*)
      case None => base
    }
  }

  private val fnCreateRe =
    ("(?i)^CREATE (?:OR REPLACE )?(AGGREGATE )?FUNCTION " +
      "(?:IF NOT EXISTS )?([A-Za-z_][A-Za-z0-9_]*) AS '([^']+)' " +
      "OUTPUTTYPE ([A-Za-z0-9()]+)(?: BUFSIZE (\\d+))?" +
      "(?: LANGUAGE '([^']*)')?$").r

  /** CREATE [AGGREGATE] FUNCTION name AS '<impl>' OUTPUTTYPE t
    * [LANGUAGE 'lang'] (sql.y:1589): binds a
    * [[graft.functions.UdfRegistry]] implementation into the Spark
    * function registry under `name`, so dialect expressions resolve it
    * like any built-in. LANGUAGE 'sql' marks the AS clause as a
    * USER-SUPPLIED expression body over args a0..aN (the udfd.c /
    * taospyudf.cpp user-script path), compiled at create time. */
  private def createFunction(stmt: String): Unit = stmt match {
    case fnCreateRe(agg, name0, impl, outType, bufSize, lang) =>
      val name = bare(name0)
      if (Option(lang).exists(_.equalsIgnoreCase("sql")))
        graft.functions.UdfRegistry.bindBody(spark, name, impl)
      else
        graft.functions.UdfRegistry.bind(spark, name, impl, agg != null)
      udfDefs(name) = UdfDef(name, impl, agg != null,
        outType.toUpperCase,
        Option(bufSize).map(_.toInt).getOrElse(0))
    case _ => throw new IllegalArgumentException(
      s"cannot parse CREATE FUNCTION: $stmt")
  }

  private def stripIfNotExists(rest: String): String = {
    val up = rest.toUpperCase
    if (up.startsWith("IF NOT EXISTS "))
      rest.substring("IF NOT EXISTS ".length)
    else rest
  }

  /** CREATE DATABASE [IF NOT EXISTS] db [… PRECISION 'ms'|'us'|'ns' …]
    * (sql.y:923 PRECISION option; other options are accepted and
    * ignored — replication/retention are cluster knobs Spark owns). */
  private def createDatabase(stmt: String): Unit = {
    val rest = stripIfNotExists(stmt.substring("CREATE DATABASE".length).trim)
    val name = bare(rest.split("\\s+")(0))
    val per = "(?i)PRECISION\\s+'(ms|us|ns)'".r.findFirstMatchIn(rest)
      .map(_.group(1).toLowerCase match {
        case "ms" => 1000L
        case "us" => 1000000L
        case "ns" => 1000000000L
      }).getOrElse(1000000L)
    // KEEP d (sql.y db_options): retention horizon in db ticks; bare
    // integers are DAYS (the reference's KEEP unit), suffixed values
    // are dialect durations
    val keep = "(?i)KEEP\\s+(\\d+[uasmhdw]?)".r.findFirstMatchIn(rest)
      .map { m =>
        val t = m.group(1)
        if (t.last.isDigit) GraftSql.durNative(t + "d", per)
        else GraftSql.durNative(t, per)
      }
    databases(name) = Database(name, per, keep)
    currentDb = name
  }

  private def colDefs(body: String): Seq[(String, String)] =
    GraftSql.splitArgs(body).map { d =>
      val parts = d.trim.split("\\s+", 2)
      require(parts.length == 2, s"bad column definition: $d")
      // trailing options (PRIMARY KEY, ENCODE/COMPRESS/LEVEL) ride in
      // the type text and are ignored by sparkType's prefix match
      (parts(0), parts(1))
    }

  /** CREATE STABLE st (ts TIMESTAMP, …) TAGS (t1 T, …)
    * (sql.y:1066-1092). */
  private def createStable(stmt: String): Unit = {
    val rest0 = stmt.substring("CREATE STABLE".length).trim
    val ifNotExists = rest0.toUpperCase.startsWith("IF NOT EXISTS ")
    val rest = stripIfNotExists(rest0)
    val name = bare(rest.split("[\\s(]")(0))
    // re-creating an existing stable is an ERROR without IF NOT EXISTS
    // (mndStb.c TSDB_CODE_MND_STB_ALREADY_EXIST) and a no-op with it —
    // never a silent replace: a replace would leave existing children's
    // tag values misaligned against the new tag schema
    if (stables.contains(name)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(
        s"STable already exists in db: $name")
    }
    val o1 = rest.indexOf('(')
    val (colsBody, after) = parenGroup(rest, o1)
    val tail = rest.substring(after).trim
    require(tail.toUpperCase.startsWith("TAGS"),
      s"CREATE STABLE needs TAGS(…): $stmt")
    val (tagsBody, afterTags) = parenGroup(tail, tail.indexOf('('))
    var own = Stable(name, currentDb, colDefs(colsBody), colDefs(tagsBody))
    // VIRTUAL n table option (sql.y table_options; 05-VirtualTables):
    // marks a virtual super table — children are CREATE VTABLE … USING
    // subtables whose columns are sourced from other tables
    var post = tail.substring(afterTags).trim
    val vm = "(?i)\\bVIRTUAL\\s+(\\d+)".r.findFirstMatchIn(post)
    val virtualN = vm.map(_.group(1).toInt).getOrElse(0)
    vm.foreach(m => post =
      (post.substring(0, m.start) + post.substring(m.end)).trim)
    // BASE ON parent[, parent]… (sql.y:1069-1071
    // createCreateInheritedStableStmt; 05-virtualtable.md:7-35): the
    // child inherits every parent column and tag, its own appended
    // after the inherited ones, duplicates-by-name collapsing to the
    // first (parent-order) definition
    val baseRe = "(?i)^BASE ON\\s+(.+?)$".r
    post match {
      case baseRe(parentsTxt) =>
        val parents = GraftSql.splitArgs(parentsTxt).map(_.trim)
          .map(p => stables.getOrElse(bare(p),
            throw new IllegalArgumentException(
              s"BASE ON parent stable not found: $p")))
        def mergeDefs(inherited: Seq[Seq[(String, String)]],
            ownDefs: Seq[(String, String)]): Seq[(String, String)] =
          (inherited.flatten ++ ownDefs).foldLeft(
            Vector.empty[(String, String)]) { (acc, d) =>
              if (acc.exists(_._1.equalsIgnoreCase(d._1))) acc
              else acc :+ d }
        own = Stable(name, currentDb,
          mergeDefs(parents.map(_.colDefs), own.colDefs),
          mergeDefs(parents.map(_.tagDefs), own.tagDefs),
          parents = parents.map(_.name))
      case _ =>
    }
    // check the DECLARED type text, not the mapped Spark type —
    // BIGINT also maps to LongType but the reference rejects it
    // (TSDB_CODE_PAR_INVALID_FIRST_COLUMN)
    require(own.colDefs.nonEmpty &&
        own.colDefs.head._2.trim.toUpperCase.startsWith("TIMESTAMP"),
      "first column must be the TIMESTAMP primary key")
    val (uid, seq) = nextStableIds()
    stables(name) = own.copy(virtualN = virtualN, uid = uid,
      createSeq = seq)
  }

  /** CREATE TABLE child USING st [(tagNames)] TAGS (v, …)
    * (sql.y:1176-1177), or a plain CREATE TABLE t (cols) — modeled as
    * a tagless stable with one child of the same name. */
  private def createTable(stmt: String): Unit = {
    val rest1 = stmt.substring("CREATE TABLE".length).trim
    val ifNotExists = rest1.toUpperCase.startsWith("IF NOT EXISTS ")
    val rest = stripIfNotExists(rest1)
    // CREATE TABLE [IF NOT EXISTS] USING stb (fields) FILE 'path' — no
    // table name before USING: the children come from the CSV
    if (rest.toUpperCase.startsWith("USING ")) {
      createChildrenFromFile(rest)
      return
    }
    val usingAt = " USING ".r.findFirstMatchIn(rest.toUpperCase)
      .map(_.start)
    usingAt match {
      case Some(at) =>
        val child = bare(rest.substring(0, at).trim)
        if (children.contains(child)) {
          if (ifNotExists) return
          throw new IllegalArgumentException(
            s"Table already exists in db: $child")
        }
        val tail = rest.substring(at + " USING ".length).trim
        val stTok = tail.split("[\\s(]")(0)
        makeChild(child, bare(stTok), tail.substring(stTok.length).trim)
      case None =>
        val name = bare(rest.split("[\\s(]")(0))
        require(rest.indexOf('(') >= 0,
          s"CREATE TABLE needs (columns) or USING: $stmt")
        val (body, afterCols) = parenGroup(rest, rest.indexOf('('))
        // `CREATE TABLE st (cols) TAGS (tags)` IS a super-table
        // creation — sql.y treats the TABLE and STABLE spellings
        // identically when a TAGS clause follows (createTableStmt vs
        // createStableStmt share create_table_args)
        if (rest.substring(afterCols).trim.toUpperCase
            .startsWith("TAGS")) {
          createStable("CREATE STABLE " + rest)
          return
        }
        if (stables.contains(name) || children.contains(name)) {
          if (ifNotExists) return
          throw new IllegalArgumentException(
            s"Table already exists in db: $name")
        }
        val defs = colDefs(body)
        // the reference rejects a non-TIMESTAMP leading column
        // (TSDB_CODE_PAR_INVALID_FIRST_COLUMN) — without this, a
        // foreign-engine CREATE (`push_t (val INT, …)`) would build a
        // table whose later DELETE crashes on the Int "ts" key
        // declared type text, not mapped Spark type — BIGINT also
        // maps to LongType but the reference rejects it
        require(defs.nonEmpty &&
            defs.head._2.trim.toUpperCase.startsWith("TIMESTAMP"),
          "first column must be the TIMESTAMP primary key")
        val (uid, seq) = nextStableIds()
        stables(name) = Stable(name, currentDb, defs, Nil,
          uid = uid, createSeq = seq)
        children(name) = Child(name, name, Nil, mutable.ArrayBuffer())
    }
  }

  /** Lines of a FILE csv as value lists: the reference CSV dialect
    * (parInsertSql.c csv path; 10-insert.md:54) — comma-separated,
    * values optionally single-quoted, no header. Lines split with the
    * same quote-aware splitter as SQL argument lists, so quoted
    * commas survive. Driver-side by design: FILE is the reference's
    * *client batch* spelling (like VALUES); distributed bulk load is
    * INSERT…SELECT over a FILE table (SourceOps.fileTable). */
  private def csvRows(path: String): Seq[Seq[String]] =
    spark.read.textFile(path).collect().toSeq
      .map(_.trim).filter(_.nonEmpty)
      .map(l => GraftSql.splitArgs(l).map(_.trim))

  /** `CREATE TABLE [IF NOT EXISTS] USING stb (fields) FILE 'path'`
    * (sql.y:1064-1065 createCreateSubTableFromFileClause;
    * 03-table.md:80-90): batch-create one child per CSV line. The
    * field list orders the CSV columns, must include `tbname`, and
    * may list zero or more of the stable's tags; unlisted tags are
    * NULL. Existing children are left untouched (idempotent). */
  private def createChildrenFromFile(rest0: String): Unit = {
    val tail = rest0.substring("USING ".length).trim
    val stTok = tail.split("[\\s(]")(0)
    val st = stables.getOrElse(bare(stTok),
      throw new IllegalArgumentException(s"unknown stable: $stTok"))
    var p = tail.substring(stTok.length).trim
    require(p.startsWith("("),
      s"CREATE TABLE USING … FILE needs a (field list): $rest0")
    val (body, after) = parenGroup(p, 0)
    val fields = GraftSql.splitArgs(body).map(f => bare(f.trim).toLowerCase)
    p = p.substring(after).trim
    require(p.toUpperCase.startsWith("FILE"),
      s"expected FILE 'path' after the field list: $p")
    val path = literal(p.substring("FILE".length).trim, StringType).toString
    require(fields.contains("tbname"),
      s"field list must include tbname: ($body)")
    require(fields.distinct.length == fields.length,
      s"duplicate field in list: ($body)")
    fields.foreach(f => require(f == "tbname" ||
      st.tagDefs.exists(_._1.equalsIgnoreCase(f)),
      s"$f is not a tag of ${st.name}"))
    val tbIdx = fields.indexOf("tbname")
    csvRows(path).foreach { vals =>
      require(vals.length == fields.length,
        s"CSV arity ${vals.length} != field list ${fields.length}: $vals")
      val child = literal(vals(tbIdx), StringType).toString
      val byName = fields.zip(vals).toMap - "tbname"
      val tagVals = st.tagDefs.map { case (n, t) =>
        byName.collectFirst { case (f, v) if n.equalsIgnoreCase(f) =>
          literal(v, sparkType(t)) }.orNull
      }
      if (!children.contains(child))
        children(child) =
          Child(child, st.name, tagVals, mutable.ArrayBuffer())
    }
  }

  /** Parse `[(tagNames)] TAGS (vals)` after `USING st` and create the
    * child bound to those tag values (missing named tags → null). */
  private def makeChild(child: String, stName: String,
      tagPart: String): Unit = {
    val st = stables.getOrElse(stName,
      throw new IllegalArgumentException(s"unknown stable: $stName"))
    var rest = tagPart.trim
    val names: Seq[String] =
      if (rest.startsWith("(")) {
        val (body, after) = parenGroup(rest, 0)
        rest = rest.substring(after).trim
        GraftSql.splitArgs(body).map(_.trim)
      } else st.tagDefs.map(_._1)
    require(rest.toUpperCase.startsWith("TAGS"),
      s"USING needs TAGS(…): $tagPart")
    val (valsBody, _) = parenGroup(rest, rest.indexOf('('))
    val vals = GraftSql.splitArgs(valsBody)
    require(vals.length == names.length,
      s"TAGS arity ${vals.length} != ${names.length} for $child")
    val byName = names.zip(vals).toMap
    val tagVals = st.tagDefs.map { case (n, t) =>
      byName.get(n).map(v => literal(v, sparkType(t))).orNull
    }
    children(child) = Child(child, stName, tagVals, mutable.ArrayBuffer())
  }

  /** INSERT INTO tb1 [USING st [(tagNames)] TAGS(…)] [(cols)] VALUES
    * (…)+ [tb2 … VALUES (…)+ …] — the reference's multi-table insert
    * fast path (sql.y:1889-1891, parInsertSql.c) with auto-create
    * child semantics. Unlisted bound columns land NULL; duplicate-ts
    * rows resolve last-writer-wins on read. */
  private def insert(stmt: String): Unit = {
    var rest = stmt.substring("INSERT INTO".length).trim
    // `now`/`today` in VALUES (parInsertSql.c NOW/TODAY tokens, with
    // ± duration arithmetic): one instant per STATEMENT, as the
    // reference evaluates it
    val nowTicks = System.currentTimeMillis() * (perSecond / 1000L)
    val todayTicks = nowTicks - Math.floorMod(nowTicks, perSecond * 86400L)
    val nowRe =
      "(?i)^(now|today)(?:\\(\\))?(?:\\s*([+-])\\s*(\\d+[a-z]?))?$".r
    // absolute epoch base with offset arithmetic (`1626739200000 + 1`,
    // `1626739200000 + 1h`) — same TK_NK_INTEGER ± duration shape the
    // reference parses in ts positions (parInsertSql.c:1695)
    val absRe = "^(\\d{9,})\\s*([+-])\\s*(\\d+[a-z]?)$".r
    def offsetTicks(x: String): Long =
      // a unitless offset is raw ticks at the table's precision
      if (x.last.isDigit) x.toLong
      else GraftSql.durNative(x, perSecond)
    // quoted datetime/epoch base with offset arithmetic
    // (`'2023-12-05 23:59:59.999' + 2a`, `'1704067200000' + 1s` —
    // parInsertSql ts-position duration arithmetic over any ts
    // literal spelling)
    val litRe = "^('[^']*')\\s*([+-])\\s*(\\d+[a-z]?)$".r
    def resolveNow(v: String): String = v.trim match {
      case nowRe(base, sgn, d) =>
        val b = if (base.equalsIgnoreCase("today")) todayTicks else nowTicks
        val delta = Option(d).map(offsetTicks).getOrElse(0L)
        (if (sgn == "-") b - delta else b + delta).toString
      case absRe(base, sgn, d) =>
        val delta = offsetTicks(d)
        (if (sgn == "-") base.toLong - delta
         else base.toLong + delta).toString
      case litRe(lit, sgn, d) =>
        val inner = lit.stripPrefix("'").stripSuffix("'").trim
        val b =
          if (inner.matches("-?\\d+")) inner.toLong
          else GraftSql.tsLitTicks(lit, perSecond)
            .getOrElse(parseTs(inner))
        val delta = offsetTicks(d)
        (if (sgn == "-") b - delta else b + delta).toString
      case other => other
    }
    while (rest.nonEmpty) {
      val tok = rest.split("[\\s(]")(0)
      val name = bare(tok)
      rest = rest.substring(tok.length).trim
      // a bound-column list may PRECEDE the USING clause
      // (test_priv_rbac.py `insert into ctb (ts,c0) using stb
      // tags(10) values(…)` — parInsertSql accepts either order)
      var preBound: Option[Seq[String]] = None
      if (rest.startsWith("(")) {
        val (body, after) = parenGroup(rest, 0)
        if (rest.substring(after).trim.toUpperCase.startsWith("USING ")) {
          preBound = Some(GraftSql.splitArgs(body).map(_.trim))
          rest = rest.substring(after).trim
        }
      }
      // optional USING st [(tagNames)] TAGS(...)
      if (rest.toUpperCase.startsWith("USING ")) {
        val tail = rest.substring("USING ".length).trim
        val stTok = tail.split("[\\s(]")(0)
        val stName = bare(stTok)
        var p = tail.substring(stTok.length).trim
        val tagPartStart = p
        // consume optional (tagNames)
        if (p.startsWith("(")) p = p.substring(parenGroup(p, 0)._2).trim
        require(p.toUpperCase.startsWith("TAGS"),
          s"INSERT USING needs TAGS(…): $stmt")
        val afterTags = parenGroup(p, p.indexOf('('))._2
        val consumed = tagPartStart.length - (p.length - afterTags)
        if (!children.contains(name))
          makeChild(name, stName, tagPartStart.substring(0, consumed))
        rest = tagPartStart.substring(consumed).trim
      }
      // optional bound-column list BEFORE resolving the target kind —
      // INSERT … SELECT may target a stable by tbname routing
      var boundCols: Option[Seq[String]] = preBound
      if (boundCols.isEmpty && rest.startsWith("(")) {
        val (body, after) = parenGroup(rest, 0)
        // parenthesized insert-from-query: INSERT INTO dst (SELECT …)
        // (test_join.py:1063, test_fun_select_last_row.py:1402) —
        // not a bound-column list. Word boundary required: a bound
        // column list whose first column NAME begins with "select"
        // (INSERT INTO t (selection, ts) …) must not be misrouted
        if (body.trim.matches("(?is)^SELECT\\b.*")) {
          insertSelect(name, None, body.trim)
          val tail = rest.substring(after).trim
          require(tail.isEmpty,
            s"unexpected text after INSERT (SELECT …): $tail")
          rest = ""
          return
        }
        boundCols = Some(GraftSql.splitArgs(body).map(_.trim))
        rest = rest.substring(after).trim
      }
      if (rest.toUpperCase.startsWith("SELECT")) {
        // INSERT INTO dst [(cols)] SELECT … (parInsertSql.c insert-
        // from-query): the rest of the statement is the select
        insertSelect(name, boundCols, rest)
        rest = ""
        return
      }
      val c = children.getOrElse(name,
        throw new IllegalArgumentException(
          s"unknown table $name (add USING st TAGS(…) to auto-create)"))
      val st = stables(c.stableName)
      val cols: Seq[String] = boundCols.getOrElse(st.colDefs.map(_._1))
      def addRow(vals0: Seq[String], what: String): Unit = {
        val vals = vals0.map(resolveNow)
        require(vals.length == cols.length,
          s"$what arity ${vals.length} != columns ${cols.length}")
        val byName = cols.zip(vals).toMap
        val row = st.colDefs.map { case (n, t) =>
          byName.get(n).map(v => literal(v, sparkType(t))).orNull
        }
        seqCounter += 1
        c.rows += ((row, seqCounter))
      }
      if (rest.toUpperCase.startsWith("FILE")) {
        // INSERT INTO tb [USING …] [(cols)] FILE 'path'
        // (parInsertSql.c:2053; 10-insert.md:150-157): CSV data rows,
        // same bound-column + auto-create semantics as VALUES
        val after = rest.substring("FILE".length).trim
        require(after.startsWith("'"), s"FILE needs a quoted path: $rest")
        val endQ = after.indexOf('\'', 1)
        require(endQ > 0, s"unterminated FILE path: $rest")
        val path = after.substring(1, endQ)
        rest = after.substring(endQ + 1).trim
        csvRows(path).foreach(addRow(_, "FILE row"))
      } else {
        require(rest.toUpperCase.startsWith("VALUES"),
          s"expected VALUES or FILE in INSERT: $rest")
        rest = rest.substring("VALUES".length).trim
        while (rest.startsWith("(")) {
          val (tuple, after) = parenGroup(rest, 0)
          rest = rest.substring(after).trim
          addRow(GraftSql.splitArgs(tuple), "VALUES")
        }
      }
    }
  }

  /** INSERT INTO dst [(cols)] SELECT … — rows from a dialect select
    * append to the target, columns matched positionally against the
    * bound list (or the target's full column set). A STABLE target
    * routes per row by a `tbname` output column, auto-creating unknown
    * children with NULL tags (parInsertSql.c insert-from-query;
    * 10-insert.md). Catalog tables are driver-resident buffers, so the
    * collect here is the storage write, not a scale path. */
  private def insertSelect(target: String, boundCols: Option[Seq[String]],
      select: String): Unit = {
    var out = sql(select)
    if (children.contains(target)) {
      val c = children(target)
      val st = stables(c.stableName)
      val cols = boundCols.getOrElse(st.colDefs.map(_._1))
      // `SELECT *` on a child/normal-table read exposes the inherited
      // tags + tbname as trailing ride-along columns; the reference's
      // subtable `*` is data columns only (20-select.md wildcard
      // rules) — trim when the tail is exactly tag/tbname names
      if (out.columns.length > cols.length) {
        val tail = out.columns.drop(cols.length)
        // the ride-along tags belong to the stable the SELECT actually
        // read — resolve the first FROM name to its stable; fall back
        // to the target's own stable. Matching against EVERY stable's
        // tags would silently drop a data column that merely collides
        // with some other stable's tag name.
        val srcStable = "(?i)\\bFROM\\s+([A-Za-z_][\\w.]*)".r
          .findFirstMatchIn(select)
          .map(_.group(1).split("\\.").last.toLowerCase)
          .flatMap { n =>
            children.get(n).map(ch => stables(ch.stableName))
              .orElse(stables.get(n))
          }.getOrElse(st)
        val tagish = srcStable.tagDefs.map(_._1).toSet
        if (tail.forall(t => t.equalsIgnoreCase("tbname") ||
            tagish.exists(_.equalsIgnoreCase(t))))
          out = out.select(out.columns.take(cols.length).map(col): _*)
      }
      val data = out.collect()
      require(out.columns.length == cols.length,
        s"INSERT SELECT arity ${out.columns.length} != ${cols.length}")
      data.foreach { r =>
        val byName = cols.zip(r.toSeq).toMap
        val row = st.colDefs.map { case (n, _) => byName.get(n).orNull }
        seqCounter += 1
        c.rows += ((row, seqCounter))
      }
    } else {
      val st = stables.getOrElse(target,
        throw new IllegalArgumentException(s"unknown table $target"))
      val cols = boundCols.getOrElse("tbname" +: st.colDefs.map(_._1))
      require(cols.contains("tbname"),
        "INSERT INTO stable … SELECT needs a tbname column")
      require(out.columns.length == cols.length,
        s"INSERT SELECT arity ${out.columns.length} != ${cols.length}")
      val tbIdx = cols.indexOf("tbname")
      val data = out.collect()
      data.foreach { r =>
        val tb = String.valueOf(r.get(tbIdx))
        if (!children.contains(tb))
          children(tb) = Child(tb, target,
            st.tagDefs.map(_ => null), mutable.ArrayBuffer())
        val c = children(tb)
        val byName = cols.zip(r.toSeq).toMap - "tbname"
        val row = st.colDefs.map { case (n, _) => byName.get(n).orNull }
        seqCounter += 1
        c.rows += ((row, seqCounter))
      }
    }
  }

  /** CREATE STREAM name [options] INTO out AS select
    * (sql.y:1623-1711): trigger/watermark options ride in the saved
    * definition; the SELECT is the calc query. */
  private def createStream(stmt: String): Unit = {
    val rest = stripIfNotExists(stmt.substring("CREATE STREAM".length).trim)
    val tok = rest.split("\\s+")(0)
    val name = bare(tok)
    val up = rest.toUpperCase
    val intoAt = up.indexOf(" INTO ")
    if (intoAt < 0) {
      // notification-only stream (sql.y stream_into_opt is OPTIONAL
      // when a NOTIFY clause is present; 14-stream.md event push):
      // there is no result table — the trigger fires notifications
      require("(?i)\\bNOTIFY\\s*\\(".r.findFirstIn(rest).isDefined,
        s"CREATE STREAM needs INTO (or a NOTIFY sink): $stmt")
      streamDefs(name) = StreamDef(name,
        rest.substring(tok.length).trim, into = "", select = "")
      return
    }
    val asAt = up.indexOf(" AS ", intoAt)
    require(asAt > 0, s"CREATE STREAM needs AS <select>: $stmt")
    val options = rest.substring(tok.length, intoAt).trim
    val intoSeg = rest.substring(intoAt + " INTO ".length, asAt).trim
    // OUTPUT_SUBTABLE(expr) names each partition's result child table
    // (sql.y stream_into_opt); it sits between INTO tbl and AS
    val subRe = "(?i)\\bOUTPUT_SUBTABLE\\s*\\((.*)\\)\\s*$".r
    val outputSubtable = subRe.findFirstMatchIn(intoSeg).map(_.group(1))
    val into = bare(subRe.replaceAllIn(intoSeg, "").trim)
    val select = rest.substring(asAt + " AS ".length).trim
    streamDefs(name) =
      StreamDef(name, options, into, select,
        outputSubtable = outputSubtable)
  }

  /** New-stream calc form (sql.y:1623; 18-StreamProcessing cases):
    * `CREATE STREAM s <trigger-window> FROM ttbl [PARTITION BY keys]
    * [STREAM_OPTIONS(…)] INTO out AS SELECT … FROM %%trows [WHERE …]`.
    * For batch materialization the trigger window IS the calc
    * grouping — %%trows holds exactly the trigger window's rows — so
    * the calc lowers to ONE windowed query over the trigger table
    * with the placeholder spellings mapped: `_twstart`/`_twend` →
    * `_wstart`/`_wend`, `_twrownum` → count(1), `%%tbname` → tbname,
    * `%%n` → the n-th PARTITION BY key. */
  private def trowsSelect(sd: StreamDef): String = {
    if (!sd.select.toLowerCase.contains("%%trows")) return sd.select
    val om = "(?i)^(.*?)\\bFROM\\s+([A-Za-z0-9_.`]+)(.*)$".r
      .findFirstMatchIn(sd.options).getOrElse(
        throw new IllegalArgumentException(
          s"stream ${sd.name}: %%trows needs FROM <trigger table>"))
    // the trigger-window clause precedes FROM; STREAM_OPTIONS and
    // PARTITION BY trail it. A bare SLIDING(x) trigger (no INTERVAL)
    // fires every x with %%trows = the rows since the last fire —
    // batch-equivalent to tumbling INTERVAL(x) windows.
    val winClause0 = om.group(1).trim
    val winClause =
      if ("(?i)^SLIDING\\s*\\(([^,)]+)\\)$".r.matches(winClause0))
        winClause0.replaceAll("(?i)^SLIDING", "INTERVAL")
      else winClause0
    val trig = bare(om.group(2)).split('.').last
    val tail = om.group(3)
    // keys are comma-joined identifiers; requiring a comma between
    // them stops the capture BEFORE a trailing keyword (a \s in the
    // char class would greedily swallow e.g. " STREAM_OPTIONS")
    val partKeys = ("(?i)PARTITION BY\\s+([A-Za-z_][A-Za-z0-9_]*" +
      "(?:\\s*,\\s*[A-Za-z_][A-Za-z0-9_]*)*)").r
      .findFirstMatchIn(tail).map(m => GraftSql.splitArgs(m.group(1))
        .map(_.trim).filter(_.nonEmpty)).getOrElse(Seq.empty)
    val sm = "(?i)^SELECT\\s+(.*?)\\s+FROM\\s+%%trows\\b(.*)$".r
      .findFirstMatchIn(sd.select).getOrElse(
        throw new IllegalArgumentException(
          s"stream ${sd.name}: calc must be SELECT … FROM %%trows"))
    def mapPlaceholders(s: String): String = {
      var r = s
      r = r.replaceAll("(?i)(?<![A-Za-z0-9_])_twstart(?![A-Za-z0-9_])",
        "_wstart")
      r = r.replaceAll("(?i)(?<![A-Za-z0-9_])_twend(?![A-Za-z0-9_])",
        "_wend")
      r = r.replaceAll("(?i)(?<![A-Za-z0-9_])_twrownum(?![A-Za-z0-9_])",
        "count(1)")
      r = r.replaceAll("(?i)%%tbname", "tbname")
      "%%(\\d+)".r.replaceAllIn(r, m => {
        val i = m.group(1).toInt
        require(i >= 1 && i <= partKeys.length,
          s"%%$i exceeds the PARTITION BY key list")
        partKeys(i - 1)
      })
    }
    val list = mapPlaceholders(sm.group(1))
    val calcTail = mapPlaceholders(sm.group(2).trim)
    val part = if (partKeys.isEmpty) ""
      else s" PARTITION BY ${partKeys.mkString(", ")}"
    s"SELECT $list FROM $trig" +
      (if (calcTail.nonEmpty) s" $calcTail" else "") +
      part + " " + winClause
  }

  /** RECALCULATE STREAM [db.]name FROM start [TO end] (sql.y:1628;
    * docs/41-stream.md:864): re-runs the saved calc over the source
    * rows in [start, end) — bounds aligned OUT to the stream's
    * INTERVAL grid so boundary windows recompute whole — and swaps
    * exactly those output windows in the INTO table, preserving
    * output outside the range. The catalog-materialized mirror of
    * [[graft.streaming.Streams.recalcRange]] (same merge contract,
    * parquet path there, catalog table here). Bounds are epoch ticks
    * at the db precision or quoted 'yyyy-MM-dd HH:mm:ss' literals. */
  private def recalcStream(stmt: String): Unit = {
    val rest = stmt.substring("RECALCULATE STREAM".length).trim
    val re = "(?i)^(\\S+)\\s+FROM\\s+(.+?)(?:\\s+TO\\s+(.+))?$".r
    val (name, t0Raw, t1Raw) = rest match {
      case re(nm, f, t) =>
        (bare(nm).split('.').last, f.trim, Option(t).map(_.trim))
      case _ => throw new IllegalArgumentException(
        s"RECALCULATE STREAM needs FROM start [TO end]: $stmt")
    }
    val sd = streamDefs.getOrElse(name,
      throw new IllegalArgumentException(s"unknown stream: $name"))
    def ticks(s: String): Long =
      if (s.startsWith("'")) parseTs(s.stripPrefix("'").stripSuffix("'"))
      else s.toLong
    var t0 = ticks(t0Raw)
    var t1 = t1Raw.map(ticks).getOrElse(Long.MaxValue)
    val effSelect = trowsSelect(sd)
    "(?i)INTERVAL\\s*\\(\\s*([^),]+)\\s*\\)".r
      .findFirstMatchIn(effSelect).foreach { m =>
        val iv = GraftSql.durNative(m.group(1).trim, perSecond)
        t0 = Math.floorDiv(t0, iv) * iv
        if (t1 != Long.MaxValue)
          t1 = Math.floorDiv(t1 + iv - 1, iv) * iv
      }
    val lo = t0; val hi = t1
    // the recalc range bounds ONLY the stream's source table (the
    // primary FROM table of the saved select) — a joined dimension or
    // second table that happens to carry a ts column must stay
    // unrestricted, or the recomputed windows see truncated inputs
    val sourceTable = "(?i)\\bFROM\\s+([A-Za-z0-9_.`]+)".r
      .findFirstMatchIn(effSelect)
      .map(m => bare(m.group(1)).split('.').last.toLowerCase)
    val bounded: String => DataFrame = n => {
      val df = table(n)
      val isSource =
        sourceTable.contains(bare(n).split('.').last.toLowerCase)
      if (isSource && df.columns.contains("ts"))
        df.filter(col("ts") >= lo && col("ts") < hi)
      else df
    }
    val fresh = GraftSql.query(spark, bounded, effSelect,
      perSecond = perSecond)
    val outTs =
      if (fresh.columns.contains("_wstart")) "_wstart"
      else fresh.columns.head
    val merged = materialized.get(sd.into) match {
      case None => fresh
      case Some(ex) =>
        ex.filter(col(outTs) < lo || col(outTs) >= hi).unionByName(fresh)
    }
    materialized(sd.into) = merged
  }

  /** CREATE TOPIC name AS {subquery | DATABASE db | STABLE st}
    * (sql.y:1562-1580): registers the subscription subject; the
    * consume path is file-source Structured Streaming (the
    * `tmq_subscribe_gate` contract), so the catalog only owns the
    * definition + listing. */
  private def createTopic(stmt: String): Unit = {
    val rest = stripIfNotExists(stmt.substring("CREATE TOPIC".length).trim)
    val tok = rest.split("\\s+")(0)
    val name = bare(tok)
    var tail = rest.substring(tok.length).trim
    // `WITH META AS …` (sql.y with_meta_opt: subscribe schema changes
    // too) — a consume-side flag; the subject parse is unchanged
    tail = "(?i)^WITH\\s+META\\s+".r.replaceFirstIn(tail, "")
    require(tail.toUpperCase.startsWith("AS "),
      s"CREATE TOPIC needs AS <subject>: $stmt")
    topicDefs(name) = TopicDef(name, currentDb, tail.substring(3).trim)
  }

  /** ALTER STABLE st ADD/DROP/MODIFY COLUMN | ADD/DROP/MODIFY/RENAME
    * TAG (sql.y:1092-1175), and ALTER TABLE child SET TAG t=v [, …].
    * Existing rows see an added column as NULL; a dropped column's
    * stored values are discarded — the reference's schema-evolution
    * contract (schema version bump, old blocks padded on read). */
  private def alter(stmt: String): Unit = {
    val stmtUp = stmt.toUpperCase
    val onStable = stmtUp.startsWith("ALTER STABLE")
    val kw = if (onStable) "ALTER STABLE"
      else if (stmtUp.startsWith("ALTER VTABLE")) "ALTER VTABLE"
      else "ALTER TABLE"
    val rest = stmt.substring(kw.length).trim
    val tok = rest.split("\\s+")(0)
    val name = bare(tok)
    val action = rest.substring(tok.length).trim
    val up = action.toUpperCase
    if (up.startsWith("SET TAG ")) return setTags(name, action)
    // ALTER VTABLE v ADD SERIES id AS src (…) / REMOVE SERIES id
    // (sql.y:1131-1134 createAlterTableAddSeries/RemoveSeries)
    if (up.startsWith("ADD SERIES ")) {
      val v = vtableDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown VTABLE: $name"))
      val decls = parseSeriesDecls(action)
      require(decls.nonEmpty, s"cannot parse SERIES declaration: $action")
      decls.foreach(d => require(
        !v.series.exists(_.alias.equalsIgnoreCase(d.alias)),
        s"series ${d.alias} already declared on $name"))
      vtableDefs(name) = v.copy(series = v.series ++ decls)
      return
    }
    if (up.startsWith("REMOVE SERIES ")) {
      val v = vtableDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown VTABLE: $name"))
      val id = action.substring("REMOVE SERIES ".length).trim
      require(v.series.exists(_.alias.equalsIgnoreCase(id)),
        s"series not found on $name: $id")
      require(!v.cols.exists(_._3.equalsIgnoreCase(id)),
        s"series $id is referenced by a column of $name — " +
          s"redirect the column first")
      vtableDefs(name) = v.copy(series =
        v.series.filterNot(_.alias.equalsIgnoreCase(id)))
      return
    }
    // regular tables are modeled as a tagless stable of the same name,
    // so ALTER TABLE t ADD COLUMN … resolves to its stable
    require(stables.contains(name), s"unknown ${if (onStable) "stable"
      else "table"}: $name")
    val st = stables(name)
    def oneDef(s: String): (String, String) = {
      val p = s.trim.split("\\s+", 2)
      require(p.length == 2, s"bad column/tag definition: $s")
      (p(0), p(1))
    }
    def kids = children.values.filter(_.stableName == name)
    if (up.startsWith("ADD COLUMN ")) {
      val d = oneDef(action.substring("ADD COLUMN ".length))
      stables(name) = st.copy(colDefs = st.colDefs :+ d)
      kids.foreach(c => c.rows.mapInPlace {
        case (r, seq) => (r :+ null, seq) })
    } else if (up.startsWith("DROP COLUMN ")) {
      val cn = action.substring("DROP COLUMN ".length).trim
      val i = st.colDefs.indexWhere(_._1.equalsIgnoreCase(cn))
      require(i > 0, if (i == 0)
        s"cannot drop the TIMESTAMP primary key $cn" else
        s"unknown column $cn on $name")
      stables(name) = st.copy(colDefs =
        st.colDefs.patch(i, Nil, 1))
      kids.foreach(c => c.rows.mapInPlace {
        case (r, seq) => (r.patch(i, Nil, 1), seq) })
    } else if (up.startsWith("MODIFY COLUMN ")) {
      val d = oneDef(action.substring("MODIFY COLUMN ".length))
      val i = st.colDefs.indexWhere(_._1.equalsIgnoreCase(d._1))
      require(i >= 0, s"unknown column ${d._1} on $name")
      // storage-option-only modification (sql.y:1152-1156
      // alter_table_modify_options: `MODIFY COLUMN c ENCODE/COMPRESS/
      // LEVEL '…'` with no type) — a physical-layout hint; the
      // logical def stands
      if ("(?i)^(ENCODE|COMPRESS|LEVEL)\\b.*".r.matches(d._2)) ()
      else
        // the reference only allows widening var-length types — the
        // runtime representation is unchanged, so stored values stand
        stables(name) = st.copy(colDefs = st.colDefs.updated(i, d))
    } else if (up.startsWith("ADD TAG ")) {
      val d = oneDef(action.substring("ADD TAG ".length))
      stables(name) = st.copy(tagDefs = st.tagDefs :+ d)
      kids.toSeq.foreach(c =>
        children(c.name) = c.copy(tagVals = c.tagVals :+ null))
    } else if (up.startsWith("DROP TAG ")) {
      val tn = action.substring("DROP TAG ".length).trim
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(tn))
      require(i >= 0, s"unknown tag $tn on $name")
      stables(name) = st.copy(tagDefs = st.tagDefs.patch(i, Nil, 1))
      kids.toSeq.foreach(c =>
        children(c.name) = c.copy(tagVals = c.tagVals.patch(i, Nil, 1)))
    } else if (up.startsWith("RENAME COLUMN ")) {
      // ALTER TABLE t RENAME COLUMN old new (sql.y alter actions;
      // test_tmq_ts6379.py positive) — storage is positional, so the
      // rename is metadata-only
      val p = action.substring("RENAME COLUMN ".length).trim
        .split("\\s+")
      require(p.length == 2, s"RENAME COLUMN needs old new: $action")
      val i = st.colDefs.indexWhere(_._1.equalsIgnoreCase(p(0)))
      require(i > 0, if (i == 0)
        s"cannot rename the TIMESTAMP primary key ${p(0)}"
        else s"unknown column ${p(0)} on $name")
      stables(name) = st.copy(colDefs =
        st.colDefs.updated(i, (p(1), st.colDefs(i)._2)))
    } else if (up.startsWith("RENAME TAG ")) {
      val p = action.substring("RENAME TAG ".length).trim.split("\\s+")
      require(p.length == 2, s"RENAME TAG needs old new: $action")
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(p(0)))
      require(i >= 0, s"unknown tag ${p(0)} on $name")
      stables(name) = st.copy(tagDefs =
        st.tagDefs.updated(i, (p(1), st.tagDefs(i)._2)))
    } else if (up.startsWith("MODIFY TAG ")) {
      val d = oneDef(action.substring("MODIFY TAG ".length))
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(d._1))
      require(i >= 0, s"unknown tag ${d._1} on $name")
      stables(name) = st.copy(tagDefs = st.tagDefs.updated(i, d))
    } else if (("(?i)^(COMMENT\\s+'[^']*'|TTL\\s+\\d+|" +
        "KEEP\\s+\\d+[a-z]*|SECURITY_LEVEL\\s+\\d+)\\s*;?\\s*$")
        .r.matches(action)) {
      // table-level options (sql.y alter_table_options: COMMENT / TTL
      // / KEEP) — metadata-only hints; accepted, nothing changes in
      // the model
      ()
    } else throw new IllegalArgumentException(
      s"unsupported ALTER action: $action")
  }

  /** ALTER TABLE child SET TAG t1=v1 [, t2=v2 …] (sql.y:1160). On a
    * virtual child, `SET TAG t = tbl.tag` (an UNQUOTED table.tag
    * reference — sql.y:1121 createAlterTableAlterTagRef) converts the
    * tag to a dynamic [[TagRef]]; a literal value converts it back to
    * a static tag (02-Tag/test_vtable_alter_tag_ref.py). */
  private def setTags(childName: String, action: String): Unit = {
    val c = children.getOrElse(childName,
      throw new IllegalArgumentException(s"unknown table: $childName"))
    val st = stables(c.stableName)
    val isVirtual = vtableDefs.get(childName).exists(_.using.isDefined)
    val refRe = "^([A-Za-z_]\\w*)\\.([A-Za-z_]\\w*)$".r
    var vals = c.tagVals
    GraftSql.splitArgs(action.substring("SET TAG ".length)).foreach { kv =>
      val eq = kv.indexOf('=')
      require(eq > 0, s"SET TAG needs t=v: $kv")
      val tn = kv.substring(0, eq).trim
      val i = st.tagDefs.indexWhere(_._1.equalsIgnoreCase(tn))
      require(i >= 0, s"unknown tag $tn on ${st.name}")
      val vTxt = kv.substring(eq + 1).trim
      val v: Any = vTxt match {
        case refRe(tbl, tag) if isVirtual =>
          val srcC = children.getOrElse(tbl,
            throw new IllegalArgumentException(
              s"tag ref source table not found: $tbl"))
          require(stables(srcC.stableName).tagDefs
              .exists(_._1.equalsIgnoreCase(tag)),
            s"tag ref source tag not found: $tbl.$tag")
          TagRef(tbl, tag)
        case _ => literal(vTxt, sparkType(st.tagDefs(i)._2))
      }
      vals = vals.updated(i, v)
    }
    children(childName) = c.copy(tagVals = vals)
  }

  /** DELETE FROM tb [WHERE <ts conditions>] (sql.y:1896; the reference
    * only supports timestamp-range predicates on delete —
    * parTranslater.c checkDelete). No WHERE = delete all rows. */
  private def delete(stmt: String): Unit = {
    val rest = stmt.substring("DELETE FROM".length).trim
    val tok = rest.split("\\s+")(0)
    val name = bare(tok)
    val condTxt = {
      val t = rest.substring(tok.length).trim
      if (t.isEmpty) "" else {
        require(t.toUpperCase.startsWith("WHERE "),
          s"expected WHERE in DELETE: $stmt")
        t.substring("WHERE ".length).trim
      }
    }
    val targets: Seq[Child] =
      if (children.contains(name)) Seq(children(name))
      else if (stables.contains(name))
        children.values.filter(_.stableName == name).toSeq
      else throw new IllegalArgumentException(s"unknown table: $name")
    if (targets.isEmpty) return
    val tsCol = stables(targets.head.stableName).tsCol
    // `_c0` = the reference's first-column pseudonym (the ts key;
    // test_notify.py `delete from ct0 where _c0 = '…'`)
    val condTxt0 = condTxt
      .replaceAll("(?i)(?<![\\w])_c0(?![\\w])",
        java.util.regex.Matcher.quoteReplacement(tsCol))
    // conjunction of `ts <op> literal` predicates on the ts primary
    // key; `now`/`now()` resolves to the current ticks (sql.y NOW)
    val nowTicks = System.currentTimeMillis() * (perSecond / 1000L)
    // `==` is the C-style spelling of `=` (the reference's lexer maps
    // both to TK_EQ; test_abnormal_data_table.py deletes with `==`)
    val cmp = (s"(?i)\\b$tsCol\\b\\s*(==|<=|>=|<|>|=)\\s*" +
      "(cast\\s*\\([^)]*\\)|'[^']*'|\\S+)").r
    // `ts = cast(1668073288214 as timestamp)` (test_oldcase_state.py
    // positive): the cast folds to its ts-literal argument
    val castRe = "(?i)^cast\\s*\\(\\s*('[^']*'|\\S+?)\\s+as\\s+\\w+\\s*\\)$".r
    // `ts IS NULL` matches nothing (the primary key is never NULL;
    // test_write_delete.py:233 positive no-op), `IS NOT NULL` matches
    // everything — fold each to an always-false/true range conjunct
    val isNullRe =
      s"(?i)\\b$tsCol\\s+IS\\s+(NOT\\s+)?NULL".r
    val nullConds = isNullRe.findAllMatchIn(condTxt0).map { m =>
      if (m.group(1) == null) ("<", Long.MinValue) // matches nothing
      else (">=", Long.MinValue)                   // matches all
    }.toSeq
    val condTxt2 = isNullRe.replaceAllIn(condTxt0, "").trim
      .replaceAll("(?i)^AND\\s+|\\s+AND$", "").trim
    val preds = if (condTxt.isEmpty) Seq((">=", Long.MinValue)) else {
      val ps = nullConds ++ cmp.findAllMatchIn(condTxt2).map { m =>
        val raw = m.group(2) match {
          case castRe(inner) => inner
          case other => other
        }
        val v =
          if (raw.matches("(?i)now(\\(\\))?")) nowTicks
          else literal(raw, LongType).asInstanceOf[Long]
        (m.group(1), v)
      }.toSeq
      require(ps.nonEmpty && condTxt.toUpperCase.split("\\bAND\\b")
        .length == ps.length,
        s"DELETE supports only AND-ed $tsCol range predicates: $condTxt")
      ps
    }
    def hit(ts: Long): Boolean = preds.forall {
      case ("<", v) => ts < v
      case ("<=", v) => ts <= v
      case (">", v) => ts > v
      case (">=", v) => ts >= v
      case ("=" | "==", v) => ts == v
      case _ => false
    }
    targets.foreach(_.rows.filterInPlace {
      case (row, _) => !hit(row.head.asInstanceOf[Long])
    })
  }

  // ----------------------------------------------------------- reading

  /** Resolve a table name: external registration, stream output,
    * child table (rows + tags + tbname), or stable (union of its
    * children). This is the `resolve` to pass to [[GraftSql.query]]. */
  def table(name0: String): DataFrame = {
    val name = bare(name0)
    if (external.contains(name)) external(name)
    else if (materialized.contains(name)) materialized(name)
    else if (viewDefs.contains(name))
      GraftSql.query(spark, table, viewDefs(name), perSecond = perSecond)
    else if (vtableDefs.contains(name)) vtableDf(vtableDefs(name))
    else if (children.contains(name)) childDf(children(name))
    else if (stables.contains(name)) stableDf(name)
    // `FROM information_schema.ins_x` arrives here as `ins_x` (the
    // db qualifier is stripped); user tables of the same name shadow
    else if (name == "ins_databases") insDatabases
    else if (name == "ins_stables") insStables
    else if (name == "ins_tables") insTables
    else if (name == "ins_tags") insTags
    else if (name == "ins_vstable_inherits") insVstableInherits
    else if (name == "ins_columns") insColumns
    else if (name == "ins_streams") insStreams
    else if (name == "ins_topics") insTopics
    else if (name == "ins_functions") insFunctions
    else if (name == "ins_tsmas") insTsmas
    else if (name == "ins_rsmas") insRsmas
    else if (name == "ins_anodes") insAnodes
    else if (name == "ins_anodes_full") insAnodesFull
    else if (name == "ins_dnodes") insDnodes
    else if (name == "ins_users") insUsers
    else if (name == "ins_user_privileges") insUserPrivileges
    else if (name == "ins_cluster") insCluster
    else if (name == "ins_disk_usage") insDiskUsage
    else throw new IllegalArgumentException(s"unknown table: $name")
  }

  /** information_schema.ins_disk_usage (systable.c:695-704
    * diskUsageSchema; SHOW [db.]DISK_INFO, sql.y:1429): one row per
    * database's virtual group. The local engine has no tsdb file
    * tree, so the sizes are deterministic logical estimates from the
    * catalog's table counts — listings oracle-compare. */
  def insDiskUsage: DataFrame = {
    import spark.implicits._
    databases.keys.toSeq.zipWithIndex.map { case (db, i) =>
      val nTabs =
        children.values.count(c => stables(c.stableName).db == db).toLong
      (db, i + 2, nTabs * 1024L, nTabs * 4096L, 0L, 0L,
        256L, nTabs * 128L, 0L, nTabs * 8192L)
    }.toDF("db_name", "vgroup_id", "wal_size", "data1", "data2",
      "data3", "cache_rdb", "table_meta", "ss", "raw_data")
  }

  /** Stable read = ONE combined rows frame (upsert keyed on
    * (tbname, ts)) + ONE broadcast join against the tag dimension —
    * not an N-way union of per-child frames. The union form costs a
    * planner node per child (the reference fans a stable out to
    * millions of children); the dimension-join form is the same shape
    * the parquet-backed path uses: tags live in a small dim table
    * keyed by tbname (SURVEY §1.1). */
  /** Schema evolution can leave stored values typed under an OLD
    * column/tag definition (ALTER … MODIFY TAG/COLUMN changes the def;
    * the reference reinterprets old blocks on read — schema version
    * padding). Reads coerce every stored value to the CURRENT schema
    * type instead of crashing row construction. */
  private def coerceTo(v: Any, dt: DataType): Any = v match {
    case null => null
    case r: TagRef => r // resolved (and cast) at read time
    case _ => (dt, v) match {
      case (StringType, x) => String.valueOf(x)
      case (LongType, n: Number) => n.longValue()
      case (LongType, s: String) => s.toLong
      case (IntegerType, n: Number) => n.intValue()
      case (IntegerType, s: String) => s.toInt
      case (DoubleType, n: Number) => n.doubleValue()
      case (DoubleType, s: String) => s.toDouble
      case (FloatType, n: Number) => n.floatValue()
      case (FloatType, s: String) => s.toFloat
      case (BooleanType, b: java.lang.Boolean) => b
      case (BooleanType, n: Number) => n.doubleValue() != 0.0
      case (_: DecimalType, n: java.math.BigDecimal) => n
      case (_: DecimalType, x) => new java.math.BigDecimal(
        String.valueOf(x))
      case (BinaryType, b: Array[Byte]) => b
      case (BinaryType, x) => String.valueOf(x).getBytes("UTF-8")
      case (_, x) => x
    }
  }

  /** "Group by always returns" (test_query_groupby_alwaysreturn.py;
    * test_query_partitionby_basic.py; the reference's
    * countAlwaysReturnValue default): grouping a STABLE by tbname or
    * tag keys yields one row per CHILD KEY — children with no
    * (matching) rows included, count-family filled 0, other
    * aggregates NULL. Conservative engage: single stable target, all
    * group keys constant-per-child and present in the select list,
    * every other select item an aggregate call; anything else — and
    * any parse surprise — returns None and the standard path runs
    * (the rewrite only ever ADDS enumeration rows, so falling back is
    * never wrong-on-data, just the pre-r19 fewer-rows shape). */
  private def groupAlwaysReturn(stmt0: String): Option[DataFrame] = try {
    if (stmt0.contains(">>")) return None
    val stmt = GraftSql.normalizeDoubleQuotes(stmt0)
      .replaceAll("\\s+", " ").trim.replaceAll(";+$", "")
    val re = ("(?i)^SELECT (.+?) FROM ([\\w.]+)" +
      "( WHERE .+?)?" +
      " (?:GROUP|PARTITION) BY ([\\w, ]+?)" +
      "( HAVING .+?)?( ORDER BY [\\w,() *.]+?)?( LIMIT \\d+)?$").r
    val m = re.findFirstMatchIn(stmt).getOrElse(return None)
    val stName = bare(m.group(2))
    if (!stables.contains(stName)) return None
    val st = stables(stName)
    val kids = children.values.filter(_.stableName == stName).toSeq
      .sortBy(_.name)
    // plain tables are modeled as a same-named single-child stable —
    // the enumeration semantic is a super-table feature
    if (kids.isEmpty || kids.exists(_.name == stName)) return None
    val keys = GraftSql.splitArgs(m.group(4)).map(_.trim)
    val tagNames = st.tagDefs.map(_._1)
    if (keys.isEmpty || !keys.forall(k => k.equalsIgnoreCase("tbname") ||
        tagNames.exists(_.equalsIgnoreCase(k)))) return None
    val aggRe = ("(?i)^(count|sum|avg|min|max|stddev|stdvar|spread|" +
      "first|last|last_row|twa|elapsed|hyperloglog|mode|percentile|" +
      "apercentile)\\s*\\(").r
    val asRe = "(?i)^(.*?)\\s+AS\\s+([A-Za-z_]\\w*)$".r
    val items = GraftSql.splitArgs(m.group(1)).map(_.trim).map {
      case asRe(e, a) => (e.trim, a)
      case e => (e, e)
    }
    val (keyItems, aggItems) = items.partition { case (e, _) =>
      keys.exists(_.equalsIgnoreCase(e)) }
    if (aggItems.isEmpty ||
        !aggItems.forall { case (e, _) =>
          aggRe.findFirstIn(e).isDefined }) return None
    if (!keys.forall(k => keyItems.exists(_._1.equalsIgnoreCase(k))))
      return None
    // The reference prunes the child-table set on tag/tbname
    // predicates BEFORE grouping (tag-index scan feeds the table
    // list), so a tag-filtered query must not enumerate excluded
    // children. A WHERE over tags/tbname ONLY prunes the kid list
    // here; one MIXING tag and data columns bails to the standard
    // path (fewer-rows shape, never wrong-on-data); a data-column-
    // only WHERE (e.g. a ts range) keeps the full enumeration —
    // reference emits count-0 rows for data-filtered-empty children.
    val colNames = st.cols.fields.map(_.name)
    val kidsKept = Option(m.group(3)).map(
        _.trim.substring("WHERE".length).trim) match {
      case None => kids
      case Some(w) =>
        val idents = "[A-Za-z_]\\w*".r
          .findAllIn(w.replaceAll("'(?:[^']|'')*'", " ")).toSeq
        val refsTag = idents.exists(t => t.equalsIgnoreCase("tbname") ||
          tagNames.exists(_.equalsIgnoreCase(t)))
        if (!refsTag) kids
        else if (idents.exists(t =>
          colNames.exists(_.equalsIgnoreCase(t)))) return None
        else {
          val tagSchema = StructType(
            StructField("tbname", StringType) +: st.tags.fields.toSeq)
          val tagRows = kids.map(c =>
            Row.fromSeq(c.name +: st.tags.fields.toSeq.zip(c.tagVals)
              .map { case (f, v) =>
                coerceTo(resolveTagVal(v), f.dataType) }))
          val keep = spark.createDataFrame(
              new java.util.ArrayList[Row](tagRows.asJava), tagSchema)
            .filter(expr(w)).select("tbname")
            .collect().map(_.getString(0)).toSet
          kids.filter(c => keep(c.name))
        }
    }
    // run sans HAVING/ORDER/LIMIT — they re-apply over the FILLED frame
    val base = "SELECT " + m.group(1) + " FROM " + m.group(2) +
      Option(m.group(3)).getOrElse("") + " GROUP BY " + m.group(4)
    val df = GraftSql.query(spark, table, base, perSecond = perSecond)
    val keyFields = keys.map { k =>
      if (k.equalsIgnoreCase("tbname")) StructField("tbname", StringType)
      else st.tags.fields(tagNames.indexWhere(_.equalsIgnoreCase(k)))
    }
    val rows = kidsKept.map { c =>
      Row.fromSeq(keys.map { k =>
        if (k.equalsIgnoreCase("tbname")) c.name
        else resolveTagVal(c.tagVals(
          tagNames.indexWhere(_.equalsIgnoreCase(k))))
      })
    }
    val keyAliases = keys.map(k =>
      keyItems.find(_._1.equalsIgnoreCase(k)).get._2)
    val keyDf = spark.createDataFrame(
        new java.util.ArrayList[Row](rows.asJava),
        StructType(keyFields)).distinct()
      .toDF(keyAliases: _*)
    var res = keyDf.join(df, keyAliases, "left")
      .select(items.map { case (_, a) => col(a) }: _*)
    aggItems.foreach { case (e, a) =>
      if ("(?i)^(count|hyperloglog)\\s*\\(".r.findFirstIn(e).isDefined)
        res = res.withColumn(a, coalesce(col(a), lit(0L)))
    }
    Option(m.group(5)).map(_.trim.substring("HAVING".length).trim)
      .foreach { h =>
        // aggregate-call texts in HAVING name their output columns
        // (longest first, so count(c1) wins over count(c1...) prefixes)
        val h2 = items.sortBy(-_._1.length).foldLeft(h) {
          case (acc, (e, a)) => acc.replaceAll(
            "(?i)" + java.util.regex.Pattern.quote(e),
            java.util.regex.Matcher.quoteReplacement(s"`$a`"))
        }
        res = res.filter(expr(h2))
      }
    Option(m.group(6)).map(_.trim.substring("ORDER BY".length).trim)
      .foreach { o =>
        val cols0 = GraftSql.splitArgs(o).map { s0 =>
          val t = s0.trim
          val desc = t.toUpperCase.endsWith(" DESC")
          val body = t.replaceAll("(?i)\\s+(ASC|DESC)$", "").trim
          val a = items.find(i => i._1.equalsIgnoreCase(body) ||
            i._2.equalsIgnoreCase(body)).map(_._2).getOrElse(body)
          if (desc) col(a).desc else col(a).asc
        }
        res = res.orderBy(cols0: _*)
      }
    Option(m.group(7)).foreach(l =>
      res = res.limit(l.trim.substring("LIMIT".length).trim.toInt))
    Some(res)
  } catch { case scala.util.control.NonFatal(_) => None }

  private def stableDf(name: String): DataFrame = {
    val st = stables(name)
    val allKids = children.values.filter(_.stableName == name).toSeq
    // a stable with no children yet is a legal query target in the
    // reference (returns the empty result, not an error)
    if (allKids.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](),
        StructType(st.cols.fields ++
          st.tags.fields.map(f => f.copy(
            metadata = GraftCatalog.TagMeta)) :+
          StructField("tbname", StringType,
            metadata = GraftCatalog.HiddenMeta)))
    // VIRTUAL children read through their source-aligned vtable frames
    // (tags + tbname already attached); regular children — a VIRTUAL
    // stable can carry both (05-VirtualTables inheritance tests insert
    // into plain children of a VIRTUAL parent) — take the buffer path
    // below, and the two unions merge by name
    val (vkids, kids) = allKids.partition(c => vtableDefs.contains(c.name))
    val vdf = if (vkids.isEmpty) None
      else Some(vkids.map(c => vtableDf(vtableDefs(c.name)))
        .reduce(_ unionByName _))
    // a STABLE read exposes tags to `*` (the child frames hide them —
    // subtable wildcard rules), so a pure-virtual stable re-marks
    if (kids.isEmpty) return {
      val d = vdf.get
      d.select(d.columns.map { cn =>
        if (st.tags.fieldNames.exists(_.equalsIgnoreCase(cn)))
          col(cn).as(cn, GraftCatalog.TagMeta)
        else if (cn == "tbname")
          col(cn).as(cn, GraftCatalog.HiddenMeta)
        else col(cn)
      }: _*)
    }
    val rowSchema = StructType(st.cols.fields :+
      StructField("_seq", LongType) :+ StructField("tbname", StringType))
    val rows = new java.util.ArrayList[Row]()
    val colTypes = st.cols.fields.map(_.dataType)
    kids.foreach(c => c.rows.foreach { case (vals, seq) =>
      val padded = vals.padTo(colTypes.length, null).take(colTypes.length)
      rows.add(Row.fromSeq(padded.zip(colTypes)
        .map { case (v, t) => coerceTo(v, t) } :+ seq :+ c.name)) })
    val latest = graft.ops.SourceOps
      .upsertLatest(spark.createDataFrame(rows, rowSchema),
        Seq("tbname", st.tsCol), "_seq").drop("_seq")
    // tbname never rides `*` (pseudo column); STABLE-read tags DO
    // (20-select.md:183) — TagMeta without the star-hidden bit
    val reg = if (st.tags.fields.isEmpty)
      latest.select(st.cols.fieldNames.map(col) :+
        col("tbname").as("tbname", GraftCatalog.HiddenMeta): _*)
    else {
      val tagSchema = StructType(
        StructField("tbname", StringType) +: st.tags.fields)
      val tagRows = new java.util.ArrayList[Row](kids.length)
      val tagTypes = st.tags.fields.map(_.dataType)
      kids.foreach(c => tagRows.add(Row.fromSeq(c.name +:
        c.tagVals.padTo(tagTypes.length, null).take(tagTypes.length)
          .zip(tagTypes).map { case (v, t) =>
            coerceTo(resolveTagVal(v), t) })))
      val dim = spark.createDataFrame(tagRows, tagSchema)
      // tags carry the TAG metadata marker here too (the child read
      // does the same) so the dialect's riding rules see them
      latest.join(broadcast(dim), "tbname")
        .select((st.cols.fieldNames.map(col) ++
          st.tags.fieldNames.map(tn =>
            col(tn).as(tn, GraftCatalog.TagMeta)) :+
          col("tbname").as("tbname", GraftCatalog.HiddenMeta)): _*)
    }
    vdf.map(reg.unionByName(_)).getOrElse(reg)
  }

  private def childDf(c: Child): DataFrame = {
    val st = stables(c.stableName)
    val schema = StructType(st.cols.fields :+ StructField("_seq", LongType))
    val rows = new java.util.ArrayList[Row](c.rows.length)
    val colTypes = st.cols.fields.map(_.dataType)
    c.rows.foreach { case (vals, seq) =>
      val padded = vals.padTo(colTypes.length, null).take(colTypes.length)
      rows.add(Row.fromSeq(padded.zip(colTypes)
        .map { case (v, t) => coerceTo(v, t) } :+ seq)) }
    val base = spark.createDataFrame(rows, schema)
    val latest = graft.ops.SourceOps
      .upsertLatest(base, Seq(st.tsCol), "_seq").drop("_seq")
    val tagged = st.tags.fields.zip(c.tagVals).foldLeft(latest) {
      case (d, (f, v)) =>
        d.withColumn(f.name, lit(resolveTagVal(v)).cast(f.dataType))
    }
    val out = tagged.withColumn("tbname", lit(c.name))
    // mark tag columns in the schema metadata: the dialect front end
    // uses it to let bare tags ride aggregates without GROUP BY the
    // way tbname does (constant per child — parTranslater allows
    // them). On a SUBTABLE read tags and tbname resolve by name but
    // stay out of `*` (20-select.md:183 wildcard rules).
    out.select(out.columns.map { cn =>
      if (st.tags.fieldNames.exists(_.equalsIgnoreCase(cn)))
        col(cn).as(cn, GraftCatalog.HiddenTagMeta)
      else if (cn == "tbname")
        col(cn).as(cn, GraftCatalog.HiddenMeta)
      else col(cn)
    }: _*)
  }

  /** Run a stream's calc over the full history of its source tables in
    * batch (the reference's FILL_HISTORY 1 backfill,
    * streamBackfill/st.c semantics) and materialize the result as the
    * stream's INTO table. */
  def fillHistory(streamName: String): DataFrame = {
    val sd = streamDefs.getOrElse(streamName,
      throw new IllegalArgumentException(s"unknown stream: $streamName"))
    val out = GraftSql.query(spark, table, trowsSelect(sd),
      perSecond = perSecond)
    materialized(sd.into) = out
    out
  }

  /** Wire a stream definition onto a live streaming source: the saved
    * SELECT's INTERVAL/SESSION clause becomes the Structured Streaming
    * trigger ([[graft.streaming.Streams]]); WATERMARK comes from the
    * stream options (default 1 minute). */
  def streamTrigger(streamName: String, src: DataFrame,
      tsCol: String = "ts", valueCol: String = "value"): DataFrame = {
    val sd = streamDefs(streamName)
    require(sd.status == "running",
      s"stream $streamName is ${sd.status} — START STREAM it first")
    val sel = sd.select
    val up = sel.toUpperCase
    val wmUs = "(?i)WATERMARK\\s*\\(?\\s*(\\d+[uasmhdw]?)\\s*\\)?".r
      .findFirstMatchIn(sd.options)
      .map(m => GraftSql.durNative(m.group(1), 1000000L))
      .getOrElse(60000000L)
    val wm = s"${wmUs} microseconds"
    val keys = "(?i)PARTITION BY\\s+([A-Za-z_][A-Za-z0-9_]*)".r
      .findFirstMatchIn(sel).map(_.group(1)).toSeq
    val iv = "(?i)INTERVAL\\s*\\(\\s*([^),]+)\\s*\\)".r
      .findFirstMatchIn(sel)
    val sess = "(?i)SESSION\\s*\\(\\s*([^,]+),\\s*([^)]+)\\)".r
      .findFirstMatchIn(sel)
    (iv, sess) match {
      case (Some(m), _) =>
        val ivUs = GraftSql.durNative(m.group(1).trim, 1000000L)
        val slide = "(?i)SLIDING\\s*\\(\\s*([^)]+)\\s*\\)".r
          .findFirstMatchIn(sel)
          .map(s => GraftSql.durNative(s.group(1).trim, 1000000L))
          .getOrElse(ivUs)
        graft.streaming.Streams.intervalTrigger(src, tsCol,
          s"$ivUs microseconds", s"$slide microseconds", wm, keys, valueCol)
      case (_, Some(m)) =>
        val gapUs = GraftSql.durNative(m.group(2).trim, 1000000L)
        graft.streaming.Streams.sessionTrigger(src, m.group(1).trim,
          s"$gapUs microseconds", wm, keys)
      case _ => throw new IllegalArgumentException(
        s"stream $streamName: no INTERVAL/SESSION trigger in its SELECT")
    }
  }

  // ------------------------------------------- information_schema

  import spark.implicits._

  /** information_schema.ins_databases (systable.h:26-112). */
  def insDatabases: DataFrame =
    databases.values.toSeq.map { d =>
      val prec = d.perSecond match {
        case 1000L => "ms"; case 1000000L => "us"; case _ => "ns"
      }
      val n = children.values.count(c => stables(c.stableName).db == d.name)
      (d.name, prec, n)
    }.toDF("db_name", "precision", "ntables")

  /** information_schema.ins_stables: one row per super table. */
  def insStables: DataFrame =
    stables.values.filter(_.tagDefs.nonEmpty).toSeq.map { st =>
      (st.name, st.db, st.colDefs.length, st.tagDefs.length,
        children.values.count(_.stableName == st.name))
    }.toDF("stable_name", "db_name", "columns", "tags", "child_tables")

  /** information_schema.ins_vstable_inherits (systable.h:93
    * vstableInheritsSchema): one row per BASE ON inheritance edge
    * between stables. uids/create_time are the catalog's deterministic
    * logical ids (see [[Stable]]) so listings oracle-compare: uid =
    * 7700000000000+seq, create_time = 2023-11-14T22:13:20Z + seq
    * seconds, in ms. */
  def insVstableInherits: DataFrame =
    stables.values.filter(_.parents.nonEmpty).toSeq.flatMap { st =>
      st.parents.map { p =>
        val ps = stables(p)
        (st.db, ps.name, ps.uid, st.name, st.uid,
          1700000000000L + st.createSeq * 1000L)
      }
    }.toDF("db_name", "parent_stable_name", "parent_uid",
      "child_stable_name", "child_uid", "create_time")

  /** information_schema.ins_tags: every (child, tag) value, rendered
    * as text exactly as the reference does (sysscanoperator.c tag
    * scan). */
  def insTags: DataFrame =
    children.values.toSeq.flatMap { c =>
      val st = stables(c.stableName)
      st.tagDefs.zip(c.tagVals).map { case ((tn, tt), v0) =>
        val v = resolveTagVal(v0)
        (c.name, st.db, st.name, tn, tt.toUpperCase,
          Option(v).map(_.toString).orNull)
      }
    }.toDF("table_name", "db_name", "stable_name", "tag_name", "tag_type",
      "tag_value")

  /** information_schema.ins_columns over catalog tables (col_kind
    * distinguishes data columns from tags). */
  def insColumns: DataFrame =
    stables.values.toSeq.flatMap { st =>
      st.colDefs.zipWithIndex.map { case ((n, t), i) =>
        (st.name, n, i + 1, t.toUpperCase, "column")
      } ++ st.tagDefs.zipWithIndex.map { case ((n, t), i) =>
        (st.name, n, st.colDefs.length + i + 1, t.toUpperCase, "tag")
      }
    }.toDF("table_name", "col_name", "ordinal", "col_type", "col_kind")

  /** information_schema.ins_tables over catalog child tables. */
  def insTables: DataFrame =
    children.values.toSeq.map { c =>
      (c.name, stables(c.stableName).db, c.stableName,
        // upsert-visible row count (post last-writer-wins)
        c.rows.map(_._1.head).distinct.length.toLong)
    }.toDF("table_name", "db_name", "stable_name", "n_rows")

  /** information_schema.ins_streams. */
  def insStreams: DataFrame =
    streamDefs.values.toSeq.map(s => (s.name, s.into, s.select, s.status))
      .toDF("stream_name", "target_table", "sql", "status")

  /** information_schema.ins_topics. */
  def insTopics: DataFrame =
    topicDefs.values.toSeq.map(t => (t.name, t.db, t.subject))
      .toDF("topic_name", "db_name", "subject")

  /** information_schema.ins_dnodes (systable.h:26 dnodesSchema): the
    * honest Spark mapping — each executor is a data node; local mode
    * reports the single driver-executor. `support_vnodes` carries the
    * executor's core count (its parallel-partition capacity). */
  def insDnodes: DataFrame = {
    val infos = spark.sparkContext.statusTracker.getExecutorInfos.toSeq
    (infos.zipWithIndex.map { case (e, i) =>
      (i + 1, e.host, e.numRunningTasks,
        spark.sparkContext.defaultParallelism, "ready")
    } ++ extraDnodes.toSeq.map { case (id, ep) =>
      (id, ep, 0, spark.sparkContext.defaultParallelism, "ready")
    }).toDF("id", "endpoint", "vnodes", "support_vnodes", "status")
  }

  /** information_schema.ins_users (systable.h usersSchema): the root
    * superuser plus CREATE USER registrations. Real authn/authz is
    * the platform's job (Spark delegates to the cluster manager); the
    * catalog keeps the reference's introspection surface. */
  def insUsers: DataFrame =
    userDefs.values.toSeq.map(u =>
      (u.name, u.superUser, u.enable, u.sysinfo, u.createdb))
      .toDF("name", "super", "enable", "sysinfo", "createdb")

  /** information_schema.ins_user_privileges (systable.c:507
    * userUserPrivilegesSchema; update_time omitted — wall-clock). */
  def insUserPrivileges: DataFrame =
    privDefs.toSeq.map(p => (p.user, p.privType, p.scope, p.db,
      p.table, p.condition, "", p.columns))
      .toDF("user_name", "priv_type", "priv_scope", "db_name",
        "table_name", "condition", "notes", "columns")

  /** SHOW ROLES (sql.y role surface): declared roles with their
    * grantee users. */
  def insRoles: DataFrame =
    roleDefs.toSeq.map { r =>
      (r, userRoles.filter(_._2.contains(r)).keys.mkString(","))
    }.toDF("role_name", "granted_to")

  /** information_schema.ins_cluster (systable.h clusterSchema). */
  def insCluster: DataFrame =
    Seq((spark.sparkContext.applicationId, "graft", spark.version))
      .toDF("id", "name", "version")

  /** information_schema.ins_anodes (systable.h:32). */
  def insAnodes: DataFrame =
    anodeDefs.values.toSeq.map(a => (a.id, a.url, a.status))
      .toDF("id", "url", "status")

  /** information_schema.ins_anodes_full (systable.h:33): one row per
    * (anode, served algo type) — the algo families the Detector seam
    * serves (reference: the anode reports its registered algos). */
  def insAnodesFull: DataFrame =
    anodeDefs.values.toSeq.flatMap(a => Seq(
      (a.id, "forecast", "linear,holtwinters,arima"),
      (a.id, "imputation", "linear"),
      (a.id, "anomaly-detection", "zscore")))
      .toDF("id", "type", "algo")

  /** information_schema ins_xnodes / ins_xnode_tasks /
    * ins_xnode_agents / ins_xnode_jobs (systable.h:34-38): the xnode
    * (taosx data-mover) admin surfaces. This engine runs no xnode
    * registry, so the listings are empty with the reference schemas;
    * SHOW XNODE … WHERE conditions filter with full expression
    * support (vacuously). Timestamps are epoch-tick BIGINTs, the
    * catalog's convention. */
  def insXnodes: DataFrame =
    xnodeDefs.toSeq.map { case (id, (url, st)) =>
      (id, url, st, 1700000000000L + id * 1000L,
        1700000000000L + id * 1000L)
    }.toDF("id", "url", "status", "create_time", "update_time")

  def insXnodeTasks: DataFrame =
    Seq.empty[(Int, String, String, String, String, Int, Int, String,
        String, String, String, Long, Long)]
      .toDF("id", "name", "from", "to", "parser", "via", "xnode_id",
        "status", "reason", "created_by", "labels", "create_time",
        "update_time")

  def insXnodeAgents: DataFrame =
    Seq.empty[(Int, String, String, String, Long, Long)]
      .toDF("id", "name", "token", "status", "create_time",
        "update_time")

  def insXnodeJobs: DataFrame =
    Seq.empty[(Int, Int, String, Int, Int, String, Long, Long)]
      .toDF("id", "task_id", "config", "via", "xnode_id", "status",
        "create_time", "update_time")

  /** CREATE EXTERNAL SOURCE name TYPE='mysql' HOST='h' PORT=n
    * USER='u' [PASSWORD='p'|API_TOKEN='t'] [DATABASE='d'] [SCHEMA='s']
    * [OPTIONS('k'='v', …)] (sql.y:3151-3190, federated query DDL).
    * `createTime` is a logical sequence number — deterministic, and
    * monotone like the reference's wall clock. */
  case class ExtSource(name: String, typ: String, host: String,
      port: Int, user: String, password: Option[String],
      apiToken: Option[String], database: Option[String],
      schema: Option[String], options: Map[String, String],
      createTime: Long)
  private val extSourceDefs = mutable.LinkedHashMap[String, ExtSource]()
  private var extSeq = 0L

  /** (plain key=value fields, OPTIONS('k'='v') map) from a source
    * clause body. */
  private def extKvs(body: String): (Map[String, String],
      Map[String, String]) = {
    val optRe = "(?i)\\boptions\\s*\\(([^)]*)\\)".r
    val opts = optRe.findFirstMatchIn(body).map(_.group(1)).getOrElse("")
    val rest = optRe.replaceAllIn(body, " ")
    // values may be quoted, numeric, or bare identifiers (the
    // reference's source clauses accept DATABASE=mydb unquoted)
    val kv = "(?i)([A-Za-z_]+)\\s*=\\s*(?:'([^']*)'|([\\w.]+))".r
    val fields = kv.findAllMatchIn(rest).map(m =>
      m.group(1).toLowerCase ->
        Option(m.group(2)).getOrElse(m.group(3))).toMap
    val optMap = "'([^']*)'\\s*=\\s*'([^']*)'".r.findAllMatchIn(opts)
      .map(m => m.group(1) -> m.group(2)).toMap
    (fields, optMap)
  }

  private def createExtSource(stmt: String): Unit = {
    val m =
      "(?i)^CREATE EXTERNAL SOURCE (IF NOT EXISTS )?([A-Za-z_]\\w*)\\s+(.*)$".r
    val (ifne, name, body) = stmt match {
      case m(a, b, c) => (a != null, b.toLowerCase, c)
      case _ => throw new IllegalArgumentException(
        s"bad CREATE EXTERNAL SOURCE: $stmt")
    }
    if (extSourceDefs.contains(name)) {
      // IF NOT EXISTS keeps the original definition
      require(ifne, s"external source already exists: $name")
      return
    }
    val (kvs, opts) = extKvs(body)
    val typ = kvs.getOrElse("type", throw new IllegalArgumentException(
      "CREATE EXTERNAL SOURCE needs type="))
    require(kvs.contains("host") && kvs.contains("port"),
      "CREATE EXTERNAL SOURCE needs host= and port=")
    require(kvs.contains("user") || kvs.contains("api_token") ||
      opts.contains("api_token"),
      "CREATE EXTERNAL SOURCE needs user= or api_token=")
    extSeq += 1
    // PORT: numeric, or a bare identifier (an unexpanded test-harness
    // variable like `port=leader_port` — tolerated as port 0, the
    // reference harness substitutes a real number before the engine
    // sees it); anything else (e.g. `12x4`) is malformed → loud
    val portTxt = kvs("port")
    val port = portTxt.toIntOption.getOrElse {
      require(portTxt.nonEmpty && portTxt.head.isLetter ||
        portTxt.headOption.contains('_'),
        s"CREATE EXTERNAL SOURCE: malformed PORT '$portTxt'")
      0
    }
    extSourceDefs(name) = ExtSource(name, typ, kvs("host"),
      port, kvs.getOrElse("user", ""),
      kvs.get("password"), kvs.get("api_token").orElse(
        opts.get("api_token")), kvs.get("database"), kvs.get("schema"),
      opts, extSeq)
  }

  /** ALTER … SET k='v'[, …] / SET OPTIONS('k'='v'): field updates
    * replace; OPTIONS patch-merge — new keys add, named keys update,
    * unnamed keys are retained (test_fq_01 "patch-merge" contract). */
  private def alterExtSource(stmt: String): Unit = {
    val m =
      "(?i)^ALTER EXTERNAL SOURCE (IF EXISTS )?([A-Za-z_]\\w*)\\s+SET\\s+(.*)$".r
    stmt match {
      case m(ife, n, body) =>
        val name = n.toLowerCase
        extSourceDefs.get(name) match {
          case None => require(ife != null,
            s"external source not found: $name")
          case Some(s0) =>
            val (kvs, opts) = extKvs(body)
            var s = s0
            kvs.get("type").foreach(v => s = s.copy(typ = v))
            kvs.get("host").foreach(v => s = s.copy(host = v))
            kvs.get("port").foreach(v => s = s.copy(port = v.toInt))
            kvs.get("user").foreach(v => s = s.copy(user = v))
            kvs.get("password").foreach(v =>
              s = s.copy(password = Some(v)))
            kvs.get("api_token").foreach(v =>
              s = s.copy(apiToken = Some(v)))
            kvs.get("database").foreach(v =>
              s = s.copy(database = Some(v)))
            kvs.get("schema").foreach(v => s = s.copy(schema = Some(v)))
            if (opts.nonEmpty) s = s.copy(options = s.options ++ opts)
            extSourceDefs(name) = s
        }
      case _ => throw new IllegalArgumentException(
        s"bad ALTER EXTERNAL SOURCE: $stmt")
    }
  }

  /** information_schema.ins_external_sources (systable.h
    * TSDB_INS_TABLE_EXT_SOURCES): the registered federated sources;
    * passwords/tokens render masked, as the reference's 8-byte
    * password column does. */
  def insExtSources: DataFrame =
    extSourceDefs.values.toSeq.map(s => (s.name, s.typ, s.host, s.port,
      s.user,
      s.password.orElse(s.apiToken).map(_ => "********").orNull,
      s.database.orNull, s.schema.orNull,
      s.options.toSeq.sortBy(_._1)
        .map { case (k, v) =>
          // any credential-shaped key masks, not just token/password
          // (secret, api_key, access_key, credential, …)
          if ("(?i)token|password|secret|key|credential|passwd|auth"
              .r.findFirstIn(k).isDefined)
            s"$k=********" else s"$k=$v" }.mkString(","),
      s.createTime))
      .toDF("source_name", "type", "host", "port", "user", "password",
        "database", "schema", "options", "create_time")

  /** information_schema.ins_functions (systable.h; SHOW FUNCTIONS
    * sql.y:1374). */
  def insFunctions: DataFrame =
    udfDefs.values.toSeq.map(u => (u.name,
        if (u.aggregate) "AGGREGATE" else "SCALAR",
        u.impl, u.outputType, u.bufSize))
      .toDF("name", "func_type", "impl", "output_type", "bufsize")

  /** SHOW TSMAS (sql.y:1509). */
  def insTsmas: DataFrame =
    tsmaDefs.values.toSeq.map(t => (t.name, t.table,
        t.funcs.map { case (f, c) => s"$f($c)" }.mkString(","),
        t.intervalTxt))
      .toDF("tsma_name", "table_name", "func_list", "interval")

  /** SHOW RSMAS (sql.y:1489). */
  def insRsmas: DataFrame =
    rsmaDefs.values.toSeq.map(r => (r.name, r.table,
        r.funcs.map { case (f, c) => s"$f($c)" }.mkString(","),
        r.levelTxts.mkString(",")))
      .toDF("rsma_name", "table_name", "func_list", "intervals")

  /** SHOW VTABLES (sql.y:1361). */
  def insVtables: DataFrame =
    vtableDefs.values.toSeq.map(v => (v.name, v.cols.length + 1))
      .toDF("vtable_name", "columns")

  // --------------------------------------------------- text dispatch

  /** Byte width the reference reports per type in DESCRIBE/ins_columns
    * (tdataformat.h fixed sizes; var types report their declared
    * bound). */
  private def typeLen(t: String): Int = {
    val u = t.trim.toUpperCase
    val varLen = "(?:VARCHAR|BINARY|NCHAR|VARBINARY|GEOMETRY)\\s*\\((\\d+)\\)".r
    u match {
      case varLen(n) => n.toInt
      case x if x.startsWith("BOOL") || x.startsWith("TINYINT") => 1
      case x if x.startsWith("SMALLINT") => 2
      case x if x.startsWith("INT ") || x == "INT" ||
        x.startsWith("FLOAT") => 4
      case x if x.startsWith("JSON") => 4095
      case _ => 8 // BIGINT, DOUBLE, TIMESTAMP, DECIMAL64…
    }
  }

  /** DESCRIBE tb (sql.y:1596): field | type | length | note, data
    * columns first then tags, exactly the reference's column order. */
  def describe(name0: String): DataFrame = {
    val name = bare(name0)
    val st =
      if (stables.contains(name)) stables(name)
      else if (children.contains(name)) stables(children(name).stableName)
      else throw new IllegalArgumentException(s"unknown table: $name")
    def render(t: String): String = {
      val u = t.trim.toUpperCase
      if (u.startsWith("DECIMAL")) u.replaceAll("\\s+", "")
      else u.replaceAll("\\(\\d+\\)", "").split("\\s+")(0)
    }
    (st.colDefs.map { case (n, t) => (n, render(t), typeLen(t), "") } ++
      st.tagDefs.map { case (n, t) => (n, render(t), typeLen(t), "TAG") })
      .toDF("field", "type", "length", "note")
  }

  /** One text entry point for the full surface: SELECT goes through
    * the dialect front end, SHOW/DESCRIBE serve catalog metadata, and
    * everything else is DDL/DML via [[exec]] (returning an empty OK
    * frame, as the reference's taos shell does). */
  def sql(stmt0: String): DataFrame = {
    val stmt = normalizeWs(stmt0).trim.stripSuffix(";").trim
    // multi-statement SCRIPT (the reference shell splits on `;`;
    // 31-OldTsimCases feed whole scripts as one string): run each
    // statement in order, return the last result. Semicolons inside
    // string literals don't split.
    if (stmt.indexOf(';') >= 0) {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inStr = false
      var i = 0
      while (i < stmt.length) {
        val ch = stmt.charAt(i)
        if (inStr) {
          cur += ch
          // a backslash escapes the next char inside a literal (the
          // reference lexer accepts 'a\'b'); consume it so the escaped
          // quote doesn't flip the in-string state
          if (ch == '\\' && i + 1 < stmt.length) {
            i += 1; cur += stmt.charAt(i)
          } else if (ch == '\'') inStr = false
        }
        else if (ch == '\'') { cur += ch; inStr = true }
        else if (ch == ';') { parts += cur.toString; cur.clear() }
        else cur += ch
        i += 1
      }
      parts += cur.toString
      val stmts = parts.map(_.trim).filter(_.nonEmpty).toSeq
      if (stmts.length > 1) return stmts.map(sql).last
    }
    val up = stmt.toUpperCase
    // db-qualified SHOW lists (`SHOW d0.STABLES`, `SHOW NORMAL
    // db.VTABLES` — sql.y db_name_cond_opt): run the unqualified form
    // under a temporary USE of the named database
    val dbShow = ("(?i)^SHOW ((?:NORMAL |CHILD )?)([A-Za-z_]\\w*)\\." +
      "(TABLES|STABLES|STREAMS|TOPICS|TSMAS|RSMAS|VTABLES|VGROUPS|" +
      "VIEWS|RETENTIONS)((?: .*)?)$").r
    dbShow.findFirstMatchIn(stmt).foreach { m =>
      val db = m.group(2).toLowerCase
      require(databases.contains(db), s"database not found: $db")
      val saved = currentDb
      currentDb = db
      // NORMAL/CHILD prefixes only refine TABLES listings; on the
      // other kinds they are vacuous qualifiers (a vtable/stable IS
      // its kind) — drop them rather than fail the statement
      val pre = if (m.group(3).equalsIgnoreCase("TABLES")) m.group(1)
        else ""
      try {
        val out = sql(s"SHOW $pre${m.group(3)}${m.group(4)}")
        // listings that carry a db_name column scope to the named db
        return if (out.columns.contains("db_name"))
          out.filter(org.apache.spark.sql.functions.col("db_name")
            === db)
        else out
      } finally currentDb = saved
    }
    // a parenthesized first branch is a legal query expression
    // (sql.y query_expression: `(select …) union all (select …)`)
    if (up.startsWith("SELECT") ||
        "^\\(\\s*SELECT\\b".r.findFirstIn(up).isDefined) {
      // "group by always returns" (test_query_groupby_alwaysreturn.py,
      // test_query_partitionby_basic.py: grouping a STABLE by tbname
      // or tags yields one row per CHILD — empty children included,
      // count() = 0, other aggregates NULL; countAlwaysReturnValue
      // default-on semantics)
      groupAlwaysReturn(stmt).foreach(return _)
      // `SELECT … >> export_file` (sql grammar 20-select.md:20,1010):
      // run the query and dump the result as a headered CSV, returning
      // the rows as the shell does. Bare and quoted paths both parse.
      val (body, exportPath) =
        "(?s)^(.*?)\\s*>>\\s*('?)([A-Za-z0-9_./-]+)\\2\\s*$".r
          .findFirstMatchIn(stmt) match {
            // an odd quote count before `>>` means it sits inside a
            // string literal, not at the statement tail
            case Some(m) if m.group(1).count(_ == '\'') % 2 == 0 =>
              (m.group(1), Some(m.group(3)))
            case _ => (stmt, None)
          }
      // database() reflects this session's USE state; substitute before
      // the dialect's static 'default' fallback can see it
      val df = GraftSql.query(spark, table,
        body.replaceAll("(?i)(?<![A-Za-z0-9_])database\\s*\\(\\s*\\)",
          s"'$currentDb'"),
        perSecond = perSecond)
      // relative export paths resolve under SPARK_GRAFT_EXPORT_DIR
      // (default: the system temp dir) — never the process CWD, so a
      // probed/replayed statement can't deposit artifacts in the
      // worktree
      exportPath.foreach { p0 =>
        val p =
          if (java.nio.file.Paths.get(p0).isAbsolute) p0
          else sys.env.getOrElse("SPARK_GRAFT_EXPORT_DIR",
            System.getProperty("java.io.tmpdir")) + "/" + p0
        df.coalesce(1).write.mode("overwrite")
          .option("header", "true").csv(p)
      }
      df
    }
    else if (up.startsWith("EXPLAIN ")) {
      // EXPLAIN [ANALYZE] [VERBOSE true|false] [RATIO f] <select>
      // (sql.y:1738 + explain_options): the physical plan, one row
      // per line — Spark's plan is the honest answer here
      var body = stmt.substring("EXPLAIN ".length).trim
      // options appear in ANY order (sql.y explain_options is a
      // left-recursive list: `analyze ratio 0.1 verbose true` is as
      // legal as `analyze verbose true ratio 0.1`) — strip until no
      // option prefix remains
      val optRe = ("(?i)^(?:ANALYZE\\s+|VERBOSE\\s+(?:TRUE|FALSE)\\s+" +
        "|RATIO\\s+[0-9.]+\\s+)").r
      var stripped = optRe.replaceFirstIn(body, "")
      while (stripped != body) {
        body = stripped
        stripped = optRe.replaceFirstIn(body, "")
      }
      // a parenthesized query body is legal (sql.y query_expression) —
      // strip ONLY when the group spans the whole body (`(A) union
      // (B)` must stay intact)
      if (body.startsWith("(") && body.endsWith(")") &&
          parenGroup(body, 0)._2 == body.length)
        body = body.substring(1, body.length - 1).trim
      val df = sql(body)
      val lines = df.queryExecution
        .explainString(org.apache.spark.sql.execution.SimpleMode)
        .linesIterator.toSeq
      spark.createDataFrame(
        new java.util.ArrayList[Row](lines.map(Row(_)).asJava),
        StructType(Seq(StructField("plan_line", StringType))))
    }
    else if (up.startsWith("SHOW CREATE STABLE ") ||
        up.startsWith("SHOW CREATE TABLE ")) {
      val name = bare(stmt.split("\\s+").last)
      val ddl =
        if (children.contains(name) &&
            children(name).stableName != name) {
          val c = children(name)
          val st = stables(c.stableName)
          val tags = st.tagDefs.zip(c.tagVals.map(resolveTagVal))
            .map { case ((_, t), v) =>
            if (v == null) "NULL"
            else if (sparkType(t) == StringType)
              "'" + v.toString.replace("'", "''") + "'"
            else v.toString
          }.mkString(", ")
          s"CREATE TABLE `$name` USING `${st.name}` TAGS ($tags)"
        } else {
          val st = stables.getOrElse(name, throw
            new IllegalArgumentException(s"unknown table: $name"))
          val cols = st.colDefs.map { case (n, t) => s"`$n` $t" }
            .mkString(", ")
          val tags =
            if (st.tagDefs.isEmpty) ""
            else st.tagDefs.map { case (n, t) => s"`$n` $t" }
              .mkString(" TAGS (", ", ", ")")
          s"CREATE STABLE `$name` ($cols)$tags"
        }
      Seq((name, ddl)).toDF("table_name", "create_sql")
    }
    else if (up.startsWith("SHOW CREATE DATABASE ")) {
      // SHOW CREATE DATABASE db (sql.y:1407): round-trippable DDL
      val name = bare(stmt.split("\\s+").last)
      val db = databases.getOrElse(name,
        throw new IllegalArgumentException(s"unknown database: $name"))
      val prec = db.perSecond match {
        case 1000L => "ms"
        case 1000000000L => "ns"
        case _ => "us"
      }
      val dayTicks = db.perSecond * 86400L
      val keep = db.keepTicks.map { k =>
        if (k % dayTicks == 0) s" KEEP ${k / dayTicks}d"
        else if (k % db.perSecond == 0) s" KEEP ${k / db.perSecond}s"
        else s" KEEP ${k * 1000L / db.perSecond}a"
      }.getOrElse("")
      val ddl = s"CREATE DATABASE `$name` PRECISION '$prec'$keep"
      Seq((name, ddl)).toDF("database_name", "create_sql")
    }
    else if (up.startsWith("SHOW CONNECTIONS")) {
      // SHOW CONNECTIONS (sql.y:1385): this session is the one client
      Seq((1L, "root", spark.sparkContext.appName))
        .toDF("conn_id", "user", "app")
    }
    else if (up.startsWith("SHOW APPS")) {
      // SHOW APPS (sql.y:1384): the driver application
      Seq((spark.sparkContext.applicationId, spark.sparkContext.appName))
        .toDF("app_id", "name")
    }
    else if (up.startsWith("SHOW CREATE TSMA ")) {
      val name = bare(stmt.split("\\s+").last)
      val t = tsmaDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown TSMA: $name"))
      val ddl = t.baseTsma match {
        case Some(b) => s"CREATE RECURSIVE TSMA `${t.name}` ON `$b` " +
          s"INTERVAL(${t.intervalTxt})"
        case None => s"CREATE TSMA `${t.name}` ON `${t.table}` FUNCTION(" +
          t.funcs.map { case (f, c) => s"$f(`$c`)" }.mkString(", ") +
          s") INTERVAL(${t.intervalTxt})"
      }
      Seq((t.name, ddl)).toDF("tsma_name", "create_sql")
    }
    else if (up.startsWith("SHOW CREATE RSMA ")) {
      val name = bare(stmt.split("\\s+").last)
      val r = rsmaDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown RSMA: $name"))
      val ddl = s"CREATE RSMA `${r.name}` ON `${r.table}` FUNCTION(" +
        r.funcs.map { case (f, c) => s"$f(`$c`)" }.mkString(", ") +
        s") INTERVAL(${r.levelTxts.mkString(", ")})"
      Seq((r.name, ddl)).toDF("rsma_name", "create_sql")
    }
    else if (up.startsWith("SHOW CREATE VTABLE ")) {
      val name = bare(stmt.split("\\s+").last)
      val v = vtableDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown VTABLE: $name"))
      val seriesTxt = v.series.map { sd =>
        val f = sd.filters.map { case (k, x) =>
          s"$k='${x.replace("'", "''")}'" }.mkString(", ")
        s" SERIES ${sd.alias} AS ${sd.path} ($f)"
      }.mkString
      val ddl = s"CREATE VTABLE `${v.name}` (`${v.tsCol}` TIMESTAMP, " +
        v.cols.map { case (cn, tp, tbl, sc) =>
          s"`$cn` ${tp.toUpperCase} FROM `$tbl`.`$sc`" }.mkString(", ") +
        ")" + seriesTxt
      Seq((v.name, ddl)).toDF("vtable_name", "create_sql")
    }
    else if (up.startsWith("SHOW DATABASES")) insDatabases
    // SHOW USER|SYSTEM DATABASES (sql.y:1354,1477-1478 db_kind_opt):
    // USER = the catalog's databases; SYSTEM = the two schema dbs
    else if (up == "SHOW USER DATABASES") insDatabases
    else if (up == "SHOW SYSTEM DATABASES")
      Seq("information_schema", "performance_schema").map(Tuple1(_))
        .toDF("name")
    // db-qualified listings (sql.y:1355 db_name_cond_opt: SHOW
    // [NORMAL|VIRTUAL] db.STABLES / db.TABLES scope to one database)
    else if (("(?i)^SHOW (?:(?:NORMAL|VIRTUAL|CHILD) )?" +
        "[A-Za-z_]\\w*\\.(STABLES|TABLES)\\b.*$").r.matches(stmt)) {
      val m = ("(?i)^SHOW (?:(?:NORMAL|VIRTUAL|CHILD) )?" +
        "([A-Za-z_]\\w*)\\.(STABLES|TABLES)\\b.*$").r
        .findFirstMatchIn(stmt).get
      val db = m.group(1).toLowerCase
      if (m.group(2).equalsIgnoreCase("STABLES"))
        insStables.filter(col("db_name") === db)
      else insTables.filter(col("db_name") === db)
    }
    else if (up.startsWith("SHOW STABLES")) insStables
    else if (up == "SHOW TABLES") insTables
    else if (up.startsWith("SHOW STREAMS")) insStreams
    else if (up.startsWith("SHOW TOPICS")) insTopics
    else if (up.startsWith("SHOW TSMAS")) insTsmas
    else if (up.startsWith("SHOW RSMAS")) insRsmas
    else if (up.startsWith("SHOW VARIABLES") ||
        up.startsWith("SHOW LOCAL VARIABLES")) {
      // SHOW [LOCAL] VARIABLES [LIKE 'pat'] (sql.y:1397-1399): the
      // engine-relevant session settings a TDengine client would
      // inspect; LIKE filters on the variable name
      val vars = Seq(
        ("timezone", spark.conf.get("spark.sql.session.timeZone")),
        ("shuffle_partitions",
          spark.conf.get("spark.sql.shuffle.partitions")),
        ("current_database", currentDb),
        ("precision_ticks_per_second", perSecond.toString))
        .toDF("name", "value")
      "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt) match {
        case Some(m) => vars.filter(col("name").like(m.group(1)))
        case None => vars
      }
    }
    else if (up.startsWith("SHOW QUERIES")) {
      // SHOW QUERIES (sql.y:1390): live query listing — the Spark
      // status tracker's active jobs are the engine's running work
      val st = spark.sparkContext.statusTracker
      st.getActiveJobIds().toSeq.map { id =>
        val info = st.getJobInfo(id)
        (id, info.map(_.status.toString).getOrElse("UNKNOWN"))
      }.toDF("job_id", "status")
    }
    else if (up.startsWith("SHOW INDEXES FROM ")) {
      val t = bare(stmt.substring("SHOW INDEXES FROM ".length).trim)
      indexDefs.values.toSeq.filter(_._2 == t)
        .map { case (n, tbl, kind) => (n, tbl, kind) }
        .toDF("index_name", "table_name", "index_kind")
    }
    else if (up.startsWith("SHOW TAGS FROM ")) {
      // SHOW TAGS FROM child (sql.y:1416): the child's tag bindings
      val t = bare(stmt.substring("SHOW TAGS FROM ".length).trim)
      insTags.filter(col("table_name") === t)
    }
    else if (up.startsWith("SHOW TABLE TAGS FROM ")) {
      // SHOW TABLE TAGS FROM stable (sql.y:1418): one row per child,
      // tbname + each tag as a column
      val stName =
        bare(stmt.substring("SHOW TABLE TAGS FROM ".length).trim)
      val st = stables.getOrElse(stName,
        throw new IllegalArgumentException(s"unknown stable: $stName"))
      val kids = children.values.filter(_.stableName == stName).toSeq
      val rows = kids.map(c =>
        Row.fromSeq(c.name +: c.tagVals.map(resolveTagVal)))
      val schema = StructType(StructField("tbname", StringType) +:
        st.tags.fields.toSeq)
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)
    }
    else if (up.startsWith("SHOW TABLE DISTRIBUTED ")) {
      // SHOW TABLE DISTRIBUTED tbl (sql.y:1413): storage distribution
      // summary — for catalog buffers: total vs upsert-visible rows
      // (the delta is what COMPACT reclaims)
      val t =
        bare(stmt.substring("SHOW TABLE DISTRIBUTED ".length).trim)
      val kids =
        if (children.contains(t)) Seq(children(t))
        else children.values.filter(_.stableName == t).toSeq
      require(kids.nonEmpty, s"unknown table: $t")
      kids.map(c => (c.name, c.rows.length.toLong,
          c.rows.map(_._1.head).distinct.length.toLong))
        .toDF("table_name", "total_rows", "visible_rows")
    }
    else if (up.startsWith("SHOW RETENTIONS")) {
      // SHOW RETENTIONS (sql.y:1490): one row per RSMA ladder level
      rsmaDefs.values.toSeq.flatMap(r =>
        r.levelTxts.zipWithIndex.map { case (txt, i) =>
          (r.name, r.table, i, txt) })
        .toDF("rsma_name", "table_name", "level", "interval")
    }
    else if (up.startsWith("SHOW VTABLES")) insVtables
    // SHOW VTABLE INHERITS (sql.y:1436) = ins_vstable_inherits
    else if (up == "SHOW VTABLE INHERITS") insVstableInherits
    else if (up.startsWith("SHOW FUNCTIONS")) insFunctions
    // SHOW USER PRIVILEGES / SHOW ROLE [COLUMN] PRIVILEGES
    // (sql.y:1350-1353): both read the same grant ledger the GRANT
    // DDL writes (systable.c:507 userUserPrivilegesSchema); the ROLE
    // forms restrict to role grantees
    else if (up.startsWith("SHOW USER PRIVILEGES")) insUserPrivileges
    else if (up.startsWith("SHOW ROLE COLUMN PRIVILEGES"))
      insUserPrivileges.filter(col("columns") =!= "")
    else if (up.startsWith("SHOW ROLE PRIVILEGES")) {
      val roles = roleDefs.toSeq
      insUserPrivileges.filter(col("user_name").isin(roles: _*))
    }
    // SHOW [db.]VIEWS [LIKE 'pat'] (sql.y:1426) over the saved-query
    // registry CREATE VIEW writes
    else if ("(?i)^SHOW (?:[A-Za-z_][A-Za-z0-9_]*\\.)?VIEWS( LIKE '[^']*')?$"
        .r.matches(stmt)) {
      val pat = "(?i)LIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt)
        .map(_.group(1))
      var t = viewDefs.keys.toSeq.map(v => (v, currentDb))
        .toDF("view_name", "db_name")
      pat.foreach(p => t = t.filter(col("view_name").like(p)))
      t
    }
    // SHOW CREATE VIEW v (sql.y:1427): round-trippable DDL
    else if (up.startsWith("SHOW CREATE VIEW ")) {
      val name = bare(stmt.split("\\s+").last)
      val q = viewDefs.getOrElse(name,
        throw new IllegalArgumentException(s"unknown view: $name"))
      Seq((name, s"CREATE VIEW `$name` AS $q")).toDF(
        "view_name", "create_sql")
    }
    // TMQ introspection (sql.y:1414-1415; systable.c consumerSchema /
    // subscriptionSchema). The consume path is Structured Streaming
    // (tmq_subscribe_gate), so the catalog reports the subscribable
    // topics; live consumer sessions are the platform's stream runs
    else if (up.startsWith("SHOW CONSUMERS"))
      Seq.empty[(Long, String, String, String)].toDF(
        "consumer_id", "consumer_group", "client_id", "status")
    else if (up.startsWith("SHOW SUBSCRIPTIONS"))
      Seq.empty[(String, String, Int)].toDF(
        "topic_name", "consumer_group", "vgroup_id")
    // single-process deployment surfaces (sql.y:1373,1387,1393-1398):
    // no arbitration groups, mounts, or at-rest encryption configured
    else if (up.startsWith("SHOW ARBGROUPS"))
      Seq.empty[(Int, String, Int)].toDF(
        "vgroup_id", "db_name", "is_sync")
    else if (up.startsWith("SHOW MOUNTS"))
      mountDefs.toSeq.map { case (n, (d, _, pth)) => (n, d, pth) }
        .toDF("mount_name", "dnode_id", "path")
    else if (up.startsWith("SHOW ENCRYPT_ALGORITHMS"))
      Seq(Tuple1("sm4")).toDF("algorithm")
    else if (up.startsWith("SHOW ENCRYPT_STATUS") ||
        up.startsWith("SHOW ENCRYPTIONS"))
      Seq((1, "unset")).toDF("dnode_id", "key_status")
    else if (up.startsWith("SHOW SCORES"))
      Seq.empty[(Int, String)].toDF("id", "score")
    // SHOW CPU_ALLOCATION (34-CpuAffinity tests): per-dnode core
    // binding — the single-process deployment reports one unbound row
    else if (up.startsWith("SHOW CPU_ALLOCATION"))
      Seq((1, "unbound", Runtime.getRuntime.availableProcessors()))
        .toDF("dnode_id", "binding", "cores")
    // SHOW VNODES [ON DNODE n] (sql.y:1420-1421): one row per vgroup
    // replica on the (single) dnode
    else if (up.startsWith("SHOW VNODES"))
      sql("SHOW VGROUPS").select(
        lit(1).as("dnode_id"), col("vgroup_id"), col("db_name"),
        lit("leader").as("role"), col("status"))
    else if (up.startsWith("SHOW LICENCES")) sql("SHOW GRANTS")
    else if (up.startsWith("SHOW ANODES FULL")) insAnodesFull
    else if (up.startsWith("SHOW ANODES")) insAnodes
    // SHOW XNODE n (sql.y:1429): one instance's detail row
    else if ("(?i)^SHOW XNODE \\d+$".r.matches(stmt)) {
      val id = stmt.split("\\s+").last.toInt
      insXnodes.filter(col("id") === id)
    }
    // SHOW XNODES / XNODE {TASKS|AGENTS|JOBS} [WHERE cond]
    // (sql.y:791-795); SHOW EXTERNAL SOURCES (sql.y:3182)
    else if (up.startsWith("SHOW XNODE") ||
        up.startsWith("SHOW EXTERNAL SOURCES")) {
      val m = ("(?i)^SHOW (XNODES|XNODE TASKS?|XNODE AGENTS?|" +
        "XNODE JOBS?|EXTERNAL SOURCES)(?:\\s+WHERE\\s+(.+))?$").r
      stmt match {
        case m(kind, cond) =>
          val base = kind.toUpperCase match {
            case "XNODES" => insXnodes
            case "XNODE TASKS" | "XNODE TASK" => insXnodeTasks
            case "XNODE AGENTS" | "XNODE AGENT" => insXnodeAgents
            case "XNODE JOBS" | "XNODE JOB" => insXnodeJobs
            case _ => insExtSources
          }
          Option(cond).map(w => base.filter(
              org.apache.spark.sql.functions.expr(
                GraftSql.rewriteTimeScalars(w))))
            .getOrElse(base)
        case _ => throw new IllegalArgumentException(
          s"unsupported statement: $stmt")
      }
    }
    // NORMAL/CHILD qualifiers are vacuous on non-TABLES kinds
    else if ("(?i)^SHOW (NORMAL|CHILD) (VTABLES|STABLES)\\b.*$".r
        .matches(stmt))
      sql(stmt.replaceAll("(?i)^SHOW (NORMAL|CHILD) ", "SHOW "))
    // SHOW VTABLE VALIDATE FOR tbl (sql.y:1434): one row per column
    // reference, valid iff the origin table still carries the column
    else if (up.startsWith("SHOW VTABLE VALIDATE FOR ")) {
      val name = bare(
        stmt.substring("SHOW VTABLE VALIDATE FOR ".length).trim)
      val v = vtableDefs.getOrElse(name,
        throw new IllegalArgumentException(s"vtable not found: $name"))
      v.cols.map { case (cn, _, tbl, sc) =>
        val ok =
          try table(tbl).columns.contains(sc)
          catch { case _: Exception => false }
        (v.name, cn, s"$tbl.$sc", if (ok) "valid" else "invalid")
      }.toDF("vtable_name", "column_name", "ref", "status")
    }
    else if (up == "SHOW DEBUG VARIABLES") sql("SHOW VARIABLES")
    // DESCRIBE EXTERNAL SOURCE name (sql.y:3185)
    else if ("(?i)^DESC(RIBE)? EXTERNAL SOURCE .+$".r.matches(stmt)) {
      val name = bare(stmt.split("\\s+").last).toLowerCase
      require(extSourceDefs.contains(name),
        s"external source not found: $name")
      insExtSources.filter(
        org.apache.spark.sql.functions.col("source_name") === name)
    }
    else if (up.startsWith("SHOW DNODES")) insDnodes
    else if (up.startsWith("SHOW USERS")) insUsers
    else if (up.startsWith("SHOW ROLES")) insRoles
    // SHOW CLUSTER sub-forms must match before the bare SHOW CLUSTER
    else if (up.startsWith("SHOW CLUSTER VARIABLES") ||
        "(?i)^SHOW (?:DNODE )?\\d+ VARIABLES(?: LIKE '[^']*')?$".r
          .matches(stmt)) {
      val like = "(?i)\\bLIKE\\s+'([^']*)'".r.findFirstMatchIn(stmt)
      like match {
        case Some(m) =>
          sql("SHOW VARIABLES").filter(col("name").like(m.group(1)))
        case None => sql("SHOW VARIABLES")
      }
    }
    else if (up.startsWith("SHOW CLUSTER MACHINES"))
      // license/machine listing (sql.y SHOW CLUSTER MACHINES): one
      // machine — the Spark driver
      Seq((spark.sparkContext.applicationId, 1)).toDF("id", "machines")
    else if (up.startsWith("SHOW CLUSTER ALIVE") ||
        "(?i)^SHOW (?:[A-Za-z_][A-Za-z0-9_]*\\.)?ALIVE$".r.matches(stmt))
      // 1 = all vgroups reachable (mndShowClusterAlive semantics)
      Seq(Tuple1(1)).toDF("status")
    else if (up.startsWith("SHOW VGROUPS") ||
        "(?i)^SHOW [A-Za-z_][A-Za-z0-9_]*\\.VGROUPS$".r.matches(stmt))
      // vgroup ≈ the engine's partition unit: one row per database
      // with its table count (local mode has a single virtual group)
      databases.keys.toSeq.zipWithIndex.map { case (db, i) =>
        (i + 2, db,
          children.values.count(c => stables(c.stableName).db == db)
            .toLong, "ready")
      }.toDF("vgroup_id", "db_name", "tables", "status")
    else if (up.startsWith("SHOW MNODES"))
      nodeDeploy("MNODE").toSeq.map(d => (d, s"localhost:${6030 + d - 1}",
          if (d == 1) "leader" else "follower", "ready"))
        .toDF("id", "endpoint", "role", "status")
    else if (up.startsWith("SHOW QNODES") || up.startsWith("SHOW SNODES")
        || up.startsWith("SHOW BNODES"))
      // deployments land here via CREATE QNODE/SNODE/BNODE ON DNODE n
      nodeDeploy(up.split("\\s+")(1).stripSuffix("S")).toSeq
        .map(d => (d, s"localhost:${6030 + d - 1}"))
        .toDF("id", "endpoint")
    // SHOW [db.]DISK_INFO (sql.y:1429 createShowDiskUsageStmt) reads
    // ins_disk_usage, optionally scoped to one database
    else if (up == "SHOW DISK_INFO") insDiskUsage
    else if ("(?i)^SHOW [A-Za-z_]\\w*\\.DISK_INFO$".r.matches(stmt))
      insDiskUsage.filter(col("db_name") ===
        stmt.split("\\s+")(1).split("\\.")(0).toLowerCase)
    else if (up.startsWith("SHOW SCANS"))
      scanLog.toSeq.toDF("scan_id", "db_name", "start_time")
    // SHOW TOKENS (systable.c:744 tokenSchema): expire = create + TTL
    else if (up.startsWith("SHOW TOKENS"))
      tokenDefs.values.toSeq.map { t =>
        val created = 1700000000000L + t.createSeq * 1000L
        (t.name, t.user, t.provider, t.enable, created,
          t.ttlDays.map(d => created + d * 86400000L).getOrElse(0L),
          t.extraInfo)
      }.toDF("name", "user", "provider", "enable", "create_time",
        "expire_time", "extra_info")
    // SHOW INSTANCES (systable.c:443 instanceSchema) — client
    // instance tracking is the connector's job; empty listing
    else if (up.startsWith("SHOW INSTANCES"))
      Seq.empty[(String, String, String, Long, Long, Int)]
        .toDF("id", "type", "desc", "first_reg_time", "last_reg_time",
          "expire")
    // SHOW SECURITY_POLICIES (systable.c securityPoliciesSchema)
    else if (up.startsWith("SHOW SECURITY_POLICIES"))
      Seq.empty[(String, String, String, Long, String)]
        .toDF("name", "mode", "operator", "last_update", "desc")
    // SHOW SSMIGRATES (systable.c:582 userSsMigratesSchema) — shared
    // storage migration never runs in the single-process engine
    else if (up.startsWith("SHOW SSMIGRATES"))
      Seq.empty[(Int, String, Long)]
        .toDF("ssmigrate_id", "db_name", "start_time")
    // SHOW RETENTION n (sql.y:1495): one ladder level's detail
    else if ("(?i)^SHOW RETENTION \\d+$".r.matches(stmt)) {
      val lvl = stmt.split("\\s+").last.toInt
      rsmaDefs.values.toSeq.flatMap(r =>
        r.levelTxts.zipWithIndex.collect { case (txt, i) if i == lvl =>
          (r.name, r.table, i, txt) })
        .toDF("rsma_name", "table_name", "level", "interval")
    }
    else if ("(?i)^SHOW SCAN \\d+$".r.matches(stmt)) {
      val sid = stmt.split("\\s+").last.toInt
      scanLog.toSeq.filter(_._1 == sid)
        .toDF("scan_id", "db_name", "start_time")
    }
    else if (up.startsWith("SHOW COMPACTS"))
      compactLog.toSeq.toDF("compact_id", "db_name", "status")
    else if ("(?i)^SHOW COMPACT \\d+$".r.matches(stmt)) {
      val cid = stmt.split("\\s+").last.toInt
      compactLog.toSeq.filter(_._1 == cid)
        .toDF("compact_id", "db_name", "status")
    }
    else if (up.startsWith("SHOW TRANSACTIONS"))
      Seq.empty[(Int, String, String)]
        .toDF("id", "created_time", "stage")
    // SHOW TRANSACTION LOGS / ORPHANS / n (sql.y:1410-1412;
    // systable.h ins_transaction_*): the single-process engine commits
    // synchronously, so the logs are empty by construction
    else if (up == "SHOW TRANSACTION LOGS")
      Seq.empty[(Int, Long, String, String)]
        .toDF("id", "created_time", "action", "detail")
    else if (up == "SHOW TRANSACTION ORPHANS")
      Seq.empty[(Int, Long, String)]
        .toDF("id", "created_time", "stage")
    // SHOW TRANSACTION <id> (sql.y:1410
    // createShowTransactionDetailsStmt): per-transaction action rows
    // with the ins_transaction_details schema (systable.c:594
    // userTransactionDetailSchema) — empty by construction here, the
    // single-process engine commits synchronously
    else if ("(?i)^SHOW TRANSACTION \\d+$".r.matches(stmt))
      Seq.empty[(Int, String, String, String, String, String)]
        .toDF("transaction_id", "action", "obj_type", "result",
          "target", "detail")
    // SHOW CREATE STREAM s (sql.y:1486): round-trippable DDL text
    else if (up.startsWith("SHOW CREATE STREAM ")) {
      val name = bare(stmt.split("\\s+").last)
      val sd = streamDefs.getOrElse(name,
        throw new IllegalArgumentException(s"stream not found: $name"))
      Seq((name, s"CREATE STREAM `$name` ${sd.options} " +
        s"INTO `${sd.into}` AS ${sd.select}".replaceAll("\\s+", " ")))
        .toDF("stream_name", "create_sql")
    }
    else if (up.startsWith("SHOW GRANTS"))
      // license introspection (sql.y:1382 SHOW GRANTS → licences)
      Seq(("community", "unlimited", "unlimited"))
        .toDF("version", "expire_time", "storage")
    else if (up.startsWith("SHOW CLUSTER")) insCluster
    // SHOW [NORMAL|CHILD] [db.]TABLES [LIKE 'pat'] (sql.y:1336-1345)
    else if ("(?i)^SHOW (?:(NORMAL|CHILD) )?(?:([A-Za-z_][A-Za-z0-9_]*)\\.)?TABLES(?: LIKE '([^']*)')?$"
        .r.matches(stmt)) {
      val m = ("(?i)^SHOW (?:(NORMAL|CHILD) )?" +
        "(?:([A-Za-z_][A-Za-z0-9_]*)\\.)?TABLES(?: LIKE '([^']*)')?$")
        .r.findFirstMatchIn(stmt).get
      var t = insTables
      Option(m.group(1)).map(_.toUpperCase).foreach {
        // a regular table is its own degenerate stable; a child's
        // stable is a different table
        case "NORMAL" =>
          t = t.filter(col("table_name") === col("stable_name"))
        case _ =>
          t = t.filter(col("table_name") =!= col("stable_name"))
      }
      Option(m.group(2)).foreach(db =>
        t = t.filter(col("db_name") === db))
      Option(m.group(3)).foreach(pat =>
        t = t.filter(col("table_name").like(pat)))
      t
    }
    else if (up.startsWith("DESCRIBE ") || up.startsWith("DESC "))
      describe(stmt.split("\\s+").last)
    else { exec(stmt); spark.emptyDataFrame }
  }
}

object GraftCatalog {
  /** Schema metadata marking a TAG column on catalog reads — lets the
    * dialect front end apply tbname-style riding rules to tags. */
  val TagMeta: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.tag", true).build()

  /** Star-hidden TAG: resolvable by name but excluded from `*`
    * expansion — the reference's wildcard is regular columns only on
    * basic tables and SUBTABLES; tags join `*` only on SUPERTABLE
    * reads (20-select.md:183). tbname is a pseudo column on both and
    * never rides `*`. */
  val HiddenTagMeta: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.tag", true)
      .putBoolean("graft.star_hidden", true).build()

  /** Star-hidden non-tag (tbname). */
  val HiddenMeta: org.apache.spark.sql.types.Metadata =
    new org.apache.spark.sql.types.MetadataBuilder()
      .putBoolean("graft.star_hidden", true).build()
}
