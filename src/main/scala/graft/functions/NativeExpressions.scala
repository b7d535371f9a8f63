package graft.functions

import org.apache.spark.sql.{Column, GraftColumnShim, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the vector hot path (SURVEY §7.3:
  * "promote hot ones to Expression"). `LongDotProduct` is the kernel
  * under every similarity/dedup cosine: a tight codegen'd loop over two
  * Long arrays — no higher-order-function interpretation, no lambda
  * allocation per element, stays inside whole-stage codegen.
  * Null ELEMENTS inside an input array read as 0 (fixed-point vectors
  * from `microVec` never contain them; don't feed sparse arrays). */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> arguments, " +
        s"got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_long_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getLong($i) * $y.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(newLeft, newRight)
}

/** MinHash signature computed in one pass over a word array: for each
  * k-word shingle a 64-bit hash is chained from per-word XXH64 hashes,
  * and the `numHashes` signature slots take the minimum of a cheap
  * avalanche remix of that shingle hash. Duplicated shingles cannot
  * change a minimum, so no dedup pass is needed. Null when the document
  * has fewer than k words (no shingles → no signature, same as the
  * exploded-index formulation). Replaces an explode + 32-min hash
  * aggregate — one shuffle of |corpus|·|shingles| rows — with a
  * map-side expression. */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_signature"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[ArrayData], k, numHashes)

  // compute() returns null for sub-k-word documents, so the generated
  // code must propagate isNull itself — defineCodeGen would leave
  // isNull=false around a null value and NPE downstream.
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} =
       |  graft.functions.MinHashSignature.compute($c, $k, $numHashes);
       |${ev.isNull} = ${ev.value} == null;
     """.stripMargin)

  override def nullable: Boolean = true
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object MinHashSignature {
  private final val Prime = 0x9e3779b97f4a7c15L

  private def mix(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Called from both interpreted eval and generated code. Returns
    * null when fewer than k words. */
  def compute(words: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = words.numElements()
    if (n < k) return null
    val wh = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i)
      wh(i) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
      i += 1
    }
    val sig = Array.fill(numHashes)(Long.MaxValue)
    i = 0
    val nSh = n - k + 1
    while (i < nSh) {
      var h = Prime
      var j = 0
      while (j < k) { h = (h ^ wh(i + j)) * Prime; j += 1 }
      var s = 0
      while (s < numHashes) {
        val v = mix(h + s * Prime)
        if (v < sig(s)) sig(s) = v
        s += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }
}

/** Sign-bit LSH bucket ids for ALL hash tables in one pass over the
  * vector: table t uses planes `t*planes .. t*planes+planes-1` of the
  * deterministic xxhash64-derived hyperplane pool (stride 16 per
  * element), and its bucket id is tagged with `t << planes`. Replaces
  * `tables` interpreted transform/aggregate/zip_with chains — each
  * re-walking the vector per plane with per-element lambda dispatch
  * and Decimal boxing — with a single tight loop. Bit-identical to the
  * Column formula in SimilarityOps.lshBucketCol (asserted in
  * NativeExpressionsSpec). */
case class LshBuckets(child: Expression, planes: Int, tables: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(planes >= 1 && tables >= 1 && planes * tables <= 16,
    s"plane budget: planes*tables <= 16, got $planes*$tables")

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.FloatType |
                   org.apache.spark.sql.types.DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<float|double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], elemIsFloat,
      planes, tables)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = graft.functions.LshBuckets.compute(
       |  $c, $elemIsFloat, $planes, $tables);
     """.stripMargin)

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object LshBuckets {
  // xxhash64(lit(0), idx) = hashInt(idx, hashInt(0, 42)) — the same
  // fold Spark's XxHash64 expression performs over its children; both
  // operands are IntegerType in the Column formula, so the 4-byte
  // hashInt variant is the one that matches
  private final val Seed =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(0, 42L)

  /** Pseudo-random hyperplane component in [-1, 1), identical to
    * SimilarityOps.planeWeight. */
  private def weight(idx: Int): Double =
    (Math.floorMod(org.apache.spark.sql.catalyst.expressions.XXH64
      .hashInt(idx, Seed), 2000001L) - 1000000L).toDouble / 1000000.0

  /** Round-trip of `cast(x as decimal(12,6)) as double` — Spark's
    * Decimal uses the canonical string form + HALF_UP. */
  private def quant6(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(vec: ArrayData, isFloat: Boolean, planes: Int,
      tables: Int): ArrayData = {
    val n = vec.numElements()
    val nPlanes = planes * tables
    val projs = new Array[Double](nPlanes)
    var i = 0
    while (i < n) {
      val q = quant6(
        if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i))
      val base = i * 16
      var k = 0
      while (k < nPlanes) {
        projs(k) += q * weight(base + k)
        k += 1
      }
      i += 1
    }
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var b = 0L
      var p = 0
      while (p < planes) {
        if (projs(t * planes + p) > 0) b += (1L << p)
        p += 1
      }
      out(t) = b + (t.toLong << planes)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** SimHash fingerprint in one pass over a word array: per-document
  * token counts (in-expression hash map), md5 per DISTINCT token, the
  * top 48 md5 bits vote ±count per bit position, and set bits pack into
  * a long. Replaces an explode → (id,token) groupBy → 48-way bit
  * explode → two more groupBys — three shuffles and a 48× row blowup —
  * with a map-side expression. Bit-identical to that lowering (md5 of
  * the token's UTF-8 bytes; the first 12 hex digits are the first 6
  * digest bytes big-endian). Null for token-less documents (the
  * exploded form drops them). */
case class SimHashFingerprint(child: Expression, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(bits >= 1 && bits <= 48, s"bits must be in [1,48]: $bits")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(org.apache.spark.sql.types.StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashFingerprint.compute(input.asInstanceOf[ArrayData], bits)

  // compute() returns null for empty docs — propagate isNull like
  // MinHashSignature does
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("shBoxed")
      s"""
       |java.lang.Long $boxed =
       |  graft.functions.SimHashFingerprint.compute($c, $bits);
       |${ev.isNull} = $boxed == null;
       |${ev.value} = ${ev.isNull} ? -1L : $boxed.longValue();
     """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object SimHashFingerprint {
  /** Called from both interpreted eval and generated code. */
  def compute(words: ArrayData, bits: Int): java.lang.Long = {
    val n = words.numElements()
    if (n == 0) return null
    val counts = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val s = words.getUTF8String(i).toString
      val prev = counts.get(s)
      counts.put(s, if (prev == null) 1L else prev + 1L)
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Long](bits)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val d = md.digest(
        e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 12 hex digits == first 6 bytes, big-endian
      var h = 0L
      var j = 0
      while (j < 6) { h = (h << 8) | (d(j) & 0xffL); j += 1 }
      val cnt: Long = e.getValue.longValue()
      var b = 0
      while (b < bits) {
        votes(b) += (if (((h >>> b) & 1L) == 1L) cnt else -cnt)
        b += 1
      }
    }
    var fp = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) fp |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(fp)
  }
}

/** Identity reinterpret of a TIMESTAMP_NTZ value as its internal
  * epoch-µs Long — Spark stores NTZ as micros-since-epoch, so the
  * events normalization (`Tables.eventsAt`) becomes a zero-cost
  * rename instead of running `cast(ntz as timestamp)` timezone
  * machinery per row on every events scan. `TsRangePushdown`
  * recognizes this node when re-deriving storage-domain scan ranges. */
case class TimestampNtzMicros(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs timestamp_ntz, got $t")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_ntz_micros"

  override def nullSafeEval(v: Any): Any = v
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)
  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(newChild)
}

object NativeExpressions {
  /** Column form of [[TimestampNtzMicros]]. */
  def ntzMicros(c: Column): Column =
    GraftColumnShim.column(TimestampNtzMicros(
      GraftColumnShim.expression(c)))

  /** Column form of [[LongDotProduct]]. */
  def longDot(a: Column, b: Column): Column =
    GraftColumnShim.column(LongDotProduct(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column form of [[MinHashSignature]]. */
  def minhashSig(words: Column, k: Int, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSignature(
      GraftColumnShim.expression(words), k, numHashes))

  /** Column form of [[LshBuckets]]. */
  def lshBuckets(vec: Column, planes: Int, tables: Int): Column =
    GraftColumnShim.column(LshBuckets(
      GraftColumnShim.expression(vec), planes, tables))

  /** Column form of [[SimHashFingerprint]]. */
  def simhashFp(words: Column, bits: Int): Column =
    GraftColumnShim.column(SimHashFingerprint(
      GraftColumnShim.expression(words), bits))
}

/** MySQL-style WEEK(ts, mode) over an epoch-µs BIGINT — all 8 modes
  * (sclfunc.c:5073 calculateWeekNum + :5109 weekMode; sclInt.h:89-91
  * flag bits: 1 = Monday-first, 2 = weeks start at 1, 4 = the week
  * containing the year's first day-of-week is week 1, else weeks need
  * 4+ days in the year). Codegen calls the static compute. */
case class WeekNum(child: Expression, modeExpr: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  private val mode: Int = {
    require(modeExpr.foldable, "week() mode must be a literal")
    val m = modeExpr.eval().asInstanceOf[Number].intValue
    require(m >= 0 && m <= 7, s"week() mode must be 0..7, got $m")
    m
  }
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs bigint epoch-µs, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_week"

  override def nullSafeEval(input: Any): Any =
    WeekNum.compute(input.asInstanceOf[Long], mode)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WeekNum.compute($c, $mode)")

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}

object WeekNum {
  /** Called from both interpreted eval and generated code. */
  def compute(us: Long, mode0: Int): Long = {
    // weekMode(): without the Monday-first bit, toggle the
    // include-first-day bit (sclfunc.c:5109)
    val mode = if ((mode0 & 1) != 0) mode0 else mode0 ^ 4
    val mondayFirst = (mode & 1) != 0
    var fromOne = (mode & 2) != 0
    val firstWeekday = (mode & 4) != 0
    val epochDay = Math.floorDiv(us, 86400000000L)
    val d = java.time.LocalDate.ofEpochDay(epochDay)
    var year = d.getYear
    var firstDayNum = java.time.LocalDate.of(year, 1, 1).toEpochDay
    // day-of-week of a day number, 0-based on the mode's week start
    // (epoch day 0 = Thursday: +3 Monday-based, +4 Sunday-based)
    def wd(daynr: Long): Int =
      Math.floorMod(daynr + (if (mondayFirst) 3 else 4), 7).toInt
    var weekday = wd(firstDayNum)
    def headWeekIsOne(w: Int): Boolean =
      if (firstWeekday) w == 0 else w < 4
    if (d.getMonthValue == 1 && d.getDayOfMonth <= 7 - weekday) {
      if (!fromOne && !headWeekIsOne(weekday)) return 0L
      fromOne = true
      year -= 1
      val daysPrev = if (java.time.Year.isLeap(year)) 366L else 365L
      firstDayNum -= daysPrev
      weekday = Math.floorMod(weekday + 53 * 7 - daysPrev, 7).toInt
    }
    val days =
      if (!headWeekIsOne(weekday)) epochDay - (firstDayNum + (7 - weekday))
      else epochDay - (firstDayNum - weekday)
    if (fromOne && days >= 52 * 7) {
      val yearDays = if (java.time.Year.isLeap(year)) 366L else 365L
      val wd2 = Math.floorMod(weekday + yearDays, 7).toInt
      if (headWeekIsOne(wd2)) return 1L
    }
    days / 7 + 1
  }
}

/** Per-session SQL registration for natives the dialect front end
  * emits in generated SQL text (idempotent; `expr(...)` resolves
  * lazily against the active session, so GraftSql.query installs
  * these before parsing). */
object NativeFunctions {
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    val id = new FunctionIdentifier("graft_week")
    if (!reg.functionExists(id)) {
      reg.registerFunction(id,
        new ExpressionInfo(classOf[WeekNum].getName, "graft_week"),
        (children: Seq[Expression]) => WeekNum(children(0), children(1)))
    }
    val tsId = new FunctionIdentifier("graft_ts_canon")
    if (!reg.functionExists(tsId)) {
      reg.registerFunction(tsId,
        new ExpressionInfo(classOf[CanonicalTsString].getName,
          "graft_ts_canon"),
        (children: Seq[Expression]) => {
          require(children.length == 2 && children(1).foldable,
            "graft_ts_canon(input, fmt) needs a literal format")
          CanonicalTsString(children(0),
            String.valueOf(children(1).eval()))
        })
    }
  }
}

/** SparkSessionExtensions entry point: set
  * `spark.sql.extensions=graft.functions.GraftExtensions` and the
  * native functions become callable from SQL (`graft_long_dot(a, b)`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_long_dot"),
      new ExpressionInfo(classOf[LongDotProduct].getName, "graft_long_dot"),
      (children: Seq[Expression]) =>
        LongDotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_week"),
      new ExpressionInfo(classOf[WeekNum].getName, "graft_week"),
      (children: Seq[Expression]) => WeekNum(children(0), children(1))))
  }
}
