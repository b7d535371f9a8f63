package graft.functions

import org.apache.spark.sql.{Encoders, SparkSession, functions}
import org.apache.spark.sql.expressions.Aggregator

/** Runtime bindings for the UDF DDL surface (reference grammar
  * sql.y:1589 `CREATE [AGGREGATE] FUNCTION name AS <impl> OUTPUTTYPE t
  * [BUFSIZE n]`; runtime contract taosudf.h scalar/agg entry points,
  * loaded out-of-process by udfd.c).
  *
  * The reference's AS clause names a native shared library; here it
  * names a registry key resolved to a JVM implementation — the same
  * name→code indirection with the JVM as the loader. Binding goes
  * through `spark.udf.register`, so once a function is created via DDL
  * text it resolves by name inside any dialect expression (WHERE,
  * SELECT, aggregates), exactly like the reference's parser resolving
  * a UDF call against the mnode's function catalog.
  *
  * Scale note: scalar entries are plain Scala UDFs (row-at-a-time but
  * fully distributed); aggregate entries are [[Aggregator]]s with the
  * partial/merge contract, so they combine map-side like any built-in
  * aggregate — no driver funnels. */
object UdfRegistry {

  /** Bitwise-OR aggregate over BIGINT — exact at any merge order, the
    * canonical partial/merge shape of taosudf.h's udaf (start/agg/
    * merge/finish). */
  private object BitOr64 extends Aggregator[java.lang.Long, Long,
      java.lang.Long] {
    def zero: Long = 0L
    def reduce(b: Long, a: java.lang.Long): Long =
      if (a == null) b else b | a.longValue()
    def merge(b1: Long, b2: Long): Long = b1 | b2
    def finish(r: Long): java.lang.Long = r
    def bufferEncoder = Encoders.scalaLong
    def outputEncoder = Encoders.LONG
  }

  private def gcd(a: Long, b: Long): Long = {
    var x = math.abs(a); var y = math.abs(b)
    while (y != 0) { val t = x % y; x = y; y = t }
    x
  }

  /** sqrt-of-sum-of-squares aggregate — the reference's canonical
    * sample UDAF (docs/examples/udf/l2norm.c: null rows skipped,
    * DOUBLE out; udf2.c is the same shape). The sum-of-squares buffer
    * merges associatively, so map-side partials combine exactly like
    * l2norm_merge. */
  private object L2Norm extends Aggregator[java.lang.Double, Double,
      java.lang.Double] {
    def zero: Double = 0.0
    def reduce(b: Double, a: java.lang.Double): Double =
      if (a == null) b else b + a.doubleValue() * a.doubleValue()
    def merge(b1: Double, b2: Double): Double = b1 + b2
    def finish(r: Double): java.lang.Double = math.sqrt(r)
    def bufferEncoder = Encoders.scalaDouble
    def outputEncoder = Encoders.DOUBLE
  }

  /** impl key → (aggregate?, bind). Spark null-guards primitive-typed
    * Scala UDFs (null in → null out), matching the reference's
    * NULL-propagating scalar UDF default. */
  private val impls: Map[String, (Boolean, (SparkSession, String) => Unit)] =
    Map(
      "graft.udf.Gcd64" -> ((false, (s, n) =>
        s.udf.register(n, (a: Long, b: Long) => gcd(a, b)))),
      // the reference's sample scalar UDF (docs/examples/udf/
      // bit_and.c: >= 2 int columns ANDed; any-null → null row)
      "graft.udf.BitAnd64" -> ((false, (s, n) =>
        s.udf.register(n, (a: Long, b: Long) => a & b))),
      "graft.udf.L2Norm" -> ((true, (s, n) =>
        s.udf.register(n, functions.udaf(L2Norm, Encoders.DOUBLE)))),
      "graft.udf.BitOr64" -> ((true, (s, n) =>
        s.udf.register(n, functions.udaf(BitOr64, Encoders.LONG)))))

  def knownImpls: Seq[String] = impls.keys.toSeq.sorted

  /** Bind a USER-SUPPLIED function body (the udfd.c / taospyudf.cpp
    * analog: the reference ships the user's script to a daemon that
    * compiles and runs it; here the user's body is a SQL expression
    * over positional args `a0..aN`, compiled ONCE at CREATE FUNCTION
    * time into a Catalyst expression template). Calls substitute the
    * argument expressions into the template, so the bound function
    * stays inside whole-stage codegen — no row-at-a-time closure. An
    * AGGREGATE body (e.g. `sqrt(sum(a0*a0))`) lands in agg position
    * through the same substitution; Spark's analyzer enforces
    * aggregate-vs-scalar placement. */
  def bindBody(spark: SparkSession, fnName: String, body: String): Unit = {
    import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
    import org.apache.spark.sql.catalyst.expressions.Expression
    val template = spark.sessionState.sqlParser.parseExpression(body)
    val argRe = "(?i)^a(\\d+)$".r
    def argIdx(e: Expression): Option[Int] = e match {
      case UnresolvedAttribute(Seq(n)) => n match {
        case argRe(i) => Some(i.toInt)
        case _ => None
      }
      case _ => None
    }
    val idxs = template.collect(Function.unlift(argIdx))
    val arity = if (idxs.isEmpty) 0 else idxs.max + 1
    require(idxs.toSet == (0 until arity).toSet,
      s"user UDF body must reference args a0..a${arity - 1} " +
        s"contiguously: $body")
    val stray = template.collect {
      case ua: UnresolvedAttribute if argIdx(ua).isEmpty => ua.name
    }
    require(stray.isEmpty,
      s"user UDF body may only reference its args a0..aN, found: " +
        stray.mkString(", "))
    val builder: Seq[Expression] => Expression = args => {
      require(args.length == arity,
        s"$fnName expects $arity argument(s), got ${args.length}")
      template.transformUp {
        case ua: UnresolvedAttribute if argIdx(ua).isDefined =>
          args(argIdx(ua).get)
      }
    }
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(fnName, builder, "scala_udf")
  }

  /** Bind `impl` under `fnName`. The DDL's AGGREGATE keyword must match
    * the implementation's kind — the reference rejects a scalar lib
    * declared AGGREGATE at create time, not first call. */
  def bind(spark: SparkSession, fnName: String, impl: String,
      aggregate: Boolean): Unit = {
    val (isAgg, reg) = impls.getOrElse(impl,
      throw new IllegalArgumentException(
        s"unknown UDF implementation '$impl' (known: " +
          s"${knownImpls.mkString(", ")})"))
    require(isAgg == aggregate,
      s"$impl is ${if (isAgg) "an AGGREGATE" else "a scalar"} " +
        s"implementation but was declared ${if (aggregate) "AGGREGATE"
          else "scalar"}")
    reg(spark, fnName)
  }
}
