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

object NativeExpressions {
  /** Column form of [[LongDotProduct]]. */
  def longDot(a: Column, b: Column): Column =
    GraftColumnShim.column(LongDotProduct(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))

  /** Column form of [[MinHashSignature]]. */
  def minhashSig(words: Column, k: Int, numHashes: Int): Column =
    GraftColumnShim.column(MinHashSignature(
      GraftColumnShim.expression(words), k, numHashes))
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
  }
}
