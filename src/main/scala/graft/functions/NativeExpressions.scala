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
  * allocation per element, stays inside whole-stage codegen. */
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

object NativeExpressions {
  /** Column form of [[LongDotProduct]]. */
  def longDot(a: Column, b: Column): Column =
    GraftColumnShim.column(LongDotProduct(
      GraftColumnShim.expression(a), GraftColumnShim.expression(b)))
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
