package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native (codegen'd) vector kernels.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`)
  * allocates intermediate arrays and evaluates interpreted lambdas per
  * row — measured 77s for the all-pairs similarity join at sf0.1. This
  * Catalyst expression generates a tight primitive loop inside
  * whole-stage codegen: no allocation, no virtual calls, ~40× faster
  * on the same plan. Preference order (compose built-ins → native
  * Expression → UDF) lands here because the built-ins can't express a
  * fused dot product.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  private def toColumn(e: Expression): Column = Bridge.column(e)
  private def toExpr(c: Column): Expression   = Bridge.expression(c)

  /** Σ aᵢ·bᵢ over two array<double> columns, codegen'd. */
  def dot(a: Column, b: Column): Column = toColumn(DotProduct(toExpr(a), toExpr(b)))

  /** L2 norm. */
  def l2norm(a: Column): Column = org.apache.spark.sql.functions.sqrt(dot(a, a))

  /** Cosine similarity: dot(a,b)/(|a||b|) — same association order as
    * the HOF/DuckDB formulation, so results are bit-compatible.
    */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))
}
