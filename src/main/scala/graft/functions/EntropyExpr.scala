package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}

/** Shannon entropy (nats) of a symbol array's empirical distribution,
  * in ONE pass.
  *
  * Semantically identical to the composed HOF form
  * `aggregate(array_sort(array_distinct(s)), 0.0, (acc, x) ->
  * acc - p(x)·ln p(x))` with `p(x) = size(filter(s, _ = x)) / size(s)`
  * — but that form re-scans the array once PER DISTINCT SYMBOL through
  * Catalyst's interpreted lambda evaluator (the [[ShinglesExpr]]
  * lesson): O(n·k) interpreted steps read 98 s for `quality_entropy`
  * at sf0.1 where this expression reads milliseconds. Counts accumulate
  * in a TreeMap and the fold walks it in ASCENDING key order — the
  * same sorted-fold the HOF form and the DuckDB twin use, because
  * float addition isn't associative and the 6dp gate would flap under
  * any engine-dependent order (binary string order ≡ DuckDB's default
  * collation on the ASCII corpus).
  *
  * Empty or null-element-free input of length 0 → 0.0 (matching the
  * twins' CASE guard). CodegenFallback: the expression sits beside
  * other per-doc projections and is itself the loop — nothing to fuse.
  */
case class EntropyExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "symbol_entropy"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return 0.0
    val counts = new java.util.TreeMap[String, Long]()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i).toString
      counts.merge(s, 1L, (a, b) => a + b)
      i += 1
    }
    var acc = 0.0
    val it = counts.values().iterator()
    while (it.hasNext) {
      val p = it.next().toDouble / n
      acc = acc - p * Math.log(p)
    }
    acc
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"symbol_entropy expects array<string>, got $other")
    }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object EntropyExpr {
  def entropy(syms: Column): Column =
    Bridge.column(EntropyExpr(Bridge.expression(syms)))
}
