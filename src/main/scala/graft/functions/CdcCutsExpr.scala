package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Content-defined chunk cut points over a binary payload — the
  * rsync/LBFS/FastCDC family (Muthitacharoen et al. 2001): a chunk
  * boundary falls wherever a rolling hash of the trailing `window`
  * bytes hits a fixed residue, so boundaries move WITH content — an
  * insertion early in a blob shifts every fixed-size block but leaves
  * all content-defined chunks after the edit window identical, which
  * is what makes cross-blob chunk dedup work on mutated payloads.
  *
  * Returns the 0-based INCLUSIVE end offset of every chunk, final
  * chunk included (so `ends` alone reconstructs all spans: chunk k is
  * `[prev_end+1, end_k]`). Empty payload → empty array.
  *
  * The hash is an exact-integer polynomial over the trailing window:
  * `h(i) = Σ_{j=0..w-1} byte(i-j) · B^j` with byte values unsigned.
  * With the defaults (w = 8, B = 31) the largest possible sum is
  * 255·Σ31^j ≈ 2.4e13 — exact in a Long AND in an IEEE double
  * (< 2^53), which is what lets the DuckDB oracle twin reproduce it
  * bit-for-bit with list arithmetic. Boundary when `h % div == div-1`
  * (expected chunk length ≈ `div`). Deliberately NO min/max chunk
  * clamp: the clamped variants make each cut depend on the previous
  * cut — a sequential scan — while the pure hash test is per-position
  * independent, so chunking stays embarrassingly parallel per row and
  * the whole operator never shuffles until chunk digests aggregate.
  *
  * One tight O(n) pass per row, O(n/div) output. CodegenFallback for
  * the same reason as [[ShinglesExpr]]: the array feeds an explode,
  * which bounds the codegen stage anyway.
  */
case class CdcCutsExpr(child: Expression, window: Int, base: Long, div: Long)
    extends UnaryExpression with CodegenFallback {
  require(window >= 1 && base >= 2 && div >= 2, s"bad CDC params: w=$window B=$base D=$div")
  require(255L * (0 until window).map(j => math.pow(base.toDouble, j)).sum < math.pow(2, 53),
    s"window hash must stay exact in a double: w=$window B=$base overflows 2^53")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_cuts"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // rolling update: h ← (h − b_out·B^(w−1))·B + b_in, kept exact in Long
    val topPow = (1 until window).foldLeft(1L)((p, _) => p * base)
    val out = Array.newBuilder[Any]
    var h = 0L
    var i = 0
    while (i < n) {
      val bIn = (bytes(i) & 0xff).toLong
      h = if (i < window) h * base + bIn
          else (h - (bytes(i - window) & 0xff).toLong * topPow) * base + bIn
      if (i >= window - 1 && i < n - 1 && h % div == div - 1) out += i
      i += 1
    }
    out += (n - 1) // the final chunk always ends at the last byte
    new GenericArrayData(out.result())
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcCutsExpr {
  def cuts(payload: Column, window: Int = 8, base: Long = 31L, div: Long = 64L): Column =
    Bridge.column(CdcCutsExpr(Bridge.expression(payload), window, base, div))
}
