package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point query into a serialized count-min sketch:
  * `cms_estimate(sketch_bytes, value) → Long`.
  *
  * Spark ships the BUILD side (`functions.count_min_sketch` — a
  * mergeable fixed-size aggregate, partial sketches merging map-side)
  * but no expression to READ the sketch back inside a query; estimates
  * otherwise require collecting the bytes to the driver. This closes
  * the loop so the probe stays distributed: broadcast the 1-row sketch,
  * cross join, estimate per candidate row.
  *
  * The sketch deserializes once per byte-array INSTANCE, not once per
  * row — with a broadcast scalar every row of a partition sees the same
  * array, so the reference-equality memo hits after the first row.
  * String values hash via their UTF-8 bytes, exactly how
  * CountMinSketchAgg inserts them (addBinary(utf8.getBytes)); long/int
  * values pass through the sketch's integral path. CodegenFallback is
  * deliberate: the memo needs expression-instance state, and the probe
  * side is a handful of candidate rows — nothing a generated loop would
  * speed up.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def nullSafeEval(sketchBytes: Any, value: Any): Any = {
    val bytes = sketchBytes.asInstanceOf[Array[Byte]]
    if (!(bytes eq cachedBytes)) {
      cachedSketch = CountMinSketch.readFrom(bytes)
      cachedBytes = bytes
    }
    value match {
      case s: UTF8String => cachedSketch.estimateCount(s.getBytes)
      case other         => cachedSketch.estimateCount(other)
    }
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object CmsEstimate {
  def apply(sketch: Column, value: Column): Column =
    Bridge.column(CmsEstimate(Bridge.expression(sketch), Bridge.expression(value)))
}
