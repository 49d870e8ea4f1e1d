package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Grouped top-k as a real aggregate: a bounded min-heap per group
  * (O(n log k) memory-bounded state) instead of a window sort over the
  * whole partition (O(n log n), full materialization). This is the
  * custom-`TypedImperativeAggregate` extension point — the same shape
  * used for sketches (HLL/quantile) — with partial-merge support, so
  * map-side combine works: each partition ships at most k doubles.
  */
case class TopKAggregate(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[Double]] {

  private type Buf = scala.collection.mutable.PriorityQueue[Double]

  // min-heap: head is the SMALLEST retained value, evicted first
  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.PriorityQueue.empty[Double](Ordering[Double].reverse)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (buf.size < k) buf.enqueue(d)
      else if (d > buf.head) { buf.dequeue(); buf.enqueue(d) }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { d =>
      if (b1.size < k) b1.enqueue(d)
      else if (d > b1.head) { b1.dequeue(); b1.enqueue(d) }
    }
    b1
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(buf.toArray.sorted(Ordering[Double].reverse))

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue(bb.getDouble))
    buf
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean  = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "agg_topk"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object TopKAggregate {
  /** Top-k values of `c` (descending) per group, as array<double>. */
  def topk(c: Column, k: Int): Column =
    Bridge.column(TopKAggregate(Bridge.expression(c), k).toAggregateExpression())
}
