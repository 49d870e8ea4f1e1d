package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** [[TopKAggregate]] generalized to carry a payload: grouped top-k of
  * (score, id) pairs with the deterministic order (score desc, id asc)
  * — the missing piece that lets "top-n per group" run as a real
  * AGGREGATE instead of a window: state is a bounded k-element heap,
  * partial-merge ships at most k 16-byte pairs per partition per
  * group, and no partition is ever sorted. The window form
  * materializes and sorts every group member; at 100 TB that is the
  * difference between a map-side-combined agg and a full shuffle+sort
  * of the fact table.
  */
case class TopKPairsAggregate(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]] {

  private type Buf = scala.collection.mutable.PriorityQueue[(Double, Long)]

  // PQ dequeues its maximum; under (-score, id) the maximum is the
  // WEAKEST retained pair (lowest score; among ties, highest id).
  private val weakestFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  private def stronger(a: (Double, Long), b: (Double, Long)): Boolean =
    weakestFirst.compare(a, b) < 0

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.PriorityQueue.empty[(Double, Long)](weakestFirst)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      val p = (s.asInstanceOf[Double], i.asInstanceOf[Long])
      if (buf.size < k) buf.enqueue(p)
      else if (stronger(p, buf.head)) { buf.dequeue(); buf.enqueue(p) }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { p =>
      if (b1.size < k) b1.enqueue(p)
      else if (stronger(p, b1.head)) { b1.dequeue(); b1.enqueue(p) }
    }
    b1
  }

  override def eval(buf: Buf): Any =
    // ascending under (-score, id) IS (score desc, id asc)
    new GenericArrayData(buf.toArray.sorted(weakestFirst).map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i))
    })

  override def serialize(buf: Buf): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb  = ByteBuffer.wrap(bytes)
    val n   = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach(_ => buf.enqueue((bb.getDouble, bb.getLong)))
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean  = false
  override def children: Seq[Expression] = Seq(score, id)
  override def prettyName: String = "agg_topk_pairs"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairsAggregate =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairsAggregate =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKPairsAggregate {
  /** Top-k (score, id) pairs per group, ordered (score desc, id asc),
    * as array<struct<score:double, id:bigint>>.
    */
  def topkPairs(score: Column, id: Column, k: Int): Column =
    Bridge.column(TopKPairsAggregate(
      Bridge.expression(score), Bridge.expression(id), k).toAggregateExpression())
}
