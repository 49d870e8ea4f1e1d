package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed reduce — the ReduceItemTransformer analog (/root/reference
  * v2/core/transformers/aggregators.py:13): an arbitrary
  * `(acc, item) => acc` fold exposed as a first-class Spark aggregate.
  *
  * Where the reference folds inside one process, a Spark `Aggregator`
  * folds per-partition (`reduce`) and then merges partials (`merge`) —
  * the user supplies both halves, and the result distributes over any
  * number of executors. Usable per-group via `ds.groupByKey(...).agg
  * (reduceAgg.toColumn)` or whole-dataset via `ds.select(...)`.
  */
class ReduceAggregator[IN, B: Encoder](
    initial: B,
    reducer: (B, IN) => B,
    merger: (B, B) => B)
  extends Aggregator[IN, B, B] {

  override def zero: B                = initial
  override def reduce(b: B, a: IN): B = reducer(b, a)
  override def merge(b1: B, b2: B): B = merger(b1, b2)
  override def finish(r: B): B        = r
  override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
  override def outputEncoder: Encoder[B] = implicitly[Encoder[B]]
}

object ReduceAggregator {

  def apply[IN, B: Encoder](zero: B)(reducer: (B, IN) => B)(merger: (B, B) => B) =
    new ReduceAggregator[IN, B](zero, reducer, merger)

  /** ReduceItemTransformer.count analog (aggregators.py:64). */
  def count[IN]: ReduceAggregator[IN, Long] = {
    implicit val e: Encoder[Long] = Encoders.scalaLong
    apply[IN, Long](0L)((acc, _) => acc + 1L)(_ + _)
  }
}
