package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, HashPartitioning, StatefulOpClusteredDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.Bridge

/** Point-in-interval range join as a first-class operator.
  *
  * `points ⋈ intervals ON p.key = i.key AND i.lo <= p.t AND p.t <= i.hi`
  * is the join shape Spark's planner can only express as a (broadcast)
  * nested-loop join — O(|P|·|I|) per key. This operator co-partitions
  * both sides on the key and walks each partition with both sides
  * sorted by time: an active-interval window slides over the points —
  * O(n log n + matches). The full custom-operator path is exercised:
  * logical node → planner Strategy (injected via SparkSessionExtensions
  * or used directly through [[RangeJoin.rangeJoin]]) → physical
  * BinaryExecNode with declared distribution/ordering requirements, so
  * the engine inserts the exchanges and sorts. The per-partition merge
  * zips sibling partitions, which is only correct when both children
  * have IDENTICAL hash partitioning on the keys — so the node requires
  * [[StatefulOpClusteredDistribution]] (satisfied only by exact
  * HashPartitioning on the key with an exact partition count; a
  * RangePartitioning left-over from an orderBy, or a pre-shuffled input
  * with a different count, forces a fresh exchange, and AQE cannot
  * coalesce one side independently), and doExecute still validates the
  * children's outputPartitioning and fails loudly on any mismatch.
  */
case class RangeJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightLo: Expression,
    rightHi: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): LogicalPlan =
    copy(left = l, right = r)
}

case class RangeJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTime: Expression,
    rightKey: Expression,
    rightLo: Expression,
    rightHi: Expression)
  extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  // Co-partition both sides on the key with an EXACT partition count.
  // StatefulOpClusteredDistribution is satisfied only by HashPartitioning
  // on precisely these keys with precisely this count, so zipPartitions
  // pairing is guaranteed key-aligned (ClusteredDistribution would also
  // accept e.g. RangePartitioning, which zips wrong).
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    StatefulOpClusteredDistribution(Seq(leftKey), conf.numShufflePartitions),
    StatefulOpClusteredDistribution(Seq(rightKey), conf.numShufflePartitions))

  // and sorts each side by (key, time) / (key, lo)
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightLo, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    // Belt and braces: zipPartitions silently produces wrong results if
    // the children ever arrive with different partitionings (the
    // distribution requirement above should make this unreachable).
    (left.outputPartitioning, right.outputPartitioning) match {
      case (HashPartitioning(le, ln), HashPartitioning(re, rn))
          if ln == rn && le.length == 1 && re.length == 1 &&
            le.head.semanticEquals(leftKey) && re.head.semanticEquals(rightKey) => // aligned
      case (lp, rp) =>
        throw new IllegalStateException(
          s"RangeJoinExec children are not co-hash-partitioned on the join keys: " +
            s"left=$lp right=$rp — refusing to zip misaligned partitions")
    }
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lT   = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rLo  = BindReferences.bindReference(rightLo, right.output)
    val rHi  = BindReferences.bindReference(rightHi, right.output)
    val out  = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // both iterators arrive sorted by (key, time); merge with an
      // active-interval buffer per key
      val proj = UnsafeProjection.create(out, out)
      val rBuf = rIter.map(_.copy()).buffered

      new Iterator[InternalRow] {
        private var curKey: Long = Long.MinValue
        private var active  = Vector.empty[InternalRow]   // intervals of curKey with lo <= t so far
        private var pending = Iterator.empty: Iterator[InternalRow]
        private val joined  = new JoinedRow

        private def advance(): Unit = {
          while (!pending.hasNext && lIter.hasNext) {
            val lRow = lIter.next()
            val k    = lKey.eval(lRow).asInstanceOf[Long]
            val t    = lT.eval(lRow).asInstanceOf[Long]
            if (k != curKey) { curKey = k; active = Vector.empty }
            // pull newly-started intervals for this key
            while (rBuf.headOption.exists { r =>
                val rk = rKey.eval(r).asInstanceOf[Long]
                rk < curKey || (rk == curKey && rLo.eval(r).asInstanceOf[Long] <= t)
              }) {
              val r  = rBuf.next()
              val rk = rKey.eval(r).asInstanceOf[Long]
              if (rk == curKey) active :+= r
            }
            // retire intervals that ended before t
            active = active.filter(r => rHi.eval(r).asInstanceOf[Long] >= t)
            val lCopy = lRow.copy()
            pending = active.iterator.map(r => proj(joined(lCopy, r)).copy())
          }
        }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): InternalRow = { advance(); pending.next() }
      }
    }
  }

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): SparkPlan =
    copy(left = l, right = r)
}

object RangeJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.{SparkPlan => SP}
  override def apply(plan: LogicalPlan): Seq[SP] = plan match {
    case RangeJoinPlan(l, r, lk, lt, rk, rlo, rhi) =>
      RangeJoinExec(planLater(l), planLater(r), lk, lt, rk, rlo, rhi) :: Nil
    case _ => Nil
  }
}

object RangeJoin {

  /** Register the strategy once per session (idempotent). */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ RangeJoinStrategy

  /** points(key: long, t: long) ⋈ intervals(key: long, lo: long, hi: long)
    * — all other columns pass through.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame,
      key: String, t: String, lo: String, hi: String): DataFrame = {
    val spark = points.sparkSession
    ensureRegistered(spark)
    val lPlan = points.queryExecution.analyzed
    val rPlan = intervals.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Expression =
      p.output.find(_.name == n).getOrElse(sys.error(s"missing column $n"))
    val plan = RangeJoinPlan(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, t),
      attr(rPlan, s"${key}_r"), attr(rPlan, lo), attr(rPlan, hi))
    Bridge.dataFrame(spark, plan)
  }
}
