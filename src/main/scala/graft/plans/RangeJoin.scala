package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, BoundReference, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, StatefulOpClusteredDistribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan}
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
  extends BinaryExecNode with CodegenSupport {

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

  // Same-type keys/bounds are a correctness precondition, not a nicety:
  // hash partitioning of an int and a long differ, so mixed key types
  // would co-partition wrong even when values compare equal.
  require(leftKey.dataType == rightKey.dataType,
    s"range-join key types differ: ${leftKey.dataType} vs ${rightKey.dataType}")
  require(leftTime.dataType == rightLo.dataType &&
      leftTime.dataType == rightHi.dataType,
    s"range-join time/bound types differ: ${leftTime.dataType} vs " +
      s"[${rightLo.dataType}, ${rightHi.dataType}]")

  // Belt and braces: zipping partitions silently produces wrong results
  // if the children ever arrive with different partitionings (the
  // distribution requirement above should make this unreachable).
  // Validated via satisfies() — not a structural match — so a child
  // whose PartitioningCollection legitimately satisfies the
  // distribution (e.g. the output of an equi-join on the same key) is
  // accepted; both sides must also agree on the partition count,
  // which StatefulOpClusteredDistribution pins to numShufflePartitions.
  // Called from BOTH execution paths: interpreted doExecute and the
  // whole-stage-codegen inputRDDs (the zip there is WholeStageCodegenExec's).
  private def validateCoPartitioning(): Unit = {
    val dists = requiredChildDistribution
    if (!left.outputPartitioning.satisfies(dists.head) ||
        !right.outputPartitioning.satisfies(dists(1)) ||
        left.outputPartitioning.numPartitions != right.outputPartitioning.numPartitions)
      throw new IllegalStateException(
        s"RangeJoinExec children are not co-hash-partitioned on the join keys: " +
          s"left=${left.outputPartitioning} right=${right.outputPartitioning} — " +
          "refusing to zip misaligned partitions")
  }

  override protected def doExecute(): RDD[InternalRow] = {
    validateCoPartitioning()
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lT   = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rLo  = BindReferences.bindReference(rightLo, right.output)
    val rHi  = BindReferences.bindReference(rightHi, right.output)
    val out  = output
    // interpreted orderings for the actual key/time types — long, int,
    // string, date, timestamp, decimal all work; no Long assumption
    val keyOrd  = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)

    val keyType  = leftKey.dataType
    val timeType = leftTime.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // both iterators arrive sorted by (key, time); merge with an
      // active-interval buffer per key
      val proj = UnsafeProjection.create(out, out)
      // code-generated extractors: keys/bounds are computed ONCE per
      // input row into a small UnsafeRow (the merge loop below compares
      // them several times), instead of interpreted Expression.eval
      // per comparison
      val lExtract = UnsafeProjection.create(Seq(lKey, lT))
      val rExtract = UnsafeProjection.create(Seq(rKey, rLo, rHi))
      // null key/bound rows can never match (inner-join semantics) and
      // would NPE the interpreted orderings — drop them here, exactly
      // as the codegen path's null guards do
      val rBuf = rIter.map { r =>
        val rc = r.copy(); (rc, rExtract(rc).copy())
      }.filter { case (_, rk) =>
        !rk.isNullAt(0) && !rk.isNullAt(1) && !rk.isNullAt(2)
      }.buffered

      new Iterator[InternalRow] {
        private var curKey: Any = null                    // null = before first left row
        // intervals of curKey with lo <= t so far, with extracted bounds
        private var active  = Vector.empty[(InternalRow, InternalRow)]
        private var pending = Iterator.empty: Iterator[InternalRow]
        private val joined  = new JoinedRow

        private def advance(): Unit = {
          while (!pending.hasNext && lIter.hasNext) {
            // copy first, extract from the copy: non-primitive values
            // (UTF8String, Decimal) point into the row's buffer, which
            // the scan iterator reuses on next(); the extracted pair is
            // copied too because the projection reuses ITS buffer
            val lRow = lIter.next().copy()
            val kt   = lExtract(lRow).copy()
            if (kt.isNullAt(0) || kt.isNullAt(1)) {
              // null key or time: no interval can match; also must not
              // reach curKey (null doubles as the before-first sentinel)
              pending = Iterator.empty
            } else {
            val k    = kt.get(0, keyType)
            val t    = kt.get(1, timeType)
            if (curKey == null || keyOrd.compare(k, curKey) != 0) {
              curKey = k; active = Vector.empty
            }
            // pull newly-started intervals for this key
            while (rBuf.headOption.exists { case (_, rk) =>
                val c = keyOrd.compare(rk.get(0, keyType), curKey)
                c < 0 || (c == 0 && timeOrd.compare(rk.get(1, timeType), t) <= 0)
              }) {
              val (r, rk) = rBuf.next()
              if (keyOrd.compare(rk.get(0, keyType), curKey) == 0) active :+= ((r, rk))
            }
            // retire intervals that ended before t
            active = active.filter { case (_, rk) => timeOrd.compare(rk.get(2, timeType), t) >= 0 }
            pending = active.iterator.map { case (r, _) => proj(joined(lRow, r)).copy() }
            }
          }
        }

        override def hasNext: Boolean = { advance(); pending.hasNext }
        override def next(): InternalRow = { advance(); pending.next() }
      }
    }
  }

  // ---------------- whole-stage codegen ----------------
  //
  // The node is a codegen stage ROOT with two untransformed inputs —
  // the SortMergeJoinExec model: inputRDDs() hands both sorted children
  // to WholeStageCodegenExec (which zips them exactly like the
  // interpreted path), and doProduce emits the merge loop in Java, so
  // key/bound extraction compiles to direct UnsafeRow field reads and
  // the emitted (left, right) pairs flow straight into the downstream
  // operators' generated code with no per-row JoinedRow/UnsafeProjection
  // materialization between. The interpreted doExecute above stays as
  // the fallback (conf flag off, or a non-codegen parent).

  /** Escape hatch: `spark.graft.rangejoin.codegen=false` forces the
    * interpreted merge (the node is then wrapped in an InputAdapter).
    */
  override def supportCodegen: Boolean =
    conf.getConfString("spark.graft.rangejoin.codegen", "true").toBoolean

  override def inputRDDs(): Seq[RDD[InternalRow]] = {
    validateCoPartitioning()
    left.execute() :: right.execute() :: Nil
  }

  // the output row writer is reused across emitted rows; buffering
  // parents (sort, limit) need stable copies
  override def needCopyResult: Boolean = true

  override protected def doProduce(ctx: CodegenContext): String = {
    val row = "org.apache.spark.sql.catalyst.InternalRow" // Janino-safe FQN, raw types
    val leftInput  = ctx.addMutableState("scala.collection.Iterator", "rjLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "rjRightInput",
      v => s"$v = inputs[1];")
    // leftRow is NOT copied: the sorter's reuse contract keeps it valid
    // until the next next() call, which only happens after its active
    // set is fully emitted. Right rows ARE copied — they outlive many
    // left rows in the active buffer.
    val leftRow  = ctx.addMutableState(row, "rjLeftRow")
    val rHead    = ctx.addMutableState(row, "rjRightHead")
    val active   = ctx.addMutableState("java.util.ArrayList", "rjActive",
      v => s"$v = new java.util.ArrayList();")
    val activeIdx = ctx.addMutableState("int", "rjActiveIdx")

    // --- generated expression evaluation, one per (expr, input row) ---
    def evalOn(rowVar: String, expr: Expression, attrs: Seq[Attribute]): ExprCode = {
      ctx.INPUT_ROW = rowVar
      ctx.currentVars = null
      BindReferences.bindReference(expr, attrs).genCode(ctx)
    }
    val lk = evalOn(leftRow, leftKey, left.output)
    val lt = evalOn(leftRow, leftTime, left.output)
    val rk  = evalOn(rHead, rightKey, right.output)
    val rlo = evalOn(rHead, rightLo, right.output)
    val probe = ctx.freshName("rjProbe")
    val ak  = evalOn(probe, rightKey, right.output)
    val ahi = evalOn(probe, rightHi, right.output)

    val keyComp  = (a: String, b: String) => ctx.genComp(leftKey.dataType, a, b)
    val timeComp = (a: String, b: String) => ctx.genComp(leftTime.dataType, a, b)

    // findNext: advances until the current left row has a non-empty
    // un-emitted active set. All loop state lives in the mutable fields,
    // so processNext() can return mid-emission (shouldStop) and resume.
    val findNext = ctx.addNewFunction("rjFindNext",
      s"""
         |private boolean rjFindNext() throws java.io.IOException {
         |  while (true) {
         |    if ($activeIdx < $active.size()) return true;
         |    if (!$leftInput.hasNext()) return false;
         |    $leftRow = ($row) $leftInput.next();
         |    ${lk.code}
         |    ${lt.code}
         |    if (${lk.isNull} || ${lt.isNull}) { $active.clear(); continue; }
         |    // pull newly-started intervals: right side is sorted by
         |    // (key, lo), so stop at the first row beyond (k, t)
         |    while (true) {
         |      if ($rHead == null) {
         |        if (!$rightInput.hasNext()) break;
         |        $rHead = (($row) $rightInput.next()).copy();
         |      }
         |      ${rk.code}
         |      ${rlo.code}
         |      if (${rk.isNull} || ${rlo.isNull}) { $rHead = null; continue; }
         |      int cmp = ${keyComp(rk.value, lk.value)};
         |      if (cmp < 0) { $rHead = null; continue; }
         |      if (cmp == 0 && ${timeComp(rlo.value, lt.value)} <= 0) {
         |        $active.add($rHead); $rHead = null; continue;
         |      }
         |      break;
         |    }
         |    // retire: stale key (left key advanced) or interval ended
         |    for (int i = $active.size() - 1; i >= 0; i--) {
         |      $row $probe = ($row) $active.get(i);
         |      ${ak.code}
         |      ${ahi.code}
         |      if (${ak.isNull} || ${ahi.isNull} ||
         |          ${keyComp(ak.value, lk.value)} != 0 ||
         |          ${timeComp(ahi.value, lt.value)} < 0) {
         |        $active.remove(i);
         |      }
         |    }
         |    $activeIdx = 0;
         |  }
         |}
       """.stripMargin)

    // --- emission: output columns as direct field reads on the two rows ---
    val rightRow = ctx.freshName("rjRightRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    ctx.INPUT_ROW = rightRow
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }
    // consume() evaluates the variables it needs itself (unused columns
    // are never even read) — pre-emitting them here would double-declare.
    //
    // No limitNotReachedCond here: that helper is contractually for leaf
    // /blocking nodes only (CodegenSupport warns '[BUG]' otherwise), and
    // SortMergeJoinExec — the model for this two-input produce — relies
    // on shouldStop() alone. A downstream limit sets stopEarly() via its
    // consume, so the `if (shouldStop()) return` below exits the loop
    // and every subsequent processNext() re-entry immediately.
    s"""
       |while ($findNext()) {
       |  $row $rightRow = ($row) $active.get($activeIdx++);
       |  ${consume(ctx, leftVars ++ rightVars)}
       |  if (shouldStop()) return;
       |}
     """.stripMargin
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

  /** points(key, t) ⋈ intervals(key_r, lo, hi) — all other columns pass
    * through. Key and time columns may be any orderable type (long, int,
    * string, date, timestamp, decimal); both sides' key types — and the
    * time vs lo/hi types — must match exactly, since hash partitioning
    * is type-sensitive.
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
