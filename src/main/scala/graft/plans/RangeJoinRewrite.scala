package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite a plain inner join whose condition is
  * `key = key_r AND lo <= t AND t <= hi` into [[RangeJoinPlan]], so a
  * user writing the natural DataFrame/SQL join gets the co-partitioned
  * merge exec instead of Spark's O(|P|·|I|) nested-loop fallback —
  * without knowing the custom operator exists. This is the Catalyst
  * `Rule[LogicalPlan]` extension point (the fourth of the four:
  * Expression, Strategy, LogicalPlan node, Rule), injected via
  * [[graft.GraftExtensions]].
  *
  * Conservative by construction:
  *   - inner joins without hints only (a user's broadcast hint wins);
  *   - inclusive bounds only (the exec's semantics are lo ≤ t ≤ hi);
  *   - point expression and both bounds must be same-typed and
  *     orderable, key types must match exactly (hash partitioning is
  *     type-sensitive);
  *   - any remaining conjuncts become a Filter ON TOP of the range
  *     join — for inner joins that is semantics-preserving;
  *   - when the point side is the right child the node is built
  *     swapped and a Project restores the original column order.
  * Escape hatch: set `spark.graft.rangeJoin.rewrite=false`.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private case class Bound(t: Expression, bound: Expression, lower: Boolean, idx: Int)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.getConfString("spark.graft.rangeJoin.rewrite", "true") != "true") plan
    else plan.transform {
      case j @ Join(l, r, Inner, Some(cond), JoinHint.NONE) =>
        rewrite(j, l, r, cond).getOrElse(j)
    }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression): Option[LogicalPlan] = {
    val conjs = splitConjunctivePredicates(cond).zipWithIndex
    def leftOnly(e: Expression)  = e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def rightOnly(e: Expression) = e.references.nonEmpty && e.references.subsetOf(r.outputSet)

    // (pointKey, intervalKey, pointsAreLeft, idx) candidates
    val eqs = conjs.collect {
      case (EqualTo(a, b), i) if leftOnly(a) && rightOnly(b) => (a, b, i)
      case (EqualTo(a, b), i) if rightOnly(a) && leftOnly(b) => (b, a, i)
    }
    // bounds where the point expression t is on the LEFT child
    val lBounds = conjs.collect {
      case (GreaterThanOrEqual(a, b), i) if leftOnly(a) && rightOnly(b) => Bound(a, b, lower = true, i)
      case (LessThanOrEqual(a, b), i) if leftOnly(a) && rightOnly(b)    => Bound(a, b, lower = false, i)
      case (GreaterThanOrEqual(a, b), i) if rightOnly(a) && leftOnly(b) => Bound(b, a, lower = false, i)
      case (LessThanOrEqual(a, b), i) if rightOnly(a) && leftOnly(b)    => Bound(b, a, lower = true, i)
    }
    // bounds where t is on the RIGHT child (roles swap)
    val rBounds = conjs.collect {
      case (GreaterThanOrEqual(a, b), i) if rightOnly(a) && leftOnly(b) => Bound(a, b, lower = true, i)
      case (LessThanOrEqual(a, b), i) if rightOnly(a) && leftOnly(b)    => Bound(a, b, lower = false, i)
      case (GreaterThanOrEqual(a, b), i) if leftOnly(a) && rightOnly(b) => Bound(b, a, lower = false, i)
      case (LessThanOrEqual(a, b), i) if leftOnly(a) && rightOnly(b)    => Bound(b, a, lower = true, i)
    }

    def pick(bs: Seq[Bound]): Option[(Bound, Bound)] = (for {
      lo <- bs.filter(_.lower)
      hi <- bs.filter(b => !b.lower && b.t.semanticEquals(lo.t) && b.idx != lo.idx)
    } yield (lo, hi)).headOption

    def orderable(e: Expression) = RowOrdering.isOrderable(e.dataType)

    val attempt = eqs.headOption.flatMap { case (lk, rk, eqIdx) =>
      if (lk.dataType != rk.dataType || !orderable(lk)) None
      else pick(lBounds).map(b => (b, true, eqIdx, lk, rk))
        .orElse(pick(rBounds).map(b => (b, false, eqIdx, lk, rk)))
    }

    attempt.flatMap { case ((lo, hi), pointsLeft, eqIdx, lk, rk) =>
      if (lo.t.dataType != lo.bound.dataType || lo.t.dataType != hi.bound.dataType ||
        !orderable(lo.t)) None
      else {
        val usedIdx = Set(eqIdx, lo.idx, hi.idx)
        val rest = conjs.collect { case (e, i) if !usedIdx.contains(i) => e }
        val node =
          if (pointsLeft) RangeJoinPlan(l, r, lk, lo.t, rk, lo.bound, hi.bound)
          else RangeJoinPlan(r, l, rk, lo.t, lk, lo.bound, hi.bound)
        val filtered = if (rest.isEmpty) node else Filter(rest.reduce(And), node)
        // swapped children permute column order — restore the join's
        val out = if (pointsLeft) filtered else Project(j.output, filtered)
        Some(out)
      }
    }
  }
}
