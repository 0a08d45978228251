package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}

import graft.functions.{CosineSimilarity, HierProbeCells, NearestCell,
  NearestCellHier, ProbeCells, SquaredDistance}

/** Optimizer rule: remove `cast(array<float> → array<double>)` feeding
  * graft's vector kernels. The Column API casts its inputs so callers
  * can hand it raw `array<float>` embedding columns, but the kernels
  * read elements one at a time — they can widen each float in-register
  * ((double) f == the Cast's per-element result, so outputs are
  * bit-identical) instead of allocating a converted copy of the array
  * per ROW. On the kNN candidate join that cast pair was the dominant
  * cost: two 64-element array allocations per candidate — O(candidate
  * pairs) garbage that the fused scoring loop itself never needed.
  *
  * Applies only to the exact (float→double) array cast; any other cast
  * (int arrays, nested nullability changes) stays, preserving the
  * Column API's lenient-input contract. */
object StripVectorCasts extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case c: Cast => (c.child.dataType, c.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => c.child
      case _ => e
    }
    case _ => e
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ CosineSimilarity(l, r) =>
        val (sl, sr) = (strip(l), strip(r))
        if ((sl eq l) && (sr eq r)) e else CosineSimilarity(sl, sr)
      case e @ SquaredDistance(l, r) =>
        val (sl, sr) = (strip(l), strip(r))
        if ((sl eq l) && (sr eq r)) e else SquaredDistance(sl, sr)
      case e: NearestCell =>
        val sc = strip(e.child)
        if (sc eq e.child) e else e.copy(child = sc)
      case e: NearestCellHier =>
        val sc = strip(e.child)
        if (sc eq e.child) e else e.copy(child = sc)
      case e: ProbeCells =>
        val sc = strip(e.child)
        if (sc eq e.child) e else e.copy(child = sc)
      case e: HierProbeCells =>
        val sc = strip(e.child)
        if (sc eq e.child) e else e.copy(child = sc)
    }
}
