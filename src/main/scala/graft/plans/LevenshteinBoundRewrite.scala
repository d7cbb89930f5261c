package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule (injected via GraftExtensions, next to
  * [[AbsRangeRewrite]]): rewrite a thresholded edit-distance predicate
  * `levenshtein(a, b) <= k` (k a non-negative int literal) into Spark's
  * BOUNDED form `levenshtein(a, b, k) >= 0`.
  *
  * Why it matters: the unbounded kernel fills the full O(|a|·|b|) DP
  * matrix per pair, then the filter throws the distance away; the
  * bounded kernel walks only a 2k+1-wide band and bails out the moment
  * the running minimum exceeds k — O(k·n) per pair, and in a blocked
  * fuzzy-match join (q94's shape) the pairs are exactly the hot path.
  * The contract `distance > k ⟹ -1` makes the forms equivalent:
  *  - non-null inputs: `lev(a,b) <= k  ⟺  lev(a,b,k) ≥ 0`;
  *  - any NULL input: both sides yield NULL;
  *  - k < 0 is left untouched (the bounded kernel requires k ≥ 0; the
  *    original predicate is constant-false anyway and folds elsewhere).
  * `lev < k` rewrites through the same fact as threshold k-1. The
  * rewritten tree contains only the THREE-argument form, which no case
  * here matches — idempotent by construction, so the fixpoint batch
  * converges. PlanSpec asserts the bounded form lands in q94's physical
  * plan and that results match the unbounded build row-for-row.
  */
object LevenshteinBoundRewrite extends Rule[LogicalPlan] {

  private def bounded(a: Expression, b: Expression, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(a, b, Some(Literal(k, IntegerType))),
      Literal(0, IntegerType))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case LessThanOrEqual(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 0 =>
      bounded(a, b, k)
    case LessThan(Levenshtein(a, b, None), Literal(k: Int, IntegerType))
        if k >= 1 =>
      bounded(a, b, k - 1)
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 0 =>
      bounded(a, b, k)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(a, b, None))
        if k >= 1 =>
      bounded(a, b, k - 1)
  }
}
