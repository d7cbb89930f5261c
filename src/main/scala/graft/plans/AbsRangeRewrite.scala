package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule (injected via GraftExtensions): rewrite
  * `abs(col) <= t` / `abs(col) < t` into the equivalent range predicate
  * `col >= -t AND col <= t`.
  *
  * Why it matters: parquet sources can push attribute-vs-literal
  * comparisons into the scan (row-group min/max pruning), but not
  * comparisons under a function call — `abs(x) <= 0.05` scans everything
  * while `x >= -0.05 AND x <= 0.05` skips row groups. The rewrite is
  * exact for every SQL value class:
  *  - NULL input: both forms evaluate to NULL;
  *  - NaN input: `abs(NaN) <= t` is false, and `NaN >= -t` is false;
  *  - `-0.0`: `abs` gives `0.0`, and `-0.0 >= -t && -0.0 <= t` agrees;
  *  - NaN or type-minimum literals are left untouched (a NaN bound flips
  *    truth under Spark's NaN ordering; negating Int/Long.MinValue
  *    overflows), as is any non-literal bound.
  * Replacement (not conjunction) keeps the rule idempotent, so the
  * operator-optimization batch converges.
  */
object AbsRangeRewrite extends Rule[LogicalPlan] {

  private def negated(l: Literal): Option[Literal] = l match {
    case Literal(v: Double, DoubleType) if !v.isNaN => Some(Literal(-v, DoubleType))
    case Literal(v: Float, FloatType) if !v.isNaN => Some(Literal(-v, FloatType))
    case Literal(v: Long, LongType) if v != Long.MinValue => Some(Literal(-v, LongType))
    case Literal(v: Int, IntegerType) if v != Int.MinValue => Some(Literal(-v, IntegerType))
    case Literal(v: Short, ShortType) if v != Short.MinValue => Some(Literal((-v).toShort, ShortType))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ LessThanOrEqual(Abs(a: AttributeReference, _), l: Literal) =>
      negated(l).map(nl =>
        And(GreaterThanOrEqual(a, nl), LessThanOrEqual(a, l))).getOrElse(e)
    case e @ LessThan(Abs(a: AttributeReference, _), l: Literal) =>
      negated(l).map(nl =>
        And(GreaterThan(a, nl), LessThan(a, l))).getOrElse(e)
    // mirrored literal-first forms
    case e @ GreaterThanOrEqual(l: Literal, Abs(a: AttributeReference, _)) =>
      negated(l).map(nl =>
        And(GreaterThanOrEqual(a, nl), LessThanOrEqual(a, l))).getOrElse(e)
    case e @ GreaterThan(l: Literal, Abs(a: AttributeReference, _)) =>
      negated(l).map(nl =>
        And(GreaterThan(a, nl), LessThan(a, l))).getOrElse(e)
  }
}
