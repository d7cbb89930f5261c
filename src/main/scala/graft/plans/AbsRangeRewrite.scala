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
  *  - NaN literals are left untouched (a NaN bound flips truth under
  *    Spark's NaN ordering), as is any non-literal bound.
  * The rewrite applies to FLOATING-POINT attributes only: for an
  * integral column holding Int/Long.MinValue, `abs` raises
  * ARITHMETIC_OVERFLOW under ANSI mode (on by default in Spark 4) and
  * silently returns a negative value with ANSI off — either way the
  * range form would diverge from the original, so integral columns are
  * never rewritten.
  * Replacement (not conjunction) keeps the rule idempotent, so the
  * operator-optimization batch converges.
  */
object AbsRangeRewrite extends Rule[LogicalPlan] {

  private def negated(l: Literal): Option[Literal] = l match {
    case Literal(v: Double, DoubleType) if !v.isNaN => Some(Literal(-v, DoubleType))
    case Literal(v: Float, FloatType) if !v.isNaN => Some(Literal(-v, FloatType))
    case _ => None
  }

  private def fp(a: AttributeReference): Boolean =
    a.dataType == DoubleType || a.dataType == FloatType

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case e @ LessThanOrEqual(Abs(a: AttributeReference, _), l: Literal) if fp(a) =>
      negated(l).map(nl =>
        And(GreaterThanOrEqual(a, nl), LessThanOrEqual(a, l))).getOrElse(e)
    case e @ LessThan(Abs(a: AttributeReference, _), l: Literal) if fp(a) =>
      negated(l).map(nl =>
        And(GreaterThan(a, nl), LessThan(a, l))).getOrElse(e)
    // mirrored literal-first forms
    case e @ GreaterThanOrEqual(l: Literal, Abs(a: AttributeReference, _)) if fp(a) =>
      negated(l).map(nl =>
        And(GreaterThanOrEqual(a, nl), LessThanOrEqual(a, l))).getOrElse(e)
    case e @ GreaterThan(l: Literal, Abs(a: AttributeReference, _)) if fp(a) =>
      negated(l).map(nl =>
        And(GreaterThan(a, nl), LessThan(a, l))).getOrElse(e)
  }
}
