package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite comparisons of the UNBOUNDED `levenshtein(a,b)`
  * against an integer literal into the bounded 3-arg form, which runs the
  * banded O(n·k) dynamic program and exits early instead of filling the
  * full O(n²) matrix (the reference's early-exit band, score.h:15-57 —
  * SURVEY.md §4's optional `Rule[LogicalPlan]` polish item).
  *
  * Bounded semantics: `levenshtein(a, b, k)` returns -1 when the distance
  * exceeds k, so
  *   lev(a,b) <= k  ⇔  lev(a,b,k) >= 0        (k ≥ 0)
  *   lev(a,b) >  k  ⇔  lev(a,b,k) = -1        (k ≥ 0)
  * and the strict/mirrored forms reduce to these with k−1. Null inputs
  * stay null through both forms, so filter semantics are unchanged.
  *
  * Injected by `graft.GraftExtensions` (injectOptimizerRule), so plain
  * SQL users get the banded plan without knowing the 3-arg form exists.
  */
object BoundedLevenshteinRewrite extends Rule[LogicalPlan] {
  private def bounded(l: Expression, r: Expression, k: Int): Levenshtein =
    Levenshtein(l, r, Some(Literal(k)))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // lev <= k / k >= lev
      case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        GreaterThanOrEqual(bounded(l, r, k), Literal(0))
      case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
        GreaterThanOrEqual(bounded(l, r, k), Literal(0))
      // lev < k / k > lev
      case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
        GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
      case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
        GreaterThanOrEqual(bounded(l, r, k - 1), Literal(0))
      // lev > k / k < lev
      case GreaterThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
        EqualTo(bounded(l, r, k), Literal(-1))
      case LessThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
        EqualTo(bounded(l, r, k), Literal(-1))
      // lev >= k / k <= lev
      case GreaterThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
        EqualTo(bounded(l, r, k - 1), Literal(-1))
      case LessThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
        EqualTo(bounded(l, r, k - 1), Literal(-1))
    }
}
