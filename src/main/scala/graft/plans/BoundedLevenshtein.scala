package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/**
 * Optimizer rule: bound Levenshtein comparisons.
 *
 * `levenshtein(a, b) <= k` computes the FULL O(|a| * |b|) dynamic program
 * and then compares; Spark's thresholded 3-arg `levenshtein(a, b, k)` runs
 * a banded O(min(|a|,|b|) * k) DP that early-abandons past the bound and
 * returns -1. For a fuzzy-match filter over a 100 TB corpus the band is
 * the difference between quadratic and linear work per row pair — and
 * users writing the natural comparison shouldn't have to know the 3-arg
 * form exists. This rule rewrites, for foldable non-negative integer k:
 *
 *   levenshtein(a, b) <= k  ->  levenshtein(a, b, k)     >= 0
 *   levenshtein(a, b) <  k  ->  levenshtein(a, b, k - 1) >= 0
 *   (and the mirrored k >= / k > forms)
 *
 * Null semantics are preserved: both forms are null iff an input is null,
 * and the 3-arg form returns the exact distance whenever it is within the
 * bound, -1 (< 0) otherwise. Injected via
 * [[graft.functions.GraftExtensions]] (`injectOptimizerRule`).
 */
object BoundedLevenshtein extends Rule[LogicalPlan] {

  private def bounded(l: Levenshtein, k: Int): Expression =
    GreaterThanOrEqual(
      Levenshtein(l.left, l.right, Some(Literal(k))), Literal(0))

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(l: Levenshtein, IntLit(k))
          if l.threshold.isEmpty && k >= 0 => bounded(l, k)
      case GreaterThanOrEqual(IntLit(k), l: Levenshtein)
          if l.threshold.isEmpty && k >= 0 => bounded(l, k)
      case LessThan(l: Levenshtein, IntLit(k))
          if l.threshold.isEmpty && k >= 1 => bounded(l, k - 1)
      case GreaterThan(IntLit(k), l: Levenshtein)
          if l.threshold.isEmpty && k >= 1 => bounded(l, k - 1)
    }
}
