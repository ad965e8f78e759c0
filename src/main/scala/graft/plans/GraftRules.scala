package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rules for the engine's kernels — injected via
  * [[graft.GraftExtensions]] so pure-SQL users get them without code
  * changes.
  */
object GraftRules {

  /** Rewrite unbounded edit-distance threshold predicates to Spark's
    * BOUNDED Levenshtein: `levenshtein(a, b) <= k` computes the full
    * O(|a|·|b|) DP however far apart the strings are, but a predicate
    * only needs to know "within k?" — the 3-arg form runs the banded
    * O(k·min) DP and bails out (returning -1) the moment the distance
    * provably exceeds k. On a fuzzy-match pair stream most pairs are
    * NOT matches, so most evaluations take the early exit.
    *
    * The -1 overflow sentinel is the trap: a naive
    * `levenshtein(a,b,k) <= k` rewrite would ACCEPT every
    * over-threshold pair (-1 ≤ k). The rewrite therefore guards with
    * `>= 0`:
    *
    *   lev(a,b) <= k   ⟺   lev(a,b,k) >= 0 AND lev(a,b,k) <= k
    *
    * (codegen's common-subexpression elimination evaluates the bounded
    * kernel once). Only literal non-negative integer bounds rewrite —
    * a column bound has no static band to run.
    */
  object BoundedLevenshtein extends Rule[LogicalPlan] {
    private def bounded(
        lev: Levenshtein, k: Expression): Expression = {
      val b = Levenshtein(lev.left, lev.right, Some(k))
      And(GreaterThanOrEqual(b, Literal(0)), LessThanOrEqual(b, k))
    }
    private def isBound(e: Expression): Boolean = e match {
      case Literal(v: Int, IntegerType) => v >= 0
      case _                            => false
    }
    override def apply(plan: LogicalPlan): LogicalPlan =
      plan.transformAllExpressions {
        case LessThanOrEqual(lev: Levenshtein, k)
            if lev.threshold.isEmpty && isBound(k) => bounded(lev, k)
        case GreaterThanOrEqual(k, lev: Levenshtein)
            if lev.threshold.isEmpty && isBound(k) => bounded(lev, k)
        case LessThan(lev: Levenshtein, k @ Literal(v: Int, IntegerType))
            if lev.threshold.isEmpty && v >= 1 =>
          val km1 = Literal(v - 1)
          val b = Levenshtein(lev.left, lev.right, Some(km1))
          And(GreaterThanOrEqual(b, Literal(0)), LessThan(b, k))
      }
  }
}
