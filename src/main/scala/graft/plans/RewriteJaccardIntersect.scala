package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import graft.functions.JaccardSim

/** Optimizer rule: rewrite the hand-composed Jaccard pattern
  *
  * {{{ size(array_intersect(a, b)) /
  *     (size(a) + size(b) - size(array_intersect(a, b))) }}}
  *
  * into the one-pass [[graft.functions.JaccardSim]] expression, for
  * `array<bigint>` inputs without nullable elements. The composition is
  * what a user naturally writes in SQL; after Catalyst inlines aliases
  * it evaluates `array_intersect` (a per-row hash-set build plus a
  * GenericArrayData allocation) two or three times per row — once in a
  * pushed-down filter, again in the projection. JaccardSim computes the
  * identical value (distinct-intersection count over duplicate-counting
  * sizes, double division) in one primitive merge pass.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.functions.GraftExtensions]]), so any session built with
  * [[graft.GraftSession]] — including plain `spark.sql` users — gets the
  * rewrite without code changes. Scope is deliberately conservative:
  * both `size` legs must reference the same two arrays (semantic
  * equality, same order) and elements must be non-nullable longs, since
  * JaccardSim's primitive path has no null-element representation.
  */
object RewriteJaccardIntersect extends Rule[LogicalPlan] {

  /** Casts inserted by type coercion (int → double around the divide)
    * carry no semantics the rewrite needs to preserve: JaccardSim
    * produces the already-divided double. */
  private def strip(e: Expression): Expression = e match {
    case c: Cast => strip(c.child)
    case o => o
  }

  private def longArrayNoNulls(e: Expression): Boolean = e.dataType match {
    case ArrayType(LongType, false) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case d: Divide =>
        (strip(d.left), strip(d.right)) match {
          case (Size(ArrayIntersect(a1, b1), _),
                Subtract(Add(sa: Size, sb: Size, _),
                         Size(ArrayIntersect(a2, b2), _), _))
              if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
                strip(sa.child).semanticEquals(a1) &&
                strip(sb.child).semanticEquals(b1) &&
                longArrayNoNulls(a1) && longArrayNoNulls(b1) =>
            JaccardSim(a1, b1)
          case _ => d
        }
    }
}
