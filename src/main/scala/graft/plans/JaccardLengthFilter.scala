package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule: prefix every exact-Jaccard threshold filter
  *
  * {{{ size(array_intersect(a,b)) / size(array_union(a,b)) >= t }}}
  *
  * with the similarity-join LENGTH FILTER
  *
  * {{{ size(a) >= t·size(b) AND size(b) >= t·size(a) }}}
  *
  * which is implied by the threshold (J ≥ t ⟹ |A∩B| ≥ t·|A∪B|, and
  * |B| ≥ |A∩B|, |A∪B| ≥ |A| give |B| ≥ t·|A|; symmetrically for |A|) —
  * so the rewrite never changes results, with ONE caveat: under
  * `spark.sql.legacy.sizeOfNull=true`, size(null) = −1 and a null
  * array flips the comparison (−1/−1 = 1.0 ≥ t is true while
  * −1 ≥ t·size(b) is false), so the rule disables itself on that
  * legacy conf. The payoff: `And` evaluates
  * left-to-right with short-circuit in codegen, and the added conjuncts
  * are O(1) array-length reads, so length-mismatched candidate pairs
  * skip the O(|A|+|B|) intersect/union entirely. That is the standard
  * first pruning tier of set-similarity joins (the tier before prefix
  * filtering, q_prefix_join) applied automatically to any user filter
  * in jaccard shape — the dedup verify passes get it for free.
  *
  * The quartet of extension points this library exercises: custom
  * `Expression`s (§2.5 rows 48-51g), a `TypedImperativeAggregate`
  * (51d), a `LogicalPlan`+`SparkStrategy`+`SparkPlan` operator (51c),
  * and this `Rule[LogicalPlan]` — all injected via
  * `SparkSessionExtensions` (`graft.GraftExtensions`).
  */
object JaccardLengthFilter extends Rule[LogicalPlan] {

  /** size(x) cast to double, matching both bare Size and Cast(Size). */
  private object SizeAsDouble {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Size(arr, _), DoubleType, _, _) => Some(arr)
      case _ => None
    }
  }

  /** The jaccard-threshold comparison shape. */
  private object JaccardGte {
    def unapply(e: Expression): Option[(Expression, Expression, Double)] = e match {
      case GreaterThanOrEqual(
            Divide(SizeAsDouble(ArrayIntersect(a1, b1)),
                   SizeAsDouble(ArrayUnion(a2, b2)), _),
            Literal(t: Double, DoubleType))
          if a1.semanticEquals(a2) && b1.semanticEquals(b2) &&
            t > 0.0 && t <= 1.0 =>
        Some((a1, b1, t))
      case _ => None
    }
  }

  private def lengthConjunct(a: Expression, b: Expression, t: Double): Expression =
    And(
      GreaterThanOrEqual(Cast(Size(a), DoubleType),
        Multiply(Literal(t, DoubleType), Cast(Size(b), DoubleType))),
      GreaterThanOrEqual(Cast(Size(b), DoubleType),
        Multiply(Literal(t, DoubleType), Cast(Size(a), DoubleType))))

  /** Idempotence guard: has this condition already been prefixed with a
    * size-vs-scaled-size conjunct? (The optimizer batch runs to
    * fixpoint, so the rewrite must not stack.) */
  private def alreadyGuarded(cond: Expression): Boolean = cond.exists {
    case GreaterThanOrEqual(Cast(Size(_, _), DoubleType, _, _),
          Multiply(Literal(_, DoubleType), Cast(Size(_, _), DoubleType, _, _), _)) => true
    case _ => false
  }

  private def shouldRewrite(cond: Expression): Boolean =
    !alreadyGuarded(cond) &&
      cond.exists { case JaccardGte(_, _, _) => true; case _ => false }

  // transformUp: the rewritten And CONTAINS the original predicate, so
  // a top-down transform would re-enter it and wrap forever
  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case g @ JaccardGte(a, b, t) => And(lengthConjunct(a, b, t), g)
  }

  /** The threshold predicate may sit in a Filter or — once pushdown has
    * run — in a Join condition (the candidate-verify self-joins of the
    * dedup pipelines); rewrite both. */
  override def apply(plan: LogicalPlan): LogicalPlan =
    // legacy sizeOfNull=true makes size(null) = -1: the jaccard predicate
    // on a null array evaluates -1/-1 = 1.0 >= t (true) while the length
    // conjunct evaluates -1 >= t*(-1) (false) — the rewrite would flip a
    // filter result, so it must not fire under that conf
    if (conf.legacySizeOfNull) plan
    else plan.transform {
      case f @ Filter(cond, _) if shouldRewrite(cond) =>
        f.copy(condition = rewrite(cond))
      case j: Join if j.condition.exists(shouldRewrite) =>
        j.copy(condition = j.condition.map(rewrite))
    }
}
