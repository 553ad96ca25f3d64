package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule for the custom as-of node: Catalyst's own
  * PushDownPredicates stops at operators it does not know, so
  * `asOfJoin(...).filter(leftCond)` would otherwise scan both sides
  * in full. Every output row of AsOfJoin corresponds 1:1 to a left
  * row, so any predicate that references ONLY left-side attributes
  * commutes with the join and can evaluate below it — from where
  * Catalyst's standard rules carry it further down into the scan
  * (PushedFilters). Predicates touching right-side (nullable)
  * attributes must stay above: they see the join's null padding.
  *
  * Deterministic-only, same as Catalyst's own pushdown: a
  * nondeterministic predicate must not change its evaluation count.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] {

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoin) =>
      val leftAttrs = j.left.outputSet
      val (pushable, kept) = splitConjuncts(cond).partition(c =>
        c.deterministic && c.references.subsetOf(leftAttrs))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
