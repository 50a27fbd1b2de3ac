package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Predicate pushdown through [[AsOfJoinPlan]].
  *
  * A filter above the as-of join that only references LEFT columns commutes
  * with the join: the join emits (at most, for inner) one row per left row
  * and never changes left values, so dropping left rows before the join
  * drops exactly the same output rows — but before the shuffle instead of
  * after it, and (once the built-in rules push further) at the parquet scan
  * as `PushedFilters`. At 100 TB the difference is shuffling a filtered
  * fraction vs the whole fact table.
  *
  * RIGHT-side predicates must NOT be pushed: filtering right rows changes
  * which row is "the latest at-or-before" (a filtered-out quote would have
  * shadowed an older one), so those stay above the join. Nondeterministic
  * predicates stay put too.
  */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (pushable, kept) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(j.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(pushable.reduce(And), j.left))
        kept.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
