package graft.plans

import org.apache.spark.sql.catalyst.expressions.AttributeSet
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Column pruning through [[AsOfJoinPlan]].
  *
  * Catalyst's generic `ColumnPruning` cannot push a projection through an
  * operator it does not know, so without this rule an as-of join would read
  * every column of both inputs off the scan — fatal at 100 TB where the
  * whole point of columnar storage is reading 3 of 40 columns. The rule keeps
  * only the columns the parent references plus the join's own keys/times;
  * the built-in rules then push the inserted projections all the way into
  * the parquet scans (visible as `ReadSchema` in the formatted plan).
  *
  * Runs in the operator-optimization fixed-point batch (injected via
  * `injectOptimizerRule`), so it converges: once both sides are pruned the
  * guard fails and the rule no-ops.
  */
object PruneAsOfJoinColumns extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val needed = AttributeSet(
        p.projectList.flatMap(_.references) ++
          (j.leftKeys ++ j.rightKeys :+ j.leftTime :+ j.rightTime).flatMap(_.references))
      def prune(side: LogicalPlan): LogicalPlan =
        if (side.output.forall(needed.contains)) side
        else Project(side.output.filter(needed.contains), side)
      val (newLeft, newRight) = (prune(j.left), prune(j.right))
      if ((newLeft eq j.left) && (newRight eq j.right)) p
      else p.copy(child = j.copy(left = newLeft, right = newRight))
  }
}
