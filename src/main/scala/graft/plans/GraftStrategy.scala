package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Plans graft's custom logical operators. Installed by
  * [[graft.functions.GraftExtensions]] via `injectPlannerStrategy`, so every
  * [[graft.core.GraftSession]] plans [[AsOfJoinPlan]] natively while Catalyst
  * still optimizes (prunes, pushes filters, AQE-coalesces) around it.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfMergeJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}
