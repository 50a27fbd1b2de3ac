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
    case j: AsOfJoinPlan if j.broadcastRight =>
      AsOfBroadcastJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.isInner, j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
    case j: AsOfJoinPlan =>
      AsOfMergeJoinExec(j.leftKeys, j.rightKeys, j.leftTime, j.rightTime,
        j.isInner, j.tolerance, planLater(j.left), planLater(j.right)) :: Nil
    case _ => Nil
  }
}
