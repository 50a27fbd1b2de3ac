package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Registers graft's Catalyst extensions: custom expressions as SQL functions
  * (`spark.sql("SELECT graft_dot(a, b) ...")`), the planner strategy for
  * graft's custom logical operators ([[graft.plans.GraftStrategy]]), and the
  * optimizer rule that prunes columns through them
  * ([[graft.plans.PruneAsOfJoinColumns]]). Installed via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` — see
  * [[graft.core.GraftSession]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectOptimizerRule(_ => graft.plans.PruneAsOfJoinColumns)
    ext.injectOptimizerRule(_ => graft.plans.PushFilterThroughAsOfJoin)
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_dot(a, b) takes two array arguments")
        DotProduct(exprs.head, exprs(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_rolling_min_hash"),
      new ExpressionInfo(classOf[RollingMinHash].getName, "graft_rolling_min_hash"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_rolling_min_hash(text, k) takes two arguments")
        val k = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"graft_rolling_min_hash window must be an integer literal, got $other")
        }
        RollingMinHash(exprs.head, k)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_ntz_micros"),
      new ExpressionInfo(classOf[NtzEpochMicros].getName, "graft_ntz_micros"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 1, "graft_ntz_micros(ts_ntz) takes one argument")
        NtzEpochMicros(exprs.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_kmv"),
      new ExpressionInfo(classOf[KmvAgg].getName, "graft_kmv"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2, "graft_kmv(long_key, k) takes two arguments")
        val k = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_kmv k must be an integer literal, got $other")
        }
        KmvAgg(exprs.head, k)
      }))
  }
}
