// Lives in an org.apache.spark.sql subpackage solely to reach the
// private[sql] Column <-> catalyst Expression converters of the classic
// (non-Connect) API. No Spark internals are modified.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridges graft's custom Catalyst expressions/plans into the public API. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Wraps a (resolved) logical plan as a DataFrame — the classic API's
    * `Dataset.ofRows`, which the public surface does not expose. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame (for building composite plans). */
  def analyzed(df: DataFrame): LogicalPlan =
    df.queryExecution.analyzed

  /** Whether the session's planner carries the given strategy (used to fail
    * fast with a useful message when GraftExtensions was not installed). */
  def hasStrategy(spark: SparkSession, strategy: AnyRef): Boolean =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.planner.strategies.exists(_ eq strategy)
}
