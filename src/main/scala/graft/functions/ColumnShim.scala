// Lives in an org.apache.spark.sql subpackage solely to reach the
// private[sql] Column <-> catalyst Expression converters of the classic
// (non-Connect) API. No Spark internals are modified.
package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridges graft's custom Catalyst expressions into the public Column API. */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
