package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical backward as-of join: for every left row, the single right row with
  * the greatest `rightTime <= leftTime` within the same key (left-outer — left
  * rows with no prior right row keep NULL right columns).
  *
  * Spark has no as-of join operator (SPARK-22947 was never merged), and the
  * relational encodings all have a flaw at 100 TB scale: a range-join
  * `ON l.k = r.k AND r.t <= l.t` explodes O(rows-per-key²) candidates before
  * a groupBy-max prunes them, and the union+window encoding
  * ([[graft.operators.AsOfJoin.leftAsOf]]) carries every left column through
  * a window buffer. This node declares the join relationally so Catalyst can
  * keep optimizing around it, and [[GraftStrategy]] plans it as a
  * [[AsOfMergeJoinExec]] single-pass streaming merge.
  *
  * Reference behavior: wrds2pg materializes point-in-time research tables by
  * converting SAS `proc sql` joins (wrds2pg/sas/codegen.py:5 get_wrds_sas);
  * the as-of shape is the canonical downstream query on such tables.
  */
/** @param isInner   drop left rows with no as-of match (DuckDB `ASOF JOIN`
  *                   default) instead of null-padding them (`ASOF LEFT JOIN`)
  * @param tolerance  max allowed `leftTime - rightTime`, in the time column's
  *                   native unit (µs for timestamps, days for dates); `None`
  *                   = unbounded staleness
  * @param broadcastRight plan as [[AsOfBroadcastJoinExec]] (zero left-side
  *                   shuffle) instead of the co-partitioned merge. Set from a
  *                   user `broadcast(right)` hint at API level, because the
  *                   optimizer's `EliminateResolvedHint` strips hint nodes
  *                   that no built-in operator consumed before planning. */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isInner: Boolean = false,
    tolerance: Option[Long] = None,
    broadcastRight: Boolean = false)
  extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching key lists on both sides")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    s"as-of join key types differ: ${leftKeys.map(_.dataType)} vs ${rightKeys.map(_.dataType)}")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of join time types differ: ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
