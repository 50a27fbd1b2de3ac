package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Physical backward as-of join: a single-pass streaming merge over two
  * inputs co-partitioned on the key and sorted on (key, time).
  *
  * Scale design (SURVEY §4): exactly one shuffle per side (declared via
  * `requiredChildDistribution`, so Catalyst/AQE plan, coalesce, and reuse it
  * like any sort-merge join shuffle), then O(|left| + |right|) per-partition
  * work with O(1) state — one buffered right row and one retained match per
  * key — regardless of rows per key. No candidate-pair explosion, no window
  * buffer, no row copies except the ≤1-per-right-row retained match. Skewed
  * keys stream through without memory growth, which a window-function
  * encoding (buffering a frame) cannot guarantee.
  *
  * Ties: among right rows with equal (key, time) the merge keeps the last in
  * sort order, matching DuckDB `ASOF JOIN`'s greatest-`t <= l.t` semantics
  * (value ties are nondeterministic there too). NULL keys and NULL times
  * never match (SQL comparison semantics).
  */
case class AsOfMergeJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    isInner: Boolean,
    tolerance: Option[Long],
    left: SparkPlan,
    right: SparkPlan)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // Both sides clustered on the key: EnsureRequirements co-partitions the two
  // shuffles (same partitioner, same numPartitions), as for sort-merge join.
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // Merge order: key, then event time. Catalyst inserts the sorts; over
  // bucketed tables sorted by (key, time) both the exchanges AND the sorts
  // are elided (sort elision needs
  // spark.sql.legacy.bucketedTableScan.outputOrdering=true — spec-proven).
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // Left rows pass through in merge order, so downstream per-key windows /
  // aggregations over the same key need no re-sort and no re-shuffle.
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext, "number of matched left rows"))

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutput = longMetric("numOutputRows")
    val numMatched = longMetric("numMatchedRows")
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val inner = isInner
    val tol = tolerance
    // Tolerance needs a numeric time delta, not just an ordering.
    tol.foreach { _ =>
      import org.apache.spark.sql.types._
      lTimeExpr.dataType match {
        case TimestampType | TimestampNTZType | LongType | IntegerType | DateType =>
        case other => throw new IllegalArgumentException(
          s"as-of tolerance unsupported for time type $other")
      }
    }

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      // Numeric staleness check, resolved once per partition from the time
      // type; null when tolerance is unbounded.
      val tolOk: (UnsafeRow, UnsafeRow) => Boolean = tol match {
        case None => null
        case Some(t) =>
          import org.apache.spark.sql.types._
          lTimeExpr.dataType match {
            case TimestampType | TimestampNTZType | LongType =>
              (lt, rt) => lt.getLong(0) - rt.getLong(0) <= t
            case _ => // IntegerType | DateType, pre-validated above
              (lt, rt) => lt.getInt(0).toLong - rt.getInt(0).toLong <= t
          }
      }

      new Iterator[InternalRow] {
        // Lookahead right row. `rRow` references the shuffle reader's reused
        // buffer — valid only until the next rIter.next(), so it is copied
        // before being retained as a match. `rKey`/`rTime` are the projection
        // buffers, likewise overwritten on the next advance.
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: UnsafeRow = _

        // Latest right row consumed whose key may still match (owned copies).
        private var matchRow: InternalRow = _
        private var matchKey: UnsafeRow = _
        private var matchTime: UnsafeRow = _

        private var ready: InternalRow = _

        private def advanceRight(): Unit = {
          rRow = null
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            val k = rKeyProj(r)
            val t = rTimeProj(r)
            if (!k.anyNull && !t.isNullAt(0)) {
              rRow = r; rKey = k; rTime = t
            }
          }
        }
        advanceRight()

        /** Next output row, or null when the left side is drained (inner
          * joins skip unmatched left rows here). */
        private def findNext(): InternalRow = {
          while (lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l)
            val lTimeNull = lTime.isNullAt(0)
            // Consume right rows at-or-before (lKey, lTime); the last
            // consumed row with an equal key is the as-of match.
            var advancing = rRow != null
            while (advancing) {
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) {
                advanceRight() // right key already passed by the left cursor
              } else if (c == 0 && !lTimeNull && timeOrd.compare(rTime, lTime) <= 0) {
                matchRow = rRow.copy()
                matchKey = rKey.copy()
                matchTime = rTime.copy()
                advanceRight()
              } else {
                advancing = false
              }
              if (rRow == null) advancing = false
            }
            val matched = matchRow != null && !lKey.anyNull &&
              keyOrd.compare(matchKey, lKey) == 0 &&
              (tolOk == null || (!lTimeNull && tolOk(lTime, matchTime)))
            if (matched) {
              numOutput += 1; numMatched += 1
              return joined(l, matchRow)
            } else if (!inner) {
              numOutput += 1
              return joined(l, nullRight)
            }
            // inner + unmatched: fall through to the next left row
          }
          null
        }

        override def hasNext: Boolean = {
          if (ready == null) ready = findNext()
          ready != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("drained as-of merge")
          val out = ready
          ready = null
          out
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)
}
