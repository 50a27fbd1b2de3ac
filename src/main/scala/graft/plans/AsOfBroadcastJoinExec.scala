package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Broadcast backward as-of join: the small right side is broadcast once,
  * indexed per partition as key → time-sorted rows, and every left row
  * resolves its match with a hash lookup + binary search.
  *
  * Scale design (SURVEY §4): this is the zero-shuffle enrichment path — the
  * canonical 100 TB case of attaching a GB-sized reference table (quotes,
  * rates, dimension history) to a fact stream. The left side never moves:
  * no shuffle, no sort, partitioning and ordering pass through untouched, so
  * the as-of enrichment composes with upstream scans and downstream
  * aggregations without an extra stage boundary. Only the broadcast (one
  * `BroadcastExchange`, AQE-managed) is paid, exactly as for Spark's own
  * broadcast-hash equi-join.
  *
  * The O(R log R) index build over broadcast rows is memoized per executor
  * on the broadcast id (see companion), so concurrent tasks share one build;
  * match semantics (ties, NULL keys/times, inclusive <=, tolerance) are
  * identical to [[AsOfMergeJoinExec]] and spec-checked equal.
  */
case class AsOfBroadcastJoinExec(
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

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
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
    // Broadcast ids are a per-SparkContext counter from 0, so the memo key
    // must include the application identity: a restarted session in the same
    // JVM (tests, notebooks, local mode) reuses ids and would otherwise hit
    // a stale index from the previous context.
    val appId = sparkContext.applicationId
    val broadcastRows = right.executeBroadcast[Array[InternalRow]]()

    left.execute().mapPartitions { lIter =>
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTimeExpr.dataType))
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow
      val tolOk: (UnsafeRow, UnsafeRow) => Boolean = tol match {
        case None => null
        case Some(t) =>
          import org.apache.spark.sql.types._
          lTimeExpr.dataType match {
            case TimestampType | TimestampNTZType | LongType =>
              (lt, rt) => lt.getLong(0) - rt.getLong(0) <= t
            case IntegerType | DateType =>
              (lt, rt) => lt.getInt(0).toLong - rt.getInt(0).toLong <= t
            case other => throw new IllegalArgumentException(
              s"as-of tolerance unsupported for time type $other")
          }
      }

      // key → (times sorted ascending, rows in the same order). Broadcast
      // rows are stable copies (IdentityBroadcastMode), safe to reference.
      // Built once per executor per broadcast (memoized on broadcast id) —
      // tasks of this stage, and any later stage reusing the exchange, share
      // the build instead of paying O(R log R) each.
      val index = AsOfBroadcastJoinExec.cachedIndex(appId, broadcastRows.id, () => {
        val m = new java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]
        broadcastRows.value.foreach { r =>
          val k = rKeyProj(r)
          val t = rTimeProj(r)
          if (!k.anyNull && !t.isNullAt(0)) {
            var buf = m.get(k)
            if (buf == null) {
              buf = new scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]
              m.put(k.copy(), buf)
            }
            buf += ((t.copy(), r))
          }
        }
        m.values().forEach(buf => buf.sortInPlaceWith((a, b) => timeOrd.compare(a._1, b._1) < 0))
        m
      })

      lIter.flatMap { l =>
        val lKey = lKeyProj(l)
        val lTime = lTimeProj(l)
        var matchRow: InternalRow = null
        if (!lKey.anyNull && !lTime.isNullAt(0)) {
          val arr = index.get(lKey)
          if (arr != null) {
            // greatest i with time(i) <= lTime (rightmost on ties, matching
            // the merge path's last-consumed semantics)
            var lo = 0
            var hi = arr.length - 1
            var found = -1
            while (lo <= hi) {
              val mid = (lo + hi) >>> 1
              if (timeOrd.compare(arr(mid)._1, lTime) <= 0) { found = mid; lo = mid + 1 }
              else hi = mid - 1
            }
            if (found >= 0 && (tolOk == null || tolOk(lTime, arr(found)._1)))
              matchRow = arr(found)._2
          }
        }
        if (matchRow != null) {
          numOutput += 1; numMatched += 1
          Iterator.single(joined(l, matchRow))
        } else if (!inner) {
          numOutput += 1
          Iterator.single(joined(l, nullRight))
        } else Iterator.empty
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfBroadcastJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfBroadcastJoinExec {
  private type Index =
    java.util.HashMap[UnsafeRow, scala.collection.mutable.ArrayBuffer[(UnsafeRow, InternalRow)]]

  /** Per-executor index memo, keyed by (applicationId, broadcastId) —
    * broadcast ids alone restart from 0 with every SparkContext, so two
    * sessions in one JVM would collide on the bare id. SoftReferences let
    * the JVM reclaim an index under memory pressure (it is rebuilt on
    * demand); a racing double-build is benign — both results are identical
    * and the loser is collected. Read-only after publication, so sharing
    * the plain HashMap across tasks is safe. */
  private val indexCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long), java.lang.ref.SoftReference[Index]]()

  private[graft] def cachedIndex(appId: String, broadcastId: Long, build: () => Index): Index = {
    val key = (appId, broadcastId)
    val ref = indexCache.get(key)
    val hit = if (ref != null) ref.get() else null
    if (hit != null) hit
    else {
      val built = build()
      indexCache.put(key, new java.lang.ref.SoftReference(built))
      built
    }
  }
}
