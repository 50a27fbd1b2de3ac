package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of (point-in-time) join.
  *
  * For every left row, attaches the right row with the greatest
  * `rightTime <= leftTime` within the same key (DuckDB `ASOF LEFT JOIN`
  * semantics, inclusive). Left rows with no prior right row get NULLs.
  *
  * Scale design (SURVEY §4): implemented as union + window — ONE shuffle on
  * the key, then a linear in-order scan per key — instead of a range
  * join, whose candidate explosion is O(left × right-per-key) and whose
  * planning falls back to broadcast-nested-loop at 100 TB. The union stream
  * sorts right rows before left rows at equal timestamps so the inclusive
  * match is honored, and `last(_, ignoreNulls)` propagates the most recent
  * right-side values forward.
  */
object AsOfJoin {

  /** @param valueCols right-side columns to carry onto matching left rows
    *                   (must not collide with left column names) */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)), "valueCols collide with left columns")

    // Common layout: key, t, side marker, all left cols, all right value cols.
    val l = left.select(
      (col(leftKey).as("_k") +: col(leftTime).as("_t") +: lit(0).as("_r") +:
        leftCols.map(col)) ++ valueCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)): _*)
    // NULL right keys/times never match under SQL comparison semantics, but
    // would here: a NULL _t sorts FIRST under asc, so last(ignoreNulls) would
    // leak its value to every left row of the key. Drop them up front.
    val r = right
      .where(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(
        (col(rightKey).as("_k") +: col(rightTime).as("_t") +: lit(1).as("_r") +:
          leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))) ++ valueCols.map(col): _*)

    // Right rows first at equal t (inclusive <=); _r desc gives that.
    val w = Window.partitionBy("_k").orderBy(col("_t").asc, col("_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = valueCols.foldLeft(l.unionByName(r)) { (df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    filled.where(col("_r") === 0).select(leftCols.map(col) ++ valueCols.map(col): _*)
  }

  /** Native-plan variant of [[leftAsOf]]: same semantics, planned as a
    * [[graft.plans.AsOfMergeJoinExec]] streaming merge (custom logical node +
    * planner strategy) instead of the union+window encoding. Requires a
    * session built with [[graft.functions.GraftExtensions]]
    * ([[graft.core.GraftSession]] installs it).
    *
    * Compared to [[leftAsOf]] at scale: the right side shuffles only its own
    * rows (not a null-padded union of both schemas), per-partition state is
    * O(1) instead of a window frame, and the merge emits left rows in key
    * order so downstream per-key operators reuse both the partitioning and
    * the ordering.
    *
    * Passing `broadcast(right)` selects the zero-shuffle broadcast exec
    * ([[graft.plans.AsOfBroadcastJoinExec]]): the left side never moves —
    * the enrichment path for a huge fact table + small reference table.
    */
  def leftAsOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asOfNative(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      inner = false, tolerance)

  /** Inner as-of join (DuckDB `ASOF JOIN` default): like [[leftAsOfNative]]
    * but left rows with no match are dropped instead of null-padded. */
  def innerAsOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      tolerance: Option[Long] = None): DataFrame =
    asOfNative(left, right, leftKey, rightKey, leftTime, rightTime, valueCols,
      inner = true, tolerance)

  /** Skew-sharded variant of [[leftAsOfNative]] for hot keys (one key owning
    * a large fraction of all left rows — a bot user, a default account).
    *
    * AQE's skew-join splitting only rewrites Spark's own join execs, so the
    * custom merge is sharded explicitly, with the same trick as
    * [[SkewJoin.saltedJoin]]: every left row gets a deterministic salt
    * (`xxhash64(saltBy) % buckets`), the right side is replicated once per
    * salt, and the merge keys on (key, salt). Each shard sees the FULL right
    * history for its key, so every left row resolves exactly the match it
    * would have seen unsalted (spec-proven equal) — the hot key's left rows
    * now spread over `buckets` partitions at the cost of `buckets`× the
    * (small) right side, the standard trade at 100 TB.
    */
  def leftAsOfNativeSalted(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      buckets: Int,
      saltBy: String): DataFrame = {
    require(buckets > 1, "salting needs at least 2 buckets")
    val salt = "_asof_salt"
    require(!left.columns.contains(salt) && !right.columns.contains(salt),
      s"column name $salt is reserved")
    val l2 = left.withColumn(salt, pmod(xxhash64(col(saltBy)), lit(buckets)).cast("int"))
    val r2 = right.withColumn(salt, explode(sequence(lit(0), lit(buckets - 1))))
    asOfNativeKeys(l2, r2, Seq(leftKey, salt), Seq(rightKey, salt),
      leftTime, rightTime, valueCols, inner = false, tolerance = None)
      .drop(salt)
  }

  private def asOfNative(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      inner: Boolean,
      tolerance: Option[Long]): DataFrame =
    asOfNativeKeys(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime,
      valueCols, inner, tolerance)

  private def asOfNativeKeys(
      left: DataFrame,
      right: DataFrame,
      leftKeys: Seq[String],
      rightKeys: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      inner: Boolean,
      tolerance: Option[Long]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Project, ResolvedHint}
    import org.apache.spark.sql.graftshim.ColumnShim
    import graft.plans.AsOfJoinPlan

    val leftCols = left.columns.toSeq
    require(valueCols.forall(!leftCols.contains(_)), "valueCols collide with left columns")
    require(ColumnShim.hasStrategy(left.sparkSession, graft.plans.GraftStrategy),
      "asOfNative needs GraftExtensions installed on the session " +
        "(use graft.core.GraftSession.builder, or .withExtensions(new GraftExtensions))")

    val lPlan = ColumnShim.analyzed(left)
    // A user `broadcast(right)` hint selects the zero-shuffle broadcast exec.
    // Consumed here because the optimizer drops hint nodes no built-in
    // operator claimed (EliminateResolvedHint) before our strategy runs.
    val (rSource, useBroadcast) = ColumnShim.analyzed(right) match {
      case ResolvedHint(child, hints) if hints.strategy.contains(BROADCAST) => (child, true)
      case other => (other, false)
    }
    // Fresh expr IDs on the whole right side so self-joins (same source both
    // sides, as in events-vs-signups) never alias across the join.
    val rPlan = Project(rSource.output.map(a => Alias(a, a.name)()), rSource)

    def attr(out: Seq[Attribute], name: String): Attribute =
      out.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column '$name' in ${out.map(_.name)}"))

    val joinPlan = AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan.output, _)), rightKeys.map(attr(rPlan.output, _)),
      attr(lPlan.output, leftTime), attr(rPlan.output, rightTime),
      isInner = inner, tolerance = tolerance, broadcastRight = useBroadcast)
    // Keep left columns + requested right value columns, referencing the
    // join's own output attributes (right side already nullable there).
    val byId = joinPlan.output.map(a => a.exprId -> a).toMap
    val keep = lPlan.output.map(a => byId(a.exprId)) ++
      valueCols.map(c => byId(attr(rPlan.output, c).exprId))
    ColumnShim.ofRows(left.sparkSession, Project(keep, joinPlan))
  }
}
