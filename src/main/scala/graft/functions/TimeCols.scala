package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType}

/** Timestamp-type-adaptive time columns.
  *
  * The synthetic `events` parquet stores `ts` as a naive `timestamp[us]`
  * (`isAdjustedToUTC=false`), which Spark 4's default
  * `spark.sql.parquet.inferTimestampNTZ.enabled=true` reads as
  * `TIMESTAMP_NTZ` — and `unix_micros` rejects NTZ input. The DuckDB
  * oracle reads the same column as a naive timestamp and extracts epoch
  * micros from the wall-clock value, i.e. naive-as-UTC. [[epochMicros]]
  * reproduces exactly that number for BOTH readings of the column:
  *
  *   - `TIMESTAMP` (LTZ): the stored micros already are the UTC instant —
  *     `unix_micros` directly.
  *   - `TIMESTAMP_NTZ`: the internal representation IS epoch micros of
  *     the wall clock, so [[NtzEpochMicros]] reads the long as-is — an
  *     identity in codegen. (A `to_utc_timestamp(c, "UTC")` formulation
  *     is NOT equivalent: type coercion first casts NTZ→LTZ with the
  *     SESSION zone, yielding `N − offset(session)` — correct only under
  *     UTC sessions. The spec pins zone-independence explicitly.)
  *
  * Keeping this schema-adaptive (instead of pinning a reader config)
  * means operator code gives identical integers under any caller
  * session.
  */
object TimeCols {

  /** Microseconds since epoch of timestamp column `c` of type `dt`,
    * treating NTZ wall time as UTC. */
  def epochMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => ColumnShim.column(NtzEpochMicros(ColumnShim.expression(c)))
    case _                => unix_micros(c)
  }

  /** [[epochMicros]] resolving the column's type from `df`'s schema. */
  def epochMicros(df: DataFrame, name: String): Column =
    epochMicros(col(name), df.schema(name).dataType)
}

/** Wall-clock epoch micros of a `TIMESTAMP_NTZ` — the physical long,
  * untouched by any time zone (session or JVM). */
case class NtzEpochMicros(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_ntz_micros"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == TimestampNTZType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires timestamp_ntz, got ${child.dataType.catalogString}")

  override def nullSafeEval(v: Any): Any = v.asInstanceOf[Long]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => c)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
