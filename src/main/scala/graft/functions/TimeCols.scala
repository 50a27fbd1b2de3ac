package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType}

/** Timestamp-type-adaptive time columns.
  *
  * The synthetic `events` parquet stores `ts` as a naive `timestamp[us]`
  * (`isAdjustedToUTC=false`), which Spark 4's default
  * `spark.sql.parquet.inferTimestampNTZ.enabled=true` reads as
  * `TIMESTAMP_NTZ` — and `unix_micros` rejects NTZ input. The DuckDB oracle
  * reads the same column as a naive timestamp and extracts epoch micros
  * from the wall-clock value, i.e. naive-as-UTC. [[epochMicros]] reproduces
  * exactly that number for BOTH readings of the column:
  *
  *   - `TIMESTAMP` (LTZ): the stored micros already are the UTC instant —
  *     `unix_micros` directly.
  *   - `TIMESTAMP_NTZ`: `to_utc_timestamp(c, "UTC")` pins the wall time to
  *     UTC regardless of `spark.sql.session.timeZone`, then `unix_micros`.
  *
  * Keeping this schema-adaptive (instead of pinning a reader config) means
  * operator code gives identical integers under any caller session.
  */
object TimeCols {

  /** Microseconds since epoch of timestamp column `c` of type `dt`,
    * treating NTZ wall time as UTC. */
  def epochMicros(c: Column, dt: DataType): Column = dt match {
    case TimestampNTZType => unix_micros(to_utc_timestamp(c, "UTC"))
    case _                => unix_micros(c)
  }

  /** [[epochMicros]] resolving the column's type from `df`'s schema. */
  def epochMicros(df: DataFrame, name: String): Column =
    epochMicros(col(name), df.schema(name).dataType)
}
