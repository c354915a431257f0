package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Timestamp-flavor helpers: parquet written by Spark 3.4+/4.x (or
  * arrow/pandas with `isAdjustedToUTC=false`) reads back as
  * TIMESTAMP_NTZ, and Spark disallows a direct NTZ→numeric cast and
  * rejects NTZ watermarks — so every operator keyed on "epoch seconds
  * of a timestamp column" must accept BOTH flavors (plus DATE and plain
  * numerics) or die with an AnalysisException the moment a user's
  * parquet carries the other one.
  *
  * NTZ carries no instant, only a wall-clock; the reinterpretation here
  * is `cast(TimestampType)`, i.e. "this wall-clock IN THE SESSION TIME
  * ZONE". Every graft entry point pins `spark.sql.session.timeZone=UTC`,
  * which makes the mapping exact and DST-free; a library user running a
  * DST-observing session zone gets that zone's fold at the two ambiguous
  * hours a year — same contract as Spark's own NTZ→TZ cast. The helpers
  * are used ONLY for ordering/bucketing/watermark keys; operators keep
  * the original column in their output so results stay in the caller's
  * flavor (and hash-match a DuckDB oracle reading the same parquet).
  */
object TimeKeys {

  /** The column itself for TIMESTAMP, a session-tz TIMESTAMP view for
    * TIMESTAMP_NTZ — the minimal coercion `withWatermark` and numeric
    * casts need.
    */
  def tzSafe(dt: DataType, c: Column): Column = dt match {
    case TimestampNTZType => c.cast(TimestampType)
    case _ => c
  }

  def tzSafe(df: DataFrame, name: String): Column =
    tzSafe(df.schema(name).dataType, col(name))

  /** Numeric ordering/bucketing proxy: epoch-seconds double for both
    * timestamp flavors, epoch DAYS for dates (DateType→numeric is an
    * AnalysisException in Spark 3+, hence the `unix_date` route), the
    * value itself for numerics. Monotone in the source column, so safe
    * for range bucketing with a residual on the original values.
    */
  def epochProxy(df: DataFrame, name: String): Column =
    df.schema(name).dataType match {
      case DateType => unix_date(col(name)).cast("double")
      case dt => tzSafe(dt, col(name)).cast("double")
    }

  /** Floor-second epoch long — the RANGE-frame key both engines agree
    * on (DuckDB: `epoch_ns(ts) // 1000000000`).
    */
  def epochSeconds(df: DataFrame, name: String): Column =
    tzSafe(df.schema(name).dataType, col(name)).cast("long")

  /** `df` with `name` coerced to TIMESTAMP when it's NTZ — required
    * before `withWatermark`, which rejects TIMESTAMP_NTZ outright.
    * No-op (zero plan change) for every other type.
    */
  def withTzTimestamp(df: DataFrame, name: String): DataFrame =
    df.schema(name).dataType match {
      case TimestampNTZType => df.withColumn(name, col(name).cast(TimestampType))
      case _ => df
    }
}
