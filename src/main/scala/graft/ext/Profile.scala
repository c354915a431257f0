package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Numeric data profiling ([EXT], SURVEY §2.10): the quick-look
  * distribution operators every corpus/warehouse triage session needs.
  *
  * Scale shape: bounds come from one map-side-combinable min/max
  * aggregate broadcast back into the projection (no eager driver
  * action, no collect); bucketing is a pure codegen'd projection and
  * the count is a hash aggregate on ≤ `bins` keys. Two scans total —
  * the same cost DuckDB/any engine pays — and nothing driver-side.
  */
object Profile {

  /** Equi-width histogram of `c`: one row per non-empty bucket with
    * the count and the [lo, hi) bound (last bucket closed). All
    * arithmetic is plain IEEE double — identical in any engine, so the
    * DuckDB oracle replays the exact bucket edges; output bounds are
    * rounded for float-portable hashing. Degenerate min==max input
    * lands everything in bucket 0.
    */
  def histogram(df: DataFrame, c: String, bins: Int): DataFrame = {
    require(bins > 0, s"histogram: bins must be positive, got $bins")
    val v = col(c).cast("double")
    val b = df.agg(min(v).as("__mn__"), max(v).as("__mx__"))
    df.crossJoin(broadcast(b))
      .select(
        when(col("__mx__") === col("__mn__"), lit(0L))
          .otherwise(least(lit(bins - 1L),
            floor((v - col("__mn__")) / (col("__mx__") - col("__mn__")) * bins)))
          .as("bucket"),
        col("__mn__"), col("__mx__"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
        round(first(col("__mn__"))
          + col("bucket") * (first(col("__mx__")) - first(col("__mn__"))) / bins,
          4).as("lo"),
        round(first(col("__mn__"))
          + (col("bucket") + 1) * (first(col("__mx__")) - first(col("__mn__"))) / bins,
          4).as("hi"))
  }
}
