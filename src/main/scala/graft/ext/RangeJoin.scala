package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join ([EXT]): match each point row to every interval
  * row with `lo <= point < hi` (hi optionally inclusive) — the join
  * shape behind "pull all events inside each incident window",
  * sensor-reading enrichment, and genomics-style overlap queries. The
  * reference's merger only does equi-key lookups
  * (etl_cli/base.py merge path); this adds the inequality-join family
  * Spark itself would otherwise plan as BroadcastNestedLoopJoin (O(n·m)
  * probes) or, worse, a CartesianProduct.
  *
  * Implementation is the classic bucketed range join (the same scheme
  * Databricks exposes as a range-join hint): quantize the join domain
  * into fixed-width buckets, explode each interval into the buckets it
  * overlaps, EQUI-join points to interval-buckets on the bucket id, and
  * re-apply the exact predicate as a residual filter. A point falls in
  * exactly ONE bucket, so no dedup pass is needed. The equi-join hash
  * partitions both sides — shuffle proportional to data plus the
  * interval blow-up factor (avg interval span / bucketWidth), the right
  * trade when intervals are much shorter than the domain.
  *
  * Scale notes:
  *   - `bucketWidth` should sit near the typical interval span: too
  *     small multiplies the exploded interval side, too large piles
  *     unrelated points into each bucket for the residual to discard.
  *   - Skew (a hot bucket) is AQE's skew-join case; widths that track
  *     the data distribution keep buckets balanced by construction.
  *   - `broadcastIntervals = true` skips nothing structurally but tags
  *     the exploded interval side for broadcast — the right call when
  *     intervals are a filtered handful (incident windows), making the
  *     whole join a map-side operation with NO shuffle of the points.
  */
object RangeJoin {

  /** Inner range join. `pointCol` (on `points`) and `loCol`/`hiCol`
    * (on `intervals`) must be mutually comparable — numeric, date or
    * timestamp (timestamps quantize via their epoch-seconds double, so
    * `bucketWidth` is in seconds; dates via epoch DAYS, so for date
    * columns `bucketWidth` is in days — Spark disallows a direct
    * DateType→numeric cast, hence the `unix_date` route). Column sets
    * of the two inputs must be disjoint; rows with a null point or
    * null bound drop out, as in any inner inequality join.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
                loCol: String, hiCol: String, bucketWidth: Double,
                inclusiveHi: Boolean = false,
                broadcastIntervals: Boolean = false): DataFrame = {
    require(bucketWidth > 0, s"rangeJoin: bucketWidth must be positive, got $bucketWidth")
    val overlap = points.columns.toSet.intersect(intervals.columns.toSet)
    require(overlap.isEmpty,
      s"rangeJoin: column names must be disjoint; both sides have ${overlap.mkString(", ")}")
    // epoch-seconds double for timestamps (both flavors — TIMESTAMP_NTZ
    // needs the session-tz reinterpretation first, see TimeKeys),
    // epoch-days for dates, plain double for numerics — used ONLY for
    // bucketing; the residual compares the original typed columns, so
    // quantization can never change the result
    def proxy(frame: DataFrame, c: String) =
      graft.functions.TimeKeys.epochProxy(frame, c)
    val w = lit(bucketWidth)
    val p = points.withColumn("__bkt__",
      floor(proxy(points, pointCol) / w).cast("long"))
    val iv0 = intervals.withColumn("__bkt__",
      explode(sequence(floor(proxy(intervals, loCol) / w).cast("long"),
        floor(proxy(intervals, hiCol) / w).cast("long"))))
    val iv = if (broadcastIntervals) broadcast(iv0) else iv0
    val residual = col(pointCol) >= col(loCol) &&
      (if (inclusiveHi) col(pointCol) <= col(hiCol) else col(pointCol) < col(hiCol))
    p.join(iv, Seq("__bkt__")).filter(residual).drop("__bkt__")
  }
}
