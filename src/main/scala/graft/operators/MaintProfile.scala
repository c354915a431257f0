package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** METADATA-SCALE execution profile (r17 — productizing the r16 cdc
  * gate's scoping, per the r16 verdict): the lakehouse maintenance
  * pipelines (CDC index upkeep, staged snapshot commits, pruned
  * rollup folds) execute dozens of KB-scale actions per increment.
  * Two session defaults are wrong at that scale and multiply the
  * fixed per-job overhead that dominates such pipelines:
  *
  *   - AQE materializes every Exchange as its own query stage, so a
  *     tiny 3-exchange join costs 3–4 jobs instead of 1 — per-stage
  *     re-planning buys nothing when the whole frame is kilobytes
  *     (the r15/r16 JobProbe audits: ~85 sub-100 ms jobs, folded to
  *     ~32–37 once scoped off);
  *   - a static `shuffle.partitions` sized for data-scale queries
  *     (32 here, 200 upstream-default) schedules 32×N near-empty
  *     tasks per tiny exchange.
  *
  * [[scoped]] runs `body` with AQE off and single-partition shuffles,
  * restoring the caller's values after — and the maintenance entry
  * points themselves engage it behind a PLAN-SIZE gate (≤ [[SmallBytes]],
  * mirroring `sortedLayout`'s one-task threshold), so a plain API
  * caller gets the metadata-scale job profile with zero conf
  * twiddling. The estimate only picks the profile: an overestimate
  * keeps the data-scale defaults it always had, an underestimate
  * runs a small frame through 1-partition shuffles — never a wrong
  * result. Joins/aggregates estimate high (plan stats multiply
  * children), so only genuinely small materialized inputs engage.
  *
  * Scope caveat (r16 ADVICE): Spark session confs are SESSION-global —
  * a concurrent query planned on the same session during a scoped
  * maintenance call sees the profile. Single-writer maintenance (the
  * designed deployment: one maintainer session per table, the same
  * isolation the commit protocol assumes) is unaffected; a shared
  * interactive session should hand maintenance its own
  * `spark.newSession()` (confs are session-scoped, the context is
  * shared). Re-entrancy is depth-guarded per thread, so nested entry
  * points (a drain invoking staged commits) set/restore exactly once.
  */
object MaintProfile {

  /** The size gate: frames at or below this plan-stats estimate run
    * under the profile. 8 MB — the `sortedLayout` one-task threshold
    * (r16): anything this small is a metadata-scale action, not a
    * data-scale query.
    */
  val SmallBytes: Long = 8L << 20

  private val depth = new ThreadLocal[Integer] {
    override def initialValue(): Integer = 0
  }

  /** Optimizer size estimate of `df`, None when the plan carries no
    * stats (checkpointed RDD inputs) or estimation throws.
    */
  def planBytes(df: DataFrame): Option[BigInt] =
    try Some(df.queryExecution.optimizedPlan.stats.sizeInBytes)
    catch { case scala.util.control.NonFatal(_) => None }

  /** Should `df` engage the profile? `hint` (known byte size, e.g. the
    * CDC maintainer's span-changed-bytes) overrides the plan estimate;
    * unknown size → NO (the data-scale defaults are the safe side).
    */
  def small(df: DataFrame, hint: Option[Long] = None): Boolean =
    hint.map(BigInt(_)).orElse(planBytes(df))
      .exists(b => b >= 0 && b <= SmallBytes)

  /** Known-size variant for callers without a frame in hand. */
  def smallBytes(hint: Option[Long]): Boolean =
    hint.exists(b => b >= 0 && b <= SmallBytes)

  /** Run `body` under the metadata-scale profile (AQE off,
    * single-partition shuffles), restoring the previous session values
    * after — including on throw. `engage = false` (the size gate
    * declining) and nested calls run `body` untouched, so wiring the
    * profile into every maintenance entry point costs big pipelines
    * nothing and scopes exactly once.
    */
  def scoped[T](spark: SparkSession, engage: Boolean = true)(body: => T): T = {
    if (!engage || depth.get > 0) return body
    val aqePrev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val shufPrev = spark.conf.get("spark.sql.shuffle.partitions", "200")
    depth.set(1)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "1")
    try body
    finally {
      depth.set(0)
      spark.conf.set("spark.sql.adaptive.enabled", aqePrev)
      spark.conf.set("spark.sql.shuffle.partitions", shufPrev)
    }
  }
}
