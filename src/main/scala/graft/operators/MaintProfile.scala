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
  * points (a drain invoking staged commits) set/restore exactly once,
  * and (r18 ADVICE) a JVM-global holder serializes cross-thread entry:
  * a second thread arriving while the profile is held runs UNENGAGED
  * (the data-scale defaults — the safe side) instead of racing the
  * save/restore into a permanent conf leak.
  *
  * READ paths must not mutate session confs at all (r18 ADVICE — a
  * `_count` is not a single-writer maintenance call): [[isolated]]
  * hands them a cached maintenance TWIN of the caller's session —
  * same SparkContext and warehouse, own SQLConf with the profile
  * pinned — so boundary scans plan under the profile while the
  * caller's session never changes. Semantics-bearing confs (time
  * zone, ANSI mode, case sensitivity) are mirrored from the caller on
  * every handoff, so a timestamp literal parses identically on both.
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
    // JVM-global ownership (r18 ADVICE): two threads interleaving the
    // save/restore could capture each other's profile values and leak
    // them into the session permanently. One holder at a time; a
    // losing thread runs unengaged — never a wrong result, only the
    // data-scale job profile it always had.
    if (!holder.compareAndSet(null, Thread.currentThread())) return body
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
      holder.set(null)
    }
  }

  private val holder =
    new java.util.concurrent.atomic.AtomicReference[Thread](null)

  /** Confs that change QUERY SEMANTICS (literal parsing, name
    * resolution), mirrored caller → twin on every [[isolated]] handoff
    * so a predicate compiles identically on either session.
    */
  private val SemanticConfs = Seq("spark.sql.session.timeZone",
    "spark.sql.ansi.enabled", "spark.sql.caseSensitive")

  /** One maintenance TWIN per caller session (lazily created, cached
    * for the caller session's lifetime — sessions are few and
    * long-lived here, so the map stays tiny). The twin shares the
    * SparkContext and catalog state but owns its SQLConf, with the
    * metadata-scale profile pinned once at creation.
    */
  private val twins =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkSession]()

  /** The metadata-scale twin of `spark` — for READ-path callers
    * ([[graft.engine.Runner.count]] boundary scans, covered-aggregate
    * boundary merges) that want the profile's job shape WITHOUT
    * touching the caller's session confs (r18 ADVICE). The returned
    * session never has its profile confs changed, so concurrent use
    * from many reader threads is safe.
    */
  def sessionFor(spark: SparkSession): SparkSession = {
    val twin = twins.computeIfAbsent(spark, { s: SparkSession =>
      val t = s.newSession()
      t.conf.set("spark.sql.adaptive.enabled", "false")
      t.conf.set("spark.sql.shuffle.partitions", "1")
      t
    })
    SemanticConfs.foreach { k =>
      spark.conf.getOption(k).foreach { v =>
        if (!twin.conf.getOption(k).contains(v)) twin.conf.set(k, v)
      }
    }
    twin
  }

  /** Run `body` against the maintenance twin — the shared-session-safe
    * alternative to [[scoped]] for anything on a query path.
    */
  def isolated[T](spark: SparkSession)(body: SparkSession => T): T =
    body(sessionFor(spark))
}
