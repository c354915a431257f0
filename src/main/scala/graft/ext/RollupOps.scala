package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-rollup maintenance ([EXT], SURVEY §2.10).
  *
  * The 100 TB pattern: a rollup (grouped aggregate) over an
  * append-only fact stream must not re-aggregate history on every
  * batch. The classic fix — the same commutative-monoid decomposition
  * every streaming/OLAP engine uses for partial aggregation — is to
  * keep a PARTIAL STATE table instead of the finished numbers:
  *
  *   count → sum of per-batch counts        sum → sum of sums
  *   min/max → min/max of per-batch min/max avg → (sum, count) pair
  *
  * [[summarize]] folds one batch to its state rows (a map-side-combine
  * hash aggregate — one scan of the batch only); [[merge]] combines
  * state tables (associative AND commutative, so any batch order or
  * grouping yields the bit-identical state — the law ScalaTest
  * enforces); [[finish]] derives the user-facing columns. Maintaining
  * a 10⁹-group rollup over a 10⁶-row batch costs one batch scan plus
  * a state-sized hash merge — never a fact-table scan. The state
  * table is keyed by the group columns, so persisting it through the
  * keyed writers gets footer-envelope pruning and snapshot commits
  * like any other target.
  *
  * State columns are SELF-DESCRIBING by prefix (`__n`, `__cnt_f`,
  * `__sum_f`, `__min_f`, `__max_f`, `__hll_f`): [[merge]] needs no agg list, so
  * independently-produced state tables (different jobs, different
  * days) combine without coordination. Exactness: counts and integral
  * sums are exact; double sums are floating-point like every engine's
  * SUM — the law compares finished values, and the driver oracle
  * rounds the way the gate rounds all doubles.
  */
object RollupOps {

  /** One requested aggregate: `fn` ∈ count | sum | min | max | avg |
    * hll; `field` empty for count(*). `hll` is APPROX COUNT DISTINCT
    * with a MERGEABLE state — the aggregate exact partial states
    * cannot cover (distinct counts don't add), carried as an HLL++
    * sketch (`hll_sketch_agg`) whose union is exact over the sketch
    * algebra, so incremental maintenance returns the bit-identical
    * estimate the direct aggregate would.
    */
  final case class Agg(fn: String, field: String = "") {
    require(Set("count", "sum", "min", "max", "avg", "hll").contains(fn),
      s"unknown rollup aggregate: $fn")
    require(fn == "count" || field.nonEmpty, s"$fn needs a field")
    /** The finished output column name (`n` for count(*)). */
    def outName: String =
      if (fn == "count" && field.isEmpty) "n" else s"${fn}_$field"
  }

  def parse(specs: Seq[String]): Seq[Agg] = specs.map { s =>
    s.split(":", 2) match {
      case Array(fn)    => Agg(fn.trim)
      case Array(fn, f) => Agg(fn.trim, f.trim)
    }
  }

  /** The state columns a set of aggs needs (deduplicated — avg shares
    * the sum/cnt states with sum/count of the same field).
    */
  private def stateCols(aggs: Seq[Agg]): Seq[(String, String, String)] = {
    // (stateName, srcFn, field)
    val wanted = aggs.flatMap {
      case Agg("count", "") => Seq(("__n", "count", ""))
      case Agg("count", f)  => Seq((s"__cnt_$f", "count", f))
      case Agg("sum", f)    => Seq((s"__sum_$f", "sum", f))
      case Agg("min", f)    => Seq((s"__min_$f", "min", f))
      case Agg("max", f)    => Seq((s"__max_$f", "max", f))
      case Agg("avg", f)    => Seq((s"__sum_$f", "sum", f), (s"__cnt_$f", "count", f))
      case Agg("hll", f)    => Seq((s"__hll_$f", "hll", f))
      case a => throw new IllegalArgumentException(s"unhandled agg $a")
    }
    wanted.distinct
  }

  /** Fold one batch into its partial-state rows: `keys` + the state
    * columns. One hash aggregate (partial+final) over the batch.
    */
  def summarize(batch: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    require(keys.nonEmpty, "rollup needs group keys")
    val states = stateCols(aggs).map {
      case (name, "count", "") => count(lit(1)).as(name)
      case (name, "count", f)  => count(col(f)).as(name)
      case (name, "sum", f)    => sum(col(f)).as(name)
      case (name, "min", f)    => min(col(f)).as(name)
      case (name, "max", f)    => max(col(f)).as(name)
      case (name, "hll", f)    => hll_sketch_agg(col(f)).as(name)
      case (name, fn, f) =>
        throw new IllegalArgumentException(s"unhandled state $name $fn $f")
    }
    batch.groupBy(keys.map(col): _*).agg(states.head, states.tail: _*)
  }

  /** Combine partial-state tables (any number, any order). The merge
    * function per column is DERIVED FROM ITS NAME — `__min_`/`__max_`
    * keep min/max, everything else (`__n`, `__cnt_`, `__sum_`) adds.
    * A group absent from one side contributes its identity (null-skip
    * of the hash aggregate), so disjoint states concatenate for free.
    */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "merge needs at least one state table")
    val cols = states.head.columns.toSeq
    states.foreach(s => require(s.columns.toSeq == cols,
      s"state schemas must match: $cols vs ${s.columns.toSeq}"))
    val unioned = states.reduce(_ unionAll _)
    val stateNames = cols.filterNot(keys.contains)
    val combine = stateNames.map { n =>
      if (n.startsWith("__min_")) min(col(n)).as(n)
      else if (n.startsWith("__max_")) max(col(n)).as(n)
      else if (n.startsWith("__hll_")) hll_union_agg(col(n)).as(n)
      else sum(col(n)).as(n)
    }
    unioned.groupBy(keys.map(col): _*).agg(combine.head, combine.tail: _*)
  }

  /** Derive the finished rollup from a state table. Counts come back
    * as BIGINT; `avg` is `__sum / __cnt` (null for all-null groups,
    * matching plain AVG).
    */
  def finish(state: DataFrame, keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val outs = aggs.map {
      case a @ Agg("count", "") => col("__n").as(a.outName)
      case a @ Agg("count", f)  => col(s"__cnt_$f").as(a.outName)
      case a @ Agg("sum", f)    => col(s"__sum_$f").as(a.outName)
      case a @ Agg("min", f)    => col(s"__min_$f").as(a.outName)
      case a @ Agg("max", f)    => col(s"__max_$f").as(a.outName)
      case a @ Agg("avg", f) =>
        (col(s"__sum_$f") / col(s"__cnt_$f")).as(a.outName)
      case a @ Agg("hll", f) =>
        hll_sketch_estimate(col(s"__hll_$f")).as(a.outName)
      case a => throw new IllegalArgumentException(s"unhandled agg $a")
    }
    state.select((keys.map(col) ++ outs): _*)
  }

  /** The one-call convenience: maintain an existing state with a new
    * batch (summarize + merge). `existing` may be null/absent-free —
    * pass None on the first batch.
    */
  def maintain(existing: Option[DataFrame], batch: DataFrame,
               keys: Seq[String], aggs: Seq[Agg]): DataFrame = {
    val b = summarize(batch, keys, aggs)
    existing.fold(b)(e => merge(Seq(e, b), keys))
  }

  /** PRUNED state maintenance (r10): fold `batch` into the persisted
    * state table at `statePath`, rewriting ONLY the state files whose
    * pk envelopes intersect the batch's touched groups (via
    * [[graft.operators.PrunedMerge]] over the snapshot layout) instead
    * of re-materializing the whole table per batch. At 10⁹ groups a
    * batch touching k groups costs: one batch scan, one touched-group
    * state read (per-column IN pre-filter → parquet row-group pruning
    * when ≤ `maxInlineKeys` touched keys, exact left-semi on top), a
    * k-sized hash merge, and a rewrite of the intersecting files only
    * — rewritten bytes ∝ touched groups, not state size.
    *
    * `meta` columns (e.g. the streaming `__batch_id`/`__run_id`
    * idempotence markers) are attached to the REWRITTEN rows only:
    * untouched rows keep their old markers, so "was (run, batch)
    * applied" must be asked as an existence query, not a table-wide
    * max (see [[graft.streaming.StreamRunner.rollupStream]]).
    *
    * Returns the merge stats, or None when the pruned path does not
    * apply (non-snapshot layout, foreign files) — the caller falls
    * back to a full rewrite.
    */
  def maintainPruned(spark: org.apache.spark.sql.SparkSession,
                     statePath: String, batch: DataFrame,
                     keys: Seq[String], aggs: Seq[Agg],
                     meta: Seq[(String, org.apache.spark.sql.Column)] = Nil,
                     keepVersions: Int = 2,
                     maxInlineKeys: Int = 10000)
      : Option[graft.operators.PrunedMerge.Stats] = {
    val existing = graft.sources.Resolver.readParquet(spark, statePath)
    val coreCols = keys ++ stateCols(aggs).map(_._1)
    require(coreCols.forall(existing.columns.contains),
      s"state table at $statePath lacks ${coreCols.filterNot(existing.columns.contains)}")
    require((coreCols ++ meta.map(_._1)).toSet == existing.columns.toSet,
      s"meta columns must cover the state's non-core columns: " +
        s"${existing.columns.toSeq} vs ${coreCols ++ meta.map(_._1)}")
    // persist: the batch aggregate would otherwise re-execute for the
    // key collect, the semi join, the merge, AND PrunedMerge's passes —
    // 4+ batch scans per micro-batch on the hot streaming path
    // metadata-scale profile (r17): a small micro-batch's fold (semi
    // join + merge + pruned rewrite) runs AQE-off/1-partition
    // ([[graft.operators.MaintProfile]]); data-scale batches decline
    graft.operators.MaintProfile.scoped(spark,
      graft.operators.MaintProfile.small(batch)) {
    val batchState = summarize(batch, keys, aggs).persist()
    try {
      val core = existing.select(coreCols.map(col): _*)
      val keyTuples = batchState.select(keys.map(col): _*).distinct()
      // read-side prune: a small touched-key set becomes per-column IN
      // lists the parquet reader pushes into row-group stats (a superset
      // of the touched groups — the semi join below makes it exact).
      // NULL group keys never match isin/= — a batch tuple with a NULL
      // component widens that column's prefilter with isNull, and the
      // semi join is null-safe, so the existing NULL-keyed state row is
      // read into the merge instead of being silently replaced.
      val inlined = keyTuples.limit(maxInlineKeys + 1).collect()
      val preFiltered =
        if (inlined.length <= maxInlineKeys && inlined.nonEmpty) {
          val conds = keys.zipWithIndex.map { case (k, i) =>
            val vals = inlined.map(_.get(i)).distinct.toIndexedSeq
            val nonNull = vals.filter(_ != null)
            val in =
              if (nonNull.isEmpty) lit(false) else col(k).isin(nonNull: _*)
            if (vals.exists(_ == null)) in || col(k).isNull else in
          }
          core.filter(conds.reduce(_ && _))
        } else core
      val kt = keyTuples.alias("__kt__")
      val pf = preFiltered.alias("__pf__")
      val semiCond = keys.map(k => pf(k) <=> kt(k)).reduce(_ && _)
      val touchedExisting = pf.join(kt, semiCond, "left_semi")
      val combined0 = merge(Seq(touchedExisting, batchState), keys)
      val combined = meta.foldLeft(combined0) { case (d, (n, c)) =>
        d.withColumn(n, c) }.select(existing.columns.toIndexedSeq.map(col): _*)
      val hp = new org.apache.hadoop.fs.Path(statePath)
      val name = hp.getName.stripSuffix(".parquet")
      graft.operators.PrunedMerge.merge(spark, existing, combined,
        graft.spec.TargetSpec(
          graft.spec.DatasetRef("parquet", hp.getParent.toString, name),
          op = graft.spec.WriteOp.Upsert, pk = keys, indexBy = keys,
          commitMode = "snapshot", keepVersions = keepVersions), statePath)
    } finally { batchState.unpersist(); () }
    }
  }

  /** Metadata-only UPPER BOUND on a long column's value across the
    * snapshot head's data files: the max of the parquet footer
    * max-stats, `Long.MinValue` for a zero-row state. None when the
    * bound cannot be certified (non-snapshot layout, column absent
    * from some footer, unusable stats) — the caller must fall back to
    * a scan. Deletion vectors only REMOVE rows, so the footer max
    * stays an upper bound and the "value < x ⇒ no row ≥ x" answer
    * remains sound with tombstones active.
    *
    * The streaming consumer ([[graft.streaming.StreamRunner
    * .rollupStream]]) uses this to answer the per-micro-batch
    * `(run_id, batch_id)` idempotence existence query at footer cost:
    * in the common (non-replay) case every recorded `__batch_id` is
    * below the incoming one, so the check reads ZERO data rows no
    * matter how many groups the state holds. O(#files) driver-side
    * footer reads — the state files are `maxRecordsPerFile`-sized, so
    * a 10⁹-group state is ~10⁴ footers, far below its scan cost.
    */
  def footerMaxLong(spark: org.apache.spark.sql.SparkSession,
                    rootStr: String, colName: String): Option[Long] = {
    import graft.operators.Snapshot
    val root = new org.apache.hadoop.fs.Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!Snapshot.isSnapshotLayout(fs, root)) return None
    val (_, vdir) = Snapshot.resolveVersion(fs, root, None)
    val m = Snapshot.manifestAt(fs, vdir).getOrElse(return None)
    val dd = Snapshot.dataDir(root)
    val paths = m.dataEntries.map(e =>
      new org.apache.hadoop.fs.Path(dd, e.rel).toString)
    // None = this file cannot certify a bound (missing column/stats)
    def oneFile(conf: org.apache.hadoop.conf.Configuration,
                p: String): Option[Long] = {
      val reader =
        try graft.operators.Footers.open(conf,
          new org.apache.hadoop.fs.Path(p))
        catch { case scala.util.control.NonFatal(_) => return None }
      try {
        import scala.jdk.CollectionConverters._
        var acc = Long.MinValue
        reader.getFooter.getBlocks.asScala.foreach { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == colName) match {
            case None => return None
            case Some(cc) =>
              val st = cc.getStatistics
              if (st == null) return None
              if (st.hasNonNullValue) st.genericGetMax match {
                case n: Number => acc = math.max(acc, n.longValue)
                case _ => return None
              } else if (!st.isNumNullsSet || st.getNumNulls < 0) return None
            // else: all-null or empty row group — contributes nothing
          }
        }
        Some(acc)
      } finally reader.close()
    }
    // footer sweep runs DISTRIBUTED above a small threshold — the
    // same shape as PrunedMerge's envelope sweep, so a 10⁴-footer
    // state answers in one short parallel stage, never a serial
    // driver loop
    val perFile: Seq[Option[Long]] =
      if (paths.size <= 64) {
        val conf = spark.sparkContext.hadoopConfiguration
        paths.map(oneFile(conf, _))
      } else {
        val confW = new org.apache.spark.SerializableWritable(
          spark.sparkContext.hadoopConfiguration)
        val bc = spark.sparkContext.broadcast(confW)
        spark.sparkContext
          .parallelize(paths, math.min(paths.size, 256))
          .map(p => oneFile(bc.value.value, p))
          .collect().toSeq
      }
    if (perFile.exists(_.isEmpty)) None
    else Some(perFile.flatten.foldLeft(Long.MinValue)(math.max))
  }
}
