package graft.engine

import graft.dsl.QueryCompiler
import graft.functions.Transformers
import graft.operators.MergePlanner
import graft.sources.Resolver
import graft.spec._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spec → DataFrame. The declarative heart of the engine: everything the
  * reference CLI compiles into its nested job dict (SURVEY §3.1 steps
  * 1-4) becomes one lazily-built Spark logical plan, so Catalyst gets
  * the whole job at once — predicate pushdown into the scan, column
  * pruning, join strategy selection, AQE — with no engine-side
  * scheduling (SURVEY §4).
  */
object Planner {

  /** Source stage: scan → query DSL (filter/agg/sort/limit/projection)
    * → post-read transformers (reference: `setup_source`,
    * etl_cli/etl.py:135-146).
    */
  def sourceFrame(spark: SparkSession, s: SourceSpec,
                  failOnError: Boolean = true): DataFrame =
      metadataAggFast(spark, s).getOrElse {
    val raw = Resolver.read(spark, s.ref, failOnError = failOnError,
      query = s.query) // connector backends push the filters server-side
    // `_fields` projects AFTER the post-read transformers so it can
    // select transformer-created columns; filters/sort/limit still
    // compile at the scan (and Catalyst prunes the read schema through
    // the projection either way).
    val (fieldParams, rest) = s.query.partition(_._1 == "_fields")
    val queried = QueryCompiler.apply(raw, rest)
    val transformed = Transformers.apply(queried, s.postRead)
    val fields = fieldParams.flatMap(_._2.split(","))
      .map(_.trim).filter(_.nonEmpty)
    if (fields.nonEmpty) QueryCompiler.project(transformed, fields)
    else transformed
  }

  /** METADATA-ONLY aggregate fast path (r17 — the Iceberg aggregate-
    * pushdown shape, [[graft.operators.Snapshot.metadataAgg]]): an
    * unfiltered `_agg min:k,max:k,count` on a tombstone-free snapshot
    * table answers as a LOCAL relation — ZERO Spark jobs, the
    * [[graft.engine.Runner.count]] twin for the aggregate DSL. r18
    * widens the shape two ways:
    *
    *   - `_group` by PARTITION columns answers per group from
    *     partition point values + recorded rows/envelopes
    *     ([[graft.operators.Snapshot.metadataGroupAgg]] — the Iceberg
    *     `partitions` metadata-table shape, verdict #2);
    *   - `_sort`/`_limit` compose ON the local relation (the scan
    *     path's application order is filter → agg → sort → limit, and
    *     there is nothing to filter here).
    *
    * Everything else — a predicate, a non-partition group key, a
    * post-read transformer, an aggregate outside min/max/count —
    * composes with the scan instead; version-pin failures keep the
    * scan path's error shape.
    */
  private def metadataAggFast(spark: SparkSession,
                              s: SourceSpec): Option[DataFrame] = {
    if (s.ref.backend != "parquet" || s.postRead.nonEmpty) return None
    val allowed = Set("_agg", "_group", "_sort", "_limit",
      "_version", "_version_ts")
    // control keys outside the allowed set (`_fields`, `_flat`, …)
    // decline; FIELD pairs are fine IF they translate exactly — the
    // r18 predicate-covered path below owns them
    if (!s.query.forall(kv => allowed.contains(kv._1) ||
        !QueryCompiler.ControlKeys.contains(kv._1))) return None
    val preds = QueryCompiler.exactPreds(s.query).getOrElse(return None)
    // the same `_agg`/`_group` gathering/splitting as QueryCompiler
    def gather(k: String): Seq[String] =
      s.query.collect { case (`k`, v) => v }
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val aggs = gather("_agg").map { a =>
      a.split(":", 2) match {
        case Array(f, fld) => (f.trim, fld.trim)
        case Array(f)      => (f.trim, "*")
      }
    }
    if (aggs.isEmpty) return None
    val groups = gather("_group")
    val p = Resolver.path(s.ref)
    val hp = new org.apache.hadoop.fs.Path(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hp)) return None
    val atV = scala.util.Try {
      s.query.collectFirst { case ("_version", v) => v.toLong }
        .orElse(s.query.collectFirst { case ("_version_ts", v) =>
          graft.operators.Snapshot.versionAtTimestamp(fs, hp,
            graft.operators.Snapshot.parseCommitTs(v))
        })
    } match {
      case scala.util.Success(v) => v
      case scala.util.Failure(_) => return None
    }
    def oneRow(vals: Seq[(String, Any,
        org.apache.spark.sql.types.DataType)]): DataFrame = {
      val schema = org.apache.spark.sql.types.StructType(vals.map {
        case (n, _, dt) =>
          org.apache.spark.sql.types.StructField(n, dt, nullable = true)
      })
      spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row(vals.map(_._2): _*)), schema)
    }
    val base: Option[DataFrame] =
      if (groups.nonEmpty) {
        if (preds.nonEmpty) None // grouped + filtered stays with the scan
        else graft.operators.Snapshot
          .metadataGroupAgg(spark, p, atV, groups, aggs)
          .map { case (fields, rws) =>
            spark.createDataFrame(
              java.util.Arrays.asList(rws.map(r =>
                org.apache.spark.sql.Row(r: _*)): _*),
              org.apache.spark.sql.types.StructType(fields))
          }
      } else if (preds.isEmpty)
        graft.operators.Snapshot.metadataAgg(spark, p, atV, aggs).map(oneRow)
      else
        // r18 predicate-covered aggregates (verdict #3): covered
        // members fold driver-side, only boundary members scan — on
        // the maintenance twin, so the read path touches no session
        // confs; the one-row result builds on the CALLER's session
        coveredAgg(spark, s, p, atV, preds, aggs).map(oneRow)
    base.map { df =>
      val sort = gather("_sort")
      val sorted =
        if (sort.isEmpty) df
        else df.orderBy(QueryCompiler.sortColumns(sort).toIndexedSeq: _*)
      s.query.collectFirst { case ("_limit", v) => v.trim.toInt }
        .fold(sorted)(sorted.limit)
    }
  }

  /** Merge [[graft.operators.Snapshot.metadataAggPlan]]'s covered
    * partials with the boundary scan's aggregates, if any. The
    * boundary frame filters under the COMPILED predicates — the same
    * exact semantics the scan path applies, so the two plan halves
    * can never disagree — and aggregates through
    * [[QueryCompiler.aggregate]], so output names and types match the
    * scan path by construction; the merge happens in the envelope's
    * long domain ([[graft.operators.Snapshot.toDomain]]).
    */
  private def coveredAgg(spark: SparkSession, s: SourceSpec, p: String,
                         atV: Option[Long],
                         preds: Seq[graft.operators.Snapshot.ReadPred],
                         aggs: Seq[(String, String)])
      : Option[Seq[(String, Any, org.apache.spark.sql.types.DataType)]] = {
    import graft.operators.Snapshot
    // boundary scans build and run on the maintenance twin (r18
    // ADVICE: never mutate the caller's confs from a query path); a
    // global aggregate is profile-insensitive — one row per task
    // through its single exchange
    val maint = graft.operators.MaintProfile.sessionFor(spark)
    Snapshot.metadataAggPlan(maint, p, atV, preds, aggs).map {
      case (partials, boundaryOpt) =>
        val brow = boundaryOpt.map { bdf =>
          val filtered = QueryCompiler.compile(bdf, s.query).predicates
            .foldLeft(bdf)(_ filter _)
          QueryCompiler.aggregate(filtered, Nil, aggs).head()
        }
        partials.zipWithIndex.map { case (pt, i) =>
          val bv = brow.flatMap(r =>
            if (r.isNullAt(i)) None else Some(r.get(i)))
          val v: Any = pt.fn match {
            case "count" | "countf" =>
              pt.covered.getOrElse(0L) +
                bv.map(_.asInstanceOf[Long]).getOrElse(0L)
            case fn =>
              val bd = bv.map(Snapshot.toDomain(pt.dt, _))
              val merged = (pt.covered, bd) match {
                case (Some(a), Some(b)) =>
                  Some(if (fn == "min") math.min(a, b) else math.max(a, b))
                case (a, b) => a.orElse(b)
              }
              merged.map(Snapshot.fromDomain(pt.dt, _)).orNull
          }
          (pt.name, v, pt.dt)
        }
    }
  }

  /** Merger stage: resolve the merger dataset, apply its post-read
    * transformers, run the correlated join, then post-merge transformers
    * (reference: `setup_merger`, etl_cli/etl.py:148-187).
    */
  def withMerger(spark: SparkSession, src: DataFrame, m: MergerSpec,
                 failOnError: Boolean = true): DataFrame = {
    // only LITERAL merger filters can push to a connector; correlated
    // `#field#` keys resolve per source row inside the join
    val literals = m.query.filterNot(_._2.matches("#.*#"))
    val mrgRaw = Transformers.apply(
      Resolver.read(spark, m.ref, failOnError = failOnError,
        query = literals), m.postRead)
    val merged = MergePlanner.merge(src, mrgRaw, m)
    Transformers.apply(merged, m.postMerge)
  }

  /** Full read-side plan: source → merger. Target ops are applied by the
    * Runner (they need the current target state).
    */
  def plan(spark: SparkSession, job: JobSpec): DataFrame = {
    // W14: target.fail_on_error governs the whole job's read policy
    // (reference stores the global flag under target.*, base.py:267)
    val foe = job.effectiveFailOnError
    val src = sourceFrame(spark, job.source, foe)
    val compiled = QueryCompiler.compile(src, job.source.query)
    val df = job.merger.fold(src) { m =>
      val merged0 = withMerger(spark, src, m, foe)
      // A shuffle join does not preserve the source's `_sort` order —
      // re-apply it so downstream consumers see the requested ordering.
      val sortKeys = compiled.sort
        .filter(k => merged0.columns.contains(k.stripPrefix("-")))
      val merged =
        if (sortKeys.nonEmpty)
          merged0.orderBy(QueryCompiler.sortColumns(sortKeys).toIndexedSeq: _*)
        else merged0
      // `_flat=1` flattens the FINAL record — including structs the
      // merger nested (merge_as) — not just the source scan (F7).
      if (compiled.flat) graft.functions.StructUtils.flatten(merged) else merged
    }
    job.workers.fold(df)(n => df.repartition(n))
  }
}
