package graft.operators

import graft.dsl.QueryCompiler
import graft.spec.{MergeDirection, MergerSpec}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, MapType, StructType}

/** The merger: a correlated equi-lookup join with modifier flags
  * (SURVEY §2.3; reference: `setup_merger`, etl_cli/etl.py:148-187).
  *
  * `query` values shaped `#field#` are correlated keys — "look the merger
  * up where merger.<key> equals the current source record's <field>"
  * (etl_cli/etl.py:182-183). Literal values pre-filter the merger side.
  * All modes compile to ONE Spark join + select-list post-processing, so
  * Catalyst/AQE pick the physical strategy (broadcast vs sort-merge);
  * we add a broadcast hint when the merger is a small dimension.
  */
object MergePlanner {

  private val MPrefix = "__m_"
  private val Marker  = "__m_matched__"

  /** Scalar, sort-friendly types usable as deterministic tiebreakers. */
  private[operators] def sortable(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType | BinaryType => false
    case _ => true
  }

  /** Split the merger query into correlated (mergerKey, op, sourceField)
    * triples and literal filter params. Correlated keys accept the same
    * `__op` suffixes as filters (`ts__lte=#ev_ts#` → merger.ts ≤
    * src.ev_ts), turning the lookup into a range join.
    */
  def splitQuery(query: Seq[(String, String)])
      : (Seq[(String, String, String)], Seq[(String, String)]) = {
    val corr = query.collect {
      case (k, v) if v.length > 2 && v.startsWith("#") && v.endsWith("#") =>
        val (field, op) = QueryCompiler.splitOp(k)
        (field, op, v.substring(1, v.length - 1))
    }
    val corrRaw = query.collect {
      case (k, v) if v.length > 2 && v.startsWith("#") && v.endsWith("#") => k
    }.toSet
    (corr, query.filterNot { case (k, v) =>
      corrRaw.contains(k) && v.startsWith("#") && v.endsWith("#")
    })
  }

  /** Deterministic "first match" for match_one (J5; etl_cli/etl.py:47,164):
    * row_number over the join keys ordered by the merger's sortable
    * columns, keep rn = 1.
    */
  private def dedupeOne(m: DataFrame, keys: Seq[String]): DataFrame = {
    val orderCols = m.schema.fields.toSeq
      .filter(f => !keys.contains(f.name) && sortable(f.dataType))
      .map(f => col(f.name).asc)
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy((if (orderCols.isEmpty) Seq(lit(1).asc) else orderCols).toIndexedSeq: _*)
    m.withColumn("__rn__", row_number().over(w)).filter(col("__rn__") === 1).drop("__rn__")
  }

  /** `broadcastMerger` forces a broadcast hint for callers that KNOW
    * the merger is a small dimension; the default leaves the physical
    * join choice to Catalyst/AQE's size-based planning (a forced hint
    * on a large merger would override the 8GB broadcast limit guard
    * and OOM the driver at scale).
    */
  def merge(src: DataFrame, mergerRaw: DataFrame, spec: MergerSpec,
            broadcastMerger: Boolean = false): DataFrame = {
    val (corr, literals) = splitQuery(spec.query)
    require(corr.nonEmpty, "merger requires at least one #field# correlated key (--mkeys)")
    require(spec.mergeAs.isEmpty || spec.mergeRule.isEmpty,
      "--mrules has no effect with --mma (merge_as nests the whole record); pick one")

    // Literal params filter the merger side with the same query DSL.
    val filtered = QueryCompiler.apply(mergerRaw, literals)

    // J4 require_no_match → anti join. Handled before match_one dedupe:
    // the anti join only asks whether ANY match exists, so deduping is
    // a semantic no-op — and dedupeOne's row_number window (ordered by
    // every sortable merger column) would drag the full merger schema
    // through the scan. Projecting to the condition columns instead
    // keeps the merger side a key-only scan (at 100 TB: one column read
    // off parquet, not sixteen).
    if (spec.requireNoMatch) {
      val keyCols = corr.map(_._1).distinct
      val pruned = keyCols.foldLeft(filtered.select(keyCols.map(col).toIndexedSeq: _*)) {
        (d, c) => d.withColumnRenamed(c, MPrefix + c)
      }
      val m = if (broadcastMerger) broadcast(pruned) else pruned
      val cond = corr.map { case (mk, op, sf) =>
        val mc = m(MPrefix + mk)
        op match {
          case "eq"  => if (spec.strictMatch) src(sf) === mc else src(sf) <=> mc
          case "ne"  => mc =!= src(sf)
          case "gt"  => mc > src(sf)
          case "gte" => mc >= src(sf)
          case "lt"  => mc < src(sf)
          case "lte" => mc <= src(sf)
          case other => throw new IllegalArgumentException(
            s"correlated merger key supports eq/ne/gt/gte/lt/lte, got __$other")
        }
      }.reduce(_ && _)
      return src.join(m, cond, "left_anti")
    }

    val eqKeys = corr.collect { case (mk, "eq", _) => mk }
    val allEq = corr.forall(_._2 == "eq")
    // match_one can pre-dedupe the merger only for pure equi-lookups;
    // with range ops the winning match depends on the source row, so
    // dedupe happens after the join (row_number per source row).
    val deduped =
      if (spec.unwind || !spec.matchOne || !allEq) filtered
      else dedupeOne(filtered, eqKeys)

    // Rename merger columns so the join output has no ambiguity.
    val renamed0 = deduped.columns.foldLeft(deduped)((d, c) => d.withColumnRenamed(c, MPrefix + c))
    val renamed = renamed0.withColumn(Marker, lit(true))
    val m = if (broadcastMerger) broadcast(renamed) else renamed

    // J7 strict_match: null-rejecting === ; default tolerant <=> (null keys
    // match null keys — mongo missing-field tolerance, SURVEY §2.3).
    val cond: Column = corr.map { case (mk, op, sf) =>
      val mc = m(MPrefix + mk)
      op match {
        case "eq"  => if (spec.strictMatch) src(sf) === mc else src(sf) <=> mc
        case "ne"  => mc =!= src(sf)
        case "gt"  => mc > src(sf)
        case "gte" => mc >= src(sf)
        case "lt"  => mc < src(sf)
        case "lte" => mc <= src(sf)
        case other => throw new IllegalArgumentException(
          s"correlated merger key supports eq/ne/gt/gte/lt/lte, got __$other")
      }
    }.reduce(_ && _)

    // J3 require_match → inner; else left outer (anti handled above).
    val rangeOne = !spec.unwind && spec.matchOne && !allEq
    // range lookup + match_one needs a unique per-source-row partition
    // key: partitioning by the source's columns would collapse
    // duplicate source rows into one output row.
    val srcTagged = if (rangeOne)
      src.withColumn("__srcrow__", monotonically_increasing_id()) else src
    val joined0 = srcTagged.join(m, cond, if (spec.requireMatch) "inner" else "left_outer")
    val joined =
      if (!rangeOne) joined0
      else {
        // keep the first match per SOURCE row (deterministic: merger's
        // sortable columns ascending).
        val ord = deduped.columns.toSeq
          .filter(c => sortable(deduped.schema(c).dataType))
          .map(c => col(MPrefix + c).asc_nulls_last)
        val w = Window.partitionBy(col("__srcrow__"))
          .orderBy((if (ord.isEmpty) Seq(lit(1).asc) else ord).toIndexedSeq: _*)
        joined0.withColumn("__rn__", row_number().over(w))
          .filter(col("__rn__") === 1).drop("__rn__", "__srcrow__")
      }

    val srcCols  = src.columns.toSeq
    val mrgCols  = deduped.columns.toSeq
    val shared   = mrgCols.filter(srcCols.contains)
    val mrgOnly  = mrgCols.filterNot(srcCols.contains)
    val matched  = col(Marker).isNotNull && col(Marker)

    val out = spec.mergeAs match {
      case Some(nestField) =>
        // J8 merge_as: nest the whole matched merger record under one field.
        val nested = when(matched,
          struct(mrgCols.map(c => col(MPrefix + c).as(c)).toIndexedSeq: _*))
        joined.select((srcCols.map(col) :+ nested.as(nestField)).toIndexedSeq: _*)
      case None =>
        // J9 named merge rule for shared columns in scope; J2 merge
        // direction (which side wins) for the rest.
        val rule = spec.mergeRule.map(MergeRules.resolve)
        rule.foreach { case (_, scope) =>
          // a scoped column that isn't actually shared means the rule
          // would silently never apply — fail loudly instead
          val bad = scope -- shared.toSet
          require(bad.isEmpty,
            s"--mrules-scm columns not shared between source and merger: " +
              s"${bad.mkString(", ")} (shared: ${shared.mkString(", ")})")
        }
        val overlaid = srcCols.map { c =>
          if (shared.contains(c)) rule match {
            case Some((fn, scope)) if scope.isEmpty || scope.contains(c) =>
              fn(col(c), col(MPrefix + c)).as(c)
            case _ => spec.direction match {
              case MergeDirection.M2S => coalesce(col(MPrefix + c), col(c)).as(c)
              case MergeDirection.S2M => coalesce(col(c), col(MPrefix + c)).as(c)
            }
          } else col(c)
        }
        val extras = mrgOnly.map(c => col(MPrefix + c).as(c))
        joined.select((overlaid ++ extras).toIndexedSeq: _*)
    }
    out
  }
}
