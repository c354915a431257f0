package graft.dsl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiler for the dotted-key query DSL (SURVEY §2.2; reference:
  * `qlsit2query`, etl_cli/base.py:216-230).
  *
  * Grammar of one `key=value` pair:
  *   - `_limit=N`, `_sort=[-]f1,[-]f2`, `_fields=a,b,-c`, `_count=1`,
  *     `_flat=1` — control keys (reference: base.py:221-228,482-490,545).
  *   - `_group=a,b` + `_agg=sum:x,avg:y,count:*` — [EXT] aggregation
  *     extension (SURVEY §2.6; not in the reference surface).
  *   - `field=value` — equality on a (possibly dotted/nested) path.
  *   - `field__op=value` — operator suffix (double underscore), e.g.
  *     `l_quantity__gte=30`, `logs.job.contid__ne=x` (etl_cli/etl.py:327).
  *
  * Literals are typed against the DataFrame schema before comparison so
  * predicates stay fold-able and push down into the parquet scan
  * (check with `.explain`: `PushedFilters: [GreaterThanOrEqual(...)]`).
  */
object QueryCompiler {

  final case class Compiled(
      predicates: Seq[Column],
      fields: Seq[String],        // raw _fields entries incl. `-` exclusions
      sort: Seq[String],          // raw _sort entries incl. `-` prefix
      limit: Option[Int],
      count: Boolean,
      flat: Boolean,
      group: Seq[String],
      aggs: Seq[(String, String)]) // (func, field)

  private[graft] val ControlKeys =
    Set("_limit", "_sort", "_fields", "_count", "_flat", "_group", "_agg",
        "_url", "_pagination", // _url/_pagination handled by the resolver / no-op
        "_version", "_version_ts") // [EXT] snapshot time travel (by
                                   // number / by commit instant) —
                                   // resolved at scan time

  /** The ENVELOPE-SKIPPABLE subset of a query's predicate pairs (r15):
    * conjuncts a snapshot read can prune members with from the
    * manifest's per-file key envelopes, BEFORE any file is opened.
    * Advisory by contract — [[apply]] still compiles and applies every
    * predicate exactly above the scan, so a conjunct this translation
    * drops (ne/nin/regex/…, dotted paths, unsupported types) costs
    * only pruning opportunity, never correctness. Values stay raw
    * strings; the read path converts them with the same Catalyst cast
    * the exact predicate uses.
    */
  def skipPreds(query: Seq[(String, String)])
      : Seq[graft.operators.Snapshot.ReadPred] = {
    import graft.operators.Snapshot.ReadPred
    query.collect { case (k, v) if !ControlKeys.contains(k) => (k, v) }
      .flatMap { case (k, v) =>
        val (field, op) = splitOp(k)
        if (field.contains('.')) Nil // nested paths carry no envelope
        else op match {
          case "eq" | "gt" | "gte" | "lt" | "lte" =>
            Seq(ReadPred.Cmp(field, op, v))
          case "in" =>
            Seq(ReadPred.In(field, v.split(",").map(_.trim).toSeq))
          case "between" => v.split(",", 2) match {
            case Array(lo, hi) => Seq(ReadPred.Cmp(field, "gte", lo.trim),
              ReadPred.Cmp(field, "lte", hi.trim))
            case _ => Nil
          }
          case "exists" =>
            if (v == "0" || v.equalsIgnoreCase("false"))
              Seq(ReadPred.IsNull(field))
            else Seq(ReadPred.NotNull(field))
          case _ => Nil
        }
      }
  }

  /** STRICT translation (r17 — predicate-covered metadata counts): the
    * query's field conjuncts as ReadPreds, or None when ANY field pair
    * fails to translate. Unlike [[skipPreds]] (advisory — a dropped
    * conjunct only costs pruning power, the exact filter re-applies
    * everything), a count decided from metadata has no exact filter
    * over the COVERED files, so the translated set must be
    * semantically COMPLETE: every non-control pair must map onto a
    * ReadPred whose semantics equal the compiled predicate's
    * (eq/gt/gte/lt/lte/in/between/exists on a top-level field), else
    * the caller must take the scan path. Empty field set → Some(Nil)
    * (the unfiltered count).
    */
  def exactPreds(query: Seq[(String, String)])
      : Option[Seq[graft.operators.Snapshot.ReadPred]] = {
    import graft.operators.Snapshot.ReadPred
    val fieldPairs = query.filterNot(kv => ControlKeys.contains(kv._1))
    val translated: Seq[Option[Seq[ReadPred]]] = fieldPairs.map { case (k, v) =>
      val (field, op) = splitOp(k)
      if (field.contains('.')) None // nested paths carry no envelope
      else op match {
        case "eq" | "gt" | "gte" | "lt" | "lte" =>
          Some(Seq(ReadPred.Cmp(field, op, v)))
        case "in" =>
          Some(Seq(ReadPred.In(field, v.split(",").map(_.trim).toSeq)))
        case "between" => v.split(",", 2) match {
          case Array(lo, hi) => Some(Seq(ReadPred.Cmp(field, "gte", lo.trim),
            ReadPred.Cmp(field, "lte", hi.trim)))
          case _ => None
        }
        case "exists" =>
          Some(Seq(if (v == "0" || v.equalsIgnoreCase("false"))
            ReadPred.IsNull(field) else ReadPred.NotNull(field)))
        case _ => None
      }
    }
    if (translated.exists(_.isEmpty)) None else Some(translated.flatten.flatten)
  }

  /** Split `field__op` into (field, op); default op is `eq`. */
  def splitOp(key: String): (String, String) = {
    val i = key.lastIndexOf("__")
    if (i > 0) (key.substring(0, i), key.substring(i + 2)) else (key, "eq")
  }

  /** Resolve the Spark type of a dotted path, descending nested structs. */
  def pathType(schema: StructType, path: String): Option[DataType] = {
    def go(dt: DataType, parts: List[String]): Option[DataType] = (dt, parts) match {
      case (t, Nil) => Some(t)
      case (st: StructType, p :: rest) =>
        st.fields.find(_.name.equalsIgnoreCase(p)).flatMap(f => go(f.dataType, rest))
      case _ => None
    }
    go(schema, path.split('.').toList)
  }

  /** Type a string literal against the column's schema type so Catalyst
    * sees a constant of the right type (pushdown-friendly).
    */
  def typed(value: String, dt: Option[DataType]): Column = dt match {
    case Some(t: NumericType)  => lit(value).cast(t)
    case Some(BooleanType)     => lit(value.toBoolean)
    case Some(TimestampType)   => lit(value).cast(TimestampType)
    case Some(DateType)        => lit(value).cast(DateType)
    case _                     => lit(value)
  }

  /** One `field__op=value` → a Column predicate. */
  def predicate(df: DataFrame, field: String, op: String, value: String): Column = {
    lazy val dt = pathType(df.schema, field)
    // Schema-free tolerance (SURVEY §7.4.3): a missing field behaves as a
    // null column (mongo semantics) instead of an AnalysisException —
    // `__exists=0` then matches every row, equality matches none.
    val c = if (dt.isDefined) col(field) else lit(null)
    def v = typed(value, dt)
    def vs = value.split(",").map(x => typed(x.trim, dt))
    op match {
      case "eq"   => c === v
      case "ne"   => c =!= v
      case "nse"  => c <=> v          // null-safe equal
      case "nsne" => !(c <=> v)       // null-safe not-equal (nulls match)
      case "gt"   => c > v
      case "gte"  => c >= v
      case "lt"   => c < v
      case "lte"  => c <= v
      case "in"   => c.isin(vs.toIndexedSeq: _*)
      case "nin"  => !c.isin(vs.toIndexedSeq: _*)
      case "exists" =>
        if (value == "0" || value.equalsIgnoreCase("false")) c.isNull else c.isNotNull
      case "regex"      => c.rlike(value)
      case "contains"   => c.contains(value)
      case "startswith" => c.startsWith(value)
      case "endswith"   => c.endsWith(value)
      case "between" => value.split(",", 2) match {
        case Array(lo, hi) => c.between(typed(lo.trim, dt), typed(hi.trim, dt))
        case _ => throw new IllegalArgumentException(
          s"__between needs lo,hi — got: $value")
      }
      case other => throw new IllegalArgumentException(s"unknown query op: __$other")
    }
  }

  /** Compile an ordered query param list against a frame's schema. */
  def compile(df: DataFrame, query: Seq[(String, String)]): Compiled = {
    // repeated _fields/_sort accumulate comma-joined (etl_cli/base.py:221-228)
    def gather(k: String): Seq[String] =
      query.collect { case (`k`, v) => v }.flatMap(_.split(","))
        .map(_.trim).filter(_.nonEmpty)
    val preds = query.collect {
      case (k, v) if !ControlKeys.contains(k) =>
        val (field, op) = splitOp(k)
        predicate(df, field, op, v)
    }
    Compiled(
      predicates = preds,
      fields = gather("_fields"),
      sort = gather("_sort"),
      limit = query.collectFirst { case ("_limit", v) => v.toInt },
      count = query.collectFirst { case ("_count", v) => v == "1" }.getOrElse(false),
      flat = query.collectFirst { case ("_flat", v) => v == "1" }.getOrElse(false),
      group = gather("_group"),
      aggs = gather("_agg").map { a =>
        a.split(":", 2) match {
          case Array(f, fld) => (f.trim, fld.trim)
          case Array(f)      => (f.trim, "*")
        }
      })
  }

  /** Compile a query's predicate pairs into ONE ANSI-SQL boolean
    * expression string (r12 — the predicate-deletion-vector route:
    * `-o delete --dv --tq …` commits the tq as a read-time tombstone,
    * so the predicate must round-trip through text). Values are typed
    * against `df`'s schema exactly like [[predicate]]; the returned
    * string re-parses with `expr(...)`.
    */
  def predicateSql(df: DataFrame, query: Seq[(String, String)]): String = {
    val preds = query.collect {
      case (k, v) if !ControlKeys.contains(k) =>
        val (field, op) = splitOp(k)
        predicate(df, field, op, v)
    }
    require(preds.nonEmpty, s"no predicate pairs in query: $query")
    columnSql(df, preds.reduce(_ && _))
  }

  /** ANSI-SQL text of a Column, resolved against `df` (Spark 4 Columns
    * are lazy ColumnNodes — only the ANALYZED expression renders
    * portable SQL). Resolution also validates the references.
    */
  def columnSql(df: DataFrame, c: Column): String =
    df.select(c.as("__sql__")).queryExecution.analyzed.expressions
      .collectFirst {
        case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child.sql
      }
      .getOrElse(throw new IllegalStateException(
        s"cannot render column to SQL: $c"))

  /** `_sort=-f` → descending (reference: base.py:353-354). */
  def sortColumns(sort: Seq[String]): Seq[Column] = sort.map {
    case s if s.startsWith("-") => col(s.drop(1)).desc
    case s                      => col(s).asc
  }

  /** Apply a `_fields` list with `-` exclusions (F5; etl_cli/base.py:122,265):
    * inclusions → select, exclusions → drop; both may appear.
    */
  def project(df: DataFrame, fields: Seq[String]): DataFrame = {
    val (excl, incl) = fields.partition(_.startsWith("-"))
    val afterIncl =
      if (incl.isEmpty) df
      else df.select(incl.map(f => col(f).as(f)).toIndexedSeq: _*)
    if (excl.isEmpty) afterIncl else afterIncl.drop(excl.map(_.drop(1)).toIndexedSeq: _*)
  }

  /** approx_pNN sketch accuracy: rank error ≤ group-size / accuracy. */
  val PctlAccuracy = 10000

  /** [EXT] `_group`/`_agg` → groupBy().agg(); output columns named
    * `<func>_<field>` (`count_all` for `count:*`).
    */
  def aggregate(df: DataFrame, group: Seq[String], aggs: Seq[(String, String)]): DataFrame = {
    // All pNN requests for one field share ONE percentile(field,
    // array(q1,…)) aggregate — one counts-map buffer per group instead
    // of one per requested percentile (exact same algorithm and
    // interpolation, so results are bit-identical). The array column is
    // unpacked into the `<p>_<field>` names after the agg.
    val pctlByField: Map[String, Seq[String]] = aggs.collect {
      case (p, f) if p.matches("p\\d{1,2}") => (f, p)
    }.groupBy(_._1).map { case (f, ps) => f -> ps.map(_._2).distinct }
    // one shared aggregate per FIELD — an occurrence set, not a
    // head-comparison, so a repeated p50:x doesn't emit twice
    val pctlEmitted = scala.collection.mutable.Set.empty[String]
    var unpack = Vector.empty[(String, Column)] // output name -> element
    val exprs = aggs.flatMap {
      case ("count", "*")   => Some(count(lit(1)).as("count_all"))
      case ("count", f)     => Some(count(col(f)).as(s"count_$f"))
      case ("countd", f)    => Some(countDistinct(col(f)).as(s"countd_$f"))
      case ("sum", f)       => Some(sum(col(f)).as(s"sum_$f"))
      case ("avg", f)       => Some(avg(col(f)).as(s"avg_$f"))
      case ("min", f)       => Some(min(col(f)).as(s"min_$f"))
      case ("max", f)       => Some(max(col(f)).as(s"max_$f"))
      case ("stddev", f)    => Some(stddev_samp(col(f)).as(s"stddev_$f"))
      // exact interpolated percentiles (p50/p90/p95/p99); approx_pNN
      // below is the sketch-based scale path. Scale note: Spark's exact
      // percentile accumulates a per-group counts map (memory ∝ distinct
      // values) — on 100 TB / high-cardinality columns prefer
      // `approx_pNN` (bounded-memory GK sketch, rank error ≤ n/accuracy)
      // and keep exact pNN for small groups or bit-identical oracles.
      // A window-sort exact formulation spills safely but diverges from
      // percentile() in the last ulp (measured), so the oracle-aligned
      // aggregate stays the exact path here.
      case (p, f) if p.matches("p\\d{1,2}") =>
        val ps = pctlByField(f)
        if (!pctlEmitted.add(f)) None // one aggregate per field
        else if (ps.size == 1) {
          val q = p.drop(1).toDouble / 100.0
          Some(expr(s"percentile(`$f`, $q)").as(s"${p}_$f"))
        } else {
          val qs = ps.map(_.drop(1).toDouble / 100.0).mkString(", ")
          unpack ++= ps.zipWithIndex.map { case (pp, i) =>
            s"${pp}_$f" -> element_at(col(s"__pctl_$f"), i + 1)
          }
          Some(expr(s"percentile(`$f`, array($qs))").as(s"__pctl_$f"))
        }
      case ("approx_countd", f) =>
        Some(approx_count_distinct(col(f)).as(s"approx_countd_$f"))
      // approx_pNN: Greenwald-Khanna sketch percentile — the documented
      // scale default for percentiles (memory bounded by the accuracy
      // parameter, not by distinct values; returns an actual element
      // with rank within n/accuracy of the target rank).
      case (p, f) if p.matches("approx_p\\d{1,2}") =>
        val q = p.stripPrefix("approx_p").toDouble / 100.0
        Some(expr(s"approx_percentile(`$f`, $q, $PctlAccuracy)").as(s"${p}_$f"))
      case (fn, f) => throw new IllegalArgumentException(s"unknown agg: $fn:$f")
    }
    require(exprs.nonEmpty, "_agg required when _group is set")
    val agged = df.groupBy(group.map(col).toIndexedSeq: _*)
      .agg(exprs.head, exprs.tail.toIndexedSeq: _*)
    if (unpack.isEmpty) agged
    else {
      // splice each percentile into its requested position
      val outCols = group.map(col) ++ aggs.map {
        case (p, f) if p.matches("p\\d{1,2}") && pctlByField(f).size > 1 =>
          unpack.find(_._1 == s"${p}_$f").get._2.as(s"${p}_$f")
        case ("count", "*") => col("count_all")
        case (fn, f)        => col(s"${fn}_$f")
      }
      agged.select(outCols.toIndexedSeq: _*)
    }
  }

  /** Full application order: filter → group/agg → sort → limit →
    * project → flatten. (Reference applies source.query at scan;
    * sort/limit/projection ride along the same dict — SURVEY §2.2;
    * `_flat=1` flattens nested structs, base.py:545-546.)
    */
  def apply(df: DataFrame, query: Seq[(String, String)]): DataFrame = {
    val q = compile(df, query)
    var out = q.predicates.foldLeft(df)(_ filter _)
    if (q.group.nonEmpty || q.aggs.nonEmpty) out = aggregate(out, q.group, q.aggs)
    if (q.sort.nonEmpty) out = out.orderBy(sortColumns(q.sort).toIndexedSeq: _*)
    q.limit.foreach(n => out = out.limit(n))
    if (q.fields.nonEmpty) out = project(out, q.fields)
    if (q.flat) out = graft.functions.StructUtils.flatten(out)
    out
  }
}
