package graft.spec

import java.time.LocalDate
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter

/** Dataset address `backend/ns/name` (reference: `parse_ds`,
  * etl_cli/base.py:22-38). `backend` selects the connector/format,
  * `ns` the database/schema (may contain `/`), `name` the table.
  *
  * `%TODAY%` in any segment substitutes today's UTC date at parse
  * time (intent of etl_cli/base.py:27-29 — the reference has a
  * latent NameError there; we implement the documented behavior).
  */
final case class DatasetRef(backend: String, ns: String, name: String) {
  def uri: String = s"$backend/$ns/$name"
}

object DatasetRef {
  private val TodayFmt = DateTimeFormatter.ofPattern("yyyy_MM_dd")

  def today(): String = LocalDate.now(ZoneOffset.UTC).format(TodayFmt)

  /** Parse `backend/ns[/more/ns]/name`; 2 segments mean empty ns. The
    * ns keeps any leading `/` (or URI scheme) verbatim, so absolute and
    * `s3a://…` paths survive: `parquet//data/sf/t` → ns `/data/sf`.
    */
  def parse(raw: String): DatasetRef = {
    val s = raw.replace("%TODAY%", today())
    val slash = s.indexOf('/')
    require(slash > 0 && slash < s.length - 1,
      s"dataset ref needs backend/[ns/]name: $raw")
    val rest = s.substring(slash + 1)
    val cut = rest.lastIndexOf('/')
    val (ns, name) =
      if (cut < 0) ("", rest) else (rest.substring(0, cut), rest.substring(cut + 1))
    require(name.nonEmpty, s"dataset ref needs a name segment: $raw")
    DatasetRef(s.substring(0, slash), ns, name)
  }
}

/** Write operations of the keyed target sink
  * (reference: OPS, etl_cli/etl.py:13).
  */
sealed abstract class WriteOp(val name: String)
object WriteOp {
  case object Create extends WriteOp("create")
  case object Index  extends WriteOp("index")
  case object Update extends WriteOp("update")
  case object Upsert extends WriteOp("upsert")
  case object Delete extends WriteOp("delete")
  case object Insert extends WriteOp("insert")
  val all: Seq[WriteOp] = Seq(Create, Index, Update, Upsert, Delete, Insert)
  def parse(s: String): WriteOp =
    all.find(_.name == s.toLowerCase)
      .getOrElse(throw new IllegalArgumentException(s"unknown op: $s"))
}

/** Merge direction (reference: `--mmd s2m|m2s`, etl_cli/etl.py:41,157-160).
  * M2S = merger fields overlay onto the source record (merger wins on
  * conflict); S2M = source fields overlay onto the merger record.
  */
sealed trait MergeDirection
object MergeDirection {
  case object M2S extends MergeDirection
  case object S2M extends MergeDirection
  def parse(s: String): MergeDirection = s.toLowerCase match {
    case "m2s" => M2S
    case "s2m" => S2M
    case other => throw new IllegalArgumentException(s"unknown --mmd: $other")
  }
}

/** A named transformer invocation `name:arg1,arg2`
  * (reference: `trans_name`, etl_cli/base.py:87-94).
  */
final case class TransformStage(name: String, args: Seq[String] = Nil)
object TransformStage {
  /** Parse a comma-separated chain where each element is `name` or
    * `name:a1;a2` (we use `;` between args inside one stage so the chain
    * separator stays `,` — reference passes args via separate --stra/--mtra
    * flags, etl_cli/etl.py:33,44).
    */
  def parseChain(chain: String): Seq[TransformStage] =
    chain.split(",").filter(_.nonEmpty).toSeq.map { part =>
      part.split(":", 2) match {
        case Array(n)    => TransformStage(n.trim)
        case Array(n, a) => TransformStage(n.trim, a.split(";").map(_.trim).toSeq)
      }
    }
}

/** Source: scan + query (filter/sort/limit/projection via the dotted
  * query DSL, SURVEY §2.2) + post-read transformers.
  * Reference: `setup_source`, etl_cli/etl.py:135-146.
  *
  * `query` is ordered (repeated `-q _fields=` accumulate,
  * etl_cli/base.py:221-228), hence a Seq of pairs, not a Map.
  */
final case class SourceSpec(
    ref: DatasetRef,
    query: Seq[(String, String)] = Nil,
    postRead: Seq[TransformStage] = Nil)

/** The correlated lookup join (reference: `setup_merger`,
  * etl_cli/etl.py:148-187). `query` values of the form `#field#` are
  * correlated keys (source-record field substitution,
  * etl_cli/etl.py:182-183); literal values filter the merger side.
  */
final case class MergerSpec(
    ref: DatasetRef,
    query: Seq[(String, String)] = Nil,
    direction: MergeDirection = MergeDirection.M2S,
    requireMatch: Boolean = false,   // --mrm  → inner
    requireNoMatch: Boolean = false, // --mrnm → anti
    matchOne: Boolean = true,        // --mmo (default true; --munwind sets false)
    unwind: Boolean = false,         // --munwind → 1:N expansion
    strictMatch: Boolean = false,    // --mstrict → null-rejecting equality
    mergeAs: Option[String] = None,  // --mma → nest match under this field
    mergeRule: Option[TransformStage] = None, // --mrules
    postRead: Seq[TransformStage] = Nil,      // --mtr
    postMerge: Seq[TransformStage] = Nil)     // --mtr-post-merge

/** Keyed target write (reference: `setup_target`, etl_cli/etl.py:189-248). */
final case class TargetSpec(
    ref: DatasetRef,
    op: WriteOp = WriteOp.Create,
    pk: Seq[String] = Nil,                  // --pk / `-o op:pk`
    query: Seq[(String, String)] = Nil,     // --tq: restrict touched target rows
    fields: Seq[String] = Nil,              // --tf (supports -exclusions)
    overwrite: Seq[String] = Nil,           // --overwrite per-field policy
    skipBy: Seq[String] = Nil,              // --skip_by insert-if-absent key
    skipTimestamp: Boolean = false,         // --skip-timestamp
    failOnError: Boolean = true,            // base.py:135,267
    indexBy: Seq[String] = Nil,             // O6 --mongo-index → range-sorted file layout
    partitionBy: Seq[String] = Nil,         // [EXT] hive-style partition cols
    maxRecordsPerFile: Long = 0,            // [EXT] file sizing (s3 batch analog, etl.py:129-133)
    commitMode: String = "rename",          // [EXT] --commit rename|versioned|snapshot
    keepVersions: Int = 2,                  // [EXT] --keep-versions: committed
                                            // generations the snapshot/versioned
                                            // protocols retain (time-travel depth)
    deleteVectors: Boolean = false,         // [EXT] --dv: delete op writes pk
                                            // tombstones (merge-on-read) instead
                                            // of rewriting files — snapshot
                                            // layouts only
    tmap: Option[String] = None)            // W11 --tmap: DDL schema the batch
                                            // is cast to before writing (the
                                            // lake analog of the reference's
                                            // named ES mapping, etl.py:236-238)

/** A full job: the IR the planner executes. Replaces the reference's
  * flat dotted params dict (etl_cli/base.py:236-298) — see SURVEY §3.1.
  */
final case class JobSpec(
    source: SourceSpec,
    merger: Option[MergerSpec] = None,
    target: Option[TargetSpec] = None,
    workers: Option[Int] = None,   // O2: parallelism hint → repartition
    dryRun: Boolean = false,
    contid: Option[String] = None, // O4 continuation loop id
    cron: Option[String] = None,   // O5: schedule expression, RECORDED
                                   // for an external scheduler (the
                                   // reference also only passes it
                                   // through, base.py:134,276 — no
                                   // in-engine timer)
    logDs: Option[String] = None,  // W13 --log_ds (base.py:143,
                                   // etl.py:193-195): namespace the
                                   // `_logs` dataset is written under
                                   // (default: the target's ns)
    logFields: Seq[String] = Nil,  // W13 --log FIELDS (base.py:122):
                                   // projection of the job-log record,
                                   // `-field` excludes like --tf
    logPretty: Boolean = false,    // W13 --pretty (base.py:123,251-252):
                                   // echo the log record as pretty JSON
    failOnError: Boolean = true) { // W14 — job-wide read policy; also
                                   // mirrored on TargetSpec (reference
                                   // stores it under target.*)
  /** Effective W14 policy: false if EITHER the job-wide flag or the
    * target's says so — covers target-less jobs (preview/count).
    */
  def effectiveFailOnError: Boolean =
    failOnError && target.forall(_.failOnError)
}
