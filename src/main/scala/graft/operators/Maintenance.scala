package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** DEBT-TRIGGERED AUTO-MAINTENANCE (r14, verdict #5): a 100 TB
  * pipeline cannot depend on an operator remembering to run
  * `--compact` — the debt ceilings the engine already enforces at READ
  * time (merge-on-read tombstone bytes, sequence-class plan width,
  * small-file counts) must TRIGGER the maintenance that retires them.
  * This is the Delta auto-compaction / Iceberg commit-hook shape: an
  * opt-in post-commit check that measures the head manifest's debt
  * (metadata-only — one cached resolution, zero data IO) and, past a
  * ceiling, runs ONE [[Compaction.compact]] pass scoped by compaction's
  * own planner (only offending dirs rewrite; a tripped DV/class
  * ceiling widens to the full fold exactly as the manual path would).
  *
  * The triggering commit records nothing; the MAINTENANCE commit
  * stamps a `#note=` header ([[Snapshot.Manifest.note]]) naming the
  * ceiling that fired, the measured debt and the action — so
  * `--history` shows an auditable trail of every automatic decision.
  *
  * Re-entry safety: maintenance itself commits, which in a naive hook
  * would re-trigger maintenance — the per-table in-flight guard makes
  * the hook a no-op while a pass is already running (also across
  * threads: concurrent writers race to ONE pass, the losers skip).
  * Failures are swallowed into the returned Option by default
  * (maintenance must never fail the write that triggered it) unless
  * `rethrow` is set.
  */
object Maintenance {

  /** Ceilings + compaction knobs. Defaults sit BELOW the read path's
    * hard ceilings (the plan-width fold at [[Compaction]]'s
    * MaxSeqClasses = 8; the default foldDeletesAbove = 0.2) so
    * maintenance retires debt before reads feel it.
    *
    *   - `maxSeqClasses`: sequence classes in the head manifest — each
    *     is a union branch with its own tombstone application in every
    *     read plan; append-shaped upserts add one per commit.
    *   - `maxDvBytesFrac`: tombstone bytes / data bytes — the
    *     merge-on-read anti-join cost every read pays.
    *   - `maxSmallFiles`: data members under `smallFileBytes` — scan
    *     task count and footer-pruning degradation.
    */
  final case class Policy(maxSeqClasses: Int = 4,
                          maxDvBytesFrac: Double = 0.1,
                          maxSmallFiles: Int = 64,
                          smallFileBytes: Long = 32L << 20,
                          indexBy: Seq[String] = Nil,
                          targetFileBytes: Long = 128L << 20,
                          keepVersions: Int = 2)

  /** Head-manifest debt, measured from metadata alone. */
  final case class Debt(seqClasses: Int, dvFrac: Double, smallFiles: Int,
                        dataFiles: Int)

  def debt(spark: SparkSession, path: String,
           smallFileBytes: Long = 32L << 20): Option[Debt] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!Snapshot.isSnapshotLayout(fs, root)) return None
    val (_, vdir) = Snapshot.resolveVersion(fs, root, None)
    Snapshot.manifestAt(fs, vdir).map { m =>
      val data = m.dataEntries
      Debt(
        seqClasses = Snapshot.seqClasses(m, data).size,
        dvFrac = m.deleteEntries.map(_.bytes).sum.toDouble /
          math.max(1L, data.map(_.bytes).sum),
        smallFiles = data.count(_.bytes < smallFileBytes),
        dataFiles = data.size)
    }
  }

  private val inFlight =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** The post-commit hook: measure → compare → compact-if-over →
    * record. Returns the compaction stats when a pass ran, None when
    * the debt is under every ceiling (the steady-state cost: one
    * cached manifest resolution). A DV- or class-ceiling trigger runs
    * the FULL fold (foldDeletesAbove = 0) so the debt drops entirely
    * rather than hovering at the threshold; a pure small-file trigger
    * keeps the policy's fold fraction (small-file rewrites retire the
    * fragmentation without forcing a table rewrite).
    */
  def maybeCompact(spark: SparkSession, path: String,
                   policy: Policy = Policy(),
                   rethrow: Boolean = false): Option[Compaction.Stats] = {
    if (!inFlight.add(path)) return None
    try {
      debt(spark, path, policy.smallFileBytes).flatMap { d =>
        val reasons = Seq(
          (d.seqClasses > policy.maxSeqClasses,
            s"seq_classes ${d.seqClasses} > ${policy.maxSeqClasses}"),
          (d.dvFrac >= policy.maxDvBytesFrac && d.dvFrac > 0,
            f"dv_bytes_frac ${d.dvFrac}%.3f >= ${policy.maxDvBytesFrac}%.3f"),
          (d.smallFiles > policy.maxSmallFiles,
            s"small_files ${d.smallFiles} > ${policy.maxSmallFiles}"))
          .collect { case (true, r) => r }
        if (reasons.isEmpty) None
        else {
          val fullFold = d.seqClasses > policy.maxSeqClasses ||
            (d.dvFrac >= policy.maxDvBytesFrac && d.dvFrac > 0)
          val st = Compaction.compact(spark, path, policy.indexBy,
            policy.targetFileBytes, policy.keepVersions,
            foldDeletesAbove = if (fullFold) 0.0 else policy.maxDvBytesFrac,
            note = Some("auto-maintain: " + reasons.mkString("; ") +
              s" -> compact(fullFold=$fullFold)"))
          Some(st)
        }
      }
    } catch {
      case scala.util.control.NonFatal(e) if !rethrow =>
        // a failed maintenance pass must not fail the triggering write;
        // the debt remains and the next commit's hook retries
        org.slf4j.LoggerFactory.getLogger(getClass)
          .warn(s"auto-maintenance of $path failed (debt retained): $e")
        None
    } finally {
      inFlight.remove(path); ()
    }
  }
}
