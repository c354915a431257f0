package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale-stress phase 8 (round 12): predicate deletion vectors at 6M
  * rows — the GDPR/retention shape the r11 verdict named as the top
  * gap. The claim has three closed-form parts:
  *
  *   1. COMMIT cost: `deleteByPredicate` writes O(predicate-string)
  *      bytes and touches ZERO data files — side-by-side with the
  *      key-tombstone route, which must first SCAN the table to
  *      materialize the matching pks (600k keys here) and then write
  *      them as a DV file. The predicate commit must be metadata-
  *      speed; the keys route pays a full-table scan + a 600k-row
  *      write for the same logical delete.
  *   2. READ cost: the predicate tombstone folds into the scan as a
  *      pushed filter (no join); the key tombstone anti-joins a
  *      600k-key set. Both reads are timed on the same data.
  *   3. EQUIVALENCE: both routes serve the identical logical table
  *      (closed-form count, spot value checks), and compaction's
  *      debt-ceiling fold drops the predicate once every file
  *      rewrites.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench8'. JSON lands in
  * target/scalebench8.json.
  */
object ScaleBench8 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE8 $name%-32s ${sec}%8.2f s")
    writeReport()
    r
  }

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeReport(): Unit = {
    val fields = notes.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.toSeq :+
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}"""
    val json = fields.mkString("{", ", ", "}")
    try {
      val p = java.nio.file.Paths.get("target/scalebench8.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
      ()
    } catch { case _: Throwable => () }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val out = "/tmp/graft_scale8"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))

    val nRows = 6_000_000L
    val cutoff = 5_400_000L // "retention": delete the newest 10%
    val table = spark.range(nRows).select($"id".as("doc_id"),
      md5($"id".cast("string")).as("payload"))
    def seed(path: String): Unit = {
      fs.delete(new Path(path), true)
      graft.operators.WriteOps.atomicOverwrite(spark, table, path,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000,
        commitMode = "snapshot", keepVersions = 4)
    }
    def dataFiles(p: String): Set[String] = graft.operators.Snapshot
      .listDataFilesRec(fs, graft.operators.Snapshot.dataDir(new Path(p)))
      .map(_._1.toString).toSet
    def readBack(p: String) = graft.sources.Resolver.readParquet(spark, p)

    // ── 1) commit cost: predicate route vs scan-materialize-keys route
    val pPred = s"$out/pred_t.parquet"
    timed("seed_6m_snapshot") { seed(pPred) }
    val before = dataFiles(pPred)
    timed("pred_dv_commit") {
      graft.operators.Snapshot.deleteByPredicate(spark, pPred,
        s"doc_id >= $cutoff", keepVersions = 4)
    }
    require(dataFiles(pPred) == before,
      "predicate delete must touch zero data files")
    val pKeys = s"$out/keys_t.parquet"
    timed("clone_seed_6m") { seed(pKeys) }
    timed("keys_route_scan_and_commit") {
      // what the caller had to do before r12: scan the table to
      // materialize the matching pks, then commit them as tombstones
      val keys = readBack(pKeys).filter($"doc_id" >= cutoff).select("doc_id")
      graft.operators.Snapshot.deleteByKeys(spark, pKeys, keys, keepVersions = 4)
    }
    notes("commit_claim") =
      s"pred_dv_commit=${results("pred_dv_commit")}s writes one predicate " +
        s"string; keys_route=${results("keys_route_scan_and_commit")}s scans " +
        s"6M rows and writes ${nRows - cutoff} key tombstones"

    // ── 2) read cost: pushed filter vs 600k-key anti-join ────────────
    val nPred = timed("pred_read_count_6m") { readBack(pPred).count() }
    val nKeys = timed("keys_read_count_6m") { readBack(pKeys).count() }
    require(nPred == cutoff && nKeys == cutoff,
      s"both routes must serve $cutoff rows, got pred=$nPred keys=$nKeys")
    // spot equivalence beyond counts: boundary rows
    require(readBack(pPred).filter($"doc_id".isin(cutoff - 1, cutoff))
      .count() == 1L)
    require(readBack(pKeys).filter($"doc_id".isin(cutoff - 1, cutoff))
      .count() == 1L)
    val planPred = readBack(pPred).queryExecution.executedPlan.toString
    require(!planPred.contains("Join"),
      s"predicate DV read must be join-free:\n$planPred")

    // ── 2b) pruned CDC across the predicate delete ───────────────────
    // every data file is SHARED between v1 and v2, so the pruned diff
    // reads only rows matching the symmetric-difference predicate
    // (600k) instead of 2×6M full sides
    val nPrunedCl = timed("cdc_pred_pruned_6m") {
      graft.operators.Snapshot.changelog(spark, pPred, 1L, 2L,
        Seq("doc_id")).count()
    }
    val nFullCl = timed("cdc_pred_full_6m") {
      graft.operators.Snapshot.changelog(spark, pPred, 1L, 2L,
        Seq("doc_id"), filePruned = false).count()
    }
    require(nPrunedCl == nRows - cutoff && nFullCl == nPrunedCl,
      s"both CDC routes must emit ${nRows - cutoff} deletes, got " +
        s"pruned=$nPrunedCl full=$nFullCl")

    // ── 2c) pruned merge THROUGH the live predicate (r12-late): a
    // banded 10k upsert composes — strict file subset, predicate
    // retained, correct rows — instead of declining to a 6M rewrite
    val stPm = timed("pred_composed_merge_10k") {
      graft.operators.PrunedMerge.merge(spark, readBack(pPred),
        spark.range(1_000_000L, 1_010_000L)
          .select($"id".as("doc_id"), lit("M").as("payload")),
        graft.spec.TargetSpec(graft.spec.DatasetRef("parquet", out, "pred_t"),
          op = graft.spec.WriteOp.Upsert, pk = Seq("doc_id"),
          indexBy = Seq("doc_id"), commitMode = "snapshot",
          keepVersions = 4), pPred)
        .getOrElse(sys.error("merge must compose through the predicate"))
    }
    require(stPm.filesRewritten > 0 &&
      stPm.filesRewritten <= stPm.filesTotal / 10,
      s"composed merge must rewrite a small subset, got $stPm")
    val mPm = graft.operators.Snapshot.manifestAt(fs,
      graft.operators.Snapshot.resolveVersion(fs, new Path(pPred), None)._2).get
    require(mPm.deleteEntries.nonEmpty, "predicate survives the merge")
    require(readBack(pPred).count() == cutoff,
      "merged rows replace in place; predicate keeps applying elsewhere")
    require(readBack(pPred).filter($"doc_id" === 1_000_005L)
      .select("payload").as[String].first() == "M")
    notes("merge_claim") =
      f"10k banded upsert THROUGH the live retention predicate: " +
        f"${stPm.filesRewritten}/${stPm.filesTotal} files = " +
        f"${100 * stPm.rewrittenFrac}%.1f%% of bytes in " +
        f"${results("pred_composed_merge_10k")}%.2fs (pre-r12-late: " +
        "declined to a full 6M-row materializing rewrite)"

    // ── 3) compaction debt ceiling folds + drops the predicate ───────
    timed("pred_fold_compact") {
      graft.operators.Compaction.compact(spark, pPred, Seq("doc_id"),
        256L << 20, keepVersions = 4, foldDeletesAbove = 0.0)
    }
    val m = graft.operators.Snapshot.manifestAt(fs,
      graft.operators.Snapshot.resolveVersion(fs, new Path(pPred), None)._2).get
    require(m.deleteEntries.isEmpty, "ceiling fold must drop the predicate")
    require(readBack(pPred).count() == cutoff)
    notes("read_claim") =
      s"pred read ${results("pred_read_count_6m")}s (pushed filter, no join) " +
        s"vs keys read ${results("keys_read_count_6m")}s (600k-key anti-join)"

    // ── 4) manifest-stats merge planning vs the footer sweep ─────────
    // 6M rows in 3000 files: the r12 manifest-recorded key envelopes
    // let the merge plan from metadata the manifest read already paid
    // for; the stripped twin (a legacy-format manifest) forces the
    // distributed footer sweep. Per path: one warm-up merge, one timed
    // merge — footer path FIRST so any residual warm-up bias works
    // AGAINST the claim. Pruning decisions must be identical.
    def seedEnv(path: String): Unit = {
      fs.delete(new Path(path), true)
      graft.operators.WriteOps.atomicOverwrite(spark, table, path,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 2_000,
        commitMode = "snapshot", keepVersions = 6)
    }
    def stripEnvs(path: String): Unit = {
      val r = new Path(path)
      val (v, vdir) = graft.operators.Snapshot.resolveVersion(fs, r, None)
      val m = graft.operators.Snapshot.manifestAt(fs, vdir).get
      val sdir = new Path(r, f"_v_${v + 1}%020d")
      graft.operators.Snapshot.writeManifest(fs, sdir,
        m.copy(entries = m.entries.map(_.copy(envs = None))))
      fs.create(new Path(sdir, graft.operators.Versioned.Marker), false).close()
    }
    def mergeBand(path: String, name: String, lo: Long): graft.operators.PrunedMerge.Stats =
      graft.operators.PrunedMerge.merge(spark, readBack(path),
        spark.range(lo, lo + 10_000L)
          .select($"id".as("doc_id"), lit("E").as("payload")),
        graft.spec.TargetSpec(graft.spec.DatasetRef("parquet", out, name),
          op = graft.spec.WriteOp.Upsert, pk = Seq("doc_id"),
          indexBy = Seq("doc_id"), commitMode = "snapshot",
          keepVersions = 6), path)
        .getOrElse(sys.error(s"pruned merge did not engage at $path"))
    // FOOTER path: strip after seed AND after the warm-up merge (the
    // merge re-records envelopes on its new files)
    val pFoot = s"$out/envf_t.parquet"
    timed("envplan_seed_3000files") { seedEnv(pFoot) }
    stripEnvs(pFoot)
    mergeBand(pFoot, "envf_t", 1_000_000L) // warm-up
    stripEnvs(pFoot)
    val stFoot = timed("merge_footer_sweep_plan") {
      mergeBand(pFoot, "envf_t", 2_000_000L)
    }
    // MANIFEST-STATS path
    val pEnv = s"$out/env_t.parquet"
    seedEnv(pEnv)
    val em = graft.operators.Snapshot.manifestAt(fs,
      graft.operators.Snapshot.resolveVersion(fs, new Path(pEnv), None)._2).get
    require(em.dataEntries.size >= 2000 &&
      em.dataEntries.forall(_.envs.exists(_.contains("doc_id"))),
      s"seed must record envelopes on ~3000 files, got ${em.dataEntries.size}")
    mergeBand(pEnv, "env_t", 1_000_000L) // warm-up
    val stEnv = timed("merge_manifest_stats_plan") {
      mergeBand(pEnv, "env_t", 2_000_000L)
    }
    // file totals differ by a handful (each table's own warm-up merge
    // re-laid its touched band independently); the CLAIM is equal
    // pruning POWER — same rewritten-file count, both under 1%
    require(stEnv.filesRewritten == stFoot.filesRewritten &&
      stEnv.filesRewritten > 0 &&
      stEnv.filesRewritten < stEnv.filesTotal / 100 &&
      math.abs(stEnv.filesTotal - stFoot.filesTotal) <= 16,
      s"identical strict-subset pruning expected: env=$stEnv foot=$stFoot")
    notes("plan_claim") =
      s"merge over ${stEnv.filesTotal} files (identical pruning " +
        s"${stEnv.filesRewritten}/${stEnv.filesTotal}): manifest-stats plan " +
        s"${results("merge_manifest_stats_plan")}s vs footer sweep " +
        s"${results("merge_footer_sweep_plan")}s — the structural claim is " +
        "0 vs 3000 footer reads per merge (S3: 0 vs 3000 GETs)"
    writeReport()
    println("SCALE8 done: " + results.map { case (k, v) => s"$k=$v" }.mkString(", "))
  }
}
