package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 7 (round 11): the four structural scale claims
  * this round changed, each proven closed-form at the scales where
  * they matter:
  *
  *   1. DV-COMPOSED pruned upsert at 6M rows: after a 50k-key
  *      tombstone commit, an overlapping 10k-key upsert rewrites only
  *      the intersecting files (∝ batch, never ∝ table) — the r10
  *      protocol forced a full materialize + rewrite for the same
  *      composition (timed side by side); counts and the surviving
  *      tombstone set are closed-form.
  *   2. Compaction tombstone FOLD with the debt-ceiling trigger: one
  *      pass folds the surviving tombstones into the data and drops
  *      the DV set, counts preserved.
  *   3. Footer-certified streaming idempotence at 10M groups: the
  *      `(run, batch)` existence check answers from parquet footer
  *      stats — timed against the exact scan it replaces.
  *   4. SemDeDup pair stage at 100k vectors with per-row
  *      pre-normalization (same fixture as ScaleBench6's 16.45 s
  *      r10 phase — the closed-form 2000×50 replica collapse).
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench7'. JSON lands in
  * target/scalebench7.json.
  */
object ScaleBench7 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE7 $name%-32s ${sec}%8.2f s")
    writeReport()
    r
  }

  private def esc(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  private def writeReport(): Unit = {
    val fields = notes.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.toSeq :+
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}"""
    val json = fields.mkString("{", ", ", "}")
    try {
      val p = java.nio.file.Paths.get("target/scalebench7.json")
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
    val out = "/tmp/graft_scale7"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))

    // ── 1) DV-composed pruned upsert at 6M rows ───────────────────────
    val nRows = 6_000_000L
    val table = spark.range(nRows).select($"id".as("doc_id"),
      md5($"id".cast("string")).as("payload"))
    def seed(path: String): Unit = {
      fs.delete(new Path(path), true)
      graft.operators.WriteOps.atomicOverwrite(spark, table, path,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000,
        commitMode = "snapshot", keepVersions = 4)
    }
    val p1 = s"$out/dvc_t.parquet"
    timed("dvc_seed_6m_snapshot") { seed(p1) }
    def readBack(p: String) = graft.sources.Resolver.readParquet(spark, p)
    val spec = graft.spec.TargetSpec(
      graft.spec.DatasetRef("parquet", out, "dvc_t"),
      op = graft.spec.WriteOp.Upsert, pk = Seq("doc_id"),
      indexBy = Seq("doc_id"), commitMode = "snapshot", keepVersions = 4)
    // tombstone a 50k band, then upsert 10k keys HALF inside it
    val kill = spark.range(3_000_000L, 3_050_000L).select($"id".as("doc_id"))
    timed("dvc_tombstone_50k") {
      graft.operators.Snapshot.deleteByKeys(spark, p1, kill, keepVersions = 4)
    }
    val batch = spark.range(3_045_000L, 3_055_000L)
      .select($"id".as("doc_id"), lit("UPD").as("payload"))
    val st = timed("dvc_composed_upsert_10k") {
      graft.operators.PrunedMerge.merge(spark, readBack(p1), batch, spec, p1)
    }.getOrElse(sys.error("DV-composed pruned path did not engage"))
    require(st.filesRewritten > 0 && st.filesRewritten < st.filesTotal,
      s"strict subset expected, got $st")
    val frac = st.bytesRewritten.toDouble / math.max(1L, st.bytesTotal)
    require(frac < 0.05,
      s"rewritten bytes must track the batch, got ${frac * 100}%")
    // closed form: 6M − 50k tombstoned + 5k re-asserted = 5,955,000;
    // every batch key present with the new payload
    val n1 = readBack(p1).count()
    require(n1 == nRows - 50_000L + 5_000L, s"got $n1")
    require(readBack(p1).filter($"payload" === "UPD").count() == 10_000L)
    // surviving tombstones = 50k − 5k re-asserted
    val (_, vdir) = graft.operators.Snapshot.resolveVersion(fs, new Path(p1), None)
    val mf = graft.operators.Snapshot.manifestAt(fs, vdir).get
    val survivors = spark.read.parquet(mf.deleteEntries.map(e =>
      new Path(graft.operators.Snapshot.dataDir(new Path(p1)), e.rel).toString): _*)
      .count()
    require(survivors == 45_000L, s"survivors $survivors")
    // the honest r10 comparison: the same composition via
    // materialize-then-merge on a clone
    val p2 = s"$out/dvm_t.parquet"
    timed("dvc_clone_seed") { seed(p2) }
    graft.operators.Snapshot.deleteByKeys(spark, p2, kill, keepVersions = 4)
    timed("dvc_r10_materialize_then_merge") {
      require(graft.operators.Snapshot.materializeDeletes(spark, p2,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000, keepVersions = 4))
      val spec2 = spec.copy(ref = graft.spec.DatasetRef("parquet", out, "dvm_t"))
      require(graft.operators.PrunedMerge.merge(spark, readBack(p2), batch,
        spec2, p2).isDefined)
    }
    require(readBack(p2).count() == n1, "both routes must agree")
    notes("dv_compose") = f"6M rows, 50k tombstoned, 10k upsert (5k " +
      f"re-asserting deleted keys): composed merge rewrote " +
      f"${st.filesRewritten}/${st.filesTotal} files = ${frac * 100}%.2f%% " +
      "of bytes; survivors exactly 45k; r10's forced " +
      "materialize-then-merge route timed alongside (see times)"

    // ── 2) compaction FOLD with the debt-ceiling trigger ──────────────
    timed("dvc_compaction_full_fold") {
      val cst = graft.operators.Compaction.compact(spark, p1, Seq("doc_id"),
        targetFileBytes = 16L << 20, keepVersions = 4, foldDeletesAbove = 0.0)
      require(cst.dirsCompacted > 0)
    }
    val (_, vdir2) = graft.operators.Snapshot.resolveVersion(fs, new Path(p1), None)
    require(graft.operators.Snapshot.manifestAt(fs, vdir2).get
      .deleteEntries.isEmpty, "full fold must drop the DV set")
    require(readBack(p1).count() == n1, "fold preserves rows")
    notes("compaction_fold") = "debt-ceiling compaction folded 45k " +
      "surviving tombstones into the data in one commit (DV set dropped, " +
      "counts preserved)"

    // ── 2b) DV-aware pruned CDC at 6M rows ────────────────────────────
    // A changelog step across a pure DV commit shares EVERY data file,
    // so the pruned diff reads only tombstone-matched rows (IN-pushed
    // into row-group stats) instead of two full table scans.
    val kill2 = spark.range(1_000_000L, 1_010_000L).select($"id".as("doc_id"))
    val (cdcV, _) = {
      val v = graft.operators.Snapshot.deleteByKeys(spark, p2, kill2,
        keepVersions = 4)
      v
    }
    val prunedCl = timed("cdc_dv_pruned_6m") {
      graft.operators.Snapshot.changelog(spark, p2, cdcV - 1, cdcV,
        Seq("doc_id")).count()
    }
    val fullCl = timed("cdc_dv_full_6m") {
      graft.operators.Snapshot.changelog(spark, p2, cdcV - 1, cdcV,
        Seq("doc_id"), filePruned = false).count()
    }
    require(prunedCl == 10_000L && fullCl == 10_000L,
      s"CDC across the DV commit must be exactly the deletes: $prunedCl/$fullCl")
    require(results("cdc_dv_pruned_6m") < results("cdc_dv_full_6m"),
      "the pruned CDC step must beat the full-read diff")
    notes("cdc_dv") = f"changelog across a 10k-key DV commit on 6M rows: " +
      f"pruned diff ${results("cdc_dv_pruned_6m")}%.2f s (tombstone-matched " +
      f"rows only, all data files shared) vs ${results("cdc_dv_full_6m")}%.2f s " +
      "full-read diff; both exactly 10k delete rows"

    // ── 3) footer-certified idempotence at 10M groups ─────────────────
    val keys = Seq("k")
    val aggs = graft.ext.RollupOps.parse(Seq("count", "sum:v"))
    val statePath = s"$out/roll_state.parquet"
    fs.delete(new Path(statePath), true)
    val nGroups = 10_000_000L
    val facts = spark.range(nGroups).select($"id".as("k"), ($"id" % 1000).as("v"))
    timed("idem_seed_10m_groups") {
      graft.operators.WriteOps.atomicOverwrite(spark,
        graft.ext.RollupOps.summarize(facts, keys, aggs)
          .withColumn("__batch_id", lit(0L)).withColumn("__run_id", lit("r0")),
        statePath, indexBy = keys, maxRecordsPerFile = 100_000,
        commitMode = "snapshot")
    }
    // the common case: incoming batch 1 — the footer bound certifies
    // "not applied" with ZERO data rows read
    val fmax = timed("idem_footer_check_10m") {
      graft.ext.RollupOps.footerMaxLong(spark, statePath, "__batch_id")
    }
    require(fmax.contains(0L), s"footer bound must certify, got $fmax")
    // the scan it replaces (what every micro-batch paid in r10)
    timed("idem_exact_scan_10m") {
      val stDf = graft.sources.Resolver.readParquet(spark, statePath)
      require(stDf.filter($"__run_id" === "r0" && $"__batch_id" >= 1L).isEmpty)
    }
    require(results("idem_footer_check_10m") < results("idem_exact_scan_10m"),
      "the footer check must beat the scan it replaces")
    notes("footer_idempotence") = f"10M-group state: footer bound " +
      f"answered the batch-1 idempotence check in " +
      f"${results("idem_footer_check_10m")}%.2f s (metadata only) vs " +
      f"${results("idem_exact_scan_10m")}%.2f s for the exact scan"

    // ── 4) SemDeDup 100k with the pre-normalized pair stage ───────────
    // EXACTLY the ScaleBench6 fixture (2000 × 50 replicas, k=64,
    // tau=0.9) so the r10 16.45 s number is directly comparable.
    val vecs = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .withColumn("k", explode(sequence(lit(0), lit(49))))
      .withColumn("vec_id", $"vec_id" + $"k" * 10_000_000L)
      .select("vec_id", "embedding")
      .repartition(32).persist()
    require(vecs.count() == 100_000)
    val (assigned, _) = timed("semdedup_kmeans_100k_k64") {
      val r = graft.ext.Clustering.kmeansAssign(spark, vecs, k = 64, iters = 2)
      r._1.persist().count()
      r
    }
    val verdict = timed("semdedup_prenorm_dedup_100k") {
      val v = graft.ext.Clustering.semDedup(assigned, tau = 0.9, keep = "far")
        .persist()
      v.count()
      v
    }
    val (nTotal, nKeep, nGrp) = verdict.agg(count(lit(1)),
      sum(when($"keep", 1L).otherwise(0L)), countDistinct($"group"))
      .as[(Long, Long, Long)].head()
    require((nTotal, nKeep, nGrp) == ((100_000L, 2000L, 2000L)),
      s"SemDeDup closed form violated: ($nTotal, $nKeep, $nGrp)")
    verdict.unpersist(); assigned.unpersist(); vecs.unpersist()
    notes("semdedup_prenorm") = "100k vectors, same fixture as " +
      "ScaleBench6 (r10 pair stage 16.45 s): per-row double " +
      "pre-normalization + codegen'd dot — closed form still exact " +
      "(2000 keepers / 2000 groups)"

    writeReport()
    println("SCALE7 done: " + results.map { case (k, v) => s"$k=$v" }.mkString(", "))
    spark.stop()
  }
}
