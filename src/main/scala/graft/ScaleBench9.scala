package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Scale-stress phase 9 (round 12): append-shaped upsert at 6M rows —
  * the merge-on-read write route ([[graft.operators.Snapshot.upsertAppend]],
  * the Hudi deltacommit analog). The workload is the one the rewriting
  * pruned merge is WORST at: a batch whose keys scatter uniformly
  * across the whole key space, so every data file's envelope intersects
  * the batch and file pruning buys nothing. Three closed-form claims:
  *
  *   1. COMMIT cost: the append route writes O(batch) bytes (one batch
  *      file + one batch-key tombstone) and touches ZERO existing data
  *      files — proven by manifest membership, side-by-side with the
  *      rewriting pruned merge on a clone, which the scattered batch
  *      forces to rewrite ~100% of the table's bytes for the SAME
  *      logical result.
  *   2. EQUIVALENCE: after three scattered batches land through each
  *      route, both tables serve the identical logical content
  *      (order-insensitive xxhash64 checksum + spot rows).
  *   3. DEBT RETIREMENT is per-tombstone: a default-ceiling compaction
  *      rewrites the seed files (folding their applicable tombstones)
  *      but KEEPS the three single-file batch commits — the oldest
  *      tombstone (which no kept file is subject to, seq rule) must
  *      drop from the manifest while the newer two correctly survive;
  *      a ceiling-0 compaction then retires the rest. Reads stay
  *      correct and count-stable throughout.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench9'. JSON lands in
  * target/scalebench9.json.
  */
object ScaleBench9 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE9 $name%-32s ${sec}%8.2f s")
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
      val p = java.nio.file.Paths.get("target/scalebench9.json")
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
    val out = "/tmp/graft_scale9"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))

    val nRows = 6_000_000L
    val nBatch = 10_000L
    val stride = nRows / nBatch // 600: one key inside every file's band
    val table = spark.range(nRows).select($"id".as("doc_id"),
      md5($"id".cast("string")).as("payload"))
    // batch k: keys {600*i + k}, i < 10k — uniformly scattered, and the
    // three batches are pairwise disjoint (offsets 0,1,2)
    def batch(k: Int) = spark.range(nBatch)
      .select(($"id" * stride + k).as("doc_id"), lit(s"U$k").as("payload"))
    def seed(path: String): Unit = {
      fs.delete(new Path(path), true)
      graft.operators.WriteOps.atomicOverwrite(spark, table, path,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000,
        commitMode = "snapshot", keepVersions = 8)
    }
    def readBack(p: String) = graft.sources.Resolver.readParquet(spark, p)
    def manifest(p: String) = graft.operators.Snapshot.manifestAt(fs,
      graft.operators.Snapshot.resolveVersion(fs, new Path(p), None)._2).get
    def checksum(p: String): java.math.BigDecimal = readBack(p)
      .select(xxhash64($"doc_id", $"payload").cast("decimal(38,0)").as("h"))
      .agg(sum($"h")).as[java.math.BigDecimal].first()

    // ── 1) commit cost: append route vs scatter-forced full rewrite ──
    val pA = s"$out/append_t.parquet"
    timed("seed_6m_snapshot") { seed(pA) }
    val m0 = manifest(pA)
    val (v1, _) = timed("append_upsert_10k_scattered") {
      graft.operators.Snapshot.upsertAppend(spark, pA, batch(0),
        Seq("doc_id"), indexBy = Seq("doc_id"), keepVersions = 8)
    }
    val m1 = manifest(pA)
    require(m0.entries.forall(m1.entries.contains),
      "append-shaped upsert must not touch any existing member")
    val added = m1.entries.filterNot(m0.entries.contains)
    require(added.count(!_.rel.startsWith("_deletes/")) == 1 &&
      added.count(_.rel.startsWith("_deletes/")) == 1 &&
      added.forall(_.seq == v1),
      s"additions must be one batch file + one tombstone, got $added")
    val addedBytes = added.map(_.bytes).sum
    val pM = s"$out/merge_t.parquet"
    timed("clone_seed_6m") { seed(pM) }
    // the engine's file-pruned merge DECLINES a fully-scattered batch
    // (every file's key envelope intersects it, so pruning buys
    // nothing) — that decline is itself the claim's premise; the
    // rewriting route must then pay the whole table, exactly what
    // Runner's fallback does
    require(graft.operators.PrunedMerge.merge(spark, readBack(pM), batch(0),
      graft.spec.TargetSpec(graft.spec.DatasetRef("parquet", out, "merge_t"),
        op = graft.spec.WriteOp.Upsert, pk = Seq("doc_id"),
        indexBy = Seq("doc_id"), commitMode = "snapshot",
        keepVersions = 8), pM).isEmpty,
      "a fully-scattered batch must defeat file pruning")
    def fullRewrite(k: Int): Unit = {
      val merged = graft.operators.WriteOps.upsert(
        readBack(pM), batch(k), Seq("doc_id"))
      graft.operators.WriteOps.atomicOverwrite(spark, merged, pM,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000,
        commitMode = "snapshot", keepVersions = 8)
    }
    val tableBytes = m0.dataEntries.map(_.bytes).sum
    val nFiles = m0.dataEntries.size
    timed("full_rewrite_10k_scattered") { fullRewrite(0) }
    notes("commit_claim") =
      f"10k scattered keys into 6M rows: append commits $addedBytes bytes " +
        f"(${100.0 * addedBytes / tableBytes}%.2f%% of table) touching " +
        f"0/$nFiles files in ${results("append_upsert_10k_scattered")}%.2fs; " +
        f"the pruned merge declines (every envelope intersects) and the " +
        f"rewrite route pays all $nFiles files / $tableBytes bytes in " +
        f"${results("full_rewrite_10k_scattered")}%.2fs"

    // ── 2) equivalence across three disjoint scattered batches ───────
    timed("append_batches_1_2") {
      graft.operators.Snapshot.upsertAppend(spark, pA, batch(1),
        Seq("doc_id"), indexBy = Seq("doc_id"), keepVersions = 8)
      graft.operators.Snapshot.upsertAppend(spark, pA, batch(2),
        Seq("doc_id"), indexBy = Seq("doc_id"), keepVersions = 8)
    }
    fullRewrite(1); fullRewrite(2)
    val nDebt = timed("read_count_under_3dv_debt") { readBack(pA).count() }
    require(nDebt == nRows, s"all batches replace in place, got $nDebt")
    require(checksum(pA) == checksum(pM),
      "append route and rewriting merge must serve identical tables")

    // ── 3) per-tombstone debt retirement under compaction ────────────
    // default ceiling: the 60 seed files compact (folding all three
    // applicable tombstones), the three single-file batch commits are
    // KEPT — so the oldest tombstone (no kept file has a lower seq)
    // must drop while the newer two survive for the kept batch files
    val delsBefore = manifest(pA).deleteEntries.map(_.seq).sorted
    require(delsBefore.size == 3, s"expected 3 tombstones, got $delsBefore")
    timed("compact_default_ceiling") {
      graft.operators.Compaction.compact(spark, pA, Seq("doc_id"),
        512L << 20, keepVersions = 8)
    }
    val mC = manifest(pA)
    require(mC.deleteEntries.map(_.seq).sorted == delsBefore.drop(1),
      s"oldest tombstone retires, newer two survive for the kept batch " +
        s"files: before=$delsBefore after=${mC.deleteEntries.map(_.seq).sorted}")
    require(readBack(pA).count() == nRows)
    require(readBack(pA).filter($"doc_id" === stride * 7L)
      .select("payload").as[String].first() == "U0")
    require(readBack(pA).filter($"doc_id" === stride * 7L + 1)
      .select("payload").as[String].first() == "U1")
    // ceiling 0 widens to the full fold: every file rewrites, the
    // remaining debt drops entirely, content unchanged
    timed("compact_ceiling0_full_fold") {
      graft.operators.Compaction.compact(spark, pA, Seq("doc_id"),
        512L << 20, keepVersions = 8, foldDeletesAbove = 0.0)
    }
    require(manifest(pA).deleteEntries.isEmpty,
      "ceiling-0 compaction must retire all tombstones")
    require(readBack(pA).count() == nRows)
    require(checksum(pA) == checksum(pM),
      "full fold must not change the logical table")
    notes("retire_claim") =
      s"default-ceiling compact keeps the 3 batch files and retires only " +
        s"the tombstone no kept file is subject to (seq rule); ceiling-0 " +
        s"retires the rest — reads count-stable and checksum-equal " +
        s"throughout"
    writeReport()
    println("SCALE9 done: " + results.map { case (k, v) => s"$k=$v" }.mkString(", "))
  }
}
