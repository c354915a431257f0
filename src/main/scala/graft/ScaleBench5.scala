package graft

import graft.operators.{Compaction, PrunedMerge, Snapshot, WriteOps}
import graft.spec.{DatasetRef, TargetSpec, WriteOp}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 5 (round 9, second half): the snapshot commit
  * protocol and incremental rollup maintenance at the same 6M-row
  * scale as [[ScaleBench3]]/[[ScaleBench4]], every check closed-form:
  *
  *   1. snapshot full write of 6M docs, then a 1k clustered upsert
  *      through the MANIFEST-COMMIT pruned merge: byte-proportional
  *      write (< 5% of target bytes), file sharing across versions
  *      (pool grows by the new files only), and TIME TRAVEL — v1
  *      still reads the pre-merge rows while v2 reads the merge.
  *   2. CDC changelog between the two 6M-row versions: exactly the
  *      1k changed keys come back, as pre+post image pairs, from one
  *      full-outer join over two manifests that share all but the
  *      rewritten files.
  *   3. snapshot compaction: disjoint-key pruned inserts fragment the
  *      manifest; one atomic commit re-compacts, rows preserved, the
  *      pre-compaction version still readable.
  *   4. incremental rollup maintenance over 6 batches of ~1M rows vs
  *      the direct GROUP BY: identical finished rollups (100k
  *      groups), with the per-batch maintenance cost measured
  *      against the full re-aggregate it replaces.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench5'  (reuses the
  * /tmp/graft_scale corpus when present). JSON lands in
  * target/scalebench5.json.
  */
object ScaleBench5 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE5 $name%-28s ${sec}%8.2f s")
    writeReport() // incremental: a late-phase failure still leaves evidence
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
    val json = "{" +
      notes.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString(", ") + ", " +
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}}"""
    try {
      val p = java.nio.file.Paths.get("target/scalebench5.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench5: could not write target/scalebench5.json: $e")
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.get("GRAFT_SCALE_REPLICAS").map(_.toInt).getOrElse(1200)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nDocs = nBase * replicas
    if (scala.util.Try(spark.read.parquet(s"$out/documents.parquet").count())
          .toOption.contains(nDocs))
      println("SCALE5 reusing existing corpus")
    else timed("generate_documents") {
      ScaleBench.generateDocuments(spark, sfDir, out, replicas)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"SCALE5 corpus: $nDocs documents")
    notes("docs") = nDocs.toString
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)

    // ── 1) snapshot write + manifest-commit pruned upsert ─────────────
    val snapPath = s"$out/snap_t.parquet"
    fs.delete(new Path(snapPath), true)
    val snapSpec = TargetSpec(DatasetRef("parquet", out, "snap_t"),
      op = WriteOp.Upsert, pk = Seq("doc_id"), indexBy = Seq("doc_id"),
      commitMode = "snapshot", maxRecordsPerFile = 100000, keepVersions = 8)
    timed("snap_write_6m") {
      WriteOps.atomicOverwrite(spark, docs, snapPath, indexBy = Seq("doc_id"),
        maxRecordsPerFile = 100000, commitMode = "snapshot")
    }
    def manifest(v: Long) = {
      val (_, vd) = Snapshot.resolveVersion(fs, new Path(snapPath), Some(v))
      Snapshot.manifestAt(fs, vd).get
    }
    val m1 = manifest(1)
    val loK = 600L * 10000000L
    val batchUp = docs
      .filter(col("doc_id") >= loK && col("doc_id") < loK + 1000)
      .withColumn("text", lit("UPDATED"))
    val nBatch = batchUp.count()
    require(nBatch > 0, "empty upsert slice — replica 600 missing?")
    val stUp = timed("snap_pm_upsert_1k") {
      PrunedMerge.merge(spark, graft.sources.Resolver.readParquet(spark, snapPath),
        batchUp, snapSpec, snapPath)
    }.getOrElse(sys.error("snapshot upsert did not take the pruned path"))
    require(stUp.rewrittenFrac < 0.05,
      s"1k upsert rewrote ${stUp.rewrittenFrac * 100}%% of 6M-target bytes: $stUp")
    val m2 = manifest(2)
    val shared = m1.entries.map(_.rel).toSet
      .intersect(m2.entries.map(_.rel).toSet)
    require(shared.size == stUp.filesTotal - stUp.filesRewritten,
      s"expected ${stUp.filesTotal - stUp.filesRewritten} shared files, " +
        s"got ${shared.size}")
    // the pool holds BOTH versions for the cost of the rewritten
    // fraction only — history priced per change, not per snapshot
    val poolBytes = Snapshot.listDataFilesRec(
      fs, Snapshot.dataDir(new Path(snapPath))).map(_._2).sum
    require(poolBytes < (m1.bytes * (1.0 + 2 * stUp.rewrittenFrac) + (64L << 20)),
      s"pool bytes $poolBytes vs v1 ${m1.bytes} — sharing broken?")
    notes("snap_pm_upsert") = s"${stUp.filesRewritten}/${stUp.filesTotal} files, " +
      f"${stUp.rewrittenFrac * 100}%.2f%% of bytes; pool/v1 = " +
      f"${poolBytes.toDouble / m1.bytes}%.4f"
    spark.sharedState.cacheManager.clearCache()

    // time travel at 6M: v1 must read the PRE-merge rows, v2 the merge
    timed("snap_time_travel_reads") {
      val v1 = Snapshot.readAt(spark, snapPath, Some(1))
      val v2 = Snapshot.readAt(spark, snapPath, Some(2))
      require(v1.count() == nDocs && v2.count() == nDocs)
      val slice = col("doc_id") >= loK && col("doc_id") < loK + 1000
      require(v1.filter(slice && (col("text") === "UPDATED")).count() == 0,
        "v1 must not see the upsert")
      require(v2.filter(slice && (col("text") === "UPDATED")).count() == nBatch,
        "v2 must see the full upsert")
    }
    spark.sharedState.cacheManager.clearCache()

    // ── 2) CDC changelog between the two 6M-row versions ──────────────
    val cdc = timed("snap_changelog_6m") {
      Snapshot.changelog(spark, snapPath, 1, 2, Seq("doc_id"), filePruned = false)
        .groupBy("_change_type").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
    }
    require(cdc == Map("update_preimage" -> nBatch, "update_postimage" -> nBatch),
      s"changelog classes: $cdc, expected $nBatch pre + $nBatch post")
    // file-level pruning: shared files cannot produce change rows, so
    // the diff of two ADJACENT incremental commits reads only the
    // rewritten fraction — identical output, measured against the
    // full-scan diff above (which set filePruned=false)
    val cdcPruned = timed("snap_changelog_pruned") {
      Snapshot.changelog(spark, snapPath, 1, 2, Seq("doc_id"))
        .groupBy("_change_type").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
    }
    require(cdcPruned == cdc, s"pruned changelog diverged: $cdcPruned vs $cdc")
    notes("changelog") = s"$nBatch update pairs out of $nDocs rows; " +
      "file-pruned ≡ full-scan"
    spark.sharedState.cacheManager.clearCache()

    // ── 3) snapshot compaction after fragmenting inserts ──────────────
    val insSpec = snapSpec.copy(op = WriteOp.Insert)
    for (i <- 1L to 3L) {
      // offset past every replica band (max replica < 2000) so the
      // insert keys are provably disjoint from the 6M existing ids
      val b = docs.filter(col("doc_id") < 3000)
        .withColumn("doc_id", col("doc_id") + (2000L + i) * 10000000L)
      val st = PrunedMerge.merge(spark,
        graft.sources.Resolver.readParquet(spark, snapPath), b, insSpec, snapPath)
      require(st.exists(_.filesRewritten == 0),
        s"disjoint-key insert $i should append only, got $st")
    }
    val preCompactV = Snapshot.committed(fs, new Path(snapPath)).last._1
    val nAfterIns = graft.sources.Resolver.readParquet(spark, snapPath).count()
    val filesBefore = manifest(preCompactV).entries.size
    val stC = timed("snap_compact_6m") {
      Compaction.compact(spark, snapPath, Seq("doc_id"),
        targetFileBytes = 8L << 20, keepVersions = 8)
    }
    require(stC.dirsCompacted == 1 && stC.filesCompacted >= 3,
      s"compaction should fold the growth files: $stC")
    val mAfter = manifest(preCompactV + 1)
    require(mAfter.entries.size < filesBefore,
      s"manifest should shrink: ${mAfter.entries.size} vs $filesBefore")
    require(graft.sources.Resolver.readParquet(spark, snapPath).count() == nAfterIns,
      "compaction changed the row count")
    require(Snapshot.readAt(spark, snapPath, Some(preCompactV)).count() == nAfterIns,
      "pre-compaction version must stay readable (retention 8)")
    notes("compaction") = s"${stC.filesCompacted} files (${stC.bytesCompacted} B) " +
      s"→ ${stC.filesCreated}; manifest $filesBefore → ${mAfter.entries.size}"
    spark.sharedState.cacheManager.clearCache()

    // ── 4) incremental rollup maintenance at 6M ───────────────────────
    import graft.ext.RollupOps
    // hash-derived group key: doc_id mod anything collapses to the
    // 5000 base ids (replica offsets are multiples of 10^7); xxhash64
    // spreads 6M ids over all 100k groups (P[any empty] ≈ 1e-21)
    val facts = docs.select(col("doc_id"),
      pmod(xxhash64(col("doc_id")), lit(100000L)).as("grp"),
      (length(col("text"))).cast("long").as("len"))
    val keys = Seq("grp")
    val aggs = RollupOps.parse(Seq("count", "sum:len", "min:doc_id", "max:doc_id"))
    val direct = timed("rollup_direct_6m") {
      val d = RollupOps.finish(RollupOps.summarize(facts, keys, aggs), keys, aggs)
      d.agg(count(lit(1)), sum("n"), sum("sum_len"))
        .as[(Long, Long, Long)].head()
    }
    require(direct._1 == 100000L && direct._2 == nDocs,
      s"direct rollup shape: $direct")
    // 6 batches of ~1M maintained one at a time; the per-batch cost is
    // the number the incremental pattern buys (vs rollup_direct_6m per
    // batch = the re-aggregate it replaces)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    timed("rollup_maintain_6x1m") {
      for (i <- 0 until 6) {
        val b = facts.filter(pmod(col("doc_id"), lit(6L)) === i)
        state = Some(RollupOps.maintain(state, b, keys, aggs)
          .localCheckpoint(true)) // materialize: each batch pays ITS cost only
      }
    }
    val inc = RollupOps.finish(state.get, keys, aggs)
      .agg(count(lit(1)), sum("n"), sum("sum_len"), min("min_doc_id"),
        max("max_doc_id"))
      .as[(Long, Long, Long, Long, Long)].head()
    val directFull = RollupOps.finish(RollupOps.summarize(facts, keys, aggs), keys, aggs)
      .agg(count(lit(1)), sum("n"), sum("sum_len"), min("min_doc_id"),
        max("max_doc_id"))
      .as[(Long, Long, Long, Long, Long)].head()
    require(inc == directFull,
      s"incremental rollup diverged: $inc vs $directFull")
    notes("rollup") = s"100000 groups over $nDocs rows; 6-batch maintenance " +
      "== direct re-aggregate"

    // ── 4b) STREAMING rollup maintenance at 6M ────────────────────────
    // The same facts arrive as a file stream in 4 micro-batches; each
    // folds into the snapshot-committed state (atomic per batch,
    // __batch_id idempotence). The finished state must equal the
    // direct aggregate — the streaming twin of phase 4 at full scale.
    val factsPath = s"$out/roll_facts.parquet"
    if (!scala.util.Try(spark.read.parquet(factsPath).count())
          .toOption.contains(nDocs))
      facts.repartition(64).write.mode("overwrite").parquet(factsPath)
    val statePath = s"$out/roll_state.parquet"
    val ckpPath = s"$out/roll_ckp"
    fs.delete(new org.apache.hadoop.fs.Path(statePath), true)
    fs.delete(new org.apache.hadoop.fs.Path(ckpPath), true)
    timed("rollup_stream_6m_4batches") {
      val schema = spark.read.parquet(factsPath).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 16).parquet(factsPath)
      graft.streaming.StreamRunner.rollupStream(spark, stream, statePath,
        keys, aggs, ckpPath, keepVersions = 2)
    }
    val streamed = RollupOps.finish(
      graft.sources.Resolver.readParquet(spark, statePath).drop("__batch_id"),
      keys, aggs)
      .agg(count(lit(1)), sum("n"), sum("sum_len"), min("min_doc_id"),
        max("max_doc_id"))
      .as[(Long, Long, Long, Long, Long)].head()
    require(streamed == directFull,
      s"streamed rollup diverged: $streamed vs $directFull")
    notes("rollup_stream") = "4 micro-batches → snapshot-committed state " +
      "≡ direct aggregate at 6M"
    spark.sharedState.cacheManager.clearCache()

    // ── 5) distributed PCA at 6M vectors ──────────────────────────────
    // 2000 base embeddings × 3000 replicas, each shifted along the
    // planted direction u = 1/√d · 1 by a deterministic per-row
    // t ∈ [−10, 10) (xxhash64-derived). Var(t) ≈ 33.3 dominates the
    // base per-dim variance, so the FIRST component must recover u —
    // a closed-form identity at 6M rows — and the one-pass Gram fit
    // must be bit-identical on a refit.
    val dEmb = 64
    val uComp = 1.0 / math.sqrt(dEmb)
    val baseEmb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val nVecBase = baseEmb.count()
    val vecsPath = s"$out/pca_vecs.parquet"
    if (!scala.util.Try(spark.read.parquet(vecsPath).count())
          .toOption.contains(nVecBase * 3000))
      timed("pca_gen_6m_vectors") {
        baseEmb
          .crossJoin(spark.range(3000).toDF("r"))
          .withColumn("t",
            (pmod(xxhash64(col("vec_id"), col("r")), lit(1000L)) - 500L)
              .cast("double") / 50.0)
          .select(org.apache.spark.sql.functions.transform(col("embedding"),
            x => (x + col("t") * uComp).cast("float")).as("embedding"))
          .repartition(64).write.mode("overwrite").parquet(vecsPath)
      }
    val vecs = spark.read.parquet(vecsPath)
    val nVecs = nVecBase * 3000
    val mPca = timed("pca_fit_6m") {
      graft.ext.Pca.fit(vecs, "embedding", 4)
    }
    val cosU = math.abs(mPca.components(0).map(_ * uComp).sum)
    require(cosU > 0.99, s"planted direction not recovered at 6M: cos=$cosU")
    val tVar = (1000.0 * 1000.0 - 1) / 12 / (50.0 * 50.0)
    require(math.abs(mPca.variances(0) - tVar) < 0.3 * tVar,
      s"first eigenvalue ${mPca.variances(0)} vs planted Var(t)≈$tVar")
    val mPca2 = timed("pca_refit_6m") {
      graft.ext.Pca.fit(vecs, "embedding", 4)
    }
    require(mPca2.components(0).sameElements(mPca.components(0)) &&
      mPca2.variances.sameElements(mPca.variances),
      "6M-row PCA refit must be bit-identical (partition-ordered sums)")
    notes("pca") = f"$nVecs vectors: first component recovers the planted " +
      f"direction (cos=$cosU%.4f), eigenvalue ${mPca.variances(0)}%.2f ≈ " +
      f"Var(t)=$tVar%.2f, refit bit-identical"

    println(s"SCALE5 done: ${results.size} phases, all closed-form checks passed")
    spark.stop()
  }
}
