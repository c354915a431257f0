package graft

import graft.operators.{PrunedMerge, WriteOps}
import graft.spec.{DatasetRef, TargetSpec, WriteOp}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 4 (round 9): close the loops round 8 left open
  * and prove the round-9 widenings at the same 6M-document scale.
  * Same deterministic corpus as [[ScaleBench3]] (replica clusters of
  * verbatim copies among 6M docs of 40 md5 tokens); every check is
  * closed-form arithmetic over the planted structure:
  *
  *   1. winnowing at 6M, RE-MEASURED with the fused single-pass
  *      [[graft.functions.TextExprs.WinnowFps]] expression (r8's
  *      327 s measured the exploded plan the final r8 commit
  *      replaced). Exactly the planted pairs must still emerge.
  *   2. BPE encode at 6M, RE-MEASURED with the fused span-merge
  *      [[graft.functions.TextExprs.BpeEncodeTokens]] expression
  *      (r8's 77 s applied a 64-deep replace chain per word). The
  *      planted word must collapse to one token and count exactly.
  *   3. pruned MERGE on a PARTITIONED 6M target: hive partitions +
  *      footer envelopes compose — a clustered 1k upsert may touch
  *      only file(s) inside one partition; every other partition's
  *      files stay byte-identical.
  *   4. pruned MERGE on a TIMESTAMP pk: annotated INT64 micros stats
  *      prune the same way integral pks do.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench4'  (reuses the
  * /tmp/graft_scale corpus when present). JSON lands in
  * target/scalebench4.json.
  */
object ScaleBench4 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE4 $name%-28s ${sec}%8.2f s")
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
      val p = java.nio.file.Paths.get("target/scalebench4.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench4: could not write target/scalebench4.json: $e")
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
      // write standard annotated INT64 micros (not deprecated INT96) so
      // parquet footers carry usable timestamp stats for pruned merges
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nDocs = nBase * replicas
    val nPlantedBase = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 100 < 8).count()
    val cluster = math.min(80L, replicas.toLong)
    val expPairs = nPlantedBase * cluster * (cluster - 1) / 2
    if (scala.util.Try(spark.read.parquet(s"$out/documents.parquet").count())
          .toOption.contains(nDocs))
      println("SCALE4 reusing existing corpus")
    else timed("generate_documents") {
      ScaleBench.generateDocuments(spark, sfDir, out, replicas)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"SCALE4 corpus: $nDocs documents, planted $nPlantedBase×$cluster")
    notes("docs") = nDocs.toString

    // ── 1) winnowing at 6M with the fused WinnowFps expression ────────
    // Same phase as ScaleBench3 §4 (which measured the OLD exploded
    // plan at 327 s); the planted-cluster pair count is the identity
    // witness that the fusion changed nothing.
    val win = timed("winnow_6m_fused") {
      graft.ext.TextDedup.winnowPairs(docs, "doc_id", "text",
        k = 12, w = 12, minShared = 3, maxDf = 200)
        .agg(count(lit(1)).as("pairs"), min("n_shared").as("minsh"))
        .as[(Long, Long)].head()
    }
    require(win._1 == expPairs, s"winnow found ${win._1} pairs, expected $expPairs")
    require(win._2 >= 3, s"min shared fingerprints ${win._2} below the floor")
    notes("winnow_pairs") = win._1.toString
    spark.sharedState.cacheManager.clearCache()

    // fingerprint-index REUSE: persist the (id, fp) stream once, then
    // mine from the columnar table — the winnow analog of the minhash
    // signature-reuse measurement. Same planted-pair identity.
    timed("winnow_index_write_6m") {
      graft.ext.TextDedup.writeFingerprintIndex(docs, "doc_id", "text",
        s"$out/winfps", k = 12, w = 12)
    }
    val winIdx = timed("winnow_mine_from_index") {
      graft.ext.TextDedup.winnowPairsFromIndex(spark, s"$out/winfps",
        minShared = 3, maxDf = 200)
        .agg(count(lit(1)).as("pairs")).as[Long].head()
    }
    require(winIdx == expPairs, s"index-mine found $winIdx pairs, expected $expPairs")
    spark.sharedState.cacheManager.clearCache()

    // ── 2) BPE encode at 6M with the fused span-merge expression ──────
    // Same planted setup as ScaleBench3 §6; train cost is unchanged
    // (the type-table iteration), the encode re-measures the fusion.
    val planted = "zzzzyyyy"
    val suffix = (" " + planted) * 5
    val sample = docs.filter(pmod(col("doc_id"), lit(200L)) === 0)
      .select(concat(col("text"), lit(suffix)).as("text"))
    val merges = timed("bpe_train_64_sample") {
      graft.ext.Bpe.train(sample, "text", numMerges = 64,
        minPairCount = 2L, checkpointEvery = 16)
    }
    require(merges.size == 64, s"trained ${merges.size} merges, expected 64")
    val oneWord = graft.ext.Bpe.encode(
      Seq(planted).toDF("text"), "text", merges).collect()
    require(oneWord.length == 1 && oneWord(0).getString(0) == planted,
      s"planted word must collapse to one token, got ${oneWord.mkString(",")}")
    val plantedCnt = timed("bpe_encode_6m_fused") {
      graft.ext.Bpe.encode(
        docs.select(concat(col("text"), lit(suffix)).as("text")), "text", merges)
        .filter(col("token") === planted)
        .agg(sum("cnt")).as[Long].head()
    }
    require(plantedCnt == 5L * nDocs,
      s"planted token count $plantedCnt, expected ${5L * nDocs}")
    spark.sharedState.cacheManager.clearCache()

    // ── 3) pruned MERGE on a partitioned 6M target ────────────────────
    // 8 hive partitions (replica-group), sorted by doc_id inside each
    // → every file has a tight doc_id envelope AND a partition point
    // envelope. The 1k clustered upsert lives in ONE replica → one
    // partition; only file(s) there may be rewritten.
    val partDocs = docs.withColumn("src",
      (col("doc_id") / 10000000L).cast("long") % 8)
    val ppPath = s"$out/pm_part.parquet"
    val ppSpec = TargetSpec(DatasetRef("parquet", out, "pm_part"),
      op = WriteOp.Upsert, pk = Seq("doc_id"), indexBy = Seq("doc_id"),
      partitionBy = Seq("src"), maxRecordsPerFile = 100000)
    timed("pm_part_sorted_write_6m") {
      WriteOps.atomicOverwrite(spark, partDocs, ppPath,
        partitionBy = Seq("src"), indexBy = Seq("doc_id"),
        maxRecordsPerFile = 100000)
    }
    val loK = 600L * 10000000L
    val batchUp = partDocs
      .filter(col("doc_id") >= loK && col("doc_id") < loK + 1000)
      .withColumn("text", lit("UPDATED"))
    val nBatch = batchUp.count()
    require(nBatch > 0, "empty upsert slice — replica 600 missing?")
    val stUp = timed("pm_part_upsert_1k") {
      PrunedMerge.merge(spark, spark.read.parquet(ppPath), batchUp, ppSpec, ppPath)
    }.getOrElse(sys.error("partitioned pruned upsert did not take the pruned path"))
    require(stUp.rewrittenFrac < 0.05,
      s"clustered 1k upsert rewrote ${stUp.rewrittenFrac * 100}%% of target bytes: $stUp")
    // file count bound is loose: repartitionByRange samples its
    // boundaries, so the slice can straddle a handful of files — the
    // byte fraction above is the real contract
    require(stUp.filesRewritten >= 1 && stUp.filesRewritten <= 16, stUp.toString)
    // every rewritten byte must be inside partition src=4 (600 % 8)
    val afterP = spark.read.parquet(ppPath)
    require(afterP.count() == nDocs, "partitioned pruned upsert changed the row count")
    val updRows = afterP.filter(col("text") === "UPDATED")
    require(updRows.count() == nBatch)
    require(updRows.select("src").distinct().as[Long].collect().toSeq == Seq(600L % 8),
      "updated rows must live in exactly the one touched partition")
    notes("pm_part_upsert") = s"${stUp.filesRewritten}/${stUp.filesTotal} files, " +
      f"${stUp.rewrittenFrac * 100}%.2f%% of bytes"
    spark.sharedState.cacheManager.clearCache()

    // ── 4) pruned MERGE on a timestamp pk at 6M ───────────────────────
    // ts = epoch + doc_id seconds (unique per row); sorted layout →
    // tight micros envelopes in the annotated INT64 footers. The same
    // clustered 1k slice must prune the same way the integral pk did.
    val tsDocs = docs.select(
      timestamp_seconds(col("doc_id")).as("ts"), col("text"))
    val tsPath = s"$out/pm_ts.parquet"
    val tsSpec = TargetSpec(DatasetRef("parquet", out, "pm_ts"),
      op = WriteOp.Upsert, pk = Seq("ts"), indexBy = Seq("ts"),
      maxRecordsPerFile = 100000)
    timed("pm_ts_sorted_write_6m") {
      WriteOps.atomicOverwrite(spark, tsDocs, tsPath,
        indexBy = Seq("ts"), maxRecordsPerFile = 100000)
    }
    val tsBatch = tsDocs
      .filter(col("ts") >= timestamp_seconds(lit(loK)) &&
        col("ts") < timestamp_seconds(lit(loK + 1000)))
      .withColumn("text", lit("TS_UPDATED"))
    val nTsBatch = tsBatch.count()
    require(nTsBatch > 0)
    val stTs = timed("pm_ts_upsert_1k") {
      PrunedMerge.merge(spark, spark.read.parquet(tsPath), tsBatch, tsSpec, tsPath)
    }.getOrElse(sys.error("timestamp pruned upsert did not take the pruned path"))
    require(stTs.rewrittenFrac < 0.05,
      s"timestamp 1k upsert rewrote ${stTs.rewrittenFrac * 100}%% of bytes: $stTs")
    val afterTs = spark.read.parquet(tsPath)
    require(afterTs.count() == nDocs)
    require(afterTs.filter(col("text") === "TS_UPDATED").count() == nTsBatch)
    notes("pm_ts_upsert") = s"${stTs.filesRewritten}/${stTs.filesTotal} files, " +
      f"${stTs.rewrittenFrac * 100}%.2f%% of bytes"

    // ── 5) range-summary pruned MERGE: a 2M-key batch at 6M ───────────
    // 2M distinct keys is far above the 1M exact-collect cap → the
    // per-component [lo, hi] range summaries (≤1024, distributed
    // min/max) drive pruning. The contiguous replica band 100..433
    // covers exactly replicas 100-433 → roughly a third of the sorted
    // files may be touched, and the byte fraction must stay well below
    // a full rewrite.
    // always a FRESH sorted target: a reused, already-merged layout
    // changes the files/bytes fractions and makes runs incomparable
    val pmPath2 = s"$out/pm_target.parquet"
    timed("pm_sorted_write_6m") {
      WriteOps.atomicOverwrite(spark, docs, pmPath2,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100000)
    }
    val bigLo = 100L * 10000000L
    val bigBatch = docs.filter(col("doc_id") >= bigLo &&
        col("doc_id") < bigLo + 334L * 10000000L)
      .withColumn("text", lit("BIG_UPDATED"))
    val nBig = bigBatch.count()
    require(nBig > 1500000L, s"big batch only $nBig rows")
    val pmSpec2 = TargetSpec(DatasetRef("parquet", out, "pm_target"),
      op = WriteOp.Upsert, pk = Seq("doc_id"), indexBy = Seq("doc_id"),
      maxRecordsPerFile = 100000)
    val stBig = timed("pm_big_batch_summary_upsert") {
      PrunedMerge.merge(spark, spark.read.parquet(pmPath2), bigBatch,
        pmSpec2, pmPath2)
    }.getOrElse(sys.error("big-batch summary upsert did not take the pruned path"))
    require(stBig.rewrittenFrac < 0.6,
      s"2M-key band upsert rewrote ${stBig.rewrittenFrac * 100}%% of bytes: $stBig")
    require(stBig.filesRewritten < stBig.filesTotal, stBig.toString)
    val afterBig = spark.read.parquet(pmPath2)
    require(afterBig.count() == nDocs, "summary upsert changed the row count")
    require(afterBig.filter(col("text") === "BIG_UPDATED").count() == nBig)
    notes("pm_big_summary") = s"${stBig.filesRewritten}/${stBig.filesTotal} files, " +
      f"${stBig.rewrittenFrac * 100}%.2f%% of bytes for a ${nBig}-row batch"

    // ── report ────────────────────────────────────────────────────────
    writeReport()
    println("SCALEBENCH4 " + java.nio.file.Files.readString(
      java.nio.file.Paths.get("target/scalebench4.json")))
    spark.stop()
  }
}
