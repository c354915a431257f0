package graft

import graft.operators.{PrunedMerge, WriteOps}
import graft.spec.{DatasetRef, TargetSpec, WriteOp}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 3 (round 8): the surfaces still unproven at the
  * 6M-document scale of [[ScaleBench]]/[[ScaleBench2]], plus the
  * write-path and MinHash cost profiles the r7 verdict asked for.
  * Same deterministic corpus (400 planted clusters of 80 verbatim
  * copies among 6M docs of 40 md5 tokens); every check is closed-form
  * arithmetic over the planted structure:
  *
  *   1. pruned MERGE: a sorted-layout 6M-row target; a 1k-row
  *      clustered upsert must rewrite ≪ 5% of the bytes, and a
  *      disjoint-key insert must rewrite ZERO files — with exact
  *      row-count and content checks after each.
  *   2. MinHash profile: signature+banding build timed apart from the
  *      full mine; 16 bands × 8 rows vs 8 bands × 16 rows at the
  *      same k — planted pairs are verbatim (J = 1), so BOTH configs
  *      must return exactly 400·C(80,2) = 1,264,000 pairs; the times
  *      pin which banding the flagship should use.
  *   3. leakage-safe splits end-to-end at 6M: minhash pairs →
  *      components (the distributed star-contraction branch — the
  *      pair set exceeds the 1M driver cutover) → group-keyed split:
  *      no planted cluster may straddle splits, fractions within 1%.
  *   4. winnowing overlap at 6M: the planted clusters must yield
  *      exactly the 1,264,000 pairs, every shared-fingerprint count ≥
  *      the floor, over a df-capped inverted-index join.
  *   5. hybrid RRF at 6M: dense brute cosine over 6M synthetic
  *      embeddings (planted cluster-0 = the query direction) fused
  *      with BM25 over the 6M-doc inverted index — the fused top-k
  *      must be exactly the planted replicas with rrf_score =
  *      2/(60+rank) to the rounding digit.
  *   6. BPE at a realistic vocab: train 64 merges on a deterministic
  *      0.5% sample with a planted dominant word; the planted word
  *      must collapse to ONE token, and the full 6M-doc corpus encode
  *      must count its occurrences exactly.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench3'  (reuses the
  * /tmp/graft_scale corpus and bm25 index when present). JSON lands in
  * target/scalebench3.json.
  */
object ScaleBench3 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE3 $name%-28s ${sec}%8.2f s")
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
      val p = java.nio.file.Paths.get("target/scalebench3.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench3: could not write target/scalebench3.json: $e")
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
      println("SCALE3 reusing existing corpus")
    else timed("generate_documents") {
      ScaleBench.generateDocuments(spark, sfDir, out, replicas)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"SCALE3 corpus: $nDocs documents, planted $nPlantedBase×$cluster")
    notes("docs") = nDocs.toString

    // ── 1) file-pruned MERGE against a 6M-row sorted-layout target ────
    // ~64 files of ≤100k rows each, tight doc_id envelopes from the
    // indexBy layout. The clustered 1k-row upsert (one replica slice)
    // must touch only the file(s) whose envelope holds that slice.
    val pmPath = s"$out/pm_target.parquet"
    val pmSpec = TargetSpec(DatasetRef("parquet", out, "pm_target"),
      op = WriteOp.Upsert, pk = Seq("doc_id"), indexBy = Seq("doc_id"),
      maxRecordsPerFile = 100000)
    timed("pm_sorted_write_6m") {
      WriteOps.atomicOverwrite(spark, docs, pmPath,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100000)
    }
    val loK = 600L * 10000000L
    val batchUp = docs.filter(col("doc_id") >= loK && col("doc_id") < loK + 1000)
      .withColumn("text", lit("UPDATED"))
    val nBatch = batchUp.count()
    val stUp = timed("pm_upsert_1k") {
      PrunedMerge.merge(spark, spark.read.parquet(pmPath), batchUp, pmSpec, pmPath)
    }.getOrElse(sys.error("pruned upsert did not take the pruned path"))
    require(stUp.rewrittenFrac < 0.05,
      s"clustered 1k upsert rewrote ${stUp.rewrittenFrac * 100}%% of target bytes: $stUp")
    require(stUp.filesRewritten >= 1 && stUp.filesRewritten <= 3, stUp.toString)
    val after = spark.read.parquet(pmPath)
    require(after.count() == nDocs, "pruned upsert changed the row count")
    val nUpd = after.filter(col("text") === "UPDATED").count()
    require(nUpd == nBatch, s"expected $nBatch updated rows, got $nUpd")
    notes("pm_upsert") = s"${stUp.filesRewritten}/${stUp.filesTotal} files, " +
      f"${stUp.rewrittenFrac * 100}%.2f%% of bytes"
    val batchIns = docs.filter(col("doc_id") < 1000)
      .withColumn("doc_id", col("doc_id") + 100000000000L)
    val stIns = timed("pm_insert_disjoint_1k") {
      PrunedMerge.merge(spark, spark.read.parquet(pmPath), batchIns, pmSpec, pmPath)
    }.getOrElse(sys.error("pruned insert did not take the pruned path"))
    require(stIns.filesRewritten == 0,
      s"disjoint insert must rewrite zero files: $stIns")
    require(spark.read.parquet(pmPath).count() == nDocs + 1000)
    notes("pm_insert") = s"0/${stIns.filesTotal} files rewritten, 1000 appended"

    // ── 2) MinHash banding profile at 6M ──────────────────────────────
    // Signature+banding build cost in isolation (the reusable index
    // shape), then the full mine under both bandings. Planted pairs
    // are verbatim copies — identical signatures collide in EVERY
    // band, so recall is 1.0 by construction in both configs and the
    // pair counts must match exactly; the times decide the optimum.
    timed("minhash_sig_index_6m") {
      graft.ext.TextDedup.writeSignatureIndex(docs, "doc_id", "text",
        s"$out/sig3", n = 3)
    }
    // signature REUSE: mine from the persisted index — skips the
    // corpus-pass signature build every downstream minhash consumer
    // would otherwise repeat
    val pairsIdx = timed("minhash_mine_from_index") {
      graft.ext.TextDedup.minhashPairsFromIndex(spark, s"$out/sig3", 0.8)
    }
    val nIdx = pairsIdx.count()
    require(nIdx == expPairs, s"index-mine found $nIdx pairs, expected $expPairs")
    spark.sharedState.cacheManager.clearCache()
    val pairs16 = timed("minhash_mine_16x8") {
      graft.ext.TextDedup.minhashPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, k = 128, bands = 16)
    }
    val n16 = pairs16.count()
    require(n16 == expPairs, s"16x8 mined $n16 pairs, expected $expPairs")
    spark.sharedState.cacheManager.clearCache()
    val pairs8 = timed("minhash_mine_8x16") {
      graft.ext.TextDedup.minhashPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.8, k = 128, bands = 8)
    }
    val n8 = pairs8.count()
    require(n8 == expPairs, s"8x16 mined $n8 pairs, expected $expPairs")
    spark.sharedState.cacheManager.clearCache()
    notes("minhash_pairs") = n16.toString

    // ── 3) leakage-safe splits end-to-end at 6M ───────────────────────
    // pairs (1.264M > the 1M driver cutover → distributed star
    // contraction) → components → group-keyed hash split. Closed form:
    // every planted cluster lands whole in ONE split; fractions track
    // the weights; the full corpus keeps its row count.
    val split = timed("split_leakfree_6m") {
      val groups = graft.ext.TextDedup.components(pairs16)
      graft.ext.CorpusOps.splitByGroup(docs, "doc_id", groups,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .localCheckpoint(true)
    }
    require(split.count() == nDocs + 0, "split changed the corpus row count")
    val straddlers = split
      .filter(pmod(col("doc_id"), lit(10000000L)) % 100 < 8 &&
        (col("doc_id") / 10000000L).cast("long") < cluster)
      .groupBy(pmod(col("doc_id"), lit(10000000L)).as("base"))
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    require(straddlers == 0, s"$straddlers planted clusters straddle splits")
    val fracs = split.groupBy("split").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    val trainFrac = fracs("train").toDouble / nDocs
    require(math.abs(trainFrac - 0.8) < 0.01, s"train fraction $trainFrac")
    notes("split_fracs") = fracs.map { case (k, v) =>
      f"$k=${v.toDouble / nDocs}%.4f" }.mkString(" ")
    spark.sharedState.cacheManager.clearCache()

    // ── 4) winnowing overlap mining at 6M ─────────────────────────────
    // Verbatim planted copies share their full fingerprint set; the
    // df cap (200 ≫ the 80-copy clusters) keeps every planted family
    // while random-text families have df ≈ 1. Exactly the planted
    // pairs must emerge.
    val win = timed("winnow_6m") {
      graft.ext.TextDedup.winnowPairs(docs, "doc_id", "text",
        k = 12, w = 12, minShared = 3, maxDf = 200)
        .agg(count(lit(1)).as("pairs"), min("n_shared").as("minsh"))
        .as[(Long, Long)].head()
    }
    require(win._1 == expPairs, s"winnow found ${win._1} pairs, expected $expPairs")
    require(win._2 >= 3, s"min shared fingerprints ${win._2} below the floor")
    notes("winnow_pairs") = win._1.toString
    spark.sharedState.cacheManager.clearCache()

    // ── 5) hybrid dense+sparse RRF at 6M ──────────────────────────────
    // Dense leg: 16-dim synthetic embeddings — planted cluster-0
    // replicas ARE the query direction (cos = 1), everything else is
    // hash-noise (max noise cosine ≪ 1 at 16 dims). Sparse leg: BM25
    // over the 6M-doc index with three cluster-0-only terms. Both legs
    // rank the same 80 docs id-ascending, so the fused score is
    // exactly 2/(60+rank).
    val dim = 16
    val isPlanted0 = pmod(col("doc_id"), lit(10000000L)) === 0 &&
      (col("doc_id") / 10000000L).cast("long") < cluster
    val emb = docs.select(col("doc_id"),
      transform(sequence(lit(1), lit(dim)), i =>
        when(isPlanted0, when(i === 1, 1.0).otherwise(0.0))
          .otherwise((pmod(xxhash64(col("doc_id"), i), lit(1000L)) - 500L) / 1000.0)
          .cast("float")).as("embedding"))
    val qdf = spark.range(1).select(lit(-1L).as("q_id"),
      transform(sequence(lit(1), lit(dim)),
        i => when(i === 1, 1.0).otherwise(0.0).cast("float")).as("q_vec"))
    val dense = timed("rrf_dense_brute_6m") {
      graft.ext.Similarity.bruteTopK(qdf, emb, k = 100,
        cId = "doc_id", cVec = "embedding")
        .select(col("doc_id").as("id"), col("rank"))
        .localCheckpoint(true)
    }
    require(dense.count() == 100)
    if (!scala.util.Try(
        spark.read.parquet(s"$out/bm25/stats").count()).toOption.contains(1L))
      timed("bm25_index_6m") {
        graft.ext.Retrieval.writeBm25Index(docs, s"$out/bm25")
      }
    val qText = docs.filter(col("doc_id") === 0L)
      .select(col("text")).as[String].head().split(" ").take(3).mkString(" ")
    val sparse = timed("rrf_sparse_bm25") {
      graft.ext.Retrieval.searchBm25Index(spark, s"$out/bm25", qText, topK = 100)
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id").asc)))
        .select(col("doc_id").as("id"), col("rank"))
        .localCheckpoint(true)
    }
    // ≥ cluster: a random 8-hex token can collide with ONE query term
    // (~0.05 expected per term over 240M tokens); any such straggler
    // scores far below the 3-term cluster hits, so ranks 1..cluster
    // stay the planted replicas — which the fused closed form verifies
    val nSparse = sparse.count()
    require(nSparse >= cluster && nSparse <= 100,
      s"sparse leg returned $nSparse hits, expected >= $cluster")
    val fused = timed("rrf_fuse") {
      graft.ext.Retrieval.rrfFuse(Seq(dense, sparse), topK = 50)
        .collect()
    }
    require(fused.length == 50)
    fused.zipWithIndex.foreach { case (r, i) =>
      val rank = i + 1
      require(r.getLong(0) == (rank - 1).toLong * 10000000L,
        s"fused rank $rank is ${r.getLong(0)}, expected planted replica")
      val want = math.rint(2.0 / (60.0 + rank) * 1e6) / 1e6
      require(math.abs(r.getDouble(1) - want) < 1e-9,
        s"fused score at rank $rank: ${r.getDouble(1)}, closed form $want")
      require(r.getLong(2) == 2L, "every fused hit must appear in both lists")
    }
    notes("rrf_top") = fused.take(3).map(_.getLong(0)).mkString(",")
    spark.sharedState.cacheManager.clearCache()

    // ── 6) BPE at a realistic vocab over the 6M corpus ────────────────
    // Train 64 merges on a deterministic 0.5% sample whose every doc
    // carries the planted word 5× (so its merge chain dominates every
    // hex pair); lineage is re-materialized every 16 merges (the
    // checkpointEvery mechanism — flat per-iteration cost). The
    // planted word must collapse to ONE token under the learned
    // merges, and the FULL 6M-doc encode must count it exactly.
    // non-hex alphabet: "zzzzyyyy" can never appear among md5-hex
    // corpus tokens, so the 6M-doc count is exact by construction (and
    // its merge chain meets zero competition from hex pairs)
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
    val plantedCnt = timed("bpe_encode_6m") {
      graft.ext.Bpe.encode(
        docs.select(concat(col("text"), lit(suffix)).as("text")), "text", merges)
        .filter(col("token") === planted)
        .agg(sum("cnt")).as[Long].head()
    }
    require(plantedCnt == 5L * nDocs,
      s"planted token count $plantedCnt, expected ${5L * nDocs}")
    notes("bpe_merges") = merges.take(8).map { case (a, b) => s"$a+$b" }.mkString(" ")

    // ── report ────────────────────────────────────────────────────────
    writeReport()
    println("SCALEBENCH3 " + java.nio.file.Files.readString(
      java.nio.file.Paths.get("target/scalebench3.json")))
    spark.stop()
  }
}
