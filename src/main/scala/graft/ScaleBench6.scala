package graft

import graft.ext.{Pca, RollupOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 6 (round 10): the two structural scale claims
  * this round changed, each proven closed-form:
  *
  *   1. PRUNED rollup-state maintenance at 10M groups: seed a
  *      10M-group indexed snapshot state, fold in a batch touching a
  *      10k-key band via [[RollupOps.maintainPruned]], and assert
  *      rewritten bytes/files are proportional to the TOUCHED band
  *      (< 10% of state), never the state size — plus the exact
  *      closed-form state totals after the merge, and a full-rewrite
  *      timing of the same fold for the honest comparison.
  *   2. PCA Gram tree-combine at d=1024: fit over 64 partitions
  *      (64 × 8.4 MB partials → 3 reduce levels → ≤ 8 driver
  *      partials), bit-identical refit, mean recovered exactly
  *      against the planted closed form.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench6'. JSON lands in
  * target/scalebench6.json.
  */
object ScaleBench6 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE6 $name%-28s ${sec}%8.2f s")
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
    // notes may be empty on the early phases — no dangling separator,
    // the incremental evidence must stay parseable JSON
    val fields = notes.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.toSeq :+
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}"""
    val json = fields.mkString("{", ", ", "}")
    try {
      val p = java.nio.file.Paths.get("target/scalebench6.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench6: could not write target/scalebench6.json: $e")
    }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val out = "/tmp/graft_scale6"
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(out))

    // ── 1) PRUNED rollup maintenance at 10M groups ────────────────────
    val nGroups = 10_000_000L
    val keys = Seq("k")
    val aggs = RollupOps.parse(Seq("count", "sum:v"))
    // seed facts: one row per group, v = k % 1000 (closed form)
    val seed = spark.range(nGroups).select($"id".as("k"),
      ($"id" % 1000).as("v"))
    val statePath = s"$out/roll_state.parquet"
    fs.delete(new Path(statePath), true)
    timed("rollup_seed_10m_groups") {
      graft.operators.WriteOps.atomicOverwrite(spark,
        RollupOps.summarize(seed, keys, aggs)
          .withColumn("__batch_id", lit(0L)).withColumn("__run_id", lit("r0")),
        statePath, indexBy = keys, maxRecordsPerFile = 100_000,
        commitMode = "snapshot")
    }
    // batch: 10k keys in a contiguous band + 1k brand-new keys past the end
    val touchedLo = 4_000_000L; val touchedN = 10_000L
    val batch = spark.range(touchedLo, touchedLo + touchedN)
      .union(spark.range(nGroups, nGroups + 1000))
      .select($"id".as("k"), ($"id" % 1000).as("v"))
    val stats = timed("rollup_pruned_10k_band") {
      RollupOps.maintainPruned(spark, statePath, batch, keys, aggs,
        meta = Seq("__batch_id" -> lit(1L), "__run_id" -> lit("r0")))
    }.getOrElse(sys.error("pruned path did not engage"))
    require(stats.filesRewritten > 0 && stats.filesRewritten < stats.filesTotal,
      s"strict subset expected, got $stats")
    val frac = stats.bytesRewritten.toDouble / math.max(1L, stats.bytesTotal)
    require(frac < 0.10,
      s"rewritten bytes must track the touched band, got ${frac * 100}%")
    // closed-form totals after the fold: every group counted once,
    // touched band counted twice, 1000 new groups appended
    val st = graft.sources.Resolver.readParquet(spark, statePath)
    val (gotGroups, gotN, gotSum) = st
      .agg(count(lit(1)), sum("__n"), sum("__sum_v"))
      .as[(Long, Long, Long)].head()
    def bandSum(lo: Long, hi: Long): Long = { // Σ k%1000 over [lo, hi)
      def pre(n: Long): Long = { // Σ over [0, n)
        val cycles = n / 1000; val tail = n % 1000
        cycles * (999L * 1000L / 2) + tail * (tail - 1) / 2
      }
      pre(hi) - pre(lo)
    }
    val wantGroups = nGroups + 1000
    val wantN = nGroups + touchedN + 1000
    val wantSum = bandSum(0, nGroups) + bandSum(touchedLo, touchedLo + touchedN) +
      bandSum(nGroups, nGroups + 1000)
    require((gotGroups, gotN, gotSum) == ((wantGroups, wantN, wantSum)),
      s"closed form: got ($gotGroups,$gotN,$gotSum) want ($wantGroups,$wantN,$wantSum)")
    // the honest comparison: the SAME fold as a full state rewrite
    val statePathFull = s"$out/roll_state_full.parquet"
    fs.delete(new Path(statePathFull), true)
    graft.operators.WriteOps.atomicOverwrite(spark,
      RollupOps.summarize(seed, keys, aggs)
        .withColumn("__batch_id", lit(0L)).withColumn("__run_id", lit("r0")),
      statePathFull, indexBy = keys, maxRecordsPerFile = 100_000,
      commitMode = "snapshot")
    timed("rollup_full_rewrite_same_fold") {
      val existing = graft.sources.Resolver.readParquet(spark, statePathFull)
        .drop("__batch_id", "__run_id")
      graft.operators.WriteOps.atomicOverwrite(spark,
        RollupOps.maintain(Some(existing), batch, keys, aggs)
          .withColumn("__batch_id", lit(1L)).withColumn("__run_id", lit("r0")),
        statePathFull, indexBy = keys, maxRecordsPerFile = 100_000,
        commitMode = "snapshot")
    }
    notes("rollup_pruned") = s"10M-group state: batch touching " +
      s"$touchedN+1000 keys rewrote ${stats.filesRewritten}/${stats.filesTotal} " +
      f"files, ${frac * 100}%.2f%% of bytes; closed-form totals exact; " +
      s"vs full rewrite of the same fold (see times)"

    // ── 2) PCA tree-combine at d=1024 ─────────────────────────────────
    val d = 1024; val nVecs = 100_000
    // planted: x[j] = ((i*31 + j*7) % 97) / 97  → mean[j] closed-form
    val emb = spark.range(nVecs).select($"id",
      transform(sequence(lit(0), lit(d - 1)),
        j => ((($"id" * 31 + j * 7) % 97) / lit(97.0)).cast("float"))
        .as("embedding"))
      .repartition(64).persist()
    emb.count()
    val m1 = timed("pca_fit_d1024_64parts") { Pca.fit(emb, "embedding", 8) }
    val m2 = timed("pca_refit_d1024") { Pca.fit(emb, "embedding", 8) }
    require(m1.mean.sameElements(m2.mean) &&
      m1.variances.sameElements(m2.variances) &&
      m1.components.zip(m2.components).forall { case (a, b) => a.sameElements(b) },
      "d=1024 refit must be bit-identical through the tree-combine")
    // closed-form mean check per column j: mean over i of ((i*31+j*7)%97)/97
    var maxErr = 0.0
    var j = 0
    while (j < d) {
      var s = 0.0
      var i = 0
      while (i < 97) { s += ((i.toLong * 31 + j.toLong * 7) % 97) / 97.0; i += 1 }
      // i*31 mod 97 cycles with period 97 over i (gcd(31,97)=1): the
      // mean over nVecs rows is the 97-cycle mean up to the partial tail
      val cycles = nVecs / 97; val tail = nVecs % 97
      var tailSum = 0.0
      i = cycles * 97
      while (i < nVecs) { tailSum += ((i.toLong * 31 + j.toLong * 7) % 97) / 97.0; i += 1 }
      val want = (cycles * s + tailSum) / nVecs
      maxErr = math.max(maxErr, math.abs(m1.mean(j) - want))
      j += 1
    }
    // values are float32-quantized before accumulation: per-value
    // rounding is ≤ 2⁻²⁴ ≈ 6e-8, so a 1e-7 bound on the recovered
    // mean is the meaningful float-precision closed form (measured
    // max err ≈ 1e-8)
    require(maxErr < 1e-7, s"planted mean max err $maxErr")
    emb.unpersist()
    notes("pca_d1024") = f"$nVecs%,d × $d dims over 64 partitions " +
      "(3 tree levels, ≤8 partials ≈ 67 MB at the driver vs 537 MB " +
      f"collected flat); refit bit-identical; planted mean max err $maxErr%.2e"

    // ── 3) DELETION VECTORS at 6M rows ────────────────────────────────
    // The physical contract at scale: a 1k-key DV delete is O(batch)
    // bytes + one manifest (data files untouched), vs the pruned-merge
    // delete of an equal band which rewrites the intersecting files.
    // Closed-form row counts after every step.
    val nRows = 6_000_000L
    val snapPath = s"$out/dv_t.parquet"
    fs.delete(new org.apache.hadoop.fs.Path(snapPath), true)
    val table = spark.range(nRows).select($"id".as("doc_id"),
      md5($"id".cast("string")).as("payload"))
    timed("dv_seed_6m_snapshot") {
      graft.operators.WriteOps.atomicOverwrite(spark, table, snapPath,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000,
        commitMode = "snapshot", keepVersions = 4)
    }
    def readBack() = graft.sources.Resolver.readParquet(spark, snapPath)
    // (a) pruned-merge delete of band B — the rewrite-shaped delete
    val bandB = spark.range(4_000_000L, 4_001_000L).select($"id".as("doc_id"))
    val stDel = timed("dv_pruned_delete_1k") {
      graft.operators.PrunedMerge.merge(spark, readBack(),
        bandB.withColumn("payload", lit(null).cast("string")),
        graft.spec.TargetSpec(
          graft.spec.DatasetRef("parquet", out, "dv_t"),
          op = graft.spec.WriteOp.Delete, pk = Seq("doc_id"),
          indexBy = Seq("doc_id"), commitMode = "snapshot",
          keepVersions = 4), snapPath)
    }.getOrElse(sys.error("pruned delete did not engage"))
    require(stDel.filesRewritten > 0 && stDel.filesRewritten < stDel.filesTotal,
      s"pruned delete must rewrite a strict subset, got $stDel")
    require(readBack().count() == nRows - 1000)
    // (b) DV delete of band A — zero data files touched
    def dataFiles = graft.operators.Snapshot.listDataFilesRec(fs,
      graft.operators.Snapshot.dataDir(new org.apache.hadoop.fs.Path(snapPath)))
      .map(_._1.toString).toSet
    val filesBefore = dataFiles
    timed("dv_tombstone_delete_1k") {
      graft.operators.Snapshot.deleteByKeys(spark, snapPath,
        spark.range(3_000_000L, 3_001_000L).select($"id".as("doc_id")),
        keepVersions = 4)
    }
    require(dataFiles == filesBefore,
      "DV delete must not write or remove any data file at 6M")
    val nAfterDv = timed("dv_read_with_tombstones_6m") { readBack().count() }
    require(nAfterDv == nRows - 2000, s"got $nAfterDv")
    require(graft.sources.Resolver.readParquet(spark, snapPath, Some(1L))
      .count() == nRows, "v1 must time-travel intact")
    // (c) materialize: tombstones fold in, counts preserved
    timed("dv_materialize_deletes_6m") {
      require(graft.operators.Snapshot.materializeDeletes(spark, snapPath,
        indexBy = Seq("doc_id"), maxRecordsPerFile = 100_000, keepVersions = 4))
    }
    require(readBack().count() == nRows - 2000)
    notes("dv") = s"6M-row snapshot: pruned delete rewrote " +
      s"${stDel.filesRewritten}/${stDel.filesTotal} files; DV delete " +
      "touched ZERO data files (tombstones + one manifest); " +
      "merge-on-read count exact; materialize folds and preserves counts"

    // ── 4) k-means + SemDeDup at 100k vectors ─────────────────────────
    // 2000 base vectors × 50 identical replicas (max cross-base cosine
    // 0.60, measured) — at tau=0.9 SemDeDup must collapse EXACTLY each
    // replica set: keepers == 2000, groups == 2000, all of size 50.
    // The 2.45M within-cluster pairs push components past the 1M
    // driver cap onto the star-contraction branch.
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
    val verdict = timed("semdedup_blocked_dedup_100k") {
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
    val sizes = verdict.groupBy("group").count()
      .agg(min("count"), max("count")).as[(Long, Long)].head()
    require(sizes == ((50L, 50L)), s"every replica set is one group: $sizes")
    verdict.unpersist(); assigned.unpersist(); vecs.unpersist()
    notes("semdedup") = "100k vectors (2000 × 50 replicas): cluster-blocked " +
      "SemDeDup collapsed exactly each replica set — 2000 keepers, 2000 " +
      "groups of size 50, via star-contraction components over 2.45M pairs"

    // ── 5) Unigram-LM tokenizer at 16M tokens / ~90k word types ───────
    // The scale claim: the corpus is read ONCE (word-type table);
    // every EM iteration costs O(types × len × maxPieceLen) with the
    // inventory broadcast — independent of corpus size. Zipf-ish
    // synthetic vocabulary so the type table is realistically large.
    val corpusPath = s"$out/uni_corpus.parquet"
    if (!scala.util.Try(spark.read.parquet(corpusPath).count())
          .toOption.contains(2_000_000L))
      timed("unigram_corpus_gen_2m_docs") {
        spark.range(2_000_000L).select(
          concat_ws(" ", transform(sequence(lit(0), lit(7)), t => {
            val h = pmod(xxhash64($"id" * 8 + t), lit(1000000L))
              .cast("double") / 1000000.0
            concat(lit("w"), floor(pow(h, 2.0) * 100000).cast("long"))
          })).as("text"))
          .repartition(32).write.mode("overwrite").parquet(corpusPath)
      }
    val uniCorpus = spark.read.parquet(corpusPath)
    val nTypes = timed("unigram_wordcounts_16m_tokens") {
      graft.ext.UnigramLm.wordTypes(uniCorpus).count()
    }
    require(nTypes > 50000, s"want a large type table, got $nTypes")
    val uniModel = timed("unigram_train_v2000_16m_tokens") {
      graft.ext.UnigramLm.train(uniCorpus, vocabSize = 2000,
        emIters = 2, maxSeed = 4000)
    }
    require(uniModel.size == 2000, s"vocab ${uniModel.size}")
    require(math.abs(uniModel.pieces.values.sum - 1.0) < 1e-9)
    require("w0123456789".forall(c => uniModel.pieces.contains(c.toString)),
      "alphabet coverage")
    timed("unigram_encode_16m_tokens") {
      val enc = graft.ext.UnigramLm.encode(uniCorpus, "text", uniModel)
      require(enc.count() > 0)
    }
    notes("unigram") = f"$nTypes%,d word types / 16M tokens: vocab-2000 " +
      "train = 1 corpus read + type-table EM (see times; encode is one " +
      "further type-table pass), Σp=1, full alphabet coverage"

    // ── 6) batch hard-negative mining at 6M docs × 100 queries ────────
    // The batch shape's claim: ONE corpus pass serves every query
    // (term-restricted map-side), so 100 queries cost ~one BM25 scan,
    // not 100. Reuses the ScaleBench 6M corpus when present.
    val corpus6m = s"/tmp/graft_scale/documents.parquet"
    if (scala.util.Try(spark.read.parquet(corpus6m).count())
          .toOption.exists(_ >= 6000000L)) {
      val docs6 = spark.read.parquet(corpus6m)
      val words = Seq("join", "hash", "row", "batch", "scan", "customer",
        "column", "filter", "small", "slow")
      val queries = (0 until 100).map { i =>
        (i.toLong, s"${words(i % 10)} ${words((i / 10) % 10)} ${words((i * 3) % 10)}",
          (i * 37L) % 1000L)
      }.toDF("q_id", "query", "pos_id")
      val negs = timed("hard_negatives_100q_6m_docs") {
        val n = graft.ext.Retrieval.hardNegatives(docs6, queries, k = 5,
          idCol = "doc_id", textCol = "text").persist()
        n.count(); n
      }
      val perQ = negs.groupBy("q_id").count()
        .agg(min("count"), max("count")).as[(Long, Long)].head()
      require(perQ._2 <= 5, s"k bound violated: $perQ")
      require(negs.join(queries,
        negs("q_id") === queries("q_id") &&
          negs("neg_id") === queries("pos_id")).isEmpty,
        "positives must be excluded")
      negs.unpersist()
      notes("hard_negatives") = "100 queries × 6M docs in one corpus " +
        "pass (term-restricted); k bound + positive exclusion verified"
    } else notes("hard_negatives") =
      "skipped: 6M ScaleBench corpus not present on this machine"

    writeReport()
    println("SCALE6 ALL OK")
    spark.stop()
  }
}
