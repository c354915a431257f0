package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-stress phase 2 (round 7): the text-operator families added in
  * rounds 6–7 at the same 6M-document scale [[ScaleBench]] proves the
  * dedup/ANN family at. Reuses ScaleBench's replicated corpus (same
  * deterministic generator, same planted structure: 400 clusters of 80
  * verbatim copies among 6M docs of 40 md5 tokens each), and derives a
  * per-phase variant by pure column expressions — no second fixture.
  * Every check is closed-form arithmetic over the planted structure:
  *
  *   1. capped jaccard: a 12-token boilerplate suffix is appended to
  *      EVERY document, giving one shingle family df = 6M — the
  *      configuration whose uncapped prefix join is O(Σ df²) ≈ 10¹³
  *      and simply cannot run. With `maxShingleDf` the boilerplate
  *      prunes out and the miner must return exactly the
  *      400·C(80,2) = 1,264,000 planted pairs at jaccard 1.0.
  *   2. BM25: index the 6M docs once, then serve a 3-term query drawn
  *      from one planted cluster's seed — every hit must be a cluster
  *      member (the terms exist nowhere else), and serving reads
  *      inverted lists, never the corpus.
  *   3. paragraph dedup: the same boilerplate as a second PARAGRAPH in
  *      every doc — exactly one global copy survives, planted clusters
  *      keep one main paragraph each, and 400·79 fully-duplicated docs
  *      drop: three exact counts.
  *   4. langid: a per-lang marker phrase (disjoint trigrams across
  *      langs) prepended so the `cap`-char normalized prefix is ALL
  *      marker — naive Bayes must recover every label: accuracy is
  *      exactly 6M/6M, while the engine pays the full corpus-scale
  *      explode + broadcast-model join.
  *
  * Run:  sbt -batch 'runMain graft.ScaleBench2'   (8 GiB default heap;
  * generates the corpus if /tmp/graft_scale is absent, reuses it
  * otherwise). JSON lands in target/scalebench2.json.
  */
object ScaleBench2 {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE2 $name%-28s ${sec}%8.2f s")
    r
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
    if (scala.util.Try(spark.read.parquet(s"$out/documents.parquet").count())
          .toOption.contains(nDocs))
      println("SCALE2 reusing existing corpus")
    else timed("generate_documents") {
      ScaleBench.generateDocuments(spark, sfDir, out, replicas)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    println(s"SCALE2 corpus: $nDocs documents, planted $nPlantedBase×$cluster")
    notes("docs") = nDocs.toString

    // ── 1) stop-shingle-capped jaccard with corpus-wide boilerplate ───
    // Twelve boilerplate tokens on EVERY doc: each boilerplate shingle
    // has df = 6,000,000. Uncapped, each such shingle contributes
    // df² ≈ 3.6·10¹³ rows to the prefix join — the query would not
    // finish. Capped at 1000 (≫ the 80-copy planted clusters, ≪ the
    // corpus), the boilerplate prunes out of the shingle SETS, planted
    // clusters stay verbatim-identical, and the result is exactly the
    // planted pair set at jaccard 1.0.
    val boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor"
    // the 1M-doc slice (replica index < 200) carries ALL planted
    // clusters (they live at replica < 80), so the expected pair count
    // is unchanged while the exact miner — the documented NON-100TB
    // path; minhash is the scale path and ScaleBench proves it at the
    // full 6M — runs at the largest size worth paying for it. The
    // boilerplate shingles still hit df = 1M: five orders of magnitude
    // past the cap, same uncapped-impossible contrast.
    val jacDocs = docs.filter((col("doc_id") / 10000000L).cast("long") < 200)
    val nJacDocs = jacDocs.count()
    val docsB = jacDocs.select(col("doc_id"),
      concat(col("text"), lit(" " + boiler)).as("text"))
    val expPairs = nPlantedBase * cluster * (cluster - 1) / 2
    notes("jaccard_docs") = nJacDocs.toString
    val jac = timed("jaccard_capped_1m") {
      graft.ext.TextDedup.jaccardPairs(docsB, "doc_id", "text",
        n = 3, threshold = 0.8, maxShingleDf = 1000)
    }
    val nJac = jac.count()
    val minJ = jac.agg(min("jaccard")).as[Double].head()
    require(nJac == expPairs, s"capped jaccard found $nJac pairs, expected $expPairs")
    require(minJ == 1.0, s"planted pairs must verify at jaccard 1.0, min=$minJ")
    notes("jaccard_pairs") = nJac.toString
    spark.sharedState.cacheManager.clearCache()

    // ── 2) BM25: index 6M docs once, serve from inverted lists ────────
    timed("bm25_index_6m") {
      graft.ext.Retrieval.writeBm25Index(docs, s"$out/bm25")
    }
    // three terms from planted cluster (base doc 0, seed "p:0") — they
    // occur in exactly that cluster's 80 copies and nowhere else
    val qText = docs.filter(col("doc_id") === 0L)
      .select(col("text")).as[String].head().split(" ").take(3).mkString(" ")
    val hits = timed("bm25_serve") {
      graft.ext.Retrieval.searchBm25Index(spark, s"$out/bm25", qText, topK = 25)
        .collect()
    }
    require(hits.length == 25, s"expected 25 hits, got ${hits.length}")
    require(hits.forall(_.getLong(0) % 10000000L == 0L),
      s"every hit must be a cluster-0 replica: ${hits.take(5).mkString(",")}")
    require(hits.map(_.getDouble(1)).distinct.length == 1,
      "verbatim copies must score identically")
    notes("bm25_query") = qText

    // ── 3) paragraph dedup with one global boilerplate paragraph ──────
    // Every doc = [its 40-token main paragraph, the shared boilerplate
    // paragraph]. Exactly one boilerplate copy survives corpus-wide
    // (the smallest (id, pos) — doc 0, which is also a cluster min);
    // planted mains keep one copy per cluster; docs left with nothing
    // are exactly the 400·(80−1) planted non-minimum copies.
    val docsP = docs.select(col("doc_id"),
      concat(col("text"), lit("\n\n" + boiler)).as("text"))
    val para = timed("para_dedup_6m") {
      graft.ext.TextDedup.dedupParagraphs(docsP, "text", "doc_id")
        .agg(count(lit(1)).as("rows"), sum("n_paras").as("kept"),
          sum("n_dropped").as("dropped"))
        .as[(Long, Long, Long)].head()
    }
    val dupMains = nPlantedBase * (cluster - 1)
    require(para._1 == nDocs - dupMains,
      s"para-dedup rows ${para._1}, expected ${nDocs - dupMains}")
    require(para._2 == nDocs - dupMains + 1,
      s"kept paragraphs ${para._2}, expected ${nDocs - dupMains + 1}")
    // fully-deduplicated docs drop from the OUTPUT (no surviving
    // paragraph), so kept+dropped covers surviving docs only
    require(para._2 + para._3 == 2L * (nDocs - dupMains),
      s"kept+dropped must cover the ${2L * (nDocs - dupMains)} surviving-doc paragraphs")
    notes("para_rows") = para._1.toString

    // ── 4) langid at 6M docs: marker-dominated capped prefix ──────────
    // Five markers with pairwise-disjoint trigram sets; repeated so the
    // cap=64 normalized prefix contains marker text only → training
    // learns per-lang gram sets that are disjoint, scoring is exact by
    // construction, and accuracy must be 6M/6M while the engine runs
    // the full corpus-scale explode + broadcast-model join twice.
    val markers = Seq("zqx kvj wpf", "bnm ghd rtl", "csy umo eia",
      "fhw xkz qvb", "jpl dtn gsr")
    val marker = element_at(
      array(markers.map(m => lit((m + " ") * 6)): _*),
      (pmod(col("doc_id"), lit(5)) + 1).cast("int"))
    val docsL = docs.select(col("doc_id"),
      concat(lit("l"), pmod(col("doc_id"), lit(5))).as("lang"),
      concat(marker, col("text")).as("text"))
    val acc = timed("langid_6m") {
      graft.ext.LangId.trainAndScore(docsL, docsL, cap = 64)
        .join(docsL.select(col("doc_id"), col("lang")), "doc_id")
        .filter(col("pred_lang") === col("lang")).count()
    }
    require(acc == nDocs, s"langid accuracy $acc/$nDocs, expected exact recovery")
    notes("langid_correct") = acc.toString
    spark.sharedState.cacheManager.clearCache()

    // ── 5) as-of join at 6M rows ──────────────────────────────────────
    // A synthetic keyed time series needs no second fixture: key = the
    // base doc (5000 keys), event time = the replica index k (1200
    // ticks per key), and every 100th tick is a "purchase". Forward
    // as-of must match each row to the NEXT purchase at-or-after it:
    // p_ts = ceil(k/100)·100 when that tick exists, else null — a pure
    // per-row formula, asserted over all 6M rows. Exercises the
    // union+window single-shuffle design (no per-row probe) at 1200×
    // bench scale.
    val series = docs.select(col("doc_id"),
      (col("doc_id") % 10000000L).as("k_base"),
      (col("doc_id") / 10000000L).cast("long").as("k_ts"))
    val leftEv = series.select(col("k_base").as("user_id"), col("k_ts").as("ts"))
    val purch = series.filter(col("k_ts") % 100 === 0)
      .select(col("k_base").as("user_id"), col("k_ts").as("pts"))
    val asofBad = timed("asof_forward_6m") {
      graft.ext.AsOfJoin.forward(
        leftEv, purch, Seq("user_id"), "ts", "pts", "p_")
        .withColumn("__exp__",
          when((ceil(col("ts") / 100.0) * 100) <= lit((replicas - 1) / 100 * 100),
            ceil(col("ts") / 100.0).cast("long") * 100))
        .filter(!(col("p_pts") <=> col("__exp__"))).count()
    }
    require(asofBad == 0, s"$asofBad of $nDocs as-of rows mismatched the closed form")
    notes("asof_rows") = nDocs.toString

    // ── 6) bucketed range join at 6M points ───────────────────────────
    // 100 broadcast intervals [10i, 10i+5) over the replica-index
    // domain: every interval catches exactly 5 ticks × 5000 keys =
    // 25,000 points; total = 2,500,000 matches, computed with ZERO
    // shuffle of the 6M-point side (intervals broadcast).
    val ivs = spark.range(100).select(
      col("id").as("iid"), (col("id") * 10).cast("double").as("lo"),
      (col("id") * 10 + 5).cast("double").as("hi"))
    val rjCounts = timed("range_join_6m") {
      graft.ext.RangeJoin.rangeJoin(
        series.select(col("doc_id").as("pid"), col("k_ts").cast("double").as("x")),
        ivs, "x", "lo", "hi", bucketWidth = 10.0, broadcastIntervals = true)
        .groupBy("iid").agg(count(lit(1)).as("n"))
        .agg(count(lit(1)), sum("n"), min("n"), max("n"))
        .as[(Long, Long, Long, Long)].head()
    }
    // intervals overlapping the tick domain catch exactly 5 ticks ×
    // nBase keys each (replicas is a multiple of 10 in every config)
    val expIv = math.min(100L, replicas / 10L)
    val expPer = 5L * nBase
    require(rjCounts == ((expIv, expIv * expPer, expPer, expPer)),
      s"range join counts $rjCounts, expected ($expIv, ${expIv * expPer}, $expPer, $expPer)")
    notes("range_join_matches") = rjCounts._2.toString

    // ── report ────────────────────────────────────────────────────────
    // note values can carry corpus-derived text (e.g. bm25_query) —
    // escape them like Verify.q does, so a fixture change can never
    // emit invalid JSON
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = "{" +
      notes.map { case (k, v) => s"${esc(k)}: ${esc(v)}" }.mkString(", ") + ", " +
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}}"""
    println("SCALEBENCH2 " + json)
    try {
      val p = java.nio.file.Paths.get("target/scalebench2.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench2: could not write target/scalebench2.json: $e")
    }
    spark.stop()
  }
}
