package graft

import graft.ext.{IvfIndex, Multimodal, Similarity, TextAnalysis, TextDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Differential oracles for the operators whose outputs DuckDB cannot
  * reproduce (xxhash64- or sketch-based). Each check is a HARD
  * pass/fail law computed against an independently-derived reference:
  *
  *   - approximate results (LSH pairs / LSH top-k / IVF top-k) are
  *     checked for zero false positives (the exact-verify step makes
  *     any returned pair provably correct) AND recall ≥ a stated bound
  *     against the brute-force twin that IS oracle-checked in DuckDB;
  *   - simhash blocking is checked for EXACT set equality with an
  *     all-pairs hamming scan (pigeonhole blocking is lossless ≤ maxDist
  *     — any difference is a bug, not approximation);
  *   - xxhash64 fingerprints are checked for bijection with the
  *     md5 digests that ARE oracle-checked, plus equality with an
  *     independent built-in-HOF formulation of the same definition;
  *   - the xxhash64 hash-split is checked against binomial bounds;
  *   - media features are checked for determinism, an independent
  *     driver-side re-computation, and a real-PNG decode law;
  *   - approx percentiles are checked against the Greenwald-Khanna
  *     rank-error guarantee vs exact group ranks.
  *
  * `Verify` runs these at sf0.01 and writes `diffcheck.json` next to
  * the parquet dumps; `VerifyChecksSpec` enforces them in `sbt test`.
  */
object DiffChecks {

  final case class Check(pass: Boolean, detail: String)

  /** One check per rows-only query (keys match SparkEntry.queries). */
  def all: Map[String, (SparkSession, String) => Check] = Map(
    "q_embed_lsh" -> (lshPairsRecall(_, _)),
    "q_ann_lsh_topk" -> (lshTopKRecall(_, _)),
    "q_ann_ivf" -> (ivfRecall(_, _)),
    "q_dedup_simhash" -> (simhashExact(_, _)),
    "q_fingerprint" -> (fingerprintLaws(_, _)),
    "q_split_sizes" -> (splitBinomial(_, _)),
    "q_media_features" -> (mediaFeatureLaws(_, _)),
    "q_group_pctl_approx" -> (approxPctlRankBound(_, _)),
    "q_vocab_approx" -> (vocabApproxBound(_, _)),
    "q_ann_pq" -> (pqRecall(_, _)),
    "q_embed_pca" -> (pcaLaws(_, _)),
    "q_cluster_kmeans" -> (kmeansLaws(_, _)),
    "q_unigram_pieces" -> (unigramTrainLaws(_, _)),
    "q_unigram_encode" -> (unigramEncodeLaws(_, _)),
    "classifier_train" -> (classifierTrainLaw(_, _)))

  /** q_unigram_pieces: iterative EM training has no SQL oracle — the
    * laws are (1) refit bit-identity (fixed-point expected counts make
    * the reduction exact under any partitioning), (2) Σp = 1, (3)
    * single-character coverage of the corpus alphabet (nothing is
    * unrepresentable), (4) the vocab-size contract
    * size = max(target, #chars).
    */
  def unigramTrainLaws(s: SparkSession, dir: String): Check = {
    import graft.ext.UnigramLm
    val docs = read(s, dir, "documents")
    val m1 = UnigramLm.train(docs, vocabSize = 300, emIters = 2)
    val m2 = UnigramLm.train(docs.repartition(13), vocabSize = 300, emIters = 2)
    val refit = m1.pieces == m2.pieces
    val sum = m1.pieces.values.sum
    val norm = math.abs(sum - 1.0) < 1e-9
    val alphabet = UnigramLm.wordTypes(docs)
      .select(explode(split(col("word"), "")).as("c"))
      .filter(col("c") =!= "").distinct()
      .collect().map(_.getString(0)).toSet
    val coverage = alphabet.forall(c => m1.pieces.contains(c))
    val nChars = m1.pieces.count(_._1.length == 1)
    // contract: size = min(candidate inventory, max(target, #chars)) —
    // this corpus has only ~31 word types, so the inventory (not the
    // 300 target) is the binding constraint
    val sized = m1.size <= math.max(300, nChars) && m1.size >= nChars
    Check(refit && norm && coverage && sized,
      f"refitIdentical=$refit sum=$sum%.12f coverage=$coverage " +
        s"(${alphabet.size} chars) size=${m1.size} (chars=$nChars, target=300)")
  }

  /** q_unigram_encode: (1) per-word Viterbi cost ≤ the all-characters
    * segmentation cost (optimality against the always-available
    * baseline), (2) token concat restores every word (round-trip),
    * (3) re-encode under a refit model is identical.
    */
  def unigramEncodeLaws(s: SparkSession, dir: String): Check = {
    import graft.ext.UnigramLm
    val docs = read(s, dir, "documents")
    val m = UnigramLm.train(docs, vocabSize = 300, emIters = 2)
    val costs = m.costs
    val types = UnigramLm.wordTypes(docs).limit(500)
      .select(col("word")).collect().map(_.getString(0))
    var optimal = true; var roundTrip = true
    types.foreach { w =>
      val (toks, cost) = UnigramLm.viterbi(w, costs)
      if (toks.mkString != w) roundTrip = false
      val charCost = w.map(c =>
        costs.getOrElse(c.toString, 100L * 1000000L)).sum
      if (cost > charCost) optimal = false
    }
    val e1 = UnigramLm.encode(docs, "text", m)
      .orderBy(desc("cnt"), asc("token")).limit(40).collect().toSeq
    val e2 = UnigramLm.encode(docs, "text",
        UnigramLm.train(docs.repartition(7), vocabSize = 300, emIters = 2))
      .orderBy(desc("cnt"), asc("token")).limit(40).collect().toSeq
    val deterministic = e1 == e2
    Check(optimal && roundTrip && deterministic,
      s"viterbiOptimalVsChars=$optimal roundTrip=$roundTrip " +
        s"(${types.length} word types) refitEncodeIdentical=$deterministic")
  }

  /** q_cluster_kmeans: iterative Lloyd training has no SQL oracle —
    * the laws are (1) refit bit-identity (deterministic seeds +
    * deterministic per-dimension means), (2) assignment ≡ an
    * independent brute broadcast-join + window argmax with the same
    * tie rule, (3) the profile conserves the corpus (sizes sum to n).
    */
  def kmeansLaws(s: SparkSession, dir: String): Check = {
    import graft.ext.Clustering
    val e = read(s, dir, "embeddings")
    val n = e.count()
    val (a1, c1) = Clustering.kmeansAssign(s, e, k = 10, iters = 3)
    val (_, c2) = Clustering.kmeansAssign(s, e, k = 10, iters = 3)
    val cents1 = c1.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val cents2 = c2.orderBy("centroid_id").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val refitIdentical = cents1.sameElements(cents2)
    val brute = e.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(c1))
      .withColumn("s", Similarity.cosine(col("embedding"), col("centroid")))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("s").desc, col("centroid_id").asc)))
      .filter(col("rk") === 1).select(col("vec_id"), col("centroid_id"))
    val assignDiff = a1.select("vec_id", "centroid_id")
      .exceptAll(brute).count() +
      brute.exceptAll(a1.select("vec_id", "centroid_id")).count()
    val sizeSum = Clustering.clusterProfile(a1)
      .agg(sum(col("n"))).head().getLong(0)
    Check(refitIdentical && assignDiff == 0 && sizeSum == n,
      s"refitIdentical=$refitIdentical assignDiff=$assignDiff (must be 0) " +
        s"sizes=$sizeSum/$n")
  }

  /** q_embed_pca: the fitted model must satisfy the PCA identities —
    * orthonormal components (max |WᵀW − I| ≤ 1e-9), descending
    * eigenvalues, the Pythagoras identity err(k) = totalVar − Σλ≤k
    * (checked through the independent full reconstruction-error scan),
    * and the projected per-component variance equal to its eigenvalue.
    * These pin the numerics exactly where a SQL oracle cannot.
    */
  def pcaLaws(s: SparkSession, dir: String): Check = {
    import graft.ext.Pca
    val emb = read(s, dir, "embeddings")
    val m = Pca.fit(emb, "embedding", 16)
    var maxOrtho = 0.0
    for (a <- 0 until m.k; b <- a until m.k) {
      val dot = m.components(a).zip(m.components(b)).map(t => t._1 * t._2).sum
      maxOrtho = math.max(maxOrtho,
        math.abs(dot - (if (a == b) 1.0 else 0.0)))
    }
    val descending = m.variances.sameElements(m.variances.sorted.reverse)
    val total = Pca.totalVariance(emb, "embedding")
    val err = Pca.reconstructionError(emb, "embedding", m)
    val pythagoras = math.abs(err - (total - m.variances.sum)) <=
      1e-6 * math.max(1.0, total)
    val projVar = Pca.transform(emb, "embedding", m, "p")
      .select(posexplode(col("p")))
      .groupBy("pos").agg(var_pop("col").as("v"))
      .orderBy("pos").select("v").collect().map(_.getDouble(0))
    val varMatch = projVar.zip(m.variances).forall { case (g, w) =>
      math.abs(g - w) <= 1e-6 * math.max(1.0, w) }
    Check(maxOrtho <= 1e-9 && descending && pythagoras && varMatch,
      f"orthonormality=${maxOrtho}%.2e (≤1e-9), descending=$descending, " +
        f"pythagoras=$pythagoras (err=$err%.4f, total−Σλ=${total - m.variances.sum}%.4f), " +
        f"projected-variance≡eigenvalue=$varMatch, explained=${m.explained(total)}%.3f")
  }

  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Resolver.readParquet(s, s"$dir/$name.parquet")

  /** q_embed_lsh vs the oracle-checked brute cosinePairs: every LSH
    * pair must be a true pair (exact verify ⇒ 0 false positives) and
    * recall must clear the stated bound. 64 planes / 16×4-bit bands:
    * a boundary pair (cos = 0.35 ⇒ bit-agreement .614) collides in ≥1
    * band w.p. ~0.91, higher-similarity pairs more.
    */
  def lshPairsRecall(s: SparkSession, dir: String,
                     minRecall: Double = 0.85): Check = {
    val e = read(s, dir, "embeddings")
    val brute = Similarity.cosinePairs(e, 0.35).select("id_a", "id_b")
      .localCheckpoint(true)
    val lsh = Similarity.lshPairs(e, 0.35, maxHamming = 15, planes = 64)
      .select("id_a", "id_b").localCheckpoint(true)
    val nBrute = brute.count(); val nLsh = lsh.count()
    val falsePos = lsh.join(brute, Seq("id_a", "id_b"), "left_anti").count()
    val hit = nLsh - falsePos
    val recall = if (nBrute == 0) 1.0 else hit.toDouble / nBrute
    Check(falsePos == 0 && recall >= minRecall,
      f"recall=$recall%.4f ($hit/$nBrute, bound $minRecall%.2f), " +
        s"false_positives=$falsePos (exact-verify => must be 0)")
  }

  /** q_ann_lsh_topk vs the oracle-checked exact bruteTopK: recall@k. */
  def lshTopKRecall(s: SparkSession, dir: String,
                    minRecall: Double = 0.8): Check = {
    val e = read(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteTopK(q, e, 5).select("q_id", "vec_id")
      .localCheckpoint(true)
    val approx = Similarity.lshTopK(q, e, 5, maxHamming = 15, planes = 64)
      .select("q_id", "vec_id").localCheckpoint(true)
    val nExact = exact.count()
    val hit = approx.join(exact, Seq("q_id", "vec_id")).count()
    val recall = if (nExact == 0) 1.0 else hit.toDouble / nExact
    Check(recall >= minRecall,
      f"recall@5=$recall%.4f ($hit/$nExact, bound $minRecall%.2f)")
  }

  /** q_ann_ivf, two laws: (1) EXACTNESS — probing every list
    * (nprobe = nlist) must reproduce the brute top-k exactly: the
    * index machinery (assign + probe + rank) may lose nothing, any
    * difference is a bug, not approximation; (2) recall@5 at the
    * contract's nprobe=8/16 must clear the bound. (These synthetic
    * embeddings cluster weakly, so IVF recall tracks the probed
    * fraction — measured 0.72–0.88 at half the lists; on corpus data
    * with real cluster structure the same index recalls far more per
    * probe. The check bounds what the data supports.)
    */
  def ivfRecall(s: SparkSession, dir: String,
                minRecall: Double = 0.6): Check = {
    val e = read(s, dir, "embeddings")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteTopK(q, e, 5).select("q_id", "vec_id")
      .localCheckpoint(true)
    val centroids = IvfIndex.train(s, e, k = 16, iters = 2)
    val index = IvfIndex.assign(e, centroids)
    def run(np: Int) = IvfIndex.search(q, index, centroids, k = 5, nprobe = np)
      .select("q_id", "vec_id").localCheckpoint(true)
    val nExact = exact.count()
    val full = run(16)
    val fullMiss = exact.join(full, Seq("q_id", "vec_id"), "left_anti").count() +
      full.join(exact, Seq("q_id", "vec_id"), "left_anti").count()
    val approx = run(8)
    val hit = approx.join(exact, Seq("q_id", "vec_id")).count()
    val recall = if (nExact == 0) 1.0 else hit.toDouble / nExact
    Check(fullMiss == 0 && recall >= minRecall,
      f"nprobe=nlist diff=$fullMiss (must be 0); " +
        f"recall@5=$recall%.4f ($hit/$nExact, bound $minRecall%.2f, nprobe 8/16)")
  }

  /** q_dedup_simhash: pigeonhole blocking is LOSSLESS for hamming ≤
    * maxDist (a 64-bit fp split into maxDist+1 chunks — any pair within
    * maxDist agrees on ≥1 chunk), so the blocked join must equal the
    * all-pairs hamming scan EXACTLY.
    */
  def simhashExact(s: SparkSession, dir: String): Check = {
    val docs = read(s, dir, "documents")
    val blocked = TextDedup.simhashPairs(docs, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b").localCheckpoint(true)
    val fp = TextDedup.simhashFrame(docs, "doc_id", "text")
    val a = fp.select(col("id").as("id_a"), col("fp").as("fa"))
    val b = fp.select(col("id").as("id_b"), col("fp").as("fb"))
    val brute = a.join(b, col("id_a") < col("id_b"))
      .filter(bit_count(col("fa").bitwiseXOR(col("fb"))) <= 3)
      .select("id_a", "id_b").localCheckpoint(true)
    val missed = brute.join(blocked, Seq("id_a", "id_b"), "left_anti").count()
    val extra = blocked.join(brute, Seq("id_a", "id_b"), "left_anti").count()
    Check(missed == 0 && extra == 0,
      s"blocked=${blocked.count()} brute=${brute.count()} " +
        s"missed=$missed extra=$extra (pigeonhole is lossless => both must be 0)")
  }

  /** xxhash64 fingerprint laws (the md5 digest twins are DuckDB-checked
    * in the main oracle): (1) content_fp(xx) and contentDigest(md5) are
    * both functions of the same normalized string — their equality
    * partitions must coincide (bijection, no collisions at this scale);
    * (2) minShingleFingerprint equals an INDEPENDENT built-in-HOF
    * formulation (array_min over per-shingle xxhash64) — custom
    * expression vs built-ins computing the same definition.
    */
  def fingerprintLaws(s: SparkSession, dir: String): Check = {
    val d = read(s, dir, "documents").select(
      TextAnalysis.contentFingerprint(col("text")).as("xx"),
      TextAnalysis.contentDigest(col("text")).as("m5"),
      TextAnalysis.minShingleFingerprint(col("text")).as("xs"),
      array_min(transform(TextDedup.shingles(col("text"), 3),
        sh => xxhash64(sh))).as("xs_alt"),
      // fast single-pass formulations vs their slow HOF definitions
      md5(array_join(TextDedup.tokens(col("text")), " ")).as("m5_alt"),
      graft.functions.TextExprs.minShingle(col("text"), 3).as("msh"),
      array_min(TextDedup.shingles(col("text"), 3)).as("msh_alt"))
      .localCheckpoint(true)
    val nXx = d.select("xx").distinct().count()
    val nM5 = d.select("m5").distinct().count()
    val nBoth = d.select("xx", "m5").distinct().count()
    val minMismatch = d.filter(!(col("xs") <=> col("xs_alt"))).count()
    val cdMismatch = d.filter(!(col("m5") <=> col("m5_alt"))).count()
    val mshMismatch = d.filter(!(col("msh") <=> col("msh_alt"))).count()
    Check(nXx == nM5 && nM5 == nBoth && minMismatch == 0 &&
        cdMismatch == 0 && mshMismatch == 0,
      s"content partitions: xx=$nXx md5=$nM5 joint=$nBoth (must be equal); " +
        s"custom-vs-HOF mismatches: minshingle-xx=$minMismatch " +
        s"content-digest=$cdMismatch minshingle-str=$mshMismatch (all must be 0)")
  }

  /** xxhash64 hash_split (the md5 method is DuckDB-checked): the three
    * split sizes must sit within 4σ binomial bounds of 0.9/0.05/0.05,
    * and partition the corpus exactly.
    */
  def splitBinomial(s: SparkSession, dir: String): Check = {
    val docs = read(s, dir, "documents")
    val n = docs.count()
    val split = graft.functions.Transformers.apply(docs,
      graft.spec.TransformStage.parseChain(
        "hash_split:doc_id;split;train:0.9;val:0.05;test:0.05"))
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)
    val offenders = want.flatMap { case (name, p) =>
      val got = split.getOrElse(name, 0L)
      val bound = 4 * math.sqrt(n * p * (1 - p)) + 1
      if (math.abs(got - p * n) > bound)
        Some(f"$name=$got (expect ${p * n}%.0f ± $bound%.0f)")
      else None
    }
    val total = split.values.sum
    Check(offenders.isEmpty && total == n,
      s"sizes=$split n=$n partition_total=$total " +
        (if (offenders.isEmpty) "(all within 4-sigma)"
         else s"out-of-bounds: ${offenders.mkString(", ")}"))
  }

  /** Media feature laws: (1) the mapPartitions pipeline is
    * deterministic (two runs agree exactly); (2) stub features match an
    * independent driver-side re-computation on a sample; (3) a REAL
    * PNG decodes to its true dimensions and mime via the JDK codec.
    */
  def mediaFeatureLaws(s: SparkSession, dir: String): Check = {
    val media = Multimodal.asMedia(read(s, dir, "documents"),
      "doc_id", "text", kind = "image").localCheckpoint(true)
    def run() = Multimodal.extractFeatures(s, media)
      .select("media_id", "features")
    val r1 = run().localCheckpoint(true)
    val nondet = r1.withColumnRenamed("features", "f1")
      .join(run().withColumnRenamed("features", "f2"), "media_id")
      .filter(!(col("f1") <=> col("f2"))).count()
    // independent re-computation (functional fold, not the while-loop)
    val sample = media.select("media_id", "bytes").limit(50).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("bytes")).toMap
    val got = r1.filter(col("media_id").isin(sample.keys.toSeq: _*))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val reMismatch = sample.count { case (id, bytesOrNull) =>
      // null payload is defined as all-zero features by the stub
      val bytes = Option(bytesOrNull).getOrElse(Array.empty[Byte])
      val buckets = bytes.zipWithIndex
        .groupBy(_._2 % Multimodal.FeatureDim)
        .map { case (k, vs) => k -> vs.map(v => (v._1 & 0xff).toLong).sum }
      val expect = (0 until Multimodal.FeatureDim)
        .map(i => (buckets.getOrElse(i, 0L) % 1000) / 1000f)
      got.get(id).forall(_ != expect)
    }
    // real-PNG law: a generated 13×7 image round-trips with true meta
    val img = new java.awt.image.BufferedImage(13, 7,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 7).foreach(y => (0 until 13).foreach(x =>
      img.setRGB(x, y, (x * 20 << 16) | (y * 30 << 8) | 128)))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val pngOk = Multimodal.decodeImage(bos.toByteArray) match {
      case Some((mime, w, h, feats)) =>
        mime == "image/png" && w == 13 && h == 7 &&
          feats.length == Multimodal.FeatureDim
      case None => false
    }
    Check(nondet == 0 && reMismatch == 0 && pngOk,
      s"nondeterministic_rows=$nondet recompute_mismatches=$reMismatch " +
        s"(of ${sample.size}) real_png_decode=$pngOk")
  }

  /** approx_pNN vs exact ranks: approx_percentile(q, acc) must return
    * an element whose rank is within n/acc of q·n per group
    * (Greenwald-Khanna guarantee). Tie-safe: the value's [count(<v),
    * count(≤v)] rank interval must overlap [q·n − n/acc − 1, q·n +
    * n/acc + 1].
    */
  def approxPctlRankBound(s: SparkSession, dir: String): Check = {
    val li = read(s, dir, "lineitem")
    val approx = SparkEntry.queries("q_group_pctl_approx")(s, dir)
      .select("l_returnflag", "approx_p50_l_extendedprice",
        "approx_p95_l_extendedprice")
    val eps = 1.0 / graft.dsl.QueryCompiler.PctlAccuracy
    val joined = li.select("l_returnflag", "l_extendedprice")
      .join(broadcast(approx), "l_returnflag")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("approx_p50_l_extendedprice"), 1)
          .otherwise(0)).as("lt50"),
        sum(when(col("l_extendedprice") <= col("approx_p50_l_extendedprice"), 1)
          .otherwise(0)).as("le50"),
        sum(when(col("l_extendedprice") < col("approx_p95_l_extendedprice"), 1)
          .otherwise(0)).as("lt95"),
        sum(when(col("l_extendedprice") <= col("approx_p95_l_extendedprice"), 1)
          .otherwise(0)).as("le95"))
      .collect()
    val offenders = joined.flatMap { r =>
      val n = r.getAs[Long]("n").toDouble
      def bad(q: Double, lt: Long, le: Long): Boolean = {
        val lo = q * n - eps * n - 1; val hi = q * n + eps * n + 1
        lt > hi || le < lo // rank interval [lt, le] misses [lo, hi]
      }
      val g = r.getString(0)
      Seq(
        if (bad(0.50, r.getAs[Long]("lt50"), r.getAs[Long]("le50")))
          Some(s"$g:p50") else None,
        if (bad(0.95, r.getAs[Long]("lt95"), r.getAs[Long]("le95")))
          Some(s"$g:p95") else None).flatten
    }
    Check(offenders.isEmpty,
      if (offenders.isEmpty)
        s"all ${joined.length} groups within rank error n*$eps"
      else s"rank bound violated: ${offenders.mkString(", ")}")
  }

  /** q_vocab_approx vs the exact vocabulary twin: per-token HLL++ doc
    * frequency within 5σ of exact (rsd = 0.01 ⇒ 5% relative), total
    * counts (`cnt`) bit-identical — the sketch only touches `docs`.
    * Checked over the FULL vocabulary, not just the top-20 the
    * contract query returns.
    */
  def vocabApproxBound(s: SparkSession, dir: String,
                       maxRelErr: Double = 0.25): Check = {
    val docs = read(s, dir, "documents")
    val exact = TextAnalysis.vocabulary(docs)
      .withColumnRenamed("docs", "d_exact").withColumnRenamed("cnt", "c_exact")
    val approx = TextAnalysis.vocabulary(docs, approxDocs = true)
    val j = exact.join(approx, "token")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("cnt") =!= col("c_exact"), 1).otherwise(0)).as("cnt_diffs"),
        max(abs(col("docs") - col("d_exact")).cast("double")
          / greatest(col("d_exact"), lit(1L))).as("max_rel"))
      .head()
    val (n, cntDiffs, maxRel) =
      (j.getAs[Long]("n_tokens"), j.getAs[Long]("cnt_diffs"), j.getAs[Double]("max_rel"))
    Check(cntDiffs == 0 && maxRel <= maxRelErr,
      f"$n%d tokens: cnt_diffs=$cntDiffs (must be 0), " +
        f"max_docs_rel_err=$maxRel%.4f (bound $maxRelErr%.2f)")
  }

  /** q_ann_pq vs the oracle-checked exact bruteTopK: recall@k of the
    * ADC-shortlist + exact-refine search over 16-byte PQ codes.
    * Random synthetic embeddings are PQ's worst case (no cluster
    * structure), so the bound is calibrated for that; the refine step
    * guarantees every returned pair's similarity is EXACT.
    */
  def pqRecall(s: SparkSession, dir: String, minRecall: Double = 0.6): Check = {
    import graft.ext.{PqIndex, Similarity}
    val e = read(s, dir, "embeddings")
    val books = PqIndex.train(s, e, m = 16, ksub = 16, iters = 2)
    val coded = PqIndex.encode(e, books).select("vec_id", "codes")
    val q = e.filter(col("vec_id") < 5)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val exact = Similarity.bruteTopK(q, e, 5).select("q_id", "vec_id")
      .localCheckpoint(true)
    // shortlist 8×k: at sf0.1 (5000 vectors) a 4×k shortlist sits ON
    // the 0.6 bound — the wider refine pool buys deterministic margin
    // at both gate scales (measured 0.80 sf0.01 / 0.76 sf0.1)
    val approx = PqIndex.searchRefined(q, coded, e, books, k = 5, shortlist = 8)
      .select("q_id", "vec_id").localCheckpoint(true)
    val n = exact.count()
    val hit = approx.join(exact, Seq("q_id", "vec_id")).count()
    val recall = if (n == 0) 1.0 else hit.toDouble / n
    Check(recall >= minRecall,
      f"refined ADC recall@5=$recall%.4f ($hit/$n, bound $minRecall%.2f)")
  }

  /** Quality-classifier TRAINING end-to-end on corpus data (the
    * iterative fit has no SQL oracle): plant a perfectly learnable
    * label (presence of the token `key` — ~75/25 at sf0.01, linearly
    * separable in the mean-bag feature space), train on a
    * deterministic md5 75% split, score the held-out 25% through the
    * broadcast (token, weight) export, and require ≥ `minAcc`
    * accuracy. Verifies convergence, the export path, and
    * linearScore's replay of the MLlib margin in one law.
    */
  def classifierTrainLaw(s: SparkSession, dir: String,
                         minAcc: Double = 0.9): Check = {
    import graft.ext.QualityClassifier
    val docs = read(s, dir, "documents")
    val labeled = docs.withColumn("__y__",
      array_contains(TextDedup.tokens(col("text")), "key"))
    val isTrain = substring(md5(concat(lit("qc:"), col("doc_id"))), 1, 1) < "c"
    val train = labeled.filter(isTrain)
    val hold = labeled.filter(!isTrain)
    val m = QualityClassifier.train(
      train.filter(col("__y__")), train.filter(!col("__y__")),
      "text", vocabSize = 64)
    val scored = TextAnalysis.linearScore(hold, m.weights, "doc_id", "text", m.bias)
      .join(hold.select(col("doc_id"), col("__y__")), "doc_id")
    val n = scored.count()
    val correct = scored.filter(col("quality_keep") === col("__y__")).count()
    val acc = if (n == 0) 0.0 else correct.toDouble / n
    Check(n > 20 && acc >= minAcc,
      f"holdout accuracy=$acc%.4f ($correct/$n, bound $minAcc%.2f)")
  }
}
