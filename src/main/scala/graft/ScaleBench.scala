package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: the sf tables prove CORRECTNESS; this proves
  * the 100 TB design arguments on data big enough to cross the
  * engine's scale cutovers. It self-replicates the sf0.1 tables
  * (shifted ids) into a ~6M-row corpus with PLANTED exact-dup clusters
  * and a planted hot key, then runs the dedup/ANN/packing/shard family
  * end-to-end with closed-form assertions:
  *
  *   - documents: 5000 base rows × `replicas` (default 1200) = 6M.
  *     Text is 40 deterministic md5 tokens per row — seeded by doc
  *     only for the planted rows (`doc_id % 100 < 8`, replica < 80 →
  *     400 clusters of 80 verbatim copies), by (doc, replica)
  *     otherwise (unique, so NO accidental near-dups). Every
  *     downstream count is therefore exact arithmetic:
  *       minhash pairs  = 400 · C(80,2) = 1,264,000  (> the 1M
  *         driver union-find cutover ⇒ [[graft.ext.TextDedup.components]]
  *         takes the distributed star-contraction branch on REAL data)
  *       components     = 400; exact-dedup keeps 6M − 400·79
  *       total tokens   = 6M · 40 = 240M ⇒ packing at seqLen=1024
  *         yields ceil(240M/1024) = 234,375 sequences
  *   - embeddings: 2000 base vectors × 50 = 100k (identical across
  *     replicas ⇒ every query's true nearest neighbor is a planted
  *     replica at cosine 1) — IVF train/persist/serve at index scale.
  *   - skew: `source` is remapped so ~20% of the 6M rows share one
  *     hot key; a forced sort-merge join against the source dimension
  *     is timed AQE-on, AQE-off, and salted ([[graft.operators.Skew]]).
  *
  * Run (4 GiB heap — driver AND executors share it under local[*],
  * so this also bounds total working memory):
  *   SPARK_DRIVER_MEM=4g sbt -batch 'runMain graft.ScaleBench'
  * Writes a human log to stdout and JSON to target/scalebench.json.
  */
object ScaleBench {

  private val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
  private val notes = scala.collection.mutable.LinkedHashMap.empty[String, String]

  private def timed[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    val sec = (System.nanoTime() - t0) / 1e9
    results(name) = math.rint(sec * 100) / 100
    println(f"SCALE $name%-28s ${sec}%8.2f s")
    r
  }

  /** The shared replicated-corpus generator (also used by
    * [[ScaleBench2]]): deterministic, so both harnesses can reuse one
    * on-disk copy. See the object scaladoc for the planted structure.
    */
  private[graft] def generateDocuments(spark: SparkSession, sfDir: String,
                                       out: String, replicas: Int): Unit = {
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id")
    base
      .withColumn("k", explode(sequence(lit(0), lit(replicas - 1))))
      .withColumn("id", col("doc_id") + col("k") * 10000000L)
      .withColumn("planted", col("doc_id") % 100 < 8 && col("k") < 80)
      .withColumn("seed",
        when(col("planted"), concat(lit("p:"), col("doc_id")))
          .otherwise(concat(lit("u:"), col("doc_id"), lit(":"), col("k"))))
      .withColumn("text", concat_ws(" ",
        transform(sequence(lit(1), lit(40)),
          i => substring(md5(concat(col("seed"), lit(":"), i.cast("string"))), 1, 8))))
      // hot key: ~20% of rows share one source; the rest spread over 50
      .withColumn("source",
        when((col("doc_id") + col("k")) % 10 < 2, lit("hot"))
          .otherwise(concat(lit("s"), pmod(col("doc_id") + col("k"), lit(50)))))
      .select(col("id").as("doc_id"), col("text"), col("source"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val replicas = sys.env.get("GRAFT_SCALE_REPLICAS").map(_.toInt).getOrElse(1200)
    val vecReplicas = sys.env.get("GRAFT_SCALE_VEC_REPLICAS").map(_.toInt).getOrElse(50)
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

    val heapGb = Runtime.getRuntime.maxMemory / (1024.0 * 1024 * 1024)
    notes("heap_gb") = f"$heapGb%.1f"
    notes("replicas") = replicas.toString
    println(f"SCALE heap=${heapGb}%.1f GiB replicas=$replicas vecReplicas=$vecReplicas")

    // ── 0) generate the replicated corpus ────────────────────────────
    // GRAFT_SCALE_REUSE=1 skips regeneration when the replicated
    // parquet already exists (generation is the most expensive phase
    // and is deterministic — reruns measure the OPERATORS, not the
    // fixture build)
    val reuse = sys.env.get("GRAFT_SCALE_REUSE").contains("1") &&
      scala.util.Try(spark.read.parquet(s"$out/documents.parquet").count()).isSuccess
    val nBase = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val nDocs = nBase * replicas
    if (!reuse) timed("generate_documents") {
      generateDocuments(spark, sfDir, out, replicas)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    require(docs.count() == nDocs, "replication lost rows")
    println(s"SCALE corpus: $nDocs documents")

    if (!reuse) timed("generate_embeddings") {
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .withColumn("k", explode(sequence(lit(0), lit(vecReplicas - 1))))
        .withColumn("vec_id", col("vec_id") + col("k") * 10000000L)
        .select("vec_id", "embedding")
        .repartition(16)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    val vecs = spark.read.parquet(s"$out/embeddings.parquet")

    // closed-form expectations (planted: doc_id % 100 < 8 of the base
    // rows, cluster size = min(80, replicas))
    val nPlantedBase = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") % 100 < 8).count()
    val cluster = math.min(80L, replicas.toLong)
    val expPairs = nPlantedBase * cluster * (cluster - 1) / 2
    val expComponents = nPlantedBase

    // ── 1) exact dedup at 6M rows ────────────────────────────────────
    val kept = timed("dedup_exact") {
      graft.ext.TextDedup.exact(docs, "text", "doc_id").count()
    }
    require(kept == nDocs - expComponents * (cluster - 1),
      s"exact dedup kept $kept, expected ${nDocs - expComponents * (cluster - 1)}")

    // ── 2) MinHash+LSH pairs, then components PAST the 1M cutover ────
    val pairs = timed("minhash_pairs") {
      graft.ext.TextDedup.minhashPairs(docs, "doc_id", "text")
    }
    val nPairs = pairs.count()
    require(nPairs == expPairs, s"found $nPairs pairs, expected $expPairs")
    notes("pairs") = nPairs.toString
    val branch = if (nPairs > 1000000L) "star contraction" else "driver union-find"
    println(s"SCALE pairs=$nPairs (cutover=1000000 → $branch branch)")

    val labels = timed("components_star") {
      // the production entry point: past driverMaxPairs this runs the
      // distributed large-star/small-star contraction, not the
      // driver-side union-find
      graft.ext.TextDedup.components(pairs)
        .localCheckpoint(eager = true)
    }
    val nComps = labels.select("label").distinct().count()
    val nLabeled = labels.count()
    require(nComps == expComponents, s"$nComps components, expected $expComponents")
    require(nLabeled == expComponents * cluster,
      s"$nLabeled labeled ids, expected ${expComponents * cluster}")
    notes("components") = nComps.toString

    // ── 3) IVF ANN at 100k vectors: train once, persist, serve ───────
    val centroids = timed("ivf_train") {
      graft.ext.IvfIndex.train(spark, vecs, k = 64, iters = 2)
    }
    timed("ivf_write_index") {
      graft.ext.IvfIndex.writeIndex(vecs, centroids, s"$out/ivf")
    }
    val hits = timed("ivf_search") {
      val (index, cents) = graft.ext.IvfIndex.readIndex(spark, s"$out/ivf")
      val q = vecs.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
      graft.ext.IvfIndex.search(q, index, cents, k = 5, nprobe = 8)
        .filter(col("rank") === 1).select("q_id", "sim").collect()
    }
    // every query has identical planted replicas in the corpus — the
    // top hit must be one of them (cosine 1 up to the round(…,4))
    require(hits.length == 10 && hits.forall(_.getDouble(1) >= 0.9999),
      s"IVF search missed planted replicas: ${hits.mkString(",")}")

    // ── 4) packing + shards over the 240M-token stream ───────────────
    val shardStats = timed("training_shards") {
      graft.ext.CorpusOps.trainingShards(docs, "doc_id", "text",
        seqLen = 1024, numShards = 64)
        .groupBy("shard_id").agg(countDistinct("seq_id").as("n_seq"),
          sum("n_toks").as("toks"))
        .agg(count(lit(1)).as("shards"), sum("n_seq").as("seqs"),
          sum("toks").as("toks"), max("n_seq").as("mx"), min("n_seq").as("mn"))
        .as[(Long, Long, Long, Long, Long)].head()
    }
    val totalToks = nDocs * 40
    val expSeqs = (totalToks + 1023) / 1024
    require(shardStats._1 == 64, s"expected 64 shards, got ${shardStats._1}")
    require(shardStats._2 == expSeqs, s"expected $expSeqs sequences, got ${shardStats._2}")
    require(shardStats._3 == totalToks, s"expected $totalToks tokens, got ${shardStats._3}")
    require(shardStats._4 - shardStats._5 <= 1,
      s"round-robin shard skew: max=${shardStats._4} min=${shardStats._5}")
    notes("sequences") = shardStats._2.toString

    // ── 5) skew: 20% of 6M rows on one key vs the source dimension ───
    val dim = docs.groupBy("source").agg(count(lit(1)).as("dim_n"))
      .localCheckpoint(eager = true)
    def smjCount(aqe: Boolean, salted: Boolean): Long = {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      try {
        val joined =
          if (salted) graft.operators.Skew.saltedJoin(docs, dim, Seq("source"), salt = 16)
          else docs.join(dim, "source")
        joined.count()
      } finally {
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
      }
    }
    val c1 = timed("skew_smj_aqe_on") { smjCount(aqe = true, salted = false) }
    val c2 = timed("skew_smj_aqe_off") { smjCount(aqe = false, salted = false) }
    val c3 = timed("skew_salted_aqe_off") { smjCount(aqe = false, salted = true) }
    require(c1 == nDocs && c2 == nDocs && c3 == nDocs, "skew join row counts differ")

    // ── report ───────────────────────────────────────────────────────
    val json = "{" +
      s""""docs": $nDocs, "vectors": ${vecs.count()}, """ +
      notes.map { case (k, v) => s""""$k": "$v"""" }.mkString(", ") + ", " +
      s""""times": {${results.map { case (k, v) => s""""$k": $v""" }.mkString(", ")}}}"""
    println("SCALEBENCH " + json)
    try {
      val p = java.nio.file.Paths.get("target/scalebench.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, json)
    } catch { case e: Throwable =>
      System.err.println(s"scalebench: could not write target/scalebench.json: $e")
    }
    spark.stop()
  }
}
