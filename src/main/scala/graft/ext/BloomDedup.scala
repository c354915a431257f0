package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter-accelerated incremental EXACT dedup ([EXT], SURVEY
  * §2.10 family): a persisted membership sketch over every normalized
  * text already accepted into the corpus, probed by each new batch
  * BEFORE any join, so the expensive "is this text already seen?"
  * check never shuffles the batch against the seen-keys table.
  *
  * Why this exists next to the signature-index incremental dedup
  * (`TextDedup.incrementMatches`): that path answers NEAR-duplicate
  * questions and fundamentally needs a join against the index. For the
  * much more common exact-membership gate (CCNet-style "have we
  * ingested this page before"), a Bloom filter answers locally on the
  * mapper: zero shuffle for the (overwhelming) majority of rows the
  * filter rejects. Only the filter's positives — true duplicates plus
  * an fpp-bounded sliver of false positives — proceed to an exact
  * confirm join, so the final result is EXACTLY the plain anti-join
  * (the filter can only shrink the join's left side, never change the
  * answer: Bloom filters have no false negatives).
  *
  * Shape at 100 TB: the filter is trained once per corpus epoch with
  * `df.stat.bloomFilter` (a map-side-combinable aggregate; the driver
  * holds only the merged bitset), persisted as a single binary blob,
  * and broadcast to probes. Sizing is the standard
  * bits = -n·ln(p)/ln²2: 1e9 seen docs at 1% fpp ≈ 1.2 GiB — fine to
  * broadcast; beyond that use [[trainSharded]]/[[dedupAgainstSharded]],
  * which split the key space by `xxhash64 mod shards` into independent
  * filters that are loaded per-task (each task reads only the shards
  * its rows hash to), keeping per-executor memory at one shard.
  *
  * Keys are `xxhash64(lower(trim(text)))`. A 64-bit collision would
  * surface as a false POSITIVE (two texts sharing a key), which the
  * exact confirm join removes — correctness never depends on the hash.
  */
object BloomDedup {

  /** Normalized-text membership key — the same normalization as
    * `TextDedup.exact` so the two operators agree on what "the same
    * document" means.
    */
  private def key(textCol: String) = xxhash64(lower(trim(col(textCol))))

  /** Train a filter over the normalized texts of `seen`.
    * `expectedItems` sizes the bitset (overestimate is safe: fpp only
    * improves); guarded so an accidental corpus-scale broadcast filter
    * fails loudly instead of OOMing the driver.
    */
  def train(seen: DataFrame, textCol: String,
            expectedItems: Long, fpp: Double = 0.01): BloomFilter = {
    require(expectedItems > 0, "expectedItems must be positive")
    // bits = -n ln p / ln^2 2; cap the bitset at ~2 GiB (broadcast limit)
    val bits = (-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
    require(bits / 8 <= (2L << 30),
      s"filter would need ${bits / 8 / (1 << 20)} MiB > 2 GiB; " +
        "use trainSharded/dedupAgainstSharded beyond ~1e9 seen items")
    seen.select(key(textCol).as("__k__")).stat
      .bloomFilter("__k__", expectedItems, fpp)
  }

  /** Persist/load the filter through the Hadoop filesystem of `path`
    * (local, HDFS, or object store alike).
    */
  def writeFilter(spark: SparkSession, bf: BloomFilter, path: String): Unit = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try bf.writeTo(out) finally out.close()
  }

  def readFilter(spark: SparkSession, path: String): BloomFilter = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Rows of `batch` the filter flags as possibly seen. Superset of
    * the true duplicates (no false negatives); size ≈ dups + fpp·batch.
    * The probe is a broadcast-variable lookup per row — no shuffle, no
    * per-task reserialization of the bitset.
    */
  def candidates(batch: DataFrame, bf: BloomFilter, textCol: String): DataFrame = {
    val b = batch.sparkSession.sparkContext.broadcast(bf)
    val might = udf((h: Long) => b.value.mightContainLong(h))
    batch.filter(might(key(textCol)))
  }

  /** Rows of `batch` the filter PROVES unseen (no false negatives ⇒ a
    * negative probe is definitive). The fast accept path: these rows
    * can skip the confirm join entirely. Complement of [[candidates]].
    */
  def novel(batch: DataFrame, bf: BloomFilter, textCol: String): DataFrame = {
    val b = batch.sparkSession.sparkContext.broadcast(bf)
    val might = udf((h: Long) => b.value.mightContainLong(h))
    batch.filter(!might(key(textCol)))
  }

  /** Incremental exact dedup of `batch` against an already-ingested
    * corpus: keep the first (smallest `idCol`) copy of each normalized
    * text within the batch, minus every text the corpus has already
    * accepted. `seen` is consulted ONLY for the filter's candidates —
    * the confirm semi-join's probe side is dups + fpp·batch rows, not
    * the batch — and the result equals the plain
    * batch-anti-join-seen exactly (law-checked in BloomDedupSpec).
    */
  def dedupAgainst(batch: DataFrame, seen: DataFrame, bf: BloomFilter,
                   idCol: String, textCol: String): DataFrame = {
    val confirmed = candidates(batch, bf, textCol)
      .join(seen.select(key(textCol).as("__k__"),
          lower(trim(col(textCol))).as("__t__")).distinct(),
        key(textCol) === col("__k__") &&
          lower(trim(col(textCol))) === col("__t__"), "left_semi")
      .select(col(idCol))
    TextDedup.exact(
      batch.join(confirmed, Seq(idCol), "left_anti"), textCol, idCol)
  }

  // ── sharded variant: seen sets too large for one broadcast filter ──

  /** Train `shards` independent filters, each over the keys with
    * `pmod(xxhash64, shards) = shard`, written to
    * `path/shard=<i>.bloom`. One pass over `seen` per shard batch is
    * avoided by aggregating all shards in a single groupBy pass:
    * driver memory holds one shard's bitset at a time while writing.
    */
  def trainSharded(seen: DataFrame, textCol: String, path: String,
                   shards: Int, expectedItemsPerShard: Long,
                   fpp: Double = 0.01): Unit = {
    val spark = seen.sparkSession
    val keys = seen.select(key(textCol).as("__k__"))
      .withColumn("__s__", pmod(col("__k__"), lit(shards)))
    // one job per shard keeps driver memory at a single bitset; the
    // scan is pruned by the pushed __s__ filter when `seen` is
    // pre-partitioned by the same expression (the epoch writer does)
    (0 until shards).foreach { s =>
      val bf = keys.filter(col("__s__") === s).stat
        .bloomFilter("__k__", expectedItemsPerShard, fpp)
      writeFilter(spark, bf, s"$path/shard=$s.bloom")
    }
  }

  /** [[dedupAgainst]] with per-task shard loading: rows are clustered
    * by shard so each task touches few filters, and a task-local cache
    * loads each shard at most once per task. Result is identical to
    * the broadcast path (same law).
    */
  def dedupAgainstSharded(batch: DataFrame, seen: DataFrame, path: String,
                          shards: Int, idCol: String,
                          textCol: String): DataFrame = {
    val mightSharded = udf { (h: Long) =>
      val s = java.lang.Math.floorMod(h, shards.toLong).toInt
      BloomDedup.shardCache.get((path, s)).mightContainLong(h)
    }
    val cand = batch
      .withColumn("__shard__", pmod(key(textCol), lit(shards)))
      .repartition(col("__shard__"))
      .filter(mightSharded(key(textCol)))
      .drop("__shard__")
    val confirmed = cand
      .join(seen.select(key(textCol).as("__k__"),
          lower(trim(col(textCol))).as("__t__")).distinct(),
        key(textCol) === col("__k__") &&
          lower(trim(col(textCol))) === col("__t__"), "left_semi")
      .select(col(idCol))
    TextDedup.exact(
      batch.join(confirmed, Seq(idCol), "left_anti"), textCol, idCol)
  }

  /** Executor-local shard cache: each JVM loads a given shard file at
    * most once (concurrent tasks share it). Bounded by construction —
    * entries are (path, shard) for the one dedup in flight; an epoch
    * change uses a new path.
    */
  private object shardCache {
    private val loaded =
      new java.util.concurrent.ConcurrentHashMap[(String, Int), BloomFilter]()
    def get(k: (String, Int)): BloomFilter =
      loaded.computeIfAbsent(k, { k2 =>
        val p = new Path(s"${k2._1}/shard=${k2._2}.bloom")
        // executor-side Configuration: picks up core-site/hdfs-site (and
        // object-store credentials) from the executor classpath — the
        // driver's SparkConf-derived Hadoop conf is not serializable
        // through a public API
        val in = p.getFileSystem(
          new org.apache.hadoop.conf.Configuration()).open(p)
        try BloomFilter.readFrom(in) finally in.close()
      })
  }
}
