package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023) — as a Spark operator pair: score every raw document
  * by how target-like its hashed n-gram distribution is, then resample
  * the corpus toward the target with Gumbel-top-k. This is the
  * principled version of "keep web pages that look like Wikipedia";
  * the reference engine has no data-selection stage at all ([EXT],
  * SURVEY §2.10).
  *
  * Features are unigram+bigram counts hashed into B = 16^hexDigits
  * buckets; bucket distributions for the target and raw corpora get
  * add-λ smoothing, and a document's log importance weight is
  *
  *   log w(d) = Σ_b cnt_d[b] · ( ln p̂_target[b] − ln p̂_raw[b] )
  *
  * Engine-portability: the bucket of an n-gram is the LAST `hexDigits`
  * hex chars of md5(ngram) — a string key both Spark and the DuckDB
  * oracle compute identically, no integer hashing to reconcile. The
  * resampling "randomness" is likewise md5-derived (Gumbel noise from
  * a hex-prefix uniform), so selection is bit-reproducible across
  * runs, cluster sizes, and engines.
  *
  * Shape at 100 TB: the two bucket histograms are explode → hash-agg
  * (map-side combinable) collapsing to ≤ B rows each; the log-ratio
  * table is ≤ B rows and BROADCAST to score the raw corpus with one
  * explode + map-side join + doc-keyed hash-agg — the token stream is
  * never shuffled on a key. Gumbel-top-k plans as
  * TakeOrderedAndProject: per-partition heaps + a k-row driver merge,
  * no global sort.
  */
object Dsir {

  /** Unigram + bigram features of one document, already hashed to
    * bucket keys (last `hexDigits` hex chars of md5). Pure per-row
    * expression — scan speed, no shuffle.
    */
  def bucketKeys(text: Column, hexDigits: Int): Column = {
    val toks = TextDedup.tokens(text)
    val n = size(toks)
    val bigrams = zip_with(slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat_ws(" ", a, b))
    transform(concat(toks, bigrams),
      t => substring(md5(t), 33 - hexDigits, hexDigits))
  }

  /** Histogram of hashed-n-gram buckets over a corpus: (bucket, cnt),
    * at most 16^hexDigits rows. One explode + one map-side-combinable
    * aggregation.
    */
  def bucketCounts(df: DataFrame, textCol: String, hexDigits: Int): DataFrame =
    df.select(explode(bucketKeys(col(textCol), hexDigits)).as("bucket"))
      .groupBy("bucket").agg(count(lit(1)).as("cnt"))

  /** Score every `raw` document against the `target` distribution:
    * one row per raw doc with its hashed-feature count `n_feats` and
    * log importance weight `logw` (docs with zero features emit no
    * row). Raw typically CONTAINS the target rows; that matches the
    * paper's setup of weighting the whole crawl.
    */
  def score(raw: DataFrame, target: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", hexDigits: Int = 3,
            lambda: Double = 1.0): DataFrame = {
    checkParams(hexDigits, lambda)
    val tc = bucketCounts(target, textCol, hexDigits)
      .withColumnRenamed("cnt", "__tc__")
    val rc = bucketCounts(raw, textCol, hexDigits)
      .withColumnRenamed("cnt", "__rc__")
    val docBuckets = raw.select(col(idCol),
      explode(bucketKeys(col(textCol), hexDigits)).as("bucket"))
    scoreFrom(docBuckets, rc, tc, idCol, hexDigits, lambda)
  }

  /** [[score]] when the target is a SLICE of the raw corpus — the
    * usual setup (score the crawl against its own curated subset).
    * `score(raw, raw.filter(cond))` computes the identical result but
    * runs the tokenize+md5 feature pipeline three times (raw
    * histogram, target histogram, per-doc scoring); this variant
    * materializes the narrow (id, is_target, bucket) stream once,
    * lazily, and derives all three from it.
    */
  def scoreWithin(raw: DataFrame, targetCond: Column,
                  idCol: String = "doc_id", textCol: String = "text",
                  hexDigits: Int = 3, lambda: Double = 1.0): DataFrame = {
    checkParams(hexDigits, lambda)
    val ex = raw.select(col(idCol), targetCond.as("__t__"),
        explode(bucketKeys(col(textCol), hexDigits)).as("bucket"))
      .localCheckpoint(eager = false)
    val rc = ex.groupBy("bucket").agg(count(lit(1)).as("__rc__"))
    val tc = ex.filter(col("__t__")).groupBy("bucket")
      .agg(count(lit(1)).as("__tc__"))
    scoreFrom(ex.select(col(idCol), col("bucket")), rc, tc,
      idCol, hexDigits, lambda)
  }

  private def checkParams(hexDigits: Int, lambda: Double): Unit = {
    require(hexDigits >= 1 && hexDigits <= 8,
      s"dsir: hexDigits must be in [1,8], got $hexDigits")
    require(lambda > 0, s"dsir: smoothing lambda must be positive, got $lambda")
  }

  /** Shared scoring tail: smooth the two histograms into a ≤ B-row
    * log-ratio table, broadcast it onto the per-doc bucket stream, one
    * doc-keyed hash-agg.
    */
  private def scoreFrom(docBuckets: DataFrame, rc: DataFrame, tc: DataFrame,
                        idCol: String, hexDigits: Int,
                        lambda: Double): DataFrame = {
    val b = math.pow(16.0, hexDigits.toDouble)
    // every bucket a raw doc can hit is in rc, so left join from rc;
    // totals ride along as 1-row broadcast cross joins
    val tTot = tc.agg(sum(col("__tc__")).cast("double").as("__nt__"))
    val rTot = rc.agg(sum(col("__rc__")).cast("double").as("__nr__"))
    val logRatio = rc.join(tc, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log((coalesce(col("__tc__").cast("double"), lit(0.0)) + lambda) /
             (coalesce(col("__nt__"), lit(0.0)) + lambda * b)) -
         log((col("__rc__").cast("double") + lambda) /
             (col("__nr__") + lambda * b))).as("__logr__"))
    docBuckets
      .join(broadcast(logRatio), "bucket")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_feats"), sum(col("__logr__")).as("logw"))
  }

  /** Gumbel-top-k importance resampling: keep the `k` docs maximizing
    * `logw / temperature + Gumbel(md5)` — sampling without replacement
    * proportional to the (tempered) importance weights, the paper's
    * selection rule. Deterministic: the Gumbel comes from the first 6
    * hex digits of md5(seed:id), so a new seed is a fresh draw and any
    * engine replays the exact selection. Emits the kept docs with
    * `logw` and the selection `key`.
    */
  def resample(raw: DataFrame, target: DataFrame, k: Int,
               idCol: String = "doc_id", textCol: String = "text",
               hexDigits: Int = 3, lambda: Double = 1.0,
               temperature: Double = 1.0, seed: String = "graft"): DataFrame =
    gumbelTopK(score(raw, target, idCol, textCol, hexDigits, lambda),
      k, idCol, temperature, seed)

  /** [[resample]] over [[scoreWithin]] — single feature pass when the
    * target is a slice of the raw corpus.
    */
  def resampleWithin(raw: DataFrame, targetCond: Column, k: Int,
                     idCol: String = "doc_id", textCol: String = "text",
                     hexDigits: Int = 3, lambda: Double = 1.0,
                     temperature: Double = 1.0,
                     seed: String = "graft"): DataFrame =
    gumbelTopK(scoreWithin(raw, targetCond, idCol, textCol, hexDigits, lambda),
      k, idCol, temperature, seed)

  private def gumbelTopK(scored: DataFrame, k: Int, idCol: String,
                         temperature: Double, seed: String): DataFrame = {
    require(k > 0, s"dsir: k must be positive, got $k")
    require(temperature > 0, s"dsir: temperature must be positive, got $temperature")
    val u = (conv(substring(md5(concat(lit(seed + ":"), col(idCol).cast("string"))),
        1, 6), 16, 10).cast("double") + 0.5) / lit(16777216.0)
    scored
      .withColumn("key", col("logw") / temperature + (-log(-log(u))))
      .orderBy(col("key").desc, col(idCol))
      .limit(k)
  }
}
