package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling ([EXT], SURVEY §2.10). Every sampler
  * here derives its randomness from md5(seed:key) — no RNG state, so
  * results are bit-reproducible across runs, cluster sizes, AND
  * engines (the DuckDB oracles replay them exactly), and a new seed is
  * a fresh independent draw. Rate-based sampling (keep each row with
  * probability p, optionally per source) is [[CorpusOps.mixtureSample]]
  * with weights ≤ 1; these cover the EXACT-size variants.
  *
  * Scale design:
  *   - [[sampleK]] is orderBy(hash).limit(k) — Spark plans that as
  *     TakeOrderedAndProject: a per-partition top-k heap + one k-row
  *     merge on the driver. No global sort, no shuffle of the corpus;
  *     the right shape for "give me 100k eval docs from 100 TB".
  *   - [[samplePerStratum]] is one window (row_number over the hash
  *     per stratum) — a single shuffle on the stratum key; skew-safe
  *     for reasonable stratum counts since each partition only heaps
  *     its own rows.
  */
object Sampling {

  private def h(keyCol: String, seed: String) =
    md5(concat(lit(seed + ":"), col(keyCol).cast("string")))

  /** Exactly `k` rows (fewer if the input is smaller), chosen as the
    * k smallest md5(seed:key) — a uniform random subset for any hash
    * key that is unique per row. Deterministic and engine-portable.
    */
  def sampleK(df: DataFrame, keyCol: String, k: Int,
              seed: String = "graft"): DataFrame = {
    require(k > 0, s"sampleK: k must be positive, got $k")
    df.withColumn("__h__", h(keyCol, seed))
      .orderBy("__h__")
      .limit(k)
      .drop("__h__")
  }

  /** Exactly `k` rows drawn WITHOUT replacement with probability
    * proportional to `weightCol` (Efraimidis & Spirtakis, IPL 2006,
    * "Weighted random sampling with a reservoir"): each row gets the
    * key ln(u)/w with u uniform in (0,1), and the k LARGEST keys are
    * the sample — distributionally identical to sequential weighted
    * draws. u comes from the first 52 bits of md5(seed:key), so u is
    * exact in a double ((h+0.5)/2^52, never 0 or 1) and the whole
    * draw replays bit-identically in any engine with md5 + ln —
    * the DuckDB oracle replicates it term for term.
    *
    * Rows with NULL or non-positive weight are dropped (they have
    * probability 0 by definition; a negative weight is a caller bug
    * surfaced by the documented filter rather than a NaN key).
    * Same 100 TB shape as [[sampleK]]: TakeOrderedAndProject, no
    * global sort, no shuffle of the corpus.
    */
  def weightedSampleK(df: DataFrame, weightCol: String, keyCol: String,
                      k: Int, seed: String = "graft"): DataFrame = {
    require(k > 0, s"weightedSampleK: k must be positive, got $k")
    val u = (conv(substring(h(keyCol, seed), 1, 13), 16, 10).cast("double")
      + lit(0.5)) / lit(4503599627370496.0) // 2^52
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("__wk__", log(u) / col(weightCol).cast("double"))
      .orderBy(col("__wk__").desc, col(keyCol))
      .limit(k)
      .drop("__wk__")
  }

  /** Exactly `n` rows per stratum (fewer for smaller strata): the n
    * smallest md5(seed:key) within each `stratumCol` group. The usual
    * balanced-eval-set constructor (n docs per language/source/split).
    */
  def samplePerStratum(df: DataFrame, stratumCol: String, keyCol: String,
                       n: Int, seed: String = "graft"): DataFrame = {
    require(n > 0, s"samplePerStratum: n must be positive, got $n")
    val w = Window.partitionBy(stratumCol).orderBy(col("__h__"))
    df.withColumn("__h__", h(keyCol, seed))
      .withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") <= n)
      .drop("__h__", "__rn__")
  }
}
