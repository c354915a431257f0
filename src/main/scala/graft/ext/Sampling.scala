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
