package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mixture-allocation solver ([EXT], SURVEY §2.10, r10) — the
  * budgeting step in front of the md5-coin mixers ([[CorpusOps]]):
  * given per-source token AVAILABILITY, target SHARES, an upsampling
  * cap (max repetition factor), and a total token budget, decide how
  * many tokens each source contributes. The Pile/Dolma recipe: aim at
  * `share_s × total`, but a source can't contribute more than
  * `available_s × maxRepeat` — its overflow redistributes to the
  * others PROPORTIONALLY to their shares, recursively, which is
  * exactly the water-filling solution of
  *
  *   maximize T  s.t.  Σ_s min(share_s · T, cap_s) = budget.
  *
  * `f(T)` is piecewise-linear and increasing, so T* has a CLOSED FORM:
  * sort sources by their saturation point `t_s = cap_s / share_s`,
  * scan with a running capped-mass prefix until the uncapped water
  * level `(budget − capped) / Σ_remaining shares` falls below the next
  * saturation point. No iteration, no fixpoint — the same arithmetic
  * is replayed by the DuckDB oracle with window prefix sums.
  *
  * Scale shape: the availability aggregate is one corpus pass
  * (map-side-combinable sum of per-row token counts); the solve runs
  * on the driver over the SOURCES-sized table (bounded — mixtures
  * have tens of components, not millions). The output rates feed the
  * existing deterministic mixers for materialization.
  */
object MixPlanner {

  /** One solved allocation row. `rate` = allocated / available — the
    * per-source sampling (or repetition, when > 1) factor the mixer
    * consumes.
    */
  final case class Alloc(source: String, available: Long, share: Double,
                         cap: Double, allocated: Double, rate: Double)

  /** The closed-form water-fill over (source, available, share) rows.
    * Zero/negative-share sources allocate 0. `budget` above the total
    * cap saturates every source (T* = ∞).
    */
  def waterFill(rows: Seq[(String, Long, Double)], budget: Double,
                maxRepeat: Double): Seq[Alloc] = {
    require(maxRepeat > 0, "mix: maxRepeat must be positive")
    require(budget >= 0, "mix: budget must be non-negative")
    val (zero, pos) = rows.partition(_._3 <= 0)
    val sorted = pos
      .map { case (s, a, w) => (s, a, w, a.toDouble * maxRepeat) }
      .sortBy { case (s, _, w, c) => (c / w, s) }
    val capTotal = sorted.map(_._4).sum
    val n = sorted.size
    val suffixW = new Array[Double](n + 1)
    for (i <- (n - 1) to 0 by -1) suffixW(i) = suffixW(i + 1) + sorted(i)._3
    var tStar = Double.PositiveInfinity
    if (budget < capTotal) {
      var c0 = 0.0
      var i = 0
      var found = false
      while (i < n && !found) {
        val t = sorted(i)._4 / sorted(i)._3
        val cand = (budget - c0) / suffixW(i)
        if (cand <= t) { tStar = cand; found = true }
        else { c0 += sorted(i)._4; i += 1 }
      }
      // the last row's candidate is ≤ its saturation point whenever
      // budget ≤ capTotal, so the scan always terminates with a level
    }
    val solved = sorted.map { case (s, a, w, c) =>
      val alloc = math.min(c, w * tStar) // tStar = ∞ ⇒ everything caps
      Alloc(s, a, w, c, alloc, alloc / math.max(1L, a))
    }
    solved ++ zero.map { case (s, a, w) =>
      Alloc(s, a, w, a.toDouble * maxRepeat, 0.0, 0.0) }
  }

  /** Corpus entry point: aggregate per-source token availability (one
    * combinable pass over the shared tokenizer), solve, and return the
    * allocation table — (source, available, share, cap_tokens,
    * allocated, rate), rounded for cross-engine comparison. `shares`
    * normalize internally; sources absent from `shares` get share 0.
    */
  def plan(df: DataFrame, shares: Map[String, Double],
           budgetFrac: Double, maxRepeat: Double = 2.0,
           sourceCol: String = "source",
           textCol: String = "text"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val wSum = shares.values.sum
    require(wSum > 0, "mix: shares must have positive mass")
    val avail = df
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(size(TextDedup.tokens(col(textCol)))).as("available"))
      .as[(String, Long)].collect().toSeq.sortBy(_._1)
    // floor, not rint: DuckDB's round() is half-away while JVM rint is
    // half-even — floor agrees everywhere
    val budget = math.floor(budgetFrac * avail.map(_._2).sum)
    val rows = avail.map { case (s, a) =>
      (s, a, shares.getOrElse(s, 0.0) / wSum) }
    waterFill(rows, budget, maxRepeat)
      .map(a => (a.source, a.available,
        math.rint(a.share * 1e6) / 1e6,
        a.cap,
        math.rint(a.allocated * 100) / 100,
        math.rint(a.rate * 1e6) / 1e6))
      .sortBy(_._1)
      .toDF("source", "available", "share", "cap_tokens", "allocated", "rate")
  }
}
