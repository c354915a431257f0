package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram language-model tokenizer ([EXT], SURVEY §2.10, r10) — the
  * SentencePiece algorithm family (Kudo, ACL 2018), the tokenizer
  * behind Llama/T5-style vocabularies, complementing [[Bpe]]:
  *
  *   - '''train''': seed a candidate piece inventory from frequent
  *     substrings of the word-TYPE table, fit piece probabilities by
  *     EM (E-step = forward–backward expected piece counts over every
  *     segmentation of each word type, corpus-weighted; M-step =
  *     normalize), then prune to the target vocabulary by
  *     SentencePiece's exact leave-one-out likelihood-loss ranking
  *     ([[pruneLosses]] — a piece survives for being hard to
  *     re-segment, not merely for being frequent); single characters
  *     are never pruned so every word stays representable.
  *   - '''encode''': Viterbi best segmentation per word under
  *     INTEGER piece costs (micro-nats, `round(-ln p × 1e6)`), ties
  *     broken by the lexicographically smallest token sequence — the
  *     integer DP makes segmentations reproducible bit-for-bit across
  *     engines, which is what lets the DuckDB oracle replay it by
  *     exhaustive enumeration.
  *
  * Scale shape (the [[Bpe]] playbook): the corpus is read ONCE into
  * the word-type table (vocabulary-sized); every EM iteration is one
  * mapPartitions over the types with the piece table BROADCAST
  * (≤ `maxSeed` entries, megabytes) followed by one hash-agg;
  * expected counts accumulate in FIXED-POINT longs (×1e6) so the
  * reduction is exact and associative — training is bit-deterministic
  * under any partitioning, the same trick as the langid trainer. The
  * per-word forward–backward is O(len × maxPieceLen) with a hash
  * lookup per span. Driver state = the piece table, never the corpus.
  */
object UnigramLm {

  /** A trained model: piece → probability (sums to 1 over the
    * inventory). `cost` is the integer micro-nat encode cost.
    */
  final case class Model(pieces: Map[String, Double]) {
    def costs: Map[String, Long] =
      pieces.map { case (p, pr) => p -> math.round(-math.log(pr) * 1e6) }
    def size: Int = pieces.size
  }

  private val Scale = 1e6 // fixed-point: exact, associative count sums

  /** Corpus word-type table via the shared tokenizer. */
  def wordTypes(df: DataFrame, textCol: String = "text"): DataFrame =
    Bpe.wordCounts(df, textCol)

  /** Candidate pieces: every substring of length ≤ `maxLen` of every
    * word type, scored by corpus frequency × length (the usual
    * seed heuristic: long frequent substrings are promising pieces);
    * the top `maxSeed` by score plus EVERY single character. One
    * explode + hash-agg + TakeOrdered — never a driver corpus pass.
    */
  def seedPieces(types: DataFrame, maxLen: Int = 8,
                 maxSeed: Int = 2000): Seq[(String, Long)] = {
    import types.sparkSession.implicits._
    val subs = types.select(col("word"), col("cnt")).as[(String, Long)]
      .flatMap { case (w, c) =>
        for {
          i <- 0 until w.length
          j <- (i + 1) to math.min(w.length, i + maxLen)
        } yield (w.substring(i, j), c)
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (p, c) => (p, c * p.length) } // score = freq × len
      .persist()
    try {
      val top = subs.orderBy(desc("_2"), asc("_1")).limit(maxSeed).collect()
      val chars = subs.filter(length(col("_1")) === 1).collect()
      (top ++ chars).toMap.toSeq.sortBy(p => (-p._2, p._1))
    } finally { subs.unpersist(); () }
  }

  /** One E-step: corpus-weighted expected piece counts by per-word
    * forward–backward over ALL segmentations, returned as exact
    * fixed-point longs. Words longer than `maxWordLen` are skipped
    * (they would underflow the path probabilities; they still encode
    * fine — Viterbi is max, not sum).
    */
  def expectedCounts(types: DataFrame, pieces: Map[String, Double],
                     maxWordLen: Int = 48): Map[String, Long] = {
    import types.sparkSession.implicits._
    val maxPiece = if (pieces.isEmpty) 1 else pieces.keys.map(_.length).max
    val bc = types.sparkSession.sparkContext.broadcast(pieces)
    types.select(col("word"), col("cnt")).as[(String, Long)]
      .mapPartitions { it =>
        val ps = bc.value
        val acc = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { case (w, cnt) =>
          val n = w.length
          if (n > 0 && n <= maxWordLen) {
            val alpha = new Array[Double](n + 1)
            val beta = new Array[Double](n + 1)
            alpha(0) = 1.0; beta(n) = 1.0
            var j = 1
            while (j <= n) {
              var i = math.max(0, j - maxPiece)
              var a = 0.0
              while (i < j) {
                if (alpha(i) > 0) ps.get(w.substring(i, j)).foreach(p =>
                  a += alpha(i) * p)
                i += 1
              }
              alpha(j) = a
              j += 1
            }
            var i = n - 1
            while (i >= 0) {
              var b = 0.0
              var k = i + 1
              val hi = math.min(n, i + maxPiece)
              while (k <= hi) {
                if (beta(k) > 0) ps.get(w.substring(i, k)).foreach(p =>
                  b += p * beta(k))
                k += 1
              }
              beta(i) = b
              i -= 1
            }
            val z = alpha(n)
            if (z > 0) {
              i = 0
              while (i < n) {
                var k = i + 1
                val hi = math.min(n, i + maxPiece)
                while (k <= hi) {
                  ps.get(w.substring(i, k)).foreach { p =>
                    val e = alpha(i) * p * beta(k) / z
                    if (e > 0) {
                      val piece = w.substring(i, k)
                      acc(piece) = acc.getOrElse(piece, 0L) +
                        math.round(e * cnt * Scale)
                    }
                  }
                  k += 1
                }
                i += 1
              }
            }
          }
        }
        acc.iterator
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .collect().toMap
  }

  /** Per-piece leave-one-out likelihood LOSS — SentencePiece's exact
    * prune ranking (Kudo 2018, the `unigram_model_trainer` recipe),
    * replacing the r10 probability-ranking simplification. For each
    * multi-char piece `p` with expected frequency `F` (the E-step's
    * fixed-point counts):
    *
    *   - its occurrences re-segment, when `p` is removed, as the
    *     Viterbi best alternative of `p`'s own string under the
    *     REMAINING inventory (integer micro-nat costs — the same
    *     deterministic DP encode uses);
    *   - each alternative piece's frequency gains `F`, so the
    *     post-removal log-likelihood of one occurrence is
    *     `Σ_a ln(F_a + F) − |alt| · ln(ΣF + F·(|alt|−1))`;
    *   - `loss(p) = F · (ln(F) − ln(ΣF) − that)` — the corpus
    *     log-likelihood drop if `p` leaves. Zero-frequency pieces
    *     rank `-∞` (free to drop).
    *
    * Pure driver-side arithmetic over the vocab-sized tables —
    * deterministic given the (exact, associative) counts.
    */
  def pruneLosses(counts: Map[String, Long],
                  probs: Map[String, Double]): Map[String, Double] = {
    val costs = Model(probs).costs
    val sumF = counts.values.sum.toDouble / Scale
    val logSum = math.log(sumF)
    probs.keySet.filter(_.length > 1).map { p =>
      val f = counts.getOrElse(p, 0L).toDouble / Scale
      val loss =
        if (!(f > 0) || !(sumF > 0)) Double.NegativeInfinity
        else {
          val alt = viterbi(p, costs - p)._1
          val logProb = math.log(f) - logSum
          val logSumAlt = math.log(sumF + f * (alt.size - 1))
          val logProbAlt = alt.map(a =>
            math.log(counts.getOrElse(a, 0L).toDouble / Scale + f)).sum -
            alt.size * logSumAlt
          f * (logProb - logProbAlt)
        }
      p -> loss
    }.toMap
  }

  /** Train a `vocabSize`-piece model: seed → `emIters` EM fits →
    * iterative prune until at target. Each prune round runs one
    * E-step, refits from its counts (the M-step), then drops the
    * `pruneFrac` of over-target multi-char pieces with the LOWEST
    * leave-one-out likelihood loss ([[pruneLosses]] — SentencePiece's
    * exact ranking: a piece survives for being hard to re-segment,
    * not merely for being frequent). Deterministic: fixed-point count
    * sums, ties on (loss, piece). Final size = min(candidate
    * inventory, max(vocabSize, #chars)) — single characters are never
    * pruned (coverage), and a corpus with fewer candidate substrings
    * than the target yields them all.
    */
  def train(df: DataFrame, textCol: String = "text", vocabSize: Int = 512,
            emIters: Int = 2, maxLen: Int = 8, maxSeed: Int = 2000,
            pruneFrac: Double = 0.25): Model = {
    require(vocabSize > 0, "unigram: vocabSize must be positive")
    val types = wordTypes(df, textCol).persist()
    try {
      val seed = seedPieces(types, maxLen, maxSeed)
      require(seed.nonEmpty, "unigram: empty corpus")
      val total = seed.map(_._2).sum.toDouble
      var probs: Map[String, Double] =
        seed.map { case (p, s) => p -> s / total }.toMap
      // M-step: pieces with zero expected count keep an epsilon floor
      // so single-char coverage never vanishes mid-train; the floored
      // masses renormalize so Σp = 1 exactly
      def mStep(counts: Map[String, Long]): Unit =
        if (counts.values.sum > 0) {
          val raw = probs.map { case (p, _) =>
            p -> math.max(counts.getOrElse(p, 0L).toDouble, 0.5) }
          val z = raw.values.sum
          probs = raw.map { case (p, c) => p -> c / z }
        }
      for (_ <- 1 to emIters) mStep(expectedCounts(types, probs))
      // prune to target: single chars are load-bearing (coverage) and
      // exempt; multi-char pieces leave lowest-LOSS first
      while (probs.size > vocabSize &&
             probs.count(_._1.length > 1) > 0) {
        // one fresh E-step feeds BOTH the refit and the loss ranking —
        // the SentencePiece round shape (EM sub-iters, then prune on
        // the final counts), one type-table pass per round
        val counts = expectedCounts(types, probs)
        mStep(counts)
        val losses = pruneLosses(counts, probs)
        val (chars, multi) = probs.partition(_._1.length == 1)
        val over = probs.size - vocabSize
        // drop a pruneFrac chunk per round, but never overshoot the
        // target: the final round drops exactly the remaining excess,
        // so size converges to max(vocabSize, #chars)
        val drop = math.min(multi.size,
          math.min(over, math.max(1, math.ceil(multi.size * pruneFrac).toInt)))
        val kept = multi.toSeq.sortBy { case (p, _) =>
          (-losses.getOrElse(p, Double.NegativeInfinity), p) }
          .dropRight(drop)
        probs = (chars.toSeq ++ kept).toMap
        val z = probs.values.sum
        probs = probs.map { case (p, pr) => p -> pr / z }
      }
      Model(probs)
    } finally { types.unpersist(); () }
  }

  /** Viterbi best segmentation of one word under integer micro-nat
    * costs; ties → lexicographically smallest token sequence (joined
    * with '|'). Characters ABSENT from the inventory fall back to a
    * per-character unknown cost so encode totalizes.
    */
  def viterbi(word: String, costs: Map[String, Long],
              unkCost: Long = 100L * 1000000L): (Seq[String], Long) = {
    val n = word.length
    if (n == 0) return (Nil, 0L)
    val maxPiece = if (costs.isEmpty) 1 else costs.keys.map(_.length).max
    val best = Array.fill(n + 1)(Long.MaxValue)
    val bestSeq = new Array[List[String]](n + 1)
    best(0) = 0L; bestSeq(0) = Nil
    var j = 1
    while (j <= n) {
      var i = math.max(0, j - maxPiece)
      while (i < j) {
        if (best(i) != Long.MaxValue) {
          val span = word.substring(i, j)
          val c: Option[Long] =
            costs.get(span).orElse(if (j - i == 1) Some(unkCost) else None)
          c.foreach { pc =>
            val cand = best(i) + pc
            if (cand < best(j)) { best(j) = cand; bestSeq(j) = span :: bestSeq(i) }
            else if (cand == best(j)) {
              val candSeq = span :: bestSeq(i)
              // compare REVERSED lists lexicographically via join
              val a = candSeq.reverse.mkString("|")
              val b = bestSeq(j).reverse.mkString("|")
              if (a < b) bestSeq(j) = candSeq
            }
          }
        }
        i += 1
      }
      j += 1
    }
    (bestSeq(n).reverse, best(n))
  }

  /** Corpus token-frequency table under a model (the [[Bpe.encode]]
    * shape): one type-table pass with the costs broadcast, Viterbi per
    * word TYPE (never per occurrence), explode × corpus count, one
    * combinable hash-agg.
    */
  def encode(df: DataFrame, textCol: String, model: Model): DataFrame = {
    import df.sparkSession.implicits._
    val bc = df.sparkSession.sparkContext.broadcast(model.costs)
    wordTypes(df, textCol).select(col("word"), col("cnt")).as[(String, Long)]
      .mapPartitions { it =>
        val cs = bc.value
        it.flatMap { case (w, cnt) =>
          viterbi(w, cs)._1.map(tok => (tok, cnt)) }
      }
      .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .map { case (t, c) => (t, c) }.toDF("token", "cnt")
  }

  /** Persist a trained model as a (piece, prob) parquet table — the
    * train-once / encode-many convention of the other persisted
    * artifacts ([[Retrieval.writeBm25Index]], [[IvfIndex.writeIndex]]):
    * the tokenizer that cut a corpus must be STORABLE, versionable
    * next to the data, and identical when reloaded.
    */
  def writeModel(spark: SparkSession, m: Model, path: String): Unit = {
    import spark.implicits._
    m.pieces.toSeq.sortBy(_._1).toDF("piece", "prob")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[writeModel]] table; bit-identical to the model written
    * (probabilities round-trip through parquet doubles exactly).
    */
  def readModel(spark: SparkSession, path: String): Model = {
    import spark.implicits._
    Model(spark.read.parquet(path).select("piece", "prob")
      .as[(String, Double)].collect().toMap)
  }

  /** Per-word-type segmentation table under FIXED integer costs — the
    * oracle-replayable shape: (word, toks '|'-joined, cost). Restrict
    * with `maxWordLen` when the oracle enumerates all segmentations.
    */
  def segmentTypes(df: DataFrame, textCol: String,
                   costs: Map[String, Long],
                   maxWordLen: Int = Int.MaxValue): DataFrame = {
    import df.sparkSession.implicits._
    val bc = df.sparkSession.sparkContext.broadcast(costs)
    wordTypes(df, textCol).select(col("word"), col("cnt")).as[(String, Long)]
      .filter(_._1.length <= maxWordLen)
      .mapPartitions { it =>
        val cs = bc.value
        it.map { case (w, cnt) =>
          val (toks, cost) = viterbi(w, cs)
          (w, toks.mkString("|"), cost, cnt)
        }
      }.toDF("word", "toks", "cost", "cnt")
  }
}
