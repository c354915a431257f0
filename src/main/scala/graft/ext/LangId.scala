package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trainable character-n-gram language identification ([EXT], SURVEY
  * §2.10) — the classic langid.py / Cavnar-Trenkle shape: a naive
  * Bayes over character n-grams, trained on a labeled frame (the
  * `documents.lang` column is the label) and scored per document.
  * Complements the fixed marker-word heuristic
  * ([[TextAnalysis.langId]]): markers are free but cover a hand-picked
  * language set; this learns whatever the labels contain.
  *
  * Both passes are bounded per row by `cap` (the first `cap`
  * normalized chars — language evidence saturates long before a full
  * document is read, so cost is corpus-size·cap, not corpus bytes).
  *
  * Shape at 100 TB: training is one bounded explode + (lang, gram)
  * hash-agg (map-side combinable; the model is |langs|·|gram vocab| —
  * megabytes). Scoring joins the target gram stream against the
  * broadcast model (fanout ≤ |langs| per gram), aggregates per
  * (doc, lang) with an EXACT-DECIMAL sum (associative ⇒ shuffle-order
  * independent, oracle-replicable), and takes the per-doc argmax with
  * a |langs|-row window. No corpus shuffle beyond the doc-keyed agg.
  */
object LangId {

  /** Lowercased, `\W+`-collapsed, `cap`-char prefix — the shared
    * normalization both train and score apply.
    */
  def normalize(text: Column, cap: Int = 200): Column =
    substring(trim(regexp_replace(lower(coalesce(text, lit(""))),
      "\\W+", " ")), 1, cap)

  /** Character n-grams of an ALREADY-STAGED normalized string column
    * (one Project computes the normalize, the next consumes it).
    * Staging matters: with [[normalize]] inlined into the lambda, the
    * full-document `regexp_replace` re-evaluates once PER GRAM — the
    * CollapseProject trap documented at TextDedup.winnowFingerprints;
    * measured ~10× on the sf0.1 corpus whose regenerated documents are
    * long. The staged attribute is referenced 3× by a non-cheap alias
    * consumer, which is exactly what keeps CollapseProject from
    * inlining it.
    */
  private def gramsOfNorm(s: Column, n: Int): Column = {
    val idx = when(length(s) >= n, sequence(lit(0), length(s) - n))
      .otherwise(array().cast("array<int>"))
    transform(idx, i => s.substr(i + 1, lit(n)))
  }

  /** Character n-grams of the normalized prefix, with multiplicity
    * (an array column; empty when the text is shorter than `n`).
    * Convenience single-expression form — inside a lambda-bearing plan
    * prefer staging [[normalize]] first (see [[gramsOfNorm]]).
    */
  def charGrams(text: Column, n: Int = 3, cap: Int = 200): Column =
    gramsOfNorm(normalize(text, cap), n)

  /** Train the model: (lang, gram, cnt) counts over the labeled frame.
    * Rows with a NULL label are dropped (unlabeled data cannot teach).
    * Persist it as parquet to serve many scoring batches — the same
    * train-once shape as [[TextAnalysis.lmModel]].
    */
  def train(df: DataFrame, langCol: String = "lang",
            textCol: String = "text", n: Int = 3,
            cap: Int = 200): DataFrame =
    df.filter(col(langCol).isNotNull)
      .select(col(langCol).as("lang"), normalize(col(textCol), cap).as("__s__"))
      .select(col("lang"), explode(gramsOfNorm(col("__s__"), n)).as("gram"))
      .groupBy("lang", "gram")
      .agg(count(lit(1)).as("cnt"))

  /** Score `target` against a [[train]] model: per document, the
    * add-k log-likelihood under each language
    *
    *   logp(d | l) = Σ_g ln((cnt(l,g) + k) / (N_l + k·(V+1)))
    *
    * (V = distinct grams across the model; unseen grams share the +1
    * bucket), and the winner by (logp desc, lang asc). Emits
    * (idCol, pred_lang, logp) with logp rounded to 4 — documents with
    * no grams (empty/short text) score 0 under every language and
    * deterministically take the alphabetically first. The per-language
    * sum runs in exact decimal arithmetic, so it is shuffle-order
    * independent and engine-portable without any sorted-fold machinery.
    */
  def scoreWith(model: DataFrame, target: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                n: Int = 3, cap: Int = 200,
                addK: Double = 1.0): DataFrame = {
    // The model feeds THREE plan legs (per-lang totals, the vocab size,
    // and the per-gram logp table) — persist it so a train-pipeline-
    // backed input (trainAndScore: full-corpus explode + (lang, gram)
    // agg) aggregates ONCE and every leg reads the cached |langs|·|V|
    // rows back columnar. Without this the training pipeline re-ran ~3×
    // (measured 38.6 s at sf0.1; ~3 s persisted). The caller (or
    // harness) owns the cache lifecycle — Bench/Verify/QBench clear the
    // cache manager after every query, and a library user serving many
    // scoring batches should persist a [[train]] output to parquet
    // instead (the documented production shape).
    val m = model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-lang totals and the gram-vocabulary size: |langs|+1 tiny
    // frames, broadcast — never collected
    val totals = m.groupBy("lang")
      .agg(sum(col("cnt")).cast("double").as("__n__"))
    val vocab = m.agg(countDistinct(col("gram")).cast("double").as("__v__"))
    val langs = totals.crossJoin(vocab)
      .withColumn("__oov__",
        log(lit(addK) / (col("__n__") + lit(addK) * (col("__v__") + 1))))
    val scored = m.join(broadcast(totals), "lang")
      .crossJoin(broadcast(vocab))
      .withColumn("__lp__",
        log((col("cnt") + lit(addK)) /
          (col("__n__") + lit(addK) * (col("__v__") + 1))))
      .select("lang", "gram", "__lp__")
    // the gram stream feeds two legs (the per-doc total and the model
    // join) — persist so the normalize+explode pass over the corpus
    // runs once; same caller-owned cache lifecycle as the model above
    val grams = target
      .select(col(idCol), normalize(col(textCol), cap).as("__s__"))
      .select(col(idCol), explode_outer(gramsOfNorm(col("__s__"), n)).as("gram"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGrams = grams.groupBy(idCol)
      .agg(count(col("gram")).cast("double").as("__ng__"))
    // each matched gram fans out to ≤ |langs| model rows. The logp sum
    // runs in DECIMAL(38,18): every term has ≤18 fractional digits, so
    // decimal addition is EXACT and associative — the sum is
    // shuffle-order independent and the final cast to double rounds the
    // same exact value in every engine (DuckDB mirrors it verbatim).
    // This replaces a sort_array(collect_list(struct))+fold formulation
    // that was bit-deterministic but interpreted and allocation-heavy —
    // the decimal sum is a plain codegen'd hash aggregate (measured
    // ~4 s faster on the sf0.1 corpus at identical output).
    val matched = grams.join(broadcast(scored), "gram")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("__lp__").cast("decimal(38,18)")).cast("double").as("__sum__"),
        count(lit(1)).cast("double").as("__m__"))
    val full = nGrams.crossJoin(broadcast(langs.select("lang", "__oov__")))
      .join(matched, Seq(idCol, "lang"), "left")
      .withColumn("__logp__",
        coalesce(col("__sum__"), lit(0.0)) +
          (col("__ng__") - coalesce(col("__m__"), lit(0.0))) * col("__oov__"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__logp__").desc, col("lang").asc)
    full.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .select(col(idCol), col("lang").as("pred_lang"),
        round(col("__logp__"), 4).as("logp"))
  }

  /** Train on `train`'s labels and score `target` in one call. */
  def trainAndScore(train0: DataFrame, target: DataFrame,
                    idCol: String = "doc_id", langCol: String = "lang",
                    textCol: String = "text", n: Int = 3, cap: Int = 200,
                    addK: Double = 1.0): DataFrame =
    scoreWith(train(train0, langCol, textCol, n, cap), target,
      idCol, textCol, n, cap, addK)
}
