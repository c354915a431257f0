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
    * sum runs in exact fixed-point (long) arithmetic, so it is
    * shuffle-order independent and engine-portable without any
    * sorted-fold machinery.
    *
    * CACHE CONTRACT: with `cacheIntermediates = true` (default) this
    * persists BOTH the model and the corpus-scale exploded gram stream
    * at MEMORY_AND_DISK, and does NOT unpersist them — the returned
    * plan still reads them, so the CALLER owns the lifecycle
    * (`spark.catalog.clearCache()` or unpersist after the final
    * action; Bench/Verify/QBench clear the cache manager after every
    * query). Library users invoking this repeatedly should either pass
    * `cacheIntermediates = false` (each leg recomputes — correct, just
    * slower) or persist a [[train]] output to parquet and serve many
    * batches from it (the documented production shape).
    */
  def scoreWith(model: DataFrame, target: DataFrame,
                idCol: String = "doc_id", textCol: String = "text",
                n: Int = 3, cap: Int = 200,
                addK: Double = 1.0,
                cacheIntermediates: Boolean = true): DataFrame = {
    // the gram stream feeds two legs (the per-doc total and the model
    // join) — persist so the normalize+explode pass over the corpus
    // runs once; lifecycle per the scaladoc cache contract above.
    // The doc-keyed repartition (r19, same rationale as
    // TextDedup.winnowFingerprints) spreads the normalize+explode over
    // every core — a small corpus scans as ONE parquet split, and
    // without the spread the whole gram pass AND every downstream
    // cached-partition consumer ran single-task (probe: 1.17 s serial
    // of a 3.9 s wall at sf0.1).
    val grams0 = target
      .repartition(col(idCol))
      .select(col(idCol), normalize(col(textCol), cap).as("__s__"))
      .select(col(idCol), explode_outer(gramsOfNorm(col("__s__"), n)).as("gram"))
    val grams = if (cacheIntermediates)
      grams0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else grams0
    scoreCore(model, grams, idCol, addK, cacheIntermediates)
  }

  /** Shared scoring core over an already-exploded (idCol, gram) stream
    * (gram NULL for documents with no grams — explode_outer shape).
    * Factored out so [[trainAndScore]]'s self-scoring path can feed
    * model and scoring legs from ONE persisted corpus pass.
    */
  private def scoreCore(model: DataFrame, grams: DataFrame, idCol: String,
                        addK: Double, cacheIntermediates: Boolean): DataFrame = {
    // The model feeds THREE plan legs (per-lang totals, the vocab size,
    // and the per-gram logp table) — persist it so a train-pipeline-
    // backed input (trainAndScore: full-corpus explode + (lang, gram)
    // agg) aggregates ONCE and every leg reads the cached |langs|·|V|
    // rows back columnar. Without this the training pipeline re-ran ~3×
    // (measured 38.6 s at sf0.1; ~3 s persisted).
    val m = if (cacheIntermediates) {
      val mm =
        model.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // Materialize ONCE before the legs fan out (r18): the totals /
      // vocab / scored legs build as CONCURRENT broadcast-exchange
      // futures, and on a cold cache each of them re-ran the whole
      // train pipeline (block-level locking only dedups per partition
      // AFTER a computation started — the probe showed 3×0.3-0.6 s
      // racing futures). One count fills this cache — and the gram
      // stream's, when the model derives from the persisted self-scoring
      // pass — so every leg reads the cached |langs|·|V| rows columnar.
      mm.count()
      mm
    } else model
    // per-lang totals and the gram-vocabulary size: |langs|+1 tiny
    // frames, broadcast — never collected
    val totals = m.groupBy("lang")
      .agg(sum(col("cnt")).cast("double").as("__n__"))
    val vocab = m.agg(countDistinct(col("gram")).cast("double").as("__v__"))
    val langs = totals.crossJoin(vocab)
      .withColumn("__oov__",
        log(lit(addK) / (col("__n__") + lit(addK) * (col("__v__") + 1))))
    // Per-model-row log-prob, FIXED-POINT: __lpf__ = floor(lp · 10¹²)
    // as a LONG, computed once on the tiny model table. IEEE double
    // multiply and floor are exactly specified, so every engine derives
    // the IDENTICAL integer from the identical model row — and long
    // addition is exact and associative, so the per-(doc, lang) sum is
    // shuffle-order independent and engine-portable (DuckDB mirrors
    // floor+cast verbatim). This replaces a DECIMAL(38,18) sum with the
    // same portability argument: the decimal agg ran a BigDecimal per
    // row (precision 38 > the Long-backed 18 cutoff) on the hottest
    // ~26M-row leg of the plan; the long sum is a plain codegen'd
    // primitive hash aggregate (measured ~1.4× end-to-end at sf0.1,
    // identical output). No overflow: |lp| < 50 ⇒ |__lpf__| < 5·10¹³,
    // and ≤ cap terms per (doc, lang) keeps the sum < cap·5·10¹³ ≪ 2⁶³.
    val scored = m.join(broadcast(totals), "lang")
      .crossJoin(broadcast(vocab))
      .withColumn("__lpf__",
        floor(log((col("cnt") + lit(addK)) /
          (col("__n__") + lit(addK) * (col("__v__") + 1))) * lit(1e12))
          .cast("long"))
      .select("lang", "gram", "__lpf__")
    val nGrams = grams.groupBy(idCol)
      .agg(count(col("gram")).cast("double").as("__ng__"))
    // each matched gram fans out to ≤ |langs| model rows
    val matched = grams.join(broadcast(scored), "gram")
      .groupBy(col(idCol), col("lang"))
      .agg(sum(col("__lpf__")).as("__sumf__"),
        count(lit(1)).cast("double").as("__m__"))
    val full = nGrams.crossJoin(broadcast(langs.select("lang", "__oov__")))
      .join(matched, Seq(idCol, "lang"), "left")
      .withColumn("__logp__",
        coalesce(col("__sumf__"), lit(0L)) / lit(1e12) +
          (col("__ng__") - coalesce(col("__m__"), lit(0.0))) * col("__oov__"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("__logp__").desc, col("lang").asc)
    full.withColumn("__rn__", row_number().over(w))
      .filter(col("__rn__") === 1)
      .select(col(idCol), col("lang").as("pred_lang"),
        round(col("__logp__"), 4).as("logp"))
  }

  /** Train on `train0`'s labels and score `target` in one call.
    *
    * SELF-SCORING FAST PATH: when `train0 eq target` (score the corpus
    * the model was trained on — the `q_langid_nb` shape), the corpus
    * is normalized + exploded ONCE into a persisted (id, lang, gram)
    * stream and BOTH the model aggregation and the scoring legs read
    * it back columnar. The generic path explodes the corpus twice
    * (once to train, once to score) — measured ~2× on the sf0.1
    * corpus at identical output (the explode + regexp normalize is the
    * dominant cost). Reference-equality detection is deliberate: it
    * can never misfire on distinct-but-equal frames, and the harness
    * shape that matters passes the same object.
    *
    * Same cache contract as [[scoreWith]] — the caller owns the
    * persisted intermediates' lifecycle.
    */
  def trainAndScore(train0: DataFrame, target: DataFrame,
                    idCol: String = "doc_id", langCol: String = "lang",
                    textCol: String = "text", n: Int = 3, cap: Int = 200,
                    addK: Double = 1.0,
                    cacheIntermediates: Boolean = true): DataFrame =
    if (train0 eq target) {
      // doc-keyed repartition: see the scoreWith gram-stream comment
      val grams0 = target
        .repartition(col(idCol))
        .select(col(idCol), col(langCol).as("__lang0__"),
          normalize(col(textCol), cap).as("__s__"))
        .select(col(idCol), col("__lang0__"),
          explode_outer(gramsOfNorm(col("__s__"), n)).as("gram"))
      val grams = if (cacheIntermediates)
        grams0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else grams0
      // model from the SAME persisted pass ([[train]] semantics:
      // NULL labels teach nothing; explode_outer's NULL gram rows —
      // gramless docs — are not evidence either)
      val model = grams
        .filter(col("__lang0__").isNotNull && col("gram").isNotNull)
        .groupBy(col("__lang0__").as("lang"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
      scoreCore(model, grams.select(col(idCol), col("gram")),
        idCol, addK, cacheIntermediates)
    } else
      scoreWith(train(train0, langCol, textCol, n, cap), target,
        idCol, textCol, n, cap, addK, cacheIntermediates)
}
