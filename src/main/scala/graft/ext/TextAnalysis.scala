package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines ([EXT], SURVEY §2.10):
  * token counting, quality scoring, language ID, fingerprinting. All
  * pure built-in expressions — per-row, embarrassingly parallel, no
  * shuffle; at 100 TB these run at scan speed inside whole-stage
  * codegen. Every formula is also expressible in ANSI-ish SQL so the
  * DuckDB oracle can replicate it bit-for-bit.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wsTokenCount(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => t =!= ""))

  /** BPE-ish token count: word pieces + individual punctuation marks
    * (`\w+|[^\w\s]`), the usual cheap proxy for subword token counts.
    */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  /** Punctuation ratio (punctuation chars / all non-space chars). */
  def punctRatio(text: Column): Column = {
    val nonSpace = length(regexp_replace(text, "\\s", ""))
    val punct = length(regexp_replace(text, "[\\w\\s]", ""))
    when(nonSpace > 0, punct.cast("double") / nonSpace).otherwise(0.0)
  }

  /** Mean word length over `\W+` tokens. */
  def avgWordLen(text: Column): Column = {
    val toks = TextDedup.tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") / size(toks))
      .otherwise(0.0)
  }

  /** Fraction of tokens found in `words` (e.g. a stopword list). */
  def listRatio(text: Column, words: Seq[String]): Column = {
    val toks = TextDedup.tokens(text)
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(words.map(lit): _*))).cast("double") / size(toks))
      .otherwise(0.0)
  }

  val EnStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "with",
    "that", "it", "as", "at", "by", "this", "be", "are", "was")

  /** Heuristic quality score in [0,1]: rewards mid-length docs, normal
    * word lengths, some stopwords; penalizes punctuation soup. The
    * usual first-pass filter for web-scale corpora (C4-style rules).
    */
  def qualityScore(text: Column, nChars: Column): Column = {
    val lenScore = when(nChars.between(100, 10000), 1.0)
      .when(nChars.between(20, 99), 0.5).otherwise(0.1)
    val wordScore = when(avgWordLen(text).between(3, 12), 1.0).otherwise(0.3)
    val stopScore = when(listRatio(text, EnStopwords) >= 0.05, 1.0).otherwise(0.5)
    val punctScore = when(punctRatio(text) <= 0.2, 1.0).otherwise(0.2)
    round((lenScore * 0.3 + wordScore * 0.3 + stopScore * 0.2 + punctScore * 0.2), 4)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic. Deliberately small and disjoint enough to be stable.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "with", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "fr" -> Seq("le", "les", "et", "est", "une", "pour", "que", "dans"),
    "es" -> Seq("el", "los", "y", "es", "una", "por", "como", "para"))

  /** Language ID: CJK character ratio ≥ 0.3 → zh; otherwise the
    * language with the highest marker-word hit count (ties resolved in
    * [[LangMarkers]] order, 'en' as the no-signal default).
    */
  def langId(text: Column): Column = {
    val toks = TextDedup.tokens(text)
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val scores = LangMarkers.map { case (lang, words) =>
      lang -> size(filter(toks, t => t.isin(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pick = scores.reverse.foldLeft(lit("en")) { case (acc, (lang, s)) =>
      when(s === best && best > 0, lang).otherwise(acc)
    }
    when(cjk.cast("double") / greatest(length(text), lit(1)) >= 0.3, "zh")
      .otherwise(pick)
  }

  /** 64-bit document fingerprints: `content` hashes the normalized token
    * stream (robust to whitespace/case/punctuation churn); `minshingle`
    * is the smallest shingle hash (a 1-perm MinHash — equal for docs
    * sharing their "rarest" shingle ordering, cheap pre-cluster key).
    */
  def contentFingerprint(text: Column): Column =
    graft.functions.TextExprs.normalizedTokenHash(text)

  /** md5 hex digest of the normalized token stream — the same content
    * identity as [[contentFingerprint]] but bit-reproducible in any
    * engine with md5 (so the DuckDB oracle can check it exactly). Use
    * the xxhash64 variant in hot paths; this one where a portable,
    * auditable digest matters (provenance manifests, cross-engine
    * equality). Normalization is ONE codegen'd regexp_replace —
    * `\W+` runs → single space, trimmed — which equals
    * `array_join(tokens(text), " ")` exactly without the interpreted
    * per-token filter lambda of the HOF chain.
    */
  def contentDigest(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\W+", " ")))

  /** md5 digest of the LEXICOGRAPHICALLY smallest shingle — the
    * portable pre-cluster key: docs sharing their first-in-order
    * shingle share the digest (min over a fixed global shingle order,
    * the 1-perm MinHash idea). One custom single-pass expression + ONE
    * md5 per row — the tokens→transform→array_min HOF chain is
    * interpreted per shingle and measured ~25× slower at corpus
    * scale. NULL for docs with fewer than n tokens.
    */
  def minShingleDigest(text: Column, n: Int = 3): Column =
    md5(graft.functions.TextExprs.minShingle(text, n))

  def minShingleFingerprint(text: Column, n: Int = 3): Column = {
    // sorted ascending ⇒ element 1 IS the min; same xxhash64(seed 42)
    // over the space-joined n-gram as the transform+array_min chain,
    // minus the per-shingle interpreted lambdas.
    val sh = graft.functions.VectorExprs.shingleSortedHashes(
      TextDedup.tokens(text), n)
    when(size(sh) > 0, element_at(sh, 1)).otherwise(null)
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1): documents
    * dominated by repeated lines or repeated n-grams are boilerplate /
    * spam and get filtered before training. Pure codegen'd builtins
    * (split/array_distinct/size — no interpreted lambdas), per-row, no
    * shuffle:
    *   - `dup_line_frac`: fraction of non-empty lines that are repeats
    *     of an earlier line (0 when the doc has no lines);
    *   - `dup_3gram_frac`: fraction of word-3-gram OCCURRENCES that
    *     are repeats of an earlier 3-gram (0 when fewer than 3 tokens).
    */
  def repetitionStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val lines = array_remove(split(col(textCol), "\n"), "")
    val nLines = size(lines)
    val dupLine = when(nLines > 0,
      lit(1.0) - size(array_distinct(lines)).cast("double") / nLines)
      .otherwise(0.0)
    val toks = TextDedup.tokens(col(textCol))
    val total3 = greatest(size(toks) - 2, lit(0))
    // distinct-3-gram count via the single-pass sorted-hash expression
    // (the transform-HOF shingle array is interpreted per shingle)
    val distinct3 = size(
      graft.functions.VectorExprs.shingleSortedHashes(toks, 3))
    val dup3 = when(total3 > 0,
      lit(1.0) - distinct3.cast("double") / total3).otherwise(0.0)
    df.withColumn("dup_line_frac", round(dupLine, 4))
      .withColumn("dup_3gram_frac", round(dup3, 4))
  }

  /** Gopher's CHARACTER-fraction repetition signal (Rae et al. 2021
    * Table A1's "fraction of characters in the most common n-gram"
    * family — the exact rule the occurrence-fraction stand-in in
    * [[repetitionStats]] approximates): per doc, the most frequent
    * word n-gram (ties → lexicographically smallest) and the fraction
    * of normalized characters its (overlapping) occurrences cover,
    * cnt·len(gram) / len(tokens joined by single spaces). Docs with
    * fewer than n tokens emit no row.
    *
    * Shape at 100 TB: explode → map-side-combinable (doc, gram) count
    * → per-DOC window (never global). The gram space is the shuffle;
    * at the paper's n ∈ {2,3,4} that is ≈ the token stream, same class
    * as the TF-IDF shuffle.
    */
  def topNgramCoverage(df: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text", n: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n >= 1, s"topNgramCoverage: n must be >= 1, got $n")
    val toks = TextDedup.tokens(col(textCol))
    val grams = df
      .select(col(idCol), toks.as("__t__"))
      .withColumn("__total__", length(array_join(col("__t__"), " ")))
      .filter(size(col("__t__")) >= n)
      .select(col(idCol), col("__total__"),
        explode(transform(sequence(lit(0), size(col("__t__")) - n),
          i => concat_ws(" ", slice(col("__t__"), i + 1, lit(n))))).as("gram"))
    val counts = grams.groupBy(col(idCol), col("__total__"), col("gram"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col(idCol)).orderBy(col("cnt").desc, col("gram").asc)
    counts.withColumn("__rk__", row_number().over(w))
      .filter(col("__rk__") === 1)
      .select(col(idCol), col("gram").as("top_ngram"),
        round(col("cnt") * length(col("gram")).cast("double") / col("__total__"), 4)
          .as("coverage"))
  }

  /** Per-doc token (Shannon) entropy in nats — the standard
    * repetitiveness/diversity signal (low entropy ⇒ the doc is a few
    * tokens repeated; complements the n-gram fraction rules). Uses the
    * algebraic identity H = ln(N) − (Σ c·ln c)/N over per-token counts
    * c, so ONE (doc, token) count agg + ONE per-doc sum — both
    * map-side-combinable, no window, no p-vector materialization.
    * Docs with no tokens emit no row; a single repeated token is
    * exactly 0.
    */
  def tokenEntropy(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    df.select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(round(
        log(sum(col("c"))) -
          sum(col("c") * log(col("c"))) / sum(col("c")), 4).as("token_entropy"))

  /** Gopher quality-filter rules (Rae et al. 2021 Table A1, the subset
    * our per-row signals support; occurrence-fraction 3-grams stand in
    * for the paper's character-fraction n-gram family, and total
    * stopword hits for its 2-distinct-of-8 rule — both documented
    * deviations). Adds `gopher_reason` (FIRST failing rule, null when
    * the doc passes) and `gopher_keep`.
    *
    * Rule order: n_words → word_len → symbol_ratio → alpha_ratio →
    * stopwords → dup_lines → dup_3grams.
    *
    * Shape at 100 TB: one [[graft.functions.TextExprs.textStatsRaw]]
    * pass + two codegen'd regex counts + the repetition builtins — all
    * per-row at scan speed, no shuffle, no interpreted lambdas (the
    * alpha-word count is a lookaround regex over the text, not a
    * filter-HOF over the token array).
    */
  def gopherFilter(df: DataFrame, textCol: String = "text",
                   minWords: Long = 50, maxWords: Long = 100000,
                   minWordLen: Double = 3.0, maxWordLen: Double = 10.0,
                   maxSymbolRatio: Double = 0.1, minAlphaRatio: Double = 0.8,
                   minStopHits: Long = 2, maxDupLineFrac: Double = 0.3,
                   maxDup3gramFrac: Double = 0.5): DataFrame = {
    val s = col("__gs__")
    val n = s("tok_count").cast("double")
    val wlen = when(s("tok_count") > 0,
      s("tok_len_sum").cast("double") / n).otherwise(0.0)
    // Gopher's "symbol" family: '#' and ellipses ('...' or '…')
    val symCount = size(regexp_extract_all(col(textCol),
      lit("#|\\.{3}|…"), lit(0)))
    // words containing at least one letter = maximal \w+ runs of the
    // lowered text with an [a-z] inside (≡ the \W+ token split)
    val alphaCount = size(regexp_extract_all(lower(col(textCol)),
      lit("(?<!\\w)\\w*[a-z]\\w*(?!\\w)"), lit(0)))
    val symRatio = when(s("tok_count") > 0, symCount.cast("double") / n)
      .otherwise(0.0)
    val alphaRatio = when(s("tok_count") > 0, alphaCount.cast("double") / n)
      .otherwise(0.0)
    val reason =
      when(coalesce(s("tok_count"), lit(0)) < minWords ||
        s("tok_count") > maxWords, "n_words")
        .when(wlen < minWordLen || wlen > maxWordLen, "word_len")
        .when(symRatio > maxSymbolRatio, "symbol_ratio")
        .when(alphaRatio < minAlphaRatio, "alpha_ratio")
        .when(coalesce(s("stop_hits"), lit(0)) < minStopHits, "stopwords")
        .when(col("dup_line_frac") > maxDupLineFrac, "dup_lines")
        .when(col("dup_3gram_frac") > maxDup3gramFrac, "dup_3grams")
    repetitionStats(df, textCol)
      .withColumn("__gs__", graft.functions.TextExprs.textStatsRaw(
        col(textCol), EnStopwords, LangMarkers))
      .withColumn("gopher_reason", reason)
      .withColumn("gopher_keep", col("gopher_reason").isNull)
      .drop("__gs__", "dup_line_frac", "dup_3gram_frac")
  }

  /** [[gopherFilter]] applied: only the passing rows, original schema. */
  def gopherKeep(df: DataFrame, textCol: String = "text"): DataFrame =
    gopherFilter(df, textCol).filter(col("gopher_keep"))
      .drop("gopher_reason", "gopher_keep")

  /** C4-style line-level cleaning (Raffel et al., JMLR 2020 §2.2 — the
    * heuristics that built the C4 corpus):
    *   - keep only lines that, trimmed, end in terminal punctuation
    *     (`.` `!` `?` `"`),
    *   - keep only lines with ≥ `minWordsPerLine` whitespace words,
    *   - drop lines containing any of `badLinePhrases`
    *     (case-insensitive; C4's "javascript" rule),
    *   - drop the whole document when its raw text contains any of
    *     `badDocPhrases` (C4's "lorem ipsum" and curly-brace rules),
    *   - drop the document when fewer than `minLinesPerDoc` lines
    *     survive (C4 uses ≥ 3 sentences; lines here).
    * Rewrites `textCol` to the trimmed surviving lines joined with
    * '\n' and adds `n_lines` (kept) / `n_dropped` (removed).
    *
    * Shape at 100 TB: pure per-row filter + lambda chain — scan speed,
    * no shuffle, no state. The per-LINE lambdas are interpreted (HOF),
    * but a document has few lines vs shingles, so the cost profile is
    * regex-dominated either way; every rule is RE2-safe and replayed
    * value-for-value by the DuckDB oracle (q_c4_clean).
    */
  def c4Clean(df: DataFrame, textCol: String = "text",
              minWordsPerLine: Int = 3, minLinesPerDoc: Int = 1,
              badLinePhrases: Seq[String] = Seq("javascript"),
              badDocPhrases: Seq[String] = Seq("lorem ipsum", "{")): DataFrame = {
    require(minWordsPerLine >= 0 && minLinesPerDoc >= 0,
      "c4Clean: thresholds must be non-negative")
    val docBad = badDocPhrases
      .map(p => lower(col(textCol)).contains(p.toLowerCase))
      .foldLeft(lit(false))(_ || _)
    val lineOk = (l: Column) => {
      val t = trim(l)
      val words = size(filter(split(t, "\\s+"), w => w =!= ""))
      val phraseHit = badLinePhrases
        .map(p => lower(t).contains(p.toLowerCase))
        .foldLeft(lit(false))(_ || _)
      t.rlike("[.!?\"]$") && words >= minWordsPerLine && !phraseHit
    }
    val allLines = split(col(textCol), "\n")
    val kept = transform(filter(allLines, lineOk), l => trim(l))
    df.filter(!docBad)
      .withColumn("__c4__", kept)
      .withColumn("n_dropped",
        (size(allLines) - size(col("__c4__"))).cast("long"))
      .filter(size(col("__c4__")) >= minLinesPerDoc)
      .withColumn(textCol, array_join(col("__c4__"), "\n"))
      .withColumn("n_lines", size(col("__c4__")).cast("long"))
      .drop("__c4__")
  }

  /** One-stop analysis frame: doc_id + all stats (the `documents` table
    * contract: text + n_chars columns exist). One pass over the text
    * via [[graft.functions.TextExprs.TextStatsRaw]]; ratios, rounding
    * and the lang/quality CASEs stay codegen'd built-ins over the raw
    * counts so float semantics match the column formulas (and the
    * DuckDB oracle) exactly.
    */
  private def withStats(df: DataFrame, textCol: String,
                        quality: Option[String]): DataFrame = {
    val s = col("__ts__")
    val praw = when(s("n_nonspace") > 0,
      s("n_punct").cast("double") / s("n_nonspace")).otherwise(0.0)
    val wraw = when(s("tok_count") > 0,
      s("tok_len_sum").cast("double") / s("tok_count")).otherwise(0.0)
    val sraw = when(s("tok_count") > 0,
      s("stop_hits").cast("double") / s("tok_count")).otherwise(0.0)
    val best = LangMarkers.map { case (lang, _) => s(s"s_$lang") }
      .reduce(greatest(_, _))
    val pick = LangMarkers.map(_._1).reverse.foldLeft(lit("en")) {
      case (acc, lang) => when(s(s"s_$lang") === best && best > 0, lang).otherwise(acc)
    }
    val lang = when(
      s("cjk").cast("double") / greatest(s("n_cp"), lit(1)) >= 0.3, "zh")
      .otherwise(pick)
    val base = df
      .withColumn("__ts__",
        graft.functions.TextExprs.textStatsRaw(col(textCol), EnStopwords, LangMarkers))
      .withColumn("ws_tokens", s("ws_tokens"))
      .withColumn("bpe_tokens", s("bpe_tokens"))
      .withColumn("punct_ratio", round(praw, 4))
      .withColumn("avg_word_len", round(wraw, 4))
      .withColumn("stopword_ratio", round(sraw, 4))
      .withColumn("lang_id", lang)
    val withQ = quality.fold(base) { nCharsCol =>
      val lenScore = when(col(nCharsCol).between(100, 10000), 1.0)
        .when(col(nCharsCol).between(20, 99), 0.5).otherwise(0.1)
      val wordScore = when(wraw.between(3, 12), 1.0).otherwise(0.3)
      val stopScore = when(sraw >= 0.05, 1.0).otherwise(0.5)
      val punctScore = when(praw <= 0.2, 1.0).otherwise(0.2)
      base.withColumn("quality",
        round(lenScore * 0.3 + wordScore * 0.3 + stopScore * 0.2 + punctScore * 0.2, 4))
    }
    withQ.drop("__ts__")
  }

  def analyze(df: DataFrame, textCol: String = "text"): DataFrame =
    withStats(df, textCol, quality = None)

  /** Corpus vocabulary stats: per-token total count and document
    * frequency. One explode + one map-side-combinable aggregation —
    * the standard "what's in this corpus" pass before tokenizer/vocab
    * decisions. `docFreq` uses count(distinct id) which Spark executes
    * as a two-phase partial-distinct aggregate (no row explosion
    * beyond the token stream itself).
    */
  def vocabulary(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text",
                 approxDocs: Boolean = false, rsd: Double = 0.05): DataFrame = {
    // exact countDistinct expands to a two-phase partial-distinct agg —
    // its state is the distinct (token, id) SET, so a stopword token's
    // buffer grows with the corpus. The HLL++ variant (`approxDocs`)
    // is the 100 TB default: fixed-size sketch per token, one pass,
    // relative error ~rsd (diffchecked ≤ 5σ vs exact at sf scale).
    // rsd sizes the sketch as ~(1.04/rsd)² 6-bit registers PER GROUP:
    // 0.05 (Spark's default) is ~400 B; 0.01 would be ~12 KB — at a
    // 10M-token vocabulary that is the difference between a 4 GB and a
    // 120 GB partial-agg hash map, so precision costs memory, not time
    // alone. Callers needing tighter error pass rsd explicitly.
    val docsAgg = if (approxDocs) approx_count_distinct(col("id"), rsd)
                  else countDistinct(col("id"))
    df.select(col(idCol).as("id"),
        explode(TextDedup.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), docsAgg.as("docs"))
  }

  // Deflater is not thread-safe and allocates native memory, so hot
  // executor threads reuse one instance each instead of paying an
  // allocation per document
  private lazy val deflaters: ThreadLocal[java.util.zip.Deflater] =
    new ThreadLocal[java.util.zip.Deflater] {
      override def initialValue(): java.util.zip.Deflater =
        new java.util.zip.Deflater(6, true)
    }

  /** Unicode SCRIPT-ratio signals: per document, the fraction of
    * non-whitespace codepoints in each major script (Latin, Han,
    * Cyrillic, Arabic, Thai), plus ASCII digits and a residual
    * "other" bucket (punctuation, symbols, unlisted scripts). The
    * language-MIX counterpart of the n-gram langid: a "English" page
    * that is 40% Han codepoints is boilerplate-wrapped CJK, mojibake,
    * or spam — scripts don't lie the way n-gram models can be fooled.
    *
    * Pure codegen'd projection: each count is
    * `len − len(regexp_replace(t, cls, ""))`, so the whole row stays
    * inside one whole-stage-codegen pass; zero shuffle at any scale.
    * Script classes are Java `\p{IsXxx}` here and RE2 `\p{Xxx}` in the
    * DuckDB oracle — same Unicode script property both ways. Empty/
    * whitespace-only docs report 0.0 everywhere.
    */
  def scriptRatios(df: DataFrame, textCol: String = "text",
                   idCol: String = "doc_id"): DataFrame = {
    // One codepoint walk per row (ScriptCountsRaw) instead of eight
    // regex traversals each materializing a stripped copy of the
    // document — semantics bit-identical to the regex formulation (see
    // the expression's scaladoc); ratio arithmetic stays in codegen'd
    // built-ins so float rounding matches the oracle exactly.
    val c = graft.functions.TextExprs.scriptCounts(col(textCol))
    val total = col("__sc__").getField("n_cp")
    def f(name: String): Column = col("__sc__").getField(name)
    def ratio(x: Column): Column =
      when(total === 0, lit(0.0)).otherwise(round(x / total, 4))
    df.withColumn("__sc__", c)
      .select(col(idCol), total.as("n_cp"),
        ratio(f("latin")).as("latin_ratio"), ratio(f("han")).as("han_ratio"),
        ratio(f("cyrillic")).as("cyrillic_ratio"),
        ratio(f("arabic")).as("arabic_ratio"),
        ratio(f("thai")).as("thai_ratio"), ratio(f("digit")).as("digit_ratio"),
        ratio(total - f("latin") - f("han") - f("cyrillic") - f("arabic")
          - f("thai") - f("digit")).as("other_ratio"))
  }

  /** Cross-source paragraph overlap: for every source pair (a < b),
    * how many distinct normalized paragraphs both contain — the
    * "contamination between corpus components" report that should be
    * read before mixing weights are chosen (two sources sharing
    * boilerplate double-count it at whatever combined weight they
    * get). Normalization matches [[TextDedup.dedupParagraphs]]
    * (lowercase + whitespace-collapse), so re-wrapped copies count.
    *
    * Shape: distinct (md5(para), source) is one hash-agg shuffle
    * bounded by the corpus paragraph count; the self-join fans out at
    * most #sources rows per hash (a paragraph's source-df is capped by
    * S, so no quadratic hot key); the result is ≤ S² rows. md5 rather
    * than xxhash64 so the DuckDB oracle replays the exact key.
    */
  def sourceOverlap(df: DataFrame, textCol: String = "text",
                    srcCol: String = "source"): DataFrame = {
    val para = df
      .select(col(srcCol).as("__src__"),
        explode(split(col(textCol), "\n{2,}")).as("__para__"))
      .withColumn("__norm__",
        lower(trim(regexp_replace(col("__para__"), "\\s+", " "))))
      .filter(col("__norm__") =!= "")
      .select(md5(col("__norm__")).as("__h__"), col("__src__"))
      .distinct()
    val a = para.toDF("__h__", "src_a")
    val b = para.toDF("__h__", "src_b")
    a.join(b, "__h__")
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Compression-ratio quality signal: deflate(level 6) size over
    * UTF-8 size. Templated/repetitive machine text compresses far
    * below natural prose (ratios ~0.1 vs ~0.4+), which makes this one
    * of the cheap Dolma/RedPajama-style heuristic filters. A Scala UDF
    * rather than a codegen expression — the zlib call dominates the
    * row cost either way — but still per-row, shuffle-free, scan
    * speed in aggregate. NULL text → NULL; empty text → 1.0.
    */
  def compressionRatio(text: Column): Column = {
    val ratio = udf((s: String) =>
      if (s == null) null
      else {
        val bytes = s.getBytes("UTF-8")
        if (bytes.isEmpty) java.lang.Double.valueOf(1.0)
        else {
          val d = deflaters.get(); d.reset(); d.setInput(bytes); d.finish()
          val buf = new Array[Byte](math.max(64, bytes.length)); var total = 0L
          while (!d.finished()) total += d.deflate(buf)
          java.lang.Double.valueOf(total.toDouble / bytes.length)
        }
      })
    ratio(text)
  }

  /** Vocabulary encoder — the map-tokens-to-ids step between corpus
    * prep and sequence packing: token ids 1..vocabSize go to the
    * corpus's most frequent tokens (ties broken token-ascending, so
    * the assignment is a deterministic total order any engine
    * reproduces), 0 is the shared OOV/unk id. Emits the encoded token
    * stream, one row per (doc, pos).
    *
    * Shape at 100 TB: one token hash-agg (map-side combinable) for the
    * counts; the rank window runs AFTER `.limit(vocabSize)`, so its
    * single-partition sort touches vocabSize rows, never the corpus;
    * then a token-keyed join of the token stream against the vocab.
    * With `broadcastVocab` (default) the join is map-side — the token
    * stream is never shuffled. A 10M-row vocab still broadcasts at
    * ~200 MB; beyond that pass false and let AQE pick a shuffled hash
    * join (hot stopword tokens are single build rows — high probe
    * fan-in, no explosion).
    */
  def encodeTokens(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text", vocabSize: Int = 65536,
                   broadcastVocab: Boolean = true): DataFrame = {
    require(vocabSize > 0, s"encodeTokens: vocabSize must be positive, got $vocabSize")
    val tk = df.select(col(idCol), posexplode(TextDedup.tokens(col(textCol)))
      .as(Seq("pos", "token")))
    val top = tk.groupBy("token").agg(count(lit(1)).as("__cnt__"))
      .orderBy(col("__cnt__").desc, col("token")).limit(vocabSize)
    val vocab0 = top.withColumn("token_id",
        row_number().over(Window.orderBy(col("__cnt__").desc, col("token")))
          .cast("long"))
      .select("token", "token_id")
    val vocab = if (broadcastVocab) broadcast(vocab0) else vocab0
    tk.join(vocab, Seq("token"), "left")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        coalesce(col("token_id"), lit(0L)).as("token_id"))
  }

  /** [[encodeTokens]] re-assembled per document: one row per doc with
    * the position-ordered `token_ids` array and its length. One
    * doc-keyed hash-agg over the encoded stream; group state is the
    * document's own ids, bounded by the longest document.
    */
  def encodeDocs(df: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text", vocabSize: Int = 65536,
                 broadcastVocab: Boolean = true): DataFrame =
    encodeTokens(df, idCol, textCol, vocabSize, broadcastVocab)
      .groupBy(idCol)
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("token_id")))),
          _.getField("token_id")).as("token_ids"),
        count(lit(1)).as("n_toks"))

  /** One-row corpus health report — the first command anyone runs on
    * a new snapshot: doc/token/char totals, mean doc length, distinct
    * text count (1 − distinct/n = exact-dup rate) and vocabulary size.
    * Two aggregations: a doc-level single pass and the token explode
    * for the vocabulary (both map-side combinable, output is 1 row).
    */
  def corpusReport(df: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    val toks = TextDedup.tokens(col(textCol))
    val base = df.select(col(idCol),
      coalesce(size(toks), lit(0)).cast("long").as("__nt__"),
      coalesce(length(col(textCol)), lit(0)).cast("long").as("__nc__"),
      md5(coalesce(col(textCol), lit(""))).as("__h__"))
    val doc = base.agg(
      count(lit(1)).as("n_docs"),
      sum(col("__nt__")).as("n_tokens"),
      sum(col("__nc__")).as("n_chars"),
      round(avg(col("__nt__")), 4).as("avg_tokens"),
      countDistinct(col("__h__")).as("distinct_texts"))
    val voc = df.select(explode(toks).as("t"))
      .agg(countDistinct(col("t")).as("vocab"))
    doc.crossJoin(voc)
  }

  /** [[analyze]] plus the composite quality score, from the same
    * single-pass raw counts (`nCharsCol` is the documents table's
    * n_chars column).
    */
  def analyzeWithQuality(df: DataFrame, textCol: String = "text",
                         nCharsCol: String = "n_chars"): DataFrame =
    withStats(df, textCol, quality = Some(nCharsCol))

  /** Per-document TF-IDF over the shared `\W+` tokenizer: one row per
    * (doc, token) with the in-doc term count `tf`, corpus document
    * frequency `df`, and `tfidf = tf · (ln((N+1)/(df+1)) + 1)` (the
    * smoothed-idf formulation, so unseen-token idf is finite and
    * every-doc tokens still score > 0). `minDocFreq` drops hapax/noise
    * tokens from the output.
    *
    * Shape at 100 TB: explode → (doc, token) hash-agg (map-side
    * combinable), doc frequency derived FROM the tf table (its
    * (id, token) exchange is identical on both sides, so Catalyst
    * reuses one shuffle), then a token-keyed join against the
    * vocab-sized frequency table and a 1-row broadcast of N. Hot
    * stopword tokens have a single build row each — high probe
    * fan-in, no row explosion, no skew salting needed.
    */
  /** BM25 sparse retrieval (Robertson & Zaragoza, "The Probabilistic
    * Relevance Framework: BM25 and Beyond", FnTIR'09; idf in the
    * Lucene `ln(1 + (N−df+0.5)/(df+0.5))` always-positive form): score
    * every document against a query string and return the top `topK`
    * as (id, score), ties broken by id.
    *
    *   score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·|d|/avgdl))
    *
    * Shape at 100 TB: the query-term `isin` prune lands map-side on
    * the exploded token stream BEFORE any shuffle, so the (id, term)
    * hash-agg only ever sees query-term postings (|q| ≈ 10 of them) —
    * corpus-size-independent state per doc. Document frequencies and
    * the (N, avgdl) row are broadcast. Per-doc contributions are
    * summed over a TERM-SORTED array so the float result is
    * deterministic and engine-portable; top-k compiles to
    * TakeOrderedAndProject (no global sort).
    */
  def bm25TopK(docs: DataFrame, query: String, topK: Int = 25,
               idCol: String = "doc_id", textCol: String = "text",
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qTerms =
      query.toLowerCase.split("\\W+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query has no tokens")
    val base = docs.select(col(idCol).as("__id__"),
      TextDedup.tokens(col(textCol)).as("__ts__"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n__"),
      avg(size(col("__ts__"))).as("__avgdl__"))
    val tf = base
      .select(col("__id__"), size(col("__ts__")).as("__dl__"),
        explode(col("__ts__")).as("__t__"))
      .filter(col("__t__").isin(qTerms: _*))
      .groupBy("__id__", "__dl__", "__t__")
      .agg(count(lit(1)).cast("double").as("__tf__"))
    val dfreq = tf.groupBy("__t__")
      .agg(count(lit(1)).cast("double").as("__df__"))
    tf.join(broadcast(dfreq), "__t__")
      .crossJoin(broadcast(stats))
      .withColumn("__c__",
        log((col("__n__") - col("__df__") + 0.5) / (col("__df__") + 0.5)
          + 1.0) *
          (col("__tf__") * (k1 + 1)) /
          (col("__tf__") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl__") / col("__avgdl__"))))
      .groupBy("__id__")
      .agg(sort_array(collect_list(struct(col("__t__"), col("__c__"))))
        .as("__cs__"))
      .withColumn("score",
        round(aggregate(col("__cs__"), lit(0.0),
          (acc, x) => acc + x.getField("__c__")), 4))
      .select(col("__id__").as(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(topK)
  }

  def tfidf(df: DataFrame, idCol: String = "doc_id",
            textCol: String = "text", minDocFreq: Int = 1): DataFrame = {
    val pairs = df.select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("token"))
    val tf = pairs.groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
    val n = df.agg(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "token")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * (log((col("n_docs") + 1).cast("double") / (col("df") + 1)) + 1))
      .select(col(idCol), col("token"), col("tf"), col("df"), col("tfidf"))
  }

  /** CCNet-style unigram language-model quality scoring (Wenzek et al.,
    * LREC'20 trains a Wikipedia LM and keeps low-perplexity web docs;
    * the reference pipeline has no analog — this is the [EXT] quality
    * gate in front of it). Token unigram probabilities are estimated on
    * `train` with add-k smoothing over the kept vocabulary:
    *
    *   p(t) = (cnt(t) + k) / (N + k·(V+1))
    *
    * where `N` is the kept-token mass, `V` the kept-vocabulary size,
    * and every out-of-vocabulary token (unseen, or below `minCount`)
    * shares the single +1 bucket: p(oov) = k / (N + k·(V+1)).
    * Each `target` doc scores `cross_entropy` = −mean ln p(tᵢ)
    * (nats/token) and `perplexity` = exp(cross_entropy); docs with
    * zero tokens emit NULL scores and n_toks = 0.
    *
    * Shape at 100 TB: one explode + token hash-agg over `train`
    * (map-side combinable), a 1-row (N, V) aggregate broadcast by
    * crossJoin, a token-keyed join of the target token stream against
    * the vocab-sized count table (hot stopwords are single build rows —
    * high fan-in, no explosion), then a doc-keyed hash-agg. No window,
    * no collect; `minCount` bounds the vocab table.
    */
  def lmScore(train: DataFrame, target: DataFrame,
              idCol: String = "doc_id", textCol: String = "text",
              addK: Double = 0.5, minCount: Long = 1L): DataFrame =
    // r18: the model feeds TWO consumers inside lmScoreWith — the
    // (N, V) driver fold and the token join — so the train-and-score
    // convenience persists it; the driver fold runs first (blocking)
    // and fills the cache, the join reads it back columnar. The
    // vocab-sized table is tiny; same caller-owned cache contract as
    // [[LangId]] (the harness clears the cache manager per query).
    // The deployment shape (train once, score many) persists the
    // model to PARQUET instead — [[lmModel]]'s scaladoc.
    lmScoreWith(
      lmModel(train, idCol, textCol, minCount)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      target, idCol, textCol, addK)

  /** The trained model of [[lmScore]]: the kept (token, cnt) unigram
    * table. Persist it once (it's just a DataFrame — write it as
    * parquet) and score any number of corpora or streams with
    * [[lmScoreWith]]; that split is the actual CCNet deployment shape
    * (train on a reference corpus, score everything else).
    */
  def lmModel(train: DataFrame, idCol: String = "doc_id",
              textCol: String = "text", minCount: Long = 1L): DataFrame =
    train.select(explode(TextDedup.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Bigram LM counts: one row per adjacent token pair in `train`
    * with its corpus count. One explode + hash-agg, map-side
    * combinable; `minCount` bounds the table like [[lmModel]]'s.
    */
  def lmModel2(train: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", minCount: Long = 1L): DataFrame =
    train.select(explode(bigramPairs(col(textCol))).as("bg"))
      .select(col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)

  /** Adjacent-token pairs of one document as an array of (t1, t2)
    * structs — pure per-row expression. */
  private def bigramPairs(text: Column): Column = {
    val toks = TextDedup.tokens(text)
    val m = greatest(size(toks) - 1, lit(0))
    zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => struct(a.as("t1"), b.as("t2")))
  }

  /** Bigram language-model scoring — one step closer to CCNet's
    * KenLM quality gate than the unigram [[lmScore]]: per-doc
    * cross-entropy of
    *
    *   p(t_i | t_{i-1}) = (c(t_{i-1}, t_i) + k) / (c1(t_{i-1}) + k·(V+1))
    *
    * add-k smoothed, where c1 is the context's count as a bigram left
    * side and V the training unigram vocabulary (unseen context ⇒
    * p = 1/(V+1)). Docs with fewer than two tokens emit NULL scores
    * and n_bigrams = 0.
    *
    * Shape at 100 TB: the model is (bigram table + its derived context
    * table) — both vocab-sized; (V, totals) fold into literals via one
    * driver action; the target's bigram stream joins the two tables on
    * their token keys (hot contexts are single build rows — high
    * fan-in, no explosion) and one doc-keyed hash-agg finishes. Same
    * plan family as [[lmScoreWith]].
    */
  def lmScore2With(model2: DataFrame, vocabSize: Long, target: DataFrame,
                   idCol: String = "doc_id", textCol: String = "text",
                   addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"lmScore2With: addK must be positive, got $addK")
    require(vocabSize >= 0, s"lmScore2With: vocabSize must be >= 0, got $vocabSize")
    val ctx = model2.groupBy("t1").agg(sum(col("cnt")).as("__c1__"))
    val kv = addK * (vocabSize + 1)
    val scored = target
      .select(col(idCol), explode(bigramPairs(col(textCol))).as("bg"))
      .select(col(idCol), col("bg.t1").as("t1"), col("bg.t2").as("t2"))
      .join(model2, Seq("t1", "t2"), "left")
      .join(ctx, Seq("t1"), "left")
      .withColumn("__logp__",
        log((coalesce(col("cnt"), lit(0L)) + addK) /
            (coalesce(col("__c1__"), lit(0L)) + kv)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"), (-avg(col("__logp__"))).as("__ce__"))
    target.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("n_bigrams", coalesce(col("n_bigrams"), lit(0L)))
      .select(col(idCol), col("n_bigrams"),
        round(col("__ce__"), 4).as("cross_entropy"),
        round(exp(col("__ce__")), 4).as("perplexity"))
  }

  /** Train-and-score convenience for [[lmScore2With]]; the vocabulary
    * size comes from one distinct-count over the training tokens.
    */
  def lmScore2(train: DataFrame, target: DataFrame,
               idCol: String = "doc_id", textCol: String = "text",
               minCount: Long = 1L, addK: Double = 0.5): DataFrame = {
    val v = train.select(explode(TextDedup.tokens(col(textCol))).as("t"))
      .agg(countDistinct(col("t"))).head().getLong(0)
    // r18: the bigram table feeds TWO consumers inside lmScore2With
    // (the scored join and the derived context table) — each re-ran
    // the corpus bigram explode+agg. Persist + materialize once
    // (eagerly: the two consumers build as concurrent join legs, and
    // a cold cache makes both recompute); vocab-sized, tiny. Same
    // caller-owned cache contract as [[lmScore]].
    val m2 = lmModel2(train, idCol, textCol, minCount)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    m2.count()
    lmScore2With(m2, v, target, idCol, textCol, addK)
  }

  /** Score `target` against a trained (STATIC) [[lmModel]]. The model
    * totals (N, V) fold into literals via one driver action over the
    * vocab-sized model — so the plan is a plain token-keyed join plus
    * one doc aggregation, no 1-row broadcast join. That shape also
    * runs on a STREAMING target (stream-static token join + one
    * complete/update-mode doc aggregation; law-checked in StreamSpec)
    * — with the one caveat that zero-token docs are absent from
    * streaming output (the batch path left-joins them back with
    * n_toks = 0, which needs a second pass over the target that a
    * stream cannot make).
    */
  def lmScoreWith(model: DataFrame, target: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  addK: Double = 0.5): DataFrame = {
    require(addK > 0, s"lmScoreWith: addK must be positive, got $addK")
    val t = model.agg(
      coalesce(sum(col("cnt")), lit(0L)).cast("double"),
      count(lit(1)).cast("double")).head()
    val denom = t.getDouble(0) + (t.getDouble(1) + 1) * addK
    val scored = target
      .select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("token"))
      .join(model, Seq("token"), "left")
      .withColumn("__logp__",
        log((coalesce(col("cnt"), lit(0L)) + addK) / lit(denom)))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"), (-avg(col("__logp__"))).as("__ce__"))
    val finish = (d: DataFrame) => d.select(col(idCol), col("n_toks"),
      round(col("__ce__"), 4).as("cross_entropy"),
      round(exp(col("__ce__")), 4).as("perplexity"))
    if (target.isStreaming) finish(scored)
    else finish(
      target.select(col(idCol)).join(scored, Seq(idCol), "left")
        .withColumn("n_toks", coalesce(col("n_toks"), lit(0L))))
  }

  /** CCNet's head/middle/tail perplexity bucketing (Wenzek et al.
    * LREC'20 §4.3 splits the scored web corpus into three equal-mass
    * groups by LM perplexity; "head" feeds the highest-quality training
    * mix). Scores `target` with the [[lmScore]] unigram LM, then
    * assigns each doc the bucket its cross-entropy falls in between
    * the exact j/`buckets` quantiles (linear interpolation over the
    * ROUNDED scores — the type-7 definition DuckDB/NumPy share, so
    * the cut points reproduce bit-for-bit across engines). Zero-token
    * docs carry NULL scores and a NULL bucket (CCNet drops them
    * before bucketing).
    *
    * Shape at 100 TB: [[lmScore]]'s plan (vocab join + doc hash-agg),
    * then ONE (buckets−1)-value percentile aggregate broadcast back
    * by crossJoin and a per-row CASE — no global sort, no window.
    * The exact percentile buffers the scored column per partition;
    * past ~10⁹ scored docs swap `percentile_approx` in — the cut
    * points move within sketch error, the semantics don't.
    */
  def perplexityBuckets(train: DataFrame, target: DataFrame,
                        idCol: String = "doc_id", textCol: String = "text",
                        addK: Double = 0.5, minCount: Long = 1L,
                        buckets: Int = 3): DataFrame = {
    require(buckets >= 2, s"perplexityBuckets: need >= 2 buckets, got $buckets")
    // r18 NOTE (measured, left alone): persisting `scored` here LOSES
    // ~0.3-0.5 s at sf0.1 — the two consumers (percentile broadcast
    // leg, labeled output) already overlap in wall time, the
    // percentile leg prunes to ONE column when it recomputes (the
    // cache materializes every column), and an eager count serializes
    // a full extra evaluation. The double evaluation is the cheaper
    // shape; the model it re-scores with IS persisted ([[lmScore]]).
    val scored = lmScore(train, target, idCol, textCol, addK, minCount)
    val ps = (1 until buckets).map(_.toDouble / buckets)
    val th = scored.agg(
      percentile(col("cross_entropy"), typedLit(ps)).as("__th__"))
    val idx = (1 to buckets - 1).foldLeft(lit(1)) { (acc, j) =>
      acc + when(col("cross_entropy") > element_at(col("__th__"), j), 1)
        .otherwise(0)
    }
    val labeled = scored.crossJoin(broadcast(th))
      .withColumn("bucket", when(col("cross_entropy").isNotNull, idx))
    val label =
      if (buckets == 3)
        when(col("bucket") === 1, "head")
          .when(col("bucket") === 2, "middle")
          .when(col("bucket") === 3, "tail")
      else col("bucket").cast("string")
    labeled.withColumn("label", label).drop("__th__")
  }

  /** fastText-shaped linear quality scoring (Joulin et al. 2016 — the
    * bag-of-tokens linear classifier that GPT-3/LLaMA-style pipelines
    * deploy as a "quality classifier"): `score = sigmoid(bias + mean
    * token weight)`, with the model supplied as a small (token,
    * weight) TABLE — the deployment shape for any exported linear
    * model. Adds `n_toks`, `score` (round 4) and `quality_keep`
    * (score ≥ threshold). Tokens absent from the model weigh 0;
    * zero-token docs score sigmoid(bias).
    *
    * Shape at 100 TB: the model is vocab-sized → BROADCAST to the
    * exploded token stream (no corpus shuffle of text payloads), then
    * one map-side-combinable doc hash-agg. Dyadic test weights keep
    * the sum order-independent; `round(4)` absorbs libm exp()
    * differences (same discipline as [[lmScoreWith]], which holds
    * cross-engine at both gate scales).
    */
  def linearScore(target: DataFrame, model: DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  bias: Double = 0.0, threshold: Double = 0.5): DataFrame = {
    val scored = target
      .select(col(idCol), explode(TextDedup.tokens(col(textCol))).as("token"))
      .join(broadcast(model.select(col("token"), col("weight"))),
        Seq("token"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_toks"),
        sum(coalesce(col("weight"), lit(0.0))).as("__ws__"))
    val raw = lit(bias) + coalesce(col("__ws__") / col("n_toks"), lit(0.0))
    target.select(col(idCol)).join(scored, Seq(idCol), "left")
      .withColumn("n_toks", coalesce(col("n_toks"), lit(0L)))
      .withColumn("score", round(lit(1.0) / (lit(1.0) + exp(-raw)), 4))
      .withColumn("quality_keep", col("score") >= threshold)
      .drop("__ws__")
  }

  /** C4-style bad-word filtering (the public C4 pipeline drops any
    * page containing a banned word; RefinedWeb keeps a soft count):
    * per-doc distinct blocklisted tokens (`n_blocked_types`), total
    * blocklisted occurrences (`n_blocked`), and the drop verdict
    * (`blocked`). Word-level exact matching over the shared `\W+`
    * tokenizer — substring false positives ("class" for "ass") are
    * deliberately impossible.
    *
    * Shape at 100 TB: the blocklist folds into the projection as an
    * array literal (real lists are ~1e2–1e4 words — kilobytes); both
    * counts are per-row array expressions. Pure projection, zero
    * shuffle, no join — the scan-speed shape a per-doc verdict should
    * have.
    */
  /** Sentence segmentation: split after `.`/`!`/`?` followed by
    * whitespace and an upper-case letter or digit. RE2-portable by
    * construction — no lookaround: the boundary is marked by a
    * capture-group `regexp_replace` that injects a `` separator
    * between `$1` (the terminator) and `$2` (the next sentence's
    * opening char), then a plain split. Abbreviation false-splits
    * ("Dr. Smith") are the documented heuristic cost every
    * regex-splitter pays. Emits (id, sent_idx, sentence) — trimmed,
    * empties dropped, 0-based index in document order.
    *
    * Shape at 100 TB: one codegen'd replace + split + posexplode per
    * row, no shuffle — sentence-level dedup/stats downstream reuse the
    * corpus machinery (e.g. [[TextDedup.dedupLinesCorpus]] at sentence
    * granularity).
    */
  def sentences(df: DataFrame, idCol: String = "doc_id",
                textCol: String = "text"): DataFrame = {
    val sep = ""
    val marked = regexp_replace(coalesce(col(textCol), lit("")),
      "([.!?])\\s+([A-Z0-9])", "$1" + sep + "$2")
    df.select(col(idCol),
      posexplode(filter(transform(split(marked, sep), s => trim(s)),
        s => s =!= "")).as(Seq("sent_idx", "sentence")))
  }

  def blocklistFilter(df: DataFrame, words: Seq[String],
                      textCol: String = "text"): DataFrame = {
    require(words.nonEmpty, "blocklistFilter needs at least one word")
    val bad = array(words.distinct.sorted.map(w => lit(w.toLowerCase)): _*)
    val toks = TextDedup.tokens(col(textCol))
    df.withColumn("__bad__", filter(toks, t => array_contains(bad, t)))
      .withColumn("n_blocked",
        coalesce(size(col("__bad__")), lit(0)).cast("long"))
      .withColumn("n_blocked_types",
        coalesce(size(array_distinct(col("__bad__"))), lit(0)).cast("long"))
      .withColumn("blocked", col("n_blocked") > 0L)
      .drop("__bad__")
  }
}
