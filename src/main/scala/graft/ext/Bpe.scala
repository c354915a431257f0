package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application ([EXT],
  * SURVEY §2.10) — Sennrich et al., ACL'16: start from characters,
  * repeatedly merge the most frequent adjacent symbol pair. This is
  * the "train a tokenizer on the corpus" step of an LLM data pipeline,
  * upstream of the vocab-id encoding (`q_encode`) and token counting
  * the engine already has.
  *
  * Representation: a word's segmentation is a symbol string joined by
  * TWO spaces and padded with one space at each end (`"there"` →
  * `" t  h  e  r  e "`). Merging pair (a, b) is then ONE plain string
  * replacement of `" a  b "` with `" ab "`: the match consumes one
  * space of each two-space separator, so back-to-back occurrences
  * (`a a a a` under merge (a,a)) still each have a boundary space to
  * match on — plain left-to-right replacement becomes EXACTLY the
  * greedy pairing reference BPE uses (a single-space scheme gets runs
  * wrong: its first match eats the space the next one needs). A match
  * can never start or end inside a symbol: symbols contain no spaces,
  * and a pattern aligned anywhere but a symbol boundary demands a
  * space where the symbol has a character (law-checked against a
  * sequential reference in ExtSpec + LawsProps). Symbols come from
  * [[TextDedup.tokens]] (lowercased, `\W+`-split → `[a-z0-9_]`), so
  * replacement never meets a regex metacharacter and the same
  * `replace` chain runs verbatim in any SQL engine — that is what
  * makes the encode step DuckDB-oracle-able.
  *
  * Scale shape: training iterates on the word-TYPE table (`word`,
  * `cnt`) — vocabulary-sized (sublinear in corpus size: ~10⁷ types at
  * 100 TB), cached once; each merge is one map-side-combinable
  * pair-count aggregate + a TakeOrderedAndProject top-1 (the only
  * driver state is the merge list itself, `numMerges` pairs) + one
  * projection appended to the cached frame's lineage. The corpus is
  * read exactly once. Encoding is a pure per-row projection.
  */
object Bpe {

  /** Space-joined character symbols of one (already `[a-z0-9_]`)
    * word: `"there"` → `"t h e r e"` — the display/statistics form.
    * Pure codegen'd projection.
    */
  def symbolize(word: Column): Column =
    trim(regexp_replace(word, "(.)", "$1 "))

  /** The merge-ready form: characters joined by two spaces, one pad
    * space each end (`"the"` → `" t  h  e "`). See class doc for why
    * the double separator makes one `replace` pass exactly greedy.
    */
  def padSymbols(word: Column): Column =
    concat(lit(" "), trim(regexp_replace(word, "(.)", "$1  ")), lit(" "))

  /** Word-type table (`word`, `cnt`) of the corpus — the frame BPE
    * training iterates on. One explode + combinable hash-agg.
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextDedup.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Adjacent symbol-pair counts over a (`sym`, `cnt`) word-type
    * frame: one row per (lhs, rhs) pair with its corpus-weighted
    * count. Accepts both the single-space display form and the padded
    * two-space merge form (split on space runs). Explode of per-word
    * adjacent pairs (bounded by word length) + combinable hash-agg.
    */
  def pairCounts(types: DataFrame, symCol: String = "sym",
                 cntCol: String = "cnt"): DataFrame = {
    val syms = split(trim(col(symCol)), " +")
    val m = greatest(size(syms) - 1, lit(0))
    val pairs = zip_with(slice(syms, lit(1), m), slice(syms, lit(2), m),
      (a, b) => struct(a.as("lhs"), b.as("rhs")))
    types.select(explode(pairs).as("p"), col(cntCol))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col(cntCol)).as("cnt"))
  }

  /** Merge pair (a, b) → `ab` everywhere in a two-space-separated,
    * space-padded symbol string — one replacement pass IS greedy
    * left-to-right pairing under the double-separator invariant
    * (each side of the pattern consumes one space of a separator,
    * leaving one for the neighboring match; the result restores the
    * invariant by construction).
    */
  def applyMerge(padded: Column, a: String, b: String): Column =
    call_function("replace", padded, lit(s" $a  $b "), lit(s" $a$b "))

  /** Apply a learned merge list, in order, to one word column;
    * returns the word's BPE tokens as an array.
    */
  def segmentWord(word: Column, merges: Seq[(String, String)]): Column = {
    val merged = merges.foldLeft(padSymbols(word)) { case (c, (a, b)) =>
      applyMerge(c, a, b)
    }
    split(trim(merged), " +")
  }

  /** Train `numMerges` BPE merges on the corpus. Ties on the pair
    * count break lexicographically (lhs, then rhs) so the merge list
    * is deterministic and engine-reproducible. Stops early when no
    * pair reaches `minPairCount`.
    *
    * The word-type table (`word`, `cnt`) is cached ONCE and never
    * mutated; each iteration re-derives the current segmentation with
    * the fused [[graft.functions.TextExprs.BpeEncodeTokens]]
    * expression (the whole merge-list-so-far applied in one
    * cache-local span-merge loop per word) and pair-counts the
    * resulting symbol array — one scan per merge, ZERO lineage
    * growth. The O(m²) total re-apply work is inherent to iterating
    * on a frozen type table, but a span compare costs ~nothing next
    * to the per-merge `replace`-projection chain this replaces (which
    * needed `checkpointEvery` lineage re-materialization to stay
    * plannable at all; that parameter is now accepted and ignored).
    * Semantics are pinned by the distributed≡sequential-reference law
    * in ExtSpec — the merge list is bit-identical to the replace
    * formulation's.
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 10,
            minPairCount: Long = 2L,
            checkpointEvery: Int = 64): Seq[(String, String)] = {
    require(numMerges >= 0, s"Bpe.train: numMerges must be >= 0, got $numMerges")
    val base = wordCounts(df, textCol).persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.size < numMerges && !done) {
        val syms = graft.functions.TextExprs.bpeEncodeTokens(
          col("word"), merges.toSeq)
        val top = pairCountsFromArray(base, syms)
          .orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
        else merges += ((top(0).getString(0), top(0).getString(1)))
      }
      merges.toSeq
    } finally { base.unpersist(); () }
  }

  /** Adjacent symbol-pair counts from an ARRAY symbol column over the
    * (`word`, `cnt`) type table — the per-iteration aggregate of
    * [[train]]. Same shape as [[pairCounts]] minus the string split.
    */
  private[ext] def pairCountsFromArray(types: DataFrame, syms: Column): DataFrame = {
    val m = greatest(size(syms) - 1, lit(0))
    val pairs = zip_with(slice(syms, lit(1), m), slice(syms, lit(2), m),
      (a, b) => struct(a.as("lhs"), b.as("rhs")))
    types.select(explode(pairs).as("p"), col("cnt"))
      .groupBy(col("p.lhs").as("lhs"), col("p.rhs").as("rhs"))
      .agg(sum(col("cnt")).as("cnt"))
  }

  /** Segment every doc with a merge list and return the corpus BPE
    * token frequency table (`token`, `cnt`) — the vocabulary the
    * trained tokenizer induces. ONE fused per-row expression
    * ([[graft.functions.TextExprs.BpeEncodeTokens]]: tokenize + apply
    * every merge over a span list in a single cache-local loop per
    * document — no per-merge string allocation, no merge-count-deep
    * expression tree), then one combinable hash-agg; the text column
    * never shuffles. Law-pinned bit-identical to [[encodeUnfused]]
    * (the replace-chain formulation the DuckDB oracle replays) in
    * ExtSpec.
    */
  def encode(df: DataFrame, textCol: String = "text",
             merges: Seq[(String, String)] = Seq.empty): DataFrame =
    df.select(explode(
        graft.functions.TextExprs.bpeEncodeTokens(col(textCol), merges))
        .as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** The pre-r9 formulation of [[encode]]: per-word fold of
    * [[applyMerge]] replaces — a merge-count-deep expression tree,
    * interpreted per word. Kept as the law twin (it is literally the
    * replace chain the DuckDB oracle runs) and as the portable-SQL
    * reference; the fused expression must match it bit-for-bit.
    */
  def encodeUnfused(df: DataFrame, textCol: String = "text",
                    merges: Seq[(String, String)] = Seq.empty): DataFrame = {
    val words = TextDedup.tokens(col(textCol))
    val toks = flatten(transform(words, w => segmentWord(w, merges)))
    df.select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
  }
}
