package graft.ext

import graft.functions.TextExprs
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BYTE-LEVEL byte-pair encoding ([EXT] §2.10, r13) — the GPT-2 /
  * cl100k tokenizer family (Radford et al. 2019): pretokenize with a
  * regex that keeps the leading space on words, map each pretoken's
  * UTF-8 BYTES through a fixed byte↔char bijection, and BPE-merge over
  * the mapped chars. Because the alphabet covers every byte, ANY
  * UTF-8 input — emoji, CJK, mixed scripts, control bytes — encodes
  * with zero OOV and `decode(encode(x)) == x` exactly (the law the
  * spec pins for arbitrary inputs). This is the tokenizer real LLM
  * corpora are measured and budgeted in; it completes the family next
  * to whitespace-word BPE ([[Bpe]], Sennrich) and Unigram-LM
  * ([[UnigramLm]], Kudo).
  *
  * vs [[Bpe]]: no lowercasing (byte-level vocabularies are
  * case-bearing), no `\W` tokenizer (whitespace is DATA — the leading
  * space distinguishes word-initial tokens), and symbols are mapped
  * BYTES, not letters. The pretokenizer is the RE2-COMPATIBLE subset
  * of GPT-2's pattern (no lookahead, no contraction special-cases) so
  * the DuckDB oracle can replay it verbatim — see
  * [[TextExprs.ByteAlphabet.Pretokenizer]].
  *
  * Scale shape — identical to [[Bpe]]'s: training iterates on the
  * byte-mapped pretoken-TYPE table (vocabulary-sized, cached once;
  * one combinable pair-count aggregate + top-1 per merge; driver
  * state = the merge list). Encoding is one fused per-row expression
  * ([[TextExprs.ByteBpeTokens]]) + a combinable hash-agg; the text
  * column never shuffles.
  */
object ByteBpe {

  /** Byte-mapped pretoken-type table (`word`, `cnt`) — the frame
    * training iterates on. One explode + combinable hash-agg.
    */
  def wordCounts(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(explode(TextExprs.byteBpePretokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` byte-level merges. Ties break lexicographically
    * (lhs, then rhs) — deterministic, engine-reproducible; stops early
    * below `minPairCount`. Same frozen-type-table loop as
    * [[Bpe.train]], re-segmenting with the fused span-merge each
    * round (zero lineage growth, corpus read exactly once).
    */
  def train(df: DataFrame, textCol: String = "text", numMerges: Int = 10,
            minPairCount: Long = 2L): Seq[(String, String)] = {
    require(numMerges >= 0,
      s"ByteBpe.train: numMerges must be >= 0, got $numMerges")
    val base = wordCounts(df, textCol).persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var done = false
      while (merges.size < numMerges && !done) {
        val syms = TextExprs.spanMergeWord(col("word"), merges.toSeq)
        val top = Bpe.pairCountsFromArray(base, syms)
          .orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
        else merges += ((top(0).getString(0), top(0).getString(1)))
      }
      merges.toSeq
    } finally { base.unpersist(); () }
  }

  /** Byte-level token array of one document (mapped-alphabet
    * strings) — the fused encode.
    */
  def encodeTokens(text: Column, merges: Seq[(String, String)]): Column =
    TextExprs.byteBpeTokens(text, merges)

  /** Corpus token-frequency table (`token`, `cnt`) under a merge
    * list — the vocabulary view, same shape as [[Bpe.encode]].
    */
  def encode(df: DataFrame, textCol: String = "text",
             merges: Seq[(String, String)] = Seq.empty): DataFrame =
    df.select(explode(encodeTokens(col(textCol), merges)).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))

  /** Decode a mapped-alphabet string (one token or a concatenation)
    * back to the original UTF-8 text.
    */
  def decode(mapped: Column): Column = TextExprs.byteBpeUnmap(mapped)

  /** `decode(concat(tokens)) == text` for every row — the no-OOV
    * round-trip law as a boolean column.
    */
  def roundTrips(text: Column, merges: Seq[(String, String)]): Column =
    decode(concat_ws("", encodeTokens(text, merges))) === text

  // ── DuckDB oracle generation ───────────────────────────────────────

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** DuckDB `map(...)` literal for hex-byte → mapped-alphabet-char
    * (keys match DuckDB's UPPERCASE `hex()`), built from `chr()`
    * calls so no alphabet char needs SQL escaping.
    */
  def duckdbByteMap: String = {
    val keys = (0 until 256).map(b => f"'$b%02X'").mkString(", ")
    val vals = (0 until 256)
      .map(b => s"chr(${TextExprs.ByteAlphabet.byteToChar(b).toInt})")
      .mkString(", ")
    s"map([$keys], [$vals])"
  }

  /** ANSI-ish DuckDB SQL computing the (`token`, `cnt`) table of
    * [[encode]] from `documents` — independent replay of the whole
    * pipeline: RE2 pretokenize → hex-pair byte map → two-space padded
    * symbol string → the fixed merge list as a replace chain → split,
    * unnest, count. The merge-list replace chain is the same
    * double-separator trick [[Bpe]]'s oracle uses (one replace pass
    * IS greedy pairing).
    */
  def duckdbEncodeSql(merges: Seq[(String, String)],
                      docsRelation: String = "documents"): String = {
    val padded = merges.foldLeft("padded") { case (acc, (a, b)) =>
      s"replace($acc, ${sqlStr(s" $a  $b ")}, ${sqlStr(s" $a$b ")})"
    }
    s"""WITH pretoks AS (
       |  SELECT unnest(regexp_extract_all(text,
       |    ${sqlStr(TextExprs.ByteAlphabet.Pretokenizer)})) AS pt
       |  FROM $docsRelation
       |), mapped AS (
       |  SELECT array_to_string(list_transform(
       |    range(1, octet_length(encode(pt)) + 1),
       |    i -> $duckdbByteMap[substr(hex(encode(pt)), (i-1)*2+1, 2)][1]
       |  ), '') AS w
       |  FROM pretoks
       |), padded AS (
       |  SELECT ' ' || array_to_string(list_transform(range(1, length(w) + 1),
       |    i -> substr(w, i, 1)), '  ') || ' ' AS padded
       |  FROM mapped
       |)
       |SELECT token, count(*) AS cnt
       |FROM (SELECT unnest(string_split_regex(trim($padded), ' +')) AS token
       |      FROM padded)
       |WHERE token <> ''
       |GROUP BY token""".stripMargin
  }
}
