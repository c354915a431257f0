package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for LLM training-data pipelines ([EXT],
  * SURVEY §2.10): chunking, sequence packing, weighted source mixing,
  * deterministic training-order shuffle, and PII scanning. The
  * reference stops at generic ETL (etl_cli/base.py's transform chain);
  * these are the operations a pretraining data pipeline layers on top.
  *
  * Scale design:
  *   - [[chunkTokens]] and [[piiStats]] are pure per-row expressions —
  *     scan speed, whole-stage codegen, no shuffle.
  *   - [[mixtureSample]] is a per-row hash decision + bounded explode —
  *     no shuffle, no RNG state, reproducible on any cluster size.
  *   - [[packSequences]] and [[shuffleRank]] need a GLOBAL order, which
  *     naively means a single-partition window. [[withGlobalOffset]]
  *     instead does the classic distributed prefix-sum: range-partition
  *     by the order key, cumsum within partitions in parallel, then add
  *     per-partition base offsets computed from a tiny (numPartitions
  *     rows) aggregate that Catalyst dedupes into the same shuffle via
  *     ReusedExchange. Every stage is O(n/p) per executor.
  */
object CorpusOps {

  /** Exclusive running total of `weightCol` in global `orderCol` order,
    * as column `outCol` — without ever collapsing to one partition.
    * Classic distributed prefix-sum: bucket rows by order-preserving
    * boundaries, cumsum within buckets in parallel, then add
    * per-bucket base offsets from a tiny (≤ numParts rows) aggregate.
    *
    * The bucket id is a PURE FUNCTION of the row — boundaries are
    * approximate quantiles of a monotone numeric proxy of the key,
    * collected once on the driver and folded into a literal
    * expression. The plan evaluates `df` on both the bases and the
    * probe side; because the bucket derives from data (not
    * `spark_partition_id()`), the two evaluations agree by
    * construction, with no dependence on ReusedExchange firing.
    * Offsets depend only on the global order, not on where the
    * boundaries fall, so the result is also partitioning-independent
    * (skewed or duplicate boundaries cost parallelism, never
    * correctness).
    *
    * REQUIRES: `orderCol` non-null and UNIQUE per row — the local
    * cumsum uses a row frame ordered by `orderCol` alone, so duplicate
    * keys would get nondeterministic relative offsets. Callers here
    * order by primary keys or md5 hashes, which satisfy this.
    */
  def withGlobalOffset(df: DataFrame, orderCol: String, weightCol: String,
                       outCol: String, numParts: Int = 0,
                       materializeInput: Boolean = false,
                       uniformHexKey: Boolean = false): DataFrame = {
    val p = if (numParts > 0) numParts
            else df.sparkSession.sessionState.conf.numShufflePartitions
    import org.apache.spark.sql.types.StringType
    // Monotone proxy: double cast for numerics; for strings, the first
    // three codepoints as a base-0x110000 polynomial (UTF-8 binary
    // order == codepoint order, and IEEE rounding is monotone, so
    // proxy(x) < proxy(y) ⟹ x < y; ties are allowed — they only merge
    // buckets).
    val proxy: Column = df.schema(orderCol).dataType match {
      case StringType =>
        val B = 1114112L
        ((ascii(col(orderCol)) * B + ascii(substring(col(orderCol), 2, 1))) * B
          + ascii(substring(col(orderCol), 3, 1))).cast("double")
      case _ => col(orderCol).cast("double")
    }
    val keyed = df.withColumn("__proxy__", proxy)
    // Boundaries only affect PARALLELISM, never correctness (see the
    // contract above), so they never justify an extra full pass:
    //   - md5-hex order keys (`uniformHexKey` — shuffleRank, shards,
    //     token budget) are uniform over hex strings by construction,
    //     so the boundaries are ANALYTIC: exact quantiles of the 16³
    //     equally-likely 3-hex-char proxies, computed on the driver
    //     with ZERO Spark actions (this was an eager whole-corpus
    //     approxQuantile job per call before).
    //   - other keys estimate boundaries from a 5% sample (coarse
    //     relativeError — a skewed estimate merely skews bucket sizes).
    val bnds: Array[Double] =
      if (p <= 1) Array.empty
      else if (uniformHexKey) hexProxyBoundaries(p)
      else scala.util.Try(
        keyed.sample(withReplacement = false, 0.05, seed = 42L)
          .stat.approxQuantile(
            "__proxy__", (1 until p).map(_.toDouble / p).toArray, 0.01))
        .getOrElse(Array.empty) // empty sample (tiny input) → one bucket
        .distinct.sorted
    val bucket = bnds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col("__proxy__") > lit(b), 1).otherwise(0)
    }
    // The plan below evaluates `bucketed` twice (bases aggregate +
    // probe). That is CORRECT either way — the bucket id is a pure row
    // function — but when the weight column is expensive to compute
    // (packSequences tokenizes the whole corpus for it), callers set
    // `materializeInput` to checkpoint the NARROW projection once and
    // read it back twice instead of re-running the scan. Lazy, so it
    // materializes inside the consuming job, not as an extra action.
    val bucketed0 = keyed.withColumn("__pid__", bucket).drop("__proxy__")
    val bucketed = if (materializeInput) bucketed0.localCheckpoint(eager = false)
                   else bucketed0
    // per-bucket totals → exclusive prefix over bucket ids; bucket ids
    // ascend with the global order by construction. The global-order
    // window here runs on ≤ p rows, so it is cheap by construction.
    val bases = bucketed.groupBy("__pid__")
      .agg(sum(col(weightCol)).cast("long").as("__t__"))
      .withColumn("__base__", coalesce(
        sum(col("__t__")).over(
          Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)).cast("long"))
      .select("__pid__", "__base__")
    val local = Window.partitionBy("__pid__").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(bases), "__pid__")
      .withColumn(outCol,
        col("__base__") + coalesce(sum(col(weightCol)).over(local), lit(0L)).cast("long"))
      .drop("__pid__", "__base__")
  }

  /** Exact bucket boundaries for a key whose first three characters
    * are uniform lowercase hex (any md5 output): the proxy value of
    * each of the 16³ = 4096 equally likely 3-char prefixes, sorted,
    * sampled at the p-quantile points. Pure driver arithmetic — the
    * whole point is that no Spark job runs.
    */
  private def hexProxyBoundaries(p: Int): Array[Double] = {
    val B = 1114112L
    val hex = "0123456789abcdef".map(_.toLong)
    val proxies = (for { a <- hex; b <- hex; c <- hex }
      yield ((a * B + b) * B + c).toDouble).sorted.toArray
    (1 until p).map(i => proxies(math.max(0, i * proxies.length / p - 1)))
      .distinct.sorted.toArray
  }

  /** Split each document into fixed-size token windows with overlap —
    * the chunking step in front of embedding / retrieval indexing.
    * Tokenization matches [[TextDedup.tokens]] (lowercased `\W+`) so
    * the DuckDB oracle reproduces chunks exactly. Pure per-row explode:
    * no shuffle, codegen'd, embarrassingly parallel at any scale.
    * Docs with zero tokens yield zero chunks; the last chunk of a doc
    * may be shorter than `size`.
    */
  def chunkTokens(df: DataFrame, idCol: String, textCol: String,
                  chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"chunkTokens: need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val step = chunkSize - overlap
    val toks = TextDedup.tokens(col(textCol))
    // coalesce: NULL text must mean 0 tokens — the greatest(…, 1) in
    // nChunks below IGNORES nulls (greatest(null, 1) = 1), which would
    // otherwise fabricate one empty chunk per NULL document
    val n = coalesce(size(toks).cast("long"), lit(0L))
    // windows start at 0, step, 2·step …; the last must reach n:
    // ceil((n-overlap)/step) = (n + step - overlap - 1) div step, min 1.
    // Exact in double up to 2^52 tokens — far past any single document.
    val nChunks = when(n <= 0L, 0L).otherwise(
      greatest(floor((n + (step - overlap - 1)) / lit(step.toDouble)).cast("long"), lit(1L)))
    df.withColumn("__toks__", toks)
      .withColumn("__n__", n)
      .withColumn("chunk_id",
        explode(when(nChunks > 0L, sequence(lit(0L), nChunks - 1))
          .otherwise(array().cast("array<bigint>"))))
      .select(col(idCol), col("chunk_id"),
        array_join(slice(col("__toks__"),
          (col("chunk_id") * step + 1).cast("int"), lit(chunkSize)), " ").as("chunk_text"),
        least(col("__n__") - col("chunk_id") * step, lit(chunkSize.toLong)).as("n_tokens"))
  }

  /** Pretraining sequence packing: concatenate all documents in stable
    * `idCol` order into one global token stream and cut it into
    * sequences of exactly `seqLen` tokens (the standard
    * concat-and-split packing — no padding waste, documents may span a
    * sequence boundary). Emits one row per (sequence, document)
    * overlap: `seq_id`, the document, `doc_start` (0-based offset of
    * the contributed span within the document) and `n_toks`
    * contributed. Token counts use [[TextDedup.tokens]].
    *
    * The only global step is the prefix-sum of document lengths
    * ([[withGlobalOffset]] — distributed); everything after is a
    * per-row explode over the ≤ (n/seqLen + 1) sequences a document
    * touches.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    seqLen: Int, numParts: Int = 0,
                    orderCol: String = "",
                    uniformHexOrder: Boolean = false): DataFrame =
    packedOverlaps(df, idCol, textCol, seqLen, numParts, orderCol, uniformHexOrder)
      .select(col("seq_id"), col(idCol),
        greatest(col("seq_id") * seqLen - col("__off__"), lit(0L)).as("doc_start"),
        col("__sp_toks__").as("n_toks"))

  /** Shared core of [[packSequences]] / [[packAttentionSpans]]: one row
    * per (sequence, document) overlap with the document's global token
    * offset (`__off__`), its span start WITHIN the sequence
    * (`__sp_start__`) and span length (`__sp_toks__`) still attached.
    */
  private def packedOverlaps(df: DataFrame, idCol: String, textCol: String,
                             seqLen: Int, numParts: Int,
                             orderCol: String,
                             uniformHexOrder: Boolean = false): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive, got $seqLen")
    // pack in `orderCol` order when given (e.g. an epoch-shuffle rank),
    // in stable `idCol` order otherwise
    val ord = if (orderCol.nonEmpty) orderCol else idCol
    val n = size(TextDedup.tokens(col(textCol))).cast("long")
    val base = if (ord == idCol) df.select(col(idCol), n.as("__n__"))
               else df.select(col(idCol), col(ord), n.as("__n__"))
    val t = base.filter(col("__n__") > 0L)
    // materialize the (id, order, token-count) projection: the weight
    // here costs a full tokenize of the corpus — one scan, not two
    val off = withGlobalOffset(t, ord, "__n__", "__off__", numParts,
      materializeInput = true, uniformHexKey = uniformHexOrder)
    off
      .withColumn("seq_id",
        explode(sequence(expr(s"__off__ div $seqLen"),
          expr(s"(__off__ + __n__ - 1) div $seqLen"))))
      .withColumn("__sp_start__",
        greatest(col("__off__"), col("seq_id") * seqLen)
          - col("seq_id") * seqLen)
      .withColumn("__sp_toks__",
        least(col("__off__") + col("__n__"), (col("seq_id") + 1) * seqLen)
          - greatest(col("__off__"), col("seq_id") * seqLen))
  }

  /** Attention-mask boundaries for packed sequences: one row per
    * `seq_id` with the ordered document spans it contains as three
    * ALIGNED arrays — `doc_ids`, `seq_starts` (0-based token offset of
    * each span within the sequence) and `span_toks` — plus `n_docs`
    * and `n_toks` totals. This is exactly what a trainer needs to
    * build the block-diagonal attention mask (and position-id resets)
    * for concat-and-split packing: tokens [seq_starts(i),
    * seq_starts(i)+span_toks(i)) attend only within document
    * doc_ids(i).
    *
    * Scale shape: [[packedOverlaps]] (prefix-sum + bounded explode)
    * followed by ONE hash-agg keyed by `seq_id`. Each group holds at
    * most seqLen spans (a span is ≥ 1 token), so collect_list state is
    * bounded by seqLen per group regardless of corpus size. Spans sort
    * by `seq_starts` inside the group — positional order, valid for
    * any `orderCol`.
    */
  def packAttentionSpans(df: DataFrame, idCol: String, textCol: String,
                         seqLen: Int, numParts: Int = 0,
                         orderCol: String = ""): DataFrame =
    packedOverlaps(df, idCol, textCol, seqLen, numParts, orderCol)
      .groupBy("seq_id")
      .agg(sort_array(collect_list(
          struct(col("__sp_start__").as("s"), col("__sp_toks__").as("t"),
            col(idCol).cast("string").as("d")))).as("__spans__"))
      .select(col("seq_id"),
        transform(col("__spans__"), _.getField("d")).as("doc_ids"),
        transform(col("__spans__"), _.getField("s")).as("seq_starts"),
        transform(col("__spans__"), _.getField("t")).as("span_toks"),
        size(col("__spans__")).cast("long").as("n_docs"),
        aggregate(col("__spans__"), lit(0L),
          (a, s) => a + s.getField("t")).as("n_toks"))

  /** Deterministic weighted source mixing (Pile/Dolma-style mixture
    * weights): each row is kept `floor(w)` times plus one more with
    * probability `frac(w)`, where `w` is its source's weight — so
    * w=0.25 downsamples to a quarter, w=2.5 emits 2–3 epochs. The
    * "coin flip" is the first 8 hex digits of md5(key) compared to a
    * fixed hex cutoff: no RNG, reproducible across runs, cluster
    * sizes, AND engines (the DuckDB oracle replays it bit-for-bit).
    * Per-row decision + bounded explode — no shuffle.
    */
  def mixtureSample(df: DataFrame, keyCol: String, sourceCol: String,
                    weights: Map[String, Double],
                    defaultWeight: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "mixtureSample: weights must be non-negative")
    val hex = substring(md5(col(keyCol).cast("string")), 1, 8)
    def copiesFor(w: Double): Column = {
      val base = math.floor(w).toLong
      val frac = w - base
      if (frac == 0.0) lit(base)
      else lit(base) + when(hex < lit(f"${(frac * 4294967296d).toLong}%08x"), 1L)
        .otherwise(0L)
    }
    val copies = weights.toSeq.sortBy(_._1).foldLeft(copiesFor(defaultWeight)) {
      case (acc, (s, w)) => when(col(sourceCol) === s, copiesFor(w)).otherwise(acc)
    }
    df.withColumn("copy",
      explode(when(copies >= 1L, sequence(lit(1L), copies))
        .otherwise(array().cast("array<bigint>"))))
  }

  /** Temperature-based source re-balancing — the multilingual LLM data
    * recipe (alpha-scaled sampling, e.g. XLM-R's alpha 0.3): source s
    * with natural share p_s gets target share q_s = p_s^alpha / Σp^alpha,
    * so each row of s carries multiplier m_s = q_s / p_s (expected
    * corpus size is preserved: Σ p_s·m_s = 1). alpha = 1 is the
    * identity; alpha → 0 flattens toward uniform shares, upsampling
    * rare sources — `maxMultiplier` caps the duplication blow-up.
    * Fractional multipliers resolve through [[mixtureSample]]'s
    * deterministic md5 coins.
    *
    * Scale shape: ONE map-side-combinable count agg collected to the
    * driver (bounded by the number of sources, not rows), then the
    * stateless mixtureSample projection. The share math sums in sorted
    * source order so the oracle can replicate it bit-for-bit.
    */
  def temperatureSample(df: DataFrame, keyCol: String, sourceCol: String,
                        alpha: Double, maxMultiplier: Double = 100.0): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"temperatureSample: need 0 < alpha <= 1, got $alpha")
    require(maxMultiplier >= 1, s"temperatureSample: maxMultiplier must be >= 1")
    // NULL sources carry weight 0 (dropped) — mixtureSample's
    // `=== source` test is never true for NULL anyway, so excluding
    // them from the share math keeps semantics consistent AND avoids a
    // null key in the driver-side sortBy (String ordering NPEs).
    val counts = df.groupBy(col(sourceCol).cast("string").as("__s__"))
      .agg(count(lit(1)).as("__n__"))
      .filter(col("__s__").isNotNull)
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .sortBy(_._1) // deterministic float-sum order (oracle replicates)
    if (counts.isEmpty) // empty or all-NULL sources: nothing to weight
      return mixtureSample(df, keyCol, sourceCol, Map.empty, defaultWeight = 0.0)
    val n = counts.map(_._2).sum.toDouble
    val pa = counts.map { case (s, c) => s -> math.pow(c / n, alpha) }
    val z = pa.map(_._2).sum
    val weights = counts.zip(pa).map { case ((s, c), (_, a)) =>
      s -> math.min(a / z / (c / n), maxMultiplier)
    }.toMap
    mixtureSample(df, keyCol, sourceCol, weights, defaultWeight = 0.0)
  }

  /** Deterministic global training-order shuffle: rank every row by
    * md5(seed:key) — a reproducible random permutation (change `seed`
    * for a new epoch order). Ranks come from the distributed
    * prefix-sum over the hash order, not a single-partition
    * row_number, so this holds at any corpus size.
    */
  def shuffleRank(df: DataFrame, keyCol: String, seed: String = "graft",
                  outCol: String = "shuffle_rank", numParts: Int = 0): DataFrame = {
    val keyed = df
      .withColumn("__h__", md5(concat(lit(seed + ":"), col(keyCol).cast("string"))))
      .withColumn("__one__", lit(1L))
    withGlobalOffset(keyed, "__h__", "__one__", outCol, numParts,
      uniformHexKey = true)
      .withColumn(outCol, col(outCol) + 1L)
      .drop("__h__", "__one__")
  }

  /** PII patterns — the RE2-compatible subset (no lookaround), so the
    * same pattern runs identically under Java regex (Spark codegen)
    * and RE2 (DuckDB oracle). The richer lookaround-based phone
    * heuristic lives in the `redact_phone` transformer; this scanner
    * trades a little precision for cross-engine verifiability.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "(?i)\\bhttps?://[^\\s<>\"]+"

  /** Octets constrained to 0-255 (longest-alternative-first, so Java's
    * leftmost-first and RE2's agree), which rejects `999.999.999.999`.
    * Version-like strings (`1.2.3.4`) still match — indistinguishable
    * from an IP without context; counted as the documented tradeoff.
    */
  val Ipv4Re = "\\b(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)" +
    "(?:\\.(?:25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}\\b"
  val PhoneRe = "\\+\\d[\\d\\s().-]{6,}\\d|\\(\\d{2,4}\\)[\\s.-]?\\d[\\d\\s.-]{4,}\\d"

  /** Per-document PII scan: counts of emails / URLs / IPv4s / phone
    * numbers plus a `has_pii` flag (emails|phones|ips — URLs are
    * counted but not PII by themselves). Counting, not redacting: the
    * audit pass that decides whether a shard needs the redact
    * transformers (`redact_email`/`redact_url`/`redact_phone`). Pure
    * per-row regexes — scan speed, no shuffle.
    */
  /** The last mile of the pretraining pipeline: epoch-shuffle the
    * corpus ([[shuffleRank]] with `seed` — a new seed is a new epoch
    * order), pack the token stream in that order ([[packSequences]]),
    * and deal sequences round-robin onto `numShards` shards.
    * Round-robin on `seq_id` makes shard sizes exact (±1 sequence) and
    * keeps each shard a uniform sample of the global order; a worker
    * reading shard k in `seq_id` order replays its slice of the epoch
    * order. Emits (shard_id, seq_id, id, doc_start, n_toks).
    * Deterministic end-to-end: no RNG state, bit-reproducible on any
    * cluster size AND in the DuckDB oracle.
    */
  def trainingShards(df: DataFrame, idCol: String, textCol: String,
                     seqLen: Int, numShards: Int,
                     seed: String = "graft", numParts: Int = 0): DataFrame = {
    require(numShards > 0, s"trainingShards: numShards must be positive, got $numShards")
    // packing in [[shuffleRank]] order == packing in md5 order (the
    // rank is monotone in the hash), so order by the hash directly and
    // skip the rank's own prefix-sum pass entirely
    val hashed = df.select(col(idCol), col(textCol))
      .withColumn("__h__", md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
    packSequences(hashed, idCol, textCol, seqLen, numParts, orderCol = "__h__",
      uniformHexOrder = true)
      .withColumn("shard_id", pmod(col("seq_id"), lit(numShards.toLong)))
  }

  /** Write [[trainingShards]] output as one hive-partitioned dataset:
    * `path/shard_id=K/part-*.parquet`, each shard's rows sorted by
    * (seq_id, doc_start) so a shard file replays its slice of the
    * epoch order with a plain sequential read. One shuffle (hash on
    * shard_id), sort within partitions — no global sort.
    */
  def writeTrainingShards(df: DataFrame, idCol: String, textCol: String,
                          seqLen: Int, numShards: Int, path: String,
                          seed: String = "graft"): Unit =
    trainingShards(df, idCol, textCol, seqLen, numShards, seed)
      .repartition(numShards, col("shard_id"))
      .sortWithinPartitions("shard_id", "seq_id", "doc_start")
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)

  /** Keep documents, in the deterministic md5(seed:id) epoch order,
    * until a global token budget is reached: every doc whose exclusive
    * running token total is still below `budget` survives (so the kept
    * set overshoots by at most one document — the standard "sample
    * exactly ~B tokens for this run" cut). Emits the surviving docs
    * with `tok_offset` (exclusive prefix total) and `n_toks`.
    * One [[withGlobalOffset]] prefix-sum — distributed, no
    * single-partition window; deterministic across runs, cluster
    * sizes, and engines.
    */
  def takeTokenBudget(df: DataFrame, idCol: String, textCol: String,
                      budget: Long, seed: String = "graft",
                      numParts: Int = 0): DataFrame = {
    require(budget > 0, s"takeTokenBudget: budget must be positive, got $budget")
    val n = coalesce(size(TextDedup.tokens(col(textCol))).cast("long"), lit(0L))
    val keyed = df
      .withColumn("__h__", md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
      .withColumn("__n__", n)
    withGlobalOffset(keyed, "__h__", "__n__", "tok_offset", numParts,
      materializeInput = true, uniformHexKey = true)
      .filter(col("tok_offset") < budget)
      .withColumn("n_toks", col("__n__"))
      .drop("__h__", "__n__")
  }

  def piiStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    // one RegexCounts pass (count-only — no per-pattern match-array
    // materialization); the four size(regexp_extract_all(…)) columns
    // this replaces are law-checked equal in CorpusOpsSpec. coalesce:
    // a NULL text must audit as zero findings, not NULL counts (which
    // would also make has_pii NULL and break filters)
    val counts = graft.functions.TextExprs.regexCounts(
      col(textCol), Seq(EmailRe, UrlRe, Ipv4Re, PhoneRe))
    def cnt(i: Int) = coalesce(element_at(col("__pc__"), i), lit(0L))
    df.withColumn("__pc__", counts)
      .withColumn("n_emails", cnt(1))
      .withColumn("n_urls", cnt(2))
      .withColumn("n_ips", cnt(3))
      .withColumn("n_phones", cnt(4))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0L)
      .drop("__pc__")
  }

  /** One-pass PII redaction: replace every email / URL / IPv4 / phone
    * match with its placeholder token, in that fixed order (the order
    * is part of the contract — the oracle replays the identical chain,
    * so overlap resolution can never diverge between engines). The
    * same RE2-compatible patterns as [[piiStats]]: scan first to
    * decide WHICH shards need this, then redact — both passes are pure
    * per-row regex projections, scan speed, no shuffle.
    *
    * NULL text stays NULL (a redactor must not invent content).
    */
  /** Deterministic train/val/test assignment keyed by a GROUP id
    * instead of the row id: every row of a group lands in the same
    * split. `groups` supplies (id, label) rows for ids that belong to
    * a multi-row group (label = the group's representative, e.g. its
    * smallest id); ungrouped ids fall back to themselves, so singleton
    * docs split exactly like a plain `hash_split` on the id. The
    * assignment itself is [[graft.functions.Transformers.hashSplitColumn]]
    * — no RNG, stable across runs and cluster sizes.
    *
    * Shape at 100 TB: one left join against the (small — only grouped
    * ids) label table plus a pure hash projection; no extra shuffle
    * beyond the join, which broadcasts when the dup set is small.
    */
  def splitByGroup(df: DataFrame, idCol: String, groups: DataFrame,
                   weights: Seq[(String, Double)],
                   method: String = "md5",
                   outCol: String = "split"): DataFrame = {
    // defensive uniqueness: `groups` must be keyed by id ([[TextDedup
    // .components]] output is), but a caller passing a frame with
    // duplicate ids (e.g. raw minhashPairs output) would silently
    // DUPLICATE input rows through the left join — collapse to the
    // deterministic min label per id instead (one agg over the small
    // group table, broadcast unaffected)
    val g = groups.select(col("id").as("__gid__"), col("label").as("__label__"))
      .groupBy("__gid__").agg(min(col("__label__")).as("__label__"))
    df.join(g, col(idCol) === col("__gid__"), "left")
      .withColumn(outCol, graft.functions.Transformers.hashSplitColumn(
        coalesce(col("__label__"), col(idCol)), method, weights))
      .drop("__gid__", "__label__")
  }

  /** Leakage-safe corpus splits: assignment by the NEAR-DUP cluster
    * representative, so near-duplicate documents can never straddle
    * train/eval — the standard guard against the measurable eval
    * contamination duplicated text causes (Lee et al., ACL'22;
    * cf. etl_cli has no notion of this — split hygiene is an [EXT]
    * concern). Clusters come from [[TextDedup.minhashPairs]] →
    * [[TextDedup.components]]; the split is then one hash projection
    * via [[splitByGroup]]. For EXACT-dup safety only (SQL-expressible,
    * DuckDB-oracled as `q_split_leakfree`), pass groups keyed by
    * min-id-per-normalized-text instead.
    */
  def leakSafeSplits(df: DataFrame, idCol: String, textCol: String,
                     weights: Seq[(String, Double)],
                     n: Int = 3, threshold: Double = 0.8,
                     method: String = "md5",
                     outCol: String = "split",
                     indexPath: Option[String] = None): DataFrame = {
    // signature-index reuse: when a persisted index
    // ([[TextDedup.writeSignatureIndex]]) already covers this corpus,
    // mine pairs from its parquet tables instead of re-deriving
    // shingles+signatures from text — at 6M docs the signature build
    // is ~⅔ of the mine cost, paid once per corpus instead of per
    // consumer. Law-pinned identical output to the from-text path.
    val pairs = indexPath match {
      case Some(p) => TextDedup.minhashPairsFromIndex(df.sparkSession, p, threshold)
      case None => TextDedup.minhashPairs(df, idCol, textCol, n, threshold)
    }
    splitByGroup(df, idCol, TextDedup.components(pairs), weights, method, outCol)
  }

  def piiRedact(df: DataFrame, textCol: String = "text",
                emailToken: String = "<EMAIL>", urlToken: String = "<URL>",
                ipToken: String = "<IP>",
                phoneToken: String = "<PHONE>"): DataFrame = {
    val red = Seq(EmailRe -> emailToken, UrlRe -> urlToken,
      Ipv4Re -> ipToken, PhoneRe -> phoneToken)
      .foldLeft(col(textCol)) { case (c, (pat, tok)) =>
        regexp_replace(c, pat, tok)
      }
    df.withColumn(textCol, red)
  }
}
