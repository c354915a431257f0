package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval serving ([EXT], SURVEY §2.10): a persisted BM25 inverted
  * index (train/index once, serve many queries — the sparse analog of
  * [[IvfIndex.writeIndex]]) and reciprocal-rank fusion for hybrid
  * sparse+dense retrieval (Cormack & Clarke, SIGIR'09: fusing ranked
  * lists by Σ 1/(c+rank) beats most learned combinations and needs no
  * score calibration between systems).
  *
  * No reference anchor — the reference CLI has no retrieval surface;
  * the scoring math and layout follow the public BM25/RRF literature
  * (Robertson & Zaragoza FnTIR'09; Lucene's always-positive idf).
  */
object Retrieval {

  /** Persist the BM25 inverted index for a corpus under `path`:
    *
    *   - `path/postings` — (term, doc_id, tf, dl), range-partitioned
    *     and sorted by term so every parquet row group carries a tight
    *     term min/max envelope: a query's `term IN (...)` predicate
    *     prunes to the handful of row groups holding its postings
    *     (footer skipping — the on-disk analog of an inverted list).
    *   - `path/dfreq` — (term, df), vocabulary-sized.
    *   - `path/stats` — one row (n_docs, avgdl).
    *
    * Document frequencies and stats are derived by re-reading the
    * written postings (one columnar scan of two narrow columns), not
    * by re-running the tokenize pipeline a second time.
    *
    * Shape at 100 TB: the index build is the same explode + (term,
    * doc) hash-agg TF-IDF pays — one corpus pass, one shuffle — and
    * serving never touches the corpus again. Same persistence shape as
    * [[TextDedup.writeSignatureIndex]] and [[IvfIndex.writeIndex]].
    */
  def writeBm25Index(docs: DataFrame, path: String,
                     idCol: String = "doc_id",
                     textCol: String = "text"): Unit = {
    val spark = docs.sparkSession
    val base = docs.select(col(idCol).as("doc_id"),
      TextDedup.tokens(col(textCol)).as("__ts__"))
    base
      .select(col("doc_id"), size(col("__ts__")).as("dl"),
        explode(col("__ts__")).as("term"))
      .groupBy("term", "doc_id", "dl")
      .agg(count(lit(1)).cast("double").as("tf"))
      .repartitionByRange(col("term"), col("doc_id"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(path + "/postings")
    val postings = spark.read.parquet(path + "/postings")
    postings.groupBy("term")
      .agg(count(lit(1)).cast("double").as("df"))
      .write.mode("overwrite").parquet(path + "/dfreq")
    // dl repeats per (doc, term) row; collapse to one row per doc
    // before averaging (distinct on the narrow (doc_id, dl) pair)
    postings.select("doc_id", "dl").distinct()
      .agg(count(lit(1)).cast("double").as("n_docs"),
        avg(col("dl")).as("avgdl"))
      .write.mode("overwrite").parquet(path + "/stats")
  }

  /** Score a query string against a [[writeBm25Index]] directory and
    * return the top `topK` as (doc_id, score) — identical math, tie
    * rules, and float summation order as the from-scratch
    * [[TextAnalysis.bm25TopK]], so both share one oracle.
    *
    * Shape at 100 TB: the `term IN (qTerms)` filter pushes into the
    * postings parquet scan (row-group pruning via the term-sorted
    * layout), so a search reads |q| inverted lists, never the corpus;
    * dfreq and stats are broadcast. Top-k compiles to
    * TakeOrderedAndProject.
    */
  def searchBm25Index(spark: SparkSession, path: String, query: String,
                      topK: Int = 25, k1: Double = 1.2,
                      b: Double = 0.75): DataFrame = {
    val qTerms =
      query.toLowerCase.split("\\W+").filter(_.nonEmpty).distinct.toSeq
    require(qTerms.nonEmpty, "query has no tokens")
    val postings = spark.read.parquet(path + "/postings")
      .filter(col("term").isin(qTerms: _*))
    val dfreq = spark.read.parquet(path + "/dfreq")
      .filter(col("term").isin(qTerms: _*))
    val stats = spark.read.parquet(path + "/stats")
    postings.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("__c__",
        log((col("n_docs") - col("df") + 0.5) / (col("df") + 0.5) + 1.0) *
          (col("tf") * (k1 + 1)) /
          (col("tf") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("term").as("__t__"),
        col("__c__")))).as("__cs__"))
      .withColumn("score",
        round(aggregate(col("__cs__"), lit(0.0),
          (acc, x) => acc + x.getField("__c__")), 4))
      .select(col("doc_id"), col("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Reciprocal-rank fusion: fuse ranked lists (id, rank) into
    * (id, rrf_score, n_lists), rrf_score = Σ_lists 1/(c+rank), top
    * `topK` by (score desc, id). `c` damps the head (SIGIR'09 uses 60).
    *
    * Determinism: contributions are summed in LIST ORDER (each list
    * gets its position as a tag; the per-id fold runs over the
    * tag-sorted array), so the float result is independent of shuffle
    * arrival order and reproducible in the oracle's fixed
    * coalesce(a)+coalesce(b) addition.
    *
    * Shape at 100 TB: inputs are top-N lists (already bounded — N
    * rows each, not corpora); the union + id hash-agg is tiny, and
    * top-k compiles to TakeOrderedAndProject. Fusing full-corpus
    * rankings instead would be the same plan with one real shuffle.
    */
  def rrfFuse(rankings: Seq[DataFrame], topK: Int, c: Int = 60,
              idCol: String = "id", rankCol: String = "rank"): DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (r, i) =>
      r.select(col(idCol).as("id"), lit(i).as("__list__"),
        col(rankCol).cast("long").as("__r__"))
    }
    tagged.reduce(_ unionByName _)
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("__list__"), col("__r__"))))
        .as("__rs__"))
      .withColumn("rrf_score",
        round(aggregate(col("__rs__"), lit(0.0),
          (acc, x) => acc + lit(1.0) / (lit(c.toDouble) + x.getField("__r__"))), 6))
      .select(col("id"), col("rrf_score"),
        size(col("__rs__")).cast("long").as("n_lists"))
      .orderBy(col("rrf_score").desc, col("id"))
      .limit(topK)
  }

  /** Hard-negative mining for retrieval/embedding training data ([EXT]
    * r10) — the BM25-negatives recipe of DPR (Karpukhin et al., EMNLP
    * 2020): for each (q_id, query, pos_id) training pair, the `k`
    * highest-BM25 documents for the query EXCLUDING the positive —
    * lexically confusable non-answers, the negatives that actually
    * teach a dense retriever.
    *
    * Batch shape (many queries at once): ONE corpus pass restricted
    * map-side to the union of all query terms (broadcast semi-join),
    * one (doc, term) hash-agg, a broadcast join back to the per-query
    * term lists, one (q_id, doc) hash-agg with a term-sorted
    * deterministic float fold (the [[graft.ext.TextAnalysis.bm25TopK]]
    * contract), then a per-query top-k window — the corpus never
    * shuffles on anything wider than the query-term postings.
    *
    * Near-duplicates of the positive are the classic false-negative
    * trap; compose with [[TextDedup]] components and anti-join the
    * positive's duplicate group upstream when the corpus has near-dups
    * (`q_split_leakfree`'s machinery).
    */
  def hardNegatives(docs: DataFrame, pairs: DataFrame, k: Int = 5,
                    idCol: String = "doc_id", textCol: String = "text",
                    queryCol: String = "query",
                    k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val qt = pairs.select(col("q_id"), col("pos_id"),
      explode(array_distinct(TextDedup.tokens(col(queryCol)))).as("__t__"))
    val base = docs.select(col(idCol).as("__id__"),
      TextDedup.tokens(col(textCol)).as("__ts__"))
    val stats = base.agg(count(lit(1)).cast("double").as("__n__"),
      avg(size(col("__ts__"))).as("__avgdl__"))
    val tf = base
      .select(col("__id__"), size(col("__ts__")).as("__dl__"),
        explode(col("__ts__")).as("__t__"))
      .join(broadcast(qt.select("__t__").distinct()), Seq("__t__"), "left_semi")
      .groupBy("__id__", "__dl__", "__t__")
      .agg(count(lit(1)).cast("double").as("__tf__"))
    val dfreq = tf.groupBy("__t__")
      .agg(count(lit(1)).cast("double").as("__df__"))
    val contrib = tf.join(broadcast(dfreq), "__t__")
      .crossJoin(broadcast(stats))
      .withColumn("__c__",
        log((col("__n__") - col("__df__") + 0.5) / (col("__df__") + 0.5)
          + 1.0) *
          (col("__tf__") * (k1 + 1)) /
          (col("__tf__") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl__") / col("__avgdl__"))))
      .select(col("__t__"), col("__id__"), col("__c__"))
    contrib.join(broadcast(qt), Seq("__t__"))
      .groupBy(col("q_id"), col("pos_id"), col("__id__"))
      .agg(sort_array(collect_list(struct(col("__t__"), col("__c__"))))
        .as("__cs__"))
      .withColumn("score",
        round(aggregate(col("__cs__"), lit(0.0),
          (acc, x) => acc + x.getField("__c__")), 4))
      .filter(col("__id__") =!= col("pos_id")) // the positive is not a negative
      .withColumn("__rk__", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("__id__").asc)))
      .filter(col("__rk__") <= k)
      .select(col("q_id"), col("__id__").as("neg_id"),
        col("score"), col("__rk__").cast("long").as("rank"))
  }
}
