package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the billion-vector scale
  * path for similarity search ([EXT], SURVEY §2.10): split each d-dim
  * vector into `m` subspaces of d/m dims, k-means each subspace into
  * `ksub` centroids, and store a vector as `m` small codes. At
  * d=1024 float32 and m=16/ksub=256 that is 4 KB → 16 B per vector —
  * 256× less memory, which is what makes an in-memory index of 10⁹
  * embeddings possible at all. Search uses asymmetric distance (ADC):
  * per query ONE m×ksub table of subspace dot products, then every
  * candidate costs m table lookups — the original float vectors are
  * never read at search time.
  *
  * Spark shape: training is the same deterministic Lloyd as
  * [[IvfIndex]] (per-subspace, L2 metric — subvectors are not
  * normalized, so cosine would discard magnitude); encoding is `m`
  * pure-map `nearest_centroid_l2` expressions over tiny codebooks —
  * one projection pass, no shuffle, no row amplification; search
  * broadcasts the queries WITH their ADC tables attached, so scoring
  * the code table is one scan + per-query top-k (TakeOrdered shape
  * under the window). Compose with [[IvfIndex]] lists to prune the
  * scan (classic IVF-PQ) — the building blocks here are orthogonal.
  *
  * Cosine from codes: embeddings are scored as
  *   cos(q, x) ≈ Σⱼ dot(qⱼ, c[j][codeⱼ]) / (|q| · ‖ĉ‖)
  * where ‖ĉ‖² = Σⱼ |c[j][codeⱼ]|² is the reconstruction norm — both
  * factors come from the same tables, so no float vectors at search.
  */
object PqIndex {

  /** Per-subspace codebooks: (sub_id, centroid_id, centroid), trained
    * with deterministic L2 Lloyd (seeds = ksub smallest xxhash64(id),
    * per subspace; empty clusters keep their previous centroid).
    */
  def train(spark: SparkSession, corpus: DataFrame, m: Int, ksub: Int = 16,
            iters: Int = 3, id: String = "vec_id",
            vec: String = "embedding"): DataFrame = {
    require(m > 0 && ksub > 1, s"pq: need m > 0 and ksub > 1, got m=$m ksub=$ksub")
    import spark.implicits._
    // seeds: the ksub hash-smallest vectors seed EVERY subspace (their
    // j-th slice seeds codebook j) — deterministic, one collect, which
    // also tells us the dimensionality (no separate size() job)
    val seeds = corpus.withColumn("__h", xxhash64(col(id)))
      .orderBy("__h").limit(ksub)
      .select(col(vec)).collect().map(_.getSeq[Float](0).toArray)
    require(seeds.length == ksub,
      s"pq: corpus has only ${seeds.length} rows, need >= ksub=$ksub")
    val d = seeds.head.length
    require(d % m == 0, s"pq: dim $d must be divisible by m=$m")
    val dsub = d / m
    val cids = (0 until ksub).map(_.toLong).toArray
    var books: Array[Array[Array[Float]]] = Array.tabulate(m)(j =>
      seeds.map(_.slice(j * dsub, (j + 1) * dsub)))
    // each Lloyd iteration is ONE corpus pass for all m subspaces —
    // encode all m codes in one projection, update all m codebooks in
    // one explode + two map-side-combinable aggs (vs per-subspace
    // loops, which would cost 2m scans per iteration)
    for (_ <- 1 to iters) {
      val entries = (0 until m).map { j =>
        struct(lit(j).as("sub"),
          graft.functions.VectorExprs.nearestCentroidL2(
            slice(col(vec), j * dsub + 1, dsub), cids, books(j)).as("cid"),
          slice(col(vec), j * dsub + 1, dsub).as("sv"))
      }
      val updated = corpus.select(explode(array(entries: _*)).as("e"))
        .select(col("e.sub"), col("e.cid"), posexplode(col("e.sv")))
        .groupBy("sub", "cid", "pos").agg(avg("col").as("mean"))
        .groupBy("sub", "cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("mean")))),
          x => x.getField("mean").cast("float")).as("centroid"))
        .as[(Int, Long, Seq[Float])].collect()
        .map { case (s2, c, v) => (s2, c) -> v.toArray }.toMap
      // empty clusters keep their previous centroid
      books = Array.tabulate(m)(j => Array.tabulate(ksub)(c =>
        updated.getOrElse((j, c.toLong), books(j)(c))))
    }
    spark.createDataset(
      for { j <- 0 until m; c <- 0 until ksub }
        yield (j, c.toLong, books(j)(c).toSeq))
      .toDF("sub_id", "centroid_id", "centroid")
      .withColumn("centroid", col("centroid").cast("array<float>"))
  }

  private def collectBooks(codebooks: DataFrame): Array[Array[Array[Float]]] = {
    val rows = codebooks.select("sub_id", "centroid_id", "centroid").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Float](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, g) =>
      g.sortBy(_._2).map(_._3)
    }.toArray
  }

  /** Encode every vector as its `m` per-subspace centroid ids
    * (`codes: array<bigint>`). One projection of m pure-map
    * expressions — no shuffle; the float column can be dropped after
    * this at a (d·4)/(m·1..2) compression.
    */
  def encode(corpus: DataFrame, codebooks: DataFrame,
             vec: String = "embedding"): DataFrame = {
    val books = collectBooks(codebooks)
    val m = books.length
    val dsub = books.head.head.length
    val codeCols = (0 until m).map { j =>
      graft.functions.VectorExprs.nearestCentroidL2(
        slice(col(vec), j * dsub + 1, dsub),
        books(j).indices.map(_.toLong).toArray, books(j))
    }
    corpus.withColumn("codes", array(codeCols: _*))
  }

  /** Persist a trained PQ index: `path/codebooks` (m×ksub×dsub — the
    * only training state) plus the coded corpus at `path/codes`
    * (id + m small codes, the 256×-compressed table ADC search scans).
    * Train the codebooks once, encode/serve any number of batches —
    * retraining per call is exactly what a real deployment never does.
    */
  def writeIndex(corpus: DataFrame, codebooks: DataFrame, path: String,
                 id: String = "vec_id", vec: String = "embedding"): Unit = {
    codebooks.write.mode("overwrite").parquet(path + "/codebooks")
    encode(corpus, codebooks, vec).select(col(id), col("codes"))
      .write.mode("overwrite").parquet(path + "/codes")
  }

  /** Load a [[writeIndex]] directory → (coded, codebooks). */
  def readIndex(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(path + "/codes"),
     spark.read.parquet(path + "/codebooks"))

  /** ADC top-k: approximate cosine of each query against every coded
    * vector from table lookups alone, rank per query. Queries ride as
    * a broadcast WITH their per-subspace dot tables attached (computed
    * once per query against the literal codebooks); the coded corpus
    * is scanned once, never shuffled on a key.
    */
  /** Queries + their per-subspace ADC dot tables (`__dotT__`,
    * m×ksub doubles per query) and norm (`__qn__`) — computed once per
    * query row against the literal codebooks.
    */
  private def withAdcTables(queries: DataFrame,
                            books: Array[Array[Array[Float]]],
                            qId: String, qVec: String): DataFrame = {
    val m = books.length
    val dsub = books.head.head.length
    val bookLit = typedLit(books.map(_.map(_.toSeq).toSeq).toSeq)
    val dotT = transform(sequence(lit(0), lit(m - 1)), j =>
      transform(element_at(bookLit, j + 1), c =>
        aggregate(zip_with(slice(col(qVec), j * dsub + 1, lit(dsub)), c,
          (a, b) => a.cast("double") * b.cast("double")), lit(0.0), (acc, v) => acc + v)))
    val qNorm = sqrt(aggregate(transform(col(qVec),
      x => x.cast("double") * x.cast("double")), lit(0.0), (acc, v) => acc + v))
    queries.select(col(qId), dotT.as("__dotT__"), qNorm.as("__qn__"))
  }

  /** ADC cosine of a coded row vs the tables riding on the joined
    * query: m lookups for the dot, m for the reconstruction norm.
    */
  private def adcSim(books: Array[Array[Array[Float]]]): org.apache.spark.sql.Column = {
    val m = books.length
    val normT = typedLit(books.map(_.map(c =>
      c.map(x => x.toDouble * x).sum).toSeq).toSeq)
    val idx = sequence(lit(0), lit(m - 1))
    val dot = aggregate(idx, lit(0.0), (acc, j) => acc +
      element_at(element_at(col("__dotT__"), j + 1),
        (element_at(col("codes"), j + 1) + 1).cast("int")))
    val rnorm = sqrt(aggregate(idx, lit(0.0), (acc, j) => acc +
      element_at(element_at(normT, j + 1),
        (element_at(col("codes"), j + 1) + 1).cast("int"))))
    dot / (col("__qn__") * rnorm)
  }

  def search(queries: DataFrame, coded: DataFrame, codebooks: DataFrame,
             k: Int, qId: String = "q_id", qVec: String = "q_vec",
             cId: String = "vec_id"): DataFrame = {
    require(k > 0, s"pq: k must be positive, got $k")
    val books = collectBooks(codebooks)
    val q = withAdcTables(queries, books, qId, qVec)
    val w = Window.partitionBy(qId).orderBy(col("sim").desc, col(cId).asc)
    coded.join(broadcast(q))
      .filter(col(qId) =!= col(cId))
      .withColumn("sim", adcSim(books))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** Full IVF-PQ (the faiss `IVFx,PQy` shape): probe the `nprobe`
    * nearest IVF lists per query, ADC-score ONLY those lists' coded
    * rows, exact-refine the shortlist. At a real deployment this is
    * the compounding of the two prunes — corpus/nlist·nprobe rows
    * touched, m bytes each, floats read only for the final shortlist.
    * `coded` must carry the `centroid_id` column from
    * [[IvfIndex.assign]] alongside `codes`.
    */
  def searchIvfPq(queries: DataFrame, coded: DataFrame, corpus: DataFrame,
                  codebooks: DataFrame, centroids: DataFrame, k: Int,
                  nprobe: Int = 4, shortlist: Int = 4,
                  qId: String = "q_id", qVec: String = "q_vec",
                  cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(nprobe >= 1 && k > 0 && shortlist >= 1,
      s"pq: need nprobe >= 1, k > 0, shortlist >= 1; got $nprobe/$k/$shortlist")
    val books = collectBooks(codebooks)
    val pw = Window.partitionBy(qId).orderBy(col("__csim").desc, col("centroid_id").asc)
    val probes = broadcast(queries).join(broadcast(centroids))
      .withColumn("__csim", Similarity.cosine(col(qVec), col("centroid")))
      .withColumn("__rn", row_number().over(pw))
      .filter(col("__rn") <= nprobe)
      .select(col(qId), col("centroid_id"))
    val q = withAdcTables(queries, books, qId, qVec)
    // each query ADC-scores only ITS probed lists' coded rows
    val w = Window.partitionBy(qId).orderBy(col("sim").desc, col(cId).asc)
    val short = coded.join(broadcast(probes), "centroid_id")
      .join(broadcast(q), qId)
      .filter(col(qId) =!= col(cId))
      .withColumn("sim", adcSim(books))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k * shortlist)
      .select(col(qId), col(cId))
    short
      .join(corpus.select(col(cId), col(cVec)), cId)
      .join(broadcast(queries.select(col(qId), col(qVec))), qId)
      .withColumn("sim", Similarity.cosine(col(qVec), col(cVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 4).as("sim"), col("rank"))
  }

  /** ADC + exact refine — the standard production shape: take an ADC
    * shortlist of `shortlist`·k candidates from the coded table, join
    * only THOSE rows back to their float vectors, re-rank by exact
    * cosine. Quantization error then only costs recall when a true
    * neighbor misses the whole shortlist; the float reads are
    * shortlist-sized, not corpus-sized.
    */
  def searchRefined(queries: DataFrame, coded: DataFrame, corpus: DataFrame,
                    codebooks: DataFrame, k: Int, shortlist: Int = 4,
                    qId: String = "q_id", qVec: String = "q_vec",
                    cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    require(shortlist >= 1, s"pq: shortlist factor must be >= 1, got $shortlist")
    val cand = search(queries, coded, codebooks, k * shortlist, qId, qVec, cId)
      .select(col(qId), col(cId))
    val w = Window.partitionBy(qId).orderBy(col("sim").desc, col(cId).asc)
    cand
      .join(corpus.select(col(cId), col(cVec)), cId)
      .join(broadcast(queries.select(col(qId), col(qVec))), qId)
      .withColumn("sim", Similarity.cosine(col(qVec), col(cVec)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), round(col("sim"), 4).as("sim"), col("rank"))
  }
}
