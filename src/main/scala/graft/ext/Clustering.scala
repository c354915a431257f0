package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-based corpus curation ([EXT], SURVEY §2.10, r10): k-means
  * as a FIRST-CLASS operator over the embedding column, plus the two
  * curation ops large training-data pipelines build on it —
  * cluster-blocked semantic dedup (the actual SemDeDup mechanism,
  * Abbas et al. 2023: pairwise similarity is computed WITHIN k-means
  * clusters only, which is what makes semantic dedup tractable at
  * corpus scale) and prototype-/diversity-ranked per-cluster sampling
  * (Sorscher et al. 2022 "Beyond neural scaling laws" prototypes;
  * the cluster-stratified shape D4 uses).
  *
  * Scale shape. Training state is k×d driver-side only
  * ([[IvfIndex.train]]: deterministic hash-sorted seeds, Lloyd
  * iterations as corpus-pass aggregates). Assignment is a pure map
  * (codegen'd argmax over the broadcast centroid matrix — no
  * row amplification, no shuffle). SemDeDup's pair stage joins each
  * cluster's rows against itself only: cost Σᵢ cᵢ², bounded by the
  * largest cluster, never corpus² — k is the blocking knob, exactly
  * the paper's recipe. Sampling is one per-cluster window over rows
  * already shuffled once on `centroid_id`.
  */
object Clustering {

  import Similarity.cosine

  /** Train k-means and label every row: input columns + `centroid_id`
    * + `centroid_sim` (cosine of the row to its centroid). Returns
    * (labeled rows, centroids). Deterministic: seeds are the k
    * smallest xxhash64(id) rows, refits are bit-identical.
    */
  def kmeansAssign(spark: SparkSession, df: DataFrame, k: Int,
                   iters: Int = 3, id: String = "vec_id",
                   vec: String = "embedding"): (DataFrame, DataFrame) = {
    val centroids = IvfIndex.train(spark, df, k, iters, id, vec)
    (assignWith(df, centroids, vec), centroids)
  }

  /** Label rows with `centroid_id` + `centroid_sim` against GIVEN
    * centroids (trained, or fixed/externally supplied — the
    * oracle-replayable path).
    */
  def assignWith(df: DataFrame, centroids: DataFrame,
                 vec: String = "embedding"): DataFrame = {
    val assigned = IvfIndex.assign(df, centroids, vec)
    val cb = centroids.select(col("centroid_id"), col("centroid"))
    // broadcast k×d rows back for the per-row cosine — tiny by contract
    assigned.join(broadcast(cb), Seq("centroid_id"))
      .withColumn("centroid_sim", round(cosine(col(vec), col("centroid")), 6))
      .drop("centroid")
  }

  /** Per-cluster profile: size and the centroid-similarity spread —
    * the triage view that decides per-cluster sampling rates and
    * flags junk clusters (low mean similarity = incoherent cluster).
    */
  def clusterProfile(assigned: DataFrame): DataFrame =
    assigned.groupBy("centroid_id").agg(
      count(lit(1)).as("n"),
      round(avg("centroid_sim"), 4).as("mean_sim"),
      round(min("centroid_sim"), 4).as("min_sim"),
      round(max("centroid_sim"), 4).as("max_sim"))

  /** Cluster-blocked semantic near-dup pairs: cosine ≥ `tau` computed
    * WITHIN each cluster only (the SemDeDup blocking). A true cross-
    * cluster duplicate pair is invisible by design — the paper's
    * accepted trade; raise k for tighter blocks, lower k for higher
    * recall.
    */
  def blockedPairs(assigned: DataFrame, tau: Double,
                   id: String = "vec_id",
                   vec: String = "embedding"): DataFrame = {
    // pre-normalize ONCE per row (double precision — within ~1e-15 of
    // the exact cosine, so the subset/equality laws vs
    // [[Similarity.cosinePairs]] and the rounded-4 oracle hold), so
    // the Σcᵢ² pair stage pays one multiply-add per element instead
    // of the cosine's three accumulations — ~1/3 of the pairwise flops
    import graft.functions.VectorExprs.{l2NormalizeVecD, vecDotD}
    val a = assigned.select(col("centroid_id"), col(id).as("id_a"),
      l2NormalizeVecD(col(vec)).as("__va__"))
    val b = assigned.select(col("centroid_id"), col(id).as("id_b"),
      l2NormalizeVecD(col(vec)).as("__vb__"))
    // filter on the UNROUNDED similarity, round for display — the same
    // contract as [[Similarity.cosinePairs]] so the subset law holds
    a.join(b, Seq("centroid_id")).where(col("id_a") < col("id_b"))
      .withColumn("__s__", vecDotD(col("__va__"), col("__vb__")))
      .filter(col("__s__") >= tau)
      .select(col("centroid_id"), col("id_a"), col("id_b"),
        round(col("__s__"), 4).as("sim"))
  }

  /** SemDeDup verdict: every row labeled with its duplicate-group
    * representative (`group`) and a `keep` flag. Pairs are cluster-
    * blocked at `tau`; groups are connected components of the pair
    * graph; the kept copy per group is chosen by `keep`:
    *
    *   - `"far"`  (paper default): the copy FARTHEST from its
    *     centroid — keeping low-similarity examples preserves
    *     diversity (Abbas et al. §4.1 found it marginally best);
    *   - `"near"`: the most prototypical copy;
    *   - `"min_id"`: deterministic id order (the lexical-dedup
    *     convention elsewhere in this engine).
    *
    * Unpaired rows keep themselves. Ties break on smallest id.
    */
  def semDedup(assigned: DataFrame, tau: Double, keep: String = "far",
               id: String = "vec_id",
               vec: String = "embedding"): DataFrame = {
    require(Set("far", "near", "min_id").contains(keep),
      s"semDedup keep must be far|near|min_id, got $keep")
    val pairs = blockedPairs(assigned, tau, id, vec)
    val comps = TextDedup.components(pairs.select("id_a", "id_b"))
      .select(col("id").as(id), col("label").as("group"))
    val labeled = assigned.join(comps, Seq(id), "left")
      .withColumn("group", coalesce(col("group"), col(id)).cast("long"))
    // representative per group: rank by the keep criterion with id as
    // the deterministic tie-break; rank 1 is the kept copy
    val ord: Seq[Column] = keep match {
      case "far"    => Seq(col("centroid_sim").asc, col(id).asc)
      case "near"   => Seq(col("centroid_sim").desc, col(id).asc)
      case "min_id" => Seq(col(id).asc)
    }
    val w = Window.partitionBy(col("group")).orderBy(ord: _*)
    labeled.withColumn("__rk__", row_number().over(w))
      .withColumn("keep", col("__rk__") === 1)
      .drop("__rk__")
  }

  /** Per-cluster stratified sample: `nPer` rows from each cluster,
    * ranked by `mode` — `"prototype"` keeps the rows NEAREST their
    * centroid (cleanest class examples), `"diverse"` keeps the rows
    * FARTHEST (coverage of the cluster's fringe, the pruning metric
    * Sorscher et al. found best in the abundant-data regime). Ties
    * break on smallest id. One window over the cluster key.
    */
  def clusterSample(assigned: DataFrame, nPer: Int,
                    mode: String = "prototype",
                    id: String = "vec_id"): DataFrame = {
    require(Set("prototype", "diverse").contains(mode),
      s"clusterSample mode must be prototype|diverse, got $mode")
    val ord = mode match {
      case "prototype" => col("centroid_sim").desc
      case "diverse"   => col("centroid_sim").asc
    }
    val w = Window.partitionBy(col("centroid_id")).orderBy(ord, col(id).asc)
    assigned.withColumn("__rk__", row_number().over(w))
      .filter(col("__rk__") <= nPer)
      .drop("__rk__")
  }

  /** Build a centroid frame from literal vectors — the fixed-centroid
    * path fixtures and SQL oracles can replay.
    */
  def literalCentroids(spark: SparkSession,
                       cents: Seq[Seq[Float]]): DataFrame = {
    import spark.implicits._
    cents.zipWithIndex.map { case (c, i) => (i.toLong, c) }
      .toDF("centroid_id", "centroid")
      .withColumn("centroid", col("centroid").cast("array<float>"))
  }
}
