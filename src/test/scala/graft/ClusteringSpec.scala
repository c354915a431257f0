package graft

import graft.ext.{Clustering, IvfIndex, Similarity}
import org.apache.spark.sql.functions._

/** Cluster-curation laws: deterministic k-means refit, assignment
  * exactness vs a brute argmax, planted-label purity, SemDeDup's
  * blocked pairs ⊆/≡ brute same-cluster pairs, representative choice
  * per keep mode, and per-cluster sampling bounds/order.
  */
class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("embeddings")

  test("kmeans refit is bit-identical; assignment matches brute argmax") {
    val (a1, c1) = Clustering.kmeansAssign(spark, emb, k = 10, iters = 3)
    val (a2, c2) = Clustering.kmeansAssign(spark, emb, k = 10, iters = 3)
    assert(rows(c1.orderBy("centroid_id")) == rows(c2.orderBy("centroid_id")))
    assert(rows(a1.select("vec_id", "centroid_id").orderBy("vec_id")) ==
      rows(a2.select("vec_id", "centroid_id").orderBy("vec_id")))
    // exactness: the pure-map argmax equals the brute join+window argmax
    val brute = emb.select($"vec_id", $"embedding")
      .crossJoin(broadcast(c1))
      .withColumn("s", Similarity.cosine($"embedding", $"centroid"))
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
          .orderBy($"s".desc, $"centroid_id".asc)))
      .filter($"rk" === 1).select($"vec_id", $"centroid_id")
    assert(rows(a1.select("vec_id", "centroid_id").orderBy("vec_id")) ==
      rows(brute.orderBy("vec_id")))
  }

  test("planted well-separated clusters recovered with purity >= 0.95") {
    // the embeddings testdata plants near-dup PAIRS, not cosine
    // clusters (mean within-label cosine ≈ 0.002 — measured), so the
    // purity law runs on synthetic data: 8 orthogonal-ish centers,
    // members = center + small deterministic jitter
    val d = 32; val perC = 60
    val rows8 = for (c <- 0 until 8; i <- 0 until perC) yield {
      val v = Array.tabulate(d) { j =>
        val base = if (j == c * 4) 1.0f else 0.0f
        // deterministic jitter in [-0.05, 0.05]
        base + (((c * 131 + i * 17 + j * 7) % 11) - 5) / 100.0f
      }
      (c.toLong * perC + i, v.toSeq, c)
    }
    val df = rows8.toDF("vec_id", "embedding", "truth")
      .withColumn("embedding", $"embedding".cast("array<float>"))
    val (assigned, _) = Clustering.kmeansAssign(spark, df, k = 8, iters = 5)
    val purity = assigned.groupBy("centroid_id", "truth").count()
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"centroid_id")
          .orderBy($"count".desc, $"truth".asc)))
      .filter($"rk" === 1)
      .agg(sum("count")).as[Long].head().toDouble / (8 * perC)
    assert(purity >= 0.95, s"cluster purity $purity")
  }

  test("cluster profile: sizes sum to n, sims within [-1, 1]") {
    val (assigned, cents) = Clustering.kmeansAssign(spark, emb, k = 10)
    val prof = Clustering.clusterProfile(assigned)
    assert(prof.agg(sum("n")).as[Long].head() == emb.count())
    assert(prof.count() <= 10 && cents.count() == 10)
    assert(prof.filter($"min_sim" < -1.0001 || $"max_sim" > 1.0001).isEmpty)
  }

  test("blocked pairs ≡ brute pairs restricted to same-cluster; subset of brute") {
    val (assigned, _) = Clustering.kmeansAssign(spark, emb, k = 10)
    val tau = 0.35
    val blocked = Clustering.blockedPairs(assigned, tau)
      .select("id_a", "id_b", "sim")
    val brute = Similarity.cosinePairs(emb, tau)
    // subset law
    assert(blocked.join(brute, Seq("id_a", "id_b"), "left_anti").isEmpty)
    // equality on the same-cluster restriction
    val cl = assigned.select($"vec_id", $"centroid_id")
    val bruteSame = brute
      .join(cl.select($"vec_id".as("id_a"), $"centroid_id".as("ca")), "id_a")
      .join(cl.select($"vec_id".as("id_b"), $"centroid_id".as("cb")), "id_b")
      .filter($"ca" === $"cb").select("id_a", "id_b", "sim")
    assert(rows(blocked.orderBy("id_a", "id_b")) ==
      rows(bruteSame.orderBy("id_a", "id_b")))
  }

  test("semDedup: one keeper per group; keep=far keeps the min centroid_sim") {
    val (assigned, _) = Clustering.kmeansAssign(spark, emb, k = 10)
    val v = Clustering.semDedup(assigned, tau = 0.35, keep = "far")
    assert(v.count() == emb.count(), "verdict labels every row")
    val perGroup = v.groupBy("group")
      .agg(sum(when($"keep", 1).otherwise(0)).as("keepers"),
        min("centroid_sim").as("lo"),
        min(when($"keep", $"centroid_sim")).as("keptSim"))
    assert(perGroup.filter($"keepers" =!= 1).isEmpty, "exactly one keeper")
    assert(perGroup.filter($"keptSim" =!= $"lo").isEmpty,
      "far keeps the copy farthest from its centroid")
    // min_id mode keeps the smallest id per group
    val v2 = Clustering.semDedup(assigned, tau = 0.35, keep = "min_id")
    assert(v2.filter($"keep" && $"vec_id" =!= $"group").isEmpty)
  }

  test("clusterSample: at most nPer per cluster; prototype takes the top sims") {
    val (assigned, _) = Clustering.kmeansAssign(spark, emb, k = 10)
    val s = Clustering.clusterSample(assigned, nPer = 5, mode = "prototype")
    val sizes = s.groupBy("centroid_id").count()
    assert(sizes.filter($"count" > 5).isEmpty)
    // every sampled row's sim >= every unsampled row's sim in its cluster
    val maxOut = assigned.join(s.select($"vec_id").withColumn("__in__", lit(1)),
        Seq("vec_id"), "left")
      .filter($"__in__".isNull)
      .groupBy("centroid_id").agg(max("centroid_sim").as("out_max"))
    val minIn = s.groupBy("centroid_id").agg(min("centroid_sim").as("in_min"))
    assert(minIn.join(maxOut, Seq("centroid_id"))
      .filter($"in_min" < $"out_max").isEmpty)
    // diverse mode is the mirror: sampled sims are the smallest
    val d = Clustering.clusterSample(assigned, nPer = 5, mode = "diverse")
    val dmaxIn = d.groupBy("centroid_id").agg(max("centroid_sim").as("in_max"))
    val dminOut = assigned.join(d.select($"vec_id").withColumn("__in__", lit(1)),
        Seq("vec_id"), "left")
      .filter($"__in__".isNull)
      .groupBy("centroid_id").agg(min("centroid_sim").as("out_min"))
    assert(dmaxIn.join(dminOut, Seq("centroid_id"))
      .filter($"in_max" > $"out_min").isEmpty)
  }

  test("CLI transformer stages mirror the API") {
    import graft.spec.TransformStage
    def stage(name: String, args: String*) =
      graft.functions.Transformers.apply(emb, Seq(TransformStage(name, args)))
    val (apiAssigned, _) = Clustering.kmeansAssign(spark, emb, k = 10, iters = 3)
    assert(rows(stage("cluster_assign", "10").orderBy("vec_id")) ==
      rows(apiAssigned.orderBy("vec_id")))
    assert(rows(stage("semdedup", "10", "0.4").orderBy("vec_id")) ==
      rows(Clustering.semDedup(apiAssigned, 0.4).orderBy("vec_id")))
    assert(rows(stage("cluster_sample", "10", "5").orderBy("vec_id")) ==
      rows(Clustering.clusterSample(apiAssigned, 5).orderBy("vec_id")))
  }

  test("fixed literal centroids: assignWith replayable, one-hot argmax closed form") {
    val cents = Clustering.literalCentroids(spark,
      (0 until 4).map(j => (0 until 64).map(i => if (i == j) 1.0f else 0.0f)))
    val a = Clustering.assignWith(emb, cents)
    // closed form: centroid = argmax over dims 0..3 of x_j (cosine to
    // one-hot e_j is x_j/||x||; the norm is row-constant), first wins ties
    val want = emb.select($"vec_id",
      array((0 until 4).map(j => $"embedding".getItem(j)): _*).as("h"))
      .withColumn("best", expr(
        "CASE WHEN h[0] >= h[1] AND h[0] >= h[2] AND h[0] >= h[3] THEN 0 " +
        "WHEN h[1] >= h[2] AND h[1] >= h[3] THEN 1 " +
        "WHEN h[2] >= h[3] THEN 2 ELSE 3 END").cast("long"))
    assert(rows(a.select("vec_id", "centroid_id").orderBy("vec_id")) ==
      rows(want.select($"vec_id", $"best".as("centroid_id")).orderBy("vec_id")))
  }
}
