package graft

import graft.ext.Pca
import org.apache.spark.sql.functions._

/** Distributed PCA laws: orthonormal components, projected variances
  * = eigenvalues (descending), reconstruction error monotone in k and
  * ≈ 0 at k = d, planted dominant direction recovered, bit-identical
  * refits, and neighbor preservation on the planted embedding
  * clusters.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = sf("embeddings")
  private lazy val model8 = Pca.fit(emb, "embedding", 8)

  test("components are orthonormal; variances descend and are ≤ total") {
    val k = model8.k
    for (a <- 0 until k; b <- a until k) {
      val dot = model8.components(a).zip(model8.components(b))
        .map { case (x, y) => x * y }.sum
      val want = if (a == b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9, s"W[$a]·W[$b] = $dot, want $want")
    }
    assert(model8.variances.sameElements(model8.variances.sorted.reverse))
    val total = Pca.totalVariance(emb, "embedding")
    assert(model8.variances.sum <= total * (1 + 1e-9))
    assert(model8.explained(total) > 0.0 && model8.explained(total) <= 1.0)
  }

  test("projected per-component variance equals the eigenvalue") {
    val proj = Pca.transform(emb, "embedding", model8, "p")
      .select(posexplode(col("p")))
    val got = proj.groupBy("pos").agg(var_pop("col").as("v"))
      .orderBy("pos").select("v").as[Double].collect()
    got.zip(model8.variances).foreach { case (g, w) =>
      assert(math.abs(g - w) <= 1e-6 * math.max(1.0, w),
        s"projected variance $g vs eigenvalue $w")
    }
  }

  test("reconstruction error is monotone in k and ~0 at k = d") {
    val errs = Seq(2, 8, 32, 64).map(k =>
      k -> Pca.reconstructionError(emb, "embedding", Pca.fit(emb, "embedding", k)))
    errs.sliding(2).foreach { case Seq((k1, e1), (k2, e2)) =>
      assert(e2 <= e1 + 1e-9, s"error rose from k=$k1 ($e1) to k=$k2 ($e2)")
    }
    val total = Pca.totalVariance(emb, "embedding")
    assert(errs.last._2 < 1e-6 * math.max(1.0, total), s"k=d error ${errs.last._2}")
    // Pythagoras identity the fast error path relies on: err(k) =
    // total − Σ eigenvalues(≤k) (population variance both sides)
    val m8err = Pca.reconstructionError(emb, "embedding", model8)
    assert(math.abs(m8err - (total - model8.variances.sum)) <
      1e-6 * math.max(1.0, total))
  }

  test("planted dominant direction is recovered as the first component") {
    // x = t·u + small noise, u = the normalized all-ones direction
    val d = 16
    val u = Array.fill(d)(1.0 / math.sqrt(d))
    val rnd = new scala.util.Random(7)
    val data = (0 until 2000).map { _ =>
      val t = rnd.nextGaussian() * 10
      Array.tabulate(d)(i => (t * u(i) + rnd.nextGaussian() * 0.1).toFloat)
    }
    val df = data.map(Tuple1(_)).toDF("embedding")
    val m = Pca.fit(df, "embedding", 1)
    val cos = math.abs(m.components(0).zip(u).map { case (a, b) => a * b }.sum)
    assert(cos > 0.999, s"|cos(w1, planted)| = $cos")
    // and it carries nearly all the variance
    assert(m.explained(Pca.totalVariance(df, "embedding")) > 0.99)
  }

  test("refit is bit-identical (deterministic accumulation + sign canon)") {
    val m2 = Pca.fit(emb, "embedding", 8)
    assert(m2.mean.sameElements(model8.mean))
    assert(m2.variances.sameElements(model8.variances))
    m2.components.zip(model8.components).foreach { case (a, b) =>
      assert(a.sameElements(b))
    }
  }

  test("tree-combine (many partitions) is bit-deterministic and matches few-partition fit") {
    // 64 input partitions forces 3 tree levels (64 → 8 partials);
    // refits over the same layout must stay bit-identical, and the
    // model must agree with the 2-partition (no-tree) fit to fp
    // tolerance (different summation association, same statistics)
    val wide = emb.repartition(64)
    val a = Pca.fit(wide, "embedding", 8)
    val b = Pca.fit(wide, "embedding", 8)
    assert(a.mean.sameElements(b.mean) && a.variances.sameElements(b.variances))
    a.components.zip(b.components).foreach { case (x, y) =>
      assert(x.sameElements(y)) }
    val narrow = Pca.fit(emb.coalesce(2), "embedding", 8)
    a.mean.zip(narrow.mean).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-9, s"mean diverged: $x vs $y") }
    a.variances.zip(narrow.variances).foreach { case (x, y) =>
      assert(math.abs(x - y) < 1e-6 * math.max(1.0, y),
        s"variance diverged: $x vs $y") }
    a.components.zip(narrow.components).foreach { case (x, y) =>
      val cos = x.zip(y).map { case (p, q) => p * q }.sum
      assert(math.abs(math.abs(cos) - 1.0) < 1e-6, s"component cos $cos") }
  }

  test("neighbor preservation: planted duplicate pairs stay nearest after 64→16") {
    // embeddings testdata plants near-identical vectors sharing a label;
    // after projection, a pair that is near-identical in R^64 must stay
    // near-identical in R^16 (projection is 1-Lipschitz for orthonormal W)
    val m = Pca.fit(emb, "embedding", 16)
    val proj = Pca.transform(emb, "embedding", m, "p")
    val pairs = proj.as("a").join(proj.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .limit(50)
      .select(
        graft.functions.VectorExprs.vecCosine(col("a.embedding"), col("b.embedding")).as("c64"),
        graft.functions.VectorExprs.vecCosine(col("a.p"), col("b.p")).as("c16"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val (c64, c16) = (r.getDouble(0), r.getDouble(1))
      if (c64 > 0.999) assert(c16 > 0.99,
        s"near-duplicate pair degraded: cos64=$c64 cos16=$c16")
    }
  }
}
