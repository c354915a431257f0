package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}

/** Distributed PCA over an embedding column ([EXT], SURVEY §2.10) —
  * the dimensionality-reduction front of the embedding pipeline
  * (before PQ/IVF indexing, SemDeDup-style clustering, or plain
  * storage: a 64→16 projection cuts index bytes 4× while keeping the
  * directions that carry the variance).
  *
  * Scale shape: ONE pass over the corpus accumulates the Gram matrix
  * — per partition a (count, sum[d], M[d·d]) triple of doubles, d² ≈
  * 4096 doubles for d = 64 — then the d×d eigenproblem is solved on
  * the driver (micro-sized; the data never moves). That is the
  * standard covariance-method PCA every engine uses at this aspect
  * ratio (n ≫ d); no iterative multi-pass SVD needed. Partition
  * partials are combined IN PARTITION ORDER so the float-sum
  * association — and therefore every eigenvector bit — is
  * deterministic for a given file layout.
  *
  * Determinism: eigenvectors are sign-canonicalized (largest-|w|
  * component made positive) so repeated fits are bit-identical;
  * eigenvalues are returned descending.
  *
  * Projection is one fused [[Pca.ProjectExpr]] per row (a chunky
  * d·k loop over the float array — the WinnowFps playbook, not a
  * per-element lambda), evaluated against the broadcast-small model
  * literals.
  */
object Pca {

  /** A fitted model: feature means, row-major components (k rows of
    * length d, descending eigenvalue), and the eigenvalues
    * (= variances along the components).
    */
  final case class Model(mean: Array[Double], components: Array[Array[Double]],
                         variances: Array[Double]) {
    def d: Int = mean.length
    def k: Int = components.length
    /** Fraction of total variance the kept components explain. */
    def explained(totalVariance: Double): Double =
      if (totalVariance <= 0) 1.0 else variances.sum / totalVariance
  }

  /** Fit a k-component model over `col` (array<float>, fixed length).
    * One distributed pass + a driver-side d×d eigensolve.
    */
  def fit(df: DataFrame, col: String, k: Int): Model = {
    require(k > 0, "pca: k must be positive")
    // UNBOXED accumulation: go through the internal-row RDD so the
    // float array is one `toFloatArray` copy per row, not a boxed
    // Seq[Float] per element (measured 6M×64: the boxed path made the
    // Gram pass row-conversion-bound, not flop-bound)
    val rows = df.select(org.apache.spark.sql.functions.col(col))
      .na.drop().queryExecution.toRdd
    // per-partition (n, sum, gram) — kept in partition order so the
    // double-sum association is reproducible run-over-run
    val partialRows = rows.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L
      var s: Array[Double] = null
      var m: Array[Double] = null
      it.foreach { row =>
        val x = row.getArray(0).toFloatArray()
        val d = x.length
        if (s == null) { s = new Array[Double](d); m = new Array[Double](d * d) }
        require(x.length == s.length,
          s"pca: ragged embedding length ${x.length} vs ${s.length}")
        n += 1
        var i = 0
        while (i < d) {
          val xi = x(i).toDouble
          s(i) += xi
          var j = i
          while (j < d) { m(i * d + j) += xi * x(j); j += 1 } // upper triangle
          i += 1
        }
      }
      if (n == 0) Iterator.empty else Iterator.single((pid, n, s, m))
    }
    // DETERMINISTIC TREE-COMBINE (r10): collecting every per-partition
    // (n, Σx, d²-gram) partial is 8 MB/partition at d=1024 — at 1000
    // executors that's driver-OOM territory. Halve the partial count
    // per level with a pid-pair reduceByKey until ≤ 8 remain, then
    // finish on the driver. Bit-determinism is preserved without any
    // scheduling assumption: each reduce key holds AT MOST TWO
    // partials (block representatives k·span and k·span+span/2) and the combine
    // normalizes their order by pid, so the double-sum association is
    // a fixed binary tree over pids — identical run-over-run, and the
    // PcaSpec refit law still holds.
    type Partial = (Int, Long, Array[Double], Array[Double])
    def comb(a: Partial, b: Partial): Partial = {
      val (x, y) = if (a._1 <= b._1) (a, b) else (b, a)
      require(x._3.length == y._3.length,
        "pca: inconsistent embedding length across partitions")
      val s = x._3.clone(); val m = x._4.clone()
      var i = 0
      while (i < s.length) { s(i) += y._3(i); i += 1 }
      i = 0
      while (i < m.length) { m(i) += y._4(i); i += 1 }
      (x._1, x._2 + y._2, s, m)
    }
    val pCount = rows.getNumPartitions
    val levels = math.max(0,
      math.ceil(math.log(math.max(1.0, pCount / 8.0)) / math.log(2.0)).toInt)
    var cur = partialRows
    var span = 1
    for (_ <- 0 until levels) {
      span <<= 1
      cur = cur.map(p => (p._1 / span, p))
        .reduceByKey(comb(_, _), math.max(1, pCount / span)).map(_._2)
    }
    val partials = cur.collect().sortBy(_._1)
    require(partials.nonEmpty, "pca: no non-null embeddings to fit on")
    val d = partials.head._3.length
    var n = 0L
    val s = new Array[Double](d)
    val m = new Array[Double](d * d)
    partials.foreach { case (_, pn, ps, pm) =>
      require(ps.length == d, "pca: inconsistent embedding length across partitions")
      n += pn
      var i = 0
      while (i < d) { s(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { m(i) += pm(i); i += 1 }
    }
    require(k <= d, s"pca: k=$k exceeds embedding dim $d")
    val mean = s.map(_ / n)
    // covariance (population) from the gram: C = M/n − mean meanᵀ
    val cov = breeze.linalg.DenseMatrix.zeros[Double](d, d)
    var i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = m(i * d + j) / n - mean(i) * mean(j)
        cov(i, j) = c; cov(j, i) = c
        j += 1
      }
      i += 1
    }
    val es = breeze.linalg.eigSym(cov) // ascending eigenvalues
    val order = (0 until d).sortBy(ix => -es.eigenvalues(ix))
    val comps = order.take(k).map { ix =>
      val w = Array.tabulate(d)(r => es.eigenvectors(r, ix))
      // sign canonicalization: make the largest-|w| component positive
      val piv = w.indices.maxBy(r => math.abs(w(r)))
      if (w(piv) < 0) w.map(-_) else w
    }.toArray
    val vars = order.take(k).map(ix => math.max(0.0, es.eigenvalues(ix))).toArray
    Model(mean, comps, vars)
  }

  /** Total variance of the corpus (sum of per-dimension variances) —
    * the denominator of explained-variance; SQL-expressible, so
    * oracle-friendly on its own.
    */
  def totalVariance(df: DataFrame, col: String): Double = {
    val withIdx = df.select(col).na.drop()
      .select(posexplode(org.apache.spark.sql.functions.col(col)))
    withIdx.groupBy("pos").agg(var_pop("col").as("v"))
      .agg(sum("v")).head().getDouble(0)
  }

  /** Project `col` onto the model: out_j = Σ_i (x_i − mean_i)·W_ji.
    * One fused expression per row; output array<float> of length k.
    */
  def transform(df: DataFrame, col: String, model: Model,
                out: String = "pca"): DataFrame =
    df.withColumn(out, projectCol(org.apache.spark.sql.functions.col(col), model))

  def projectCol(c: Column, model: Model): Column =
    org.apache.spark.sql.graftshim.ExprShim.column(
      ProjectExpr(org.apache.spark.sql.graftshim.ExprShim.expression(c),
        model.mean, model.components))

  /** Reconstruction error ‖x − (mean + Wᵀ(W(x−mean)))‖² averaged over
    * the frame — the law witness that more components fit better.
    */
  def reconstructionError(df: DataFrame, col: String, model: Model): Double = {
    val proj = transform(df, col, model, "__p__")
    // reconstruct inside the same fused expression family: error is
    // ‖x−mean‖² − ‖p‖² for an orthonormal W (Pythagoras) — avoids a
    // second d·k pass and is exact for the orthonormal case the law
    // separately asserts
    val dcol = proj.select(
      org.apache.spark.sql.graftshim.ExprShim.column(
        ProjNorms(org.apache.spark.sql.graftshim.ExprShim.expression(
          org.apache.spark.sql.functions.col(col)), model.mean)).as("cn"),
      org.apache.spark.sql.functions.aggregate(
        org.apache.spark.sql.functions.transform(
          org.apache.spark.sql.functions.col("__p__"),
          x => x * x),
        lit(0.0d), (a, x) => a + x).as("pn"))
    dcol.agg(avg(org.apache.spark.sql.functions.col("cn") -
      org.apache.spark.sql.functions.col("pn"))).head().getDouble(0)
  }

  /** ‖x − mean‖² as a fused per-row loop. */
  final case class ProjNorms(child: Expression, mean: Array[Double])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = org.apache.spark.sql.types.DoubleType
    override def prettyName: String = "pca_center_norm2"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      var acc = 0.0
      var i = 0
      while (i < mean.length) {
        val v = arr.getFloat(i) - mean(i)
        acc += v * v
        i += 1
      }
      acc
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** The projection kernel: array<float>[d] → array<float>[k]. A
    * CodegenFallback whose eval is one cache-local d·k double loop —
    * the per-row work is chunky (≈1k fused multiply-adds at 64×16),
    * not a per-element lambda, so interpreted dispatch cost is
    * amortized (same justification as WinnowFps).
    */
  final case class ProjectExpr(child: Expression, mean: Array[Double],
                               components: Array[Array[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(FloatType, containsNull = false)
    override def prettyName: String = "pca_project"
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val d = mean.length
      val k = components.length
      val centered = new Array[Double](d)
      var i = 0
      while (i < d) { centered(i) = arr.getFloat(i) - mean(i); i += 1 }
      val out = new Array[Any](k)
      var j = 0
      while (j < k) {
        val w = components(j)
        var acc = 0.0
        var t = 0
        while (t < d) { acc += w(t) * centered(t); t += 1 }
        out(j) = acc.toFloat
        j += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
