package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ExprShim
import org.apache.spark.sql.types._

/** Custom codegen'd Catalyst expressions for the [EXT] vector/hash hot
  * loops (SURVEY §4's deliberate custom-Expression candidates).
  *
  * Spark's higher-order functions (transform/aggregate/zip_with) are
  * CodegenFallback — every lambda step is an interpreted expression
  * eval with boxing. For O(pairs·dim) inner loops that overhead is the
  * whole runtime (measured ~50× on brute-force cosine at 2M pairs).
  * These expressions generate tight primitive Java loops instead, while
  * keeping semantics EXACTLY equal to the HOF formulations they replace
  * (same operation order, so bit-identical results and unchanged
  * DuckDB-oracle matches).
  */
object VectorExprs {

  /** Cosine similarity over two array<float> columns, accumulated in
    * double: dot/(√(a·a)·√(b·b)) with in-order summation.
    */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val xv = x.getFloat(i).toDouble
        val yv = y.getFloat(i).toDouble
        dot += xv * yv; na += xv * xv; nb += yv * yv
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        // Every local through freshName: CollapseProject can inline this
        // expression twice into one codegen function (e.g. a projection
        // and a filter both consuming it) — fixed names collide at the
        // Janino level and silently drop the stage to interpreted.
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** k-permutation MinHash signature over an array<long> of base
    * hashes. Permutation s: rotl(h ⊕ c_s, r_s) with
    * c_s = (s+1)·golden, r_s = s % 63 + 1 — bit-identical to the
    * xor+rotate column formulation in TextDedup.minhashCols.
    */
  case class MinHashSig(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override def nullSafeEval(input: Any): Any = {
      val h = input.asInstanceOf[ArrayData]
      val n = h.numElements()
      val out = new Array[Long](k)
      var s = 0
      while (s < k) {
        val c = (s + 1) * 0x9E3779B97F4A7C15L
        val r = s % 63 + 1
        var min = Long.MaxValue
        var i = 0
        while (i < n) {
          val x = h.getLong(i) ^ c
          val v = (x << r) | (x >>> (64 - r))
          if (v < min) min = v
          i += 1
        }
        out(s) = min
        s += 1
      }
      new GenericArrayData(out)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h => {
        val out = ctx.freshName("out")
        val n = ctx.freshName("n"); val s = ctx.freshName("s")
        val c = ctx.freshName("c"); val r = ctx.freshName("r")
        val min = ctx.freshName("min"); val i = ctx.freshName("i")
        val x = ctx.freshName("x"); val v = ctx.freshName("v")
        s"""
           |long[] $out = new long[$k];
           |int $n = $h.numElements();
           |for (int $s = 0; $s < $k; $s++) {
           |  long $c = ($s + 1) * ${0x9E3779B97F4A7C15L}L;
           |  int $r = $s % 63 + 1;
           |  long $min = Long.MAX_VALUE;
           |  for (int $i = 0; $i < $n; $i++) {
           |    long $x = $h.getLong($i) ^ $c;
           |    long $v = ($x << $r) | ($x >>> (64 - $r));
           |    if ($v < $min) $min = $v;
           |  }
           |  $out[$s] = $min;
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash fingerprint from an array<long> of token hashes:
    * per-bit ±1 votes, sign → bit. Bit-identical to the
    * simhashVotes/simhashFromVotes column formulation.
    */
  case class SimHashFp(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_fp"

    override def nullSafeEval(input: Any): Any = {
      val h = input.asInstanceOf[ArrayData]
      val n = h.numElements()
      val votes = new Array[Int](64)
      var i = 0
      while (i < n) {
        val x = h.getLong(i)
        var b = 0
        while (b < 64) {
          if (((x >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        i += 1
      }
      var fp = 0L
      var b = 0
      while (b < 64) { if (votes(b) > 0) fp |= (1L << b); b += 1 }
      fp
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, h => {
        val votes = ctx.freshName("votes")
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val x = ctx.freshName("x"); val b = ctx.freshName("b")
        val fp = ctx.freshName("fp"); val b2 = ctx.freshName("b2")
        s"""
           |int[] $votes = new int[64];
           |int $n = $h.numElements();
           |for (int $i = 0; $i < $n; $i++) {
           |  long $x = $h.getLong($i);
           |  for (int $b = 0; $b < 64; $b++) {
           |    if ((($x >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
           |  }
           |}
           |long $fp = 0L;
           |for (int $b2 = 0; $b2 < 64; $b2++) if ($votes[$b2] > 0) $fp |= (1L << $b2);
           |${ev.value} = $fp;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Signed random-hyperplane sketch of an array<float> vector: bit p =
    * sign of Σ_d v[d]·coeff(d,p), coefficients a deterministic
    * pseudo-random ±[0,500) lattice from chained XXH64 — reproducible
    * across runs with no stored model. Interpreted loop (codegen
    * fallback): the per-row cost is already primitive-loop bound.
    */
  case class HyperplaneSketch(child: Expression, planes: Int)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def prettyName: String = "hyperplane_sketch"

    @transient private var coeffs: Array[Array[Double]] = _
    @transient private var coeffDim: Int = -1

    private def coefficients(dim: Int): Array[Array[Double]] = {
      if (coeffs == null || coeffDim != dim) {
        coeffs = Array.tabulate(planes, dim) { (p, d) =>
          val h = XXH64.hashInt(d, XXH64.hashInt(p, 42L))
          (java.lang.Math.floorMod(h, 1000L) - 500L).toDouble
        }
        coeffDim = dim
      }
      coeffs
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      val cs = coefficients(dim)
      var sk = 0L
      var p = 0
      while (p < planes) {
        val row = cs(p)
        var dot = 0.0
        var d = 0
        while (d < dim) { dot += v.getFloat(d).toDouble * row(d); d += 1 }
        if (dot > 0) sk |= (1L << p)
        p += 1
      }
      sk
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Argmax-cosine centroid id for an array<float> vector over a small
    * in-plan centroid matrix — IVF assignment as a PURE MAP. The
    * alternative (corpus × broadcast(centroids) join + window argmax)
    * amplifies the corpus k× through an exchange+sort; this touches
    * each row once and shuffles nothing. Ties and NaNs follow Spark's
    * descending-double window order (NaN > +Inf, tie → smallest id).
    * One deliberate divergence from the old join formulation: a NULL
    * vector assigns NULL (null-safe eval) instead of an arbitrary
    * centroid — null vectors don't belong in an inverted list.
    */
  case class NearestCentroid(child: Expression, ids: Array[Long],
                             cents: Array[Array[Float]])
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def prettyName: String = "nearest_centroid"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      var best = java.lang.Double.NEGATIVE_INFINITY
      var bestId = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val row = cents(c)
        val n = math.min(v.numElements(), row.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < n) {
          val x = v.getFloat(i).toDouble; val y = row(i).toDouble
          dot += x * y; na += x * x; nb += y * y
          i += 1
        }
        val sim = dot / (math.sqrt(na) * math.sqrt(nb))
        // Double.compare ranks NaN above +Inf — Spark's sort order
        if (c == 0 || java.lang.Double.compare(sim, best) > 0) {
          best = sim; bestId = ids(c)
        }
        c += 1
      }
      bestId
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** L2 twin of [[NearestCentroid]]: argmin squared distance — the
    * product-quantization assignment metric (PQ subvectors are not
    * normalized, so cosine would discard magnitude). Ties → smallest
    * id (ids are passed ascending); NULL vector → NULL.
    *
    * Dimension mismatch: compares only the first min(|v|, |centroid|)
    * components (consistent with [[NearestCentroid]]). A row whose
    * embedding dim differs from the trained d therefore gets the
    * nearest centroid on the shared prefix, not an error — callers
    * that need strictness must validate dims upstream (PqIndex.train
    * checks the seed dimensionality only).
    */
  case class NearestCentroidL2(child: Expression, ids: Array[Long],
                               cents: Array[Array[Float]])
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def prettyName: String = "nearest_centroid_l2"

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      var best = java.lang.Double.POSITIVE_INFINITY
      var bestId = Long.MaxValue
      var c = 0
      while (c < cents.length) {
        val row = cents(c)
        val n = math.min(v.numElements(), row.length)
        var d2 = 0.0
        var i = 0
        while (i < n) {
          val diff = v.getFloat(i).toDouble - row(i).toDouble
          d2 += diff * diff
          i += 1
        }
        if (c == 0 || java.lang.Double.compare(d2, best) < 0) {
          best = d2; bestId = ids(c)
        }
        c += 1
      }
      bestId
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Sorted distinct 64-bit hashes of the word n-gram shingles of a
    * token array: one pass — space-joined n-gram bytes → XXH64 →
    * dedupe + sort. Replaces the interpreted
    * transform(slice+concat_ws) → xxhash64 → array_distinct →
    * array_sort chain (measured ~20× on the shingle pipeline). The
    * output feeds set-similarity (any injective hash works — only set
    * identity matters) and the O(n+m) merge intersect.
    */
  case class ShingleSortedHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_sorted_hashes"

    override def nullSafeEval(input: Any): Any = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n) return new GenericArrayData(Array.emptyLongArray)
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val space = UTF8String.fromString(" ")
      val out = new Array[Long](m - n + 1)
      i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        val sh = UTF8String.concatWs(space, parts: _*)
        out(i) = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
        i += 1
      }
      java.util.Arrays.sort(out)
      // in-place dedupe of the sorted array
      var w = 0
      i = 0
      while (i < out.length) {
        if (w == 0 || out(i) != out(w - 1)) { out(w) = out(i); w += 1 }
        i += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** POSITIONAL word-n-gram hashes: element i is XXH64(seed 42) of the
    * space-joined n-gram starting at token i (no sort, no dedup —
    * [[ShingleSortedHashes]] minus both, for consumers that need the
    * position, e.g. duplicate-span detection). Empty below n tokens.
    */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = input.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n) return new GenericArrayData(Array.emptyLongArray)
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
      val space = UTF8String.fromString(" ")
      val out = new Array[Long](m - n + 1)
      i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        val sh = UTF8String.concatWs(space, parts: _*)
        out(i) = XXH64.hashUnsafeBytes(sh.getBaseObject, sh.getBaseOffset, sh.numBytes, 42L)
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** |A ∩ B| of two SORTED array<long> columns — one O(n+m) merge pass
    * in generated code. The workhorse of exact near-dup verification:
    * per candidate pair this replaces array_intersect's hash-set build.
    */
  case class SortedIntersectSize(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sorted_intersect_size"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = x.numElements(); val m = y.numElements()
      var i = 0; var j = 0; var c = 0
      while (i < n && j < m) {
        val xv = x.getLong(i); val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val m = ctx.freshName("m")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $n = $a.numElements(), $m = $b.numElements();
           |int $i = 0, $j = 0, $c = 0;
           |while ($i < $n && $j < $m) {
           |  long $x = $a.getLong($i), $y = $b.getLong($j);
           |  if ($x == $y) { $c++; $i++; $j++; }
           |  else if ($x < $y) $i++;
           |  else $j++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Int8 scalar quantization in ONE pass: struct(scale, codes) with
    * scale = max|x|/127 (1.0 for the all-zero vector) and codes =
    * clamp(floor(x/scale + 0.5), ±127) — bit-identical to the
    * HOF formulation in [[graft.ext.Similarity.quantizeEmbeddings]]'s
    * scaladoc and to the DuckDB oracle. The HOF version pays the
    * CollapseProject lambda-capture tax: `scale` (itself an
    * array_max(transform…)) gets inlined INTO the per-element codes
    * lambda, recomputing the row maximum once per element — O(d²) per
    * row, measured 2.7 s for what is a scan-speed projection. Here the
    * max is found once, then codes stream out.
    */
  case class QuantizeVec(child: Expression)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = StructType(Seq(
      StructField("scale", DoubleType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "quantize_vec"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var mx = 0.0; var i = 0
      while (i < n) {
        val v = math.abs(arr.getFloat(i).toDouble)
        if (v > mx) mx = v
        i += 1
      }
      val scale = if (mx > 0) mx / 127.0 else 1.0
      val codes = new Array[Int](n)
      i = 0
      while (i < n) {
        val c = math.floor(arr.getFloat(i).toDouble / scale + 0.5)
        codes(i) = math.max(-127.0, math.min(127.0, c)).toInt
        i += 1
      }
      InternalRow(scale, new GenericArrayData(codes))
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** L2 normalization in one pass (all-zero vectors pass through) —
    * same CollapseProject rationale as [[QuantizeVec]]: the HOF
    * formulation captures the aggregated norm inside the per-element
    * division lambda and recomputes it per element. Sum runs in-order
    * in double, division casts back to float — bit-identical to the
    * `aggregate`/`transform` chain it replaces.
    */
  case class L2NormalizeVec(child: Expression)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(FloatType, containsNull = true)
    override def prettyName: String = "l2_normalize_vec"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var ss = 0.0; var i = 0
      while (i < n) {
        val v = arr.getFloat(i).toDouble
        ss += v * v
        i += 1
      }
      val norm = math.sqrt(ss)
      if (norm > 0) {
        val out = new Array[Float](n)
        i = 0
        while (i < n) {
          out(i) = (arr.getFloat(i).toDouble / norm).toFloat
          i += 1
        }
        new GenericArrayData(out)
      } else input
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** L2-normalize an array<float> into array<DOUBLE> — the
    * pre-normalization for pair stages ([[VecDotD]]): each element is
    * divided by the double-accumulated norm ONCE per row, so the
    * per-pair cosine collapses to a dot product. Double output keeps
    * the pair sim within ~1e-15 of the exact `vec_cosine` (a float
    * output would drift ~1e-7 — enough to flip a rounded-4 boundary).
    * The all-zero vector passes through (its pair dots are 0, matching
    * exclusion at any positive threshold). Interpreted is fine here —
    * this runs once per ROW, not per pair.
    */
  case class L2NormalizeVecD(child: Expression)
      extends UnaryExpression with ExpectsInputTypes
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "l2_normalize_vec_d"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      var ss = 0.0; var i = 0
      while (i < n) {
        val v = arr.getFloat(i).toDouble
        ss += v * v
        i += 1
      }
      val norm = math.sqrt(ss)
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = if (norm > 0) arr.getFloat(i).toDouble / norm
                 else arr.getFloat(i).toDouble
        i += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Dot product of two array<double> columns — the PAIR-stage hot
    * loop after [[L2NormalizeVecD]]: one multiply-add per element
    * (the cosine's two norm accumulations paid once per row instead
    * of once per pair — ~1/3 of the pairwise flops). Codegen'd.
    */
  case class VecDotD(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot_d"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += x.getDouble(i) * y.getDouble(i)
        i += 1
      }
      dot
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val dot = ctx.freshName("dot")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $dot += $a.getDouble($i) * $b.getDouble($i);
           |}
           |${ev.value} = $dot;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  // ── Column wrappers ────────────────────────────────────────────────
  def vecCosine(a: Column, b: Column): Column =
    ExprShim.column(VecCosine(ExprShim.expression(a), ExprShim.expression(b)))
  def l2NormalizeVecD(vec: Column): Column =
    ExprShim.column(L2NormalizeVecD(ExprShim.expression(vec)))
  def vecDotD(a: Column, b: Column): Column =
    ExprShim.column(VecDotD(ExprShim.expression(a), ExprShim.expression(b)))
  /** All ordered element pairs (a < b in the element type's ordering)
    * of one array — the postings-list pair expansion for inverted-index
    * miners: one chunky interpreted call per POSTING LIST replaces a
    * sorted self-join of the exploded rows (two wide sorts + an SMJ)
    * with a plain hash-agg pipeline. Null elements drop (mirroring the
    * join formulation, where `a.id < b.id` is null-false). Output size
    * is C(n,2); callers bound n (winnow's df cap caps it at maxDf).
    */
  case class OrderedPairs(child: Expression)
      extends UnaryExpression
      with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    private def elemType: DataType =
      child.dataType.asInstanceOf[ArrayType].elementType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(et, _) if org.apache.spark.sql.catalyst.util.TypeUtils
            .getInterpretedOrdering(et) != null =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case _ =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"ordered_pairs needs an array of an orderable type, got ${child.dataType}")
      }
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("a", elemType, nullable = false),
      StructField("b", elemType, nullable = false))), containsNull = false)
    override def prettyName: String = "ordered_pairs"

    @transient private lazy val ord =
      org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(elemType)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData].toObjectArray(elemType)
        .filter(_ != null)
      java.util.Arrays.sort(arr, ord.asInstanceOf[java.util.Comparator[Any]])
      val n = arr.length
      val out = new Array[Any](n * (n - 1) / 2)
      var k = 0
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          // strict a < b, like the join's `a.id < b.id` (duplicate
          // values — impossible for distinct posting lists, but cheap
          // to honor — produce no self-pair)
          if (ord.compare(arr(i), arr(j)) < 0) {
            out(k) = new org.apache.spark.sql.catalyst.expressions
              .GenericInternalRow(Array[Any](arr(i), arr(j)))
            k += 1
          }
          j += 1
        }
        i += 1
      }
      new GenericArrayData(
        if (k == out.length) out else java.util.Arrays.copyOf(
          out.asInstanceOf[Array[AnyRef]], k).asInstanceOf[Array[Any]])
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def orderedPairs(ids: Column): Column =
    ExprShim.column(OrderedPairs(ExprShim.expression(ids)))

  def minhashSig(hashes: Column, k: Int): Column =
    ExprShim.column(MinHashSig(ExprShim.expression(hashes), k))
  def simhashFp(hashes: Column): Column =
    ExprShim.column(SimHashFp(ExprShim.expression(hashes)))
  def hyperplaneSketch(vec: Column, planes: Int): Column =
    ExprShim.column(HyperplaneSketch(ExprShim.expression(vec), planes))
  def sortedIntersectSize(a: Column, b: Column): Column =
    ExprShim.column(SortedIntersectSize(ExprShim.expression(a), ExprShim.expression(b)))
  def nearestCentroid(vec: Column, ids: Array[Long],
                      cents: Array[Array[Float]]): Column =
    ExprShim.column(NearestCentroid(ExprShim.expression(vec), ids, cents))
  def nearestCentroidL2(vec: Column, ids: Array[Long],
                        cents: Array[Array[Float]]): Column =
    ExprShim.column(NearestCentroidL2(ExprShim.expression(vec), ids, cents))
  def shingleSortedHashes(tokens: Column, n: Int): Column =
    ExprShim.column(ShingleSortedHashes(ExprShim.expression(tokens), n))
  def shingleHashes(tokens: Column, n: Int): Column =
    ExprShim.column(ShingleHashes(ExprShim.expression(tokens), n))
  def quantizeVec(vec: Column): Column =
    ExprShim.column(QuantizeVec(ExprShim.expression(vec)))
  def l2NormalizeVec(vec: Column): Column =
    ExprShim.column(L2NormalizeVec(ExprShim.expression(vec)))
}
