package graft

import org.apache.spark.sql.functions._
import graft.functions.VectorExprs._

/** Regression guard for the round-1 codegen bug: CollapseProject can
  * inline the SAME custom expression twice into one whole-stage-codegen
  * function (e.g. a projection and a filter both consuming an alias);
  * fixed local names then collide and Janino throws, silently dropping
  * the stage to interpreted execution. With codegen.fallback=false the
  * collision is a hard failure instead — these cases would have caught
  * the round-1 regression loudly.
  */
class VectorExprsSpec extends SparkSpec {

  private def withStrictCodegen[A](f: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try f
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("two VecCosine instances in one projection compile and agree") {
    withStrictCodegen {
      val df = spark.range(200).select(
        transform(sequence(lit(0), lit(15)),
          d => (col("id") + d + 1).cast("float")).as("a"),
        transform(sequence(lit(0), lit(15)),
          d => (col("id") * 2 + d + 1).cast("float")).as("b"))
      // same expression feeding a projection AND a filter — the
      // CollapseProject shape that triggered the Janino collision
      val out = df
        .select(col("a"), col("b"), vecCosine(col("a"), col("b")).as("c"))
        .where(col("c") > 0.5)
        .select(col("c"), vecCosine(col("b"), col("a")).as("c2"))
        .collect()
      assert(out.nonEmpty)
      out.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-12))
    }
  }

  test("two MinHashSig + SimHashFp instances in one stage compile") {
    withStrictCodegen {
      val df = spark.range(100).select(
        transform(sequence(lit(0), lit(9)), d => xxhash64(col("id") + d)).as("h"))
      val out = df
        .select(col("h"), minhashSig(col("h"), 8).as("sig"),
          simhashFp(col("h")).as("fp"))
        .where(size(col("sig")) === 8 && col("fp") =!= 0L)
        .select(minhashSig(col("h"), 8).as("sig2"), col("sig"),
          simhashFp(col("h")).as("fp2"), col("fp"))
        .collect()
      assert(out.nonEmpty)
      out.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1))
        assert(r.getLong(2) == r.getLong(3))
      }
    }
  }

  test("two SortedIntersectSize instances in one stage compile and agree") {
    withStrictCodegen {
      val df = spark.range(200).select(
        sort_array(transform(sequence(lit(0), lit(19)),
          d => xxhash64(col("id") + d))).as("a"),
        sort_array(transform(sequence(lit(0), lit(19)),
          d => xxhash64(col("id") * 2 + d))).as("b"))
      // projection + filter over the same alias — the verifyPairs shape
      val out = df
        .select(col("a"), col("b"), sortedIntersectSize(col("a"), col("b")).as("c"))
        .where(col("c") >= 0)
        .select(col("c"), sortedIntersectSize(col("b"), col("a")).as("c2"))
        .collect()
      assert(out.length == 200)
      out.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    }
  }

  test("codegen results match interpreted eval") {
    val df = spark.range(50).select(
      sort_array(transform(sequence(lit(0), lit(9)),
        d => xxhash64(col("id") + d))).as("a"),
      sort_array(transform(sequence(lit(0), lit(9)),
        d => xxhash64(col("id") * 3 + d))).as("b"))
    val gen = withStrictCodegen {
      rows(df.select(sortedIntersectSize(col("a"), col("b"))))
    }
    val prev = spark.conf.getOption("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    val interp =
      try rows(df.select(sortedIntersectSize(col("a"), col("b"))))
      finally prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.wholeStage", v)
        case None    => spark.conf.unset("spark.sql.codegen.wholeStage")
      }
    assert(gen == interp)
  }

  test("QuantizeVec ≡ the HOF array_max/transform formulation, bit-exact") {
    import spark.implicits._
    val e = sf("embeddings").limit(200)
    val absMax = array_max(transform($"embedding", x => abs(x.cast("double"))))
    val scale = when(absMax > 0, absMax / 127.0).otherwise(lit(1.0))
    val hof = e.select($"vec_id", scale.as("scale"),
      transform($"embedding", x =>
        greatest(lit(-127L), least(lit(127L),
          floor(x.cast("double") / scale + 0.5))).cast("int")).as("codes"))
    val fast = graft.ext.Similarity.quantizeEmbeddings(e, "vec_id", "embedding")
    assert(fast.exceptAll(hof).count() == 0 && hof.exceptAll(fast).count() == 0)
    // all-zero vector: scale 1.0, zero codes
    val z = Seq((1L, Array(0f, 0f, 0f))).toDF("vec_id", "embedding")
    val zq = graft.ext.Similarity.quantizeEmbeddings(z, "vec_id", "embedding")
      .as[(Long, Double, Seq[Int])].head()
    assert(zq == ((1L, 1.0, Seq(0, 0, 0))))
  }
}
