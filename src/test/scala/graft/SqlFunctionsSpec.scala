package graft

import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._

/** SQL-surface tests: the custom expressions are callable from
  * spark.sql / expr() after registration, and agree with their Column
  * wrappers.
  */
class SqlFunctionsSpec extends SparkSpec {
  import spark.implicits._

  GraftFunctions.register(spark)

  test("vec_cosine / sorted_intersect_size from SQL match Column API") {
    val df = spark.range(50).select(
      transform(sequence(lit(0), lit(7)), d => (col("id") + d + 1).cast("float")).as("a"),
      transform(sequence(lit(0), lit(7)), d => (col("id") * 2 + d + 1).cast("float")).as("b"))
    df.createOrReplaceTempView("vecs")
    val viaSql = spark.sql(
      "SELECT vec_cosine(a, b) AS c FROM vecs").as[Double].collect().toSeq
    val viaCol = df.select(
      graft.functions.VectorExprs.vecCosine(col("a"), col("b"))).as[Double].collect().toSeq
    assert(viaSql == viaCol)
    val inter = spark.sql(
      """SELECT sorted_intersect_size(array(1L,2L,3L), array(2L,3L,9L))""")
      .as[Int].head()
    assert(inter == 2)
  }

  test("text/hash functions usable inside set_expr transformer chains") {
    val out = graft.functions.Transformers.apply(
      Seq((1L, "The Quick  fox")).toDF("id", "t"),
      graft.spec.TransformStage.parseChain("set_expr:fp;normalized_token_hash(t)"))
    val direct = Seq((1L, "The Quick  fox")).toDF("id", "t")
      .select(graft.functions.TextExprs.normalizedTokenHash(col("t")))
      .as[Long].head()
    assert(out.select("fp").as[Long].head() == direct)
  }

  test("minhash_sig / simhash_fp / hyperplane_sketch / shingles via SQL") {
    val r = spark.sql(
      """SELECT minhash_sig(array(xxhash64('a'), xxhash64('b')), 4) AS sig,
                simhash_fp(array(xxhash64('a'), xxhash64('b'))) AS fp,
                shingle_sorted_hashes(array('a','b','c'), 2) AS sh,
                hyperplane_sketch(array(cast(1.0 as float), cast(-2.0 as float)), 8) AS hp
      """).collect()(0)
    assert(r.getSeq[Long](0).size == 4)
    assert(r.getSeq[Long](2).size == 2)
    // int-literal arity errors are loud
    intercept[Exception] { spark.sql("SELECT minhash_sig(array(1L))").collect() }
  }
}
