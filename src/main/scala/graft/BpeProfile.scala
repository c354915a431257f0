package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off same-conditions A/B of the two BPE training formulations at
  * the ScaleBench sample scale: the r9 fused span-merge iteration
  * (frozen type table + [[graft.functions.TextExprs.BpeEncodeTokens]])
  * vs the pre-r9 replace-projection chain with `checkpointEvery`
  * lineage re-materialization (inlined here for the comparison). Both
  * must produce the identical merge list. Reuses /tmp/graft_scale.
  */
object BpeProfile {

  /** The pre-r9 formulation, verbatim shape: cached padded-symbol
    * types, one `replace` projection appended per merge, localCheckpoint
    * every `checkpointEvery` merges.
    */
  private def trainReplaceChain(df: DataFrame, textCol: String,
                                numMerges: Int, minPairCount: Long,
                                checkpointEvery: Int): Seq[(String, String)] = {
    import graft.ext.Bpe
    val base = Bpe.wordCounts(df, textCol)
      .select(Bpe.padSymbols(col("word")).as("sym"), col("cnt"))
      .persist()
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      var types = base
      var sinceCheckpoint = 0
      var done = false
      while (merges.size < numMerges && !done) {
        val top = Bpe.pairCounts(types)
          .orderBy(desc("cnt"), asc("lhs"), asc("rhs")).limit(1).collect()
        if (top.isEmpty || top(0).getLong(2) < minPairCount) done = true
        else {
          val (a, b) = (top(0).getString(0), top(0).getString(1))
          merges += ((a, b))
          types = types.withColumn("sym", Bpe.applyMerge(col("sym"), a, b))
          sinceCheckpoint += 1
          if (checkpointEvery > 0 && sinceCheckpoint >= checkpointEvery) {
            types = types.localCheckpoint(true)
            sinceCheckpoint = 0
          }
        }
      }
      merges.toSeq
    } finally { base.unpersist(); () }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"BPEPROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$out/documents.parquet")
    val planted = "zzzzyyyy"
    val suffix = (" " + planted) * 5
    val sample = docs.filter(pmod(col("doc_id"), lit(200L)) === 0)
      .select(concat(col("text"), lit(suffix)).as("text"))

    val fused = timed("train_fused_64") {
      graft.ext.Bpe.train(sample, "text", numMerges = 64, minPairCount = 2L)
    }
    spark.sharedState.cacheManager.clearCache()
    val chain = timed("train_replace_chain_64") {
      trainReplaceChain(sample, "text", 64, 2L, 16)
    }
    require(fused == chain, "formulations diverged!")
    println(s"BPEPROF merge lists identical (${fused.size} merges)")
    spark.stop()
  }
}
