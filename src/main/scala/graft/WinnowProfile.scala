package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off profile of the 6M-doc winnow phase: splits the cost of
  * [[graft.ext.TextDedup.winnowPairs]] into its legs — fingerprint
  * computation + cache materialization vs df-cap vs the inverted-index
  * self-join + pair aggregation — so the winnow scale numbers in
  * BASELINE.md attribute time to the right operator. Reuses the
  * /tmp/graft_scale corpus.
  */
object WinnowProfile {
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
      println(f"WINPROF $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docs = spark.read.parquet(s"$out/documents.parquet")
    // end-to-end with the r9 postings pipeline (broadcast-anti df cap
    // + bounded posting lists + fused OrderedPairs expansion)
    val nPairs = timed("winnow_pairs_postings") {
      graft.ext.TextDedup.winnowPairs(docs, "doc_id", "text",
        k = 12, w = 12, minShared = 3, maxDf = 200).count()
    }
    println(s"WINPROF pairs: $nPairs")
    spark.sharedState.cacheManager.clearCache()
    // fingerprint leg alone, for attribution
    val fps = graft.ext.TextDedup.winnowFingerprints(
      docs, "doc_id", "text", k = 12, w = 12)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nFps = timed("fps_compute_cache")(fps.count())
    println(s"WINPROF fingerprint rows: $nFps")
    spark.stop()
  }
}
