package graft
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions","32")// write standard annotated INT64 micros (not deprecated INT96) so
// parquet footers carry usable timestamp stats for pruned merges
.config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      // fork-free local FS (r19): no per-file chmod spawn, no .crc
      // sidecars — see graft.sources.FastLocalFs; inert off-local
      .config("spark.hadoop.fs.file.impl", "graft.sources.FastLocalFs")
      // RAM-backed shuffle dir when headroom allows (r19) — see
      // graft.sources.LocalDirs for the scale story and overrides
      .config(graft.sources.LocalDirs.confMap)
.config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1000).count()
    for (name <- args) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"QBENCH $name ${(System.nanoTime()-t0)/1e9}%.2f s")
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
