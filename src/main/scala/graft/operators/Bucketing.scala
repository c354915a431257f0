package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffle a fact table ONCE into N hash buckets
  * on its join/agg key so every later equi-join or aggregation on that
  * key runs shuffle-free (the scan is already hash-partitioned and,
  * with sortBy, sorted). This is the 100 TB answer to "the same big
  * join runs every day": pay the shuffle at write time, never again.
  *
  * Uses Spark's native parquet bucketing through the session catalog —
  * no Hive metastore needed (works with the in-memory catalog; on a
  * cluster you'd back it with HMS/Unity/Glue).
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table named `table`. */
  def bucketWrite(df: DataFrame, table: String, keys: Seq[String],
                  buckets: Int, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode)
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata comes from the
    * catalog, making scans report the hash partitioning to the
    * planner).
    */
  def bucketRead(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** True if the physical plan of `df` contains a shuffle exchange —
    * the assertion hook for "this join is co-located".
    */
  def hasShuffle(df: DataFrame): Boolean =
    df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
