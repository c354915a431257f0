package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins (SURVEY scale notes): when a handful of
  * hot keys dominate a shuffle join, salt the skewed side into `salt`
  * sub-keys and replicate the other side once per salt value. The hot
  * key's rows then spread over `salt` tasks instead of one straggler.
  *
  * AQE's skew-join handling (on by default) covers sort-merge joins at
  * runtime; explicit salting remains the tool for aggregations and for
  * joins AQE can't split (e.g. bucketed inputs, or when the skewed
  * side must stay streaming). Result is EXACTLY the plain join's.
  */
object Skew {

  /** Equi-join `skewed ⋈ other` on `keys`, with the skewed side salted
    * `salt` ways. `other` is replicated `salt`× — keep it the smaller
    * side.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                 salt: Int = 8, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // replication is only transparent when every OTHER-side row must
    // match to appear: an unmatched right row would survive a
    // right/full outer join once per salt value
    require(Set("inner", "left", "left_outer", "leftouter",
      "left_semi", "leftsemi", "left_anti", "leftanti")
      .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/left_semi/left_anti joins; " +
        s"$joinType would duplicate unmatched replicated-side rows")
    val l = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val r = other.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group-by keys:
    * count/sum-shaped aggregates pre-combine on (key, salt) before the
    * final combine on key, so one hot key cannot overload a reducer.
    * Spark's hash aggregate already does map-side partials; this helper
    * exists for sketch/collect-style aggregates that don't.
    */
  def saltedCountSum(df: DataFrame, keys: Seq[String], valueCol: String,
                     salt: Int = 8): DataFrame = {
    val partial = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
      .groupBy((keys :+ "__salt").map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__n"), sum(col(valueCol)).as("__s"))
    partial.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(sum("__n").as("n"), sum("__s").as(s"sum_$valueCol"))
  }
}
