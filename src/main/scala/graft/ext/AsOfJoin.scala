package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join ([EXT]): for each left row, the single right row with the
  * greatest right-timestamp ≤ the left timestamp (backward, inclusive —
  * DuckDB/`ASOF JOIN` semantics), per key.
  *
  * Implementation is the scalable union trick, not a range join: tag
  * and union both sides on (key, ts), then one window pass takes the
  * last non-null right payload at or before each left row. ONE shuffle
  * on the key + a sort — no per-row range probe, no O(|L|·|R|) blowup;
  * this is how as-of joins are done on billions of rows. The right
  * payload travels as a single struct so all its fields come from the
  * SAME matched row (per-column last() could mix rows when a payload
  * field is legitimately null).
  */
object AsOfJoin {

  /** Backward as-of join. Output: every left row + the matched right
    * row's non-key columns renamed `<prefix><name>` (null when no
    * right row at or before it).
    *
    * Right rows sharing (key, ts) are deduplicated deterministically
    * (smallest payload first) before the join.
    */
  def backward(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               prefix: String = "r_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c)).toSeq
    // deterministic dedupe of right on (keys, ts)
    val ord = payloadCols.filterNot(_ == rightTs).map(col(_).asc)
    val dw = Window.partitionBy((keys :+ rightTs).map(col).toIndexedSeq: _*)
      .orderBy((if (ord.isEmpty) Seq(lit(1).asc) else ord).toIndexedSeq: _*)
    val rightDeduped = right.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn")

    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val r = rightDeduped.select(
      (keys.map(col) ++ Seq(col(rightTs).as("__ats"),
        lit(0).as("__tag"), payload.as("__p"))).toIndexedSeq: _*)
    val l = left
      .withColumn("__ats", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
    val u = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left at equal ts → inclusive (ts >= rts)
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col("__ats").asc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols = payloadCols.map(c =>
      col("__last").getField(c).as(prefix + c))
    u.withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((left.columns.toSeq.map(col) ++ matchedCols).toIndexedSeq: _*)
  }

  /** Forward as-of join: the right row with the smallest right-ts ≥ the
    * left row's ts (symmetric to [[backward]]).
    */
  def forward(left: DataFrame, right: DataFrame, keys: Seq[String],
              leftTs: String, rightTs: String,
              prefix: String = "r_"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c)).toSeq
    val ord = payloadCols.filterNot(_ == rightTs).map(col(_).asc)
    val dw = Window.partitionBy((keys :+ rightTs).map(col).toIndexedSeq: _*)
      .orderBy((if (ord.isEmpty) Seq(lit(1).asc) else ord).toIndexedSeq: _*)
    val rightDeduped = right.withColumn("__rn", row_number().over(dw))
      .filter(col("__rn") === 1).drop("__rn")

    val payload = struct(payloadCols.map(col).toIndexedSeq: _*)
    val r = rightDeduped.select(
      (keys.map(col) ++ Seq(col(rightTs).as("__ats"),
        lit(0).as("__tag"), payload.as("__p"))).toIndexedSeq: _*)
    val l = left
      .withColumn("__ats", col(leftTs))
      .withColumn("__tag", lit(1))
      .withColumn("__p", lit(null).cast(r.schema("__p").dataType))
    val u = l.unionByName(r, allowMissingColumns = true)

    // right rows sort before left at equal ts in DESC order too, via
    // tag asc — so an equal-ts right row is visible to the left row
    val w = Window.partitionBy(keys.map(col).toIndexedSeq: _*)
      .orderBy(col("__ats").desc, col("__tag").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedCols = payloadCols.map(c =>
      col("__last").getField(c).as(prefix + c))
    u.withColumn("__last", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((left.columns.toSeq.map(col) ++ matchedCols).toIndexedSeq: _*)
  }
}
