package graft

import graft.operators.MergePlanner
import graft.spec.{DatasetRef, MergerSpec}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Merger-join fuzzing, the J-family companion to [[QueryFuzzSpec]]:
  * seeded random merger specs (join mode × match_one/unwind ×
  * strict/tolerant equality × null-carrying keys × literal merger
  * filters) executed by [[MergePlanner.merge]] and compared
  * row-for-row against an independently generated Spark-SQL mirror of
  * the documented semantics (the generator emits spec and mirror
  * together, so any divergence is a planner bug). The source is
  * `orders`, the merger `lineitem` — a genuine 1:N lookup, so
  * match_one's deterministic dedupe (row_number over the merger's
  * sortable non-key columns in schema order, ASC) and unwind's 1:N
  * expansion both do real work. The null-key variant plants NULLs on
  * BOTH sides so J7 strict (`===`) vs tolerant (`<=>`) equality
  * produce genuinely different results the mirror must reproduce.
  */
class MergerFuzzSpec extends SparkSpec {

  private val Cases = 40

  private lazy val orders: DataFrame = sf("orders")
    .withColumn("ok2", when(col("o_orderkey") % 7 === 0, lit(null))
      .otherwise(col("o_orderkey")))
  private lazy val lineitem: DataFrame = sf("lineitem")
    .withColumn("lk2", when(col("l_linenumber") % 5 === 0, lit(null))
      .otherwise(col("l_orderkey")))

  private final case class Pred(dsl: (String, String), sql: String)

  private def genPred(rnd: scala.util.Random): Pred = rnd.nextInt(4) match {
    case 0 =>
      val v = 1 + rnd.nextInt(50)
      Pred("l_quantity__lte" -> v.toString, s"l_quantity <= $v")
    case 1 =>
      val v = rnd.nextInt(7)
      Pred("l_linenumber__gt" -> v.toString, s"l_linenumber > $v")
    case 2 =>
      val v = if (rnd.nextBoolean()) "A" else "N"
      Pred("l_returnflag" -> v, s"l_returnflag = '$v'")
    case _ =>
      val v = 1 + rnd.nextInt(6000)
      Pred("l_orderkey__lt" -> v.toString, s"l_orderkey < $v")
  }

  private def canon(df: DataFrame): (Seq[String], Seq[Seq[Any]]) =
    (df.columns.toSeq,
      df.collect().toSeq.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("")))

  test(s"$Cases seeded merger specs match independently generated SQL mirrors") {
    val rnd = new scala.util.Random(20260814L)
    orders.createOrReplaceTempView("o_fz")
    lineitem.createOrReplaceTempView("l_fz")
    val mref = DatasetRef("parquet", "/tmp", "l_fz")
    var antiCases = 0; var unwindCases = 0; var strictDiffCases = 0
    for (i <- 0 until Cases) {
      val nullKeys = rnd.nextBoolean()
      val strict = rnd.nextBoolean()
      val (mk, sk) = if (nullKeys) ("lk2", "ok2") else ("l_orderkey", "o_orderkey")
      val mode = rnd.nextInt(5) // 0 left+one, 1 unwind, 2 inner+one, 3 inner+unwind, 4 anti
      val preds = Seq.fill(rnd.nextInt(3))(genPred(rnd))
      val where = if (preds.isEmpty) "" else preds.map(_.sql).mkString(" AND ")
      val spec = MergerSpec(mref,
        query = (mk -> s"#$sk#") +: preds.map(_.dsl),
        requireMatch = mode == 2 || mode == 3,
        requireNoMatch = mode == 4,
        matchOne = mode == 0 || mode == 2,
        unwind = mode == 1 || mode == 3,
        strictMatch = strict)
      if (mode == 4) antiCases += 1
      if (mode == 1 || mode == 3) unwindCases += 1
      if (nullKeys) strictDiffCases += 1

      // ── independently generated mirror ──────────────────────────────
      val eqOp = if (strict) "=" else "<=>"
      val mf = s"SELECT * FROM l_fz${if (where.isEmpty) "" else s" WHERE $where"}"
      val sql =
        if (mode == 4)
          s"""SELECT * FROM o_fz s
              WHERE NOT EXISTS (SELECT 1 FROM ($mf) m WHERE s.$sk $eqOp m.$mk)"""
        else {
          // match_one dedupe mirror: row_number over the merger's
          // sortable non-key columns in SCHEMA order, ascending —
          // exactly MergePlanner.dedupeOne
          val ordCols = lineitem.columns.filterNot(_ == mk).mkString(", ")
          val md =
            if (mode == 0 || mode == 2)
              s"""SELECT * FROM (
                    SELECT *, row_number() OVER (PARTITION BY $mk ORDER BY $ordCols) AS __rn
                    FROM ($mf)) WHERE __rn = 1"""
            else mf
          val joinKind = if (mode == 2 || mode == 3) "JOIN" else "LEFT JOIN"
          val mCols = lineitem.columns.map(c => s"m.$c").mkString(", ")
          s"""SELECT s.*, $mCols FROM o_fz s $joinKind ($md) m
              ON s.$sk $eqOp m.$mk"""
        }

      val got = canon(MergePlanner.merge(orders, lineitem, spec))
      val want = canon(spark.sql(sql))
      assert(got._1 == want._1, s"fuzz case $i column mismatch\n${got._1}\n${want._1}")
      assert(got._2 == want._2,
        s"fuzz case $i diverged (mode=$mode strict=$strict nullKeys=$nullKeys)\n" +
          s"spec: $spec\nSQL: $sql\ngot ${got._2.size} rows, want ${want._2.size}")
    }
    assert(antiCases >= 4 && unwindCases >= 8 && strictDiffCases >= 12,
      s"generator coverage too thin: anti=$antiCases unwind=$unwindCases null=$strictDiffCases")
  }
}
