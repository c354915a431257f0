package graft

import graft.engine.{Planner, Runner}
import graft.operators.WriteOps
import graft.spec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry routes through the engine (spec → Planner/WriteOps), so
  * the oracle checks exercise the declarative surface, not ad-hoc
  * DataFrame code. Column names are aliased identically in the Spark
  * plan and the oracle SQL (driver hash-compares by sorted column name).
  */
object SparkEntry {

  private def ds(dir: String, name: String) = DatasetRef("parquet", dir, name)
  private def src(dir: String, name: String, query: (String, String)*) =
    SourceSpec(ds(dir, name), query.toSeq)
  private def read(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Planner.plan(spark, JobSpec(
      src("/root/testdata/sf0.001", "lineitem",
        "l_quantity__gte" -> "30", "_sort" -> "-l_extendedprice,l_orderkey,l_linenumber",
        "_limit" -> "100"),
      merger = Some(MergerSpec(ds("/root/testdata/sf0.001", "orders"),
        query = Seq("o_orderkey" -> "#l_orderkey#")))))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ── F1 equality filter ────────────────────────────────────────────
    "q_filter_eq" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "customer", "c_mktsegment" -> "BUILDING", "_sort" -> "c_custkey")))),

    // ── F2 operator suffixes gte/lt/in ────────────────────────────────
    "q_filter_ops" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "lineitem",
        "l_quantity__gte" -> "30", "l_discount__lt" -> "0.03",
        "l_returnflag__in" -> "A,N",
        "_fields" -> "l_orderkey,l_linenumber,l_quantity,l_discount,l_returnflag",
        "_sort" -> "l_orderkey,l_linenumber")))),

    // ── F3/F4 sort + limit (top-N) ────────────────────────────────────
    "q_sort_limit" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders", "_sort" -> "-o_totalprice,o_orderkey", "_limit" -> "10")))),

    // ── F5 projection with exclusion ──────────────────────────────────
    "q_fields_excl" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders", "_fields" -> "-o_orderpriority,-o_orderstatus",
        "_sort" -> "o_orderkey")))),

    // ── F6/S12 count with _limit cap (min rule, base.py:486-490) ──────
    "q_count" -> ((s, dir) => {
      import s.implicits._
      Seq(Runner.count(s, src(dir, "lineitem", "l_returnflag" -> "R"))).toDF("cnt")
    }),
    "q_count_capped" -> ((s, dir) => {
      import s.implicits._
      Seq(Runner.count(s, src(dir, "lineitem",
        "l_returnflag" -> "R", "_limit" -> "100"))).toDF("cnt")
    }),

    // ── J1/J2 merger: left-outer correlated lookup ────────────────────
    "q_merge_left" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders", "_sort" -> "o_orderkey"),
      merger = Some(MergerSpec(ds(dir, "customer"),
        query = Seq("c_custkey" -> "#o_custkey#")))))),

    // ── J3+J5 require_match + match_one (first order per customer) ────
    "q_merge_inner" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "customer", "_sort" -> "c_custkey"),
      merger = Some(MergerSpec(ds(dir, "orders"),
        query = Seq("o_custkey" -> "#c_custkey#"),
        requireMatch = true))))),

    // ── J4 require_no_match (anti-join: orders without lineitems) ─────
    "q_merge_anti" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders", "_sort" -> "o_orderkey"),
      merger = Some(MergerSpec(ds(dir, "lineitem"),
        query = Seq("l_orderkey" -> "#o_orderkey#"),
        requireNoMatch = true))))),

    // ── J6 unwind (1:N expansion) + literal merger-side filter ────────
    "q_merge_unwind" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders", "o_orderstatus" -> "F",
        "_sort" -> "o_orderkey"),
      merger = Some(MergerSpec(ds(dir, "lineitem"),
        query = Seq("l_orderkey" -> "#o_orderkey#", "l_quantity__gte" -> "45"),
        unwind = true))))
      .orderBy(col("o_orderkey").asc, col("l_linenumber").asc_nulls_first)),

    // ── J8+F7 merge_as nesting + flatten ──────────────────────────────
    "q_merge_as_flat" -> ((s, dir) => {
      val merged = Planner.plan(s, JobSpec(
        src(dir, "orders", "_sort" -> "o_orderkey"),
        merger = Some(MergerSpec(ds(dir, "customer"),
          query = Seq("c_custkey" -> "#o_custkey#"),
          mergeAs = Some("cust")))))
      graft.functions.StructUtils.flatten(merged).orderBy("o_orderkey")
    }),

    // ── W4 upsert ─────────────────────────────────────────────────────
    "q_write_upsert" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") < 1000)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      WriteOps.upsert(orders, batch, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // ── W6 insert (skip existing keys) ────────────────────────────────
    "q_write_insert" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") < 1000)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      WriteOps.insert(orders, batch, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // ── W3+W9+F10 update restricted by tq, per-field overwrite ────────
    "q_write_update" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") < 2000)
        .withColumn("o_orderpriority", lit("9-UPDATED"))
      WriteOps.update(orders, batch, Seq("o_orderkey"),
        tq = Seq("o_orderstatus" -> "O"),
        overwrite = Seq("o_orderpriority")).orderBy("o_orderkey")
    }),

    // ── W5 delete ─────────────────────────────────────────────────────
    "q_write_delete" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val batch = orders.filter(col("o_orderstatus") === "F" && col("o_orderkey") < 5000)
      WriteOps.delete(orders, batch, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // ── W2 index (full record replace by pk) ──────────────────────────
    "q_write_index" -> ((s, dir) => {
      val orders = read(s, dir, "orders")
      val batch = orders.filter(col("o_orderkey") < 1000)
        .withColumn("o_orderpriority", lit(null).cast("string"))
      WriteOps.index(orders, batch, Seq("o_orderkey")).orderBy("o_orderkey")
    }),

    // ── §2.5 transformer chain ────────────────────────────────────────
    "q_transform_chain" -> ((s, dir) => Planner.plan(s, JobSpec(
      SourceSpec(ds(dir, "customer"),
        query = Seq("_sort" -> "c_custkey"),
        postRead = Seq(
          TransformStage("upper", Seq("c_name")),
          TransformStage("set_expr", Seq("bal_band",
            "CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END"))))))),

    // ── [EXT] §2.6 aggregation via the _group/_agg DSL ────────────────
    "q_group_dsl" -> ((s, dir) => Planner.plan(s, JobSpec(
      src(dir, "orders",
        "_group" -> "o_orderstatus", "_agg" -> "count:*,max:o_totalprice",
        "_sort" -> "o_orderstatus")))),

    // ── [EXT] §2.6 TPC-H Q1-style pricing summary ─────────────────────
    "q1_agg" -> ((s, dir) =>
      read(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(avg("l_quantity"), 4).as("avg_qty"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")),

    // ── [EXT] window function: top-3 orders per customer ──────────────
    "q_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      read(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    }),

    // ── [EXT] exact dedup on documents (first doc per text) ───────────
    "q_dedup_exact" -> ((s, dir) => {
      val w = Window.partitionBy("text").orderBy(col("doc_id").asc)
      read(s, dir, "documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
        .orderBy("doc_id")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_filter_eq" ->
      "SELECT * FROM customer WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey",
    "q_filter_ops" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
         FROM lineitem
         WHERE l_quantity >= 30 AND l_discount < 0.03 AND l_returnflag IN ('A','N')
         ORDER BY l_orderkey, l_linenumber""",
    "q_sort_limit" ->
      "SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "q_fields_excl" ->
      "SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders ORDER BY o_orderkey",
    "q_count" ->
      "SELECT count(*) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
    "q_count_capped" ->
      "SELECT least(100, count(*)) AS cnt FROM lineitem WHERE l_returnflag = 'R'",
    "q_merge_left" ->
      """SELECT o.*, c.c_custkey, c.c_name, c.c_nationkey, c.c_acctbal, c.c_mktsegment
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o.o_orderkey""",
    "q_merge_inner" ->
      """SELECT c.*, o.o_orderkey, o.o_custkey, o.o_orderstatus, o.o_totalprice,
                o.o_orderdate, o.o_orderpriority
         FROM customer c
         JOIN (SELECT *, row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_orderkey) AS rn FROM orders) o
           ON c.c_custkey = o.o_custkey AND o.rn = 1
         ORDER BY c.c_custkey""",
    "q_merge_anti" ->
      """SELECT * FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
         ORDER BY o_orderkey""",
    "q_merge_unwind" ->
      """SELECT o.*, l.l_orderkey, l.l_partkey, l.l_suppkey, l.l_linenumber,
                l.l_quantity, l.l_extendedprice, l.l_discount, l.l_tax,
                l.l_returnflag, l.l_linestatus, l.l_shipdate
         FROM orders o
         LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 45) l
           ON l.l_orderkey = o.o_orderkey
         WHERE o.o_orderstatus = 'F'
         ORDER BY o.o_orderkey, l.l_linenumber NULLS FIRST""",
    "q_merge_as_flat" ->
      """SELECT o.*, c.c_custkey AS cust_c_custkey, c.c_name AS cust_c_name,
                c.c_nationkey AS cust_c_nationkey, c.c_acctbal AS cust_c_acctbal,
                c.c_mktsegment AS cust_c_mktsegment
         FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
         ORDER BY o.o_orderkey""",
    "q_write_upsert" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus,
                CASE WHEN o_orderkey < 1000 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
                o_orderdate, o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "q_write_insert" ->
      """SELECT * FROM (
           SELECT * FROM orders
           UNION ALL
           SELECT o_orderkey + 10000000, o_custkey, o_orderstatus, o_totalprice,
                  o_orderdate, o_orderpriority
           FROM orders WHERE o_orderkey < 1000)
         ORDER BY o_orderkey""",
    "q_write_update" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                CASE WHEN o_orderkey < 2000 AND o_orderstatus = 'O'
                     THEN '9-UPDATED' ELSE o_orderpriority END AS o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "q_write_delete" ->
      """SELECT * FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_orderkey < 5000)
         ORDER BY o_orderkey""",
    "q_write_index" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                CASE WHEN o_orderkey < 1000 THEN NULL ELSE o_orderpriority END AS o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "q_transform_chain" ->
      """SELECT c_custkey, upper(c_name) AS c_name, c_nationkey, c_acctbal, c_mktsegment,
                CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'pos' END AS bal_band
         FROM customer ORDER BY c_custkey""",
    "q_group_dsl" ->
      """SELECT o_orderstatus, count(*) AS count_all, max(o_totalprice) AS max_o_totalprice
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base,
                round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc,
                round(avg(l_quantity), 4) AS avg_qty,
                count(*) AS cnt
         FROM lineitem
         WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q_window_topn" ->
      """SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q_dedup_exact" ->
      """SELECT doc_id, text, lang, source, n_chars FROM (
           SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
           FROM documents)
         WHERE rn = 1 ORDER BY doc_id"""
  )
}
