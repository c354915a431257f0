package graft

import graft.ext.AsOfJoin
import graft.operators.Skew
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  lazy val quotes = Seq(
    (1L, ts("2024-01-01 00:00:00"), 10.0),
    (1L, ts("2024-01-01 00:10:00"), 11.0),
    (1L, ts("2024-01-01 00:20:00"), 12.0),
    (2L, ts("2024-01-01 00:05:00"), 20.0)
  ).toDF("k", "qts", "price")

  lazy val trades = Seq(
    (1L, ts("2024-01-01 00:09:59"), "a"), // -> 10.0
    (1L, ts("2024-01-01 00:10:00"), "b"), // inclusive -> 11.0
    (1L, ts("2024-01-01 00:30:00"), "c"), // -> 12.0
    (2L, ts("2024-01-01 00:00:00"), "d"), // before any quote -> null
    (3L, ts("2024-01-01 00:00:00"), "e")  // unknown key -> null
  ).toDF("k", "tts", "tag")

  test("as-of backward: greatest right ts <= left ts, inclusive, per key") {
    val out = AsOfJoin.backward(trades, quotes, Seq("k"), "tts", "qts", "q_")
      .orderBy("k", "tts")
    val got = out.select("tag", "q_price").collect().map(r => (r.getString(0), r.get(1)))
    assert(got.toSeq == Seq(("a", 10.0), ("b", 11.0), ("c", 12.0), ("d", null), ("e", null)))
    assert(out.columns.toSeq == Seq("k", "tts", "tag", "q_qts", "q_price"))
  }

  test("as-of forward: smallest right ts >= left ts") {
    val out = AsOfJoin.forward(trades, quotes, Seq("k"), "tts", "qts", "q_")
      .orderBy("k", "tts")
    val got = out.select("tag", "q_price").collect().map(r => (r.getString(0), r.get(1)))
    assert(got.toSeq == Seq(("a", 11.0), ("b", 11.0), ("c", null), ("d", 20.0), ("e", null)))
  }

  test("as-of backward on events matches a per-row subquery oracle") {
    val ev = sf("events").limit(300).cache()
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pts"), $"value".as("pvalue"))
    val out = AsOfJoin.backward(
      ev.select("event_id", "user_id", "ts"), purchases,
      Seq("user_id"), "ts", "pts", "p_")
    // brute-force oracle: max(pts) per row via join+group
    val brute = ev.select($"event_id", $"user_id", $"ts").as("e")
      .join(purchases.as("p"), $"e.user_id" === $"p.user_id" && $"p.pts" <= $"e.ts", "left_outer")
      .groupBy($"e.event_id").agg(max($"p.pts").as("best"))
    val cmp = out.join(brute, "event_id")
      .filter(!($"p_pts" <=> $"best"))
    assert(cmp.count() == 0)
  }

  test("bucketed tables make the equi-join shuffle-free") {
    import graft.operators.Bucketing
    Bucketing.bucketWrite(sf("orders"), "b_orders", Seq("o_custkey"), 4)
    Bucketing.bucketWrite(
      sf("customer").withColumnRenamed("c_custkey", "o_custkey"),
      "b_customer", Seq("o_custkey"), 4)
    val bj = Bucketing.bucketRead(spark, "b_orders")
      .join(Bucketing.bucketRead(spark, "b_customer"), "o_custkey")
    assert(!Bucketing.hasShuffle(bj), "bucketed join must not shuffle")
    // same join on raw frames DOES shuffle (or broadcasts) — and equal results
    val plain = sf("orders").join(
      sf("customer").withColumnRenamed("c_custkey", "o_custkey"), "o_custkey")
    assert(bj.count() == plain.count())
    // bucketed group-by on the bucket key is also exchange-free
    val agg = Bucketing.bucketRead(spark, "b_orders")
      .groupBy("o_custkey").count()
    assert(!Bucketing.hasShuffle(agg), "bucketed agg must not shuffle")
  }

  test("salted join equals plain join") {
    val l = sf("lineitem").limit(2000).select("l_orderkey", "l_quantity")
    val r = sf("orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = l.join(r, Seq("l_orderkey")).agg(
      count(lit(1)), round(sum("o_totalprice"), 2)).collect()(0)
    val salted = Skew.saltedJoin(l, r, Seq("l_orderkey"), salt = 7).agg(
      count(lit(1)), round(sum("o_totalprice"), 2)).collect()(0)
    assert(plain == salted)
  }

  test("range join matches naive cross+filter, with exact edge semantics") {
    import graft.ext.RangeJoin
    val points = Seq((1L, 0.0), (2L, 5.0), (3L, 10.0), (4L, 15.0), (5L, 17.5))
      .toDF("pid", "x")
    val ivs = Seq((10L, 0.0, 10.0), (20L, 10.0, 20.0), (30L, 4.0, 6.0))
      .toDF("iid", "lo", "hi")
    // exclusive hi: x=10 goes to [10,20) only; x=0 is in [0,10)
    val got = RangeJoin.rangeJoin(points, ivs, "x", "lo", "hi", bucketWidth = 3.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.crossJoin(ivs)
      .filter(col("x") >= col("lo") && col("x") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive)
    assert(got.contains((1L, 10L)) && !got.contains((3L, 10L)) && got.contains((3L, 20L)))
    // inclusive hi picks up the boundary point
    val incl = RangeJoin.rangeJoin(points, ivs, "x", "lo", "hi",
      bucketWidth = 3.0, inclusiveHi = true)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(incl == naive ++ Set((3L, 10L)))
  }

  test("range join on timestamps matches per-row oracle; bucket width immaterial") {
    import graft.ext.RangeJoin
    val ev = sf("events").limit(500).cache()
    val iv = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"),
        (col("ts") - expr("INTERVAL 60 SECONDS")).as("lo"),
        (col("ts") + expr("INTERVAL 60 SECONDS")).as("hi"))
    val pts = ev.select(col("event_id"), col("ts"))
    def run(w: Double, bc: Boolean) =
      RangeJoin.rangeJoin(pts, iv, "ts", "lo", "hi", w, broadcastIntervals = bc)
        .select("err_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(iv)
      .filter(col("ts") >= col("lo") && col("ts") < col("hi"))
      .select("err_id", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(120.0, bc = true) == naive)
    assert(run(7.0, bc = false) == naive)   // width changes cost, never results
    ev.unpersist()
  }

  test("range join on DATE columns (unix_date route; width in days)") {
    import graft.ext.RangeJoin
    val pts = Seq((1L, "2024-01-01"), (2L, "2024-01-15"), (3L, "2024-02-10"))
      .toDF("pid", "d").select(col("pid"), to_date(col("d")).as("d"))
    val ivs = Seq((10L, "2024-01-01", "2024-01-20"), (20L, "2024-02-01", "2024-03-01"))
      .toDF("iid", "lo", "hi")
      .select(col("iid"), to_date(col("lo")).as("lo"), to_date(col("hi")).as("hi"))
    val got = RangeJoin.rangeJoin(pts, ivs, "d", "lo", "hi", bucketWidth = 7.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = pts.crossJoin(ivs)
      .filter(col("d") >= col("lo") && col("d") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == naive && got == Set((1L, 10L), (2L, 10L), (3L, 20L)))
  }

  test("range join rejects overlapping column names and null rows drop out") {
    import graft.ext.RangeJoin
    val p = Seq((1L, 5.0), (2L, Double.NaN)).toDF("pid", "x")
    intercept[IllegalArgumentException] {
      RangeJoin.rangeJoin(p, p, "x", "x", "x", 1.0)
    }
    val pts = Seq(Tuple2(1L, Some(5.0)), Tuple2(2L, None)).toDF("pid", "x")
    val ivs = Seq((10L, Some(0.0), Some(10.0)), (20L, None, Some(3.0)))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.rangeJoin(pts, ivs, "x", "lo", "hi", 2.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L)))
  }

  test("timestamp flavors: range join + rolling agree on TIMESTAMP and TIMESTAMP_NTZ") {
    // Two-flavor regression fixture: the Aug-2026 testdata regeneration
    // silently switched events.ts to TIMESTAMP_NTZ and every direct
    // ts→numeric cast threw — this pins BOTH flavors through the two
    // epoch-keyed operators regardless of what flavor sf() reads.
    import graft.ext.{EventWindows, RangeJoin}
    import org.apache.spark.sql.types.TimestampNTZType
    val base = sf("events").limit(500)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val tz = base.withColumn("ts", $"ts".cast("timestamp")).cache()
    val ntz = base.withColumn("ts", $"ts".cast(TimestampNTZType)).cache()
    // session tz is UTC, so the flavors are the same instants and the
    // flavor-independent outputs must agree exactly
    def roll(df: org.apache.spark.sql.DataFrame) =
      EventWindows.rolling(df, 3600L)
        .select("event_id", "n_window", "sum_window").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(roll(tz) == roll(ntz) && roll(tz).nonEmpty)
    def rj(df: org.apache.spark.sql.DataFrame) = {
      val iv = df.filter($"event_type" === "error")
        .select($"event_id".as("err_id"),
          ($"ts" - expr("INTERVAL 60 SECONDS")).as("lo"),
          ($"ts" + expr("INTERVAL 60 SECONDS")).as("hi"))
      RangeJoin.rangeJoin(df.select("event_id", "ts"), iv, "ts", "lo", "hi",
          bucketWidth = 120.0, broadcastIntervals = true)
        .select("err_id", "event_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(rj(tz) == rj(ntz) && rj(tz).nonEmpty)
    tz.unpersist(); ntz.unpersist()
  }

  test("salted two-phase aggregation equals direct groupBy") {
    val df = sf("lineitem").limit(5000)
    val direct = df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_l_quantity"))
      .orderBy("l_returnflag").collect().toSeq
    val salted = Skew.saltedCountSum(df, Seq("l_returnflag"), "l_quantity", salt = 5)
      .orderBy("l_returnflag").collect().toSeq
    assert(direct.map(_.toSeq) == salted.map(_.toSeq))
  }
}
