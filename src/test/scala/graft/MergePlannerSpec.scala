package graft

import graft.operators.MergePlanner
import graft.spec.{DatasetRef, MergeDirection, MergerSpec}

class MergePlannerSpec extends SparkSpec {
  import spark.implicits._

  // source: 4 cities; Berlin has no match; Paris has two matches.
  lazy val src = Seq(
    (1L, "nyc", "a"),
    (2L, "paris", "b"),
    (3L, "berlin", "c"),
    (4L, null.asInstanceOf[String], "d")
  ).toDF("id", "city", "tag")

  // merger: pop data; includes a shared column `tag` for overlay tests
  // and a null-city row for strict-match tests.
  lazy val mrg = Seq(
    ("nyc", 8L, "m-nyc"),
    ("paris", 2L, "m-paris1"),
    ("paris", 3L, "m-paris2"),
    (null.asInstanceOf[String], 0L, "m-null")
  ).toDF("city", "pop", "tag")

  private val dummy = DatasetRef("parquet", "", "mrg")
  private def spec(f: MergerSpec => MergerSpec = identity): MergerSpec =
    f(MergerSpec(dummy, query = Seq("city" -> "#city#")))

  test("correlated range key: __lte=#field# range lookup, match_one per source row") {
    val amounts = Seq((1L, 5.0), (2L, 25.0), (3L, -1.0)).toDF("id", "amt")
    val tiers = Seq(("t_low", 0.0), ("t_mid", 10.0), ("t_high", 20.0)).toDF("tier", "lo")
    val rangeSpec = MergerSpec(dummy, query = Seq("lo__lte" -> "#amt#"))
    // unwind: one row per qualifying tier
    val all = MergePlanner.merge(amounts, tiers,
      rangeSpec.copy(unwind = true, matchOne = false)).orderBy("id", "lo")
    assert(all.groupBy("id").count().orderBy("id")
      .select("count").as[Long].collect().toSeq == Seq(1L, 3L, 1L))
    // match_one with a range op dedupes AFTER the join (per source row,
    // deterministic first by merger sortables asc in column order:
    // (tier asc, lo asc) → "t_high" sorts first alphabetically for id=2)
    val one = MergePlanner.merge(amounts, tiers, rangeSpec).orderBy("id")
    assert(rows(one.select("id", "tier")) ==
      Seq(Seq(1L, "t_low"), Seq(2L, "t_high"), Seq(3L, null)))
    // duplicate source rows must each keep their own match (left-outer
    // cardinality preserved — regression for per-source-row windowing)
    val dupSrc = Seq((1L, 25.0), (1L, 25.0)).toDF("id", "amt")
    assert(MergePlanner.merge(dupSrc, tiers, rangeSpec).count() == 2)
  }

  test("J1 base lookup: left outer, match_one keeps first match") {
    val out = MergePlanner.merge(src, mrg, spec()).orderBy("id")
    // match_one picks deterministic first paris row (pop asc => 2)
    assert(rows(out.select("id", "pop")) ==
      Seq(Seq(1L, 8L), Seq(2L, 2L), Seq(3L, null), Seq(4L, 0L)))
  }

  test("J2 direction m2s vs s2m on shared column") {
    val m2s = MergePlanner.merge(src, mrg, spec()).orderBy("id")
    assert(m2s.select("tag").as[String].collect().toSeq ==
      Seq("m-nyc", "m-paris1", "c", "m-null")) // merger overlays; no match keeps src
    val s2m = MergePlanner.merge(src, mrg, spec(_.copy(direction = MergeDirection.S2M)))
      .orderBy("id")
    assert(s2m.select("tag").as[String].collect().toSeq == Seq("a", "b", "c", "d"))
  }

  test("J3 require_match = inner semantics") {
    val out = MergePlanner.merge(src, mrg, spec(_.copy(requireMatch = true)))
    assert(out.select("id").as[Long].collect().toSet == Set(1L, 2L, 4L))
  }

  test("J4 require_no_match = anti semantics, source columns only") {
    val out = MergePlanner.merge(src, mrg, spec(_.copy(requireNoMatch = true)))
    assert(out.columns.toSeq == src.columns.toSeq)
    assert(out.select("id").as[Long].collect().toSeq == Seq(3L))
  }

  test("J6 unwind = one row per match") {
    val out = MergePlanner.merge(src, mrg, spec(_.copy(unwind = true, matchOne = false)))
    assert(out.filter($"id" === 2L).count() == 2)
    assert(out.count() == 5) // 1 + 2 + 1(no match) + 1(null match)
  }

  test("J7 strict_match: null keys do not join") {
    val strict = MergePlanner.merge(src, mrg, spec(_.copy(strictMatch = true)))
      .orderBy("id")
    assert(strict.select("pop").collect().map(_.get(0)).toSeq ==
      Seq(8L, 2L, null, null)) // id=4 no longer matches the null-city row
  }

  test("J8 merge_as nests the match; null when unmatched") {
    val out = MergePlanner.merge(src, mrg, spec(_.copy(mergeAs = Some("m"))))
      .orderBy("id")
    assert(out.columns.toSeq == Seq("id", "city", "tag", "m"))
    val ms = out.select("m.pop").collect().map(_.get(0)).toSeq
    assert(ms == Seq(8L, 2L, null, 0L))
  }

  test("literal merger query values filter the merger side") {
    val out = MergePlanner.merge(src, mrg,
      spec(_.copy(query = Seq("city" -> "#city#", "pop__gte" -> "3"))))
      .orderBy("id")
    assert(out.select("pop").collect().map(_.get(0)).toSeq ==
      Seq(8L, 3L, null, null))
  }

  test("J9 merge rule: scoped concat on shared column, unmatched keeps source") {
    import graft.spec.TransformStage
    val out = MergePlanner.merge(src, mrg,
      spec(_.copy(mergeRule = Some(TransformStage("concat", Seq("tag"))))))
      .orderBy("id")
    // matched rows concat src.tag + merger.tag (null city matches null
    // city under the default tolerant <=>); unmatched keep src.tag
    assert(out.select("tag").as[String].collect().toSeq ==
      Seq("am-nyc", "bm-paris1", "c", "dm-null"))
    // scoping to `city` (shared, but a join key the rule skips? no —
    // city IS shared and non-pk here, so the rule applies only to it
    // and `tag` stays on the direction overlay)
    val scoped = MergePlanner.merge(src, mrg,
      spec(_.copy(mergeRule = Some(TransformStage("concat", Seq("city"))))))
      .orderBy("id")
    assert(scoped.select("tag").as[String].collect().toSeq ==
      Seq("m-nyc", "m-paris1", "c", "m-null")) // default m2s overlay
    // a scope column that isn't shared is a loud error, not a silent
    // fallback to the overlay
    intercept[IllegalArgumentException] {
      MergePlanner.merge(src, mrg,
        spec(_.copy(mergeRule = Some(TransformStage("concat", Seq("other"))))))
    }
    // --mma + --mrules is contradictory
    intercept[IllegalArgumentException] {
      MergePlanner.merge(src, mrg, spec(_.copy(
        mergeAs = Some("m"), mergeRule = Some(TransformStage("sum", Nil)))))
    }
    // unknown rule fails loudly
    intercept[IllegalArgumentException] {
      MergePlanner.merge(src, mrg,
        spec(_.copy(mergeRule = Some(TransformStage("nope", Nil))))).collect()
    }
  }

  test("J3 ∪ J4 partition: require_match + require_no_match = all") {
    val m = MergePlanner.merge(src, mrg, spec(_.copy(requireMatch = true)))
    val a = MergePlanner.merge(src, mrg, spec(_.copy(requireNoMatch = true)))
    assert(m.select("id").as[Long].collect().toSet ++
      a.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L, 4L))
  }
}
