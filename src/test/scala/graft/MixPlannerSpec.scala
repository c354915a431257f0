package graft

import graft.ext.MixPlanner
import org.apache.spark.sql.functions._

/** Water-filling mixture-allocation laws: budget conservation, cap
  * respect, proportionality of the uncapped set, saturation,
  * monotonicity in the budget, zero-share exclusion, and a
  * hand-checked closed form.
  */
class MixPlannerSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(("a", 100L, 0.5), ("b", 100L, 0.3), ("c", 100L, 0.2))

  test("hand-checked closed form: overflow redistributes to the uncapped set") {
    // budget 360, caps 200 each. Unconstrained: a→180, b→108, c→72 —
    // nothing caps, T* = 360
    val r1 = MixPlanner.waterFill(base, 360, 2.0).map(a => a.source -> a.allocated).toMap
    assert(math.abs(r1("a") - 180.0) < 1e-9 &&
      math.abs(r1("b") - 108.0) < 1e-9 && math.abs(r1("c") - 72.0) < 1e-9)
    // budget 500: a wants 250 > cap 200 → caps; remaining 300 splits
    // 0.3:0.2 → b=180, c=120
    val r2 = MixPlanner.waterFill(base, 500, 2.0).map(a => a.source -> a.allocated).toMap
    assert(math.abs(r2("a") - 200.0) < 1e-9 &&
      math.abs(r2("b") - 180.0) < 1e-9 && math.abs(r2("c") - 120.0) < 1e-9)
  }

  test("conservation, caps, proportionality, saturation, monotonicity, zero share") {
    val rnd = new scala.util.Random(3)
    for (_ <- 1 to 30) {
      val n = 2 + rnd.nextInt(8)
      val rows = (0 until n).map(i =>
        (s"s$i", 50L + rnd.nextInt(1000).toLong,
          if (i == n - 1 && rnd.nextBoolean()) 0.0 else rnd.nextDouble()))
      val wSum = rows.map(_._3).sum
      if (wSum > 0) {
        val norm = rows.map { case (s, a, w) => (s, a, w / wSum) }
        // only positive-share sources can absorb budget — the
        // reachable total is THEIR cap sum
        val capTotal = norm.filter(_._3 > 0).map(_._2 * 2.0).sum
        val budget = rnd.nextDouble() * capTotal * 1.2
        val out = MixPlanner.waterFill(norm, budget, 2.0)
        out.foreach(a => assert(a.allocated <= a.cap + 1e-9, s"cap: $a"))
        out.filter(_.share <= 0).foreach(a => assert(a.allocated == 0.0))
        if (budget <= capTotal)
          assert(math.abs(out.map(_.allocated).sum - budget) < 1e-6,
            s"conservation: ${out.map(_.allocated).sum} vs $budget")
        else
          assert(math.abs(out.map(_.allocated).sum - capTotal) < 1e-6)
        // uncapped rows share one water level T* = alloc/share
        val uncapped = out.filter(a => a.share > 0 && a.allocated < a.cap - 1e-9)
        if (uncapped.size > 1) {
          val ts = uncapped.map(a => a.allocated / a.share)
          assert(ts.max - ts.min < 1e-6, s"one level: $ts")
        }
        // monotone in budget
        val out2 = MixPlanner.waterFill(norm, budget * 1.1, 2.0)
        out.sortBy(_.source).zip(out2.sortBy(_.source)).foreach {
          case (x, y) => assert(y.allocated >= x.allocated - 1e-9) }
      }
    }
  }

  test("plan over the documents corpus: rates feed the mixer, shares normalize") {
    val docs = sf("documents")
    val shares = (0 until 20).map(i => s"src$i" -> 1.0 / (1 + i)).toMap
    val out = MixPlanner.plan(docs, shares, budgetFrac = 0.5, maxRepeat = 2.0)
    val rows20 = out.as[(String, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(rows20.size == 20)
    val totalAvail = rows20.map(_._2).sum
    assert(math.abs(rows20.map(_._5).sum - math.floor(0.5 * totalAvail)) < 1.0)
    // the head source (share ≈ 0.278) must cap at 2× its availability
    val s0 = rows20.find(_._1 == "src0").get
    assert(math.abs(s0._5 - s0._4) < 1e-6, s"src0 should saturate: $s0")
    // rate ≤ maxRepeat everywhere
    rows20.foreach(r => assert(r._6 <= 2.0 + 1e-6))
  }
}
