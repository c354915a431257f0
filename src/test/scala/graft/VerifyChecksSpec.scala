package graft

/** Enforces every differential oracle from [[DiffChecks]] as a hard
  * test. Runs at sf0.01 — the same scale the driver's Verify gate uses
  * — because the recall/binomial bounds are calibrated for corpus-sized
  * inputs, not the 50-row sf0.001 slices.
  */
class VerifyChecksSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  SparkEntry.diffChecks.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"diffcheck: $name") {
      val c = fn(spark, dir)
      assert(c.pass, s"$name: ${c.detail}")
    }
  }

  test("every rows-only query has a differential oracle") {
    val oracleKeys = SparkEntry.oracleSql.keySet
    val rowsOnly = SparkEntry.queries.keySet -- oracleKeys
    val unchecked = rowsOnly -- SparkEntry.diffChecks.keySet
    assert(unchecked.isEmpty,
      s"queries with neither DuckDB oracle nor diffcheck: $unchecked")
  }
}
