package graft

import graft.sources.Resolver
import graft.spec.DatasetRef
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("S5 csv roundtrip with header + inferSchema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    sf("region").write.option("header", "true").csv(s"$dir/region.csv")
    val back = Resolver.read(spark, DatasetRef("csv", dir, "region"))
    assert(back.count() == 5)
    assert(back.schema("r_regionkey").dataType.isInstanceOf[NumericType])
  }

  test("W11 explicit schema (tmap) overrides inference") {
    val dir = Files.createTempDirectory("graft_csv2").toString
    sf("region").write.option("header", "true").csv(s"$dir/r.csv")
    val mapped = StructType(Seq(
      StructField("r_regionkey", StringType), // force string
      StructField("r_name", StringType)))
    val back = Resolver.read(spark, DatasetRef("csv", dir, "r"), Some(mapped))
    assert(back.schema("r_regionkey").dataType == StringType)
  }

  test("S5 csv/json TARGETS write in their own format (roundtrip via engine)") {
    import graft.engine.Runner
    import graft.spec._
    val dir = Files.createTempDirectory("graft_tgt_fmt").toString
    for (backend <- Seq("csv", "json")) {
      val job = JobSpec(
        SourceSpec(DatasetRef("parquet", "/root/testdata/sf0.001", "region")),
        target = Some(TargetSpec(DatasetRef(backend, dir, s"region_$backend"),
          op = WriteOp.Create, skipTimestamp = true)))
      Runner.execute(spark, job, log = false)
      val back = Resolver.read(spark, DatasetRef(backend, dir, s"region_$backend"))
      assert(back.count() == 5, s"backend $backend")
      assert(back.columns.contains("r_name"))
    }
  }

  test("json source") {
    val dir = Files.createTempDirectory("graft_json").toString
    sf("nation").write.json(s"$dir/nation.json")
    val back = Resolver.read(spark, DatasetRef("json", dir, "nation"))
    assert(back.count() == 25)
  }

  test("S4/F8 http source: driver-side fetch, single-record semantics") {
    // file:// URL exercises the same driver-fetch path as http://
    val f = Files.createTempFile("graft_http", ".json")
    Files.writeString(f, """{"city": "x", "pop": 7}""")
    val ref = DatasetRef("http", s"file:${f.getParent}", f.getFileName.toString)
    val df = Resolver.read(spark, ref)
    assert(df.count() == 1)
    assert(df.select("city").as[String].head() == "x")
  }
}
