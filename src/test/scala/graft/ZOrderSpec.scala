package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: key arithmetic exactness and the
  * data-skipping payoff the layout exists for.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zvalue interleaves bucket bits exactly") {
    val d = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (255L, 255L))
      .toDF("x", "y")
    val z = d.withColumn("z", ZOrder.zvalue(
        Seq(col("x"), col("y")), Seq(0L, 0L), Seq(255L, 255L), bits = 8))
      .orderBy("x", "y")
      .select("x", "y", "z").as[(Long, Long, Long)].collect().toSeq
    // x occupies even bit positions, y odd: x=3 -> 1+4, y=5 -> 2+32
    assert(z == Seq((0L, 0L, 0L), (0L, 1L, 2L), (1L, 0L, 1L),
      (3L, 5L, 39L), (255L, 255L, 65535L)))
  }

  test("zvalue bucket scaling: max lands in the top bucket, min in 0") {
    val d = Seq((10L, -5L), (265L, 250L)).toDF("x", "y")
    val z = d.withColumn("z", ZOrder.zvalue(
        Seq(col("x"), col("y")), Seq(10L, -5L), Seq(265L, 250L), bits = 8))
      .orderBy("x").select("z").as[Long].collect().toSeq
    assert(z == Seq(0L, 65535L))
  }

  test("zorderWrite skips files on the non-leading dimension") {
    // 64x64 grid; a single-column layout keeps tight envelopes on `a`
    // only, the z-order layout bounds BOTH dims per file
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("a"),
        pmod(col("id"), lit(64L)).cast("long").as("b"),
        col("id").as("payload"))
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val zPath = s"$tmp/z"; val aPath = s"$tmp/a"
    ZOrder.zorderWrite(grid, Seq("a", "b"), zPath, numFiles = 8, bits = 6)
    grid.repartitionByRange(8, col("a")).sortWithinPartitions("a")
      .write.mode("overwrite").parquet(aPath)
    assert(spark.read.parquet(zPath).count() == 4096L)
    val zFiles = ZOrder.fileEnvelopes(spark, zPath, "b").count()
    val aFiles = ZOrder.fileEnvelopes(spark, aPath, "b").count()
    // predicate b BETWEEN 0 AND 7: the a-sorted layout must read every
    // file (each spans the full b range); z-order reads a strict subset
    val zTouched = ZOrder.filesTouched(spark, zPath, "b", 0L, 7L)
    assert(ZOrder.filesTouched(spark, aPath, "b", 0L, 7L) == aFiles)
    assert(zTouched < zFiles, s"z-order touched $zTouched of $zFiles")
    // and it still prunes on the leading dim too (not as tightly as a
    // dedicated single-column sort -- that is the documented trade)
    assert(ZOrder.filesTouched(spark, zPath, "a", 0L, 7L) < zFiles)
  }

  test("zvalue guards: key width and bounds") {
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq(col("x"), col("y")), Seq(0L, 0L), Seq(1L, 1L), bits = 32)
    }
    intercept[IllegalArgumentException] {
      ZOrder.zvalue(Seq(col("x")), Seq(5L), Seq(1L), bits = 8)
    }
  }
}
