package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev probe: run one SparkEntry query and print every Spark job's
  * wall time + call site — the fixed-overhead audit behind the
  * `q_dedup_cdc_index` gate work (BASELINE residual #2). Not part of
  * the driver protocol.
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q_dedup_cdc_index")
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.put(j.jobId, (System.nanoTime(), {
          // engine-frame attribution: first graft line in ANY stage's
          // call-site details, else the result stage's name
          val site = j.stageInfos.flatMap(_.details.linesIterator)
            .find(l => l.contains("graft.") && !l.contains("JobProbe"))
            .map(_.trim.stripPrefix("at ")).getOrElse(
              j.stageInfos.lastOption.map(_.name).getOrElse("?"))
          site
        }))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(j.jobId)).foreach { case (t0, site) =>
          done.synchronized {
            done += ((j.jobId, (System.nanoTime() - t0) / 1e9, site)); ()
          }
        }
      }
    })
    val fn = graft.SparkEntry.queries(name)
    // warm pass (matches the bench protocol)
    try fn(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warm failed: $e") }
    done.synchronized(done.clear())
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(300)
    val snap = done.synchronized(done.toVector).sortBy(_._1)
    println(f"== $name: ${snap.size} jobs, $total%.2f s wall ==")
    snap.foreach { case (id, sec, site) =>
      println(f"job $id%3d  $sec%6.3f s  $site")
    }
    println(f"sum(job wall) = ${snap.map(_._2).sum}%.2f s")
    spark.stop()
  }
}
