package graft.streaming

import graft.spec._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured Streaming surface ([EXT], SURVEY §2.9). The reference's
  * only incremental behavior is the continuation loop — re-run the
  * batch job until the excluded-source count stops changing
  * (etl_cli/etl.py:326-339). Its Spark-idiomatic upgrade is
  * `Trigger.AvailableNow`: the same declarative plan, incremental file
  * discovery, exactly-once sink + checkpoint — no driver-side fixpoint
  * bookkeeping. Event-time windows reuse EventWindows expressions with
  * a watermark bound on state.
  *
  * Scale notes: file-stream sources list incrementally
  * (maxFilesPerTrigger bounds a micro-batch); stateful aggs are keyed
  * by (window, key) and watermarks cap the state store; session state
  * in [[sessionize]] is one small case class per active (user) key.
  */
object StreamRunner {

  /** Streaming scan of a dataset ref (parquet/csv/json file streams).
    * Schema must be supplied or inferrable from existing files.
    */
  def readStream(spark: SparkSession, ref: DatasetRef,
                 schema: Option[StructType] = None): DataFrame = {
    import graft.sources.Resolver
    val path = Resolver.path(ref)
    // TIMESTAMP(NANOS) columns must be read as raw longs (the stream
    // scan matches the physical schema) and converted after load —
    // mirror of Resolver.readParquet.
    val nanos =
      if (ref.backend == "parquet" && schema.isEmpty)
        Resolver.nanoTimestampCols(spark, path)
      else Nil
    val fmt = ref.backend match {
      case "csv" => "csv"; case "json" => "json"; case "orc" => "orc"
      case _ => "parquet"
    }
    def opts(r: org.apache.spark.sql.DataFrameReader) =
      if (fmt == "csv") r.option("header", "true") else r
    def sopts(r: org.apache.spark.sql.streaming.DataStreamReader) =
      if (fmt == "csv") r.option("header", "true") else r
    def loadBoth() = {
      val s = schema.getOrElse(opts(spark.read.format(fmt)).load(path).schema)
      sopts(spark.readStream.schema(s).format(fmt)).load(path)
    }
    // conf scoped to the loads; restored so bare reads stay loud
    val raw =
      if (nanos.isEmpty) loadBoth()
      else Resolver.withNanosAsLong(spark)(loadBoth())
    Resolver.convertNanoCols(raw, nanos)
  }

  /** O4-as-a-stream: process everything currently available, write to
    * the target in append mode, remember progress in a checkpoint, and
    * stop — re-invoking later picks up only new files. This replaces
    * the contid/anti-filter fixpoint loop for append-shaped jobs.
    */
  def runAvailableNow(spark: SparkSession, source: DataFrame,
                      transform: DataFrame => DataFrame,
                      targetDir: String, checkpointDir: String): StreamingQuery = {
    val q = transform(source).writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  /** Watermarked tumbling-window aggregation over an event stream —
    * the streaming twin of EventWindows.tumbling; late events beyond
    * `lateness` are dropped and their window state reclaimed.
    */
  def windowedCounts(events: DataFrame, duration: String = "10 minutes",
                     lateness: String = "30 minutes"): DataFrame =
    // NTZ→TIMESTAMP first: withWatermark rejects TIMESTAMP_NTZ
    graft.functions.TimeKeys.withTzTimestamp(events, "ts")
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), duration), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact dedup — the streaming twin of TextDedup.exact:
    * drop rows whose `keys` were already seen, with state reclaimed
    * once the watermark passes (without the watermark bound, "seen
    * keys" state would grow forever — the 100 TB streaming constraint).
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  tsCol: String = "ts", lateness: String = "30 minutes"): DataFrame =
    graft.functions.TimeKeys.withTzTimestamp(events, tsCol)
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Streaming near-dup flagging against a STATIC signature index —
    * the continuous-ingestion twin of `TextDedup.incrementMatches`:
    * each arriving document is shingled and LSH-banded statelessly,
    * its buckets stream-static join the persisted index's bucket
    * table, candidates verify by exact Jaccard against the index's
    * shingle table, and matches emit (id, dup_of, jaccard, ts).
    *
    * State discipline (the 100 TB streaming constraint): every join is
    * stream-static — zero join state; the single stateful step is the
    * per-doc dedup of multi-band/multi-match hits
    * (`dropDuplicatesWithinWatermark` on the id), whose state reclaims
    * as the watermark passes. Which matching indexed doc reports as
    * `dup_of` is arbitrary when several match (a flag, not a ranking);
    * in-batch new-vs-new matching needs a cross-stream join — run the
    * batch `incrementMatches` per micro-batch via foreachBatch when
    * that matters.
    */
  def nearDupStream(stream: DataFrame, oldShingles: DataFrame,
                    oldBuckets: DataFrame, idCol: String, textCol: String,
                    tsCol: String = "ts", n: Int = 3, threshold: Double = 0.8,
                    k: Int = 128, bands: Int = 16,
                    lateness: String = "30 minutes"): DataFrame = {
    import graft.ext.TextDedup
    import graft.functions.VectorExprs.{shingleSortedHashes, sortedIntersectSize}
    val sh = stream.select(col(idCol).as("id"),
        graft.functions.TimeKeys.tzSafe(stream, tsCol).as("__ts__"),
        shingleSortedHashes(TextDedup.tokens(col(textCol)), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val buckets = TextDedup.lshBucketsCarry(sh, k, bands, Seq("__ts__", "sh"))
    val cand = buckets.join(
      oldBuckets.select(col("id").as("dup_of"), col("band"), col("bucket")),
      Seq("band", "bucket"))
    cand
      .join(oldShingles.select(col("id").as("dup_of"), col("sh").as("__shb__")),
        Seq("dup_of"))
      .withColumn("__c__", sortedIntersectSize(col("sh"), col("__shb__")))
      .withColumn("jaccard", col("__c__").cast("double") /
        (size(col("sh")) + size(col("__shb__")) - col("__c__")))
      .filter(col("jaccard") >= threshold)
      .withWatermark("__ts__", lateness)
      .dropDuplicatesWithinWatermark("id")
      .select(col("id"), col("dup_of"), round(col("jaccard"), 4).as("jaccard"),
        col("__ts__").as(tsCol))
  }

  /** Streaming twin of [[graft.ext.TextDedup.winnowIncrementMatches]]:
    * flag ARRIVING docs that share ≥ `minShared` winnowing
    * fingerprints with a static fingerprint index
    * ([[graft.ext.TextDedup.writeFingerprintIndex]]) — live overlap/
    * plagiarism detection against a fixed corpus. STREAM-STATIC joins
    * only (arrival fps → capped index postings → per-doc array
    * intersect), no streaming aggregation: the only stateful step is
    * the watermark-bounded per-(id, dup_of) dedup of multi-fingerprint
    * hits, whose state reclaims as the watermark passes. Law-checked
    * ≡ the batch matcher under AvailableNow in StreamSpec.
    */
  def winnowDupStream(stream: DataFrame, indexFps: DataFrame,
                      idCol: String, textCol: String, tsCol: String = "ts",
                      k: Int = 8, w: Int = 10, minShared: Int = 2,
                      maxDf: Int = 50,
                      lateness: String = "30 minutes"): DataFrame = {
    import graft.ext.TextDedup
    import graft.functions.VectorExprs.sortedIntersectSize
    val (capped, oldDocs) = TextDedup.winnowIndexDocs(indexFps, maxDf)
    val fps = stream.select(col(idCol).as("id"),
        graft.functions.TimeKeys.tzSafe(stream, tsCol).as("__ts__"),
        graft.functions.TextExprs.winnowFps(col(textCol), k, w).as("__fpa__"))
      .filter(size(col("__fpa__")) > 0)
    fps.select(col("id"), col("__ts__"), col("__fpa__"),
        explode(col("__fpa__")).as("fp"))
      .join(capped.select(col("id").as("dup_of"), col("fp")), Seq("fp"))
      .join(oldDocs.withColumnRenamed("id", "dup_of"), Seq("dup_of"))
      .withColumn("n_shared",
        sortedIntersectSize(col("__fpa__"), col("__fpb__")))
      .filter(col("n_shared") >= minShared)
      .withWatermark("__ts__", lateness)
      .dropDuplicatesWithinWatermark("id", "dup_of")
      .select(col("id"), col("dup_of"),
        col("n_shared").cast("long").as("n_shared"), col("__ts__").as(tsCol))
  }

  final case class FunnelState(times: Seq[Double])
  final case class FunnelOut(userId: Long, reached: Long)

  /** Streaming twin of [[graft.ext.EventWindows.funnel]]: per-user
    * first-reach timestamps in mapGroupsWithState. Within a
    * micro-batch the group's events are event-time-sorted; across
    * batches the state carries the reach vector, so an
    * event-time-ordered stream (file streams of time-partitioned
    * logs) reproduces the batch funnel exactly — law-checked in
    * StreamSpec. State per active user is ≤ `steps.size` doubles;
    * output is one Update row per user per batch with the stage count
    * reached so far.
    *
    * Greedy-in-order equals the batch min-after-previous definition:
    * processing sorted events, the first step-i event seen with a
    * complete prefix is exactly min{ts > t(i−1)}.
    */
  def funnelStream(spark: SparkSession, events: DataFrame,
                   steps: Seq[String]): DataFrame = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct == steps,
      "funnelStream needs distinct, non-empty steps")
    val idx = steps.zipWithIndex.toMap
    val typed = events.select(col("user_id").cast("long"),
        col("event_type").cast("string"),
        // seconds-with-micros double: exact for modern epochs (22
        // fraction bits available, µs needs 20), keeps strict-> ties
        // identical to the batch comparison on raw timestamps;
        // NTZ-safe (a direct NTZ→double cast throws)
        graft.functions.TimeKeys.tzSafe(events, "ts").cast("double").as("ts_d"))
      .as[(Long, String, Double)]
    typed.groupByKey(_._1)
      .mapGroupsWithState[FunnelState, FunnelOut](
        GroupStateTimeout.NoTimeout()) {
        case (user, rows, state: GroupState[FunnelState]) =>
          val cur = scala.collection.mutable.ArrayBuffer(
            state.getOption.map(_.times).getOrElse(Seq.empty): _*)
          for ((_, e, t) <- rows.toSeq.sortBy(_._3); i <- idx.get(e))
            if (i == cur.length && (i == 0 || t > cur(i - 1))) cur += t
          state.update(FunnelState(cur.toSeq))
          FunnelOut(user, cur.length.toLong)
      }.toDF("userId", "reached")
  }

  final case class SessionState(start: Long, last: Long, n: Long, sum: Double)
  final case class SessionOut(userId: Long, start: java.sql.Timestamp,
                              n: Long, sumValue: Double)

  /** Custom sessionization via flatMapGroupsWithState: per-user session
    * accumulates until `gapMs` of event-time silence, then emits one
    * row (processing-time timeout drives emission between batches).
    * Demonstrates the KeyValueGroupedDataset custom-state surface the
    * engine exposes for logic windows can't express.
    */
  /** Streaming incremental-rollup maintenance — the streaming twin of
    * [[graft.ext.RollupOps.maintain]], composing the round's pieces:
    * each micro-batch folds into the persisted partial-state table,
    * which commits through the SNAPSHOT protocol, so the rollup's
    * history is itself time-travel-able and every commit is atomic.
    *
    * Exactly-once without sink transactions: foreachBatch can REPLAY a
    * micro-batch after a crash, so the state table carries the last
    * applied `__batch_id`; the snapshot commit makes (state ∪ batchId)
    * atomic, and a replayed batch with id ≤ the recorded one is
    * skipped. Restarting the finished stream is therefore a no-op
    * (law-checked in StreamSpec).
    *
    * Scale shape (r10): per micro-batch this costs one batch scan, a
    * touched-group state read, a touched-group-sized merge, and a
    * rewrite of ONLY the state files whose key envelopes intersect the
    * batch's groups ([[graft.ext.RollupOps.maintainPruned]]) —
    * rewritten bytes ∝ touched groups, not state size, so a 10⁹-group
    * state absorbs a small batch at small-batch cost. Independent of
    * how many facts ever flowed. The state table is a normal keyed
    * snapshot target: finish() it, time-travel it, changelog it.
    */
  def rollupStream(spark: SparkSession, stream: DataFrame, statePath: String,
                   keys: Seq[String], aggs: Seq[graft.ext.RollupOps.Agg],
                   checkpointDir: String,
                   keepVersions: Int = 2): StreamingQuery = {
    // Idempotence is keyed on (streaming query id, batchId) — the
    // Delta txn pattern. batchId alone is unsafe: a recreated
    // checkpoint dir restarts ids at 0, and every new batch would
    // read as "already applied" against the old recorded id. The
    // query id lives in `<checkpoint>/metadata` (written at start,
    // before the first batch) and is stable across restarts of the
    // same checkpoint.
    def queryId(fs: org.apache.hadoop.fs.FileSystem): String = {
      val meta = new org.apache.hadoop.fs.Path(checkpointDir, "metadata")
      if (!fs.exists(meta)) "" else {
        val in = fs.open(meta)
        val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse("")
      }
    }
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val fs = new org.apache.hadoop.fs.Path(statePath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val exists = fs.exists(new org.apache.hadoop.fs.Path(statePath))
        val qid = queryId(fs)
        // Was (qid, batchId) already applied? Rewritten rows carry the
        // markers of the batch that LAST touched them (the pruned path
        // leaves untouched rows' markers alone), so this is an
        // existence query over (run, batch) pairs — never a table-wide
        // max, which the mixed markers would make meaningless. A
        // zero-row or marker-less state reads as "nothing applied".
        // A batch that touches zero groups records no marker; its
        // replay re-applies a no-op, which is safe.
        //
        // FOOTER FAST PATH (r11): in the common, non-replay case every
        // recorded `__batch_id` is strictly below the incoming one —
        // certified from parquet footer max-stats alone, so the check
        // reads ZERO data rows regardless of state size (at 10⁹ groups
        // the existence scan would otherwise cost a state pass per
        // micro-batch). Only a replay-shaped head (footer max ≥
        // batchId, or an uncertifiable bound) pays the exact scan.
        val alreadyApplied = exists &&
          !graft.ext.RollupOps.footerMaxLong(spark, statePath, "__batch_id")
            .exists(_ < batchId) && {
          val st = graft.sources.Resolver.readParquet(spark, statePath)
          st.columns.contains("__run_id") && st.columns.contains("__batch_id") &&
            !st.filter(col("__run_id") === qid &&
              col("__batch_id") >= batchId).isEmpty
        }
        if (!alreadyApplied) {
          val meta = Seq("__batch_id" -> lit(batchId), "__run_id" -> lit(qid))
          // pruned path: rewrite only the state files whose envelopes
          // intersect this batch's touched groups. Falls back to the
          // full-rewrite path on the first batch, a non-snapshot or
          // pre-upgrade (marker-less) layout — the full write
          // (re)establishes the indexed snapshot layout.
          val pruned =
            if (exists)
              try graft.ext.RollupOps.maintainPruned(spark, statePath, batch,
                keys, aggs, meta, keepVersions)
              catch { case _: IllegalArgumentException => None }
            else None
          if (pruned.isEmpty) {
            val existing =
              if (exists)
                Some(graft.sources.Resolver.readParquet(spark, statePath)
                  .drop("__batch_id", "__run_id"))
              else None
            val newState = graft.ext.RollupOps.maintain(
              existing, batch, keys, aggs)
              .withColumn("__batch_id", lit(batchId))
              .withColumn("__run_id", lit(qid))
            graft.operators.WriteOps.atomicOverwrite(spark, newState, statePath,
              indexBy = keys, commitMode = "snapshot", keepVersions = keepVersions)
          }
        }
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q
  }

  def sessionize(spark: SparkSession, events: DataFrame,
                 gapMs: Long = 30 * 60 * 1000L): DataFrame = {
    import spark.implicits._
    val typed = events.select(col("user_id").cast("long"),
      graft.functions.TimeKeys.epochSeconds(events, "ts").as("ts_s"),
      col("value").cast("double"))
      .as[(Long, Long, Double)]
    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        GroupStateTimeout.ProcessingTimeTimeout()) {
        case (user, rows, state: GroupState[SessionState]) if state.hasTimedOut =>
          // the processing-time timeout fired with no new events: the
          // open session is final — emit it and reclaim the state
          // (without this branch the last session per user would never
          // emit and inactive users' state would grow forever)
          val out = state.getOption.map(s =>
            SessionOut(user, new java.sql.Timestamp(s.start * 1000L), s.n, s.sum))
          state.remove()
          out.iterator
        case (user, rows, state: GroupState[SessionState]) =>
          val evs = rows.toSeq.sortBy(_._2)
          var cur = state.getOption
          val out = Seq.newBuilder[SessionOut]
          for ((_, ts, v) <- evs) {
            val tsMs = ts * 1000L
            cur match {
              case Some(s) if tsMs - s.last * 1000L >= gapMs =>
                out += SessionOut(user, new java.sql.Timestamp(s.start * 1000L), s.n, s.sum)
                cur = Some(SessionState(ts, ts, 1, v))
              case Some(s) =>
                cur = Some(s.copy(last = ts, n = s.n + 1, sum = s.sum + v))
              case None =>
                cur = Some(SessionState(ts, ts, 1, v))
            }
          }
          cur.foreach(state.update)
          state.setTimeoutDuration(gapMs)
          out.result().iterator
      }.toDF("userId", "start", "n", "sumValue")
  }
}
