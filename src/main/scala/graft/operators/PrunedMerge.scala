package graft.operators

import graft.spec.{TargetSpec, WriteOp}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level pruned MERGE for keyed writes (the lake-native shape the
  * reference delegates to its server backends — ops vocabulary
  * etl_cli/etl.py:13, index intent etl_cli/base.py:568-593).
  *
  * The full-rewrite writer ([[WriteOps.atomicOverwrite]]) re-materializes
  * the whole target on every keyed write; the partition-scoped path
  * helps only when the touched keys cluster into few hive partitions.
  * At 100 TB an upsert of a 1k-row batch into an unpartitioned (or
  * coarsely partitioned) target must NOT rewrite everything — and the
  * O6 sorted layout (`--mongo-index` → [[WriteOps]] indexLayout) already
  * gives every parquet file a tight pk min/max envelope in its footer.
  * This planner reads ONLY footer metadata, intersects each file's pk
  * envelope with the batch's key set, applies the op to the rows of the
  * intersecting files alone, rewrites those files (+ appends new keys),
  * and leaves every other file byte-identical. The same mechanism
  * Delta/Iceberg MERGE uses via manifest stats, expressed directly over
  * parquet footers with no table format.
  *
  * SOUNDNESS. A file whose envelope does not contain any batch key
  * cannot hold a row the op touches: every keyed op (insert / index /
  * update / upsert / delete) leaves rows with pk ∉ batch untouched, so
  * `op(touchedFiles, batch) ∪ untouchedFiles ≡ op(target, batch)`.
  * Pruning is CONSERVATIVE everywhere information is missing: a file
  * with absent/unreadable stats, an unsupported pk physical type, or
  * (when the batch carries a NULL key) a non-zero/unknown null count is
  * treated as touched. Multi-column pks prune on the FIRST component
  * (necessary-condition pruning — sound, just looser).
  *
  * SCALE SHAPE. Footer reads are pure metadata (O(#files), ~KBs each)
  * and run DISTRIBUTED above a small threshold — at 100k files the
  * driver plans from a parallelized footer sweep, the same shape as an
  * Iceberg manifest scan. The batch key set is collected only below
  * `maxBatchKeys` (default 1M ≈ 8 MB of longs); a larger batch isn't a
  * "small batch merge" and falls back to the full rewrite. The rewrite
  * itself shuffles only the touched-file rows (range-partitioned back
  * to ≈ one output file per input file, re-sorted so envelopes stay
  * tight for the NEXT merge).
  *
  * ATOMICITY is per file-move, not per job (the nature of in-place file
  * swaps, as with partition-scoped rewrite): new files land via rename
  * after a fully-written temp dir, then the old touched files are
  * deleted. A crash between the two steps can leave a touched row
  * visible twice; jobs needing all-or-nothing semantics use the full
  * rewrite or the versioned commit protocol ([[Versioned]]). Before the
  * first rename, failure leaves the target byte-identical.
  *
  * Applicability (returns None → caller falls back to the full/scoped
  * writers): parquet backend, unpartitioned, rename commit mode on a
  * non-versioned layout, no `--tmap`, keyed op, first-pk type with
  * comparable footer stats (integral / string / date), and the op must
  * not extend the target schema (untouched files could not serve the
  * new columns). Single-writer model, like every graft writer.
  */
object PrunedMerge {

  /** What the merge did — the ScaleBench/ test witness that pruning
    * actually pruned: `bytesRewritten / bytesTotal` is the fraction of
    * the target the write touched.
    */
  final case class Stats(filesTotal: Int, filesRewritten: Int,
                         bytesTotal: Long, bytesRewritten: Long) {
    def rewrittenFrac: Double =
      if (bytesTotal == 0) 1.0 else bytesRewritten.toDouble / bytesTotal
  }

  /** Per-file pk envelope from the parquet footer. `min`/`max` are in
    * the pruning domain (Long for integral/date pks, unsigned byte
    * array for strings); None = stats unavailable → conservatively
    * touched. `hasNulls` true when any row-group null count is
    * positive or unknown.
    */
  private final case class Envelope(path: String, bytes: Long,
                                    min: Option[Any], max: Option[Any],
                                    hasNulls: Boolean)

  private val DistributedFooterThreshold = 64

  /** Attempt a pruned merge of `batch` into the target at `path`.
    * `current` supplies the authoritative target schema (one consistent
    * Resolver read). Returns the stats when the pruned path ran, None
    * when not applicable — the caller MUST then fall back to a full
    * writer; the target is untouched in that case.
    */
  def merge(spark: SparkSession, current: DataFrame, batch: DataFrame,
            t: TargetSpec, path: String,
            maxBatchKeys: Long = 1L << 20): Option[Stats] = {
    val pk = if (t.pk.nonEmpty) t.pk else t.skipBy
    if (pk.isEmpty || t.partitionBy.nonEmpty || t.tmap.isDefined) return None
    if (t.commitMode != "rename") return None
    if (!Set("parquet", "ds").contains(t.ref.backend)) return None
    if (t.op == WriteOp.Create && t.pk.isEmpty && t.skipBy.isEmpty) return None
    if (!pk.forall(current.columns.contains)) return None

    val hPath = new Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return None
    if (Versioned.list(fs, hPath).exists(_._3)) return None

    // flat file layout only: a subdirectory means partitioned or
    // foreign layout — not this planner's shape
    val entries = fs.listStatus(hPath).toSeq
    val dataFiles = entries.filter(s => s.isFile && isDataFile(s.getPath.getName))
    if (dataFiles.isEmpty) return None
    if (entries.exists(s => s.isDirectory && isDataFile(s.getPath.getName)))
      return None

    val pkField = current.schema(pk.head)
    val domain = pruningDomain(pkField.dataType).getOrElse(return None)

    // batch key set on the first pk component — bounded collect
    val keyCol = col(pk.head).cast(pkField.dataType)
    val distinctKeys = batch.select(keyCol.as("__k__")).distinct()
    if (distinctKeys.count() > maxBatchKeys) return None
    val rawKeys = distinctKeys.collect().map(_.get(0))
    // an empty batch touches nothing under every keyed op — the merge
    // is a no-op and the target stays byte-identical
    if (rawKeys.isEmpty)
      return Some(Stats(dataFiles.size, 0, dataFiles.map(_.getLen).sum, 0))
    val batchHasNull = rawKeys.contains(null)
    val keys = domain.sortKeys(rawKeys.filter(_ != null).map(domain.toDomain))

    val envelopes = readEnvelopes(spark, dataFiles.map(s =>
      (s.getPath.toString, s.getLen)), pk.head)
    val (touched, untouched) = envelopes.partition(e =>
      isTouched(e, keys, batchHasNull, domain))
    // nothing to prune — the full rewrite costs the same and is atomic
    if (touched.size == dataFiles.size) return None

    // apply the op to the touched subset only; schema pinned to the
    // authoritative target schema (single-writer layout — files agree)
    val touchedDf =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          current.schema)
      else spark.read.schema(current.schema).parquet(touched.map(_.path): _*)
    val merged = WriteOps.applyOp(touchedDf, batch, t)
    // schema-extending op (schema-free update $set) → untouched files
    // could not serve the new columns; full rewrite handles it
    if (!merged.columns.sameElements(current.columns)) return None

    // rewrite: range-partition back to ≈ one file per touched input
    // (+1 for pure-insert growth), re-sorted on the layout keys so the
    // new files' envelopes stay as tight as the ones they replace
    val sortKeys = (if (t.indexBy.nonEmpty) t.indexBy else pk).map(col)
    val nOut = math.max(1, touched.size)
    val laid = merged.repartitionByRange(nOut, sortKeys: _*)
      .sortWithinPartitions(sortKeys: _*)
    val tmp = new Path(path + "._merge_tmp_" + System.nanoTime())
    var w = laid.write.mode("overwrite")
    if (t.maxRecordsPerFile > 0)
      w = w.option("maxRecordsPerFile", t.maxRecordsPerFile.toString)
    try w.parquet(tmp.toString) catch {
      case e: Throwable =>
        try fs.delete(tmp, true) catch { case _: Throwable => () }
        throw e
    }

    // swap: move new files in (unique spark part names; uniquified
    // defensively), then drop the replaced ones. Rename failures before
    // any delete roll back to a byte-identical target.
    val newFiles = fs.listStatus(tmp).filter(s => s.isFile && isDataFile(s.getPath.getName))
    val movedIn = scala.collection.mutable.ArrayBuffer.empty[Path]
    try {
      newFiles.foreach { s =>
        var dest = new Path(hPath, s.getPath.getName)
        if (fs.exists(dest))
          dest = new Path(hPath, s"m${System.nanoTime()}-${s.getPath.getName}")
        if (!fs.rename(s.getPath, dest))
          throw new java.io.IOException(s"pruned merge: cannot move ${s.getPath} into place")
        movedIn += dest
      }
    } catch {
      case e: Throwable =>
        movedIn.foreach(p => try fs.delete(p, false) catch { case _: Throwable => () })
        try fs.delete(tmp, true) catch { case _: Throwable => () }
        throw e
    }
    touched.foreach(e => fs.delete(new Path(e.path), false))
    fs.delete(tmp, true)

    val totalBytes = envelopes.map(_.bytes).sum
    Some(Stats(envelopes.size, touched.size, totalBytes, touched.map(_.bytes).sum))
  }

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")

  /** Does the file's envelope intersect the batch key set? `keys` is
    * sorted in the pruning domain; one binary search per file.
    */
  private def isTouched(e: Envelope, keys: Array[Any],
                        batchHasNull: Boolean, domain: Domain): Boolean = {
    if (batchHasNull && e.hasNulls) return true
    (e.min, e.max) match {
      case (Some(mn), Some(mx)) => domain.anyKeyInRange(keys, mn, mx)
      case _ => keys.nonEmpty || batchHasNull // stats unknown → conservative
    }
  }

  /** Pruning value domain: converts batch keys and footer stats into
    * one comparable representation. Integral + date pks compare as
    * Long; strings compare as UNSIGNED lexicographic UTF-8 bytes —
    * parquet's own binary stats order, so `min ≤ k ≤ max` means what
    * the footer meant (Java String order differs beyond ASCII).
    */
  private sealed trait Domain extends Serializable {
    def toDomain(v: Any): Any
    def fromStats(v: Any): Option[Any]
    def sortKeys(keys: Array[Any]): Array[Any]
    def anyKeyInRange(sortedKeys: Array[Any], mn: Any, mx: Any): Boolean
  }

  private object LongDomain extends Domain {
    def toDomain(v: Any): Any = v match {
      case n: Number => n.longValue
      case d: java.sql.Date => d.toLocalDate.toEpochDay
      case d: java.time.LocalDate => d.toEpochDay
      case other => throw new IllegalArgumentException(s"non-integral pk value: $other")
    }
    def fromStats(v: Any): Option[Any] = v match {
      case n: Number => Some(n.longValue)
      case _ => None
    }
    def sortKeys(keys: Array[Any]): Array[Any] = keys.sortBy(_.asInstanceOf[Long])
    def anyKeyInRange(sortedKeys: Array[Any], mn: Any, mx: Any): Boolean = {
      val ks = sortedKeys
      val lo = mn.asInstanceOf[Long]; val hi = mx.asInstanceOf[Long]
      var l = 0; var r = ks.length
      while (l < r) { // first key >= lo
        val m = (l + r) >>> 1
        if (ks(m).asInstanceOf[Long] < lo) l = m + 1 else r = m
      }
      l < ks.length && ks(l).asInstanceOf[Long] <= hi
    }
  }

  private object BytesDomain extends Domain {
    private def cmp(a: Array[Byte], b: Array[Byte]): Int = {
      val n = math.min(a.length, b.length)
      var i = 0
      while (i < n) {
        val d = (a(i) & 0xff) - (b(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      a.length - b.length
    }
    def toDomain(v: Any): Any =
      v.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def fromStats(v: Any): Option[Any] = v match {
      case b: org.apache.parquet.io.api.Binary => Some(b.getBytes)
      case _ => None
    }
    def sortKeys(keys: Array[Any]): Array[Any] =
      keys.sortWith((a, b) => cmp(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]]) < 0)
    def anyKeyInRange(sortedKeys: Array[Any], mn: Any, mx: Any): Boolean = {
      val lo = mn.asInstanceOf[Array[Byte]]; val hi = mx.asInstanceOf[Array[Byte]]
      var l = 0; var r = sortedKeys.length
      while (l < r) {
        val m = (l + r) >>> 1
        if (cmp(sortedKeys(m).asInstanceOf[Array[Byte]], lo) < 0) l = m + 1 else r = m
      }
      l < sortedKeys.length && cmp(sortedKeys(l).asInstanceOf[Array[Byte]], hi) <= 0
    }
  }

  private def pruningDomain(dt: DataType): Option[Domain] = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => Some(LongDomain)
    case StringType => Some(BytesDomain)
    case _ => None // timestamps (tz flavors) & others: full rewrite
  }

  /** Footer pk envelopes for every file — driver-side below
    * [[DistributedFooterThreshold]], a parallelized metadata sweep
    * above it (the 100k-file shape: no serial driver I/O).
    */
  private def readEnvelopes(spark: SparkSession, files: Seq[(String, Long)],
                            pkCol: String): Seq[Envelope] = {
    if (files.size <= DistributedFooterThreshold)
      files.map { case (p, len) =>
        readOneEnvelope(new Configuration(spark.sparkContext.hadoopConfiguration),
          p, len, pkCol)
      }
    else {
      val confW = new org.apache.spark.SerializableWritable(
        spark.sparkContext.hadoopConfiguration)
      val bc = spark.sparkContext.broadcast(confW)
      val slices = math.min(files.size, 256)
      spark.sparkContext.parallelize(files, slices).map { case (p, len) =>
        readOneEnvelope(bc.value.value, p, len, pkCol)
      }.collect().toSeq
    }
  }

  /** One footer read; ANY failure → unknown envelope (file treated as
    * touched). Combines row-group stats: min of mins, max of maxes,
    * nulls if any group has (or cannot rule out) nulls. Stat values
    * convert by their physical type (Number → Long, Binary → bytes),
    * which lands them in the same domain the pk type selected.
    */
  private def readOneEnvelope(conf: Configuration, p: String, len: Long,
                              pkCol: String): Envelope =
    try {
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new Path(p), conf)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try {
        import scala.jdk.CollectionConverters._
        var mn: Option[Any] = None
        var mx: Option[Any] = None
        var nulls = false
        var known = true
        reader.getFooter.getBlocks.asScala.foreach { block =>
          block.getColumns.asScala.find(_.getPath.toDotString == pkCol) match {
            case None => known = false // pk column absent from footer
            case Some(cc) =>
              val st = cc.getStatistics
              if (st == null) { known = false; nulls = true }
              else {
                if (st.isNumNullsSet) { if (st.getNumNulls > 0) nulls = true }
                else nulls = true
                if (st.hasNonNullValue) {
                  (statToDomain(st.genericGetMin), statToDomain(st.genericGetMax)) match {
                    case (Some(lo), Some(hi)) =>
                      mn = Some(mn.fold(lo)(m => domMin(m, lo)))
                      mx = Some(mx.fold(hi)(m => domMax(m, hi)))
                    case _ => known = false
                  }
                } else if (!st.isNumNullsSet || st.getNumNulls < 0) known = false
                // else: all-null row group — contributes no min/max
              }
          }
        }
        if (known) Envelope(p, len, mn, mx, nulls)
        else Envelope(p, len, None, None, hasNulls = true)
      } finally reader.close()
    } catch {
      case _: Throwable => Envelope(p, len, None, None, hasNulls = true)
    }

  private def statToDomain(v: Any): Option[Any] = v match {
    case n: Number => Some(n.longValue)
    case b: org.apache.parquet.io.api.Binary => Some(b.getBytes)
    case _ => None
  }

  private def domCmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Array[Byte], y: Array[Byte]) =>
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xff) - (y(i) & 0xff)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    case _ => throw new IllegalStateException("mixed pruning domains")
  }

  private def domMin(a: Any, b: Any): Any = if (domCmp(a, b) <= 0) a else b
  private def domMax(a: Any, b: Any): Any = if (domCmp(a, b) >= 0) a else b
}
