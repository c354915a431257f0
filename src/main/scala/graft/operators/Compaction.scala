package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-file compaction for parquet targets — the maintenance
  * complement of [[PrunedMerge]] (the OPTIMIZE of lakehouse table
  * formats, expressed directly over the file layout). Repeated pruned
  * merges and appends fragment a sorted target: each merge leaves ≈
  * batch-sized files whose pk envelopes overlap the neighbors they
  * were carved from, so footer pruning degrades and scan task counts
  * grow. Compaction rewrites ONLY the small files (< `targetFileBytes`)
  * of each directory — re-range-partitioned and re-sorted on the index
  * keys so their envelopes come back tight — and leaves every
  * full-sized file byte-identical. Hive-partitioned layouts compact
  * each partition directory independently (partition values live in
  * the dir path, so per-dir rewrites never touch partition semantics).
  *
  * Correctness: compaction is a pure re-layout — the row multiset of
  * the directory is unchanged (law-checked); crash atomicity is per
  * file-move, as with [[PrunedMerge]] (temp dir, move in, delete
  * originals; failure before the first delete leaves the target
  * byte-identical modulo already-moved-in duplicates of still-present
  * files — re-running compaction converges).
  *
  * Scale shape: listing is metadata-only; each directory's rewrite
  * reads and writes only its small-file bytes, so a 100 TB target
  * with 1 % fragmentation costs ~1 TB of I/O, not a full rewrite.
  * Directories are processed sequentially by the driver (one Spark
  * job each) — at production partition counts, run per-partition
  * compaction from the scheduler that owns the partitions.
  */
object Compaction {

  final case class Stats(dirsCompacted: Int, filesTotal: Int,
                         filesCompacted: Int, bytesCompacted: Long,
                         filesCreated: Int)

  /** Compact every directory of `path` (the root for a flat layout,
    * each hive leaf dir for a partitioned one). Only directories with
    * ≥ 2 sub-`targetFileBytes` data files rewrite; within them, small
    * files re-layout into ≈ `targetFileBytes` outputs, range-sorted on
    * `indexBy` when those columns exist.
    */
  def compact(spark: SparkSession, path: String, indexBy: Seq[String] = Nil,
              targetFileBytes: Long = 128L << 20,
              keepVersions: Int = 2): Stats = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Stats(0, 0, 0, 0L, 0)
    // snapshot layouts compact THROUGH the commit protocol: one new
    // manifest swaps every compacted group at a single commit point
    // (strictly better atomicity than the in-place path), and prior
    // generations keep reading their own manifests
    if (Snapshot.isSnapshotLayout(fs, root))
      return compactSnapshot(spark, root, fs, indexBy, targetFileBytes,
        keepVersions)
    require(!Versioned.list(fs, root).exists(_._3),
      "compaction of a dir-versioned layout would bypass its commit " +
        "protocol — rewrite through the versioned writer instead")

    // leaf dirs = every dir that directly holds data files
    val leaves = scala.collection.mutable.ArrayBuffer.empty[Path]
    def walk(d: Path): Unit = {
      val entries = fs.listStatus(d)
      if (entries.exists(s => s.isFile && isDataFile(s.getPath.getName)))
        leaves += d
      entries.foreach(s =>
        if (s.isDirectory && isDataFile(s.getPath.getName)) walk(s.getPath))
    }
    walk(root)

    var dirs = 0; var total = 0; var compacted = 0
    var bytes = 0L; var created = 0
    leaves.foreach { dir =>
      val files = fs.listStatus(dir)
        .filter(s => s.isFile && isDataFile(s.getPath.getName))
      total += files.length
      val small = files.filter(_.getLen < targetFileBytes)
      if (small.length >= 2) {
        dirs += 1
        compacted += small.length
        val smallBytes = small.map(_.getLen).sum
        bytes += smallBytes
        // mergeSchema: a foreign plain layout may mix file schemas —
        // union-null-fill preserves the row multiset (the compaction
        // law) where sample-file inference would drop columns
        val df = spark.read.option("mergeSchema", "true")
          .parquet(small.map(_.getPath.toString).toIndexedSeq: _*)
        val nOut = math.max(1L,
          (smallBytes + targetFileBytes - 1) / targetFileBytes).toInt
        val keys = indexBy.filter(df.columns.contains)
        val laid =
          if (keys.nonEmpty)
            df.repartitionByRange(nOut, keys.map(col): _*)
              .sortWithinPartitions(keys.map(col): _*)
          else df.repartition(nOut)
        val tmp = new Path(dir, s"._compact_tmp_${System.nanoTime()}")
        try laid.write.mode("overwrite").parquet(tmp.toString) catch {
          case e: Throwable =>
            try fs.delete(tmp, true) catch { case _: Throwable => () }
            throw e
        }
        val newFiles = fs.listStatus(tmp)
          .filter(s => s.isFile && isDataFile(s.getPath.getName))
        val movedIn = scala.collection.mutable.ArrayBuffer.empty[Path]
        try {
          newFiles.foreach { s =>
            var dest = new Path(dir, s.getPath.getName)
            if (fs.exists(dest))
              dest = new Path(dir, s"c${System.nanoTime()}-${s.getPath.getName}")
            if (!fs.rename(s.getPath, dest))
              throw new java.io.IOException(s"compaction: cannot move ${s.getPath}")
            movedIn += dest
          }
        } catch {
          case e: Throwable =>
            movedIn.foreach(p => try fs.delete(p, false) catch { case _: Throwable => () })
            try fs.delete(tmp, true) catch { case _: Throwable => () }
            throw e
        }
        created += newFiles.length
        small.foreach(s => fs.delete(s.getPath, false))
        fs.delete(tmp, true)
      }
    }
    Stats(dirs, total, compacted, bytes, created)
  }

  /** The snapshot-layout variant: membership comes from the latest
    * committed manifest (the pool may also hold other retained
    * generations' files — those are NOT this version's rows and are
    * never read or rewritten here). Each hive group's small files
    * re-layout into the shared pool; ONE manifest commit then swaps
    * every group atomically. Replaced files stay on disk until no
    * retained manifest references them (refcount vacuum) — so
    * time-traveling to the pre-compaction version keeps working.
    */
  private def compactSnapshot(spark: SparkSession, root: Path, fs: FileSystem,
                              indexBy: Seq[String], targetFileBytes: Long,
                              keepVersions: Int): Stats = {
    val (_, vdir) = Snapshot.resolveVersion(fs, root, None)
    val m = Snapshot.manifestAt(fs, vdir).get
    val dd = Snapshot.dataDir(root)
    // deletion-vector files are NOT data: never fold them into data
    // files (their pk-only schema would be null-padded into garbage
    // rows). They carry through to the new manifest unchanged —
    // compaction rewrites raw rows, tombstones keep applying at read.
    val (delEntries, dataEntries) =
      m.entries.partition(_.rel.startsWith(Snapshot.DeletesDirName + "/"))
    val groups = dataEntries.groupBy { e =>
      val cut = e.rel.lastIndexOf('/')
      if (cut < 0) "" else e.rel.substring(0, cut)
    }
    var dirs = 0; var compacted = 0; var bytes = 0L
    val kept = scala.collection.mutable.ArrayBuffer.empty[Snapshot.Entry]
    val stage = new Path(root, s"._snap_stage_${System.nanoTime()}")
    try {
      groups.toSeq.sortBy(_._1).foreach { case (dir, entries) =>
        val small = entries.filter(_.bytes < targetFileBytes)
        if (small.length < 2) kept ++= entries
        else {
          dirs += 1
          compacted += small.length
          val smallBytes = small.map(_.bytes).sum
          bytes += smallBytes
          kept ++= entries.filterNot(e => e.bytes < targetFileBytes)
          // EXPLICIT manifest data schema (partition cols live in the
          // dir path, not the files): after a schema-evolution commit
          // a group can mix pre- and post-evolution files — footer
          // inference from a sample file would silently DROP the
          // evolved columns of the newer ones; the explicit schema
          // null-fills the older ones instead, which is exactly how
          // the read path serves them
          val dataSchema = org.apache.spark.sql.types.StructType(
            m.schema.fields.filterNot(f => m.partitionBy.contains(f.name)))
          val df = spark.read.schema(dataSchema).parquet(
            small.map(e => new Path(dd, e.rel).toString): _*)
          val nOut = math.max(1L,
            (smallBytes + targetFileBytes - 1) / targetFileBytes).toInt
          val keys = indexBy.filter(df.columns.contains)
          val laid =
            if (keys.nonEmpty)
              df.repartitionByRange(nOut, keys.map(col): _*)
                .sortWithinPartitions(keys.map(col): _*)
            else df.repartition(nOut)
          val out = if (dir.isEmpty) stage else new Path(stage, dir)
          laid.write.mode("overwrite").parquet(out.toString)
        }
      }
      if (dirs == 0) return Stats(0, m.entries.size, 0, 0L, 0)
      val newEntries = Snapshot.moveIntoPool(fs, stage, dd)
      Snapshot.commitVersion(fs, root,
        Snapshot.Manifest(m.schemaDdl, m.partitionBy,
          (kept ++ newEntries ++ delEntries).toSeq), keepVersions)
      Stats(dirs, m.entries.size, compacted, bytes, newEntries.size)
    } finally {
      try fs.delete(stage, true) catch { case _: Throwable => () }
    }
  }

  private def isDataFile(name: String): Boolean =
    !name.startsWith("_") && !name.startsWith(".")
}
