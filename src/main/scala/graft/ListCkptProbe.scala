package graft

import graft.operators.Snapshot
import graft.operators.Snapshot.{Entry, ColEnv, Manifest}
import org.apache.hadoop.fs.Path

/** Focused probe for the list-checkpoint cost decomposition (dev tool
  * behind ScaleBench10 phase 8): per-commit ms for the 16-commit
  * cycle at a given entry count, with the cadence checkpoint marked.
  */
object ListCkptProbe {
  private def entry(i: Long, seq: Long): Entry =
    Entry(f"part=${i % 256}%03d/f$i%07d.parquet", 1L << 20,
      envs = Some(Map("id" -> ColEnv(Some(i * 1000), Some(i * 1000 + 999), false))),
      seq = seq)

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val out = s"/tmp/graft_listprobe_$n"
    val root = new Path(out)
    val fs = root.getFileSystem(new org.apache.hadoop.conf.Configuration())
    fs.delete(root, true)
    val ddl = "id BIGINT, txt STRING, grp INT"
    var mem: Vector[Entry] = (0L until n.toLong).map(entry(_, 1L)).toVector
    var t0 = System.nanoTime()
    var baseV = Snapshot.commitVersion(fs, root, Manifest(ddl, Nil, mem), 25)
    println(f"PROBE seed($n) ${(System.nanoTime() - t0) / 1e6}%9.1f ms")
    for (c <- 0 until Snapshot.CheckpointEvery) {
      val fresh = Vector(entry(n + c * 2L, Snapshot.UnsetSeq),
        entry(n + c * 2L + 1, Snapshot.UnsetSeq))
      t0 = System.nanoTime()
      val v = Snapshot.commitRebase(fs, root, baseV,
        Set(mem(0).rel, mem(1).rel), fresh, ddl, Nil, 25)
      val ms = (System.nanoTime() - t0) / 1e6
      val vdir = new Path(root, f"_v_$v%020d")
      val kind =
        if (fs.exists(new Path(vdir, "_MANIFEST_LIST"))) "LIST-CKPT"
        else if (fs.exists(new Path(vdir, "_MANIFEST"))) "TEXT-CKPT"
        else "delta"
      println(f"PROBE commit[$c%02d] $ms%9.1f ms  $kind")
      baseV = v
      mem = mem.drop(2) ++ fresh.map(_.copy(seq = v))
    }
  }
}
