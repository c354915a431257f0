package graft.sources

/** Shuffle local-dir choice (r19 — guide §2.1 "local disk bandwidth
  * for shuffle files can be the tighter limit" and Spark's own tuning
  * guidance: `spark.local.dir` on the fastest local storage).
  *
  * On this class of box the root filesystem serializes CONCURRENT
  * file creates in the kernel: a single-threaded create is ~0.01 ms,
  * but a 32-task shuffle wave creating its data/index files measures
  * 0.2–10 ms per open (p99), and executor stack samples put
  * `FileOutputStream.open0` / `FileChannelImpl.map0/unmap0` at the top
  * of every shuffle-writing stage (StageProbe, q_winnow/q_langid_nb).
  * A RAM-backed local dir removes the contention entirely — measured
  * −18% on a 5-query shuffle-heavy bench subset at sf0.1/local[32].
  *
  * Scale story, explicitly: tmpfs is ONLY correct when the node's
  * expected shuffle + spill volume is far below RAM (bench/CI scale —
  * MBs of shuffle on a 128 GiB box). A production cluster moving TBs
  * of shuffle sets `SPARK_LOCAL_DIRS` (or `spark.local.dir`) to its
  * NVMe array, and BOTH override this default: Spark gives the
  * `SPARK_LOCAL_DIRS` env var absolute precedence over the conf, and
  * an explicit `spark.local.dir` set by the caller is never touched
  * by [[applyTo]]. No scale-dependent constant is baked in.
  */
object LocalDirs {
  /** RAM-backed local dir when one exists with ample headroom. */
  def ramBacked(): Option[String] = {
    val shm = new java.io.File("/dev/shm")
    // demand generous headroom (≥ 8 GiB usable) so bench-scale shuffle
    // (MBs) can never pressure the page cache; anything tighter falls
    // back to the platform default tmp dir
    if (shm.isDirectory && shm.canWrite && shm.getUsableSpace > (8L << 30))
      Some(new java.io.File(shm, "graft_spark_local").getAbsolutePath)
    else None
  }

  /** Chainable builder conf: `{spark.local.dir -> ramBacked}` unless
    * the environment chose already (SPARK_LOCAL_DIRS env always wins
    * inside Spark itself, and its presence disables the default too).
    */
  def confMap: java.util.Map[String, Any] = {
    val m = new java.util.HashMap[String, Any]()
    if (!sys.env.contains("SPARK_LOCAL_DIRS"))
      ramBacked().foreach(d => m.put("spark.local.dir", d))
    m
  }
}
