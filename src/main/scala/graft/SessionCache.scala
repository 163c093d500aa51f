package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped memoization for built-once artifacts: near-dup pair
  * indexes (Dedup.verifiedPairIndex), trained IVF models
  * (Similarity.ivfTopK), and file-stat probes (Corpus.fanOutSmallScan).
  *
  * Why not a plain static map keyed on plan hashes (the round-6 shape):
  * one JVM can host several SparkSessions (the test suite does), and a
  * frame localCheckpoint'd under one session is dead in another — a
  * JVM-global cache would happily serve it, turning pure operators into
  * ones that can return wrong results cross-session. Entries here hang
  * off the owning session through a WeakHashMap, so (a) a second
  * session never sees the first's artifacts and (b) when a session is
  * stopped and dropped, its entries become unreachable and the pinned
  * checkpoint blocks collectable — the cache lives exactly as long as
  * the artifacts it stores.
  *
  * Cache keys additionally carry a LINEAGE FINGERPRINT: the input
  * files' (path, length, mtime) triples rather than bare paths, so an
  * in-place rewrite that keeps file names changes the fingerprint and
  * misses the cache instead of serving results computed from the old
  * bytes. Stats flow through a per-session path→status memo, so the
  * fingerprint costs one FileSystem.getFileStatus per file per session
  * no matter how many operators probe it, and a vanished file degrades
  * (contributes a sentinel) instead of throwing at plan-build time.
  */
object SessionCache {
  private val perSession = new java.util.WeakHashMap[
    SparkSession, java.util.concurrent.ConcurrentHashMap[Any, AnyRef]]()

  private def mapFor(spark: SparkSession) = perSession.synchronized {
    var m = perSession.get(spark)
    if (m == null) {
      m = new java.util.concurrent.ConcurrentHashMap[Any, AnyRef]()
      perSession.put(spark, m)
    }
    m
  }

  /** Memoize `build` under `key` for this session. `build` runs at most
    * once per (session, key); concurrent callers block on the winner
    * (ConcurrentHashMap.computeIfAbsent semantics) — the same
    * build-the-index-once guarantee the old static maps gave, minus the
    * cross-session aliasing. */
  def getOrBuild[T <: AnyRef](spark: SparkSession, key: Any)(build: => T): T =
    mapFor(spark).computeIfAbsent(key, _ => build).asInstanceOf[T]

  /** (length, mtime) of one file, memoized per session. None when the
    * file vanished between listing and stat or the filesystem errored —
    * callers fall back instead of failing plan construction. */
  def fileStat(spark: SparkSession, path: String): Option[(Long, Long)] =
    mapFor(spark).computeIfAbsent(("fileStat", path), _ =>
      try {
        val p = new org.apache.hadoop.fs.Path(path)
        val st = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .getFileStatus(p)
        Some((st.getLen, st.getModificationTime))
      } catch { case _: java.io.IOException => None }
    ).asInstanceOf[Option[(Long, Long)]]

  /** Fingerprint of a frame's file lineage: hash of sorted
    * (path, length, mtime); a file that cannot be stat-ed contributes
    * (path, -1, -1), which still invalidates once it becomes readable
    * again with real stats. */
  def lineageFingerprint(df: DataFrame): Int = {
    val spark = df.sparkSession
    df.inputFiles.toSeq.sorted.map { f =>
      val st = fileStat(spark, f)
      (f, st.fold(-1L)(_._1), st.fold(-1L)(_._2))
    }.hashCode
  }
}
