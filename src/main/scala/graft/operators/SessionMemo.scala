package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Session-scoped memo for expensive derived relations (the shared
 * cluster-label table, the corpus BM25/quality rank tables): one entry per
 * (session, corpus dir), with the lifecycle guarantees the bare
 * `ConcurrentHashMap[identityHashCode:dir, DataFrame]` pattern lacked
 * (VERDICT r14 "What's wrong" #2 / ADVICE r14):
 *
 *  - **No identity-hash collisions.** Keys compare the session by REFERENCE
 *    (`eq`), not by `System.identityHashCode` alone — two live sessions that
 *    happen to share an identity hash (possible after GC compaction) get
 *    distinct entries, and a hit can never serve a frame bound to a
 *    different session. The hit path additionally asserts
 *    `hit.sparkSession eq spark` as belt-and-braces.
 *  - **Stopped sessions release their entries.** Every access sweeps
 *    entries whose underlying SparkContext has stopped (the realistic
 *    session-cycling shape: each cycle's `spark.stop()` stops its context;
 *    the executor-side cache blocks died with the context, so dropping the
 *    map reference IS the release — unpersist there would NPE in
 *    BlockManagerMaster, see [[OpCache.unpersistIfLive]]).
 *  - **Bounded regardless.** A JVM cycling `newSession()` on one LIVE
 *    shared context never stops anything, and the memoized frame strongly
 *    references its session, so GC-based (weak/soft) eviction can never
 *    fire — instead the memo holds at most `maxEntries` frames,
 *    insertion-ordered FIFO; the evicted frame is unpersisted so its cache
 *    blocks return to the live context. Bench's between-runs invalidation
 *    (`clear()`) remains the explicit end-of-life.
 *
 * Builds are NOT serialized under the memo's lock: miss paths run Spark
 * jobs (globalRank's offsets collect, the label loop's convergence counts),
 * so callers use get + put/putIfAbsent and accept a raced duplicate build —
 * deterministic-identical, same contract as before (the CHM bin-lock
 * pitfall, OperatorsSpec r12).
 */
private[graft] final class SessionMemo(
    maxEntries: Int = 64,
    // injectable for the lifecycle spec (one JVM = one shared test context,
    // so a suite can never stop a session without killing every other suite)
    stopped: SparkSession => Boolean = _.sparkContext.isStopped) {
  import SessionMemo.SessKey

  // access-order=false: FIFO eviction (oldest insertion first); all access
  // under the map's own monitor — operations are driver-side and O(entries)
  private val entries = new java.util.LinkedHashMap[SessKey, DataFrame](16, 0.75f, false)

  private def sweepLocked(): Unit = {
    val it = entries.keySet().iterator()
    while (it.hasNext) if (stopped(it.next().s)) it.remove()
  }

  /** The memoized frame for (spark, dir), or null. Never returns a frame
   * bound to another session or to a stopped context. */
  def get(spark: SparkSession, dir: String): DataFrame = entries.synchronized {
    sweepLocked()
    val hit = entries.get(new SessKey(spark, dir))
    if (hit != null && (hit.sparkSession eq spark)) hit else null
  }

  /** Insert (replacing any previous frame for the slot), then enforce the
   * entry bound — evicted frames are unpersisted if their session lives. */
  def put(spark: SparkSession, dir: String, df: DataFrame): Unit = entries.synchronized {
    sweepLocked()
    entries.put(new SessKey(spark, dir), df)
    while (entries.size() > maxEntries) {
      val it = entries.values().iterator()
      OpCache.unpersistIfLive(it.next())
      it.remove()
    }
  }

  /** putIfAbsent with the same bound; returns the winning frame. */
  def putIfAbsent(spark: SparkSession, dir: String, df: DataFrame): DataFrame =
    entries.synchronized {
      val prior = get(spark, dir)
      if (prior != null) prior
      else { put(spark, dir, df); df }
    }

  /** Drop every entry (all sessions, all dirs) — the bench's between-runs
   * invalidation. Blocks are NOT unpersisted here: the standing contract is
   * that dropState/clearCache handles storage, and an invalidated-but-live
   * frame may still be referenced by an in-flight query. */
  def clear(): Unit = entries.synchronized { entries.clear() }

  /** Drop the entries for one corpus dir (any session). */
  def clearDir(dir: String): Unit = entries.synchronized {
    val it = entries.keySet().iterator()
    while (it.hasNext) if (it.next().dir == dir) it.remove()
  }

  /** Live entry count (specs). */
  def size: Int = entries.synchronized { sweepLocked(); entries.size() }
}

private[graft] object SessionMemo {
  /** Identity key: equal iff the SAME session object (and dir). The cached
   * identity hash keeps hashing O(1); equals does the reference comparison,
   * so a hash collision degrades to a bucket scan, never a wrong hit. */
  private[operators] final class SessKey(val s: SparkSession, val dir: String) {
    override val hashCode: Int = System.identityHashCode(s) * 31 + dir.hashCode
    override def equals(o: Any): Boolean = o match {
      case k: SessKey => (k.s eq s) && k.dir == dir
      case _          => false
    }
  }
}
