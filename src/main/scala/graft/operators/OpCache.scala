package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Bounded persist lifecycle for operators whose plan re-reads one derived
 * relation several times (ADVICE r8; shared by the TextOps one-corpus-pass
 * family and DedupOps.ngramJaccard): the persisted relation must outlive
 * the call's consuming action (unpersisting before it would defeat the
 * persist), so each (session, slot) releases its PREVIOUS relation on the
 * next call — a long-lived library session accumulates at most one cached
 * relation per operator slot instead of one per invocation. Callers
 * composing many operators own the end-of-query lifecycle: call
 * [[graft.operators.OpCache.releaseAll]] (or `spark.catalog.clearCache()` —
 * the bench's dropState does both) when a query session ends; otherwise the
 * FINAL relation per (session, operator) slot stays pinned for the life of
 * the session (VERDICT r9: give OpCache an end-of-life).
 */
object OpCache {
  private val lastPersisted = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  /**
   * Partition-identity pin for the two-job prefix-offset pattern
   * (sequencePack / pretrainExport / decileHistogram): the offsets job and
   * the main job must see the SAME partition ids, and repartitionByRange's
   * SAMPLED boundaries need not be identical across recomputations, so the
   * frame must be checkpointed (a persist can silently recompute on
   * eviction/executor loss and mis-assign every downstream id).
   *
   * Default = `localCheckpoint()`: blocks live on executors, zero external
   * storage, but DIE WITH THEIR EXECUTOR — on a preemptible-worker cluster
   * that turns one lost executor into a full-job retry (never a wrong
   * answer; the lineage is truncated so recompute fails loudly). Set
   * `spark.graft.reliableCheckpoint=true` (plus
   * `sparkContext.setCheckpointDir` to a DFS path) to pin through a
   * reliable `checkpoint()` instead: survives executor loss at the cost of
   * one write+read of the narrow projection through the checkpoint dir
   * (measured trade in BENCH_NOTES r13 — single-digit-% of query wall at
   * sf0.1 on local disk; on object storage budget the round trip).
   *
   * STORAGE LIFECYCLE of the reliable form (ADVICE r13): Spark's
   * ContextCleaner does NOT delete reliable checkpoint data by default
   * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to false),
   * and neither [[releaseAll]] nor `spark.catalog.clearCache()` touches the
   * DFS files — a long-lived session or bench loop cycling q55/q98/q113
   * accumulates one checkpoint directory per call, unbounded. Sessions that
   * enable `spark.graft.reliableCheckpoint` MUST ALSO set
   * `spark.cleaner.referenceTracking.cleanCheckpoints=true` at session
   * build (it is a static SparkConf key — a runtime conf.set after the
   * context starts has no effect) so GC'd pins reclaim their directories;
   * `tools/prof_s13_ckpt.scala` loops these queries 12 times and is exactly
   * the shape that leaks without it.
   */
  private[operators] def pinPartitions(df: DataFrame): DataFrame =
    if (df.sparkSession.conf.getOption("spark.graft.reliableCheckpoint").contains("true"))
      df.checkpoint()
    else df.localCheckpoint()

  /** Unpersist that tolerates the pin's session being ALREADY GONE: a pin
   * whose SparkContext has stopped has no cache left to release (executor
   * blocks died with the context), so dropping the map reference is the
   * correct release — calling unpersist there NPEs inside BlockManagerMaster
   * (driverEndpoint is null on a stopped context). The isStopped check
   * races benignly with a concurrent stop; the catch covers that window. */
  private[operators] def unpersistIfLive(df: DataFrame): Unit =
    try { if (!df.sparkSession.sparkContext.isStopped) df.unpersist(blocking = false) }
    catch { case scala.util.control.NonFatal(_) => }

  private[operators] def persistBounded(slot: String, df: DataFrame): DataFrame = {
    // Stopped-session sweep (r15, the SessionMemo stance applied here): a
    // key embedding a dead session's identity hash is never overwritten, so
    // each stopped session used to strand one frame per slot for the JVM
    // lifetime (and its executor-side blocks died with the context anyway —
    // dropping the reference IS the release). Sub-μs per entry at this
    // map's size (≤ live sessions × slots + sweepable dead ones).
    val dead = lastPersisted.entrySet().iterator()
    while (dead.hasNext) {
      if (dead.next().getValue.sparkSession.sparkContext.isStopped) dead.remove()
    }
    val key = s"${System.identityHashCode(df.sparkSession)}:$slot"
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Same-plan predecessor (repeated call on the same dir) SHARES the cache
    // entry — unpersisting it would evict the relation just persisted
    // (CacheManager keys by logical plan, not by Dataset identity).
    // Identity-hash collisions: worst case a COLLIDING LIVE session's frame
    // is unpersisted early (recompute, never a wrong answer) — the memo-hit
    // hazard SessionMemo exists for does not apply because nothing is
    // served FROM this map; it only bounds what stays pinned.
    Option(lastPersisted.put(key, cached))
      .filterNot(_.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
      .foreach(unpersistIfLive)
    cached
  }

  /** Number of relations currently pinned by persistBounded (test/diagnostic). */
  def pinnedCount: Int = lastPersisted.size

  /** Eagerly release the relation held for one operator slot, if any. */
  def release(slot: String): Unit = {
    val it = lastPersisted.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.endsWith(":" + slot)) {
        unpersistIfLive(e.getValue)
        it.remove()
      }
    }
  }

  /**
   * End-of-session release: unpersist every relation persistBounded still
   * holds, across all sessions and slots. Idempotent; safe to call while no
   * query is running. Library sessions should call this (or
   * `spark.catalog.clearCache()`) when done composing operators.
   */
  def releaseAll(): Unit = {
    val it = lastPersisted.values().iterator()
    while (it.hasNext) { unpersistIfLive(it.next()); it.remove() }
  }
}
