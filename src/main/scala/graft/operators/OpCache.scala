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
 * composing many operators own the end-of-query lifecycle
 * (`spark.catalog.clearCache()` — the bench's dropState does exactly this).
 */
private[operators] object OpCache {
  private val lastPersisted = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def persistBounded(slot: String, df: DataFrame): DataFrame = {
    val key = System.identityHashCode(df.sparkSession) + ":" + slot
    val cached = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Same-plan predecessor (repeated call on the same dir) SHARES the cache
    // entry — unpersisting it would evict the relation just persisted
    // (CacheManager keys by logical plan, not by Dataset identity).
    Option(lastPersisted.put(key, cached))
      .filterNot(_.queryExecution.analyzed.sameResult(cached.queryExecution.analyzed))
      .foreach(_.unpersist(blocking = false))
    cached
  }
}
