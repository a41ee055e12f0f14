package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped generation registry for operator-internal persisted
  * frames: each new same-key invocation swaps in its generation and
  * unpersists the predecessor's, capping the strand at ONE generation
  * per (session, key); the WeakHashMap outer key lets a stopped
  * session's cached plans become collectable.
  *
  * The sameSemantics guard is load-bearing: CacheManager keys cached
  * data by CANONICALIZED PLAN, so when a re-invocation rebuilds the
  * identical plan (same input, same config — exactly what a
  * benchmark's second pass does), the new persist() is a no-op against
  * the predecessor's entry and unpersisting the predecessor would
  * evict the ONE shared entry, leaving the new invocation silently
  * uncached (measured 7x on the t=0.5 ngram clustering input).
  * Same-semantics generations share the entry; nothing to release.
  */
private[ops] object PersistRegistry {
  private val reg = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[Any, Seq[DataFrame]]]())

  def swap(spark: SparkSession, key: Any, dfs: Seq[DataFrame]): Unit = {
    val perSession = reg.synchronized {
      var m = reg.get(spark)
      if (m == null) {
        m = new java.util.concurrent.ConcurrentHashMap[Any, Seq[DataFrame]]()
        reg.put(spark, m)
      }
      m
    }
    val prev = perSession.put(key, dfs)
    if (prev != null) prev
      .filterNot(p => dfs.exists(d => (d eq p) || p.sameSemantics(d)))
      .foreach(_.unpersist(blocking = false))
  }
}
