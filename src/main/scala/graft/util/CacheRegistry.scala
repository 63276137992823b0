package graft.util

import org.apache.spark.sql.DataFrame

/** Lifecycle for the engine's memoized/cache()d DataFrames (LSH bands,
  * scored pairs, ANN buckets, …). Memoization makes multi-query runs
  * share expensive signatures, but an object-level cache with no
  * eviction pins SparkSessions and storage for the process lifetime —
  * so every cache site registers here, and hosts (Bench, Verify, a
  * long-lived service between jobs) call `clear()` when a pass is
  * done. Timing note for bench readers: memoization makes per-query
  * numbers order-dependent — whichever of q27/q28/q51/q57 runs first
  * pays the shared MinHash signature cost (see COVERAGE.md).
  */
object CacheRegistry {
  private val cached =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())
  private val memos =
    new java.util.concurrent.CopyOnWriteArrayList[java.util.Map[_, _]]()

  /** Track a cache()d DataFrame for later unpersist. Returns it. */
  def register(df: DataFrame): DataFrame = { cached.add(df); df }

  /** Track a memo map so clear() can evict its entries. */
  def registerMemo(m: java.util.Map[_, _]): Unit = memos.add(m)

  /** Unpersist every registered cache and evict every memo entry.
    * Blocking=false: frees asynchronously, safe mid-session.
    */
  def clear(): Unit = {
    cached.forEach { df =>
      try df.unpersist(blocking = false) catch { case _: Throwable => }
    }
    cached.clear()
    memos.forEach(_.clear())
  }
}
