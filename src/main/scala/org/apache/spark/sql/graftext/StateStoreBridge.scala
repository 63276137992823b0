package org.apache.spark.sql.graftext

/** Bridge to the state-store provider cache (`private[sql]` in Spark 4,
  * so the accessor needs to live inside org.apache.spark.sql — the same
  * shim pattern as ColumnBridge).
  *
  * `unloadAll()` drops every loaded state-store provider on this
  * executor (local mode: the one JVM). Providers are cached keyed by
  * (checkpoint, operator, partition, store, queryRUNid) — the run id
  * means a terminated query's providers can never be reused by ANY
  * later query, not even a resume of the same checkpoint (a restart
  * gets a fresh run id and re-reads the delta/snapshot files). They
  * are pure dead weight until the 60 s maintenance tick notices, and
  * a session that drives many short finite gates pays for them in
  * every later commit window (measured in DevProbe: the 4 stream-join
  * gates degrade run-over-run 2.6→4.1 s with the default tick and
  * hold 1.5-2.1 s when dead providers are dropped promptly).
  */
object StateStoreBridge {
  def unloadAll(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()
}
