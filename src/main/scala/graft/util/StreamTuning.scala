package graft.util

import org.apache.spark.sql.SparkSession

/** Scoped shuffle-width override for the streaming gate queries.
  *
  * Stateful streaming operators materialize state stores PER SHUFFLE
  * PARTITION (a stream-stream join opens four per partition), and at
  * gate scale the per-partition store open/commit dominates wall clock
  * (q173: 6.2 s at 32 partitions → 3.1 s at 8). Batch queries want
  * shuffle width = cores; streaming state wants it sized to key
  * cardinality — so the override lives only around the one streaming
  * query and is always restored, keeping the session's batch setting
  * untouched for every other query in a Verify/Bench sweep.
  */
object StreamTuning {
  def withShuffle[T](s: SparkSession, n: Int)(body: => T): T = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Scoped `spark.sql.streaming.noDataMicroBatches.enabled=false` —
    * ONLY for queries whose final no-data micro-batch provably emits
    * nothing: emission-on-arrival operators (inner stream-stream join,
    * dropDuplicates[WithinWatermark], timer-less transformWithState).
    * For those the extra trigger exists purely to advance the
    * watermark and evict state — on a finite AvailableNow backlog it
    * re-opens and re-commits every state store for zero output rows
    * (measured: q173 2.86→2.17 s, results hash-identical at sf0.1;
    * oracle-gated at every sf). NEVER use on append-mode window
    * aggregations, outer joins, or session windows — there the final
    * batch is what emits the watermark-closed rows.
    */
  def withNoDataSkip[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = s.conf.get(key)
    s.conf.set(key, "false")
    try body finally s.conf.set(key, prev)
  }

  /** Await a finite gate drive, then unload the session's dead
    * state-store providers. Provider-cache keys include the query RUN
    * id (StateStoreProviderId), so a terminated drive's providers can
    * never be reused — not even by a checkpoint resume, which gets a
    * fresh run id and re-reads the delta/snapshot files regardless.
    * Left loaded, they tax every later streaming commit until the 60 s
    * maintenance tick evicts them; a Bench/Verify sweep runs its ~32
    * gates well inside one tick, so the tax compounds across the whole
    * family (measured at sf0.1/local[32], DevProbe min-of-3 over the 4
    * stream-join gates: q173 4.08→1.46 s, q310 5.51→2.09, q314
    * 3.89→2.00, q274 5.58→2.91 once dead providers are dropped
    * promptly). A long-lived engine hosting CONCURRENT streams would
    * scope the unload per checkpoint instead of globally; the gates
    * here are strictly sequential, and a live query hit by the global
    * unload only reloads its state from the checkpoint — correctness
    * never depends on the provider cache.
    */
  def drained(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination()
    unloadDeadProviders()
  }

  /** See [[drained]] — for call sites that manage their own awaits
    * (concurrent grow/serve pairs, expected-failure restart drives). */
  def unloadDeadProviders(): Unit =
    org.apache.spark.sql.graftext.StateStoreBridge.unloadAll()

  /** Scoped `spark.sql.streaming.stateStore.unloadOnCommit=true` — for
    * FINITE AvailableNow drives with ≤ 2 micro-batches and heavy join
    * state (the stream-stream join gates). Spark keeps every state
    * store provider of a terminated query loaded until the background
    * maintenance tick (60 s) notices; in a session that drives many
    * short-lived streams those dead providers accumulate and tax every
    * later commit (measured: q274 4.07→2.82 s min-of-4 at sf0.1,
    * q310 −0.5, q314 −0.65, results hash-identical). Unload-on-commit
    * closes each store as its batch commits — the Spark-documented
    * mode for batch-like streaming jobs. NOT for multi-batch drives:
    * every batch would re-load state from the checkpoint (measured:
    * q257 1.56→3.60 s), so the default stays off and the override
    * lives only around the 2-batch join gates.
    */
  def withUnloadOnCommit[T](s: SparkSession)(body: => T): T = {
    val key = "spark.sql.streaming.stateStore.unloadOnCommit"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try body finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }
}
