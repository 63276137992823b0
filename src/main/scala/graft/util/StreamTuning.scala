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
