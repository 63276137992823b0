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
}
