package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the multiplicative-average
  * statistic (growth rates, quality-score products) a relational
  * engine usually lacks.
  *
  * Determinism discipline (q129/q176 family): each positive input's
  * `ln` is quantized ONCE to integer nano-nats, so the buffer is an
  * exact (Σ nano-nats, count) pair — merge is integer addition,
  * order-free at any core count, and the shuffle carries one 16-byte
  * buffer per group × partition (algebraic aggregate, map-side
  * partials). Non-positive inputs are skipped (ln undefined), matching
  * the oracle's WHERE filter.
  */
object GeoMeanAgg extends Aggregator[Double, (Long, Long), (Long, Long)] {

  override def zero: (Long, Long) = (0L, 0L)

  override def reduce(b: (Long, Long), v: Double): (Long, Long) =
    if (v > 0.0)
      (b._1 + math.floor(math.log(v) * 1e9 + 0.5).toLong, b._2 + 1)
    else b

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(r: (Long, Long)): (Long, Long) = r

  override def bufferEncoder: Encoder[(Long, Long)] =
    ExpressionEncoder[(Long, Long)]()
  override def outputEncoder: Encoder[(Long, Long)] =
    ExpressionEncoder[(Long, Long)]()
}
