package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (SURVEY.md §2.2 last row, extension tier):
  * a 16-way MinHash signature as an `Aggregator` — input rows are base
  * shingle hashes (md5 first-15-hex mod P, the same family as
  * graft.ops.Dedup), the buffer is the 16 per-transform minima, and
  * `merge` is elementwise min, so the aggregate is fully algebraic:
  * Spark runs it with map-side partial aggregation and the shuffle
  * carries one 16-long buffer per group per partition — the property
  * that makes corpus-level sketches feasible at 100 TB.
  *
  * The affine family constants match Dedup/the DuckDB oracle exactly
  * (a_k = (1103515245·(k+1) mod P) | 1, b_k = 1234567891·(k+7) mod P),
  * so the aggregate's output is hash-checkable end-to-end.
  */
object MinHashAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  private val P = 2147483647L // 2^31 − 1
  val K = 16

  override def zero: Array[Long] = Array.fill(K)(Long.MaxValue)

  override def reduce(buf: Array[Long], h: Long): Array[Long] = {
    var k = 0
    while (k < K) {
      val a = (1103515245L * (k + 1) % P) | 1L
      val b = 1234567891L * (k + 7) % P
      val x = (h * a + b) % P
      if (x < buf(k)) buf(k) = x
      k += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) { if (y(k) < x(k)) x(k) = y(k); k += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.ArrayEncoder(
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveLongEncoder,
      containsNull = false)
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
}
