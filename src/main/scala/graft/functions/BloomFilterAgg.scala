package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bloom filter over long keys as a typed `Aggregator` — the runtime
  * pre-filter behind scalable semi-joins: build a compact bitset on
  * the dimension side, ship it to every fact task as a plan literal,
  * and drop non-matching fact rows BEFORE the join's shuffle. At
  * 100 TB the dimension's key set may be too large to broadcast as a
  * hash relation, but its 16 KB Bloom image always fits; false
  * positives are culled by the exact join that follows, false
  * negatives are impossible.
  *
  * The aggregate is algebraic (merge = bitwise OR), so Spark runs it
  * with map-side partials and the shuffle carries one bitset per
  * partition. Membership (`mightContain`) is expressed with
  * `xxhash64`/`shiftright`/`bitwiseAND` Column ops — fully
  * whole-stage-codegen, no UDF — and `BloomFilterAgg.reduce` uses
  * Spark's own XXH64 with the same seed chaining, so the Scala build
  * side and the codegen'd probe side agree bit-for-bit.
  */
object BloomFilterAgg extends Aggregator[Long, Array[Long], Array[Long]] {

  /** 2^17 bits = 16 KB; k = 5 hashes. FP rate ≈ (1−e^(−5n/131072))^5:
    * < 2e-5 at n = 3 000 keys, still < 1% at n = 30 000.
    */
  val MBits = 1 << 17
  val K = 5

  /** Seed chain identical to the Column-side `xxhash64(lit(i), key)`:
    * the expression folds children left-to-right from seed 42.
    */
  private def hash(key: Long, i: Int): Long =
    XXH64.hashLong(key, XXH64.hashLong(i.toLong, 42L))

  override def zero: Array[Long] = Array.fill(MBits / 64)(0L)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < K) {
      val idx = java.lang.Math.floorMod(hash(key, i), MBits.toLong).toInt
      buf(idx >>> 6) |= 1L << (idx & 63)
      i += 1
    }
    buf
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var w = 0
    while (w < x.length) { x(w) |= y(w); w += 1 }
    x
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.ArrayEncoder(
      org.apache.spark.sql.catalyst.encoders.AgnosticEncoders.PrimitiveLongEncoder,
      containsNull = false)
  override def outputEncoder: Encoder[Array[Long]] = bufferEncoder

  /** Codegen'd membership probe against a built filter (a plan
    * literal — no broadcast variable, no UDF closure).
    */
  def mightContain(bits: Array[Long], key: Column): Column = {
    val bitsLit = typedLit(bits.toSeq)
    val masks = typedLit((0 until 64).map(b => 1L << b))
    (0 until K).map { i =>
      val idx = pmod(xxhash64(lit(i.toLong), key), lit(MBits.toLong))
      val word = element_at(bitsLit, shiftright(idx, 6).cast("int") + lit(1))
      val mask = element_at(masks, idx.bitwiseAND(lit(63L)).cast("int") + lit(1))
      word.bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)
  }
}
