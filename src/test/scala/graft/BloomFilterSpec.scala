package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.BloomFilterAgg

/** BloomFilterAgg contract: the Scala build side and the codegen'd
  * probe side must agree bit-for-bit (same xxhash64 seed chain), the
  * merge must be a true bitwise OR, and the false-positive rate must
  * sit far inside q105's declared 5% envelope.
  */
class BloomFilterSpec extends AnyFunSuite {

  test("every inserted key probes true — build/probe hash agreement, exhaustively") {
    val s = TestSpark.spark
    import s.implicits._
    val keys = (1L to 2000L).map(k => k * 7919L - 3571L)
    val bits = keys.toDS().select(BloomFilterAgg.toColumn).head()
    val probed = keys.toDF("k")
      .filter(BloomFilterAgg.mightContain(bits, col("k"))).count()
    assert(probed == keys.size.toLong) // a Bloom filter has NO false negatives
  }

  test("merge is bitwise OR: a split build equals the whole build") {
    val (a, b) = ((1L to 100L), (101L to 200L))
    val whole = (a ++ b).foldLeft(BloomFilterAgg.zero)(BloomFilterAgg.reduce)
    val split = BloomFilterAgg.merge(
      a.foldLeft(BloomFilterAgg.zero)(BloomFilterAgg.reduce),
      b.foldLeft(BloomFilterAgg.zero)(BloomFilterAgg.reduce))
    assert(java.util.Arrays.equals(whole, split))
  }

  test("false-positive rate on 20k absent keys is inside the envelope") {
    val s = TestSpark.spark
    import s.implicits._
    val present = (1L to 3000L).map(_ * 2L) // evens
    val bits = present.toDS().select(BloomFilterAgg.toColumn).head()
    val absent = (1L to 20000L).map(_ * 2L + 1L) // odds — disjoint
    val fp = absent.toDF("k")
      .filter(BloomFilterAgg.mightContain(bits, col("k"))).count()
    // expected FP ≈ (1 − e^(−5·3000/131072))^5 ≈ 1.5e-5 → ~0.3 of 20k;
    // 5% of 20k = 1000 gives orders-of-magnitude slack
    assert(fp <= 1000, s"fp=$fp")
  }
}
