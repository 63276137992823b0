package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind the round-10 operators that the hash gate alone
  * does not articulate (the Round9OpsSpec discipline). Planted-effect
  * sizes validated at all three fixture sfs before being pinned.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q287: crash + checkpoint restart is invisible — union == single run, zero dups, all closed") {
    val recovered = graft.ops.EventAnalytics.streamRestartRecovery(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val single = graft.ops.EventAnalytics.streamJoinWindowed(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(recovered.nonEmpty)
    // recovery must be invisible: the two-run union equals the
    // uninterrupted AvailableNow run row for row
    assert(recovered.toSeq == single.toSeq)
    // zero duplicated windows across the crash/replay boundary
    assert(recovered.map(_._1).distinct.length == recovered.length)
    // the fence never bites on the fixtures — pinned, not assumed
    assert(recovered.forall(_._3))
  }
}
