package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.SqlSuite

/** Semantics invariants for the round-8 widening beyond the DuckDB
  * hash gate.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q260: session variables bind live values and EXECUTE IMMEDIATE honors rebinding") {
    val out = SqlSuite.sessionVars(spark, sf).collect()
    assert(out.nonEmpty)
    val filtered = out.map(_.getAs[Long]("n")).sum
    // rebinding the threshold variable changes what the SAME stored
    // query text computes — the session scope is live, not captured
    spark.sql("SET VARIABLE graft_minq = 0")
    val all = spark.sql("EXECUTE IMMEDIATE graft_qtext USING graft_minq")
      .collect()
    val total = all.map(_.getAs[Long]("n")).sum
    assert(filtered < total)
    assert(total == graft.util.Tables.lineitem(spark, sf).count(),
      "threshold 0 must admit every lineitem row")
  }
}
