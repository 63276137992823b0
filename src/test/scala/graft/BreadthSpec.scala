package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BreadthSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("HLL and Theta sketch estimates stay within 5% of exact distinct") {
    val rows = ops.Breadth.sketchDistinct(TestSpark.spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("exact_users").toDouble
      val hll = r.getAs[Long]("hll_users").toDouble
      val theta = r.getAs[Long]("theta_users").toDouble
      assert(math.abs(hll - exact) / exact <= 0.05,
        s"hll ${r.getString(0)}: $hll vs $exact")
      assert(math.abs(theta - exact) / exact <= 0.05,
        s"theta ${r.getString(0)}: $theta vs $exact")
    }
  }

  test("sketches are mergeable: union of per-half sketches = whole-corpus estimate") {
    val s = TestSpark.spark
    val e = graft.util.Tables.events(s, sf)
      .select(col("user_id"), pmod(col("event_id"), lit(2)).as("half"))
    // partial sketches per half, then hll_union_agg — the algebraic
    // re-aggregation a 1000-executor rollup relies on
    val merged = e.groupBy(col("half"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect()(0).getAs[Long]("est")
    val whole = e
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getAs[Long]("est")
    assert(merged == whole, s"union-of-parts $merged != whole $whole")
  }

  test("AQE runtime bloom filter injects might_contain into a selective shuffle join") {
    // isolated SQLConf (shared SparkContext): bloom-filter runtime
    // filters only apply to shuffle joins, so broadcast is disabled
    // and the application-side size floor dropped for test-scale data
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    val li = graft.util.Tables.table(s, sf, "lineitem")
    val ord = graft.util.Tables.table(s, sf, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.optimizedPlan.toString
    assert(plan.contains("might_contain"), plan)
    // and the filtered plan still computes the right answer
    val expected = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
    assert(joined.collect()(0).getAs[Long]("n") == expected)
  }
}
