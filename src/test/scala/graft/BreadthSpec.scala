package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BreadthSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("HLL and Theta sketch estimates stay within 5% of exact distinct") {
    val rows = ops.Breadth.sketchDistinctRaw(TestSpark.spark, sf).collect()
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

  test("KLL quantile sketch honors its rank-error contract") {
    val s = TestSpark.spark
    val rows = ops.Breadth.kllQuantilesRaw(s, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.util.Tables.events(s, sf)
      .select(col("event_type"), col("value")).cache()
    try rows.foreach { r =>
      val t = r.getString(0)
      val n = r.getAs[Long]("n").toDouble
      Seq("kll_p50" -> 0.5, "kll_p90" -> 0.9).foreach { case (c, q) =>
        val below = ev.filter(col("event_type") === t &&
          col("value") <= r.getAs[Double](c)).count().toDouble
        // default k=200 → normalized rank error ≈ 1.65%; allow 5%
        assert(math.abs(below / n - q) <= 0.05, s"$t $c rank ${below / n} vs $q")
      }
    } finally ev.unpersist()
  }

  test("Observation API reports pipeline metrics without a second scan") {
    val s = TestSpark.spark
    val obs = new org.apache.spark.sql.Observation("li-metrics")
    val out = graft.util.Tables.table(s, sf, "lineitem")
      .observe(obs, count(lit(1)).as("rows_seen"),
        sum(col("l_quantity")).as("qty_seen"))
      .filter(col("l_quantity") > 25)
      .count()
    val m = obs.get
    assert(m("rows_seen").asInstanceOf[Long] > out)
    assert(m("qty_seen").asInstanceOf[Double] > 0)
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
