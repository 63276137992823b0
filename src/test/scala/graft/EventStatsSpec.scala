package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.EventAnalytics
import graft.util.Tables

/** q63's exact-decimal moment formulas must agree with Spark's
  * built-in stddev_samp / var_samp / corr (which use streaming
  * algorithms whose low bits are order-dependent — hence not used in
  * the oracle-checked output directly).
  */
class EventStatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("closed-form stats match builtin stddev/var/corr within the 4-decimal rounding bound") {
    val manual = EventAnalytics.statsAgg(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("var_value"), r.getAs[Double]("std_value"),
          r.getAs[Double]("corr_vk"))).toMap
    val builtin = Tables.events(spark, sf)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(var_samp(col("value")).as("v"), stddev_samp(col("value")).as("s"),
        corr(col("value"), col("k")).as("c"))
      .collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("v"), r.getAs[Double]("s"), r.getAs[Double]("c"))).toMap
    assert(manual.keySet == builtin.keySet)
    // manual values are rounded to 4 decimals in the query output, so
    // the bound is half-ulp-at-scale-4 plus float slack
    manual.foreach { case (t, (v, s, c)) =>
      val (bv, bs, bc) = builtin(t)
      assert(math.abs(v - bv) < 5.1e-5, s"$t var: $v vs $bv")
      assert(math.abs(s - bs) < 5.1e-5, s"$t std: $s vs $bs")
      assert(math.abs(c - bc) < 5.1e-5, s"$t corr: $c vs $bc")
    }
  }
}
