package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located join via bucketing (PLANS.md scale story): pre-bucketing
  * both fact tables on the join key removes the shuffle from every
  * subsequent join — the 100 TB pattern for repeated orderkey joins.
  * Asserted on the actual physical plan, not just documented.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("joins on bucketed tables run without a shuffle exchange") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    graft.util.Tables.lineitem(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("li_bucketed")
    graft.util.Tables.orders(spark, sf)
      .write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("o_bucketed")

    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("l_quantity")).as("qty"))
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      joined.collect()
      val full = joined.queryExecution.executedPlan.toString
      // AQE prints Final + Initial plan copies; assert on the final one
      val plan = full.indexOf("== Initial Plan ==") match {
        case -1 => full
        case i => full.substring(0, i)
      }
      // the join inputs must come straight from bucketed scans — the
      // only exchange allowed in the whole plan is the aggregation's
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(exchanges == 1, s"expected only the agg exchange:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
