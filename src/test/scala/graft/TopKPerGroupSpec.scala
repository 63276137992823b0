package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("TopKPerGroup equals the window row_number form") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val custom = graft.plans.TopKPerGroup.topK(src,
      Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"), 4)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey").desc)
      .collect()
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val windowed = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey").desc)
      .collect()
    assert(custom.toSeq == windowed.toSeq)
  }

  test("plans as partial + final exec around one exchange, no sort") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val df = graft.plans.TopKPerGroup.topK(src,
      Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"), 4)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, plan) // partial + final
    assert(plan.contains("Exchange"), plan)                  // clustered final phase
    assert(!plan.toLowerCase.contains("sort"), plan)         // heap, not sort
  }

  test("k larger than every group returns all rows") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "region")
      .select(col("r_regionkey"), col("r_name"))
    val all = graft.plans.TopKPerGroup.topK(src,
      Seq("r_name"), Seq("r_regionkey"), 1000).count()
    assert(all == src.count())
  }
}
