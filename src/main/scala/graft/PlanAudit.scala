package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: sweep every registered query's physical plan for
  * scale anti-patterns (cartesian products, nested-loop joins,
  * single-partition exchanges) and print a per-query summary. The
  * flagged shapes are not automatically wrong — q30's broadcast
  * nested loop over 10 query vectors is intentional — but every hit
  * should have a scale rationale in PLANS.md.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val flags = Seq(
      "CartesianProduct" -> "cartesian",
      "BroadcastNestedLoopJoin" -> "bnlj",
      "SinglePartition" -> "single-partition exchange")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val hits = flags.collect { case (pat, label) if plan.contains(pat) => label }
        val exchanges = "Exchange".r.findAllIn(plan).size
        println(f"[audit] $name%-24s exchanges=$exchanges%-3d ${hits.mkString(", ")}")
      } catch {
        case e: Throwable => println(s"[audit] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
