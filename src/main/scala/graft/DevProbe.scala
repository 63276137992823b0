package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: scratchpad (not part of the driver contract). Edit
  * freely; keep out of SparkEntry.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(s"probe over $d: " +
      SparkEntry.queries("q358_ivfpq_probe")(spark, d).count())
    spark.stop()
  }
}
