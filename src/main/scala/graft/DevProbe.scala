package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val (bdir, ddir, mdir, (pLo, pHi, sLo, sHi)) =
      ops.Formats.ensureZorderMaintenance(spark, d)
    def hits(dirs: String*): (Long, Long) = {
      val st = spark.read.parquet(dirs: _*)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_partkey").as("pmn"), max("l_partkey").as("pmx"),
          min("l_suppkey").as("smn"), max("l_suppkey").as("smx"))
      (st.filter(col("pmx") >= pLo && col("pmn") <= pHi &&
        col("smx") >= sLo && col("smn") <= sHi).count(), st.count())
    }
    println(s"DELTA ${hits(ddir)} DEGRADED ${hits(bdir, ddir)} MERGED ${hits(mdir)}")
    spark.stop()
  }
}
