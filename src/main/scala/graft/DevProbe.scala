package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: scratchpad (not part of the driver contract). Edit
  * freely; keep out of SparkEntry.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.util.TmpDirs.installJavaTmp()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark
    println("tmpdir=" + System.getProperty("java.io.tmpdir"))
    val names = Seq("q173_stream_join", "q274_stream_join_windowed",
      "q310_stream_left_outer_join", "q315_stream_dim_refresh",
      "q243_stream_mv", "q275_stream_sessions_append")
    // warm
    names.foreach { n =>
      try SparkEntry.queries(n)(s, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => }
    }
    (1 to 2).foreach { i =>
      names.foreach { n =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(s, d).count()
        println(f"RUN$i $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
