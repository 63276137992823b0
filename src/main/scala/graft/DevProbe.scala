package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev harness: stage-level timing scratchpad (not part of the driver
  * contract). Edit freely; keep out of SparkEntry.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts.put(j.jobId, (System.nanoTime(),
          Option(j.properties.getProperty("spark.job.description")).getOrElse("?")))
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, desc) = starts.getOrDefault(j.jobId, (0L, "?"))
        println(f"JOB ${j.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%6.2f $desc")
      }
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    t("warm")(ops.Graph.pageRank(spark, d).count())
    Thread.sleep(500)
    println("=== WARM DONE ===")
    t("full_2")(ops.Graph.pageRank(spark, d).count())
    Thread.sleep(500)
    spark.stop()
  }
}
