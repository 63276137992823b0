package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd}

/** Dev harness: scratchpad (not part of the driver contract). Edit
  * freely; keep out of SparkEntry.
  *
  * Current form: per-JOB profiler for named queries — runs each query
  * twice (steady state = run 2) and prints every Spark job's wall
  * duration, so a gate's seconds can be attributed to its sub-steps.
  *
  * args: <query1,query2,...> [sfDir]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val d = if (args.length > 1) args(1)
      else sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    graft.util.TmpDirs.installJavaTmp()
    val b0 = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    // extra session confs for A/B runs: "k=v;k=v"
    val b = sys.env.get("SPARK_GRAFT_DEV_CONF").map(_.split(";").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b0) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); println(s"[conf] $k=$v"); bb.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = spark

    // job-level listener: id -> (start ns, #tasks, description)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, Int, String)]()
    val logLock = new Object // dedicated lock (ADVICE: never sync on the reassigned field)
    @volatile var log = List.empty[(Int, Double, Int, String)]
    @volatile var capture = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        val nTasks = js.stageInfos.map(_.numTasks).sum
        starts.put(js.jobId, (System.nanoTime(), nTasks, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val st = starts.remove(je.jobId)
        if (capture && st != null)
          logLock synchronized {
            log = (je.jobId, (System.nanoTime() - st._1) / 1e9, st._2, st._3) :: log
          }
      }
    })

    // streaming progress listener: per-batch duration breakdown
    spark.streams.addListener(
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = {
          val p = e.progress
          if (capture)
            println(s"  [batch ${p.batchId}] rows=${p.numInputRows} " +
              s"durations=${p.durationMs} state=${p.stateOperators.map(so =>
                s"(commit=${so.commitTimeMs}ms mem=${so.memoryUsedBytes})").mkString}")
        }
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      })

    // warm at sf0.001 (JIT/codegen), as Bench does
    names.foreach { n =>
      try SparkEntry.queries(n)(s, "/root/testdata/sf0.001").count()
      catch { case e: Throwable => println(s"[warm] $n: ${e.getMessage}") }
    }
    val nPass = sys.env.getOrElse("SPARK_GRAFT_DEV_PASSES", "2").toInt
    val verbose = sys.env.get("SPARK_GRAFT_DEV_VERBOSE").nonEmpty
    val mins = scala.collection.mutable.Map[String, Double]()
    (1 to nPass).foreach { i =>
      names.foreach { n =>
        log = Nil
        capture = verbose && i == nPass
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(s, d).count()
        val dt = (System.nanoTime() - t0) / 1e9
        capture = false
        mins(n) = math.min(mins.getOrElse(n, Double.MaxValue), dt)
        println(f"RUN$i $n total=$dt%.2f s")
        if (verbose && i == nPass) {
          val jobs = log.reverse
          val tot = jobs.map(_._2).sum
          println(f"  jobs=${jobs.size} job_wall_sum=$tot%.2f gap=${dt - tot}%.2f")
          jobs.sortBy(-_._2).take(20).foreach { case (id, sec, nt, desc) =>
            println(f"  job#$id%-4d $sec%6.3f s tasks=$nt%-4d ${desc.take(90)}")
          }
        }
      }
    }
    names.foreach(n => println(f"MIN $n ${mins(n)}%.2f s"))
    graft.util.CacheRegistry.clear()
    spark.stop()
  }
}
