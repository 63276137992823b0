package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest sf so the timed
    // pass measures steady-state execution, not first-run JIT +
    // codegen compilation (measured 3-5× inflation on cold queries).
    // Data caches don't carry over — Tables memoizes per (session,
    // DIR), so the timed pass still does its full scan at the target
    // sf; only JVM/codegen state is warm, as in any long-lived engine.
    val warmDir = "/root/testdata/sf0.001"
    if (warmDir != sfDir && new java.io.File(warmDir).isDirectory) {
      val deadline = System.nanoTime() + 180L * 1000000000L // bounded warm-up
      SparkEntry.queries.toSeq.sortBy(_._1).iterator
        .takeWhile(_ => System.nanoTime() < deadline)
        .foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => }
        }
    } else {
      try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    }
    // drop warm-up-scale caches/memos before timing: the timed pass
    // must pay its own full cost at the target sf (JVM/codegen state
    // stays warm, data does not). Per-query caveat: queries sharing a
    // memoized stage (q27/q28/q51/q57 → MinHash signatures) charge the
    // shared cost to whichever runs first — read the total, or
    // BenchOne a query in isolation, before comparing per-query times.
    graft.util.CacheRegistry.clear()
    // name-sorted: hash-map iteration order would reshuffle which query
    // pays shared first-touch costs each time the query set changes,
    // making per-query numbers incomparable across rounds
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    graft.util.CacheRegistry.clear()
    spark.stop()
  }
}
