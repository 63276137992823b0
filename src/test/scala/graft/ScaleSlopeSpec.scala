package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.scalatest.funsuite.AnyFunSuite

/** Scale-slope audit (r6 verdict task 4): for the 10 most expensive
  * bench queries, measure TOTAL SHUFFLE WRITE BYTES at sf0.001 and
  * sf0.01 and assert growth is at most linear in the input row ratio.
  * Wall-time CI at one sf cannot see a quadratic pair expansion or a
  * driver-side blowup that is still cheap at test scale — the byte
  * slope can: quadratic work shows up as a ~R² byte ratio (R ≈ 10
  * here), two orders above the linear bound this pins.
  */
class ScaleSlopeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Top-10 by min-of-passes cost in BENCH_r06. */
  private val Top10 = Seq(
    "q173_stream_join", "q174_assoc_rules", "q112_kmeans",
    "q130_pagerank", "q150_cc_star", "q155_quant_recall",
    "q154_stream_sessions", "q124_substring_runs", "q114_pq_ann",
    "q119_pmi",
    // r7 additions to the expensive set (bench.json r7 top-10)
    "q104_textrank", "q201_stream_neardup", "q210_winnow_pairs",
    // r7 wave-2: the two most expensive new queries — q226's exact
    // LOO pair sweep (quadratic COMPUTE by definition, but its shuffle
    // must stay block-bounded) and q227's peel rounds
    "q226_knn_label_eval", "q227_kcore",
    // r8: the heaviest new queries — LPA's per-round label shuffles,
    // the PassJoin segment fan-out (constant keys/doc — a quadratic
    // candidate blowup would show immediately), and the governance
    // card's composed per-doc stages
    "q268_label_propagation", "q267_edit_distance_join",
    "q262_governance_card",
    // r9: the heaviest new queries — the chained two-stateful-operator
    // stream (join + windowed agg state), the append-mode session
    // aggregation, and the PQ distortion audit's codebook sweep
    "q274_stream_join_windowed", "q275_stream_sessions_append",
    "q277_pq_staleness",
    // r10: the heaviest new queries — the chunked crash/restart runs
    // (twice the stateful triggers of their single-run counterparts)
    // and the versioned-view chain (per-commit delta merges)
    "q287_stream_restart_recovery", "q296_stream_sessions_restart",
    "q290_mv_time_travel",
    // r10 waves 3-4: the crash/replay runs over keyed dedup state
    // (2× q201's stateful triggers), the crash-safe growth run (5
    // assignment batches + the replay), and the CDC consumer
    // crash/replay (per-version view-sized merges, one re-merged)
    "q300_stream_neardup_restart", "q304_ivf_grow_restart",
    "q309_mv_cdf_restart")

  /** Total shuffle bytes written by every stage `body` runs. The
    * listener bus is async, so after the action we poll until the
    * accumulator is stable before reading it.
    */
  private def shuffleBytes(body: => Unit): Long = {
    val acc = new AtomicLong(0)
    val l = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) acc.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      var prev = -1L
      var stable = 0
      while (stable < 3) {
        Thread.sleep(150)
        val cur = acc.get()
        if (cur == prev) stable += 1 else stable = 0
        prev = cur
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(l)
  }

  test("top-10 bench queries: shuffle bytes grow at most linearly in rows") {
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    import graft.util.Tables
    val rowRatio = Seq[(org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame](
      Tables.events, Tables.documents, Tables.orders,
      Tables.lineitem, Tables.embeddings)
      .map(t => t(spark, sfB).count().toDouble / t(spark, sfA).count())
      .max
    val qs = SparkEntry.queries
    val failures = Top10.flatMap { name =>
      // memoized fixtures (LSH bands, gram tables, …) must not leak
      // between measurements — each run pays its own full cost
      graft.util.CacheRegistry.clear()
      val a = shuffleBytes { qs(name)(spark, sfA).count(); () }
      graft.util.CacheRegistry.clear()
      val b = shuffleBytes { qs(name)(spark, sfB).count(); () }
      val slope = if (a > 0) b.toDouble / a else Double.NaN
      info(f"$name: sf0.001=$a B, sf0.01=$b B, byte slope=$slope%.1f (row ratio $rowRatio%.1f)")
      // linear bound with 2.5x modeling slack (partitioning overheads,
      // per-file framing) + 4 MiB absolute floor for fixed-size
      // shuffles that dwarf a near-zero small-sf measurement
      val bound = a * rowRatio * 2.5 + (4L << 20)
      if (b > bound)
        Some(f"$name: $a B -> $b B (slope $slope%.1f) exceeds linear bound $bound%.0f")
      else None
    }
    graft.util.CacheRegistry.clear()
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
