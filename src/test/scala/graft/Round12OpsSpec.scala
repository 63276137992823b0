package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Audit, Clustering, GraphAnn}

/** Round-12 physical/structural invariants behind the q327-q331 gates:
  * the fold-in policy's partition selectivity (clean layers
  * byte-pinned), the planted staleness margin, the bucketed descent's
  * shuffle-free edge side, the size-driven strategy, and the N-table
  * commit race. All build-dependent assertions read runner-recorded
  * facts or deltas around this suite's own calls (the r11 order-robust
  * rule) — never first-caller counter pins.
  */
class Round12OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q327 fold-in: clean layer partitions byte-identical, flagged rewritten, grown fixture untouched") {
    // the fold fixture COPIES the grown graph — prove the source is
    // only read (snapshot around this suite's own ensure call)
    val (gloc, _, _) = GraphAnn.ensureHnswGrown(spark, sf)
    val grownBefore = Clustering.listDataFiles(
      java.nio.file.Paths.get(gloc))
    val (loc, _, _, dec) = GraphAnn.ensureHnswFold(spark, sf)
    val grownAfter = Clustering.listDataFiles(
      java.nio.file.Paths.get(gloc))
    assert(grownBefore == grownAfter,
      "the fold build must not touch the q323 grown fixture")
    val rows = spark.read.parquet(dec).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8)))
      .sortBy(_._1)
    // the planted cohort flags EXACTLY layers 0-1; clean layers hold
    // exactly zero ghost edges (level-confined by construction)
    val flagged = rows.filter(_._5).map(_._1).toSet
    assert(flagged == Set(0L, 1L), s"flag set $flagged")
    rows.filterNot(_._5).foreach { r =>
      assert(r._3 == 0L, s"clean layer ${r._1} has ghost edges ${r._3}")
    }
    // flagged debts clear the threshold with real margin (measured
    // ~33-45% vs the 10% threshold across sfs)
    rows.filter(_._5).foreach { r =>
      assert(r._4 >= 2 * GraphAnn.GhostThresholdPct,
        s"flagged layer ${r._1} debt ${r._4}% lacks margin")
    }
    // byte-pinning: every pre-fold file under a CLEAN layer survives
    // size/mtime-identical; every flagged layer's file set was replaced
    val pre = GraphAnn.foldPreFiles.get((spark, sf))
    assert(pre != null && pre.nonEmpty)
    val now = Clustering.listDataFiles(java.nio.file.Paths.get(loc))
    def layerOfPath(p: String): Long =
      "layer=(\\d+)".r.findFirstMatchIn(p).get.group(1).toLong
    pre.foreach { case (p, meta) =>
      if (!flagged.contains(layerOfPath(p)))
        assert(now.get(p).contains(meta), s"clean-layer file touched: $p")
    }
    flagged.foreach { l =>
      val preL = pre.keys.filter(p => layerOfPath(p) == l)
      assert(preL.nonEmpty)
      preL.foreach(p => assert(!now.contains(p),
        s"flagged layer $l kept a pre-fold file: $p"))
    }
  }

  test("q328 fold-in probe + q324 MoR probe: routability flips across the fold") {
    // merge-on-read: ghosts still routable (their edges intact) but
    // never served; post-fold: the same class of tombstoned nodes is
    // physically unreachable — both read from the gate outputs
    val mor = GraphAnn.hnswErasureProbe(spark, sf).collect()
    assert(mor.nonEmpty && mor.forall(r =>
      r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)))
    val folded = GraphAnn.hnswFoldinProbe(spark, sf).collect()
    assert(folded.nonEmpty && folded.forall(r =>
      r.getBoolean(1) && r.getBoolean(2) && r.getBoolean(3)))
    // recorded recall facts exist and clear their floors with margin
    val er = GraphAnn.gateRecalls.get((sf, "erasure"))
    val fo = GraphAnn.gateRecalls.get((sf, "foldin"))
    assert(er >= 0.85, s"erasure recall $er") // measured 0.93
    assert(fo >= 0.70, s"foldin recall $fo")  // measured 0.84
  }

  test("q329/q333 staleness: drift fires the trigger with real margin; the no-drift control keeps it quiet") {
    val rows = GraphAnn.hnswStaleness(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getBoolean(1) && r.getBoolean(2)))
    val stale = GraphAnn.gateRecalls.get((sf, "staleness-drift-stale"))
    val fresh = GraphAnn.gateRecalls.get((sf, "staleness-drift-fresh"))
    // measured 0.56 vs 1.00 at sf0.001 (0.32/1.00 at sf0.01,
    // 0.11/1.00 at sf0.1 — separation GROWS with corpus size)
    assert(fresh - stale >= 0.30,
      s"drift separation too small: stale $stale fresh $fresh")
    assert(fresh >= 0.85, s"refreshed graph unhealthy: $fresh")
    // the control: same audit, in-distribution arrivals — the trigger
    // must stay quiet, and not by a hair (insert-grown navigates at
    // least as well as the pool rebuild on in-distribution data)
    val ctl = GraphAnn.hnswStalenessControl(spark, sf).collect()
    assert(ctl.nonEmpty && ctl.forall(r =>
      r.getBoolean(1) && r.getBoolean(2)))
    val cStale = GraphAnn.gateRecalls.get((sf, "staleness-ctl-stale"))
    val cFresh = GraphAnn.gateRecalls.get((sf, "staleness-ctl-fresh"))
    // measured control deltas: 0 / +0.12 / −0.25 of recall across sfs
    // — build-flavor variance, firmly under the 0.20 relative trigger
    // (which the drift run clears at 0.44-0.89)
    assert(cFresh - cStale < 0.20,
      s"control must sit below the relative trigger: " +
        s"stale $cStale fresh $cFresh")
  }

  test("q330 bucketed descent: the hop join is shuffle-free on the edge side") {
    val (name, _, _) = GraphAnn.ensureHnswBucketed(spark, sf)
    val edges = spark.table(name).filter(col("layer") === 0)
      .select(col("src"), col("dst"))
    val beam = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id")).limit(20)
    val joined = beam.join(edges.hint("MERGE"),
      beam("vec_id") === edges("src"))
    joined.collect()
    val full = joined.queryExecution.executedPlan.toString
    val plan = full.indexOf("== Initial Plan ==") match {
      case -1 => full
      case i => full.substring(0, i)
    }
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    // only the (tiny) beam side may exchange; the edge scan reads
    // co-located buckets
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected only the beam-side exchange:\n$plan")
  }

  test("q330 descent strategy is size-driven") {
    assert(GraphAnn.descentStrategy(1024) == "broadcast")
    assert(GraphAnn.descentStrategy(1024, maxBytes = 512) == "bucketed")
    val (loc, _, _) = GraphAnn.ensureHnsw(spark, sf)
    val bytes = Clustering.listDataFiles(java.nio.file.Paths.get(loc))
      .values.map(_._1).sum
    assert(GraphAnn.descentStrategy(bytes) == "broadcast",
      s"fixture-scale edges ($bytes B) must broadcast")
  }

  test("q332 atomic erasure: one manifest flips all three surfaces; pinned pre-erasure readers exact") {
    val rows = Audit.mvNErasure(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getDouble(5)))
    assert(rows.map(_._1).distinct.sorted.toSeq == (0L to 4L))
    // the atomicity witness: at EVERY version the three tables carry
    // identical exact totals — a torn erasure breaks one at v4
    rows.groupBy(_._1).foreach { case (v, g) =>
      assert(g.map(t => (t._5, t._6)).distinct.size == 1,
        s"torn state at version $v: $g")
    }
    // the erasure removed a real cohort, exactly once
    val n3 = rows.find(r => r._1 == 3L && r._4 == "view").get._5
    val n4 = rows.find(r => r._1 == 4L && r._4 == "view").get._5
    assert(n4 < n3, s"erasure must shrink HEAD: v3=$n3 v4=$n4")
    // pre-erasure versions still serve their original totals (the
    // q331 gate hashes the same values — cross-pinned here)
    val pre = Audit.mvNCommits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4)))
    pre.foreach { case (v, tbl, n) =>
      val after = rows.find(r => r._1 == v && r._4 == tbl).get._5
      assert(after == n, s"pre-erasure version $v/$tbl moved: $n -> $after")
    }
  }

  test("q331 N-table commit: a genuine two-thread race elects one winner and never publishes a torn triple") {
    import spark.implicits._
    val dir = graft.util.TmpDirs.scratch("ntable-occ-race")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/manifest"))
    val tbls = Seq("view", "replica", "index")
    tbls.foreach { t =>
      Seq(("g", 1L)).toDF("k", "n").limit(0)
        .write.mode("overwrite").parquet(s"$dir/data/${t}_0")
    }
    tbls.map(t => (t, s"data/${t}_0")).toDF("tbl", "unit").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest/v0")
    val head = new java.util.concurrent.atomic.AtomicLong(0)
    val ready = new java.util.concurrent.CountDownLatch(2)
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq("a", "b").map { w =>
      new Thread(() => {
        val state = tbls.map(t => t -> Seq((w, 1L)).toDF("k", "n"))
        ready.countDown(); go.await()
        if (Audit.occCommitN(spark, dir, head, 0L, state))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); ready.await(); go.countDown()
    threads.foreach(_.join(120000))
    assert(wins.get() == 1 && head.get() == 1L)
    // the published manifest resolves a COMPLETE triple from ONE writer
    val snap = Audit.readNSnapshot(spark, dir, 1L)
    assert(snap.keySet == tbls.toSet)
    val writers = snap.values.map(_.collect()(0).getString(0)).toSet
    assert(writers.size == 1, s"torn commit published: $writers")
    // loser's staging and units cleaned
    val strayM = new java.io.File(dir).list()
      .filter(_.startsWith("manifest_stage_"))
    assert(strayM.isEmpty, s"loser staging left behind: ${strayM.toSeq}")
    val units = new java.io.File(s"$dir/data").list().sorted.toSeq
    tbls.foreach { t =>
      assert(units.count(_.startsWith(s"${t}_")) == 2,
        s"loser's staged $t unit must be deleted: $units")
    }
  }
}
