package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind the round-10 operators that the hash gate alone
  * does not articulate (the Round9OpsSpec discipline). Planted-effect
  * sizes validated at all three fixture sfs before being pinned.
  */
class Round10OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q287: crash + checkpoint restart is invisible — union == single run, zero dups, all closed") {
    val recovered = graft.ops.EventAnalytics.streamRestartRecovery(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val single = graft.ops.EventAnalytics.streamJoinWindowed(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(recovered.nonEmpty)
    // recovery must be invisible: the two-run union equals the
    // uninterrupted AvailableNow run row for row
    assert(recovered.toSeq == single.toSeq)
    // zero duplicated windows across the crash/replay boundary
    assert(recovered.map(_._1).distinct.length == recovered.length)
    // the fence never bites on the fixtures — pinned, not assumed
    assert(recovered.forall(_._3))
  }

  test("q288: the 10% threshold flags exactly pg 0-1, and the fold touches only them") {
    val before = graft.ops.Clustering.sweepPartitionsRewritten.get()
    val dec = graft.ops.Clustering.foldinDecision(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4), r.getLong(5), r.getLong(6)))
    // the tenant half concentrates in pg 0-1 (~50%); scattered debt
    // stays ≤1% — the decision is a property of the cohort shape, not
    // the sf (validated at all three fixture sfs before pinning)
    assert(dec.filter(_._5).map(_._1).toSeq == Seq(0L, 1L))
    // the fold was partition-selective: exactly the 2 flagged
    // partition dirs rewritten, no table rewrite
    assert(graft.ops.Clustering.sweepPartitionsRewritten.get() - before == 2)
    // flagged partitions land at zero on BOTH ledgers; unflagged keep
    // their pre-fold debt exactly (tombstoned AND still in the files)
    dec.foreach { case (pg, _, nTomb, _, fold, postTomb, postPhys) =>
      if (fold) assert(postTomb == 0L && postPhys == 0L, s"pg=$pg")
      else assert(postTomb == nTomb && postPhys == nTomb, s"pg=$pg")
    }
    // serving through the post-policy view still equals
    // rebuild-from-survivors for the FULL cohort (the q291 gate);
    // here pin the complementary negative: no cohort member is served
    val (bin, dv, _) = graft.ops.Clustering.ensureFoldinPolicy(spark, sf)
    val served = graft.ops.Clustering.dvMergedCells(spark, bin, dv)
      .join(broadcast(graft.ops.Clustering.policyCohort(spark, sf)),
        col("vec_id") === col("k"))
    assert(served.count() == 0L)
  }

  test("q289: serve-while-grow — one build, serving output during growth, base files untouched") {
    val before = graft.ops.Clustering.indexBuilds.get()
    val (_, mid) = graft.ops.Clustering.ensureServeWhileGrow(spark, sf)
    // streamed growth is pure appends: exactly the one base build
    assert(graft.ops.Clustering.indexBuilds.get() - before == 1)
    // the concurrent serve stream produced probe rows (content not
    // pinned — it reflects the nondeterministic growth prefix — but
    // no served answer ever exceeds top-k)
    val midRows = spark.read.parquet(mid)
    assert(midRows.count() > 0)
    assert(midRows.groupBy(col("serve_batch"), col("query_id"))
      .count().filter(col("count") > 3).count() == 0)
    // every base data file survived growth with size and mtime intact
    val base = graft.ops.Clustering.swgBaseFiles.get((spark, sf))
    assert(base.nonEmpty)
    base.foreach { case (p, (size, mtime)) =>
      val f = java.nio.file.Paths.get(p)
      assert(java.nio.file.Files.isRegularFile(f), s"base file vanished: $p")
      assert(java.nio.file.Files.size(f) == size, s"base file rewritten: $p")
      assert(java.nio.file.Files.getLastModifiedTime(f).toMillis == mtime,
        s"base file touched: $p")
    }
  }

  test("q290: HEAD version equals the q230 full view; versions grow monotonically") {
    val tt = graft.ops.Audit.mvTimeTravel(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4)))
    // five committed states: the empty v0 plus one per arrival shard
    assert(tt.map(_._1).distinct.sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // HEAD (v4 = all shards) must be exactly the q230 full recompute
    val head = tt.filter(_._1 == 4L).map(t => (t._2, t._3, t._4, t._5)).toSeq
    val full = graft.ops.Audit.mvRefresh(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(head == full)
    // a version never loses rows: per (month, status), n is
    // non-decreasing across versions
    tt.groupBy(t => (t._2, t._3)).foreach { case (_, rows) =>
      val ns = rows.sortBy(_._1).map(_._4)
      assert(ns.zip(ns.tail).forall { case (a, b) => a <= b })
    }
  }
}
