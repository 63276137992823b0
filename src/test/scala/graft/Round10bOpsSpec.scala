package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind the round-10 second wave (q300-q305) that the
  * hash gate alone does not articulate. Planted-effect sizes validated
  * at all three fixture sfs before being pinned.
  */
class Round10bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q300: crash + restart over keyed custom state is invisible — flags == q201, votes exact, all 3 batches committed") {
    val rec = graft.ops.Dedup.streamNearDupRestart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(rec.nonEmpty)
    // exactly 8 band votes per doc: a double-applied replay would
    // double a batch's votes, a lost batch would drop its docs
    assert(rec.forall(_._3 == 8L))
    // the recovered flags equal the uninterrupted streamed statistic
    val clean = graft.ops.Dedup.streamNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(rec.map(t => (t._1, t._2)).toMap == clean)
    // run 1 died mid-backlog and run 2 drained the rest: all 3 chunk
    // batches are committed in the shared checkpoint
    val commits = new java.io.File(
      graft.util.TmpDirs.pathFor("neardup-restart-ckpt", sf) + "/commits")
      .list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
    assert(commits == Seq(0L, 1L, 2L))
  }

  test("q301: the consumer replica is indistinguishable from the producer chain at every version") {
    val replica = graft.ops.Audit.mvCdfReplica(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val producer = graft.ops.Audit.mvTimeTravel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(replica.nonEmpty && replica == producer)
  }

  test("q302: evolution adds the measure without disturbing old ones; no backfill before the evolution point") {
    val ev = graft.ops.Audit.mvSchemaEvolution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // pre-evolution versions surface the sentinel everywhere
    assert(ev.filter(_._1 <= 2L).forall(_._6 == -1.0))
    // the evolved measure exists (some group carries a real max)
    assert(ev.exists(t => t._1 == 3L && t._6 > 0))
    // old measures are untouched by the evolution: (version, month,
    // status, n, revenue) must equal the never-evolved q290 chain
    val tt = graft.ops.Audit.mvTimeTravel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(ev.filter(_._1 >= 1L)
      .map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == tt)
    // HEAD's evolved measure covers exactly the post-evolution
    // arrivals (shards 2 and 3), verified against a direct recompute
    val direct = graft.util.Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(4)) >= 2)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(round(max(col("o_totalprice")
        .cast("decimal(28,6)")), 2).cast("double").as("mp"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    ev.filter(_._1 == 4L).foreach { t =>
      assert(t._6 == direct.getOrElse((t._2, t._3), -1.0),
        s"v4 evolved measure mismatch at (${t._2}, ${t._3})")
    }
  }

  test("q303: the conflicting writer retries exactly once and the schedule serializes") {
    val rows = graft.ops.Audit.mvConcurrentCommits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_._2).toSeq == Seq("genesis", "init", "writer_a", "writer_b"))
    // the conflict is recorded: writer B needed a second attempt
    assert(rows.map(_._3).toSeq == Seq(0L, 1L, 1L, 2L))
    // no lost update, no double apply: row counts strictly increase
    // and HEAD holds exactly the three ingested shards
    val ns = rows.map(_._4)
    assert(ns.zip(ns.tail).forall { case (a, b) => a < b })
    val expected = graft.util.Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(4)) < 3).count()
    assert(ns.last == expected)
  }

  test("q306/q307: snapshot isolation — pinned v1 reads exact after v2 commits, compaction touched no v1 byte") {
    val root = graft.ops.Clustering.ensureManifestIndex(spark, sf)
    def probe(v: Long) = {
      val cells = graft.ops.Clustering.readManifestSnapshot(spark, root, v)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
      val e = graft.util.Tables.embeddings(spark, sf)
        .select(col("vec_id"), col("embedding"))
      val qs = e.filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      graft.ops.Clustering.ivfProbeOnCells(spark, sf, cells, qs)
        .orderBy(col("query_id"), col("rank")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toSeq
    }
    // the reader pinned at v1 (reading AFTER v2 committed) sees
    // exactly what the HEAD reader sees — compaction is isolated
    val v1 = probe(1)
    assert(v1.nonEmpty && v1 == probe(2))
    // every v1 unit survived the compaction on disk, written strictly
    // before the compacted unit (non-destructive by construction)
    val uFiles = (0 to 4).flatMap { k =>
      graft.ops.Clustering.listDataFiles(
        java.nio.file.Paths.get(s"$root/data/u$k")).values
    }
    val cFiles = graft.ops.Clustering.listDataFiles(
      java.nio.file.Paths.get(s"$root/data/compact1")).values
    assert(uFiles.nonEmpty && cFiles.nonEmpty)
    assert(uFiles.map(_._2).max <= cFiles.map(_._2).min,
      "v1 units must predate the compacted unit")
  }

  test("q308: the cohort is gone from every serving surface, and only the cohort") {
    val rows = graft.ops.Clustering.erasureEverywhere(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq ==
      Seq("bin_cow", "bin_mor", "ivf_cow", "ivf_mor", "pq_cow", "pq_mor"))
    // zero cohort members served anywhere
    assert(rows.forall(_._3 == 0L))
    // nothing beyond the cohort was lost: every surface holds exactly
    // the survivor set
    val e = graft.util.Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 97 =!= 0)
      .agg(count(lit(1)), sum(col("vec_id"))).collect()(0)
    val (n, sm) = (e.getLong(0), e.getLong(1))
    assert(rows.forall(t => t._2 == n && t._4 == sm))
  }

  test("q309: the crash-replayed CDF consumer equals the clean consumer, all deltas committed") {
    val recovered = graft.ops.Audit.mvCdfReplicaRestart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val clean = graft.ops.Audit.mvCdfReplica(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(recovered.nonEmpty && recovered == clean)
    val commits = new java.io.File(
      graft.util.TmpDirs.pathFor("mv-cdf-replica-ckpt", sf) + "/commits")
      .list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
    assert(commits == Seq(0L, 1L, 2L, 3L))
  }

  test("q303 commit protocol: a genuine two-thread race elects exactly one winner") {
    import spark.implicits._
    val dir = graft.util.TmpDirs.scratch("occ-race")
    Seq(("g", 1L)).toDF("k", "n").limit(0)
      .write.mode("overwrite").parquet(s"$dir/mv_v0")
    val head = new java.util.concurrent.atomic.AtomicLong(0)
    val ready = new java.util.concurrent.CountDownLatch(2)
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq("a", "b").map { w =>
      new Thread(() => {
        val state = Seq((w, 1L)).toDF("k", "n")
        ready.countDown(); go.await()
        if (graft.ops.Audit.occCommit(dir, head, 0L, state))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); ready.await(); go.countDown()
    threads.foreach(_.join(120000))
    // exactly one writer won the CAS; the version advanced once
    assert(wins.get() == 1 && head.get() == 1L)
    // the committed directory is complete and readable; the loser's
    // staging left nothing behind
    assert(spark.read.parquet(s"$dir/mv_v1").count() == 1L)
    val stray = new java.io.File(dir).list().filter(_.startsWith("staging_"))
    assert(stray.isEmpty, s"loser must clean its staging: ${stray.toSeq}")
  }

  test("q311/q312: the retraction deletes groups, and applying the feed to v4 reproduces v5") {
    val v5 = graft.ops.Audit.mvRetraction(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val feed = graft.ops.Audit.mvRetractionFeed(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val v4 = graft.util.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // retraction only removes: no new groups, and some group is GONE
    assert(v5.keySet.subsetOf(v4.keySet))
    val vanished = v4.keySet -- v5.keySet
    assert(vanished.nonEmpty, "the min-count groups must vanish in full")
    // a vanished group's feed row retracts exactly its previous count
    vanished.foreach(g => assert(feed(g) == -v4(g), s"group $g"))
    // CDC apply: v4 + delta == v5 everywhere (absent == 0)
    v4.foreach { case (g, n4) =>
      assert(n4 + feed.getOrElse(g, 0L) == v5.getOrElse(g, 0L), s"group $g")
    }
  }

  test("q304/q305: crash-replayed streaming growth is exactly-once — no dup vectors, full corpus, layout clean") {
    // (crash-invisibility of the probe itself is proven by the q304
    // DuckDB gate: same full-corpus oracle as the batch-grown q215
    // and cleanly-stream-grown q289 forms, hash-exact at all 3 sfs.
    // Deliberately NOT comparing against streamIndexGrow here — that
    // would populate swgMemo and break Round10OpsSpec's first-caller
    // builds-once pin under sbt's arbitrary suite order.)
    val audit = graft.ops.Clustering.ivfGrowAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._1).toSeq == (0L to 4L))
    // exactly-once: every growth batch holds each vector once
    audit.foreach { case (gb, n, nd) =>
      assert(n == nd, s"gb=$gb: duplicated vectors after replay")
    }
    assert(audit.map(_._2).sum ==
      graft.util.Tables.embeddings(spark, sf).count())
    // the replay produced no stray growth-batch directory: exactly
    // gb=0 (base) + gb=1..4, and the crash-replayed gb=2 exists once
    val loc = graft.ops.Clustering.ensureGrowRestart(spark, sf)
    val dirs = new java.io.File(loc).list().filter(_.startsWith("gb="))
      .map(_.stripPrefix("gb=").toLong).sorted.toSeq
    assert(dirs == (0L to 4L))
    // all 3 post-crash batches are committed in the shared checkpoint
    // same sanitization rule as the fixture itself — no inline literal
    // to drift (r10 advice)
    val ckptDir = new java.io.File(graft.util.TmpDirs.path(
      graft.ops.Clustering.tableNameFor("ivf_growrestart_ckpt_", sf)) +
      "/commits")
    assert(ckptDir.isDirectory, s"expected checkpoint commits at $ckptDir")
    val commits = ckptDir
      .list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
    assert(commits == Seq(0L, 1L, 2L, 3L))
  }
}
