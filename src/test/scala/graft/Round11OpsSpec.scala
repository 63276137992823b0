package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Clustering

/** Round-11 fixtures: the PQ/binary instantiations of the crash-safe
  * streaming-growth layout (q318/q319 — the recovery×family matrix's
  * last two cells). Result-invisibility of each crash is proven by the
  * DuckDB gates (same oracle as the from-scratch and cleanly-grown
  * forms, hash-exact at all 3 sfs); these tests pin the PHYSICAL
  * layout facts the oracle can't see: exactly-once growth batches,
  * residue membership, per-family row shape, checkpoint commits.
  * (Deliberately no calls into other families' ensure/query paths —
  * the Round10 suite-order lesson: prove equivalence through the
  * shared oracle, not cross-fixture collects.)
  */
class Round11OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def gbDirs(loc: String): Seq[Long] =
    new java.io.File(loc).list().filter(_.startsWith("gb="))
      .map(_.stripPrefix("gb=").toLong).sorted.toSeq

  private def commitsOf(prefix: String): Seq[Long] = {
    val dir = new java.io.File(graft.util.TmpDirs.path(
      Clustering.tableNameFor(prefix, sf)) + "/commits")
    assert(dir.isDirectory, s"expected checkpoint commits at $dir")
    dir.list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
  }

  /** Shared growth-layout contract: gb=0 (even base) + gb=1..4 (odd
    * residues 2k−1 mod 8), each vector exactly `rowsPerVec` rows in
    * exactly one growth batch, full corpus covered, all 3 post-crash
    * batches committed once in the shared checkpoint.
    */
  private def auditGrowth(loc: String, ckptPrefix: String,
      rowsPerVec: Long): Unit = {
    assert(gbDirs(loc) == (0L to 4L))
    val codes = spark.read.parquet(loc)
      .select(col("gb").cast("long").as("gb"), col("vec_id"))
    val audit = codes.groupBy(col("gb"))
      .agg(count(lit(1)).as("n"), countDistinct(col("vec_id")).as("nd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(audit.map(_._1).toSeq == (0L to 4L))
    audit.foreach { case (gb, n, nd) =>
      assert(n == rowsPerVec * nd,
        s"gb=$gb: $n rows for $nd vectors (expected $rowsPerVec/vec " +
          "— a replayed batch double-applied)")
    }
    // residues partition the id space → distinct counts sum to the corpus
    assert(audit.map(_._3).sum ==
      graft.util.Tables.embeddings(spark, sf).count())
    // membership: gb=0 even ids; gb=k holds ids ≡ 2k−1 (mod 8)
    val misfits = codes.filter(
      when(col("gb") === 0, pmod(col("vec_id"), lit(2)) =!= 0)
        .otherwise(pmod(col("vec_id"), lit(8)) =!= (col("gb") * 2 - 1)))
      .count()
    assert(misfits == 0, s"$misfits rows outside their batch's residue")
    assert(commitsOf(ckptPrefix) == Seq(0L, 1L, 2L, 3L))
  }

  test("q318: crash-replayed PQ growth is exactly-once — 8 code rows/vector, clean gb layout, full corpus") {
    val loc = Clustering.ensurePqGrowRestart(spark, sf)
    auditGrowth(loc, "pq_growrestart_ckpt_", rowsPerVec = 8L)
    // code values live in the codebook range (16 centroids)
    val bad = spark.read.parquet(loc)
      .filter(col("code") < 0 || col("code") >= 16).count()
    assert(bad == 0)
  }

  test("q319: crash-replayed binary growth is exactly-once — one 16-byte code/vector, clean gb layout, full corpus") {
    val loc = Clustering.ensureBinGrowRestart(spark, sf)
    auditGrowth(loc, "bin_growrestart_ckpt_", rowsPerVec = 1L)
  }

  test("q320 multi-table commit: a genuine two-thread race elects one winner and never publishes a torn pair") {
    import spark.implicits._
    val dir = graft.util.TmpDirs.scratch("multi-occ-race")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/manifest"))
    Seq(("g", 1L)).toDF("k", "n").limit(0)
      .write.mode("overwrite").parquet(s"$dir/data/a_0")
    Seq(("g", 1L)).toDF("k", "n").limit(0)
      .write.mode("overwrite").parquet(s"$dir/data/b_0")
    Seq(("data/a_0", "data/b_0")).toDF("a_unit", "b_unit").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/manifest/v0")
    val head = new java.util.concurrent.atomic.AtomicLong(0)
    val ready = new java.util.concurrent.CountDownLatch(2)
    val go = new java.util.concurrent.CountDownLatch(1)
    val wins = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = Seq("a", "b").map { w =>
      new Thread(() => {
        val sA = Seq((w, 1L)).toDF("k", "n")
        val sB = Seq((w, 2L)).toDF("k", "n")
        ready.countDown(); go.await()
        if (graft.ops.Audit.occCommitMulti(spark, dir, head, 0L, sA, sB))
          wins.incrementAndGet()
        ()
      })
    }
    threads.foreach(_.start()); ready.await(); go.countDown()
    threads.foreach(_.join(120000))
    // exactly one winner; the token advanced once
    assert(wins.get() == 1 && head.get() == 1L)
    // the published manifest resolves a COMPLETE pair from ONE writer
    val (a, b) = graft.ops.Audit.readMultiSnapshot(spark, dir, 1L)
    val (ra, rb) = (a.collect(), b.collect())
    assert(ra.length == 1 && rb.length == 1)
    assert(ra(0).getString(0) == rb(0).getString(0),
      s"torn pair published: view from ${ra(0).getString(0)}, " +
        s"replica from ${rb(0).getString(0)}")
    // the loser left no staged manifest and no referenced units beyond
    // its orphans-deleted contract
    val strayM = new java.io.File(dir).list()
      .filter(_.startsWith("manifest_stage_"))
    assert(strayM.isEmpty, s"loser must clean its manifest staging: ${strayM.toSeq}")
    // exactly one winner's unit pair + genesis remain under data/
    val units = new java.io.File(s"$dir/data").list().sorted.toSeq
    assert(units.count(_.startsWith("a_")) == 2 &&
      units.count(_.startsWith("b_")) == 2,
      s"loser's staged units must be deleted: $units")
  }

  test("q321 manifest-routed policy: v1 units byte-untouched, pinned v1 reader exact after v2, v2 resolves compacted units") {
    val root = Clustering.ensureManifestPolicy(spark, sf)
    // every v1 unit file survives the policy run size/mtime-identical
    val v1Snap = Clustering.mpolV1Files.get((spark, root))
    assert(v1Snap != null && v1Snap.nonEmpty)
    val now = Clustering.listDataFiles(java.nio.file.Paths.get(s"$root/data"))
    v1Snap.foreach { case (path, meta) =>
      assert(now.get(path).contains(meta),
        s"v1 unit file changed or vanished under the policy: $path")
    }
    // the pinned v1 reader still sees the full corpus, exactly
    val v1 = Clustering.readManifestSnapshot(spark, root, 1)
    assert(v1.count() == graft.util.Tables.embeddings(spark, sf).count())
    // v2 resolves the compacted units for flagged pgs (c3..c7) and the
    // originals for the rest
    val v2units = spark.read.parquet(s"$root/manifest/v2")
      .collect().map(_.getString(0)).sorted.toSeq
    assert((3 to 7).forall(pg => v2units.contains(s"c$pg")))
    assert((0 to 2).forall(pg =>
      (0 to pg).forall(j => v2units.contains(s"u${pg}_$j"))))
    assert(!v2units.exists(u => u.startsWith("u3_") || u.startsWith("u7_")))
    // both snapshots hold identical logical contents
    val v2 = Clustering.readManifestSnapshot(spark, root, 2)
    val d1 = v1.select(col("vec_id"), col("lo"), col("hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val d2 = v2.select(col("vec_id"), col("lo"), col("hi")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(d1 == d2, "compaction changed the logical contents")
  }

  test("q322 mid-serve erasure: two triggers on one checkpoint, zero rebuilds, cohort gone from phase 2 only") {
    val out = Clustering.ensureSwgErasure(spark, sf)
    // exactly the two serve triggers, one checkpoint lineage
    assert(new java.io.File(out).list().filter(_.startsWith("batch_id="))
      .map(_.stripPrefix("batch_id=").toLong).sorted.toSeq == Seq(0L, 1L))
    val swgeCommits = {
      val dir = new java.io.File(
        graft.util.TmpDirs.pathFor("swge_ckpt", sf) + "/commits")
      assert(dir.isDirectory, s"expected checkpoint commits at $dir")
      dir.list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
    }
    assert(swgeCommits == Seq(0L, 1L))
    // the serve runs cost zero index builds (recorded by the fixture)
    assert(Clustering.swgeServeBuilds.get((spark, sf)) == 0)
    // phase 2 serves no cohort member; phase 1 ran against the full
    // table (its query set is the pre-tombstone chunk)
    val rows = Clustering.swgErasureServe(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    assert(rows.nonEmpty)
    val phase2 = rows.filter(_._1 == 2L)
    assert(phase2.nonEmpty)
    assert(phase2.count(_._3 % 97 == 0) == 0,
      "phase-2 serving leaked a tombstoned vector")
    // query sets match the chunk split exactly
    assert(rows.filter(_._1 == 1L).forall(_._2 % 200 == 7))
    assert(phase2.forall(_._2 % 200 == 107))
    // no query id collides with the cohort (the oracle's kept-side
    // query filter must be vacuous — verified, not assumed)
    assert(rows.forall(_._2 % 97 != 0))
  }

  test("q318/q319 probes replay-stable: repeated calls serve identical rows with no re-run of the growth drive") {
    val p1 = Clustering.pqGrowRestart(spark, sf).collect().toSeq
    val p2 = Clustering.pqGrowRestart(spark, sf).collect().toSeq
    assert(p1.nonEmpty && p1 == p2)
    val b1 = Clustering.binaryGrowRestart(spark, sf).collect().toSeq
    val b2 = Clustering.binaryGrowRestart(spark, sf).collect().toSeq
    assert(b1.nonEmpty && b1 == b2)
  }
}
