package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Audit, Clustering, GraphAnn}

/** Round-13 physical/structural invariants behind the q334-q337 gates
  * and the BuildCost accounting fix: the manifest-routed fold's reader
  * isolation (v1 units byte-pinned, clean units SHARED by name across
  * manifests), the atomic index-erasure commit's immutable history,
  * the no-drift controls' quiet triggers, and the ledger's self-time
  * discipline under nesting. Build-dependent assertions read
  * runner-recorded facts (the r11 order-robust rule).
  */
class Round13OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q334 manifest fold: v1 units byte-pinned, flagged layers get NEW units, clean units shared") {
    val (root, dec) = GraphAnn.ensureHnswFoldManifest(spark, sf)
    val rows = spark.read.parquet(dec).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .sortBy(_._1)
    val flagged = rows.filter(_._2).map(_._1).toSet
    assert(flagged == Set(0L, 1L), s"flag set $flagged")
    rows.foreach { r =>
      assert(r._3, s"layer ${r._1}: post-fold ghost edges remain")
      assert(r._4, s"layer ${r._1}: fold edge/degree contract broken")
      assert(r._5, s"layer ${r._1}: pinned v1 reader count moved")
      assert(r._6, s"layer ${r._1}: v2 != in-place fold")
    }
    // reader isolation is PHYSICAL: every v1 unit file survives the
    // fold size/mtime-identical (the fold wrote only NEW f* units)
    val v1Files = GraphAnn.mfoldV1Files.get((spark, sf))
    assert(v1Files != null && v1Files.nonEmpty)
    val now = Clustering.listDataFiles(
      java.nio.file.Paths.get(s"$root/data"))
    v1Files.foreach { case (p, meta) =>
      assert(now.get(p).contains(meta), s"v1 unit file touched: $p")
    }
    // unit sharing: clean layers appear in BOTH manifests under the
    // SAME unit name; flagged layers point at f* units only in v2
    val manifests = GraphAnn.mfoldManifests.get((spark, sf))
    assert(manifests != null)
    val (v1, v2) = (manifests(1L), manifests(2L))
    assert(v1.keySet == v2.keySet)
    v1.keySet.foreach { l =>
      if (flagged.contains(l)) {
        assert(v1(l) == s"u$l" && v2(l) == s"f$l",
          s"flagged layer $l units: ${v1(l)} -> ${v2(l)}")
      } else assert(v1(l) == v2(l),
        s"clean layer $l must share its unit: ${v1(l)} vs ${v2(l)}")
    }
  }

  test("q335 erasure commit: exactly two manifest versions, v0 readable in full, cohort gone from the committed index") {
    val (root, head) = Clustering.ensureIvfErasureCommit(spark, sf)
    assert(head == 1L)
    val versions = Option(new java.io.File(s"$root/manifest").list())
      .getOrElse(Array.empty[String]).toSet
    assert(versions == Set("v0", "v1"), s"manifest versions: $versions")
    val n = graft.util.Tables.embeddings(spark, sf).count()
    val cohort = Clustering.erasedVecIds(spark, sf)
    val nCohort = cohort.count()
    assert(nCohort > 0)
    // pre-erasure history stays readable in full (immutable units)
    val v0 = Audit.readNSnapshot(spark, root, 0L)
    assert(v0("corpus").count() == n && v0("index").count() == n)
    // the committed index serves ZERO cohort rows — measured off the
    // manifest-resolved read, independent of the gate's totals
    val v1 = Audit.readNSnapshot(spark, root, 1L)
    val leaked = v1("index").join(broadcast(cohort),
      col("vec_id") === col("k"), "left_semi").count()
    assert(leaked == 0L, s"$leaked cohort rows served post-commit")
    assert(v1("index").count() == n - nCohort)
  }

  test("q336 controls: every family's no-drift trigger is quiet") {
    val rows = Clustering.stalenessControls(spark, sf).collect()
      .map(r => (r.getString(0), r.getBoolean(1))).toMap
    assert(rows.keySet == Set("binary", "ivf", "pq"))
    rows.foreach { case (fam, quiet) =>
      assert(quiet, s"$fam control trigger fired with no drift planted")
    }
  }

  test("q338 gdpr ledger: erasure commit stages zero edge bytes, fold shares clean units, genesis immutable") {
    GraphAnn.ensureHnswGdprLedger(spark, sf) // drive the chain
    val (root, v0Files) = GraphAnn.gdprV0Files.get((spark, sf))
    assert(v0Files.nonEmpty)
    val versions = Option(new java.io.File(s"$root/manifest").list())
      .getOrElse(Array.empty[String]).toSet
    assert(versions == Set("v0", "v1", "v2"), s"manifest versions: $versions")
    val u0 = Audit.manifestUnits(spark, root, 0L)
    val u1 = Audit.manifestUnits(spark, root, 1L)
    val u2 = Audit.manifestUnits(spark, root, 2L)
    assert(u0.keySet == u1.keySet && u1.keySet == u2.keySet)
    val edgeKeys = u0.keySet.filter(_.startsWith("edge_l"))
    assert(edgeKeys.nonEmpty)
    // v1 (the erasure): EVERY edge unit re-listed by name — the MoR
    // zero-graph-write promise as a manifest fact
    edgeKeys.foreach(k => assert(u1(k) == u0(k),
      s"erasure commit rewrote edge unit $k: ${u0(k)} -> ${u1(k)}"))
    assert(u1("corpus") != u0("corpus") && u1("tomb") != u0("tomb"))
    // v2 (the fold): the corpus unit re-listed, at least one edge unit
    // folded fresh and at least one shared with v1
    assert(u2("corpus") == u1("corpus"))
    assert(edgeKeys.exists(k => u2(k) != u1(k)), "no layer folded")
    assert(edgeKeys.exists(k => u2(k) == u1(k)), "no clean unit shared")
    // genesis files byte-identical after BOTH commits (immutable units)
    val now = Clustering.listDataFiles(
      java.nio.file.Paths.get(s"$root/data"))
    v0Files.foreach { case (p, meta) =>
      assert(now.get(p).contains(meta), s"genesis unit file touched: $p")
    }
  }

  test("q339 serve across fold: batch 1 pins v1 with v2 on disk, batch 2 picks up the fold") {
    val rows = GraphAnn.ensureHnswStreamFold(spark, sf)
    assert(rows.map(r => (r._1, r._2)) == Seq((0L, 1L), (1L, 1L), (2L, 2L)),
      s"batch->version map: $rows")
    // batch 0 served BEFORE the publish, batches 1-2 with v2 on disk —
    // and batch 1 still equals v1's reference (byte isolation)
    assert(rows.map(_._3) == Seq(false, true, true), s"fold_on_disk: $rows")
    rows.foreach { r =>
      assert(r._4, s"batch ${r._1} diverged from its pinned reference")
      assert(r._5, s"batch ${r._1} self-probe state wrong for v${r._2}")
    }
  }

  test("q341 serve restart: the replayed batch re-serves its pinned version, not the advanced head") {
    val rows = GraphAnn.ensureHnswServeRestart(spark, sf)
    // batch 1 replays AFTER the fold published (head=2) yet serves v1
    assert(rows.map(r => (r._1, r._2, r._3)) ==
      Seq((0L, 1L, false), (1L, 1L, true), (2L, 2L, false)),
      s"batch ledger: $rows")
    rows.foreach { r =>
      assert(r._4, s"batch ${r._1} diverged from its pinned reference")
      assert(r._5, s"batch ${r._1} replay not row-identical")
      assert(r._6, s"batch ${r._1} self-probe state wrong for v${r._2}")
    }
  }

  test("q342 bucketed snapshot: clean layers have NO ever=2 partition dir (shared, zero duplicate bytes)") {
    val (name, flagged, shuffleFree) = GraphAnn.ensureGdprBucketed(spark, sf)
    assert(shuffleFree, "hop join must carry only the beam-side Exchange")
    assert(flagged == Set(0, 1), s"manifest-derived flag set: $flagged")
    // the physical claim behind clean_layers_shared: the table holds
    // ever=2 dirs ONLY for flagged layers — a clean layer's snapshot
    // read prunes straight to its shared ever=1 partition
    val loc = new java.net.URI(spark.sql(s"DESCRIBE FORMATTED $name")
      .filter(col("col_name") === "Location")
      .select(col("data_type")).collect()(0).getString(0)).getPath
    val ever2 = Option(new java.io.File(s"$loc/ever=2").list())
      .getOrElse(Array.empty[String])
      .filter(_.startsWith("layer=")).map(_.stripPrefix("layer=").toInt).toSet
    assert(ever2 == flagged, s"ever=2 partitions: $ever2 vs flagged $flagged")
  }

  test("q340 gc: sweep never touches the SOURCE chain's bytes (hardlink isolation)") {
    // run the GC first, then prove the source chain — which other
    // gates and the q339 stream still mount — is byte-identical
    val (kept, swept, flags) = GraphAnn.ensureGdprGc(spark, sf)
    assert(swept == 5L, s"swept $swept")
    assert(kept >= 5L, s"kept $kept")
    flags.zip(Seq("expired_versions_unreadable", "head_serve_identical",
      "cohort_bytes_present_pre_gc", "cohort_bytes_gone_post_gc"))
      .foreach { case (f, nm) => assert(f, nm) }
    val (srcRoot, v0Files) = GraphAnn.gdprV0Files.get((spark, sf))
    val now = Clustering.listDataFiles(
      java.nio.file.Paths.get(s"$srcRoot/data"))
    v0Files.foreach { case (p, meta) =>
      assert(now.get(p).contains(meta), s"GC reached the source: $p")
    }
    // all three source manifests still present (expiry ran on the clone)
    val versions = Option(new java.io.File(s"$srcRoot/manifest").list())
      .getOrElse(Array.empty[String]).toSet
    assert(versions == Set("v0", "v1", "v2"), s"source manifests: $versions")
  }

  test("occCommitNShared: a losing writer cleans only its fresh units, never a shared one") {
    val s = spark
    import s.implicits._
    val dir = graft.util.TmpDirs.scratch("occ_shared_loser")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/manifest"))
    spark.range(5).toDF("n").write.parquet(s"$dir/data/base_0")
    Seq(("a", "data/base_0")).toDF("tbl", "unit").coalesce(1)
      .write.parquet(s"$dir/manifest/v0")
    val head = new java.util.concurrent.atomic.AtomicLong(0)
    // expected=7 ≠ head=0: the optimistic check fails AFTER staging
    val won = Audit.occCommitNShared(spark, dir, head, 7L, Seq(
      "a" -> Left("data/base_0"),
      "b" -> Right(spark.range(3).toDF("n"))))
    assert(!won && head.get() == 0L)
    // the shared unit survives the loser; the fresh orphan is gone
    assert(java.nio.file.Files.isDirectory(
      java.nio.file.Paths.get(s"$dir/data/base_0")))
    val dataDirs = Option(new java.io.File(s"$dir/data").list())
      .getOrElse(Array.empty[String]).toSet
    assert(dataDirs == Set("base_0"), s"orphans left: $dataDirs")
    val manifests = Option(new java.io.File(s"$dir/manifest").list())
      .getOrElse(Array.empty[String]).toSet
    assert(manifests == Set("v0"), s"manifests: $manifests")
  }

  test("occCommitNShared race: two sharing writers, one winner, the shared unit survives both") {
    val s = spark
    import s.implicits._
    val dir = graft.util.TmpDirs.scratch("occ_shared_race")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(s"$dir/manifest"))
    spark.range(7).toDF("n").write.parquet(s"$dir/data/base_0")
    Seq(("a", "data/base_0")).toDF("tbl", "unit").coalesce(1)
      .write.parquet(s"$dir/manifest/v0")
    val head = new java.util.concurrent.atomic.AtomicLong(0)
    val results = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()
    val ts = Seq("w1", "w2").map { w =>
      new Thread(() => {
        val won = Audit.occCommitNShared(spark, dir, head, 0L, Seq(
          "a" -> Left("data/base_0"),
          "b" -> Right(spark.range(4).toDF("n"))))
        results.put(w, won)
      })
    }
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(Seq("w1", "w2").count(results.get(_)) == 1, results.toString)
    assert(head.get() == 1L)
    val u1 = Audit.manifestUnits(spark, dir, 1L)
    assert(u1("a") == "data/base_0", s"winner must re-list the shared unit: $u1")
    // the shared unit survived both writers; the winner's fresh unit is
    // readable; the loser's orphan is gone — data/ holds exactly two
    assert(spark.read.parquet(s"$dir/data/base_0").count() == 7L)
    assert(spark.read.parquet(s"$dir/${u1("b")}").count() == 4L)
    val dataDirs = Option(new java.io.File(s"$dir/data").list())
      .getOrElse(Array.empty[String]).toSet
    assert(dataDirs == Set("base_0", u1("b").stripPrefix("data/")),
      s"data dirs: $dataDirs")
  }

  test("BuildCost: nested records accumulate self time, not double-counted wall time") {
    graft.util.BuildCost.record("r13_outer") {
      graft.util.BuildCost.record("r13_inner") { Thread.sleep(80) }
      Thread.sleep(40)
    }
    val snap = graft.util.BuildCost.snapshot()
    val inner = snap("r13_inner")
    val outer = snap("r13_outer")
    assert(inner >= 0.07, s"inner self time $inner")
    // the outer label holds ONLY its own 40ms, never inner's 80ms —
    // the r12-advice double-count is structurally gone
    assert(outer >= 0.03 && outer < 0.07,
      s"outer self time $outer must exclude the nested 80ms")
  }

  test("BuildCost.regressions: >=2x over the floor flags, sub-floor and improvements do not") {
    val prior = Map("big" -> 10.0, "small" -> 0.2, "ok" -> 5.0)
    val cur = Map("big" -> 25.0, "small" -> 3.0, "ok" -> 6.0, "new" -> 9.0)
    val w = graft.util.BuildCost.regressions(cur, prior)
    assert(w.size == 1 && w.head.startsWith("big:"), w.mkString("; "))
  }
}
