package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Clustering

/** The persisted-ANN-index lifecycle (q203/q204): build once as a
  * bucketed table, probe many times without recompute.
  */
class AnnIndexSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("IVF probe equals the direct q52 computation and never rebuilds the index") {
    Clustering.ensureIvfIndex(spark, sf)
    val builds = Clustering.indexBuilds.get()
    val probe1 = Clustering.ivfProbe(spark, sf).collect().toSeq
    val probe2 = Clustering.ivfProbe(spark, sf).collect().toSeq
    assert(Clustering.indexBuilds.get() == builds,
      "probes must reuse the persisted index, not rebuild it")
    val direct = Clustering.ivfAnn(spark, sf).collect().toSeq
    assert(probe1.nonEmpty)
    assert(probe1 == direct)
    assert(probe2 == direct)
  }

  test("IVF probe plan reads the bucketed index (pruned) with no assignment stage") {
    Clustering.ensureIvfIndex(spark, sf)
    val plan = Clustering.ivfProbe(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_ivf_cells_"),
      s"probe must scan the persisted index table:\n$plan")
    assert(plan.contains("SelectedBucketsCount"),
      s"the isin probe-cell filter must bucket-prune the index scan:\n$plan")
    assert(!plan.contains("max_by"),
      s"the corpus-wide assignment argmax must NOT run at probe time:\n$plan")
  }

  test("q212 streamed serving equals the batch probe and never rebuilds per batch") {
    Clustering.ensureIvfIndex(spark, sf)
    val builds = Clustering.indexBuilds.get()
    val served = Clustering.streamIvfServe(spark, sf).collect().toSeq
    assert(Clustering.indexBuilds.get() == builds,
      "a micro-batch must probe the persisted index, not rebuild it " +
        "(the memo is session-keyed; the table name is the handle)")
    val batch = Clustering.ivfProbe(spark, sf).collect().toSeq
    assert(served.nonEmpty)
    assert(served == batch)
  }

  test("q215 incrementally-grown index serves identically to a from-scratch build") {
    val incr = Clustering.ivfIncremental(spark, sf).collect().toSeq
    val full = Clustering.ivfProbe(spark, sf).collect().toSeq
    assert(incr.nonEmpty)
    assert(incr == full,
      "append-only maintenance must be indistinguishable from a rebuild")
    // repeated ensures must not re-append (duplicated rows would break
    // the probe) — the memo is the idempotency guard
    val again = Clustering.ivfIncremental(spark, sf).collect().toSeq
    assert(again == full)
  }

  test("PQ probe equals the direct q114 computation and never re-encodes the corpus") {
    Clustering.ensurePqIndex(spark, sf)
    val builds = Clustering.indexBuilds.get()
    val probe1 = Clustering.pqProbe(spark, sf).collect().toSeq
    val probe2 = Clustering.pqProbe(spark, sf).collect().toSeq
    assert(Clustering.indexBuilds.get() == builds,
      "probes must reuse the persisted code table, not re-encode")
    val direct = Clustering.pqAnn(spark, sf).collect().toSeq
    assert(probe1.nonEmpty)
    assert(probe1 == direct)
    assert(probe2 == direct)
  }

  test("q216 incrementally-grown PQ codes serve identically to a from-scratch build") {
    val incr = Clustering.pqIncremental(spark, sf).collect().toSeq
    val full = Clustering.pqProbe(spark, sf).collect().toSeq
    assert(incr.nonEmpty)
    assert(incr == full,
      "append-only code maintenance must be indistinguishable from a rebuild")
    val again = Clustering.pqIncremental(spark, sf).collect().toSeq
    assert(again == full) // memo idempotency: no double-append
  }

  test("q253 binary probe serves from the persisted code table, equal to q239") {
    val fromIndex = Clustering.binaryIndexProbe(spark, sf).collect().toSeq
    val builds = Clustering.indexBuilds.get()
    val fromFloats = graft.ops.Similarity.binaryQuantRecall(spark, sf).collect().toSeq
    assert(fromIndex.nonEmpty)
    assert(fromIndex == fromFloats,
      "the stored 16-byte codes must reproduce the from-floats search exactly")
    // repeat probes reuse the memoized table — no rebuild
    val again = Clustering.binaryIndexProbe(spark, sf)
    val rows2 = again.collect().toSeq
    assert(rows2 == fromFloats)
    assert(Clustering.indexBuilds.get() == builds, "probe must not rebuild")
    // the Hamming ranking subtree reads the code table; the only
    // embeddings access is the 10-query exact-recall EVAL side
    val plan = again.queryExecution.executedPlan.toString
    assert(plan.contains("graft_bin_codes_"),
      s"probe must scan the persisted code table:\n$plan")
  }

  test("PQ probe plan reads the code table; only query subvectors touch the codebook") {
    Clustering.ensurePqIndex(spark, sf)
    val df = Clustering.pqProbe(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft_pq_codes_"),
      s"probe must scan the persisted code table:\n$plan")
    // the corpus-side encode is the min(struct(dist_r, cid)) argmin
    // over every vector's subvector distances — it must NOT appear in
    // the probe plan (only sum/row_number aggregates remain)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("min(struct"),
      s"the corpus encode argmin must NOT run at probe time:\n$optimized")
    assert(!plan.contains("graft_ivf_cells_"), "wrong index")
  }

  test("q257 streamed PQ serving equals the batch COMPOSED probe and never rebuilds per batch") {
    // r16: the serve leg is the composed IVF-PQ probe — pre-build the
    // composed table, then pin that no micro-batch rebuilds anything
    val idx = Clustering.ensureIvfPqIndex(spark, sf)
    val builds = Clustering.indexBuilds.get()
    val served = Clustering.streamPqServe(spark, sf).collect().toSeq
    assert(Clustering.indexBuilds.get() == builds,
      "a micro-batch must probe the persisted composed table, not rebuild it")
    import org.apache.spark.sql.functions.{col, transform}
    val qdf = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 5)
      .select(col("vec_id"), col("embedding").as("qe"),
        transform(col("embedding"), _.cast("double")).as("v"))
    val batch = Clustering.ivfPqProbeForQueries(spark, sf, idx, qdf)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(served.nonEmpty)
    assert(served == batch,
      "streamed composed serving must equal the batch composed probe")
  }

  test("q258 streamed binary serving reuses the persisted composed code table per batch") {
    val idx = Clustering.ensureIvfBinIndex(spark, sf)
    val builds = Clustering.indexBuilds.get()
    val served = Clustering.streamBinaryServe(spark, sf).collect().toSeq
    assert(Clustering.indexBuilds.get() == builds,
      "a micro-batch must rank against the persisted composed table, not rebuild it")
    assert(served.nonEmpty)
    // the streamed ranking equals the batch composed ranking read from
    // the same table (arrival order free)
    import org.apache.spark.sql.functions.col
    val qVecsF = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") < 10).select(col("vec_id"), col("embedding"))
    val qVecs = qVecsF.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    val qCodes = Clustering.signCodesOf(spark, qVecsF)
      .select(col("vec_id").as("query_id"), col("lo").as("qlo"),
        col("hi").as("qhi"))
    val batch = Clustering.ivfBinProbeForQueries(spark, sf, idx, qVecs,
        qCodes)
      .orderBy(col("query_id"), col("rank")).collect().toSeq
    assert(served == batch)
  }

  test("q259 staleness audit: distortion trigger fires; recall is the misleading signal") {
    val rows = Clustering.indexStaleness(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("rebuild_trigger") == 1L,
        "the planted drift must fire the distortion rebuild trigger")
    }
    // the r13 redesign's teaching fact, pinned so nobody reverts the
    // trigger to recall: under the +10 model-version drift the STALE
    // index serves drifted queries at recall 1.0 — the whole clump
    // crams into the frozen cells nprobe=2 covers — while the
    // refreshed rebuild spreads the clump and scores LOWER at this
    // nprobe. Recall would price the rebuild backwards; distortion
    // (and the cell imbalance below) prices it right.
    val grown = rows.map(_.getAs[Long]("hits_grown")).sum
    val rebuilt = rows.map(_.getAs[Long]("hits_rebuilt")).sum
    assert(grown == 3L * rows.length,
      "stale index must serve the clumped drift at recall 1.0")
    assert(rebuilt < grown,
      "refreshed recall must sit BELOW stale at nprobe=2 — the reason " +
        "recall cannot be the trigger")
    // the serving-cost witness: the frozen assignment crams the
    // arrived half into one cell (per-probe cost O(clump) — the real
    // production reason to rebuild); the refreshed one re-balances
    val (grownT, rebuiltT) = Clustering.ensureDriftIndexes(spark, sf)
    def maxCellShare(t: String): Double = {
      val counts = spark.table(t).groupBy("cell").count()
        .collect().map(_.getAs[Long]("count"))
      counts.max.toDouble / counts.sum
    }
    assert(maxCellShare(grownT) >= 0.4,
      "frozen centroids must cram the drifted half into one cell")
    assert(maxCellShare(rebuiltT) <= 0.25,
      "refreshed centroids must re-balance the cells")
    // the audit serves from the two persisted tables; re-running must
    // not rebuild either
    val builds = Clustering.indexBuilds.get()
    val again = Clustering.indexStaleness(spark, sf).collect()
    assert(Clustering.indexBuilds.get() == builds)
    assert(again.map(_.toString).toSeq == rows.map(_.toString).toSeq)
  }

  test("q254-q256 erasure sweep rewrites ONLY affected partitions and equals a rebuild") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    // build fresh (bypassing the memo) so we can snapshot files
    // between build and sweep
    val tables @ (ivf, pq, bin) = Clustering.buildEraseIndexes(spark, sf)
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(erased.nonEmpty)
    // expected affected partitions, read from the PRE-sweep tables
    def affectedOf(table: String, partCol: String): Set[Long] =
      spark.table(table).filter(col("vec_id").isin(erased.toSeq: _*))
        .select(col(partCol)).distinct().collect().map(_.getLong(0)).toSet
    val affected = Map(
      ivf -> affectedOf(ivf, "cell"),
      pq -> affectedOf(pq, "pg"),
      bin -> affectedOf(bin, "pg"))
    def snapshot(table: String): Map[String, (Long, Long)] = {
      val loc = Clustering.tableLocation(spark, table)
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (loc.relativize(p).toString,
          (java.nio.file.Files.getLastModifiedTime(p).toMillis,
            java.nio.file.Files.size(p))))
        .toMap
    }
    val before = tables.productIterator.map(_.toString)
      .map(t => t -> snapshot(t)).toMap
    val rewrittenBefore = Clustering.sweepPartitionsRewritten.get()

    Clustering.sweepEraseIndexes(spark, sf, tables)

    // 1. partition selectivity: the sweep rewrote exactly the affected
    //    partitions, and at least one partition per family was spared
    assert(Clustering.sweepPartitionsRewritten.get() - rewrittenBefore ==
      affected.values.map(_.size).sum)
    for ((table, parts) <- affected) {
      val partCol = if (table == ivf) "cell" else "pg"
      val all = spark.table(table).select(col(partCol)).distinct()
        .collect().map(_.getLong(0)).toSet
      assert((all -- parts).nonEmpty,
        s"$table: cohort hit every partition — selectivity not demonstrated")
      val after = snapshot(table)
      for ((path, meta) <- before(table)) {
        val clean = !parts.exists(pv => path.startsWith(s"$partCol=$pv/"))
        if (clean && path.endsWith(".parquet"))
          assert(after.get(path).contains(meta),
            s"$table: clean partition file $path was touched by the sweep")
      }
    }
    // 2. zero erased ids anywhere: in the swept tables and in every
    //    family's served probe results
    for (table <- Seq(ivf, pq, bin))
      assert(spark.table(table)
        .filter(col("vec_id").isin(erased.toSeq: _*)).count() == 0,
        s"$table still serves erased vectors")
    val probeNeighbors =
      Clustering.ivfErasureProbe(spark, sf).select(col("neighbor_id")).collect() ++
        Clustering.pqErasureProbe(spark, sf).select(col("neighbor_id")).collect() ++
        Clustering.binaryErasureProbe(spark, sf).select(col("neighbor_id")).collect()
    assert(probeNeighbors.nonEmpty)
    assert(!probeNeighbors.exists(r => erased.contains(r.getLong(0))),
      "an erased vector was served from a swept index")
    // 3. swept index == index rebuilt from the swept corpus under the
    //    same frozen model, row for row, per family
    val (rIvf, rPq, rBin) = Clustering.rebuiltSweptContents(spark, sf)
    assert(spark.table(ivf).select("vec_id", "cell").collect().toSet ==
      rIvf.collect().toSet)
    assert(spark.table(pq).select("vec_id", "m", "code").collect().toSet ==
      rPq.collect().toSet)
    assert(spark.table(bin).select("vec_id", "lo", "hi").collect().toSet ==
      rBin.collect().toSet)
  }

  test("q272: build → grow → erase → compact chain on ONE table, builds once, streamed == batch") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    def snapshot(table: String): Map[String, (Long, Long)] = {
      val loc = Clustering.tableLocation(spark, table)
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (loc.relativize(p).toString,
          (java.nio.file.Files.getLastModifiedTime(p).toMillis,
            java.nio.file.Files.size(p))))
        .toMap
    }
    // stepwise on a spec-owned table name for the file-level claims
    val name = "graft_ivf_life_spec"
    Clustering.lifecycleBaseBuild(spark, sf, name)
    Clustering.lifecycleGrow(spark, sf, name)
    val total = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(spark.table(name).count() == total,
      "after grow the one table must index the FULL corpus")
    val afterGrow = snapshot(name)
    val swept = Clustering.lifecycleErase(spark, sf, name)
    assert(swept.nonEmpty)
    Clustering.compactPartitionsInPlace(spark, name, "cell", swept.toSeq)
    val afterCompact = snapshot(name)
    // clean partitions byte-for-byte untouched through erase AND compact
    val allCells = spark.table(name).select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    assert((allCells -- swept).nonEmpty, "cohort hit every cell — no selectivity")
    for ((path, meta) <- afterGrow) {
      val clean = !swept.exists(pv => path.startsWith(s"cell=$pv/"))
      if (clean && path.endsWith(".parquet"))
        assert(afterCompact.get(path).contains(meta),
          s"clean partition file $path was touched by erase/compact")
    }
    // every swept cell directory compacted to exactly ONE data file
    for (pv <- swept) {
      val files = afterCompact.keys
        .filter(p => p.startsWith(s"cell=$pv/") && p.endsWith(".parquet"))
      assert(files.size == 1,
        s"cell=$pv holds ${files.size} data files after compaction")
    }
    // contents == rebuilt from (base ∪ appended) \ erased, frozen model
    val (rIvf, _, _) = Clustering.rebuiltSweptContents(spark, sf)
    assert(spark.table(name).select("vec_id", "cell").collect().toSet ==
      rIvf.collect().toSet)
    // the canonical memoized chain: exactly ONE build across all four
    // verbs, and the streamed serve neither rebuilds nor diverges
    val b0 = Clustering.indexBuilds.get()
    val batch = Clustering.ivfLifecycleProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(Clustering.indexBuilds.get() - b0 == 1,
      "the chain must count as exactly one index build")
    assert(batch.nonEmpty)
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(!batch.exists(t => erased.contains(t._3)),
      "an erased vector was served from the lifecycle table")
    val streamed = Clustering.streamLifecycleServe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(Clustering.indexBuilds.get() - b0 == 1,
      "streamed serving must reuse the chained table, not rebuild")
    assert(streamed.toSeq == batch.toSeq)
  }

  test("q273: DV delete writes O(cohort) bytes touching no index file; fold-in repays the debt") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    def snapshot(table: String): Map[String, (Long, Long)] = {
      val loc = Clustering.tableLocation(spark, table)
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (loc.relativize(p).toString,
          (java.nio.file.Files.getLastModifiedTime(p).toMillis,
            java.nio.file.Files.size(p))))
        .toMap
    }
    val (ivf, dv) = Clustering.ensureDvIvf(spark, sf)
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(erased.nonEmpty)
    // --- the amplification trade, measured -------------------------
    // light delete: total bytes of the tombstone table
    val dvBytes = snapshot(dv).values.map(_._2).sum
    // heavy delete: the bytes the q254 CoW sweep must rewrite — the
    // affected partitions' data files in the SAME index layout
    val affected = spark.table(ivf)
      .filter(col("vec_id").isin(erased.toSeq: _*))
      .select(col("cell")).distinct().collect().map(_.getLong(0)).toSet
    val ivfSnap = snapshot(ivf)
    val cowBytes = ivfSnap.collect {
      case (path, (_, sz))
          if affected.exists(pv => path.startsWith(s"cell=$pv/")) &&
            path.endsWith(".parquet") => sz
    }.sum
    assert(dvBytes > 0 && cowBytes > dvBytes,
      s"DV delete ($dvBytes B) must be lighter than the CoW rewrite ($cowBytes B)")
    // the light delete touched ZERO index files: serve the probe, then
    // re-snapshot — the index table must be byte-for-byte unchanged
    val dvServed = Clustering.ivfDvProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dvServed.nonEmpty)
    assert(!dvServed.exists(t => erased.contains(t._3)),
      "a tombstoned vector was served through the MoR view")
    assert(snapshot(ivf) == ivfSnap, "the DV delete touched an index file")
    // DV-served == CoW-swept (q254) — the two delete paths agree
    val cowServed = Clustering.ivfErasureProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(dvServed.toSeq == cowServed.toSeq)
    // --- fold-in: physical rows gone, tombstones drained, serving
    // unchanged, swept dirs compacted to one file ------------------
    val swept = Clustering.dvFoldIn(spark, sf, ivf, dv)
    assert(swept.toSet == affected)
    assert(spark.table(ivf)
      .filter(col("vec_id").isin(erased.toSeq: _*)).count() == 0,
      "fold-in left physically deleted rows behind")
    assert(spark.table(dv).count() == 0, "fold-in must drain the tombstones")
    for (pv <- swept) {
      val files = snapshot(ivf).keys
        .filter(p => p.startsWith(s"cell=$pv/") && p.endsWith(".parquet"))
      assert(files.size == 1, s"cell=$pv not compacted at fold-in")
    }
    val postFold = Clustering.ivfDvProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(postFold.toSeq == dvServed.toSeq,
      "fold-in changed what the index serves")
  }

  test("q283/q284: code-table lifecycles chain on one table, build once, equal the rebuilt contents") {
    import org.apache.spark.sql.functions.col
    val b0 = Clustering.indexBuilds.get()
    val pqTable = Clustering.ensureLifecyclePq(spark, sf)
    assert(Clustering.indexBuilds.get() - b0 == 1,
      "the PQ chain must count as exactly one build")
    val binTable = Clustering.ensureLifecycleBin(spark, sf)
    assert(Clustering.indexBuilds.get() - b0 == 2,
      "the binary chain must count as exactly one build")
    // contents == rebuilt from (base ∪ appended) \ erased, frozen model
    val (_, rPq, rBin) = Clustering.rebuiltSweptContents(spark, sf)
    assert(spark.table(pqTable).select("vec_id", "m", "code")
      .collect().toSet == rPq.collect().toSet)
    assert(spark.table(binTable).select("vec_id", "lo", "hi")
      .collect().toSet == rBin.collect().toSet)
    // probing the chained tables is indistinguishable from the CoW
    // sweep probes (the gate proves == rebuild; this pins == q255/q256)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq
    assert(rows(Clustering.pqLifecycleProbe(spark, sf)) ==
      rows(Clustering.pqErasureProbe(spark, sf)))
    assert(rows(Clustering.binaryLifecycleProbe(spark, sf)) ==
      rows(Clustering.binaryErasureProbe(spark, sf)))
    // erased ids physically gone from both chained tables
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    for (t <- Seq(pqTable, binTable))
      assert(spark.table(t).filter(col("vec_id").isin(erased: _*)).count() == 0)
  }

  test("q286: grow → light delete → fold-in on one table; the tombstone serve touches no file") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    def snapshot(table: String): Map[String, (Long, Long)] = {
      val loc = Clustering.tableLocation(spark, table)
      java.nio.file.Files.walk(loc).iterator().asScala
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(p => (loc.relativize(p).toString,
          (java.nio.file.Files.getLastModifiedTime(p).toMillis,
            java.nio.file.Files.size(p))))
        .toMap
    }
    val b0 = Clustering.indexBuilds.get()
    val (ivf, dv) = Clustering.ensureProdLifecycle(spark, sf)
    assert(Clustering.indexBuilds.get() - b0 == 1,
      "build + grow + tombstone must count as exactly one build")
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // MoR state: erased rows still PHYSICALLY present, never served
    assert(spark.table(ivf)
      .filter(col("vec_id").isin(erased.toSeq: _*)).count() > 0,
      "before fold-in the light delete must not have rewritten rows")
    val pre = snapshot(ivf)
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val qs = e.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    def probe() = Clustering.ivfProbeOnCells(spark, sf,
        Clustering.dvMergedCells(spark, ivf, dv), qs)
      .orderBy(col("query_id"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val morServed = probe()
    assert(morServed.nonEmpty &&
      !morServed.exists(t => erased.contains(t._3)))
    assert(snapshot(ivf) == pre, "the MoR serve touched an index file")
    // the maintenance cycle heals the files and drains the tombstones
    val swept = Clustering.dvFoldIn(spark, sf, ivf, dv)
    assert(swept.nonEmpty)
    assert(spark.table(ivf)
      .filter(col("vec_id").isin(erased.toSeq: _*)).count() == 0)
    assert(spark.table(dv).count() == 0)
    assert(probe() == morServed, "fold-in changed what the index serves")
  }

  test("q282 streamed MoR serving equals the batch MoR probe and never rebuilds per batch") {
    val batch = Clustering.ivfDvProbe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(batch.nonEmpty)
    val b0 = Clustering.indexBuilds.get()
    val streamed = Clustering.streamDvServe(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(Clustering.indexBuilds.get() == b0,
      "streamed MoR serving must reuse the built index and tombstones")
    assert(streamed == batch)
  }

  test("q279/q280: MoR serves PQ and binary equal to their CoW sweeps; fold-in works per family") {
    import org.apache.spark.sql.functions.col
    val erased = Clustering.erasedVecIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    // DV-served == CoW-swept for both code families
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect()
        .map(r => (r.getLong(0), r.getInt(1).toLong, r.getLong(2))).toSeq
    val pqDv = rows(Clustering.pqDvProbe(spark, sf))
    val pqCow = rows(Clustering.pqErasureProbe(spark, sf))
    assert(pqDv.nonEmpty && pqDv == pqCow)
    val binDv = rows(Clustering.binaryDvProbe(spark, sf))
    val binCow = rows(Clustering.binaryErasureProbe(spark, sf))
    assert(binDv.nonEmpty && binDv == binCow)
    assert(!(pqDv ++ binDv).exists(t => erased.contains(t._3)))
    // fold-in on the pg-partitioned layout: physical rows gone,
    // tombstones drained, serving unchanged
    val (pq, pqTomb) = Clustering.ensureDvPq(spark, sf)
    val sweptPq = Clustering.dvFoldIn(spark, sf, pq, pqTomb, partCol = "pg")
    assert(sweptPq.nonEmpty)
    assert(spark.table(pq)
      .filter(col("vec_id").isin(erased.toSeq: _*)).count() == 0)
    assert(spark.table(pqTomb).count() == 0)
    assert(rows(Clustering.pqDvProbe(spark, sf)) == pqDv,
      "PQ fold-in changed what the index serves")
  }
}
