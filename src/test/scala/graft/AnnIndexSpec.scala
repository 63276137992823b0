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
}
