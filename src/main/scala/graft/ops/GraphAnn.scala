package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Graph-based ANN — the HNSW-family index (Malkov & Yashunin 2016,
  * arXiv:1603.09320): a LAYERED navigable small-world graph searched
  * by beam descent. This is the fourth index family next to the
  * engine's LSH (q31), IVF (q52/q203) and PQ/binary (q114/q239)
  * indexes, and the one production vector serving reaches for first.
  *
  * The reference has no ANN at all — this family exists for the
  * 100 TB training-data north star, re-expressed Spark-first:
  *
  *  - **Level assignment** is hash-seeded, not random: a vector's top
  *    layer is the number of trailing zero bits of `xxhash64(vec_id)`
  *    (geometric, p = 1/2 — HNSW's `mL` discipline with a
  *    deterministic coin). `maxLevel ≈ log2(n) − 3`, so the TOP layer
  *    holds O(2³) ≈ a constant few dozen nodes at every corpus size —
  *    the property that makes the entry search O(1).
  *  - **Edges** are built by BATCHED SELF-INSERTION (the algorithm's
  *    native construction — see ensureHnsw): an exact seed graph on
  *    the constant-sized top layer, the corpus attached in
  *    deterministic batches via the shared beam descent, one closing
  *    distance-prune to the 2M neighbor cap. (An alternative
  *    shard-local pool construction — top-2 IVF cells, Σ|cell|² pair
  *    work — lives in buildGraphInto and builds q323's base; the
  *    insertion build was adopted for q316 after measuring +0.31
  *    ef8-recall at sf0.1 over it.) Never all-pairs either way.
  *  - **Search** is the beam-descent loop as an iterative DataFrame
  *    computation (the q130/q133 frontier discipline, one
  *    localCheckpoint per hop): enter at the top layer's pinned entry
  *    node, greedy (beam 1) through the upper layers, beam `ef` at
  *    the base layer; every hop is (beam ⋈ edges ⋈ vectors) —
  *    |queries| · ef · M candidate rows per hop, INDEPENDENT of the
  *    corpus size. Edges broadcast at gate scale; at 100 TB the edge
  *    table is bucketed by src and the hop becomes a co-located
  *    equi-join, same plan shape.
  *
  * Approximate by design → the gate is the q31 contract pattern:
  * deterministic recall booleans against DECLARED floors (the search
  * is fully deterministic — hash levels, exact cosine, (cos DESC, id)
  * tie-breaks — so the booleans are stable run to run and the oracle
  * pins the row set + TRUE), with the recall VALUES and their
  * beam-monotonicity pinned by GraphAnnSpec at every fixture sf.
  *
  * Lifecycle parity with the other families: the graph is built ONCE
  * per (session, corpus) — `hnswBuilds` proves probe calls reuse it
  * (AnnIndexSpec discipline) — and persisted as a layer-partitioned
  * parquet table.
  */
object GraphAnn {

  /** Same codegen'd cosine as every other ANN family. */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSimilarity(a, b)

  /** Build counter — lets GraphAnnSpec PROVE the q316/q317 probes
    * share one persisted graph instead of silently rebuilding.
    */
  private[graft] val hnswBuilds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Edges kept per node per layer before symmetrization (HNSW's M).
    * Config swept at build time: M=8 left sf0.1 ef8-recall at 0.43;
    * M=12 buys 0.52-0.96 across sfs at +50% edge rows.
    */
  private val M = 12

  /** Beam hops at the base layer (swept: 3 hops → 0.43-0.72 ef8
    * recall, 5 hops → 0.52-0.96 — the extra two frontier rounds are
    * what closes most of the gap on the near-random fixtures).
    */
  private val BaseHops = 5

  /** Layers whose EXPECTED node count (n / 2^L) is at or below this
    * get exact within-layer k-NN edges instead of cell-confined ones:
    * the work is a bounded constant (≤ ~2·bound² pairs), and the top
    * of the hierarchy needs real long-range navigability — sparse
    * layers scattered over the IVF cells would otherwise have almost
    * no edges at all (measured: exact upper layers lift ef8 recall
    * 0.38 → 0.43 at sf0.1 before the M/hops sweep).
    */
  private val ExactLayerBound = 1024L

  /** Declared recall@5 floors (vs the exact q30-shape top-5) for the
    * probe (q316, ef = 8) and the sweep points (q317). Measured at
    * M=12/hops=5 on the self-insertion build across sf0.001-0.1:
    * ef2 0.17-0.20, ef8 0.83-0.96, ef32 0.94-1.00 — every floor sits
    * ≥1.7× under its worst measurement (the q31 honest-contract
    * discipline; embeddings are near-random, so ANY sublinear
    * candidate scheme trades recall).
    */
  private val ProbeFloor = 0.30
  private val SweepFloors = Seq(2 -> 0.10, 8 -> 0.30, 32 -> 0.50)

  /** Trailing-zero-bit level: the first set bit of the node hash,
    * capped at `maxLevel` — P(level ≥ L) = 2^−L, the HNSW geometric
    * ladder with a deterministic coin.
    */
  private def levelOf(h: Column, maxLevel: Int): Column =
    (0 until maxLevel).foldRight(lit(maxLevel): Column) { (k, els) =>
      when(pmod(shiftright(h, k), lit(2)) === 1, lit(k)).otherwise(els)
    }

  /** maxLevel ≈ log2(n) − 3: top layer holds ~n/2^maxLevel ≈ 8-ish
    * EXPECTED nodes per 2³ — ~60 at the fixture sizes, constant in n.
    */
  private def maxLevelFor(n: Long): Int =
    math.max(2, (63 - java.lang.Long.numberOfLeadingZeros(n)) - 3)

  private val hnswMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, Int, Long)]()
  graft.util.CacheRegistry.registerMemo(hnswMemo)

  /** Build the layered k-NN graph once per (session, corpus): returns
    * (edge-table dir, maxLevel, entry node id). Edge table layout:
    * `layer=L/` partitioned parquet of (src, dst) — a probe at layer L
    * prunes to exactly one partition directory.
    */
  /** Insert batches used by the self-insertion base build. */
  private val BuildBatches = 4

  /** The q316 build, by BATCHED SELF-INSERTION — the algorithm's
    * native construction, adopted after measuring it against the
    * shard-pool build (q323's insert path scored 0.80 ef8-recall at
    * sf0.1 where the pool build scored 0.52: beam-selected neighbors
    * navigate better than cell-confined ones):
    *
    *  1. SEED: the top-layer node set (expected n/2^maxLevel ≈ a
    *     bounded constant) gets an exact k-NN graph on every layer.
    *  2. INSERT: the rest of the corpus attaches in `BuildBatches`
    *     deterministic batches (vec_id mod 4, ascending) — each batch
    *     beam-searches the graph built so far (one descent per batch)
    *     and appends top-M edges per occupied layer, both directions.
    *  3. PRUNE: one final pass re-caps every neighbor list at 2M by
    *     distance (insert-time reverse edges make hub in-degree
    *     unbounded otherwise) — the HNSW neighbor-list cap, applied
    *     once at build close instead of per insert.
    *
    * Scale shape: each insert batch costs |batch|·ef·2M scored rows
    * through the shared descent loop (linear in the batch, never a
    * corpus rescan); the prune is one shuffle over ~n·2M edge rows.
    */
  private[graft] def ensureHnsw(s: SparkSession, d: String): (String, Int, Long) =
    hnswMemo.computeIfAbsent((s, d), _ => {
      val raw = graft.util.TmpDirs.scratchFor("hnsw_raw", d)
      val loc = graft.util.TmpDirs.scratchFor("hnsw_edges", d)
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val n = e.count() // one bounded driver scalar (corpus cardinality)
      val maxLevel = maxLevelFor(n)
      val nodes = e.withColumn("lvl", levelOf(xxhash64(col("vec_id")), maxLevel))
      val seed = nodes.filter(col("lvl") === maxLevel)
      // seed graph: exact k-NN among the top-layer nodes, every layer
      // (bounded: ~(n/2^maxLevel)² pairs per layer)
      val sa = seed.select(col("vec_id").as("src"), col("embedding").as("se"))
      val sb = seed.select(col("vec_id").as("dst"), col("embedding").as("de"))
      val wSrc = Window.partitionBy(col("src"))
        .orderBy(col("cos").desc, col("dst"))
      val seedPairs = sa.crossJoin(broadcast(sb))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"),
          cosine(col("se"), col("de")).as("cos"))
        .withColumn("rn", row_number().over(wSrc))
        .filter(col("rn") <= M)
        .select(col("src"), col("dst"))
      val seedEdges = seedPairs.unionByName(
          seedPairs.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
      (0 to maxLevel).map(layer =>
          seedEdges.select(lit(layer).as("layer"), col("src"), col("dst")))
        .reduce(_ unionByName _)
        .write.mode("overwrite").partitionBy("layer").parquet(raw)
      // entry: the smallest-id seed node (present from step 1, so the
      // descent root exists for every insert batch)
      val entryRow = seed.orderBy(col("vec_id"))
        .select(col("vec_id")).limit(1).collect()(0).getLong(0)
      (0 until BuildBatches).foreach { r =>
        insertBatch(s, d, raw, maxLevel, entryRow,
          nodes.filter(col("lvl") < maxLevel &&
              pmod(col("vec_id"), lit(BuildBatches)) === r)
            .select(col("vec_id"), col("embedding")))
      }
      // final prune: re-cap every (layer, src) list at 2M by distance
      val edges = s.read.parquet(raw)
        .join(e.select(col("vec_id").as("src"), col("embedding").as("se")),
          Seq("src"))
        .join(e.select(col("vec_id").as("dst"), col("embedding").as("de")),
          Seq("dst"))
        .select(col("layer"), col("src"), col("dst"),
          cosine(col("se"), col("de")).as("cos"))
      val wCap = Window.partitionBy(col("layer"), col("src"))
        .orderBy(col("cos").desc, col("dst"))
      edges.withColumn("rn", row_number().over(wCap))
        .filter(col("rn") <= 2 * M)
        .select(col("layer"), col("src"), col("dst"))
        .write.mode("overwrite").partitionBy("layer").parquet(loc)
      hnswBuilds.incrementAndGet()
      (loc, maxLevel, entryRow)
    })

  /** The layered edge construction for an arbitrary (vec_id,
    * embedding) node set — shared by the full q316 build and the
    * q323 base-graph build. Writes `layer=L/` partitioned edges.
    */
  private def buildGraphInto(s: SparkSession, d: String, loc: String,
      vecs: DataFrame, maxLevel: Int): Unit = {
    val n = vecs.count()
    val lvl = levelOf(xxhash64(col("vec_id")), maxLevel)
    val nodes = vecs.withColumn("lvl", lvl)
    // top-2 IVF cells per node = the shard-local candidate pools
    // (frozen q52 centroid table — the FULL-corpus definition,
    // broadcast)
    val cents = embeddings(s, d).filter(col("vec_id") % 50 === 0)
      .select(col("vec_id").as("cent_id"), col("embedding").as("ce"))
    val wCell = Window.partitionBy(col("vec_id"))
      .orderBy(col("cos").desc, col("cent_id"))
    val pools = nodes.crossJoin(broadcast(cents))
      .withColumn("cos", cosine(col("embedding"), col("ce")))
      .withColumn("rn", row_number().over(wCell))
      .filter(col("rn") <= 2)
      .select(col("vec_id"), col("lvl"), col("embedding"),
        col("cent_id").as("cell"))
    // per layer: score candidate pairs, keep top-M per src,
    // symmetrize (degree ≤ 2M). Base/big layers pair shard-locally
    // (top-2 IVF cells); layers whose expected size is a bounded
    // constant pair exactly — the long-range top of the hierarchy.
    val wSrc = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst"))
    def topM(pairs: DataFrame): DataFrame = {
      val kept = pairs
        .withColumn("rn", row_number().over(wSrc))
        .filter(col("rn") <= M)
        .select(col("src"), col("dst"), col("cos"))
      // symmetrize, then RE-PRUNE to 2M per node: in-degree after a
      // plain union is unbounded (hub nodes get chosen by many
      // peers), and HNSW's neighbor lists are distance-pruned to a
      // hard cap — that cap is what bounds per-hop fan-out (and
      // per-node state at 100 TB)
      kept.unionByName(
          kept.select(col("dst").as("src"), col("src").as("dst"),
            col("cos")))
        .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
        .withColumn("rn", row_number().over(wSrc))
        .filter(col("rn") <= 2 * M)
        .select(col("src"), col("dst"))
    }
    val edges = (0 to maxLevel).map { layer =>
      val pairs =
        if (layer > 0 && (n >> layer) <= ExactLayerBound) {
          val m = nodes.filter(col("lvl") >= layer)
          val a = m.select(col("vec_id").as("src"), col("embedding").as("se"))
          val b = m.select(col("vec_id").as("dst"), col("embedding").as("de"))
          // bounded constant: ≤ ~2·ExactLayerBound² scored pairs
          a.crossJoin(broadcast(b))
            .filter(col("src") =!= col("dst"))
            .select(col("src"), col("dst"),
              cosine(col("se"), col("de")).as("cos"))
        } else {
          val members = pools.filter(col("lvl") >= layer)
          val a = members.select(col("cell"), col("vec_id").as("src"),
            col("embedding").as("se"))
          val b = members.select(col("cell"), col("vec_id").as("dst"),
            col("embedding").as("de"))
          a.join(b, Seq("cell"))
            .filter(col("src") =!= col("dst"))
            .select(col("src"), col("dst"),
              cosine(col("se"), col("de")).as("cos"))
            // a node in both pools of a peer yields the pair twice
            .groupBy(col("src"), col("dst")).agg(max(col("cos")).as("cos"))
        }
      topM(pairs).select(lit(layer).as("layer"), col("src"), col("dst"))
    }.reduce(_ unionByName _)
    edges.write.mode("overwrite").partitionBy("layer").parquet(loc)
  }

  /** Beam descent over the persisted graph for query relation
    * (query_id, qe), for EVERY beam width in `efs` in ONE loop: the
    * beam key is (query_id, ef), upper layers run greedy (width 1),
    * the base layer keeps top-`ef` per key — so the whole sweep costs
    * one descent, not |efs|. Returns the final beams
    * (ef, query_id, vec_id, cos). Every hop localCheckpoints the beam
    * — the q130 lineage rule.
    */
  private[graft] def beamSweep(s: SparkSession, d: String, qs: DataFrame,
      efs: Seq[Int]): DataFrame = {
    val (loc, maxLevel, entry) = ensureHnsw(s, d)
    beamSweepOn(s, d, loc, maxLevel, entry, qs, efs)
  }

  /** The descent against an ARBITRARY persisted graph handle — the
    * seam the q323 incremental-growth inserts and the q324
    * tombstone-aware probe share with the main q316 path.
    */
  private[graft] def beamSweepOn(s: SparkSession, d: String, loc: String,
      maxLevel: Int, entry: Long, qs: DataFrame,
      efs: Seq[Int], hops: Int = BaseHops,
      edgeFilter: Column = lit(true)): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val qCached = graft.util.CacheRegistry.register(qs.cache())
    def scored(cand: DataFrame): DataFrame =
      cand.join(e, Seq("vec_id"))
        .join(qCached, Seq("query_id"))
        .select(col("ef"), col("query_id"), col("vec_id"),
          cosine(col("qe"), col("embedding")).as("cos"))
    var beam = scored(qCached.select(col("query_id"))
        .withColumn("ef", explode(array(efs.map(x => lit(x.toLong)): _*)))
        .withColumn("vec_id", lit(entry)))
      .localCheckpoint()
    val wBeam = Window.partitionBy(col("ef"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    def step(layer: Int, base: Boolean): Unit = {
      // edge scan prunes to the one layer=L partition directory;
      // broadcast is gate-scale — at 100 TB the edge table is bucketed
      // by src and this hop is a co-located equi-join instead
      val edges = s.read.parquet(loc)
        .filter(edgeFilter && col("layer") === layer)
        .select(col("src"), col("dst"))
      val expanded = beam.join(broadcast(edges),
          beam("vec_id") === edges("src"))
        .select(col("ef"), col("query_id"), col("dst").as("vec_id"))
      val cands = scored(expanded).unionByName(beam)
        .groupBy(col("ef"), col("query_id"), col("vec_id"))
        .agg(max(col("cos")).as("cos"))
      beam = cands.withColumn("rn", row_number().over(wBeam))
        .filter(if (base) col("rn") <= col("ef") else col("rn") <= 1)
        .select(col("ef"), col("query_id"), col("vec_id"), col("cos"))
        .localCheckpoint()
    }
    (maxLevel to 1 by -1).foreach(layer => step(layer, base = false))
    (1 to hops).foreach(_ => step(0, base = true))
    beam
  }

  /** The fixed evaluation query set (the q241 convention) and its
    * exact top-5 baseline (the q30 shape: broadcast queries × corpus,
    * (cos DESC, id) ranks, self excluded).
    */
  private def evalQueries(s: SparkSession, d: String): DataFrame =
    embeddings(s, d).filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))

  private def exactTop5(s: SparkSession, d: String, qs: DataFrame): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    broadcast(qs).join(e, col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("vec_id"))
  }

  /** Top-5 answer per (ef, query) from a final sweep beam, self
    * excluded.
    */
  private[graft] def beamTop5(beam: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("ef"), col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    beam.filter(col("vec_id") =!= col("query_id"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("ef"), col("query_id"), col("vec_id"))
  }

  private val recallMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Map[Int, Double]]()
  graft.util.CacheRegistry.registerMemo(recallMemo)

  /** Corpus-level recall@5 per sweep ef, computed from ONE shared
    * beam descent (the whole sweep is one loop) and memoized — q316
    * and q317 together cost one build + one search.
    */
  private[graft] def recalls(s: SparkSession, d: String): Map[Int, Double] =
    recallMemo.computeIfAbsent((s, d), _ => {
      val qs = evalQueries(s, d)
      val ann = beamTop5(beamSweep(s, d, qs, SweepFloors.map(_._1)))
      // per-ef totals: the exact baseline replicated per sweep point
      val exact = exactTop5(s, d, qs).withColumn("ef",
        explode(array(SweepFloors.map(x => lit(x._1.toLong)): _*)))
      val rows = exact
        .join(ann.withColumn("m", lit(1)), Seq("ef", "query_id", "vec_id"),
          "left")
        .groupBy(col("ef"))
        .agg(sum(coalesce(col("m"), lit(0))).as("hits"),
          count(lit(1)).as("n"))
        .collect() // |efs| control rows
      rows.map(r => r.getLong(0).toInt ->
        r.getLong(1).toDouble / r.getLong(2)).toMap
    })

  /** q316: HNSW build + beam probe at ef = 8 — one row per eval query
    * asserting the corpus-level recall@5 meets the declared floor, the
    * q31 deterministic-gate contract. The graph builds once (memoized;
    * GraphAnnSpec pins zero rebuilds across repeated q316/q317 probes).
    */
  def hnswProbe(s: SparkSession, d: String): DataFrame = {
    val met = recalls(s, d)(8) >= ProbeFloor
    embeddings(s, d).select(col("vec_id").as("query_id"))
      .filter(col("query_id") % 100 === 7)
      .select(col("query_id"), lit(met).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  /** q317: the beam-width sweep — recall@5 at ef ∈ {2, 8, 32}, each
    * against its declared floor, plus the monotonicity bit (recall
    * non-decreasing in ef — the tuning-curve contract a deployment
    * reads, the q241 discipline). Graph, descent, and recalls are all
    * shared with q316 through the memos.
    */
  def hnswEfSweep(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val r = recalls(s, d)
    val efs = SweepFloors.map(_._1)
    val rows = SweepFloors.zipWithIndex.map { case ((ef, floor), i) =>
      val gePrev = i == 0 || r(ef) >= r(efs(i - 1))
      (ef.toLong, r(ef) >= floor, gePrev)
    }
    rows.toDF("ef", "recall_floor_met", "ge_prev_ef").orderBy(col("ef"))
  }

  // ---- q323: INCREMENTAL GROWTH of the layered graph ----------------
  //
  // The lifecycle verb the other three families already carry
  // (q215/q216 batch growth): new vectors attach WITHOUT a rebuild.
  // The insert is the real HNSW algorithm's shape, batched: each new
  // vector beam-searches the CURRENT graph for its neighborhood (one
  // descent for the whole batch — the q316 loop with the batch as the
  // query relation), then connects to its top-M candidates per layer
  // it occupies, with reverse edges appended so the new node is
  // immediately discoverable. Appends add parquet files under the
  // layer partitions — base files are never rewritten (spec-pinned).
  // The frozen model here is (levels, maxLevel, entry): hash levels
  // need no training, and the base entry stays the descent root — the
  // same frozen-at-creation discipline as the IVF centroids.
  //
  // Degree discipline: appended edges can push a node past 2M until
  // the next compaction (the standard delete/insert debt trade — the
  // q288 fold-in story applied to edge lists); probes are unaffected
  // beyond fan-out, and the spec bounds the actual overshoot.

  /** Beam width used for neighbor selection at insert time (HNSW's
    * efConstruction, > M so the per-layer top-M has real candidates).
    */
  private val EfInsert = 24

  private val grownMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, Int, Long)]()
  graft.util.CacheRegistry.registerMemo(grownMemo)

  /** Base-graph files captured before growth (spec evidence that
    * appends touched nothing).
    */
  private[graft] val grownBaseFiles = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), Map[String, (Long, Long)]]()
  graft.util.CacheRegistry.registerMemo(grownBaseFiles)

  /** Build the base graph on the even half, then insert the odd half
    * in two deterministic batches (residue 1 mod 4, then 3 mod 4) —
    * batch 2 attaches against the graph INCLUDING batch 1, the
    * sequential-insert semantics of the real algorithm at batch
    * granularity.
    */
  private[graft] def ensureHnswGrown(s: SparkSession, d: String)
      : (String, Int, Long) =
    grownMemo.computeIfAbsent((s, d), _ => {
      val loc = graft.util.TmpDirs.scratchFor("hnsw_grown", d)
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val n = base.count()
      val maxLevel = maxLevelFor(n)
      buildGraphInto(s, d, loc, base, maxLevel)
      val entry = base
        .withColumn("lvl", levelOf(xxhash64(col("vec_id")), maxLevel))
        .orderBy(col("lvl").desc, col("vec_id"))
        .select(col("vec_id")).limit(1).collect()(0).getLong(0)
      hnswBuilds.incrementAndGet()
      grownBaseFiles.put((s, d),
        Clustering.listDataFiles(java.nio.file.Paths.get(loc)))
      Seq(1, 3).foreach { r =>
        insertBatch(s, d, loc, maxLevel, entry,
          e.filter(pmod(col("vec_id"), lit(4)) === r))
      }
      (loc, maxLevel, entry)
    })

  /** Attach one batch: beam-search the current graph with the batch
    * as the query relation, connect each new vector to its top-M
    * surviving candidates per layer it occupies (candidate must also
    * live on that layer), append edges both ways. O(batch · ef · 2M)
    * scored rows — never a corpus rescan.
    */
  private def insertBatch(s: SparkSession, d: String, loc: String,
      maxLevel: Int, entry: Long, batch: DataFrame): Unit = {
    val qs = batch.select(col("vec_id").as("query_id"),
      col("embedding").as("qe"))
    // construction descents run the full serve-time hop count:
    // trimming them to 3 was measured to cost 0.10 ef8-recall at
    // sf0.1 for no wall-clock win (the build is one-time + memoized)
    val beam = beamSweepOn(s, d, loc, maxLevel, entry, qs, Seq(EfInsert))
    insertEdgesOf(beam, maxLevel)
      .write.mode("append").partitionBy("layer").parquet(loc)
  }

  /** Top-M per occupied layer + reverse edges, from an insert-descent
    * beam — shared by the batch insert and the q326 crash-safe
    * streaming insert.
    */
  private def insertEdgesOf(beam: DataFrame, maxLevel: Int): DataFrame = {
    val lvlOf = (c: Column) => levelOf(xxhash64(c), maxLevel)
    val cand = beam.filter(col("vec_id") =!= col("query_id"))
      .withColumn("v_lvl", lvlOf(col("query_id")))
      .withColumn("c_lvl", lvlOf(col("vec_id")))
    (0 to maxLevel).map { layer =>
      val wIns = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val kept = cand
        .filter(col("v_lvl") >= layer && col("c_lvl") >= layer)
        .withColumn("rn", row_number().over(wIns))
        .filter(col("rn") <= M)
        .select(col("query_id").as("src"), col("vec_id").as("dst"))
      kept.unionByName(
          kept.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .select(lit(layer).as("layer"), col("src"), col("dst"))
    }.reduce(_ unionByName _)
  }

  /** q323: probe the incrementally-grown graph — the growth must keep
    * the recall contract over the FULL corpus (declared floor, q31
    * gate), with zero rebuilds and base files untouched (spec-pinned).
    * Measured recall@5 at ef=8 on the grown graph: 0.96/0.88/0.80 at
    * sf0.001/0.01/0.1 vs the 0.30 floor — HIGHER than the pool-built
    * base it grew from would score alone at sf0.1 (0.52): beam-search
    * insertion is the real HNSW construction, and that measurement is
    * why q316's full build now uses batched self-insertion too (this
    * fixture keeps the pool-built base deliberately, to pin that
    * growth lifts a weaker base rather than riding a strong one).
    */
  /** Per-(session, sf) memo for the heavyweight eval computations
    * behind the q323-q326 gates (each costs a full descent — ~10
    * frontier rounds): evals are deterministic, so recomputing them
    * per gate call only re-measures Spark job latency (the recallMemo
    * discipline; registered, so Verify/Bench passes clear them).
    */
  private val gateMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, String), Seq[Boolean]]()
  graft.util.CacheRegistry.registerMemo(gateMemo)

  /** Corpus recall@5 of `ann` vs `exact`, one action. */
  private def recallMet(ann: DataFrame, exact: DataFrame): Boolean = {
    val st = exact
      .join(ann.withColumn("m", lit(1)), Seq("query_id", "vec_id"), "left")
      .agg(sum(coalesce(col("m"), lit(0))).as("hits"), count(lit(1)).as("n"))
      .first()
    st.getLong(0).toDouble / st.getLong(1) >= ProbeFloor
  }

  def hnswGrowProbe(s: SparkSession, d: String): DataFrame = {
    val met = gateMemo.computeIfAbsent((s, d, "grow"), _ => {
      val (loc, maxLevel, entry) = ensureHnswGrown(s, d)
      val qs = evalQueries(s, d)
      val ann = beamTop5(beamSweepOn(s, d, loc, maxLevel, entry, qs, Seq(8)))
        .select(col("query_id"), col("vec_id"))
      Seq(recallMet(ann, exactTop5(s, d, qs)))
    }).head
    embeddings(s, d).select(col("vec_id").as("query_id"))
      .filter(col("query_id") % 100 === 7)
      .select(col("query_id"), lit(met).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  // ---- q324: ERASURE on the graph index (merge-on-read) -------------
  //
  // The q282/q322 discipline for the fourth family: a tombstoned
  // vector must stop being SERVED immediately, with zero graph
  // rewrites. Tombstoned nodes stay ROUTABLE (their edges still guide
  // the descent — the ghost-until-compaction trade every graph index
  // makes, because unlinking requires rewriting neighbors' lists) but
  // are filtered from every served answer; fold-in follows the q288
  // policy story when debt accumulates.

  /** q324: the tombstone-aware probe — top-5 per query over the
    * survivors only. Gate: the serve never returns a cohort member
    * AND recall vs the survivor-exact baseline holds the floor; both
    * booleans deterministic, oracle pins row set + TRUE.
    */
  def hnswErasureProbe(s: SparkSession, d: String): DataFrame = {
    val flags = gateMemo.computeIfAbsent((s, d, "erasure"), _ => {
      val qs = evalQueries(s, d)
      val beam = beamSweep(s, d, qs, Seq(8)) // ghosts routable in-beam
      val w = Window.partitionBy(col("ef"), col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val served = beam
        .filter(col("vec_id") =!= col("query_id") &&
          col("vec_id") % 97 =!= 0) // the MoR filter at serve time
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id"))
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
        .filter(col("vec_id") % 97 =!= 0)
      val wx = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("vec_id"))
      val exact = broadcast(qs).join(e, col("vec_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("qe"), col("embedding")))
        .withColumn("rk", row_number().over(wx))
        .filter(col("rk") <= 5)
        .select(col("query_id"), col("vec_id"))
      val leaked = served.filter(col("vec_id") % 97 === 0).count()
      Seq(leaked == 0L, recallMet(served, exact))
    })
    embeddings(s, d).select(col("vec_id").as("query_id"))
      .filter(col("query_id") % 100 === 7)
      .select(col("query_id"), lit(flags(0)).as("no_tombstone_served"),
        lit(flags(1)).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  // ---- q325: STREAMED serving of the graph index --------------------
  //
  // The q212/q257/q258 discipline for the fourth family: probe
  // queries arrive as a stream, each micro-batch runs the beam
  // descent against the persisted graph (ensured ONCE outside the
  // stream — the handle tuple is the cross-session seam, the same
  // reason ivfProbeOn takes a table name), results land in
  // batch-keyed exactly-once dirs. The descent is deterministic, so
  // streamed serving must return EXACTLY the batch answer.

  /** q325: gate rows per eval query — the streamed answer must equal
    * the batch descent row-for-row (deterministic boolean, computed
    * by two-way set difference) and hold the recall floor; oracle
    * pins the row set + TRUE.
    */
  def hnswStreamServe(s: SparkSession, d: String): DataFrame = {
    val flags = gateMemo.computeIfAbsent((s, d, "stream-serve"), _ =>
      hnswStreamServeDrive(s, d))
    embeddings(s, d).select(col("vec_id").as("query_id"))
      .filter(col("query_id") % 100 === 7)
      .select(col("query_id"), lit(flags(0)).as("equals_batch_probe"),
        lit(flags(1)).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  private def hnswStreamServeDrive(s: SparkSession, d: String): Seq[Boolean] = {
    val (loc, maxLevel, entry) = ensureHnsw(s, d) // outside the stream
    val out = graft.util.TmpDirs.scratch("hnsw-stream-serve")
    graft.util.StreamTuning.withShuffle(s, 8) {
      val schema = s.read.parquet(s"$d/embeddings.parquet").schema
      val src = s.readStream.schema(schema).parquet(s"$d/embeddings.parquet*")
        .filter(col("vec_id") % 100 === 7)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      val q = src.writeStream
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, id: Long) =>
          if (!batch.isEmpty) {
            val ss = batch.sparkSession
            beamTop5(beamSweepOn(ss, d, loc, maxLevel, entry, batch, Seq(8)))
              .write.mode("overwrite").parquet(s"$out/batch_id=$id")
          }
        }
        .start()
      q.awaitTermination()
    }
    val served = s.read.parquet(out)
      .select(col("query_id"), col("vec_id"))
    val qs = evalQueries(s, d)
    val batchAns = beamTop5(beamSweepOn(s, d, loc, maxLevel, entry, qs, Seq(8)))
      .select(col("query_id"), col("vec_id"))
    val diff = served.exceptAll(batchAns).count() +
      batchAns.exceptAll(served).count()
    Seq(diff == 0L, recallMet(served, exactTop5(s, d, qs)))
  }

  // ---- q326: CRASH-SAFE streaming growth of the graph index ---------
  //
  // The q304/q318/q319 recovery cell for the FOURTH family. The extra
  // subtlety graphs add over code tables: an insert batch's output
  // depends on the GRAPH IT SEARCHED, so a replayed batch that can see
  // its own orphaned edges would compute a DIFFERENT edge set (its own
  // reverse edges make batch siblings reachable) — replay would not be
  // result-invisible. The fix is part of the layout: edges live under
  // `gb=<batch+1>/layer=L/`, and batch k's descent reads ONLY
  // `gb <= k` — so the replay searches exactly the graph the first run
  // searched, recomputes the identical edges, and overwrites its own
  // orphaned dir (exactly-once by layout, q287 discipline).

  private val hnswGrMemo = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (String, Int, Long)]()
  graft.util.CacheRegistry.registerMemo(hnswGrMemo)

  private[graft] def ensureHnswGrowRestart(s: SparkSession, d: String)
      : (String, Int, Long) =
    hnswGrMemo.computeIfAbsent((s, d), _ => {
      val loc = graft.util.TmpDirs.scratchFor("hnsw_growrestart", d)
      val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
      val base = e.filter(pmod(col("vec_id"), lit(2)) === 0)
      val n = base.count()
      val maxLevel = maxLevelFor(n)
      buildGraphInto(s, d, s"$loc/gb=0", base, maxLevel)
      val entry = base
        .withColumn("lvl", levelOf(xxhash64(col("vec_id")), maxLevel))
        .orderBy(col("lvl").desc, col("vec_id"))
        .select(col("vec_id")).limit(1).collect()(0).getLong(0)
      hnswBuilds.incrementAndGet()
      val feed = graft.util.TmpDirs.scratchFor("hnsw_gr_feed", d)
      Seq(1, 3, 5, 7).zipWithIndex.foreach { case (r, k) =>
        graft.util.OrderedFeed.writeChunk(s"$feed/c$k", k,
          e.filter(pmod(col("vec_id"), lit(8)) === r))
      }
      val ckpt = graft.util.TmpDirs.scratchFor("hnsw_gr_ckpt", d)
      val src = s.readStream.schema(s.read.parquet(s"$feed/c0").schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$feed/c*")
      EventAnalytics.crashRestartDrive(s, src, ckpt, crashAt = 1L,
        width = 8) { (batch, id) =>
        val ss = batch.sparkSession
        val qs = batch.select(col("vec_id").as("query_id"),
          col("embedding").as("qe"))
        // replay determinism: descend over gb <= id only (see header)
        val beam = beamSweepOn(ss, d, loc, maxLevel, entry, qs,
          Seq(EfInsert), edgeFilter = col("gb") <= id)
        insertEdgesOf(beam, maxLevel)
          .write.mode("overwrite").partitionBy("layer")
          .parquet(s"$loc/gb=${id + 1}")
      }
      (loc, maxLevel, entry)
    })

  /** Test seam: recompute an insert batch's edges under a gb cap —
    * GraphAnnSpec pins the stored replayed batch edge-equal to this.
    */
  private[graft] def insertEdgesForTest(s: SparkSession, d: String,
      loc: String, maxLevel: Int, entry: Long, qs: DataFrame,
      gbCap: Long): DataFrame =
    insertEdgesOf(beamSweepOn(s, d, loc, maxLevel, entry, qs,
      Seq(EfInsert), edgeFilter = col("gb") <= gbCap), maxLevel)

  /** q326: probe the crash-replayed stream-grown graph — the crash
    * must be result-invisible under the gb-capped descent, and the
    * grown graph must hold the recall floor over the full corpus
    * (q31 gate; the layout/commit facts are spec-pinned).
    */
  def hnswGrowRestart(s: SparkSession, d: String): DataFrame = {
    val met = gateMemo.computeIfAbsent((s, d, "grow-restart"), _ => {
      val (loc, maxLevel, entry) = ensureHnswGrowRestart(s, d)
      val qs = evalQueries(s, d)
      val ann = beamTop5(beamSweepOn(s, d, loc, maxLevel, entry, qs, Seq(8)))
        .select(col("query_id"), col("vec_id"))
      Seq(recallMet(ann, exactTop5(s, d, qs)))
    }).head
    embeddings(s, d).select(col("vec_id").as("query_id"))
      .filter(col("query_id") % 100 === 7)
      .select(col("query_id"), lit(met).as("recall_floor_met"))
      .orderBy(col("query_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q316_hnsw_probe"       -> hnswProbe _,
    "q317_hnsw_ef_sweep"    -> hnswEfSweep _,
    "q323_hnsw_grow"        -> hnswGrowProbe _,
    "q324_hnsw_erasure"     -> hnswErasureProbe _,
    "q325_hnsw_stream_serve" -> hnswStreamServe _,
    "q326_hnsw_grow_restart" -> hnswGrowRestart _,
  )

  val oracleSql: Map[String, String] = Map(
    // deterministic-gate oracles (q31 pattern): pin the row set + TRUE
    "q316_hnsw_probe" ->
      """SELECT vec_id AS query_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 100 = 7
        |ORDER BY query_id""".stripMargin,
    "q317_hnsw_ef_sweep" ->
      """SELECT CAST(ef AS BIGINT) AS ef,
        |  TRUE AS recall_floor_met, TRUE AS ge_prev_ef
        |FROM (VALUES (2), (8), (32)) AS t(ef)
        |ORDER BY ef""".stripMargin,
    "q323_hnsw_grow" ->
      """SELECT vec_id AS query_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 100 = 7
        |ORDER BY query_id""".stripMargin,
    "q324_hnsw_erasure" ->
      """SELECT vec_id AS query_id, TRUE AS no_tombstone_served,
        |  TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 100 = 7
        |ORDER BY query_id""".stripMargin,
    "q325_hnsw_stream_serve" ->
      """SELECT vec_id AS query_id, TRUE AS equals_batch_probe,
        |  TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 100 = 7
        |ORDER BY query_id""".stripMargin,
    "q326_hnsw_grow_restart" ->
      """SELECT vec_id AS query_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id % 100 = 7
        |ORDER BY query_id""".stripMargin,
  )
}
