package graft

import org.scalatest.funsuite.AnyFunSuite

/** The PlanAudit invariants, pinned as CI: a future plan regression
  * (a join losing its broadcast, an accidental crossJoin, a scalar agg
  * sneaking into a hot path) fails here instead of waiting for a
  * round's judge. Each allowed hit has a scale rationale in PLANS.md:
  * q30/q31 broadcast-nested-loop over 10 query vectors by
  * construction, q52/q112's over the broadcast centroid table (k rows),
  * q106's over the broadcast 1-row token total; the single-partition
  * exchanges are scalar final aggregates (q14/q105) or the same 1-row
  * total (q106).
  */
class PlanAuditSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"
  private val allowedBnlj = Set("q30_knn_brute", "q31_ann_lsh", "q52_ivf_ann",
    "q203_ivf_probe", // q52's broadcast centroid table for probe-cell resolution
    "q215_ivf_incremental", // same broadcast centroid table (probe + batch assignment)
    "q106_heavy_hitters", "q112_kmeans", "q119_pmi",
    "q115_rolling_distinct", // broadcast 1-row day-bounds range filter
    "q129_perplexity", // broadcast 1-row vocabulary-size scalar
    "q141_semantic_dedup", // q112's broadcast centroid table (k rows)
    "q144_cdc_merge", // broadcast 1-row span-cutoff scalar
    "q147_importance_weights", // broadcast 1-row Nt/Nr token-total scalars
    "q149_temperature_mix", // broadcast 1-row mixture-total scalar
    "q155_quant_recall", // q30's broadcast 10-query =!= join, on both rankings
    "q162_budget_waterfill", // broadcast 1-row totals/cap scalars over the source catalog
    "q165_hard_negatives", // q30's broadcast 10-query =!= join, both role branches
    "q174_assoc_rules", // broadcast 1-row order-total scalar onto the pair table
    "q175_rrf_fusion", // broadcast 1-row query-vector scalar (q30 shape)
    "q177_cusum", // broadcast 1-row (T, S) totals onto the calendar table
    "q178_theil_sen", // calendar²-bounded all-pairs slope join (PLANS.md)
    "q188_rank_corr", // q175's 1-row query-vector broadcast + ≤20-row pair join
    "q190_fold_balance", // broadcast 1-row corpus-total scalar
    "q191_neg_sampling", // broadcast 1-row normalizing-total scalar
    "q192_psi_drift", // broadcast 1-row min/max bounds scalar
    "q217_kaplan_meier", // broadcast 1-row corpus-horizon scalar
    "q220_assortativity", // broadcast 1-row node-count scalar onto the 1-row moment agg
    "q229_type_xcorr", // hour-grid × broadcast |types|-row catalog (gap-fill, q48 shape)
    "q236_grouped_split", // broadcast 1-row cluster-span audit scalar
    "q239_binary_quant", // q30's broadcast 10-query =!= join (Hamming branch)
    "q241_nprobe_sweep", // q52's broadcast centroid table + q30's broadcast query joins
    "q253_binary_index", // q30's broadcast 10-query =!= join over the 16-byte code table
    "q254_ivf_erasure", // q203's broadcast centroid table, swept-index serving
    "q263_index_compaction", // same probe shape over the compacted swept index
    "q272_ivf_lifecycle", // same probe shape over the chained-lifecycle table
    "q289_stream_index_grow", // same probe shape over the stream-grown table
    "q273_ivf_dv_erasure", // same probe shape through the tombstone anti-join
    "q286_ivf_prod_lifecycle", // same probe shape, both delete states + VALUES stage tags
    "q259_index_staleness", // two broadcast centroid tables + q30's broadcast query joins (recall audit)
    "q277_pq_staleness", // broadcast 1-row rebuild-trigger scalar onto the 2-row half table
    "q278_binary_staleness", // broadcast 1-row rebuild-trigger scalar onto the 64-row dim table
    "q256_binary_erasure", // q253's broadcast 9-query =!= join over the swept code table
    "q280_binary_dv_erasure", // q256's broadcast 9-query =!= join through the tombstone anti-join
    "q284_binary_lifecycle", // q256's broadcast 9-query =!= join over the chained-lifecycle code table
    "q291_foldin_probe", // q256's broadcast 10-query =!= join through the post-policy MoR view
    "q299_stream_binary_grow", // q256's broadcast =!= join over the stream-grown code table
    "q304_ivf_grow_restart", // q203's broadcast centroid table over the crash-replayed grown index
    "q319_binary_grow_restart", // q253's broadcast 10-query =!= join over the crash-replayed grown code table
    "q307_manifest_probe", // q203's broadcast centroid table over the manifest-resolved HEAD snapshot
    "q358_ivfpq_probe", // q203's broadcast centroid table (coarse probe) + broadcast LUT over the cell-pruned composed scan
    "q359_ivfbin_probe", // same coarse-probe broadcast over the composed sign-code partitions
    "q365_ivfpq_grow", // q358's gate verbatim over the grown composed table
    "q293_mv_asof_timestamp") // broadcast ≤4-row shard-max/stamp catalogs in non-equi (<, <=) resolution joins
  private val allowedSinglePartition =
    Set("q14_promo_revenue", "q105_bloom_semi_join",
      "q106_heavy_hitters", "q119_pmi",
      "q115_rolling_distinct", // scalar final aggregates / 1-row totals
      "q129_perplexity", // 1-row vocabulary-size aggregate
      "q135_fk_audit", // five scalar orphan counts (one row per check)
      "q139_rfm_segments", // exact global quintiles = global sort of the customer-sized rollup (see scaladoc)
      "q144_cdc_merge", // 1-row span-cutoff scalar aggregate
      "q147_importance_weights", // 1-row Nt/Nr token-total aggregates
      "q149_temperature_mix", // 1-row mixture-total aggregate
      "q162_budget_waterfill", // source-catalog-sized window + 1-row scalars
      "q171_benford", // 9-row digit-table window + 1-row total
      "q174_assoc_rules", // 1-row order-total aggregate
      "q175_rrf_fusion", // fusion-width (≤20-row) rank windows
      "q177_cusum", // calendar-sized prefix window + 1-row totals
      "q178_theil_sen", // 1-row percentile/OLS-moment aggregates
      "q185_conversion_lag", // 1-row percentile aggregate
      "q187_anova", // k-row (≤|event types|) group fold
      "q188_rank_corr", // ≤20-row rank windows + 1-row pair counts
      "q190_fold_balance", // 1-row corpus-total aggregate
      "q191_neg_sampling", // 1-row normalizing-total aggregate
      "q192_psi_drift", // 10-row bucket window + 1-row bounds
      "q211_heaps_law", // 1-row OLS moment aggregate (partials map-side)
      "q217_kaplan_meier", // life table packed to ONE calendar-bounded array row (scaladoc)
      "q220_assortativity", // 1-row moment aggregate (partials map-side)
      "q236_grouped_split", // 1-row max-folds-per-cluster audit aggregate
      "q247_compaction", // two 1-row per-stage conservation aggregates
      "q251_skew_report", // 1-row diagnosis aggregate over the distinct-key table
      "q259_index_staleness", // 1-row rebuild-trigger aggregate over |Q| hit counts
      "q278_binary_staleness", // 1-row rebuild-trigger aggregate over the 64-row dim table
      "q293_mv_asof_timestamp", // 1-row per-version totals over the (months×statuses)-row view states
      "q294_mv_retention", // same 1-row per-version totals, post-vacuum survivors
      "q303_mv_concurrent_commits", // same 1-row per-version totals joined to the 4-row commit ledger
      "q306_manifest_snapshots", // 1-row logical-contents aggregate per snapshot (2 snapshots)
      "q308_erasure_everywhere") // six 1-row per-surface audit aggregates (count/sum of 8-byte ids)

  test("no registered query plans a cartesian product, unexpected BNLJ, or unexpected single-partition exchange") {
    val s = TestSpark.spark
    val bad = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val plan =
        try fn(s, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => bad += s"$name: plan failed: ${e.getMessage}"; "" }
      if (plan.contains("CartesianProduct"))
        bad += s"$name: CartesianProduct"
      if (plan.contains("BroadcastNestedLoopJoin") && !allowedBnlj(name))
        bad += s"$name: BroadcastNestedLoopJoin outside the allowed set"
      if (plan.contains("Exchange SinglePartition") && !allowedSinglePartition(name))
        bad += s"$name: single-partition exchange outside the allowed set"
    }
    assert(bad.isEmpty, "\n" + bad.mkString("\n"))
  }

  test("pushdown and pruning reach the parquet scans (the 100-TB-scale contract)") {
    val s = TestSpark.spark
    def scanLines(q: String): Seq[String] =
      SparkEntry.queries(q)(s, sf).queryExecution.executedPlan.toString
        .linesIterator.filter(_.contains("FileScan")).map(_.trim).toSeq
    // q01: the shipdate predicate lands in the lineitem scan itself —
    // at 100 TB this is the difference between reading a fraction of
    // the row groups and reading all of them
    val q01 = scanLines("q01_pricing_summary").mkString("\n")
    assert(q01.contains("PushedFilters: [IsNotNull(l_shipdate)"), q01)
    // q20: a 3-column projection must prune the scan to those columns
    // (reading `lang`/`text` metadata it doesn't need is wrong at any
    // scale; at 100 TB it's the whole game)
    val q20 = scanLines("q20_doc_tokens").mkString("\n")
    assert(q20.contains("[doc_id#") && !q20.contains("lang#"), q20)
    // q77: the day predicate prunes PARTITIONS of the EventDate-
    // partitioned lake — listed directories, not just row groups
    val q77 = scanLines("q77_partition_prune").mkString("\n")
    assert(q77.contains("PartitionFilters: [isnotnull(day"), q77)
  }
}
