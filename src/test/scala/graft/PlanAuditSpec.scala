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
    "q106_heavy_hitters", "q112_kmeans", "q119_pmi",
    "q115_rolling_distinct", // broadcast 1-row day-bounds range filter
    "q129_perplexity", // broadcast 1-row vocabulary-size scalar
    "q141_semantic_dedup", // q112's broadcast centroid table (k rows)
    "q144_cdc_merge", // broadcast 1-row span-cutoff scalar
    "q147_importance_weights", // broadcast 1-row Nt/Nr token-total scalars
    "q149_temperature_mix", // broadcast 1-row mixture-total scalar
    "q155_quant_recall", // q30's broadcast 10-query =!= join, on both rankings
    "q162_budget_waterfill", // broadcast 1-row totals/cap scalars over the source catalog
    "q165_hard_negatives") // q30's broadcast 10-query =!= join, both role branches
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
      "q162_budget_waterfill") // source-catalog-sized window + 1-row scalars

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
