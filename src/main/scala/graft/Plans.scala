package graft
import org.apache.spark.sql.SparkSession

/** Dumps physical plans of representative queries for plan-quality
  * review (pushdown, broadcast choice, shuffle count, codegen spans).
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val interesting = Seq("q01_pricing_summary", "q02_top_revenue",
      "q03_region_customer", "q04_semi_join", "q05_anti_join",
      "q06_topk_orders", "q15_events_hourly", "q26_dedup_exact",
      "q27_minhash_lsh", "q30_knn_brute", "q31_ann_lsh",
      "q44_asof_join", "q45_range_join", "q47_moving_window",
      "q48_gap_fill", "q52_ivf_ann", "q55_skew_join",
      "q57_minhash_agg", "q58_correlated", "q63_stats_agg",
      "q64_simhash_neardup",
      "q79_map_funcs", "q80_struct_topn", "q81_cond_agg",
      "q83_market_share", "q84_sketch_distinct", "q85_variant_props",
      "q87_topk_exec")
    interesting.foreach { name =>
      println(s"\n=============== $name ===============")
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
