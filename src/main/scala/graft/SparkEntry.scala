package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Aggregates the per-domain operator maps from graft.ops.*.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.EventAnalytics.queries ++ ops.PumpOps.queries ++
      ops.TextAnalysis.queries ++ ops.Dedup.queries ++ ops.Similarity.queries ++
      ops.Multimodal.queries ++ ops.Temporal.queries ++ ops.Suites.queries ++
      ops.Clustering.queries ++ ops.Formats.queries ++ ops.Skew.queries ++
      ops.SqlSuite.queries ++ ops.Breadth.queries ++ ops.TrainingData.queries ++
      ops.Frequency.queries ++ ops.Graph.queries ++ ops.Audit.queries ++
      ops.Behavior.queries ++ ops.GraphAnn.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracleSql ++ ops.EventAnalytics.oracleSql ++ ops.PumpOps.oracleSql ++
      ops.TextAnalysis.oracleSql ++ ops.Dedup.oracleSql ++ ops.Similarity.oracleSql ++
      ops.Multimodal.oracleSql ++ ops.Temporal.oracleSql ++ ops.Suites.oracleSql ++
      ops.Clustering.oracleSql ++ ops.Formats.oracleSql ++ ops.Skew.oracleSql ++
      ops.SqlSuite.oracleSql ++ ops.Breadth.oracleSql ++ ops.TrainingData.oracleSql ++
      ops.Frequency.oracleSql ++ ops.Graph.oracleSql ++ ops.Audit.oracleSql ++
      ops.Behavior.oracleSql ++ ops.GraphAnn.oracleSql
}
