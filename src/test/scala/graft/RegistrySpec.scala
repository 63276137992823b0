package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract registry consistency: a typo'd key would silently
  * turn an oracle-checked query into a missing one (or an orphan
  * oracle the driver can never run).
  */
class RegistrySpec extends AnyFunSuite {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("query names are unique across modules (no ++ overwrites)") {
    val all = Seq(
      ops.Relational.queries, ops.EventAnalytics.queries, ops.PumpOps.queries,
      ops.TextAnalysis.queries, ops.Dedup.queries, ops.Similarity.queries,
      ops.Multimodal.queries, ops.Temporal.queries, ops.Suites.queries,
      ops.Clustering.queries, ops.Formats.queries, ops.Skew.queries,
      ops.SqlSuite.queries, ops.Breadth.queries, ops.TrainingData.queries,
      ops.Frequency.queries, ops.Graph.queries, ops.Audit.queries,
      ops.Behavior.queries, ops.GraphAnn.queries)
    val keys = all.flatMap(_.keys)
    val dupes = keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(keys.size == SparkEntry.queries.size)
  }

  test("registry size matches the documented surface") {
    assert(SparkEntry.queries.size == 365)
    // every query — including the approximate ones, which emit
    // deterministic bound-check gate rows — has a DuckDB oracle
    assert(SparkEntry.oracleSql.size == 365)
    assert(SparkEntry.queries.keySet == SparkEntry.oracleSql.keySet)
  }
}
