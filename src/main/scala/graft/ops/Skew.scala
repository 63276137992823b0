package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.util.Tables._

/** Skew mitigation for pathological hot grouping keys (PLANS.md): the
  * classic two-phase salted aggregation. Phase 1 groups by
  * (keys, salt) so a hot key's rows spread over `buckets` reducers;
  * phase 2 merges the partial states per key. AQE's skew handling
  * covers joins; aggregation skew on a single monster key is still the
  * pipeline author's job — this is that tool.
  *
  * The salt is `spark_partition_id % buckets`: computable without any
  * shuffle or row hashing, and rows of one input partition share a
  * salt, which keeps phase-1 map-side combining effective.
  */
object Skew {

  /** Salted sum/count (avg = sum/cnt at the caller). Result is
    * identical to `df.groupBy(keys).agg(sum, count)` — both phases are
    * exact for algebraic aggregates.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      buckets: Int = 32): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    df.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
      .groupBy((keyCols :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(keyCols: _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }

  /** Salted equi-join for a skewed probe side: probe rows get a salt
    * from their physical partition, the (small) build side is
    * replicated across all `buckets` salt values, and the join runs on
    * (key, salt) — a hot key's rows now land on `buckets` reducers
    * instead of one. Row-identical to `probe.join(build, key)`. Use
    * when the build side is too big to broadcast outright but small
    * enough to replicate `buckets`×; AQE's skew split covers the rest.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      buckets: Int = 8): DataFrame = {
    val salted = probe.withColumn("__salt", pmod(spark_partition_id(), lit(buckets)))
    val replicated = build.withColumn("__salt",
      explode(array((0 until buckets).map(lit(_)): _*)))
    // the whole point of salting is spreading the SHUFFLE — a broadcast
    // of the ×buckets replicated build side would defeat it (and only
    // fits at toy scale)
    salted.join(replicated.hint("shuffle_hash"), Seq(key, "__salt")).drop("__salt")
  }

  private val Dec = DataTypes.createDecimalType(28, 6)

  /** Oracle-checked salted-join demo: lineitem ⋈ orders on orderkey
    * through saltedJoin, aggregated per order priority — the result
    * hash-matches the plain SQL join, proving salting is semantically
    * free.
    */
  def skewJoinAgg(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).select(col("l_orderkey").as("k"), col("l_extendedprice"))
    val ord = orders(s, d).select(col("o_orderkey").as("k"), col("o_orderpriority"))
    saltedJoin(li, ord, "k")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_extendedprice").cast(Dec)), 2).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** q251: join-key skew diagnosis — the report a pipeline author
    * reads BEFORE choosing between a plain join, a broadcast, salting
    * (q55), or AQE skew splitting: per join key (lineitem's orderkey
    * here), the row-count distribution summarized as exact quantiles,
    * the top-3 heaviest keys, and the skew factor max/mean — the
    * number that predicts the straggler reducer. Diagnosis is cheap
    * (one keyed count + small rollups); picking the wrong join
    * strategy at 100 TB is not.
    *
    * Determinism: counts are integers; quantiles are the exact
    * interpolated pairing (q42) over integer counts; the mean is one
    * division of exact integers; heavy-key ties break by key.
    *
    * Scale shape: the key histogram is the same map-side-combinable
    * count every aggregation pays; everything after runs on the
    * distinct-key table. Top-3 is TakeOrderedAndProject-shaped via a
    * bounded sort inside a 1-row collect-free rollup (max_by array).
    */
  def joinSkewReport(s: SparkSession, d: String): DataFrame = {
    val Dec19 = DataTypes.createDecimalType(19, 0)
    val hist = lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("c"))
    hist.agg(
        count(lit(1)).as("n_keys"),
        sum(col("c").cast(Dec19)).as("n_rows"),
        max(col("c")).as("max_rows"),
        expr("percentile(c, 0.5)").as("p50"),
        expr("percentile(c, 0.99)").as("p99"),
        max_by(col("l_orderkey"), struct(col("c"), col("l_orderkey")))
          .as("heaviest_key"))
      .select(col("n_keys"), col("n_rows").cast("long").as("n_rows"),
        col("max_rows"), col("p50"), col("p99"), col("heaviest_key"),
        round(col("max_rows").cast("double") /
          (col("n_rows").cast("double") / col("n_keys").cast("double")), 4)
          .as("skew_factor"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_skew_join" -> skewJoinAgg _,
    "q251_skew_report" -> joinSkewReport _,
  )

  val oracleSql: Map[String, String] = Map(
    "q251_skew_report" ->
      """WITH h AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS c
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(sum(c) AS BIGINT) AS n_rows,
        |    CAST(max(c) AS BIGINT) AS max_rows,
        |    quantile_cont(CAST(c AS DOUBLE), 0.5) AS p50,
        |    quantile_cont(CAST(c AS DOUBLE), 0.99) AS p99
        |  FROM h),
        |hk AS (
        |  SELECT l_orderkey AS heaviest_key FROM h
        |  ORDER BY c DESC, l_orderkey DESC LIMIT 1)
        |SELECT m.n_keys, m.n_rows, m.max_rows, m.p50, m.p99,
        |  hk.heaviest_key,
        |  round(CAST(m.max_rows AS DOUBLE)
        |    / (CAST(m.n_rows AS DOUBLE) / CAST(m.n_keys AS DOUBLE)), 4)
        |    AS skew_factor
        |FROM m CROSS JOIN hk""".stripMargin,
    "q55_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
