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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q55_skew_join" -> skewJoinAgg _,
  )

  val oracleSql: Map[String, String] = Map(
    "q55_skew_join" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
