package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
