package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Engine behaviors that only matter at scale or in production ETL:
  * AQE skew-join splitting, parquet schema evolution, and malformed-
  * record handling on text sources (the pump's dead-letter concern,
  * SURVEY T5, applied to the generic readers).
  */
class ScaleBehaviorSpec extends AnyFunSuite {

  test("AQE splits a skewed join partition (skew=true in the final plan)") {
    // isolated SQLConf: thresholds lowered so test-scale data
    // qualifies as skewed; one hot key carries ~all rows
    val s = TestSpark.spark.newSession()
    import s.implicits._
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "20KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "10KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1KB")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val left = s.range(0, 200000)
      .select(when(col("id") % 100 =!= 0, lit(7L)).otherwise(col("id")).as("k"),
        col("id").as("v"))
    val right = s.range(0, 100).select(col("id").as("k"), (col("id") * 2).as("w"))
    val joined = left.join(right, "k")
    // collect() executes THIS dataset's QueryExecution — count() would
    // plan a separate one and leave joined's AQE plan un-finalized
    assert(joined.collect().nonEmpty)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"), plan)
  }

  test("parquet schema evolution: mergeSchema unions old and new columns") {
    val s = TestSpark.spark
    import s.implicits._
    val dir = graft.util.TmpDirs.scratch("schema-evo")
    Seq((1L, "a")).toDF("id", "v1").write.mode("append").parquet(dir)
    Seq((2L, 3.5)).toDF("id", "v2").write.mode("append").parquet(dir)
    val merged = s.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("id", "v1", "v2"))
    assert(merged.count() == 2)
    // old rows surface NULL for the new column, not an error
    assert(merged.filter(col("v2").isNull).count() == 1)
  }

  test("SQL DDL/DML surface: CREATE TABLE / INSERT INTO / INSERT OVERWRITE round-trip") {
    val s = TestSpark.spark
    s.sql("DROP TABLE IF EXISTS graft_ddl_t")
    s.sql("CREATE TABLE graft_ddl_t (id BIGINT, name STRING) USING parquet")
    try {
      s.sql("INSERT INTO graft_ddl_t VALUES (1, 'a'), (2, 'b')")
      s.sql("INSERT INTO graft_ddl_t SELECT id + 10, 'x' FROM graft_ddl_t")
      assert(s.sql("SELECT count(*) FROM graft_ddl_t").collect()(0).getLong(0) == 4)
      s.sql("INSERT OVERWRITE graft_ddl_t VALUES (9, 'z')")
      val rows = s.sql("SELECT id, name FROM graft_ddl_t").collect()
      assert(rows.length == 1 && rows(0).getLong(0) == 9)
    } finally s.sql("DROP TABLE IF EXISTS graft_ddl_t")
  }

  test("malformed JSON records: PERMISSIVE captures, DROPMALFORMED filters, FAILFAST throws") {
    val s = TestSpark.spark
    import s.implicits._
    val dir = graft.util.TmpDirs.scratch("bad-json")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part.json"),
      """{"id": 1, "x": "ok"}
        |{"id": 2 "x": BROKEN
        |{"id": 3, "x": "ok2"}
        |""".stripMargin)
    val schema = "id BIGINT, x STRING, _corrupt_record STRING"
    // corrupt-record-only projections over raw files are disallowed
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache the parsed result
    val permissive = s.read.schema(schema).json(dir).cache()
    try {
      assert(permissive.count() == 3)
      assert(permissive.filter(col("_corrupt_record").isNotNull).count() == 1)
    } finally permissive.unpersist()
    val dropped = s.read.schema("id BIGINT, x STRING")
      .option("mode", "DROPMALFORMED").json(dir)
    assert(dropped.count() == 2)
    val failfast = s.read.schema("id BIGINT, x STRING")
      .option("mode", "FAILFAST").json(dir)
    assertThrows[org.apache.spark.SparkException](failfast.count())
  }
}
