package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.ClickHouseDdl

/** The emitted sink DDL must reproduce the reference's published
  * CREATE TABLE block (README "CREATE TABLE logs": column set, order,
  * ClickHouse types incl. LowCardinality/UInt32/Nullable, MergeTree
  * partitioned by EventDate, ordered by (EventDate, EventTime)).
  */
class ClickHouseDdlSpec extends AnyFunSuite {

  test("techLogDdl reproduces the reference MergeTree layout") {
    val ddl = ClickHouseDdl.techLogDdl("logs")
    val expectedTypes = Seq(
      "EventDate" -> "Date",
      "EventTime" -> "DateTime64(6)",
      "EventType" -> "LowCardinality(String)",
      "Duration" -> "UInt32",
      "User" -> "String",
      "InfoBase" -> "String",
      "SessionID" -> "UInt32",
      "ClientID" -> "UInt32",
      "ConnectionID" -> "UInt32",
      "ExceptionType" -> "Nullable(String)",
      "ErrorText" -> "Nullable(String)",
      "SQLText" -> "Nullable(String)",
      "Rows" -> "Nullable(Int32)",
      "RowsAffected" -> "Nullable(Int32)",
      "Context" -> "Nullable(String)",
      "ProcessName" -> "String")
    val colLines = ddl.linesIterator.filter(_.startsWith("    ")).toSeq
    assert(colLines.size == 16)
    colLines.zip(expectedTypes).foreach { case (line, (name, tpe)) =>
      val body = line.trim.stripSuffix(",")
      assert(body.startsWith(name), s"order: expected $name, got '$body'")
      assert(body.endsWith(tpe), s"$name: expected type $tpe in '$body'")
    }
    assert(ddl.contains("ENGINE = MergeTree"))
    assert(ddl.contains("PARTITION BY EventDate"))
    assert(ddl.contains("ORDER BY (EventDate, EventTime)"))
  }

  test("generic schemas map and unknown types are rejected") {
    import org.apache.spark.sql.types._
    val ddl = ClickHouseDdl.createTable("t",
      StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("score", DoubleType, nullable = true),
        StructField("amount", DecimalType(18, 4), nullable = false))),
      partitionBy = "id", orderBy = Seq("id"))
    assert(ddl.contains("Int64") && ddl.contains("Nullable(Float64)")
      && ddl.contains("Decimal(18, 4)"))
    intercept[IllegalArgumentException] {
      ClickHouseDdl.createTable("t",
        StructType(Seq(StructField("m", MapType(StringType, StringType)))))
    }
  }
}
