package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}
import java.sql.{Connection, DriverManager, PreparedStatement, Statement}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{ClickHouseDdl, ClickHouseSink}

/** The ClickHouse sink must reproduce the reference's wire contract:
  * the 16-column explicit INSERT (`clickhouse.go:79-83`), first-write
  * MergeTree auto-provisioning, and DateTime64(6)-fidelity binding.
  * No ClickHouse server ships in this environment, so the statements
  * are pinned through recording JDBC proxies and the executor batch
  * cycle runs against embedded Derby (a real JDBC engine).
  */
class ClickHouseSinkSpec extends AnyFunSuite {

  private def recordingStatement(sink: scala.collection.mutable.Buffer[String]): Statement =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Statement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "executeUpdate" => sink += args(0).asInstanceOf[String]; Integer.valueOf(0)
            case "close" => null
            case _ => throw new UnsupportedOperationException(m.getName)
          }
      }).asInstanceOf[Statement]

  private def recordingConnection(sink: scala.collection.mutable.Buffer[String]): Connection =
    Proxy.newProxyInstance(getClass.getClassLoader, Array(classOf[Connection]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => recordingStatement(sink)
            case "close" => null
            case _ => throw new UnsupportedOperationException(m.getName)
          }
      }).asInstanceOf[Connection]

  test("insertSql is the reference's 16-column explicit INSERT (clickhouse.go:79-83)") {
    assert(ClickHouseSink.insertSql("logs", ClickHouseDdl.TechLogSchema) ==
      "INSERT INTO logs (EventDate, EventTime, EventType, Duration, User, " +
        "InfoBase, SessionID, ClientID, ConnectionID, ExceptionType, ErrorText, " +
        "SQLText, Rows, RowsAffected, Context, ProcessName) " +
        "VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?,?,?,?)")
  }

  test("ensureTable provisions with the MergeTree DDL on first write") {
    val issued = scala.collection.mutable.Buffer.empty[String]
    ClickHouseSink.ensureTable(recordingConnection(issued), "logs",
      ClickHouseDdl.TechLogSchema)
    assert(issued.size == 1)
    val ddl = issued.head
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS logs"))
    assert(ddl.contains("ENGINE = MergeTree"))
    assert(ddl.contains("PARTITION BY EventDate"))
    assert(ddl.contains("DateTime64(6)"))
    assert(ddl.contains("LowCardinality(String)"))
  }

  test("binding keeps DateTime64(6) microseconds and passes SQL NULLs") {
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("s", StringType),
      StructField("n", IntegerType)))
    val micros = java.sql.Timestamp.valueOf("2025-05-26 07:00:03.310025")
    val calls = scala.collection.mutable.Buffer.empty[(String, Seq[Any])]
    val ps = Proxy.newProxyInstance(getClass.getClassLoader,
      Array(classOf[PreparedStatement]),
      new InvocationHandler {
        override def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef = {
          calls += ((m.getName, Option(args).map(_.toSeq).getOrElse(Nil)))
          null
        }
      }).asInstanceOf[PreparedStatement]
    ClickHouseSink.bind(ps, schema, Row(micros, null, 7))
    assert(calls == Seq(
      ("setTimestamp", Seq(1, micros)),
      ("setObject", Seq(2, null)),
      ("setInt", Seq(3, 7))))
    // the bound timestamp still carries all six fractional digits
    assert(micros.getNanos == 310025000)
  }

  test("batch-commit marker table DDL is dialect-aware (ClickHouse needs an ENGINE)") {
    val ch = graft.pipeline.LogPump.markerTableDdl("jdbc:clickhouse://h:8123/db")
    assert(ch.contains("ENGINE = MergeTree"))
    assert(ch.contains("ORDER BY (pipeline, batch_id)"))
    assert(!ch.contains("PRIMARY KEY")) // no such constraint clause in ClickHouse
    val generic = graft.pipeline.LogPump.markerTableDdl("jdbc:derby:memory:x")
    assert(generic.contains("PRIMARY KEY (pipeline, batch_id)"))
    assert(!generic.contains("ENGINE"))
  }

  test("binding truncates sub-µs nanos to the DateTime64(6) grid") {
    // a raw-JDBC caller can hand the sink a ns-precision Timestamp;
    // DateTime64(6) holds six digits, so bind owns the truncation
    val ns = java.sql.Timestamp.valueOf("2025-05-26 07:00:03.310025999")
    val truncated = ClickHouseSink.toMicros(ns)
    assert(truncated.getNanos == 310025000)
    assert(truncated.getTime == ns.getTime) // integral millis untouched
    // µs-aligned values pass through identically (no reallocation)
    val us = java.sql.Timestamp.valueOf("2025-05-26 07:00:03.310025")
    assert(ClickHouseSink.toMicros(us) eq us)
    assert(ClickHouseSink.toMicros(null) == null)
  }

  test("value cycle: µs precision and Nullable columns survive the full write path") {
    val s = TestSpark.spark
    val url = "jdbc:derby:memory:chcycle;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE cyc (id INT, et TIMESTAMP, exc VARCHAR(32), rws INT)")
    } finally conn.close()
    // Nullable(String)/Nullable(Int32) dialect columns: null and
    // non-null rows; EventTime at full six-fractional-digit precision
    val t6 = java.sql.Timestamp.valueOf("2025-05-26 07:00:03.310025")
    val schema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("et", TimestampType, nullable = false),
      StructField("exc", StringType, nullable = true),
      StructField("rws", IntegerType, nullable = true)))
    val rows = Seq(Row(1, t6, "TimeoutException", Integer.valueOf(42)),
      Row(2, t6, null, null))
    val df = s.createDataFrame(new java.util.ArrayList[Row](rows.asJava), schema)
    ClickHouseSink.write(df, "cyc", url, batchSize = 1, provision = false)
    val back = s.read.jdbc(url, "cyc", new java.util.Properties())
      .collect().sortBy(_.getInt(0))
    assert(back(0).getTimestamp(1) == t6 &&
      back(0).getTimestamp(1).getNanos == 310025000,
      "all six fractional digits survive the bind→insert→read cycle")
    assert(back(0).getString(2) == "TimeoutException" && back(0).getInt(3) == 42)
    assert(back(1).isNullAt(2) && back(1).isNullAt(3),
      "SQL NULLs in Nullable dialect columns round-trip as nulls")
  }

  test("executor batch cycle appends through a real JDBC engine (Derby)") {
    val s = TestSpark.spark
    import s.implicits._
    val url = "jdbc:derby:memory:chsink;create=true"
    val conn = DriverManager.getConnection(url)
    try {
      conn.createStatement().executeUpdate(
        "CREATE TABLE tl (id INT, name VARCHAR(16), ts TIMESTAMP)")
    } finally conn.close()
    val t0 = java.sql.Timestamp.valueOf("2025-05-26 07:00:03.310025")
    val df = (1 to 5).map(i => (i, s"u$i", t0)).toDF("id", "name", "ts")
    // batchSize below the row count drives the mid-partition flush
    ClickHouseSink.write(df.repartition(2), "tl", url,
      batchSize = 2, provision = false)
    val back = s.read.jdbc(url, "tl", new java.util.Properties())
      .collect().map(r => (r.getInt(0), r.getString(1), r.getTimestamp(2)))
      .sortBy(_._1).toSeq
    assert(back == (1 to 5).map(i => (i, s"u$i", t0)))
  }
}
