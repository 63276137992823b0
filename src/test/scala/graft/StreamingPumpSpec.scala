package graft

import java.nio.file.Files

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingPump

class StreamingPumpSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def eventually(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (System.currentTimeMillis() < deadline) {
      if (cond) return true
      Thread.sleep(200)
    }
    cond
  }

  private def users(table: String): Set[String] =
    spark.table(table).collect().map(_.getAs[String]("User")).toSet

  test("streaming JDBC sink: idempotent routed append end to end (Derby)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-jdbc")
    java.nio.file.Files.writeString(dir.resolve("25052600.log"),
      "00:01.123456-5,DBMSSQL,3,Usr=a\n00:02.123456-5,CONN,3,Usr=b\n")
    val url = s"jdbc:derby:memory:sjdbc${System.nanoTime()};create=true"
    val ckpt = java.nio.file.Files.createTempDirectory("graft-stream-jdbc-ck").toString
    val q = graft.streaming.StreamingPump.startJdbcSink(
      spark, dir.toString, url, ckpt,
      Map("DBMSSQL" -> "SQL_LOGS"), "LOGS",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime("1 second"),
      projection = _.select("EventDate", "EventTime", "EventType", "User",
        "SessionID", "Duration"))
    try {
      assert(eventually(90000) {
        try spark.read.format("jdbc").option("url", url)
          .option("dbtable", "SQL_LOGS").load().count() == 1 &&
          spark.read.format("jdbc").option("url", url)
            .option("dbtable", "LOGS").load().count() == 1
        catch { case _: Throwable => false } // tables not created yet
      })
      // commit marker recorded for the batch
      assert(spark.read.format("jdbc").option("url", url)
        .option("dbtable", "graft_batch_commits").load().count() >= 1)
    } finally q.stop()
  }

  test("splitKeepRemainder holds back the trailing partial record") {
    val (complete, rest) = StreamingPump.splitKeepRemainder(Seq(
      "00:01.123456-5,CONN,3,Usr=a",
      "continuation",
      "00:02.123456-7,CONN,3,Usr=b"))
    assert(complete == Seq(Seq("00:01.123456-5,CONN,3,Usr=a", "continuation")))
    assert(rest == Seq("00:02.123456-7,CONN,3,Usr=b"))
  }

  test("boundary completes a record; the trailing record is held in state") {
    val dir = Files.createTempDirectory("graft-stream1")
    val cp = Files.createTempDirectory("graft-stream1-cp")
    Files.writeString(dir.resolve("25052607.log"),
      "00:03.310025-42,DBMSSQL,5,Usr=ivanov\n" +
        "00:04.500000-7,CONN,3,Usr=petrov\n")
    val q = StreamingPump
      .pumpStream(spark, dir.toString,
        idleFlush = java.time.Duration.ofMinutes(10)) // effectively never
      .writeStream.outputMode("append")
      .format("memory").queryName("pump_hold")
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      assert(eventually(90000)(users("pump_hold") == Set("ivanov")))
      Thread.sleep(1000) // give it more batches: petrov must STILL be held
      assert(users("pump_hold") == Set("ivanov"))
      val r = spark.table("pump_hold").collect()(0)
      assert(r.getAs[Long]("Duration") == 42L)
    } finally q.stop()
  }

  test("idle timeout flushes the pending record (tail.go:58-65 2s flush)") {
    val dir = Files.createTempDirectory("graft-stream2")
    val cp = Files.createTempDirectory("graft-stream2-cp")
    Files.writeString(dir.resolve("25052608.log"),
      "00:10.100000-1,EXCP,2,Usr=sidorov\n")
    val q = StreamingPump
      .pumpStream(spark, dir.toString,
        idleFlush = java.time.Duration.ofMillis(300))
      .writeStream.outputMode("append")
      .format("memory").queryName("pump_flush")
      .option("checkpointLocation", cp.toString)
      .trigger(Trigger.ProcessingTime("250 milliseconds"))
      .start()
    try {
      assert(eventually(90000)(users("pump_flush") == Set("sidorov")),
        s"timeout flush missing, got ${users("pump_flush")}")
    } finally q.stop()
  }
}
