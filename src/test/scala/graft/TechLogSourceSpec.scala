package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TechLogSourceSpec extends AnyFunSuite {

  private lazy val dir: String = {
    val d = graft.util.TmpDirs.scratch("techlog-src")
    Files.writeString(Paths.get(d, "25052607.log"),
      "00:03.310025-1327862,DBMSSQL,3,process=rphost,p:processName=srv," +
        "Usr=alice,Sql='SELECT 1 FROM t',Context='line one\nline two'\n" +
        "00:04.000001-5,CONN,2,process=rphost,Usr=bob\n")
    Files.writeString(Paths.get(d, "25052608.log"),
      "00:05.100000-77,EXCP,1,process=rphost,Usr=carol\n")
    d
  }

  test("techlog DSv2 source equals the RecordAssembler batch pipeline") {
    val s = TestSpark.spark
    val viaSource = s.read.format("techlog").load(dir)
    val viaAssembler = graft.pipeline.LogPump
      .parseRecords(graft.ingest.RecordAssembler.readBatch(s, Seq(dir)))
      .toDF()
    assert(viaSource.schema == viaAssembler.schema)
    val a = viaSource.drop("InsertedAt").orderBy("LogTimestamp").collect().toSeq
    val b = viaAssembler.drop("InsertedAt").orderBy("LogTimestamp").collect().toSeq
    assert(a == b)
    assert(a.size == 3)
  }

  test("files bin-pack into partitions by size (maxPartitionBytes)") {
    val s = TestSpark.spark
    // two tiny files fit one 32 MB-target partition by default
    assert(s.read.format("techlog").load(dir).rdd.getNumPartitions == 1)
    // a 1-byte target forces one partition per file
    assert(s.read.format("techlog").option("maxPartitionBytes", "1")
      .load(dir).rdd.getNumPartitions == 2)
  }

  test("column pruning pushes into the scan") {
    val s = TestSpark.spark
    val pruned = s.read.format("techlog").load(dir)
      .select(col("Component"), col("User"))
    // V2 pruning: the BatchScan's bracketed output list is exactly the
    // selected columns (no other LogEntry field leaves the reader)
    val scan = pruned.queryExecution.executedPlan.toString
    assert("BatchScan techlog[^\\[]*\\[Component#\\d+, User#\\d+\\]".r
      .findFirstIn(scan).isDefined, scan)
    assert(pruned.orderBy("Component").collect().map(_.getString(0)).toSeq ==
      Seq("CONN", "DBMSSQL", "EXCP"))
  }

  test("micro-batch stream ingests per rotated file and resumes from checkpoint") {
    val s = TestSpark.spark
    val sdir = graft.util.TmpDirs.scratch("techlog-stream")
    val ckpt = graft.util.TmpDirs.scratch("techlog-stream-ckpt")
    val out = graft.util.TmpDirs.scratch("techlog-stream-out")
    Files.writeString(Paths.get(sdir, "25052607.log"),
      "00:03.000001-1,CONN,2,process=rphost,Usr=a\n")
    // parquet sink: the memory sink refuses checkpoint recovery
    def start() = s.readStream.format("techlog").load(sdir)
      .select(col("Component"), col("User"), col("LogTimestamp"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").format("parquet").option("path", out).start()
    def components() = s.read.parquet(out)
      .select("Component").collect().map(_.getString(0)).sorted.toSeq
    val q1 = start()
    try {
      q1.processAllAvailable()
      assert(components() == Seq("CONN"))
      Files.writeString(Paths.get(sdir, "25052608.log"),
        "00:04.000001-2,DBMSSQL,3,process=rphost,Usr=b\n")
      q1.processAllAvailable()
      assert(components() == Seq("CONN", "DBMSSQL"))
    } finally q1.stop()
    // restart from the checkpoint: the new file arrives exactly once,
    // committed files are not re-ingested
    Files.writeString(Paths.get(sdir, "25052609.log"),
      "00:05.000001-3,EXCP,1,process=rphost,Usr=c\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(components() == Seq("CONN", "DBMSSQL", "EXCP"))
    } finally q2.stop()
  }

  test("equality filters push into the scan and are dropped post-scan") {
    val s = TestSpark.spark
    val filtered = s.read.format("techlog").load(dir)
      .filter(col("Component") === "DBMSSQL")
      .select(col("User"))
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("EqualTo(Component,DBMSSQL)"), plan)
    // the pushed equality is evaluated in the reader — no Filter node
    // survives for it (IsNotNull is also pushed, so none at all)
    assert(!plan.contains("Filter ("), plan)
    assert(filtered.collect().map(_.getString(0)).toSeq == Seq("alice"))
  }

  test("maxFilesPerTrigger admits a bounded backlog per micro-batch") {
    val s = TestSpark.spark
    val sdir = graft.util.TmpDirs.scratch("techlog-admission")
    (7 to 9).foreach { h =>
      Files.writeString(Paths.get(sdir, s"2505260$h.log"),
        s"00:0$h.000001-$h,CONN,2,process=rphost,Usr=u$h\n")
    }
    val q = s.readStream.format("techlog")
      .option("maxFilesPerTrigger", "1").load(sdir)
      .select(col("User"))
      .writeStream.outputMode("append")
      .format("memory").queryName("tl_admit").start()
    try {
      q.processAllAvailable()
      assert(s.table("tl_admit").count() == 3)
      // 3 files drained one per micro-batch, not one catch-up batch
      val batches = q.recentProgress.filter(_.numInputRows > 0)
      assert(batches.length == 3, batches.map(_.numInputRows).mkString(","))
      assert(batches.forall(_.numInputRows == 1))
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the backlog in bounded batches, then stops") {
    val s = TestSpark.spark
    val sdir = graft.util.TmpDirs.scratch("techlog-availnow")
    (1 to 3).foreach { h =>
      Files.writeString(Paths.get(sdir, s"2505260$h.log"),
        s"00:0$h.000001-$h,CONN,2,process=rphost,Usr=u$h\n")
    }
    val q = s.readStream.format("techlog")
      .option("maxFilesPerTrigger", "1").load(sdir)
      .select(col("User"))
      .writeStream.outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("tl_avail").start()
    try {
      assert(q.awaitTermination(60000), "query did not self-terminate")
      assert(s.table("tl_avail").count() == 3)
      assert(q.recentProgress.count(_.numInputRows > 0) == 3) // bounded drain
    } finally q.stop()
  }

  test("connector registers in the catalog: CREATE TABLE USING techlog + SQL") {
    val s = TestSpark.spark
    s.sql("DROP TABLE IF EXISTS techlog_cat")
    s.sql(s"CREATE TABLE techlog_cat USING techlog OPTIONS (path '$dir')")
    try {
      val rows = s.sql(
        """SELECT Component, count(*) AS n FROM techlog_cat
          |GROUP BY Component ORDER BY Component""".stripMargin)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(rows == Seq(("CONN", 1L), ("DBMSSQL", 1L), ("EXCP", 1L)))
    } finally s.sql("DROP TABLE IF EXISTS techlog_cat")
  }

  test("multi-line Context survives the source intact") {
    val s = TestSpark.spark
    val ctx = s.read.format("techlog").load(dir)
      .filter(col("Component") === "DBMSSQL")
      .select(col("Context")).collect()(0).getString(0)
    assert(ctx == "line one\nline two")
  }
}
