package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.Transform
import graft.ingest.{RawRecord, RecordAssembler}
import graft.model.LogEntry
import graft.parse.TechLogParser

/** Batch form of the reference's whole dataflow (SURVEY.md §3.2):
  *
  *   .log files → record assembly → parse → transform → routed sink
  *
  * The plan is narrow end-to-end: one task per input file, no shuffle
  * anywhere until the (optional) sink repartition. At 100 TB this scales
  * with file count; the only wide operation is the sink's
  * `partitionBy(EventDate)` write, where we repartition by the
  * partition column first so each task writes few files instead of one
  * file per (task × date) — the classic small-files trap.
  *
  * The streaming form with identical semantics lives in
  * `graft.streaming.StreamingPump`.
  */
object LogPump {

  /** Records → typed LogEntry, with the filename override of `Timestamp`
    * (reference `tail.go:77`: base name of the source path).
    */
  def parseRecords(records: Dataset[RawRecord]): Dataset[LogEntry] = {
    import records.sparkSession.implicits._
    records.map { r =>
      TechLogParser.parseLine(r.Lines)
        .copy(Timestamp = r.SourceFile.substring(r.SourceFile.lastIndexOf('/') + 1))
    }
  }

  /** Full batch pump: directories of .log files → 16-column TechLogRow
    * DataFrame (invalid records dropped, reference T5).
    */
  def pumpBatch(spark: SparkSession, dirs: Seq[String],
      pattern: String = "*.log"): DataFrame =
    Transform(parseRecords(RecordAssembler.readBatch(spark, dirs, pattern)).toDF())

  /** A1 table routing (reference `clickhouse.go:64-72`): per-Component
    * table with a default fallback. The map comes from config and is
    * tiny — a literal CASE chain, fully codegen'd, no join.
    */
  def withRoute(rows: DataFrame, tableMap: Map[String, String],
      defaultTable: String): DataFrame = {
    val route = tableMap.foldLeft(lit(defaultTable)) {
      case (acc, (component, table)) =>
        when(col("EventType") === component, lit(table)).otherwise(acc)
    }
    rows.withColumn("__table", route)
  }

  /** K1 sink, lake-native form (no ClickHouse reachable — SURVEY §4.2):
    * per routed table, parquet partitioned by EventDate and sorted
    * within partitions by EventTime — the same physical layout as the
    * reference's MergeTree `PARTITION BY EventDate ORDER BY (EventDate,
    * EventTime)` DDL. Routing uses the distinct table set of THIS batch
    * (small by construction: ≤ #components in config).
    */
  def writeRouted(rows: DataFrame, tableMap: Map[String, String],
      defaultTable: String, outDir: String): Unit =
    foreachRoutedTable(rows, tableMap, defaultTable) { (t, df) =>
      df.repartition(col("EventDate"))
        .sortWithinPartitions(col("EventTime"))
        .write.mode("append")
        .partitionBy("EventDate")
        .parquet(s"$outDir/$t")
    }

  /** K1 parquet sink with EXACTLY-ONCE micro-batch replay: each batch
    * lands under its own `batch_id=N` partition directory written
    * with OVERWRITE — a batch replayed after a sink-committed /
    * checkpoint-failed restart rewrites the same directory with the
    * same rows instead of double-appending, and a partially-written
    * crash directory is healed by the same overwrite (strictly
    * stronger than the JDBC marker path, whose partial-append window
    * is documented). Readers list `outDir/<table>` as ordinary
    * two-level partitioned parquet (batch_id, EventDate).
    *
    * Scale shape: identical bytes to `writeRouted` plus one partition
    * level; the per-batch directory is also the natural retention /
    * compaction unit (q247's verb folds small batch dirs later).
    */
  /** Table dirs already cleared by the layout-migration guard — the
    * guard only matters on FIRST contact with a table dir, but it
    * costs two filesystem metadata round-trips; on an object-store
    * outDir with sub-second triggers that is a real per-trigger tax,
    * so the verdict is memoized per (outDir, table) for the process
    * lifetime (a legacy layout cannot appear later: only this sink
    * writes there).
    */
  private val layoutChecked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  def writeRoutedExactlyOnce(rows: DataFrame, tableMap: Map[String, String],
      defaultTable: String, outDir: String, batchId: Long): Unit =
    foreachRoutedTable(rows, tableMap, defaultTable) { (t, df) =>
      // layout-migration guard: a legacy writeRouted outDir has
      // top-level EventDate= dirs; mixing them with batch_id= dirs
      // makes Spark partition discovery fail later with "conflicting
      // directory structures" at READ time — fail fast at WRITE time
      // with an actionable message instead (checked once per table)
      if (!layoutChecked.contains(s"$outDir/$t")) {
        val tableDir = new org.apache.hadoop.fs.Path(s"$outDir/$t")
        val fs = tableDir.getFileSystem(
          df.sparkSession.sessionState.newHadoopConf())
        if (fs.exists(tableDir) &&
            fs.listStatus(tableDir).exists(_.getPath.getName.startsWith("EventDate=")))
          throw new IllegalStateException(
            s"$outDir/$t holds the legacy single-level EventDate= layout; " +
            "the exactly-once sink writes batch_id=N/EventDate=... dirs and " +
            "the two cannot mix. Point the pump at a fresh outDir (or move " +
            "the legacy data aside) when upgrading.")
        // memoize only a PASSED verdict — a caught-and-retried failure
        // must re-check, not silently proceed
        layoutChecked.add(s"$outDir/$t")
      }
      df.repartition(col("EventDate"))
        .sortWithinPartitions(col("EventTime"))
        .write.mode("overwrite")
        .partitionBy("EventDate")
        .parquet(s"$outDir/$t/batch_id=$batchId")
    }

  /** K1 sink, JDBC form — the reference's actual sink shape (bulk
    * INSERT per routed table, clickhouse.go:63-128). A
    * `jdbc:clickhouse://host:8123/db` (or `jdbc:ch:`) URL takes the
    * ClickHouse-dialect path: first-write auto-provisioning with the
    * MergeTree DDL (DateTime64(6), LowCardinality — `ClickHouseDdl`)
    * and the reference's explicit-column bulk INSERT
    * (`ClickHouseSink`); any other JDBC database uses Spark's generic
    * writer. Exercised in LogPumpSpec against embedded Derby (the only
    * JDBC engine shipped with Spark) driving both the generic path and
    * the ClickHouse executor batch cycle.
    */
  def writeRoutedJdbc(rows: DataFrame, tableMap: Map[String, String],
      defaultTable: String, url: String,
      props: java.util.Properties = new java.util.Properties()): Unit =
    foreachRoutedTable(rows, tableMap, defaultTable) { (t, df) =>
      if (ClickHouseSink.isClickHouseUrl(url)) ClickHouseSink.write(df, t, url, props)
      else df.write.mode("append").jdbc(url, t, props)
    }

  /** Idempotent micro-batch JDBC write for `foreachBatch`: a
    * `graft_batch_commits` marker table records committed batch ids,
    * so a batch REPLAYED after a successful write (the common
    * restart case: sink committed, checkpoint didn't) is skipped
    * instead of double-appended — strictly better than the reference,
    * which DROPS a batch on sink error (`batch.go:44-49`). Residual
    * window: a crash between a partial append and the marker insert
    * re-appends that batch (the non-transactional-sink limit);
    * ClickHouse absorbs it with ReplacingMergeTree (q76's semantics).
    * Returns false when the batch was skipped as already committed.
    */
  def idempotentJdbcBatch(batch: DataFrame, batchId: Long,
      tableMap: Map[String, String], defaultTable: String, url: String,
      props: java.util.Properties = new java.util.Properties(),
      pipelineId: String = "default"): Boolean = {
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      // existence via catalog metadata, NOT try-create-and-swallow: a
      // real CREATE failure (permissions, dialect DDL) must surface,
      // not resurface later as a confusing missing-table error
      val exists = Seq("GRAFT_BATCH_COMMITS", "graft_batch_commits").exists { n =>
        val rs = conn.getMetaData.getTables(null, null, n, null)
        try rs.next() finally rs.close()
      }
      if (!exists) {
        val st = conn.createStatement()
        try st.executeUpdate(markerTableDdl(url))
        finally st.close()
      }
      // markers are keyed by (pipeline, batch id): batch ids restart
      // from 0 per query/checkpoint, so a bare batch_id key would make
      // independent pipelines (or a fresh-checkpoint reprocess) skip
      // each other's batches — silent data loss
      val check = conn.prepareStatement(
        "SELECT 1 FROM graft_batch_commits WHERE pipeline = ? AND batch_id = ?")
      val committed = try {
        check.setString(1, pipelineId); check.setLong(2, batchId)
        val rs = check.executeQuery()
        try rs.next() finally rs.close()
      } finally check.close()
      if (committed) {
        // a replayed-and-skipped batch must still EXECUTE the
        // micro-batch plan: stateful operators upstream (the assembly
        // state) have to commit their stores for this batch id —
        // Spark 4 validates exactly that on restart — and the state
        // must advance past the replay even though the sink write is
        // skipped. Draining the rows does both without writing.
        batch.foreach(_ => ())
        false
      }
      else {
        writeRoutedJdbc(batch, tableMap, defaultTable, url, props)
        val mark = conn.prepareStatement(
          "INSERT INTO graft_batch_commits VALUES (?, ?)")
        try { mark.setString(1, pipelineId); mark.setLong(2, batchId); mark.executeUpdate() }
        finally mark.close()
        true
      }
    } finally conn.close()
  }

  /** Marker-table DDL per dialect: ClickHouse rejects engine-less
    * ANSI DDL (and has no PRIMARY KEY constraint clause) — it gets a
    * MergeTree ordered by the marker key; everything else takes the
    * generic form.
    */
  private[graft] def markerTableDdl(url: String): String =
    if (ClickHouseSink.isClickHouseUrl(url))
      """CREATE TABLE IF NOT EXISTS graft_batch_commits (
        |  pipeline String,
        |  batch_id Int64
        |)
        |ENGINE = MergeTree
        |ORDER BY (pipeline, batch_id)""".stripMargin
    else
      """CREATE TABLE graft_batch_commits (
        |  pipeline VARCHAR(256) NOT NULL,
        |  batch_id BIGINT NOT NULL,
        |  PRIMARY KEY (pipeline, batch_id))""".stripMargin

  private def foreachRoutedTable(rows: DataFrame,
      tableMap: Map[String, String], defaultTable: String)(
      write: (String, DataFrame) => Unit): Unit = {
    val routed = withRoute(rows, tableMap, defaultTable).cache()
    try {
      val tables = routed.select(col("__table")).distinct()
        .collect().map(_.getString(0))
      tables.foreach { t =>
        write(t, routed.filter(col("__table") === t).drop("__table"))
      }
    } finally routed.unpersist()
  }
}
