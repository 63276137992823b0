package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.DateTimeUtils
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.ingest.RecordAssembler
import graft.model.LogEntry
import graft.parse.TechLogParser

/** DataSource V2 connector for 1C technological logs: the reference's
  * ingest (dir walk → multi-line record assembly → header/SQL/Context
  * parse, SURVEY §2.1 S1-S3/P1-P6) surfaced as a first-class Spark
  * source —
  *
  *   spark.read.format("techlog").load("/logs")
  *
  * Scan shape: rotated .log files bin-packed into InputPartitions by
  * cumulative size (`maxPartitionBytes`, default 128 MB — task count
  * tracks bytes, not file count; 1C rotates hourly so files are
  * bounded and the plan stays narrow and shuffle-free like
  * RecordAssembler.readBatch), with V2 column pruning
  * (SupportsPushDownRequiredColumns) and equality/not-null filter
  * pushdown (SupportsPushDownFilters): a filtered `select(Component)`
  * parses each record once and materializes only passing rows with
  * only the pruned columns. Files are opened through the Hadoop FS
  * API, so the same connector reads local paths here and any
  * HDFS-compatible store on a real cluster.
  */
class TechLogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "techlog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    TechLogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new TechLogTable(properties.asScala.toMap)
}

object TechLogSource {
  /** LogEntry's 25 columns (InsertedAt surfaces as TIMESTAMP). */
  val schema: StructType = org.apache.spark.sql.Encoders.product[LogEntry].schema
    .asInstanceOf[StructType]

  /** One Hadoop Configuration per JVM: construction parses the
    * *-default.xml resources under a class-level lock, so a fresh
    * Configuration per partition serializes every concurrent task on
    * it (measured 6.6 s vs 0.9 s for the whole sf0.1 scan).
    */
  private[sources] lazy val hadoopConf = new org.apache.hadoop.conf.Configuration()

  /** Hadoop conf for a scan: the shared base plus any `fs.*` /
    * `hadoop.*` reader options (the DSv2 way to carry credentials and
    * endpoints to executors — the session's spark.hadoop.* values are
    * not reachable from a TableProvider, so remote stores configure
    * the connector via options).
    */
  /** The serializable subset of options the executors need. */
  private[sources] def fsOptions(conf: Map[String, String]): Map[String, String] =
    conf.filter { case (k, _) => k.startsWith("fs.") || k.startsWith("hadoop.") }

  private[sources] def hadoopConfFor(conf: Map[String, String]): org.apache.hadoop.conf.Configuration = {
    val fsOpts = fsOptions(conf)
    if (fsOpts.isEmpty) hadoopConf
    else {
      val c = new org.apache.hadoop.conf.Configuration(hadoopConf)
      fsOpts.foreach { case (k, v) =>
        c.set(k.stripPrefix("hadoop."), v) }
      c
    }
  }

  private[sources] def listLogFiles(conf: Map[String, String]): Seq[(String, Long)] = {
    val root = conf.getOrElse("path",
      throw new IllegalArgumentException("techlog source requires a path"))
    val suffix = conf.getOrElse("suffix", ".log")
    val uri = new Path(root).toUri
    val out =
      if (uri.getScheme == null || uri.getScheme == "file") {
        // local fast path: Hadoop's RawLocalFileSystem (no native lib)
        // FORKS A SHELL PER FILE to load permission bits during
        // listing — ~8 ms × every rotated file, on the driver, every
        // plan. NIO walks the tree without touching permissions.
        val rootPath = java.nio.file.Paths.get(uri.getPath)
        val stream = java.nio.file.Files.walk(rootPath)
        try stream.iterator().asScala
          .filter(p => p.toString.endsWith(suffix) &&
            java.nio.file.Files.isRegularFile(p))
          .map(p => (p.toString, java.nio.file.Files.size(p)))
          .toVector
        finally stream.close()
      } else {
        val fs = FileSystem.get(uri, hadoopConfFor(conf))
        val it = fs.listFiles(new Path(root), /* recursive = */ true)
        val b = Seq.newBuilder[(String, Long)]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && f.getPath.getName.endsWith(suffix))
            b += ((f.getPath.toString, f.getLen))
        }
        b.result()
      }
    out.sortBy(_._1)
  }

  /** Bin-pack contiguous files into partitions by cumulative COSTED
    * size: actual bytes plus `openCostInBytes` padding per file
    * (defaults match the built-in file source: 128 MB partitions, 4 MB
    * open cost). One partition per tiny file would schedule a task per
    * hourly rotation; packing by bytes alone would serialize thousands
    * of small files into one task — the open-cost padding balances
    * both, scaling task count with max(bytes, file count).
    */
  private[sources] def packPartitions(files: Seq[(String, Long)],
      conf: Map[String, String]): Array[InputPartition] = {
    val target = conf.getOrElse("maxPartitionBytes", s"${128L * 1024 * 1024}").toLong
    val openCost = conf.getOrElse("openCostInBytes", s"${4L * 1024 * 1024}").toLong
    val parts = Array.newBuilder[InputPartition]
    val cur = Seq.newBuilder[String]
    var cost = 0L
    var n = 0
    files.foreach { case (p, len) =>
      if (n > 0 && cost + len + openCost > target) {
        parts += TechLogFilePartition(cur.result()); cur.clear(); cost = 0L; n = 0
      }
      cur += p; cost += len + openCost; n += 1
    }
    if (n > 0) parts += TechLogFilePartition(cur.result())
    parts.result()
  }
}

final class TechLogTable(conf: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"techlog(${conf.getOrElse("path", "?")})"
  override def schema(): StructType = TechLogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TechLogScanBuilder(conf ++ options.asScala)
}

final class TechLogScanBuilder(conf: Map[String, String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters {
  private var required: StructType = TechLogSource.schema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept equality and not-null predicates: the reader evaluates
    * them on the parsed record before any row is materialized, so
    * Spark drops its post-scan Filter for them entirely.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    // never claim the TimestampType column: the source Filter carries
    // java.sql.Timestamp while the record field is java.time.Instant,
    // so a reader-side == comparison would silently drop every row
    def pushable(a: String): Boolean =
      TechLogSource.schema.fieldNames.contains(a) &&
        TechLogSource.schema(a).dataType != TimestampType
    val (ours, rest) = filters.partition {
      case EqualTo(a, _) => pushable(a)
      case IsNotNull(a) => pushable(a)
      case _ => false
    }
    pushed = ours
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new TechLogScan(conf, required, pushed)
}

final class TechLogScan(conf: Map[String, String], required: StructType,
    pushed: Array[Filter] = Array.empty)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String =
    s"techlog PushedFilters: [${pushed.mkString(", ")}]"
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    TechLogSource.packPartitions(TechLogSource.listLogFiles(conf), conf)
  override def createReaderFactory(): PartitionReaderFactory =
    new TechLogReaderFactory(required.fieldNames, pushed, TechLogSource.fsOptions(conf))
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new TechLogMicroBatchStream(conf, required, pushed)
}

/** File-count offset: 1C rotates hourly with name-sorted `YYMMDDHH.log`
  * files, so the sorted listing only ever GROWS AT THE END — an offset
  * of N means "the first N files are committed". Mirrors the
  * reference's checkpoint semantics at file granularity (a rotated
  * file is immutable → exactly-once per file; the current-hour file is
  * picked up once it appears — the same widening as the batch path,
  * SURVEY §7.4).
  */
final case class TechLogOffset(fileCount: Int) extends Offset {
  override def json(): String = s"""{"fileCount":$fileCount}"""
}

final class TechLogMicroBatchStream(conf: Map[String, String],
    required: StructType, pushed: Array[Filter] = Array.empty)
    extends MicroBatchStream with SupportsTriggerAvailableNow {
  // Trigger.AvailableNow: freeze the target at query start so the run
  // drains exactly the then-visible backlog (in admission-control-
  // bounded batches) and terminates, ignoring files that keep arriving
  @volatile private var availableNowTarget: Option[Int] = None
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(TechLogSource.listLogFiles(conf).size)
  override def initialOffset(): Offset = TechLogOffset(0)
  override def latestOffset(): Offset =
    TechLogOffset(TechLogSource.listLogFiles(conf).size)
  /** Admission control: `maxFilesPerTrigger` caps how many newly
    * rotated files one micro-batch admits — backlog after downtime
    * drains in bounded batches instead of one giant catch-up batch
    * (the reference's analogue is its bounded in-flight buffer).
    */
  override def getDefaultReadLimit: ReadLimit =
    conf.get("maxFilesPerTrigger")
      .map(n => ReadLimit.maxFiles(n.toInt))
      .getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val all = availableNowTarget
      .getOrElse(TechLogSource.listLogFiles(conf).size)
    val s = start.asInstanceOf[TechLogOffset].fileCount
    limit match {
      case mf: ReadMaxFiles => TechLogOffset(math.min(all, s + mf.maxFiles()))
      case _ => TechLogOffset(all)
    }
  }
  override def deserializeOffset(json: String): Offset =
    TechLogOffset("\\d+".r.findFirstIn(json).get.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TechLogOffset].fileCount
    val e = end.asInstanceOf[TechLogOffset].fileCount
    TechLogSource.packPartitions(TechLogSource.listLogFiles(conf).slice(s, e), conf)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TechLogReaderFactory(required.fieldNames, pushed, TechLogSource.fsOptions(conf))
}

final case class TechLogFilePartition(paths: Seq[String]) extends InputPartition

final class TechLogReaderFactory(requiredCols: Array[String],
    pushed: Array[Filter], fsOpts: Map[String, String])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TechLogFileReader(
      partition.asInstanceOf[TechLogFilePartition].paths, requiredCols, pushed,
      fsOpts)
}

/** Reads one rotated log file: record assembly + parse, then projects
  * the pruned columns into InternalRows.
  */
final class TechLogFileReader(paths: Seq[String], requiredCols: Array[String],
    pushed: Array[Filter], fsOpts: Map[String, String] = Map.empty)
    extends PartitionReader[InternalRow] {

  // pushed-predicate evaluation on the parsed record, before any row
  // is materialized (equality + not-null; LogEntry fields are never
  // null, so IsNotNull is vacuously true)
  private val checks: Array[LogEntry => Boolean] = pushed.map {
    case EqualTo(a, v) =>
      val idx = TechLogSource.schema.fieldIndex(a)
      (e: LogEntry) => e.productElement(idx) == v
    case IsNotNull(_) => (_: LogEntry) => true
    case f => throw new IllegalStateException(s"unpushable filter $f")
  }

  private val records: Iterator[LogEntry] = {
    val hconf = TechLogSource.hadoopConfFor(fsOpts)
    paths.iterator.flatMap { path =>
      val uri = new Path(path).toUri
      val content = if (uri.getScheme == null || uri.getScheme == "file") {
        // local fast path (see listLogFiles: RawLocalFileSystem forks)
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(uri.getPath)),
          java.nio.charset.StandardCharsets.UTF_8)
      } else {
        val fs = FileSystem.get(uri, hconf)
        val in = fs.open(new Path(path))
        try {
          new String(org.apache.commons.io.IOUtils.toByteArray(in),
            java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      }
      val lines = content.split("\n", -1)
      val trimmed = if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
      val base = path.substring(path.lastIndexOf('/') + 1)
      RecordAssembler.splitRecords(trimmed.iterator.map(_.stripSuffix("\r")))
        .map(ls => TechLogParser.parseLine(ls).copy(Timestamp = base))
    }
  }

  // pruned-column projectors, bound once per reader
  private val all = TechLogSource.schema
  private val projectors: Array[LogEntry => Any] = requiredCols.map { name =>
    val idx = all.fieldIndex(name)
    val isTs = all.fields(idx).dataType == TimestampType
    (e: LogEntry) => {
      val v = e.productElement(idx)
      v match {
        case s: String => UTF8String.fromString(s)
        case i: java.time.Instant if isTs => DateTimeUtils.instantToMicros(i)
        case other => other
      }
    }
  }

  private var current: InternalRow = _

  override def next(): Boolean = {
    while (records.hasNext) {
      val e = records.next()
      if (checks.forall(_(e))) {
        val row = new GenericInternalRow(projectors.length)
        var i = 0
        while (i < projectors.length) { row.update(i, projectors(i)(e)); i += 1 }
        current = row
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
