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
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
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
  * Scan shape: one InputPartition per .log file (1C rotates hourly, so
  * files are bounded and file count IS the parallelism — same narrow,
  * shuffle-free plan as RecordAssembler.readBatch), with V2 column
  * pruning (SupportsPushDownRequiredColumns): a `select(Component)`
  * reads and parses each record once but materializes only the pruned
  * columns into rows. Files are opened through the Hadoop FS API, so
  * the same connector reads local paths here and any HDFS-compatible
  * store on a real cluster.
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

  private[sources] def listLogFiles(conf: Map[String, String]): Seq[String] = {
    val root = conf.getOrElse("path",
      throw new IllegalArgumentException("techlog source requires a path"))
    val suffix = conf.getOrElse("suffix", ".log")
    val fs = FileSystem.get(new java.net.URI(new Path(root).toUri.toString),
      new org.apache.hadoop.conf.Configuration())
    val it = fs.listFiles(new Path(root), /* recursive = */ true)
    val out = Seq.newBuilder[String]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(suffix))
        out += f.getPath.toString
    }
    out.result().sorted
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
    val (ours, rest) = filters.partition {
      case EqualTo(a, _) => TechLogSource.schema.fieldNames.contains(a)
      case IsNotNull(a) => TechLogSource.schema.fieldNames.contains(a)
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
    TechLogSource.listLogFiles(conf).map(TechLogFilePartition(_): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new TechLogReaderFactory(required.fieldNames, pushed)
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
    extends MicroBatchStream {
  override def initialOffset(): Offset = TechLogOffset(0)
  override def latestOffset(): Offset =
    TechLogOffset(TechLogSource.listLogFiles(conf).size)
  override def deserializeOffset(json: String): Offset =
    TechLogOffset("\\d+".r.findFirstIn(json).get.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[TechLogOffset].fileCount
    val e = end.asInstanceOf[TechLogOffset].fileCount
    TechLogSource.listLogFiles(conf).slice(s, e)
      .map(TechLogFilePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new TechLogReaderFactory(required.fieldNames, pushed)
}

final case class TechLogFilePartition(path: String) extends InputPartition

final class TechLogReaderFactory(requiredCols: Array[String],
    pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TechLogFileReader(
      partition.asInstanceOf[TechLogFilePartition].path, requiredCols, pushed)
}

/** Reads one rotated log file: record assembly + parse, then projects
  * the pruned columns into InternalRows.
  */
final class TechLogFileReader(path: String, requiredCols: Array[String],
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

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
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, new org.apache.hadoop.conf.Configuration())
    val in = fs.open(p)
    val content = try {
      new String(org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
    val lines = content.split("\n", -1)
    val trimmed = if (lines.nonEmpty && lines.last.isEmpty) lines.init else lines
    val base = path.substring(path.lastIndexOf('/') + 1)
    RecordAssembler.splitRecords(trimmed.iterator.map(_.stripSuffix("\r")))
      .map(ls => TechLogParser.parseLine(ls).copy(Timestamp = base))
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
