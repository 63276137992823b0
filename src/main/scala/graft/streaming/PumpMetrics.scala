package graft.streaming

import java.util.UUID

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener.{QueryIdleEvent, QueryProgressEvent, QueryStartedEvent, QueryTerminatedEvent}

/** Operational metrics for the pump — rows, batches, and lag per
  * streaming query, the observability surface the reference's zap
  * logging effectively provided (per-batch row counts and send timings
  * in `batch.go`/`main.go` log lines), exposed as a
  * StreamingQueryListener whose counters any deployment can scrape,
  * export, or assert on.
  *
  * Counters are keyed by the query's stable `id` (survives restarts;
  * `runId` does not), so a session hosting several pumps — or a spec
  * sharing its session with other suites — reads only its own queries.
  * Spark posts QueryIdleEvent (not progress) for no-data triggers, so
  * `batches` counts data-carrying micro-batches.
  */
final class PumpMetrics private[streaming] () extends StreamingQueryListener {

  /** Immutable per-query counter snapshot. `lastTriggerMs` is the last
    * micro-batch's triggerExecution wall time — the processing-lag
    * signal (a pump keeping up shows trigger time ≪ trigger interval).
    */
  final case class QueryStats(name: String, batches: Long, rows: Long,
      lastBatchRows: Long, lastTriggerMs: Long, idleEvents: Long)

  private val byQuery = TrieMap.empty[UUID, QueryStats]

  private def zero(name: String) = QueryStats(name, 0L, 0L, 0L, 0L, 0L)

  override def onQueryStarted(event: QueryStartedEvent): Unit =
    byQuery.putIfAbsent(event.id, zero(Option(event.name).getOrElse(event.id.toString)))

  override def onQueryProgress(event: QueryProgressEvent): Unit = {
    val p = event.progress
    val trig = Option(p.durationMs.get("triggerExecution"))
      .map(_.longValue).getOrElse(0L)
    byQuery.updateWith(p.id) { prev =>
      val b = prev.getOrElse(zero(Option(p.name).getOrElse(p.id.toString)))
      Some(b.copy(batches = b.batches + 1, rows = b.rows + p.numInputRows,
        lastBatchRows = p.numInputRows, lastTriggerMs = trig))
    }
  }

  override def onQueryIdle(event: QueryIdleEvent): Unit =
    byQuery.updateWith(event.id)(_.map(s => s.copy(idleEvents = s.idleEvents + 1)))

  override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()

  def snapshot: Map[UUID, QueryStats] = byQuery.readOnlySnapshot().toMap

  def stats(id: UUID): Option[QueryStats] = byQuery.get(id)

  def totalRows(ids: Iterable[UUID]): Long =
    ids.iterator.flatMap(byQuery.get).map(_.rows).sum

  def totalBatches(ids: Iterable[UUID]): Long =
    ids.iterator.flatMap(byQuery.get).map(_.batches).sum

  /** One log line per query — the shutdown report PumpMain prints. */
  def report(ids: Iterable[UUID]): String =
    ids.iterator.flatMap(byQuery.get).map(s =>
      s"pump=${s.name} batches=${s.batches} rows=${s.rows} " +
        s"last_batch_rows=${s.lastBatchRows} last_trigger_ms=${s.lastTriggerMs}")
      .mkString("\n")
}

object PumpMetrics {
  /** Attach a fresh listener to the session's streaming bus. */
  def attach(spark: SparkSession): PumpMetrics = {
    val m = new PumpMetrics
    spark.streams.addListener(m)
    m
  }

  def detach(spark: SparkSession, m: PumpMetrics): Unit =
    spark.streams.removeListener(m)
}
