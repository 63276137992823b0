package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** One band-membership vote: `dup` is true iff some PRIOR doc (smaller
  * doc_id, seen in this or an earlier micro-batch) shares this LSH band.
  */
final case class BandFlag(doc_id: Long, dup: Boolean)

/** Per-band min-doc_id state for incremental MinHash-LSH near-dup
  * detection. Each (band_no, band-value) group keeps ONE long — the
  * smallest doc_id ever seen in the band — and every incoming row is
  * flagged against it. In-batch rows are sorted by doc_id before the
  * sweep, so a batch containing both a doc and its near-dup resolves
  * exactly like the batch operator (the smaller id is "prior"), and the
  * split of the stream into micro-batches cannot change any flag as
  * long as arrival order respects doc_id order across batches (the
  * append-only ingest contract; the batch q27 composition is the
  * arrival-order-free form of the same statistic).
  *
  * Scale shape: state is 8 bytes per DISTINCT (band_no, band) — the
  * banded twin of q159's key-dedup state, living in RocksDB (off-heap,
  * changelog-checkpointed); an unbounded corpus bounds it with TTL.
  * Nothing here shuffles texts or signatures: only the (band-key,
  * doc_id) pairs — exactly the bytes the batch LSH self-join moves.
  */
class BandMinIdProcessor
    extends StatefulProcessor[String, (String, Long), BandFlag] {
  @transient private var minId: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    minId = getHandle.getValueState[Long]("minId",
      Encoders.scalaLong, TTLConfig.NONE)
  override def handleInputRows(key: String, rows: Iterator[(String, Long)],
      timers: TimerValues): Iterator[BandFlag] = {
    val ids = rows.map(_._2).toArray.sorted
    var m = if (minId.exists()) minId.get() else Long.MaxValue
    val out = ids.map { id =>
      val flag = BandFlag(id, m < id)
      if (id < m) m = id
      flag
    }
    minId.update(m)
    out.iterator
  }
}

/** Streaming incremental near-dup dedup — the continuous-ingest form of
  * the batch MinHash+LSH family (graft.ops.Dedup q27/q28): documents
  * stream in, each is flagged `is_near_dup` iff it shares an LSH band
  * with any prior (smaller-id) document, against state that persists
  * across micro-batches. This is the operator a continuously ingested
  * 100 TB corpus needs: new data is deduplicated against everything
  * already admitted WITHOUT rescanning it.
  *
  * Pipeline: stateless signature stage (same 16-hash affine MinHash
  * family and 8×2 banding as batch — shared code, so stream and batch
  * can never drift) → (band-key, doc_id) shuffle → per-band min-id
  * state in transformWithState → per-doc OR over its 8 band votes.
  */
object DedupStreams {

  private def forceRocksDb(s: org.apache.spark.sql.SparkSession): Unit = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    if (s.conf.getOption(key).forall(_.endsWith("HDFSBackedStateStoreProvider")))
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
  }

  /** (doc_id, text) stream → per-(doc, band) dup votes. Docs with < 3
    * words have no shingles, hence no bands, hence no votes — the same
    * domain as the batch q27 signature stage.
    */
  def bandFlags(docs: DataFrame): Dataset[BandFlag] = {
    val s = docs.sparkSession
    forceRocksDb(s)
    import s.implicits._
    graft.ops.Dedup.bandsOf(graft.ops.Dedup.signatures(docs))
      .select(concat_ws(":", col("band_no"), col("band")).as("k"),
        col("doc_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .transformWithState(new BandMinIdProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
