package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

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

/** One segment-key vote for q270: `dup` is true iff some PRIOR doc
  * (smaller doc_id) sharing this PassJoin segment key verified within
  * Levenshtein distance 2.
  */
final case class FuzzyFlag(doc_id: Long, dup: Boolean)

/** Per-segment-key state for incremental edit-distance dedup (q270):
  * each (segment-index : 8-gram) group keeps the docs that ever
  * carried the key — (doc_id, 24-char title, role bitmask 1=exact
  * segment, 2=shifted probe window) — and every incoming doc is
  * verified (bounded Levenshtein, candidates only) against the prior
  * entries whose role complements its own (the PassJoin lemma needs
  * an EXACT segment on one side and a ±k-shifted window on the
  * other; probe windows at shift 0 cover the exact-exact case).
  * In-batch rows sweep in doc_id order, so a batch holding both ends
  * of a pair resolves exactly like the batch operator (q201's
  * contract).
  *
  * Scale shape: state is ~40 B per (key, doc) incidence — ≤ 18 keys
  * per doc, the constant PassJoin fan-out; the stored payload IS the
  * 24-byte title (what the verify needs), so no corpus rescan ever
  * happens. RocksDB-backed. Hot keys are BOUNDED: each key retains at
  * most [[SegmentMatchProcessor.MaxEntriesPerKey]] entries, keeping
  * the SMALLEST doc_ids — deterministic (retention depends on ids,
  * never on arrival timing, unlike a processing-time TTL), and it
  * caps both state size and the per-row verify scan at O(cap).
  *
  * Completeness trade-off, documented: once a key holds `cap` entries,
  * later (larger-id) incidences on that key are not stored, so a
  * future doc whose ONLY shared key is a saturated one can miss a
  * match against a dropped entry. The cap (1024) is > 5× the densest
  * key observed at the largest fixture (195 incidences at sf0.1), so
  * fixture results are provably unaffected; under continuous 100 TB
  * ingest it trades tail-completeness on pathological shared-prefix
  * keys for bounded state — the same trade a TTL makes, minus the
  * nondeterminism.
  */
class SegmentMatchProcessor
    extends StatefulProcessor[String, (String, Long, String, Int), FuzzyFlag] {
  import SegmentMatchProcessor.MaxEntriesPerKey
  @transient private var entries: ListState[(Long, String, Int)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    entries = getHandle.getListState[(Long, String, Int)]("entries",
      Encoders.product[(Long, String, Int)], TTLConfig.NONE)

  /** Bounded Levenshtein — full DP is fine at 24 chars. */
  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => i)
    var j = 1
    while (j <= b.length) {
      var prev = dp(0); dp(0) = j
      var i = 1
      while (i <= a.length) {
        val cur = dp(i)
        dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
        i += 1
      }
      j += 1
    }
    dp(a.length)
  }

  override def handleInputRows(key: String, rows: Iterator[(String, Long, String, Int)],
      timers: TimerValues): Iterator[FuzzyFlag] = {
    val incoming = rows.toArray.sortBy(_._2)
    val stored = scala.collection.mutable.ArrayBuffer.from(entries.get())
    val before = stored.length
    val out = incoming.map { case (_, id, title, roles) =>
      val dup = stored.exists { case (pid, ptitle, proles) =>
        pid < id &&
          (((roles & 1) != 0 && (proles & 2) != 0) ||
            ((roles & 2) != 0 && (proles & 1) != 0)) &&
          lev(title, ptitle) <= 2
      }
      stored += ((id, title, roles))
      FuzzyFlag(id, dup)
    }
    // Persist with smallest-id retention: under the cap, append only
    // the new incidences (cheap path); over it, rewrite the list as
    // the `cap` smallest ids — bounded state, deterministic retention.
    if (stored.length <= MaxEntriesPerKey) {
      if (stored.length > before)
        entries.appendList(stored.drop(before).toArray)
    } else {
      entries.put(stored.sortBy(_._1).take(MaxEntriesPerKey).toArray)
    }
    out.iterator
  }
}

object SegmentMatchProcessor {
  /** Per-key state cap — > 5× the densest fixture key (195 at sf0.1);
    * see the class scaladoc for the completeness trade-off.
    */
  val MaxEntriesPerKey = 1024
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

  /** (doc_id, text) stream → per-(doc, segment-key) fuzzy-dup votes
    * (q270): the q267 PassJoin key generation as a stateless stage
    * (exact segments role 1, ±2-shifted probe windows role 2, OR'd
    * per key), then per-key verified-prior state in
    * transformWithState. Docs shorter than 24 chars have no title,
    * hence no keys, hence no votes — the q267 domain.
    */
  def fuzzyFlags(docs: DataFrame): Dataset[FuzzyFlag] = {
    val s = docs.sparkSession
    forceRocksDb(s)
    import s.implicits._
    docs.filter(length(col("text")) >= 24)
      .select(col("doc_id"), substring(col("text"), 1, 24).as("title"))
      .as[(Long, String)]
      .flatMap { case (id, t) =>
        val roles = scala.collection.mutable.LinkedHashMap[(Int, String), Int]()
        var i = 0
        while (i < 3) {
          val g = t.substring(i * 8, i * 8 + 8)
          roles((i, g)) = roles.getOrElse((i, g), 0) | 1
          var dl = -2
          while (dl <= 2) {
            val p = i * 8 + dl
            if (p >= 0 && p + 8 <= 24) {
              val pg = t.substring(p, p + 8)
              roles((i, pg)) = roles.getOrElse((i, pg), 0) | 2
            }
            dl += 1
          }
          i += 1
        }
        roles.iterator.map { case ((si, g), r) => (s"$si:$g", id, t, r) }
      }
      .groupByKey(_._1)
      .transformWithState(new SegmentMatchProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}
