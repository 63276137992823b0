package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Output row of EventStreams.runningTotals. */
final case class UserTotals(user_id: Long, n_events: Long, total_value: Double)

/** Output row of EventStreams.userStats (q193's gate form). */
final case class UserStats(user_id: Long, n_events: Long,
    sum_value: Double, max_value: Double)

/** Gate-form transformWithState processor: per-user (count, exact
  * micro-unit value sum, max). The sum state is an integer — each
  * value quantizes ONCE via BigDecimal HALF_UP at 6 dp (≡ both
  * engines' CAST(value AS DECIMAL(28,6))) — so accumulation order can
  * never perturb the rounded output, unlike a double accumulator.
  */
class UserStatsProcessor
    extends StatefulProcessor[Long, (Long, Double), UserStats] {
  @transient private var st: ValueState[(Long, Long, Double)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Double)]("stats",
      Encoders.product[(Long, Long, Double)], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[UserStats] = {
    var (n, micros, mx) =
      if (st.exists()) st.get() else (0L, 0L, Double.NegativeInfinity)
    rows.foreach { case (_, v) =>
      n += 1
      micros += java.math.BigDecimal.valueOf(v)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .movePointRight(6).longValueExact()
      if (v > mx) mx = v
    }
    st.update((n, micros, mx))
    Iterator.single(UserStats(key, n,
      new java.math.BigDecimal(micros).movePointLeft(6)
        .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue(), mx))
  }
}

/** Spark-4 `transformWithState` processor (the successor of
  * flatMapGroupsWithState: typed composable state, TTL, timers): one
  * ValueState[(count, sum)] per user, updated per batch, emitting the
  * new running totals for users seen in the batch. State lives in the
  * RocksDB state store — at scale that is what makes billions of keys
  * feasible (off-heap, spillable, changelog-checkpointed).
  */
class RunningTotalsProcessor
    extends StatefulProcessor[Long, (Long, Double), UserTotals] {
  @transient private var totals: ValueState[(Long, Double)] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    totals = getHandle.getValueState[(Long, Double)]("totals",
      Encoders.product[(Long, Double)], TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
      timers: TimerValues): Iterator[UserTotals] = {
    var (n, tot) = if (totals.exists()) totals.get() else (0L, 0.0)
    rows.foreach { case (_, v) => n += 1; tot += v }
    totals.update((n, tot))
    Iterator.single(UserTotals(key, n, tot))
  }
}

/** Streaming variants of the events analytics (SURVEY.md §2.2): the
  * SAME expressions as graft.ops.EventAnalytics batch forms, applied to
  * an unbounded source with event-time watermarks bounding state.
  *
  * The reference has no event-time handling at all (late rows are just
  * inserted; MergeTree absorbs them — SURVEY §2.1 "notably absent"), so
  * watermark policy here is engine-added value: 2-hour lateness bound,
  * state for closed windows dropped.
  *
  * At scale: windowed aggregation state is (windows × types) and
  * session state is per active user-session; both are watermark-bounded,
  * so state size tracks activity, not history.
  */
object EventStreams {

  /** Tumbling 1-hour windows per event type, 2 h watermark. */
  def hourlyByType(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Native session windows (30-min gap) per user under watermark. */
  def userSessions(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("n_events"), col("sum_value"))

  /** One as-of match: a purchase joined to the user's latest
    * at-or-before click (None when no click has been seen yet).
    */
  final case class AsofMatch(user_id: Long, purchase_id: Long,
      click_id: Option[Long], gap_us: Option[Long])

  /** Streaming as-of join — the unbounded form of
    * graft.ops.Temporal.asofJoin: per-user state holds only the latest
    * click (one tuple per user, the minimal ASOF state), purchases
    * emit immediately with the current match. In-batch ordering is
    * normalized by an explicit (ts, kind, id) sort per group, so
    * same-µs ties resolve exactly like the batch operator; clicks that
    * arrive in a later micro-batch than a purchase they precede are
    * not retro-matched (emit-once semantics — the streaming/batch
    * trade the reference's pipeline also makes).
    */
  def purchaseAsofClick(events: DataFrame): Dataset[AsofMatch] = {
    import events.sparkSession.implicits._
    events
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .as[(Long, Long, String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, it: Iterator[(Long, Long, String, java.sql.Timestamp)],
            state: GroupState[(Long, Long)]) => {
          def us(t: java.sql.Timestamp): Long =
            t.getTime * 1000 + t.getNanos / 1000 % 1000
          // clicks sort before purchases at the same µs; ascending id last
          val evs = it.toArray.sortBy { case (_, id, typ, t) =>
            (us(t), if (typ == "click") 0 else 1, id)
          }
          var last = state.getOption // (clickUs, clickId)
          val out = Array.newBuilder[AsofMatch]
          evs.foreach { case (_, id, typ, t) =>
            val u = us(t)
            if (typ == "click") last = Some((u, id))
            else out += AsofMatch(user, id, last.map(_._2), last.map(u - _._1))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  /** Stream-stream interval join: purchases joined to clicks of the
    * same user within the preceding hour, both sides watermarked so
    * the join state is bounded (clicks kept ≤ 2 h + 1 h interval,
    * purchases ≤ 2 h — Spark derives the state horizon from the
    * watermark + the time-range condition).
    */
  def clickPurchaseJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        (unix_micros(col("p_ts")) - unix_micros(col("c_ts"))).as("gap_us"))
  }

  /** Stream-static enrichment join — the most common streaming op of
    * all: each event enriched against a static dimension (customer ⨝
    * nation, pre-joined once on the batch side). The dim is BROADCAST:
    * the stream side is never shuffled and the static side never
    * re-shuffles per micro-batch — the whole enrichment is a stateless
    * map-side hash probe, so there is no state store, no watermark, and
    * latency is one broadcast build per batch over a dim that a real
    * deployment additionally `cache()`s (done in the q202 gate form).
    *
    * At scale: a dim that outgrows the broadcast threshold switches to
    * a pre-bucketed shuffled join on user_id — but customer-class dims
    * (millions of rows × narrow columns) broadcast comfortably, and
    * broadcasting is THE way to keep a 100 TB/day stream shuffle-free.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(broadcast(dim), col("user_id") === col("c_custkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("n_name"), col("value"))

  /** Streaming exact dedup by event_id within the watermark horizon —
    * the streaming form of the LLM-pipeline dedup stage: duplicates
    * arriving within 2 h are dropped, state is watermark-evicted.
    */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Per-user running (count, value-sum) through transformWithState —
    * update-mode emission per batch. Requires the RocksDB state store
    * provider (transformWithState's backing store), set here on the
    * source's session.
    */
  def runningTotals(events: DataFrame): Dataset[UserTotals] = {
    val s = events.sparkSession
    // default to RocksDB only while the session still runs the stock
    // HDFS-backed provider (the conf always reports its default, so
    // "unset" is indistinguishable from it — and transformWithState
    // cannot run on it anyway); an explicitly configured non-default
    // provider is preserved rather than silently overridden
    val key = "spark.sql.streaming.stateStore.providerClass"
    if (s.conf.getOption(key).forall(_.endsWith("HDFSBackedStateStoreProvider")))
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** q193's processor applied to a streaming events frame (RocksDB
    * store forced exactly as in runningTotals).
    */
  def userStats(events: DataFrame): Dataset[UserStats] = {
    val s = events.sparkSession
    val key = "spark.sql.streaming.stateStore.providerClass"
    if (s.conf.getOption(key).forall(_.endsWith("HDFSBackedStateStoreProvider")))
      s.conf.set(key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .as[(Long, Double)]
      .groupByKey(_._1)
      .transformWithState(new UserStatsProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
