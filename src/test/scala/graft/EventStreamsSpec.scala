package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

class EventStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked hourly aggregation finalizes windows once the watermark passes") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.hourlyByType(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_hourly").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:20:00"), 2, "click", 2.0),
        Ev(3, ts("2024-01-01 10:40:00"), 1, "view", 3.0))
      q.processAllAvailable()
      // append mode: nothing final yet (watermark still at epoch)
      assert(spark.table("es_hourly").count() == 0)

      // an event far enough ahead pushes the watermark past 11:00+2h
      in.addData(Ev(4, ts("2024-01-01 14:00:00"), 3, "click", 4.0))
      q.processAllAvailable()
      in.addData(Ev(5, ts("2024-01-01 14:00:01"), 3, "click", 4.0))
      q.processAllAvailable()
      val rows = spark.table("es_hourly")
        .select(date_format(col("hour_start"), "HH:mm").as("h"),
          col("event_type"), col("n"), col("sum_value"))
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
        .toSet
      assert(rows == Set(("10:00", "click", 2L, 3.0), ("10:00", "view", 1L, 3.0)))
    } finally q.stop()
  }

  test("transformWithState accumulates per-user totals across batches (RocksDB store)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val in = MemoryStream[Ev]
    val q = EventStreams.runningTotals(in.toDF())
      .writeStream.outputMode("update")
      .format("memory").queryName("es_tws").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 2.0),
        Ev(2, ts("2024-01-01 10:01:00"), 1, "click", 3.0),
        Ev(3, ts("2024-01-01 10:02:00"), 2, "view", 1.0))
      q.processAllAvailable()
      in.addData(Ev(4, ts("2024-01-01 11:00:00"), 1, "click", 5.0))
      q.processAllAvailable()
      // latest update per user wins: user 1 saw 3 events totaling 10.0,
      // the ValueState carried (2, 5.0) across the batch boundary
      val latest = spark.table("es_tws")
        .groupBy(col("user_id"))
        .agg(max(struct(col("n_events"), col("total_value"))).as("m"))
        .select(col("user_id"), col("m.n_events"), col("m.total_value"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 3L, 10.0), (2L, 1L, 1.0)))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("dropDuplicatesWithinWatermark drops replays of the same event_id") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.dedupedEvents(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_dedup").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(1, ts("2024-01-01 10:00:05"), 1, "click", 1.0), // replay
        Ev(2, ts("2024-01-01 10:01:00"), 2, "view", 2.0))
      q.processAllAvailable()
      in.addData(Ev(1, ts("2024-01-01 10:02:00"), 1, "click", 1.0)) // replay again
      q.processAllAvailable()
      val ids = spark.table("es_dedup").select("event_id").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming session windows close after the gap + watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.userSessions(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_sessions").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "click", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), 7, "click", 2.0), // same session
        Ev(3, ts("2024-01-01 11:30:00"), 7, "click", 4.0)) // new session
      q.processAllAvailable()
      in.addData(Ev(4, ts("2024-01-01 15:00:00"), 8, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      in.addData(Ev(5, ts("2024-01-01 15:00:01"), 8, "view", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("es_sessions")
        .filter(col("user_id") === 7)
        .select(col("n_events"), col("sum_value"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(sessions == Set((2L, 3.0), (1L, 4.0)))
    } finally q.stop()
  }

  test("stream-stream interval join pairs purchases with same-user clicks in the past hour") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.clickPurchaseJoin(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_ssjoin").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:30:00"), 1, "purchase", 1.0), // joins click 1
        Ev(3, ts("2024-01-01 09:00:00"), 2, "click", 1.0),
        Ev(4, ts("2024-01-01 10:30:00"), 2, "purchase", 1.0)) // click too old
      q.processAllAvailable()
      in.addData(Ev(9, ts("2024-01-01 15:00:00"), 3, "view", 1.0)) // advance watermark
      q.processAllAvailable()
      val rows = spark.table("es_ssjoin")
        .collect().map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"),
          r.getAs[Long]("gap_us"))).toSet
      assert(rows == Set((2L, 1L, 1800000000L)))
    } finally q.stop()
  }

  test("streaming as-of join matches purchases to the latest prior click across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = EventStreams.purchaseAsofClick(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_asof").start()
    try {
      // batch 1: click then purchase (same batch, out of submission order),
      // plus a purchase with no click at all for user 9
      in.addData(
        Ev(11, ts("2024-01-01 10:05:00"), 1, "purchase", 1.0),
        Ev(10, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(20, ts("2024-01-01 10:00:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      // batch 2: purchase only — must match the click held in state
      in.addData(Ev(12, ts("2024-01-01 11:00:00"), 1, "purchase", 1.0))
      q.processAllAvailable()
      val rows = spark.table("es_asof")
        .collect().map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"),
          Option(r.getAs[java.lang.Long]("click_id")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("gap_us")).map(_.longValue))).toSet
      assert(rows == Set(
        (1L, 11L, Some(10L), Some(300000000L)), // 5 min after the click
        (1L, 12L, Some(10L), Some(3600000000L)), // cross-batch state match
        (9L, 20L, None, None))) // no click ever seen
    } finally q.stop()
  }

  test("stream-static enrichment broadcasts the dim: no shuffle in any micro-batch plan") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val dim = Seq((1L, "BUILDING", "FRANCE"), (2L, "MACHINERY", "KENYA"))
      .toDF("c_custkey", "c_mktsegment", "n_name")
    val in = MemoryStream[Ev]
    // the foreachBatch dataset wraps an already-computed RDD, so the
    // micro-batch join plan is only visible through the query's explain
    def lastPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
      val bos = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(bos)) { q.explain() }
      bos.toString
    }
    val q = EventStreams.enrichWithDim(
        in.toDF().select(col("event_id"), col("user_id"), col("value")), dim)
      .writeStream.outputMode("append")
      .format("memory").queryName("es_enrich").start()
    try {
      in.addData(Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val plan1 = lastPlan(q)
      in.addData(Ev(2, ts("2024-01-01 11:00:00"), 2, "view", 2.0),
        Ev(3, ts("2024-01-01 11:01:00"), 5, "view", 3.0)) // no dim row → dropped
      q.processAllAvailable()
      val plan2 = lastPlan(q)
      Seq(plan1, plan2).foreach { p =>
        assert(p.contains("BroadcastHashJoin"),
          s"enrichment must be a broadcast hash join:\n$p")
        assert(!p.contains("ShuffleExchange"),
          s"neither side may shuffle — per-batch static re-shuffle is the bug this pins:\n$p")
      }
      val rows = spark.table("es_enrich")
        .collect().map(r => (r.getAs[Long]("event_id"),
          r.getAs[String]("c_mktsegment"), r.getAs[String]("n_name"))).toSet
      assert(rows == Set((1L, "BUILDING", "FRANCE"), (2L, "MACHINERY", "KENYA")))
    } finally q.stop()
  }

  test("q274: two stateful operators in ONE plan; append fence holds tail windows back") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def lastPlan(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
      val bos = new java.io.ByteArrayOutputStream
      Console.withOut(new java.io.PrintStream(bos)) { q.explain() }
      bos.toString
    }
    val in = MemoryStream[Ev]
    val q = graft.ops.EventAnalytics.chainedJoinWindowAgg(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("es_chained").start()
    try {
      in.addData(
        // early pair — window 10:00-11:00, far below any fence: emits
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "purchase", 1.0),
        // discriminator pair — window 13:00-14:00 (end 14:00)
        Ev(3, ts("2024-01-01 13:30:00"), 3, "click", 1.0),
        Ev(4, ts("2024-01-01 13:35:00"), 3, "purchase", 1.0),
        // tail pair at the max event time 15:05 — window 15:00-16:00
        // stays open under ANY fence; advances both watermarks to 14:05
        Ev(5, ts("2024-01-01 15:05:00"), 9, "click", 1.0),
        Ev(6, ts("2024-01-01 15:05:00"), 9, "purchase", 1.0))
      q.processAllAvailable()
      val plan = lastPlan(q)
      assert(plan.contains("StreamingSymmetricHashJoin"),
        s"chained query must contain the stream-stream join:\n$plan")
      assert(plan.contains("StateStoreSave"),
        s"chained query must contain the stateful windowed agg:\n$plan")
      // watermark 14:05, MINUS the 10-min interval the join's state
      // watermark subtracts → fence 13:55: the 13:00 window (end
      // 14:00) is still OPEN — only the early window emits. This pins
      // that the propagated watermark is the join-adjusted one, not
      // the raw input watermark.
      val emitted1 = spark.table("es_chained")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(emitted1 == Set(("2024-01-01 10:00:00.000000", 1L)),
        s"fence must hold the 13:00 window at watermark 14:05: $emitted1")
      // push the watermark to 15:00 (fence 14:50): the 13:00 window
      // closes and emits exactly once; the 15:00 tail stays open
      in.addData(
        Ev(7, ts("2024-01-01 16:00:00"), 7, "click", 1.0),
        Ev(8, ts("2024-01-01 16:00:00"), 7, "purchase", 1.0))
      q.processAllAvailable()
      val emitted2 = spark.table("es_chained")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(emitted2 == Set(
        ("2024-01-01 10:00:00.000000", 1L),
        ("2024-01-01 13:00:00.000000", 1L)),
        s"13:00 must emit once closed; 15:00 must stay open: $emitted2")
    } finally q.stop()
  }

  test("q310: left-outer null emission fence is STRICT p_ts < min-side watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = graft.ops.EventAnalytics.leftOuterAttribution(in.toDF())
      .select(col("user_id"), col("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("es_louter").start()
    try {
      in.addData(
        // matched pair (user 1): inner semantics, emits on match
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "purchase", 1.0),
        // max click 10:00, max purchase 12:00 → watermark = min − 1 h
        // = 09:00 after this batch
        Ev(5, ts("2024-01-01 12:00:00"), 9, "purchase", 1.0),
        // unmatched AT the fence (09:00 exactly): strict < holds it
        Ev(3, ts("2024-01-01 09:00:00"), 2, "purchase", 1.0),
        // unmatched below the fence: must emit with a null click
        Ev(4, ts("2024-01-01 08:59:00"), 3, "purchase", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("es_louter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted == Set((1L, 2L, 1L), (3L, 4L, -1L)),
        s"expected the matched pair + exactly the sub-fence null: $emitted")
      // advance the click-side max to 10:05 → watermark 09:05: the
      // at-the-fence purchase is now strictly below and must emit
      in.addData(Ev(6, ts("2024-01-01 10:05:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val emitted2 = spark.table("es_louter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted2 == Set((1L, 2L, 1L), (3L, 4L, -1L), (2L, 3L, -1L)),
        s"the 09:00 purchase must emit once strictly below the fence: $emitted2")
    } finally q.stop()
  }

  test("q314: full-outer per-side fences — purchases evict at wm, clicks at wm - 10 min") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val q = graft.ops.EventAnalytics.outerAttribution(in.toDF(), "fullOuter")
      .select(col("user_id"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("click_id"), lit(-1L)).as("click_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("es_fouter").start()
    try {
      in.addData(
        // matched pair (user 1)
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "purchase", 1.0),
        // max purchase 12:00 → wm = min(10:00, 12:00) − 1 h = 09:00
        Ev(5, ts("2024-01-01 12:00:00"), 9, "purchase", 1.0),
        // purchase-side boundary: AT 09:00 held, 08:59 emits
        Ev(3, ts("2024-01-01 09:00:00"), 2, "purchase", 1.0),
        Ev(4, ts("2024-01-01 08:59:00"), 3, "purchase", 1.0),
        // click-side boundary (fence 08:50): AT held, 08:49 emits
        Ev(6, ts("2024-01-01 08:50:00"), 11, "click", 1.0),
        Ev(7, ts("2024-01-01 08:49:00"), 12, "click", 1.0))
      q.processAllAvailable()
      val emitted = spark.table("es_fouter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted == Set((1L, 2L, 1L), (3L, 4L, -1L), (12L, -1L, 7L)),
        s"expected the pair + one sub-fence null per side: $emitted")
      // advance max click to 10:05 → wm 09:05: the 09:00 purchase and
      // the 08:50 click are now strictly below their fences
      in.addData(Ev(8, ts("2024-01-01 10:05:00"), 8, "click", 1.0))
      q.processAllAvailable()
      val emitted2 = spark.table("es_fouter")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(emitted2 == Set((1L, 2L, 1L), (3L, 4L, -1L), (12L, -1L, 7L),
        (2L, 3L, -1L), (11L, -1L, 6L)),
        s"both at-the-fence rows must emit once strictly below: $emitted2")
    } finally q.stop()
  }

  test("q275: append-mode sessions emit exactly once on closure; open sessions stay held") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Ev]
    val agg = in.toDF()
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        col("n_events"))
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("es_sessions_append").start()
    try {
      in.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0), // merges: gap 10 min
        Ev(3, ts("2024-01-01 13:00:00"), 2, "click", 1.0)) // pushes wm to 12:00
      q.processAllAvailable()
      def emitted = spark.table("es_sessions_append")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      // user 1's session closed at 10:40 < wm 12:00 → emitted once;
      // user 2's (closes 13:30) still open
      assert(emitted.sorted == Seq((1L, "2024-01-01 10:00:00.000000", 2L)))
      in.addData(
        Ev(4, ts("2024-01-01 12:30:00"), 1, "click", 1.0), // new session, closes 13:00
        Ev(5, ts("2024-01-01 15:00:00"), 3, "click", 1.0)) // pushes wm to 14:00
      q.processAllAvailable()
      // sessions closing before 14:00 emit; the first session is NOT
      // re-emitted; user 3's (closes 15:30) stays held
      assert(emitted.sorted == Seq(
        (1L, "2024-01-01 10:00:00.000000", 2L),
        (1L, "2024-01-01 12:30:00.000000", 1L),
        (2L, "2024-01-01 13:00:00.000000", 1L)))
    } finally q.stop()
  }

  test("q202 streamed enrichment matches the batch join exactly") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.EventAnalytics.streamEnrich(spark, sf)
      .collect().toSeq
    val batch = graft.util.Tables.events(spark, sf)
      .select(col("event_id"), col("user_id"), col("value"))
      .join(graft.util.Tables.customer(spark, sf),
        col("user_id") === col("c_custkey"))
      .join(graft.util.Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("c_mktsegment"),
        col("n_name"), col("value"))
      .orderBy(col("event_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q159 streaming dedup emits exactly the batch-distinct user set") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.Dedup.streamDedup(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val exact = graft.util.Tables.events(spark, sf)
      .select(col("user_id")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(streamed == exact)
    assert(streamed.size < graft.util.Tables.events(spark, sf).count(),
      "the dedup state must actually drop repeat keys")
  }

  test("q164 streaming per-user totals reproduce the batch aggregation exactly") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.EventAnalytics.streamUserTotals(spark, sf)
      .collect().toSeq
    val batch = graft.util.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))), 2)
          .cast("double").as("sum_value"))
      .orderBy(col("user_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q154 streaming session windows reproduce the batch q18 answer exactly") {
    val sf = "/root/testdata/sf0.001"
    val batch = graft.ops.EventAnalytics.sessionWindowNative(spark, sf)
      .collect().toSeq
    val streamed = graft.ops.EventAnalytics.streamSessions(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q193 transformWithState custom processor reproduces the batch aggregation") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.EventAnalytics.streamUserStats(spark, sf)
      .collect().toSeq
    val batch = graft.util.Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))), 2)
          .cast("double").as("sum_value"),
        max(col("value")).as("max_value"))
      .orderBy(col("user_id")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q196 watermarked stream windows reproduce the batch hourly aggregation") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.EventAnalytics.streamHourly(spark, sf)
      .collect().toSeq
    val batch = graft.util.Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))), 2)
          .cast("double").as("sum_value"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("hour_start"), col("event_type")).collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }

  test("q173 stream-stream join reproduces the batch interval join exactly") {
    val sf = "/root/testdata/sf0.001"
    val ev = graft.util.Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("cts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("purchase_id"),
        col("ts").as("pts"))
    val batch = purchases.join(clicks,
        col("cu") === col("pu") && col("cts") <= col("pts") &&
          col("cts") >= col("pts") - expr("INTERVAL 10 MINUTES"))
      .groupBy(col("pu").as("user_id"))
      .agg(countDistinct(col("purchase_id")).as("n_purchases"),
        count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id")).collect().toSeq
    val streamed = graft.ops.EventAnalytics.streamClickAttribution(spark, sf)
      .collect().toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
  }
}
