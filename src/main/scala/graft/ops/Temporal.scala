package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.util.Tables._

/** Temporal join operators the reference lacks but a log-analytics
  * engine needs (SURVEY.md §2.2 extension surface): as-of join, banded
  * range join, moving value-range window, and time-grid gap-fill with
  * LOCF. All are built shuffle-minimal for the 100 TB case:
  *
  *  - as-of join: the union-merge construction — one shuffle on the
  *    join key, one sort, no per-key driver loop and no range
  *    explosion. This is how a distributed engine implements ASOF
  *    without a specialized physical operator.
  *  - range join: bucketed band join — each probe row joins only its
  *    own 60 s bucket, each build row is replicated to the 3 adjacent
  *    buckets, so the join is a plain equi-shuffle join with a 3×
  *    build amplification instead of an O(n²) cross product.
  *  - moving window / gap-fill: value-RANGE frames and an exploded
  *    `sequence` grid — both partition-local after one keyed shuffle.
  */
object Temporal {

  private val TsFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
  private val Dec = DataTypes.createDecimalType(28, 6)

  /** As-of join: for every `purchase` event, the most recent `click`
    * by the same user at-or-before it (ties: a click at the same µs
    * counts as "before"; among equal-ts clicks the highest event_id
    * wins — the total order makes the result deterministic).
    *
    * Union-merge form: tag both sides, union, and carry the last click
    * forward with `last(..., ignoreNulls)` over a (user, time) sort —
    * the state-of-the-art shuffle-once distributed ASOF plan.
    */
  def asofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("ts"),
        (col("event_type") === "click").cast("int").as("is_click"))
    // clicks sort before purchases at the same µs → at-or-before
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("is_click").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("click_ev",
        last(when(col("is_click") === 1,
          struct(col("ts").as("cts"), col("event_id").as("cid"))), ignoreNulls = true)
          .over(w))
      .filter(col("is_click") === 0)
      .select(col("user_id"),
        col("event_id").as("purchase_id"),
        date_format(col("ts"), TsFmt).as("purchase_ts"),
        col("click_ev.cid").as("click_id"),
        (unix_micros(col("ts")) - unix_micros(col("click_ev.cts"))).as("gap_us"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  /** Banded range join: for each event, how many events of the same
    * type fall within ±60 s (self excluded); reported as a histogram
    * (type, neighbor count, #events). The build side is exploded into
    * its bucket and both neighbors so the probe side joins exactly one
    * bucket — candidate pairs appear exactly once.
    */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    val e = events(s, d)
      .select(col("event_type").as("t"), col("event_id").as("id"),
        unix_micros(col("ts")).as("us"))
    val probe = e.withColumn("b", expr("us div 60000000"))
    val build = e.select(col("t"), col("us").as("us2"))
      .withColumn("b", explode(array(
        expr("us2 div 60000000 - 1"), expr("us2 div 60000000"),
        expr("us2 div 60000000 + 1"))))
    // shuffle-hash, not broadcast: the build side is the replicated
    // CORPUS (×3), which only ever fits a broadcast at toy scale — the
    // plan that survives 100 TB is the equi-shuffle on (type, bucket)
    probe.join(build.hint("shuffle_hash"), Seq("t", "b"))
      .filter(abs(col("us2") - col("us")) <= 60000000L)
      .groupBy(col("t"), col("id"))
      .agg((count(lit(1)) - 1).as("n_near")) // every row self-matches ≥ once
      .groupBy(col("t"), col("n_near"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("t"), col("n_near"))
  }

  /** Moving 7-day revenue per customer: a value-RANGE frame over the
    * order-date day number, so same-day peers always share one frame
    * (deterministic under ties, unlike a ROWS frame). DECIMAL sum →
    * decimal-domain round → double, per the oracle-parity rules.
    */
  def movingWindow(s: SparkSession, d: String): DataFrame = {
    val di = datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("di"))
      .rangeBetween(-6, Window.currentRow)
    orders(s, d)
      .withColumn("di", di)
      .withColumn("win7",
        round(sum(col("o_totalprice").cast(Dec)).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day"), col("win7"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Hourly gap-fill per event type: explode the full
    * min→max hour grid (`sequence`), left-join real hourly aggregates,
    * zero-fill counts and carry the last seen hourly sum forward
    * (LOCF via `last(..., ignoreNulls)`).
    */
  def gapFill(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).withColumn("h", date_trunc("hour", col("ts")))
    val hourly = ev.groupBy(col("event_type"), col("h"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast(Dec)), 2).cast("double").as("sv"))
    val grid = ev.groupBy(col("event_type"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("event_type"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("event_type", "h"), "left")
      .withColumn("sum_value_locf", last(col("sv"), ignoreNulls = true).over(w))
      .select(col("event_type"),
        date_format(col("h"), "yyyy-MM-dd HH:00").as("hour"),
        coalesce(col("n"), lit(0L)).as("n"),
        col("sum_value_locf"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** Exponentially-weighted moving average of `value` per user (the
    * classic time-series smoother, `s_i = α·x_i + (1-α)·s_{i-1}`),
    * reported as the final smoothed level per user.
    *
    * The recurrence unrolls to the closed-form weighted sum
    * `s_n = (1-α)^{n-1}·x_1 + Σ_{i≥2} α·(1-α)^{n-i}·x_i`, which turns a
    * sequential scan into ONE commutative keyed aggregation: a window
    * pass assigns each row its rank and the user's row count (one
    * shuffle on user_id), and the groupBy on the same key reuses that
    * partitioning — no second exchange, no per-key driver loop. Weights
    * for ancient rows underflow to 0.0 harmlessly, so a key with
    * millions of rows at 100 TB still aggregates in one pass.
    *
    * Each weighted term is quantized to DECIMAL(28,6) before the sum
    * (the repo's float-aggregate discipline): double terms of wildly
    * varying magnitude summed in nondeterministic order could flip
    * round(...,4) on knife-edge values across core counts; decimal
    * addition is exact and order-free, and 1e-6 term quantization is
    * noise against the 1e-4 report rounding.
    *
    * The decay weights (1-α)^k do NOT come from libm `pow` — JVM and
    * DuckDB `pow` are each within 1 ulp but not identical, and at
    * sf0.1 three users landed a term exactly on the 1e-6 quantization
    * boundary (34.1535 vs 34.1536 after the final round). Instead the
    * weights are an EXACT 12-dp decimal chain, w_k = round(w_{k-1}·
    * (1-α), 12), built once (driver-side here, a recursive CTE in the
    * oracle — identical by construction) and dead at k≈95 where the
    * chain hits 0 — so the table is ~100 entries at ANY corpus size
    * and rows older than that take weight 0 exactly, on both engines.
    */
  def ewmaSmooth(s: SparkSession, d: String, alpha: Double = 0.3): DataFrame = {
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wAll = Window.partitionBy(col("user_id"))
    // exact decimal weight chain: platform-free, underflows to 0
    val decayBd = java.math.BigDecimal.valueOf(1.0 - alpha)
      .setScale(12, java.math.RoundingMode.HALF_UP)
    val weights = scala.collection.mutable.ArrayBuffer(
      java.math.BigDecimal.ONE.setScale(12))
    while (weights.last.signum > 0 && weights.size < 200)
      weights += weights.last.multiply(decayBd)
        .setScale(12, java.math.RoundingMode.HALF_UP)
    val wArr = array(weights.map(w => lit(w.doubleValue)).toSeq: _*)
    val kFirst = col("n") - 1
    val kRest = col("n") - col("rn")
    def weight(k: org.apache.spark.sql.Column) =
      when(k < weights.size, element_at(wArr, (k + 1).cast("int")))
        .otherwise(lit(0.0))
    val Dec19 = DataTypes.createDecimalType(19, 0)
    val term = when(col("rn") === 1, weight(kFirst) * col("value"))
      .otherwise(lit(alpha) * weight(kRest) * col("value"))
    events(s, d)
      .select(col("user_id"), col("value"),
        row_number().over(wOrd).as("rn"),
        count(lit(1)).over(wAll).as("n"))
      // explicit floor(x·1e6 + ½) micro-unit quantization (the
      // q117/q194 discipline): the earlier CAST(term AS DECIMAL)
      // left the half-way rule to each engine's double→decimal
      // conversion, which disagreed on one knife-edge row at sf0.1
      .select(col("user_id"), col("n"),
        floor(term * 1e6 + 0.5).cast("long").as("tu"))
      .groupBy(col("user_id"))
      .agg(max(col("n")).as("n_events"),
        sum(col("tu").cast(Dec19)).as("su"))
      // report in exact 1e-4 units assembled BY INTEGER ARITHMETIC
      // (values are non-negative, so +50 div 100 is round-half-up);
      // the final double is the same integer divided by 1e4 on both
      // engines — no engine round() ever touches a knife edge
      .select(col("user_id"), col("n_events"),
        ((col("su") + 50).cast(Dec19) / 100).cast("long").cast("double")
          ./(lit(1e4)).as("ewma"))
      .orderBy(col("user_id"))
  }

  /** Interval islands (gaps-and-islands): each event opens a
    * `holdUs`-long presence interval; overlapping or touching
    * intervals per user merge into islands. Reports per user the
    * island count, total covered time, and longest island — the
    * uptime/presence aggregation behind "how long was this session
    * cluster actually active".
    *
    * Determinism: everything is integer microseconds. The new-island
    * flag compares each start against the running MAX of prior ends
    * (not just the previous end — an early long interval can swallow
    * several later ones), and with equal-timestamp ties the flag is
    * order-invariant, so one user-keyed sort fixes the whole answer.
    *
    * Scale shape: ONE user-keyed window sort; the island rollup groups
    * by (user, island) — a strict refinement of the window's
    * hash-partitioning, so EnsureRequirements adds no second
    * exchange; the final per-user rollup rides the same partitioning.
    */
  def intervalIslands(s: SparkSession, d: String,
      holdUs: Long = 300000000L): DataFrame =
    intervalIslandsOn(
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us")),
      holdUs)

  /** Islands over (user_id, event_id, us) rows. See [[intervalIslands]]. */
  private[graft] def intervalIslandsOn(ev: DataFrame, holdUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val prior = w.rowsBetween(Window.unboundedPreceding, -1)
    ev
      .withColumn("e", col("us") + lit(holdUs))
      .withColumn("pme", max(col("e")).over(prior))
      .withColumn("flag",
        when(col("pme").isNull || col("us") > col("pme"), 1L).otherwise(0L))
      .withColumn("island", sum(col("flag")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("island"))
      .agg(min(col("us")).as("st"), max(col("e")).as("en"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("en") - col("st")).as("covered_us"),
        max(col("en") - col("st")).as("max_island_us"))
      .orderBy(col("user_id"))
  }

  /** q168: peak session concurrency per day — the sweep-line interval
    * operator ("how many sessions were open at once"), the classic
    * capacity-planning read-out a native engine answers with a
    * specialized interval index.
    *
    * Construction: gap-sessionize per user (30-min idle, the q17
    * semantics), make each session a half-open interval
    * [min_ts, max_ts + 1µs), CLIP every interval to UTC day boundaries,
    * then sweep each day independently: ±1 deltas ordered by
    * (instant, delta) — ends before starts at the same instant, so
    * back-to-back sessions never double-count — and the running sum's
    * max is the day's peak. All arithmetic is integer epoch-µs.
    *
    * Scale shape: the day clipping is WHY this survives 100 TB — a
    * single global sweep would be one totally-ordered running sum (a
    * single-partition window); clipped segments make the sweep
    * per-day-partitioned, so every window sorts only that day's
    * session endpoints and days parallelize freely. Sessions span
    * midnight at most a handful of times each, so the clip fan-out is
    * ~1×. Deterministic: ties at the same instant carry equal deltas,
    * so every tie order yields the same prefix-sum multiset.
    */
  def sessionConcurrency(s: SparkSession, d: String): DataFrame = {
    val DayUs = 86400000000L
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val sess = events(s, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUser))
      .withColumn("flag",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > 1800000000L, 1L).otherwise(0L))
      .withColumn("sno", sum(col("flag")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sno"))
      .agg(min(col("us")).as("st"), (max(col("us")) + lit(1L)).as("en"))
    val segs = sess
      .withColumn("day", explode(sequence(
        expr(s"st div ${DayUs}L"), expr(s"(en - 1) div ${DayUs}L"))))
      .withColumn("seg_st", greatest(col("st"), col("day") * DayUs))
      .withColumn("seg_en", least(col("en"), (col("day") + 1) * DayUs))
    val deltas = segs
      .select(col("day"), col("seg_st").as("t"), lit(1L).as("delta"))
      .unionAll(segs
        .select(col("day"), col("seg_en").as("t"), lit(-1L).as("delta")))
    val wDay = Window.partitionBy(col("day")).orderBy(col("t"), col("delta"))
    deltas
      .withColumn("run", sum(col("delta")).over(
        wDay.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("day"))
      .agg(max(col("run")).as("peak_concurrency"),
        count(when(col("delta") === 1L, true)).as("n_active_sessions"))
      .select(
        date_format(timestamp_micros(col("day") * DayUs), "yyyy-MM-dd")
          .as("day"),
        col("peak_concurrency"), col("n_active_sessions"))
      .orderBy(col("day"))
  }

  /** q169: autocorrelation of daily order revenue at calendar lags
    * 1..7 — the seasonality probe (a strong lag-7 says weekly cycle).
    * ACF_k here is the Pearson correlation of (revenue_t,
    * revenue_{t+k}) over all matched day pairs.
    *
    * Revenue is quantized to exact integer cents at the day rollup, so
    * all five moments (Σx, Σy, Σxy, Σx², Σy²) are exact decimal(38,0)
    * integers — order-independent — and both engines assemble the same
    * closed form from identical integers with doubles appearing only
    * in the final expression (the q93/q117 discipline). Products are
    * taken decimal(19,0)×decimal(19,0) — the q178/q199 convention,
    * giving a provably exact 38-digit result — never long×long: day
    * revenue at 100 TB is ~10¹³ cents and the cross-product ~10²⁶
    * would wrap int64.
    *
    * Scale shape: the only corpus-sized stage is the day-keyed revenue
    * rollup (map-side combinable). The lag join runs on the CALENDAR-
    * sized result (|days| rows) as a pure equi-join on day+lag after a
    * 7× explode — no banded/nested-loop join, nothing here grows with
    * order count.
    */
  def dailyAcf(s: SparkSession, d: String): DataFrame = {
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val Dec19 = org.apache.spark.sql.types.DataTypes.createDecimalType(19, 0)
    val rev = orders(s, d)
      .select(
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .as("day"),
        col("o_totalprice")
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2))
          .as("p"))
      .groupBy(col("day"))
      .agg((sum(col("p")) * 100).cast("long").as("cents"))
    val lagged = rev
      .withColumn("lag", explode(sequence(lit(1), lit(7))))
      .select((col("day") + col("lag")).as("bday"),
        col("lag").cast("long").as("lag"), col("cents").as("x"))
    val joined = lagged.join(
      rev.select(col("day").as("bday"), col("cents").as("y")), "bday")
    val n = col("n_pairs").cast("double")
    def dd(c: String) = col(c).cast("double")
    joined
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast(Dec)).as("sx"),
        sum(col("y").cast(Dec)).as("sy"),
        sum(col("x").cast(Dec19) * col("y").cast(Dec19)).as("sxy"),
        sum(col("x").cast(Dec19) * col("x").cast(Dec19)).as("sxx"),
        sum(col("y").cast(Dec19) * col("y").cast(Dec19)).as("syy"))
      .select(col("lag"), col("n_pairs"),
        round((n * dd("sxy") - dd("sx") * dd("sy"))
          / sqrt((n * dd("sxx") - dd("sx") * dd("sx"))
            * (n * dd("syy") - dd("sy") * dd("sy"))), 6).as("acf"))
      .orderBy(col("lag"))
  }

  /** q178: Theil-Sen robust trend of daily revenue — the median of all
    * pairwise day-slopes, reported next to the classical OLS slope
    * (q117's moment form). The robust estimator ignores the revenue
    * spikes that drag OLS around: the two numbers disagreeing IS the
    * signal.
    *
    * Determinism: every slope is one double division of exact integer
    * (Δcents, Δdays); both engines then take the interpolated median
    * of identical double multisets (same two middle elements, same
    * (a+b)/2). The OLS side is assembled from exact decimal moments.
    *
    * Scale shape: the pair table is CALENDAR² (~3M pairs for a decade
    * of days) — a constant independent of corpus size, which is the
    * only reason an all-pairs inequality join is acceptable here; the
    * corpus contributes one day-keyed rollup. The same bound holds at
    * 100 TB: more orders change the cents, not the day count.
    */
  def theilSen(s: SparkSession, d: String): DataFrame = {
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val rev = orders(s, d)
      .select(
        datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
          .as("day"),
        col("o_totalprice")
          .cast(org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2))
          .as("p"))
      .groupBy(col("day"))
      .agg((sum(col("p")) * 100).cast("long").as("cents"))
    val cached = graft.util.CacheRegistry.register(rev.cache())
    val pairs = cached.as("a").join(cached.as("b"),
        col("b.day") > col("a.day"))
      .select(((col("b.cents") - col("a.cents")).cast("double")
        / (col("b.day") - col("a.day")).cast("double")).as("slope"))
    val sen = pairs.agg(count(lit(1)).as("n_pairs"),
      expr("percentile(slope, 0.5)").as("sen_cents"))
    val ols = cached
      .agg(count(lit(1)).as("n_days"),
        sum(col("day").cast(Dec)).as("sx"),
        sum(col("cents").cast(Dec)).as("sy"),
        sum(col("day").cast(Dec) * col("cents").cast(Dec)).as("sxy"),
        sum(col("day").cast(Dec) * col("day").cast(Dec)).as("sxx"))
    def dd(c: String) = col(c).cast("double")
    sen.crossJoin(broadcast(ols))
      .select(col("n_days"), col("n_pairs"),
        round(col("sen_cents") / 100.0, 4).as("sen_slope_dollars"),
        round((dd("n_days") * dd("sxy") - dd("sx") * dd("sy"))
          / (dd("n_days") * dd("sxx") - dd("sx") * dd("sx")) / 100.0, 4)
          .as("ols_slope_dollars"))
  }

  /** q185: conversion-lag distribution — exact percentiles of the
    * click→purchase as-of gap (q44's join), the "how fast do users
    * convert" read-out. Percentiles interpolate over exact integer µs
    * gaps (Spark `percentile` ≡ DuckDB `quantile_cont`, the q42
    * convention); unconverted purchases (NULL gap) are excluded by
    * both engines' null-skipping aggregates.
    *
    * Scale shape: inherits q44's shuffle-once ASOF (one user-keyed
    * window); the final 1-row aggregate buffers per-group gap values
    * only for the exact-percentile form — at 100 TB this switches to
    * the KLL sketch (q88) with a declared rank-error envelope.
    */
  def conversionLag(s: SparkSession, d: String): DataFrame =
    asofJoin(s, d)
      .agg(count(lit(1)).as("n_purchases"),
        count(col("click_id")).as("n_converted"),
        round(expr("percentile(gap_us, 0.5)") / 1e6, 3).as("p50_s"),
        round(expr("percentile(gap_us, 0.9)") / 1e6, 3).as("p90_s"),
        round(expr("percentile(gap_us, 0.99)") / 1e6, 3).as("p99_s"))

  /** q225: seasonal profile + residual outliers — the value stream
    * decomposed against its (day-of-week × hour-of-day) grid: each
    * event's residual is its deviation from its cell's mean, and the
    * report is the 20 largest absolute residuals (the "anomalous even
    * AFTER accounting for seasonality" cut that a raw z-score like
    * q121 misses when the metric has a daily/weekly cycle).
    *
    * Determinism: cell keys are pure integer arithmetic on epoch-µs
    * (no engine dayofweek()/hour() semantics — Spark's Sunday=1 vs
    * DuckDB's Sunday=0 never enters); cell sums ride DECIMAL(28,6);
    * the residual is one double expression per row; top-20 ordering
    * ties broken by event_id.
    *
    * Scale shape: one (dow, hod)-keyed aggregation (≤ 168 cells —
    * broadcast forever), a broadcast join back, and
    * TakeOrderedAndProject for the top-20 (per-partition heads, no
    * global sort). The grid is fixed-size at any corpus scale.
    */
  def seasonalProfile(s: SparkSession, d: String, topK: Int = 20): DataFrame = {
    val Dec = DataTypes.createDecimalType(28, 6)
    val ev = events(s, d)
      .select(col("event_id"), col("value"), expr("unix_micros(ts)").as("us"))
      .withColumn("dow_key", expr("(us div 86400000000) % 7"))
      .withColumn("hod", expr("(us % 86400000000) div 3600000000"))
    val cells = ev.groupBy(col("dow_key"), col("hod"))
      .agg(count(lit(1)).as("n_cell"), sum(col("value").cast(Dec)).as("sv"))
    ev.join(broadcast(cells), Seq("dow_key", "hod"))
      .withColumn("cell_mean",
        col("sv").cast("double") / col("n_cell").cast("double"))
      .withColumn("dev", abs(col("value") - col("cell_mean")))
      .orderBy(col("dev").desc, col("event_id"))
      .limit(topK)
      .select(col("event_id"), col("dow_key"), col("hod"), col("n_cell"),
        round(col("cell_mean"), 6).as("cell_mean"), col("value"),
        round(col("dev"), 6).as("abs_dev"))
  }

  /** q229: pairwise cross-correlation of event-type activity — the
    * hourly count series of every type pair, Pearson-correlated over
    * the COMPLETE observed-hour grid (absent (hour, type) cells count
    * 0 — without the fill, a sparse type would correlate only on its
    * own active hours and the estimate would bias high). "Do errors
    * spike with clicks" is the first question asked of any event
    * taxonomy.
    *
    * Determinism: counts and the zero-filled grid are exact integers;
    * moments use the DECIMAL(19,0)→(38,0) product convention; r is
    * one double assembly per pair, rounded.
    *
    * Scale shape: one (hour, type)-keyed count of the corpus, then
    * everything runs on the |hours|×|types| grid (calendar × catalog
    * — bounded at any corpus size): the grid build is a broadcast
    * cross join of two tiny dims, the pair join is hour-keyed over
    * grid rows, and the moment rollup keys on the |types|² pair set.
    */
  def typeCrossCorr(s: SparkSession, d: String): DataFrame = {
    val Dec19 = DataTypes.createDecimalType(19, 0)
    val ev = events(s, d)
      .select(expr("unix_micros(ts) div 3600000000").as("hr"), col("event_type"))
    val cnt = ev.groupBy(col("hr"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val hours = ev.select(col("hr")).distinct()
    val types = ev.select(col("event_type")).distinct()
    val filled = hours.crossJoin(broadcast(types))
      .join(cnt, Seq("hr", "event_type"), "left")
      .select(col("hr"), col("event_type"),
        coalesce(col("c"), lit(0L)).cast(Dec19).as("c"))
    val pairs = filled.as("x").join(filled.as("y"),
        col("x.hr") === col("y.hr") &&
          col("x.event_type") < col("y.event_type"))
      .select(col("x.event_type").as("a"), col("y.event_type").as("b"),
        col("x.c").as("xc"), col("y.c").as("yc"))
    val m = pairs.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n"),
        sum(col("xc")).as("sx"), sum(col("yc")).as("sy"),
        sum(col("xc") * col("yc")).as("sxy"),
        sum(col("xc") * col("xc")).as("sxx"),
        sum(col("yc") * col("yc")).as("syy"))
    val nD = col("n").cast("double")
    val r = (nD * col("sxy").cast("double")
      - col("sx").cast("double") * col("sy").cast("double")) /
      sqrt((nD * col("sxx").cast("double")
        - col("sx").cast("double") * col("sx").cast("double")) *
        (nD * col("syy").cast("double")
          - col("sy").cast("double") * col("sy").cast("double")))
    m.select(col("a"), col("b"), col("n").as("n_hours"),
        round(r, 6).as("corr"))
      .orderBy(col("a"), col("b"))
  }

  /** q269: BITEMPORAL point-in-time query — the two-axis temporal
    * model (valid time: when a fact was true; transaction time: when
    * the warehouse learned it) that SCD2 (q144's CDC merge) collapses
    * to one axis. A deterministic correction feed is synthesized from
    * orders: every order's original version is recorded at its order
    * date; every 13th order receives a RETROACTIVE price correction
    * (+100.00, same valid_from) transacted 30 days later. The same
    * valid-time question — "total believed price per status, as
    * valid at end of time" — is then answered AS OF two transaction
    * cutoffs: at the early cutoff late-arriving corrections are
    * invisible (and orders not yet placed don't exist); at the late
    * cutoff every correction has landed. Believed version = the
    * max-(tx, version) row among versions with tx ≤ cutoff — one
    * window per cutoff, the reproducible-reporting primitive an
    * audited warehouse must answer ("what did we report THEN?").
    *
    * Determinism: prices ride DECIMAL(18,2) (+100.00 exact);
    * timestamps never leave the plan (labels out).
    *
    * Scale shape: per cutoff, one (order)-keyed window over the
    * version table (versions ≈ rows + corrections, never rows ×
    * time) and a |statuses|-group rollup; the two cutoffs share one
    * version-table scan via unionAll of filtered branches.
    */
  def bitemporal(s: SparkSession, d: String): DataFrame = {
    val Dec = DataTypes.createDecimalType(18, 2)
    val o = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
      col("o_orderdate"), col("o_totalprice").cast(Dec).as("price"))
    val v1 = o.select(col("o_orderkey"), col("o_orderstatus"),
      col("o_orderdate").as("tx"), lit(1L).as("version"), col("price"))
    val v2 = o.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("tx"),
        lit(2L).as("version"),
        (col("price") + lit(100.00).cast(Dec)).as("price"))
    val versions = v1.unionAll(v2)
    def asOf(label: String, cutoff: String): DataFrame = {
      val w = Window.partitionBy(col("o_orderkey"))
        .orderBy(col("tx").desc, col("version").desc)
      versions.filter(col("tx") <= lit(cutoff).cast("timestamp"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("price")), 2).cast("double").as("sum_price"))
        .select(lit(label).as("as_of"), col("o_orderstatus"),
          col("n_orders"), col("sum_price"))
    }
    asOf("1_early_1998", "1998-01-01 00:00:00")
      .unionAll(asOf("2_late_2002", "2002-01-01 00:00:00"))
      .orderBy(col("as_of"), col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q269_bitemporal" -> bitemporal _,
    "q229_type_xcorr" -> typeCrossCorr _,
    "q225_seasonal_outliers" -> ((s: SparkSession, d: String) => seasonalProfile(s, d)),
    "q185_conversion_lag" -> conversionLag _,
    "q178_theil_sen"    -> theilSen _,
    "q168_concurrency"  -> sessionConcurrency _,
    "q169_daily_acf"    -> dailyAcf _,
    "q134_interval_islands" -> ((s: SparkSession, d: String) => intervalIslands(s, d)),
    "q44_asof_join"     -> asofJoin _,
    "q45_range_join"    -> rangeJoin _,
    "q47_moving_window" -> movingWindow _,
    "q48_gap_fill"      -> gapFill _,
    "q107_ewma"         -> ((s: SparkSession, d: String) => ewmaSmooth(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q269_bitemporal" ->
      """WITH v AS (
        |  SELECT o_orderkey, o_orderstatus, o_orderdate AS tx,
        |    1 AS version, CAST(o_totalprice AS DECIMAL(18,2)) AS price
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, o_orderstatus,
        |    o_orderdate + INTERVAL 30 DAY,
        |    2, CAST(o_totalprice AS DECIMAL(18,2)) + 100.00
        |  FROM orders WHERE o_orderkey % 13 = 0),
        |pick AS (
        |  SELECT c.label, c.cutoff, v.*,
        |    row_number() OVER (PARTITION BY c.label, v.o_orderkey
        |        ORDER BY v.tx DESC, v.version DESC) AS rn
        |  FROM (VALUES ('1_early_1998', TIMESTAMP '1998-01-01'),
        |               ('2_late_2002', TIMESTAMP '2002-01-01'))
        |       c(label, cutoff)
        |  JOIN v ON v.tx <= c.cutoff)
        |SELECT label AS as_of, o_orderstatus,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(round(sum(price), 2) AS DOUBLE) AS sum_price
        |FROM pick WHERE rn = 1
        |GROUP BY 1, 2
        |ORDER BY as_of, o_orderstatus""".stripMargin,
    "q229_type_xcorr" ->
      """WITH ev AS (
        |  SELECT epoch_us(date_trunc('microseconds', ts)) // 3600000000 AS hr,
        |    event_type
        |  FROM events),
        |cnt AS (SELECT hr, event_type, CAST(count(*) AS BIGINT) AS c
        |        FROM ev GROUP BY 1, 2),
        |hours AS (SELECT DISTINCT hr FROM ev),
        |types AS (SELECT DISTINCT event_type FROM ev),
        |filled AS (
        |  SELECT h.hr, t.event_type,
        |    CAST(coalesce(cnt.c, 0) AS DECIMAL(19,0)) AS c
        |  FROM hours h CROSS JOIN types t
        |  LEFT JOIN cnt ON cnt.hr = h.hr AND cnt.event_type = t.event_type),
        |pairs AS (
        |  SELECT x.event_type AS a, y.event_type AS b, x.c AS xc, y.c AS yc
        |  FROM filled x JOIN filled y
        |    ON x.hr = y.hr AND x.event_type < y.event_type),
        |m AS (
        |  SELECT a, b, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(xc) AS DECIMAL(38,0)) AS sx,
        |    CAST(sum(yc) AS DECIMAL(38,0)) AS sy,
        |    CAST(sum(xc * yc) AS DECIMAL(38,0)) AS sxy,
        |    CAST(sum(xc * xc) AS DECIMAL(38,0)) AS sxx,
        |    CAST(sum(yc * yc) AS DECIMAL(38,0)) AS syy
        |  FROM pairs GROUP BY 1, 2)
        |SELECT a, b, n AS n_hours,
        |  round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
        |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
        |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
        |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
        |FROM m
        |ORDER BY a, b""".stripMargin,
    "q225_seasonal_outliers" ->
      """WITH ev AS (
        |  SELECT event_id, value,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |k AS (
        |  SELECT event_id, value,
        |    (us // 86400000000) % 7 AS dow_key,
        |    (us % 86400000000) // 3600000000 AS hod
        |  FROM ev),
        |cells AS (
        |  SELECT dow_key, hod, CAST(count(*) AS BIGINT) AS n_cell,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS sv
        |  FROM k GROUP BY 1, 2),
        |j AS (
        |  SELECT k.event_id, k.dow_key, k.hod, cells.n_cell,
        |    CAST(sv AS DOUBLE) / CAST(n_cell AS DOUBLE) AS cell_mean,
        |    k.value,
        |    abs(k.value - CAST(sv AS DOUBLE) / CAST(n_cell AS DOUBLE)) AS dev
        |  FROM k JOIN cells USING (dow_key, hod))
        |SELECT event_id, dow_key, hod, n_cell,
        |  round(cell_mean, 6) AS cell_mean, value, round(dev, 6) AS abs_dev
        |FROM j ORDER BY dev DESC, event_id LIMIT 20""".stripMargin,
    "q185_conversion_lag" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts_us,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT *, last_value(
        |      CASE WHEN is_click = 1
        |        THEN struct_pack(cts := ts_us, cid := event_id) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, is_click DESC, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce
        |  FROM ev),
        |gaps AS (
        |  SELECT (ce).cid AS click_id,
        |    epoch_us(ts_us) - epoch_us((ce).cts) AS gap_us
        |  FROM m WHERE is_click = 0)
        |SELECT CAST(count(*) AS BIGINT) AS n_purchases,
        |  CAST(count(click_id) AS BIGINT) AS n_converted,
        |  round(quantile_cont(gap_us, 0.5) / 1e6, 3) AS p50_s,
        |  round(quantile_cont(gap_us, 0.9) / 1e6, 3) AS p90_s,
        |  round(quantile_cont(gap_us, 0.99) / 1e6, 3) AS p99_s
        |FROM gaps""".stripMargin,
    "q178_theil_sen" ->
      """WITH rev AS (
        |  SELECT date_diff('day', DATE '1970-01-01',
        |                   CAST(o_orderdate AS DATE)) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT CAST(b.cents - a.cents AS DOUBLE)
        |       / CAST(b.day - a.day AS DOUBLE) AS slope
        |  FROM rev a JOIN rev b ON b.day > a.day),
        |sen AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |    quantile_cont(slope, 0.5) AS sen_cents
        |  FROM pairs),
        |ols AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_days,
        |    sum(CAST(day AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(cents AS DECIMAL(38,0))) AS sy,
        |    sum(CAST(day AS DECIMAL(19,0)) * CAST(cents AS DECIMAL(19,0)))
        |      AS sxy,
        |    sum(CAST(day AS DECIMAL(19,0)) * CAST(day AS DECIMAL(19,0)))
        |      AS sxx
        |  FROM rev)
        |SELECT n_days, n_pairs,
        |  round(sen_cents / 100.0, 4) AS sen_slope_dollars,
        |  round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
        |       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0, 4)
        |    AS ols_slope_dollars
        |FROM sen CROSS JOIN ols""".stripMargin,
    "q168_concurrency" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |x AS (
        |  SELECT user_id, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS flag,
        |    event_id
        |  FROM ev
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |snum AS (
        |  SELECT user_id, us,
        |    sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sno
        |  FROM x),
        |sess AS (
        |  SELECT user_id, sno, min(us) AS st, max(us) + 1 AS en
        |  FROM snum GROUP BY 1, 2),
        |segs AS (
        |  SELECT st, en,
        |    unnest(generate_series(st // 86400000000,
        |                           (en - 1) // 86400000000)) AS day
        |  FROM sess),
        |cl AS (
        |  SELECT day, greatest(st, day * 86400000000) AS seg_st,
        |    least(en, (day + 1) * 86400000000) AS seg_en
        |  FROM segs),
        |deltas AS (
        |  SELECT day, seg_st AS t, 1 AS delta FROM cl
        |  UNION ALL
        |  SELECT day, seg_en AS t, -1 AS delta FROM cl),
        |runs AS (
        |  SELECT day, delta,
        |    sum(delta) OVER (PARTITION BY day ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM deltas)
        |SELECT strftime(epoch_ms(day * 86400000), '%Y-%m-%d') AS day,
        |  CAST(max(run) AS BIGINT) AS peak_concurrency,
        |  CAST(count(*) FILTER (WHERE delta = 1) AS BIGINT)
        |    AS n_active_sessions
        |FROM runs GROUP BY day ORDER BY day""".stripMargin,
    "q169_daily_acf" ->
      """WITH rev AS (
        |  SELECT date_diff('day', DATE '1970-01-01',
        |                   CAST(o_orderdate AS DATE)) AS day,
        |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY 1),
        |l AS (SELECT unnest(generate_series(1, 7)) AS lag),
        |pairs AS (
        |  SELECT l.lag, a.cents AS x, b.cents AS y
        |  FROM rev a CROSS JOIN l
        |  JOIN rev b ON b.day = a.day + l.lag),
        |m AS (
        |  SELECT lag, count(*) AS n_pairs,
        |    sum(CAST(x AS DECIMAL(38,0))) AS sx,
        |    sum(CAST(y AS DECIMAL(38,0))) AS sy,
        |    -- DECIMAL(19,0) factors → provably exact 38-digit products
        |    -- (the q178/q199 convention); 38×38 would silently cap at 38
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
        |    sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |    sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
        |  FROM pairs GROUP BY lag)
        |SELECT CAST(lag AS BIGINT) AS lag, n_pairs,
        |  round((CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
        |         - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
        |    / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
        |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        |         * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
        |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS acf
        |FROM m ORDER BY lag""".stripMargin,
    "q134_interval_islands" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |x AS (
        |  SELECT user_id, event_id, us, us + 300000000 AS e,
        |    max(us + 300000000) OVER (PARTITION BY user_id
        |      ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
        |  FROM ev),
        |f AS (
        |  SELECT user_id, event_id, us, e,
        |    CASE WHEN pme IS NULL OR us > pme THEN 1 ELSE 0 END AS flag
        |  FROM x),
        |i AS (
        |  -- same (us, event_id) total order as the flag window: with
        |  -- equal timestamps the island assignment must not interleave
        |  SELECT user_id, us, e,
        |    CAST(sum(flag) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS island
        |  FROM f),
        |isl AS (SELECT user_id, island, min(us) AS st, max(e) AS en
        |        FROM i GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_islands,
        |  CAST(sum(en - st) AS BIGINT) AS covered_us,
        |  max(en - st) AS max_island_us
        |FROM isl
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q107_ewma" ->
      """WITH RECURSIVE e AS (
        |  SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n
        |  FROM events),
        |w0(k, wt) AS (
        |  SELECT 0, CAST(1 AS DECIMAL(14,12))
        |  UNION ALL
        |  SELECT k + 1, CAST(round(wt * 0.7, 12) AS DECIMAL(14,12))
        |  FROM w0 WHERE wt > 0 AND k < 200),
        |t AS (
        |  SELECT e.user_id, e.n,
        |    CAST(floor((CASE WHEN e.rn = 1
        |         THEN coalesce(CAST(w1.wt AS DOUBLE), 0) * e.value
        |         ELSE 0.3 * coalesce(CAST(w2.wt AS DOUBLE), 0) * e.value
        |    END) * 1000000 + 0.5) AS BIGINT) AS tu
        |  FROM e
        |  LEFT JOIN w0 w1 ON w1.k = e.n - 1 AND e.rn = 1
        |  LEFT JOIN w0 w2 ON w2.k = e.n - e.rn AND e.rn <> 1)
        |SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
        |  CAST((CAST(sum(tu) AS BIGINT) + 50) // 100 AS DOUBLE) / 10000
        |    AS ewma
        |FROM t
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q44_asof_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts_us,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |m AS (
        |  SELECT *, last_value(
        |      CASE WHEN is_click = 1
        |        THEN struct_pack(cts := ts_us, cid := event_id) END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY ts_us, is_click DESC, event_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce
        |  FROM ev)
        |SELECT user_id, event_id AS purchase_id,
        |  strftime(ts_us, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
        |  (ce).cid AS click_id,
        |  epoch_us(ts_us) - epoch_us((ce).cts) AS gap_us
        |FROM m WHERE is_click = 0
        |ORDER BY user_id, purchase_id""".stripMargin,
    "q45_range_join" ->
      """WITH e AS (
        |  SELECT event_type AS t, event_id AS id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |p AS (
        |  SELECT a.t, a.id, count(*) - 1 AS n_near
        |  FROM e a JOIN e b
        |    ON a.t = b.t AND b.us BETWEEN a.us - 60000000 AND a.us + 60000000
        |  GROUP BY a.t, a.id)
        |SELECT t, CAST(n_near AS BIGINT) AS n_near, count(*) AS n_events
        |FROM p GROUP BY t, n_near
        |ORDER BY t, n_near""".stripMargin,
    "q47_moving_window" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6)))
        |    OVER (PARTITION BY o_custkey
        |          ORDER BY date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
        |          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS win7
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q48_gap_fill" ->
      """WITH ev AS (
        |  SELECT event_type, date_trunc('hour', ts) AS h, value FROM events),
        |hourly AS (
        |  SELECT event_type, h, count(*) AS n,
        |    CAST(round(sum(CAST(value AS DECIMAL(28,6))), 2) AS DOUBLE) AS sv
        |  FROM ev GROUP BY event_type, h),
        |bounds AS (SELECT event_type, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY event_type),
        |grid AS (
        |  SELECT event_type, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM bounds)
        |SELECT g.event_type, strftime(g.h, '%Y-%m-%d %H:00') AS hour,
        |  coalesce(n, 0) AS n,
        |  last_value(sv IGNORE NULLS)
        |    OVER (PARTITION BY g.event_type ORDER BY g.h
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sum_value_locf
        |FROM grid g LEFT JOIN hourly USING (event_type, h)
        |ORDER BY event_type, hour""".stripMargin,
  )
}
