package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.util.Tables._

/** Behavioral analytics over the event stream and order history —
  * the product-analytics tier (sequence patterns, robust outliers,
  * cohort retention, RFM segmentation).
  */
object Behavior {

  /** Event-sequence pattern matching — the MATCH_RECOGNIZE-lite every
    * product funnel asks for: per user, the whole event history
    * collapses to a letter string (ordered by time) and a regex counts
    * non-overlapping conversion paths `c[ve]*p` (a click, any
    * browsing/errors, then a purchase).
    *
    * Scale shape: ONE user-keyed aggregation; the per-user sequence is
    * bounded by that user's event count (product-analytics sequences
    * are session/user-bounded by design — a pathological key would be
    * capped upstream), and the regex runs once per user on the
    * assembled string, map-side after the single shuffle. Both
    * engines' regex semantics agree on this pattern class (greedy,
    * leftmost, non-overlapping).
    */
  def sequenceMatch(s: SparkSession, d: String,
      pattern: String = "c[ve]*p"): DataFrame = {
    val letter =
      when(col("event_type") === "click", "c")
        .when(col("event_type") === "view", "v")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e")
    sequenceMatchOn(
      events(s, d)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), letter.as("l")),
      pattern)
  }

  /** Pattern count over (user_id, us, event_id, l) rows. */
  private[graft] def sequenceMatchOn(ev: DataFrame, pattern: String): DataFrame = {
    ev
      .groupBy(col("user_id"))
      .agg(concat_ws("", transform(
        array_sort(collect_list(struct(col("us"), col("event_id"), col("l")))),
        x => x.getField("l"))).as("seq"))
      .select(col("user_id"),
        size(expr(s"regexp_extract_all(seq, '$pattern', 0)")).cast("long")
          .as("n_paths"))
      .filter(col("n_paths") > 0)
      .orderBy(col("user_id"))
  }

  /** Robust outlier scoring via median absolute deviation: per event
    * type, the median, the MAD, and how many readings sit more than
    * 3 MADs out — the robust alternative to q121's z-scores (one
    * corrupt decade-off reading cannot drag the threshold).
    *
    * Determinism: both median passes are exact interpolated
    * percentiles (Spark `percentile` ≡ DuckDB `quantile_cont`, the
    * q42-proven pairing) over doubles; the outlier comparison is
    * per-row (no float aggregation), and the counts are integers.
    *
    * Scale shape: two type-keyed percentile aggregations with the
    * 1-row-per-type median broadcast back between them — percentile
    * needs the sorted group either way; nothing corpus-wide beyond
    * the two keyed passes.
    */
  def madOutliers(s: SparkSession, d: String): DataFrame =
    madOutliersOn(events(s, d).select(col("event_type"), col("value")))

  private[graft] def madOutliersOn(ev: DataFrame): DataFrame = {
    val med = ev.groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("med"))
    val dev = ev.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = dev.groupBy(col("event_type"))
      .agg(max(col("med")).as("m"), expr("percentile(adev, 0.5)").as("mad"))
    dev.join(broadcast(mad.select(col("event_type"), col("mad"))), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("m"), max(col("mad")).as("md"),
        sum(when(col("adev") > lit(3) * col("mad"), 1L).otherwise(0L)).as("bad"))
      .select(col("event_type"), round(col("m"), 4).as("med"),
        round(col("md"), 4).as("mad"), col("bad").as("n_outliers"))
      .orderBy(col("event_type"))
  }

  /** Weekly cohort retention matrix: users grouped by the week of
    * their first event; for each later week, how many came back —
    * the "are newer cohorts stickier" grid.
    *
    * Scale shape: first-seen is one user-keyed min; activity is the
    * distinct-reduced (user, week) incidence; one broadcast-joinable
    * (user → cohort) map against it; the matrix itself is
    * |cohorts|×|offsets| — tiny at any corpus size.
    */
  def cohortMatrix(s: SparkSession, d: String): DataFrame = {
    val act = events(s, d)
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("wk"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    act.join(first, Seq("user_id"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(col("wk"), col("cw")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  private val DecP = DataTypes.createDecimalType(18, 2)

  /** RFM segmentation over the order history: each customer scored
    * 1-5 on recency (latest order), frequency (order count), monetary
    * (exact-decimal revenue); the report counts customers per "rfm"
    * segment string — the classic CRM cut.
    *
    * Determinism: ntile ties broken by customer key; monetary sums in
    * DECIMAL(18,2) so two customers' totals can never differ by float
    * noise and flip a quintile boundary between engines.
    *
    * Scale shape: one customer-keyed aggregation, then three window
    * passes over the customer-level table (≪ orders) — the only
    * order-scale work is the first rollup. Exact equal-size quintiles
    * are BY DEFINITION a global sort of the customer table (the
    * allowed single-partition exchange); past ~10⁹ customers the
    * deployment switches to percentile_approx cut points, trading
    * exact bucket sizes for full parallelism.
    */
  def rfmSegments(s: SparkSession, d: String): DataFrame = {
    val cust = orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("rec"), // ordering key only, never output
        count(lit(1)).as("freq"),
        sum(col("o_totalprice").cast(DecP)).as("mon"))
    val r = ntile(5).over(Window.orderBy(col("rec").desc, col("o_custkey")))
    val f = ntile(5).over(Window.orderBy(col("freq").desc, col("o_custkey")))
    val m = ntile(5).over(Window.orderBy(col("mon").desc, col("o_custkey")))
    cust
      .select(col("o_custkey"), r.as("r"), f.as("f"), m.as("m"))
      .groupBy(concat(col("r"), col("f"), col("m")).as("segment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("segment"))
  }

  /** q181: longest daily-activity streak per user — gaps-and-islands
    * over each user's DISTINCT active days (epoch-day integers), the
    * engagement metric behind "N-day streak" product features.
    *
    * Scale shape: the event stream reduces to distinct
    * (user, epoch_day) pairs FIRST (map-side combinable; bounded by
    * users × calendar, not events), then user-keyed windows run over
    * ≤ |days| rows per user. All integer day arithmetic — a streak
    * breaks when day − row_number changes, the classic island key.
    */
  def activityStreaks(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("day"))
    events(s, d)
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(byUser))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"),
        max(col("len")).as("longest_streak"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  /** q208: delete-one-user jackknife standard error of the per-type
    * mean value — the resampling-free uncertainty estimate for a
    * metric whose observations cluster by user (events of one user
    * are correlated, so the naive SE is too small; the delete-a-GROUP
    * jackknife is the standard cluster-robust answer, and unlike the
    * bootstrap it needs no random resampling — a hard requirement
    * under the deterministic gate).
    *
    * θ₍₋ᵤ₎ = (S − sᵤ)/(N − nᵤ) per user; SE² = (G−1)/G · Σ(θ₍₋ᵤ₎ − θ̄)².
    * Per-user value sums ride DECIMAL(28,6) (the q17 discipline), each
    * θ is one double division of exact decimals, θ quantizes to
    * micro-units before the cross-user moments (order-free integer
    * sums, DECIMAL(19,0)→(38,0) products per the q178/q199
    * convention), and SE is one sqrt of the assembled double.
    *
    * Scale shape: one (type, user)-keyed rollup of the event stream →
    * a |types|-keyed rollup joined back broadcast → a second
    * |types|-keyed moment rollup. Shuffles carry (type, user)
    * aggregates, never events; G per type is user-catalog-bounded.
    */
  def jackknifeSe(s: SparkSession, d: String): DataFrame = {
    val Dec = DataTypes.createDecimalType(28, 6)
    val Dec19 = DataTypes.createDecimalType(19, 0)
    val perUser = events(s, d)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("nu"), sum(col("value").cast(Dec)).as("su"))
    val totals = perUser.groupBy(col("event_type"))
      .agg(count(lit(1)).as("g"), sum(col("nu")).as("n_events"),
        sum(col("su")).as("s_total"))
    val theta = (col("s_total") - col("su")).cast("double") /
      (col("n_events") - col("nu")).cast("double")
    val thetas = perUser.join(broadcast(totals), Seq("event_type"))
      .filter(col("n_events") > col("nu")) // delete-one must leave data
      .select(col("event_type"), col("g"), col("n_events"), col("s_total"),
        floor(theta * 1e6 + 0.5).cast("long").as("tu"))
    thetas.groupBy(col("event_type"))
      .agg(max(col("g")).as("n_users"), max(col("n_events")).as("n_events"),
        max(col("s_total")).as("s_total"),
        count(lit(1)).as("gk"),
        sum(col("tu").cast(Dec19)).as("st"),
        sum(col("tu").cast(Dec19) * col("tu").cast(Dec19)).as("qt"))
      .select(col("event_type"), col("n_events"), col("n_users"),
        round(col("s_total").cast("double")
          / col("n_events").cast("double"), 6).as("mean_value"),
        when(col("gk") > 1,
          round(sqrt(
            (col("gk") - 1).cast("double") / col("gk").cast("double")
              * (col("qt").cast("double")
                - col("st").cast("double") * col("st").cast("double")
                  / col("gk").cast("double"))
              / 1e12), 6)).as("jk_se"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q208_jackknife_se"  -> jackknifeSe _,
    "q181_streaks" -> activityStreaks _,
    "q136_sequence_match" -> ((s: SparkSession, d: String) => sequenceMatch(s, d)),
    "q137_mad_outliers"   -> madOutliers _,
    "q138_cohort_matrix"  -> cohortMatrix _,
    "q139_rfm_segments"   -> rfmSegments _,
  )

  val oracleSql: Map[String, String] = Map(
    "q208_jackknife_se" ->
      """WITH pu AS (
        |  SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS nu,
        |    CAST(sum(CAST(value AS DECIMAL(28,6))) AS DECIMAL(28,6)) AS su
        |  FROM events GROUP BY 1, 2),
        |tot AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS g,
        |    CAST(sum(nu) AS BIGINT) AS n_events,
        |    CAST(sum(su) AS DECIMAL(28,6)) AS s_total
        |  FROM pu GROUP BY 1),
        |th AS (
        |  SELECT pu.event_type, tot.g, tot.n_events, tot.s_total,
        |    CAST(floor(CAST(tot.s_total - pu.su AS DOUBLE)
        |               / CAST(tot.n_events - pu.nu AS DOUBLE)
        |               * 1000000 + 0.5) AS BIGINT) AS tu
        |  FROM pu JOIN tot ON tot.event_type = pu.event_type
        |  WHERE tot.n_events > pu.nu)
        |SELECT event_type, max(n_events) AS n_events, max(g) AS n_users,
        |  round(CAST(max(s_total) AS DOUBLE)
        |        / CAST(max(n_events) AS DOUBLE), 6) AS mean_value,
        |  CASE WHEN count(*) > 1 THEN
        |    round(sqrt(
        |      CAST(count(*) - 1 AS DOUBLE) / CAST(count(*) AS DOUBLE)
        |      * (CAST(sum(CAST(tu AS DECIMAL(19,0)) * CAST(tu AS DECIMAL(19,0)))
        |           AS DOUBLE)
        |         - CAST(sum(CAST(tu AS DECIMAL(19,0))) AS DOUBLE)
        |           * CAST(sum(CAST(tu AS DECIMAL(19,0))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE))
        |      / 1e12), 6)
        |  END AS jk_se
        |FROM th GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q181_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id,
        |    epoch_us(date_trunc('microseconds', ts)) // 86400000000 AS day
        |  FROM events),
        |isl AS (
        |  SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day)
        |      AS island
        |  FROM days),
        |st AS (
        |  SELECT user_id, island, CAST(count(*) AS BIGINT) AS len
        |  FROM isl GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
        |  max(len) AS longest_streak,
        |  CAST(sum(len) AS BIGINT) AS active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q136_sequence_match" ->
      """WITH l AS (
        |  SELECT user_id,
        |    epoch_us(date_trunc('microseconds', ts)) AS us, event_id,
        |    CASE event_type WHEN 'click' THEN 'c' WHEN 'view' THEN 'v'
        |      WHEN 'purchase' THEN 'p' WHEN 'signup' THEN 's'
        |      ELSE 'e' END AS l
        |  FROM events),
        |seqs AS (
        |  SELECT user_id,
        |    string_agg(l, '' ORDER BY us, event_id) AS seq
        |  FROM l GROUP BY user_id)
        |SELECT user_id,
        |  CAST(len(regexp_extract_all(seq, 'c[ve]*p', 0)) AS BIGINT) AS n_paths
        |FROM seqs
        |WHERE len(regexp_extract_all(seq, 'c[ve]*p', 0)) > 0
        |ORDER BY user_id""".stripMargin,
    "q137_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - med.med) AS adev, med.med
        |  FROM events e JOIN med ON e.event_type = med.event_type),
        |mad AS (
        |  SELECT event_type, max(med) AS m,
        |    quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type, round(max(mad.m), 4) AS med,
        |  round(max(mad.mad), 4) AS mad,
        |  CAST(sum(CASE WHEN dev.adev > 3 * mad.mad THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_outliers
        |FROM dev JOIN mad ON dev.event_type = mad.event_type
        |GROUP BY dev.event_type
        |ORDER BY dev.event_type""".stripMargin,
    "q138_cohort_matrix" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk
        |  FROM events),
        |first AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY 1)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |  CAST((wk - cw) // 7 AS BIGINT) AS week_offset,
        |  count(*) AS n_users
        |FROM act JOIN first USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week, week_offset""".stripMargin,
    "q139_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |    max(o_orderdate) AS rec,
        |    count(*) AS freq,
        |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
        |  FROM orders GROUP BY 1),
        |scored AS (
        |  SELECT o_custkey,
        |    ntile(5) OVER (ORDER BY rec DESC, o_custkey) AS r,
        |    ntile(5) OVER (ORDER BY freq DESC, o_custkey) AS f,
        |    ntile(5) OVER (ORDER BY mon DESC, o_custkey) AS m
        |  FROM cust)
        |SELECT r || f || m AS segment, count(*) AS n_customers
        |FROM scored
        |GROUP BY 1
        |ORDER BY segment""".stripMargin,
  )
}
