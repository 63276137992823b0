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

  /** q217: Kaplan-Meier life table over user lifetimes. Each user's
    * lifetime is the whole-hour span between their first and last
    * event; a user whose last event predates the corpus horizon by
    * more than 12 h is an observed churn (event), anyone still active
    * at the horizon is right-censored — the standard survival-analysis
    * framing of retention. Per distinct lifetime t the table reports
    * the at-risk count, events, censorings, the discrete hazard d/n,
    * and the Kaplan-Meier survivor estimate S(t) = Π_{t'≤t} (1−d/n).
    *
    * Determinism: counts are exact integers end to end; each ratio
    * (n−d)/n is ONE double division (IEEE-identical on both engines),
    * and S(t) is a strictly LEFT-TO-RIGHT fold over the t-ordered
    * ratio list — Spark `aggregate` and DuckDB `list_reduce` both fold
    * sequentially, so every intermediate double product is
    * bit-identical (no order-dependent float aggregation anywhere; a
    * windowed PRODUCT would instead combine in segment-tree order).
    *
    * Scale shape: the corpus-sized work is one user-keyed min/max
    * rollup; the life table itself is bounded by distinct lifetime
    * hours (calendar-bounded — ≤ 87,600 rows even for a 10-year
    * corpus), so collapsing it to one array row is driver-free
    * constant-size work. The O(|t|²) prefix folds are arithmetic on
    * that bounded array; a decade-scale deployment would precompute
    * the at-risk prefix with an integer window sum and keep only the
    * O(|t|²) product folds (or move S(t) to log-space window sums at
    * reduced determinism).
    */
  def kaplanMeier(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d).select(col("user_id"), unix_micros(col("ts")).as("us"))
    val horizon = ev.agg(max(col("us")).as("max_us"))
    val life = ev.groupBy(col("user_id"))
      .agg(min(col("us")).as("f"), max(col("us")).as("l"))
    val lt = life.crossJoin(broadcast(horizon))
      .select(expr("(l - f) div 3600000000").as("t"),
        (col("l") <= col("max_us") - lit(43200000000L)).as("ch"))
      .groupBy(col("t"))
      .agg(sum(when(col("ch"), 1L).otherwise(0L)).as("d"),
        sum(when(col("ch"), 0L).otherwise(1L)).as("c"))
    val packed = lt
      .agg(array_sort(collect_list(struct(col("t"), col("d"), col("c")))).as("a"))
      .withColumn("total", aggregate(
        transform(col("a"), x => x.getField("d") + x.getField("c")),
        lit(0L), (acc, x) => acc + x))
      .withColumn("ns", transform(sequence(lit(1), size(col("a"))), j =>
        col("total") - aggregate(slice(col("a"), lit(1), j - 1), lit(0L),
          (acc, x) => acc + x.getField("d") + x.getField("c"))))
      .withColumn("rs", transform(sequence(lit(1), size(col("a"))), j =>
        (element_at(col("ns"), j) - element_at(col("a"), j).getField("d"))
          .cast("double") / element_at(col("ns"), j).cast("double")))
      .withColumn("kms", transform(sequence(lit(1), size(col("a"))), j =>
        aggregate(slice(col("rs"), lit(1), j), lit(1.0d), (p, x) => p * x)))
    packed
      .select(posexplode(arrays_zip(col("a"), col("ns"), col("kms"))))
      .select(col("col.a.t").as("t"),
        col("col.ns").as("n_at_risk"),
        col("col.a.d").as("churned"),
        col("col.a.c").as("censored"),
        round(col("col.a.d").cast("double") / col("col.ns").cast("double"), 6)
          .as("hazard"),
        round(col("col.kms"), 6).as("km_survival"))
      .orderBy(col("t"))
  }

  /** q218: frequent 3-event sequential patterns — for every ordered
    * trigram (a, b, c) of ADJACENT events in a user's full history,
    * the occurrence count, the user support (how many distinct users
    * exhibit it), and the median wall-clock µs span from a to c. The
    * session-agnostic complement to q116's within-session Markov
    * transitions: this is the "what journeys actually happen" mining
    * cut, q116 is the one-step chain model.
    *
    * Determinism: lag windows are totally ordered by (us, event_id);
    * counts are integers; the only float is the exact interpolated
    * median over integer µs spans (Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the q42-proven pairing). The median stays in µs
    * — every value is k or k+0.5 µs, exactly representable in double,
    * so no rounding enters at all (a /1e6-then-round would land the
    * .5 µs midpoints exactly on the round boundary).
    *
    * Scale shape: one user-keyed window pass (the same shuffle the
    * whole per-user family rides), then a groupBy on the trigram key —
    * output is bounded by |types|³, not the corpus. count(DISTINCT
    * user_id) expands to the standard two-level aggregate; the
    * percentile needs the per-trigram span multiset, which is the
    * grouping Spark already performs.
    */
  def seqPatterns(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    events(s, d)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"))
      .withColumn("b", lag(col("event_type"), 1).over(w))
      .withColumn("a", lag(col("event_type"), 2).over(w))
      .withColumn("aus", lag(col("us"), 2).over(w))
      .filter(col("a").isNotNull)
      .select(col("a"), col("b"), col("event_type").as("c"),
        col("user_id"), (col("us") - col("aus")).as("span"))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("user_id")).as("n_users"),
        expr("percentile(span, 0.5)").as("med_span_us"))
      .orderBy(col("a"), col("b"), col("c"))
  }

  /** q242: Poisson-bootstrap standard error of the per-type mean —
    * the one-pass distributed bootstrap (Chamandy et al.): instead of
    * resampling rows (impossible without a corpus-wide shuffle per
    * replica), each row gets an independent Poisson(1) weight per
    * replica, and the B weighted means' spread estimates the sampling
    * error. Pairs with q208: jackknife is cluster-robust, bootstrap
    * is the general-purpose one — both with ZERO random state.
    *
    * Determinism: the Poisson draw is a fixed quantile table over the
    * 52-bit integer md5-hash of (event_id, replica) — truncated at
    * w = 5 (residual mass 6e-4, documented); weights, weighted sums
    * (decimal), and replica means quantized to 1e-6 units are exact,
    * so the cross-replica moments are order-free integers (the q208
    * convention end to end).
    *
    * Scale shape: one narrow ×B explode (3 small columns), one
    * (type, replica)-keyed rollup, one |types|-keyed moment rollup.
    * B = 10 multiplies the scan projection, never the corpus width.
    */
  def poissonBootstrap(s: SparkSession, d: String, b: Int = 10): DataFrame = {
    val Dec19 = DataTypes.createDecimalType(19, 0)
    // floor(CDF_k(Poisson(1)) * 16^13), k = 0..4; >= last ⇒ w = 5
    val t = Seq(1656781714176974L, 3313563428353948L, 4141954285442435L,
      4418084571138597L, 4487117142562638L)
    val ev = events(s, d).select(col("event_type"), col("event_id"),
      floor(col("value") * 1e6 + 0.5).cast("long").as("vu"))
    val reps = ev.withColumn("r", explode(sequence(lit(1), lit(b))))
      .withColumn("u", conv(substring(md5(concat_ws("|",
        lit("pb"), col("event_id"), col("r"))), 1, 13), 16, 10).cast("long"))
      .withColumn("w",
        when(col("u") < t(0), 0L).when(col("u") < t(1), 1L)
          .when(col("u") < t(2), 2L).when(col("u") < t(3), 3L)
          .when(col("u") < t(4), 4L).otherwise(5L))
    val perRep = reps.groupBy(col("event_type"), col("r"))
      .agg(sum(col("w") * col("vu").cast(Dec19)).as("swv"),
        sum(col("w")).as("sw"))
      .filter(col("sw") > 0)
      .select(col("event_type"),
        floor(col("swv").cast("double") / col("sw").cast("double") + 0.5)
          .cast("long").as("mr"))
    val point = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("vu").cast(Dec19)).as("sv"))
    perRep.groupBy(col("event_type"))
      .agg(count(lit(1)).as("bb"), sum(col("mr").cast(Dec19)).as("sm"),
        sum(col("mr").cast(Dec19) * col("mr").cast(Dec19)).as("qm"))
      .join(point, Seq("event_type"))
      .select(col("event_type"), col("n_events"),
        round(col("sv").cast("double")
          / (col("n_events").cast("double") * 1e6), 6).as("mean_value"),
        when(col("bb") > 1, round(sqrt(
          (col("bb").cast("double") * col("qm").cast("double")
            - col("sm").cast("double") * col("sm").cast("double"))
            / (col("bb").cast("double") * (col("bb") - 1).cast("double")))
          / 1e6, 6)).as("boot_se"))
      .orderBy(col("event_type"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q242_poisson_bootstrap" -> ((s: SparkSession, d: String) => poissonBootstrap(s, d)),
    "q217_kaplan_meier"  -> kaplanMeier _,
    "q218_seq_patterns"  -> seqPatterns _,
    "q208_jackknife_se"  -> jackknifeSe _,
    "q181_streaks" -> activityStreaks _,
    "q136_sequence_match" -> ((s: SparkSession, d: String) => sequenceMatch(s, d)),
    "q137_mad_outliers"   -> madOutliers _,
    "q138_cohort_matrix"  -> cohortMatrix _,
    "q139_rfm_segments"   -> rfmSegments _,
  )

  val oracleSql: Map[String, String] = Map(
    "q242_poisson_bootstrap" ->
      """WITH ev AS (
        |  SELECT event_type, event_id,
        |    CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vu
        |  FROM events),
        |reps AS (
        |  SELECT event_type, event_id, vu, r,
        |    ('0x' || substr(md5('pb|' || CAST(event_id AS VARCHAR)
        |       || '|' || CAST(r AS VARCHAR)), 1, 13))::BIGINT AS u
        |  FROM ev, unnest(range(1, 11)) t(r)),
        |ww AS (
        |  SELECT event_type, r, vu,
        |    CASE WHEN u < 1656781714176974 THEN 0
        |         WHEN u < 3313563428353948 THEN 1
        |         WHEN u < 4141954285442435 THEN 2
        |         WHEN u < 4418084571138597 THEN 3
        |         WHEN u < 4487117142562638 THEN 4
        |         ELSE 5 END AS w
        |  FROM reps),
        |pr AS (
        |  SELECT event_type, r,
        |    CAST(sum(CAST(w AS DECIMAL(19,0)) * CAST(vu AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS swv,
        |    CAST(sum(w) AS BIGINT) AS sw
        |  FROM ww GROUP BY 1, 2),
        |mr AS (
        |  SELECT event_type,
        |    CAST(floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) + 0.5)
        |      AS BIGINT) AS mr
        |  FROM pr WHERE sw > 0),
        |mom AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS bb,
        |    CAST(sum(CAST(mr AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sm,
        |    CAST(sum(CAST(mr AS DECIMAL(19,0)) * CAST(mr AS DECIMAL(19,0)))
        |      AS DECIMAL(38,0)) AS qm
        |  FROM mr GROUP BY 1),
        |pt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(sum(CAST(vu AS DECIMAL(19,0))) AS DECIMAL(38,0)) AS sv
        |  FROM ev GROUP BY 1)
        |SELECT pt.event_type, pt.n_events,
        |  round(CAST(sv AS DOUBLE)
        |    / (CAST(n_events AS DOUBLE) * 1000000), 6) AS mean_value,
        |  CASE WHEN bb > 1 THEN
        |    round(sqrt(
        |      (CAST(bb AS DOUBLE) * CAST(qm AS DOUBLE)
        |        - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE))
        |      / (CAST(bb AS DOUBLE) * CAST(bb - 1 AS DOUBLE)))
        |      / 1000000, 6)
        |  END AS boot_se
        |FROM mom JOIN pt USING (event_type)
        |ORDER BY event_type""".stripMargin,
    "q217_kaplan_meier" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |life AS (SELECT user_id, min(us) AS f, max(us) AS l FROM ev GROUP BY 1),
        |mx AS (SELECT max(us) AS max_us FROM ev),
        |u AS (SELECT (l - f) // 3600000000 AS t,
        |             l <= max_us - 43200000000 AS ch FROM life CROSS JOIN mx),
        |lt AS (SELECT t,
        |         CAST(sum(CASE WHEN ch THEN 1 ELSE 0 END) AS BIGINT) AS d,
        |         CAST(sum(CASE WHEN ch THEN 0 ELSE 1 END) AS BIGINT) AS c
        |       FROM u GROUP BY 1),
        |p AS (SELECT list(struct_pack(t := t, d := d, c := c) ORDER BY t) AS a
        |      FROM lt),
        |w1 AS (SELECT a,
        |  CAST(list_sum([a[j].d + a[j].c for j in range(1, len(a)+1)]) AS BIGINT)
        |    AS total FROM p),
        |w2 AS (SELECT a,
        |  [ total - CAST(coalesce(
        |      list_sum([a[x].d + a[x].c for x in range(1, j)]), 0) AS BIGINT)
        |    for j in range(1, len(a)+1) ] AS ns FROM w1),
        |w3 AS (SELECT a, ns,
        |  [ CAST(ns[j] - a[j].d AS DOUBLE) / CAST(ns[j] AS DOUBLE)
        |    for j in range(1, len(a)+1) ] AS rs FROM w2),
        |w4 AS (SELECT a, ns,
        |  [ list_reduce(rs[1:j], (p2, x) -> p2 * x)
        |    for j in range(1, len(a)+1) ] AS kms FROM w3)
        |SELECT a[j].t AS t, CAST(ns[j] AS BIGINT) AS n_at_risk,
        |  a[j].d AS churned, a[j].c AS censored,
        |  round(CAST(a[j].d AS DOUBLE) / CAST(ns[j] AS DOUBLE), 6) AS hazard,
        |  round(kms[j], 6) AS km_survival
        |FROM w4, unnest(range(1, len(a)+1)) t2(j)
        |ORDER BY t""".stripMargin,
    "q218_seq_patterns" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_us(date_trunc('microseconds', ts)) AS us
        |  FROM events),
        |t AS (
        |  SELECT user_id, event_type AS c,
        |    lag(event_type, 1) OVER w AS b,
        |    lag(event_type, 2) OVER w AS a,
        |    us, lag(us, 2) OVER w AS aus
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |p AS (
        |  SELECT a, b, c, user_id, us - aus AS span
        |  FROM t WHERE a IS NOT NULL)
        |SELECT a, b, c, CAST(count(*) AS BIGINT) AS n_occ,
        |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
        |  quantile_cont(CAST(span AS DOUBLE), 0.5) AS med_span_us
        |FROM p GROUP BY 1, 2, 3
        |ORDER BY a, b, c""".stripMargin,
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
