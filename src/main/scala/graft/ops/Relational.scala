package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables._

/** Classic relational operator surface exercised on the TPC-H-ish
  * driver tables (SURVEY.md §2.2): scan+filter+project with pushdown,
  * hash/broadcast joins (inner/semi/anti), aggregation (incl. distinct
  * and grouping sets), window functions, top-k, and set operations.
  *
  * Conventions shared with the DuckDB oracles (SparkEntry.oracleSql):
  *  - every computed column is aliased identically on both sides;
  *  - double aggregates are rounded (sum order differs between engines,
  *    so raw doubles would differ in the last ulp);
  *  - results are totally ordered, with NULLS FIRST spelled out in the
  *    SQL (Spark's default ASC ordering is nulls-first, DuckDB's is
  *    nulls-last).
  */
object Relational {

  /** Pricing-summary aggregation (TPC-H Q1 shape): predicate pushdown to
    * the parquet scan + hash aggregate with partial (map-side) combine.
    */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1999-12-31").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 2).as("avg_qty"),
        round(avg(col("l_extendedprice")), 2).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Shipping-priority (TPC-H Q3 shape): selective filters on both join
    * sides, two shuffle joins on the fact tables, then top-k by revenue.
    */
  def topRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = orders(s, d).filter(col("o_orderdate") < lit("2000-01-01").cast("timestamp"))
    val l = lineitem(s, d).filter(col("l_shipdate") >= lit("1998-01-01").cast("timestamp"))
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** Star-schema rollup over broadcast dimensions: region ⋈ nation ⋈
    * customer. Both dims are far below the broadcast threshold — the
    * plan must contain zero shuffle joins.
    */
  def regionCustomer(s: SparkSession, d: String): DataFrame = {
    val r = region(s, d)
    val n = nation(s, d)
    customer(s, d)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("sum_acctbal"),
        round(avg(col("c_acctbal")), 2).as("avg_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Left-semi join (EXISTS): orders having at least one near-max-
    * quantity line item, counted per priority.
    */
  def ordersWithBigLines(s: SparkSession, d: String): DataFrame = {
    val bigLines = lineitem(s, d)
      .filter(col("l_quantity") >= 48)
      .select(col("l_orderkey"))
    orders(s, d)
      .join(bigLines, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-anti join (NOT EXISTS): customers that never placed an URGENT
    * order, per market segment.
    */
  def customersNoOrders(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey"))
    customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Global top-k via total order + limit (TakeOrderedAndProject — no
    * full sort at scale, each partition keeps only k rows).
    */
  def topkOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  /** Window ranking: top-3 orders per customer by price. Tie-broken on
    * o_orderkey so the ordering is total (deterministic across engines).
    */
  def windowTopPerCustomer(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn").cast("long").as("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Running (cumulative) aggregate per supplier over a total order —
    * the frame-based window path, vs. the ranking path above.
    * l_quantity is the last tie-break: the data contains duplicate
    * (orderkey, linenumber) pairs (1 at sf0.1), and rows identical in
    * every sort column INCLUDING the summand give the same running
    * values in either order.
    */
  def runningTotalPerSupplier(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lineitem(s, d)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), col("l_shipdate"))
      .withColumn("cum_qty", round(sum(col("l_quantity")).over(w), 2))
      .drop("l_quantity", "l_shipdate")
      .orderBy(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** ROLLUP grouping sets (flag, status) → (flag) → (). */
  def rollupQuantities(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** CUBE grouping sets over order status × priority. */
  def cubeOrders(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  /** Set operations: (urgent-buyers ∩ high-buyers) ∖ MACHINERY ∪
    * negative-balance customers. INTERSECT/EXCEPT/UNION all distinct.
    */
  def setOpsCustomers(s: SparkSession, d: String): DataFrame = {
    val c = customer(s, d)
    val o = orders(s, d)
    def buyers(prio: String): DataFrame =
      o.filter(col("o_orderpriority") === prio).select(col("o_custkey").as("custkey"))
    val machinery = c.filter(col("c_mktsegment") === "MACHINERY")
      .select(col("c_custkey").as("custkey"))
    val negative = c.filter(col("c_acctbal") < 0)
      .select(col("c_custkey").as("custkey"))
    buyers("1-URGENT").intersect(buyers("2-HIGH"))
      .except(machinery)
      .union(negative).distinct()
      .orderBy(col("custkey"))
  }

  /** Bag-semantics set operations (INTERSECT ALL / EXCEPT ALL):
    * multiplicities are min(m, n) and max(m − n, 0) respectively —
    * a genuinely different operator from the distinct forms (q11),
    * verified by counting surviving duplicates per key.
    */
  def setOpsAll(s: SparkSession, d: String): DataFrame = {
    val o = orders(s, d)
    def custkeys(prio: String): DataFrame =
      o.filter(col("o_orderpriority") === prio)
        .select(col("o_custkey").as("custkey")) // one row per ORDER → dups
    val inter = custkeys("1-URGENT").intersectAll(custkeys("2-HIGH"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
      .select(lit("intersect_all").as("op"), col("custkey"), col("n"))
    val exc = custkeys("1-URGENT").exceptAll(custkeys("2-HIGH"))
      .groupBy(col("custkey")).agg(count(lit(1)).as("n"))
      .select(lit("except_all").as("op"), col("custkey"), col("n"))
    inter.union(exc).orderBy(col("op"), col("custkey"))
  }

  /** Distinct aggregation (exact). */
  def distinctSuppliers(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        round(sum(col("l_extendedprice")), 2).as("sum_price"))
      .orderBy(col("l_returnflag"))

  /** Date-dimension aggregation: orders per calendar month. */
  def ordersPerMonth(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"), round(avg(col("o_totalprice")), 2).as("avg_price"))
      .orderBy(col("y"), col("m"))

  /** Conditional aggregation over a fact⋈dim join (TPC-H Q14 shape):
    * promo revenue share. part is broadcast; single-row output.
    */
  def promoRevenue(s: SparkSession, d: String): DataFrame = {
    val p = part(s, d).select(col("p_partkey"), col("p_type"))
    val rev = col("l_extendedprice") * (lit(1) - col("l_discount"))
    lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0.0))) * 100.0
          / sum(rev), 4).as("promo_pct"))
  }

  /** GROUPING SETS through the SQL front-end (spark.sql over a temp
    * view) — exercises the parser/analyzer surface, not just the
    * DataFrame DSL; grouping_id disambiguates the sets.
    */
  def groupingSetsSql(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n,
        |  grouping_id() AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
  }

  /** Bloom-filter semi-join (q105): build a 16 KB Bloom image of the
    * BUILDING-segment customer keys with the typed `BloomFilterAgg`,
    * probe every order through the codegen'd `mightContain` column
    * expression, and verify the runtime-filter contract from the data
    * itself: zero false negatives, false-positive rate within the
    * declared 5% envelope (measured < 1e-4 at every sf with the
    * 2^17-bit / 5-hash config).
    *
    * Scale shape: the ONE gate scan here tallies candidate/member
    * flags per order with a broadcast membership marker; production
    * use is `orders.filter(mightContain(...))` BEFORE a shuffle join —
    * the filter is a plan literal, so fact rows for absent keys die in
    * the scan stage without shuffling.
    */
  def bloomSemiJoin(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BloomFilterAgg
    import s.implicits._
    val dim = customer(s, d)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val bits = dim.select(col("c_custkey").as[Long])
      .select(BloomFilterAgg.toColumn).head()
    orders(s, d)
      .select(col("o_custkey"),
        BloomFilterAgg.mightContain(bits, col("o_custkey")).as("cand"))
      .join(broadcast(dim.withColumn("m", lit(1)))
        .withColumnRenamed("c_custkey", "o_custkey"), Seq("o_custkey"), "left")
      .agg(
        sum(when(col("m") === 1, 1L).otherwise(0L)).as("n_matched"),
        (sum(when(col("m") === 1 && !col("cand"), 1L).otherwise(0L)) === 0L)
          .as("no_false_negatives"),
        ((sum(when(col("m").isNull && col("cand"), 1.0).otherwise(0.0)) /
          sum(when(col("m").isNull, 1.0).otherwise(0.0))) <= 0.05)
          .as("fp_rate_ok"))
      .select(lit("BUILDING").as("segment"), col("n_matched"),
        col("no_false_negatives"), col("fp_rate_ok"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q105_bloom_semi_join"  -> bloomSemiJoin _,
    "q37_grouping_sets"     -> groupingSetsSql _,
    "q01_pricing_summary"   -> pricingSummary _,
    "q02_top_revenue"       -> topRevenueOrders _,
    "q03_region_customer"   -> regionCustomer _,
    "q04_semi_join"         -> ordersWithBigLines _,
    "q05_anti_join"         -> customersNoOrders _,
    "q06_topk_orders"       -> topkOrders _,
    "q07_window_rank"       -> windowTopPerCustomer _,
    "q08_running_total"     -> runningTotalPerSupplier _,
    "q09_rollup"            -> rollupQuantities _,
    "q10_cube"              -> cubeOrders _,
    "q11_set_ops"           -> setOpsCustomers _,
    "q65_set_ops_all"       -> setOpsAll _,
    "q12_distinct_agg"      -> distinctSuppliers _,
    "q13_orders_per_month"  -> ordersPerMonth _,
    "q14_promo_revenue"     -> promoRevenue _,
  )

  val oracleSql: Map[String, String] = Map(
    "q105_bloom_semi_join" ->
      """SELECT 'BUILDING' AS segment,
        |  count(*) AS n_matched,
        |  TRUE AS no_false_negatives,
        |  TRUE AS fp_rate_ok
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_mktsegment = 'BUILDING')""".stripMargin,
    "q37_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_extendedprice), 2) AS sum_price, count(*) AS n,
        |  grouping_id(l_returnflag, l_linestatus) AS gid
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
        |  round(avg(l_quantity), 2) AS avg_qty,
        |  round(avg(l_extendedprice), 2) AS avg_price,
        |  round(avg(l_discount), 4) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1999-12-31'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_revenue" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '2000-01-01'
        |  AND l_shipdate >= TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2
        |ORDER BY revenue DESC, l_orderkey
        |LIMIT 10""".stripMargin,
    "q03_region_customer" ->
      """SELECT r_name,
        |  count(*) AS n_customers,
        |  round(sum(c_acctbal), 2) AS sum_acctbal,
        |  round(avg(c_acctbal), 2) AS avg_acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q04_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity >= 48)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q05_anti_join" ->
      """SELECT c_mktsegment, count(*) AS n_customers
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,
    "q06_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice
        |FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 10""".stripMargin,
    "q07_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) t
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q08_running_total" ->
      """SELECT l_suppkey, l_orderkey, l_linenumber,
        |  round(sum(l_quantity) OVER (
        |    PARTITION BY l_suppkey
        |    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_qty
        |FROM lineitem
        |ORDER BY l_suppkey, l_orderkey, l_linenumber""".stripMargin,
    "q09_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q10_cube" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin,
    "q65_set_ops_all" ->
      """WITH u AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'),
        |h AS (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH'),
        |i AS (SELECT custkey FROM u INTERSECT ALL SELECT custkey FROM h),
        |e AS (SELECT custkey FROM u EXCEPT ALL SELECT custkey FROM h)
        |SELECT 'intersect_all' AS op, custkey, count(*) AS n FROM i GROUP BY custkey
        |UNION ALL
        |SELECT 'except_all' AS op, custkey, count(*) AS n FROM e GROUP BY custkey
        |ORDER BY op, custkey""".stripMargin,
    "q11_set_ops" ->
      """SELECT custkey FROM (
        |  SELECT custkey FROM (
        |    (SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        |     INTERSECT
        |     SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '2-HIGH')
        |    EXCEPT
        |    SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        |  UNION
        |  SELECT c_custkey AS custkey FROM customer WHERE c_acctbal < 0)
        |ORDER BY custkey""".stripMargin,
    "q12_distinct_agg" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part,
        |  round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q13_orders_per_month" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m,
        |  count(*) AS n_orders, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY y, m""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT round(
        |  sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) * 100.0
        |  / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,
  )
}
