package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** SQL-front-end and reshaping breadth: correlated scalar subqueries
  * (Catalyst decorrelation), UNPIVOT (the inverse of q41's pivot), and
  * the portable date-function family.
  */
object SqlSuite {

  /** Orders priced >20% above their customer's average — a correlated
    * scalar subquery through `spark.sql`, decorrelated by Catalyst
    * into an aggregate+join (no per-row re-execution). The inner avg
    * runs in DECIMAL so the threshold is exact and order-independent
    * on both engines.
    */
  def correlatedSubquery(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT 1.2 * avg(CAST(o2.o_totalprice AS DECIMAL(28,6)))
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** q41's daily pivot melted back to long form via `unpivot` —
    * wide→long is its own operator, not just the pivot inverse.
    */
  def unpivotDaily(s: SparkSession, d: String): DataFrame =
    EventAnalytics.dailyPivot(s, d)
      .unpivot(Array(col("day")),
        Array(col("click"), col("view"), col("purchase"), col("signup"),
          col("error")),
        "event_type", "n")
      .orderBy(col("day"), col("event_type"))

  /** Portable date-function family over order dates: calendar parts,
    * ISO week, month-end, month arithmetic (both engines clamp
    * Jan 31 + 1 month to Feb 28), day arithmetic, and day diffs.
    *
    * Oracle caveat: the day add is `od + 30` (DATE + INTEGER), NOT
    * `+ INTERVAL 30 DAY` — DuckDB 1.0 compares INTERVAL 30 DAY equal
    * to INTERVAL 1 MONTH (month ≈ 30 d normalization), so CSE
    * collapses the two additions into whichever appears first.
    */
  def dateFuncs(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .withColumn("od", col("o_orderdate").cast("date"))
      .select(col("o_orderkey"),
        date_format(col("od"), "yyyy-MM-dd").as("day"),
        year(col("od")).cast("long").as("y"),
        quarter(col("od")).cast("long").as("q"),
        month(col("od")).cast("long").as("m"),
        dayofmonth(col("od")).cast("long").as("dom"),
        dayofweek(col("od")).cast("long").as("dow"), // 1 = Sunday
        weekofyear(col("od")).cast("long").as("iso_week"),
        date_format(last_day(col("od")), "yyyy-MM-dd").as("month_end"),
        date_format(add_months(col("od"), 1), "yyyy-MM-dd").as("plus_month"),
        date_format(date_add(col("od"), 30), "yyyy-MM-dd").as("plus30"),
        datediff(lit("1998-01-01").cast("date"), col("od")).cast("long")
          .as("days_to_98"))
      .orderBy(col("o_orderkey"))

  /** Top-2 customers by balance per nation via a correlated LATERAL
    * subquery with ORDER BY + LIMIT — the "top-k per group as a join"
    * formulation (Spark plans it as a DomainJoin + window under the
    * hood; DuckDB runs the same SQL natively).
    */
  def lateralTopK(s: SparkSession, d: String): DataFrame = {
    nation(s, d).createOrReplaceTempView("nation")
    customer(s, d).createOrReplaceTempView("customer")
    s.sql(
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |  LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |           WHERE c.c_nationkey = n.n_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin)
  }

  /** JSON construction + parse round-trip: rows serialized with
    * `to_json(struct(...))`, parsed back with the declared schema, and
    * aggregated from the EXTRACTED fields — checks serializer/parser
    * semantics without comparing raw JSON text (whose formatting is an
    * engine detail).
    */
  def jsonRoundTrip(s: SparkSession, d: String): DataFrame =
    orders(s, d)
      .select(to_json(struct(col("o_orderkey").as("k"),
        col("o_orderpriority").as("p"))).as("j"))
      .select(from_json(col("j"),
        org.apache.spark.sql.types.StructType.fromDDL("k BIGINT, p STRING")).as("r"))
      .groupBy(col("r.p").as("priority"))
      .agg(count(lit(1)).as("n"), sum(col("r.k")).as("sum_key"))
      .orderBy(col("priority"))

  /** Recursive CTE (Spark 4's WITH RECURSIVE — the iterative-union
    * operator the engine previously only had as the hand-rolled q51
    * loop): ancestor chain of a synthetic binary-key hierarchy
    * (node → node div 2 → … → 1), aggregated to depth and path sum per
    * starting key. Same construct runs verbatim-modulo-dialect (`DIV`
    * vs `//`) on DuckDB.
    */
  def recursiveCte(s: SparkSession, d: String): DataFrame = {
    orders(s, d).createOrReplaceTempView("orders")
    s.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT o_orderkey AS orderkey, o_orderkey AS node, 0 AS depth
        |  FROM orders WHERE o_orderkey < 500
        |  UNION ALL
        |  SELECT orderkey, node DIV 2 AS node, depth + 1 AS depth
        |  FROM anc WHERE node > 1)
        |SELECT orderkey, CAST(max(depth) AS BIGINT) AS depth,
        |  CAST(sum(node) AS BIGINT) AS path_sum
        |FROM anc
        |GROUP BY orderkey
        |ORDER BY orderkey""".stripMargin)
  }

  /** q184: parameterized SQL + the IDENTIFIER clause — the injection-
    * safe front-end surface (named parameter markers for values, an
    * IDENTIFIER parameter for the table name) a multi-tenant SQL
    * service builds on instead of string interpolation. The plan is
    * identical to the literal query once bound, so there is zero
    * runtime cost.
    */
  def paramSql(s: SparkSession, d: String): DataFrame = {
    graft.util.Tables.lineitem(s, d).createOrReplaceTempView("li_param")
    s.sql(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM IDENTIFIER(:tbl)
        |WHERE l_quantity >= :minq
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
      Map("tbl" -> "li_param", "minq" -> Integer.valueOf(30)))
  }

  /** q195: SQL pipe syntax (Spark 4's `|>` operators — FROM … |> WHERE
    * … |> AGGREGATE) — the linear query-authoring surface; the parser
    * lowers it to the identical logical plan as the nested form, so
    * this pins front-end breadth at zero runtime cost.
    */
  def pipeSql(s: SparkSession, d: String): DataFrame = {
    graft.util.Tables.lineitem(s, d).createOrReplaceTempView("li_pipe")
    s.sql(
      """FROM li_pipe
        ||> WHERE l_quantity >= 25
        ||> AGGREGATE count(*) AS n,
        |     CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |       AS sum_qty
        |   GROUP BY l_returnflag
        ||> ORDER BY l_returnflag""".stripMargin)
  }

  /** q246: GROUP BY ALL — the analyst-SQL sugar both engines now
    * share (Spark 3.4+ / DuckDB): every non-aggregate select item
    * becomes a grouping key, so wide rollups stop repeating their
    * column lists (and stop silently mis-grouping when an edit adds a
    * dimension to SELECT but not GROUP BY — the bug class this sugar
    * exists to kill). Resolution happens in the parser; the plan is
    * the ordinary hash aggregate.
    */
  def groupByAll(s: SparkSession, d: String): DataFrame = {
    lineitem(s, d).createOrReplaceTempView("lineitem_gba")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem_gba
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  /** q260: SQL session variables + dynamic SQL — the remaining
    * modern-SQL entry points a migrating warehouse user hits after
    * q184 (parameterized SQL + IDENTIFIER), q195 (pipe syntax) and
    * q246 (GROUP BY ALL): DECLARE VARIABLE, SET VARIABLE from a
    * scalar subquery (itself resolving the table through
    * IDENTIFIER(var)), the query TEXT held in a variable, and
    * EXECUTE IMMEDIATE … USING binding the threshold variable into
    * a parameter marker. The oracle literalizes the variable chain:
    * the threshold subquery inlines as a scalar subquery, which is
    * exactly what the variable indirection evaluates to.
    *
    * Scale shape: variables are session-scoped scalars resolved at
    * analysis time — the executed plan is the plain filtered
    * aggregate (threshold subquery as a broadcast scalar), so the
    * front-end sugar costs nothing at runtime.
    */
  def sessionVars(s: SparkSession, d: String): DataFrame = {
    graft.util.Tables.lineitem(s, d).createOrReplaceTempView("li_vars")
    s.sql("DECLARE OR REPLACE VARIABLE graft_tbl STRING")
    s.sql("SET VARIABLE graft_tbl = 'li_vars'")
    s.sql("DECLARE OR REPLACE VARIABLE graft_minq BIGINT")
    s.sql("SET VARIABLE graft_minq = " +
      "(SELECT CAST(max(l_quantity) AS BIGINT) - 5 FROM IDENTIFIER(graft_tbl))")
    s.sql("DECLARE OR REPLACE VARIABLE graft_qtext STRING")
    s.sql(
      """SET VARIABLE graft_qtext =
        |  'SELECT l_returnflag, count(*) AS n,
        |     CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |       AS sum_qty
        |   FROM IDENTIFIER(graft_tbl)
        |   WHERE l_quantity >= ?
        |   GROUP BY l_returnflag
        |   ORDER BY l_returnflag'""".stripMargin)
    s.sql("EXECUTE IMMEDIATE graft_qtext USING graft_minq")
  }

  /** q276: SQL SCRIPTING (SQL/PSM compound statements) — the last
    * modern-SQL front-end block after q184/q195/q246/q260/q265/q266:
    * one `spark.sql` call executes a BEGIN…END script exercising
    * block-scoped DECLARE, a NESTED compound with an EXIT HANDLER FOR
    * SQLEXCEPTION (fed a guaranteed ANSI error — 1 DIV 0 — so the
    * handler provably fires and sets `err_flag`, and execution
    * provably CONTINUES after the nested block), a DATA-DEPENDENT
    * WHILE loop (raise the quantity threshold in steps of 5 until at
    * most a quarter of lineitem qualifies), an IF cap, and a final
    * SELECT whose result is the script's return value.
    *
    * The oracle literalizes the control flow: the WHILE fixed point
    * is the minimum of the arithmetic grid 10+5k whose count clears
    * the bound (provably identical to the loop exit on an integer
    * grid), the IF cap is LEAST(thr, 100), and the handler flag is
    * the constant 1 — so the gate pins loop convergence, handler
    * firing, AND post-handler continuation, not just the final
    * aggregate.
    *
    * Scale shape: each loop iteration is one count(*) aggregate over
    * the pushed-down quantity predicate (the loop runs a bounded
    * ~6 iterations on any data — quantity is 1..50); the script
    * machinery itself is driver-side control flow around ordinary
    * Catalyst plans, costing nothing at executor scale.
    */
  def sqlScripting(s: SparkSession, d: String): DataFrame = {
    // the WHILE loop's condition re-evaluates two counts over the view
    // per iteration (~7 iterations to the quartile threshold) — cache
    // the NARROW projection the script actually touches so each
    // iteration probes memory instead of re-scanning the parquet
    // (guide §1.2; same derived-projection discipline as dblVecs)
    graft.util.CacheRegistry.register(
      graft.util.Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity")).cache())
      .createOrReplaceTempView("li_script")
    s.sql(
      """BEGIN
        |  DECLARE thr BIGINT DEFAULT 10;
        |  DECLARE err_flag BIGINT DEFAULT 0;
        |  BEGIN
        |    DECLARE EXIT HANDLER FOR SQLEXCEPTION
        |    BEGIN
        |      SET err_flag = 1;
        |    END;
        |    SELECT 1 DIV 0;
        |  END;
        |  WHILE (SELECT count(*) FROM li_script WHERE l_quantity >= thr)
        |      > (SELECT count(*) DIV 4 FROM li_script) DO
        |    SET thr = thr + 5;
        |  END WHILE;
        |  IF thr > 100 THEN
        |    SET thr = 100;
        |  END IF;
        |  SELECT l_returnflag, thr AS thr_used, err_flag,
        |    count(*) AS n,
        |    CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |      AS sum_qty
        |  FROM li_script WHERE l_quantity >= thr
        |  GROUP BY l_returnflag ORDER BY l_returnflag;
        |END""".stripMargin)
  }

  /** q265: the VARIANT type — Spark 4's open semi-structured column
    * (the ingestion shape for JSON event payloads whose schema you
    * don't control): rows serialize to JSON, parse into VARIANT
    * (`parse_json`), and every downstream read is a typed
    * `variant_get` path extraction — including a nested object and
    * an array index — with `try_variant_get` proving the miss path
    * (a wrong path yields NULL, not an error). The aggregation runs
    * entirely over extracted fields; the oracle computes the same
    * rollup from the relational columns directly, so the gate proves
    * the VARIANT round-trip is lossless.
    *
    * Scale shape: VARIANT stores a parsed binary form, so path
    * extraction is a field probe, not a per-row JSON re-parse; the
    * rollup is an ordinary |statuses|-group aggregate. Doubles
    * round-trip shortest-form JSON exactly; sums ride DECIMAL(28,6)
    * per the engine-wide convention.
    */
  def variantJson(s: SparkSession, d: String): DataFrame = {
    graft.util.Tables.orders(s, d).createOrReplaceTempView("ord_var")
    s.sql(
      """WITH v AS (
        |  SELECT parse_json(to_json(named_struct(
        |    'k', o_orderkey,
        |    'info', named_struct('status', o_orderstatus, 'amt', o_totalprice),
        |    'tags', array(o_orderpriority, 'fixed')))) AS payload
        |  FROM ord_var),
        |x AS (
        |  SELECT
        |    variant_get(payload, '$.info.status', 'string') AS status,
        |    variant_get(payload, '$.tags[0]', 'string') AS priority,
        |    CAST(variant_get(payload, '$.info.amt', 'double')
        |      AS DECIMAL(28,6)) AS amt,
        |    variant_get(payload, '$.k', 'long') AS k,
        |    try_variant_get(payload, '$.no.such.path', 'string') AS missing
        |  FROM v)
        |SELECT status, priority, count(*) AS n,
        |  CAST(round(sum(amt), 2) AS DOUBLE) AS sum_amt,
        |  max(k) AS max_key,
        |  CAST(count(missing) AS BIGINT) AS n_missing
        |FROM x
        |GROUP BY status, priority
        |ORDER BY status, priority""".stripMargin)
  }

  /** q266: ORDER BY ALL + lateral column aliases — the last two
    * analyst-SQL sugars on the migration checklist after q246 (GROUP
    * BY ALL), q195 (pipe syntax), q184/q260 (parameters/variables):
    * `n_twice` is a LATERAL alias reading the aggregate alias `n`
    * from the same SELECT list (no subquery wrap), and ORDER BY ALL
    * sorts by every output column left-to-right. The oracle spells
    * both out (explicit expression, explicit column list), proving
    * the sugar's semantics rather than assuming DuckDB's identical
    * shorthand.
    */
  def orderByAll(s: SparkSession, d: String): DataFrame = {
    graft.util.Tables.lineitem(s, d).createOrReplaceTempView("li_oba")
    s.sql(
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(n * 2 AS BIGINT) AS n_twice
        |FROM li_oba
        |GROUP BY 1, 2
        |ORDER BY ALL""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q266_order_by_all" -> orderByAll _,
    "q265_variant_json" -> variantJson _,
    "q260_session_vars" -> sessionVars _,
    "q276_sql_scripting" -> sqlScripting _,
    "q246_group_by_all" -> groupByAll _,
    "q195_pipe_sql"  -> pipeSql _,
    "q184_param_sql" -> paramSql _,
    "q94_recursive_cte" -> recursiveCte _,
    "q75_json_roundtrip" -> jsonRoundTrip _,
    "q66_lateral_topk" -> lateralTopK _,
    "q58_correlated" -> correlatedSubquery _,
    "q59_unpivot"    -> unpivotDaily _,
    "q60_date_funcs" -> dateFuncs _,
  )

  val oracleSql: Map[String, String] = Map(
    // q265: the same rollup from the relational columns directly —
    // equality proves the VARIANT round-trip lost nothing
    "q265_variant_json" ->
      """SELECT o_orderstatus AS status, o_orderpriority AS priority,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_amt,
        |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
        |  CAST(0 AS BIGINT) AS n_missing
        |FROM orders
        |GROUP BY 1, 2
        |ORDER BY status, priority""".stripMargin,
    // q266: sugar spelled out — lateral alias expanded, ORDER BY ALL
    // as the explicit left-to-right column list
    "q266_order_by_all" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty,
        |  CAST(count(*) * 2 AS BIGINT) AS n_twice
        |FROM lineitem
        |GROUP BY 1, 2
        |ORDER BY 1, 2, 3, 4, 5""".stripMargin,
    // the variable chain literalized: graft_minq's defining subquery
    // inlined where the parameter marker bound it
    "q260_session_vars" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_quantity >=
        |  (SELECT CAST(max(l_quantity) AS BIGINT) - 5 FROM lineitem)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // the script's control flow literalized: the WHILE fixed point is
    // the minimum of the 10+5k grid whose count clears total DIV 4
    // (identical to the loop exit on an integer grid), the IF cap is
    // LEAST(thr, 100), and the fired handler is the constant 1
    "q276_sql_scripting" ->
      """WITH grid AS (
        |  SELECT 10 + 5 * g AS thr FROM generate_series(0, 30) t(g)),
        |lim AS (SELECT count(*) // 4 AS lim FROM lineitem),
        |pick AS (
        |  SELECT CAST(least(min(thr), 100) AS BIGINT) AS thr
        |  FROM grid
        |  WHERE (SELECT count(*) FROM lineitem WHERE l_quantity >= thr)
        |    <= (SELECT lim FROM lim))
        |SELECT l_returnflag,
        |  (SELECT thr FROM pick) AS thr_used,
        |  CAST(1 AS BIGINT) AS err_flag,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_quantity >= (SELECT thr FROM pick)
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q246_group_by_all" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |GROUP BY ALL
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q195_pipe_sql" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_quantity >= 25
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q184_param_sql" ->
      """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE)
        |    AS sum_qty
        |FROM lineitem
        |WHERE l_quantity >= 30
        |GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    "q94_recursive_cte" ->
      """WITH RECURSIVE anc AS (
        |  SELECT o_orderkey AS orderkey, o_orderkey AS node, 0 AS depth
        |  FROM orders WHERE o_orderkey < 500
        |  UNION ALL
        |  SELECT orderkey, node // 2 AS node, depth + 1 AS depth
        |  FROM anc WHERE node > 1)
        |SELECT orderkey, CAST(max(depth) AS BIGINT) AS depth,
        |  CAST(sum(node) AS BIGINT) AS path_sum
        |FROM anc
        |GROUP BY orderkey
        |ORDER BY orderkey""".stripMargin,
    "q75_json_roundtrip" ->
      """WITH j AS (
        |  SELECT to_json(struct_pack(k := o_orderkey, p := o_orderpriority)) AS j
        |  FROM orders),
        |r AS (
        |  SELECT TRY_CAST(json_extract_string(j, '$.k') AS BIGINT) AS k,
        |    json_extract_string(j, '$.p') AS p
        |  FROM j)
        |SELECT p AS priority, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_key
        |FROM r
        |GROUP BY p
        |ORDER BY priority""".stripMargin,
    "q66_lateral_topk" ->
      """SELECT n.n_name, t.c_custkey, t.c_acctbal
        |FROM nation n,
        |  LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |           WHERE c.c_nationkey = n.n_nationkey
        |           ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, t.c_custkey""".stripMargin,
    "q58_correlated" ->
      """SELECT o_orderpriority, count(*) AS n_above
        |FROM orders o
        |WHERE o_totalprice > (
        |  SELECT 1.2 * avg(CAST(o2.o_totalprice AS DECIMAL(28,6)))
        |  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q59_unpivot" ->
      s"""WITH p AS (${EventAnalytics.oracleSql("q41_daily_pivot")})
        |SELECT day, t.event_type,
        |  CASE t.event_type
        |    WHEN 'click' THEN click WHEN 'view' THEN view
        |    WHEN 'purchase' THEN purchase WHEN 'signup' THEN signup
        |    ELSE error END AS n
        |FROM p, UNNEST(['click', 'view', 'purchase', 'signup', 'error']) AS t(event_type)
        |ORDER BY day, event_type""".stripMargin,
    "q60_date_funcs" ->
      """WITH t AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS od FROM orders)
        |SELECT o_orderkey,
        |  strftime(od, '%Y-%m-%d') AS day,
        |  year(od) AS y,
        |  quarter(od) AS q,
        |  month(od) AS m,
        |  day(od) AS dom,
        |  dayofweek(od) + 1 AS dow,
        |  weekofyear(od) AS iso_week,
        |  strftime(last_day(od), '%Y-%m-%d') AS month_end,
        |  strftime(od + INTERVAL 1 MONTH, '%Y-%m-%d') AS plus_month,
        |  strftime(od + 30, '%Y-%m-%d') AS plus30,
        |  date_diff('day', od, DATE '1998-01-01') AS days_to_98
        |FROM t
        |ORDER BY o_orderkey""".stripMargin,
  )
}
