package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Breadth suites proving the engine's scalar/window surface
  * (SURVEY.md §2.2 "classic relational set"): the full window-function
  * family, array/higher-order functions, and the portable string
  * function set. Each query exercises many functions at once so the
  * oracle hash pins every one of them.
  */
object Suites {

  /** Window-function family over each customer's order history:
    * row_number, lag/lead, ntile, percent_rank, cume_dist,
    * first_value, nth_value — all on one totally-ordered window
    * ((date, orderkey) is unique per customer → deterministic).
    * percent_rank/cume_dist are exact small-integer ratios, so raw
    * doubles compare bit-identically across engines.
    */
  def windowSuite(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
        row_number().over(w).cast("long").as("rn"),
        rank().over(w).cast("long").as("rk"),
        dense_rank().over(w).cast("long").as("drk"),
        lag(col("o_orderkey"), 1).over(w).as("prev_order"),
        lead(col("o_orderkey"), 1).over(w).as("next_order"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        first(col("o_totalprice")).over(w).as("first_price"),
        nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  /** Array / higher-order functions per document: size, distinct,
    * sort+slice+join, membership, and a transform/max pipeline over
    * whitespace tokens (same tokenizer as TextAnalysis for parity).
    */
  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tok"),
        size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
        array_join(slice(array_sort(array_distinct(col("toks"))), 1, 3), "|")
          .as("first3"),
        array_contains(col("toks"), "the").cast("long").as("has_the"),
        array_max(transform(col("toks"), t => length(t))).cast("long")
          .as("max_len"))
      .orderBy(col("doc_id"))

  /** Portable string-function suite per customer: case, pad, reverse,
    * split_part, position, levenshtein, translate, substring, repeat,
    * printf-style formatting.
    */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_mktsegment")).as("up"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
        reverse(col("c_mktsegment")).as("rev"),
        element_at(split(col("c_name"), "#"), 2).as("part2"),
        instr(col("c_name"), "1").cast("long").as("pos1"),
        levenshtein(col("c_mktsegment"), lit("BUILDING")).cast("long").as("lev"),
        translate(col("c_name"), "0123456789", "##########").as("tr"),
        substring(col("c_name"), 10, 5).as("sub"),
        repeat(substring(col("c_mktsegment"), 1, 2), 2).as("rep"),
        format_string("%05d-%s", col("c_custkey"), col("c_mktsegment")).as("fmt"))
      .orderBy(col("c_custkey"))

  /** Deterministic mode (most frequent value, ties to the larger
    * value): count per (group, value), then argmax via max over
    * (count, value) structs — one extra tiny aggregation instead of a
    * sort, and a pinned tie rule (the built-in `mode()` leaves ties
    * undefined in both engines).
    */
  def modeAgg(s: SparkSession, d: String): DataFrame = {
    val joined = orders(s, d).join(customer(s, d),
      col("o_custkey") === col("c_custkey"))
    joined.groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("c_mktsegment"))
      .agg(max(struct(col("n"), col("o_orderpriority"))).as("m"))
      .select(col("c_mktsegment"), col("m.o_orderpriority").as("modal_priority"),
        col("m.n").as("n"))
      .orderBy(col("c_mktsegment"))
  }

  /** String aggregation (LISTAGG): values sorted before joining so the
    * result is order-independent (`collect_list` order is partition-
    * dependent; `sort_array` pins it — DuckDB's `string_agg ORDER BY`
    * is the same contract).
    */
  def stringAgg(s: SparkSession, d: String): DataFrame =
    nation(s, d).join(region(s, d), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(concat_ws(",", sort_array(collect_list(col("n_name")))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy(col("r_name"))

  /** Reproducible train/val/test split assignment — the sampling op a
    * training-data pipeline actually needs: bucket = md5-hash of the
    * stable key mod 100 (NOT rand() — re-runs, late data, and both
    * engines agree), 80/10/10. Output: split sizes + an exact decimal
    * sum per split proving membership is identical, not just counts.
    */
  def hashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(conv(substring(md5(concat_ws("|",
      col("l_orderkey"), col("l_linenumber"))), 1, 15), 16, 10).cast("long"),
      lit(100))
    lineitem(s, d)
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast(
          org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6))), 2)
          .cast("double").as("sum_qty"))
      .orderBy(col("split"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_window_suite" -> windowSuite _,
    "q49_array_funcs"  -> arrayFuncs _,
    "q50_string_funcs" -> stringFuncs _,
    "q69_mode"         -> modeAgg _,
    "q70_string_agg"   -> stringAgg _,
    "q71_hash_split"   -> hashSplit _,
  )

  val oracleSql: Map[String, String] = Map(
    "q69_mode" ->
      """WITH c AS (
        |  SELECT c_mktsegment, o_orderpriority, count(*) AS n
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, o_orderpriority),
        |r AS (
        |  SELECT c_mktsegment, o_orderpriority AS modal_priority, n,
        |    row_number() OVER (PARTITION BY c_mktsegment
        |                       ORDER BY n DESC, o_orderpriority DESC) AS rn
        |  FROM c)
        |SELECT c_mktsegment, modal_priority, n
        |FROM r WHERE rn = 1
        |ORDER BY c_mktsegment""".stripMargin,
    "q70_string_agg" ->
      """SELECT r_name,
        |  string_agg(n_name, ',' ORDER BY n_name) AS nations,
        |  count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name
        |ORDER BY r_name""".stripMargin,
    "q71_hash_split" ->
      """WITH t AS (
        |  SELECT l_quantity,
        |    ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
        |       CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
        |  FROM lineitem)
        |SELECT CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n,
        |  CAST(round(sum(CAST(l_quantity AS DECIMAL(28,6))), 2) AS DOUBLE) AS sum_qty
        |FROM t
        |GROUP BY 1
        |ORDER BY split""".stripMargin,
    "q46_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  row_number() OVER w AS rn,
        |  rank() OVER w AS rk,
        |  dense_rank() OVER w AS drk,
        |  lag(o_orderkey, 1) OVER w AS prev_order,
        |  lead(o_orderkey, 1) OVER w AS next_order,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  nth_value(o_totalprice, 2) OVER w AS second_price
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q49_array_funcs" ->
      """WITH t AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS toks FROM documents)
        |SELECT doc_id,
        |  len(toks) AS n_tok,
        |  len(list_distinct(toks)) AS n_uniq,
        |  array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS first3,
        |  list_contains(toks, 'the')::BIGINT AS has_the,
        |  list_max(list_transform(toks, x -> length(x)))::BIGINT AS max_len
        |FROM t
        |ORDER BY doc_id""".stripMargin,
    "q50_string_funcs" ->
      """SELECT c_custkey,
        |  upper(c_mktsegment) AS up,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
        |  reverse(c_mktsegment) AS rev,
        |  split_part(c_name, '#', 2) AS part2,
        |  CAST(strpos(c_name, '1') AS BIGINT) AS pos1,
        |  CAST(levenshtein(c_mktsegment, 'BUILDING') AS BIGINT) AS lev,
        |  translate(c_name, '0123456789', '##########') AS tr,
        |  substring(c_name, 10, 5) AS sub,
        |  repeat(substring(c_mktsegment, 1, 2), 2) AS rep,
        |  printf('%05d-%s', c_custkey, c_mktsegment) AS fmt
        |FROM customer
        |ORDER BY c_custkey""".stripMargin,
  )
}
