package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Distributed graph analytics over relationship graphs derived from
  * the TPC-H-ish tables (SURVEY.md §2.2 extension surface). First
  * member: exact triangle counting on the part co-purchase graph —
  * the market-basket community signal (parts that sell together in
  * clusters), and the canonical "does your engine do graphs without
  * exploding" benchmark.
  *
  * Scale shape — the textbook degree-oriented wedge join:
  *  - edge build: per-order part pairs; the expansion is bounded by
  *    order width (≤ order line count choose 2, TPC-H ≤ 7 lines → ≤ 21
  *    pairs/order; a web-scale basket table caps basket width first),
  *    then one (u,v)-keyed count prunes to support ≥ 2.
  *  - orientation: every undirected edge points from the
  *    (degree, node)-smaller endpoint to the larger. Out-degrees are
  *    then O(√m) amortized (Schank/Wagner), so the wedge join's
  *    per-key width — and any task's memory — is bounded regardless of
  *    how skewed the raw degree distribution is. That bound is WHY
  *    this beats the naive 3-way self-join at 100 TB.
  *  - count: wedges (s→v, s→w with v before w in the same total
  *    order) close iff the oriented edge v→w exists — one equi-join;
  *    each triangle is found exactly once.
  */
object Graph {

  /** Distinct (order, part) incidence — the bipartite basket table. */
  private def incidence(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()

  /** Co-purchase edges: unordered part pairs sharing ≥ `minSupport`
    * orders. u < v by part key, one row per edge.
    */
  private def copurchaseEdges(s: SparkSession, d: String,
      minSupport: Long): DataFrame = {
    val li = incidence(s, d)
    li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("c"))
      .filter(col("c") >= minSupport)
      .select(col("u"), col("v"))
  }

  /** Top parts by triangle participation in the co-purchase graph:
    * (part, n_triangles), n_triangles desc then part asc, top 10.
    * Every triangle credits all three corners.
    */
  def triangleParts(s: SparkSession, d: String, minSupport: Long = 2L,
      topK: Int = 10): DataFrame =
    triangleCounts(copurchaseEdges(s, d, minSupport))
      .orderBy(col("n_triangles").desc, col("p_key"))
      .limit(topK)

  /** Per-node triangle participation over an undirected edge list
    * (columns u, v; u ≠ v, one row per edge): (p_key, n_triangles).
    */
  private[graft] def triangleCounts(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n"))
      .unionAll(e.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))
    // orient by the (degree, node) total order — out-degree O(√m)
    val withDeg = e
      .join(deg.select(col("n").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), Seq("v"))
    val oriented = withDeg.select(
      when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
        struct(col("u").as("s"), col("v").as("t"),
          col("dv").as("dt")))
        .otherwise(struct(col("v").as("s"), col("u").as("t"),
          col("du").as("dt"))).as("o"))
      .select(col("o.s").as("s"), col("o.t").as("t"), col("o.dt").as("dt"))
    // wedges around each source, ordered within the same total order,
    // closed by the (consistently oriented) third edge
    val tri = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") &&
          struct(col("e1.dt"), col("e1.t")) < struct(col("e2.dt"), col("e2.t")))
      .join(oriented.as("e3"),
        col("e3.s") === col("e1.t") && col("e3.t") === col("e2.t"), "left_semi")
      .select(col("e1.s").as("a"), col("e1.t").as("b"), col("e2.t").as("c"))
    tri
      .select(explode(array(col("a"), col("b"), col("c"))).as("p_key"))
      .groupBy(col("p_key"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_triangles" -> ((s: SparkSession, d: String) => triangleParts(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q126_triangles" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |e AS (SELECT a.p AS u, b.p AS v FROM li a
        |      JOIN li b ON a.o = b.o AND a.p < b.p
        |      GROUP BY 1, 2 HAVING count(*) >= 2),
        |deg AS (SELECT n, count(*) AS deg FROM (
        |          SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY 1),
        |o AS (SELECT CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.u ELSE e.v END AS s,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN e.v ELSE e.u END AS t,
        |             CASE WHEN (du.deg, e.u) < (dv.deg, e.v) THEN dv.deg ELSE du.deg END AS dt
        |      FROM e JOIN deg du ON du.n = e.u JOIN deg dv ON dv.n = e.v),
        |tri AS (SELECT e1.s AS a, e1.t AS b, e2.t AS c
        |        FROM o e1 JOIN o e2 ON e1.s = e2.s
        |          AND (e1.dt, e1.t) < (e2.dt, e2.t)
        |        WHERE EXISTS (SELECT 1 FROM o e3
        |                      WHERE e3.s = e1.t AND e3.t = e2.t)),
        |n AS (SELECT unnest([a, b, c]) AS p_key FROM tri)
        |SELECT p_key, count(*) AS n_triangles
        |FROM n GROUP BY 1
        |ORDER BY n_triangles DESC, p_key
        |LIMIT 10""".stripMargin,
  )
}
