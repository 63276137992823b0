package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.util.Tables._

/** Frequency-analysis operators over the `documents` corpus
  * (SURVEY.md §2.2 LLM-pipeline surface): exact heavy-hitter detection
  * via a distributed Misra-Gries sketch, and inverted-index
  * construction (the retrieval-side companion to q103's BM25).
  *
  * Scale shapes:
  *  - heavy hitters: the full token stream is NEVER shuffled. Each
  *    partition runs an O(k)-space Misra-Gries pass; the union of
  *    per-partition survivors is a guaranteed superset of every global
  *    item with count > n/k (averaging argument: a global heavy hitter
  *    must be partition-local heavy in at least one partition). Only
  *    that tiny candidate set is broadcast back, so the exact recount
  *    aggregates ≤ k·partitions distinct keys instead of the whole
  *    vocabulary — output is EXACT, the sketch only prunes.
  *  - inverted index: postings are capped (top-8 doc_ids per term) with
  *    a window rank BEFORE any per-term array materializes, so no task
  *    ever holds an unbounded posting list; term stats and capped
  *    postings reuse one (word)-keyed shuffle.
  */
object Frequency {

  /** Misra-Gries decrement threshold / heavy-hitter divisor: report
    * words with count > n/K exactly.
    */
  private val K = 64

  /** Exact corpus heavy hitters (count > n/64) with frequency share.
    * Sketch pass → candidate broadcast semi-join → exact recount.
    */
  def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = documents(s, d)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .select(lower(col("w")).as("word"))
    // per-partition Misra-Gries summary (k counters, O(k) space)
    val candidates = toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { w =>
        counters.get(w) match {
          case Some(c) => counters.update(w, c + 1)
          case None if counters.size < K => counters.update(w, 1L)
          case None => // decrement-all; drop zeros — via the in-place
            // ops DEFINED for self-mutation (mutating a mutable.HashMap
            // inside its own foreach is undefined per the collections
            // contract and could silently drop candidates)
            counters.mapValuesInPlace((_, c) => c - 1L)
            counters.filterInPlace((_, c) => c > 0L)
        }
      }
      counters.keysIterator
    }.toDF("word").distinct()
    val total = toks.agg(count(lit(1)).as("n"))
    toks
      .join(broadcast(candidates), Seq("word"), "left_semi")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * K > col("n"))
      .select(col("word"), col("cnt"),
        round(col("cnt").cast("double") / col("n"), 6).as("frac"))
      .orderBy(col("cnt").desc, col("word"))
  }

  /** Inverted index: per term, document frequency, total term
    * frequency, and the first-8 posting doc_ids (comma-joined — the
    * capped materialization a real index shard would page).
    */
  def invertedIndex(s: SparkSession, d: String): DataFrame = {
    val perDoc = documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .groupBy(lower(col("w")).as("word"), col("doc_id"))
      .agg(count(lit(1)).as("tf_d"))
    val stats = perDoc.groupBy(col("word"))
      .agg(count(lit(1)).as("df"), sum(col("tf_d")).as("tf"))
    val top8 = perDoc
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("word")).orderBy(col("doc_id"))))
      .filter(col("rn") <= 8)
      .groupBy(col("word"))
      .agg(concat_ws(",", sort_array(collect_list(col("doc_id")))).as("postings"))
    stats.join(top8, Seq("word"))
      .orderBy(col("word"))
  }

  /** Pointwise mutual information over word pairs (document-level
    * presence): PMI = log(P(a,b) / (P(a)·P(b))) — the classic
    * collocation/association score a corpus build uses for phrase
    * mining. Top-50 positive associations with their co-document
    * counts.
    *
    * Scale shape: presence sets are DISTINCT (doc, word) pairs; the
    * pair count is a doc_id-keyed self-join whose width is bounded by
    * per-doc distinct-vocabulary size (cap the vocabulary by df for
    * web-scale corpora); unigram counts broadcast. All counts are
    * integers — the only float is the final log.
    */
  def pmiPairs(s: SparkSession, d: String): DataFrame = {
    // the distinct (doc, word) incidence feeds THREE subtrees (word
    // counts + both self-join sides); cached so the tokenize+distinct
    // exchange runs once per execution instead of three times
    // (guide §1.2; the register+cache stage convention)
    val dw = graft.util.CacheRegistry.register(documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .select(col("doc_id"), lower(col("w")).as("word"))
      .distinct().cache())
    val wc = dw.groupBy(col("word")).agg(count(lit(1)).as("c"))
    val nDocs = documents(s, d).agg(count(lit(1)).as("nd"))
    val pairs = dw.select(col("doc_id"), col("word").as("wa"))
      .join(dw.select(col("doc_id"), col("word").as("wb")), Seq("doc_id"))
      .filter(col("wa") < col("wb"))
      .groupBy(col("wa"), col("wb"))
      .agg(count(lit(1)).as("c_ab"))
    pairs
      .join(broadcast(wc.select(col("word").as("wa"), col("c").as("ca"))), Seq("wa"))
      .join(broadcast(wc.select(col("word").as("wb"), col("c").as("cb"))), Seq("wb"))
      .crossJoin(broadcast(nDocs))
      .select(col("wa"), col("wb"), col("c_ab"),
        round(log(col("c_ab").cast("double") * col("nd")
          / (col("ca").cast("double") * col("cb"))), 4).as("pmi"))
      .orderBy(col("pmi").desc, col("wa"), col("wb"))
      .limit(50)
  }

  /** Conjunctive (AND) retrieval — the query-side companion to q110's
    * index build and q103's BM25: documents containing ALL query
    * terms, ranked by total term frequency (ties: doc_id), top 10.
    *
    * Scale shape: the term filter applies BEFORE the first exchange
    * (the corpus token stream never shuffles — only postings of the
    * |terms| query words do, exactly like a real index probe), then
    * one doc-keyed aggregation enforces the conjunction via distinct
    * term count and ranks in the same pass. Top-k is
    * TakeOrderedAndProject, no global sort.
    */
  def andRetrieval(s: SparkSession, d: String,
      terms: Seq[String] = Seq("spark", "window", "merge")): DataFrame = {
    documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), "\\s+")).as("w"))
      .select(col("doc_id"), lower(col("w")).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("word")).as("nt"), count(lit(1)).as("tf_total"))
      .filter(col("nt") === terms.length)
      .select(col("doc_id"), col("tf_total"))
      .orderBy(col("tf_total").desc, col("doc_id"))
      .limit(10)
  }

  /** Gini coefficient of the per-document token-count distribution,
    * by source — the inequality audit behind "is this source a few
    * giant pages or many small ones". Rank formula
    * G = (2·Σ rank·x − (n+1)·Σx) / (n·Σx): every moment is an exact
    * integer (sums in decimal so DuckDB's HUGEINT widening and Spark
    * agree bit-for-bit); doubles appear only at the final division.
    *
    * Scale shape: one (source)-keyed window for the rank (ties broken
    * by doc_id for determinism), then a keyed aggregation that reuses
    * the same partitioning — a single shuffle of (source, long, long).
    */
  def giniBySource(s: SparkSession, d: String): DataFrame = {
    val Dec = DataTypes.createDecimalType(38, 0)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens"), col("doc_id"))
    documents(s, d)
      .select(col("source"), col("doc_id"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast(Dec)).as("sx"),
        sum((col("rk") * col("n_tokens")).cast(Dec)).as("srx"))
      .select(col("source"), col("n_docs"),
        round((lit(2.0) * col("srx").cast("double")
          - (col("n_docs") + 1).cast("double") * col("sx").cast("double"))
          / (col("n_docs").cast("double") * col("sx").cast("double")), 6)
          .as("gini"))
      .orderBy(col("source"))
  }

  /** Herfindahl–Hirschman concentration index of source share per
    * language: Σ share² over token counts — the corpus-governance
    * read-out for "is this language dominated by one source".
    *
    * Σ share² = Σ tok² / (Σ tok)², so the whole statistic is two exact
    * integer moments (decimal sums, order-independent) and ONE double
    * division at the end — no order-dependent float accumulation, per
    * the repo's float-aggregate discipline.
    *
    * Scale shape: one (lang, source)-keyed aggregation with map-side
    * partials, then a lang-keyed rollup of at most |sources| rows per
    * language; no window, two shuffles of tiny keyed longs total.
    * tok² ≤ (1e14 tokens)² = 1e28 ≪ 10³⁸, so decimal(38,0) is exact
    * even at 100 TB corpus scale. The squaring casts each factor to
    * decimal FIRST (decimal(19,0)² → decimal(38,0)) — squaring in LONG
    * and casting after would wrap int64 silently once a (lang, source)
    * token sum exceeds ~3.03e9.
    */
  def hhiByLang(s: SparkSession, d: String): DataFrame = {
    val Dec19 = DataTypes.createDecimalType(19, 0)
    val Dec = DataTypes.createDecimalType(38, 0)
    documents(s, d)
      .select(col("lang"), col("source"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(sum(col("n_tokens")).as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("tok").cast(Dec19) * col("tok").cast(Dec19)).as("ssq"),
        sum(col("tok").cast(Dec)).as("tot"))
      .select(col("lang"), col("n_sources"),
        round(col("ssq").cast("double")
          / (col("tot").cast("double") * col("tot").cast("double")), 6)
          .as("hhi"))
      .orderBy(col("lang"))
  }

  /** q205: Zipf's-law slope per language — OLS fit of ln(freq) on
    * ln(rank) over each language's top-200 token ranks (freq DESC,
    * word ASC tie-break). Natural corpora sit near slope −1; a corpus
    * whose slope drifts (template spam flattens it, tiny vocab
    * steepens it) fails the distributional health check a
    * training-data pipeline runs per language shard.
    *
    * Determinism: both logs quantize to integer micro-nats
    * (⌊ln·10⁶ + ½⌋ — the q129 discipline; a cross-engine 1-ulp ln
    * difference only matters on an exact rounding boundary), the five
    * OLS moments are exact DECIMAL sums of DECIMAL(19,0) products
    * (q178/q199 convention), and slope/intercept are double assembly
    * from identical decimals. Moment magnitudes stay < 2⁶³ (safe
    * exact DECIMAL→DOUBLE) up to ln(freq)·10⁶ ≈ 3·10⁷, i.e. any
    * physically possible corpus.
    *
    * Scale shape: the corpus collapses to the (lang, word) count
    * table in one map-side-combined shuffle; the rank window runs on
    * that vocabulary-bounded table (per-language keys), and the fit
    * is a |languages|-row rollup. Token text never shuffles twice.
    */
  def zipfSlope(s: SparkSession, d: String): DataFrame = {
    val Dec19 = DataTypes.createDecimalType(19, 0)
    def d19(c: org.apache.spark.sql.Column) = c.cast(Dec19)
    val counts = documents(s, d)
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("lang"), col("word"))
      .agg(count(lit(1)).as("freq"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("freq").desc, col("word"))
    val m = counts
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 200)
      .select(col("lang"),
        floor(log(col("rk").cast("double")) * 1e6 + 0.5)
          .cast("long").as("x"),
        floor(log(col("freq").cast("double")) * 1e6 + 0.5)
          .cast("long").as("y"))
    val a = m.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_ranks"),
        sum(d19(col("x"))).as("sx"),
        sum(d19(col("y"))).as("sy"),
        sum(d19(col("x")) * d19(col("y"))).as("sxy"),
        sum(d19(col("x")) * d19(col("x"))).as("sxx"))
    val numer = (d19(col("n_ranks")) * d19(col("sxy"))
      - d19(col("sx")) * d19(col("sy"))).cast("double")
    val denom = (d19(col("n_ranks")) * d19(col("sxx"))
      - d19(col("sx")) * d19(col("sx"))).cast("double")
    val slope = numer / denom
    // NULL (not NaN/inf — the engines disagree on double x/0) when a
    // language has a single rank and the fit is undefined
    a.select(col("lang"), col("n_ranks"),
      when(denom =!= 0, round(slope, 6)).as("slope"),
      when(denom =!= 0,
        round((col("sy").cast("double") - slope * col("sx").cast("double"))
          / (col("n_ranks").cast("double") * 1e6), 6)).as("intercept"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q205_zipf_slope"     -> zipfSlope _,
    "q167_gini"           -> giniBySource _,
    "q170_hhi"            -> hhiByLang _,
    "q106_heavy_hitters"  -> heavyHitters _,
    "q110_inverted_index" -> invertedIndex _,
    "q119_pmi"            -> pmiPairs _,
    "q127_and_retrieval"  -> ((s: SparkSession, d: String) => andRetrieval(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    "q205_zipf_slope" ->
      """WITH t AS (
        |  SELECT lang, lower(unnest(regexp_split_to_array(text, '\s+'))) AS word
        |  FROM documents),
        |c AS (SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
        |      FROM t WHERE len(word) > 0 GROUP BY 1, 2),
        |r AS (SELECT lang, word, freq,
        |        row_number() OVER (PARTITION BY lang
        |                           ORDER BY freq DESC, word) AS rk
        |      FROM c),
        |m AS (SELECT lang,
        |        CAST(floor(ln(rk) * 1000000 + 0.5) AS BIGINT) AS x,
        |        CAST(floor(ln(freq) * 1000000 + 0.5) AS BIGINT) AS y
        |      FROM r WHERE rk <= 200),
        |a AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_ranks,
        |        CAST(sum(CAST(x AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sx,
        |        CAST(sum(CAST(y AS DECIMAL(19,0))) AS DECIMAL(19,0)) AS sy,
        |        CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
        |          AS DECIMAL(19,0)) AS sxy,
        |        CAST(sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
        |          AS DECIMAL(19,0)) AS sxx
        |      FROM m GROUP BY 1)
        |SELECT lang, n_ranks,
        |  CASE WHEN CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxx - sx * sx AS DOUBLE) <> 0 THEN
        |    round(CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxy - sx * sy AS DOUBLE)
        |          / CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxx - sx * sx AS DOUBLE),
        |      6) END AS slope,
        |  CASE WHEN CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxx - sx * sx AS DOUBLE) <> 0 THEN
        |    round((CAST(sy AS DOUBLE)
        |           - (CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxy - sx * sy AS DOUBLE)
        |              / CAST(CAST(n_ranks AS DECIMAL(19,0)) * sxx - sx * sx AS DOUBLE))
        |             * CAST(sx AS DOUBLE))
        |          / (CAST(n_ranks AS DOUBLE) * 1000000), 6) END AS intercept
        |FROM a ORDER BY lang""".stripMargin,
    "q167_gini" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source, n_tokens,
        |    CAST(row_number() OVER (PARTITION BY source
        |                            ORDER BY n_tokens, doc_id) AS BIGINT) AS rk
        |  FROM t)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  round((2.0 * CAST(sum(rk * n_tokens) AS DOUBLE)
        |         - CAST(count(*) + 1 AS DOUBLE) * CAST(sum(n_tokens) AS DOUBLE))
        |        / (CAST(count(*) AS DOUBLE) * CAST(sum(n_tokens) AS DOUBLE)), 6)
        |    AS gini
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    "q170_hhi" ->
      """WITH t AS (
        |  SELECT lang, source,
        |    CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |ps AS (SELECT lang, source, CAST(sum(n_tokens) AS BIGINT) AS tok
        |       FROM t GROUP BY 1, 2)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_sources,
        |  round(CAST(sum(CAST(tok AS DECIMAL(19,0)) * CAST(tok AS DECIMAL(19,0))) AS DOUBLE)
        |        / (CAST(sum(tok) AS DOUBLE) * CAST(sum(tok) AS DOUBLE)), 6)
        |    AS hhi
        |FROM ps GROUP BY lang ORDER BY lang""".stripMargin,
    "q127_and_retrieval" ->
      """WITH t AS (
        |  SELECT doc_id, lower(unnest(regexp_split_to_array(text, '\s+'))) AS word
        |  FROM documents),
        |f AS (SELECT doc_id, word FROM t
        |      WHERE word IN ('spark', 'window', 'merge')),
        |h AS (SELECT doc_id, count(DISTINCT word) AS nt, count(*) AS tf_total
        |      FROM f GROUP BY 1)
        |SELECT doc_id, tf_total FROM h WHERE nt = 3
        |ORDER BY tf_total DESC, doc_id
        |LIMIT 10""".stripMargin,
    "q106_heavy_hitters" ->
      """WITH t AS (
        |  SELECT lower(unnest(regexp_split_to_array(text, '\s+'))) AS word
        |  FROM documents),
        |tot AS (SELECT count(*) AS n FROM t),
        |c AS (SELECT word, count(*) AS cnt FROM t GROUP BY 1)
        |SELECT word, cnt, round(cnt / CAST(n AS DOUBLE), 6) AS frac
        |FROM c, tot
        |WHERE cnt * 64 > n
        |ORDER BY cnt DESC, word""".stripMargin,
    "q110_inverted_index" ->
      """WITH t AS (
        |  SELECT doc_id, lower(unnest(regexp_split_to_array(text, '\s+'))) AS word
        |  FROM documents),
        |pd AS (SELECT word, doc_id, count(*) AS tf_d FROM t GROUP BY 1, 2),
        |st AS (SELECT word, count(*) AS df, CAST(sum(tf_d) AS BIGINT) AS tf
        |       FROM pd GROUP BY 1),
        |top8 AS (
        |  SELECT word,
        |    array_to_string(list_sort(list(doc_id)), ',') AS postings
        |  FROM (SELECT word, doc_id,
        |          row_number() OVER (PARTITION BY word ORDER BY doc_id) AS rn
        |        FROM pd)
        |  WHERE rn <= 8 GROUP BY word)
        |SELECT word, df, tf, postings
        |FROM st JOIN top8 USING (word)
        |ORDER BY word""".stripMargin,
    "q119_pmi" ->
      """WITH dw AS (
        |  SELECT DISTINCT doc_id,
        |    lower(unnest(regexp_split_to_array(text, '\s+'))) AS word
        |  FROM documents),
        |wc AS (SELECT word, count(*) AS c FROM dw GROUP BY 1),
        |nd AS (SELECT count(*) AS nd FROM documents),
        |p AS (
        |  SELECT a.word AS wa, b.word AS wb, count(*) AS c_ab
        |  FROM dw a JOIN dw b ON a.doc_id = b.doc_id AND a.word < b.word
        |  GROUP BY 1, 2)
        |SELECT wa, wb, c_ab,
        |  round(ln(CAST(c_ab AS DOUBLE) * nd.nd
        |           / (CAST(ca.c AS DOUBLE) * cb.c)), 4) AS pmi
        |FROM p
        |JOIN wc ca ON ca.word = p.wa
        |JOIN wc cb ON cb.word = p.wb
        |CROSS JOIN nd
        |ORDER BY pmi DESC, wa, wb
        |LIMIT 50""".stripMargin,
  )
}
