package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** End-to-end training-data pipeline compositions — the north-star
  * operators chained the way a corpus build actually runs them, still
  * fully DuckDB-oracle-checked because every stage is deterministic.
  *
  * Scale shape: the mix pipeline is filter → window-dedup on a 16-byte
  * fingerprint → anti-join against the (tiny) verified near-dup pair
  * set → hash-bucket split → group agg; nothing shuffles more than
  * once on the same key, and the near-dup set rides the LSH candidate
  * path (O(candidates), not O(n²)). Decontamination shuffles
  * (doc, gram-hash) pairs — 8-byte keys, corpus-size-independent per
  * doc — and broadcasts the eval side (eval sets are benchmarks:
  * thousands of docs, not billions).
  */
object TrainingData {

  /** Flagship composition: quality gate (q62's verdicts) → exact
    * dedup keep-min-id (q26) among survivors → drop verified near-dup
    * higher-ids (q28's pairs, corpus-wide) → reproducible 80/10/10
    * hash split (q71's bucketing, salted with "split|") → per
    * (lang, split) document and token counts.
    */
  def trainingMix(s: SparkSession, d: String): DataFrame = {
    val toks = split(col("text"), "\\s+")
    val nTok = size(toks)
    val nStop = size(filter(toks, t => t === "the" || t === "a"))
    val quality = documents(s, d)
      .withColumn("n_tokens", nTok.cast("long"))
      .filter(nTok >= 5 && col("n_chars") <= 20000 && !(nStop * 20 < nTok))
    val exactKept = quality
      .withColumn("keep_id", min(col("doc_id")).over(Window.partitionBy(md5(col("text")))))
      .filter(col("doc_id") === col("keep_id")).drop("keep_id")
    val nearDupIds = Dedup.scoredPairs(s, d)
      .filter(col("jac") >= 0.5).select(col("b").as("dup_id")).distinct()
    val bucket = pmod(conv(substring(md5(concat(lit("split|"),
      col("doc_id"))), 1, 15), 16, 10).cast("long"), lit(100))
    exactKept
      .join(nearDupIds, col("doc_id") === col("dup_id"), "left_anti")
      .withColumn("split",
        when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test"))
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
      .orderBy(col("lang"), col("split"))
  }

  /** md5 first-15-hex-digits as a non-negative 60-bit long — the
    * portable cross-engine gram hash (no mod, unlike MinHash's base).
    */
  private def md5Hash60(digest: java.security.MessageDigest, s: String): Long = {
    val b = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** (doc_id, distinct word-5-gram hash) pairs — typed mapPartitions
    * for the same reasons as Dedup.signatures (codegen'd md5 beats
    * interpreted HOF lambdas 10×).
    */
  private def gramHashes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    documents(s, d).select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, text) =>
          val ws = text.split("\\s+", -1)
          if (ws.length < 5) Iterator.empty
          else ws.sliding(5).map(_.mkString(" ")).toSet[String].iterator
            .map(g => (id, md5Hash60(digest, g)))
        }
      }
      .toDF("doc_id", "g")
  }

  /** Benchmark decontamination: eval set = doc_id ≡ 0 (mod 97)
    * (~1% stand-in benchmark). A training doc is contaminated when it
    * shares ANY distinct word-5-gram with any eval doc. Eval grams
    * broadcast; the verdict is a semi-join on the 8-byte gram hash.
    */
  def decontaminate(s: SparkSession, d: String): DataFrame = {
    val grams = gramHashes(s, d)
    val evalGrams = grams.filter(col("doc_id") % 97 === 0)
      .select(col("g")).distinct()
    val contaminated = grams.filter(col("doc_id") % 97 =!= 0)
      .join(broadcast(evalGrams), Seq("g"), "left_semi")
      .select(col("doc_id").as("cid")).distinct()
    documents(s, d).filter(col("doc_id") % 97 =!= 0)
      .join(contaminated, col("doc_id") === col("cid"), "left")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_train"), count(col("cid")).as("n_contaminated"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q89_training_mix"  -> trainingMix _,
    "q90_decontaminate" -> decontaminate _,
  )

  val oracleSql: Map[String, String] = Map(
    "q89_training_mix" ->
      s"""WITH ${Dedup.PairsCtes},
        |q AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    len(regexp_split_to_array(text, '\\s+')) AS n_tokens,
        |    len(list_filter(regexp_split_to_array(text, '\\s+'),
        |        x -> x = 'the' OR x = 'a')) AS n_stop
        |  FROM documents),
        |keepq AS (
        |  SELECT * FROM q
        |  WHERE n_tokens >= 5 AND n_chars <= 20000
        |    AND NOT (n_stop * 20 < n_tokens)),
        |exd AS (
        |  SELECT * FROM (
        |    SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        |    FROM keepq)
        |  WHERE doc_id = keep_id),
        |dups AS (SELECT DISTINCT b FROM jaccard WHERE jac >= 0.5),
        |surv AS (
        |  SELECT lang, n_tokens,
        |    ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
        |      % 100 AS bucket
        |  FROM exd WHERE doc_id NOT IN (SELECT b FROM dups))
        |SELECT lang,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
        |FROM surv
        |GROUP BY 1, 2
        |ORDER BY lang, split""".stripMargin,
    "q90_decontaminate" ->
      """WITH ws AS (
        |  SELECT doc_id, regexp_split_to_array(text, '\s+') AS ws FROM documents),
        |g AS (
        |  SELECT doc_id,
        |    CASE WHEN len(ws) >= 5
        |      THEN list_distinct([array_to_string(ws[i:i+4], ' ')
        |                          for i in range(1, len(ws) - 3)])
        |      ELSE [] END AS gs
        |  FROM ws),
        |gh AS (
        |  SELECT doc_id, ('0x' || substr(md5(gg), 1, 15))::BIGINT AS g
        |  FROM g, UNNEST(gs) t(gg)),
        |ev AS (SELECT DISTINCT g FROM gh WHERE doc_id % 97 = 0),
        |contam AS (
        |  SELECT DISTINCT doc_id FROM gh
        |  WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM ev))
        |SELECT lang, count(*) AS n_train,
        |  count(*) FILTER (doc_id IN (SELECT doc_id FROM contam)) AS n_contaminated
        |FROM documents
        |WHERE doc_id % 97 <> 0
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,
  )
}
