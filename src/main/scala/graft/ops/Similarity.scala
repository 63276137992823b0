package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.util.Tables._

/** Similarity search over the `embeddings` table (64-dim float
  * vectors): brute-force cosine top-k as the oracle-checked baseline,
  * and a random-hyperplane LSH-bucketed ANN variant as the scale path
  * (recall-tested against the brute-force answer in SimilaritySpec).
  *
  * Numeric parity: every dot product/norm is computed as double, in
  * list order, on both engines (Spark `aggregate` HOF vs DuckDB list
  * comprehension + list_sum), so cosine values are bit-identical and
  * the rank output needs no float columns at all.
  *
  * Scale shape: brute force is queries × corpus — fine when the query
  * side is small enough to broadcast (it is, by construction). The LSH
  * variant buckets the corpus once (narrow, codegen'd sign bits),
  * shuffles only (bucket, id, vec), and does per-bucket local top-k —
  * the pattern that survives a 100 TB corpus where crossJoin cannot.
  */
object Similarity {

  private def sumDouble(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  private def norm(a: Column): Column =
    sqrt(sumDouble(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Codegen'd one-pass cosine (graft.functions.CosineSimilarity) —
    * bit-identical to the HOF dot/norm composition (same per-element
    * accumulation order in double), which the DuckDB oracle re-proves
    * on every run.
    */
  private def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSimilarity.cosineSimilarity(a, b)

  /** Brute-force cosine top-5 neighbors for query vectors (vec_id<10). */
  def knnBrute(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .filter(col("query_id") < 10)
    val scored = broadcast(q)
      .join(e, col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Per-vector stats: dimension + L2 norm (rounded). */
  def embeddingStats(s: SparkSession, d: String): DataFrame =
    embeddings(s, d)
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(norm(col("embedding")), 4).as("l2_norm"))
      .orderBy(col("vec_id"))

  /** Random-hyperplane LSH ANN, multi-table (standard L×b construction:
    * L independent tables of b sign bits; candidates = union over
    * tables of same-bucket vectors, then exact scoring). Hyperplanes
    * are deterministic ±1 vectors derived from xxhash64(plane, dim).
    * Approximate by design → no SQL oracle; SimilaritySpec checks the
    * candidates are real neighbors and reports recall vs knnBrute.
    *
    * Scale: corpus is expanded ×L (bucket, id, vec) — narrow codegen'd
    * stage — and only equi-joined on bucket; no crossJoin anywhere.
    */
  def annLsh(s: SparkSession, d: String, nBits: Int = 8, nTables: Int = 4,
      k: Int = 5): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    // hyperplane p component j = xxhash64(p, j) mapped to ±1
    def signBit(p: Int): Column = {
      val prods = transform(col("embedding"),
        (x, j) => x.cast("double") *
          (pmod(xxhash64(lit(p), j), lit(2)).cast("double") * 2.0 - 1.0))
      when(sumDouble(prods) >= 0, 1).otherwise(0)
    }
    def tableBucket(t: Int): Column = concat(
      lit(s"$t:") +: (0 until nBits)
        .map(b => signBit(t * nBits + b).cast("string")): _*)
    val bucketed = e.select(col("vec_id"), col("embedding"),
      explode(array((0 until nTables).map(tableBucket): _*)).as("bucket"))
    val q = bucketed
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"), col("bucket"))
      .filter(col("query_id") < 10)
    val candidates = broadcast(q.drop("qe"))
      .join(bucketed.drop("embedding"), Seq("bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id")).distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    candidates
      .join(e.select(col("vec_id").as("query_id"), col("embedding").as("qe")), Seq("query_id"))
      .join(e, Seq("vec_id"))
      .withColumn("cos", cosine(col("qe"), col("embedding")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-dup: globally most-similar vector pairs
    * (full pairwise scoring through the codegen'd cosine, then global
    * top-k — TakeOrderedAndProject, no sort). The dedup decision at
    * scale would consume the LSH candidates instead of all pairs; the
    * all-pairs form is the oracle-checkable ground truth.
    */
  def topSimilarPairs(s: SparkSession, d: String, k: Int = 20): DataFrame = {
    val e = embeddings(s, d).select(col("vec_id"), col("embedding"))
    e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      .join(e.select(col("vec_id").as("b"), col("embedding").as("eb")),
        col("a") < col("b"))
      .select(col("a"), col("b"),
        round(cosine(col("ea"), col("eb")), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("a"), col("b"))
      .limit(k)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q38_top_similar_pairs" -> ((s: SparkSession, d: String) => topSimilarPairs(s, d)),
    "q30_knn_brute"       -> knnBrute _,
    "q31_ann_lsh"         -> ((s: SparkSession, d: String) => annLsh(s, d)),
    "q32_embedding_stats" -> embeddingStats _,
  )

  val oracleSql: Map[String, String] = Map(
    "q38_top_similar_pairs" ->
      """WITH pairs AS (
        |  SELECT x.vec_id AS a, y.vec_id AS b,
        |    list_sum([CAST(x.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)
        |              for i in range(1, len(x.embedding) + 1)])
        |    / (sqrt(list_sum([CAST(x.embedding[i] AS DOUBLE) * CAST(x.embedding[i] AS DOUBLE)
        |                      for i in range(1, len(x.embedding) + 1)]))
        |       * sqrt(list_sum([CAST(y.embedding[i] AS DOUBLE) * CAST(y.embedding[i] AS DOUBLE)
        |                        for i in range(1, len(y.embedding) + 1)]))) AS cos
        |  FROM embeddings x JOIN embeddings y ON x.vec_id < y.vec_id)
        |SELECT a, b, round(cos, 4) AS cos_sim
        |FROM pairs
        |ORDER BY round(cos, 4) DESC, a, b
        |LIMIT 20""".stripMargin,
    "q30_knn_brute" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |           FROM embeddings WHERE vec_id < 10),
        |scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_sum([CAST(qe[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |              for i in range(1, len(qe) + 1)])
        |    / (sqrt(list_sum([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
        |                      for i in range(1, len(qe) + 1)]))
        |       * sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                        for i in range(1, len(embedding) + 1)]))) AS cos
        |  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
        |ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
        |  FROM scored)
        |SELECT query_id, vec_id AS neighbor_id, rank
        |FROM ranked
        |WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,
    "q32_embedding_stats" ->
      """SELECT vec_id, label, len(embedding) AS dim,
        |  round(sqrt(list_sum([CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)
        |                       for i in range(1, len(embedding) + 1)])), 4) AS l2_norm
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,
  )
}
