package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("cosine_similarity is injected via SparkSessionExtensions") {
    val base = TestSpark.spark // ensures a SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val out = s.sql(
        """SELECT cosine_similarity(
          |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
        .collect()
      assert(math.abs(out(0).getDouble(0) - 1.0) < 1e-12)

      // the injected optimizer rule folds self-cosine to a literal:
      // the optimized plan must contain NO cosine_similarity call
      // (df built over range() — a LocalRelation source would be
      // eagerly evaluated by ConvertToLocalRelation either way)
      // v must be NON-constant (depend on id): constant args are
      // legitimately folded by Catalyst's own ConstantFolding (the
      // custom expression is foldable); only the injected rule can
      // fold the non-constant self case
      val df = s.range(1)
        .selectExpr("id", "array(CAST(id + 3.0 AS FLOAT), CAST(4.0 AS FLOAT)) AS v")
      val self = df.selectExpr("id", "cosine_similarity(v, v) AS c")
      val optimized = self.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_similarity"), optimized)
      assert(self.collect()(0).getDouble(1) == 1.0)
      // distinct args still execute the kernel
      val real = df.selectExpr(
        "cosine_similarity(v, array(CAST(4.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS c")
      assert(real.queryExecution.optimizedPlan.toString.contains("cosine_similarity"))
      assert(math.abs(real.collect()(0).getDouble(0) - 0.96) < 1e-9)
      // opt-out restores the kernel
      s.conf.set("spark.graft.foldSelfCosine", "false")
      val unfolded = df.selectExpr("cosine_similarity(v, v) AS c")
      assert(unfolded.queryExecution.optimizedPlan.toString.contains("cosine_similarity"))
      s.conf.set("spark.graft.foldSelfCosine", "true")
      // NULL-faithful fold: a NULLABLE vector folds to
      // If(IsNull(v), NULL, 1.0) — the kernel is still eliminated but
      // NULL inputs stay NULL (CosineSimilarity is null-intolerant)
      val dfn = s.range(2).selectExpr("id",
        "CASE WHEN id = 0 THEN array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)) END AS v")
      val selfN = dfn.selectExpr("id", "cosine_similarity(v, v) AS c").orderBy("id")
      assert(!selfN.queryExecution.optimizedPlan.toString.contains("cosine_similarity"))
      val nrows = selfN.collect()
      assert(nrows(0).getDouble(1) == 1.0)
      assert(nrows(1).isNullAt(1))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("RewriteWindowTopK plans the row_number idiom as the bounded-heap exec") {
    val base = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val df = s.range(1000)
        .select((col("id") % 7).as("g"), (col("id") * 37 % 101).as("v"),
          col("id"))
      def idiom(d: org.apache.spark.sql.DataFrame) = d
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= 3)
        .select(col("g"), col("v"), col("id"))
      val rewritten = idiom(df)
      val plan = rewritten.queryExecution.executedPlan.toString
      assert(plan.contains("TopKPerGroup"), plan)
      assert(!plan.contains("Window"), plan)
      // row-identical to the un-rewritten window form
      s.conf.set("spark.graft.rewriteWindowTopK", "false")
      val reference = idiom(df)
      assert(!reference.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      val got = rewritten.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val want = reference.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == want)
      s.conf.set("spark.graft.rewriteWindowTopK", "true")
      // guard: keeping rn in the output must PREVENT the rewrite
      val keepsRn = df
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("g")).orderBy(col("v").desc, col("id"))))
        .filter(col("rn") <= 3)
        .select(col("g"), col("rn"))
      assert(!keepsRn.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
      // guard: a float partition key must prevent the rewrite
      val floatKey = df.select(col("g").cast("double").as("g"), col("v"), col("id"))
      assert(!idiom(floatKey).queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      // guard: a key whose type merely CONTAINS a float (struct /
      // array element) must also prevent the rewrite — the exec
      // groups on raw bytes, so a nested -0.0/NaN would split groups
      val nestedStruct = df.select(
        struct(col("g"), col("g").cast("double").as("f")).as("g"),
        col("v"), col("id"))
      assert(!idiom(nestedStruct).queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      val nestedArray = df.select(
        array(col("g").cast("float")).as("g"), col("v"), col("id"))
      assert(!idiom(nestedArray).queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
      // …while a float elsewhere in the ROW (not in the key) is fine
      val floatPayload = df.select(col("g"), col("v"),
        col("id").cast("double").as("id"))
      assert(idiom(floatPayload).queryExecution.executedPlan.toString
        .contains("TopKPerGroup"))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
