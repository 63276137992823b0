package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.CosineSimilarity.{cosineSimilarity, register}

class CosineSimilaritySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  private def hofCosine = {
    def sumD(c: org.apache.spark.sql.Column) =
      aggregate(c, lit(0.0), (a, x) => a + x)
    val dot = sumD(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")))
    val na = sqrt(sumD(transform(col("a"), x => x.cast("double") * x.cast("double"))))
    val nb = sqrt(sumD(transform(col("b"), x => x.cast("double") * x.cast("double"))))
    dot / (na * nb)
  }

  private def pairs = {
    val e = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    e.select(col("vec_id").as("qid"), col("embedding").as("a")).filter(col("qid") < 20)
      .crossJoin(e.select(col("vec_id").as("cid"), col("embedding").as("b")))
  }

  test("bit-identical to the HOF dot/norm composition") {
    val diff = pairs
      .select(cosineSimilarity(col("a"), col("b")).as("fast"), hofCosine.as("slow"))
      .filter(col("fast") =!= col("slow")) // exact comparison, not tolerance
      .count()
    assert(diff == 0)
  }

  test("participates in whole-stage codegen") {
    val df = pairs.select(cosineSimilarity(col("a"), col("b")).as("c"))
    df.collect() // materialize so AQE finalizes the physical plan
    // "*(n)" prefix = inside a WholeStageCodegen stage; the Project
    // carrying cosine_similarity must have it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_similarity") && l.contains("*(")), plan)
  }

  test("registered SQL function works in query text") {
    register(spark)
    graft.util.Tables.embeddings(spark, sf).createOrReplaceTempView("emb")
    val n = spark.sql(
      """SELECT vec_id, cosine_similarity(embedding, embedding) AS self
        |FROM emb WHERE vec_id < 5""".stripMargin).collect()
    assert(n.length == 5)
    n.foreach(r => assert(math.abs(r.getAs[Double]("self") - 1.0) < 1e-12))
  }

  test("interpreted eval path (nullSafeEval) matches codegen") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.CosineSimilarity(
      Literal.create(Array(1.0f, 2.0f, 3.0f)),
      Literal.create(Array(3.0f, 2.0f, 1.0f)))
    val expected = 10.0 / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(e.eval(null).asInstanceOf[Double] === expected)
  }

  test("sign_hamming: identical to the HOF fold, inside codegen") {
    import graft.functions.SignHamming.signHamming
    val hof = expr(
      """CAST(aggregate(zip_with(a, b,
        |  (x, y) -> IF((x >= 0F) != (y >= 0F), 1, 0)),
        |  0, (acc, v) -> acc + v) AS BIGINT)""".stripMargin)
    val df = pairs.select(signHamming(col("a"), col("b")).as("fast"),
      hof.as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() == 0)
    val planDf = pairs.select(signHamming(col("a"), col("b")).as("h"))
    planDf.collect() // materialize so AQE finalizes the physical plan
    val plan = planDf.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("sign_hamming") && l.contains("*(")), plan)
  }

  test("sign_hamming: interpreted eval + SQL registration") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val e = graft.functions.SignHamming(
      Literal.create(Array(1.0f, -2.0f, 0.0f, -0.5f)),
      Literal.create(Array(-1.0f, -2.0f, 0.5f, 0.5f)))
    // dims 0 (+ vs -) and 3 (- vs +) differ; dim 2 is 0 >= 0 vs 0.5 >= 0
    assert(e.eval(null).asInstanceOf[Long] == 2L)
    graft.functions.SignHamming.register(spark)
    graft.util.Tables.embeddings(spark, sf).createOrReplaceTempView("emb2")
    val n = spark.sql(
      """SELECT vec_id, sign_hamming(embedding, embedding) AS self
        |FROM emb2 WHERE vec_id < 5""".stripMargin).collect()
    assert(n.length == 5)
    n.foreach(r => assert(r.getAs[Long]("self") == 0L))
  }
}
