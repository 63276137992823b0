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
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }
}
