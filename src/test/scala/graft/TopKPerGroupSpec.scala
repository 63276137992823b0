package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKPerGroupSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("TopKPerGroup equals the window row_number form") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val custom = graft.plans.TopKPerGroup.topK(src,
      Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"), 4)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey").desc)
      .collect()
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").desc)
    val windowed = src.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 4).drop("rn")
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc,
        col("o_orderkey").desc)
      .collect()
    assert(custom.toSeq == windowed.toSeq)
  }

  test("plans as partial + final exec around one exchange, no sort") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "orders")
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
    val df = graft.plans.TopKPerGroup.topK(src,
      Seq("o_orderpriority"), Seq("o_totalprice", "o_orderkey"), 4)
    val plan = df.queryExecution.executedPlan.toString
    assert("TopKPerGroup".r.findAllIn(plan).size >= 2, plan) // partial + final
    assert(plan.contains("Exchange"), plan)                  // clustered final phase
    assert(!plan.toLowerCase.contains("sort"), plan)         // heap, not sort
  }

  test("property: equals the window form on random data and random k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val s = TestSpark.spark
    import s.implicits._
    val gen = for {
      n <- Gen.choose(0, 60)
      k <- Gen.choose(1, 8)
      rows <- Gen.listOfN(n, for {
        g <- Gen.choose(0, 4)
        v <- Gen.choose(-5L, 5L) // narrow domain forces ties
      } yield (g, v))
    } yield (k, rows)
    (1 to 8).foreach { i =>
      val (k, rows) = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      // unique id as the total-order tie-breaker
      val df = rows.zipWithIndex.map { case ((g, v), id) => (g, v, id.toLong) }
        .toDF("g", "v", "id")
      val custom = graft.plans.TopKPerGroup.topK(df, Seq("g"), Seq("v", "id"), k)
        .orderBy(col("g"), col("v").desc, col("id").desc).collect().toSeq
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("g")).orderBy(col("v").desc, col("id").desc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .orderBy(col("g"), col("v").desc, col("id").desc).collect().toSeq
      assert(custom == windowed, s"seed=$i k=$k n=${rows.size}")
    }
  }

  test("partial phase flushes under a small retained-bytes cap and stays exact") {
    val s = TestSpark.spark
    import s.implicits._
    val key = graft.plans.TopKPerGroupExec.MaxRetainedKey
    // 5000 distinct groups in every input partition: the map-side heap
    // map would retain ~320 KB (k·groups UnsafeRows + keys) — a 128 KB
    // cap forces mid-stream flushes; the final phase (~1/8 of the
    // groups per shuffle task, ~52 KB) stays under it
    val df = (0 until 20000).map(i => (i % 5000, i.toLong)).toDF("g", "v")
    s.conf.set(key, (128L * 1024).toString)
    // AQE would coalesce the tiny shuffle partitions into ONE final
    // task holding every group — defeating the spread the test relies
    // on to keep the final phase under the cap
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = s.conf.getOption(coalesceKey)
    s.conf.set(coalesceKey, "false")
    try {
      val custom = graft.plans.TopKPerGroup.topK(df, Seq("g"), Seq("v"), 2)
        .orderBy(col("g"), col("v").desc).collect().toSeq
      val w = Window.partitionBy(col("g")).orderBy(col("v").desc)
      val windowed = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2).drop("rn")
        .orderBy(col("g"), col("v").desc).collect().toSeq
      assert(custom == windowed)
    } finally {
      s.conf.unset(key)
      prevCoalesce match {
        case Some(v) => s.conf.set(coalesceKey, v)
        case None => s.conf.unset(coalesceKey)
      }
    }
  }

  test("final phase fails loudly (not OOM) when a task's groups exceed the cap") {
    val s = TestSpark.spark
    import s.implicits._
    val key = graft.plans.TopKPerGroupExec.MaxRetainedKey
    val df = (0 until 20000).map(i => (i % 5000, i.toLong)).toDF("g", "v")
    s.conf.set(key, "512")
    try {
      val e = intercept[Exception] {
        graft.plans.TopKPerGroup.topK(df, Seq("g"), Seq("v"), 2).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("TopKPerGroup final phase exceeded")),
        messages(e).mkString(" | "))
    } finally s.conf.unset(key)
  }

  test("k larger than every group returns all rows") {
    val s = TestSpark.spark
    val src = graft.util.Tables.table(s, sf, "region")
      .select(col("r_regionkey"), col("r_name"))
    val all = graft.plans.TopKPerGroup.topK(src,
      Seq("r_name"), Seq("r_regionkey"), 1000).count()
    assert(all == src.count())
  }
}
