package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Frequency, Graph, TrainingData}

/** Semantics invariants for the round-6 additions beyond the DuckDB
  * hash gate: triangle-counting exactness on known graphs, conjunctive
  * retrieval's AND law, and dup-coverage consistency on a planted
  * corpus.
  */
class GraphRetrievalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  test("q126 core: K4 has 4 triangles, 3 per node; a chorded square has exactly 2") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val got = Graph.triangleCounts(k4).collect()
      .map(r => r.getAs[Long]("p_key") -> r.getAs[Long]("n_triangles")).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // square 1-2-3-4 with chord 1-3: triangles (1,2,3) and (1,3,4);
    // every node participates, the chord endpoints twice
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("u", "v")
    val got2 = Graph.triangleCounts(sq).collect()
      .map(r => r.getAs[Long]("p_key") -> r.getAs[Long]("n_triangles")).toMap
    assert(got2 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    // triangle-free: a star and a path contribute nothing
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (4L, 5L)).toDF("u", "v")
    assert(Graph.triangleCounts(star).count() == 0)
  }

  test("q126: oriented wedge count matches the naive 3-way join on the fixture graph") {
    // recompute the co-purchase triangles brute-force (u<v<w ordering
    // closes each triangle exactly once) and compare totals
    val li = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("u"), col("b.p").as("v"))
      .agg(count(lit(1)).as("c")).filter(col("c") >= 2).select("u", "v")
      .cache()
    val naive = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"), "left_semi")
      .count()
    val perNode = Graph.triangleCounts(e).agg(sum("n_triangles")).collect()(0)
    val total = if (perNode.isNullAt(0)) 0L else perNode.getLong(0)
    assert(total == naive * 3, s"sum of per-node counts must be 3x the $naive triangles")
    e.unpersist()
  }

  test("q127: every hit contains ALL terms; ranking is total tf; misses lack a term") {
    val terms = Seq("spark", "window", "merge")
    val hits = Frequency.andRetrieval(spark, sf, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("tf_total"))
    assert(hits.nonEmpty)
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t")).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("t").split("\\s+").toSeq)
      .toMap
    hits.foreach { case (id, tf) =>
      val toks = docs(id)
      assert(terms.forall(toks.contains), s"doc $id must contain all terms")
      assert(toks.count(terms.contains) == tf, s"doc $id tf mismatch")
    }
    // ranking: non-increasing tf, doc_id tiebreak
    assert(hits.toSeq.sliding(2).forall {
      case Seq((i1, t1), (i2, t2)) => t1 > t2 || (t1 == t2 && i1 < i2)
      case _ => true
    })
  }

  test("q128: planted duplicate corpus reports exact per-lang coverage") {
    val planted = "alpha bravo charlie delta echo foxtrot golf hotel india"
    val docs = Seq(
      (1L, s"unique one two $planted tail1 tail2", "en"),
      (2L, "nothing here repeats with any other document at all ever", "en"),
      (3L, s"$planted closing words differ entirely", "de"),
      (4L, "another fully distinct document body with no shared runs", "de"),
    ).toDF("doc_id", "text", "lang")
    val got = TrainingData.dupCoverageOn(docs, k = 5).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_dup_tokens"), r.getAs[Double]("dup_frac")))
      .toMap
    // en: docs 1+2 = 14+10 tokens, the 9 planted ones duplicated in doc 1
    // de: docs 3+4 = 13+9 tokens, the 9 planted ones duplicated in doc 3
    assert(got("en") == (2L, 24L, 9L, 0.375))
    assert(got("de") == (2L, 22L, 9L, 0.4091))
  }
}
