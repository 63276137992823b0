package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TrainingData}

/** Substring-level exact dedup (q124/q125): planted cross-document
  * repeated substrings must be detected as maximal runs and removed
  * everywhere except one canonical occurrence — the Lee-et-al corpus
  * guarantee the DuckDB hash gate can't state directly.
  */
class SubstringDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private val K = 5

  // a 9-token substring planted in docs 1 and 3 (offset differs);
  // doc 2 and 4 share nothing ≥ K tokens with anyone
  private val planted = "alpha bravo charlie delta echo foxtrot golf hotel india"
  private def docs = Seq(
    (1L, s"unique one two $planted tail1 tail2"),
    (2L, "nothing here repeats with any other document at all ever"),
    (3L, s"$planted closing words differ entirely"),
    (4L, "another fully distinct document body with no shared runs"),
  ).toDF("doc_id", "text")

  test("q124: the planted substring is detected as one maximal run per doc") {
    val runs = TrainingData.substringRunsOn(docs, K)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("start_pos"),
        r.getAs[Long]("end_pos"), r.getAs[Long]("span_tokens")))
    // 9 planted tokens ⇒ 9 − K + 1 = 5 duplicated gram starts per doc
    // doc 1: planted starts at token 4 → gram starts 4..8, span 4..12
    // doc 3: planted starts at token 1 → gram starts 1..5, span 1..9
    assert(runs.toSet == Set((1L, 4L, 8L, 9L), (3L, 1L, 5L, 9L)))
  }

  test("q125: removal keeps exactly one canonical copy corpus-wide") {
    val counts = TrainingData.substringDedupOn(docs, K)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_removed"), r.getAs[Long]("n_kept")))
      .toMap
    // owner = lexicographically smallest (doc_id, pos) ⇒ doc 1 keeps
    // its copy, doc 3 loses the 9 planted tokens; bystanders untouched
    assert(counts(1L) == (14L, 0L, 14L))
    assert(counts(2L)._2 == 0L)
    assert(counts(3L) == (13L, 9L, 4L))
    assert(counts(4L)._2 == 0L)
  }

  test("text rebuild strips the planted substring everywhere but the owner") {
    val rebuilt = TrainingData.removeDupSpansOn(docs, K)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text"))
      .toMap
    assert(rebuilt(1L).contains(planted), "canonical copy survives")
    assert(rebuilt(3L) == "closing words differ entirely")
    assert(rebuilt(2L) == docs.collect()(1).getString(1), "bystander unchanged")
    val corpusHits = rebuilt.values.count(_.contains(planted))
    assert(corpusHits == 1, s"planted substring must survive exactly once, got $corpusHits")
  }

  test("within-document-only repeats are NOT flagged (cross-doc semantics)") {
    val selfRep = Seq(
      (1L, "x1 x2 x3 x4 x5 mid x1 x2 x3 x4 x5"), // repeats only within doc 1
      (2L, "totally different words in this one here"),
    ).toDF("doc_id", "text")
    assert(TrainingData.substringRunsOn(selfRep, K).count() == 0)
  }

  test("no all-pairs stage: plan is free of cartesian/BNLJ") {
    val plan = TrainingData.substringRunsOn(docs, K).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("q151: BPE trajectory on a planted corpus is exact, greedy-left, and stops when dry") {
    // words: aaab ×2, ab ×1
    // iter1: 'a a' count 4 (two overlapping occurrences per aaab) → aa,
    //        greedy-left rewrite |a||a||a||b| → |aa||a||b|
    // iter2: 'a b' count 3 beats 'aa a' count 2 → ab
    // iter3: 'aa ab' count 2 → aaab; then no pairs remain — 3 rows
    //        even though 5 iterations were requested
    val bpe = Seq((1L, "aaab aaab"), (2L, "ab")).toDF("doc_id", "text")
    val got = TrainingData.bpeMergesOn(bpe, iters = 5).collect()
      .map(r => (r.getAs[Long]("iter"), r.getAs[String]("pair"),
        r.getAs[String]("merged"), r.getAs[Long]("pair_count")))
    assert(got.toSeq == Seq(
      (1L, "a a", "aa", 4L),
      (2L, "a b", "ab", 3L),
      (3L, "aa ab", "aaab", 2L)))
  }

  test("q156: applying the learned merges encodes both corpus words to one token") {
    // same corpus as q151 above, tagged with languages; the learned
    // trajectory (aa, ab, aaab) collapses 'aaab' AND 'ab' to a single
    // symbol each: xx = 2 words × 4 chars → 2 tokens, yy = 1 word ×
    // 2 chars → 1 token
    val docs = Seq((1L, "aaab aaab", "xx"), (2L, "ab", "yy"))
      .toDF("doc_id", "text", "lang")
    val got = TrainingData.bpeApplyOn(docs, iters = 5).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_words"),
        r.getAs[Long]("n_chars"), r.getAs[Long]("n_tokens"),
        r.getAs[Double]("chars_per_token")))
    assert(got.toSeq == Seq(
      ("xx", 2L, 8L, 2L, 4.0),
      ("yy", 1L, 2L, 1L, 2.0)))
  }

  test("q158: bucket caps, batch counts, and padding waste on planted lengths") {
    // lengths 3, 64, 65, 65: caps 64, 64, 128, 128; batch size 32
    val docs = Seq(
      (1L, "a b c"),
      (2L, Seq.fill(64)("w").mkString(" ")),
      (3L, Seq.fill(65)("w").mkString(" ")),
      (4L, Seq.fill(65)("w").mkString(" "))).toDF("doc_id", "text")
    val got = TrainingData.lengthBucketsOn(docs, width = 64, batch = 32).collect()
      .map(r => (r.getAs[Long]("bucket_cap"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_batches"), r.getAs[Long]("sum_tokens"),
        r.getAs[Long]("padded_tokens"), r.getAs[Double]("waste_share")))
    assert(got.toSeq == Seq(
      (64L, 2L, 1L, 67L, 128L, 0.4766),  // (128-67)/128
      (128L, 2L, 1L, 130L, 256L, 0.4922))) // (256-130)/256
  }

  test("q162: water-fill caps the big source and exactly exhausts the budget") {
    // token counts: a=10, b=20, c=70 → tot=100, B=50; need = [30, 50, 100]
    // → k=2 uncapped, cap = (50−30)/1 = 20 → allocations 10+20+20 = 50
    val docs = Seq(
      (1L, Seq.fill(10)("w").mkString(" "), "a"),
      (2L, Seq.fill(20)("w").mkString(" "), "b"),
      (3L, Seq.fill(70)("w").mkString(" "), "c"))
      .toDF("doc_id", "text", "source")
    val got = TrainingData.budgetWaterfillOn(docs).collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
        r.getAs[Long]("allocated"), r.getAs[Boolean]("capped")))
    assert(got.toSeq == Seq(
      ("a", 10L, 10L, false),
      ("b", 20L, 20L, false),
      ("c", 70L, 20L, true)))
  }

  test("q157: flagged train docs are exactly the cross-split near-dup endpoints") {
    val pairs = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")))
    val expected = pairs
      .filter { case (a, b) => (a % 5 == 0) != (b % 5 == 0) }
      .map { case (a, b) => if (a % 5 == 0) b else a }.toSet
    val got = TrainingData.nearDupDecontaminate(spark, sf).collect()
    assert(got.map(_.getAs[Long]("n_flagged")).sum == expected.size)
    // the fixture plants near-dups across the split — a gate of all
    // zeros would prove nothing
    assert(expected.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("n_flagged") <= r.getAs[Long]("n_train"))
    }
  }

  test("q152: every epoch partitions the corpus; permutations differ; re-run is bit-stable") {
    val corpus = (1L to 40L).map(i => (i, s"tok$i body words here")).toDF("doc_id", "text")
    val run = TrainingData.epochShuffleOn(corpus, epochs = 3, shards = 4).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_ids")))
    val byEpoch = run.groupBy(_._1)
    // each epoch covers all 40 docs exactly once, whatever the shard layout
    byEpoch.values.foreach { rows =>
      assert(rows.map(_._3).sum == 40L)
      assert(rows.map(_._4).sum == (1L to 40L).sum)
    }
    // the shard-membership witnesses differ between epochs = real reshuffle
    val vectors = byEpoch.map { case (_, rows) =>
      rows.sortBy(_._2).map(r => (r._2, r._4)).toSeq
    }.toSeq
    assert(vectors.distinct.size == vectors.size, "epoch permutations must differ")
    // determinism: a second evaluation is identical
    val again = TrainingData.epochShuffleOn(corpus, epochs = 3, shards = 4).collect()
      .map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("shard"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_ids")))
    assert(run.toSeq == again.toSeq)
  }

  test("q153: planted cross-source gram overlap is counted; disjoint sources are absent") {
    val shared = "s1 s2 s3 s4 s5" // one 5-gram shared by srcA and srcB
    val corpus = Seq(
      (1L, s"$shared plus more words", "srcA"),
      (2L, s"prefix words $shared", "srcB"),
      (3L, "completely unrelated body of text here", "srcC"),
      (4L, s"$shared plus more words", "srcA"), // dup within srcA: still 1 distinct gram
    ).toDF("doc_id", "text", "source")
    val got = TrainingData.sourceOverlapOn(corpus, k = 5).collect()
      .map(r => (r.getAs[String]("src_a"), r.getAs[String]("src_b"),
        r.getAs[Long]("shared_grams")))
    // srcA docs have grams at 4 start positions each (8 tokens, k=5),
    // srcB likewise; only the planted gram string is common
    assert(got.toSeq == Seq(("srcA", "srcB", 1L)))
  }
}
