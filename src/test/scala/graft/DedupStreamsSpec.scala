package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DedupStreams

case class Doc(doc_id: Long, text: String)

class DedupStreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a late near-dup arriving in a later micro-batch is caught against band state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val in = MemoryStream[Doc]
    val q = DedupStreams.bandFlags(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ds_neardup").start()
    try {
      in.addData(
        Doc(1, "alpha beta gamma delta epsilon"),
        Doc(2, "totally different words in here now"))
      q.processAllAvailable()
      // batch 2: doc 3 duplicates doc 1's text — every band must hit
      // the min-id state carried from batch 1; doc 4 is novel
      in.addData(
        Doc(3, "alpha beta gamma delta epsilon"),
        Doc(4, "yet another unrelated document body"))
      q.processAllAvailable()
      val flags = spark.table("ds_neardup")
        .groupBy(col("doc_id")).agg(max(col("dup")).as("d"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(flags == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q270: a late fuzzy dup (typo'd title) is caught against segment state; unrelated and over-edited titles are not") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val in = MemoryStream[Doc]
    val q = DedupStreams.fuzzyFlags(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ds_fuzzy").start()
    try {
      val base = "the quick brown fox jump" // exactly 24 chars
      in.addData(
        Doc(1, base + " over the lazy dog"),
        Doc(2, "completely different txt and then some more"))
      q.processAllAvailable()
      // batch 2: doc 3 is doc 1's title with TWO typos (lev = 2 —
      // must be caught against state from batch 1); doc 4 has THREE
      // typos vs doc 1 and FOUR vs doc 3 — over threshold, no flag
      in.addData(
        Doc(3, "thz quick brown fox jumq and more tail text"),
        Doc(4, "tha quicc browz fox jump trailing words here"))
      q.processAllAvailable()
      val flags = spark.table("ds_fuzzy")
        .groupBy(col("doc_id")).agg(max(col("dup")).as("d"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(flags == Map(1L -> false, 2L -> false, 3L -> true, 4L -> false))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("an in-batch near-dup pair resolves by doc_id order, like the batch operator") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val in = MemoryStream[Doc]
    val q = DedupStreams.bandFlags(in.toDF())
      .writeStream.outputMode("append")
      .format("memory").queryName("ds_inbatch").start()
    try {
      // both copies in ONE batch, submitted larger-id first: the sorted
      // in-group sweep must still flag only the larger id
      in.addData(
        Doc(8, "omega psi chi phi upsilon tau"),
        Doc(7, "omega psi chi phi upsilon tau"))
      q.processAllAvailable()
      val flags = spark.table("ds_inbatch")
        .groupBy(col("doc_id")).agg(max(col("dup")).as("d"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(flags == Map(7L -> false, 8L -> true))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("segment state is capped per key with smallest-id retention; flags still correct") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    val cap = graft.streaming.SegmentMatchProcessor.MaxEntriesPerKey
    // cap+76 titles sharing segment 0 ("prefix##") but pairwise lev 8
    // beyond it: suffix = one char repeated 8 + another repeated 8, a
    // distinct (c1, c2) combo per doc — any two differ in a whole block
    val chars = ('a' to 'z') ++ ('A' to 'Z')
    val docs = (1 to cap + 76).map { i =>
      val c1 = chars((i - 1) / chars.length); val c2 = chars((i - 1) % chars.length)
      Doc(i.toLong, "prefix##" + c1.toString * 8 + c2.toString * 8 + " tail")
    }
    val ckpt = graft.util.TmpDirs.scratch("fuzzy-cap-ckpt")
    val in = MemoryStream[Doc]
    val q = DedupStreams.fuzzyFlags(in.toDF())
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("memory").queryName("ds_cap").start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
      val flags = spark.table("ds_cap")
        .groupBy(col("doc_id")).agg(max(col("dup")).as("d"))
        .collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      assert(flags.size == docs.size && flags.values.forall(!_),
        "pairwise lev-8 titles must not flag")
      // the hot (segment-0) key must hold EXACTLY the cap smallest ids
      val state = spark.read.format("statestore")
        .option("path", ckpt).option("stateVarName", "entries").load()
      val perKey = state.selectExpr("key.value AS k", "list_element.*")
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n"), max(col("_1")).as("maxId"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val hot = perKey.filter(_._2 > 1)
      assert(hot.nonEmpty, "the shared segment key must exist in state")
      hot.foreach { case (k, n, maxId) =>
        assert(n <= cap, s"key $k holds $n entries > cap $cap")
        if (n == cap)
          assert(maxId == cap.toLong,
            s"saturated key $k must retain the $cap SMALLEST ids (max was $maxId)")
      }
      assert(hot.exists(_._2 == cap), "one key must be saturated at the cap")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("q201 streamed flags match the batch q27 composition on the fixture corpus") {
    val sf = "/root/testdata/sf0.001"
    val streamed = graft.ops.Dedup.streamNearDup(spark, sf)
      .collect().map(r => (r.getLong(0), r.getBoolean(1))).toSeq
    // arrival-order-free batch form: doc is near-dup iff it is the b
    // side of some q27 candidate pair (shares a band with a smaller id)
    val dupIds = graft.ops.Dedup.minhashPairs(spark, sf)
      .select(col("b")).distinct()
      .collect().map(_.getLong(0)).toSet
    val domain = graft.ops.Dedup
      .signatures(graft.util.Tables.documents(spark, sf))
      .select(col("doc_id")).collect().map(_.getLong(0)).sorted
    val batch = domain.map(id => (id, dupIds.contains(id))).toSeq
    assert(streamed.nonEmpty)
    assert(streamed == batch)
    assert(streamed.exists(_._2), "fixture must contain at least one near-dup")
  }
}
