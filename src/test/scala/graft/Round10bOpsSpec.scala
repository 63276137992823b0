package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants behind the round-10 second wave (q300-q305) that the
  * hash gate alone does not articulate. Planted-effect sizes validated
  * at all three fixture sfs before being pinned.
  */
class Round10bOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q300: crash + restart over keyed custom state is invisible — flags == q201, votes exact, all 3 batches committed") {
    val rec = graft.ops.Dedup.streamNearDupRestart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2)))
    assert(rec.nonEmpty)
    // exactly 8 band votes per doc: a double-applied replay would
    // double a batch's votes, a lost batch would drop its docs
    assert(rec.forall(_._3 == 8L))
    // the recovered flags equal the uninterrupted streamed statistic
    val clean = graft.ops.Dedup.streamNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(rec.map(t => (t._1, t._2)).toMap == clean)
    // run 1 died mid-backlog and run 2 drained the rest: all 3 chunk
    // batches are committed in the shared checkpoint
    val commits = new java.io.File(
      graft.util.TmpDirs.path("neardup-restart-ckpt") + "/commits")
      .list().filter(_.forall(_.isDigit)).map(_.toLong).sorted.toSeq
    assert(commits == Seq(0L, 1L, 2L))
  }

  test("q301: the consumer replica is indistinguishable from the producer chain at every version") {
    val replica = graft.ops.Audit.mvCdfReplica(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    val producer = graft.ops.Audit.mvTimeTravel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(replica.nonEmpty && replica == producer)
  }

  test("q302: evolution adds the measure without disturbing old ones; no backfill before the evolution point") {
    val ev = graft.ops.Audit.mvSchemaEvolution(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5)))
    // pre-evolution versions surface the sentinel everywhere
    assert(ev.filter(_._1 <= 2L).forall(_._6 == -1.0))
    // the evolved measure exists (some group carries a real max)
    assert(ev.exists(t => t._1 == 3L && t._6 > 0))
    // old measures are untouched by the evolution: (version, month,
    // status, n, revenue) must equal the never-evolved q290 chain
    val tt = graft.ops.Audit.mvTimeTravel(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(ev.filter(_._1 >= 1L)
      .map(t => (t._1, t._2, t._3, t._4, t._5)).toSeq == tt)
    // HEAD's evolved measure covers exactly the post-evolution
    // arrivals (shards 2 and 3), verified against a direct recompute
    val direct = graft.util.Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(4)) >= 2)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(round(max(col("o_totalprice")
        .cast("decimal(28,6)")), 2).cast("double").as("mp"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getDouble(2)))
      .toMap
    ev.filter(_._1 == 4L).foreach { t =>
      assert(t._6 == direct.getOrElse((t._2, t._3), -1.0),
        s"v4 evolved measure mismatch at (${t._2}, ${t._3})")
    }
  }

  test("q303: the conflicting writer retries exactly once and the schedule serializes") {
    val rows = graft.ops.Audit.mvConcurrentCommits(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(rows.map(_._2).toSeq == Seq("genesis", "init", "writer_a", "writer_b"))
    // the conflict is recorded: writer B needed a second attempt
    assert(rows.map(_._3).toSeq == Seq(0L, 1L, 1L, 2L))
    // no lost update, no double apply: row counts strictly increase
    // and HEAD holds exactly the three ingested shards
    val ns = rows.map(_._4)
    assert(ns.zip(ns.tail).forall { case (a, b) => a < b })
    val expected = graft.util.Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey"), lit(4)) < 3).count()
    assert(ns.last == expected)
  }

  test("q304/q305: crash-replayed streaming growth is exactly-once — no dup vectors, full corpus, probe == clean-grown") {
    val audit = graft.ops.Clustering.ivfGrowAudit(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(audit.map(_._1).toSeq == (0L to 4L))
    // exactly-once: every growth batch holds each vector once
    audit.foreach { case (gb, n, nd) =>
      assert(n == nd, s"gb=$gb: duplicated vectors after replay")
    }
    assert(audit.map(_._2).sum ==
      graft.util.Tables.embeddings(spark, sf).count())
    // the crash is result-invisible: probing the crash-replayed table
    // equals probing the cleanly-stream-grown q289 table
    val crashed = graft.ops.Clustering.ivfGrowRestart(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val clean = graft.ops.Clustering.streamIndexGrow(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(crashed.nonEmpty && crashed.toSeq == clean.toSeq)
  }
}
