package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Temporal
import graft.util.Tables

/** Semantics checks for the temporal join operators, independent of the
  * DuckDB oracles: as-of tie rules and the banded range join against a
  * brute-force count, on sf0.001.
  */
class TemporalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("asofJoin: every matched click is the latest at-or-before its purchase") {
    import scala.jdk.CollectionConverters._
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "event_type", "ts")
      .collectAsList().asScala
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 + r.getTimestamp(3).getNanos / 1000 % 1000))
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._1)
    val out = Temporal.asofJoin(spark, sf).collect()
    val purchases = ev.filter(_._3 == "purchase")
    assert(out.length == purchases.size)
    out.foreach { r =>
      val (user, pid) = (r.getAs[Long]("user_id"), r.getAs[Long]("purchase_id"))
      val pUs = purchases.find(_._2 == pid).get._4
      val expect = clicksByUser.getOrElse(user, Seq.empty)
        .filter(_._4 <= pUs) // at-or-before, same-µs click counts
        .sortBy(c => (c._4, c._2)).lastOption // ties: highest event_id
      val got = Option(r.getAs[java.lang.Long]("click_id")).map(_.longValue)
      assert(got == expect.map(_._2), s"user=$user purchase=$pid")
      expect.foreach { c =>
        assert(r.getAs[Long]("gap_us") == pUs - c._4)
      }
    }
  }

  test("rangeJoin: bucketed counts equal the brute-force ±60 s histogram") {
    import scala.jdk.CollectionConverters._
    val ev = Tables.events(spark, sf).select("event_type", "event_id", "ts")
      .collectAsList().asScala
      .map(r => (r.getString(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000))
    // NB: .toSeq before flatMap — flatMap on a Map of pair-tuples would
    // collapse back into a Map and silently dedupe by key
    val brute = ev.groupBy(_._1).toSeq.flatMap { case (t, rows) =>
      rows.map { a =>
        (t, rows.count(b => b._2 != a._2 && math.abs(b._3 - a._3) <= 60000000L).toLong)
      }
    }.groupBy(identity).map { case (k, v) => (k._1, k._2, v.size.toLong) }.toSet
    val got = Temporal.rangeJoin(spark, sf).collect()
      .map(r => (r.getAs[String]("t"), r.getAs[Long]("n_near"),
        r.getAs[Long]("n_events"))).toSet
    assert(got == brute)
  }

  test("gapFill: grid is dense hourly and zero-filled hours carry LOCF") {
    val rows = Temporal.gapFill(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val hours = rs.map(_.getAs[String]("hour")).sorted
      assert(hours.distinct.length == hours.length)
      // dense: row count equals hour span
      val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:00")
      val h0 = java.time.LocalDateTime.parse(hours.head, fmt)
      val h1 = java.time.LocalDateTime.parse(hours.last, fmt)
      assert(java.time.Duration.between(h0, h1).toHours + 1 == hours.length)
      // LOCF never null (first grid hour always has data) and constant
      // across empty hours
      assert(rs.forall(_.getAs[java.lang.Double]("sum_value_locf") != null))
    }
  }
}
