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

  test("q168 concurrency: peak equals brute-force max over session starts") {
    import scala.jdk.CollectionConverters._
    // rebuild the 30-min-gap sessions exactly as the operator does
    val ev = Tables.events(spark, sf)
      .select("user_id", "event_id", "ts")
      .collectAsList().asScala
      .map(r => (r.getLong(0), r.getLong(1),
        r.getTimestamp(2).getTime * 1000 + r.getTimestamp(2).getNanos / 1000 % 1000))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).map(_._3)
      val bounds = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var st = sorted.head; var en = sorted.head
      sorted.tail.foreach { us =>
        if (us - en > 1800000000L) { bounds += ((st, en + 1)); st = us }
        en = us
      }
      bounds += ((st, en + 1))
      bounds
    }
    // peak concurrency per UTC day, brute-force: evaluate the active
    // count at every day-clipped segment start (the max of a step
    // function is attained at some step-up instant)
    val DayUs = 86400000000L
    val expect = sessions
      .flatMap { case (st, en) =>
        (st / DayUs) to ((en - 1) / DayUs) map { day =>
          (day, math.max(st, day * DayUs), math.min(en, (day + 1) * DayUs))
        }
      }
      .groupBy(_._1).map { case (day, segs) =>
        val peak = segs.map { case (_, t, _) =>
          segs.count { case (_, s2, e2) => s2 <= t && t < e2 }
        }.max
        day -> (peak.toLong, segs.size.toLong)
      }
    val got = Temporal.sessionConcurrency(spark, sf).collect()
      .map { r =>
        val day = java.time.LocalDate.parse(r.getAs[String]("day"))
          .toEpochDay
        day -> (r.getAs[Long]("peak_concurrency"),
          r.getAs[Long]("n_active_sessions"))
      }.toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (day, e) => assert(got(day) == e, s"day=$day") }
  }

  test("q178 Theil-Sen: slope equals the driver-side median of pair slopes") {
    import org.apache.spark.sql.functions._
    val rev = Tables.orders(spark, sf)
      .select(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg((sum(col("p")) * 100).cast("long").as("cents"))
      .collect().map(r => (r.getAs[Int]("day"), r.getAs[Long]("cents")))
      .sortBy(_._1)
    val slopes = (for {
      i <- rev.indices; j <- (i + 1) until rev.length
    } yield (rev(j)._2 - rev(i)._2).toDouble / (rev(j)._1 - rev(i)._1))
      .sorted
    val n = slopes.length
    val median = if (n % 2 == 1) slopes(n / 2)
      else (slopes(n / 2 - 1) + slopes(n / 2)) / 2
    val out = Temporal.theilSen(spark, sf).head()
    assert(out.getAs[Long]("n_days") == rev.length.toLong)
    assert(out.getAs[Long]("n_pairs") == n.toLong)
    assert(math.abs(out.getAs[Double]("sen_slope_dollars") - median / 100.0) < 1e-3)
  }

  test("q169 ACF: closed form matches builtin corr within rounding") {
    import org.apache.spark.sql.functions._
    val out = Temporal.dailyAcf(spark, sf).collect()
    assert(out.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    val rev = Tables.orders(spark, sf)
      .select(datediff(to_date(col("o_orderdate")),
        lit("1970-01-01").cast("date")).as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy("day").agg((sum(col("p")) * 100).cast("long").as("cents"))
    out.foreach { r =>
      val k = r.getAs[Long]("lag").toInt
      val ref = rev.as("a")
        .join(rev.as("b"), col("b.day") === col("a.day") + k)
        .agg(corr(col("a.cents").cast("double"),
          col("b.cents").cast("double")))
        .head.getDouble(0)
      assert(math.abs(r.getAs[Double]("acf") - ref) < 1e-4,
        s"lag=$k got=${r.getAs[Double]("acf")} ref=$ref")
    }
  }
}
