package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Audit, Graph, TrainingData}

/** Semantics invariants for the round-6 graph/audit/LM additions,
  * pinned on planted fixtures where the exact answer is computable by
  * hand (or by an independent in-test reference implementation) —
  * stronger than the DuckDB hash gate alone because the expected
  * values do not share any engine code with the system under test.
  */
class GraphAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val sf = "/root/testdata/sf0.001"

  /** Spark's round(): HALF_UP on the decimal representation. */
  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q130 core: integer PageRank matches an independent scalar reference") {
    // chorded square: 1-2-3-4-1 plus chord 1-3 (degrees 3,2,3,2)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("u", "v")
    val got = Graph.pageRankOn(e, iters = 3).collect()
      .map(r => r.getAs[Long]("p_key") -> r.getAs[Long]("rank_e12")).toMap
    // reference: same algorithm, plain Scala Maps and Long arithmetic
    val adj = Map(1L -> Seq(2L, 3L, 4L), 2L -> Seq(1L, 3L),
      3L -> Seq(1L, 2L, 4L), 4L -> Seq(1L, 3L))
    val n = 4L
    val base = 150000000000L / n
    var r = adj.keys.map(_ -> 1000000000000L / n).toMap
    (1 to 3).foreach { _ =>
      r = adj.keys.map { v =>
        // .toSeq before mapping to contribution values: equal
        // contributions from different neighbors must not collapse
        val cs = adj.filter(_._2.contains(v)).keys.toSeq
          .map(u => r(u) / adj(u).size).sum
        v -> (base + 85L * cs / 100L)
      }.toMap
    }
    assert(got == r)
    // higher-degree nodes end up ranked higher on this graph
    assert(got(1L) == got(3L) && got(2L) == got(4L) && got(1L) > got(2L))
  }

  test("q130: rank broadcast degrades to a shuffled join past the threshold, same answer") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L)).toDF("u", "v")
    def run(): Map[Long, Long] = Graph.pageRankOn(e, iters = 3).collect()
      .map(r => r.getAs[Long]("p_key") -> r.getAs[Long]("rank_e12")).toMap
    val withBroadcast = run()
    // decision unit: a tiny node set gets the hint, a huge one (or a
    // disabled threshold) falls through to the shuffled join
    val nodes = Seq((1L, 1L)).toDF("n", "r")
    assert(Graph.maybeBroadcastNodes(nodes, 10L).ne(nodes),
      "small node set must carry the broadcast hint")
    assert(Graph.maybeBroadcastNodes(nodes, 1L << 40).eq(nodes),
      "a node set past the threshold must NOT be broadcast")
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(Graph.maybeBroadcastNodes(nodes, 10L).eq(nodes),
        "disabled auto-broadcast must disable the hint too")
      // the degraded (shuffled-join) iteration is really shuffled...
      val adj = e.select(col("u").as("s"), col("v").as("t"))
        .unionAll(e.select(col("v").as("s"), col("u").as("t")))
      val probe = adj.join(Graph.maybeBroadcastNodes(nodes, 1L << 40),
        adj("s") === nodes("n"))
      val plan = probe.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"), s"degraded join must shuffle:\n$plan")
      // ...and still produces the exact integer ranks
      assert(run() == withBroadcast)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }

  test("q133 core: BFS min-hop layers on a path graph") {
    // path 1-2-3-4-5 plus an off-path edge 2-6; seed {1}
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (2L, 6L)).toDF("u", "v")
    val adj = e.select(col("u").as("s"), col("v").as("t"))
      .unionAll(e.select(col("v").as("s"), col("u").as("t")))
    val seeds = Seq(1L).toDF("n")
    val got = Graph.bfsLayers(adj, seeds, hops = 3).collect()
      .map(r => r.getAs[Long]("n") -> r.getAs[Int]("hop")).toMap
    // node 5 is 4 hops out — beyond the cap, absent
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 6L -> 2, 4L -> 3))
  }

  test("q129 core: planted two-doc corpus scores to hand-computed nll") {
    // corpus: "a b a b" + "a b c" → bigrams d1:[ab, ba, ab], d2:[ab, bc]
    // model: c(a,b)=3 c(b,a)=1 c(b,c)=1; left: c(a·)=3 c(b·)=2; V=3
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TrainingData.perplexityOn(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Double]("avg_nll"))).toList
    def nllU(cb: Long, cl: Long): Long =
      math.floor(-math.log((cb + 1.0) / (cl + 3.0)) * 1e6 + 0.5).toLong
    val ab = nllU(3, 3); val ba = nllU(1, 2); val bc = nllU(1, 2)
    val d1 = round4((ab + ba + ab) / 1e6 / 3)
    val d2 = round4((ab + bc) / 1e6 / 2)
    assert(got == List((1L, 3L, d1), (2L, 2L, d2)))
    // the all-common-bigram doc is less surprising than the one with a rare tail
    assert(d1 < d2)
  }

  test("q131: profile stats agree with direct per-column aggregates") {
    val li = graft.util.Tables.lineitem(spark, sf)
    val got = Audit.columnProfile(spark, sf).collect()
      .map(r => r.getAs[String]("column") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_null"),
          r.getAs[Long]("n_distinct"), r.getAs[String]("min_v"),
          r.getAs[String]("max_v"))).toMap
    assert(got.keySet == Set("l_orderkey", "l_partkey", "l_suppkey",
      "l_linenumber", "l_returnflag", "l_linestatus"))
    val n = li.count()
    got.foreach { case (c, (rows, nulls, distinct, minV, maxV)) =>
      assert(rows == n, s"$c rows")
      val direct = li.agg(
        sum(when(col(c).isNull, 1L).otherwise(0L)),
        countDistinct(col(c).cast("string")),
        min(col(c).cast("string")), max(col(c).cast("string"))).collect()(0)
      assert(nulls == direct.getLong(0), s"$c nulls")
      assert(distinct == direct.getLong(1), s"$c distinct")
      assert(minV == direct.getString(2) && maxV == direct.getString(3), s"$c min/max")
    }
  }

  test("q134 core: planted intervals merge into the hand-computed islands") {
    // hold = 10 us. user 1: events at 0, 5, 30 → islands [0,15] (0 and
    // 5 chain) and [30,40]; user 2: 0, 11, 22 → touching chains merge
    // into ONE island [0,32] (11 == 0+10+1? no: 11 > 10 → new; 11..21,
    // 22 > 21 → new: THREE islands); user 3: early long swallow — with
    // hold 10: 0, 3, 6 → one island [0,16]
    val ev = Seq(
      (1L, 1L, 0L), (1L, 2L, 5L), (1L, 3L, 30L),
      (2L, 4L, 0L), (2L, 5L, 11L), (2L, 6L, 22L),
      (3L, 7L, 0L), (3L, 8L, 3L), (3L, 9L, 6L),
    ).toDF("user_id", "event_id", "us")
    val got = ops.Temporal.intervalIslandsOn(ev, holdUs = 10L).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_islands"), r.getAs[Long]("covered_us"),
          r.getAs[Long]("max_island_us"))).toMap
    assert(got(1L) == (2L, 25L, 15L))   // [0,15]+[30,40]
    assert(got(2L) == (3L, 30L, 10L))   // [0,10]+[11,21]+[22,32]
    assert(got(3L) == (1L, 16L, 16L))   // [0,16]
    // boundary law: an event exactly at a prior end TOUCHES → merges
    val touch = Seq((9L, 1L, 0L), (9L, 2L, 10L)).toDF("user_id", "event_id", "us")
    val t = ops.Temporal.intervalIslandsOn(touch, holdUs = 10L).collect()(0)
    assert(t.getAs[Long]("n_islands") == 1L && t.getAs[Long]("covered_us") == 20L)
  }

  test("q135: fk audit reports zero orphans on the conformant testdata, and counts a planted break") {
    val got = Audit.fkAudit(spark, sf).collect()
      .map(r => r.getAs[String]("check") -> r.getAs[Long]("n_bad")).toMap
    assert(got.keySet == Set("lineitem_orphan_order", "lineitem_orphan_part",
      "orders_orphan_customer", "customer_orphan_nation",
      "orders_without_lineitem"))
    // generated star schema is referentially intact on the child side
    assert(got("lineitem_orphan_order") == 0L)
    assert(got("orders_orphan_customer") == 0L)
    assert(got("customer_orphan_nation") == 0L)
  }

  test("q136 core: planted sequences count non-overlapping conversion paths") {
    // user 1: c v v p c p  → 2 paths; user 2: c v v (no p) → 0;
    // user 3: p c p → 1 (leading p unused); user 4: c e p → 1 (errors allowed)
    val ev = Seq(
      (1L, "cvvpcp"), (2L, "cvv"), (3L, "pcp"), (4L, "cep"),
    ).flatMap { case (u, sq) =>
      sq.zipWithIndex.map { case (ch, i) => (u, i.toLong, (u * 100 + i), ch.toString) }
    }.map { case (u, us, eid, l) => (u, us, eid.toLong, l) }
      .toDF("user_id", "us", "event_id", "l")
    val got = ops.Behavior.sequenceMatchOn(ev, "c[ve]*p").collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("n_paths")).toMap
    assert(got == Map(1L -> 2L, 3L -> 1L, 4L -> 1L)) // user 2 filtered out
  }

  test("q137 core: MAD resists the outlier that drags the mean") {
    // group a: values 1..9 plus one corrupt 1000 → median 5.5, MAD
    // stays small, exactly one 3-MAD outlier (the corrupt reading)
    val ev = ((1 to 9).map(v => ("a", v.toDouble)) :+ ("a", 1000.0))
      .toDF("event_type", "value")
    val r = ops.Behavior.madOutliersOn(ev).collect()(0)
    assert(r.getAs[Double]("med") == 5.5)
    // adevs: 4.5,3.5,2.5,1.5,0.5,0.5,1.5,2.5,3.5,994.5 → median 2.5
    assert(r.getAs[Double]("mad") == 2.5)
    assert(r.getAs[Long]("n_outliers") == 1L)
  }

  test("q138: every cohort reports its full size at offset 0 and offsets are non-negative") {
    val rows = ops.Behavior.cohortMatrix(spark, sf).collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_.getAs[String]("cohort_week"))
    byCohort.foreach { case (cw, rs) =>
      val offs = rs.map(_.getAs[Long]("week_offset"))
      assert(offs.contains(0L), s"cohort $cw must have offset 0")
      assert(offs.forall(_ >= 0L))
      // retention can never exceed the cohort's size
      val size0 = rs.find(_.getAs[Long]("week_offset") == 0L).get.getAs[Long]("n_users")
      assert(rs.forall(_.getAs[Long]("n_users") <= size0), s"cohort $cw monotone bound")
    }
  }

  test("q139: segments partition the customer base; digits in 1..5") {
    val rows = ops.Behavior.rfmSegments(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = graft.util.Tables.orders(spark, sf)
      .select(col("o_custkey")).distinct().count()
    assert(total == nCust)
    rows.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '5'), seg)
    }
  }

  test("q132: overlap counts equal set-intersection ground truth; jaccard in (0,1]") {
    val byType = graft.util.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id")).distinct().collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val got = Audit.audienceOverlap(spark, sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, b) = (r.getAs[String]("type_a"), r.getAs[String]("type_b"))
      assert(a < b)
      val inter = (byType(a) & byType(b)).size.toLong
      assert(r.getAs[Long]("n_common") == inter, s"($a,$b) intersection")
      val j = r.getAs[Double]("jaccard")
      val expect = round4(inter.toDouble
        / (byType(a).size + byType(b).size - inter))
      assert(j == expect && j > 0.0 && j <= 1.0, s"($a,$b) jaccard")
    }
    // every co-present pair is reported
    val expectPairs = for {
      a <- byType.keys; b <- byType.keys
      if a < b && (byType(a) & byType(b)).nonEmpty
    } yield (a, b)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSet == expectPairs.toSet)
  }

  test("q143: a short-doc source with planted duplicates is blocked; a healthy source is not") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gov").toString
    val longText = (1 to 60).map(i => s"w$i").mkString(" ")   // 60 tokens
    val shortText = "a b c"                                   // 3 tokens
    val rows = Seq(
      (1L, longText + " x1", "en", "good", 0L),
      (2L, longText + " x2", "en", "good", 0L),
      (3L, shortText, "en", "bad", 0L),   // exact dup pair
      (4L, shortText, "en", "bad", 0L),
      (5L, "d e f g", "en", "bad", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Audit.sourceGovernance(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val bad = out("bad")
    assert(bad.getAs[Long]("n_docs") == 3L)
    assert(bad.getAs[Long]("n_dup_docs") == 2L)
    assert(bad.getAs[Long]("blocked") == 1L)
    assert(bad.getAs[Double]("short_share") == 1.0)
    val good = out("good")
    assert(good.getAs[Long]("n_dup_docs") == 0L)
    assert(good.getAs[Long]("blocked") == 0L)
    assert(good.getAs[Double]("avg_tokens") == 61.0)
  }

  test("q145: diff statuses partition the key universe; counts match a driver-side recount") {
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getString(2), r.getDouble(3))))
      .toMap
    // independent reference: the same carve rules in plain Scala
    val expect = rows.keys.toSeq.map { k =>
      val inOld = k % 20 != 3
      val inNew = k % 20 != 7
      val changed = inOld && inNew && k % 5 == 0 && rows(k)._2 != "X"
      if (!inOld && inNew) "added"
      else if (inOld && !inNew) "removed"
      else if (changed) "changed"
      else "unchanged"
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = graft.ops.Audit.snapshotDiff(spark, sf).collect()
      .map(r => r.getAs[String]("diff_status") -> r.getAs[Long]("n_rows")).toMap
    assert(got == expect)
    assert(Set("added", "removed", "changed", "unchanged").subsetOf(got.keySet))
    assert(got.values.sum == rows.size.toLong) // statuses partition all keys
  }

  test("q146: equivalence classes cover every customer; at_risk ≡ k below threshold") {
    val out = graft.ops.Audit.kAnonymity(spark, sf, k = 5).collect()
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(out.map(_.getAs[Long]("k_size")).sum == total)
    assert(out.forall(r =>
      r.getAs[Long]("at_risk") == (if (r.getAs[Long]("k_size") < 5) 1L else 0L)))
    // QI-domain bound: output rows ≤ |nations| × |segments|, never row count
    assert(out.length <= 25 * 5)
  }

  test("q147 core: planted bilingual corpus scores match an independent Scala model") {
    // target (en) token mass must dominate the add-one smoothing for
    // the sign to be meaningful: 'alpha' is 99/100 of the target
    // distribution and absent from raw-only docs except doc 4
    val alpha50 = Array.fill(50)("alpha").mkString(" ")
    val gamma50 = Array.fill(50)("gamma").mkString(" ")
    val docs = Seq(
      (1L, alpha50, "en"),
      (2L, alpha50.replaceFirst("alpha$", "beta"), "en"),
      (3L, gamma50, "zh"),
      (4L, "alpha alpha alpha", "zh"),   // zh doc made of target-enriched tokens
      (5L, "gamma gamma gamma", "zh"))   // zh doc made of raw-only tokens
      .toDF("doc_id", "text", "lang")
    val got = TrainingData.importanceWeightsOn(docs, buckets = 256).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("score_u"))).toMap
    // independent reference: same math, plain Scala (MessageDigest md5)
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(w: String): Long = {
      val hex = md.digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16) % 256
    }
    val corpus = Seq(
      1L -> (alpha50, "en"), 2L -> (alpha50.replaceFirst("alpha$", "beta"), "en"),
      3L -> (gamma50, "zh"), 4L -> ("alpha alpha alpha", "zh"),
      5L -> ("gamma gamma gamma", "zh"))
    val all = corpus.flatMap { case (id, (t, l)) =>
      t.split("\\s+").map(w => (id, l, bucket(w))) }
    val tCnt = all.filter(_._2 == "en").groupBy(_._3).view.mapValues(_.size).toMap
    val rCnt = all.groupBy(_._3).view.mapValues(_.size).toMap
    val (nt, nr) = (all.count(_._2 == "en"), all.size)
    def lrU(b: Long): Long =
      math.floor((math.log((tCnt.getOrElse(b, 0) + 1).toDouble / (nt + 256))
        - math.log((rCnt(b) + 1).toDouble / (nr + 256))) * 1e6 + 0.5).toLong
    val expect = all.groupBy(_._1).view.mapValues { ts =>
      (ts.size.toLong, ts.map(t => lrU(t._3)).sum) }.toMap
    assert(got == expect)
    // directionality: the target-enriched doc scores positive (selected),
    // the raw-only doc negative — and they rank accordingly
    assert(got(4L)._2 > 0L && got(5L)._2 < 0L)
    assert(got(4L)._2 > got(5L)._2)
  }

  test("q149: temperature mix matches an independent integer model; α=0.5 flattens the shares") {
    val out = TrainingData.temperatureMix(spark, sf).collect()
      .map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("nat_share"),
          r.getAs[Double]("temp_share"), r.getAs[Long]("epoch_tokens"))).toMap
    // independent reference from a direct recount
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("lang"), size(split(col("text"), "\\s+")).cast("long").as("nt"))
      .collect().groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(1)).sum).toMap
    val wu = counts.view.mapValues(n =>
      math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong).toMap
    val (totT, totW) = (counts.values.sum, wu.values.sum)
    counts.foreach { case (l, n) =>
      assert(out(l)._1 == n)
      assert(out(l)._4 == wu(l) * 1000000L / totW)
    }
    // α = 0.5 compresses the mix: the largest shard loses share, the
    // smallest gains
    val largest = counts.maxBy(_._2)._1
    val smallest = counts.minBy(_._2)._1
    assert(out(largest)._3 < out(largest)._2)
    assert(out(smallest)._3 > out(smallest)._2)
    // epoch budgets never exceed the epoch (floor division)
    assert(out.values.map(_._4).sum <= 1000000L)
  }
}
