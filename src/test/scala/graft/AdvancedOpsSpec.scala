package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Clustering, Dedup, Frequency, Similarity, Temporal}

/** Semantics invariants for the round-5 widening (q106-q112) beyond
  * the DuckDB hash gate: sketch-exactness guarantees, quantization
  * bounds, iteration monotonicity, and degenerate-parameter laws.
  */
class AdvancedOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q106: Misra-Gries candidates + exact recount ≡ brute-force heavy hitters") {
    import org.apache.spark.sql.functions._
    val got = Frequency.heavyHitters(spark, sf).collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("cnt")).toMap
    val toks = graft.util.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .select(lower(col("w")).as("word"))
    val n = toks.count()
    val exact = toks.groupBy("word").count().collect()
      .map(r => r.getAs[String]("word") -> r.getAs[Long]("count"))
      .filter { case (_, c) => c * 64 > n }.toMap
    assert(exact.nonEmpty, "fixture should contain heavy hitters")
    assert(got == exact)
  }

  test("q107: α = 1 degenerates EWMA to the last value per user") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val ewma1 = Temporal.ewmaSmooth(spark, sf, alpha = 1.0).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("ewma")).toMap
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
    val lastVals = graft.util.Tables.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), round(col("value"), 4).as("v")).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("v")).toMap
    assert(ewma1.keySet == lastVals.keySet)
    ewma1.foreach { case (u, v) => assert(math.abs(v - lastVals(u)) < 1e-9, s"user $u") }
  }

  test("q108: SCD2 versions are contiguous, intervals chain, exactly one open segment") {
    val rows = graft.ops.EventAnalytics.scd2History(spark, sf).collect()
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, segs) =>
      val sorted = segs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to segs.length))
      // adjacent segments chain: valid_to(i) == valid_from(i+1)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("valid_to") == b.getAs[String]("valid_from"), s"user $u")
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"), s"user $u")
        case _ =>
      }
      assert(segs.count(_.getAs[Boolean]("is_current")) == 1, s"user $u")
      assert(sorted.last.getAs[String]("valid_to") == null, s"user $u")
    }
  }

  test("q109: quantized magnitudes bounded by 127, MSE within the quantization-step bound") {
    val rows = Similarity.int8Quantize(spark, sf).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val scale = r.getAs[Double]("scale")
      val mse = r.getAs[Double]("mse")
      // |q_i| ≤ 127 ⇒ L1 of 64 dims ≤ 64·127
      assert(r.getAs[Long]("q_l1") <= 64L * 127)
      // per-element error ≤ scale/2 ⇒ MSE ≤ (scale/2)² (+ rounding slack)
      assert(mse <= scale * scale / 4 + 1e-12, s"vec ${r.getAs[Long]("vec_id")}")
    }
  }

  test("q110: postings capped at 8 and consistent with df") {
    val rows = Frequency.invertedIndex(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val df = r.getAs[Long]("df")
      val postings = r.getAs[String]("postings").split(",")
      assert(postings.length == math.min(df, 8L).toInt)
      assert(postings.map(_.toLong).sorted.sameElements(postings.map(_.toLong)))
      assert(r.getAs[Long]("tf") >= df)
    }
  }

  test("q111: blocked edit-distance join ≡ brute force within blocks") {
    val names = graft.util.Tables.part(spark, sf)
      .select("p_name").distinct().collect().map(_.getString(0))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      a <- names; b <- names
      if a < b && a.split(" ").last == b.split(" ").last
      dist = lev(a, b) if dist <= 3
    } yield (a, b, dist)).toSet
    val got = Dedup.editDistancePairs(spark, sf).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Int]("dist"))).toSet
    assert(brute.nonEmpty, "fixture should contain near names")
    assert(got == brute)
  }

  test("q113: attribution window semantics vs driver-side brute force") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.EventAnalytics.attribution(spark, sf).collect()
      .map(r => r.getAs[Long]("purchase_id") ->
        (Option(r.get(r.fieldIndex("attributed_click"))).map(_.asInstanceOf[Long]),
          r.getAs[Long]("n_clicks_7d"))).toMap
    val ev = graft.util.Tables.events(spark, sf)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("user_id"), col("event_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("event_id"),
        r.getAs[String]("event_type"), r.getAs[Long]("us")))
    val byUser = ev.groupBy(_._1)
    val look = 7L * 24 * 3600 * 1000000
    var checked = 0
    byUser.values.foreach { rows =>
      val clicks = rows.filter(_._3 == "click")
      rows.filter(_._3 == "purchase").foreach { case (_, pid, _, pus) =>
        val win = clicks.filter(c => c._4 >= pus - look && c._4 <= pus - 1)
        val expect = if (win.isEmpty) None
          else Some(win.maxBy(c => (c._4, c._2))._2)
        assert(got(pid) == ((expect, win.length.toLong)), s"purchase $pid")
        checked += 1
      }
    }
    assert(checked > 100)
  }

  test("q114: PQ ADC top-3 beats random and respects rank order") {
    import org.apache.spark.sql.functions._
    val rows = Clustering.pqAnn(spark, sf).collect()
    assert(rows.length == 15) // 5 queries × top-3
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == Seq(1, 2, 3))
      val adcs = sorted.map(_.getAs[Double]("adc"))
      assert(adcs.zip(adcs.tail).forall { case (a, b) => a <= b }, s"query $q")
    }
    // ADC-selected neighbors must be much closer than the average pair
    val e = graft.util.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      val mean = e.collect { case (id, v) if id != q => d2(e(q), v) }.sum / (e.size - 1)
      val picked = rs.map(_.getAs[Double]("exact_dist")).sum / rs.length
      assert(picked < mean, s"query $q: adc-picked $picked !< corpus mean $mean")
    }
  }

  test("q115: weekly actives dominate daily actives and match direct recount") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.EventAnalytics.rollingDistinct(spark, sf).collect()
      .map(r => (r.getAs[String]("day"), r.getAs[Long]("dau"), r.getAs[Long]("wau")))
    assert(rows.nonEmpty)
    rows.foreach { case (d, dau, wau) => assert(wau >= dau, s"day $d") }
    // direct recount of one mid-series day
    val (day, _, wau) = rows(rows.length / 2)
    val direct = graft.util.Tables.events(spark, sf)
      .filter(to_date(col("ts")).between(date_sub(lit(day).cast("date"), 6), lit(day).cast("date")))
      .select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(wau == direct, s"day $day: $wau vs direct $direct")
  }

  test("q116: transition probabilities normalize per source state") {
    val rows = graft.ops.EventAnalytics.markovTransitions(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("from_type")).foreach { case (f, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 0.01, s"from $f: $total")
      assert(rs.forall(_.getAs[Long]("n") > 0))
    }
  }

  test("q117: grouped OLS matches driver-side exact regression") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.EventAnalytics.valueTrend(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("slope_per_day"), r.getAs[Double]("intercept"))).toMap
    val raw = graft.util.Tables.events(spark, sf)
      .select(col("event_type"), unix_micros(col("ts")).as("us"), col("value"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("us"), r.getAs[Double]("value")))
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val m = rs.map(_._2).min
      val xs = rs.map(r => ((r._2 - m) / 1000000).toDouble)
      val ys = rs.map(r => math.floor(r._3 * 1e6 + 0.5) / 1e6)
      val n = xs.length.toDouble
      val sx = xs.sum; val sy = ys.sum
      val sxx = xs.map(x => x * x).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      val (gotSlope, gotIcpt) = got(t)
      assert(math.abs(gotSlope - slope * 86400) < 1e-4, s"$t slope")
      assert(math.abs(gotIcpt - (sy - slope * sx) / n) < 1e-2, s"$t intercept")
    }
  }

  test("q118: time-weighted average matches driver-side integral") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.EventAnalytics.timeWeightedAvg(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Double]("twa")).toMap
    val raw = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("us"),
        r.getAs[Long]("event_id"), r.getAs[Double]("value")))
    raw.groupBy(_._1).filter(_._2.length > 1).foreach { case (u, rs) =>
      val sorted = rs.sortBy(r => (r._2, r._3))
      val span = (sorted.last._2 - sorted.head._2).toDouble
      val wsum = sorted.sliding(2).map {
        case Array(a, b) => a._4 * (b._2 - a._2).toDouble
        case _ => 0.0
      }.sum
      assert(math.abs(got(u) - wsum / span) < 1e-3, s"user $u")
    }
  }

  test("q119: PMI agrees with direct probability computation") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.Frequency.pmiPairs(spark, sf).collect()
    assert(rows.nonEmpty)
    val docs = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getAs[String]("text").split("\\s+").map(_.toLowerCase).toSet)
    val n = docs.length.toDouble
    rows.take(5).foreach { r =>
      val (wa, wb) = (r.getAs[String]("wa"), r.getAs[String]("wb"))
      val ca = docs.count(_.contains(wa)).toDouble
      val cb = docs.count(_.contains(wb)).toDouble
      val cab = docs.count(d => d.contains(wa) && d.contains(wb)).toDouble
      assert(r.getAs[Long]("c_ab").toDouble == cab, s"($wa,$wb) c_ab")
      val pmi = math.log(cab * n / (ca * cb))
      assert(math.abs(r.getAs[Double]("pmi") - pmi) < 1e-3, s"($wa,$wb) pmi")
    }
  }

  test("q120: weighted sample is deterministic, ranked, and weight-biased") {
    val a = graft.ops.Breadth.weightedSample(spark, sf).collect()
    val b = graft.ops.Breadth.weightedSample(spark, sf).collect()
    assert(a.length == 10)
    assert(a.map(_.getAs[Long]("o_orderkey")).toSeq ==
      b.map(_.getAs[Long]("o_orderkey")).toSeq) // hash-seeded, no rand()
    val keys = a.map(_.getAs[Double]("rank_key_ppm"))
    assert(keys.zip(keys.tail).forall { case (x, y) => x <= y })
    // A-ES biases selection toward heavy weights: the sampled orders'
    // mean weight should exceed the population mean
    import org.apache.spark.sql.functions._
    val popMean = graft.util.Tables.orders(spark, sf)
      .agg(avg(col("o_totalprice"))).collect()(0).getDouble(0)
    val sampMean = a.map(_.getAs[Double]("weight")).sum / a.length
    assert(sampMean > popMean, s"sample $sampMean !> population $popMean")
  }

  test("q121: z-score stats match driver-side computation") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Breadth.zscoreOutliers(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n"), r.getAs[Long]("n_outliers"),
          r.getAs[Double]("max_z"), r.getAs[Double]("min_z"))).toMap
    val raw = graft.util.Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("value"))
    raw.groupBy(_._1).foreach { case (t, rs) =>
      val vs = rs.map(_._2)
      val mean = vs.sum / vs.length
      val sd = math.sqrt(vs.map(v => v * v).sum / vs.length - mean * mean)
      val zs = vs.map(v => (v - mean) / sd)
      val (n, out, maxZ, minZ) = got(t)
      assert(n == vs.length)
      assert(out == zs.count(z => math.abs(z) > 3), s"$t outliers")
      assert(math.abs(maxZ - zs.max) < 1e-3, s"$t max_z")
      assert(math.abs(minZ - zs.min) < 1e-3, s"$t min_z")
    }
  }

  test("q122: distributed skyline ≡ brute-force Pareto frontier") {
    import org.apache.spark.sql.functions._
    val got = graft.ops.Breadth.skyline(spark, sf).collect()
      .map(r => (r.getAs[Double]("price"), r.getAs[Double]("qty"))).toSet
    val pts = graft.util.Tables.lineitem(spark, sf)
      .select(col("l_extendedprice"), col("l_quantity")).distinct().collect()
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val brute = pts.filter { case (p, q) =>
      !pts.exists { case (p2, q2) =>
        p2 <= p && q2 >= q && (p2 < p || q2 > q)
      }
    }.toSet
    assert(brute.nonEmpty)
    assert(got == brute)
    // frontier law: quantity strictly increases with price
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._2 < b._2)
      case _ =>
    }
  }

  test("q123: z-buckets bound BOTH dimensions (the pruning contract)") {
    val rows = graft.ops.Breadth.zorderLayout(spark, sf).collect()
    assert(rows.nonEmpty)
    // top byte of a 32-bit Morton code carries the top 4 bits of each
    // dimension, so within a bucket each dimension spans < 2^12
    rows.foreach { r =>
      val zb = r.getAs[Long]("zbucket")
      assert(r.getAs[Long]("max_day") - r.getAs[Long]("min_day") < 4096, s"zbucket $zb day span")
      assert(r.getAs[Long]("max_pb") - r.getAs[Long]("min_pb") < 4096, s"zbucket $zb pb span")
    }
    val total = rows.map(_.getAs[Long]("n")).sum
    assert(total == graft.util.Tables.lineitem(spark, sf).count())
  }

  test("q112: k-means inertia is non-increasing across iterations") {
    def totalInertia(iters: Int): Double =
      Clustering.kmeans(spark, sf, iters = iters).collect()
        .map(_.getAs[Double]("inertia")).sum
    val i1 = totalInertia(1)
    val i2 = totalInertia(2)
    val i3 = totalInertia(3)
    // Lloyd's update never increases the objective (round-6 centroid
    // rounding can wiggle the tail, hence the epsilon)
    assert(i2 <= i1 + 1e-3, s"i1=$i1 i2=$i2")
    assert(i3 <= i2 + 1e-3, s"i2=$i2 i3=$i3")
    val sizes = Clustering.kmeans(spark, sf).collect().map(_.getAs[Long]("n")).sum
    assert(sizes == 500L)
  }

  test("q144: merge actions partition users consistently with the cutoff and error rule") {
    import org.apache.spark.sql.functions._
    val ev = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val users = ev.select("user_id").distinct().count()
    val total = ev.count()
    val Array(lo, hi) = ev.agg(min("us"), max("us")).collect()(0)
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val cut = lo + (hi - lo) * 4L / 5L
    val out = graft.ops.EventAnalytics.cdcMerge(spark, sf).collect()
    assert(out.length == users)
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    out.foreach { r =>
      val action = r.getAs[String]("action")
      val lastUs = r.getAs[Long]("last_us")
      val lastType = r.getAs[String]("last_type")
      assert(Set("keep", "insert", "update", "delete", "reject")(action))
      if (action == "keep") assert(lastUs < cut, s"keep user ${r.get(0)}")
      else assert(lastUs >= cut, s"$action user ${r.get(0)}")
      assert((action == "delete" || action == "reject") ==
        (lastType == "error" && lastUs >= cut), s"error rule user ${r.get(0)}")
    }
    // the changeset must actually exercise the merge (at sf0.001 every
    // user is active on both sides, so keep/insert may be empty — the
    // update branch is the one the fixture guarantees)
    val acts = out.groupBy(_.getAs[String]("action")).view.mapValues(_.length).toMap
    assert(acts.getOrElse("update", 0) > 0, acts.toString)
  }

  test("q142: quantile-0 gate keeps every document, and the kept count shrinks as q rises") {
    import graft.ops.TextAnalysis
    val at0 = TextAnalysis.qualityGate(spark, sf, q = 0.0).collect()
    at0.foreach { r =>
      assert(r.getAs[Long]("n_kept") == r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_dropped") == 0L)
    }
    def kept(q: Double): Long =
      TextAnalysis.qualityGate(spark, sf, q).collect().map(_.getAs[Long]("n_kept")).sum
    val k25 = kept(0.25)
    val k50 = kept(0.50)
    assert(k25 <= kept(0.0))
    assert(k50 <= k25, s"k25=$k25 k50=$k50")
    assert(k50 > 0)
  }

  test("q141: a planted near-copy is flagged with its original as canonical; dedup never crosses clusters") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-semdedup").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(64)((r.nextDouble() * 2 - 1).toFloat)
    }
    // 20 independent random vectors (pairwise cosine ~N(0, 1/8), far
    // from 0.95) + vec 20 = a jittered copy of vec 4
    val base = (0L until 20L).map(i => (i, vec(i.toInt * 31 + 1), i.toInt % 3))
    val copyV = vec(4 * 31 + 1).clone()
    copyV(0) = copyV(0) + 1e-4f
    (base :+ ((20L, copyV, 1))).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Clustering.semanticDedup(spark, dir, tau = 0.95).collect()
    assert(out.length == 21)
    val r20 = out.find(_.getAs[Long]("vec_id") == 20L).get
    assert(r20.getAs[Long]("is_dup") == 1L)
    assert(r20.getAs[Long]("canonical_id") == 4L)
    assert(r20.getAs[Double]("max_intra_cos") > 0.999)
    assert(out.count(_.getAs[Long]("is_dup") == 1L) == 1)
    // flag/canonical/cosine agree, dups canonicalize downward within
    // their own cluster, and kept vectors report no qualifying neighbor
    val cidOf = out.map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("cid")).toMap
    out.foreach { r =>
      val dup = r.getAs[Long]("is_dup") == 1L
      assert(dup == (r.getAs[Long]("canonical_id") >= 0L))
      if (dup) {
        assert(r.getAs[Long]("canonical_id") < r.getAs[Long]("vec_id"))
        assert(cidOf(r.getAs[Long]("canonical_id")) == r.getAs[Int]("cid"))
      } else assert(r.getAs[Double]("max_intra_cos") == 0.0)
    }
  }
}
