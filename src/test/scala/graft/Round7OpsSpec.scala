package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Behavior, Frequency, Similarity, TextAnalysis}

/** Semantics invariants for the round-7 widening (q205-q208) beyond
  * the DuckDB hash gate: distribution-law signs, metric bounds, and
  * cross-query consistency with the primitives they build on.
  */
class Round7OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q205: Zipf slope is negative and finite for every language") {
    val rows = Frequency.zipfSlope(spark, sf).collect()
    assert(rows.length == 5) // the 5 fixture languages
    rows.foreach { r =>
      val slope = r.getAs[Double]("slope")
      val n = r.getAs[Long]("n_ranks")
      assert(n >= 2, s"${r.getAs[String]("lang")}: need >=2 ranks to fit")
      // frequencies are non-increasing in rank, so the fit must tilt
      // down; and ln-ln slopes of real text live in a narrow band
      assert(slope < 0 && slope > -10, s"${r.getAs[String]("lang")}: $slope")
      assert(!slope.isNaN && !slope.isInfinite)
    }
  }

  test("q206: silhouette is bounded in [-1, 1] and covers every vector") {
    val rows = Similarity.silhouette(spark, sf).collect()
    val total = graft.util.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0, s"label ${r.getAs[Int]("label")}: $s")
    }
  }

  test("q207: confusion counts are conservative and consistent with q25") {
    val rows = TextAnalysis.langIdEval(spark, sf).collect()
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("support")).sum == nDocs)
    assert(rows.map(_.getAs[Long]("predicted")).sum == nDocs)
    rows.foreach { r =>
      val (sup, prd, tp) = (r.getAs[Long]("support"),
        r.getAs[Long]("predicted"), r.getAs[Long]("tp"))
      assert(tp <= math.min(sup, prd))
      Option(r.getAs[java.lang.Double]("precision")).foreach(p =>
        assert(p >= 0 && p <= 1))
      Option(r.getAs[java.lang.Double]("recall")).foreach(rc =>
        assert(rc >= 0 && rc <= 1))
    }
    // tp per language must agree with a direct q25 recount
    val direct = TextAnalysis.langId(spark, sf).collect()
      .filter(r => r.getAs[String]("labeled_lang") == r.getAs[String]("predicted_lang"))
      .groupBy(_.getAs[String]("labeled_lang")).view.mapValues(_.length.toLong).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("tp") == direct.getOrElse(r.getAs[String]("lang"), 0L))
    }
  }

  test("q209: winnowing density respects the [1/w, 1] selection law") {
    val rows = TextAnalysis.winnowProfile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, fp) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_fp"))
      val windows = math.max(1L, n - 4 + 1)
      assert(fp >= 1, s"doc ${r.getAs[Long]("doc_id")}: no fingerprint")
      assert(fp <= n)
      // each selected (hash, pos) is the min of at most w = 4 windows
      assert(fp * 4 >= windows,
        s"doc ${r.getAs[Long]("doc_id")}: $fp fp for $windows windows")
    }
  }

  test("q211: Heaps fit covers every doc; beta in [0, 1) for a saturating vocab") {
    val r = TextAnalysis.heapsLaw(spark, sf).collect().head
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(r.getAs[Long]("n_docs") == nDocs)
    val beta = r.getAs[Double]("beta")
    // sublinear vocabulary growth: 0 <= beta < 1 always; the tiny
    // synthetic vocab saturates, so beta sits near 0
    assert(beta >= 0.0 && beta < 1.0, s"beta=$beta")
    assert(r.getAs[Double]("ln_k") > 0.0) // V(1) >= 1 forces a positive K
  }

  test("winnowing guarantee: a shared >= w+k-1 token run always yields a shared fingerprint") {
    import spark.implicits._
    // two docs sharing an 8-token run (>= w + k - 1 = 6) embedded in
    // otherwise-different text, including a leading edit (the case
    // whole-doc hashing q23 cannot survive)
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $run four five six"),
      (2L, s"nine eight seven inserted $run ten eleven")
    ).toDF("doc_id", "text")
    val sel = graft.ops.TextAnalysis.winnowSelectedOn(docs)
      .select($"doc_id", $"fp").collect()
    val fp1 = sel.filter(_.getLong(0) == 1L).map(_.getLong(1)).toSet
    val fp2 = sel.filter(_.getLong(0) == 2L).map(_.getLong(1)).toSet
    assert((fp1 & fp2).nonEmpty,
      "the shared run must surface at least one common fingerprint")
  }

  test("q210: shared fingerprints are bounded by the smaller profile") {
    val rows = TextAnalysis.winnowPairs(spark, sf).collect()
    assert(rows.nonEmpty) // the fixture contains near-duplicate docs
    rows.foreach { r =>
      val sim = r.getAs[Double]("sim")
      assert(sim > 0 && sim <= 1.0)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q213: containment dominates Jaccard on every candidate pair") {
    import graft.ops.Dedup
    val cont = Dedup.containmentPairs(spark, sf).collect()
    assert(cont.nonEmpty)
    val jac = Dedup.jaccardPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b")) -> r.getAs[Double]("jaccard"))
      .toMap
    cont.foreach { r =>
      val c = r.getAs[Double]("containment")
      assert(c > 0 && c <= 1.0)
      // C = common/min >= J = common/union, so every q28 pair scoring
      // >= 0.6 must appear here with containment >= its jaccard
      jac.get((r.getAs[Long]("a"), r.getAs[Long]("b")))
        .foreach(j => assert(c >= j - 1e-9, s"containment $c < jaccard $j"))
    }
    val contKeys = cont.map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    jac.filter(_._2 >= 0.6).keys.foreach(k =>
      assert(contKeys.contains(k), s"pair $k with jaccard >= 0.6 missing"))
  }

  test("q214: calibration means are exact-bucket-consistent and bounded") {
    import graft.ops.Dedup
    val rows = Dedup.minhashCalibration(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, jac) = (r.getAs[Double]("mean_est"), r.getAs[Double]("mean_jac"))
      assert(est >= 0 && est <= 1.0)
      assert(jac >= 0 && jac <= 1.0)
      val bucket = r.getAs[Long]("bucket")
      assert(jac >= bucket * 0.2 - 1e-4 && jac < (bucket + 1) * 0.2 + 1e-4)
      assert(r.getAs[Double]("mean_abs_err") >= 0)
    }
  }

  test("q208: jackknife SE is non-negative and the mean matches a direct mean") {
    import org.apache.spark.sql.functions._
    val rows = Behavior.jackknifeSe(spark, sf).collect()
    assert(rows.nonEmpty)
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val direct = graft.util.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg((sum(col("value").cast(Dec)).cast("double") /
        count(lit(1)).cast("double")).as("m"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("m")).toMap
    rows.foreach { r =>
      val se = r.getAs[java.lang.Double]("jk_se")
      assert(se != null && se >= 0.0)
      val m = direct(r.getAs[String]("event_type"))
      assert(math.abs(r.getAs[Double]("mean_value") - m) < 1e-6)
    }
  }

  test("q217: KM life table conserves users; S(t) is non-increasing from 1") {
    val rows = Behavior.kaplanMeier(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalUsers = graft.util.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // every user leaves the risk set exactly once
    assert(rows.map(r => r.getAs[Long]("churned") + r.getAs[Long]("censored"))
      .sum == totalUsers)
    // first at-risk count is the full population
    assert(rows.head.getAs[Long]("n_at_risk") == totalUsers)
    // at-risk decreases by exactly the previous row's exits
    rows.sliding(2).foreach { case Array(p, n) =>
      assert(n.getAs[Long]("n_at_risk") == p.getAs[Long]("n_at_risk")
        - p.getAs[Long]("churned") - p.getAs[Long]("censored"))
    case _ => () }
    // survivor curve: starts <= 1, never increases, only drops on churn
    var prev = 1.0
    rows.foreach { r =>
      val km = r.getAs[Double]("km_survival")
      assert(km <= prev + 1e-9)
      if (r.getAs[Long]("churned") == 0L) assert(math.abs(km - prev) < 1e-9)
      prev = km
    }
  }

  test("q218: trigram patterns are conservative over the event stream") {
    val rows = Behavior.seqPatterns(spark, sf).collect()
    assert(rows.nonEmpty)
    val ev = graft.util.Tables.events(spark, sf)
    val nEvents = ev.count()
    val perUser = ev.groupBy("user_id").count().collect()
      .map(_.getAs[Long]("count"))
    // total trigram occurrences = sum over users of max(n_u - 2, 0)
    val expected = perUser.map(n => math.max(n - 2, 0L)).sum
    assert(rows.map(_.getAs[Long]("n_occ")).sum == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_users") <= r.getAs[Long]("n_occ"))
      assert(r.getAs[Double]("med_span_us") > 0.0)
    }
    assert(nEvents >= expected)
  }

  test("q219: readability counts are conservative; FORCAST grade bounded") {
    val rows = TextAnalysis.readability(spark, sf).collect()
    assert(rows.length == 5)
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      val (w, sy, mono) = (r.getAs[Long]("n_words"),
        r.getAs[Long]("n_syllables"), r.getAs[Long]("n_mono"))
      assert(mono <= w, "monosyllables are a subset of words")
      assert(sy >= mono, "every mono word has exactly one vowel group")
      // grade = 20 - 15*mono_share: bounded [5, 20] since share in [0,1]
      val g = r.getAs[Double]("forcast_grade")
      assert(g >= 5.0 - 1e-9 && g <= 20.0 + 1e-9)
      assert(math.abs(g - (20.0 - 15.0 * mono.toDouble / w)) < 1e-5)
    }
  }

  test("q220: assortativity is a correlation in [-1, 1] over the q130 graph") {
    val r = graft.ops.Graph.assortativity(spark, sf).collect()
    assert(r.length == 1)
    val a = r(0).getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9)
    assert(r(0).getAs[Long]("n_edges") > 0)
    assert(r(0).getAs[Long]("n_nodes") > 0)
  }

  test("q221: stationary distribution conserves mass up to floor leakage") {
    val rows = graft.ops.EventAnalytics.markovStationary(spark, sf).collect()
    assert(rows.length == 5)
    val total = rows.map(_.getAs[Long]("p_e12")).sum
    // each of the 12 iterations floors <= k^2 + k unit-divisions of mass
    // away (per-term div 1e6 + the pr-row quantization <= k per 1e6)
    assert(total <= 1000000000000L)
    assert(total >= 1000000000000L - 12L * 5 * 5 * 2000000L,
      s"floor leakage too large: $total")
    rows.foreach(r => assert(r.getAs[Long]("p_e12") >= 0))
  }

  test("q222: leaderboard ranks are contiguous from 1 and at most 3 per hour") {
    val rows = graft.ops.EventAnalytics.streamLeaderboard(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("hour_start")).foreach { case (h, rs) =>
      val ranks = rs.map(_.getAs[Long]("rnk")).sorted
      assert(ranks.length <= 3, s"$h has ${ranks.length} rows")
      assert(ranks.sameElements(1L to ranks.length), s"$h ranks: ${ranks.toList}")
      // counts non-increasing in rank
      val byRank = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Long]("n"))
      assert(byRank.sameElements(byRank.sorted.reverse))
    }
  }

  test("q223: ZCR frames align 1:1 with q140's RMS frames; bounds hold") {
    val zcr = graft.ops.Multimodal.audioZcr(spark, sf).collect()
    val rms = graft.ops.Multimodal.audioWindows(spark, sf).collect()
    assert(zcr.length == rms.length && zcr.nonEmpty)
    assert(zcr.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("win"))).toSet
      == rms.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("win"))).toSet)
    zcr.foreach { r =>
      assert(r.getAs[Long]("n_crossings") >= 0 && r.getAs[Long]("n_crossings") <= 15)
      assert(r.getAs[Long]("n_pos") >= 0 && r.getAs[Long]("n_pos") <= 16)
    }
  }

  test("q224: dHash catches every planted last-char re-encode") {
    val pairs = graft.ops.Multimodal.dhashNearDup(spark, sf).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    val planted = graft.util.Tables.documents(spark, sf)
      .filter("doc_id % 3 = 0 AND doc_id % 5 = 0")
      .select("doc_id").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    // a last-char rewrite flips at most the final-gradient bits; the
    // planted pair must survive the Hamming <= 3 verify
    planted.foreach { id =>
      assert(pairs.contains((id, id + 1000000000L)),
        s"planted pair for doc $id not detected")
    }
  }

  test("q225: seasonal outliers are the true top-20 by residual") {
    val rows = graft.ops.Temporal.seasonalProfile(spark, sf).collect()
    assert(rows.length == 20 ||
      rows.length == graft.util.Tables.events(spark, sf).count().toInt)
    val devs = rows.map(_.getAs[Double]("abs_dev"))
    assert(devs.sameElements(devs.sorted.reverse), "devs non-increasing")
    rows.foreach(r => assert(r.getAs[Long]("n_cell") >= 1))
  }

  test("q227: bounded-round peel reaches the fixpoint (true 3-core)") {
    val r7 = graft.ops.Graph.kCore(spark, sf, rounds = 7).collect()
      .map(r => (r.getAs[Long]("p_key"), r.getAs[Long]("deg"))).toSet
    val r8 = graft.ops.Graph.kCore(spark, sf, rounds = 8).collect()
      .map(r => (r.getAs[Long]("p_key"), r.getAs[Long]("deg"))).toSet
    assert(r8 == r7, "peel must converge by round 7 on the fixture")
    assert(r8.nonEmpty)
    r8.foreach { case (_, deg) => assert(deg >= 3) }
  }

  test("q228: canonical selection is consistent with q51's clusters") {
    val keep = graft.ops.Clustering.canonicalDocs(spark, sf).collect()
    val clusters = graft.ops.Clustering.dupClusters(spark, sf).collect()
    if (clusters.nonEmpty) {
      val byCluster = clusters.groupBy(_.getAs[Long]("cluster_id"))
      assert(keep.length == byCluster.size, "one keeper per cluster")
      keep.foreach { k =>
        val cid = k.getAs[Long]("cluster_id")
        val members = byCluster(cid).map(_.getAs[Long]("doc_id")).toSet
        assert(members.contains(k.getAs[Long]("keep_doc")))
        assert(k.getAs[Long]("n_dropped") == members.size - 1)
      }
    }
  }

  test("q229: cross-correlations are bounded and share one hour grid") {
    val rows = graft.ops.Temporal.typeCrossCorr(spark, sf).collect()
    assert(rows.length == 10) // C(5,2) type pairs
    val hourCounts = rows.map(_.getAs[Long]("n_hours")).toSet
    assert(hourCounts.size == 1, "every pair sees the same filled grid")
    rows.foreach { r =>
      val c = r.getAs[Double]("corr")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
    }
  }

  test("q230: incremental MV refresh equals full recompute") {
    import org.apache.spark.sql.functions._
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val merged = graft.ops.Audit.mvRefresh(spark, sf).collect()
      .map(r => (r.getAs[String]("month"), r.getAs[String]("status"),
        r.getAs[Long]("n"), r.getAs[Double]("revenue"))).toSet
    val full = graft.util.Tables.orders(spark, sf)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
        col("o_orderstatus").as("status"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast(Dec)), 2).cast("double").as("revenue"))
      .collect()
      .map(r => (r.getAs[String]("month"), r.getAs[String]("status"),
        r.getAs[Long]("n"), r.getAs[Double]("revenue"))).toSet
    assert(merged == full)
  }

  test("q231: novelty counts are conservative and ratios bounded") {
    val rows = TextAnalysis.ngramNovelty(spark, sf).collect()
    assert(rows.length == 5)
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("unique_grams") <= r.getAs[Long]("total_grams"))
      val m = r.getAs[Double]("mean_novelty")
      assert(m >= 0.0 && m <= 1.0)
    }
  }

  test("q232: margin count dominates correct count; coverage holds") {
    val rows = Similarity.centroidEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.util.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      // a correctly-classified vector has own == best, so it is always
      // inside the 5% margin: margin count >= correct count
      assert(r.getAs[Long]("n_within_margin") >= r.getAs[Long]("n_correct"))
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
    }
  }

  test("q233: erasure sweep leaks nothing and conserves rows") {
    val rows = graft.ops.Audit.erasureSweep(spark, sf).collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_leaked") == 0L,
        s"${r.getAs[String]("table_name")} leaked erased keys")
      assert(r.getAs[Long]("n_total") ==
        r.getAs[Long]("n_erased") + r.getAs[Long]("n_remaining"))
    }
  }

  test("q234: cross-lang pairs genuinely cross languages above the floor") {
    val rows = graft.ops.Dedup.crossLangDups(spark, sf).collect()
    rows.foreach { r =>
      assert(r.getAs[String]("lang_a") != r.getAs[String]("lang_b"))
      assert(r.getAs[Double]("jaccard") >= 0.3)
      assert(r.getAs[Long]("a") < r.getAs[Long]("b"))
    }
  }

  test("q235: dedup impact conserves docs and tokens per language") {
    val rows = graft.ops.TrainingData.dedupImpact(spark, sf).collect()
    assert(rows.length == 5)
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") == r.getAs[Long]("n_exact_dropped")
        + r.getAs[Long]("n_near_dropped") + r.getAs[Long]("n_final"))
      assert(r.getAs[Long]("tokens_kept") <= r.getAs[Long]("tokens_total"))
    }
  }

  test("q236: no dup cluster ever spans folds") {
    val rows = graft.ops.TrainingData.groupedSplit(spark, sf).collect()
    assert(rows.nonEmpty)
    val nDocs = graft.util.Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == nDocs)
    rows.foreach { r =>
      assert(r.getAs[Long]("max_folds_per_cluster") <= 1L,
        "a near-dup cluster was split across folds - leakage")
      assert(r.getAs[Long]("fold") >= 0 && r.getAs[Long]("fold") < 5)
    }
  }

  test("q237: dwell rows mirror q116's transition set; p90 >= median") {
    val dwell = graft.ops.EventAnalytics.transitionDwell(spark, sf).collect()
    val trans = graft.ops.EventAnalytics.markovTransitions(spark, sf).collect()
    assert(dwell.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
      r.getAs[Long]("n"))).toSet ==
      trans.map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type"),
        r.getAs[Long]("n"))).toSet)
    dwell.foreach { r =>
      assert(r.getAs[Double]("p90_dwell_us") >= r.getAs[Double]("med_dwell_us"))
      assert(r.getAs[Double]("med_dwell_us") >= 0.0)
    }
  }

  test("q238: credit never exceeds attributable purchase value") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.EventAnalytics.multiTouchDecay(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val lag = r.getAs[Long]("lag_days")
      assert(lag >= 0 && lag <= 7)
      assert(r.getAs[Double]("credited_value") >= 0.0)
    }
    val totalCredit = rows.map(_.getAs[Double]("credited_value")).sum
    val purchaseTotal = graft.util.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(col("value"))).collect()(0).getDouble(0)
    // each purchase's credits sum to its value (or 0 with no clicks)
    assert(totalCredit <= purchaseTotal + 1.0)
  }

  test("q239: binary quantization metrics are bounded") {
    val rows = Similarity.binaryQuantRecall(spark, sf).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val rec = r.getAs[Double]("recall_at_5")
      assert(rec >= 0.0 && rec <= 1.0)
      val mh = r.getAs[Double]("mean_hamming_top5")
      assert(mh >= 0.0 && mh <= 64.0)
    }
  }

  test("q240: streaming KLL estimates pass the rank gate") {
    val rows = graft.ops.Breadth.streamKllGate(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_rank_ok"), r.toString)
      assert(r.getAs[Boolean]("p90_rank_ok"), r.toString)
    }
  }

  test("q241: recall is monotone non-decreasing in nprobe") {
    val rows = graft.ops.Clustering.nprobeSweep(spark, sf).collect()
    assert(rows.nonEmpty)
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (q, rs) =>
      val byProbe = rs.sortBy(_.getAs[Long]("nprobe"))
        .map(_.getAs[Long]("n_hits"))
      assert(byProbe.sameElements(byProbe.sorted),
        s"query $q: hits ${byProbe.toList} not monotone in nprobe")
      rs.foreach(r => assert(r.getAs[Double]("recall_at_3") <= 1.0))
    }
  }

  test("q242: bootstrap SE is non-negative and the mean matches a direct mean") {
    import org.apache.spark.sql.functions._
    val rows = Behavior.poissonBootstrap(spark, sf).collect()
    assert(rows.nonEmpty)
    val direct = graft.util.Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg((sum(floor(col("value") * 1e6 + 0.5).cast("long")).cast("double") /
        (count(lit(1)).cast("double") * 1e6)).as("m"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Double]("m")).toMap
    rows.foreach { r =>
      Option(r.getAs[java.lang.Double]("boot_se")).foreach(se => assert(se >= 0.0))
      assert(math.abs(r.getAs[Double]("mean_value")
        - direct(r.getAs[String]("event_type"))) < 1e-5)
    }
  }

  test("q244: DLQ accounting conserves the record stream") {
    import org.apache.spark.sql.functions._
    val rows = graft.ops.PumpOps.pumpDlq(spark, sf).collect()
      .map(r => r.getAs[String]("drop_reason") -> r.getAs[Long]("n_records")).toMap
    assert(rows.keySet.subsetOf(Set("ok", "bad_time", "bad_hour")))
    val ev = graft.util.Tables.events(spark, sf)
    val n = ev.count()
    val badT = ev.filter(col("event_id") % 17 === 0).count()
    val badH = ev.filter(col("user_id") % 7 === 3).count()
    assert(rows.getOrElse("ok", 0L) == n - badT)
    assert(rows.getOrElse("bad_time", 0L) == badT)
    assert(rows.getOrElse("bad_hour", 0L) == badH)
  }

  test("q245: streaming DLQ accounting equals the batch q244 accounting") {
    val stream = graft.ops.PumpOps.streamDlq(spark, sf).collect()
      .map(r => r.getAs[String]("drop_reason") -> r.getAs[Long]("n_records")).toMap
    val batch = graft.ops.PumpOps.pumpDlq(spark, sf).collect()
      .map(r => r.getAs[String]("drop_reason") -> r.getAs[Long]("n_records")).toMap
    assert(stream == batch)
  }

  test("q246: GROUP BY ALL equals the explicit grouping") {
    import org.apache.spark.sql.functions._
    val sugar = graft.ops.SqlSuite.groupByAll(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val Dec = org.apache.spark.sql.types.DataTypes.createDecimalType(28, 6)
    val explicit = graft.util.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(sugar == explicit)
  }

  test("q247: compaction conserves rows and collapses the file count") {
    val rows = graft.ops.Formats.compaction(spark, sf).collect()
    assert(rows.length == 2)
    val frag = rows.find(_.getAs[String]("stage") == "1_fragmented").get
    val comp = rows.find(_.getAs[String]("stage") == "2_compacted").get
    assert(frag.getAs[Long]("n_files") == 64 && comp.getAs[Long]("n_files") == 4)
    assert(frag.getAs[Long]("n_rows") == comp.getAs[Long]("n_rows"))
    assert(frag.getAs[Double]("sum_value") == comp.getAs[Double]("sum_value"))
  }

  test("q249: scene-cut counts are frame-bounded; frame count matches q34's rule") {
    val rows = graft.ops.Multimodal.sceneCuts(spark, sf).collect()
    assert(rows.nonEmpty)
    val expected = graft.util.Tables.documents(spark, sf)
      .filter("doc_id % 3 = 2").selectExpr("doc_id", "n_chars % 8 + 1 AS f")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (id, f, cuts) = (r.getAs[Long]("doc_id"), r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_cuts"))
      assert(f == expected(id))
      assert(cuts <= math.max(f - 1, 0))
      assert(r.getAs[Long]("max_diff") >= 0)
    }
  }

  test("q248: KWIC occurrence total matches a direct term count") {
    import org.apache.spark.sql.functions._
    // at sf0.001 the full context list fits inside topK, so the
    // reported counts must sum to the raw term frequency
    val rows = TextAnalysis.kwic(spark, sf, "key", topK = 100000).collect()
    val direct = graft.util.Tables.documents(spark, sf)
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") === "key").count()
    assert(rows.map(_.getAs[Long]("n")).sum == direct)
    rows.foreach(r => assert(r.getAs[String]("context").split(" ")(2) == "key"))
  }

  test("q250: streaming erasure accounting equals the batch sweep") {
    val stream = graft.ops.Audit.streamErasure(spark, sf).collect()
      .map(r => r.getAs[String]("disposition") -> r.getAs[Long]("n_events")).toMap
    val batch = graft.ops.Audit.erasureSweep(spark, sf).collect()
      .find(_.getAs[String]("table_name") == "events").get
    assert(stream("erased") == batch.getAs[Long]("n_erased"))
    assert(stream("kept") == batch.getAs[Long]("n_remaining"))
  }

  test("q251: skew report is self-consistent with the raw histogram") {
    import org.apache.spark.sql.functions._
    val r = graft.ops.Skew.joinSkewReport(spark, sf).collect()(0)
    val li = graft.util.Tables.lineitem(spark, sf)
    assert(r.getAs[Long]("n_rows") == li.count())
    assert(r.getAs[Long]("n_keys") == li.select("l_orderkey").distinct().count())
    assert(r.getAs[Long]("max_rows") >= 1)
    assert(r.getAs[Double]("skew_factor") >= 1.0)
    assert(r.getAs[Double]("p99") >= r.getAs[Double]("p50"))
  }

  test("q252: debounce conserves events; suppression is burst-consistent") {
    val rows = graft.ops.EventAnalytics.debounce(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.util.Tables.events(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") + r.getAs[Long]("n_suppressed")
        == r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("max_burst") >= 1)
      val share = r.getAs[Double]("kept_share")
      assert(share > 0.0 && share <= 1.0)
    }
  }

  test("q226: LOO kNN accuracy is bounded and covers every vector") {
    val rows = graft.ops.Similarity.knnLabelEval(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = graft.util.Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_vecs")).sum == total)
    rows.foreach { r =>
      val acc = r.getAs[Double]("accuracy")
      assert(acc >= 0.0 && acc <= 1.0)
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_vecs"))
    }
  }
}
