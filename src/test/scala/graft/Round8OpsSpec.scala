package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Audit, Multimodal, SqlSuite, TextAnalysis, TrainingData}

/** Semantics invariants for the round-8 widening beyond the DuckDB
  * hash gate.
  */
class Round8OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("q262: the governance card reads the components' CACHED stages and agrees with them") {
    import org.apache.spark.sql.functions.col
    // run the component queries first — their per-doc stages land in
    // the memo-caches the card must then REUSE, not recompute
    val q62 = TextAnalysis.qualityFilter(spark, sf).collect()
    val q235 = TrainingData.dedupImpact(spark, sf).collect()
    val q90 = TrainingData.decontaminate(spark, sf).collect()
    val q231 = TextAnalysis.ngramNovelty(spark, sf).collect()
    val card = Audit.governanceCard(spark, sf)
    val plan = card.queryExecution.executedPlan.toString
    val scans = "InMemoryTableScan".r.findAllMatchIn(plan).length
    assert(scans >= 4,
      s"the card must read all four cached component stages, saw $scans:\n" +
        plan.take(2000))
    // cross-query consistency: the card rolled up to lang must equal
    // the component outputs (same stages => same numbers)
    val rows = card.collect()
    def byLang(f: org.apache.spark.sql.Row => Long): Map[String, Long] =
      rows.groupBy(_.getAs[String]("lang"))
        .map { case (l, rs) => l -> rs.map(f).sum }
    assert(byLang(_.getAs[Long]("n_exact_dropped")) ==
      q235.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_exact_dropped")).toMap)
    assert(byLang(_.getAs[Long]("n_near_dropped")) ==
      q235.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_near_dropped")).toMap)
    assert(byLang(_.getAs[Long]("n_contaminated")) ==
      q90.map(r => r.getAs[String]("lang") -> r.getAs[Long]("n_contaminated")).toMap)
    assert(byLang(_.getAs[Long]("n_quality_keep")).values.sum ==
      q62.count(_.getAs[String]("verdict") == "keep"))
    assert(byLang(_.getAs[Long]("n_scored")).values.sum ==
      q231.map(_.getAs[Long]("n_docs")).sum)
    // token shares within a language sum to ~1e6 (integer floors)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      val tot = rs.map(_.getAs[Long]("token_share_e6")).sum
      assert(tot <= 1000000L && tot > 1000000L - rs.length,
        s"$l: shares sum to $tot")
    }
  }

  test("q261: DCT pHash catches planted noise edits BOTH gradient hashes miss") {
    import org.apache.spark.sql.functions.col
    val docs = graft.util.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0 && col("doc_id") % 5 === 0)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    def ham(a: (Long, Long), b: (Long, Long)): Int =
      java.lang.Long.bitCount(a._1 ^ b._1) + java.lang.Long.bitCount(a._2 ^ b._2)
    // evaluate ALL THREE detectors on the SAME planted edit per doc
    var caughtOnlyByDct = 0
    docs.foreach { case (_, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val edited = Multimodal.xor4(bytes)
      val a = ham(Multimodal.aHash64(bytes), Multimodal.aHash64(edited))
      val g = ham(Multimodal.dHash64(bytes), Multimodal.dHash64(edited))
      val p = ham(Multimodal.pHashDct64(bytes), Multimodal.pHashDct64(edited))
      if (p <= 3 && a > 3 && g > 3) caughtOnlyByDct += 1
    }
    assert(caughtOnlyByDct > 0,
      "the planted XOR-4 noise must produce at least one pair only the " +
        "DCT hash detects (the reason the triple exists)")
    // pigeonhole completeness: the banded pipeline finds EXACTLY the
    // pairs a brute-force all-pairs Hamming scan finds at <= 3
    val banded = Multimodal.dctPhashNearDup(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val all = graft.util.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val hashes = all.flatMap { case (id, text) =>
      val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val base = Seq(id -> Multimodal.pHashDct64(bytes))
      if (id % 5 == 0) base :+ (id + 2000000000L) -> Multimodal.pHashDct64(Multimodal.xor4(bytes))
      else base
    }
    val brute = (for {
      (ia, ha) <- hashes; (ib, hb) <- hashes
      if ia < ib && ham(ha, hb) <= 3
    } yield (ia, ib, ham(ha, hb).toLong)).toSet
    assert(banded == brute,
      "4x16-bit banding must be pigeonhole-complete at Hamming <= 3")
  }

  test("q263: compaction leaves one file per cell directory and moves no row") {
    import org.apache.spark.sql.functions.col
    import scala.jdk.CollectionConverters._
    val compacted = graft.ops.Clustering.ensureCompactedSweptIvf(spark, sf)
    val (swept, _, _) = graft.ops.Clustering.ensureSweptIndexes(spark, sf)
    // structural: each cell directory holds at most ONE data file
    val loc = graft.ops.Clustering.tableLocation(spark, compacted)
    val perDir = java.nio.file.Files.walk(loc).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet"))
      .toSeq.groupBy(_.getParent.getFileName.toString)
    assert(perDir.nonEmpty)
    perDir.foreach { case (dir, files) =>
      assert(dir.startsWith("cell="), dir)
      assert(files.size == 1, s"$dir has ${files.size} files after compaction")
    }
    // semantic: not one row moved
    val a = spark.table(swept).select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = spark.table(compacted).select(col("vec_id"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("q264: every exported doc passes every gate its diagnostic query applies") {
    import org.apache.spark.sql.functions.col
    val export = graft.ops.TrainingData.releaseExport(spark, sf).collect()
    assert(export.nonEmpty)
    val ids = export.map(_.getAs[Long]("doc_id")).toSet
    assert(ids.forall(_ % 97 != 0), "eval-split docs must not ship")
    val contaminated = graft.ops.TrainingData.contaminatedIds(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(ids.intersect(contaminated).isEmpty, "contaminated docs must not ship")
    val badVerdicts = graft.ops.TextAnalysis.docQuality(spark, sf)
      .filter(col("verdict") =!= "keep")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(badVerdicts).isEmpty, "non-keep docs must not ship")
    val dropped = graft.ops.TrainingData.dedupMarks(spark, sf)
      .filter(col("exact_drop") || col("near_dropped"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(ids.intersect(dropped).isEmpty, "dedup-dropped docs must not ship")
    // and nothing eligible was LEFT BEHIND: the four gate sets fully
    // explain the complement
    val all = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val excluded = all.filter(id => id % 97 == 0 || contaminated(id) ||
      badVerdicts(id) || dropped(id))
    assert(ids == all -- excluded, "export must be exactly the survivors")
  }

  test("q267: every planted typo pair is found; segment fan-out stays constant") {
    import org.apache.spark.sql.functions.col
    val pairs = graft.ops.Dedup.editDistanceJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val plantedBases = graft.util.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.length(col("text")) >= 24 &&
        col("doc_id") % 7 === 0)
      .select("doc_id").collect().map(_.getLong(0))
    assert(plantedBases.nonEmpty)
    plantedBases.foreach { id =>
      assert(pairs.contains((id, id + 3000000000L)),
        s"planted typo of doc $id was not matched")
    }
  }

  test("q267 property: the segment scheme is complete for ANY 24-char pair at lev <= 2") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // mirrors of the query's key generation (3 exact segments of 8;
    // probes at each segment position shifted +-2 within bounds)
    def segKeys(t: String): Set[(Int, String)] =
      (0 until 3).map(i => (i, t.slice(i * 8, i * 8 + 8))).toSet
    def probeKeys(t: String): Set[(Int, String)] =
      (for {
        i <- 0 until 3; dl <- -2 to 2
        p = i * 8 + dl; if p >= 0 && p + 8 <= 24
      } yield (i, t.slice(p, p + 8))).toSet
    // The query implements ONE direction: exact segments of the
    // smaller-id doc joined to probe windows of the larger-id doc
    // (the doc_id < b_id filter). The property has no ids, so it must
    // prove that single direction for EITHER possible assignment —
    // assert both directions individually (AND, not OR), so a
    // regression in the one-directional scheme is caught.
    def candidate(x: String, y: String): Boolean =
      segKeys(x).intersect(probeKeys(y)).nonEmpty &&
        segKeys(y).intersect(probeKeys(x)).nonEmpty
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to a.length) {
          val cur = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(a.length)
    }
    // small alphabet so segments collide in interesting ways
    val base = Gen.listOfN(24, Gen.oneOf('a', 'b', 'c')).map(_.mkString)
    val edit: Gen[String => String] = for {
      op <- Gen.oneOf(0, 1, 2) // sub, ins, del
      pos <- Gen.chooseNum(0, 23)
      ch <- Gen.oneOf('a', 'b', 'c', 'z')
    } yield (t: String) => op match {
      case 0 => t.updated(math.min(pos, t.length - 1), ch)
      case 1 => t.take(pos) + ch + t.drop(pos)
      case 2 => if (t.length > 1) t.take(pos.min(t.length - 1)) +
        t.drop(pos.min(t.length - 1) + 1) else t
    }
    val pairGen = for {
      x <- base
      e1 <- edit; e2 <- edit
      n <- Gen.oneOf(0, 1, 2)
      y = Seq(e1, e2).take(n).foldLeft(x)((t, f) => f(t))
    } yield (x, y)
    val prop = Prop.forAll(pairGen) { case (x, y) =>
      // the query's corpus only holds 24-char titles; the lemma claim
      // is only made (and only needed) there
      if (x.length == 24 && y.length == 24 && lev(x, y) <= 2)
        candidate(x, y)
      else true
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("q268: LPA labels are node ids, sizes conserve the node count, run is deterministic") {
    val rows = graft.ops.Graph.labelPropagation(spark, sf).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getAs[Long]("p_key")).toSet
    val labels = rows.map(_.getAs[Long]("community")).toSet
    assert(labels.subsetOf(nodes), "labels must be node ids of the graph")
    // propagation must actually merge labels (how FAR it merges is a
    // graph property: this dense little fixture collapses to one
    // community; sf0.01's splits into several — the gate pins both)
    assert(labels.size < nodes.size, "propagation must merge labels")
    // community_size column is consistent with the labeling itself
    val byLabel = rows.groupBy(_.getAs[Long]("community"))
    rows.foreach { r =>
      assert(r.getAs[Long]("community_size") ==
        byLabel(r.getAs[Long]("community")).length)
    }
    val again = graft.ops.Graph.labelPropagation(spark, sf).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q271: PPS sample places exactly k draws and always selects over-step documents") {
    import org.apache.spark.sql.functions.col
    val rows = graft.ops.TrainingData.ppsSample(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("mult")).sum == 50L,
      "systematic PPS must place exactly k sample points")
    val base = graft.util.Tables.documents(spark, sf)
      .select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.split(col("text"), "\\s+"))
          .cast("long").as("nt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val total = base.map(_._2).sum
    val step = total / 50
    val selected = rows.map(_.getAs[Long]("doc_id")).toSet
    base.filter(_._2 > step).foreach { case (id, nt) =>
      assert(selected.contains(id),
        s"doc $id with $nt tokens (> step $step) must be certain-selected")
    }
    // inclusion is token-proportional: multiplicity never exceeds
    // ceil(nt / step) + 1 interval crossings
    rows.foreach { r =>
      val nt = r.getAs[Long]("n_tokens")
      assert(r.getAs[Long]("mult") <= nt / step + 1)
    }
  }

  test("q260: session variables bind live values and EXECUTE IMMEDIATE honors rebinding") {
    val out = SqlSuite.sessionVars(spark, sf).collect()
    assert(out.nonEmpty)
    val filtered = out.map(_.getAs[Long]("n")).sum
    // rebinding the threshold variable changes what the SAME stored
    // query text computes — the session scope is live, not captured
    spark.sql("SET VARIABLE graft_minq = 0")
    val all = spark.sql("EXECUTE IMMEDIATE graft_qtext USING graft_minq")
      .collect()
    val total = all.map(_.getAs[Long]("n")).sum
    assert(filtered < total)
    assert(total == graft.util.Tables.lineitem(spark, sf).count(),
      "threshold 0 must admit every lineitem row")
  }
}
