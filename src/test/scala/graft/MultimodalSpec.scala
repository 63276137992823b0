package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = "/root/testdata/sf0.001"

  test("media table: binary payload with magic header + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema("payload").dataType.typeName == "binary")
    val r = m.orderBy("doc_id").first()
    val payload = r.getAs[Array[Byte]]("payload")
    assert(payload.take(4).sameElements(Multimodal.Magic))
    assert(Set("image", "audio", "video").contains(r.getAs[String]("media_type")))
  }

  test("decode stub: batched partition decode, deterministic features") {
    val feats = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))
    val rows = feats.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Boolean]("valid")))
    assert(rows.forall { r =>
      r.getAs[Int]("width") >= 1 && r.getAs[Int]("width") <= 64 &&
        r.getAs[Int]("height") >= 1 && r.getAs[Int]("height") <= 48
    })
    // deterministic across runs
    val again = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, sf))
      .orderBy("doc_id").collect().map(_.getAs[Long]("checksum")).toSeq
    assert(again == feats.orderBy("doc_id").collect().map(_.getAs[Long]("checksum")).toSeq)
  }

  test("decode stub flags payloads with a corrupt magic header") {
    import spark.implicits._
    val bad = Seq((1L, "image", Array[Byte](0, 0, 0, 0, 65, 66)))
      .toDF("doc_id", "media_type", "payload")
    val out = Multimodal.decodeFeatures(bad).collect()
    assert(!out(0).getAs[Boolean]("valid"))
  }

  test("q140: audio windows decode to hand-computed int16 energies") {
    // audio docs are doc_id % 3 == 1; window = 16 samples = 32 body
    // bytes. Use BenchOne-free direct check on sf fixture: recompute
    // one doc's first window from its raw text bytes.
    val doc = graft.util.Tables.documents(spark, sf)
      .filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 1)
      .orderBy("doc_id").select("doc_id", "text").head()
    val (id, text) = (doc.getLong(0), doc.getString(1))
    assume(text.length >= 32)
    val bytes = text.getBytes("UTF-8")
    var sumSq = 0L
    var peak = 0
    (0 until 16).foreach { k =>
      val v = ((bytes(2 * k) & 0xff) << 8 | (bytes(2 * k + 1) & 0xff)) - 32768
      sumSq += v.toLong * v
      if (math.abs(v) > peak) peak = math.abs(v)
    }
    val first = Multimodal.audioWindows(spark, sf).filter(
      org.apache.spark.sql.functions.col("doc_id") === id).orderBy("win").head()
    assert(first.getAs[Long]("win") == 0L)
    assert(first.getAs[Long]("mean_sq") == sumSq / 16)
    assert(first.getAs[Int]("peak") == peak)
    // window count law: full windows only
    val nWin = Multimodal.audioWindows(spark, sf).filter(
      org.apache.spark.sql.functions.col("doc_id") === id).count()
    assert(nWin == bytes.length / 2 / 16)
  }

  test("frame sampling: n_frames rows per video doc, offsets strided") {
    val frames = Multimodal.frameSample(spark, sf).collect()
    assert(frames.nonEmpty)
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, fs) =>
      val nos = fs.map(_.getAs[Long]("frame_no")).sorted.toSeq
      assert(nos == (0L until nos.length).toSeq)
      val offs = fs.sortBy(_.getAs[Long]("frame_no")).map(_.getAs[Long]("byte_offset"))
      assert(offs.toSeq == offs.sorted.toSeq)
    }
  }

  test("q148: banded aHash pairs ≡ brute-force all-pairs reference at Hamming ≤ 3") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-phash").toString
    def t(seed: Int): String =
      (0 until 80).map(i => ('a' + (i * 7 + seed * 13) % 26).toChar).mkString
    // ids ≡ 0 (mod 3) are images; 0 and 15 also get planted copies
    val rows = Seq(
      (0L, t(1), "en", "s", 0L), (3L, t(2), "en", "s", 0L),
      (6L, t(2), "en", "s", 0L), // 3 and 6 identical → Hamming-0 pair
      (9L, t(5), "en", "s", 0L), (12L, t(9), "en", "s", 0L),
      (15L, t(4), "en", "s", 0L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = Multimodal.phashNearDup(spark, dir).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("hamming")))
      .toSet
    // independent reference: plain-Scala aHash + brute-force all pairs
    def ahash(s: String): Long = {
      val n = s.length
      val px = Array.tabulate(64)(i => s.charAt((i * n) / 64).toLong)
      val mean = px.sum / 64
      px.zipWithIndex.map { case (p, i) => if (p > mean) 1L << i else 0L }.sum
    }
    val corpus = rows.map { case (id, text, _, _, _) => (id, text) } ++
      rows.collect { case (id, text, _, _, _) if id % 5 == 0 =>
        (id + 1000000000L, "X" + text.substring(1)) }
    val expect = (for {
      (a, ta) <- corpus; (b, tb) <- corpus if a < b
      h = java.lang.Long.bitCount(ahash(ta) ^ ahash(tb)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got == expect)
    assert(got.contains((3L, 6L, 0L))) // identical images collide at 0
    // both planted perturbations are caught
    assert(got.exists(p => p._1 == 0L && p._2 == 1000000000L))
    assert(got.exists(p => p._1 == 15L && p._2 == 1000000015L))
  }
}
