package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Tables._

/** Multimodal-column handling (north-star surface): media as opaque
  * BINARY payloads + typed metadata, with decode / feature-extraction /
  * frame-sampling stages. The container has no image/audio codecs, so
  * the decode step is a clearly-marked deterministic STUB
  * (`fakeDecode`) — but everything Spark-side is real and tested: the
  * binary schema, the batched mapPartitions decode shape (the Scala
  * equivalent of a pandas-UDF batch), partition-parallel feature
  * extraction, and generate-based frame sampling.
  *
  * The synthetic payloads derive from `documents.text` (UTF-8 bytes +
  * a 4-byte magic header), so the metadata queries stay DuckDB-
  * oracle-checkable end-to-end.
  */
object Multimodal {

  val Magic: Array[Byte] = Array[Byte](0x7f, 'G', 'M', '1')

  /** documents → media table: (doc_id, media_type, payload, n_bytes). */
  def mediaTable(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
      concat(lit(Magic), encode(col("text"), "UTF-8")).as("payload"),
      col("n_chars"))

  /** Decoded "media" features. The per-batch loop is the Spark shape a
    * real decoder plugs into (one codec instance per partition, batch
    * iteration, columnar-out); only `decodeStub` itself is fake.
    */
  final case class MediaFeatures(
      doc_id: Long, media_type: String, valid: Boolean,
      width: Int, height: Int, n_bytes: Long, checksum: Long)

  /** STUB decode: a real implementation would parse the codec header
    * and rasterize; this derives deterministic pseudo-features from
    * the bytes so the pipeline shape is testable offline.
    */
  private def decodeStub(payload: Array[Byte]): (Boolean, Int, Int, Long) = {
    val valid = payload.length >= 4 &&
      payload(0) == Magic(0) && payload(1) == Magic(1) &&
      payload(2) == Magic(2) && payload(3) == Magic(3)
    var sum = 0L
    var i = 4
    while (i < payload.length) { sum = (sum * 31 + (payload(i) & 0xff)) & 0xffffffffL; i += 1 }
    val body = math.max(payload.length - 4, 1)
    (valid, body % 64 + 1, body % 48 + 1, sum)
  }

  def decodeFeatures(media: DataFrame): DataFrame = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("media_type"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        // one decoder per partition; iterate the batch (pandas-UDF shape)
        batch.map { case (id, mt, payload) =>
          val (valid, w, h, sum) = decodeStub(payload)
          MediaFeatures(id, mt, valid, w, h, payload.length.toLong, sum)
        }
      }
      .toDF()
  }

  /** Frame sampling for video payloads: n_frames = n_chars % 8 + 1
    * evenly-strided offsets, exploded one row per frame — the generate
    * (flatMap) shape of real frame extraction, fully oracle-checkable.
    */
  def frameSample(s: SparkSession, d: String): DataFrame = {
    val m = mediaTable(s, d).filter(col("media_type") === "video")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("n_frames", (pmod(col("n_chars"), lit(8)) + 1).cast("long"))
    m.select(col("doc_id"), col("n_bytes"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_no"))
      .withColumn("byte_offset", col("frame_no") * expr("n_bytes div n_frames"))
      .select(col("doc_id"), col("frame_no"), col("byte_offset"))
      .orderBy(col("doc_id"), col("frame_no"))
  }

  /** Resize stage for image payloads: decode (stub) → fit into a
    * 32×32 box preserving aspect ratio, all in exact integer math
    * (`new = max(1, dim·32 // max(w,h))`). Runs in the same typed
    * mapPartitions shape a real rasterizer plugs into; the oracle
    * recomputes the dimensions arithmetically from the payload length,
    * so the full decode→transform plumbing is hash-checked.
    */
  final case class ResizedMedia(
      doc_id: Long, width: Long, height: Long, new_w: Long, new_h: Long)

  def mediaResize(s: SparkSession, d: String, target: Int = 32): DataFrame = {
    import s.implicits._
    mediaTable(s, d).filter(col("media_type") === "image")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, payload) =>
          val (_, w, h, _) = decodeStub(payload)
          val m = math.max(w, h)
          ResizedMedia(id, w.toLong, h.toLong,
            math.max(1, w * target / m).toLong, math.max(1, h * target / m).toLong)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  /** Metadata projection over the media table (oracle-checked). */
  def mediaMeta(s: SparkSession, d: String): DataFrame =
    mediaTable(s, d)
      .select(col("doc_id"), col("media_type"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        ascii(substring(col("payload"), 5, 8).cast("string")).cast("long").as("first_char_code"))
      .orderBy(col("doc_id"))

  /** One decoded audio window: 16 int16 samples → integer mean-square
    * energy + peak amplitude.
    */
  final case class AudioWindow(doc_id: Long, win: Long, mean_sq: Long, peak: Int)

  /** Audio windowing over the `audio` media rows: the payload body
    * decodes as big-endian int16 PCM (deterministic fake — a real
    * codec drops into the same per-partition loop), split into
    * non-overlapping 16-sample windows; each window reports its
    * integer mean-square energy and peak amplitude — the
    * silence-detection / loudness-normalization kernel of an audio
    * training pipeline.
    *
    * Everything is exact integer arithmetic (Σs² ≤ 16·2¹⁵² per
    * window, ≪ 2⁶³), so the DuckDB oracle reproduces it bit-for-bit
    * from the SAME bytes via ascii() — the corpus is ASCII so
    * payload-body bytes ≡ text characters.
    *
    * Scale shape: a narrow compiled mapPartitions (decoder-per-
    * partition, the pandas-UDF batch shape) — no shuffle at all until
    * the presentation sort; window rows are 28 bytes regardless of
    * payload size.
    */
  def audioWindows(s: SparkSession, d: String, winLen: Int = 16): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          val body = payload.length - 4 // magic header
          val nWin = body / 2 / winLen  // full windows of int16 samples
          (0 until nWin).iterator.map { w =>
            var sumSq = 0L
            var peak = 0
            var k = 0
            while (k < winLen) {
              val i = 4 + 2 * (w * winLen + k)
              val v = ((payload(i) & 0xff) << 8 | (payload(i + 1) & 0xff)) - 32768
              sumSq += v.toLong * v
              if (math.abs(v) > peak) peak = math.abs(v)
              k += 1
            }
            AudioWindow(id, w.toLong, sumSq / winLen, peak)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("win"))
  }

  /** Perceptual-hash (aHash) near-duplicate detection over the image
    * shard — the image-dedup pass of a multimodal corpus build. The
    * stub "decode" samples the payload body into an 8×8 grayscale
    * grid (pixel i = body byte at (i·n)/64 — a real rasterizer drops
    * into the same expression), the 64-bit average-hash sets bit i
    * when pixel i exceeds the integer mean, and near-dups are pairs
    * at Hamming distance ≤ 3.
    *
    * The corpus unions a deterministic planted perturbation (first
    * character rewritten, same length) of every 15th document — the
    * near-identical re-encode this operator exists to catch.
    *
    * Scale shape: NO all-pairs stage — the 64-bit hash splits into
    * four 16-bit bands, and by pigeonhole any pair within Hamming 3
    * collides on at least one band, so candidates come from four
    * band-keyed equi-self-joins over (band, value) keys; the exact
    * Hamming verify runs on candidates only (bit_count(xor) on two
    * 32-bit halves — codegen'd integer ops). The same
    * band-then-verify shape as MinHash-LSH (q27) and SimHash (q64),
    * applied to the binary modality.
    */
  /** One 64-bit aHash as two 32-bit halves (keeps every downstream
    * band/xor in non-negative BIGINT range on both engines).
    */
  final case class ZcrWindow(doc_id: Long, win: Long, n_crossings: Long,
      n_pos: Long)

  /** q223: zero-crossing rate per audio frame — with q140's RMS the
    * standard two-feature voiced/unvoiced front-end (high ZCR + low
    * energy = fricative/noise, low ZCR + high energy = voiced). Same
    * int16 decode of the payload body, same 16-sample framing; per
    * frame: sign changes between consecutive samples (sign boundary
    * at < 0, so 0 counts positive — fixed and documented, both
    * engines apply the identical rule) and the count of non-negative
    * samples. All integer.
    *
    * Scale shape: identical to q140 — one compiled narrow
    * mapPartitions (the pandas-UDF batch shape), no shuffle before
    * the presentation sort; emitted rows are 32 bytes per frame
    * independent of payload size.
    */
  def audioZcr(s: SparkSession, d: String, winLen: Int = 16): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(col("media_type") === "audio")
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.flatMap { case (id, payload) =>
          val body = payload.length - 4
          val nWin = body / 2 / winLen
          (0 until nWin).iterator.map { w =>
            var crossings = 0L
            var nPos = 0L
            var prevNeg = false
            var k = 0
            while (k < winLen) {
              val i = 4 + 2 * (w * winLen + k)
              val v = ((payload(i) & 0xff) << 8 | (payload(i + 1) & 0xff)) - 32768
              val neg = v < 0
              if (k > 0 && neg != prevNeg) crossings += 1
              if (!neg) nPos += 1
              prevNeg = neg
              k += 1
            }
            ZcrWindow(id, w.toLong, crossings, nPos)
          }
        }
      }
      .toDF()
      .orderBy(col("doc_id"), col("win"))
  }

  final case class AHash(doc_id: Long, lo: Long, hi: Long)

  /** The three 64-bit perceptual hashes as pure byte-array functions —
    * shared by the q148/q224/q261 pipelines and the Round8OpsSpec
    * detector-comparison audit (which evaluates all three on the SAME
    * planted edit).
    */
  private[graft] def rasterOf(bytes: Array[Byte], nPx: Int): Array[Long] = {
    val n = bytes.length
    Array.tabulate(nPx)(i => (bytes(((i.toLong * n) / nPx).toInt) & 0xff).toLong)
  }

  private[graft] def aHash64(bytes: Array[Byte]): (Long, Long) = {
    val px = rasterOf(bytes, 64)
    val mean = px.sum / 64
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 32) { if (px(i) > mean) lo |= 1L << i; i += 1 }
    while (i < 64) { if (px(i) > mean) hi |= 1L << (i - 32); i += 1 }
    (lo, hi)
  }

  private[graft] def dHash64(bytes: Array[Byte]): (Long, Long) = {
    val px = rasterOf(bytes, 72)
    var lo = 0L; var hi = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        val bit = r * 8 + c
        if (px(r * 9 + c) < px(r * 9 + c + 1)) {
          if (bit < 32) lo |= 1L << bit else hi |= 1L << (bit - 32)
        }
        c += 1
      }
      r += 1
    }
    (lo, hi)
  }

  /** Integer 8×8 DCT-II basis, cosines quantized to 1/1024 units —
    * the SAME array generates the oracle's inlined constant lists, so
    * the two engines cannot drift.
    */
  private[graft] val DctC: Array[Array[Long]] =
    Array.tabulate(8, 8)((u, x) =>
      math.round(1024.0 * math.cos(math.Pi * (2 * x + 1) * u / 16.0)))

  /** DCT-based pHash: 8×8 raster → integer DCT-II (all products exact
    * in BIGINT: |F| ≤ 64·127·1024² < 2⁶³) → bit i (= u·8+v, DC
    * excluded) set when coefficient i exceeds the exact median (32nd
    * smallest) of the 63 AC coefficients. Bit 0 is always clear, so
    * the hash is 63 informative bits in the same (lo, hi) carriage as
    * q148/q224.
    */
  private[graft] def pHashDct64(bytes: Array[Byte]): (Long, Long) = {
    val px = rasterOf(bytes, 64)
    val f = new Array[Long](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0L
        var x = 0
        while (x < 8) {
          val cu = DctC(u)(x)
          var y = 0
          while (y < 8) { acc += px(x * 8 + y) * cu * DctC(v)(y); y += 1 }
          x += 1
        }
        f(u * 8 + v) = acc
        v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    System.arraycopy(f, 1, ac, 0, 63)
    java.util.Arrays.sort(ac)
    val med = ac(31)
    var lo = 0L; var hi = 0L
    var i = 1
    while (i < 32) { if (f(i) > med) lo |= 1L << i; i += 1 }
    while (i < 64) { if (f(i) > med) hi |= 1L << (i - 32); i += 1 }
    (lo, hi)
  }

  /** The q261 planted edit: XOR 4 on every byte in [32, 124) — the
    * low-amplitude value noise a lossy re-encode leaves behind. A
    * per-byte VALUE map, so it commutes with raster sampling: both
    * engines apply it to the sampled pixels, never rebuilding the
    * string. Range-capped so every edited byte stays ASCII (one UTF-8
    * byte — raster positions unchanged).
    */
  private[graft] def xor4(bytes: Array[Byte]): Array[Byte] =
    bytes.map { b =>
      val v = b & 0xff
      if (v >= 32 && v < 124) (v ^ 4).toByte else b
    }

  /** The shared band-then-verify tail of q148/q224/q261: 4×16-bit
    * pigeonhole bands (Hamming ≤ 3 ⇒ at least one band exactly
    * equal), candidates from band-keyed equi-self-joins, exact
    * bit_count verify on candidates only — never all-pairs.
    */
  private def bandedNearDups(hashes: DataFrame, maxHamming: Int): DataFrame = {
    val bands = hashes.select(col("doc_id"), col("lo"), col("hi"),
        posexplode(array(
          col("lo") % 65536, expr("lo div 65536"),
          col("hi") % 65536, expr("hi div 65536"))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bv")
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a"), col("a.lo").as("alo"), col("a.hi").as("ahi"),
        col("b.doc_id").as("b"), col("b.lo").as("blo"), col("b.hi").as("bhi"))
      .distinct()
    cand
      .withColumn("hamming",
        bit_count(expr("alo ^ blo")) + bit_count(expr("ahi ^ bhi")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a"), col("b"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("a"), col("b"))
  }

  /** q261: DCT pHash near-dup — the third perceptual hash, completing
    * the triple: q148's aHash thresholds pixels against the global
    * mean, q224's dHash records horizontal gradients, and this one
    * thresholds the 63 AC coefficients of an integer 8×8 DCT-II
    * against their exact median, so each bit aggregates ALL 64 pixels
    * weighted by a frequency basis. That averaging is what survives
    * low-amplitude per-pixel noise (the planted XOR-4 re-encode
    * artifact): a ±4 value wiggle flips aHash bits near the mean and
    * dHash bits between close neighbors, but moves low-frequency DCT
    * coefficients by at most 64·4·1024² ≪ the coefficient spread.
    * Measured on the fixture (Round8OpsSpec pins it): pairs exist
    * that pHash catches at Hamming ≤ 3 while BOTH gradient hashes
    * sit above threshold. (Uniform brightness shifts, by contrast,
    * are absorbed by all three hashes' self-normalization — the DCT's
    * edge is noise robustness, not brightness.)
    *
    * Scale shape: identical to q148/q224 — one compiled narrow hash
    * loop (4096 integer multiply-adds per doc), then the only wide op
    * ships (doc_id, 16-bit band) pairs through [[bandedNearDups]].
    */
  def dctPhashNearDup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val img = documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val hashes = img.as[(Long, String)]
      .mapPartitions { it =>
        it.flatMap { case (id, text) =>
          val bytes = text.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val (lo, hi) = pHashDct64(bytes)
          val self = AHash(id, lo, hi)
          if (id % 5 == 0) {
            val (plo, phi) = pHashDct64(xor4(bytes))
            Iterator(self, AHash(id + 2000000000L, plo, phi))
          } else Iterator(self)
        }
      }.toDF()
    bandedNearDups(hashes, maxHamming)
  }

  def phashNearDup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val img = documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val planted = img.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(lit("X"), substring(col("text"), 2, Int.MaxValue)).as("text"))
    // compiled per-partition hash loop, NOT chained transform/aggregate
    // HOF columns: CollapseProject inlines the px array into every
    // consumer, so element_at(px, i) re-evaluates the whole 64-element
    // interpreted lambda per access — measured 22.7 s for this stage
    // at sf0.1 vs 0.35 s compiled (the Dedup.signatures / posGrams
    // trap). Bytes ≡ ascii() here because the corpus is ASCII (the
    // q140 assumption, documented there).
    val hashes = img.unionAll(planted)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (lo, hi) = aHash64(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          AHash(id, lo, hi)
        }
      }.toDF()
    bandedNearDups(hashes, maxHamming)
  }

  /** q224: difference-hash (dHash) image near-dup — the gradient
    * complement to q148's aHash: the stub rasterizer samples a 9×8
    * grid (72 pixels) and bit r·8+c records whether pixel (r,c) is
    * darker than its right neighbor, so the 64-bit hash captures
    * horizontal gradients and is invariant to global brightness
    * shifts (which flip many aHash bits at once — the reason real
    * dedup pipelines run both). Candidates via the same 4×16-bit
    * pigeonhole banding (Hamming ≤ 3 ⇒ one band exact), verified by
    * bit_count on candidates only. The planted perturbation rewrites
    * the LAST character (q148 plants the first) so the two detectors
    * are proven on independent edits.
    *
    * Scale shape: identical to q148 — compiled narrow hash loop, then
    * the only wide op ships (doc_id, 16-bit band) pairs; never
    * all-pairs.
    */
  def dhashNearDup(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame = {
    import s.implicits._
    val img = documents(s, d).filter(col("doc_id") % 3 === 0)
      .select(col("doc_id"), col("text"))
    val planted = img.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 1000000000L).as("doc_id"),
        concat(expr("substring(text, 1, length(text) - 1)"), lit("X"))
          .as("text"))
    val hashes = img.unionAll(planted)
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions { it =>
        it.map { case (id, text) =>
          val (lo, hi) = dHash64(
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          AHash(id, lo, hi)
        }
      }.toDF()
    bandedNearDups(hashes, maxHamming)
  }

  final case class SceneCuts(doc_id: Long, n_frames: Long, n_cuts: Long,
      max_diff: Long)

  /** q249: scene-change detection over the video shard — the
    * frame-sampling stage (q34) extended to CONSECUTIVE-frame
    * comparison: each video yields n_chars%8+1 frames of 16 sampled
    * "pixels" (byte j of frame k at position (k·16+j)·body/(16·F) —
    * always in bounds, deterministic), the inter-frame difference is
    * the L1 distance over the 16 samples, and a cut fires above 500.
    * The shot-segmentation primitive a video-corpus build runs before
    * per-shot dedup/captioning; the stub sampler drops into a real
    * decoder unchanged (the Multimodal contract).
    *
    * All integer arithmetic — the oracle replays the identical
    * positions via ascii() (corpus is ASCII, the q140 assumption).
    *
    * Scale shape: one compiled narrow mapPartitions; 32 bytes out per
    * video regardless of payload size.
    */
  def sceneCuts(s: SparkSession, d: String, threshold: Long = 500L): DataFrame = {
    import s.implicits._
    mediaTable(s, d)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("payload"), col("n_chars"))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { batch =>
        batch.map { case (id, payload, nChars) =>
          val body = payload.length - 4
          val f = (nChars % 8 + 1).toInt
          def sample(k: Int, j: Int): Int =
            payload(4 + (((k * 16 + j).toLong * body) / (16L * f)).toInt) & 0xff
          var cuts = 0L
          var maxDiff = 0L
          var k = 1
          while (k < f) {
            var diff = 0L
            var j = 0
            while (j < 16) {
              diff += math.abs(sample(k, j) - sample(k - 1, j))
              j += 1
            }
            if (diff > threshold) cuts += 1
            if (diff > maxDiff) maxDiff = diff
            k += 1
          }
          SceneCuts(id, f.toLong, cuts, maxDiff)
        }
      }
      .toDF()
      .orderBy(col("doc_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q249_scene_cuts"  -> ((s: SparkSession, d: String) => sceneCuts(s, d)),
    "q223_audio_zcr"   -> ((s: SparkSession, d: String) => audioZcr(s, d)),
    "q224_dhash_neardup" -> ((s: SparkSession, d: String) => dhashNearDup(s, d)),
    "q33_media_meta"   -> mediaMeta _,
    "q34_frame_sample" -> frameSample _,
    "q56_media_resize" -> ((s: SparkSession, d: String) => mediaResize(s, d)),
    "q140_audio_windows" -> ((s: SparkSession, d: String) => audioWindows(s, d)),
    "q148_phash_neardup" -> ((s: SparkSession, d: String) => phashNearDup(s, d)),
    "q261_dct_phash" -> ((s: SparkSession, d: String) => dctPhashNearDup(s, d)),
  )

  /** q261 oracle, mechanically generated from the SAME DctC table the
    * engine uses: per coefficient i (= u·8+v), the 64 constant
    * products C[u][x]·C[v][y] are inlined as a literal list, so the
    * SQL provably computes the identical integer DCT.
    */
  private def dctPhashSql: String = {
    val coefExprs = (0 until 64).map { i =>
      val u = i / 8; val v = i % 8
      val consts = (0 until 64).map { j =>
        val x = j / 8; val y = j % 8
        (DctC(u)(x) * DctC(v)(y)).toString
      }.mkString(", ")
      s"CAST(list_sum([px[j] * ([$consts])[j] for j in range(1, 65)]) AS BIGINT)"
    }.mkString(",\n        |    ").stripMargin
    s"""WITH img AS (
      |  SELECT doc_id, text, FALSE AS planted
      |  FROM documents WHERE doc_id % 3 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000000, text, TRUE
      |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 = 0),
      |px0 AS (
      |  SELECT doc_id, planted,
      |    [CAST(ascii(substring(text,
      |       CAST((i * octet_length(encode(text))) // 64 + 1 AS INT), 1)) AS BIGINT)
      |     for i in range(0, 64)] AS p0
      |  FROM img),
      |pxt AS (
      |  SELECT doc_id,
      |    CASE WHEN planted
      |      THEN [CASE WHEN b BETWEEN 32 AND 123 THEN xor(b, 4) ELSE b END
      |            for b in p0]
      |      ELSE p0 END AS px
      |  FROM px0),
      |coefs AS (
      |  SELECT doc_id, [
      |    $coefExprs] AS f
      |  FROM pxt),
      |h AS (
      |  SELECT doc_id, f, (list_sort(f[2:64]))[32] AS med FROM coefs),
      |hb AS (
      |  SELECT doc_id,
      |    CAST(list_sum([CASE WHEN f[i + 1] > med THEN (1::BIGINT << i)
      |                        ELSE 0 END for i in range(1, 32)])
      |      AS BIGINT) AS lo,
      |    CAST(list_sum([CASE WHEN f[i + 1] > med THEN (1::BIGINT << (i - 32))
      |                        ELSE 0 END for i in range(32, 64)])
      |      AS BIGINT) AS hi
      |  FROM h),
      |bands AS (
      |  SELECT doc_id, lo, hi, b AS band,
      |    CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
      |           WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
      |  FROM hb, unnest(range(0, 4)) t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS a, a.lo AS alo, a.hi AS ahi,
      |    b.doc_id AS b, b.lo AS blo, b.hi AS bhi
      |  FROM bands a JOIN bands b
      |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
      |SELECT a, b,
      |  CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
      |    AS hamming
      |FROM cand
      |WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
      |ORDER BY a, b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q261_dct_phash" -> dctPhashSql,
    "q249_scene_cuts" ->
      """WITH v AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS body,
        |    CAST(n_chars % 8 + 1 AS BIGINT) AS f
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id, f, k,
        |    [ascii(substring(text,
        |       CAST(((k * 16 + j) * body) // (16 * f) + 1 AS INT), 1))
        |     for j in range(0, 16)] AS px
        |  FROM v, unnest(range(0, CAST(f AS BIGINT))) t(k)),
        |d AS (
        |  SELECT a.doc_id, a.f,
        |    CAST(list_sum([abs(a.px[j] - b.px[j])
        |      for j in range(1, 17)]) AS BIGINT) AS diff
        |  FROM fr a JOIN fr b ON b.doc_id = a.doc_id AND b.k = a.k - 1)
        |SELECT v.doc_id, v.f AS n_frames,
        |  CAST(coalesce(sum(CASE WHEN d.diff > 500 THEN 1 ELSE 0 END), 0)
        |    AS BIGINT) AS n_cuts,
        |  CAST(coalesce(max(d.diff), 0) AS BIGINT) AS max_diff
        |FROM v LEFT JOIN d ON d.doc_id = v.doc_id
        |GROUP BY v.doc_id, v.f
        |ORDER BY v.doc_id""".stripMargin,
    "q223_audio_zcr" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT doc_id, text,
        |        unnest(range(0, (n // 2) // 16)) AS win
        |      FROM a),
        |s AS (SELECT doc_id, text, win, unnest(range(0, 16)) AS k FROM w),
        |v AS (
        |  SELECT doc_id, win, k,
        |    ascii(substring(text, CAST(2 * (win * 16 + k) + 1 AS INT), 1)) * 256
        |      + ascii(substring(text, CAST(2 * (win * 16 + k) + 2 AS INT), 1))
        |      - 32768 AS v
        |  FROM s),
        |g AS (SELECT doc_id, win, list(v ORDER BY k) AS vs
        |      FROM v GROUP BY 1, 2)
        |SELECT doc_id, CAST(win AS BIGINT) AS win,
        |  CAST(list_sum([CASE WHEN (vs[k] < 0) <> (vs[k+1] < 0)
        |      THEN 1 ELSE 0 END for k in range(1, len(vs))]) AS BIGINT)
        |    AS n_crossings,
        |  CAST(list_sum([CASE WHEN vs[k] >= 0 THEN 1 ELSE 0 END
        |      for k in range(1, len(vs)+1)]) AS BIGINT) AS n_pos
        |FROM g
        |ORDER BY doc_id, win""".stripMargin,
    "q224_dhash_neardup" ->
      """WITH img AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000,
        |    substring(text, 1, length(text) - 1) || 'X'
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 = 0),
        |px AS (
        |  SELECT doc_id,
        |    [CAST(ascii(substring(text,
        |       CAST((i * octet_length(encode(text))) // 72 + 1 AS INT), 1)) AS BIGINT)
        |     for i in range(0, 72)] AS p
        |  FROM img),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN p[(b // 8) * 9 + (b % 8) + 1]
        |          < p[(b // 8) * 9 + (b % 8) + 2]
        |        THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 32)])
        |      AS BIGINT) AS lo,
        |    CAST(list_sum([CASE WHEN p[(b // 8) * 9 + (b % 8) + 1]
        |          < p[(b // 8) * 9 + (b % 8) + 2]
        |        THEN (1::BIGINT << (b - 32)) ELSE 0 END for b in range(32, 64)])
        |      AS BIGINT) AS hi
        |  FROM px),
        |bands AS (
        |  SELECT doc_id, lo, hi, b AS band,
        |    CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |           WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
        |  FROM h, unnest(range(0, 4)) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a, a.lo AS alo, a.hi AS ahi,
        |    b.doc_id AS b, b.lo AS blo, b.hi AS bhi
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT a, b,
        |  CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
        |    AS hamming
        |FROM cand
        |WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
        |ORDER BY a, b""".stripMargin,
    "q148_phash_neardup" ->
      """WITH img AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        |  UNION ALL
        |  SELECT doc_id + 1000000000, 'X' || substr(text, 2)
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 = 0),
        |px AS (
        |  SELECT doc_id,
        |    [CAST(ascii(substring(text,
        |       CAST((i * octet_length(encode(text))) // 64 + 1 AS INT), 1)) AS BIGINT)
        |     for i in range(0, 64)] AS p
        |  FROM img),
        |m AS (SELECT doc_id, p,
        |        CAST(list_sum(p) AS BIGINT) // 64 AS mean FROM px),
        |h AS (
        |  SELECT doc_id,
        |    CAST(list_sum([CASE WHEN p[i + 1] > mean
        |        THEN (1::BIGINT << i) ELSE 0 END for i in range(0, 32)])
        |      AS BIGINT) AS lo,
        |    CAST(list_sum([CASE WHEN p[i + 1] > mean
        |        THEN (1::BIGINT << (i - 32)) ELSE 0 END for i in range(32, 64)])
        |      AS BIGINT) AS hi
        |  FROM m),
        |bands AS (
        |  SELECT doc_id, lo, hi, b AS band,
        |    CASE b WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
        |           WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS bv
        |  FROM h, unnest(range(0, 4)) t(b)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS a, a.lo AS alo, a.hi AS ahi,
        |    b.doc_id AS b, b.lo AS blo, b.hi AS bhi
        |  FROM bands a JOIN bands b
        |    ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id)
        |SELECT a, b,
        |  CAST(bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) AS BIGINT)
        |    AS hamming
        |FROM cand
        |WHERE bit_count(xor(alo, blo)) + bit_count(xor(ahi, bhi)) <= 3
        |ORDER BY a, b""".stripMargin,
    "q140_audio_windows" ->
      """WITH a AS (
        |  SELECT doc_id, text, length(text) AS n
        |  FROM documents WHERE doc_id % 3 = 1),
        |w AS (SELECT doc_id, text,
        |        unnest(range(0, (n // 2) // 16)) AS win
        |      FROM a),
        |s AS (SELECT doc_id, text, win, unnest(range(0, 16)) AS k FROM w),
        |v AS (
        |  SELECT doc_id, win,
        |    ascii(substring(text, CAST(2 * (win * 16 + k) + 1 AS INT), 1)) * 256
        |      + ascii(substring(text, CAST(2 * (win * 16 + k) + 2 AS INT), 1))
        |      - 32768 AS v
        |  FROM s)
        |SELECT doc_id, CAST(win AS BIGINT) AS win,
        |  CAST(sum(v * v) // 16 AS BIGINT) AS mean_sq,
        |  CAST(max(abs(v)) AS INT) AS peak
        |FROM v
        |GROUP BY doc_id, win
        |ORDER BY doc_id, win""".stripMargin,
    "q33_media_meta" ->
      """SELECT doc_id,
        |  ['image', 'audio', 'video'][CAST(doc_id % 3 AS INT) + 1] AS media_type,
        |  octet_length(encode(text)) + 4 AS n_bytes,
        |  CAST(ascii(text) AS BIGINT) AS first_char_code
        |FROM documents
        |ORDER BY doc_id""".stripMargin,
    "q56_media_resize" ->
      """WITH img AS (
        |  SELECT doc_id, octet_length(encode(text)) AS body
        |  FROM documents WHERE doc_id % 3 = 0),
        |dims AS (
        |  SELECT doc_id,
        |    greatest(body, 1) % 64 + 1 AS w,
        |    greatest(body, 1) % 48 + 1 AS h
        |  FROM img)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(greatest(1, w * 32 // greatest(w, h)) AS BIGINT) AS new_w,
        |  CAST(greatest(1, h * 32 // greatest(w, h)) AS BIGINT) AS new_h
        |FROM dims
        |ORDER BY doc_id""".stripMargin,
    "q34_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) + 4 AS n_bytes,
        |    n_chars % 8 + 1 AS n_frames
        |  FROM documents
        |  WHERE doc_id % 3 = 2)
        |SELECT doc_id, f AS frame_no, f * (n_bytes // n_frames) AS byte_offset
        |FROM (SELECT doc_id, n_bytes, n_frames,
        |        unnest(range(0, n_frames)) AS f
        |      FROM v)
        |ORDER BY doc_id, frame_no""".stripMargin,
  )
}
