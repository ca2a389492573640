package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media are opaque `binary` columns plus typed metadata — the schema,
  * partitioning, batch shape, and decode-stage signature are real and
  * tested; only the codec itself is stubbed (this container has no
  * image/audio libraries), clearly marked in [[decodeStub]], with a
  * deterministic fake derived from the content hash so tests are exact.
  *
  * Scale design: decode is the archetypal CPU-heavy embarrassingly
  * parallel stage. The pipeline repartitions by media id (spreads large
  * blobs evenly — media tables are skew-prone because one video can be
  * 1000× one thumbnail) and runs the decoder via `mapPartitions` in
  * fixed-size batches, the JVM analog of Arrow-batched Pandas UDFs: a
  * real codec would amortize model/codec init per batch exactly like
  * `mapInPandas` does. Feature output is a fixed-width float vector
  * ready for [[Similarity]] operators.
  */
object Multimodal {

  /** Canonical media-table schema: id, kind, opaque bytes, metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image|audio|video
    StructField("content", BinaryType, nullable = true),
    StructField("mime_type", StringType, nullable = true),
    StructField("source_doc", LongType, nullable = true)))

  final case class MediaRecord(media_id: Long, kind: String,
                               content: Array[Byte], mime_type: String)
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
                                 content_sha: String, width: Int, height: Int,
                                 n_frames: Int, features: Array[Float])

  /** Pluggable codec boundary: a real JNI/FFI codec binding implements
    * this and drops into [[extractFeatures]] unchanged; [[StubDecoder]]
    * is the deterministic test implementation (this container ships no
    * image/audio libraries). Implementations must be `Serializable` —
    * instances ship to executors; a real binding holds its native
    * handle `@transient lazy` so each executor re-opens it locally. */
  trait Decoder extends Serializable {
    /** Decode one blob: (width, height, n_frames, feature vector). */
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float])
    /** Digest-aware variant: the pipeline SHA-1s each blob exactly once
      * for `content_sha` and passes the digest through so no decoder is
      * forced to hash the (dominant-cost) bytes a second time. Default
      * ignores it; [[StubDecoder]] decodes from it directly. */
    def decode(kind: String, bytes: Array[Byte],
               sha1: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decode(kind, bytes)
  }

  /** Deterministic pseudo-codec: dims/frame-count/8-dim feature vector
    * derived from the content's SHA-1, so specs assert exact values and
    * re-runs are bit-identical. Stands in where a real decoder goes. */
  object StubDecoder extends Decoder {
    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decodeFromDigest(kind,
        java.security.MessageDigest.getInstance("SHA-1").digest(bytes))
    override def decode(kind: String, bytes: Array[Byte],
                        sha1: Array[Byte]): (Int, Int, Int, Array[Float]) =
      decodeFromDigest(kind, sha1)
  }

  /** The stub codec under its historical name (specs, docs). */
  def decodeStub(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) =
    StubDecoder.decode(kind, bytes)

  /** A REAL pure-JVM codec for one trivial format — RIFF/WAVE PCM —
    * proving the [[Decoder]] trait boundary is honest: it parses the
    * actual byte stream (chunked RIFF header walk, little-endian PCM
    * samples) and derives features from the signal, no hashes involved.
    * Field mapping for audio (the schema's raster fields are reused,
    * documented here): `width` = sample rate in Hz, `height` = channel
    * count, `n_frames` = PCM sample frames in the data chunk.
    *
    * Features (8 floats, all in [-1, 1], exact given exact input):
    * 0: global RMS, 1: peak |sample|, 2: zero-crossing rate,
    * 3: DC offset (mean), 4–7: per-quarter RMS of the frame sequence
    * (a stationary signal yields four equal values — the spec's
    * invariant). Samples normalized by 2^(bits-1); 8/16-bit PCM only,
    * multi-channel frames averaged before stats.
    *
    * Malformed bytes throw IllegalArgumentException — a real codec
    * fails loudly on corrupt input; quarantine is the CALLER's policy
    * (the q75 corrupt-input discipline), not silent fake output. */
  object WavPcmDecoder extends Decoder {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      require(kind == "audio", s"WavPcmDecoder decodes audio, got $kind")
      require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" && tag(bytes, 8) == "WAVE",
        "not a RIFF/WAVE stream")
      // chunk walk: fmt and data may appear in any order, with padding
      var off = 12
      var sampleRate = 0; var channels = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
        val id = tag(bytes, off); val sz = le32(bytes, off + 4)
        require(sz >= 0 && off.toLong + 8 + sz <= bytes.length,
          s"truncated $id chunk")
        if (id == "fmt ") {
          require(sz >= 16, "fmt chunk too short")
          val fmt = le16(bytes, off + 8)
          require(fmt == 1, s"only PCM (format 1) supported, got $fmt")
          channels = le16(bytes, off + 10)
          sampleRate = le32(bytes, off + 12)
          bits = le16(bytes, off + 22)
          require(channels >= 1 && sampleRate >= 1, "bad fmt fields")
          require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits")
        } else if (id == "data") { dataOff = off + 8; dataLen = sz }
        off += 8 + sz + (sz & 1) // RIFF chunks are 2-byte aligned
      }
      require(sampleRate > 0, "no fmt chunk")
      require(dataOff >= 0, "no data chunk")
      val bytesPerSample = bits / 8
      val blockAlign = bytesPerSample * channels
      val nFrames = dataLen / blockAlign
      val norm = (1 << (bits - 1)).toFloat // 128 or 32768
      // frame-averaged mono signal, normalized to [-1, 1)
      def frame(i: Int): Float = {
        var c = 0; var acc = 0.0f
        while (c < channels) {
          val o = dataOff + i * blockAlign + c * bytesPerSample
          val s = if (bits == 16) le16(bytes, o).toShort.toInt
                  else (bytes(o) & 0xff) - 128 // 8-bit WAV is unsigned
          acc += s / norm; c += 1
        }
        acc / channels
      }
      var sumSq = 0.0; var sum = 0.0; var peak = 0.0f; var zc = 0
      var prevSign = 0
      val qSumSq = new Array[Double](4)
      var i = 0
      while (i < nFrames) {
        val v = frame(i)
        sumSq += v.toDouble * v; sum += v
        if (math.abs(v) > peak) peak = math.abs(v)
        val sign = if (v > 0f) 1 else if (v < 0f) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) zc += 1
        if (sign != 0) prevSign = sign
        qSumSq(math.min(i * 4 / math.max(nFrames, 1), 3)) += v.toDouble * v
        i += 1
      }
      val n = math.max(nFrames, 1)
      // exact population of quarter q under the i*4/n bucketing:
      // i ∈ [ceil(qn/4), ceil((q+1)n/4)) — ceil, not floor, or a
      // stationary signal's "four equal quarters" invariant drifts
      // whenever n % 4 != 0
      val qn = Array.tabulate(4)(q =>
        math.max(((q + 1) * n + 3) / 4 - (q * n + 3) / 4, 1))
      val feat = Array(
        math.sqrt(sumSq / n).toFloat, peak,
        if (nFrames > 1) zc.toFloat / (nFrames - 1) else 0f,
        (sum / n).toFloat,
        math.sqrt(qSumSq(0) / qn(0)).toFloat, math.sqrt(qSumSq(1) / qn(1)).toFloat,
        math.sqrt(qSumSq(2) / qn(2)).toFloat, math.sqrt(qSumSq(3) / qn(3)).toFloat)
      (sampleRate, channels, nFrames, feat)
    }
  }

  /** Deterministic RIFF/WAVE synthesizer for the m4 gate: an
    * alternating-sign constant-amplitude 16-bit PCM square tone whose
    * every parameter is a pure function of `docId`, so an oracle can
    * recompute [[WavPcmDecoder]]'s outputs in closed form without
    * parsing a byte: rms = peak = quarter-rms = amp/32768 exactly
    * (power-of-two denominator → float-exact), zero-crossing rate = 1,
    * DC offset = 0 (frame count always even, so +amp/−amp pairs cancel
    * exactly in the decoder's double accumulator). The decoder sees
    * only the bytes — a header-parse or sample-decode bug breaks the
    * m4 hash, which is what makes the codec-trait boundary honest. */
  def synthWavPcm(docId: Long): Array[Byte] = {
    val sr = 8000 + (docId % 8).toInt * 1000
    val channels = 1 + (docId % 2).toInt
    val nFrames = 64 + 2 * (docId % 96).toInt // even, 64..254
    val amp = 256 + (docId % 1024).toInt * 16 // 256..16624 < 2^15
    val dataLen = nFrames * 2 * channels
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    buf.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
    buf.put("WAVE".getBytes(ascii))
    buf.put("fmt ".getBytes(ascii)).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sr)
    buf.putInt(sr * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    buf.put("data".getBytes(ascii)).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      val s = (if (i % 2 == 0) amp else -amp).toShort
      var c = 0
      while (c < channels) { buf.putShort(s); c += 1 }
      i += 1
    }
    buf.array()
  }

  /** A second REAL pure-JVM codec — uncompressed 24-bit BMP (BI_RGB)
    * — closing the codec-boundary generality question m4's fixed
    * 44-byte WAV prelude left open: BMP's pixel data sits at a
    * VARIABLE offset (`bfOffBits`, moved by the DIB header size — 40
    * for BITMAPINFOHEADER, 108/124 for the V4/V5 extensions — plus
    * any gap bytes), rows are padded to 4-byte stride boundaries, and
    * a negative `biHeight` flips storage to top-down. The decoder
    * must honor all three or the m5 hash breaks: it walks the
    * declared offsets, never assumes the classic 54-byte layout, and
    * normalizes row order so a logical image decodes identically
    * bottom-up or top-down.
    *
    * Features (8 floats, each a single correctly-rounded double
    * division then one float rounding — the exactness discipline that
    * lets a SQL oracle reproduce them bit-for-bit):
    * 0-2: mean R/G/B (per-channel mean / 255), 3: mean luma
    * ((R+G+B)/765 over all pixels), 4: TOP logical row mean luma,
    * 5: BOTTOM logical row mean luma (4/5 are orientation-sensitive —
    * a flipped parse swaps them), 6: max channel value / 255,
    * 7: min channel value / 255. `width`/`height` are the raster
    * dims; `n_frames` = 1.
    *
    * Malformed bytes throw IllegalArgumentException — the m4/q75
    * loud-failure contract; quarantine is the caller's policy. */
  object BmpDecoder extends Decoder {
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

    /** Shared header walk: (width, height, topDown, offBits, stride),
      * fully validated — both [[decode]] and [[rowLumaSums]] parse the
      * same declared offsets, so a header bug breaks both m5 and d27. */
    private def parseHeader(bytes: Array[Byte]): (Int, Int, Boolean, Int, Int) = {
      require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
        "not a BMP stream")
      val offBits = le32(bytes, 10)
      val biSize = le32(bytes, 14)
      require(biSize >= 40, s"unsupported DIB header size $biSize")
      val width = le32(bytes, 18)
      val heightRaw = le32(bytes, 22)
      require(width >= 1, s"bad width $width")
      val topDown = heightRaw < 0
      val height = math.abs(heightRaw)
      require(height >= 1, s"bad height $heightRaw")
      require(le16(bytes, 26) == 1, "planes must be 1")
      val bpp = le16(bytes, 28)
      require(bpp == 24, s"only 24-bit BI_RGB supported, got $bpp")
      require(le32(bytes, 30) == 0, "only uncompressed BI_RGB supported")
      require(offBits >= 14 + biSize && offBits <= bytes.length,
        s"bad bfOffBits $offBits")
      // Stride in Long: a crafted header with width > ~89M overflows
      // 24*width in Int to a NEGATIVE stride, which would sail past
      // the truncated-pixel require below and crash in the pixel loop
      // with AIOOBE instead of the documented IllegalArgumentException.
      val strideL = ((24L * width + 31L) / 32L) * 4L
      // strideL <= length first: with that bound, strideL*height <
      // 2^31 * 2^31 = 2^62 — the product itself cannot wrap Long.
      require(strideL <= bytes.length, "truncated pixel data")
      require(offBits.toLong + strideL * height <= bytes.length,
        "truncated pixel data")
      // Validated above: offBits + stride*height <= bytes.length <=
      // Int.MaxValue, so all offsets below fit in Int.
      (width, height, topDown, offBits, strideL.toInt)
    }

    /** Per-LOGICAL-row luma sums (Σ r+g+b over the row, row 0 = top of
      * image regardless of storage orientation) — the pixel-access
      * decode behind [[Multimodal.dHash60]]: same validated header
      * walk as [[decode]], same loud-failure contract. Returns
      * (width, height, rowSums). */
    def rowLumaSums(bytes: Array[Byte]): (Int, Int, Array[Long]) = {
      val (width, height, topDown, offBits, stride) = parseHeader(bytes)
      val sums = new Array[Long](height)
      var y = 0
      while (y < height) {
        val fileRow = if (topDown) y else height - 1 - y
        val rowOff = offBits + fileRow * stride
        var x = 0
        var rowLuma = 0L
        while (x < width) {
          val o = rowOff + 3 * x
          rowLuma += (bytes(o) & 0xff) + (bytes(o + 1) & 0xff) +
            (bytes(o + 2) & 0xff)
          x += 1
        }
        sums(y) = rowLuma
        y += 1
      }
      (width, height, sums)
    }

    def decode(kind: String, bytes: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      require(kind == "image", s"BmpDecoder decodes image, got $kind")
      val (width, height, topDown, offBits, stride) = parseHeader(bytes)
      var sumR = 0L; var sumG = 0L; var sumB = 0L
      var topSum = 0L; var botSum = 0L
      var mx = 0; var mn = 255
      var y = 0
      while (y < height) { // y is the LOGICAL row (0 = top of image)
        val fileRow = if (topDown) y else height - 1 - y
        val rowOff = offBits + fileRow * stride
        var x = 0
        var rowLuma = 0L
        while (x < width) {
          val o = rowOff + 3 * x
          val b = bytes(o) & 0xff
          val g = bytes(o + 1) & 0xff
          val r = bytes(o + 2) & 0xff
          sumR += r; sumG += g; sumB += b
          rowLuma += r + g + b
          if (r > mx) mx = r; if (g > mx) mx = g; if (b > mx) mx = b
          if (r < mn) mn = r; if (g < mn) mn = g; if (b < mn) mn = b
          x += 1
        }
        if (y == 0) topSum = rowLuma
        if (y == height - 1) botSum = rowLuma
        y += 1
      }
      val n = width.toLong * height
      val feat = Array(
        (sumR.toDouble / (255.0 * n)).toFloat,
        (sumG.toDouble / (255.0 * n)).toFloat,
        (sumB.toDouble / (255.0 * n)).toFloat,
        ((sumR + sumG + sumB).toDouble / (765.0 * n)).toFloat,
        (topSum.toDouble / (765.0 * width)).toFloat,
        (botSum.toDouble / (765.0 * width)).toFloat,
        (mx.toDouble / 255.0).toFloat,
        (mn.toDouble / 255.0).toFloat)
      (width, height, 1, feat)
    }
  }

  /** Deterministic BMP synthesizer for the m5 gate — every parameter
    * a pure function of `docId`, chosen to exercise exactly the
    * variable parts of the format: width 3..7 (row padding 0-3
    * bytes), DIB header size cycling 40/108/124, a 0-12 byte junk gap
    * before the pixels (bfOffBits must be honored, junk is 0xEE so a
    * misread shifts every mean), and alternating bottom-up/top-down
    * storage (odd docIds store negative height). Rows have constant
    * per-row colors R(y) = (d+7y) mod 256, G(y) = (d+85+5y) mod 256,
    * B(y) = (d+170+3y) mod 256 on LOGICAL row y — closed-form row
    * sums a SQL oracle reproduces with a range() fold, y-asymmetric
    * so an orientation bug swaps the top/bot features. */
  def synthBmp(docId: Long): Array[Byte] = {
    require(docId >= 0, s"synthBmp needs a non-negative id, got $docId")
    val w = 3 + (docId % 5).toInt
    val h = 4 + (docId % 11).toInt
    val dib = Array(40, 108, 124)((docId % 3).toInt)
    val gap = ((docId % 4) * 4).toInt
    val topDown = docId % 2 == 1
    val stride = ((24 * w + 31) / 32) * 4
    val offBits = 14 + dib + gap
    val size = offBits + stride * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(offBits)
    buf.putInt(dib).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 40 DIB bytes so far
    var junk = dib - 40 + gap
    while (junk > 0) { buf.put(0xEE.toByte); junk -= 1 }
    val dr = (docId % 256).toInt
    val dg = ((docId + 85) % 256).toInt
    val db = ((docId + 170) % 256).toInt
    var fy = 0
    while (fy < h) {
      val y = if (topDown) fy else h - 1 - fy // logical row of this file row
      val r = (dr + 7 * y) % 256
      val g = (dg + 5 * y) % 256
      val b = (db + 3 * y) % 256
      var x = 0
      while (x < w) {
        buf.put(b.toByte).put(g.toByte).put(r.toByte); x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fy += 1
    }
    buf.array()
  }

  /** 60-bit vertical difference hash (dHash, the classic
    * perceptual-hash family) over a row-luma profile: the profile is
    * resampled to a 61-point grid (nearest row `y_i = ⌊i·h/61⌋` —
    * the aspect-normalizing resize step of a real dHash) and bit i is
    * set iff `grid(i+1) > grid(i)`. Row SUMS compare identically to
    * row MEANS because every row shares the image's width, so no
    * division enters and the hash is integer-exact. 60 bits so the
    * result drops straight into
    * [[graft.operators.DedupSuite.hammingPairs]]' banding machinery
    * (4 bands × 15 bits, pigeonhole-exact at Hamming ≤ 3). */
  def dHash60(rowSums: Array[Long]): Long = {
    val h = rowSums.length
    require(h >= 1, "empty luma profile")
    var acc = 0L
    var i = 0
    while (i < 60) {
      val a = rowSums((i.toLong * h / 61).toInt)
      val b = rowSums(((i + 1).toLong * h / 61).toInt)
      if (b > a) acc |= 1L << i
      i += 1
    }
    acc
  }

  /** Real-byte-stream BMP perceptual hash: [[BmpDecoder.rowLumaSums]]
    * (validated variable-offset header walk, stride padding,
    * orientation normalization) then [[dHash60]]. */
  def bmpDHash60(bytes: Array[Byte]): Long =
    dHash60(BmpDecoder.rowLumaSums(bytes)._3)

  /** Perceptual near-duplicate PAIRS over a binary BMP column: decode
    * each blob to its dHash per-partition (embarrassingly parallel —
    * the only stage that touches pixel bytes; everything after ships
    * (id, one 8-byte long) rows), then Hamming-banded candidate
    * generation + exact xor/popcount verify via
    * [[graft.operators.DedupSuite.hammingPairs]]. Never all-pairs:
    * one shuffle on (band, 15-bit band key), hot buckets capped with
    * observed drop accounting — the d2/d12 posture, applied to the
    * multimodal column family. Output (id_a, id_b, hamming). */
  def bmpNearDups(media: DataFrame, idCol: String, bytesCol: String,
                  maxHamming: Int = 3, bands: Int = 4,
                  maxBucket: Int = 1000): DataFrame =
    graft.operators.DedupSuite.hammingPairs(
      bmpDHashes(media, idCol, bytesCol), idCol, "ph", maxHamming,
      maxBucket = maxBucket, bands = bands)

  /** The (id, ph) perceptual-hash frame [[bmpNearDups]] bands — ALSO
    * the d30 ingest family's persisted "band index": 8 bytes per image
    * (band keys derive from ph by in-plan shifts, so nothing else
    * needs storing), decoded exactly once per image; incremental folds
    * probe new batches against it via
    * [[graft.operators.DedupSuite.incrementalHammingPairs]] without
    * ever re-decoding the corpus. */
  def bmpDHashes(media: DataFrame, idCol: String,
                 bytesCol: String): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, bmpDHash60(bytes)) })
      .toDF(idCol, "ph")
  }

  /** Deterministic NEAR-DUPLICATE BMP synthesizer for the d27 gate:
    * images come in families of 8 (family = docId/8, variant =
    * docId%8) whose 60-bit perceptual [[dHash60]] is closed-form —
    *
    *   ph(docId) = F(family) XOR flips(variant)
    *
    * where F = first 15 hex chars of `md5("d27:" || family)` (60
    * pseudo-random bits both engines compute identically) and
    * flips(v) = nothing for v=0, bit `(7v) % 60` for v ≥ 1, plus bit
    * `(11v+3) % 60` for v ≥ 4 — flip positions pairwise distinct by
    * construction, giving in-family Hamming distances 1–4 (4 is
    * EXCLUDED at the gate's threshold 3 — the boundary is exercised)
    * and cross-family ≈30 (never pairs).
    *
    * The pixels REALIZE the hash rather than encode it: the 61-point
    * luma profile is a ±5 walk from 320 whose step-i direction is bit
    * i of ph (5·60 max drift keeps every luma in [20, 620] ⊂ [0,765]),
    * laid out in m-row blocks (h = 61·m, m = 1 + family%3) so the
    * decoder's grid resample must land in the right block; each luma
    * L becomes the row color (min(L,255), clamp(L−255), max(L−510,0)).
    * Layout varies per family — DIB header 40/108/124, 0–12 junk gap
    * before the pixels, bottom-up vs top-down storage, width 3–6 (row
    * padding 3..1 bytes) — so the only path to the oracle hash is an
    * honest byte-level parse: an offset, stride, orientation, or
    * resample bug scrambles the walk and breaks the d27 hash. */
  def synthBmpPerceptual(docId: Long): Array[Byte] = {
    require(docId >= 0, s"synthBmpPerceptual needs a non-negative id, got $docId")
    val fam = docId / 8
    val v = (docId % 8).toInt
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"d27:$fam".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    var ph = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (v >= 1) ph ^= 1L << ((7 * v) % 60)
    if (v >= 4) ph ^= 1L << ((11 * v + 3) % 60)
    val m = 1 + (fam % 3).toInt
    val h = 61 * m
    val w = 3 + (fam % 4).toInt
    val dib = Array(40, 108, 124)((fam % 3).toInt)
    val gap = ((fam % 4) * 4).toInt
    val topDown = fam % 2 == 1
    val lum = new Array[Int](61)
    lum(0) = 320
    var i = 0
    while (i < 60) {
      lum(i + 1) = lum(i) + (if (((ph >> i) & 1L) == 1L) 5 else -5)
      i += 1
    }
    val stride = ((24 * w + 31) / 32) * 4
    val offBits = 14 + dib + gap
    val size = offBits + stride * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(offBits)
    buf.putInt(dib).putInt(w).putInt(if (topDown) -h else h)
      .putShort(1).putShort(24).putInt(0).putInt(stride * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0) // 40 DIB bytes so far
    var junk = dib - 40 + gap
    while (junk > 0) { buf.put(0xEE.toByte); junk -= 1 }
    var fy = 0
    while (fy < h) {
      val y = if (topDown) fy else h - 1 - fy // logical row of this file row
      val l = lum(y / m)
      val r = math.min(l, 255)
      val g = math.min(math.max(l - 255, 0), 255)
      val b = math.max(l - 510, 0)
      var x = 0
      while (x < w) {
        buf.put(b.toByte).put(g.toByte).put(r.toByte); x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      fy += 1
    }
    buf.array()
  }

  /** Per-segment PCM energy sums from a real RIFF/WAVE byte stream —
    * the audio analog of [[BmpDecoder.rowLumaSums]]: the frame
    * sequence is split into `segments` contiguous runs (segment i =
    * frames [⌊i·n/segments⌋, ⌊(i+1)·n/segments⌋)) and each run sums
    * Σ s² over its RAW integer samples (channel samples summed
    * independently — integer-exact, no float normalization enters).
    * Same validated RIFF walk + loud-failure contract as
    * [[WavPcmDecoder.decode]]. Returns (sampleRate, nFrames,
    * energies). */
  def wavSegmentEnergies(bytes: Array[Byte],
                         segments: Int): (Int, Int, Array[Long]) = {
    require(segments >= 1, "need at least one segment")
    def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    def tag(b: Array[Byte], o: Int): String =
      new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
    require(bytes.length >= 44 && tag(bytes, 0) == "RIFF" &&
      tag(bytes, 8) == "WAVE", "not a RIFF/WAVE stream")
    var off = 12
    var sampleRate = 0; var channels = 0; var bits = 0
    var dataOff = -1; var dataLen = 0
    while (off + 8 <= bytes.length && (dataOff < 0 || sampleRate == 0)) {
      val id = tag(bytes, off); val sz = le32(bytes, off + 4)
      require(sz >= 0 && off.toLong + 8 + sz <= bytes.length,
        s"truncated $id chunk")
      if (id == "fmt ") {
        require(sz >= 16, "fmt chunk too short")
        require(le16(bytes, off + 8) == 1, "only PCM supported")
        channels = le16(bytes, off + 10)
        sampleRate = le32(bytes, off + 12)
        bits = le16(bytes, off + 22)
        require(channels >= 1 && sampleRate >= 1, "bad fmt fields")
        require(bits == 8 || bits == 16, s"only 8/16-bit PCM, got $bits")
      } else if (id == "data") { dataOff = off + 8; dataLen = sz }
      off += 8 + sz + (sz & 1)
    }
    require(sampleRate > 0, "no fmt chunk")
    require(dataOff >= 0, "no data chunk")
    val bytesPerSample = bits / 8
    val blockAlign = bytesPerSample * channels
    val nFrames = dataLen / blockAlign
    val energies = new Array[Long](segments)
    var i = 0
    while (i < nFrames) {
      val seg = math.min((i.toLong * segments / nFrames).toInt, segments - 1)
      var c = 0
      var acc = 0L
      while (c < channels) {
        val o = dataOff + i * blockAlign + c * bytesPerSample
        val s = if (bits == 16) le16(bytes, o).toShort.toInt
                else (bytes(o) & 0xff) - 128
        acc += s.toLong * s; c += 1
      }
      energies(seg) += acc
      i += 1
    }
    (sampleRate, nFrames, energies)
  }

  /** 60-bit audio difference hash: bit i = energy(segment i+1) >
    * energy(segment i) over the 61-segment profile — the PCM analog
    * of [[dHash60]], integer-exact (raw-sample squares, no
    * normalization), banding-ready for
    * [[graft.operators.DedupSuite.hammingPairs]]. */
  def wavDHash60(bytes: Array[Byte]): Long = {
    val (_, _, e) = wavSegmentEnergies(bytes, 61)
    var acc = 0L
    var i = 0
    while (i < 60) {
      if (e(i + 1) > e(i)) acc |= 1L << i
      i += 1
    }
    acc
  }

  /** Perceptual near-duplicate PAIRS over a binary WAV column — the
    * audio twin of [[bmpNearDups]]: per-partition decode to
    * [[wavDHash60]], then Hamming-banded candidates + exact verify.
    * Output (id_a, id_b, hamming). */
  def wavNearDups(media: DataFrame, idCol: String, bytesCol: String,
                  maxHamming: Int = 3, bands: Int = 4,
                  maxBucket: Int = 1000): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val hashes = media.select(col(idCol).cast("long"), col(bytesCol))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, wavDHash60(bytes)) })
      .toDF(idCol, "ph")
    graft.operators.DedupSuite.hammingPairs(
      hashes, idCol, "ph", maxHamming, bands, maxBucket)
  }

  /** Deterministic NEAR-DUPLICATE WAV synthesizer for the d28 gate —
    * the audio twin of [[synthBmpPerceptual]], same closed form with
    * an independent salt:
    *
    *   ph(docId) = F(family) XOR flips(variant),
    *   F = first 15 hex chars of md5("d28:" || family)
    *
    * (families of 8; flips(v) = bit (7v)%60 for v ≥ 1 plus bit
    * (11v+3)%60 for v ≥ 4 — in-family Hamming 1–4, threshold-3
    * boundary exercised). The SAMPLES realize the hash: a square
    * tone whose per-segment amplitude walks ±16 from 2000 with step
    * i's direction = bit i of ph (range [1040, 2960] ⊂ int16), laid
    * out in m-frame-per-segment blocks (61·m frames, m = 1 +
    * family%3) so the 61-segment energy resample must land in the
    * right block; sample rate and channel count vary per family.
    * Equal frame counts per segment make energy comparisons exactly
    * amplitude comparisons, so the decoder recovers ph iff its RIFF
    * walk, sample decode, and segmentation are honest. */
  def synthWavPerceptual(docId: Long): Array[Byte] = {
    require(docId >= 0, s"synthWavPerceptual needs a non-negative id, got $docId")
    val fam = docId / 8
    val v = (docId % 8).toInt
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"d28:$fam".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map("%02x".format(_)).mkString
    var ph = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    if (v >= 1) ph ^= 1L << ((7 * v) % 60)
    if (v >= 4) ph ^= 1L << ((11 * v + 3) % 60)
    val m = 1 + (fam % 3).toInt
    val nFrames = 61 * m
    val sr = 8000 + (fam % 8).toInt * 1000
    val channels = 1 + (fam % 2).toInt
    val amp = new Array[Int](61)
    amp(0) = 2000
    var i = 0
    while (i < 60) {
      amp(i + 1) = amp(i) + (if (((ph >> i) & 1L) == 1L) 16 else -16)
      i += 1
    }
    val dataLen = nFrames * 2 * channels
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    buf.put("RIFF".getBytes(ascii)).putInt(36 + dataLen)
    buf.put("WAVE".getBytes(ascii))
    buf.put("fmt ".getBytes(ascii)).putInt(16)
    buf.putShort(1).putShort(channels.toShort).putInt(sr)
    buf.putInt(sr * 2 * channels).putShort((2 * channels).toShort).putShort(16)
    buf.put("data".getBytes(ascii)).putInt(dataLen)
    var f = 0
    while (f < nFrames) {
      val a = amp(f / m)
      val s = (if (f % 2 == 0) a else -a).toShort
      var c = 0
      while (c < channels) { buf.putShort(s); c += 1 }
      f += 1
    }
    buf.array()
  }

  /** Stub decode from a pre-computed digest. */
  def decodeFromDigest(kind: String, sha: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    def u(i: Int): Int = sha(i) & 0xff
    val width = 1 + ((u(0) << 8 | u(1)) % 1024)
    val height = 1 + ((u(2) << 8 | u(3)) % 1024)
    val frames = kind match {
      case "video" => 1 + (u(4) % 240)
      case "audio" => 1 + (u(4) % 48000)
      case _ => 1
    }
    val feat = Array.tabulate(8)(i => (u(4 + i) / 255.0f) * 2f - 1f)
    (width, height, frames, feat)
  }

  /** Decode + feature-extract stage. `batchSize` is the per-call batch
    * the codec sees — the knob a real codec uses to amortize init cost,
    * identical in role to Arrow's batch size for Pandas UDFs. The
    * `decoder` is the pluggable codec ([[StubDecoder]] by default). */
  def extractFeatures(media: Dataset[MediaRecord], partitions: Int = 0,
                      batchSize: Int = 32,
                      decoder: Decoder = StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    val spread = if (partitions > 0) media.repartition(partitions, col("media_id"))
                 else media
    spread.mapPartitions { it =>
      // grouped() = the batch shape; a real impl hands each batch to the
      // codec in one call (and would reuse a per-partition codec handle).
      it.grouped(batchSize).flatMap { batch =>
        batch.map { r =>
          val bytes = Option(r.content).getOrElse(Array.emptyByteArray)
          val digest = java.security.MessageDigest.getInstance("SHA-1").digest(bytes)
          val sha = digest.map("%02x".format(_)).mkString
          val (w, h, f, feat) = decoder.decode(r.kind, bytes, digest)
          MediaFeatures(r.media_id, r.kind, bytes.length.toLong, sha, w, h, f, feat)
        }
      }
    }
  }

  /** Aspect-preserving resize plan: target raster dims fitting
    * `maxSide`, computed in integer arithmetic (metadata stage of a
    * resize — a real impl hands (w, h, new_w, new_h) to the raster
    * kernel). Upscaling is never planned: dims already inside the box
    * pass through. */
  def resizeDims(w: org.apache.spark.sql.Column, h: org.apache.spark.sql.Column,
                 maxSide: Int): org.apache.spark.sql.Column = {
    val longest = greatest(w, h)
    struct(
      when(longest <= maxSide, w)
        .otherwise(greatest((w * maxSide / longest).cast("int"), lit(1))).as("new_w"),
      when(longest <= maxSide, h)
        .otherwise(greatest((h * maxSide / longest).cast("int"), lit(1))).as("new_h"))
  }

  /** Deterministic frame sampling: `k` frame indices evenly spaced over
    * [0, nFrames) (metadata stage of a frame sampler; a real impl
    * slices the decoded frame batch at these indices). Fewer frames
    * than k → every frame once. */
  def sampleFrameIndices(nFrames: org.apache.spark.sql.Column,
                         k: Int): org.apache.spark.sql.Column =
    when(nFrames <= 0, array().cast("array<int>"))
      .otherwise(array_distinct(transform(sequence(lit(0), lit(k - 1)),
        i => (i * nFrames / k).cast("int"))))

  /** Build a synthetic media table from the `documents` fixture (text
    * bytes as the blob) — exercises the binary plumbing end-to-end
    * without real media files. */
  def mediaFromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      lit("application/octet-stream").as("mime_type"))
      .as[MediaRecord]
  }
}
