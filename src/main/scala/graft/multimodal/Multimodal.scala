package graft.multimodal

import graft.Tables
import graft.functions.Portable._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted in batched partition-local
  * UDFs. The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side is real
  * and tested: the binary schema, the batched iterator shape (the Scala
  * analog of a pandas-batch UDF), partition-local execution with no
  * driver collection, and the typed output schema.
  *
  * At 100 TB: media bytes never shuffle — decode runs map-side on the
  * scan partition; only extracted features (KBs per item) flow onward.
  */
object Multimodal {

  /** One media item: opaque payload + typed metadata. */
  case class MediaItem(media_id: Long, payload: Array[Byte], mime: String, n_bytes: Long)

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(
      media_id: Long,
      mime: String,
      n_bytes: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      feature: Array[Float]
  )

  val BatchSize = 64

  /** Builds a binary media table from `documents` (payload = UTF-8 bytes
    * of the text — an opaque stand-in for image/audio payloads).
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaItem] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        $"doc_id".as("media_id"),
        $"text".cast("binary").as("payload"),
        concat(lit("application/x-fake-"), $"source").as("mime"),
        octet_length($"text").cast("long").as("n_bytes")
      )
      .as[MediaItem]
  }

  /** Real header parse: PNG IHDR or JPEG SOF0/1/2 frame dimensions when
    * the payload carries one (pure byte arithmetic — no codec needed).
    * The synthetic corpus payloads are text bytes, which never match a
    * magic number, so the oracle replays only the fallback path.
    */
  private[multimodal] def headerDims(p: Array[Byte]): Option[(Int, Int)] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    def u32(i: Int) = (u16(i).toLong << 16) | u16(i + 2)
    if (p.length >= 24 && u32(0) == 0x89504e47L && u32(4) == 0x0d0a1a0aL &&
      u32(12) == 0x49484452L) // "IHDR"
      Some((u32(16).toInt, u32(20).toInt))
    else if (p.length >= 10 && u16(0) == 0xffd8) {
      // walk JPEG segments to the first frame header: FF Cx len(2)
      // precision(1) height(2) width(2); C4/C8/CC are not frame markers
      var i = 2
      while (i + 9 <= p.length && u8(i) == 0xff) {
        // 0xFF fill bytes may pad between segments: the marker byte is
        // the first non-0xFF after the run
        while (i + 9 <= p.length && u8(i + 1) == 0xff) i += 1
        if (i + 9 > p.length) return None
        val marker = u8(i + 1)
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc)
          return Some((u16(i + 7), u16(i + 5)))
        // TEM (0x01) and RSTn/SOI/EOI (0xD0-0xD9) are standalone — no
        // 2-byte length follows; reading one would skip arbitrary bytes
        if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd9)) i += 2
        else i += 2 + u16(i + 2)
      }
      None
    } else None
  }

  /** Full pure-JVM PNG pixel decode: chunk walk (IHDR/IDAT/IEND, CRC
    * verified), zlib inflate of the IDAT stream ([[Inflate]] — stored,
    * fixed- and dynamic-Huffman deflate blocks), scanline defilter
    * (None/Sub/Up/Average/Paeth), for the non-interlaced 8-bit-depth
    * gray / truecolor / RGBA color types (alpha dropped). Returns
    * packed top-down RGB triples like the other decoders.
    */
  private[multimodal] def decodePng(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u8(i: Int) = p(i) & 0xff
    def u32(i: Int) = (u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    if (p.length < 45 || u32(0) != 0x89504e47L || u32(4) != 0x0d0a1a0aL) return None
    try {
      var w = 0; var h = 0; var colorType = -1
      val idat = new java.io.ByteArrayOutputStream()
      var i = 8
      var done = false
      while (!done && i + 12 <= p.length) {
        val len = u32(i).toInt
        if (len < 0 || i + 12 + len > p.length) return None
        val ctype = u32(i + 4)
        val crc = new java.util.zip.CRC32
        crc.update(p, i + 4, 4 + len)
        if (crc.getValue != u32(i + 8 + len)) return None
        ctype match {
          case 0x49484452L => // IHDR
            if (len != 13) return None
            w = u32(i + 8).toInt; h = u32(i + 12).toInt
            val bitDepth = u8(i + 16); colorType = u8(i + 17)
            // compression 0, filter 0, interlace 0 only; 8-bit depth only
            if (bitDepth != 8 || u8(i + 18) != 0 || u8(i + 19) != 0 || u8(i + 20) != 0) return None
            if (colorType != 0 && colorType != 2 && colorType != 6) return None
          case 0x49444154L => idat.write(p, i + 8, len) // IDAT
          case 0x49454e44L => done = true // IEND
          case _ => () // ancillary chunks skipped
        }
        i += 12 + len
      }
      if (!done || w <= 0 || h <= 0 || colorType < 0 || idat.size == 0) return None
      val ch = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
      val stride = w * ch
      val raw = Inflate.zlibInflate(idat.toByteArray, (stride + 1) * h)
      if (raw.length != (stride + 1) * h) return None
      // defilter in place into `img` (per-row filter byte stripped)
      val img = new Array[Byte](stride * h)
      var y = 0
      while (y < h) {
        val f = raw(y * (stride + 1)) & 0xff
        val src = y * (stride + 1) + 1
        val dst = y * stride
        var x = 0
        while (x < stride) {
          val a = if (x >= ch) img(dst + x - ch) & 0xff else 0 // left
          val b = if (y > 0) img(dst - stride + x) & 0xff else 0 // up
          val c = if (x >= ch && y > 0) img(dst - stride + x - ch) & 0xff else 0 // up-left
          val pred = f match {
            case 0 => 0
            case 1 => a
            case 2 => b
            case 3 => (a + b) / 2
            case 4 => // Paeth
              val pp = a + b - c
              val pa = math.abs(pp - a); val pb = math.abs(pp - b); val pc = math.abs(pp - c)
              if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            case _ => return None
          }
          img(dst + x) = ((raw(src + x) & 0xff) + pred).toByte
          x += 1
        }
        y += 1
      }
      val out = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        val s = j * ch
        if (ch == 1) { out(3 * j) = img(s); out(3 * j + 1) = img(s); out(3 * j + 2) = img(s) }
        else { out(3 * j) = img(s); out(3 * j + 1) = img(s + 1); out(3 * j + 2) = img(s + 2) }
        j += 1
      }
      Some((w, h, out))
    } catch { case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException => None }
  }

  /** Full pure-JVM pixel decode of the self-describing raster formats:
    * BMP (24/32-bit, BI_RGB, bottom-up or top-down), binary PPM (P6,
    * maxval 255) and — via [[decodePng]]/[[Inflate]] — non-interlaced
    * 8-bit PNG. Returns (width, height, packed top-down RGB triples).
    * Anything else → None (remaining compressed formats fall back to
    * header parsing + the documented stub).
    */
  private[multimodal] def decodePixels(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (p.length >= 8 && (p(0) & 0xff) == 0x89 && p(1) == 'P') return decodePng(p)
    if (p.length >= 4 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8)
      return Jpeg.decodeBaseline(p)
    if (p.length >= 6 && p(0) == 'G' && p(1) == 'I' && p(2) == 'F') return Gif.decode(p)
    def le16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int) = le16(i).toLong | (le16(i + 2).toLong << 16)
    if (p.length >= 54 && p(0) == 'B' && p(1) == 'M') {
      val dataOff = le32(10).toInt
      val w = le32(18).toInt
      val hRaw = le32(22).toInt // negative height = top-down row order
      val h = math.abs(hRaw)
      val bpp = le16(28)
      val compression = le32(30)
      if (w <= 0 || h == 0 || compression != 0 || (bpp != 24 && bpp != 32) || dataOff < 54) return None
      val bytesPp = bpp / 8
      val rowStride = ((w * bytesPp + 3) / 4) * 4 // rows pad to 4 bytes
      if (dataOff.toLong + rowStride.toLong * h > p.length) return None
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (hRaw > 0) (h - 1 - y) else y) * rowStride
        var x = 0
        while (x < w) {
          val s = srcRow + x * bytesPp // pixel order is BGR(A)
          val d = (y * w + x) * 3
          out(d) = p(s + 2)
          out(d + 1) = p(s + 1)
          out(d + 2) = p(s)
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    } else if (p.length >= 2 && p(0) == 'P' && p(1) == '6') {
      // P6 header: three ASCII ints (w, h, maxval) separated by
      // whitespace, '#' comments allowed, ONE whitespace before raster
      var i = 2
      def nextInt(): Int = {
        while (i < p.length && (p(i) == ' ' || p(i) == '\t' || p(i) == '\n' || p(i) == '\r' || p(i) == '#')) {
          if (p(i) == '#') while (i < p.length && p(i) != '\n') i += 1
          else i += 1
        }
        var v = 0
        var any = false
        while (i < p.length && p(i) >= '0' && p(i) <= '9') { v = v * 10 + (p(i) - '0'); any = true; i += 1 }
        if (any) v else -1
      }
      val w = nextInt(); val h = nextInt(); val maxval = nextInt()
      i += 1 // the single whitespace after maxval
      if (w <= 0 || h <= 0 || maxval != 255 || i.toLong + 3L * w * h > p.length) return None
      Some((w, h, java.util.Arrays.copyOfRange(p, i, i + 3 * w * h)))
    } else None
  }

  /** Real 8-dim feature vector from decoded pixels (all in [0,1]):
    * mean R/G/B, mean/min/max luma, mean |horizontal luma gradient|
    * (edge density), fraction of bright (luma > 0.5) pixels.
    */
  private[multimodal] def pixelFeatures(w: Int, h: Int, rgb: Array[Byte]): Array[Float] = {
    val n = w * h
    var sr = 0L; var sg = 0L; var sb = 0L; var sy = 0L
    var minY = 255; var maxY = 0; var bright = 0L; var grad = 0L
    var i = 0
    var prevY = -1
    while (i < n) {
      val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
      val y = (299 * r + 587 * g + 114 * b) / 1000
      sr += r; sg += g; sb += b; sy += y
      if (y < minY) minY = y
      if (y > maxY) maxY = y
      if (y > 127) bright += 1
      if (i % w != 0 && prevY >= 0) grad += math.abs(y - prevY)
      prevY = y
      i += 1
    }
    val gradDenom = math.max(1L, (w - 1).toLong * h)
    Array(
      sr.toFloat / n / 255f, sg.toFloat / n / 255f, sb.toFloat / n / 255f,
      sy.toFloat / n / 255f, minY / 255f, maxY / 255f,
      grad.toFloat / gradDenom / 255f, bright.toFloat / n
    )
  }

  /** Decoder — a REAL end-to-end decode for BMP/PPM (uncompressed),
    * PNG (chunk walk → [[Inflate]] → defilter) and baseline-sequential
    * JPEG (Huffman → dequant → IDCT → YCbCr, [[Jpeg]]) payloads
    * (pixels → real color/luma/edge features via
    * [[decodePixels]]/[[pixelFeatures]]); real header dimensions for
    * the remaining compressed frame types; and for everything else a
    * deterministic md5-derived fake stands in (the container ships no
    * media codecs beyond these pure-JVM ones). Swap the fallback for a
    * full decoder (JNI/ffmpeg/javacv) without touching the pipeline —
    * the batched partition-local plumbing is format-agnostic.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    decodePixels(payload) match {
      case Some((w, h, rgb)) => return (w, h, 1, pixelFeatures(w, h, rgb))
      case None              => ()
    }
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val h1 = java.lang.Integer.toUnsignedLong(
      ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) | ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    )
    val h2 = java.lang.Integer.toUnsignedLong(
      ((d(4) & 0xff) << 24) | ((d(5) & 0xff) << 16) | ((d(6) & 0xff) << 8) | (d(7) & 0xff)
    )
    val (width, height) = headerDims(payload).getOrElse(
      ((1 + h1 % 1920).toInt, (1 + h2 % 1080).toInt)
    )
    val nFrames = 1 + (payload.length % 300)
    val feature = Array.tabulate(8)(i => if (i < payload.length) (payload(i) & 0xff).toFloat / 255f else 0f)
    (width, height, nFrames, feature)
  }

  /** Batched partition-local feature extraction — the Scala analog of
    * `mapInPandas`: items are pulled in `BatchSize` groups (bounded
    * memory per batch, codec amortization point) and decoded inside the
    * executor.
    */
  def extractFeatures(media: Dataset[MediaItem]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        batch.iterator.map { m =>
          val (w, h, f, feat) = decodeStub(m.payload)
          MediaFeatures(m.media_id, m.mime, m.n_bytes, w, h, f, feat)
        }
      }
    }
  }

  /** Oracle-checkable projection of the batched pipeline (the fake decode
    * is md5-derived, so DuckDB can replay it bit-for-bit).
    */
  def extract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF
      .select($"media_id", $"mime", $"n_bytes", $"width".cast("long").as("width"),
        $"height".cast("long").as("height"), $"n_frames".cast("long").as("n_frames"))
      .orderBy($"media_id")
  }

  val MaxSampledFrames = 8L
  val ResizeTarget = 224L

  /** Deterministic aspect-preserving resize plan: each decoded item's
    * (width, height) maps to the largest frame fitting ResizeTarget²
    * with integer-only arithmetic (exact on both engines). The resized
    * payload stands in as a fingerprint of (payload, target dims) —
    * swap for a real scaler without touching the planning. Map-side
    * only, like the rest of the multimodal family.
    */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    extractFeatures(mediaTable(spark, dir)).toDF
      .select(
        $"media_id",
        $"width".cast("long").as("width"),
        $"height".cast("long").as("height")
      )
      .withColumn(
        "out_w",
        when($"width" >= $"height", lit(ResizeTarget))
          .otherwise(greatest(lit(1L), expr(s"(width * $ResizeTarget) div height")))
      )
      .withColumn(
        "out_h",
        when($"width" >= $"height", greatest(lit(1L), expr(s"(height * $ResizeTarget) div width")))
          .otherwise(lit(ResizeTarget))
      )
      .orderBy($"media_id")
  }

  /** Deterministic video-frame sampling: up to MaxSampledFrames frame
    * indices spread evenly over each item's n_frames (the standard
    * pre-training step that turns a video into a bounded set of frame
    * images). The "decoded frame" stands in as an md5 fingerprint of
    * (payload, frame index) — swap for a real ffmpeg frame grab without
    * touching the sampling/explode plumbing. All map-side: frame rows
    * (≤ MaxSampledFrames per item, KBs) flow on; payload bytes never
    * shuffle.
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF
      .select(
        $"media_id",
        md5($"payload").as("pm"),
        (lit(1L) + pmod($"n_bytes", lit(300L))).as("n_frames")
      )
      .withColumn("k", least($"n_frames", lit(MaxSampledFrames)))
      .select($"media_id", $"pm", $"n_frames", $"k", explode(sequence(lit(0L), $"k" - 1)).as("i"))
      .withColumn("frame_idx", expr("(i * n_frames) div k"))
      .select(
        $"media_id",
        $"frame_idx",
        md5(concat($"pm", lit("#"), $"frame_idx")).as("frame_md5"),
        $"n_frames"
      )
      .orderBy($"media_id", $"frame_idx")
  }

  /** Pure-SQL metadata pass over the binary column (no decode): sizes and
    * a payload head fingerprint — the cheap scan that routes media to the
    * right decoder at scale.
    */
  def meta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).toDF
      .select(
        $"media_id",
        $"mime",
        $"n_bytes",
        lower(hex(substring($"payload", 1, 8))).as("head_hex"),
        md5($"payload").as("payload_md5")
      )
      .orderBy($"media_id")
  }

  // ---- perceptual-hash image near-dup -----------------------------------

  /** Fixture geometry for the phash corpus: 18×16 gray images, 2×2
    * block-averaged to the classic 9×8 dHash grid (64 comparisons).
    * Pixels are a closed-form function of (doc_id, x, y) — the same
    * planted-fixture pattern as `TextAnalysis.withPlantedPii` — so the
    * oracle replays the EXPECTED hash from arithmetic while the engine
    * round-trips real BMP bytes through the production decoder. Docs
    * share one of [[PhashFamilies]] base images; every
    * [[PhashNoiseMod]]-th doc perturbs one block, which moves at most
    * 2 of the 64 dHash bits — the planted near-dup structure.
    */
  val PhashW = 18
  val PhashH = 16
  val PhashFamilies = 50L
  val PhashNoiseMod = 7L
  val PhashPixMod = 251L
  /** Pigeonhole bound for the 8×8-bit banding: pairs within hamming
    * distance ≤ 7 are guaranteed a shared band (≤7 flipped bits cannot
    * corrupt all 8 bands).
    */
  val PhashHamMax = 7L

  private[multimodal] def phashPixel(d: Long, x: Int, y: Int): Int = {
    // the gradient FREQUENCY varies per family (31 + f), not just the
    // offset: a constant offset cancels in dHash's neighbor
    // comparisons, which would make every family hash alike and turn
    // the band join into an all-pairs blowup
    val f = d % PhashFamilies
    val base = (f * 97L + (y * PhashW + x) * (31L + f)) % PhashPixMod
    val noisy = d % PhashNoiseMod == 0 && x / 2 == (d % 9).toInt && y / 2 == (d % 8).toInt
    (if (noisy) (base + 128L) % PhashPixMod else base).toInt
  }

  /** Writes a REAL 24-bit BI_RGB bottom-up BMP (padded rows, 54-byte
    * header) of the doc's synthetic gray image — the bytes then go
    * through [[decodePixels]], the same parser the extract path uses,
    * so the hash is computed from decoded pixels, not from the formula.
    */
  private[multimodal] def encodeGrayBmp(d: Long): Array[Byte] = {
    val w = PhashW; val h = PhashH
    val stride = ((w * 3 + 3) / 4) * 4
    val size = 54 + stride * h
    val b = new Array[Byte](size)
    def le16(i: Int, v: Int): Unit = { b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte }
    def le32(i: Int, v: Int): Unit = { le16(i, v & 0xffff); le16(i + 2, (v >>> 16) & 0xffff) }
    b(0) = 'B'; b(1) = 'M'
    le32(2, size); le32(10, 54); le32(14, 40); le32(18, w); le32(22, h)
    le16(26, 1); le16(28, 24); le32(30, 0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g = phashPixel(d, x, y)
        val off = 54 + (h - 1 - y) * stride + x * 3
        b(off) = g.toByte; b(off + 1) = g.toByte; b(off + 2) = g.toByte
        x += 1
      }
      y += 1
    }
    b
  }

  /** Writes a REAL PNG (8-bit grayscale, filter-0 scanlines, zlib IDAT
    * via [[Inflate.zlibStore]], CRC'd chunks) of the same synthetic
    * image as [[encodeGrayBmp]] — so the PNG round-trip (chunk walk →
    * zlib inflate → defilter) must land on the identical pixels, and
    * `mm_phash_png` shares `mm_phash`'s closed-form oracle verbatim.
    */
  private[multimodal] def encodeGrayPng(d: Long): Array[Byte] = {
    val w = PhashW; val h = PhashH
    val raw = new Array[Byte]((w + 1) * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raw(y * (w + 1) + 1 + x) = phashPixel(d, x, y).toByte; x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw.length + 128)
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte), 0, 8)
    def chunk(ctype: String, data: Array[Byte]): Unit = {
      def be32(v: Long): Array[Byte] =
        Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      out.write(be32(data.length.toLong), 0, 4)
      val tb = ctype.getBytes("US-ASCII")
      out.write(tb, 0, 4)
      out.write(data, 0, data.length)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(data)
      out.write(be32(crc.getValue), 0, 4)
    }
    val ihdr = new Array[Byte](13)
    ihdr(0) = ((w >> 24) & 0xff).toByte; ihdr(1) = ((w >> 16) & 0xff).toByte
    ihdr(2) = ((w >> 8) & 0xff).toByte; ihdr(3) = (w & 0xff).toByte
    ihdr(4) = ((h >> 24) & 0xff).toByte; ihdr(5) = ((h >> 16) & 0xff).toByte
    ihdr(6) = ((h >> 8) & 0xff).toByte; ihdr(7) = (h & 0xff).toByte
    ihdr(8) = 8 // bit depth; 9..12 = gray, compression 0, filter 0, no interlace
    chunk("IHDR", ihdr)
    chunk("IDAT", Inflate.zlibStore(raw))
    chunk("IEND", Array.empty[Byte])
    out.toByteArray
  }

  /** JPEG phash fixture — defined in the DCT COEFFICIENT domain so the
    * lossy-in-general codec is exactly lossless on it: per 8×8 block
    * only basis frequencies (0,0), (2,0), (0,2) and (4,4) are non-zero.
    * The (0,0)/(4,4) contributions are exact integers (±S/8 with S a
    * multiple of 8); the (2,0)/(0,2) contributions are t·√2·cos((2x+1)π/8)
    * — irrational, but with t, r ∈ [−3, 3] every decoded sample sits
    * ≥ 0.03 from a rounding boundary (checked exhaustively over the
    * coefficient range), twelve orders of magnitude above double
    * error, so round-half-up lands on the same integer in the engine's
    * IDCT and in the oracle's closed-form replay. The (2,0)/(0,2)
    * terms are also what keeps the dHash non-degenerate: their 2×2
    * block sums do NOT cancel (unlike any u ∈ {0,4} pattern), so the
    * hash sees real within-block texture, not just block means.
    */
  private[multimodal] def jpegCoef(d: Long, bx: Int, by: Int): (Int, Int, Int, Int) = {
    val f = d % PhashFamilies
    val a = ((f * 37 + bx * 11 + by * 23) % 97 - 48).toInt
    val t = ((f * 13 + bx * 7 + by * 5) % 7 - 3).toInt
    val r = ((f * 17 + bx * 3 + by * 19) % 7 - 3).toInt
    val e = ((f * 29 + bx * 13 + by * 7) % 13 - 6).toInt
    (a, t, r, e)
  }

  /** Unit (2,0)-basis contribution per sample: √2·cos((2x+1)π/8). */
  private[graft] val JpegZ: Array[Double] =
    Array.tabulate(8)(x => math.sqrt(2.0) * math.cos((2 * x + 1) * math.Pi / 8.0))

  /** Closed-form decoded sample: what the full Huffman→dequant→IDCT→
    * YCbCr chain must land on, pixel for pixel (the oracle replays
    * exactly this formula; see PipelineOracles.mmPhashJpeg).
    */
  private[multimodal] def phashJpegPixel(d: Long, x: Int, y: Int): Int = {
    val (a, t, r, e) = jpegCoef(d, x / 8, y / 8)
    def s4(i: Int) = if (i % 8 == 0 || i % 8 == 3 || i % 8 == 4 || i % 8 == 7) 1 else -1
    val v = 128.0 + a + t * JpegZ(x % 8) + r * JpegZ(y % 8) + s4(x) * s4(y) * e
    math.floor(v + 0.5).toInt
  }

  /** Writes a REAL baseline-sequential color JPEG (3-component 4:4:4
    * YCbCr, Annex K Huffman tables, unit quantization) of the
    * [[jpegCoef]] fixture: the Y plane carries the four-frequency
    * blocks, the chroma planes are flat (all-zero blocks → Cb=Cr=128
    * exactly → the JFIF conversion is the identity on Y). The bytes
    * then go through [[Jpeg.decodeBaseline]], the same parser the
    * extract path uses, so the hash is computed from entropy-decoded
    * IDCT output, not from the formula.
    */
  private[multimodal] def encodeGrayJpeg(d: Long): Array[Byte] =
    Jpeg.encodeBaseline(
      PhashW,
      PhashH,
      color = true,
      (bx, by) => {
        val (a, t, r, e) = jpegCoef(d, bx, by)
        val nat = new Array[Int](64)
        nat(0) = 8 * a // (v=0,u=0) DC
        nat(2) = 8 * t // (v=0,u=2): horizontal texture
        nat(16) = 8 * r // (v=2,u=0): vertical texture
        nat(36) = 8 * e // (v=4,u=4): exact ± checker term
        nat
      }
    )

  /** dHash over decoded pixels, split into two unsigned-32-bit halves
    * (bit 63 of a single BIGINT is not portable oracle arithmetic):
    * `lo` carries grid rows 0-3, `hi` rows 4-7; within a half,
    * bit (row%4)·8 + col = [sum(col+1) > sum(col)]. Block sums compare
    * equal iff means do (equal-size blocks), so everything stays in
    * exact integer arithmetic. Luma of an (r=g=b=g) pixel is g exactly
    * ((299+587+114)/1000), so the decoded-pixel hash equals the
    * closed-form replay — which is precisely what the oracle checks.
    */
  private[multimodal] def phashOf(payload: Array[Byte]): (Long, Long) = {
    val (w, h, rgb) = decodePixels(payload).getOrElse(
      throw new IllegalArgumentException("phash fixture must decode")
    )
    val bw = w / 2; val bh = h / 2
    val s = Array.ofDim[Long](bh, bw)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = y * w + x
        val r = rgb(3 * i) & 0xff; val g = rgb(3 * i + 1) & 0xff; val b = rgb(3 * i + 2) & 0xff
        s(y / 2)(x / 2) += (299 * r + 587 * g + 114 * b) / 1000
        x += 1
      }
      y += 1
    }
    var hi = 0L; var lo = 0L
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        if (s(by)(bx + 1) > s(by)(bx)) {
          if (by < 4) lo |= 1L << (by * 8 + bx)
          else hi |= 1L << ((by - 4) * 8 + bx)
        }
        bx += 1
      }
      by += 1
    }
    (hi, lo)
  }

  // not private: Janino-generated encoder code lives outside this
  // object and needs the accessors, else deserialization silently
  // falls back to the interpreted path (CompileException in logs)
  case class PhashRow(media_id: Long, ph_hi: Long, ph_lo: Long)

  private def phashFrame(
      spark: SparkSession,
      dir: String,
      encode: Long => Array[Byte] = encodeGrayBmp
  ): DataFrame = {
    import spark.implicits._
    Tables
      .documentsFanned(spark, dir)
      .select($"doc_id")
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.map { d =>
            val (hi, lo) = phashOf(encode(d))
            PhashRow(d, hi, lo)
          }
        }
      }
      .toDF
  }

  /** Registered query: per-image perceptual hash. Partition-local
    * encode → decode → hash, zero shuffles before the output sort;
    * bytes never leave the scan partition (the multimodal contract).
    */
  def phash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashFrame(spark, dir).orderBy($"media_id")
  }

  /** Registered query: identical contract to [[phash]] but the payload
    * round-trips through the engine's own PNG encoder and the FULL PNG
    * decode path — CRC'd chunk walk, zlib inflate ([[Inflate]]),
    * scanline defilter — instead of BMP, proving the dominant
    * compressed web-image format end-to-end real on the executor. The
    * pixels are identical by construction, so it shares `mm_phash`'s
    * closed-form oracle verbatim (a hash mismatch anywhere in the
    * compression stack fails the hash-check).
    */
  def phashPng(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashFrame(spark, dir, encodeGrayPng).orderBy($"media_id")
  }

  /** Registered query: same per-image hash contract, payload
    * round-tripped through the engine's own baseline-sequential COLOR
    * JPEG — Annex K Huffman entropy coding, per-component DC
    * prediction, dequantization, full 2-D IDCT, JFIF YCbCr→RGB — via
    * [[Jpeg]]. The fixture lives in the DCT coefficient domain
    * ([[jpegCoef]]) so the round-trip is exactly lossless and the
    * oracle replays the decoded pixels in closed form
    * ([[phashJpegPixel]]): a mismatch anywhere in the entropy coder,
    * the IDCT, or the color conversion fails the hash-check. Same
    * partition-local shape as [[phash]] — bytes never shuffle.
    */
  def phashJpeg(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashFrame(spark, dir, encodeGrayJpeg).orderBy($"media_id")
  }

  /** Writes a REAL GIF89a (256-gray global color table, LZW-compressed
    * indices via [[Gif]]) of the same synthetic image as
    * [[encodeGrayBmp]] — palette images are lossless under GIF, so the
    * round-trip lands on identical pixels and `mm_phash_gif` shares
    * `mm_phash`'s closed-form oracle verbatim.
    */
  private[multimodal] def encodeGrayGif(d: Long): Array[Byte] =
    Gif.encodeGray(PhashW, PhashH, (x, y) => phashPixel(d, x, y))

  /** Registered query: the [[phash]] contract through the engine's own
    * GIF89a encoder and full LZW decode path — with PNG and baseline
    * JPEG this makes all three dominant compressed web-image formats
    * end-to-end real on the executor. Same partition-local shape;
    * bytes never shuffle; a mismatch anywhere in the LZW coder, the
    * variable code widths, or the palette mapping fails the hash-check.
    */
  def phashGif(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashFrame(spark, dir, encodeGrayGif).orderBy($"media_id")
  }

  /** Registered query: image near-dup pairs — 8×8-bit pigeonhole bands
    * over the dHash generate candidates (banded equi-join, the simhash
    * shape: no all-pairs comparison at any scale), exact hamming
    * verification keeps pairs within [[PhashHamMax]]. Identical family
    * members collide at distance 0; noise-perturbed members land ≤2
    * bits away — the planted structure the spec asserts.
    */
  def phashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ph = phashFrame(spark, dir).localCheckpoint()
    val bands = ph
      .select($"media_id", $"ph_hi", $"ph_lo", explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn(
        "bv",
        expr("CASE WHEN band < 4 THEN (ph_lo >> (band * 8)) & 255 ELSE (ph_hi >> ((band - 4) * 8)) & 255 END")
      )
      .select($"media_id", $"band", $"bv")
    val cand = bands
      .as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    cand
      .join(ph.select($"media_id".as("id_a"), $"ph_hi".as("ha"), $"ph_lo".as("la")), "id_a")
      .join(ph.select($"media_id".as("id_b"), $"ph_hi".as("hb"), $"ph_lo".as("lb")), "id_b")
      .withColumn(
        "hamming",
        (bit_count($"ha".bitwiseXOR($"hb")) + bit_count($"la".bitwiseXOR($"lb"))).cast("long")
      )
      .filter($"hamming" <= PhashHamMax)
      .select($"id_a", $"id_b", $"hamming")
      .orderBy($"id_a", $"id_b")
  }

  // ---- audio: frame energy / zero-crossing over real WAV round-trips ----

  /** Audio fixture geometry: 16-bit PCM mono WAV, [[AudioRate]] Hz,
    * [[AudioSamples]] samples split into [[AudioFrames]] frames of
    * [[AudioFrameLen]]. Samples are a closed-form square wave of
    * (doc_id, i) — period 20 + d%30, amplitude 1000 + (d%50)·100 —
    * so frame energy and zero-crossing counts replay in SQL while the
    * engine computes them from bytes parsed back out of a REAL RIFF/
    * WAVE file it encoded (the same real-round-trip contract as
    * mm_phash's BMPs).
    */
  val AudioRate = 8000
  val AudioSamples = 800
  val AudioFrameLen = 160
  val AudioFrames: Int = AudioSamples / AudioFrameLen

  private[multimodal] def audioSample(d: Long, i: Int): Int = {
    val p = (20 + (d % 30)).toInt
    val a = (1000 + (d % 50) * 100).toInt
    if (i % p < p / 2) a else -a
  }

  /** Real RIFF/WAVE encode: 44-byte canonical header (PCM fmt chunk)
    * + little-endian 16-bit samples.
    */
  private[multimodal] def encodeWav(d: Long): Array[Byte] = {
    val n = AudioSamples
    val dataLen = n * 2
    val b = new Array[Byte](44 + dataLen)
    def le16(i: Int, v: Int): Unit = { b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte }
    def le32(i: Int, v: Int): Unit = { le16(i, v & 0xffff); le16(i + 2, (v >>> 16) & 0xffff) }
    def tag(i: Int, s: String): Unit = s.getBytes("US-ASCII").zipWithIndex.foreach { case (c, j) => b(i + j) = c }
    tag(0, "RIFF"); le32(4, 36 + dataLen); tag(8, "WAVE")
    tag(12, "fmt "); le32(16, 16); le16(20, 1); le16(22, 1) // PCM, mono
    le32(24, AudioRate); le32(28, AudioRate * 2); le16(32, 2); le16(34, 16)
    tag(36, "data"); le32(40, dataLen)
    var i = 0
    while (i < n) { le16(44 + 2 * i, audioSample(d, i) & 0xffff); i += 1 }
    b
  }

  /** Real WAV parse: validates RIFF/WAVE + PCM fmt, walks chunks to
    * `data`, returns the decoded 16-bit samples. None for anything
    * that is not a canonical PCM WAV.
    */
  private[multimodal] def decodeWav(p: Array[Byte]): Option[Array[Int]] = {
    def le16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
    def le32(i: Int) = le16(i).toLong | (le16(i + 2).toLong << 16)
    def tag(i: Int, s: String) = s.getBytes("US-ASCII").zipWithIndex.forall { case (c, j) => p(i + j) == c }
    if (p.length < 44 || !tag(0, "RIFF") || !tag(8, "WAVE")) return None
    var i = 12
    var fmtOk = false
    while (i + 8 <= p.length) {
      val sz = le32(i + 4).toInt
      if (tag(i, "fmt ")) fmtOk = le16(i + 8) == 1 && le16(i + 10) == 1 && le16(i + 22) == 16
      else if (tag(i, "data")) {
        if (!fmtOk || i + 8 + sz > p.length) return None
        val n = sz / 2
        val out = new Array[Int](n)
        var j = 0
        while (j < n) { out(j) = (le16(i + 8 + 2 * j) << 16) >> 16; j += 1 } // sign-extend
        return Some(out)
      }
      i += 8 + sz + (sz & 1) // RIFF chunks pad to even
    }
    None
  }

  // non-private for the same codegen-visibility reason as PhashRow
  case class AudioFrameRow(media_id: Long, frame_idx: Long, energy: Long, zcr: Long)

  /** Registered query: per-frame energy (Σ s², exact BIGINT) and
    * zero-crossing count (sign flips, the classic voiced/unvoiced and
    * silence-detection features) from samples decoded out of real WAV
    * bytes — partition-local encode → parse → feature, bytes never
    * shuffle, the multimodal contract. Closed-form oracle replay
    * proves the 16-bit LE round-trip (incl. sign extension) lossless.
    */
  def audioEnergy(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables
      .documentsFanned(spark, dir)
      .select($"doc_id")
      .as[Long]
      .mapPartitions { it =>
        it.grouped(BatchSize).flatMap { batch =>
          batch.iterator.flatMap { d =>
            val s = decodeWav(encodeWav(d)).getOrElse(
              throw new IllegalArgumentException("audio fixture must decode")
            )
            (0 until AudioFrames).iterator.map { f =>
              var energy = 0L
              var zcr = 0L
              var i = f * AudioFrameLen
              val end = i + AudioFrameLen
              while (i < end) {
                energy += s(i).toLong * s(i)
                if (i > f * AudioFrameLen && (s(i) >= 0) != (s(i - 1) >= 0)) zcr += 1
                i += 1
              }
              AudioFrameRow(d, f.toLong, energy, zcr)
            }
          }
        }
      }
      .toDF
      .orderBy($"media_id", $"frame_idx")
  }

  /** Image-clique keepers: the min-id member of every identical-phash
    * group — the image-side dedup keeper set `pipeline_multimodal`
    * composes with the text curation stages.
    */
  private[graft] def phashKeepers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    phashFrame(spark, dir)
      .groupBy($"ph_hi", $"ph_lo")
      .agg(min($"media_id").as("doc_id"))
      .select($"doc_id")
  }

  /** The SCALE path of phash dedup (mm_phash_pairs' exact pair
    * enumeration is output-bound: identical images form all-pairs
    * cliques, so its result — and cost — grows quadratically in clique
    * size; measured 34 s at sf1 vs 1.2 s at sf0.1, and a production
    * corpus has millions of exact re-posts of the same image). The
    * standard fix, same as exact-dedup-before-near-dup on text:
    * collapse identical hashes to (group keeper, copy count) FIRST —
    * one sketch-sized aggregation — then run the banded near-dup join
    * between DISTINCT hash groups only. Candidate volume now scales
    * with unique images, not total images, and the identical-image
    * blowup is gone: each clique is one row carrying its multiplicity.
    */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val groups = phashFrame(spark, dir)
      .groupBy($"ph_hi", $"ph_lo")
      .agg(min($"media_id").as("keeper_id"), count(lit(1)).as("n_copies"))
      .localCheckpoint()
    val bands = groups
      .select($"keeper_id", $"ph_hi", $"ph_lo", $"n_copies", explode(sequence(lit(0), lit(7))).as("band"))
      .withColumn(
        "bv",
        expr("CASE WHEN band < 4 THEN (ph_lo >> (band * 8)) & 255 ELSE (ph_hi >> ((band - 4) * 8)) & 255 END")
      )
      .select($"keeper_id", $"band", $"bv")
    val cand = bands
      .as("a")
      .join(bands.as("b"), col("a.band") === col("b.band") && col("a.bv") === col("b.bv") && col("a.keeper_id") < col("b.keeper_id"))
      .select(col("a.keeper_id").as("id_a"), col("b.keeper_id").as("id_b"))
      .distinct()
    cand
      .join(groups.select($"keeper_id".as("id_a"), $"ph_hi".as("ha"), $"ph_lo".as("la"), $"n_copies".as("copies_a")), "id_a")
      .join(groups.select($"keeper_id".as("id_b"), $"ph_hi".as("hb"), $"ph_lo".as("lb"), $"n_copies".as("copies_b")), "id_b")
      .withColumn(
        "hamming",
        (bit_count($"ha".bitwiseXOR($"hb")) + bit_count($"la".bitwiseXOR($"lb"))).cast("long")
      )
      .filter($"hamming" <= PhashHamMax)
      .select($"id_a", $"id_b", $"hamming", $"copies_a", $"copies_b")
      .orderBy($"id_a", $"id_b")
  }
}
