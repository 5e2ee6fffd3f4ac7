package graft.multimodal

import graft.GraftSession
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the perceptual-hash pipeline end to end: the BMP byte
  * round-trip (encode → production decoder → pixels identical to the
  * closed form), the dHash arithmetic against an independent scalar
  * re-derivation, the planted near-dup structure (same-family docs
  * within 4 bits, noise moves ≤2 bits), and the pigeonhole recall
  * guarantee of the 8×8-bit banding at the registered threshold.
  */
class PhashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = GraftSession.local(4, "mm-phash")
  private val dir = "/root/testdata/sf0.001"

  test("encoded BMP decodes back to the closed-form pixels") {
    for (d <- Seq(0L, 1L, 7L, 49L, 123L)) {
      val Some((w, h, rgb)) = Multimodal.decodePixels(Multimodal.encodeGrayBmp(d))
      assert(w === Multimodal.PhashW && h === Multimodal.PhashH)
      for (y <- 0 until h; x <- 0 until w) {
        val i = 3 * (y * w + x)
        val want = Multimodal.phashPixel(d, x, y)
        assert((rgb(i) & 0xff) === want, s"d=$d ($x,$y) r")
        assert((rgb(i + 1) & 0xff) === want, s"d=$d ($x,$y) g")
        assert((rgb(i + 2) & 0xff) === want, s"d=$d ($x,$y) b")
      }
    }
  }

  /** Independent scalar dHash from the formula (no BMP, no decoder). */
  private def refPhash(d: Long): (Long, Long) = {
    val bw = Multimodal.PhashW / 2
    val s = Array.ofDim[Long](Multimodal.PhashH / 2, bw)
    for (y <- 0 until Multimodal.PhashH; x <- 0 until Multimodal.PhashW)
      s(y / 2)(x / 2) += Multimodal.phashPixel(d, x, y)
    var hi = 0L; var lo = 0L
    for (by <- 0 until 8; bx <- 0 until 8)
      if (s(by)(bx + 1) > s(by)(bx)) {
        if (by < 4) lo |= 1L << (by * 8 + bx) else hi |= 1L << ((by - 4) * 8 + bx)
      }
    (hi, lo)
  }

  test("decoded-byte dHash equals the closed-form dHash for every doc") {
    import spark.implicits._
    val got = Multimodal
      .phash(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (d, (hi, lo)) =>
      assert((hi, lo) === refPhash(d), s"doc $d")
      assert(hi >= 0L && hi < (1L << 32) && lo >= 0L && lo < (1L << 32), s"doc $d halves unsigned-32")
    }
  }

  test("encoded PNG decodes back to the closed-form pixels through the full chunk/zlib/defilter path") {
    for (d <- Seq(0L, 1L, 7L, 49L, 123L)) {
      val png = Multimodal.encodeGrayPng(d)
      // goes through decodePng: signature, CRC'd chunks, zlib inflate,
      // scanline defilter — not the BMP/PPM fast paths
      val Some((w, h, rgb)) = Multimodal.decodePixels(png)
      assert(w === Multimodal.PhashW && h === Multimodal.PhashH)
      for (y <- 0 until h; x <- 0 until w) {
        val want = Multimodal.phashPixel(d, x, y)
        assert((rgb(3 * (y * w + x)) & 0xff) === want, s"d=$d ($x,$y)")
      }
      // headerDims agrees with the decoded dims on the same bytes
      assert(Multimodal.headerDims(png) === Some((w, h)))
    }
  }

  test("PNG with Deflater-compressed IDAT and non-zero filters decodes identically") {
    // Re-encode doc 3's image as a real-world PNG: dynamic-Huffman zlib
    // (JDK Deflater) + per-row Sub/Up/Average/Paeth filters — the shape
    // a production PNG writer emits, none of it produced by our encoder.
    val d = 3L
    val w = Multimodal.PhashW; val h = Multimodal.PhashH
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      val filter = y % 5 // cycle through every filter type
      raw(y * (w + 1)) = filter.toByte
      for (x <- 0 until w) {
        val cur = Multimodal.phashPixel(d, x, y)
        val left = if (x > 0) Multimodal.phashPixel(d, x - 1, y) else 0
        val up = if (y > 0) Multimodal.phashPixel(d, x, y - 1) else 0
        val ul = if (x > 0 && y > 0) Multimodal.phashPixel(d, x - 1, y - 1) else 0
        val pred = filter match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
        }
        raw(y * (w + 1) + 1 + x) = (cur - pred).toByte
      }
    }
    val defl = new java.util.zip.Deflater(9, false)
    defl.setInput(raw); defl.finish()
    val zOut = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!defl.finished()) zOut.write(buf, 0, defl.deflate(buf))
    defl.end()
    // splice the compressed IDAT into our own chunk framing
    val tmpl = Multimodal.encodeGrayPng(d)
    val out = new java.io.ByteArrayOutputStream()
    out.write(tmpl, 0, 8 + 12 + 13) // signature + IHDR
    val idat = zOut.toByteArray
    def be32(v: Long): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    out.write(be32(idat.length.toLong), 0, 4)
    out.write("IDAT".getBytes("US-ASCII"), 0, 4)
    out.write(idat, 0, idat.length)
    val crc = new java.util.zip.CRC32
    crc.update("IDAT".getBytes("US-ASCII")); crc.update(idat)
    out.write(be32(crc.getValue), 0, 4)
    out.write(be32(0L), 0, 4)
    out.write("IEND".getBytes("US-ASCII"), 0, 4)
    val crce = new java.util.zip.CRC32; crce.update("IEND".getBytes("US-ASCII"))
    out.write(be32(crce.getValue), 0, 4)
    val Some((gw, gh, rgb)) = Multimodal.decodePng(out.toByteArray)
    assert(gw === w && gh === h)
    for (y <- 0 until h; x <- 0 until w)
      assert((rgb(3 * (y * w + x)) & 0xff) === Multimodal.phashPixel(d, x, y), s"($x,$y)")
  }

  test("corrupt PNGs are rejected, not mis-decoded") {
    val png = Multimodal.encodeGrayPng(5L)
    val badCrc = png.clone(); badCrc(badCrc.length - 5) = (badCrc(badCrc.length - 5) ^ 1).toByte
    assert(Multimodal.decodePng(badCrc).isEmpty) // IEND CRC damage
    val flippedIdat = png.clone(); flippedIdat(8 + 25 + 8 + 10) = (flippedIdat(8 + 25 + 8 + 10) ^ 0x7f).toByte
    assert(Multimodal.decodePng(flippedIdat).isEmpty) // chunk CRC catches payload damage
    assert(Multimodal.decodePng(png.take(40)).isEmpty)
    assert(Multimodal.decodePng(Multimodal.encodeGrayBmp(5L)).isEmpty)
  }

  test("encoded color JPEG decodes back to the closed-form pixels through Huffman/IDCT/YCbCr") {
    for (d <- Seq(0L, 1L, 7L, 13L, 49L, 123L, 250L)) {
      val bytes = Multimodal.encodeGrayJpeg(d)
      // real interchange stream: SOI + JFIF APP0 + EOI framing
      assert((bytes(0) & 0xff) === 0xff && (bytes(1) & 0xff) === 0xd8)
      assert((bytes(bytes.length - 2) & 0xff) === 0xff && (bytes(bytes.length - 1) & 0xff) === 0xd9)
      val Some((w, h, rgb)) = Multimodal.decodePixels(bytes)
      assert(w === Multimodal.PhashW && h === Multimodal.PhashH)
      for (y <- 0 until h; x <- 0 until w) {
        val i = 3 * (y * w + x)
        val want = Multimodal.phashJpegPixel(d, x, y)
        assert((rgb(i) & 0xff) === want, s"d=$d ($x,$y) r")
        assert((rgb(i + 1) & 0xff) === want, s"d=$d ($x,$y) g")
        assert((rgb(i + 2) & 0xff) === want, s"d=$d ($x,$y) b")
      }
    }
  }

  test("JPEG restart markers (DRI/RSTn) decode identically to the unsegmented stream") {
    for (d <- Seq(3L, 42L); ri <- Seq(1, 2, 5)) {
      def coefs(bx: Int, by: Int): Array[Int] = {
        val (a, t, r, e) = Multimodal.jpegCoef(d, bx, by)
        val nat = new Array[Int](64)
        nat(0) = 8 * a; nat(2) = 8 * t; nat(16) = 8 * r; nat(36) = 8 * e
        nat
      }
      val plain = Jpeg.decodeBaseline(
        Jpeg.encodeBaseline(Multimodal.PhashW, Multimodal.PhashH, color = true, coefs)
      )
      val rst = Jpeg.decodeBaseline(
        Jpeg.encodeBaseline(Multimodal.PhashW, Multimodal.PhashH, color = true, coefs, ri)
      )
      assert(plain.isDefined && rst.isDefined)
      assert(plain.get._3.toSeq === rst.get._3.toSeq, s"d=$d ri=$ri")
    }
  }

  test("corrupt JPEGs are rejected, not mis-decoded") {
    val jpg = Multimodal.encodeGrayJpeg(5L)
    assert(Jpeg.decodeBaseline(jpg.take(30)).isEmpty) // truncated in headers
    assert(Jpeg.decodeBaseline(jpg.dropRight(40)).isEmpty) // truncated entropy data
    val noSoi = jpg.clone(); noSoi(1) = 0x00
    assert(Jpeg.decodeBaseline(noSoi).isEmpty)
    // flip SOF0 -> SOF2 (progressive): must refuse, not garble
    val sofAt = jpg.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sofAt > 0)
    val prog = jpg.clone(); prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeBaseline(prog).isEmpty)
    // stomp the scan data with an invalid marker mid-stream
    val sosAt = jpg.indexOfSlice(Seq(0xff.toByte, 0xda.toByte))
    val stomped = jpg.clone()
    stomped(sosAt + 20) = 0xff.toByte; stomped(sosAt + 21) = 0xc0.toByte
    assert(Jpeg.decodeBaseline(stomped).isEmpty)
    // a BMP payload is not a JPEG
    assert(Jpeg.decodeBaseline(Multimodal.encodeGrayBmp(5L)).isEmpty)
  }

  test("phashPng equals phash: the PNG and BMP round-trips land on identical hashes") {
    val bmp = Multimodal.phash(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val png = Multimodal.phashPng(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(bmp.nonEmpty)
    assert(bmp.toSeq === png.toSeq)
  }

  test("planted structure: noise-free family members hash identically; noise moves <= 2 bits") {
    val fam = collection.mutable.Map.empty[Long, (Long, Long)]
    for (d <- 0L until 200L) {
      val p = refPhash(d)
      if (d % Multimodal.PhashNoiseMod != 0) {
        fam.get(d % Multimodal.PhashFamilies) match {
          case Some(q) => assert(p === q, s"clean family member $d drifted")
          case None    => fam(d % Multimodal.PhashFamilies) = p
        }
      }
    }
    for (d <- 0L until 200L if d % Multimodal.PhashNoiseMod == 0) {
      fam.get(d % Multimodal.PhashFamilies).foreach { case (hi, lo) =>
        val (nhi, nlo) = refPhash(d)
        val ham = java.lang.Long.bitCount(hi ^ nhi) + java.lang.Long.bitCount(lo ^ nlo)
        assert(ham <= 2, s"noisy doc $d moved $ham bits")
      }
    }
  }

  test("collapsed dedup groups reconstruct the full pair set; candidate volume is clique-free") {
    import spark.implicits._
    val hashes = Multimodal
      .phash(spark, dir)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
    val byHash = hashes.groupBy(_._2).map { case (h, xs) => h -> xs.map(_._1).sorted }
    val groupPairs = Multimodal
      .phashDedup(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // copy counts match the clique sizes
    val keeperToHash = byHash.map { case (h, ids) => ids.head -> h }
    groupPairs.foreach { case (a, b, _, ca, cb) =>
      assert(byHash(keeperToHash(a)).length.toLong === ca, s"copies_a of $a")
      assert(byHash(keeperToHash(b)).length.toLong === cb, s"copies_b of $b")
    }
    // expanding group pairs (cross products) + within-clique all-pairs
    // (hamming 0) reproduces EXACTLY the mm_phash_pairs result
    val expanded = collection.mutable.Set.empty[(Long, Long, Long)]
    groupPairs.foreach { case (a, b, ham, _, _) =>
      for (x <- byHash(keeperToHash(a)); y <- byHash(keeperToHash(b)))
        expanded += ((math.min(x, y), math.max(x, y), ham))
    }
    byHash.values.foreach { ids =>
      for (i <- ids.indices; j <- (i + 1) until ids.length)
        expanded += ((ids(i), ids(j), 0L))
    }
    val full = Multimodal
      .phashPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(expanded.toSet === full)
    // the collapse is the point: group-level pair count must be far
    // below the exact enumeration (cliques contribute one row, not n²)
    assert(groupPairs.length < full.size, s"${groupPairs.length} vs ${full.size}")
  }

  test("WAV round-trip: encoded samples parse back exactly, including negative sign extension") {
    for (d <- Seq(0L, 3L, 29L, 57L, 123L)) {
      val got = Multimodal.decodeWav(Multimodal.encodeWav(d))
      assert(got.isDefined, s"doc $d must decode")
      val s = got.get
      assert(s.length === Multimodal.AudioSamples)
      for (i <- s.indices)
        assert(s(i) === Multimodal.audioSample(d, i), s"doc $d sample $i")
      assert(s.exists(_ < 0), "square wave must swing negative")
    }
    // malformed inputs are rejected, not misparsed
    assert(Multimodal.decodeWav("RIFFxxxxWAVE".getBytes).isEmpty)
    assert(Multimodal.decodeWav(Multimodal.encodeGrayBmp(1L)).isEmpty)
    val truncated = Multimodal.encodeWav(1L).take(50)
    assert(Multimodal.decodeWav(truncated).isEmpty)
  }

  test("audio frame features: engine frames equal an independent scalar derivation") {
    import spark.implicits._
    val rows = Multimodal
      .audioEnergy(spark, dir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(rows.nonEmpty)
    val docs = rows.keys.map(_._1).toSeq.distinct
    assert(rows.size === docs.size * Multimodal.AudioFrames)
    for (d <- docs.take(20); f <- 0 until Multimodal.AudioFrames) {
      var energy = 0L; var zcr = 0L
      for (i <- (f * Multimodal.AudioFrameLen) until ((f + 1) * Multimodal.AudioFrameLen)) {
        val v = Multimodal.audioSample(d, i)
        energy += v.toLong * v
        if (i > f * Multimodal.AudioFrameLen) {
          val pv = Multimodal.audioSample(d, i - 1)
          if ((v >= 0) != (pv >= 0)) zcr += 1
        }
      }
      assert(rows((d, f.toLong)) === ((energy, zcr)), s"doc $d frame $f")
      assert(zcr > 0, "a square wave frame always crosses zero")
    }
  }

  test("banded pairs = exact all-pairs within the hamming threshold (pigeonhole recall)") {
    import spark.implicits._
    val got = Multimodal
      .phashPairs(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    val hashes = Multimodal
      .phash(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (for {
      (a, ahi, alo) <- hashes
      (b, bhi, blo) <- hashes
      if a < b
      ham = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
      if ham <= Multimodal.PhashHamMax
    } yield (a, b, ham.toLong)).toSet
    assert(got === want)
    assert(want.nonEmpty, "fixture must plant at least one near-dup pair")
  }
}
