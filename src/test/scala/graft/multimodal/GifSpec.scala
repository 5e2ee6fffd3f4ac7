package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Pins the GIF89a codec two independent ways: (1) byte round-trips
  * through the engine's own decoder on adversarial pixel patterns
  * (constant, gradient, random — random defeats LZW dictionary reuse
  * and exercises code-width growth), and (2) a cross-check of the
  * ENCODER's output against the JDK's own ImageIO GIF reader — a
  * decoder this repo did not write — so an LZW width-discipline bug
  * cannot hide by being symmetric in encode and decode. Corrupt
  * streams (truncated, interlaced, bogus codes) must be rejected, not
  * mis-decoded.
  */
class GifSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, pixel: (Int, Int) => Int): Unit = {
    val bytes = Gif.encodeGray(w, h, pixel)
    val (dw, dh, rgb) = Gif.decode(bytes).getOrElse(fail("engine decode failed"))
    assert(dw === w && dh === h)
    for (y <- 0 until h; x <- 0 until w) {
      val g = pixel(x, y) & 0xff
      val i = 3 * (y * w + x)
      assert((rgb(i) & 0xff) === g && (rgb(i + 1) & 0xff) === g && (rgb(i + 2) & 0xff) === g,
        s"pixel ($x,$y)")
    }
  }

  test("round-trip: constant, gradient, and LZW-hostile random images") {
    roundTrip(18, 16, (_, _) => 137)
    roundTrip(18, 16, (x, y) => (x * 7 + y * 13) % 251)
    val rnd = new scala.util.Random(42)
    val noise = Array.fill(64 * 48)(rnd.nextInt(256))
    // 64×48 random: the dictionary grows past several width boundaries
    roundTrip(64, 48, (x, y) => noise(y * 64 + x))
  }

  test("LZW 4096-entry dictionary overflow: the clear/reset handoff round-trips, both layers") {
    // indices long and noisy enough that nextCode reaches the 12-bit
    // ceiling and the encoder must emit CLEAR and rebuild (the branch
    // the phash fixtures never reach — r11 ADVICE)
    val rnd = new scala.util.Random(1234)
    val indices = Array.fill(40000)(rnd.nextInt(256).toByte)
    // independent simulation of LZW greedy parsing proves the input
    // actually overflows the dictionary (≥1 clear fires)
    var clears = 0
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextCode = 258 // eoi + 1 for minCodeSize 8
    var prefix = indices(0) & 0xff
    indices.drop(1).foreach { b =>
      val k = b & 0xff
      dict.get((prefix, k)) match {
        case Some(c) => prefix = c
        case None =>
          if (nextCode == 4096) { clears += 1; dict = dict.empty; nextCode = 258 }
          else { dict((prefix, k)) = nextCode; nextCode += 1 }
          prefix = k
      }
    }
    assert(clears >= 1, s"fixture must overflow the dictionary (clears=$clears)")

    // raw LZW layer round-trip
    val packed = Gif.lzwEncode(indices, 8)
    val back = Gif.lzwDecode(packed, 8, indices.length).getOrElse(fail("lzwDecode failed"))
    assert(back.toSeq === indices.toSeq, "post-clear codes must decode byte-exact")

    // whole-file layer at overflow scale, plus the independent JDK reader
    val noise = Array.fill(128 * 96)(rnd.nextInt(256))
    def pix(x: Int, y: Int): Int = noise(y * 128 + x)
    roundTrip(128, 96, pix)
    val bytes = Gif.encodeGray(128, 96, pix)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth === 128 && img.getHeight === 96)
    for (y <- 0 until 96; x <- 0 until 128) {
      val g = pix(x, y) & 0xff
      val p = img.getRGB(x, y)
      assert(((p >> 16) & 0xff) === g && ((p >> 8) & 0xff) === g && (p & 0xff) === g,
        s"ImageIO pixel ($x,$y) across the clear boundary")
    }
  }

  test("encoder output decodes identically under the JDK's independent GIF reader") {
    val pixels: Seq[(Int, Int) => Int] = Seq(
      (x, y) => (x * 7 + y * 13) % 251,
      { val r = new scala.util.Random(7); val n = Array.fill(40 * 30)(r.nextInt(256));
        (x: Int, y: Int) => n(y * 40 + x) }
    )
    val sizes = Seq((18, 16), (40, 30))
    pixels.zip(sizes).foreach { case (pix, (w, h)) =>
      val bytes = Gif.encodeGray(w, h, pix)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO must accept the engine's GIF")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(x, y) & 0xff
        val p = img.getRGB(x, y)
        assert(((p >> 16) & 0xff) === g && ((p >> 8) & 0xff) === g && (p & 0xff) === g,
          s"ImageIO pixel ($x,$y)")
      }
    }
  }

  test("phash fixture: GIF round-trip hashes equal the BMP path's") {
    for (d <- Seq(0L, 7L, 49L, 123L)) {
      val viaBmp = Multimodal.phashOf(Multimodal.encodeGrayBmp(d))
      val viaGif = Multimodal.phashOf(Multimodal.encodeGrayGif(d))
      assert(viaGif === viaBmp, s"doc $d")
    }
  }

  test("corrupt GIFs are rejected, never mis-decoded") {
    val good = Gif.encodeGray(18, 16, (x, y) => (x + y) % 256)
    // truncated mid-stream
    assert(Gif.decode(java.util.Arrays.copyOf(good, good.length / 2)).isEmpty)
    // bad signature
    val sig = good.clone(); sig(0) = 'X'.toByte
    assert(Gif.decode(sig).isEmpty)
    // interlace flag set (unsupported by contract)
    val inter = good.clone()
    val idOff = 6 + 7 + 256 * 3 // header + LSD + GCT → image descriptor
    assert(inter(idOff) === 0x2c.toByte)
    inter(idOff + 9) = (inter(idOff + 9) | 0x40).toByte
    assert(Gif.decode(inter).isEmpty)
    // trailer before any image
    val noimg = good.take(idOff) ++ Array(0x3b.toByte)
    assert(Gif.decode(noimg).isEmpty)
  }
}
