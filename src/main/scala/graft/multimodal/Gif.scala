package graft.multimodal

import scala.collection.mutable.ArrayBuffer

/** Pure-JVM GIF89a codec (encoder + decoder) for the multimodal byte
  * path — the third compressed web-image format the engine handles
  * end-to-end real, beside PNG ([[Inflate]]) and baseline JPEG
  * ([[Jpeg]]). Written from the GIF89a specification (CompuServe 1990,
  * the format is public): logical screen descriptor, 256-entry global
  * color table, image descriptor, and variable-width LZW-compressed
  * color indices in ≤255-byte sub-blocks.
  *
  * LZW width discipline (the part enc/dec must agree on exactly): the
  * DECODER widens after adding the entry that makes `nextCode` reach
  * `2^codeSize`; the ENCODER sits one dictionary addition ahead of the
  * decoder at any stream position, so it widens one addition LATER
  * (`nextCode == 2^codeSize + 1`). Verified two independent ways in
  * GifSpec: a byte round-trip through this decoder, and a cross-check
  * of the encoder's output against the JDK's own ImageIO GIF reader.
  * GIF is lossless for palette images, so the phash round-trip is
  * exact by construction.
  */
object Gif {

  private val MaxCode = 4096 // 12-bit LZW ceiling (codes 0..4095)

  private[multimodal] def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new ArrayBuffer[Byte](indices.length / 2 + 16)
    var acc = 0L
    var nbits = 0
    var codeSize = minCodeSize + 1
    def put(code: Int): Unit = {
      acc |= code.toLong << nbits
      nbits += codeSize
      while (nbits >= 8) { out += (acc & 0xff).toByte; acc >>= 8; nbits -= 8 }
    }
    var dict = scala.collection.mutable.HashMap.empty[(Int, Int), Int]
    var nextCode = eoi + 1
    put(clear)
    var prefix = indices(0) & 0xff
    var i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      dict.get((prefix, k)) match {
        case Some(c) => prefix = c
        case None =>
          put(prefix)
          if (nextCode == MaxCode) {
            put(clear)
            dict = scala.collection.mutable.HashMap.empty
            nextCode = eoi + 1
            codeSize = minCodeSize + 1
          } else {
            dict((prefix, k)) = nextCode
            nextCode += 1
            if (nextCode == (1 << codeSize) + 1 && codeSize < 12) codeSize += 1
          }
          prefix = k
      }
      i += 1
    }
    put(prefix)
    put(eoi)
    if (nbits > 0) out += (acc & 0xff).toByte
    out.toArray
  }

  /** LZW decode of concatenated sub-block data. Returns None on any
    * malformed stream (code beyond the dictionary, missing EOI with
    * exhausted input, overlong output).
    */
  private[multimodal] def lzwDecode(
      data: Array[Byte],
      minCodeSize: Int,
      expected: Int
  ): Option[Array[Byte]] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    var codeSize = minCodeSize + 1
    val out = new ArrayBuffer[Byte](expected)
    val prefixA = new Array[Int](MaxCode)
    val suffixA = new Array[Byte](MaxCode)
    var nextCode = eoi + 1
    var prev = -1
    var acc = 0L
    var nbits = 0
    var pos = 0
    def read(): Int = {
      while (nbits < codeSize) {
        if (pos >= data.length) return -1
        acc |= (data(pos) & 0xffL) << nbits
        pos += 1
        nbits += 8
      }
      val c = (acc & ((1L << codeSize) - 1)).toInt
      acc >>= codeSize
      nbits -= codeSize
      c
    }
    def firstChar(code: Int): Byte = {
      var c = code
      while (c > eoi) c = prefixA(c)
      c.toByte
    }
    def emit(code: Int): Unit = {
      var c = code
      val stack = new ArrayBuffer[Byte](8)
      while (c > eoi) { stack += suffixA(c); c = prefixA(c) }
      out += c.toByte
      var j = stack.length - 1
      while (j >= 0) { out += stack(j); j -= 1 }
    }
    var done = false
    while (!done) {
      val code = read()
      if (code < 0) return None // input exhausted before EOI
      else if (code == eoi) done = true
      else if (code == clear) {
        nextCode = eoi + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (code > nextCode) return None
      else if (prev == -1) {
        if (code >= clear) return None // first data code must be a root
        emit(code)
        prev = code
      } else {
        val first: Byte =
          if (code == nextCode) { // KwKwK: expansion(prev) + firstChar(prev)
            val f = firstChar(prev)
            emit(prev)
            out += f
            f
          } else {
            emit(code)
            firstChar(code)
          }
        if (nextCode < MaxCode) {
          prefixA(nextCode) = prev
          suffixA(nextCode) = first
          nextCode += 1
          if (nextCode == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      }
      if (out.length > expected) return None
    }
    if (out.length != expected) None else Some(out.toArray)
  }

  /** Encodes a w×h 8-bit grayscale image as a real GIF89a: 256-gray
    * global color table, one image, LZW indices = gray values.
    */
  def encodeGray(w: Int, h: Int, pixel: (Int, Int) => Int): Array[Byte] = {
    val out = new ArrayBuffer[Byte](w * h + 800)
    def u8(v: Int): Unit = out += (v & 0xff).toByte
    def le16(v: Int): Unit = { u8(v); u8(v >> 8) }
    "GIF89a".foreach(c => out += c.toByte)
    le16(w); le16(h)
    u8(0xf7) // GCT present, 8-bit color resolution, 256 entries
    u8(0); u8(0) // background index, aspect
    var g = 0
    while (g < 256) { u8(g); u8(g); u8(g); g += 1 }
    u8(0x2c) // image descriptor
    le16(0); le16(0); le16(w); le16(h)
    u8(0) // no local color table, not interlaced
    val indices = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { indices(y * w + x) = (pixel(x, y) & 0xff).toByte; x += 1 }
      y += 1
    }
    u8(8) // LZW minimum code size
    val lzw = lzwEncode(indices, 8)
    var off = 0
    while (off < lzw.length) {
      val n = math.min(255, lzw.length - off)
      u8(n)
      out ++= java.util.Arrays.copyOfRange(lzw, off, off + n)
      off += n
    }
    u8(0) // block terminator
    u8(0x3b) // trailer
    out.toArray
  }

  /** Decodes the FIRST image of a GIF87a/89a stream: header + LSD,
    * global color table, extension-block skipping, image descriptor
    * (interlace rejected — the fixture never writes it), sub-block
    * gather, LZW decode, palette mapping. Returns (w, h, packed
    * top-down RGB triples); None on any malformed structure.
    */
  def decode(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    try {
      if (p.length < 13) return None
      val sig = new String(p, 0, 6, "US-ASCII")
      if (sig != "GIF89a" && sig != "GIF87a") return None
      def le16(i: Int) = (p(i) & 0xff) | ((p(i + 1) & 0xff) << 8)
      var i = 6
      i += 4 // logical screen w/h (per-image descriptor carries the real size)
      val packed = p(i) & 0xff; i += 3 // packed, bg, aspect
      var gct: Array[Byte] = null
      if ((packed & 0x80) != 0) {
        val n = 2 << (packed & 7)
        gct = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
        i += 3 * n
      }
      while (i < p.length) {
        (p(i) & 0xff) match {
          case 0x21 => // extension: label + sub-blocks
            i += 2
            while ((p(i) & 0xff) != 0) i += 1 + (p(i) & 0xff)
            i += 1
          case 0x2c =>
            val w = le16(i + 5); val h = le16(i + 7)
            val ipacked = p(i + 9) & 0xff
            i += 10
            if ((ipacked & 0x40) != 0) return None // interlace unsupported
            var table = gct
            if ((ipacked & 0x80) != 0) {
              val n = 2 << (ipacked & 7)
              table = java.util.Arrays.copyOfRange(p, i, i + 3 * n)
              i += 3 * n
            }
            if (table == null || w <= 0 || h <= 0) return None
            val minCodeSize = p(i) & 0xff; i += 1
            if (minCodeSize < 2 || minCodeSize > 11) return None
            val data = new ArrayBuffer[Byte](w * h)
            while ((p(i) & 0xff) != 0) {
              val n = p(i) & 0xff
              data ++= java.util.Arrays.copyOfRange(p, i + 1, i + 1 + n)
              i += 1 + n
            }
            val idx = lzwDecode(data.toArray, minCodeSize, w * h).getOrElse(return None)
            val ncolors = table.length / 3
            val rgb = new Array[Byte](3 * w * h)
            var j = 0
            while (j < w * h) {
              val c = idx(j) & 0xff
              if (c >= ncolors) return None
              rgb(3 * j) = table(3 * c)
              rgb(3 * j + 1) = table(3 * c + 1)
              rgb(3 * j + 2) = table(3 * c + 2)
              j += 1
            }
            return Some((w, h, rgb))
          case 0x3b => return None // trailer before any image
          case _ => return None
        }
      }
      None
    } catch {
      case _: ArrayIndexOutOfBoundsException => None
    }
  }
}
