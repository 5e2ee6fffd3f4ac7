package graft.multimodal

/** Pure-JVM DEFLATE (RFC 1951) decompressor — stored, fixed-Huffman and
  * dynamic-Huffman blocks — plus the zlib (RFC 1950) wrapper check.
  * This is the last piece that makes PNG payload decode end-to-end real
  * on the executor with no codec dependency: IDAT streams inflate here,
  * then [[Multimodal.decodePixels]] defilters scanlines. Written from
  * the RFCs; verified in InflateSpec against `java.util.zip.Deflater`
  * round-trips (the JDK's zlib emits all three block types, so the
  * Huffman paths are exercised by an independent implementation).
  *
  * Scale note: inflate is partition-local per-payload work inside the
  * batched decode iterator — bytes never shuffle, same contract as the
  * BMP/PPM/WAV parsers.
  */
private[multimodal] object Inflate {

  /** Inflates a raw DEFLATE stream. Throws IllegalArgumentException on
    * malformed input (callers treat that as "not this format").
    */
  def inflate(in: Array[Byte], sizeHint: Int = 1 << 12): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(math.max(64, sizeHint))
    // 32 KiB sliding window for back-references
    val win = new Array[Byte](1 << 15)
    var wpos = 0
    def emit(b: Byte): Unit = { out.write(b & 0xff); win(wpos) = b; wpos = (wpos + 1) & 0x7fff }

    var bitPos = 0 // absolute bit cursor into `in`, LSB-first per byte
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val byteIdx = bitPos >>> 3
        if (byteIdx >= in.length) throw new IllegalArgumentException("deflate: truncated")
        v |= (((in(byteIdx) >> (bitPos & 7)) & 1) << i)
        bitPos += 1
        i += 1
      }
      v
    }

    /** Canonical Huffman decoder from code lengths (RFC 1951 §3.2.2):
      * codes are assigned sequentially per length; decode walks bits
      * MSB-of-code-first (which arrive LSB-first from the stream).
      */
    final class Huff(lengths: Array[Int]) {
      private val maxLen = lengths.max
      // count[len], firstCode[len], firstSym index per length, symbols sorted by (len, sym)
      private val count = new Array[Int](maxLen + 1)
      private val firstCode = new Array[Int](maxLen + 2)
      private val firstSym = new Array[Int](maxLen + 2)
      private val syms = new Array[Int](lengths.count(_ > 0))
      locally {
        lengths.foreach(l => if (l > 0) count(l) += 1)
        var code = 0
        var si = 0
        var l = 1
        while (l <= maxLen) {
          firstCode(l) = code
          firstSym(l) = si
          var s = 0
          while (s < lengths.length) {
            if (lengths(s) == l) { syms(si) = s; si += 1 }
            s += 1
          }
          code = (code + count(l)) << 1
          l += 1
        }
      }
      def decode(): Int = {
        var code = 0
        var l = 1
        while (l <= maxLen) {
          code |= bits(1)
          if (count(l) > 0 && code - firstCode(l) < count(l))
            return syms(firstSym(l) + (code - firstCode(l)))
          code <<= 1
          l += 1
        }
        throw new IllegalArgumentException("deflate: bad Huffman code")
      }
    }

    // RFC 1951 §3.2.5 length/distance tables
    val lenBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 15, 17, 19, 23, 27, 31, 35, 43, 51, 59,
      67, 83, 99, 115, 131, 163, 195, 227, 258)
    val lenExtra = Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4,
      5, 5, 5, 5, 0)
    val distBase = Array(1, 2, 3, 4, 5, 7, 9, 13, 17, 25, 33, 49, 65, 97, 129, 193, 257, 385, 513,
      769, 1025, 1537, 2049, 3073, 4097, 6145, 8193, 12289, 16385, 24577)
    val distExtra = Array(0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6, 7, 7, 8, 8, 9, 9, 10,
      10, 11, 11, 12, 12, 13, 13)

    def inflateBlock(lit: Huff, dist: Huff): Unit = {
      var sym = lit.decode()
      while (sym != 256) {
        if (sym < 256) emit(sym.toByte)
        else {
          val li = sym - 257
          if (li >= lenBase.length) throw new IllegalArgumentException("deflate: bad length sym")
          val len = lenBase(li) + bits(lenExtra(li))
          val ds = dist.decode()
          if (ds >= distBase.length) throw new IllegalArgumentException("deflate: bad dist sym")
          val d = distBase(ds) + bits(distExtra(ds))
          if (d > out.size()) throw new IllegalArgumentException("deflate: dist before start")
          var k = 0
          while (k < len) { emit(win((wpos - d) & 0x7fff)); k += 1 }
        }
        sym = lit.decode()
      }
    }

    val fixedLit = new Huff(Array.tabulate(288) { i =>
      if (i < 144) 8 else if (i < 256) 9 else if (i < 280) 7 else 8
    })
    val fixedDist = new Huff(Array.fill(30)(5))

    var fin = false
    while (!fin) {
      fin = bits(1) == 1
      bits(2) match {
        case 0 => // stored: align to byte, LEN/NLEN, raw copy
          bitPos = (bitPos + 7) & ~7
          val p = bitPos >>> 3
          if (p + 4 > in.length) throw new IllegalArgumentException("deflate: truncated stored")
          val len = (in(p) & 0xff) | ((in(p + 1) & 0xff) << 8)
          val nlen = (in(p + 2) & 0xff) | ((in(p + 3) & 0xff) << 8)
          if ((len ^ 0xffff) != nlen) throw new IllegalArgumentException("deflate: LEN/NLEN")
          if (p + 4 + len > in.length) throw new IllegalArgumentException("deflate: truncated stored")
          var i = 0
          while (i < len) { emit(in(p + 4 + i)); i += 1 }
          bitPos = (p + 4 + len) << 3
        case 1 => inflateBlock(fixedLit, fixedDist)
        case 2 => // dynamic: code-length code, then lit/dist lengths
          val hlit = bits(5) + 257
          val hdist = bits(5) + 1
          val hclen = bits(4) + 4
          val clOrder =
            Array(16, 17, 18, 0, 8, 7, 9, 6, 10, 5, 11, 4, 12, 3, 13, 2, 14, 1, 15)
          val clLens = new Array[Int](19)
          var i = 0
          while (i < hclen) { clLens(clOrder(i)) = bits(3); i += 1 }
          val clHuff = new Huff(clLens)
          val lens = new Array[Int](hlit + hdist)
          var n = 0
          while (n < lens.length) {
            clHuff.decode() match {
              case 16 =>
                if (n == 0) throw new IllegalArgumentException("deflate: repeat at start")
                val r = 3 + bits(2)
                var k = 0
                while (k < r) { lens(n) = lens(n - 1); n += 1; k += 1 }
              case 17 => n += 3 + bits(3)
              case 18 => n += 11 + bits(7)
              case l => lens(n) = l; n += 1
            }
          }
          inflateBlock(
            new Huff(java.util.Arrays.copyOfRange(lens, 0, hlit)),
            new Huff(java.util.Arrays.copyOfRange(lens, hlit, hlit + hdist))
          )
        case _ => throw new IllegalArgumentException("deflate: reserved block type")
      }
    }
    out.toByteArray
  }

  /** Inflates a zlib (RFC 1950) stream: 2-byte header check (deflate
    * method, window ≤32K, FCHECK) + inflate + Adler-32 verification.
    */
  def zlibInflate(in: Array[Byte], sizeHint: Int = 1 << 12): Array[Byte] = {
    if (in.length < 6) throw new IllegalArgumentException("zlib: too short")
    val cmf = in(0) & 0xff
    val flg = in(1) & 0xff
    if ((cmf & 0x0f) != 8 || (cmf * 256 + flg) % 31 != 0 || (flg & 0x20) != 0)
      throw new IllegalArgumentException("zlib: bad header")
    val body = inflate(java.util.Arrays.copyOfRange(in, 2, in.length - 4), sizeHint)
    val ad = new java.util.zip.Adler32
    ad.update(body, 0, body.length)
    val n = in.length
    val expect = ((in(n - 4) & 0xffL) << 24) | ((in(n - 3) & 0xffL) << 16) |
      ((in(n - 2) & 0xffL) << 8) | (in(n - 1) & 0xffL)
    if (ad.getValue != expect) throw new IllegalArgumentException("zlib: adler mismatch")
    body
  }

  /** Wraps raw bytes in a zlib stream of STORED deflate blocks — the
    * deterministic encoder half of the engine's own PNG round-trips
    * (byte-stable across JVMs, unlike Deflater whose output may vary by
    * zlib build; decode-side, all three block types are supported).
    */
  def zlibStore(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 16 + data.length / 65535 * 5)
    out.write(0x78); out.write(0x01) // CMF/FLG: deflate, 32K window, check ok
    var off = 0
    do {
      val len = math.min(65535, data.length - off)
      val fin = off + len == data.length
      out.write(if (fin) 1 else 0)
      out.write(len & 0xff); out.write((len >> 8) & 0xff)
      out.write(~len & 0xff); out.write((~len >> 8) & 0xff)
      out.write(data, off, len)
      off += len
    } while (off < data.length)
    val ad = new java.util.zip.Adler32
    ad.update(data, 0, data.length)
    val a = ad.getValue
    out.write(((a >> 24) & 0xff).toInt); out.write(((a >> 16) & 0xff).toInt)
    out.write(((a >> 8) & 0xff).toInt); out.write((a & 0xff).toInt)
    out.toByteArray
  }
}
