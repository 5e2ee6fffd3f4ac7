package graft.multimodal

/** Pure-JVM baseline-sequential JPEG (ITU T.81) — the last compressed
  * web-image format on the executor decode path, after PNG
  * ([[Inflate]]). The decoder is a general SOF0 implementation for
  * 1-component (grayscale) and 3-component 4:4:4 (YCbCr) interleaved
  * scans: marker walk (DQT/DHT/SOF0/DRI/SOS), canonical Huffman
  * decoding built from the DHT segments in the stream (T.81 F.2.2.3
  * mincode/maxcode/valptr), per-component DC prediction, AC
  * run-length/ZRL/EOB, byte-unstuffing and restart markers,
  * dequantization, de-zigzag, a full separable 2-D IDCT per block, and
  * the JFIF YCbCr→RGB conversion. The encoder writes real
  * interchange-format streams (SOI/APP0/DQT/SOF0/DHT/SOS/EOI) with the
  * T.81 Annex K typical luminance Huffman tables, entropy-coding
  * caller-supplied quantized luma coefficient blocks (chroma planes are
  * flat — all-zero blocks). Coefficient-domain input is what lets the
  * `mm_phash_jpeg` fixture be exactly round-trippable (see
  * [[Multimodal.phashJpegPixel]]) while the decode still exercises
  * every stage a camera JPEG would: Huffman-coded DCT coefficients,
  * IDCT, and the color conversion.
  *
  * Like the PNG path, nothing here touches Spark: encode/decode run
  * partition-local inside the batched extract/phash iterators, so
  * media bytes never shuffle.
  */
object Jpeg {

  /** Zigzag scan order → natural (row-major v*8+u) coefficient index. */
  val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5, 12, 19, 26, 33, 40, 48,
    41, 34, 27, 20, 13, 6, 7, 14, 21, 28, 35, 42, 49, 56, 57, 50, 43, 36, 29, 22,
    15, 23, 30, 37, 44, 51, 58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55,
    62, 63
  )

  /** T.81 Annex K.3.3.1: typical luminance DC table (bits, values).
    * Shared by the chroma components too (legal — the scan header binds
    * tables per component, and flat chroma only ever codes DC-0 + EOB).
    */
  val DcLumBits: Array[Int] = Array(0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  val DcLumVals: Array[Int] = (0 to 11).toArray

  /** T.81 Annex K.3.3.2: typical luminance AC table (bits, values). */
  val AcLumBits: Array[Int] = Array(0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  val AcLumVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13,
    0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42,
    0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a,
    0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2a, 0x34, 0x35,
    0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4a,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67,
    0x68, 0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84,
    0x85, 0x86, 0x87, 0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3,
    0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7,
    0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa
  )

  /** Canonical code assignment (T.81 Annex C): (codeBySymbol, lenBySymbol). */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Int]): (Array[Int], Array[Int]) = {
    val code = new Array[Int](256)
    val len = new Array[Int](256)
    var c = 0
    var k = 0
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l)) {
        code(vals(k)) = c
        len(vals(k)) = l
        c += 1; k += 1; i += 1
      }
      c <<= 1
      l += 1
    }
    (code, len)
  }

  /** IDCT basis: Ct(u)(x) = c(u)·cos((2x+1)uπ/16), c(0)=1/√2. */
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    (if (u == 0) 1.0 / math.sqrt(2.0) else 1.0) * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Full 2-D IDCT of one dequantized block (natural order), into
    * clamped 0–255 samples (level shift +128, round half up).
    * Separable: rows then columns, doubles throughout.
    */
  private def idctBlock(s: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Ct(u)(x) * s(v * 8 + u); u += 1 }
        tmp(v * 8 + x) = acc
        x += 1
      }
      v += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var vv = 0
        while (vv < 8) { acc += Ct(vv)(y) * tmp(vv * 8 + x); vv += 1 }
        val p = math.floor(acc / 4.0 + 128.0 + 0.5).toInt
        out(y * 8 + x) = if (p < 0) 0 else if (p > 255) 255 else p
        x += 1
      }
      y += 1
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      acc = (acc << len) | (code & ((1 << len) - 1))
      nbits += len
      while (nbits >= 8) {
        val b = (acc >>> (nbits - 8)) & 0xff
        out.write(b)
        if (b == 0xff) out.write(0x00) // byte stuffing
        nbits -= 8
      }
    }
    def flush(): Unit = if (nbits > 0) put(0x7f, 8 - nbits) // 1-fill pad
  }

  /** Magnitude category (bit length of |v|); 0 for v = 0. */
  private def category(v: Int): Int = 32 - Integer.numberOfLeadingZeros(math.abs(v))

  /** Encode a baseline-sequential JPEG from quantized luma DCT
    * coefficient blocks. `coef(bx, by)` returns the Y block's 64
    * coefficients in NATURAL order; the quantization table is all ones
    * (coefficients are stored verbatim), which is what makes a
    * coefficient-domain fixture exactly recoverable. With
    * `color = true` the stream is a 3-component 4:4:4 interleaved YCbCr
    * scan whose chroma blocks are all zero — Cb = Cr = 128 exactly
    * after decode, so the JFIF color conversion is the identity on Y
    * and the full color path stays losslessly replayable. Blocks cover
    * ceil(w/8) × ceil(h/8); the decoder crops to w×h.
    */
  def encodeBaseline(
      w: Int,
      h: Int,
      color: Boolean,
      coef: (Int, Int) => Array[Int],
      restartInterval: Int = 0
  ): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff && restartInterval >= 0)
    val nComp = if (color) 3 else 1
    val out = new java.io.ByteArrayOutputStream(1024)
    def u8(v: Int): Unit = out.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xe0); u16(16) // APP0 JFIF
    "JFIF".getBytes("US-ASCII").foreach(b => u8(b)); u8(0)
    u8(1); u8(1); u8(0); u16(1); u16(1); u8(0); u8(0)
    marker(0xdb); u16(2 + 1 + 64); u8(0x00) // DQT: 8-bit table 0
    (0 until 64).foreach(_ => u8(1)) // unit quantization
    marker(0xc0); u16(2 + 6 + 3 * nComp) // SOF0
    u8(8); u16(h); u16(w); u8(nComp) // precision, dims, components
    var ci = 1
    while (ci <= nComp) { u8(ci); u8(0x11); u8(0); ci += 1 } // 1x1, qtable 0
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Unit = {
      marker(0xc4); u16(2 + 1 + 16 + vals.length)
      u8(cls << 4)
      (1 to 16).foreach(l => u8(bits(l)))
      vals.foreach(u8)
    }
    dht(0, DcLumBits, DcLumVals)
    dht(1, AcLumBits, AcLumVals)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) } // DRI
    marker(0xda); u16(2 + 1 + 2 * nComp + 3) // SOS
    u8(nComp)
    ci = 1
    while (ci <= nComp) { u8(ci); u8(0x00); ci += 1 } // DC 0 / AC 0
    u8(0); u8(63); u8(0) // Ss, Se, AhAl
    val (dcCode, dcLen) = buildEncodeTable(DcLumBits, DcLumVals)
    val (acCode, acLen) = buildEncodeTable(AcLumBits, AcLumVals)
    val bw = new BitWriter(out)
    def putMagnitude(v: Int, s: Int): Unit =
      if (s > 0) bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
    def putBlock(nat: Array[Int], pred: Int): Int = {
      val dc = nat(0)
      val diff = dc - pred
      val s = category(diff)
      bw.put(dcCode(s), dcLen(s))
      putMagnitude(diff, s)
      var run = 0
      var k = 1
      while (k < 64) {
        val v = nat(Zigzag(k))
        if (v == 0) run += 1
        else {
          while (run > 15) { bw.put(acCode(0xf0), acLen(0xf0)); run -= 16 } // ZRL
          val sz = category(v)
          bw.put(acCode((run << 4) | sz), acLen((run << 4) | sz))
          putMagnitude(v, sz)
          run = 0
        }
        k += 1
      }
      if (run > 0) bw.put(acCode(0x00), acLen(0x00)) // EOB
      dc
    }
    val zeroBlock = new Array[Int](64)
    val bxN = (w + 7) / 8
    val byN = (h + 7) / 8
    val pred = new Array[Int](3)
    var mcuDone = 0
    var by = 0
    while (by < byN) {
      var bx = 0
      while (bx < bxN) {
        if (restartInterval > 0 && mcuDone > 0 && mcuDone % restartInterval == 0) {
          bw.flush() // 1-pad to byte boundary, then RSTn (cyclic 0-7)
          marker(0xd0 + (mcuDone / restartInterval - 1) % 8)
          pred(0) = 0; pred(1) = 0; pred(2) = 0
        }
        val nat = coef(bx, by)
        require(nat.length == 64)
        pred(0) = putBlock(nat, pred(0))
        if (color) {
          pred(1) = putBlock(zeroBlock, pred(1))
          pred(2) = putBlock(zeroBlock, pred(2))
        }
        mcuDone += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Canonical Huffman decode table (T.81 F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l) == 0) maxCode(l) = -1
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l); k += bits(l)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(l: Int, code: Int): Int = vals(valPtr(l) + code - minCode(l))
  }

  private final class Fail extends RuntimeException

  /** Entropy-segment bit reader: MSB-first, 0xFF00 unstuffing, RSTn
    * surfaced to [[restart]], any other marker mid-stream is an error.
    */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    private var atMarker: Int = -1 // set when a non-stuffing marker is hit
    private def fill(): Unit = {
      if (atMarker >= 0 || pos >= p.length) throw new Fail
      val b = p(pos) & 0xff
      pos += 1
      if (b == 0xff) {
        if (pos >= p.length) throw new Fail
        val m = p(pos) & 0xff
        if (m == 0x00) pos += 1
        else { atMarker = m; pos += 1; throw new Fail }
      }
      acc = (acc << 8) | b
      nbits += 8
    }
    def bit(): Int = {
      if (nbits == 0) fill()
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l)) return t.value(l, code)
        code = (code << 1) | bit()
        l += 1
      }
      throw new Fail
    }
    /** Byte-align and consume an expected RSTn marker. */
    def restart(): Unit = {
      nbits = 0
      if (atMarker < 0) {
        if (pos + 1 >= p.length || (p(pos) & 0xff) != 0xff) throw new Fail
        atMarker = p(pos + 1) & 0xff
        pos += 2
      }
      if (atMarker < 0xd0 || atMarker > 0xd7) throw new Fail
      atMarker = -1
    }
  }

  /** Extend a magnitude-category value to its signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Decode a baseline-sequential JPEG: 1-component grayscale or
    * 3-component 4:4:4 interleaved YCbCr (JFIF conversion to RGB).
    * Returns (width, height, packed top-down RGB triples) like the
    * other decoders. None on anything that is not well-formed baseline:
    * bad SOI, truncated segments, invalid Huffman codes, missing
    * tables, subsampled/progressive/hierarchical/arithmetic frames.
    */
  def decodeBaseline(p: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    def u8(i: Int) = p(i) & 0xff
    def u16(i: Int) = (u8(i) << 8) | u8(i + 1)
    if (p.length < 4 || u16(0) != 0xffd8) return None
    try {
      val qt = Array.ofDim[Int](4, 64) // by table id, zigzag order
      val qtSeen = new Array[Boolean](4)
      val dcT = new Array[HuffTable](4)
      val acT = new Array[HuffTable](4)
      var w = -1; var h = -1
      var nComp = 0
      val compQ = new Array[Int](3) // quant table id per component
      val compDc = new Array[Int](3) // scan: DC table id per component
      val compAc = new Array[Int](3)
      var restartInterval = 0
      var i = 2
      var sos = -1
      while (sos < 0) {
        if (i + 4 > p.length || u8(i) != 0xff) throw new Fail
        var m = u8(i + 1)
        while (m == 0xff) { i += 1; if (i + 4 > p.length) throw new Fail; m = u8(i + 1) }
        val len = u16(i + 2)
        if (len < 2 || i + 2 + len > p.length) throw new Fail
        val seg = i + 4
        val segEnd = i + 2 + len
        m match {
          case 0xdb => // DQT: one or more (Pq|Tq, 64/128 bytes) entries
            var j = seg
            while (j < segEnd) {
              val pq = u8(j) >> 4; val tq = u8(j) & 15
              if (pq > 1 || tq > 3) throw new Fail
              j += 1
              var k = 0
              while (k < 64) {
                qt(tq)(k) = if (pq == 0) u8(j) else u16(j)
                j += (if (pq == 0) 1 else 2)
                k += 1
              }
              qtSeen(tq) = true
            }
          case 0xc4 => // DHT: one or more tables
            var j = seg
            while (j < segEnd) {
              val cls = u8(j) >> 4; val id = u8(j) & 15
              if (cls > 1 || id > 3) throw new Fail
              val bits = new Array[Int](17)
              var total = 0
              var l = 1
              while (l <= 16) { bits(l) = u8(j + l); total += bits(l); l += 1 }
              if (j + 17 + total > segEnd) throw new Fail
              val vals = Array.tabulate(total)(k => u8(j + 17 + k))
              val t = new HuffTable(bits, vals)
              if (cls == 0) dcT(id) = t else acT(id) = t
              j += 17 + total
            }
          case 0xc0 | 0xc1 => // SOF0 (baseline) / SOF1 (ext. sequential)
            if (u8(seg) != 8) throw new Fail // precision
            h = u16(seg + 1); w = u16(seg + 3)
            nComp = u8(seg + 5)
            if (w <= 0 || h <= 0 || (nComp != 1 && nComp != 3)) throw new Fail
            var c = 0
            while (c < nComp) {
              if (u8(seg + 7 + 3 * c) != 0x11) throw new Fail // 1x1 sampling only
              compQ(c) = u8(seg + 8 + 3 * c)
              c += 1
            }
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb | 0xcd | 0xce | 0xcf =>
            throw new Fail // progressive/lossless/hierarchical/arithmetic
          case 0xdd => // DRI
            restartInterval = u16(seg)
          case 0xda => // SOS
            if (u8(seg) != nComp || nComp == 0) throw new Fail
            var c = 0
            while (c < nComp) {
              compDc(c) = u8(seg + 2 + 2 * c) >> 4
              compAc(c) = u8(seg + 2 + 2 * c) & 15
              c += 1
            }
            val ss = seg + 1 + 2 * nComp
            if (u8(ss) != 0 || u8(ss + 1) != 63 || u8(ss + 2) != 0) throw new Fail
            sos = segEnd
          case 0xd9 => throw new Fail // EOI before scan data
          case _ => () // APPn / COM / DNL / others: skip
        }
        i = segEnd
      }
      var c = 0
      while (c < nComp) {
        if (!qtSeen(compQ(c)) || dcT(compDc(c)) == null || acT(compAc(c)) == null)
          throw new Fail
        c += 1
      }
      val bxN = (w + 7) / 8
      val byN = (h + 7) / 8
      val planes = Array.ofDim[Byte](nComp, w * h)
      val br = new BitReader(p, sos)
      val coefN = new Array[Int](64)
      val pix = new Array[Int](64)
      val pred = new Array[Int](3)
      var mcuDone = 0
      var by = 0
      while (by < byN) {
        var bx = 0
        while (bx < bxN) {
          if (restartInterval > 0 && mcuDone > 0 && mcuDone % restartInterval == 0) {
            br.restart()
            pred(0) = 0; pred(1) = 0; pred(2) = 0
          }
          c = 0
          while (c < nComp) {
            java.util.Arrays.fill(coefN, 0)
            val q = qt(compQ(c))
            val s = br.decode(dcT(compDc(c)))
            if (s > 11) throw new Fail
            pred(c) += extend(br.bits(s), s)
            coefN(0) = pred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = br.decode(acT(compAc(c)))
              val run = rs >> 4; val sz = rs & 15
              if (sz == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true // EOB
              } else {
                k += run
                if (k > 63) throw new Fail
                coefN(Zigzag(k)) = extend(br.bits(sz), sz) * q(k)
                k += 1
              }
            }
            idctBlock(coefN, pix)
            val plane = planes(c)
            val x0 = bx * 8; val y0 = by * 8
            var yy = 0
            while (yy < 8 && y0 + yy < h) {
              var xx = 0
              while (xx < 8 && x0 + xx < w) {
                plane((y0 + yy) * w + x0 + xx) = pix(yy * 8 + xx).toByte
                xx += 1
              }
              yy += 1
            }
            c += 1
          }
          mcuDone += 1
          bx += 1
        }
        by += 1
      }
      val rgb = new Array[Byte](w * h * 3)
      var j = 0
      while (j < w * h) {
        if (nComp == 1) {
          val g = planes(0)(j)
          rgb(3 * j) = g; rgb(3 * j + 1) = g; rgb(3 * j + 2) = g
        } else {
          // JFIF YCbCr→RGB on the decoded samples, round half up, clamp
          val y = planes(0)(j) & 0xff
          val cb = (planes(1)(j) & 0xff) - 128
          val cr = (planes(2)(j) & 0xff) - 128
          def cl(v: Double): Byte = {
            val r = math.floor(v + 0.5).toInt
            (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          }
          rgb(3 * j) = cl(y + 1.402 * cr)
          rgb(3 * j + 1) = cl(y - 0.344136 * cb - 0.714136 * cr)
          rgb(3 * j + 2) = cl(y + 1.772 * cb)
        }
        j += 1
      }
      Some((w, h, rgb))
    } catch {
      case _: Fail | _: ArrayIndexOutOfBoundsException => None
    }
  }
}
