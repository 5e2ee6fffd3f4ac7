package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** Verifies the hand-written RFC 1950/1951 decompressor against the
  * JDK's zlib (`java.util.zip.Deflater`) — an independent
  * implementation that emits stored, fixed-Huffman AND dynamic-Huffman
  * blocks depending on level/content, so every inflate path is
  * exercised by bytes this repo did not produce — and pins the PNG
  * round-trip built on it.
  */
class InflateSpec extends AnyFunSuite {

  private def deflate(data: Array[Byte], level: Int): Array[Byte] = {
    val d = new java.util.zip.Deflater(level, false) // zlib-wrapped
    d.setInput(data)
    d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](4096)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def corpus: Seq[Array[Byte]] = {
    val rnd = new scala.util.Random(42)
    Seq(
      Array.empty[Byte],
      "a".getBytes("UTF-8"),
      ("spark " * 4000).getBytes("UTF-8"), // highly repetitive: long matches
      Array.tabulate(70000)(i => (i % 251).toByte), // > one stored block
      Array.fill(50000)(rnd.nextInt(256).toByte), // incompressible
      Array.tabulate(10000)(i => if (i % 7 == 0) 'x'.toByte else (i % 3).toByte)
    )
  }

  test("zlibInflate inverts java.util.zip.Deflater at every level") {
    for (data <- corpus; level <- Seq(0, 1, 6, 9)) {
      // level 0 = stored blocks, 1 tends to fixed-Huffman on small
      // inputs, 6/9 = dynamic-Huffman — all three block types covered
      val got = Inflate.zlibInflate(deflate(data, level), data.length)
      assert(java.util.Arrays.equals(got, data), s"len=${data.length} level=$level")
    }
  }

  test("zlibStore round-trips through the JDK Inflater and through zlibInflate") {
    for (data <- corpus) {
      val z = Inflate.zlibStore(data)
      // our own decoder
      assert(java.util.Arrays.equals(Inflate.zlibInflate(z, data.length), data))
      // the JDK's decoder accepts our encoder's stream too
      val inf = new java.util.zip.Inflater(false)
      inf.setInput(z)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        out.write(buf, 0, n)
        // n == 0 with finished() now true is the JDK's empty-stream
        // completion quirk, not a stall
        if (n == 0 && !inf.finished()) fail("JDK inflater stalled")
      }
      inf.end()
      assert(java.util.Arrays.equals(out.toByteArray, data))
    }
  }

  test("malformed streams are rejected, not mis-decoded") {
    val ok = deflate("hello world".getBytes("UTF-8"), 6)
    intercept[IllegalArgumentException](Inflate.zlibInflate(ok.take(4))) // truncated
    val badHdr = ok.clone(); badHdr(0) = 0x00
    intercept[IllegalArgumentException](Inflate.zlibInflate(badHdr))
    val badAdler = ok.clone(); badAdler(badAdler.length - 1) = (badAdler.last ^ 0x55).toByte
    intercept[IllegalArgumentException](Inflate.zlibInflate(badAdler))
  }
}
