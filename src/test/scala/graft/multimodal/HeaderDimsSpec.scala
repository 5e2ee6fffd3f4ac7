package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Property-style tests for the byte-level media header parser —
  * randomized (seeded) structures around planted frame headers, covering
  * the marker classes a real JPEG stream contains: fill bytes, standalone
  * TEM/RSTn markers, and variable-length app/comment segments.
  */
class HeaderDimsSpec extends AnyFunSuite {

  private def u16(v: Int): Array[Byte] = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def pngBytes(w: Int, h: Int): Array[Byte] = {
    val b = new scala.collection.mutable.ArrayBuffer[Byte]
    b ++= Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    b ++= Array(0, 0, 0, 13).map(_.toByte) // IHDR length
    b ++= "IHDR".getBytes("US-ASCII")
    b ++= Array(((w >> 24) & 0xff), ((w >> 16) & 0xff), ((w >> 8) & 0xff), (w & 0xff)).map(_.toByte)
    b ++= Array(((h >> 24) & 0xff), ((h >> 16) & 0xff), ((h >> 8) & 0xff), (h & 0xff)).map(_.toByte)
    b ++= Array(8, 2, 0, 0, 0).map(_.toByte)
    b.toArray
  }

  /** A JPEG prefix: SOI, then `segments` random non-frame structures,
    * then SOF0 with the planted dims.
    */
  private def jpegBytes(rnd: Random, w: Int, h: Int, segments: Int): Array[Byte] = {
    val b = new scala.collection.mutable.ArrayBuffer[Byte]
    b ++= Array(0xff, 0xd8).map(_.toByte) // SOI
    (0 until segments).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => // variable-length APPn/COM segment with random payload
          val payload = rnd.nextInt(20)
          b += 0xff.toByte
          b += (0xe0 + rnd.nextInt(15)).toByte // APP0..APPE (avoid 0xEF+1=0xF0.. fine all non-frame)
          b ++= u16(payload + 2)
          (0 until payload).foreach(_ => b += rnd.nextInt(256).toByte)
        case 1 => // standalone marker: TEM or RSTn — NO length field
          b += 0xff.toByte
          b += (if (rnd.nextBoolean()) 0x01 else (0xd0 + rnd.nextInt(8))).toByte
        case 2 => // fill bytes: runs of 0xFF before the next marker's 0xFF
          (0 until rnd.nextInt(3)).foreach(_ => b += 0xff.toByte)
      }
    }
    b ++= Array(0xff, 0xc0).map(_.toByte) // SOF0
    b ++= u16(8 + 3) // segment length
    b += 8.toByte // precision
    b ++= u16(h)
    b ++= u16(w)
    b ++= Array(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1).map(_.toByte)
    b.toArray
  }

  test("PNG IHDR dims parse for random sizes") {
    val rnd = new Random(7)
    (1 to 200).foreach { _ =>
      val (w, h) = (1 + rnd.nextInt(8192), 1 + rnd.nextInt(8192))
      assert(Multimodal.headerDims(pngBytes(w, h)) === Some((w, h)))
    }
  }

  test("JPEG SOF dims parse through random fill bytes, TEM/RSTn markers, and APP segments") {
    val rnd = new Random(42)
    (1 to 500).foreach { i =>
      val (w, h) = (1 + rnd.nextInt(65535), 1 + rnd.nextInt(65535))
      val bytes = jpegBytes(rnd, w, h, segments = rnd.nextInt(8))
      assert(Multimodal.headerDims(bytes) === Some((w, h)), s"case $i")
    }
  }

  test("non-media bytes never parse (fallback path)") {
    val rnd = new Random(99)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(64)
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      // exclude byte strings that legitimately start with a magic number
      if (n < 2 || !(bytes(0) == 0xff.toByte && bytes(1) == 0xd8.toByte) &&
        !(n >= 4 && bytes(0) == 0x89.toByte && bytes(1) == 0x50.toByte)) {
        val r = Multimodal.headerDims(bytes)
        assert(r.isEmpty || r.exists { case (w, h) => w >= 0 && h >= 0 })
      }
    }
  }
}
