package graft.mm

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Codec]]'s parsers against HAND-WRITTEN golden bytes — built
  * from the format specs here in the test, never via the encoders — so
  * a matched encoder/decoder bug pair (both byte-swapped, both BGR)
  * cannot cancel out the way a pure round-trip test would allow. The
  * round-trip laws and the malformed-input contract ride along.
  */
class CodecSpec extends AnyFunSuite {

  // ---- golden BMP: 2×2, 24bpp, bottom-up, padded rows -------------------
  // Pixels (top-down row-major, 0xRRGGBB):
  //   (0,0)=0x112233 (0,1)=0x445566
  //   (1,0)=0x778899 (1,1)=0xAABBCC
  // Stored bottom-up (row 1 first) as B,G,R; stride = 2*3=6 → pad to 8.
  private def goldenBmp: Array[Byte] = {
    val header = Array[Int](
      'B', 'M', 70, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0, // file header
      40, 0, 0, 0,    // info size
      2, 0, 0, 0,     // width 2
      2, 0, 0, 0,     // height 2 (positive: bottom-up)
      1, 0,           // planes
      24, 0,          // bpp
      0, 0, 0, 0,     // BI_RGB
      16, 0, 0, 0,    // image size (2 rows × stride 8)
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0) // res/colors
    val rowBottom = Array[Int](0x99, 0x88, 0x77, 0xCC, 0xBB, 0xAA, 0, 0)
    val rowTop = Array[Int](0x33, 0x22, 0x11, 0x66, 0x55, 0x44, 0, 0)
    (header ++ rowBottom ++ rowTop).map(_.toByte)
  }

  test("golden BMP decodes to top-down RGB with padding stripped") {
    assert(Codec.decodeBmp24(goldenBmp).toSeq === Seq(
      0x11, 0x22, 0x33, 0x44, 0x55, 0x66,
      0x77, 0x88, 0x99, 0xAA, 0xBB, 0xCC))
  }

  test("negative-height BMP is read top-down") {
    val b = goldenBmp
    // height = -2 (two's complement little-endian) → rows stored
    // top-down, so the decoded image is vertically flipped vs golden
    b(22) = 0xFE.toByte; b(23) = 0xFF.toByte
    b(24) = 0xFF.toByte; b(25) = 0xFF.toByte
    assert(Codec.decodeBmp24(b).toSeq === Seq(
      0x77, 0x88, 0x99, 0xAA, 0xBB, 0xCC,
      0x11, 0x22, 0x33, 0x44, 0x55, 0x66))
  }

  // ---- golden WAV: PCM16 mono, an extra chunk before data ---------------
  // Samples: 1, -2, 300, -32768 — little-endian signed 16-bit.
  private def goldenWav: Array[Byte] = {
    def le16(v: Int) = Array(v & 0xff, (v >> 8) & 0xff)
    def le32(v: Int) =
      Array(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    val fmt = Array[Int]('f', 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(8000) ++ le32(16000) ++ le16(2) ++ le16(16)
    // a 3-byte junk chunk ("jnk") with odd size → 1 pad byte follows
    val junk = Array[Int]('j', 'n', 'k', ' ') ++ le32(3) ++
      Array(0xDE, 0xAD, 0xBE, 0x00)
    val data = Array[Int]('d', 'a', 't', 'a') ++ le32(8) ++
      le16(1) ++ le16(0xFFFE) ++ le16(300) ++ le16(0x8000)
    val body = fmt ++ junk ++ data
    (Array[Int]('R', 'I', 'F', 'F') ++ le32(4 + body.length) ++
      Array[Int]('W', 'A', 'V', 'E') ++ body).map(_.toByte)
  }

  test("golden WAV parses signed samples through an interleaved junk chunk") {
    assert(Codec.decodeWav(goldenWav).toSeq === Seq(1, -2, 300, -32768))
  }

  // ---- golden PPM: comments + multi-digit dims --------------------------
  test("golden PPM parses comments, arbitrary whitespace, multi-digit dims") {
    val header = "P6 # ppm comment\n# another\n 3\t1 # dims\n255\n"
    val pixels = Array[Int](10, 20, 30, 40, 50, 60, 70, 80, 90)
    val b = header.getBytes("US-ASCII") ++ pixels.map(_.toByte)
    assert(Codec.decodePpm(b).toSeq === pixels.toSeq)
  }

  // ---- round-trip laws (encode is spec-exercised by the goldens above) --
  test("BMP/WAV/PPM round-trip the synthesized content exactly") {
    for (id <- Seq(0L, 1L, 2L, 17L, 123L)) {
      val w = (id % 8 + 1).toInt; val h = (id % 6 + 1).toInt
      val px = Multimodal.synthPixels(id, w, h)
      val flat = px.flatMap(p => Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff))
      assert(Codec.decodeBmp24(Codec.encodeBmp24(w, h, px)).toSeq === flat.toSeq)
      assert(Codec.decodePpm(Codec.encodePpm(w, h, px)).toSeq === flat.toSeq)
      val sm = Multimodal.synthSamples(id)
      assert(Codec.decodeWav(Codec.encodeWav(sm)).toSeq === sm.map(_.toInt).toSeq)
    }
  }

  test("malformed payloads decode to empty, never throw") {
    val truncatedBmp = goldenBmp.take(40)
    val wrongBpp = { val b = goldenBmp; b(28) = 8; b }
    val compressed = { val b = goldenBmp; b(30) = 1; b }
    val truncatedWav = goldenWav.take(30)
    val stereo = { val b = goldenWav; b(22) = 2; b }
    val shortPpm = "P6\n3 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](1, 2)
    val bigMaxval = "P6\n1 1\n65535\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3)
    for (bad <- Seq(truncatedBmp, wrongBpp, compressed, truncatedWav, stereo,
        shortPpm, bigMaxval, Array[Byte](), Array[Byte]('X', 'Y')))
      assert(Codec.RealDecoder(bad).isEmpty)
  }

  test("RealDecoder dispatches on magic bytes") {
    val px = Array(0x010203)
    assert(Codec.RealDecoder(Codec.encodeBmp24(1, 1, px)).nonEmpty)
    assert(Codec.RealDecoder(Codec.encodeWav(Array[Short](5))).toSeq === Seq(5))
    assert(Codec.RealDecoder(Codec.encodePpm(1, 1, px)).toSeq === Seq(1, 2, 3))
  }
}
