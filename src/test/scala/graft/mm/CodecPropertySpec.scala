package graft.mm

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based codec laws over random content — beyond CodecSpec's
  * goldens: for ANY dimensions and pixel/sample values, encode→decode
  * is the identity in canonical order, and the decoders never throw on
  * arbitrary byte junk (they return empty). Pure driver-side, no Spark
  * session.
  */
class CodecPropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int, seed: Long): Seq[A] = {
    val params = Gen.Parameters.default
    Iterator.iterate(Seed(seed))(_.next)
      .flatMap(s => g.apply(params, s))
      .take(n).toSeq
  }

  private val imageGen: Gen[(Int, Int, Array[Int])] = for {
    w <- Gen.choose(1, 17) // odd widths exercise BMP row padding
    h <- Gen.choose(1, 9)
    px <- Gen.listOfN(w * h, Gen.choose(0, 0xFFFFFF))
  } yield (w, h, px.toArray)

  private val wavGen: Gen[Array[Short]] = for {
    n <- Gen.choose(0, 200)
    s <- Gen.listOfN(n, Gen.choose(Short.MinValue.toInt, Short.MaxValue.toInt))
  } yield s.map(_.toShort).toArray

  private val junkGen: Gen[Array[Byte]] = for {
    n <- Gen.choose(0, 300)
    b <- Gen.listOfN(n, Gen.choose(-128, 127))
  } yield b.map(_.toByte).toArray

  test("BMP and PPM round-trip any image (identity in top-down RGB order)") {
    for ((w, h, px) <- samples(imageGen, 60, 11L)) {
      val flat = px.flatMap(p =>
        Seq((p >> 16) & 0xff, (p >> 8) & 0xff, p & 0xff)).toSeq
      assert(Codec.decodeBmp24(Codec.encodeBmp24(w, h, px)).toSeq === flat,
        s"bmp $w x $h")
      assert(Codec.decodePpm(Codec.encodePpm(w, h, px)).toSeq === flat,
        s"ppm $w x $h")
    }
  }

  test("WAV round-trips any PCM16 sample run, including empty") {
    for (sm <- samples(wavGen, 60, 23L))
      assert(Codec.decodeWav(Codec.encodeWav(sm)).toSeq === sm.map(_.toInt).toSeq)
  }

  test("decoders never throw on arbitrary junk; magic-less junk is empty") {
    for (junk <- samples(junkGen, 200, 37L)) {
      val out = Codec.RealDecoder(junk) // must not throw
      // junk that happens to start with a magic still either parses a
      // structurally valid container or returns empty — both fine; the
      // law is no exception and no garbage-length explosion
      assert(out.length <= junk.length * 2)
    }
    // prefix-corrupted real files: flip a byte in every position of a
    // small valid BMP; decode must never throw
    val bmp = Codec.encodeBmp24(2, 2, Array(1, 2, 3, 4))
    for (i <- bmp.indices) {
      val c = bmp.clone(); c(i) = (c(i) ^ 0x5A).toByte
      Codec.RealDecoder(c) // no throw is the assertion
    }
  }

  test("huge-dimension headers reject cleanly (Int-overflow regression)") {
    // PPM whose w*h*3 wraps Int: 1048576 * 1000 * 3 = -1149239296 as Int.
    // Pre-fix this passed the bounds check and threw
    // NegativeArraySizeException on a ~25-byte input.
    val ppm = "P6 1048576 1000 255 ".getBytes("US-ASCII")
    assert(Codec.decodePpm(ppm).isEmpty)
    // pair of headers straddling the wrap point in both directions
    assert(Codec.decodePpm("P6 1048575 1048575 255 ".getBytes("US-ASCII")).isEmpty)
    // BMP whose stride = ((w*3+3)/4)*4 wraps Int for w > ~715M: craft a
    // 54-byte header with w = 0x30000000 (805M), h = 4.
    val b = Codec.encodeBmp24(1, 1, Array(0)).take(54).toArray
    def putLE(off: Int, v: Long): Unit = {
      b(off) = (v & 0xff).toByte
      b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte
      b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    putLE(18, 0x30000000L) // w
    putLE(22, 4L)          // h
    assert(Codec.decodeBmp24(b).isEmpty)
    // and one where w*h*3 wraps but stride stays positive
    putLE(18, 0x10000000L); putLE(22, 16L)
    assert(Codec.decodeBmp24(b).isEmpty)
  }
}
