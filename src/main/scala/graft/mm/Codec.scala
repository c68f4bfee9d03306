package graft.mm

/** Real (library-free) codecs for the three classic uncompressed media
  * containers — BMP (24-bpp), WAV (PCM16 mono), PPM (P6) — behind the
  * same `Array[Byte] => Array[Int]` seam [[Multimodal.decodeFeatures]]
  * takes. This replaces "decode = byte identity" with actual format
  * parsing: little-endian multi-byte fields, chunk walking, row
  * padding, bottom-up row order, BGR→RGB channel reordering, ASCII
  * headers with comments. No codec LIBRARY exists in this sandbox, but
  * these containers need none — their specs are header arithmetic.
  *
  * Decode contract (every decoder):
  *  - returns the decoded values in CANONICAL order — samples in time
  *    order for WAV; pixels top-down row-major with R,G,B channel
  *    order for BMP/PPM — regardless of how the container stores them
  *    (BMP stores rows bottom-up as B,G,R with rows padded to 4 bytes);
  *  - returns an EMPTY array for anything malformed (bad magic,
  *    truncated payload, unsupported bpp/compression/channels) — the
  *    permissive-skip discipline of the reference's S4 source rule,
  *    applied to media;
  *  - never throws, never reads out of bounds.
  *
  * MultimodalCodecSpec pins the parsers against hand-written golden
  * bytes (so an encoder/decoder bug pair cannot cancel out), and the
  * registered `mm_decode_real` query round-trips synthesized files
  * whose decoded stats DuckDB predicts in closed form.
  */
object Codec {

  // ---- little-endian helpers -------------------------------------------

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  private def s16(b: Array[Byte], off: Int): Int =
    u16(b, off).toShort.toInt

  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)

  private def s32(b: Array[Byte], off: Int): Int = u32(b, off).toInt

  private def putU16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }

  private def putU32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  // ---- BMP (BITMAPINFOHEADER, 24 bpp, uncompressed) ---------------------

  /** Encode `rgb` (top-down row-major, packed 0xRRGGBB per pixel) as a
    * standard bottom-up 24-bpp BMP with 4-byte-aligned rows.
    */
  def encodeBmp24(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"need $w*$h pixels, got ${rgb.length}")
    val stride = ((w * 3 + 3) / 4) * 4
    val dataSize = stride * h
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putU32(out, 2, out.length.toLong) // file size
    putU32(out, 10, 54L)              // pixel-data offset
    putU32(out, 14, 40L)              // info-header size
    putU32(out, 18, w.toLong)
    putU32(out, 22, h.toLong)         // positive => bottom-up
    putU16(out, 26, 1)                // planes
    putU16(out, 28, 24)               // bpp
    putU32(out, 30, 0L)               // BI_RGB (uncompressed)
    putU32(out, 34, dataSize.toLong)
    var y = 0
    while (y < h) {
      val rowBase = 54 + (h - 1 - y) * stride // bottom-up storage
      var x = 0
      while (x < w) {
        val px = rgb(y * w + x)
        out(rowBase + x * 3) = (px & 0xff).toByte            // B
        out(rowBase + x * 3 + 1) = ((px >> 8) & 0xff).toByte // G
        out(rowBase + x * 3 + 2) = ((px >> 16) & 0xff).toByte // R
        x += 1
      }
      y += 1
    }
    out
  }

  /** Decode a 24-bpp uncompressed BMP to channel values in canonical
    * order: top-down row-major, R,G,B per pixel (3 ints per pixel).
    * Handles bottom-up (height > 0) and top-down (height < 0) storage.
    */
  def decodeBmp24(b: Array[Byte]): Array[Int] = {
    if (b.length < 54 || b(0) != 'B' || b(1) != 'M') return Array.empty
    val dataOff = u32(b, 10)
    val w = s32(b, 18)
    val hRaw = s32(b, 22)
    val bpp = u16(b, 28)
    val compression = u32(b, 30)
    if (w <= 0 || hRaw == 0 || bpp != 24 || compression != 0L)
      return Array.empty
    val h = math.abs(hRaw)
    val bottomUp = hRaw > 0
    // size arithmetic in Long: header w/h are unbounded attacker input,
    // and Int stride/pixel-count wrap for w > ~715M, which would let the
    // bounds check pass and the copy loop throw (never-throws contract)
    val strideL = ((w.toLong * 3 + 3) / 4) * 4
    if (dataOff < 54 || dataOff + strideL * h > b.length)
      return Array.empty
    val stride = strideL.toInt // <= b.length, so it fits
    val out = new Array[Int]((w.toLong * h * 3).toInt) // < strideL*h <= length
    var y = 0
    while (y < h) {
      val srcRow = dataOff.toInt + (if (bottomUp) (h - 1 - y) else y) * stride
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        out(o) = b(srcRow + x * 3 + 2) & 0xff     // R
        out(o + 1) = b(srcRow + x * 3 + 1) & 0xff // G
        out(o + 2) = b(srcRow + x * 3) & 0xff     // B
        x += 1
      }
      y += 1
    }
    out
  }

  // ---- WAV (RIFF, PCM16 mono) -------------------------------------------

  /** Encode signed 16-bit mono samples as a canonical 44-byte-header
    * RIFF/WAVE file.
    */
  def encodeWav(samples: Array[Short], sampleRate: Int = 8000): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putU32(out, 4, 36L + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putU32(out, 16, 16L)              // fmt chunk size
    putU16(out, 20, 1)                // PCM
    putU16(out, 22, 1)                // mono
    putU32(out, 24, sampleRate.toLong)
    putU32(out, 28, sampleRate.toLong * 2) // byte rate
    putU16(out, 32, 2)                // block align
    putU16(out, 34, 16)               // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putU32(out, 40, dataSize.toLong)
    var i = 0
    while (i < samples.length) {
      putU16(out, 44 + i * 2, samples(i) & 0xffff)
      i += 1
    }
    out
  }

  /** Decode a RIFF/WAVE PCM16 mono file to its samples (signed, time
    * order). Walks the chunk list generically, so files carrying extra
    * chunks (LIST/INFO, fact, …) before or after `data` parse fine —
    * that is what distinguishes parsing the format from assuming the
    * canonical 44-byte layout.
    */
  def decodeWav(b: Array[Byte]): Array[Int] = {
    if (b.length < 12 ||
      b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return Array.empty
    var off = 12
    var fmtOk = false
    var dataOff = -1
    var dataLen = -1
    while (off + 8 <= b.length) {
      val id = new String(b, off, 4, "US-ASCII")
      val sz = u32(b, off + 4)
      if (off + 8 + sz > b.length) return Array.empty // truncated chunk
      if (id == "fmt ") {
        if (sz < 16) return Array.empty
        val audioFormat = u16(b, off + 8)
        val channels = u16(b, off + 10)
        val bits = u16(b, off + 22)
        fmtOk = audioFormat == 1 && channels == 1 && bits == 16
      } else if (id == "data" && dataOff < 0) {
        dataOff = off + 8
        dataLen = sz.toInt
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off += 8 + sz.toInt + (sz.toInt & 1)
    }
    if (!fmtOk || dataOff < 0) return Array.empty
    val n = dataLen / 2
    val out = new Array[Int](n)
    var i = 0
    while (i < n) { out(i) = s16(b, dataOff + i * 2); i += 1 }
    out
  }

  // ---- PPM (P6, binary, maxval <= 255) ----------------------------------

  /** Encode `rgb` (top-down row-major packed 0xRRGGBB) as binary PPM. */
  def encodePpm(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == w * h, s"need $w*$h pixels, got ${rgb.length}")
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var i = 0
    while (i < rgb.length) {
      val o = header.length + i * 3
      out(o) = ((rgb(i) >> 16) & 0xff).toByte
      out(o + 1) = ((rgb(i) >> 8) & 0xff).toByte
      out(o + 2) = (rgb(i) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode binary PPM (P6) to R,G,B channel values, top-down
    * row-major. Real header parsing: any whitespace separates tokens
    * and `#` comments run to end-of-line (both legal per the netpbm
    * spec), maxval must fit a byte.
    */
  def decodePpm(b: Array[Byte]): Array[Int] = {
    if (b.length < 2 || b(0) != 'P' || b(1) != '6') return Array.empty
    var off = 2
    def isWs(c: Byte) = c == ' ' || c == '\t' || c == '\n' || c == '\r'
    // returns the next header integer, skipping whitespace and comments
    def nextInt(): Int = {
      while (off < b.length &&
        (isWs(b(off)) || b(off) == '#')) {
        if (b(off) == '#') { while (off < b.length && b(off) != '\n') off += 1 }
        else off += 1
      }
      if (off >= b.length || b(off) < '0' || b(off) > '9') return -1
      var v = 0
      while (off < b.length && b(off) >= '0' && b(off) <= '9') {
        v = v * 10 + (b(off) - '0'); off += 1
        if (v > (1 << 20)) return -1 // absurd header value
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval <= 0 || maxval > 255) return Array.empty
    off += 1 // exactly ONE whitespace byte after maxval, per spec
    // pixel count in Long: w and h can each be up to 1<<20, so w*h*3
    // wraps Int (e.g. "P6 1048576 1000 255") — the wrapped value would
    // pass this check and NegativeArraySizeException below
    val n = w.toLong * h * 3
    if (off + n > b.length) return Array.empty
    val out = new Array[Int](n.toInt) // n <= b.length, so it fits
    var i = 0
    while (i < out.length) { out(i) = b(off + i) & 0xff; i += 1 }
    out
  }

  // ---- dispatching decoder ----------------------------------------------

  /** Container-sniffing decoder with the [[Multimodal.decodeFeatures]]
    * seam shape: BMP / WAV / PPM by magic bytes, empty for anything
    * else (or any malformed instance of the three).
    */
  val RealDecoder: Array[Byte] => Array[Int] = b =>
    if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') decodeBmp24(b)
    else if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == 'F') decodeWav(b)
    else if (b.length >= 2 && b(0) == 'P' && b(1) == '6') decodePpm(b)
    else Array.empty
}
