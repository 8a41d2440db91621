package graft.sources.tiff

/** TIFF-variant LZW codec (TIFF 6.0 §13, a public spec): 8-bit native codes,
  * ClearCode 256, EndOfInformation 257, MSB-first bit packing, and the
  * spec's "early change" — the code width bumps one code EARLY (when the
  * next assignable code is 2^width - 1), which is what every real-world
  * writer (libtiff, GDAL — the reference's COG writer emits LZW via GDAL,
  * weather_mv/loader_pipeline/ee.py:662) produces. */
object Lzw {

  private val ClearCode = 256
  private val EoiCode = 257
  private val FirstCode = 258
  private val MaxCode = 4094 // table resets before width would exceed 12 bits

  /** Decode `raw` into exactly `expected` bytes. */
  def decode(raw: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var outPos = 0
    // table: code -> byte string; 0-255 literals are implicit
    var entries = new Array[Array[Byte]](4096)
    var nextCode = FirstCode
    var width = 9
    var bitPos = 0L
    val totalBits = raw.length.toLong * 8

    def readCode(): Int = {
      if (bitPos + width > totalBits) return EoiCode
      var v = 0
      var i = 0
      while (i < width) {
        val b = (raw(((bitPos + i) >> 3).toInt) >> (7 - ((bitPos + i) & 7)) & 1)
        v = (v << 1) | b
        i += 1
      }
      bitPos += width
      v
    }

    def bytesOf(code: Int): Array[Byte] =
      if (code < 256) Array(code.toByte)
      else entries(code) match {
        case null => throw Tiff.UnsupportedTiff(s"corrupt LZW stream: code $code undefined")
        case b => b
      }

    var prev: Array[Byte] = null
    var done = false
    while (!done && outPos < expected) {
      val code = readCode()
      if (code == EoiCode) done = true
      else if (code == ClearCode) {
        entries = new Array[Array[Byte]](4096)
        nextCode = FirstCode
        width = 9
        prev = null
      } else {
        val cur: Array[Byte] =
          if (code < nextCode || code < 256) bytesOf(code)
          else if (prev != null && code == nextCode) prev :+ prev(0) // KwKwK case
          else throw Tiff.UnsupportedTiff(s"corrupt LZW stream: code $code > next $nextCode")
        System.arraycopy(cur, 0, out, outPos, math.min(cur.length, expected - outPos))
        outPos += cur.length
        if (prev != null && nextCode <= MaxCode) {
          entries(nextCode) = prev :+ cur(0)
          nextCode += 1
        }
        // early change: width grows when the NEXT code would hit 2^width - 1
        if (nextCode == (1 << width) - 1 && width < 12) width += 1
        prev = cur
      }
    }
    out
  }

  /** Encode `data` (any byte payload; one strip/tile per call). */
  def encode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCount = 0
    var width = 9

    def writeCode(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCount += width
      while (bitCount >= 8) {
        out.write(((bitBuf >> (bitCount - 8)) & 0xff).toInt)
        bitCount -= 8
      }
    }

    // string table: (prefixCode << 8 | byte) -> code
    var table = new java.util.HashMap[Integer, Integer]()
    var nextCode = FirstCode

    def reset(): Unit = {
      table = new java.util.HashMap[Integer, Integer]()
      nextCode = FirstCode
      width = 9
    }

    writeCode(ClearCode)
    reset()
    var prefix = -1
    var i = 0
    while (i < data.length) {
      val b = data(i) & 0xff
      if (prefix < 0) prefix = b
      else {
        val key = (prefix << 8) | b
        val hit = table.get(key)
        if (hit != null) prefix = hit
        else {
          writeCode(prefix)
          table.put(key, nextCode)
          nextCode += 1
          // the decoder's table is one entry BEHIND the encoder's, so the
          // encoder bumps at 2^width while the decoder bumps at 2^width - 1
          // (the spec's early change) — both switch before the same code
          if (nextCode == (1 << width) && width < 12) width += 1
          if (nextCode > MaxCode) {
            writeCode(ClearCode)
            reset()
          }
          prefix = b
        }
      }
      i += 1
    }
    if (prefix >= 0) writeCode(prefix)
    writeCode(EoiCode)
    if (bitCount > 0) out.write(((bitBuf << (8 - bitCount)) & 0xff).toInt)
    out.toByteArray
  }
}
