package graft.sources.zarr

/** Pure-JVM Blosc1 chunk codec — the zarr-python v2 DEFAULT compressor
  * (numcodecs `Blosc(cname='lz4', shuffle=SHUFFLE)`), so most real-world
  * v2 stores are packed this way (the reference's own test fixture,
  * weather_mv/test_data/test_data.zarr, is blosc-lz4 int16).
  *
  * Implements the public c-blosc 1.x container format
  * (c-blosc README_CHUNK_FORMAT.rst):
  *
  * {{{
  * byte 0: version      byte 1: versionlz   byte 2: flags   byte 3: typesize
  * bytes 4-7:  nbytes    (LE, uncompressed size)
  * bytes 8-11: blocksize (LE)
  * bytes 12-15: cbytes   (LE, total chunk bytes incl. this header)
  * }}}
  *
  * flags: bit 0 byte-shuffle, bit 1 memcpyed (payload stored verbatim),
  * bit 2 bit-shuffle (the bitshuffle library's bit-plane transpose),
  * bit 4 dont-split, bits 5-7 the codec (0 blosclz, 1 lz4/lz4hc,
  * 2 snappy, 3 zlib, 4 zstd).
  *
  * Non-memcpyed payload: `nblocks` little-endian int32 block starts
  * (offsets from the chunk start), then per block `nsplits` sections of
  * `[int32 csize][payload]` where nsplits = typesize unless dont-split or
  * the leftover block, and csize == split-size marks a stored-raw split.
  * Byte-shuffle is per block: split the block into typesize streams of
  * byte i of every element (trailing `blocksize % typesize` bytes ride
  * verbatim).
  *
  * Codecs — the FULL numcodecs cname surface: blosclz (FastLZ-derived
  * opcode stream), lz4 (the default cname; block format decoded here),
  * snappy (varint preamble + tagged elements), zlib (java.util.zip), zstd
  * (each split is a complete zstd frame — [[Zstd]]), and stored-raw
  * splits — with byte-shuffle (shuffle=1) AND bit-shuffle (shuffle=2).
  */
object Blosc {

  final case class UnsupportedBlosc(detail: String) extends
    UnsupportedOperationException(s"blosc feature not supported: $detail")

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = v.toByte
    b(off + 1) = (v >>> 8).toByte
    b(off + 2) = (v >>> 16).toByte
    b(off + 3) = (v >>> 24).toByte
  }

  /** Decompress one blosc chunk to its `nbytes` payload. */
  def decompress(raw: Array[Byte]): Array[Byte] = {
    require(raw.length >= 16, s"blosc chunk shorter than its header (${raw.length} bytes)")
    val flags = raw(2) & 0xff
    val typesize = raw(3) & 0xff
    val nbytes = le32(raw, 4)
    val blocksize = le32(raw, 8)
    val cbytes = le32(raw, 12)
    require(cbytes <= raw.length,
      s"blosc chunk truncated: header says $cbytes bytes, have ${raw.length}")
    require(nbytes >= 0 && blocksize > 0, s"bad blosc sizes nbytes=$nbytes blocksize=$blocksize")
    val bitShuffled = (flags & 0x04) != 0
    val shuffled = (flags & 0x01) != 0 && typesize > 1 && !bitShuffled
    val out = new Array[Byte](nbytes)
    if ((flags & 0x02) != 0) { // memcpyed: payload verbatim after the header
      System.arraycopy(raw, 16, out, 0, nbytes)
      return out // memcpyed chunks are never shuffled (c-blosc stores raw input)
    }
    val codec = (flags & 0xe0) >>> 5
    val dontSplit = (flags & 0x10) != 0
    val nblocks = (nbytes + blocksize - 1) / blocksize
    var dstOff = 0
    var b = 0
    while (b < nblocks) {
      val bsize = math.min(blocksize, nbytes - b * blocksize)
      val leftover = bsize != blocksize
      val nsplits = if (dontSplit || leftover || typesize <= 1) 1 else typesize
      val neblock = bsize / nsplits
      var src = le32(raw, 16 + 4 * b)
      // decode into a scratch block, then unshuffle into place
      val block = new Array[Byte](bsize)
      var s = 0
      var blockOff = 0
      while (s < nsplits) {
        val csize = le32(raw, src)
        src += 4
        if (csize == neblock) // stored-raw split
          System.arraycopy(raw, src, block, blockOff, neblock)
        else codec match {
          case 0 => blosclzDecompress(raw, src, csize, block, blockOff, neblock)
          case 1 => lz4Decompress(raw, src, csize, block, blockOff, neblock)
          case 2 => snappyDecompress(raw, src, csize, block, blockOff, neblock)
          case 3 => inflateInto(raw, src, csize, block, blockOff, neblock)
          case 4 => Zstd.decompressInto(raw, src, csize, block, blockOff, neblock)
          case other => throw UnsupportedBlosc(s"codec id $other")
        }
        src += csize
        blockOff += neblock
        s += 1
      }
      if (shuffled) {
        // per-block byte unshuffle: stream j holds byte j of each element
        val elems = bsize / typesize
        var j = 0
        while (j < typesize) {
          var i = 0
          while (i < elems) {
            out(dstOff + i * typesize + j) = block(j * elems + i)
            i += 1
          }
          j += 1
        }
        val tail = bsize % typesize
        if (tail > 0)
          System.arraycopy(block, bsize - tail, out, dstOff + bsize - tail, tail)
      } else if (bitShuffled) {
        bitUnshuffleBlock(block, bsize, typesize, out, dstOff)
      } else System.arraycopy(block, 0, out, dstOff, bsize)
      dstOff += bsize
      b += 1
    }
    out
  }

  /** Per-block bit-shuffle (numcodecs `Blosc(shuffle=2)`, the bitshuffle
    * library's transform): the block's elements form an (nElem x 8*ts) bit
    * matrix — rows are elements, columns run byte 0 MSB..LSB then byte 1,
    * etc. — which transposes so bit-plane p holds bit p of every element,
    * packed 8 elements per byte MSB-first. Matching c-blosc shuffle.c
    * bitshuffle(): only the largest multiple-of-8 element prefix is
    * transposed (`size -= size % 8`); the leftover elements AND the
    * trailing `bsize % typesize` bytes are memcpyed verbatim after it.
    * The bit order is pinned by the bitshuffle library's own
    * numpy-equivalence definition (unpackbits/transpose/packbits, both
    * MSB-first), an independent unpack/transpose/pack model in
    * ZarrSourceSpec, and a hand-laid-out plane assertion. */
  private[graft] def bitShuffleBlock(src: Array[Byte], srcOff: Int, bsize: Int,
      typesize: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val nElem = (bsize / typesize) & ~7 // c-blosc: size -= size % 8
    if (nElem == 0) {
      System.arraycopy(src, srcOff, dst, dstOff, bsize)
      return
    }
    val planeBytes = nElem / 8
    java.util.Arrays.fill(dst, dstOff, dstOff + nElem * typesize, 0.toByte)
    var p = 0
    while (p < 8 * typesize) {
      val byteOf = p / 8
      val shift = 7 - (p % 8)
      var i = 0
      while (i < planeBytes) {
        var acc = 0
        var j = 0
        while (j < 8) {
          val bit = (src(srcOff + (8 * i + j) * typesize + byteOf) >>> shift) & 1
          acc |= bit << (7 - j)
          j += 1
        }
        dst(dstOff + p * planeBytes + i) = acc.toByte
        i += 1
      }
      p += 1
    }
    // c-blosc copies everything past the transposed prefix verbatim:
    // leftover (nElem % 8) whole elements plus any sub-typesize tail.
    val prefix = nElem * typesize
    if (bsize > prefix)
      System.arraycopy(src, srcOff + prefix, dst, dstOff + prefix, bsize - prefix)
  }

  /** Inverse of [[bitShuffleBlock]]. */
  private[graft] def bitUnshuffleBlock(block: Array[Byte], bsize: Int,
      typesize: Int, dst: Array[Byte], dstOff: Int): Unit = {
    val nElem = (bsize / typesize) & ~7 // c-blosc: size -= size % 8
    if (nElem == 0) {
      System.arraycopy(block, 0, dst, dstOff, bsize)
      return
    }
    val planeBytes = nElem / 8
    java.util.Arrays.fill(dst, dstOff, dstOff + nElem * typesize, 0.toByte)
    var p = 0
    while (p < 8 * typesize) {
      val byteOf = p / 8
      val shift = 7 - (p % 8)
      var i = 0
      while (i < planeBytes) {
        val b = block(p * planeBytes + i) & 0xff
        var j = 0
        while (j < 8) {
          val bit = (b >>> (7 - j)) & 1
          dst(dstOff + (8 * i + j) * typesize + byteOf) =
            (dst(dstOff + (8 * i + j) * typesize + byteOf) | (bit << shift)).toByte
          j += 1
        }
        i += 1
      }
      p += 1
    }
    val prefix = nElem * typesize
    if (bsize > prefix)
      System.arraycopy(block, prefix, dst, dstOff + prefix, bsize - prefix)
  }

  /** BloscLZ block decode (public source: c-blosc blosclz.c, the FastLZ-
    * derived house codec and blosc's cname default before lz4). Opcode
    * stream: the first control byte is a literal run (`& 31`, run = ctrl+1);
    * a control >= 32 is a match with length code `ctrl >> 5` (1..6 mean
    * len = code+2; 7 extends by 255-terminated bytes so len = 9 + sum),
    * 13-bit distance `((ctrl & 31) << 8) + lowByte + 1`, and the reserved
    * (31, 255) offset pattern switching to a 16-bit far distance
    * `ofs16 + 8192`. */
  private[graft] def blosclzDecompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    var d = dstOff
    val dEnd = dstOff + dstLen
    require(s < sEnd, "empty blosclz block")
    var ctrl = src(s) & 0x1f // first op is always a literal run
    s += 1
    var done = false
    while (!done) {
      if (ctrl >= 32) {
        var len = (ctrl >>> 5) - 1
        val ofsHi = (ctrl & 31) << 8
        if (len == 6) {
          var code = 0
          do {
            require(s < sEnd, "truncated blosclz match extension")
            code = src(s) & 0xff; s += 1; len += code
          } while (code == 255)
        }
        require(s < sEnd, "truncated blosclz offset")
        val low = src(s) & 0xff
        s += 1
        len += 3
        var dist = ofsHi + low + 1
        if (low == 255 && ofsHi == (31 << 8)) {
          require(s + 2 <= sEnd, "truncated blosclz far offset")
          dist = (((src(s) & 0xff) << 8) | (src(s + 1) & 0xff)) + 8192
          s += 2
        }
        require(d - dist >= dstOff, s"blosclz match before block start (dist=$dist)")
        require(d + len <= dEnd, s"blosclz match overruns (len=$len)")
        var i = 0 // byte-wise: matches may overlap their own output
        while (i < len) { dst(d + i) = dst(d + i - dist); i += 1 }
        d += len
      } else {
        val run = ctrl + 1
        require(s + run <= sEnd && d + run <= dEnd,
          s"blosclz literal run overruns (run=$run)")
        System.arraycopy(src, s, dst, d, run)
        s += run
        d += run
      }
      if (s >= sEnd) done = true
      else { ctrl = src(s) & 0xff; s += 1 }
    }
    require(d == dEnd, s"blosclz block produced ${d - dstOff} of $dstLen bytes")
  }

  /** Greedy BloscLZ compressor (3-byte-hash single probe, short-distance
    * matches only) — real fixtures for the decoder spec; the decoder also
    * handles the far-distance form, covered by a handcrafted stream. */
  private[graft] def blosclzCompress(src: Array[Byte], maxLen: Int): Array[Byte] = {
    val n = src.length
    val out = new Array[Byte](maxLen)
    var d = 0
    var anchor = 0
    def flushLits(until: Int): Boolean = {
      var a = anchor
      while (a < until) {
        val run = math.min(32, until - a)
        if (d + 1 + run > maxLen) return false
        out(d) = (run - 1).toByte
        d += 1
        System.arraycopy(src, a, out, d, run)
        d += run
        a += run
      }
      anchor = until
      true
    }
    val table = new Array[Int](4096)
    java.util.Arrays.fill(table, -1)
    def hash(i: Int): Int = {
      val v = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) | ((src(i + 2) & 0xff) << 16)
      (v * -1640531535) >>> 20
    }
    var i = 0
    while (i < n - 3) {
      val h = hash(i)
      val cand = table(h)
      table(h) = i
      val dist = i - cand
      if (cand >= 0 && dist <= 8191 &&
          src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
          src(cand + 2) == src(i + 2)) {
        var len = 3
        while (i + len < n && src(cand + len) == src(i + len)) len += 1
        if (!flushLits(i)) return null
        val ofsVal = dist - 1 // <= 8190, so never the reserved (31, 255)
        val lenCode = math.min(len - 2, 7)
        if (d + 2 + (if (lenCode == 7) 1 + (len - 9) / 255 + 1 else 0) > maxLen)
          return null
        out(d) = ((lenCode << 5) | (ofsVal >>> 8)).toByte
        d += 1
        if (lenCode == 7) {
          var rest = len - 9 // decoder: len = 9 + sum of extension bytes
          while (rest >= 255) { out(d) = -1; d += 1; rest -= 255 }
          out(d) = rest.toByte
          d += 1
        }
        out(d) = (ofsVal & 0xff).toByte
        d += 1
        i += len
        anchor = i
      } else i += 1
    }
    if (!flushLits(n)) return null
    java.util.Arrays.copyOf(out, d)
  }

  /** Raw snappy decode (public spec: snappy format_description.txt):
    * little-endian varint uncompressed length, then tagged elements —
    * literals (tag 00, 1-byte lengths < 61, else 1-4 extra LE length
    * bytes), copies with 1-byte (tag 01, len 4-11, 11-bit offset), 2-byte
    * (tag 10), or 4-byte (tag 11) little-endian offsets. */
  private[graft] def snappyDecompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    // varint preamble
    var expected = 0L
    var shift = 0
    var more = true
    while (more) {
      require(s < sEnd && shift <= 28, "bad snappy length varint")
      val b = src(s) & 0xff
      s += 1
      expected |= (b & 0x7fL) << shift
      shift += 7
      more = (b & 0x80) != 0
    }
    require(expected == dstLen,
      s"snappy preamble says $expected bytes, split expects $dstLen")
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (d < dEnd) {
      require(s < sEnd, "truncated snappy stream")
      val tag = src(s) & 0xff
      s += 1
      (tag & 3) match {
        case 0 =>
          var len = (tag >>> 2) + 1
          if (len > 60) {
            val extra = len - 60
            require(s + extra <= sEnd, "truncated snappy literal length")
            len = 0
            (0 until extra).foreach(k => len |= (src(s + k) & 0xff) << (8 * k))
            len += 1
            s += extra
          }
          require(s + len <= sEnd && d + len <= dEnd,
            s"snappy literal overruns (len=$len)")
          System.arraycopy(src, s, dst, d, len)
          s += len
          d += len
        case c =>
          val (len, offset) = c match {
            case 1 =>
              require(s < sEnd, "truncated snappy copy1")
              val o = ((tag >>> 5) << 8) | (src(s) & 0xff)
              s += 1
              (((tag >>> 2) & 7) + 4, o)
            case 2 =>
              require(s + 2 <= sEnd, "truncated snappy copy2")
              val o = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
              s += 2
              ((tag >>> 2) + 1, o)
            case _ =>
              require(s + 4 <= sEnd, "truncated snappy copy4")
              val o = le32(src, s)
              s += 4
              ((tag >>> 2) + 1, o)
          }
          require(offset > 0 && d - offset >= dstOff, s"bad snappy offset $offset")
          require(d + len <= dEnd, s"snappy copy overruns (len=$len)")
          var i = 0 // byte-wise: copies may overlap their own output
          while (i < len) { dst(d + i) = dst(d + i - offset); i += 1 }
          d += len
      }
    }
  }

  /** Greedy raw-snappy compressor (hash probe + 2-byte-offset copies) —
    * real fixtures the reference snappy implementation also decodes. */
  private[graft] def snappyCompress(src: Array[Byte], maxLen: Int): Array[Byte] = {
    val n = src.length
    val out = new Array[Byte](maxLen)
    var d = 0
    // varint preamble
    var v = n
    while (v >= 0x80) {
      if (d >= maxLen) return null
      out(d) = ((v & 0x7f) | 0x80).toByte; d += 1; v >>>= 7
    }
    if (d >= maxLen) return null
    out(d) = v.toByte; d += 1
    var anchor = 0
    def flushLits(until: Int): Boolean = {
      var a = anchor
      while (a < until) {
        val run = math.min(60, until - a)
        if (d + 1 + run > maxLen) return false
        out(d) = ((run - 1) << 2).toByte
        d += 1
        System.arraycopy(src, a, out, d, run)
        d += run
        a += run
      }
      anchor = until
      true
    }
    val table = new Array[Int](4096)
    java.util.Arrays.fill(table, -1)
    def hash(i: Int): Int = {
      val w = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
      (w * -1640531535) >>> 20
    }
    var i = 0
    while (i < n - 4) {
      val h = hash(i)
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 0xffff &&
          src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
          src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)) {
        var len = 4
        while (i + len < n && src(cand + len) == src(i + len)) len += 1
        if (!flushLits(i)) return null
        var rem = len
        while (rem > 0) { // copy2 elements carry at most 64 bytes each
          val take = math.min(64, rem)
          if (take < 4) { anchor = i + len - rem; rem = 0 } // tail rides as literals
          else {
            if (d + 3 > maxLen) return null
            out(d) = (((take - 1) << 2) | 2).toByte
            out(d + 1) = ((i - cand) & 0xff).toByte
            out(d + 2) = (((i - cand) >>> 8) & 0xff).toByte
            d += 3
            rem -= take
            if (rem == 0) anchor = i + len
          }
        }
        i += len
      } else i += 1
    }
    if (!flushLits(n)) return null
    java.util.Arrays.copyOf(out, d)
  }

  /** LZ4 BLOCK format decode (public spec: lz4_Block_format.md): token =
    * (literal-length nibble, match-length nibble), 255-extension bytes,
    * little-endian 2-byte match offset, minimum match 4. */
  private[graft] def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    var s = srcOff
    val sEnd = srcOff + srcLen
    var d = dstOff
    val dEnd = dstOff + dstLen
    while (d < dEnd) {
      require(s < sEnd, "truncated lz4 block (no token)")
      val token = src(s) & 0xff
      s += 1
      var litLen = token >>> 4
      if (litLen == 15) {
        var x = 0
        do {
          x = src(s) & 0xff; s += 1; litLen += x
        } while (x == 255)
      }
      require(s + litLen <= sEnd && d + litLen <= dEnd,
        s"lz4 literal run overruns (lit=$litLen)")
      System.arraycopy(src, s, dst, d, litLen)
      s += litLen
      d += litLen
      if (d < dEnd) { // last sequence is literals-only and has no match part
        require(s + 2 <= sEnd, "truncated lz4 block (no match offset)")
        val offset = (src(s) & 0xff) | ((src(s + 1) & 0xff) << 8)
        s += 2
        require(offset > 0 && d - offset >= dstOff, s"bad lz4 match offset $offset")
        var matchLen = (token & 0x0f) + 4
        if ((token & 0x0f) == 15) {
          var x = 0
          do {
            x = src(s) & 0xff; s += 1; matchLen += x
          } while (x == 255)
        }
        require(d + matchLen <= dEnd, s"lz4 match overruns (len=$matchLen)")
        var i = 0 // byte-wise: matches may overlap their own output
        while (i < matchLen) {
          dst(d + i) = dst(d + i - offset)
          i += 1
        }
        d += matchLen
      }
    }
  }

  private def inflateInto(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(src, srcOff, srcLen)
    var off = dstOff
    val end = dstOff + dstLen
    while (off < end && !inf.finished()) {
      val n = inf.inflate(dst, off, end - off)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated zlib split in blosc block")
      off += n
    }
    inf.end()
    require(off == end, s"zlib split inflated ${off - dstOff} of $dstLen bytes")
  }

  /** Greedy LZ4 block compressor (hash-chain-free: single-probe hash table,
    * like LZ4_compress_default's fast path) — enough to produce REAL
    * compressed fixtures for the decoder spec and blosc-packed stores other
    * blosc implementations can read. Returns null when `src` doesn't fit in
    * `maxLen` (caller then stores the split raw, as c-blosc does). */
  private[graft] def lz4Compress(src: Array[Byte], maxLen: Int): Array[Byte] = {
    val n = src.length
    val out = new Array[Byte](maxLen)
    var d = 0
    val table = new Array[Int](4096)
    java.util.Arrays.fill(table, -1)
    def hash(i: Int): Int = {
      val v = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) |
        ((src(i + 2) & 0xff) << 16) | ((src(i + 3) & 0xff) << 24)
      (v * -1640531535) >>> 20 // Fibonacci hash to 12 bits
    }
    var anchor = 0
    var i = 0
    // spec: the last match must start at least 12 bytes before block end,
    // and the last 5 bytes are always literals
    val matchLimit = n - 12
    def emit(litEnd: Int, matchLen: Int, offset: Int): Boolean = {
      val litLen = litEnd - anchor
      var need = 1 + litLen / 255 + 1 + litLen +
        (if (matchLen >= 0) 2 + (math.max(0, matchLen - 4)) / 255 + 1 else 0)
      if (d + need >= maxLen) return false
      val litNib = math.min(litLen, 15)
      val matNib = if (matchLen >= 0) math.min(matchLen - 4, 15) else 0
      out(d) = ((litNib << 4) | matNib).toByte
      d += 1
      if (litLen >= 15) {
        var rest = litLen - 15
        while (rest >= 255) { out(d) = -1; d += 1; rest -= 255 }
        out(d) = rest.toByte
        d += 1
      }
      System.arraycopy(src, anchor, out, d, litLen)
      d += litLen
      if (matchLen >= 0) {
        out(d) = offset.toByte
        out(d + 1) = (offset >>> 8).toByte
        d += 2
        if (matchLen - 4 >= 15) {
          var rest = matchLen - 4 - 15
          while (rest >= 255) { out(d) = -1; d += 1; rest -= 255 }
          out(d) = rest.toByte
          d += 1
        }
      }
      true
    }
    while (i < matchLimit) {
      val h = hash(i)
      val cand = table(h)
      table(h) = i
      if (cand >= 0 && i - cand <= 0xffff &&
          src(cand) == src(i) && src(cand + 1) == src(i + 1) &&
          src(cand + 2) == src(i + 2) && src(cand + 3) == src(i + 3)) {
        var len = 4
        // matches may not cover the final 5 literal bytes
        while (i + len < n - 5 && src(cand + len) == src(i + len)) len += 1
        if (!emit(i, len, i - cand)) return null
        i += len
        anchor = i
      } else i += 1
    }
    if (!emit(n, -1, 0)) return null // trailing literals
    java.util.Arrays.copyOf(out, d)
  }

  /** Compress `data` into one blosc chunk (single block, c-blosc split
    * mode when `typesize` divides the length, per-split stored-raw fallback
    * on incompressible data — exactly the states [[decompress]] handles).
    * `shuffle` applies the per-block byte transpose real zarr stores use;
    * `cname` picks the block codec (lz4 default; blosclz, snappy, zstd,
    * zlib cover every cname numcodecs ships). */
  def compress(data: Array[Byte], typesize: Int, shuffle: Boolean,
      cname: String = "lz4", bitShuffle: Boolean = false): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize")
    require(!(shuffle && bitShuffle), "byte- and bit-shuffle are exclusive")
    val codecId = cname match {
      case "blosclz" => 0
      case "lz4" | "lz4hc" => 1
      case "snappy" => 2
      case "zlib" => 3
      case "zstd" => 4
      case other => throw UnsupportedBlosc(s"cname $other")
    }
    val nbytes = data.length
    val doShuffle = shuffle && typesize > 1
    val block =
      if (bitShuffle) {
        val sh = new Array[Byte](nbytes)
        bitShuffleBlock(data, 0, nbytes, typesize, sh, 0)
        sh
      } else if (doShuffle) {
        val elems = nbytes / typesize
        val sh = new Array[Byte](nbytes)
        var j = 0
        while (j < typesize) {
          var i = 0
          while (i < elems) {
            sh(j * elems + i) = data(i * typesize + j)
            i += 1
          }
          j += 1
        }
        val tail = nbytes % typesize
        if (tail > 0) System.arraycopy(data, nbytes - tail, sh, nbytes - tail, tail)
        sh
      } else data
    val nsplits = if (typesize > 1 && nbytes % typesize == 0) typesize else 1
    val neblock = nbytes / nsplits
    def packSplit(split: Array[Byte]): Array[Byte] =
      if (neblock < 16) null
      else codecId match {
        case 0 => blosclzCompress(split, neblock - 1)
        case 1 => lz4Compress(split, neblock - 1)
        case 2 => snappyCompress(split, neblock - 1)
        case 3 =>
          val d = new java.util.zip.Deflater()
          d.setInput(split); d.finish()
          val buf = new Array[Byte](neblock - 1)
          val n = d.deflate(buf)
          val done = d.finished()
          d.end()
          if (!done) null else java.util.Arrays.copyOf(buf, n)
        case 4 =>
          val z = Zstd.compressStore(split)
          if (z.length >= neblock) null else z
        case _ => null
      }
    val sections = (0 until nsplits).map { s =>
      val split = java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock)
      val packed = packSplit(split)
      if (packed == null) (neblock, split) else (packed.length, packed)
    }
    val payload = sections.map(_._1 + 4).sum
    val cbytes = 16 + 4 + payload // one block -> one bstart entry
    val out = new Array[Byte](cbytes)
    out(0) = 2 // format version (blosc 1.x)
    out(1) = 1 // codec format version
    val splitFlag = if (nsplits == 1) 0x10 else 0
    out(2) = ((if (doShuffle) 0x01 else 0) | (if (bitShuffle) 0x04 else 0) |
      splitFlag | (codecId << 5)).toByte
    out(3) = typesize.toByte
    putLe32(out, 4, nbytes)
    putLe32(out, 8, math.max(nbytes, 1)) // blocksize = whole buffer
    putLe32(out, 12, cbytes)
    putLe32(out, 16, 20) // the single block starts right after bstarts
    var off = 20
    sections.foreach { case (csize, bytes) =>
      putLe32(out, off, csize)
      off += 4
      System.arraycopy(bytes, 0, out, off, bytes.length)
      off += bytes.length
    }
    out
  }
}
