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
  * bit 2 bit-shuffle (directed error), bit 4 dont-split, bits 5-7 the
  * codec (0 blosclz, 1 lz4/lz4hc, 2 snappy, 3 zlib, 4 zstd).
  *
  * Non-memcpyed payload: `nblocks` little-endian int32 block starts
  * (offsets from the chunk start), then per block `nsplits` sections of
  * `[int32 csize][payload]` where nsplits = typesize unless dont-split or
  * the leftover block, and csize == split-size marks a stored-raw split.
  * Byte-shuffle is per block: split the block into typesize streams of
  * byte i of every element (trailing `blocksize % typesize` bytes ride
  * verbatim).
  *
  * Codecs: lz4 (the default cname; block format decoded here), zstd
  * (each split is a complete zstd frame — [[Zstd]]), zlib (java.util.zip),
  * stored-raw splits. blosclz/snappy raise directed errors — rewrite those
  * stores with `zarr.copy_store` to lz4/zstd/zlib.
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
    if ((flags & 0x04) != 0) throw UnsupportedBlosc("bit-shuffle filter")
    val shuffled = (flags & 0x01) != 0 && typesize > 1
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
          case 1 => lz4Decompress(raw, src, csize, block, blockOff, neblock)
          case 3 => inflateInto(raw, src, csize, block, blockOff, neblock)
          case 4 => Zstd.decompressInto(raw, src, csize, block, blockOff, neblock)
          case 0 => throw UnsupportedBlosc("blosclz codec (rewrite with zarr.copy_store to lz4/zstd/zlib)")
          case 2 => throw UnsupportedBlosc("snappy codec (rewrite with zarr.copy_store to lz4/zstd/zlib)")
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
      } else System.arraycopy(block, 0, out, dstOff, bsize)
      dstOff += bsize
      b += 1
    }
    out
  }

  /** LZ4 BLOCK format decode (public spec: lz4_Block_format.md): token =
    * (literal-length nibble, match-length nibble), 255-extension bytes,
    * little-endian 2-byte match offset, minimum match 4. */
  private[zarr] def lz4Decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
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
  private[zarr] def lz4Compress(src: Array[Byte], maxLen: Int): Array[Byte] = {
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

  /** Compress `data` into one blosc-lz4 chunk (single block, c-blosc split
    * mode when `typesize` divides the length, per-split stored-raw fallback
    * on incompressible data — exactly the states [[decompress]] handles).
    * `shuffle` applies the per-block byte transpose real zarr stores use. */
  def compress(data: Array[Byte], typesize: Int, shuffle: Boolean): Array[Byte] = {
    require(typesize >= 1 && typesize <= 255, s"typesize $typesize")
    val nbytes = data.length
    val doShuffle = shuffle && typesize > 1
    val block =
      if (doShuffle) {
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
    val sections = (0 until nsplits).map { s =>
      val split = java.util.Arrays.copyOfRange(block, s * neblock, (s + 1) * neblock)
      val packed = if (neblock >= 16) lz4Compress(split, neblock - 1) else null
      if (packed == null) (neblock, split) else (packed.length, packed)
    }
    val payload = sections.map(_._1 + 4).sum
    val cbytes = 16 + 4 + payload // one block -> one bstart entry
    val out = new Array[Byte](cbytes)
    out(0) = 2 // format version (blosc 1.x)
    out(1) = 1 // lz4 format version
    val splitFlag = if (nsplits == 1) 0x10 else 0
    out(2) = ((if (doShuffle) 0x01 else 0) | splitFlag | (1 << 5)).toByte // lz4
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
