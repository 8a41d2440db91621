package graft.sources.zarr

/** Pure-JVM zstd frame DECODER (RFC 8878 / the public
  * `zstd_compression_format.md`), sized for the two places Zarr stores
  * need it:
  *
  *  - `blosc` chunks with `cname='zstd'` — each blosc split is one complete
  *    zstd frame (c-blosc compresses splits independently);
  *  - the zarr v3 `zstd` codec — zarr-python v3's DEFAULT compressor — and
  *    the v2 numcodecs `{"id": "zstd"}` compressor, where the whole chunk
  *    object is one frame.
  *
  * The reference reads these through numcodecs' libzstd binding
  * (xql/src/xql/open.py:30-66 hands the store to zarr/numcodecs); here the
  * format is decoded directly so the source needs no native library.
  *
  * Coverage: raw/RLE/compressed blocks; raw/RLE/Huffman-compressed/treeless
  * literals (1 and 4 streams); direct and FSE-compressed Huffman weights;
  * predefined/RLE/FSE-compressed/repeat sequence tables; the three-slot
  * repeat-offset history with the literals-length-0 shift; frames with and
  * without Frame_Content_Size (callers always know the decoded chunk size,
  * so size-less streaming frames decode against the caller's hint);
  * skippable frames; the content checksum is consumed, not verified
  * (integrity is the store's job — Fletcher/CRC live a layer up in the
  * formats that want it). Dictionary frames raise a directed error: no
  * Zarr writer emits them (numcodecs Zstd has no dict parameter).
  *
  * Everything here is implemented from the public format document; the
  * decoder is exercised against frames produced by the real reference
  * encoder in ZstdSpec.
  */
object Zstd {

  final case class UnsupportedZstd(detail: String) extends
    UnsupportedOperationException(s"zstd feature not supported: $detail")

  private def bad(msg: String): Nothing =
    throw new IllegalArgumentException(s"corrupt zstd frame: $msg")

  private val Magic = 0xFD2FB528
  private val SkippableMin = 0x184D2A50
  private val SkippableMax = 0x184D2A5F

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode one zstd frame (leading skippable frames are skipped). The
    * decompressed size comes from the frame header when present, else from
    * `sizeHint` (the caller's known chunk size). */
  def decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      sizeHint: Int = -1, dict: Dict = null): Array[Byte] =
    decompressFrameAt(src, srcOff, srcOff + srcLen, sizeHint, dict)._1

  /** A parsed decoding dictionary (RFC 8878 §5): priming content for the
    * match window plus optional pre-built entropy tables and initial
    * repeat offsets. Built once via [[parseDictionary]] and shared across
    * frames (read-only). */
  final class Dict private[Zstd] (
      val id: Long,
      private[Zstd] val content: Array[Byte],
      private[Zstd] val huf: HufTable,
      private[Zstd] val llTable: FseTable,
      private[Zstd] val mlTable: FseTable,
      private[Zstd] val offTable: FseTable,
      private[Zstd] val rep1: Long,
      private[Zstd] val rep2: Long,
      private[Zstd] val rep3: Long) extends Serializable

  private val DictMagic = 0xec30a437

  /** Parse a dictionary blob. With the `0xEC30A437` magic: dict id,
    * entropy tables (Huffman literals, then FSE offsets / match lengths /
    * literals lengths), three little-endian repeat offsets, then the
    * priming content. Without the magic: a raw-content dictionary (id 0,
    * whole blob primes the window — the RFC 8878 §5 fallback zstd's
    * `-D` accepts). */
  def parseDictionary(b: Array[Byte]): Dict = {
    if (b.length < 8 || le32(b, 0) != DictMagic)
      return new Dict(0L, b, null, null, null, null, 1L, 4L, 8L)
    val id = le32(b, 4) & 0xffffffffL
    if (id == 0) bad("dictionary declares reserved id 0")
    val (huf, hufLen) = readHufTable(b, 8, b.length)
    val fwd = new FwdBits(b, 8 + hufLen, b.length)
    // RFC 8878 §5 order: offsets, match lengths, literals lengths
    val offT = readFseTable(fwd, 31, 8, "dictionary offset")
    val mlT = readFseTable(fwd, 52, 9, "dictionary match-length")
    val llT = readFseTable(fwd, 35, 9, "dictionary literals-length")
    val repOff = fwd.bytePos
    if (repOff + 12 > b.length) bad("dictionary truncated before repeat offsets")
    val r1 = le32(b, repOff) & 0xffffffffL
    val r2 = le32(b, repOff + 4) & 0xffffffffL
    val r3 = le32(b, repOff + 8) & 0xffffffffL
    val content = java.util.Arrays.copyOfRange(b, repOff + 12, b.length)
    if (r1 == 0 || r2 == 0 || r3 == 0 ||
        r1 > content.length || r2 > content.length || r3 > content.length)
      bad(s"dictionary repeat offsets ($r1, $r2, $r3) outside its content")
    new Dict(id, content, huf, llT, mlT, offT, r1, r2, r3)
  }

  /** Skippable frames starting at `off`: total byte length of the run
    * (0 when `off` does not start a skippable frame) — the walk a
    * concatenated-frame file reader makes between data frames. The u32
    * payload size is read UNSIGNED: a signed read would let a crafted
    * size >= 2^31 move the caller's offset backwards, spinning its loop
    * forever. */
  def skippableRunLength(src: Array[Byte], off: Int, end: Int): Int = {
    var o = off
    while (o + 8 <= end && {
        val m = le32(src, o); m >= SkippableMin && m <= SkippableMax }) {
      val payload = le32(src, o + 4) & 0xffffffffL
      if (o + 8 + payload > end) bad("skippable frame overruns input")
      o += (8 + payload).toInt
    }
    o - off
  }

  /** Decode the single data frame beginning at `off0` (leading skippable
    * frames are skipped) and return (decoded bytes, offset just past the
    * frame) — the unit step of a concatenated-frame walk. Unlike
    * [[decompress]] with no hint, a frame that omits Frame_Content_Size
    * decodes into a growing buffer, so foreign streaming frames work. */
  def decompressFrameAt(src: Array[Byte], off0: Int, end: Int,
      sizeHint: Int = -1, dict: Dict = null): (Array[Byte], Int) = {
    var off = off0 + skippableRunLength(src, off0, end)
    if (off + 4 > end || le32(src, off) != Magic) bad("missing frame magic")
    off += 4
    if (off >= end) bad("truncated frame-header descriptor")
    val fhd = src(off) & 0xff
    off += 1
    if ((fhd & 0x08) != 0) bad("reserved frame-header bit set")
    val singleSegment = (fhd & 0x20) != 0
    val checksum = (fhd & 0x04) != 0
    val dictIdBytes = (fhd & 0x03) match {
      case 0 => 0; case 1 => 1; case 2 => 2; case 3 => 4
    }
    if (!singleSegment) { // window descriptor: irrelevant, full output in hand
      if (off >= end) bad("truncated window descriptor")
      off += 1
    }
    if (dictIdBytes > 0) {
      if (off + dictIdBytes > end) bad("truncated dictionary id")
      var dictId = 0L
      var i = 0
      while (i < dictIdBytes) { dictId |= (src(off + i) & 0xffL) << (8 * i); i += 1 }
      off += dictIdBytes
      if (dictId != 0 && (dict == null || dict.id != dictId))
        throw UnsupportedZstd(s"frame references unknown dictionary id " +
          s"$dictId" + (if (dict == null) " (no dictionary provided)"
          else s" (provided dictionary has id ${dict.id})"))
    }
    val fcsBytes = (fhd >>> 6) match {
      case 0 => if (singleSegment) 1 else 0
      case 1 => 2; case 2 => 4; case 3 => 8
    }
    var fcs = -1L
    if (fcsBytes > 0) {
      if (off + fcsBytes > end) bad("truncated frame content size")
      fcs = 0L
      var i = 0
      while (i < fcsBytes) { fcs |= (src(off + i) & 0xffL) << (8 * i); i += 1 }
      if (fcsBytes == 2) fcs += 256
      off += fcsBytes
    }
    // exact length when the header (or the caller) names it; otherwise a
    // growing buffer sized up before each block (one block decodes at most
    // Block_Maximum_Size = 128 KiB)
    val exactLen: Int =
      if (fcs >= 0) {
        if (fcs > Int.MaxValue - 8) throw UnsupportedZstd(
          s"frame content size $fcs exceeds a JVM array")
        fcs.toInt
      } else sizeHint
    var out = new Array[Byte](if (exactLen >= 0) exactLen else 1 << 17)
    var outPos = 0
    def ensure(extra: Int): Unit =
      if (exactLen < 0 && outPos.toLong + extra > out.length) {
        val needed = outPos.toLong + extra
        if (needed > Int.MaxValue - 8) throw UnsupportedZstd(
          s"frame decompresses past $needed bytes — exceeds a JVM array")
        var cap = out.length.toLong
        while (cap < needed) cap = math.min(cap * 2, (Int.MaxValue - 8).toLong)
        out = java.util.Arrays.copyOf(out, cap.toInt)
      }
    val ctx = new FrameCtx(dict)
    var last = false
    while (!last) {
      if (off + 3 > end) bad("truncated block header")
      val bh = (src(off) & 0xff) | ((src(off + 1) & 0xff) << 8) |
        ((src(off + 2) & 0xff) << 16)
      off += 3
      last = (bh & 1) != 0
      val btype = (bh >>> 1) & 3
      val bsize = bh >>> 3
      btype match {
        case 0 => // raw
          ensure(bsize)
          if (off + bsize > end || outPos + bsize > out.length) bad("raw block overruns")
          System.arraycopy(src, off, out, outPos, bsize)
          off += bsize
          outPos += bsize
        case 1 => // RLE: one byte repeated bsize times
          ensure(bsize)
          if (off >= end || outPos + bsize > out.length) bad("rle block overruns")
          java.util.Arrays.fill(out, outPos, outPos + bsize, src(off))
          off += 1
          outPos += bsize
        case 2 =>
          ensure(1 << 17)
          if (off + bsize > end) bad("compressed block overruns input")
          outPos = decodeCompressedBlock(src, off, bsize, out, outPos, ctx)
          off += bsize
        case _ => bad("reserved block type")
      }
    }
    if (checksum) off += 4 // xxh64 low bits: consumed, not verified
    if (exactLen >= 0 && outPos != exactLen)
      bad(s"frame decoded $outPos of $exactLen bytes")
    val res = if (outPos == out.length) out
      else java.util.Arrays.copyOf(out, outPos)
    (res, off)
  }

  /** Decode one frame into a caller buffer slice (the blosc-split shape:
    * expected size known; decodes to a scratch array sized by the frame
    * header, then copies the validated result in). */
  def decompressInto(src: Array[Byte], srcOff: Int, srcLen: Int,
      dst: Array[Byte], dstOff: Int, dstLen: Int): Unit = {
    val res = decompress(src, srcOff, srcLen, dstLen)
    if (res.length != dstLen)
      bad(s"frame decoded ${res.length} bytes, caller expected $dstLen")
    System.arraycopy(res, 0, dst, dstOff, dstLen)
  }

  /** Store-mode ENCODER: one valid zstd frame of raw blocks, with RLE
    * blocks for constant segments (single-segment header + content size —
    * what every zstd reader, including this file's decoder, accepts).
    * Enough for [[ZarrWriter]] to emit `{"id": "zstd"}` / v3 `zstd` fixture
    * stores with zero native code; it makes no attempt at entropy coding
    * (ZstdSpec covers full compressed frames via a real reference encoder). */
  def compressStore(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(data.length + 32)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Int): Unit = { w8(v); w8(v >>> 8); w8(v >>> 16); w8(v >>> 24) }
    w32(Magic)
    val n = data.length
    // single-segment flag + FCS field size by RFC 8878 table
    if (n <= 255) { w8(0x20); w8(n) }                   // 1-byte FCS
    else if (n <= 65535 + 256) {                        // 2-byte FCS (+256 bias)
      w8(0x60); val v = n - 256; w8(v); w8(v >>> 8)
    } else { w8(0xA0); w32(n) }                         // 4-byte FCS
    val segMax = 65536
    var off = 0
    var emitted = false
    while (off < n || !emitted) {
      val len = math.min(segMax, n - off)
      val last = off + len == n
      val constant = len > 8 && {
        val b = data(off)
        var i = off + 1
        while (i < off + len && data(i) == b) i += 1
        i == off + len
      }
      val btype = if (constant) 1 else 0
      val bh = (len << 3) | (btype << 1) | (if (last) 1 else 0)
      w8(bh); w8(bh >>> 8); w8(bh >>> 16)
      if (constant) w8(data(off))
      else out.write(data, off, len)
      off += len
      emitted = true
    }
    out.toByteArray
  }

  // ---------------------------------------------------------------- frames

  /** Per-frame decoder state that persists across blocks: the previous
    * Huffman literals table (treeless literals), the previous sequence FSE
    * tables (Repeat_Mode), and the three-slot repeat-offset history. */
  private final class FrameCtx(dict: Dict = null) {
    // dictionary state seeds the frame: entropy tables are valid targets
    // for the first block's repeat/treeless modes, repeat offsets start
    // from the dictionary's, and matches may reach into its content
    var huf: HufTable = if (dict != null) dict.huf else null
    var llTable: FseTable = if (dict != null) dict.llTable else null
    var mlTable: FseTable = if (dict != null) dict.mlTable else null
    var offTable: FseTable = if (dict != null) dict.offTable else null
    var rep1 = if (dict != null) dict.rep1 else 1L
    var rep2 = if (dict != null) dict.rep2 else 4L
    var rep3 = if (dict != null) dict.rep3 else 8L
    val dictContent: Array[Byte] = if (dict != null) dict.content else null
  }

  private def decodeCompressedBlock(src: Array[Byte], blockOff: Int,
      blockSize: Int, out: Array[Byte], outStart: Int, ctx: FrameCtx): Int = {
    val blockEnd = blockOff + blockSize
    var off = blockOff

    // ---- literals section
    if (off >= blockEnd) bad("missing literals section")
    val b0 = src(off) & 0xff
    val litType = b0 & 3
    val sizeFormat = (b0 >>> 2) & 3
    var literals: Array[Byte] = null
    litType match {
      case 0 | 1 => // raw | RLE
        val hdrLen0 = if ((sizeFormat & 1) == 0) 1 else if (sizeFormat == 1) 2 else 3
        if (off + hdrLen0 > blockEnd) bad("truncated literals header")
        val (regen, hdrLen) =
          if ((sizeFormat & 1) == 0) (b0 >>> 3, 1)
          else if (sizeFormat == 1)
            ((b0 >>> 4) | ((src(off + 1) & 0xff) << 4), 2)
          else
            ((b0 >>> 4) | ((src(off + 1) & 0xff) << 4) |
              ((src(off + 2) & 0xff) << 12), 3)
        off += hdrLen
        literals = new Array[Byte](regen)
        if (litType == 0) {
          if (off + regen > blockEnd) bad("raw literals overrun block")
          System.arraycopy(src, off, literals, 0, regen)
          off += regen
        } else {
          if (off >= blockEnd) bad("truncated RLE literal byte")
          java.util.Arrays.fill(literals, src(off))
          off += 1
        }
      case _ => // 2 compressed | 3 treeless
        val fourStreams = sizeFormat != 0
        val hdrLen0 = sizeFormat match {
          case 0 | 1 => 3; case 2 => 4; case _ => 5
        }
        if (off + hdrLen0 > blockEnd) bad("truncated literals header")
        val (regen, comp, hdrLen) = sizeFormat match {
          case 0 | 1 =>
            val h = (b0 | ((src(off + 1) & 0xff) << 8) |
              ((src(off + 2) & 0xff) << 16))
            ((h >>> 4) & 0x3ff, (h >>> 14) & 0x3ff, 3)
          case 2 =>
            val h = le32(src, off)
            ((h >>> 4) & 0x3fff, ((h >>> 18) & 0x3fff), 4)
          case _ =>
            val h = le32(src, off).toLong & 0xffffffffL
            val h4 = src(off + 4) & 0xffL
            val v = h | (h4 << 32)
            (((v >>> 4) & 0x3ffff).toInt, ((v >>> 22) & 0x3ffff).toInt, 5)
        }
        off += hdrLen
        val litEnd = off + comp
        if (litEnd > blockEnd) bad("compressed literals overrun block")
        var streamsOff = off
        if (litType == 2) {
          val (tbl, consumed) = readHufTable(src, off, litEnd)
          ctx.huf = tbl
          streamsOff = off + consumed
        } else if (ctx.huf == null)
          bad("treeless literals with no previous Huffman table")
        literals = new Array[Byte](regen)
        if (!fourStreams) {
          hufDecodeStream(src, streamsOff, litEnd, ctx.huf, literals, 0, regen)
        } else {
          if (streamsOff + 6 > litEnd) bad("missing 4-stream jump table")
          val s1 = (src(streamsOff) & 0xff) | ((src(streamsOff + 1) & 0xff) << 8)
          val s2 = (src(streamsOff + 2) & 0xff) | ((src(streamsOff + 3) & 0xff) << 8)
          val s3 = (src(streamsOff + 4) & 0xff) | ((src(streamsOff + 5) & 0xff) << 8)
          val p = streamsOff + 6
          val seg = (regen + 3) / 4
          val segLast = regen - 3 * seg
          if (segLast < 0) bad("4-stream literals shorter than 3 segments")
          if (p + s1 + s2 + s3 > litEnd) bad("4-stream jump table overruns")
          hufDecodeStream(src, p, p + s1, ctx.huf, literals, 0, seg)
          hufDecodeStream(src, p + s1, p + s1 + s2, ctx.huf, literals, seg, seg)
          hufDecodeStream(src, p + s1 + s2, p + s1 + s2 + s3, ctx.huf,
            literals, 2 * seg, seg)
          hufDecodeStream(src, p + s1 + s2 + s3, litEnd, ctx.huf,
            literals, 3 * seg, segLast)
        }
        off = litEnd
    }

    // ---- sequences section
    if (off >= blockEnd) bad("missing sequences section")
    val s0 = src(off) & 0xff
    off += 1
    var nbSeq = 0
    if (s0 == 0) nbSeq = 0
    else if (s0 < 128) nbSeq = s0
    else if (s0 < 255) {
      if (off >= blockEnd) bad("truncated sequences count")
      nbSeq = ((s0 - 128) << 8) | (src(off) & 0xff)
      off += 1
    } else {
      if (off + 2 > blockEnd) bad("truncated sequences count")
      nbSeq = ((src(off) & 0xff) | ((src(off + 1) & 0xff) << 8)) + 0x7f00
      off += 2
    }
    var outPos = outStart
    if (nbSeq == 0) {
      if (off != blockEnd) bad("trailing bytes after literals-only block")
      System.arraycopy(literals, 0, out, outPos, literals.length)
      return outPos + literals.length
    }
    if (off >= blockEnd) bad("missing sequence-modes byte")
    val modes = src(off) & 0xff
    off += 1
    if ((modes & 3) != 0) bad("reserved sequence-mode bits set")

    val fwd = new FwdBits(src, off, blockEnd)
    ctx.llTable = readSeqTable((modes >>> 6) & 3, fwd, ctx.llTable,
      LlDefault, 6, 35, 9, "literals-length")
    ctx.offTable = readSeqTable((modes >>> 4) & 3, fwd, ctx.offTable,
      OffDefault, 5, 31, 8, "offset")
    ctx.mlTable = readSeqTable((modes >>> 2) & 3, fwd, ctx.mlTable,
      MlDefault, 6, 52, 9, "match-length")
    off = fwd.bytePos

    val bits = new BackBits(src, off, blockEnd)
    var llState = bits.read(ctx.llTable.log).toInt
    var offState = bits.read(ctx.offTable.log).toInt
    var mlState = bits.read(ctx.mlTable.log).toInt
    if (bits.overflowed) bad("sequence bitstream shorter than initial states")

    var litPos = 0
    var seq = 0
    while (seq < nbSeq) {
      val offCode = ctx.offTable.symbol(offState)
      val mlCode = ctx.mlTable.symbol(mlState)
      val llCode = ctx.llTable.symbol(llState)
      if (offCode > 31) bad(s"offset code $offCode")
      if (mlCode > 52) bad(s"match-length code $mlCode")
      if (llCode > 35) bad(s"literals-length code $llCode")
      // extra bits read in offset, match-length, literals-length order
      val offValue = (1L << offCode) + bits.read(offCode)
      val matchLen = MlBase(mlCode) + bits.read(MlBits(mlCode)).toInt
      val litLen = LlBase(llCode) + bits.read(LlBits(llCode)).toInt
      if (bits.overflowed) bad("sequence bitstream exhausted mid-sequence")
      // repeat-offset history (the litLen==0 shift per the format doc)
      val offset: Long =
        if (offValue > 3) {
          val o = offValue - 3
          ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = o
          o
        } else {
          val idx = if (litLen == 0) offValue + 1 else offValue
          idx match {
            case 1 => ctx.rep1
            case 2 =>
              val o = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = o; o
            case 3 =>
              val o = ctx.rep3; ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1
              ctx.rep1 = o; o
            case _ => // idx == 4: rep1 - 1
              val o = ctx.rep1 - 1
              if (o <= 0) bad("repeat offset underflow")
              ctx.rep3 = ctx.rep2; ctx.rep2 = ctx.rep1; ctx.rep1 = o
              o
          }
        }
      // execute: literals then match copy (byte-wise — matches overlap)
      if (litPos + litLen > literals.length) bad("literals overrun")
      if (outPos + litLen + matchLen > out.length) bad("output overrun")
      System.arraycopy(literals, litPos, out, outPos, litLen)
      litPos += litLen
      outPos += litLen
      val o = offset.toInt
      if (offset <= outPos) {
        var i = 0
        while (i < matchLen) {
          out(outPos + i) = out(outPos + i - o)
          i += 1
        }
      } else {
        // the window extends backwards into the dictionary content
        val dc = ctx.dictContent
        val dcLen = if (dc == null) 0 else dc.length
        if (offset > outPos + dcLen)
          bad(s"match offset $offset before frame (and dictionary) start")
        var i = 0
        while (i < matchLen) {
          val si = outPos + i - o
          out(outPos + i) = if (si >= 0) out(si) else dc(dcLen + si)
          i += 1
        }
      }
      outPos += matchLen
      seq += 1
      if (seq < nbSeq) { // last sequence skips the state updates
        llState = ctx.llTable.next(llState, bits)
        mlState = ctx.mlTable.next(mlState, bits)
        offState = ctx.offTable.next(offState, bits)
        if (bits.overflowed) bad("sequence bitstream exhausted mid-update")
      }
    }
    if (bits.remaining != 0) bad(s"${bits.remaining} unconsumed sequence bits")
    val tail = literals.length - litPos
    if (outPos + tail > out.length) bad("trailing literals overrun output")
    System.arraycopy(literals, litPos, out, outPos, tail)
    outPos + tail
  }

  // ----------------------------------------------------------- bitstreams

  /** Backward bitstream (FSE/Huffman payloads): bits were written LSB-up
    * from the first byte; the final byte carries a 1-bit sentinel above the
    * last written bit, and reading proceeds downward from it, each read
    * returning its bits with the highest stream position as the MSB. */
  private final class BackBits(buf: Array[Byte], begin: Int, end: Int) {
    private var bitPos: Int = {
      if (end <= begin) bad("empty backward bitstream")
      val lastB = buf(end - 1) & 0xff
      if (lastB == 0) bad("backward bitstream with zero sentinel byte")
      (end - 1 - begin) * 8 + (31 - Integer.numberOfLeadingZeros(lastB))
    }
    def remaining: Int = bitPos
    def overflowed: Boolean = bitPos < 0
    /** n ≤ 56; missing bits below position 0 read as 0 (the Huffman final
      * peek relies on that), but [[overflowed]] flags real overruns. */
    def read(n: Int): Long = {
      bitPos -= n
      if (n == 0) 0L else gather(bitPos, n)
    }
    def peek(n: Int): Int = gather(bitPos - n, n).toInt
    def skip(n: Int): Unit = bitPos -= n
    private def gather(pos: Int, n: Int): Long = {
      var v = 0L
      var i = n - 1
      while (i >= 0) {
        val p = pos + i
        val bit =
          if (p < 0) 0L
          else ((buf(begin + (p >> 3)) >> (p & 7)) & 1).toLong
        v = (v << 1) | bit
        i -= 1
      }
      v
    }
  }

  /** Forward bitstream (FSE table descriptions): values read LSB-first.
    * Bounded by `limit` — a table description that runs past its block (or
    * Huffman-weights region) raises the directed corrupt-frame error rather
    * than reading an adjacent split's bytes. */
  private final class FwdBits(buf: Array[Byte], start: Int, limit: Int) {
    private var bit = 0
    def peek(n: Int): Int = {
      if (start + ((bit + n - 1) >> 3) >= limit)
        bad("FSE table description overruns its region")
      var v = 0
      var i = 0
      while (i < n) {
        val p = bit + i
        v |= ((buf(start + (p >> 3)) >> (p & 7)) & 1) << i
        i += 1
      }
      v
    }
    def skip(n: Int): Unit = bit += n
    def read(n: Int): Int = { val v = peek(n); bit += n; v }
    def alignToByte(): Unit = bit = (bit + 7) & ~7
    def bytePos: Int = { alignToByte(); start + (bit >> 3) }
  }

  // ------------------------------------------------------------------ FSE

  /** Decode table for one FSE symbol stream. */
  private final class FseTable(val log: Int, val symbol: Array[Int],
      nbBits: Array[Int], newState: Array[Int]) extends Serializable {
    def next(state: Int, bits: BackBits): Int =
      newState(state) + bits.read(nbBits(state)).toInt
  }

  private def highBit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Read an FSE table description (RFC 8878 §4.1.1) from a forward
    * bitstream: 4-bit accuracy-log offset, then the variable-bit
    * probability loop with the 2-bit zero-repeat escape. */
  private def readFseTable(fwd: FwdBits, maxSymbol: Int, maxLog: Int,
      what: String): FseTable = {
    val accuracyLog = 5 + fwd.read(4)
    if (accuracyLog > maxLog)
      bad(s"$what FSE accuracy log $accuracyLog exceeds $maxLog")
    val tableSize = 1 << accuracyLog
    val probs = new Array[Int](maxSymbol + 1)
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    var sym = 0
    var prev0 = false
    while (remaining > 1 && sym <= maxSymbol) {
      if (prev0) {
        while (fwd.peek(2) == 3) { fwd.skip(2); sym += 3 }
        sym += fwd.read(2)
        if (sym > maxSymbol + 1) bad(s"$what zero-repeat past max symbol")
        prev0 = false
      } else {
        val max = (threshold << 1) - 1 - remaining
        var count = fwd.peek(nbBits)
        if ((count & (threshold - 1)) < max) {
          count &= threshold - 1
          fwd.skip(nbBits - 1)
        } else {
          count &= (threshold << 1) - 1
          if (count >= threshold) count -= max
          fwd.skip(nbBits)
        }
        count -= 1 // -1 encodes the "less than 1" probability
        remaining -= math.abs(count)
        if (sym > maxSymbol) bad(s"$what probabilities past max symbol")
        probs(sym) = count
        sym += 1
        prev0 = count == 0
        while (remaining > 1 && remaining < threshold) {
          nbBits -= 1
          threshold >>>= 1
        }
      }
    }
    if (remaining != 1) bad(s"$what FSE probabilities sum mismatch")
    fwd.alignToByte()
    buildFseTable(accuracyLog, probs)
  }

  /** Spread symbols and derive (nbBits, baseline) per RFC 8878 §4.1.1. */
  private def buildFseTable(log: Int, probs: Array[Int]): FseTable = {
    val size = 1 << log
    val symbol = new Array[Int](size)
    val nbBits = new Array[Int](size)
    val newState = new Array[Int](size)
    var high = size - 1
    var s = 0
    while (s < probs.length) { // "less than 1" symbols own the table top
      if (probs(s) == -1) { symbol(high) = s; high -= 1 }
      s += 1
    }
    val step = (size >> 1) + (size >> 3) + 3
    val mask = size - 1
    var pos = 0
    s = 0
    while (s < probs.length) {
      var i = 0
      while (i < probs(s)) {
        symbol(pos) = s
        do pos = (pos + step) & mask while (pos > high)
        i += 1
      }
      s += 1
    }
    if (pos != 0) bad("FSE symbol spread did not close")
    val counter = new Array[Int](probs.length)
    s = 0
    while (s < probs.length) {
      counter(s) = if (probs(s) == -1) 1 else probs(s)
      s += 1
    }
    var u = 0
    while (u < size) {
      val sy = symbol(u)
      val nextState = counter(sy)
      counter(sy) += 1
      nbBits(u) = log - highBit(nextState)
      newState(u) = (nextState << nbBits(u)) - size
      u += 1
    }
    new FseTable(log, symbol, nbBits, newState)
  }

  private def rleTable(sym: Int): FseTable =
    new FseTable(0, Array(sym), Array(0), Array(0))

  /** Resolve one sequence table per its 2-bit compression mode. */
  private def readSeqTable(mode: Int, fwd: FwdBits, prev: FseTable,
      default: FseTable, defaultLog: Int, maxSymbol: Int, maxLog: Int,
      what: String): FseTable = mode match {
    case 0 => default
    case 1 =>
      val sym = fwd.read(8)
      if (sym > maxSymbol) bad(s"$what RLE symbol $sym")
      rleTable(sym)
    case 2 => readFseTable(fwd, maxSymbol, maxLog, what)
    case _ =>
      if (prev == null) bad(s"$what repeat mode with no previous table")
      prev
  }

  // predefined sequence distributions (RFC 8878 §3.1.1.3.2.2)
  private val LlDefault: FseTable = buildFseTable(6, Array(
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1))
  private val MlDefault: FseTable = buildFseTable(6, Array(
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1))
  private val OffDefault: FseTable = buildFseTable(5, Array(
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1))

  // code → (baseline, extra bits) for literals lengths and match lengths
  private val LlBase = Array(
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768, 65536)
  private val LlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12,
    13, 14, 15, 16)
  private val MlBase = Array(
    3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11,
    12, 13, 14, 15, 16)

  // -------------------------------------------------------------- Huffman

  /** Canonical Huffman decode table: indexed by the next `maxBits` stream
    * bits (MSB-first), yielding (symbol, code length). */
  private final class HufTable(val maxBits: Int, val sym: Array[Byte],
      val len: Array[Byte]) extends Serializable

  /** Read a Huffman tree description (direct 4-bit weights, or
    * FSE-compressed weights via two interleaved states). Returns the table
    * and the description's byte length. */
  private def readHufTable(src: Array[Byte], off: Int,
      limit: Int): (HufTable, Int) = {
    if (off >= limit) bad("missing Huffman tree description")
    val hb = src(off) & 0xff
    var weights: Array[Int] = null
    var consumed = 0
    if (hb >= 128) { // direct: two 4-bit weights per byte
      val n = hb - 127
      if (off + 1 + (n + 1) / 2 > limit) bad("direct Huffman weights overrun")
      weights = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = src(off + 1 + i / 2) & 0xff
        weights(i) = if (i % 2 == 0) b >>> 4 else b & 0x0f
        i += 1
      }
      consumed = 1 + (n + 1) / 2
    } else {
      val compLen = hb
      if (off + 1 + compLen > limit) bad("Huffman weights overrun")
      val fwd = new FwdBits(src, off + 1, off + 1 + compLen)
      val table = readFseTable(fwd, 255, 6, "huffman-weights")
      val payloadStart = fwd.bytePos
      val bits = new BackBits(src, payloadStart, off + 1 + compLen)
      var s1 = bits.read(table.log).toInt
      var s2 = bits.read(table.log).toInt
      if (bits.overflowed) bad("huffman-weights stream shorter than states")
      val buf = new Array[Int](256)
      var n = 0
      var done = false
      while (!done) {
        // two interleaved states; a state that overdraws the stream emits
        // its final symbol without updating (RFC 8878 §4.1.1 interleaving)
        if (n >= 255) bad("more than 255 Huffman weights")
        buf(n) = table.symbol(s1); n += 1
        s1 = table.next(s1, bits)
        if (bits.overflowed) {
          if (n >= 255) bad("more than 255 Huffman weights")
          buf(n) = table.symbol(s2); n += 1
          done = true
        } else {
          if (n >= 255) bad("more than 255 Huffman weights")
          buf(n) = table.symbol(s2); n += 1
          s2 = table.next(s2, bits)
          if (bits.overflowed) {
            if (n >= 255) bad("more than 255 Huffman weights")
            buf(n) = table.symbol(s1); n += 1
            done = true
          }
        }
      }
      weights = java.util.Arrays.copyOf(buf, n)
      consumed = 1 + compLen
    }
    // the last symbol's weight is implicit: it completes the next power of 2
    var total = 0L
    var i = 0
    while (i < weights.length) {
      if (weights(i) > 11) bad(s"Huffman weight ${weights(i)}")
      if (weights(i) > 0) total += 1L << (weights(i) - 1)
      i += 1
    }
    if (total == 0) bad("all-zero Huffman weights")
    val maxBits = highBit(total.toInt) + 1
    val leftover = (1L << maxBits) - total
    if (leftover <= 0 || (leftover & (leftover - 1)) != 0)
      bad("Huffman weights do not complete a power of two")
    val lastWeight = highBit(leftover.toInt) + 1
    val allWeights = java.util.Arrays.copyOf(weights, weights.length + 1)
    allWeights(weights.length) = lastWeight
    // canonical fill: ascending weight (longest codes first), natural
    // symbol order inside a weight, 2^(w-1) cells per symbol
    val size = 1 << maxBits
    val sym = new Array[Byte](size)
    val len = new Array[Byte](size)
    var pos = 0
    var w = 1
    while (w <= maxBits) {
      var s = 0
      while (s < allWeights.length) {
        if (allWeights(s) == w) {
          val span = 1 << (w - 1)
          val nb = (maxBits + 1 - w).toByte
          var k = 0
          while (k < span) {
            sym(pos) = s.toByte
            len(pos) = nb
            pos += 1
            k += 1
          }
        }
        s += 1
      }
      w += 1
    }
    if (pos != size) bad("Huffman canonical fill did not close")
    (new HufTable(maxBits, sym, len), consumed)
  }

  /** Decode one Huffman-coded backward stream into exactly `outLen` bytes. */
  private def hufDecodeStream(src: Array[Byte], begin: Int, end: Int,
      table: HufTable, dst: Array[Byte], dstOff: Int, outLen: Int): Unit = {
    if (outLen == 0) return
    val bits = new BackBits(src, begin, end)
    var i = 0
    while (i < outLen) {
      val idx = bits.peek(table.maxBits)
      dst(dstOff + i) = table.sym(idx)
      bits.skip(table.len(idx))
      if (bits.overflowed) bad("Huffman stream exhausted early")
      i += 1
    }
    if (bits.remaining != 0)
      bad(s"Huffman stream has ${bits.remaining} unconsumed bits")
  }
}
