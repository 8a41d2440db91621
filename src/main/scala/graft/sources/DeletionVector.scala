package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.fs.Path

/** Delta Lake deletion vectors — the PUBLIC format from delta-io/delta
  * PROTOCOL.md ("Deletion Vectors" + "Deletion Vector Format"):
  *
  *  - a DV descriptor on an `add` action names its storage
  *    (`u` = relative file keyed by a Z85-encoded UUID, `p` = absolute
  *    file path, `i` = inline Z85 payload), the byte `offset` of the DV
  *    blob inside the file, its `sizeInBytes`, and `cardinality`;
  *  - an on-disk DV blob is framed `<i32 BE size> <data> <i32 BE CRC-32
  *    of data>` (the file itself starts with a format-version byte = 1);
  *  - the DV data is `<i32 LE magic 1681511377>` followed by a
  *    RoaringBitmapArray in its "portable" serialization: `<i64 LE number
  *    of 32-bit bitmaps>`, then per bitmap `<i32 LE key>` (the deleted
  *    row index's high 32 bits) and a standard 32-bit RoaringBitmap
  *    (RoaringFormatSpec: cookie 12346/12347, descriptive headers, then
  *    array / bitmap / run containers);
  *  - Z85 is the ZeroMQ spec-32 alphabet, 5 ASCII chars per 4 bytes.
  *
  * Decoding is executor-side work (see [[DeltaTable]]): positions stream
  * out as an iterator, never a driver-side materialization. The encoder
  * half exists so specs can author real DV fixtures and pin a byte-level
  * round trip. */
object DeletionVector {
  final case class BadDeletionVector(msg: String) extends RuntimeException(msg)

  /** The descriptor as it appears on an add action. */
  final case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  val Magic = 1681511377

  // ------------------------------------------------------------------- Z85

  private val Z85Alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val Z85Decode: Array[Int] = {
    val a = Array.fill(128)(-1)
    Z85Alphabet.zipWithIndex.foreach { case (c, i) => a(c.toInt) = i }
    a
  }

  /** Z85-decode (input length must be a multiple of 5). */
  def z85Decode(s: String): Array[Byte] = {
    if (s.length % 5 != 0) throw BadDeletionVector(
      s"z85 length ${s.length} is not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    var o = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) Z85Decode(c.toInt) else -1
        if (d < 0) throw BadDeletionVector(s"invalid z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      out(o) = (v >>> 24).toByte
      out(o + 1) = (v >>> 16).toByte
      out(o + 2) = (v >>> 8).toByte
      out(o + 3) = v.toByte
      i += 5
      o += 4
    }
    out
  }

  /** Z85-encode (input length must be a multiple of 4). */
  def z85Encode(b: Array[Byte]): String = {
    if (b.length % 4 != 0) throw BadDeletionVector(
      s"z85 payload length ${b.length} is not a multiple of 4")
    val sb = new java.lang.StringBuilder(b.length / 4 * 5)
    var i = 0
    while (i < b.length) {
      var v = ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      val chunk = new Array[Char](5)
      var j = 4
      while (j >= 0) { chunk(j) = Z85Alphabet((v % 85).toInt); v /= 85; j -= 1 }
      sb.append(chunk)
      i += 4
    }
    sb.toString
  }

  // ------------------------------------------- RoaringBitmapArray portable

  private val CookieNoRun = 12346
  private val CookieRun = 12347

  /** Deserialize the DV data (`magic` + portable RoaringBitmapArray) into
    * sorted deleted-row indexes. */
  def deserialize(data: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(data).order(ByteOrder.LITTLE_ENDIAN)
    if (bb.remaining() < 12) throw BadDeletionVector(
      s"DV data truncated at ${data.length} bytes")
    val magic = bb.getInt
    if (magic != Magic) throw BadDeletionVector(
      s"DV magic $magic != $Magic — not a serialized deletion vector")
    val nMaps = bb.getLong
    if (nMaps < 0 || nMaps > Int.MaxValue) throw BadDeletionVector(
      s"DV bitmap count $nMaps out of range")
    val out = Array.newBuilder[Long]
    try {
      var m = 0L
      while (m < nMaps) {
        val key = bb.getInt.toLong & 0xffffffffL
        val high = key << 32
        readBitmap32(bb, v => out += (high | v))
        m += 1
      }
    } catch {
      // a count/header that overruns the buffer must stay a DIRECTED
      // error, not a bare BufferUnderflowException from a task
      case _: java.nio.BufferUnderflowException |
          _: IllegalArgumentException | _: NegativeArraySizeException =>
        throw BadDeletionVector(
          s"DV data malformed: declared bitmaps/containers overrun the " +
            s"${data.length}-byte payload")
    }
    out.result()
  }

  /** One standard 32-bit RoaringBitmap; emits values (as unsigned ints in
    * a Long) in ascending order. */
  private def readBitmap32(bb: ByteBuffer, emit: Long => Unit): Unit = {
    val cookie = bb.getInt
    val (nContainers, runFlags) = (cookie & 0xffff) match {
      case CookieRun =>
        val n = (cookie >>> 16) + 1
        val flags = new Array[Byte]((n + 7) / 8)
        bb.get(flags)
        (n, flags)
      case CookieNoRun =>
        (bb.getInt, Array.empty[Byte])
      case other => throw BadDeletionVector(
        s"roaring cookie $other (want $CookieNoRun/$CookieRun)")
    }
    def isRun(i: Int): Boolean =
      runFlags.nonEmpty && (runFlags(i / 8) & (1 << (i % 8))) != 0
    val keys = new Array[Int](nContainers)
    val cards = new Array[Int](nContainers)
    var i = 0
    while (i < nContainers) {
      keys(i) = bb.getShort & 0xffff
      cards(i) = (bb.getShort & 0xffff) + 1
      i += 1
    }
    // the offset header exists for cookie 12346 always, and for 12347 when
    // there are >= 4 containers; the sequential read skips it either way
    if (runFlags.isEmpty || nContainers >= 4) bb.position(bb.position() + 4 * nContainers)
    i = 0
    while (i < nContainers) {
      val base = (keys(i).toLong & 0xffff) << 16
      if (isRun(i)) {
        val nRuns = bb.getShort & 0xffff
        var r = 0
        while (r < nRuns) {
          val start = bb.getShort & 0xffff
          val len = bb.getShort & 0xffff
          var v = start
          while (v <= start + len) { emit(base | v); v += 1 }
          r += 1
        }
      } else if (cards(i) > 4096) { // bitmap container: 1024 x u64
        var w = 0
        while (w < 1024) {
          var word = bb.getLong
          val wordBase = base | (w.toLong << 6)
          while (word != 0) {
            val bit = java.lang.Long.numberOfTrailingZeros(word)
            emit(wordBase | bit)
            word &= word - 1
          }
          w += 1
        }
      } else { // array container
        var v = 0
        while (v < cards(i)) { emit(base | (bb.getShort & 0xffff)); v += 1 }
      }
      i += 1
    }
  }

  /** Serialize sorted row indexes as DV data (`magic` + portable array,
    * cookie 12346 with array/bitmap containers) — the fixture/round-trip
    * half; real tables are read, not written, through this engine. */
  def serialize(positions: Array[Long]): Array[Byte] = {
    val sorted = positions.distinct.sorted
    val byKey = sorted.groupBy(_ >>> 32).toSeq.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def i16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    i32(Magic)
    i32(byKey.size); i32(0) // i64 LE bitmap count
    byKey.foreach { case (key, vals32) =>
      i32(key.toInt)
      val containers = vals32.map(v => v & 0xffffffffL)
        .groupBy(v => (v >>> 16).toInt).toSeq.sortBy(_._1)
      i32(CookieNoRun)
      i32(containers.size)
      containers.foreach { case (k, vs) => i16(k); i16(vs.length - 1) }
      // offset header (mandatory with cookie 12346): running byte offsets
      // from the start of this bitmap's serialization
      var off = 4 + 4 + 4 * containers.size + 4 * containers.size
      containers.foreach { case (_, vs) =>
        i32(off)
        off += (if (vs.length > 4096) 8192 else 2 * vs.length)
      }
      containers.foreach { case (_, vs) =>
        if (vs.length > 4096) {
          val words = new Array[Long](1024)
          vs.foreach { v =>
            val low = (v & 0xffff).toInt
            words(low >>> 6) |= 1L << (low & 63)
          }
          words.foreach { w =>
            var i = 0
            while (i < 8) { out.write(((w >>> (8 * i)) & 0xff).toInt); i += 1 }
          }
        } else vs.foreach(v => i16((v & 0xffff).toInt))
      }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------ file layer

  /** Write a DV FILE containing one blob (version byte, `<size><data>
    * <crc>`), returning the descriptor-ready (offset, sizeInBytes). */
  def writeFile(path: String, data: Array[Byte],
      conf: org.apache.hadoop.conf.Configuration): (Int, Int) = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try {
      out.write(1) // format version
      val offset = 1
      out.write(ByteBuffer.allocate(4).putInt(data.length).array())
      out.write(data)
      val crc = new CRC32(); crc.update(data)
      out.write(ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      (offset, data.length)
    } finally out.close()
  }

  /** Resolve a descriptor to its DV file path (storage types u/p). */
  def filePath(d: Descriptor, tableRoot: String): String = d.storageType match {
    case "p" =>
      if (d.pathOrInlineDv.contains("://") || d.pathOrInlineDv.startsWith("/"))
        d.pathOrInlineDv
      else s"${tableRoot.stripSuffix("/")}/${d.pathOrInlineDv}"
    case "u" =>
      // <optional random prefix><z85 uuid (20 chars)> → <prefix>/deletion_vector_<uuid>.bin
      if (d.pathOrInlineDv.length < 20) throw BadDeletionVector(
        s"storageType u pathOrInlineDv '${d.pathOrInlineDv}' shorter than a z85 uuid")
      val prefix = d.pathOrInlineDv.dropRight(20)
      val raw = z85Decode(d.pathOrInlineDv.takeRight(20))
      val bb = ByteBuffer.wrap(raw)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) tableRoot.stripSuffix("/")
        else s"${tableRoot.stripSuffix("/")}/$prefix"
      s"$dir/deletion_vector_$uuid.bin"
    case other => throw BadDeletionVector(
      s"storageType '$other' has no file path (u/p only)")
  }

  /** Decode a descriptor's deleted-row indexes (sorted). Runs on
    * EXECUTORS in the read path — `tconf` carries the session FS conf. */
  def positions(d: Descriptor, tableRoot: String,
      tconf: TaskConf): Array[Long] = d.storageType match {
    case "i" => // z85 pads to 4-byte groups; sizeInBytes trims the padding
      deserialize(z85Decode(d.pathOrInlineDv).take(d.sizeInBytes))
    case "u" | "p" =>
      val p = new Path(filePath(d, tableRoot))
      val fs = p.getFileSystem(tconf.value)
      readFramedFile(fs, p, d.offset.getOrElse(1).toLong, d.sizeInBytes)
    case other => throw BadDeletionVector(s"unknown DV storageType '$other'")
  }

  /** Read + CRC-check one framed DV blob (`i32 BE size · data · i32 BE
    * CRC-32 of data`) at a byte offset — the layout Delta DV files and
    * Iceberg v3 Puffin `deletion-vector-v1` blobs share. `expectSize` is
    * the data length the descriptor/manifest declares. */
  def readFramedFile(fs: org.apache.hadoop.fs.FileSystem, p: Path,
      off: Long, expectSize: Int): Array[Long] = {
    val in = fs.open(p)
    try {
      val head = new Array[Byte](4)
      in.readFully(off, head)
      val size = ByteBuffer.wrap(head).getInt // big-endian framing
      if (size != expectSize) throw BadDeletionVector(
        s"$p: framed DV size $size != declared $expectSize at offset $off")
      val data = new Array[Byte](size)
      in.readFully(off + 4L, data)
      val tail = new Array[Byte](4)
      in.readFully(off + 4L + size, tail)
      val stored = ByteBuffer.wrap(tail).getInt
      val crc = new CRC32(); crc.update(data)
      if (stored != crc.getValue.toInt) throw BadDeletionVector(
        s"$p: DV checksum mismatch (stored $stored, computed " +
          s"${crc.getValue.toInt}) — refusing to decode a corrupt vector")
      deserialize(data)
    } finally in.close()
  }

  /** Iceberg v3 entry point: decode the DV blob a manifest entry locates
    * by `(content_offset, content_size_in_bytes)` inside a Puffin file.
    * `content_size_in_bytes` covers the whole framed blob (4-byte length
    * prefix + magic+bitmap data + 4-byte CRC), so the data length is
    * size − 8. Runs on EXECUTORS in the read path. */
  def puffinDvPositions(path: String, contentOffset: Long,
      contentSize: Long,
      conf: org.apache.hadoop.conf.Configuration): Array[Long] = {
    if (contentSize < 12 || contentSize > Int.MaxValue)
      throw BadDeletionVector(
        s"$path: deletion-vector blob size $contentSize out of range")
    val p = new Path(path)
    readFramedFile(p.getFileSystem(conf), p, contentOffset,
      contentSize.toInt - 8)
  }
}
