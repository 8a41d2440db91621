package graft.operators

/** Pure-JVM OGG/Opus header probe — the remaining common speech-corpus
  * container (web-scraped and YouTube-derived audio ships Opus-in-OGG).
  *
  * Structure from the public specs (RFC 3533 OGG framing, RFC 7845 Opus
  * encapsulation): a file is a sequence of pages, each "OggS" + version +
  * header-type + 64-bit granule position + serial + sequence + CRC +
  * segment lacing table. The FIRST packet of the first logical stream is
  * `OpusHead` (channels, pre-skip, input sample rate); the LAST page's
  * granule position counts total 48 kHz PCM samples, so duration =
  * (lastGranule - preSkip) / 48000 exactly — found by scanning the tail
  * backwards, never reading the audio packets. Vorbis streams
  * (`vorbis` first packet) probe rate/channels from the id header
  * the same way (granule counts are at the STREAM rate for Vorbis).
  */
object Ogg {

  final case class UnsupportedOgg(msg: String)
      extends RuntimeException(s"unsupported OGG: $msg")

  final case class OggMeta(
      codec: String,         // "opus" | "vorbis"
      sampleRate: Int,       // Opus: original input rate; Vorbis: stream rate
      channels: Int,
      preSkip: Int,          // Opus only (48 kHz samples); 0 for Vorbis
      totalSamples: Long,    // last granule (- preSkip for Opus)
      durationSec: Double)

  def probe(bytes: Array[Byte]): OggMeta = {
    if (bytes.length < 28 || !isPageAt(bytes, 0))
      throw UnsupportedOgg("missing OggS capture pattern")
    // first page: lacing table then the id packet
    val nsegs = bytes(26) & 0xff
    if (27 + nsegs > bytes.length) throw UnsupportedOgg("truncated first page")
    val packetLen = (0 until nsegs).map(i => bytes(27 + i) & 0xff).sum
    val p = 27 + nsegs
    if (p + packetLen > bytes.length) throw UnsupportedOgg("truncated id packet")

    val (codec, rate, channels, preSkip) =
      if (packetLen >= 19 && str(bytes, p, 8) == "OpusHead") {
        // RFC 7845 §5.1: version u8, channels u8, pre-skip u16le,
        // input sample rate u32le
        val ch = bytes(p + 9) & 0xff
        val skip = (bytes(p + 10) & 0xff) | ((bytes(p + 11) & 0xff) << 8)
        val r = u32le(bytes, p + 12)
        ("opus", if (r > 0) r.toInt else 48000, ch, skip)
      } else if (packetLen >= 30 && (bytes(p) & 0xff) == 1 &&
        str(bytes, p + 1, 6) == "vorbis") {
        // Vorbis I id header: channels u8 @ +11, rate u32le @ +12
        ("vorbis", u32le(bytes, p + 12).toInt, bytes(p + 11) & 0xff, 0)
      } else throw UnsupportedOgg(
        "first packet is neither OpusHead nor a vorbis id header")
    if (rate <= 0 || channels <= 0)
      throw UnsupportedOgg(s"id header declares rate=$rate channels=$channels")

    // last granule: scan the TAIL for the final page OF THIS LOGICAL
    // STREAM (serial must match the id page's) — chained or multiplexed
    // files carry other serials whose granules are on different clocks
    val serial = u32le(bytes, 14)
    var lastGranule = -1L
    var o = bytes.length - 27
    var found = false
    while (!found && o >= 0) {
      if (isPageAt(bytes, o) && u32le(bytes, o + 14) == serial) {
        val g = i64le(bytes, o + 6)
        if (g >= 0) { lastGranule = g; found = true }
      }
      o -= 1
    }
    if (lastGranule < 0) throw UnsupportedOgg("no page with a granule position")
    // a chained file (another BOS page after the first stream) would still
    // undercount: this probe reports the FIRST chain's duration; detect the
    // common concatenated-stream case and say so
    if (found) {
      var p2 = bytes.length - 27
      var laterBos = false
      while (!laterBos && p2 > 0) {
        if (isPageAt(bytes, p2) && (bytes(p2 + 5) & 0x2) != 0 &&
          u32le(bytes, p2 + 14) != serial) laterBos = true
        p2 -= 1
      }
      if (laterBos) throw UnsupportedOgg(
        "chained OGG (multiple logical streams) — per-chain durations need " +
          "demuxing; split the chains first")
    }

    val total = codec match {
      case "opus" => math.max(0L, lastGranule - preSkip)
      case _ => lastGranule
    }
    // Opus granules ALWAYS count 48 kHz samples regardless of input rate
    val granuleRate = if (codec == "opus") 48000 else rate
    OggMeta(codec, rate, channels, preSkip, total,
      total.toDouble / granuleRate)
  }

  /** Fixture writer: a minimal two-page Opus (or Vorbis) stream — an id
    * page plus one data page carrying the final granule position. */
  def writeStub(codec: String, sampleRate: Int, channels: Int,
      granule: Long, preSkip: Int = 312): Array[Byte] = {
    val id: Array[Byte] = codec match {
      case "opus" =>
        val b = new Array[Byte](19)
        "OpusHead".getBytes.copyToArray(b, 0)
        b(8) = 1 // version
        b(9) = channels.toByte
        b(10) = (preSkip & 0xff).toByte; b(11) = ((preSkip >> 8) & 0xff).toByte
        putU32le(b, 12, sampleRate)
        b
      case "vorbis" =>
        val b = new Array[Byte](30)
        b(0) = 1
        "vorbis".getBytes.copyToArray(b, 1)
        b(11) = channels.toByte
        putU32le(b, 12, sampleRate)
        b
      case other => throw UnsupportedOgg(s"writer codec $other")
    }
    page(headerType = 2, granule = 0, seq = 0, packet = id) ++
      page(headerType = 4, granule = granule, seq = 1,
        packet = new Array[Byte](40))
  }

  private def page(headerType: Int, granule: Long, seq: Int,
      packet: Array[Byte]): Array[Byte] = {
    require(packet.length < 255 * 255, "stub pages carry small packets")
    val nsegs = packet.length / 255 + 1
    val b = new Array[Byte](27 + nsegs + packet.length)
    "OggS".getBytes.copyToArray(b, 0)
    b(5) = headerType.toByte
    var g = granule
    (0 until 8).foreach { i => b(6 + i) = (g & 0xff).toByte; g >>= 8 }
    putU32le(b, 14, 0x6f676773L) // serial
    putU32le(b, 18, seq)
    b(26) = nsegs.toByte
    var rem = packet.length
    (0 until nsegs).foreach { i =>
      b(27 + i) = math.min(rem, 255).toByte
      rem -= math.min(rem, 255)
    }
    packet.copyToArray(b, 27 + nsegs)
    b
  }

  /** Per-row probe over a binary column — metadata only leaves the task. */
  def oggMeta(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = probe(bytes)
        (id, m.codec, m.sampleRate, m.channels, m.preSkip, m.totalSamples,
          m.durationSec)
      }
      .toDF("id", "codec", "sample_rate", "channels", "pre_skip",
        "total_samples", "duration_sec")
  }

  private def isPageAt(b: Array[Byte], o: Int): Boolean =
    o + 27 <= b.length && b(o) == 'O' && b(o + 1) == 'g' && b(o + 2) == 'g' &&
      b(o + 3) == 'S' && b(o + 4) == 0 // stream structure version 0

  private def str(b: Array[Byte], off: Int, len: Int): String =
    new String(b, off, len, java.nio.charset.StandardCharsets.US_ASCII)
  private def u32le(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def i64le(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }
  private def putU32le(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
  }
}
