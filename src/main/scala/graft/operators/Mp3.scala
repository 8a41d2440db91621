package graft.operators

/** Pure-JVM MP3 (MPEG audio Layer III) header/duration probe for the
  * multimodal audio path — speech corpora commonly ship MP3 (e.g. the
  * Common Voice releases), and pipelines bucket/filter on sample rate,
  * channels, and duration without ever decoding audio.
  *
  * Frame-header layout from the public MPEG-1/2 audio spec (ISO/IEC
  * 11172-3 / 13818-3): 11-bit sync, version, layer, bitrate index,
  * sample-rate index, padding, channel mode. Duration comes from, in
  * order of preference: a Xing/Info VBR tag (exact frame count), else a
  * bounded frame WALK when the file is small enough, else the CBR
  * extrapolation from the first frame's bitrate. ID3v2 prefixes (syncsafe
  * size) and ID3v1 suffixes are skipped. Layers I/II and reserved
  * version/rate/bitrate codes raise a directed error.
  */
object Mp3 {

  final case class UnsupportedMp3(msg: String)
      extends RuntimeException(s"unsupported MP3: $msg")

  final case class Mp3Meta(
      sampleRate: Int,
      channels: Int,
      bitrateKbps: Int,      // first frame's bitrate
      frames: Long,          // exact (Xing or full walk) or CBR estimate
      durationSec: Double,
      vbrTagged: Boolean)    // a Xing/Info tag was present

  // MPEG-1 Layer III / MPEG-2(.5) Layer III bitrates (kbps), index 1-14
  private val BitratesV1 = Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
    160, 192, 224, 256, 320)
  private val BitratesV2 = Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
    96, 112, 128, 144, 160)
  private val RatesV1 = Array(44100, 48000, 32000)
  private val RatesV2 = Array(22050, 24000, 16000)
  private val RatesV25 = Array(11025, 12000, 8000)

  def probe(bytes: Array[Byte]): Mp3Meta = {
    var off = 0
    var sawOtherLayer = false
    // ID3v2 prefix: "ID3" + version(2) + flags + 4-byte syncsafe size
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' && bytes(2) == '3') {
      val size = ((bytes(6) & 0x7f) << 21) | ((bytes(7) & 0x7f) << 14) |
        ((bytes(8) & 0x7f) << 7) | (bytes(9) & 0x7f)
      off = 10 + size
    }
    var end = bytes.length
    // ID3v1 trailer
    if (end >= 128 && bytes(end - 128) == 'T' && bytes(end - 127) == 'A' &&
      bytes(end - 126) == 'G') end -= 128

    def frameAt(o: Int): Option[(Int, Int, Int, Int, Int)] = {
      // (frameBytes, sampleRate, channels, bitrateKbps, samplesPerFrame)
      if (o + 4 > end) return None
      val b1 = bytes(o) & 0xff
      val b2 = bytes(o + 1) & 0xff
      if (b1 != 0xff || (b2 & 0xe0) != 0xe0) return None
      val versionBits = (b2 >> 3) & 0x3 // 0=2.5, 2=2, 3=1
      val layerBits = (b2 >> 1) & 0x3   // 1 = Layer III
      if (versionBits == 1) return None // reserved
      if (layerBits != 1) {
        // Layer I/II (or reserved): NOT a directed error here — this may
        // be junk that happens to carry sync bits; the sync scan and the
        // frame walk must skip it. probe() raises the directed error only
        // when no Layer III frame exists at all.
        if (layerBits == 2 || layerBits == 3) sawOtherLayer = true
        return None
      }
      val b3 = bytes(o + 2) & 0xff
      val bitrateIdx = (b3 >> 4) & 0xf
      val rateIdx = (b3 >> 2) & 0x3
      if (bitrateIdx == 0 || bitrateIdx == 15 || rateIdx == 3) return None
      val v1 = versionBits == 3
      val kbps = (if (v1) BitratesV1 else BitratesV2)(bitrateIdx)
      val rate = (versionBits match {
        case 3 => RatesV1
        case 2 => RatesV2
        case _ => RatesV25
      })(rateIdx)
      val padding = (b3 >> 1) & 0x1
      val spf = if (v1) 1152 else 576
      val frameBytes = spf / 8 * kbps * 1000 / rate + padding
      val mode = ((bytes(o + 3) & 0xff) >> 6) & 0x3
      val channels = if (mode == 3) 1 else 2
      Some((frameBytes, rate, channels, kbps, spf))
    }

    // resync: scan forward for the first valid header (tolerates junk)
    var first: Option[(Int, Int, Int, Int, Int)] = None
    while (first.isEmpty && off + 4 <= end) {
      first = frameAt(off)
      if (first.isEmpty) off += 1
    }
    val (fb0, rate, channels, kbps, spf) = first.getOrElse(
      throw UnsupportedMp3(
        if (sawOtherLayer) "MPEG Layer I/II stream (Layer III only)"
        else "no MPEG audio frame sync found"))

    // Xing/Info tag: after the (optional CRC-16 and) side info of the
    // first frame — protection bit 0 means a 2-byte CRC precedes side info
    val v1 = rate >= 32000
    val crcBytes = if (((bytes(off + 1) & 0xff) & 0x1) == 0) 2 else 0
    val sideInfo = if (v1) { if (channels == 1) 17 else 32 }
      else { if (channels == 1) 9 else 17 }
    val xingOff = off + 4 + crcBytes + sideInfo
    val xing =
      if (xingOff + 12 <= end && // tag(4) + flags(4) + frames(4)
        (tag(bytes, xingOff) == "Xing" || tag(bytes, xingOff) == "Info") &&
        (bytes(xingOff + 7) & 0x1) == 1) // frames field present
        Some(u32(bytes, xingOff + 8))
      else None

    val frames: Long = xing.getOrElse {
      // bounded walk: exact for VBR-without-tag files up to ~8 MiB;
      // larger files extrapolate CBR from the first frame
      if (end - off <= 8 * 1024 * 1024) {
        var n = 0L
        var o = off
        var ok = true
        while (ok && o + 4 <= end) {
          frameAt(o) match {
            case Some((fb, _, _, _, _)) => n += 1; o += fb
            case None => ok = false // trailing junk/tag: stop counting
          }
        }
        n
      } else (end - off).toLong / fb0
    }
    Mp3Meta(rate, channels, kbps, frames,
      frames.toDouble * spf / rate, xing.isDefined)
  }

  /** Fixture writer: `frames` valid CBR Layer III frames of silence, with
    * an optional Xing frame count and ID3v2 prefix. */
  def writeStub(sampleRate: Int, channels: Int, kbps: Int, frames: Int,
      xing: Boolean = false, id3Bytes: Int = 0): Array[Byte] = {
    val v1 = sampleRate >= 32000
    val rates = if (v1) RatesV1 else if (sampleRate >= 16000) RatesV2 else RatesV25
    val rateIdx = rates.indexOf(sampleRate)
    require(rateIdx >= 0, s"sample rate $sampleRate not an MPEG rate")
    val brTable = if (v1) BitratesV1 else BitratesV2
    val brIdx = brTable.indexOf(kbps)
    require(brIdx > 0, s"bitrate $kbps not in the Layer III table")
    val spf = if (v1) 1152 else 576
    val frameBytes = spf / 8 * kbps * 1000 / sampleRate
    val out = new java.io.ByteArrayOutputStream()
    if (id3Bytes > 0) {
      out.write('I'); out.write('D'); out.write('3')
      out.write(4); out.write(0); out.write(0)
      out.write((id3Bytes >> 21) & 0x7f); out.write((id3Bytes >> 14) & 0x7f)
      out.write((id3Bytes >> 7) & 0x7f); out.write(id3Bytes & 0x7f)
      out.write(new Array[Byte](id3Bytes))
    }
    val versionBits = if (v1) 3 else if (sampleRate >= 16000) 2 else 0
    (0 until frames).foreach { i =>
      val f = new Array[Byte](frameBytes)
      f(0) = 0xff.toByte
      f(1) = (0xe0 | (versionBits << 3) | (1 << 1) | 1).toByte // L3, no CRC
      f(2) = ((brIdx << 4) | (rateIdx << 2)).toByte
      f(3) = (if (channels == 1) 0xc0 else 0x00).toByte
      if (i == 0 && xing) {
        val sideInfo = if (v1) { if (channels == 1) 17 else 32 }
          else { if (channels == 1) 9 else 17 }
        val t = 4 + sideInfo
        f(t) = 'X'; f(t + 1) = 'i'; f(t + 2) = 'n'; f(t + 3) = 'g'
        f(t + 7) = 1 // frames field present
        f(t + 8) = ((frames >> 24) & 0xff).toByte
        f(t + 9) = ((frames >> 16) & 0xff).toByte
        f(t + 10) = ((frames >> 8) & 0xff).toByte
        f(t + 11) = (frames & 0xff).toByte
      }
      out.write(f)
    }
    out.toByteArray
  }

  /** Per-row probe over a binary column — metadata only leaves the task. */
  def mp3Meta(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = probe(bytes)
        (id, m.sampleRate, m.channels, m.bitrateKbps, m.frames, m.durationSec,
          m.vbrTagged)
      }
      .toDF("id", "sample_rate", "channels", "bitrate_kbps", "frames",
        "duration_sec", "vbr_tagged")
  }

  private def tag(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
}
