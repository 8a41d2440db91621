package graft.operators

/** Pure-JVM FLAC STREAMINFO probe — LibriSpeech-style speech corpora ship
  * FLAC, and the STREAMINFO metadata block (the mandatory first block of
  * every stream, per the public FLAC format spec) carries exactly what a
  * pipeline filters on: sample rate, channels, bit depth, and the exact
  * total sample count (hence duration), no audio decode needed.
  */
object Flac {

  final case class UnsupportedFlac(msg: String)
      extends RuntimeException(s"unsupported FLAC: $msg")

  final case class FlacMeta(
      sampleRate: Int,
      channels: Int,
      bitsPerSample: Int,
      totalSamples: Long,   // 0 = unknown (streamed)
      durationSec: Double)

  def probe(bytes: Array[Byte]): FlacMeta = {
    if (bytes.length < 8 || bytes(0) != 'f' || bytes(1) != 'L' ||
      bytes(2) != 'a' || bytes(3) != 'C')
      throw UnsupportedFlac("missing fLaC marker")
    var off = 4
    while (off + 4 <= bytes.length) {
      val head = bytes(off) & 0xff
      val last = (head & 0x80) != 0
      val btype = head & 0x7f
      val len = ((bytes(off + 1) & 0xff) << 16) | ((bytes(off + 2) & 0xff) << 8) |
        (bytes(off + 3) & 0xff)
      val p = off + 4
      if (btype == 0) { // STREAMINFO
        if (len < 34 || p + 34 > bytes.length)
          throw UnsupportedFlac(s"STREAMINFO of $len bytes (34 expected)")
        // offsets within the block: 10..17 hold the packed rate/ch/bits/samples
        val b = (i: Int) => bytes(p + i) & 0xffL
        val rate = ((b(10) << 12) | (b(11) << 4) | (b(12) >> 4)).toInt
        val channels = (((b(12) >> 1) & 0x7) + 1).toInt
        val bits = ((((b(12) & 0x1) << 4) | (b(13) >> 4)) + 1).toInt
        val total = ((b(13) & 0xf) << 32) | (b(14) << 24) | (b(15) << 16) |
          (b(16) << 8) | b(17)
        if (rate == 0) throw UnsupportedFlac("STREAMINFO declares rate 0")
        return FlacMeta(rate, channels, bits, total,
          if (total > 0) total.toDouble / rate else 0.0)
      }
      if (last) throw UnsupportedFlac("no STREAMINFO block before audio frames")
      off = p + len
    }
    throw UnsupportedFlac("truncated metadata block chain")
  }

  /** Fixture writer: fLaC + STREAMINFO (+ padding block); no audio frames —
    * this is a metadata probe, not a codec. */
  def writeStub(sampleRate: Int, channels: Int, bitsPerSample: Int,
      totalSamples: Long, padding: Int = 16): Array[Byte] = {
    require(sampleRate > 0 && sampleRate < (1 << 20), "rate out of 20-bit range")
    require(channels >= 1 && channels <= 8 && bitsPerSample >= 4 &&
      bitsPerSample <= 32, "channels/bits out of range")
    require(totalSamples >= 0 && totalSamples < (1L << 36), "samples out of range")
    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    out.write(0); out.write(0); out.write(0); out.write(34) // STREAMINFO, not last
    val si = new Array[Byte](34)
    si(0) = 0x10; si(1) = 0; si(2) = 0x10; si(3) = 0 // block sizes 4096
    // frame sizes (6 bytes) left 0 = unknown
    si(10) = ((sampleRate >> 12) & 0xff).toByte
    si(11) = ((sampleRate >> 4) & 0xff).toByte
    si(12) = (((sampleRate & 0xf) << 4) | ((channels - 1) << 1) |
      ((bitsPerSample - 1) >> 4)).toByte
    si(13) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((totalSamples >> 32) & 0xf)).toInt.toByte
    si(14) = ((totalSamples >> 24) & 0xff).toByte
    si(15) = ((totalSamples >> 16) & 0xff).toByte
    si(16) = ((totalSamples >> 8) & 0xff).toByte
    si(17) = (totalSamples & 0xff).toByte
    out.write(si)
    out.write(0x80 | 1); out.write(0); out.write(0); out.write(padding) // PADDING, last
    out.write(new Array[Byte](padding))
    out.toByteArray
  }

  /** Per-row probe over a binary column — metadata only leaves the task. */
  def flacMeta(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = probe(bytes)
        (id, m.sampleRate, m.channels, m.bitsPerSample, m.totalSamples,
          m.durationSec)
      }
      .toDF("id", "sample_rate", "channels", "bits_per_sample",
        "total_samples", "duration_sec")
  }
}
