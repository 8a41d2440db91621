package graft.operators

/** Pure-JVM WAV (RIFF/WAVE) codec for the multimodal audio path.
  *
  * The reference pipelines treat media as opaque blobs and lean on external
  * decoders; here the container format itself is implemented from the public
  * RIFF/WAVE specification (Microsoft/IBM Multimedia Programming Interface
  * and Data Specifications 1.0, 1991): a RIFF file is a sequence of
  * `(fourcc, u32le size, payload, pad-to-even)` chunks under a `WAVE` form;
  * `fmt ` defines the PCM layout and `data` carries interleaved frames.
  *
  * Decoding walks the chunk list in ANY order, skips unknown chunks (LIST,
  * fact, cue, bext...), honours the odd-size pad byte, and tolerates
  * extended `fmt ` chunks (cbSize tail). Supported sample encodings:
  * PCM16/PCM24 signed little-endian and PCM8 unsigned (format tag 1),
  * IEEE float32 (tag 3, scaled to the 16-bit range), and ITU-T G.711
  * A-law (6) / mu-law (7) — the telephony speech-corpus codings,
  * expanded with the classic CCITT tables. ADPCM and extensible formats
  * raise a directed error naming the tag so a user knows to transcode,
  * mirroring how the GRIB/TIFF readers treat unsupported packings.
  */
object Wav {

  final case class UnsupportedWav(msg: String)
      extends RuntimeException(s"unsupported WAV: $msg")

  /** Decoded PCM audio: interleaved frames, `samples(frame * channels + ch)`. */
  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short]) {
    require(channels > 0, "channels must be positive")
    def nFrames: Int = samples.length / channels
    def durationMs: Double = nFrames * 1000.0 / sampleRate

    /** Root-mean-square amplitude of channel 0 (the loudness feature). */
    def rms: Double = {
      if (nFrames == 0) return 0.0
      var sum = 0.0
      var i = 0
      while (i < nFrames) {
        val s = samples(i * channels).toDouble
        sum += s * s
        i += 1
      }
      math.sqrt(sum / nFrames)
    }

    /** Sign transitions in channel 0 (>=0 vs <0) — the classic
      * zero-crossing-rate numerator, a cheap spectral-content proxy. */
    def zeroCrossings: Int = {
      var n = 0
      var i = 1
      while (i < nFrames) {
        val a = samples((i - 1) * channels) >= 0
        val b = samples(i * channels) >= 0
        if (a != b) n += 1
        i += 1
      }
      n
    }
  }

  /** Canonical encode: RIFF/WAVE with `fmt ` + `data`. With `withListChunk`
    * an INFO LIST chunk precedes `fmt ` (and carries an odd-size payload),
    * exercising the skip-and-pad path real-world encoders hit. */
  def encode(audio: Audio, withListChunk: Boolean = false): Array[Byte] = {
    val dataBytes = new Array[Byte](audio.samples.length * 2)
    var i = 0
    while (i < audio.samples.length) {
      val s = audio.samples(i)
      dataBytes(2 * i) = (s & 0xff).toByte
      dataBytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new java.io.ByteArrayOutputStream()
    writeU16(fmt, 1) // PCM
    writeU16(fmt, audio.channels)
    writeU32(fmt, audio.sampleRate)
    writeU32(fmt, audio.sampleRate * audio.channels * 2) // byte rate
    writeU16(fmt, audio.channels * 2) // block align
    writeU16(fmt, 16) // bits per sample

    val body = new java.io.ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    if (withListChunk) {
      // odd-length INFO payload: forces the decoder to honour the pad byte
      val info = "INFOISFT".getBytes("US-ASCII") ++
        Array[Byte](5, 0, 0, 0) ++ "graft".getBytes("US-ASCII")
      writeChunk(body, "LIST", info)
    }
    writeChunk(body, "fmt ", fmt.toByteArray)
    writeChunk(body, "data", dataBytes)

    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    writeU32(out, body.size())
    body.writeTo(out)
    out.toByteArray
  }

  /** Fixture/export encoder for non-PCM16 codings: a RIFF/WAVE container
    * with the given format tag and the raw data payload as-is (e.g. G.711
    * bytes, one per sample). */
  def encodeRaw(formatTag: Int, bitsPerSample: Int, sampleRate: Int,
      channels: Int, payload: Array[Byte]): Array[Byte] = {
    val bytesPerSample = math.max(1, bitsPerSample / 8)
    val fmt = new java.io.ByteArrayOutputStream()
    writeU16(fmt, formatTag)
    writeU16(fmt, channels)
    writeU32(fmt, sampleRate)
    writeU32(fmt, sampleRate.toLong * channels * bytesPerSample)
    writeU16(fmt, channels * bytesPerSample)
    writeU16(fmt, bitsPerSample)
    val body = new java.io.ByteArrayOutputStream()
    body.write("WAVE".getBytes("US-ASCII"))
    writeChunk(body, "fmt ", fmt.toByteArray)
    writeChunk(body, "data", payload)
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII"))
    writeU32(out, body.size())
    body.writeTo(out)
    out.toByteArray
  }

  /** Decode RIFF/WAVE bytes. Throws [[UnsupportedWav]] with a directed
    * message for non-WAV bytes or unsupported encodings. */
  def decode(bytes: Array[Byte]): Audio = {
    if (bytes.length < 12 || !fourcc(bytes, 0).equals("RIFF") ||
        !fourcc(bytes, 8).equals("WAVE"))
      throw UnsupportedWav("not a RIFF/WAVE stream")
    val riffEnd = math.min(bytes.length.toLong, 8L + u32(bytes, 4))

    var fmtTag = -1
    var channels = 0
    var sampleRate = 0
    var bitsPerSample = 0
    var data: Array[Byte] = null

    var off = 12L
    while (off + 8 <= riffEnd) {
      val id = fourcc(bytes, off.toInt)
      val size = u32(bytes, off.toInt + 4)
      val payloadStart = off + 8
      if (payloadStart + size > bytes.length)
        throw UnsupportedWav(s"truncated chunk '$id' at offset $off")
      id match {
        case "fmt " =>
          if (size < 16) throw UnsupportedWav(s"fmt chunk of $size bytes (<16)")
          val p = payloadStart.toInt
          fmtTag = u16(bytes, p)
          channels = u16(bytes, p + 2)
          sampleRate = u32(bytes, p + 4).toInt
          bitsPerSample = u16(bytes, p + 14)
        // cbSize extension tail (size > 16) is tolerated by skipping
        case "data" =>
          data = java.util.Arrays.copyOfRange(
            bytes, payloadStart.toInt, (payloadStart + size).toInt)
        case _ => // LIST / fact / cue / bext / ... skipped
      }
      off = payloadStart + size + (size & 1) // pad to even
    }

    if (fmtTag == -1) throw UnsupportedWav("no fmt chunk")
    if (data == null) throw UnsupportedWav("no data chunk")
    if (fmtTag != 1 && fmtTag != 3 && fmtTag != 6 && fmtTag != 7) {
      val name = fmtTag match {
        case 0xfffe => "WAVE_FORMAT_EXTENSIBLE"
        case t => s"format tag $t"
      }
      throw UnsupportedWav(
        s"$name encoding — transcode to PCM16 (e.g. `ffmpeg -c:a pcm_s16le`)")
    }
    if (channels <= 0 || sampleRate <= 0)
      throw UnsupportedWav(s"fmt declares channels=$channels rate=$sampleRate")

    val samples = (fmtTag, bitsPerSample) match {
      case (1, 16) =>
        val out = new Array[Short](data.length / 2)
        var i = 0
        while (i < out.length) {
          out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort
          i += 1
        }
        out
      case (1, 8) =>
        // PCM8 is unsigned, midpoint 128; widen to the signed 16-bit scale
        val out = new Array[Short](data.length)
        var i = 0
        while (i < out.length) {
          out(i) = (((data(i) & 0xff) - 128) << 8).toShort
          i += 1
        }
        out
      case (1, 24) =>
        // PCM24 signed little-endian; keep the 16 most significant bits
        val out = new Array[Short](data.length / 3)
        var i = 0
        while (i < out.length) {
          val v = (data(3 * i) & 0xff) | ((data(3 * i + 1) & 0xff) << 8) |
            (data(3 * i + 2) << 16)
          out(i) = (v >> 8).toShort
          i += 1
        }
        out
      case (3, 32) =>
        // IEEE float in [-1, 1]; scale to the signed 16-bit range, clamp
        val out = new Array[Short](data.length / 4)
        var i = 0
        while (i < out.length) {
          val bits = (data(4 * i) & 0xff) | ((data(4 * i + 1) & 0xff) << 8) |
            ((data(4 * i + 2) & 0xff) << 16) | ((data(4 * i + 3) & 0xff) << 24)
          val f = java.lang.Float.intBitsToFloat(bits)
          val scaled = math.rint(f * 32767.0)
          out(i) = math.max(-32768.0, math.min(32767.0, scaled)).toShort
          i += 1
        }
        out
      case (6, 8) =>
        // ITU-T G.711 A-law (telephony speech corpora): classic CCITT
        // expansion — toggle the even bits, then segment + mantissa
        val out = new Array[Short](data.length)
        var i = 0
        while (i < out.length) {
          val a = (data(i) & 0xff) ^ 0x55
          var t = (a & 0x0f) << 4
          val seg = (a & 0x70) >> 4
          if (seg == 0) t += 8
          else t = (t + 0x108) << (seg - 1)
          out(i) = (if ((a & 0x80) != 0) t else -t).toShort
          i += 1
        }
        out
      case (7, 8) =>
        // ITU-T G.711 mu-law: complement, biased mantissa, remove the bias
        val out = new Array[Short](data.length)
        var i = 0
        while (i < out.length) {
          val u = (~data(i)) & 0xff
          val t = (((u & 0x0f) << 3) + 0x84) << ((u & 0x70) >> 4)
          out(i) = (if ((u & 0x80) != 0) 0x84 - t else t - 0x84).toShort
          i += 1
        }
        out
      case (1, b) => throw UnsupportedWav(s"$b bits per sample (8/16/24 PCM only)")
      case (3, b) => throw UnsupportedWav(s"IEEE float at $b bits (32 only)")
      case (6 | 7, b) => throw UnsupportedWav(s"G.711 at $b bits (8 only)")
      case _ => throw UnsupportedWav("unreachable format dispatch")
    }
    // drop a trailing partial frame rather than failing the whole file
    val whole = (samples.length / channels) * channels
    Audio(sampleRate, channels,
      if (whole == samples.length) samples
      else java.util.Arrays.copyOf(samples, whole))
  }

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")
  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], off: Int): Long =
    (b(off) & 0xffL) | ((b(off + 1) & 0xffL) << 8) |
      ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
  private def writeU16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeU32(o: java.io.ByteArrayOutputStream, v: Long): Unit = {
    o.write((v & 0xff).toInt); o.write(((v >> 8) & 0xff).toInt)
    o.write(((v >> 16) & 0xff).toInt); o.write(((v >> 24) & 0xff).toInt)
  }
  private def writeChunk(o: java.io.ByteArrayOutputStream, id: String,
      payload: Array[Byte]): Unit = {
    o.write(id.getBytes("US-ASCII"))
    writeU32(o, payload.length.toLong)
    o.write(payload)
    if ((payload.length & 1) == 1) o.write(0) // pad byte
  }
}
