package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM MP4 / ISO BMFF container METADATA parser for the multimodal
  * video path.
  *
  * Training-data pipelines need a video blob's duration, dimensions, and
  * frame count long before (and usually instead of) decoding any pixels —
  * it drives filtering, bucketing, and frame-sampling budgets. The box
  * structure comes from the public ISO/IEC 14496-12 specification: a file
  * is a sequence of `(u32 size, fourcc type, payload)` boxes (size 1 = a
  * u64 largesize follows; size 0 = to end of file); containers (`moov`,
  * `trak`, `mdia`, `minf`, `stbl`) nest boxes in their payload.
  *
  * Parsed surface: `ftyp` major brand, `mvhd` movie timescale + duration,
  * per-track `tkhd` (16.16 fixed-point width/height), `hdlr` handler
  * (`vide`/`soun`), `mdhd` media timescale + duration, and `stsz`/`stts`
  * sample counts. Decode of `mdat` payloads is out of scope by design —
  * codec bitstreams need external decoders; the CONTAINER walk is what a
  * Spark pipeline can and should do natively.
  */
object Mp4 {

  final case class UnsupportedMp4(msg: String)
      extends RuntimeException(s"unsupported MP4: $msg")

  /** Container metadata: movie-level + the first video/audio tracks. */
  final case class Mp4Meta(
      brand: String,
      durationSec: Double,   // mvhd duration / timescale
      width: Int,            // first video track, pixels (0 = none)
      height: Int,
      videoFrames: Long,     // stsz/stts sample count of the video track
      videoTimescale: Long,  // mdhd timescale of the video track
      audioSamples: Long,    // sample count of the first audio track
      trackCount: Int) {
    def fps: Double =
      if (videoFrames > 0 && durationSec > 0) videoFrames / durationSec else 0.0
  }

  private final case class Track(
      handler: String = "",
      width: Int = 0, height: Int = 0,
      timescale: Long = 0, samples: Long = 0)

  def probe(bytes: Array[Byte]): Mp4Meta = {
    var brand = ""
    var mvhdTimescale = 0L
    var mvhdDuration = 0L
    val tracks = Seq.newBuilder[Track]

    def u16(off: Int): Int = ((bytes(off) & 0xff) << 8) | (bytes(off + 1) & 0xff)
    def u32(off: Int): Long =
      (u16(off).toLong << 16) | u16(off + 2)
    def u64(off: Int): Long = (u32(off) << 32) | u32(off + 4)
    def cc(off: Int): String =
      new String(bytes, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    // walk one box level [lo, hi); recurse into known containers
    def walk(lo: Int, hi: Int, inTrak: Track): Track = {
      var off = lo
      var trak = inTrak
      while (off + 8 <= hi) {
        val size0 = u32(off)
        val typ = cc(off + 4)
        val (payload, size) =
          if (size0 == 1) {
            if (off + 16 > hi) throw UnsupportedMp4(s"truncated largesize box at $off")
            (off + 16, u64(off + 8))
          }
          else if (size0 == 0) (off + 8, (hi - off).toLong) // to end
          else (off + 8, size0)
        if (size < 8 || off + size > hi)
          throw UnsupportedMp4(s"box '$typ' at $off with size $size exceeds range $hi")
        val end = (off + size).toInt
        // every fixed-offset read below is bounds-checked against the box
        // end so truncated/corrupt boxes raise a DIRECTED error instead of
        // reading neighboring bytes or throwing a raw index exception
        def need(n: Int): Unit =
          if (payload + n > end) throw UnsupportedMp4(
            s"box '$typ' of ${end - payload} payload bytes (need $n)")
        typ match {
          case "ftyp" => need(4); brand = cc(payload)
          case "moov" => walk(payload, end, trak)
          case "trak" =>
            tracks += walk(payload, end, Track())
          case "mdia" | "minf" | "stbl" => trak = walk(payload, end, trak)
          case "mvhd" =>
            need(20)
            val v = bytes(payload) & 0xff
            if (v == 1) { need(32); mvhdTimescale = u32(payload + 20); mvhdDuration = u64(payload + 24) }
            else { mvhdTimescale = u32(payload + 12); mvhdDuration = u32(payload + 16) }
          case "tkhd" =>
            val v = bytes(payload) & 0xff
            need(if (v == 1) 96 else 84)
            val base = if (v == 1) payload + 88 else payload + 76
            // 16.16 fixed point
            trak = trak.copy(width = (u32(base) >> 16).toInt,
              height = (u32(base + 4) >> 16).toInt)
          case "mdhd" =>
            val v = bytes(payload) & 0xff
            need(if (v == 1) 24 else 16)
            val ts = if (v == 1) u32(payload + 20) else u32(payload + 12)
            trak = trak.copy(timescale = ts)
          case "hdlr" if trak.handler.isEmpty =>
            // only the FIRST hdlr per track wins: QuickTime layouts carry a
            // second data-handler hdlr inside minf that must not clobber
            // the mdia-level 'vide'/'soun' media handler
            need(12)
            trak = trak.copy(handler = cc(payload + 8))
          case "stsz" =>
            // sample_size u32 (0 = per-sample table), sample_count u32
            need(12)
            trak = trak.copy(samples = u32(payload + 8))
          case "stts" if trak.samples == 0 =>
            // fall back to summing (count, delta) entries when stsz absent
            need(8)
            val n0 = u32(payload + 4)
            if (8 + n0 * 8 > (end - payload).toLong) throw UnsupportedMp4(
              s"stts declares $n0 entries in ${end - payload} payload bytes")
            val n = n0.toInt
            var total = 0L
            var i = 0
            while (i < n) { total += u32(payload + 8 + i * 8); i += 1 }
            trak = trak.copy(samples = total)
          case _ => // skip unknown boxes (free, mdat, udta, hdlr repeats ...)
        }
        off = end
      }
      trak
    }

    if (bytes.length < 12 || cc(4) != "ftyp")
      throw UnsupportedMp4("missing ftyp box (not ISO BMFF)")
    walk(0, bytes.length, Track())

    val ts = tracks.result()
    val video = ts.find(_.handler == "vide")
    val audio = ts.find(_.handler == "soun")
    Mp4Meta(
      brand = brand,
      durationSec =
        if (mvhdTimescale > 0) mvhdDuration.toDouble / mvhdTimescale else 0.0,
      width = video.map(_.width).getOrElse(0),
      height = video.map(_.height).getOrElse(0),
      videoFrames = video.map(_.samples).getOrElse(0L),
      videoTimescale = video.map(_.timescale).getOrElse(0L),
      audioSamples = audio.map(_.samples).getOrElse(0L),
      trackCount = ts.size)
  }

  /** Minimal fixture writer: a valid box tree carrying the requested
    * metadata (no codec payloads — `mdat` is an opaque stub). */
  def writeStub(brand: String, timescale: Long, duration: Long,
      width: Int, height: Int, videoFrames: Long,
      audioSamples: Long = 0L, mdatBytes: Int = 16): Array[Byte] = {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val o = new ByteArrayOutputStream(payload.length + 8)
      writeU32(o, payload.length + 8)
      o.write(typ.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      o.write(payload)
      o.toByteArray
    }
    def cat(bs: Array[Byte]*): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      bs.foreach(o.write)
      o.toByteArray
    }
    def fullHeader(version: Int): Array[Byte] = Array[Byte](version.toByte, 0, 0, 0)

    val ftyp = box("ftyp", cat(brand.getBytes, Array[Byte](0, 0, 2, 0),
      brand.getBytes, "mp41".getBytes))
    def mvhd: Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fullHeader(0))
      writeU32(o, 0); writeU32(o, 0)          // creation, modification
      writeU32(o, timescale); writeU32(o, duration)
      writeU32(o, 0x00010000L); o.write(Array[Byte](0x01, 0, 0, 0)) // rate, volume+pad
      (0 until 2).foreach(_ => writeU32(o, 0)) // reserved
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(writeU32(o, _))               // identity matrix
      (0 until 6).foreach(_ => writeU32(o, 0)) // pre-defined
      writeU32(o, 3)                           // next track id
      box("mvhd", o.toByteArray)
    }
    def tkhd(w: Int, h: Int, id: Long): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(Array[Byte](0, 0, 0, 7))         // version 0, enabled flags
      writeU32(o, 0); writeU32(o, 0)
      writeU32(o, id); writeU32(o, 0)
      writeU32(o, duration)
      (0 until 2).foreach(_ => writeU32(o, 0))
      writeU32(o, 0); writeU32(o, 0)           // layer/group, volume/pad
      Seq(0x00010000L, 0, 0, 0, 0x00010000L, 0, 0, 0, 0x40000000L)
        .foreach(writeU32(o, _))
      writeU32(o, w.toLong << 16); writeU32(o, h.toLong << 16)
      box("tkhd", o.toByteArray)
    }
    def mdhd: Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fullHeader(0))
      writeU32(o, 0); writeU32(o, 0)
      writeU32(o, timescale); writeU32(o, duration)
      writeU32(o, 0x55c40000L)                 // language "und" + pre-defined
      box("mdhd", o.toByteArray)
    }
    def hdlr(kind: String): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fullHeader(0))
      writeU32(o, 0)
      o.write(kind.getBytes)
      (0 until 3).foreach(_ => writeU32(o, 0))
      o.write(0)                               // empty name
      box("hdlr", o.toByteArray)
    }
    def stsz(n: Long): Array[Byte] = {
      val o = new ByteArrayOutputStream()
      o.write(fullHeader(0))
      writeU32(o, 0); writeU32(o, n)           // per-sample sizes omitted
      box("stsz", o.toByteArray)
    }
    def trak(kind: String, w: Int, h: Int, n: Long, id: Long): Array[Byte] =
      box("trak", cat(tkhd(w, h, id),
        box("mdia", cat(mdhd, hdlr(kind),
          box("minf", box("stbl", stsz(n)))))))

    val traks = Seq(
      Some(trak("vide", width, height, videoFrames, 1)),
      if (audioSamples > 0) Some(trak("soun", 0, 0, audioSamples, 2)) else None)
      .flatten
    val moov = box("moov", cat((mvhd +: traks): _*))
    cat(ftyp, moov, box("mdat", new Array[Byte](mdatBytes)))
  }

  /** Per-row container probe over a binary column — the Spark-side shape:
    * metadata only ships out of the task, never pixel payloads. */
  def mp4Meta(df: org.apache.spark.sql.DataFrame, idCol: String,
      payloadCol: String): org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    df.select(col(idCol).cast("long").as("id"), col(payloadCol).as("content"))
      .as[(Long, Array[Byte])]
      .map { case (id, bytes) =>
        val m = probe(bytes)
        (id, m.brand, m.durationSec, m.width, m.height, m.videoFrames,
          m.audioSamples, m.trackCount)
      }
      .toDF("id", "brand", "duration_sec", "width", "height",
        "video_frames", "audio_samples", "track_count")
  }

  private def writeU32(o: ByteArrayOutputStream, v: Long): Unit = {
    o.write(((v >> 24) & 0xff).toInt); o.write(((v >> 16) & 0xff).toInt)
    o.write(((v >> 8) & 0xff).toInt); o.write((v & 0xff).toInt)
  }
}
