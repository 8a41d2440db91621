package graft.sources.grib

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

import graft.sources.grib.Grib1.UnsupportedGrib

/** Minimal PNG codec for GRIB2 data representation template 5.41 (PNG
  * packing): the section-7 payload is a PNG image whose pixel samples carry
  * the scaled X values — bit depth 1/2/4/8/16 grayscale, 24 as RGB
  * (X = R<<16 | G<<8 | B), 32 as RGBA. Implements the public PNG spec
  * (ISO/IEC 15948 / RFC 2083): IHDR/IDAT/IEND chunks, zlib streams, the five
  * scanline filters (None/Sub/Up/Average/Paeth). The reference reads this
  * packing for free via eccodes+libpng (weather_mv/loader_pipeline/
  * sinks.py:371-389); here both sides are pure JVM. Encode (fixture role)
  * writes filter-0 scanlines; decode accepts any filter mix.
  */
private[graft] object Png {

  private val Signature = Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  final case class Image(width: Int, height: Int, bitDepth: Int,
      colorType: Int, samples: Array[Long])

  /** Bits each pixel's combined X value occupies (GRIB depth semantics). */
  def pixelBits(bitDepth: Int, colorType: Int): Int = colorType match {
    case 0 => bitDepth
    case 2 => 3 * bitDepth
    case 6 => 4 * bitDepth
    case other => throw UnsupportedGrib(s"PNG color type $other (0 grey, 2 RGB, 6 RGBA)")
  }

  // ---------------------------------------------------------------- decode

  def decode(png: Array[Byte]): Image = {
    require(png.length > 8 && Signature.indices.forall(i => png(i) == Signature(i)),
      "not a PNG stream")
    var width = 0
    var height = 0
    var bitDepth = 0
    var colorType = 0
    val idat = new ByteArrayOutputStream()
    var off = 8
    var done = false
    while (!done && off + 8 <= png.length) {
      val len = Grib2.u32(png, off).toInt
      val ctype = new String(png, off + 4, 4, "US-ASCII")
      val body = off + 8
      ctype match {
        case "IHDR" =>
          width = Grib2.u32(png, body).toInt
          height = Grib2.u32(png, body + 4).toInt
          bitDepth = png(body + 8) & 0xff
          colorType = png(body + 9) & 0xff
          if ((png(body + 10) & 0xff) != 0)
            throw UnsupportedGrib("PNG compression method != 0")
          if ((png(body + 12) & 0xff) != 0)
            throw UnsupportedGrib("interlaced PNG (Adam7) in GRIB payload")
        case "IDAT" => idat.write(png, body, len)
        case "IEND" => done = true
        case _ => // ancillary chunk — skip
      }
      off = body + len + 4 // + CRC
    }
    require(width > 0 && height > 0, "PNG missing IHDR")
    val channels = colorType match {
      case 0 => 1
      case 2 => 3
      case 6 => 4
      case other => throw UnsupportedGrib(s"PNG color type $other")
    }
    val raw = inflate(idat.toByteArray)
    val sampleBits = channels * bitDepth
    val stride = (width * sampleBits + 7) / 8
    val bpp = math.max(1, sampleBits / 8) // filter distance, per spec
    require(raw.length >= height * (stride + 1),
      s"PNG pixel data truncated: ${raw.length} < ${height * (stride + 1)}")
    val prev = new Array[Byte](stride)
    val line = new Array[Byte](stride)
    val out = new Array[Long](width * height)
    var y = 0
    while (y < height) {
      val base = y * (stride + 1)
      val filter = raw(base) & 0xff
      System.arraycopy(raw, base + 1, line, 0, stride)
      unfilter(filter, line, prev, bpp)
      // extract this row's per-pixel X values
      var x = 0
      while (x < width) {
        out(y * width + x) =
          if (bitDepth >= 8) {
            val byteWidth = sampleBits / 8
            var v = 0L
            var i = 0
            while (i < byteWidth) { v = (v << 8) | (line(x * byteWidth + i) & 0xffL); i += 1 }
            v
          } else { // sub-byte grayscale: MSB-first packing
            val bitPos = x * bitDepth
            val b = line(bitPos >> 3) & 0xff
            ((b >> (8 - bitDepth - (bitPos & 7))) & ((1 << bitDepth) - 1)).toLong
          }
        x += 1
      }
      System.arraycopy(line, 0, prev, 0, stride)
      y += 1
    }
    Image(width, height, bitDepth, colorType, out)
  }

  /** In-place reverse of a PNG scanline filter (spec §6). */
  private def unfilter(filter: Int, line: Array[Byte], prev: Array[Byte],
      bpp: Int): Unit = {
    val n = line.length
    filter match {
      case 0 => // None
      case 1 => // Sub
        var i = bpp
        while (i < n) { line(i) = (line(i) + line(i - bpp)).toByte; i += 1 }
      case 2 => // Up
        var i = 0
        while (i < n) { line(i) = (line(i) + prev(i)).toByte; i += 1 }
      case 3 => // Average
        var i = 0
        while (i < n) {
          val a = if (i >= bpp) line(i - bpp) & 0xff else 0
          val b = prev(i) & 0xff
          line(i) = (line(i) + ((a + b) >> 1)).toByte
          i += 1
        }
      case 4 => // Paeth
        var i = 0
        while (i < n) {
          val a = if (i >= bpp) line(i - bpp) & 0xff else 0
          val b = prev(i) & 0xff
          val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
          val p = a + b - c
          val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
          val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
          line(i) = (line(i) + pred).toByte
          i += 1
        }
      case other => throw UnsupportedGrib(s"PNG filter type $other")
    }
  }

  // ---------------------------------------------------------------- encode

  /** Encode per-pixel X values as a PNG at the given GRIB depth (1/2/4/8/16
    * grayscale; 24 RGB; 32 RGBA), filter-0 scanlines. */
  def encode(width: Int, height: Int, depth: Int, xs: Array[Long]): Array[Byte] = {
    require(xs.length == width * height, s"${xs.length} samples for ${width}x$height")
    val (bitDepth, colorType) = depth match {
      case 1 | 2 | 4 | 8 | 16 => (depth, 0)
      case 24 => (8, 2)
      case 32 => (8, 6)
      case other => throw UnsupportedGrib(
        s"PNG packing depth $other (1/2/4/8/16 grey, 24 RGB, 32 RGBA)")
    }
    val channels = colorType match { case 0 => 1; case 2 => 3; case _ => 4 }
    val sampleBits = channels * bitDepth
    val stride = (width * sampleBits + 7) / 8
    val raw = new Array[Byte](height * (stride + 1))
    var y = 0
    while (y < height) {
      val base = y * (stride + 1) // filter byte stays 0
      var x = 0
      while (x < width) {
        val v = xs(y * width + x)
        if (bitDepth >= 8) {
          val byteWidth = sampleBits / 8
          var i = 0
          while (i < byteWidth) {
            raw(base + 1 + x * byteWidth + i) =
              ((v >> ((byteWidth - 1 - i) * 8)) & 0xff).toByte
            i += 1
          }
        } else {
          val bitPos = x * bitDepth
          val idx = base + 1 + (bitPos >> 3)
          raw(idx) = (raw(idx) |
            ((v & ((1 << bitDepth) - 1)) << (8 - bitDepth - (bitPos & 7)))).toByte
        }
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    val ihdr = new Array[Byte](13)
    putU32(ihdr, 0, width); putU32(ihdr, 4, height)
    ihdr(8) = bitDepth.toByte; ihdr(9) = colorType.toByte
    chunk(out, "IHDR", ihdr)
    chunk(out, "IDAT", deflate(raw))
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  // ---------------------------------------------------------------- util

  private def chunk(out: ByteArrayOutputStream, ctype: String,
      body: Array[Byte]): Unit = {
    val len = new Array[Byte](4)
    putU32(len, 0, body.length)
    out.write(len, 0, 4)
    val tb = ctype.getBytes("US-ASCII")
    out.write(tb, 0, 4)
    out.write(body, 0, body.length)
    val crc = new CRC32()
    crc.update(tb)
    crc.update(body)
    val c = new Array[Byte](4)
    putU32(c, 0, crc.getValue.toInt)
    out.write(c, 0, 4)
  }

  private def putU32(b: Array[Byte], i: Int, v: Long): Unit = {
    b(i) = ((v >> 24) & 0xff).toByte; b(i + 1) = ((v >> 16) & 0xff).toByte
    b(i + 2) = ((v >> 8) & 0xff).toByte; b(i + 3) = (v & 0xff).toByte
  }

  private def inflate(in: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(in)
    val out = new ByteArrayOutputStream(in.length * 4)
    val buf = new Array[Byte](64 * 1024)
    while (!inf.finished() && !inf.needsInput()) {
      val n = inf.inflate(buf)
      if (n > 0) out.write(buf, 0, n)
      else if (inf.needsDictionary()) throw UnsupportedGrib("PNG zlib preset dictionary")
    }
    inf.end()
    out.toByteArray
  }

  private def deflate(in: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(in)
    d.finish()
    val out = new ByteArrayOutputStream(in.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
