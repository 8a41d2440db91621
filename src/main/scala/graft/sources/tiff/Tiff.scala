package graft.sources.tiff

import java.util.zip.Inflater

/** Minimal TIFF 6.0 + GeoTIFF 1.1 structure parsing (public specs) — the
  * pixel-data half of the reference's tif path (S4,
  * weather_mv/loader_pipeline/sinks.py:149-227, which delegates to
  * rasterio). Classic TIFF, either byte order, single IFD; stripped or
  * tiled layout; compression none (1) or deflate (8/32946); sample formats
  * uint/int/float at 8/16/32/64 bits; one or more samples per pixel
  * (PlanarConfiguration 1, interleaved).
  *
  * GeoTIFF georeferencing: ModelPixelScale + ModelTiepoint define the
  * affine (pixel -> model space); the GeoKeyDirectory's EPSG code says what
  * model space IS — 4326 (already lon/lat) or UTM 326xx/327xx (handed to
  * CrsTransform's inverse transverse Mercator).
  */
object Tiff {

  final case class Meta(
      littleEndian: Boolean,
      width: Int,
      height: Int,
      bitsPerSample: Int,
      sampleFormat: Int,         // 1 uint, 2 int, 3 ieee float
      samplesPerPixel: Int,
      compression: Int,          // 1 none, 8/32946 deflate
      // layout: either strips (rowsPerStrip > 0) or tiles
      rowsPerStrip: Int,
      stripOffsets: Seq[Long],
      stripByteCounts: Seq[Long],
      tileWidth: Int,
      tileLength: Int,
      tileOffsets: Seq[Long],
      tileByteCounts: Seq[Long],
      // georeferencing
      pixelScale: Seq[Double],   // (sx, sy, sz)
      tiepoint: Seq[Double],     // (i, j, k, x, y, z)
      epsg: Int) {               // 4326 | 326xx | 327xx | 0 (unknown)

    def tiled: Boolean = tileOffsets.nonEmpty

    /** Model-space x/y of pixel center (col + 0.5, row + 0.5) via the
      * tiepoint + scale affine (GeoTIFF raster-is-area convention). */
    def modelX(col: Int): Double = tiepoint(3) + (col + 0.5 - tiepoint(0)) * pixelScale(0)
    def modelY(row: Int): Double = tiepoint(4) - (row + 0.5 - tiepoint(1)) * pixelScale(1)

    def utmZone: Option[(Int, Boolean)] =
      if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, false))
      else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, true))
      else None
  }

  final case class UnsupportedTiff(detail: String) extends
    UnsupportedOperationException(s"TIFF feature not supported: $detail")

  private class Cursor(b: Array[Byte], le: Boolean) {
    def u8(i: Long): Int = b(i.toInt) & 0xff
    def u16(i: Long): Int =
      if (le) u8(i) | (u8(i + 1) << 8) else (u8(i) << 8) | u8(i + 1)
    def u32(i: Long): Long =
      if (le) u16(i).toLong | (u16(i + 2).toLong << 16)
      else (u16(i).toLong << 16) | u16(i + 2)
    def f64(i: Long): Double = {
      var bits = 0L
      var k = 0
      while (k < 8) {
        val byte = u8(i + k).toLong
        bits |= (if (le) byte << (8 * k) else byte << (8 * (7 - k)))
        k += 1
      }
      java.lang.Double.longBitsToDouble(bits)
    }
  }

  /** Parse header + first IFD from the (small) head bytes of the file —
    * offsets/bytecounts arrays included. `headBytes` must cover the IFD and
    * any out-of-line tag values; 1 MB covers real headers. */
  def parseMeta(head: Array[Byte]): Meta = {
    require(head.length >= 8, "not a TIFF: too short")
    val le = head(0) == 'I' && head(1) == 'I'
    val be = head(0) == 'M' && head(1) == 'M'
    require(le || be, "not a TIFF: bad byte-order mark")
    val c = new Cursor(head, le)
    require(c.u16(2) == 42, s"not a classic TIFF (magic ${c.u16(2)}; BigTIFF unsupported)")
    val ifd = c.u32(4)
    val n = c.u16(ifd)
    var width, height = 0
    var bits = 1
    var fmt = 1
    var spp = 1
    var comp = 1
    var rps = 0
    var so, sbc, to, tbc = Seq.empty[Long]
    var tw, tl = 0
    var scale, tie = Seq.empty[Double]
    var geoKeys = Seq.empty[Int]

    def values(entry: Long): Seq[Long] = {
      val typ = c.u16(entry + 2)
      val count = c.u32(entry + 4)
      val size = typ match {
        case 1 | 2 | 6 | 7 => 1
        case 3 => 2
        case 4 => 4
        case 12 => 8
        case other => throw UnsupportedTiff(s"tag type $other")
      }
      val inline = size * count <= 4
      val base = if (inline) entry + 8 else c.u32(entry + 8)
      (0L until count).map { k =>
        typ match {
          case 1 | 2 | 6 | 7 => c.u8(base + k).toLong
          case 3 => c.u16(base + k * 2).toLong
          case 4 => c.u32(base + k * 4)
          case 12 => java.lang.Double.doubleToLongBits(c.f64(base + k * 8))
        }
      }
    }
    def doubles(entry: Long): Seq[Double] =
      values(entry).map(java.lang.Double.longBitsToDouble)

    var i = 0
    while (i < n) {
      val e = ifd + 2 + i * 12L
      c.u16(e) match {
        case 256 => width = values(e).head.toInt
        case 257 => height = values(e).head.toInt
        case 258 => bits = values(e).head.toInt
        case 259 => comp = values(e).head.toInt
        case 273 => so = values(e)
        case 277 => spp = values(e).head.toInt
        case 278 => rps = values(e).head.toInt
        case 279 => sbc = values(e)
        case 284 => if (values(e).head != 1)
          throw UnsupportedTiff("PlanarConfiguration 2 (planar bands)")
        case 322 => tw = values(e).head.toInt
        case 323 => tl = values(e).head.toInt
        case 324 => to = values(e)
        case 325 => tbc = values(e)
        case 339 => fmt = values(e).head.toInt
        case 33550 => scale = doubles(e)
        case 33922 => tie = doubles(e)
        case 34735 => geoKeys = values(e).map(_.toInt)
        case _ => // ignore unknown tags
      }
      i += 1
    }
    require(width > 0 && height > 0, "TIFF missing dimensions")
    if (!Set(1, 8, 32946).contains(comp))
      throw UnsupportedTiff(s"compression $comp (none/deflate only)")
    if (so.isEmpty && to.isEmpty) throw UnsupportedTiff("no strip or tile offsets")
    // TIFF 6.0: a missing RowsPerStrip tag means one strip of all rows
    if (so.nonEmpty && (rps <= 0 || rps > height)) rps = height
    require(scale.size >= 2 && tie.size >= 6,
      "GeoTIFF needs ModelPixelScale + ModelTiepoint")

    // GeoKeyDirectory: header (version, rev, minor, count) then 4-short
    // keys (id, location, count, value). Inline values have location 0.
    var epsg = 0
    if (geoKeys.size >= 4) {
      val count = geoKeys(3)
      (0 until count).foreach { k =>
        val off = 4 + k * 4
        if (off + 3 < geoKeys.size) {
          val id = geoKeys(off)
          val loc = geoKeys(off + 1)
          val value = geoKeys(off + 3)
          if (loc == 0 && (id == 3072 || id == 2048) && epsg == 0) epsg = value
          if (loc == 0 && id == 3072) epsg = value // projected code wins
        }
      }
    }
    Meta(le, width, height, bits, fmt, spp, comp, rps, so, sbc, tw, tl, to, tbc,
      scale, tie, epsg)
  }

  /** Decode one strip/tile's raw bytes to doubles (sample-interleaved). */
  def decodeBlock(m: Meta, raw: Array[Byte], nValues: Int): Array[Double] = {
    val bytes = m.compression match {
      case 1 => raw
      case 8 | 32946 => inflate(raw, nValues * (m.bitsPerSample / 8))
    }
    val out = new Array[Double](nValues)
    val w = m.bitsPerSample / 8
    var k = 0
    while (k < nValues) {
      val base = k * w
      var bits = 0L
      var j = 0
      while (j < w) {
        val byte = (bytes(base + j) & 0xffL)
        bits |= (if (m.littleEndian) byte << (8 * j) else byte << (8 * (w - 1 - j)))
        j += 1
      }
      out(k) = (m.sampleFormat, m.bitsPerSample) match {
        case (3, 32) => java.lang.Float.intBitsToFloat(bits.toInt).toDouble
        case (3, 64) => java.lang.Double.longBitsToDouble(bits)
        case (1, _) => bits.toDouble
        case (2, 8) => bits.toByte.toDouble
        case (2, 16) => bits.toShort.toDouble
        case (2, 32) => bits.toInt.toDouble
        case (f, b) => throw UnsupportedTiff(s"sample format $f at $b bits")
      }
      k += 1
    }
    out
  }

  private def inflate(raw: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new Array[Byte](expected)
    var off = 0
    while (!inf.finished() && off < expected) {
      val n = inf.inflate(out, off, expected - off)
      if (n == 0 && (inf.needsInput() || inf.needsDictionary())) {
        inf.end()
        throw UnsupportedTiff(
          s"truncated or corrupt deflate stream ($off of $expected bytes)")
      }
      off += n
    }
    inf.end()
    out
  }
}
