package graft.sources.tiff

import java.io.FileOutputStream
import java.util.zip.Deflater

/** Minimal GeoTIFF fixture writer: little-endian classic TIFF or BigTIFF
  * (`bigTiff = true`: magic 43, 8-byte offsets, LONG8 arrays), one IFD,
  * stripped layout, compression none / deflate / LZW (with the horizontal
  * predictor for integer samples), float32 or integer samples,
  * ModelPixelScale/ModelTiepoint + a GeoKeyDirectory carrying one EPSG
  * code. Enough to exercise [[TiffReader]] without rasterio/GDAL. */
object TiffWriter {

  final case class Spec(
      width: Int,
      height: Int,
      bands: Int,
      data: Seq[Double],           // row-major, band-interleaved
      pixelScale: (Double, Double),
      tiepointXY: (Double, Double), // model x/y of pixel (0, 0) corner
      epsg: Int,
      rowsPerStrip: Int = 8,
      deflate: Boolean = false,
      lzw: Boolean = false,
      packBits: Boolean = false,
      zstd: Boolean = false,       // compression 50000 (GDAL/COG convention)
      predictor: Int = 1,          // 2 = horizontal (int), 3 = float planes
      bitsPerSample: Int = 32,
      sampleFormat: Int = 3,       // 1 uint, 2 int, 3 ieee float
      bigTiff: Boolean = false,    // magic 43, 8-byte offsets, LONG8 arrays
      // extra GeoKeys beyond the model-type + CRS-code pair: (id, value)
      // SHORT keys, plus (id, double) keys stored in GeoDoubleParams (tag
      // 34736) — enough to declare a user-defined ProjCS (epsg = 32767)
      extraShortKeys: Seq[(Int, Int)] = Nil,
      doubleKeys: Seq[(Int, Double)] = Nil) {

    def compressionCode: Int =
      if (lzw) 5 else if (deflate) 8 else if (packBits) 32773
      else if (zstd) 50000 else 1
  }

  /** One scanline-block of samples as packed little-endian bytes, predictor
    * applied (TIFF 6.0 §14: difference per component along the row). */
  private[tiff] def packSamples(s: Spec, values: Seq[Double], rowSamples: Int): Array[Byte] = {
    require(!(s.predictor == 2 && s.sampleFormat == 3),
      "predictor 2 applies to integer samples")
    require(!(s.predictor == 3 && s.sampleFormat != 3),
      "predictor 3 applies to floating-point samples")
    val w = s.bitsPerSample / 8
    val ints = new Array[Long](values.size)
    var k = 0
    while (k < ints.length) {
      ints(k) = (s.sampleFormat, s.bitsPerSample) match {
        case (3, 32) => java.lang.Float.floatToIntBits(values(k).toFloat).toLong & 0xffffffffL
        case (3, 64) => java.lang.Double.doubleToLongBits(values(k))
        case (_, b) => values(k).toLong & (if (b == 64) -1L else (1L << b) - 1)
      }
      k += 1
    }
    if (s.predictor == 2) {
      val mask = if (s.bitsPerSample == 64) -1L else (1L << s.bitsPerSample) - 1
      var row0 = 0
      while (row0 < ints.length) {
        val end = math.min(row0 + rowSamples, ints.length)
        var k = end - 1
        while (k >= row0 + s.bands) {
          ints(k) = (ints(k) - ints(k - s.bands)) & mask
          k -= 1
        }
        row0 += rowSamples
      }
    }
    val out = new Array[Byte](ints.length * w)
    k = 0
    while (k < ints.length) {
      var j = 0
      while (j < w) {
        out(k * w + j) = ((ints(k) >> (8 * j)) & 0xff).toByte
        j += 1
      }
      k += 1
    }
    if (s.predictor == 3) {
      // float predictor (TechNote 3): per row, split sample bytes into
      // significance planes (MSB plane first), then difference byte-wise
      var row0 = 0
      while (row0 < ints.length) {
        val rs = math.min(rowSamples, ints.length - row0)
        val base = row0 * w
        val planes = new Array[Byte](rs * w)
        var kk = 0
        while (kk < rs) {
          var b = 0
          while (b < w) {
            // out is little-endian packed: byte (w-1-b) has significance b
            planes(b * rs + kk) = out(base + kk * w + (w - 1 - b))
            b += 1
          }
          kk += 1
        }
        var i = rs * w - 1
        while (i >= s.bands) {
          planes(i) = (planes(i) - planes(i - s.bands)).toByte
          i -= 1
        }
        System.arraycopy(planes, 0, out, base, rs * w)
        row0 += rowSamples
      }
    }
    out
  }

  /** PackBits encoder (TIFF 6.0 §9): repeat runs as (1-n, byte), literal
    * stretches up to 128 bytes otherwise — every element the decoder's
    * grammar accepts. */
  private[tiff] def packBitsEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length + raw.length / 128 + 1)
    var i = 0
    while (i < raw.length) {
      var run = 1
      while (i + run < raw.length && run < 128 && raw(i + run) == raw(i)) run += 1
      if (run >= 2) {
        out.write(1 - run)
        out.write(raw(i))
        i += run
      } else {
        // literal until the next 3-byte repeat (or the 128-byte cap)
        var j = i + 1
        while (j < raw.length && j - i < 128 &&
            !(j + 2 < raw.length && raw(j) == raw(j + 1) && raw(j) == raw(j + 2)))
          j += 1
        out.write(j - i - 1)
        out.write(raw, i, j - i)
        i = j
      }
    }
    out.toByteArray
  }

  def write(path: String, s: Spec): Unit = {
    require(s.data.size == s.width * s.height * s.bands, "data size mismatch")
    val big = s.bigTiff
    val header = if (big) 16 else 8
    // strips
    val nStrips = (s.height + s.rowsPerStrip - 1) / s.rowsPerStrip
    val stripBytes = (0 until nStrips).map { i =>
      val rows = math.min(s.rowsPerStrip, s.height - i * s.rowsPerStrip)
      val n = rows * s.width * s.bands
      val base = i * s.rowsPerStrip * s.width * s.bands
      val raw = packSamples(s, s.data.slice(base, base + n), s.width * s.bands)
      if (s.lzw) Lzw.encode(raw)
      else if (s.deflate) deflate(raw)
      else if (s.packBits) packBitsEncode(raw)
      else if (s.zstd) graft.sources.zarr.Zstd.compressStore(raw)
      else raw
    }

    // GeoKey directory entries (id, location, count, value), sorted by id
    // as the GeoTIFF spec requires; double-valued keys point into the
    // GeoDoubleParams tag (34736) by index
    val geoDoubleParams = s.doubleKeys.map(_._2)
    val geoKeys: Seq[Int] = {
      // geographic EPSG codes live in 4000-4999; anything else declared
      // here is a projected CRS (UTM, national grids, polar codes, or the
      // user-defined marker 32767)
      val projected = s.epsg != 0 && !(s.epsg >= 4000 && s.epsg < 5000)
      val entries: Seq[(Int, Int, Int, Int)] =
        (Seq((1024, 0, 1, if (projected) 1 else 2), // GTModelTypeGeoKey
          (if (projected) 3072 else 2048, 0, 1, s.epsg)) ++
          s.extraShortKeys.map { case (id, v) => (id, 0, 1, v) } ++
          s.doubleKeys.zipWithIndex.map { case ((id, _), i) =>
            (id, 34736, 1, i) }).sortBy(_._1)
      Seq(1, 1, 0, entries.size) ++
        entries.flatMap { case (a, b, c, d) => Seq(a, b, c, d) }
    }
    val doubleValues = Seq(               // pixel scale (3) + tiepoint (6)
      s.pixelScale._1, s.pixelScale._2, 0.0,
      0.0, 0.0, 0.0, s.tiepointXY._1, s.tiepointXY._2, 0.0)

    // BigTIFF arrays carry 8-byte LONG8 elements (type 16) and entries
    // inline up to 8 bytes; classic stays LONG/4-byte
    val arrElem = if (big) 8L else 4L
    val arrType = if (big) 16 else 4
    // layout: header | strip data | geokeys | doubles | strip arrays | IFD
    var off = header.toLong
    val stripOffsets = stripBytes.map { b => val o = off; off += b.length; o }
    // out-of-line double values must stay out of line: a single-entry
    // GeoDoubleParams would fit a BigTIFF entry inline, which this writer
    // does not emit — keep fixtures classic or give them 2+ double keys
    require(!(big && geoDoubleParams.size == 1),
      "BigTIFF with exactly one double GeoKey is not supported by this writer")
    val geoKeyOff = off; off += geoKeys.size * 2L
    val scaleOff = off; off += 3 * 8L
    val tieOff = off; off += 6 * 8L
    val gdpOff = off; off += geoDoubleParams.size * 8L
    val soOff = off; off += nStrips * arrElem
    val sbcOff = off; off += nStrips * arrElem
    val ifdOff = off

    val entries = (Seq[(Int, Int, Long, Long)](   // tag, type, count, value
      (256, 3, 1, s.width), (257, 3, 1, s.height),
      (258, 3, 1, s.bitsPerSample), (259, 3, 1, s.compressionCode),
      (273, arrType, nStrips, if (nStrips == 1) stripOffsets.head else soOff),
      (277, 3, 1, s.bands), (278, 3, 1, s.rowsPerStrip),
      (279, arrType, nStrips, if (nStrips == 1) stripBytes.head.length.toLong else sbcOff),
      (284, 3, 1, 1)) ++
      (if (s.predictor != 1)
        Seq[(Int, Int, Long, Long)]((317, 3, 1, s.predictor.toLong)) else Nil) ++
      (if (geoDoubleParams.nonEmpty)
        Seq[(Int, Int, Long, Long)](
          (34736, 12, geoDoubleParams.size, gdpOff)) else Nil) ++
      Seq[(Int, Int, Long, Long)](
        (339, 3, 1, s.sampleFormat),
        (33550, 12, 3, scaleOff), (33922, 12, 6, tieOff),
        (34735, 3, geoKeys.size, geoKeyOff))).sortBy(_._1)

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >> 32) & 0xffffffffL) }
    def wArr(v: Long): Unit = if (big) w64(v) else w32(v)
    def w64d(v: Double): Unit = w64(java.lang.Double.doubleToLongBits(v))
    if (big) { out.write('I'); out.write('I'); w16(43); w16(8); w16(0); w64(ifdOff) }
    else { out.write('I'); out.write('I'); w16(42); w32(ifdOff) }
    stripBytes.foreach(out.write)
    geoKeys.foreach(w16)
    doubleValues.take(3).foreach(w64d)
    doubleValues.drop(3).foreach(w64d)
    geoDoubleParams.foreach(w64d)
    stripOffsets.foreach(wArr)
    stripBytes.foreach(b => wArr(b.length))
    if (big) w64(entries.size) else w16(entries.size)
    entries.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ)
      if (big) w64(count) else w32(count)
      // inline scalars pack into the value field's low bytes (LE)
      if (typ == 3 && count == 1) {
        w16(value.toInt); w16(0); if (big) w32(0)
      } else if (big) w64(value) else w32(value)
    }
    if (big) w64(0) else w32(0) // no next IFD

    val fos = new FileOutputStream(path)
    try fos.write(out.toByteArray) finally fos.close()
  }

  private def deflate(bytes: Array[Byte]): Array[Byte] = {
    val d = new Deflater(6)
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](64 * 1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }
}
