package graft.sources.tiff

import java.io.FileOutputStream
import java.util.zip.Deflater

/** Minimal GeoTIFF fixture writer: little-endian classic TIFF, one IFD,
  * float32 samples, stripped layout, compression none or deflate,
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
      deflate: Boolean = false)

  def write(path: String, s: Spec): Unit = {
    require(s.data.size == s.width * s.height * s.bands, "data size mismatch")
    val header = 8
    // strips
    val nStrips = (s.height + s.rowsPerStrip - 1) / s.rowsPerStrip
    val stripBytes = (0 until nStrips).map { i =>
      val rows = math.min(s.rowsPerStrip, s.height - i * s.rowsPerStrip)
      val n = rows * s.width * s.bands
      val bb = java.nio.ByteBuffer.allocate(n * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val base = i * s.rowsPerStrip * s.width * s.bands
      (0 until n).foreach(k => bb.putFloat(s.data(base + k).toFloat))
      if (s.deflate) deflate(bb.array()) else bb.array()
    }

    val geoKeys: Seq[Int] = {
      val projected = s.epsg >= 32000
      Seq(1, 1, 0, 2,                      // version, rev, minor, 2 keys
        1024, 0, 1, if (projected) 1 else 2, // GTModelTypeGeoKey
        if (projected) 3072 else 2048, 0, 1, s.epsg)
    }
    val doubleValues = Seq(               // pixel scale (3) + tiepoint (6)
      s.pixelScale._1, s.pixelScale._2, 0.0,
      0.0, 0.0, 0.0, s.tiepointXY._1, s.tiepointXY._2, 0.0)

    // layout: header | strip data | geokeys | doubles | strip arrays | IFD
    var off = header.toLong
    val stripOffsets = stripBytes.map { b => val o = off; off += b.length; o }
    val geoKeyOff = off; off += geoKeys.size * 2L
    val scaleOff = off; off += 3 * 8L
    val tieOff = off; off += 6 * 8L
    val soOff = off; off += nStrips * 4L
    val sbcOff = off; off += nStrips * 4L
    val ifdOff = off

    val entries = Seq[(Int, Int, Long, Long)](   // tag, type, count, value
      (256, 3, 1, s.width), (257, 3, 1, s.height),
      (258, 3, 1, 32), (259, 3, 1, if (s.deflate) 8 else 1),
      (273, 4, nStrips, if (nStrips == 1) stripOffsets.head else soOff),
      (277, 3, 1, s.bands), (278, 3, 1, s.rowsPerStrip),
      (279, 4, nStrips, if (nStrips == 1) stripBytes.head.length.toLong else sbcOff),
      (284, 3, 1, 1), (339, 3, 1, 3),
      (33550, 12, 3, scaleOff), (33922, 12, 6, tieOff),
      (34735, 3, geoKeys.size, geoKeyOff))

    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64d(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    }
    out.write('I'); out.write('I'); w16(42); w32(ifdOff)
    stripBytes.foreach(out.write)
    geoKeys.foreach(w16)
    doubleValues.take(3).foreach(w64d)
    doubleValues.drop(3).foreach(w64d)
    stripOffsets.foreach(w32)
    stripBytes.foreach(b => w32(b.length))
    w16(entries.size)
    entries.foreach { case (tag, typ, count, value) =>
      w16(tag); w16(typ); w32(count)
      if (typ == 3 && count == 1) { w16(value.toInt); w16(0) } else w32(value)
    }
    w32(0) // no next IFD

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
