package graft.sources.tiff

import java.io.FileOutputStream
import java.util.zip.Deflater

/** Cloud-Optimized GeoTIFF writer (S12 — the reference stages COG assets for
  * Earth Engine with GDAL's COG driver, weather_mv/loader_pipeline/
  * ee.py:657-695). Follows the COG layout rules on top of classic TIFF:
  *
  *  - all IFDs at the START of the file (full resolution first, then each
  *    overview, chained via next-IFD pointers), tag values right after them,
  *    so one small head read plans any request;
  *  - TILED layout (not strips) for ranged partial reads;
  *  - overview levels (2x average downsampling, GDAL's default resampling)
  *    marked NewSubfileType=1, each carrying its own scaled georeferencing;
  *  - tile data ordered smallest-overview FIRST and full resolution LAST,
  *    so low-zoom readers never seek past data they don't need;
  *  - LZW, deflate, or ZSTD (50000) compression with the horizontal
  *    predictor for integer samples;
  *  - classic TIFF (magic 42) or BigTIFF (`bigTiff = true`: magic 43,
  *    8-byte offsets, 20-byte IFD entries, LONG8 tile arrays) — the form
  *    rasters over 4 GiB require.
  *
  * Readable by [[TiffReader]] (tiled path; the first IFD is the full
  * resolution image). */
object CogWriter {

  final case class Spec(
      width: Int,
      height: Int,
      bands: Int,
      data: Seq[Double],            // row-major, band-interleaved
      pixelScale: (Double, Double),
      tiepointXY: (Double, Double), // model x/y of pixel (0, 0) corner
      epsg: Int,
      tileWidth: Int = 128,
      tileLength: Int = 128,
      lzw: Boolean = true,
      deflate: Boolean = false,
      zstd: Boolean = false,        // compression 50000 (GDAL/COG convention)
      predictor: Int = 1,
      bitsPerSample: Int = 32,
      sampleFormat: Int = 3,
      maxOverviews: Int = 6,
      bigTiff: Boolean = false)   // magic 43: 8-byte offsets, 20-byte entries

  private final case class Level(
      width: Int, height: Int, data: Array[Double],
      scaleX: Double, scaleY: Double, subfileType: Int)

  /** 2x downsample by block average (all bands), the deterministic analog of
    * GDAL's 'average' overview resampling. */
  private def downsample(w: Int, h: Int, bands: Int,
      src: Array[Double]): (Int, Int, Array[Double]) = {
    val ow = (w + 1) / 2
    val oh = (h + 1) / 2
    val out = new Array[Double](ow * oh * bands)
    var r = 0
    while (r < oh) {
      var c = 0
      while (c < ow) {
        var b = 0
        while (b < bands) {
          var sum = 0.0
          var cnt = 0
          var dr = 0
          while (dr < 2) {
            var dc = 0
            while (dc < 2) {
              val sr = r * 2 + dr
              val sc = c * 2 + dc
              if (sr < h && sc < w) {
                sum += src((sr * w + sc) * bands + b)
                cnt += 1
              }
              dc += 1
            }
            dr += 1
          }
          out((r * ow + c) * bands + b) = sum / cnt
          b += 1
        }
        c += 1
      }
      r += 1
    }
    (ow, oh, out)
  }

  def write(path: String, s: Spec): Unit = {
    require(s.data.size == s.width * s.height * s.bands, "data size mismatch")
    require(Seq(s.lzw, s.deflate, s.zstd).count(identity) <= 1,
      "pick one compression")

    // 1. resolution pyramid: full res + 2x overviews until it fits one tile
    val levels = {
      val out = Seq.newBuilder[Level]
      out += Level(s.width, s.height, s.data.toArray,
        s.pixelScale._1, s.pixelScale._2, 0)
      var (w, h, d) = (s.width, s.height, s.data.toArray)
      var (sx, sy) = s.pixelScale
      var k = 0
      while ((w > s.tileWidth || h > s.tileLength) && k < s.maxOverviews) {
        val (nw, nh, nd) = downsample(w, h, s.bands, d)
        sx *= 2; sy *= 2
        out += Level(nw, nh, nd, sx, sy, 1)
        w = nw; h = nh; d = nd
        k += 1
      }
      out.result()
    }

    // 2. encode every level's tiles (edge tiles padded to full tile size,
    // as TIFF requires)
    val packSpec = TiffWriter.Spec(s.width, s.height, s.bands, Nil,
      s.pixelScale, s.tiepointXY, s.epsg,
      lzw = s.lzw, deflate = s.deflate, zstd = s.zstd,
      predictor = s.predictor,
      bitsPerSample = s.bitsPerSample, sampleFormat = s.sampleFormat)
    def encodeTiles(lv: Level): Seq[Array[Byte]] = {
      val across = (lv.width + s.tileWidth - 1) / s.tileWidth
      val down = (lv.height + s.tileLength - 1) / s.tileLength
      for (t <- 0 until across * down) yield {
        val row0 = (t / across) * s.tileLength
        val col0 = (t % across) * s.tileWidth
        val tile = new Array[Double](s.tileWidth * s.tileLength * s.bands)
        var r = 0
        while (r < s.tileLength) {
          var c = 0
          while (c < s.tileWidth) {
            val sr = row0 + r
            val sc = col0 + c
            if (sr < lv.height && sc < lv.width) {
              var b = 0
              while (b < s.bands) {
                tile((r * s.tileWidth + c) * s.bands + b) =
                  lv.data((sr * lv.width + sc) * s.bands + b)
                b += 1
              }
            }
            c += 1
          }
          r += 1
        }
        val raw = TiffWriter.packSamples(packSpec, tile.toSeq,
          s.tileWidth * s.bands)
        if (s.lzw) Lzw.encode(raw)
        else if (s.deflate) deflate(raw)
        else if (s.zstd) graft.sources.zarr.Zstd.compressStore(raw)
        else raw
      }
    }
    val tilesPerLevel: Seq[Seq[Array[Byte]]] = levels.map(encodeTiles)

    // 3. layout. Head: header | per-level (IFD, then its out-of-line tag
    // values). Data: levels smallest-first, full resolution LAST.
    val compCode = if (s.lzw) 5 else if (s.deflate) 8 else if (s.zstd) 50000 else 1
    val geoKeys: Seq[Int] = {
      val projected = s.epsg >= 32000
      Seq(1, 1, 0, 2,
        1024, 0, 1, if (projected) 1 else 2,
        if (projected) 3072 else 2048, 0, 1, s.epsg)
    }
    def entryCount = 16 // fixed tag set, every level (predictor always written)
    val big = s.bigTiff
    // BigTIFF: u64 entry count + 20-byte entries + u64 next pointer;
    // offset/bytecount arrays are LONG8
    def ifdBytes = if (big) 8 + entryCount * 20 + 8 else 2 + entryCount * 12 + 4
    val offW = if (big) 8L else 4L

    final case class Layout(ifdOff: Long, toOff: Long, tbcOff: Long,
      scaleOff: Long, tieOff: Long, geoOff: Long)
    var off = if (big) 16L else 8L
    val layouts = levels.zip(tilesPerLevel).map { case (lv, tiles) =>
      val ifdOff = off; off += ifdBytes
      val toOff = off; off += tiles.size * offW
      val tbcOff = off; off += tiles.size * offW
      val scaleOff = off; off += 3 * 8L
      val tieOff = off; off += 6 * 8L
      val geoOff = off; off += geoKeys.size * 2L
      Layout(ifdOff, toOff, tbcOff, scaleOff, tieOff, geoOff)
    }
    // data region: reverse level order (smallest overview first)
    val tileOffsets: Array[Seq[Long]] = new Array(levels.size)
    for (i <- levels.indices.reverse) {
      tileOffsets(i) = tilesPerLevel(i).map { t => val o = off; off += t.length; o }
    }

    // 4. serialize
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = { w16((v & 0xffff).toInt); w16(((v >> 16) & 0xffff).toInt) }
    def w64d(v: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(v)
      (0 until 8).foreach(i => out.write(((bits >> (8 * i)) & 0xff).toInt))
    }
    def w64(v: Long): Unit = { w32(v & 0xffffffffL); w32((v >>> 32) & 0xffffffffL) }
    def wOff(v: Long): Unit = if (big) w64(v) else w32(v)
    if (big) { out.write('I'); out.write('I'); w16(43); w16(8); w16(0); w64(layouts.head.ifdOff) }
    else { out.write('I'); out.write('I'); w16(42); w32(layouts.head.ifdOff) }
    levels.indices.foreach { i =>
      val lv = levels(i)
      val lay = layouts(i)
      val tiles = tilesPerLevel(i)
      val entries = Seq[(Int, Int, Long, Long)](
        (254, 4, 1, lv.subfileType),
        (256, 3, 1, lv.width), (257, 3, 1, lv.height),
        (258, 3, 1, s.bitsPerSample), (259, 3, 1, compCode),
        (277, 3, 1, s.bands), (284, 3, 1, 1),
        (317, 3, 1, s.predictor),
        (322, 3, 1, s.tileWidth), (323, 3, 1, s.tileLength),
        (324, if (big) 16 else 4, tiles.size,
          if (tiles.size == 1) tileOffsets(i).head else lay.toOff),
        (325, if (big) 16 else 4, tiles.size,
          if (tiles.size == 1) tiles.head.length.toLong else lay.tbcOff),
        (339, 3, 1, s.sampleFormat),
        (33550, 12, 3, lay.scaleOff), (33922, 12, 6, lay.tieOff),
        (34735, 3, geoKeys.size, lay.geoOff))
      require(entries.size == entryCount, s"entry count drift: ${entries.size}")
      if (big) w64(entries.size) else w16(entries.size)
      entries.foreach { case (tag, typ, count, value) =>
        w16(tag); w16(typ)
        if (big) {
          w64(count)
          if (typ == 3 && count == 1) { w16(value.toInt); w16(0); w32(0) }
          else w64(value)
        } else {
          w32(count)
          if (typ == 3 && count == 1) { w16(value.toInt); w16(0) } else w32(value)
        }
      }
      wOff(if (i + 1 < levels.size) layouts(i + 1).ifdOff else 0L) // IFD chain
      tileOffsets(i).foreach(wOff)
      tiles.foreach(t => wOff(t.length))
      Seq(lv.scaleX, lv.scaleY, 0.0).foreach(w64d)
      Seq(0.0, 0.0, 0.0, s.tiepointXY._1, s.tiepointXY._2, 0.0).foreach(w64d)
      geoKeys.foreach(w16)
    }
    for (i <- levels.indices.reverse) tilesPerLevel(i).foreach(out.write)

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
