package graft.sources.tiff

import java.util.zip.Inflater

/** Minimal TIFF 6.0 + GeoTIFF 1.1 structure parsing (public specs) — the
  * pixel-data half of the reference's tif path (S4,
  * weather_mv/loader_pipeline/sinks.py:149-227, which delegates to
  * rasterio). Classic TIFF (magic 42) and BigTIFF (magic 43 — 8-byte
  * offsets for > 4 GiB rasters), either byte order, IFD chains; stripped or
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
      epsg: Int,                 // 4326 | 326xx | 327xx | 0 (unknown)
      predictor: Int = 1,        // 1 none, 2 horizontal differencing
      nextIfd: Long = 0,         // offset of the next IFD (0 = none)
      jpegTables: Array[Byte] = null, // tag 347 (abbreviated JPEG streams)
      planarConfig: Int = 1,     // 1 interleaved (chunky), 2 band-separate planes
      // the full GeoKey directory: inline SHORT keys, and keys whose
      // values live in GeoDoubleParams (tag 34736) — projection parameters
      // for user-defined CRS (TiffProjection resolves them)
      geoShortKeys: Map[Int, Int] = Map.empty,
      geoDoubleKeys: Map[Int, Double] = Map.empty) {

    def tiled: Boolean = tileOffsets.nonEmpty

    /** Model-space x/y of pixel center (col + 0.5, row + 0.5) via the
      * tiepoint + scale affine (GeoTIFF raster-is-area convention). */
    def modelX(col: Int): Double = tiepoint(3) + (col + 0.5 - tiepoint(0)) * pixelScale(0)
    def modelY(row: Int): Double = tiepoint(4) - (row + 0.5 - tiepoint(1)) * pixelScale(1)

    def utmZone: Option[(Int, Boolean)] =
      if (epsg >= 32601 && epsg <= 32660) Some((epsg - 32600, false))
      else if (epsg >= 32701 && epsg <= 32760) Some((epsg - 32700, true))
      else None

    /** Model space is geographic degrees: EPSG 4326, a declared geographic
      * model type (GTModelTypeGeoKey 2), or nothing declared at all. A
      * file declaring model type 1 (projected) with NO CRS code is NOT
      * geographic — its meters must resolve through the GeoKeys (or fail
      * directed), never be renamed latitude/longitude. */
    def isGeographicModel: Boolean =
      epsg == 4326 || geoShortKeys.get(1024).contains(2) ||
        (epsg == 0 && !geoShortKeys.get(1024).contains(1))
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
    def u64(i: Long): Long =
      if (le) u32(i) | (u32(i + 4) << 32) else (u32(i) << 32) | u32(i + 4)
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

  /** Back-compat entry: parse from a fully in-memory file image. */
  def parseMeta(head: Array[Byte]): Meta =
    parseMeta((off, len) => java.util.Arrays.copyOfRange(
      head, off.toInt, off.toInt + len), head.length.toLong)

  /** Parse header + one IFD by FOLLOWING offsets with ranged reads — the
    * IFD and out-of-line values can sit anywhere in the file (trailing-IFD
    * writers put them at EOF), so no fixed-size head probe can cover them.
    * Issues ~1 read per out-of-line tag; headers stay O(KiB) of IO total.
    * `ifdOffset` < 0 follows the header pointer (the primary image);
    * otherwise it parses the IFD at that offset (overview pages — COG
    * pyramids chain them via [[Meta.nextIfd]]). */
  def parseMeta(read: (Long, Int) => Array[Byte], fileLen: Long,
      ifdOffset: Long = -1L): Meta = {
    require(fileLen >= 8, "not a TIFF: too short")
    val hdr = read(0, 8)
    val le = hdr(0) == 'I' && hdr(1) == 'I'
    val be = hdr(0) == 'M' && hdr(1) == 'M'
    require(le || be, "not a TIFF: bad byte-order mark")
    val h = new Cursor(hdr, le)
    val magic = h.u16(2)
    // magic 43 = BigTIFF: 8-byte offsets, 20-byte IFD entries, u64 counts —
    // the format 100 TB-era rasters (> 4 GiB) actually ship in
    val big = magic == 43
    require(big || magic == 42, s"not a TIFF (magic $magic; 42 classic, 43 BigTIFF)")
    val (firstIfd, entrySize, cntSize) =
      if (big) {
        require(fileLen >= 16, "not a BigTIFF: too short")
        val h2 = new Cursor(read(4, 12), le) // offsetSize, pad, first-IFD u64
        require(h2.u16(0) == 8 && h2.u16(2) == 0,
          s"BigTIFF offset size ${h2.u16(0)}/${h2.u16(2)} (must be 8/0)")
        (h2.u64(4), 20, 8)
      } else (h.u32(4), 12, 2)
    val ifd = if (ifdOffset >= 0) ifdOffset else firstIfd
    require(ifd + cntSize <= fileLen, s"IFD offset $ifd beyond EOF $fileLen")
    val n = (if (big) new Cursor(read(ifd, 8), le).u64(0)
      else new Cursor(read(ifd, 2), le).u16(0).toLong).toInt
    require(ifd + cntSize + n.toLong * entrySize <= fileLen,
      s"IFD ($n entries) truncated at EOF")
    val ec = new Cursor(read(ifd + cntSize, n * entrySize), le)
    var width, height = 0
    var bits = 1
    var fmt = 1
    var spp = 1
    var comp = 1
    var pred = 1
    var rps = 0
    var so, sbc, to, tbc = Seq.empty[Long]
    var tw, tl = 0
    var scale, tie = Seq.empty[Double]
    var geoKeys = Seq.empty[Int]
    var geoDoubles = Seq.empty[Double]
    var jpegTab: Array[Byte] = null
    var planar = 1

    def values(entry: Long): Seq[Long] = {
      val typ = ec.u16(entry + 2)
      val count = if (big) ec.u64(entry + 4) else ec.u32(entry + 4)
      val size = typ match {
        case 1 | 2 | 6 | 7 => 1
        case 3 => 2
        case 4 => 4
        case 12 => 8
        case 16 | 17 | 18 => 8 // BigTIFF LONG8 / SLONG8 / IFD8
        case other => throw UnsupportedTiff(s"tag type $other")
      }
      val total = size * count
      val valField = entry + (if (big) 12 else 8)
      // inline values live in the entry itself; out-of-line values get one
      // ranged read at the offset the entry points to
      val (c, base) =
        if (total <= (if (big) 8 else 4)) (ec, valField)
        else {
          val off = if (big) ec.u64(valField) else ec.u32(valField)
          require(off + total <= fileLen,
            s"tag value span [$off, ${off + total}) beyond EOF $fileLen")
          (new Cursor(read(off, total.toInt), le), 0L)
        }
      (0L until count).map { k =>
        typ match {
          case 1 | 2 | 6 | 7 => c.u8(base + k).toLong
          case 3 => c.u16(base + k * 2).toLong
          case 4 => c.u32(base + k * 4)
          case 16 | 17 | 18 => c.u64(base + k * 8)
          case 12 => java.lang.Double.doubleToLongBits(c.f64(base + k * 8))
        }
      }
    }
    def doubles(entry: Long): Seq[Double] =
      values(entry).map(java.lang.Double.longBitsToDouble)

    var i = 0
    while (i < n) {
      val e = i.toLong * entrySize
      ec.u16(e) match {
        case 256 => width = values(e).head.toInt
        case 257 => height = values(e).head.toInt
        case 258 => bits = values(e).head.toInt
        case 259 => comp = values(e).head.toInt
        case 317 => pred = values(e).head.toInt
        case 273 => so = values(e)
        case 277 => spp = values(e).head.toInt
        case 278 => rps = values(e).head.toInt
        case 279 => sbc = values(e)
        case 284 => planar = values(e).head.toInt
        case 322 => tw = values(e).head.toInt
        case 323 => tl = values(e).head.toInt
        case 324 => to = values(e)
        case 325 => tbc = values(e)
        case 339 => fmt = values(e).head.toInt
        case 33550 => scale = doubles(e)
        case 33922 => tie = doubles(e)
        case 34735 => geoKeys = values(e).map(_.toInt)
        case 34736 => geoDoubles = doubles(e)
        case 347 => jpegTab = values(e).map(_.toByte).toArray
        case _ => // ignore unknown tags
      }
      i += 1
    }
    require(width > 0 && height > 0, "TIFF missing dimensions")
    if (!Set(1, 5, 7, 8, 32773, 32946, 50000).contains(comp))
      throw UnsupportedTiff(
        s"compression $comp (none/LZW/JPEG/deflate/PackBits/ZSTD only)")
    if (comp == 7 && (bits != 8 || fmt != 1))
      throw UnsupportedTiff(
        s"JPEG compression with $bits-bit format-$fmt samples (8-bit uint only)")
    if (planar != 1 && planar != 2)
      throw UnsupportedTiff(s"PlanarConfiguration $planar (1 or 2 only)")
    if (planar == 2 && comp == 7)
      throw UnsupportedTiff("PlanarConfiguration 2 with JPEG compression")
    if (pred == 2 && fmt == 3)
      throw UnsupportedTiff("predictor 2 with floating-point samples " +
        "(predictor 3 is the float predictor)")
    if (pred == 3 && fmt != 3)
      throw UnsupportedTiff("predictor 3 (floating-point) with integer samples")
    if (pred != 1 && pred != 2 && pred != 3)
      throw UnsupportedTiff(s"predictor $pred (none/horizontal/floating-point only)")
    if (so.isEmpty && to.isEmpty) throw UnsupportedTiff("no strip or tile offsets")
    // TIFF 6.0: a missing RowsPerStrip tag means one strip of all rows
    if (so.nonEmpty && (rps <= 0 || rps > height)) rps = height
    require(scale.size >= 2 && tie.size >= 6,
      "GeoTIFF needs ModelPixelScale + ModelTiepoint")

    // GeoKeyDirectory: header (version, rev, minor, count) then 4-short
    // keys (id, location, count, value). Inline values have location 0;
    // location 34736 indexes GeoDoubleParams (projection parameters).
    var epsg = 0
    var shortKeys = Map.empty[Int, Int]
    var dblKeys = Map.empty[Int, Double]
    if (geoKeys.size >= 4) {
      val count = geoKeys(3)
      (0 until count).foreach { k =>
        val off = 4 + k * 4
        if (off + 3 < geoKeys.size) {
          val id = geoKeys(off)
          val loc = geoKeys(off + 1)
          val cnt = geoKeys(off + 2)
          val value = geoKeys(off + 3)
          if (loc == 0 && (id == 3072 || id == 2048) && epsg == 0) epsg = value
          if (loc == 0 && id == 3072) epsg = value // projected code wins
          if (loc == 0) shortKeys += id -> value
          else if (loc == 34736 && cnt == 1 && value < geoDoubles.size)
            dblKeys += id -> geoDoubles(value)
        }
      }
    }
    val nextPtr = ifd + cntSize + n.toLong * entrySize
    val nextIfd =
      if (big) { if (nextPtr + 8 <= fileLen) new Cursor(read(nextPtr, 8), le).u64(0) else 0L }
      else { if (nextPtr + 4 <= fileLen) new Cursor(read(nextPtr, 4), le).u32(0) else 0L }
    Meta(le, width, height, bits, fmt, spp, comp, rps, so, sbc, tw, tl, to, tbc,
      scale, tie, epsg, pred, nextIfd = nextIfd, jpegTables = jpegTab,
      planarConfig = planar, geoShortKeys = shortKeys, geoDoubleKeys = dblKeys)
  }

  /** Compression 7 (new-style JPEG, TIFF-EP / the RGB-imagery COG
    * convention): each strip/tile is a JPEG codestream, optionally
    * ABBREVIATED — quantization/Huffman tables then live once in the
    * JPEGTables tag (347) and must be spliced in after the block's SOI.
    * Decode goes through the JDK's own ImageIO JPEG reader (the repo
    * already leans on it for multimodal decode); YCbCr photometric
    * converts to RGB there. Lossy by nature — 8-bit unsigned only. */
  private def jpegDecodeBlock(m: Meta, raw: Array[Byte], nValues: Int,
      rowSamples: Int): Array[Double] = {
    require(rowSamples > 0, "JPEG blocks need the block's row width")
    val stream =
      if (m.jpegTables == null || m.jpegTables.length <= 4 ||
          raw.length < 2) raw
      else {
        // tables stream is SOI..tables..EOI; insert its body after the
        // block's SOI (TIFF-EP abbreviated-stream convention)
        val body = java.util.Arrays.copyOfRange(m.jpegTables, 2,
          m.jpegTables.length - 2)
        val out = new Array[Byte](2 + body.length + raw.length - 2)
        out(0) = raw(0); out(1) = raw(1)
        System.arraycopy(body, 0, out, 2, body.length)
        System.arraycopy(raw, 2, out, 2 + body.length, raw.length - 2)
        out
      }
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(stream))
    if (img == null) throw UnsupportedTiff("JPEG block failed to decode")
    val r = img.getRaster
    val spp = m.samplesPerPixel
    if (r.getNumBands != spp)
      throw UnsupportedTiff(
        s"JPEG block decoded ${r.getNumBands} bands for $spp samples/pixel")
    val blockW = rowSamples / spp
    val blockH = nValues / rowSamples
    val out = new Array[Double](nValues)
    // edge blocks may decode smaller than the nominal block; the padding
    // area stays 0.0 (the caller crops to the image bounds anyway)
    val w = math.min(blockW, r.getWidth)
    val h = math.min(blockH, r.getHeight)
    var row = 0
    while (row < h) {
      var colS = 0
      while (colS < w) {
        var b = 0
        while (b < spp) {
          out(row * rowSamples + colS * spp + b) = r.getSample(colS, row, b)
          b += 1
        }
        colS += 1
      }
      row += 1
    }
    out
  }

  /** Decode one strip/tile's raw bytes to doubles (sample-interleaved).
    * `rowSamples` is the sample count of one scanline of THIS block (block
    * width * samplesPerPixel) — the horizontal predictor resets per row. */
  def decodeBlock(m: Meta, raw: Array[Byte], nValues: Int,
      rowSamples: Int = 0): Array[Double] = {
    if (m.compression == 7) return jpegDecodeBlock(m, raw, nValues, rowSamples)
    val bytes0 = m.compression match {
      case 1 => raw
      case 5 => Lzw.decode(raw, nValues * (m.bitsPerSample / 8))
      case 8 | 32946 => inflate(raw, nValues * (m.bitsPerSample / 8))
      case 32773 => unpackBits(raw, nValues * (m.bitsPerSample / 8))
      case 50000 => // ZSTD (GDAL/COG convention), one frame per block
        graft.sources.zarr.Zstd.decompress(raw, 0, raw.length,
          nValues * (m.bitsPerSample / 8))
    }
    val bytes =
      if (m.predictor == 3) fpUnpredict(bytes0, m, nValues, rowSamples)
      else bytes0
    val ints = new Array[Long](nValues)
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
      ints(k) = bits
      k += 1
    }
    if (m.predictor == 2) {
      // undo horizontal differencing: cumulative sum along each scanline,
      // per sample component, modulo 2^bits (TIFF 6.0 §14)
      require(rowSamples > 0, "predictor 2 needs the block's row width")
      val mask = if (m.bitsPerSample == 64) -1L else (1L << m.bitsPerSample) - 1
      val spp = m.samplesPerPixel
      var row0 = 0
      while (row0 < nValues) {
        var k = row0 + spp
        val end = math.min(row0 + rowSamples, nValues)
        while (k < end) {
          ints(k) = (ints(k) + ints(k - spp)) & mask
          k += 1
        }
        row0 += rowSamples
      }
    }
    val out = new Array[Double](nValues)
    k = 0
    while (k < nValues) {
      val bits = ints(k)
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

  /** PackBits (TIFF 6.0 §9 / the classic Apple RLE): control byte n in
    * 0..127 copies n+1 literals; -1..-127 repeats the next byte 1-n times;
    * -128 is a no-op. */
  private[tiff] def unpackBits(raw: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var s = 0
    var d = 0
    while (d < expected) {
      require(s < raw.length, s"truncated PackBits stream ($d of $expected bytes)")
      val n = raw(s)
      s += 1
      if (n >= 0) {
        val run = n + 1
        require(s + run <= raw.length && d + run <= expected,
          s"PackBits literal run overruns (run=$run)")
        System.arraycopy(raw, s, out, d, run)
        s += run
        d += run
      } else if (n != -128) {
        val run = 1 - n
        require(s < raw.length && d + run <= expected,
          s"PackBits repeat run overruns (run=$run)")
        java.util.Arrays.fill(out, d, d + run, raw(s))
        s += 1
        d += run
      }
    }
    out
  }

  /** Inverse of the TIFF floating-point predictor (predictor 3, TechNote 3
    * / libtiff fpAcc): per scanline, the samples' bytes are split into
    * byte-significance planes ordered most-significant first, then
    * horizontally differenced byte-wise with a samples-per-pixel stride.
    * Undo: cumulative byte sum across the row, then reassemble each sample
    * from its planes. Returns bytes in the FILE's byte order so the
    * caller's endian-aware sample read applies unchanged. */
  private[tiff] def fpUnpredict(bytes0: Array[Byte], m: Meta, nValues: Int,
      rowSamples: Int): Array[Byte] = {
    require(rowSamples > 0, "predictor 3 needs the block's row width")
    val w = m.bitsPerSample / 8
    val stride = m.samplesPerPixel
    // copy before accumulating: for compression=1 the input IS the
    // caller's raw buffer, and mutating it would corrupt a re-decode
    val bytes = bytes0.clone()
    val out = new Array[Byte](bytes.length)
    var row0 = 0
    while (row0 < nValues) {
      val rs = math.min(rowSamples, nValues - row0)
      val base = row0 * w
      val rb = rs * w
      // byte-wise horizontal accumulation (stride = samples per pixel)
      var i = base + stride
      while (i < base + rb) {
        bytes(i) = (bytes(i) + bytes(i - stride)).toByte
        i += 1
      }
      // planes (MSB plane first) -> interleaved sample bytes, honoring the
      // file's declared byte order
      var k = 0
      while (k < rs) {
        var b = 0
        while (b < w) {
          val plane = bytes(base + b * rs + k)
          val at = base + k * w + (if (m.littleEndian) w - 1 - b else b)
          out(at) = plane
          b += 1
        }
        k += 1
      }
      row0 += rowSamples
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
