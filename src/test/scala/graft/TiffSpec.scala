package graft

import org.apache.spark.sql.functions._

import graft.functions.CrsTransform
import graft.sources.grib.GribProjection
import graft.sources.tiff.{TiffReader, TiffWriter => TW}

/** Golden tests for the GeoTIFF reader: fixture files from the pure-JVM
  * writer, strip decode (raw + deflate), the tiepoint/scale affine, and
  * both CRS paths (EPSG:4326 pass-through, UTM inverse reprojection). */
class TiffSpec extends SparkSpec {
  import spark.implicits._

  private val (w, h) = (6, 5)
  private def vals(f: (Int, Int) => Double): Seq[Double] =
    for (r <- 0 until h; c <- 0 until w) yield f(r, c)

  test("EPSG:4326 raster: model coords pass through as lon/lat, exact values") {
    val dir = java.nio.file.Files.createTempDirectory("tif4326").toString
    val p = s"$dir/t.tif"
    // 0.5-degree pixels anchored at (10E, 55N); value = 100*r + c
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => 100.0 * r + c),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
      rowsPerStrip = 2))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.columns.toSeq == Seq("latitude", "longitude", "band_1"))
    assert(df.count() == w * h)
    // pixel (r=1, c=2): center lon = 10 + 2.5*0.5, lat = 55 - 1.5*0.5
    val r = df.filter($"latitude" === 54.25 && $"longitude" === 11.25).head()
    assert(r.getAs[Double]("band_1") == 102.0)
    // corner pixel (0,0) at (10.25, 54.75)
    assert(df.filter($"latitude" === 54.75 && $"longitude" === 10.25)
      .head().getAs[Double]("band_1") == 0.0)
  }

  test("deflate-compressed strips decode identically") {
    val dir = java.nio.file.Files.createTempDirectory("tifz").toString
    val raw = s"$dir/raw.tif"
    val zip = s"$dir/zip.tif"
    val spec = TW.Spec(w, h, 1, vals((r, c) => r * 7.0 + c * 0.25),
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326)
    TW.write(raw, spec)
    TW.write(zip, spec.copy(deflate = true))
    val a = TiffReader.readLongFormat(spark, raw)
      .orderBy($"latitude", $"longitude").collect()
    val b = TiffReader.readLongFormat(spark, zip)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(b))
  }

  test("ZSTD strips (50000) and a ZSTD COG decode identically") {
    import graft.sources.tiff.CogWriter
    val dir = java.nio.file.Files.createTempDirectory("tifzstd").toString
    val raw = s"$dir/raw.tif"
    val zst = s"$dir/zst.tif"
    val spec = TW.Spec(w, h, 1, vals((r, c) => r * 7.0 + c * 0.25),
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326)
    TW.write(raw, spec)
    TW.write(zst, spec.copy(zstd = true))
    val a = TiffReader.readLongFormat(spark, raw)
      .orderBy($"latitude", $"longitude").collect()
    val b = TiffReader.readLongFormat(spark, zst)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(b))
    // tiled path with the horizontal predictor through the COG writer
    val p = s"$dir/c.tif"
    val (bw, bh) = (150, 90)
    val data = (0 until bw * bh).map(k => ((k * 17) % 2048).toDouble)
    CogWriter.write(p, CogWriter.Spec(bw, bh, 1, data,
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      tileWidth = 64, tileLength = 64, lzw = false, zstd = true,
      predictor = 2, bitsPerSample = 16, sampleFormat = 1))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == bw.toLong * bh)
    val got = df.filter(abs($"latitude" - (50.0 - 3.5 * 0.01)) < 1e-9 &&
        abs($"longitude" - 7.5 * 0.01) < 1e-9)
      .head().getAs[Double]("band_1")
    assert(got == ((3 * bw + 7) * 17 % 2048).toDouble)
  }

  test("PackBits strips and the floating-point predictor decode identically") {
    val dir = java.nio.file.Files.createTempDirectory("tifpb").toString
    val raw = s"$dir/raw.tif"
    val spec = TW.Spec(w, h, 1, vals((r, c) => r * 7.0 + c * 0.25),
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326)
    TW.write(raw, spec)
    val a = TiffReader.readLongFormat(spark, raw)
      .orderBy($"latitude", $"longitude").collect()
    // PackBits (compression 32773): RLE-heavy constant regions + literals
    val pb = s"$dir/pb.tif"
    TW.write(pb, spec.copy(packBits = true))
    val b = TiffReader.readLongFormat(spark, pb)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(b), "PackBits rows diverge")
    // float predictor (3) under deflate AND lzw — the GDAL PREDICTOR=3
    // float-raster profile; byte planes must reassemble exactly
    for (variant <- Seq(spec.copy(deflate = true, predictor = 3),
        spec.copy(lzw = true, predictor = 3))) {
      val fp = s"$dir/fp${variant.lzw}.tif"
      TW.write(fp, variant)
      val c = TiffReader.readLongFormat(spark, fp)
        .orderBy($"latitude", $"longitude").collect()
      assert(a.sameElements(c), s"predictor-3 rows diverge (lzw=${variant.lzw})")
    }
    // uncompressed predictor 3: fpUnpredict runs on the caller's raw
    // buffer and must not mutate it (clone-before-accumulate)
    val fpRaw = s"$dir/fpraw.tif"
    TW.write(fpRaw, spec.copy(predictor = 3))
    val e1 = TiffReader.readLongFormat(spark, fpRaw)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(e1), "uncompressed predictor-3 rows diverge")
    // f8 samples take the same plane path at width 8
    val f8 = s"$dir/f8.tif"
    TW.write(f8, spec.copy(deflate = true, predictor = 3, bitsPerSample = 64))
    val d = TiffReader.readLongFormat(spark, f8)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(d), "64-bit predictor-3 rows diverge")
  }

  test("UTM raster reprojects through the transverse-Mercator inverse") {
    // place the grid near 2E 41N in UTM zone 31: model coords from the
    // forward transform, so expected lat/lon are known
    val zone = 31
    val (e0, n0) = CrsTransform.lonLatToUtm(2.0, 41.0, zone)
    val dir = java.nio.file.Files.createTempDirectory("tifutm").toString
    val p = s"$dir/utm.tif"
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => r * 10.0 + c),
      pixelScale = (1000.0, 1000.0),  // 1 km pixels
      tiepointXY = (e0, n0), epsg = 32600 + zone))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == w * h)
    // pixel (0,0) center = (e0 + 500, n0 - 500): invert and compare to the
    // double-precision forward anchor within the series' tolerance
    val (lonE, latE) = {
      // numeric inverse via the column expression on a 1-row frame
      val one = Seq((e0 + 500.0, n0 - 500.0)).toDF("e", "n")
      val (lo, la) = CrsTransform.utmToLonLat($"e", $"n", zone)
      val r = one.select(lo, la).head(); (r.getDouble(0), r.getDouble(1))
    }
    val got = df.filter($"band_1" === 0.0).head()
    assert(math.abs(got.getAs[Double]("latitude") - latE) < 1e-9)
    assert(math.abs(got.getAs[Double]("longitude") - lonE) < 1e-9)
    // and the raster is in the right neighborhood
    assert(math.abs(latE - 41.0) < 0.1 && math.abs(lonE - 2.0) < 0.1)
  }

  test("multi-band pixels become one column per band") {
    val dir = java.nio.file.Files.createTempDirectory("tifmb").toString
    val p = s"$dir/mb.tif"
    val interleaved = for (r <- 0 until h; c <- 0 until w; b <- 0 until 2)
      yield if (b == 0) r * 10.0 + c else 1000.0 + r * 10.0 + c
    TW.write(p, TW.Spec(w, h, 2, interleaved,
      pixelScale = (1.0, 1.0), tiepointXY = (0.0, 10.0), epsg = 4326))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.columns.toSeq == Seq("latitude", "longitude", "band_1", "band_2"))
    val r = df.filter($"band_1" === 23.0).head()
    assert(r.getAs[Double]("band_2") == 1023.0)
  }

  test("tif preprocess composes: reader -> band rename + time-from-metadata") {
    val dir = java.nio.file.Files.createTempDirectory("tifpre").toString
    val p = s"$dir/t.tif"
    TW.write(p, TW.Spec(w, h, 1, vals((r, c) => r + c * 0.5),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326))
    val out = graft.sources.FormatRegistry.open(spark, p)
      .withColumnRenamed("band_1", "dewpoint_temperature_2m")
      .withColumn("time", lit("2026-05-01 00:00:00").cast("timestamp_ntz"))
    assert(out.count() == w * h)
    val extracted = graft.operators.Mover.extractRows(out, s"file://$p",
      graft.operators.Mover.Options(importTime = Some("2026-05-01 06:00:00"),
        latRes = Some(0.25), lonRes = Some(0.25)))
    assert(extracted.columns.contains("dewpoint_temperature_2m"))
    assert(extracted.columns.contains("geo_polygon"))
    assert(extracted.count() == w * h)
  }

  test("trailing IFD beyond 1 MiB parses via offset-following reads") {
    // this writer lays strip data BEFORE the IFD, so any raster with > 1 MiB
    // of pixels puts the IFD past the old fixed-size head probe — the
    // regression that motivated ranged IFD parsing
    val dir = java.nio.file.Files.createTempDirectory("tifbig").toString
    val p = s"$dir/big.tif"
    val (bw, bh) = (640, 520) // 640*520*4 B = 1.33 MB of float32 pixels
    TW.write(p, TW.Spec(bw, bh, 1,
      (0 until bw * bh).map(k => (k % 1000).toDouble),
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      rowsPerStrip = 256))
    val meta = TiffReader.readMeta(
      new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration), p)
    assert(meta.width == bw && meta.height == bh)
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == bw.toLong * bh)
    assert(df.filter($"band_1" === 999.0).count() > 0)
  }

  test("BigTIFF (magic 43) reads back identically to classic TIFF") {
    val dir = java.nio.file.Files.createTempDirectory("tifbigtiff").toString
    // same pixels through both container formats — deflate + horizontal
    // predictor + multi-strip int16 exercises LONG8 offset/count arrays,
    // 20-byte IFD entries, and u64 counts on the BigTIFF side
    val spec = TW.Spec(w, h, 1, vals((r, c) => (r * 31 + c * 3).toDouble),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
      rowsPerStrip = 2, deflate = true, predictor = 2,
      bitsPerSample = 16, sampleFormat = 1)
    val classic = s"$dir/classic.tif"
    val big = s"$dir/big.tif"
    TW.write(classic, spec)
    TW.write(big, spec.copy(bigTiff = true))
    // the headers really differ: classic magic 42, BigTIFF 43 + offset size 8
    val hdr = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(big)).take(6)
    assert(hdr(2) == 43 && hdr(4) == 8)
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val meta = TiffReader.readMeta(conf, big)
    assert(meta.width == w && meta.height == h && meta.stripOffsets.size > 1)
    val a = TiffReader.readLongFormat(spark, classic)
      .orderBy($"latitude", $"longitude").collect()
    val b = TiffReader.readLongFormat(spark, big)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.sameElements(b))
  }

  test("non-TIFF magic raises a directed error naming both magics") {
    val dir = java.nio.file.Files.createTempDirectory("tifbadmagic").toString
    val p = s"$dir/bad.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p),
      Array[Byte]('I', 'I', 44, 0, 8, 0, 0, 0))
    val e = intercept[IllegalArgumentException] {
      TiffReader.readMeta(new org.apache.hadoop.conf.Configuration(
        spark.sparkContext.hadoopConfiguration), p)
    }
    assert(e.getMessage.contains("42") && e.getMessage.contains("43"))
  }

  test("LZW codec round-trips arbitrary payloads") {
    import graft.sources.tiff.Lzw
    val rnd = new scala.util.Random(7)
    for (n <- Seq(1, 2, 255, 256, 4096, 70000)) {
      // low-entropy payload exercises long table runs + width changes
      val data = Array.tabulate(n)(i =>
        ((i / 7) % 16 + (if (rnd.nextInt(10) == 0) rnd.nextInt(256) else 0)).toByte)
      val round = Lzw.decode(Lzw.encode(data), n)
      assert(java.util.Arrays.equals(round, data), s"LZW round-trip failed at n=$n")
    }
  }

  test("LZW strips with the horizontal predictor decode identically") {
    val dir = java.nio.file.Files.createTempDirectory("tiflzw").toString
    val raw = s"$dir/raw.tif"
    val lzw = s"$dir/lzw.tif"
    // uint16 samples so predictor 2 applies; values wrap across rows
    val data = vals((r, c) => ((r * 531 + c * 17) % 65536).toDouble)
    val spec = TW.Spec(w, h, 1, data,
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
      rowsPerStrip = 2, bitsPerSample = 16, sampleFormat = 1)
    TW.write(raw, spec)
    TW.write(lzw, spec.copy(lzw = true, predictor = 2))
    val a = TiffReader.readLongFormat(spark, raw)
      .orderBy($"latitude", $"longitude").collect()
    val b = TiffReader.readLongFormat(spark, lzw)
      .orderBy($"latitude", $"longitude").collect()
    assert(a.toSeq == b.toSeq)
    // float32 LZW without predictor also round-trips
    val f32 = s"$dir/f32.tif"
    TW.write(f32, TW.Spec(w, h, 1, vals((r, c) => r * 7.0 + c * 0.25),
      pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
      rowsPerStrip = 2, lzw = true))
    assert(TiffReader.readLongFormat(spark, f32)
      .filter($"band_1" === (2 * 7.0 + 3 * 0.25)).count() == 1)
  }

  test("predictor 2 with float samples raises a directed error") {
    val dir = java.nio.file.Files.createTempDirectory("tifpred").toString
    val p = s"$dir/pf.tif"
    intercept[IllegalArgumentException] {
      TW.write(p, TW.Spec(w, h, 1, vals((r, c) => r + c * 0.5),
        pixelScale = (0.5, 0.5), tiepointXY = (10.0, 55.0), epsg = 4326,
        lzw = true, predictor = 2))
    }
  }

  test("COG writer: tiled output reads back exactly through our own reader") {
    import graft.sources.tiff.CogWriter
    val dir = java.nio.file.Files.createTempDirectory("cog").toString
    val p = s"$dir/c.tif"
    val (bw, bh) = (300, 200)
    val data = (0 until bw * bh).map(k => ((k * 31) % 4096).toDouble)
    CogWriter.write(p, CogWriter.Spec(bw, bh, 1, data,
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      tileWidth = 128, tileLength = 128,
      lzw = true, predictor = 2, bitsPerSample = 16, sampleFormat = 1))
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == bw.toLong * bh) // tile edge padding dropped
    // spot-check pixel (r=3, c=7): value (3*300+7)*31 % 4096
    val lat = 50.0 - 3.5 * 0.01
    val lon = 7.5 * 0.01
    val got = df.filter(abs($"latitude" - lat) < 1e-9 && abs($"longitude" - lon) < 1e-9)
      .head().getAs[Double]("band_1")
    assert(got == ((3 * 300 + 7) * 31 % 4096).toDouble)
  }

  test("BigTIFF COG: magic 43 layout round-trips with overview pages") {
    import graft.sources.tiff.{CogWriter, Tiff}
    val dir = java.nio.file.Files.createTempDirectory("cogbig").toString
    val p = s"$dir/c.tif"
    val (bw, bh) = (300, 200)
    val data = (0 until bw * bh).map(k => ((k * 31) % 4096).toDouble)
    CogWriter.write(p, CogWriter.Spec(bw, bh, 1, data,
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      tileWidth = 128, tileLength = 128,
      lzw = true, predictor = 2, bitsPerSample = 16, sampleFormat = 1,
      bigTiff = true))
    // magic 43 header, 8-byte offsets
    val head = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).take(4)
    assert(head(2) == 43 && head(3) == 0, "BigTIFF magic")
    // full-res page decodes identically to the classic-COG test
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == bw.toLong * bh)
    val got = df.filter(abs($"latitude" - (50.0 - 3.5 * 0.01)) < 1e-9 &&
        abs($"longitude" - 7.5 * 0.01) < 1e-9)
      .head().getAs[Double]("band_1")
    assert(got == ((3 * 300 + 7) * 31 % 4096).toDouble)
    // overview pyramid pages walk through the BigTIFF IFD chain
    val conf = new org.apache.hadoop.conf.Configuration()
    val chain = TiffReader.readMetaChain(conf, p)
    assert(chain.size >= 2, "expected at least one overview page")
    assert(chain.head.width == bw && chain(1).width == (bw + 1) / 2)
    val ov = TiffReader.readLongFormat(spark, p, page = 1)
    assert(ov.count() == ((bw + 1) / 2).toLong * ((bh + 1) / 2))
  }

  test("COG golden layout: IFD chain first, overview pyramid, full-res data last") {
    import graft.sources.tiff.{CogWriter, Tiff}
    val dir = java.nio.file.Files.createTempDirectory("cogg").toString
    val p = s"$dir/g.tif"
    val (bw, bh) = (300, 200)
    CogWriter.write(p, CogWriter.Spec(bw, bh, 1,
      Seq.fill(bw * bh)(7.0),
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      tileWidth = 128, tileLength = 128,
      lzw = true, predictor = 2, bitsPerSample = 16, sampleFormat = 1))
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    def u16(i: Int) = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int) = (u16(i).toLong) | (u16(i + 2).toLong << 16)
    // walk the IFD chain: (ifdOff, width, subfileType, tileOffsets)
    var ifd = u32(4)
    var chain = Seq.empty[(Long, Int, Long, Seq[Long])]
    while (ifd != 0) {
      val n = u16(ifd.toInt)
      var width = 0
      var sub = -1L
      var to = Seq.empty[Long]
      (0 until n).foreach { k =>
        val e = ifd.toInt + 2 + k * 12
        u16(e) match {
          case 254 => sub = u32(e + 8)
          case 256 => width = u32(e + 8).toInt
          case 324 =>
            val cnt = u32(e + 4).toInt
            val base = if (cnt == 1) e + 8 else u32(e + 8).toInt
            to = (0 until cnt).map(t => u32(base + t * 4))
          case _ =>
        }
      }
      chain = chain :+ ((ifd, width, sub, to))
      ifd = u32(ifd.toInt + 2 + n * 12)
    }
    // pyramid: 300 -> 150 -> 75 (fits 128) = 3 IFDs, full res first
    assert(chain.map(_._2) == Seq(300, 150, 75))
    assert(chain.map(_._3) == Seq(0L, 1L, 1L)) // NewSubfileType overview flags
    // COG rule 1: every IFD structure sits before ALL tile data
    val headEnd = chain.map(c => c._1).max
    val allTileOffsets = chain.flatMap(_._4)
    assert(allTileOffsets.forall(_ > headEnd), "tile data interleaved with IFDs")
    // COG rule 2: smallest overview's data first, full resolution LAST
    val mins = chain.map(_._4.min)
    assert(mins == mins.sorted.reverse, s"data region not smallest-first: $mins")
    assert(chain.head._4.min > chain.last._4.max, "full-res data not last")
    // overview IFDs decode through parseMeta (patched header offset) and
    // carry the averaged pyramid (uniform input -> uniform overviews)
    val patched = bytes.clone()
    val ov = chain(1)._1
    patched(4) = (ov & 0xff).toByte
    patched(5) = ((ov >> 8) & 0xff).toByte
    patched(6) = ((ov >> 16) & 0xff).toByte
    patched(7) = ((ov >> 24) & 0xff).toByte
    val om = Tiff.parseMeta(patched)
    assert(om.width == 150 && om.tiled && om.pixelScale.head == 0.02)
    val t0 = om.tileOffsets.head
    val raw = java.util.Arrays.copyOfRange(bytes, t0.toInt,
      (t0 + om.tileByteCounts.head).toInt)
    val vals = Tiff.decodeBlock(om, raw, om.tileWidth * om.tileLength,
      om.tileWidth)
    assert(vals.take(om.tileWidth).forall(_ == 7.0))
  }

  test("COG overview pages read through the page API with scaled georeferencing") {
    import graft.sources.tiff.CogWriter
    val dir = java.nio.file.Files.createTempDirectory("cogov").toString
    val p = s"$dir/ov.tif"
    val (bw, bh) = (300, 200)
    // constant field: every overview level averages to the same constant
    CogWriter.write(p, CogWriter.Spec(bw, bh, 1, Seq.fill(bw * bh)(42.0),
      pixelScale = (0.01, 0.01), tiepointXY = (0.0, 50.0), epsg = 4326,
      tileWidth = 128, tileLength = 128,
      lzw = true, predictor = 2, bitsPerSample = 16, sampleFormat = 1))
    val conf = new org.apache.hadoop.conf.Configuration(
      spark.sparkContext.hadoopConfiguration)
    val chain = TiffReader.readMetaChain(conf, p)
    assert(chain.map(_.width) == Seq(300, 150, 75))
    assert(chain(1).pixelScale.head == 0.02) // overview georeferencing scales
    val ov = TiffReader.readLongFormat(spark, p, page = 1)
    assert(ov.count() == 150L * 100)
    assert(ov.select($"band_1").distinct().as[Double].collect().toSeq == Seq(42.0))
    // overview pixel centers live on the SCALED grid but span the same bbox
    import org.apache.spark.sql.functions.{max => smax, min => smin}
    val r = ov.agg(smin($"longitude"), smax($"longitude"),
      smin($"latitude"), smax($"latitude")).head()
    assert(math.abs(r.getDouble(0) - 0.01) < 1e-9)   // (0 + 0.5*0.02)
    assert(math.abs(r.getDouble(3) - 49.99) < 1e-9)  // (50 - 0.5*0.02)
    intercept[IllegalArgumentException](
      TiffReader.readLongFormat(spark, p, page = 9))
  }

  test("non-TIFF bytes raise directed errors") {
    val e = intercept[IllegalArgumentException](
      graft.sources.tiff.Tiff.parseMeta("NOTATIFF0123456789".getBytes))
    assert(e.getMessage.contains("byte-order"))
  }

  test("compression 7 (JPEG) decodes full and JPEGTables-abbreviated blocks") {
    import graft.sources.tiff.Tiff
    // a 32x32 RGB tile of four uniform 16x16 quadrants — JPEG-friendly
    // content (DC-dominant), encoded by the SAME codec the reader uses
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val colors = Seq((200, 40, 40), (40, 200, 40), (40, 40, 200), (180, 180, 60))
    for (y <- 0 until 32; x <- 0 until 32) {
      val (cr, cg, cb) = colors((y / 16) * 2 + (x / 16))
      img.setRGB(x, y, (cr << 16) | (cg << 8) | cb)
    }
    val full = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    def meta(tables: Array[Byte]) = Tiff.Meta(littleEndian = true,
      width = 32, height = 32, bitsPerSample = 8, sampleFormat = 1,
      samplesPerPixel = 3, compression = 7, rowsPerStrip = 0,
      stripOffsets = Nil, stripByteCounts = Nil,
      tileWidth = 32, tileLength = 32, tileOffsets = Seq(0L),
      tileByteCounts = Seq(full.length.toLong),
      pixelScale = Seq(0.1, 0.1, 0), tiepoint = Seq(0, 0, 0, 10, 50, 0),
      epsg = 4326, jpegTables = tables)
    val vals = Tiff.decodeBlock(meta(null), full, 32 * 32 * 3, 32 * 3)
    // JPEG is lossy: uniform quadrant interiors land within a few counts
    def at(x: Int, y: Int) =
      (vals((y * 32 + x) * 3), vals((y * 32 + x) * 3 + 1), vals((y * 32 + x) * 3 + 2))
    for (((er, eg, eb), q) <- colors.zipWithIndex) {
      val (x, y) = ((q % 2) * 16 + 8, (q / 2) * 16 + 8)
      val (gr, gg, gb) = at(x, y)
      assert(math.abs(gr - er) <= 8 && math.abs(gg - eg) <= 8 &&
        math.abs(gb - eb) <= 8, s"quadrant $q got ($gr,$gg,$gb)")
    }
    // abbreviated form: DQT/DHT segments move to the JPEGTables tag and
    // the per-tile stream drops them — decode must be BIT-identical
    val (tables, bare) = splitJpegTables(full)
    assert(tables.length > 4 && bare.length < full.length)
    val vals2 = Tiff.decodeBlock(meta(tables), bare, 32 * 32 * 3, 32 * 3)
    assert(vals2.sameElements(vals))
  }

  test("a JPEG-compressed tiled file reads end-to-end through TiffReader") {
    import graft.sources.tiff.{Tiff, TiffReader}
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, (90 << 16) | (140 << 8) | 190)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val (tables, bare) = splitJpegTables(bos.toByteArray)
    val bytes = buildJpegTiff(bare, tables)
    val meta = Tiff.parseMeta(bytes)
    assert(meta.compression == 7 && meta.jpegTables != null &&
      meta.jpegTables.sameElements(tables))
    val dir = java.nio.file.Files.createTempDirectory("jtiff").toString
    val p = s"$dir/rgb.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == 32 * 32)
    val r = df.orderBy(org.apache.spark.sql.functions.col("latitude").desc,
      org.apache.spark.sql.functions.col("longitude")).head()
    // uniform image: every pixel decodes within JPEG tolerance of the color
    assert(math.abs(r.getDouble(2) - 90) <= 8 &&
      math.abs(r.getDouble(3) - 140) <= 8 && math.abs(r.getDouble(4) - 190) <= 8)
  }

  /** Minimal little-endian classic TIFF: one 32x32 RGB tile, compression 7,
    * JPEGTables tag, EPSG:4326 georeferencing. */
  private def buildJpegTiff(tile: Array[Byte], tables: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w16(v.toInt); w16((v >> 16).toInt) }
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count); w32(value)
    }
    val nEntries = 12
    val ifdOff = 8
    val valOff = ifdOff + 2 + nEntries * 12 + 4
    val bitsOff = valOff                    // 3 shorts
    val tablesOff = bitsOff + 6
    val scaleOff = tablesOff + tables.length + (tables.length & 1)
    val tieOff = scaleOff + 24
    val tileOff = tieOff + 48
    // header
    w8('I'); w8('I'); w16(42); w32(ifdOff)
    // IFD (tags ascending)
    w16(nEntries)
    entry(256, 3, 1, 32); entry(257, 3, 1, 32)
    entry(258, 3, 3, bitsOff); entry(259, 3, 1, 7)
    entry(277, 3, 1, 3)
    entry(322, 3, 1, 32); entry(323, 3, 1, 32)
    entry(324, 4, 1, tileOff); entry(325, 4, 1, tile.length)
    entry(347, 7, tables.length, tablesOff)
    entry(33550, 12, 3, scaleOff); entry(33922, 12, 6, tieOff)
    w32(0) // next IFD
    // values
    w16(8); w16(8); w16(8)
    out.write(tables); if ((tables.length & 1) == 1) w8(0)
    def wf64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(k => w8(((bits >> (8 * k)) & 0xff).toInt))
    }
    Seq(0.1, 0.1, 0.0).foreach(wf64)              // ModelPixelScale
    Seq(0.0, 0.0, 0.0, 10.0, 50.0, 0.0).foreach(wf64) // ModelTiepoint
    out.write(tile)
    out.toByteArray
  }

  test("PlanarConfiguration 2 interleaves band-separate planes correctly") {
    import graft.sources.tiff.{Tiff, TiffReader}
    // 4x4, two uint8 bands, rps=2 -> 2 strips/band, stored band-major
    val out = new java.io.ByteArrayOutputStream()
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit = { w8(v); w8(v >> 8) }
    def w32(v: Long): Unit = { w16(v.toInt); w16((v >> 16).toInt) }
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      w16(tag); w16(typ); w32(count); w32(value)
    }
    val nEntries = 12
    val valOff = 8 + 2 + nEntries * 12 + 4
    val soOff = valOff            // 4 longs
    val sbcOff = soOff + 16
    val scaleOff = sbcOff + 16
    val tieOff = scaleOff + 24
    val dataOff = tieOff + 48
    w8('I'); w8('I'); w16(42); w32(8)
    w16(nEntries)
    entry(256, 3, 1, 4); entry(257, 3, 1, 4)
    entry(258, 3, 1, 8); entry(259, 3, 1, 1)
    entry(273, 4, 4, soOff); entry(277, 3, 1, 2)
    entry(278, 3, 1, 2); entry(279, 4, 4, sbcOff)
    entry(284, 3, 1, 2)
    entry(338, 3, 1, 0) // ExtraSamples: unknown tag, must be ignored
    entry(33550, 12, 3, scaleOff); entry(33922, 12, 6, tieOff)
    w32(0)
    (0 until 4).foreach(s => w32(dataOff + s * 8)) // strip offsets
    (0 until 4).foreach(_ => w32(8))               // strip byte counts
    def wf64(d: Double): Unit = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 8).foreach(k => w8(((bits >> (8 * k)) & 0xff).toInt))
    }
    Seq(0.5, 0.5, 0.0).foreach(wf64)
    Seq(0.0, 0.0, 0.0, 0.0, 2.0, 0.0).foreach(wf64)
    // band 0 plane: v = row*4+col; band 1 plane: 100 + same
    (0 until 16).foreach(w8)             // b0 strips 0..1 contiguous
    (0 until 16).foreach(k => w8(100 + k))
    val bytes = out.toByteArray
    val meta = Tiff.parseMeta(bytes)
    assert(meta.planarConfig == 2 && meta.samplesPerPixel == 2)
    val dir = java.nio.file.Files.createTempDirectory("ptiff").toString
    val p = s"$dir/planar.tif"
    java.nio.file.Files.write(java.nio.file.Paths.get(p), bytes)
    val df = TiffReader.readLongFormat(spark, p)
    assert(df.count() == 16)
    // pixel (row 1, col 2): v = 6 / 106; lat = 2 - 1.5*0.5, lon = 2.5*0.5
    val r = df.filter(org.apache.spark.sql.functions.col("latitude") === 1.25 &&
      org.apache.spark.sql.functions.col("longitude") === 1.25).head()
    assert(r.getDouble(2) == 6.0 && r.getDouble(3) == 106.0)
    // every pixel keeps the +100 band offset — planes never cross-wire
    import spark.implicits._
    assert(df.select(($"band_2" - $"band_1")).as[Double].collect()
      .forall(_ == 100.0))
  }

  // ---------------------------------------------- projected CRS beyond UTM

  /** Write a 3x2 single-band tif whose pixel CENTERS sit at model
    * (x0 + c*dx, y0 - r*dy); returns the reader's rows keyed by value. */
  private def projTif(dir: String, x0: Double, y0: Double,
      dx: Double, dy: Double, epsg: Int,
      shortKeys: Seq[(Int, Int)] = Nil,
      doubleKeys: Seq[(Int, Double)] = Nil): Map[Double, (Double, Double)] = {
    val p = s"$dir/p.tif"
    TW.write(p, TW.Spec(3, 2, 1, (0 until 6).map(_ * 10.0),
      pixelScale = (dx, dy), tiepointXY = (x0 - dx / 2, y0 + dy / 2),
      epsg = epsg, rowsPerStrip = 2,
      extraShortKeys = shortKeys, doubleKeys = doubleKeys))
    TiffReader.readLongFormat(spark, p).collect()
      .map(r => r.getDouble(2) -> (r.getDouble(0), r.getDouble(1))).toMap
  }

  test("EPSG:3857 web-Mercator raster inverts to lon/lat (closed form)") {
    val dir = java.nio.file.Files.createTempDirectory("tif3857").toString
    val R = 6378137.0
    val got = projTif(dir, x0 = 111319.0, y0 = 6800125.0,
      dx = 50000, dy = 40000, epsg = 3857)
    assert(got.size == 6)
    // independent closed-form re-derivation of every pixel
    for (r <- 0 until 2; c <- 0 until 3) {
      val x = 111319.0 + c * 50000.0
      val y = 6800125.0 - r * 40000.0
      val wantLat = math.toDegrees(2 * math.atan(math.exp(y / R)) - math.Pi / 2)
      val wantLon = math.toDegrees(x / R)
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c): got ($lat,$lon) want ($wantLat,$wantLon)")
    }
  }

  test("EPSG:2154 Lambert-93: the projection origin reads back exactly") {
    val dir = java.nio.file.Files.createTempDirectory("tif2154").toString
    // EPSG-published natural origin: (46.5N, 3E) -> E 700000, N 6600000
    val got = projTif(dir, x0 = 700000, y0 = 6600000,
      dx = 30000, dy = 30000, epsg = 2154)
    val (lat0, lon0) = got(0.0)
    assert(math.abs(lat0 - 46.5) < 1e-9 && math.abs(lon0 - 3.0) < 1e-9,
      s"origin decoded as ($lat0, $lon0)")
    // monotonic orientation: +x -> east, +y -> north
    val (latE, lonE) = got(10.0) // pixel (0,1): x + 30 km
    val (latS, lonS) = got(30.0) // pixel (1,0): y - 30 km
    assert(lonE > lon0 && latS < lat0)
    // full-grid round-trip through the ellipsoidal forward (GRS80)
    val p = GribProjection.LambertConformal(49, 44, 3,
      6378137.0, 6356752.314140356)
    val y0off = p.forward(46.5, 3)._2
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon)
      assert(math.abs((700000 + fx) - (700000 + c * 30000.0)) < 1e-6 &&
        math.abs((6600000 + fy - y0off) - (6600000 - r * 30000.0)) < 1e-6)
    }
  }

  test("EPSG:3413 NSIDC polar stereographic round-trips the WGS84 inverse") {
    val dir = java.nio.file.Files.createTempDirectory("tif3413").toString
    val p = GribProjection.PolarStereographic(70, -45, south = false,
      6378137.0, 6356752.314245179)
    // anchor the grid at the forward image of (75N, 100W)
    val (x0, y0) = p.forward(75, -100)
    val got = projTif(dir, x0, y0, dx = 25000, dy = 25000, epsg = 3413)
    val (latA, lonA) = got(0.0)
    assert(math.abs(latA - 75.0) < 1e-9 && math.abs(lonA - (-100.0)) < 1e-9)
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon)
      assert(math.abs(fx - (x0 + c * 25000.0)) < 1e-6 &&
        math.abs(fy - (y0 - r * 25000.0)) < 1e-6)
    }
  }

  test("EPSG:32661 UPS north: k0=0.994, 2000 km false origin, pole exact") {
    val dir = java.nio.file.Files.createTempDirectory("tifups").toString
    // the pole IS the false origin
    val got = projTif(dir, x0 = 2000000, y0 = 2000000 + 500000,
      dx = 200000, dy = 500000, epsg = 32661)
    val (latP, _) = got(30.0) // pixel (1,0): y back at 2000000, x at pole
    assert(math.abs(latP - 90.0) < 1e-9, s"pole decoded at lat $latP")
    // round-trip every pixel through the k0-scaled ellipsoidal forward
    val p = GribProjection.PolarStereographic(90, 0, south = false,
      6378137.0 * 0.994, 6356752.314245179 * 0.994)
    for (r <- 0 until 2; c <- 0 until 3) {
      val v = (r * 3 + c) * 10.0
      if (v != 30.0) { // the pole itself has undefined longitude
        val (lat, lon) = got(v)
        val (fx, fy) = p.forward(lat, lon)
        assert(math.abs((2000000 + fx) - (2000000 + c * 200000.0)) < 1e-6 &&
          math.abs((2000000 + fy) - (2500000 - r * 500000.0)) < 1e-6)
      }
    }
  }

  test("user-defined Mercator GeoKeys: lat_ts, central meridian, WGS84") {
    val dir = java.nio.file.Files.createTempDirectory("tifmrc").toString
    val got = projTif(dir, x0 = 0.0, y0 = 200000.0,
      dx = 100000, dy = 200000, epsg = 32767,
      shortKeys = Seq((3075, 7), (2048, 4326)), // CT_Mercator on WGS84
      doubleKeys = Seq((3078, 20.0), (3080, 150.0))) // lat_ts 20, lon0 150E
    // pixel (1,0): model (0, 0) = the natural origin -> (0N, 150E)
    val (lat0, lon0) = got(30.0)
    assert(math.abs(lat0) < 1e-9 && math.abs(lon0 - 150.0) < 1e-9)
    val p = GribProjection.Mercator(20.0, 6378137.0, 6356752.314245179)
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon - 150.0)
      assert(math.abs(fx - c * 100000.0) < 1e-6 &&
        math.abs(fy - (200000.0 - r * 200000.0)) < 1e-6)
    }
  }

  test("user-defined LCC-2SP GeoKeys with explicit sphere axes") {
    val dir = java.nio.file.Files.createTempDirectory("tiflcc").toString
    val R = 6371229.0
    val got = projTif(dir, x0 = 100000.0, y0 = 200000.0,
      dx = 50000, dy = 50000, epsg = 32767,
      shortKeys = Seq((3075, 8)),
      doubleKeys = Seq((3078, 30.0), (3079, 60.0), // standard parallels
        (3085, 40.0), (3084, 10.0),                // false origin lat/lon
        (3086, 100000.0), (3087, 200000.0),        // false easting/northing
        (2057, R), (2058, R)))                     // sphere
    // model (FE, FN) IS the false origin -> (40N, 10E)
    val (lat0, lon0) = got(0.0)
    assert(math.abs(lat0 - 40.0) < 1e-9 && math.abs(lon0 - 10.0) < 1e-9)
    // independent spherical 2SP inverse (Snyder 15-1..15-5 closed form)
    val phi1 = math.toRadians(30); val phi2 = math.toRadians(60)
    val n = math.log(math.cos(phi1) / math.cos(phi2)) /
      math.log(math.tan(math.Pi / 4 + phi2 / 2) / math.tan(math.Pi / 4 + phi1 / 2))
    val fF = math.cos(phi1) * math.pow(math.tan(math.Pi / 4 + phi1 / 2), n) / n
    val rho0 = R * fF / math.pow(math.tan(math.Pi / 4 + math.toRadians(40) / 2), n)
    for (r <- 0 until 2; c <- 0 until 3) {
      val xp = c * 50000.0            // E - FE
      val yp = rho0 + r * 50000.0     // rho0 - (N - FN), N = FN - r*dy...
      val rho = math.sqrt(xp * xp + yp * yp)
      val theta = math.atan2(xp, yp)
      val wantLat = math.toDegrees(
        2 * math.atan(math.pow(R * fF / rho, 1 / n)) - math.Pi / 2)
      val wantLon = 10.0 + math.toDegrees(theta / n)
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c): got ($lat,$lon) want ($wantLat,$wantLon)")
    }
  }

  test("EPSG:27700 British National Grid: origin exact, grid round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("tifbng").toString
    // the natural origin (49N, 2W) maps to E 400000, N -100000 by
    // definition of the grid's false origin
    val got = projTif(dir, x0 = 400000, y0 = -100000 + 400000,
      dx = 150000, dy = 400000, epsg = 27700)
    // 1e-8 deg ~ 1 mm: the Snyder series' stated accuracy
    val (lat0, lon0) = got(30.0) // pixel (1,0): back at the false origin
    assert(math.abs(lat0 - 49.0) < 1e-8 && math.abs(lon0 - (-2.0)) < 1e-8,
      s"origin decoded as ($lat0, $lon0)")
    // full-grid round-trip through the k0-scaled Airy forward
    val p = GribProjection.TransverseMercator(-2,
      6377563.396 * 0.9996012717, 6356256.909237285 * 0.9996012717)
    val y00 = p.forward(49, -2)._2
    // 1 cm: forward/inverse truncations differ at the D^7 order, which at
    // the grid's 300 km easting (4.3 degrees off the meridian) costs ~6 mm
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon)
      assert(math.abs((400000 + fx) - (400000 + c * 150000.0)) < 0.01 &&
        math.abs((-100000 + fy - y00) - (300000 - r * 400000.0)) < 0.01,
        s"pixel ($r,$c)")
    }
  }

  test("EPSG:25832 agrees with the independent UTM column inverse") {
    val dir = java.nio.file.Files.createTempDirectory("tifetrs").toString
    // the same pixel grid declared as ETRS89/UTM32 (TM series path) and
    // WGS84/UTM32 (CrsTransform's codegen'd column math): two independent
    // implementations of the same projection (GRS80 vs WGS84 differ by
    // 0.1 mm in the minor axis) must agree to well under 1e-7 degrees
    val a = projTif(dir, x0 = 400000, y0 = 5700000,
      dx = 40000, dy = 50000, epsg = 25832)
    val dir2 = java.nio.file.Files.createTempDirectory("tifutm").toString
    val b = projTif(dir2, x0 = 400000, y0 = 5700000,
      dx = 40000, dy = 50000, epsg = 32632)
    (0 until 6).foreach { k =>
      val (la, lo) = a(k * 10.0); val (lb, lob) = b(k * 10.0)
      assert(math.abs(la - lb) < 1e-7 && math.abs(lo - lob) < 1e-7,
        s"pixel $k: TM series ($la,$lo) vs UTM columns ($lb,$lob)")
    }
  }

  test("user-defined CT_TransverseMercator GeoKeys match the EPSG 27700 path") {
    val dir = java.nio.file.Files.createTempDirectory("tiftmk").toString
    val viaCode = projTif(dir, x0 = 500000, y0 = 200000,
      dx = 60000, dy = 70000, epsg = 27700)
    val dir2 = java.nio.file.Files.createTempDirectory("tiftmk2").toString
    val viaKeys = projTif(dir2, x0 = 500000, y0 = 200000,
      dx = 60000, dy = 70000, epsg = 32767,
      shortKeys = Seq((3075, 1)),
      doubleKeys = Seq((3081, 49.0), (3080, -2.0),
        (3082, 400000.0), (3083, -100000.0), (3092, 0.9996012717),
        (2057, 6377563.396), (2058, 6356256.909237285)))
    (0 until 6).foreach { k =>
      val (la, lo) = viaCode(k * 10.0); val (lb, lob) = viaKeys(k * 10.0)
      assert(math.abs(la - lb) < 1e-12 && math.abs(lo - lob) < 1e-12)
    }
  }

  test("EPSG:5070 Conus Albers: origin exact, ellipsoidal grid round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("tifalb").toString
    // natural origin (23N, 96W) IS model (0, 0)
    val got = projTif(dir, x0 = 0, y0 = 2400000,
      dx = 400000, dy = 2400000, epsg = 5070)
    val (lat0, lon0) = got(30.0) // pixel (1,0): back at the origin
    assert(math.abs(lat0 - 23.0) < 1e-9 && math.abs(lon0 - (-96.0)) < 1e-9,
      s"origin decoded as ($lat0, $lon0)")
    val p = GribProjection.AlbersEqualArea(29.5, 45.5, -96,
      6378137.0, 6356752.314140356)
    val y00 = p.forward(23, -96)._2
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon)
      assert(math.abs(fx - c * 400000.0) < 1e-5 &&
        math.abs((fy - y00) - (2400000 - r * 2400000.0)) < 1e-5,
        s"pixel ($r,$c)")
    }
  }

  test("EPSG:3035 LAEA Europe: false origin exact, ellipsoidal grid round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("tiflaea").toString
    // projection centre (52N, 10E) IS model (FE, FN) = (4321000, 3210000)
    val got = projTif(dir, x0 = 4321000, y0 = 3210000 + 300000,
      dx = 200000, dy = 300000, epsg = 3035)
    val (lat0, lon0) = got(30.0) // pixel (1,0): back at the centre
    assert(math.abs(lat0 - 52.0) < 1e-9 && math.abs(lon0 - 10.0) < 1e-9,
      s"centre decoded as ($lat0, $lon0)")
    val p = GribProjection.LambertAzimuthalEqualArea(52, 10,
      6378137.0, 6356752.314140356)
    for (r <- 0 until 2; c <- 0 until 3) {
      val (lat, lon) = got((r * 3 + c) * 10.0)
      val (fx, fy) = p.forward(lat, lon)
      assert(math.abs(fx - c * 200000.0) < 1e-5 &&
        math.abs(fy - (300000 - r * 300000.0)) < 1e-5, s"pixel ($r,$c)")
    }
  }

  test("user-defined LAEA GeoKeys with sphere axes match the closed form") {
    val dir = java.nio.file.Files.createTempDirectory("tiflaeas").toString
    val R = 6370997.0
    val got = projTif(dir, x0 = 40000.0, y0 = 160000.0,
      dx = 90000, dy = 110000, epsg = 32767,
      shortKeys = Seq((3075, 10)),
      doubleKeys = Seq((3089, 45.0), (3088, -100.0),
        (3086, 40000.0), (3087, 50000.0),
        (2057, R), (2058, R)))
    // independent spherical LAEA inverse (Snyder 20-14..20-18, 24-16)
    val p1 = math.toRadians(45.0)
    for (r <- 0 until 2; c <- 0 until 3) {
      val xp = 40000.0 + c * 90000.0 - 40000.0           // E - FE
      val yp = 160000.0 - r * 110000.0 - 50000.0         // N - FN
      val rho = math.sqrt(xp * xp + yp * yp)
      val (wantLat, wantLon) =
        if (rho < 1e-9) (45.0, -100.0)
        else {
          val ce = 2 * math.asin(rho / (2 * R))
          (math.toDegrees(math.asin(math.cos(ce) * math.sin(p1) +
            yp * math.sin(ce) * math.cos(p1) / rho)),
            -100.0 + math.toDegrees(math.atan2(xp * math.sin(ce),
              rho * math.cos(p1) * math.cos(ce) -
                yp * math.sin(p1) * math.sin(ce))))
        }
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c): got ($lat,$lon) want ($wantLat,$wantLon)")
    }
  }

  test("user-defined Albers GeoKeys with sphere axes match the closed form") {
    val dir = java.nio.file.Files.createTempDirectory("tifalbs").toString
    val R = 6370997.0
    val got = projTif(dir, x0 = 50000.0, y0 = 150000.0,
      dx = 80000, dy = 120000, epsg = 32767,
      shortKeys = Seq((3075, 11)),
      doubleKeys = Seq((3078, 29.5), (3079, 45.5),
        (3085, 23.0), (3084, -96.0),
        (3086, 50000.0), (3087, 30000.0),
        (2057, R), (2058, R)))
    // independent spherical Albers inverse (Snyder 14-3..14-11)
    val phi1 = math.toRadians(29.5); val phi2 = math.toRadians(45.5)
    val n = (math.sin(phi1) + math.sin(phi2)) / 2
    val cC = math.cos(phi1) * math.cos(phi1) + 2 * n * math.sin(phi1)
    def rhoOf(phi: Double) = R * math.sqrt(cC - 2 * n * math.sin(phi)) / n
    val rho0 = rhoOf(math.toRadians(23.0))
    for (r <- 0 until 2; c <- 0 until 3) {
      val xp = 50000.0 + c * 80000.0 - 50000.0           // E - FE
      val yp = 150000.0 - r * 120000.0 - 30000.0         // N - FN
      val rho = math.sqrt(xp * xp + (rho0 - yp) * (rho0 - yp))
      val theta = math.atan2(xp, rho0 - yp)
      val wantLat = math.toDegrees(math.asin(
        (cC - (rho * n / R) * (rho * n / R)) / (2 * n)))
      val wantLon = -96.0 + math.toDegrees(theta / n)
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c): got ($lat,$lon) want ($wantLat,$wantLon)")
    }
  }

  test("sinusoidal GeoKeys (the MODIS grid): closed-form sphere anchors") {
    val dir = java.nio.file.Files.createTempDirectory("tifsin").toString
    val R = 6371007.181 // the MODIS sphere
    // pixel grid anchored at the image of (40N, lon0+10E)
    val x0 = R * math.toRadians(10) * math.cos(math.toRadians(40))
    val y0 = R * math.toRadians(40)
    val got = projTif(dir, x0, y0, dx = 200000, dy = 150000, epsg = 32767,
      shortKeys = Seq((3075, 24)),
      doubleKeys = Seq((3080, -60.0), (2057, R), (2058, R)))
    for (r <- 0 until 2; c <- 0 until 3) {
      val x = x0 + c * 200000.0
      val y = y0 - r * 150000.0
      val wantLat = math.toDegrees(y / R)
      val wantLon = -60.0 + math.toDegrees(
        x / (R * math.cos(math.toRadians(wantLat))))
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c): got ($lat,$lon) want ($wantLat,$wantLon)")
    }
  }

  test("equirectangular GeoKeys: linear plate-carree anchors") {
    val dir = java.nio.file.Files.createTempDirectory("tifeqc").toString
    val R = 6378137.0
    val k = math.cos(math.toRadians(30))
    val got = projTif(dir, x0 = R * math.toRadians(5) * k,
      y0 = R * math.toRadians(45),
      dx = 100000, dy = 100000, epsg = 32767,
      shortKeys = Seq((3075, 17), (2048, 4326)),
      doubleKeys = Seq((3078, 30.0), (3080, 0.0)))
    for (r <- 0 until 2; c <- 0 until 3) {
      val x = R * math.toRadians(5) * k + c * 100000.0
      val y = R * math.toRadians(45) - r * 100000.0
      val wantLat = math.toDegrees(y / R)
      val wantLon = math.toDegrees(x / (R * k))
      val (lat, lon) = got((r * 3 + c) * 10.0)
      assert(math.abs(lat - wantLat) < 1e-9 && math.abs(lon - wantLon) < 1e-9,
        s"pixel ($r,$c)")
    }
  }

  test("unsupported projected CRS fail directed with the supported list") {
    val dir = java.nio.file.Files.createTempDirectory("tifbad").toString
    val p = s"$dir/b.tif"
    // 2056 = CH1903+/LV95, an oblique (Hotine) Mercator this reader does
    // not carry — must fail directed, naming the code and the alternatives
    TW.write(p, TW.Spec(2, 2, 1, Seq(1.0, 2.0, 3.0, 4.0),
      pixelScale = (1000, 1000), tiepointXY = (0, 0), epsg = 2056))
    val e = intercept[Exception] { TiffReader.readLongFormat(spark, p) }
    assert(e.getMessage.contains("2056") &&
      e.getMessage.contains("GeoKeys"), e.getMessage)
    // user-defined ProjCS without an ellipsoid: directed at the gap
    val p2 = s"$dir/b2.tif"
    TW.write(p2, TW.Spec(2, 2, 1, Seq(1.0, 2.0, 3.0, 4.0),
      pixelScale = (1000, 1000), tiepointXY = (0, 0), epsg = 32767,
      extraShortKeys = Seq((3075, 8)),
      doubleKeys = Seq((3078, 30.0), (3081, 40.0))))
    val e2 = intercept[Exception] { TiffReader.readLongFormat(spark, p2) }
    assert(e2.getMessage.contains("ellipsoid"), e2.getMessage)
    // a file declaring GTModelType=1 (projected) but NO CRS code and no
    // transform keys must not fall through to the geographic rename — its
    // meters aren't degrees (a later duplicate 1024 key overrides the
    // writer's geographic default, leaving epsg = 0 with model type 1)
    val p3 = s"$dir/b3.tif"
    TW.write(p3, TW.Spec(2, 2, 1, Seq(1.0, 2.0, 3.0, 4.0),
      pixelScale = (1000, 1000), tiepointXY = (0, 0), epsg = 0,
      extraShortKeys = Seq((1024, 1))))
    val e3 = intercept[Exception] { TiffReader.readLongFormat(spark, p3) }
    assert(e3.getMessage.contains("EPSG:0") &&
      e3.getMessage.contains("GeoKeys"), e3.getMessage)
  }

  /** Move DQT/DHT segments of a JPEG stream into a standalone tables
    * stream (SOI + tables + EOI), leaving the abbreviated remainder. */
  private def splitJpegTables(jpeg: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val tables = new java.io.ByteArrayOutputStream()
    val rest = new java.io.ByteArrayOutputStream()
    tables.write(0xFF); tables.write(0xD8)
    rest.write(0xFF); rest.write(0xD8)
    var i = 2
    var done = false
    while (!done && i + 3 < jpeg.length) {
      assert((jpeg(i) & 0xff) == 0xFF, "lost marker sync")
      val marker = jpeg(i + 1) & 0xff
      if (marker == 0xDA) { // SOS: entropy data through EOI, verbatim
        rest.write(jpeg, i, jpeg.length - i)
        done = true
      } else {
        val len = (((jpeg(i + 2) & 0xff) << 8) | (jpeg(i + 3) & 0xff)) + 2
        if (marker == 0xDB || marker == 0xC4) tables.write(jpeg, i, len)
        else rest.write(jpeg, i, len)
        i += len
      }
    }
    tables.write(0xFF); tables.write(0xD9)
    (tables.toByteArray, rest.toByteArray)
  }
}
