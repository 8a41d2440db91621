package graft.sources.tiff

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.CrsTransform
import graft.sources.TaskConf

/** Distributed GeoTIFF reader: one row per pixel, `latitude`/`longitude`
  * from the GeoTIFF affine + CRS, one column per band — completing the
  * reference's tif path (sinks.py:149-227) with native pixel decode on top
  * of [[graft.functions.CrsTransform]]'s reprojection.
  *
  * Parallelism: the driver parses the (small) IFD; strips/tiles fan out
  * across tasks, each ranged-reading exactly its own block bytes. UTM
  * rasters reproject per-point through the codegen'd column inverse; EPSG
  * 4326 rasters pass model coordinates straight through; other projected
  * CRS (Lambert conformal, polar stereographic, Mercator — by EPSG code or
  * user-defined ProjCS GeoKeys) resolve via [[TiffProjection]] and invert
  * inside the decode tasks. */
object TiffReader {

  /** Parse the header + first IFD by FOLLOWING offsets with ranged reads —
    * works wherever the IFD sits (trailing-IFD writers put it at EOF, which
    * a fixed-size head probe cannot reach). */
  def readMeta(conf: Configuration, path: String): Tiff.Meta =
    readMetaChain(conf, path, maxPages = 1).head

  /** The file's whole IFD chain (page 0 = primary image; further pages are
    * COG/overview or multi-page IFDs), following next-IFD pointers. */
  def readMetaChain(conf: Configuration, path: String,
      maxPages: Int = 64): Seq[Tiff.Meta] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    try {
      val read = (off: Long, len: Int) => {
        val b = new Array[Byte](len)
        in.readFully(off, b)
        b
      }
      val out = Seq.newBuilder[Tiff.Meta]
      var off = -1L
      var pages = 0
      var done = false
      while (!done && pages < maxPages) {
        val m = Tiff.parseMeta(read, fileLen, off)
        out += m
        pages += 1
        if (m.nextIfd > 0) off = m.nextIfd else done = true
      }
      out.result()
    } finally in.close()
  }

  /** One row per pixel of IFD `page` (0 = full resolution; COG overview
    * pages carry their own scaled georeferencing, so lat/lon stay right). */
  def readLongFormat(spark: SparkSession, path: String,
      page: Int = 0): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val chain = readMetaChain(conf, path, maxPages = page + 1)
    require(chain.size > page,
      s"$path has ${chain.size} IFD page(s); page $page requested")
    val meta = chain(page)
    val bands = (1 to meta.samplesPerPixel).map(b => s"band_$b")
    // model space disposition: geographic (x/y ARE lon/lat), UTM (codegen'd
    // column inverse below), or a projected CRS resolved to a Snyder
    // inverse applied per point inside the decode tasks
    val projected: Option[TiffProjection.ModelTransform] =
      if (meta.isGeographicModel || meta.utmZone.isDefined) None
      else Some(TiffProjection.resolve(meta)) // throws directed if unknown
    val schema = StructType(
      (if (projected.isDefined)
        Seq(StructField("latitude", DoubleType, nullable = false),
          StructField("longitude", DoubleType, nullable = false))
      else
        Seq(StructField("x", DoubleType, nullable = false),
          StructField("y", DoubleType, nullable = false))) ++
        bands.map(b => StructField(b, DoubleType, nullable = true)))

    // block index: strips are full-width row bands; tiles are a 2D grid.
    // PlanarConfiguration 2 stores each band's blocks separately,
    // band-major (all of band 0's blocks, then band 1's...) — one task
    // reads its block POSITION across every plane and interleaves, so the
    // row shape is identical either way.
    val planes = if (meta.planarConfig == 2) meta.samplesPerPixel else 1
    val blocks: Seq[(Seq[(Long, Long)], Int, Int)] = // (per-plane (offset, bytes), row0, col0)
      if (meta.tiled) {
        val tilesAcross = (meta.width + meta.tileWidth - 1) / meta.tileWidth
        val perPlane = meta.tileOffsets.size / planes
        (0 until perPlane).map { t =>
          val row0 = (t / tilesAcross) * meta.tileLength
          val col0 = (t % tilesAcross) * meta.tileWidth
          ((0 until planes).map(p => (meta.tileOffsets(p * perPlane + t),
            meta.tileByteCounts(p * perPlane + t))), row0, col0)
        }
      } else {
        val perPlane = meta.stripOffsets.size / planes
        (0 until perPlane).map { s =>
          ((0 until planes).map(p => (meta.stripOffsets(p * perPlane + s),
            meta.stripByteCounts(p * perPlane + s))), s * meta.rowsPerStrip, 0)
        }
      }
    val nPart = math.max(1, math.min(blocks.size, spark.sparkContext.defaultParallelism))
    val pathLocal = path
    val m = meta
    val projLocal = projected
    val tconf = TaskConf(conf)
    val rdd = spark.sparkContext.parallelize(blocks, nPart).mapPartitions { it =>
      graft.sources.RangedIO.rows(pathLocal, tconf) { in =>
        it.flatMap { case (planeBlocks, row0, col0) =>
          val (bw, bh) =
            if (m.tiled) (m.tileWidth, m.tileLength)
            else (m.width, math.min(m.rowsPerStrip, m.height - row0))
          val spp = m.samplesPerPixel
          val values: Array[Double] =
            if (m.planarConfig != 2) {
              val (offset, nBytes) = planeBlocks.head
              val raw = new Array[Byte](nBytes.toInt)
              in.readFully(offset, raw)
              Tiff.decodeBlock(m, raw, bw * bh * spp, rowSamples = bw * spp)
            } else {
              // decode each plane as a single-band block, then interleave
              val mPlane = m.copy(samplesPerPixel = 1)
              val out = new Array[Double](bw * bh * spp)
              planeBlocks.zipWithIndex.foreach { case ((offset, nBytes), p) =>
                val raw = new Array[Byte](nBytes.toInt)
                in.readFully(offset, raw)
                val plane = Tiff.decodeBlock(mPlane, raw, bw * bh, rowSamples = bw)
                var k = 0
                while (k < bw * bh) {
                  out(k * spp + p) = plane(k)
                  k += 1
                }
              }
              out
            }
          for {
            r <- (0 until bh).iterator
            cIdx <- (0 until bw).iterator
            row = row0 + r
            col = col0 + cIdx
            if row < m.height && col < m.width // tile edge padding
          } yield {
            val base = (r * bw + cIdx) * m.samplesPerPixel
            val bandVals = (0 until m.samplesPerPixel)
              .map(s => values(base + s): Any)
            projLocal match {
              case Some(t) =>
                val (lat, lon) = t.toLatLon(m.modelX(col), m.modelY(row))
                Row.fromSeq(lat +: lon +: bandVals)
              case None =>
                Row.fromSeq(m.modelX(col) +: m.modelY(row) +: bandVals)
            }
          }
        }
      }
    }
    val df = spark.createDataFrame(rdd, schema)
    if (projected.isDefined)
      df.select((Seq("latitude", "longitude") ++ bands).map(col): _*)
    else meta.utmZone match {
      case Some((zone, southern)) =>
        val (lon, lat) = CrsTransform.utmToLonLat(col("x"), col("y"), zone, southern)
        df.withColumn("latitude", lat).withColumn("longitude", lon)
          .drop("x", "y")
          .select((Seq("latitude", "longitude") ++ bands).map(col): _*)
      case None =>
        // geographic (or unspecified): model space IS lon/lat
        df.withColumnRenamed("y", "latitude").withColumnRenamed("x", "longitude")
          .select((Seq("latitude", "longitude") ++ bands).map(col): _*)
    }
  }
}
