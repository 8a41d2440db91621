package graft.sources

import org.apache.spark.sql.{DataFrame, DataFrameReader, SparkSession}

import graft.sources.grib.GribIndex

/** Engine-sniffing reader dispatch (S1/S2, weather_mv/loader_pipeline/
  * sinks.py:345-389): the reference tries kwargs-engine, then rasterio for
  * .tif, a netcdf guess, and cfgrib fallbacks. Here the dispatch is by
  * extension over Spark's source formats plus the pure-JVM scientific
  * readers: Zarr v2 (DSv2 with chunk pruning), NetCDF-3 classic, NetCDF-4
  * (HDF5 subset reader), GRIB editions 1 and 2 (decoded + channel-merged
  * like the cfgrib fallback path), and GeoTIFF (pixel decode + affine/CRS
  * reprojection). */
object FormatRegistry {

  final case class Unsupported(ext: String) extends
    UnsupportedOperationException(
      s"'$ext' has no native reader; convert to parquet upstream meanwhile.")

  val native: Map[String, String] = Map(
    "parquet" -> "parquet", "pq" -> "parquet",
    "csv" -> "csv", "json" -> "json", "orc" -> "orc", "txt" -> "text",
    "zarr" -> "zarr") // graft.sources.zarr.ZarrTableProvider (DSv2)

  private val tiff: Set[String] = Set("tif", "tiff")
  private val netcdf3: Set[String] = Set("nc", "cdf")
  private val netcdf4: Set[String] = Set("nc4", "h5", "hdf5")
  private val grib: Set[String] = Set("grib", "grib1", "grib2", "grb", "grb1", "grb2")

  def extensionOf(uri: String): String = {
    val base = uri.stripSuffix("/").split('/').last
    if (base.contains('.')) base.substring(base.lastIndexOf('.') + 1).toLowerCase else ""
  }

  /** F19 (`get_file_size`/`get_file_time`, weather_dl util.py:179-184,
    * weather_mv sinks.py:522-540): object size in bytes and mtime (UTC ms)
    * via the Hadoop FileSystem API — works for any supported scheme. */
  def fileStatus(spark: SparkSession, uri: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    (st.getLen, st.getModificationTime)
  }

  /** Avro OCF magic (`Obj\x01`) on the FIRST file the uri expands to
    * (single file, glob, or directory) — cheap (4 bytes), and never
    * consulted for known formats or explicit-engine calls. */
  private def isAvroMagic(spark: SparkSession, uri: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    try {
      GribIndex.expand(conf, uri).headOption.exists { first =>
        val p = new org.apache.hadoop.fs.Path(first)
        val fs = p.getFileSystem(conf)
        fs.getFileStatus(p).getLen >= 4 && {
          val head = new Array[Byte](4)
          val in = fs.open(p)
          try in.readFully(0, head) finally in.close()
          head(0) == 'O' && head(1) == 'b' && head(2) == 'j' && head(3) == 1
        }
      }
    } catch { case _: java.io.IOException => false }
  }

  /** `.nc` signature sniff: `\x89HDF` -> NetCDF-4 reader, `CDF` -> classic. */
  private def openNetcdf(spark: SparkSession, uri: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(uri)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val head = new Array[Byte](4)
    try in.readFully(0, head) finally in.close()
    if ((head(0) & 0xff) == 0x89 && head(1) == 'H' && head(2) == 'D' && head(3) == 'F')
      graft.sources.netcdf.NetCDF4Reader.readLongFormat(spark, uri)
    else graft.sources.netcdf.NetCDF3Reader.readLongFormat(spark, uri)
  }

  /** One DataFrame per matched file, each row stamped with its data_uri —
    * the multi-file path for the per-file native readers (the reference's
    * primary invocation is a glob, pipeline.py:42-48). Frames union by name
    * so a file with extra variables doesn't sink the whole pattern. */
  private def unionPerFile(spark: SparkSession, uri: String,
      readOne: String => DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val conf = spark.sparkContext.hadoopConfiguration
    val paths = GribIndex.expand(conf, uri)
    if (paths.isEmpty) throw new IllegalArgumentException(s"no files match: $uri")
    paths.map(p => readOne(p).select(lit(p).as("data_uri"), col("*")))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Open a URI with format sniffing. `options` mirror the reference's
    * `open_dataset_kwargs`. Globs and directories fan out per file for the
    * native scientific formats (Spark's own sources glob natively). */
  def open(spark: SparkSession, uri: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    val ext = options.getOrElse("engine", extensionOf(uri))
    val reader: DataFrameReader = spark.read.options(options - "engine")
    def multi: Boolean =
      GribIndex.isMulti(spark.sparkContext.hadoopConfiguration, uri)
    // kerchunk reference stores ship as .json: sniff the ReferenceFileSystem
    // shape ({"version": ..., "refs": ...} / {"refs": ...}) so a refs file a
    // user was handed opens as the virtual zarr store it describes, not as
    // a JSON dataset of its own keys. An EXPLICIT engine option always
    // wins (the reference's kwargs-engine-first dispatch) — the sniff only
    // applies to extension-derived routing. The head window is 64 KiB:
    // v1 files may front-load a `templates` block before `"refs"`.
    def isRefsJson: Boolean =
      ext == "json" && !options.contains("engine") && !multi && {
        val p = new org.apache.hadoop.fs.Path(uri)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val st = fs.getFileStatus(p)
        st.isFile && {
          val head = new Array[Byte](math.min(65536L, st.getLen).toInt)
          val in = fs.open(p)
          try in.readFully(0, head) finally in.close()
          val s = new String(head, java.nio.charset.StandardCharsets.UTF_8)
          val h = s.replaceAll("\\s", "").take(40)
          (h.startsWith("{\"version\":") && s.contains("\"refs\"")) ||
            h.startsWith("{\"refs\":")
        }
      }
    native.get(ext) match {
      case Some("json") if isRefsJson => reader.format("zarr").load(uri)
      case Some(fmt) => reader.format(fmt).load(uri)
      case None if netcdf3.contains(ext) =>
        // .nc can be classic OR HDF5-backed: sniff the signature per file
        // and dispatch to the matching reader
        if (multi) unionPerFile(spark, uri, p => openNetcdf(spark, p))
        else openNetcdf(spark, uri)
      case None if netcdf4.contains(ext) =>
        // NetCDF-4/HDF5 subset reader (closed the round-2/3 boundary):
        // superblock v0-v3, v1/v2 object headers, symbol-table + compact-
        // link groups, contiguous/chunked layout, deflate/shuffle filters,
        // DIMENSION_LIST via the global heap
        if (multi) unionPerFile(spark, uri,
          p => graft.sources.netcdf.NetCDF4Reader.readLongFormat(spark, p))
        else graft.sources.netcdf.NetCDF4Reader.readLongFormat(spark, uri)
      case None if grib.contains(ext) =>
        // GRIB decode (per-message edition dispatch: editions 1, 2, and
        // mixed files all read natively) + the reference's normalize/merge
        // path (sinks.py:251-342); globs fan out one indexing task per file
        if (multi) graft.sources.grib.GribReader.readMergedGlob(spark, uri)
        else graft.sources.grib.GribReader.readMerged(spark, uri)
      case None if tiff.contains(ext) =>
        // GeoTIFF pixel decode + affine/CRS -> lat/lon (sinks.py:149-227)
        if (multi) unionPerFile(spark, uri,
          p => graft.sources.tiff.TiffReader.readLongFormat(spark, p))
        else graft.sources.tiff.TiffReader.readLongFormat(spark, uri)
      case None if ext == "avro" =>
        // Avro OCF through the splittable reader on the bundled library
        // (spark-avro's DataSource is not shipped); globs and range splits
        // are AvroOcf's own planning. A DIRECTORY named *.avro (the
        // writeShards out.avro/ layout) expands like the sniff branch —
        // AvroOcf.read's file filter would otherwise see nothing in it
        if (multi) AvroOcf.readFiles(spark,
          GribIndex.expand(spark.sparkContext.hadoopConfiguration, uri))
        else AvroOcf.read(spark, uri)
      case None if ext == "tfrecord" =>
        // raw record rows (file, record_index, content); typed feature
        // extraction needs a FeatureSpec — call TfRecord.examples directly
        TfRecord.records(spark, uri)
      case None if !options.contains("engine") && isAvroMagic(spark, uri) =>
        // extension-less/odd-named OCFs (single, glob, or directory) sniff
        // by the 'Obj\x01' magic before the parquet guess ever runs; an
        // EXPLICIT engine option always wins, as with the refs-json sniff
        if (multi) AvroOcf.readFiles(spark,
          GribIndex.expand(spark.sparkContext.hadoopConfiguration, uri))
        else AvroOcf.read(spark, uri)
      case None => reader.parquet(uri) // the reference's final fallback is a guess
    }
  }
}
