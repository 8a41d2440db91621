package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Zarr v2 store metadata + chunk IO (public spec:
  * zarr-specs v2; layout as produced by xarray/zarr-python — the reference's
  * storage format, weather_mv/test_data/test_data.zarr).
  *
  * Supported surface: C-order little-endian arrays, dtypes
  * `<f8 <f4 <i8 <i4 <i2 <u1`, compressor `null` or `{"id": "zlib"}`,
  * `.zattrs` conventions `_ARRAY_DIMENSIONS` (xarray), `scale_factor`,
  * `add_offset`, `missing_value`, and `units: "seconds since 1970-01-01"`
  * for epoch time coordinates. Blosc (the common default) is NOT available
  * in this environment — fixtures are written with zlib/raw via ZarrWriter.
  */
object ZarrMeta {

  final case class ArrayMeta(
      name: String,
      shape: Seq[Int],
      chunks: Seq[Int],
      dtype: String,
      compressor: Option[String],
      fillValue: Option[Double],
      dims: Seq[String],
      scaleFactor: Option[Double],
      addOffset: Option[Double],
      missingValue: Option[Double],
      epochSecondsTime: Boolean) {
    def chunkGrid: Seq[Int] = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
  }

  final case class Store(
      path: String,
      dims: Seq[String],                   // hypercube dimension order
      coords: Map[String, Array[Double]],  // decoded coordinate vectors
      coordMeta: Map[String, ArrayMeta],
      dataVars: Seq[ArrayMeta])

  private implicit val formats: Formats = DefaultFormats

  private def readFile(conf: Configuration, path: String): Option[Array[Byte]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](64 * 1024)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(out.toByteArray)
      } finally in.close()
    }
  }

  private def readJson(conf: Configuration, path: String): Option[JValue] =
    readFile(conf, path).map(b => JsonMethods.parse(new String(b, "UTF-8")))

  def readArrayMeta(conf: Configuration, store: String, name: String): ArrayMeta = {
    val za = readJson(conf, s"$store/$name/.zarray").getOrElse(
      throw new IllegalArgumentException(s"not a zarr array: $store/$name"))
    val attrs = readJson(conf, s"$store/$name/.zattrs").getOrElse(JObject())
    metaFromJson(name, za, attrs)
  }

  private def metaFromJson(name: String, za: JValue, attrs: JValue): ArrayMeta = {
    val compressor = (za \ "compressor") match {
      case JNull | JNothing => None
      case c => Some((c \ "id").extract[String])
    }
    val units = (attrs \ "units").extractOpt[String].getOrElse("")
    ArrayMeta(
      name = name,
      shape = (za \ "shape").extract[Seq[Int]],
      chunks = (za \ "chunks").extract[Seq[Int]],
      dtype = (za \ "dtype").extract[String],
      compressor = compressor,
      // Zarr v2 encodes non-finite float fills as the JSON STRINGS "NaN" /
      // "Infinity" / "-Infinity" — handle those before the numeric case
      fillValue = (za \ "fill_value") match {
        case JString(s) => Some(java.lang.Double.parseDouble(s))
        case JNull | JNothing => None
        case v => v.extractOpt[Double]
      },
      dims = (attrs \ "_ARRAY_DIMENSIONS").extractOpt[Seq[String]].getOrElse(Nil),
      scaleFactor = (attrs \ "scale_factor").extractOpt[Double],
      addOffset = (attrs \ "add_offset").extractOpt[Double],
      missingValue = (attrs \ "missing_value").extractOpt[Double],
      epochSecondsTime = units.startsWith("seconds since 1970-01-01"))
  }

  /** List array names (children with a .zarray) of a store directory. */
  def listArrays(conf: Configuration, store: String): Seq[String] = {
    val p = new Path(store)
    val fs = p.getFileSystem(conf)
    fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName)
      .filter(n => fs.exists(new Path(s"$store/$n/.zarray"))).toSeq.sorted
  }

  /** Array metas from consolidated metadata (`.zmetadata`,
    * zarr-python's `consolidate_metadata` / xarray `to_zarr(consolidated=
    * True)` — the reference's stores carry it): ONE metadata read instead
    * of a directory listing plus 2 reads per array, which is the difference
    * between O(1) and O(variables) round-trips on object storage. */
  private def consolidatedMetas(conf: Configuration,
      store: String): Option[Seq[ArrayMeta]] =
    readJson(conf, s"$store/.zmetadata").map { zm =>
      val entries = (zm \ "metadata") match {
        case JObject(fields) => fields.toMap
        case _ => throw new IllegalArgumentException(
          s"malformed .zmetadata (no metadata object) in $store")
      }
      entries.keys.collect {
        case k if k.endsWith("/.zarray") => k.stripSuffix("/.zarray")
      }.toSeq.sorted.map { name =>
        metaFromJson(name, entries(s"$name/.zarray"),
          entries.getOrElse(s"$name/.zattrs", JObject()))
      }
    }

  /** Open a store: data vars = arrays spanning the maximal dim set;
    * coordinates = 1-d arrays named after a dimension. Consolidated
    * metadata is preferred; absent that, the store is listed. */
  def open(conf: Configuration, store: String): Store = {
    val metas = consolidatedMetas(conf, store).getOrElse(
      listArrays(conf, store).map(n => readArrayMeta(conf, store, n)))
    require(metas.nonEmpty, s"empty zarr store: $store")
    // coordinate arrays (1-d, named after their own dim) are never data vars —
    // in a 1-D store they'd otherwise tie the max rank and duplicate a column
    val nonCoord = metas.filter(m => !(m.dims.size == 1 && m.dims.head == m.name))
    require(nonCoord.nonEmpty, s"zarr store has only coordinate arrays: $store")
    val dataVars = nonCoord.filter(m => m.dims.size == nonCoord.map(_.dims.size).max)
    val dims = dataVars.head.dims
    require(dataVars.forall(_.dims == dims),
      s"data variables disagree on dimensions: ${dataVars.map(m => m.name -> m.dims)}")
    val coordMeta = metas.filter(m => m.dims.size == 1 && dims.contains(m.name))
      .map(m => m.name -> m).toMap
    val coords = coordMeta.map { case (n, m) =>
      n -> readWholeArray(conf, store, m)
    }
    Store(store, dims, coords, coordMeta, dataVars)
  }

  /** Decode one chunk file into doubles (scale/offset applied; missing and
    * NaN become Double.NaN). Absent chunk files yield fill_value. */
  def readChunk(conf: Configuration, store: String, meta: ArrayMeta,
      chunkIdx: Seq[Int]): Array[Double] = {
    val n = meta.chunks.product
    readFile(conf, s"$store/${meta.name}/${chunkIdx.mkString(".")}") match {
      case None =>
        Array.fill(n)(meta.fillValue.getOrElse(Double.NaN))
      case Some(raw) =>
        val bytes = meta.compressor match {
          case Some("zlib") => inflate(raw, n * dtypeBytes(meta.dtype))
          case Some(other) =>
            throw new UnsupportedOperationException(
              s"zarr compressor '$other' not supported (use zlib or null)")
          case None => raw
        }
        decode(bytes, meta, n)
    }
  }

  /** Read an entire (possibly multi-chunk) array — used for coordinates. */
  def readWholeArray(conf: Configuration, store: String, meta: ArrayMeta): Array[Double] = {
    require(meta.shape.size == 1, s"${meta.name} is not 1-d")
    val out = new Array[Double](meta.shape.head)
    val grid = meta.chunkGrid.head
    for (c <- 0 until grid) {
      val chunk = readChunk(conf, store, meta, Seq(c))
      val start = c * meta.chunks.head
      val len = math.min(meta.chunks.head, meta.shape.head - start)
      System.arraycopy(chunk, 0, out, start, len)
    }
    out
  }

  def dtypeBytes(dtype: String): Int = dtype match {
    case "<f8" | "<i8" => 8
    case "<f4" | "<i4" => 4
    case "<i2" => 2
    case "<u1" | "|u1" => 1
    case other => throw new UnsupportedOperationException(s"zarr dtype '$other'")
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
        throw new java.io.IOException(
          s"truncated or corrupt zlib chunk ($off of $expected bytes)")
      }
      off += n
    }
    inf.end()
    out
  }

  private def decode(bytes: Array[Byte], meta: ArrayMeta, n: Int): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val raw: Double = meta.dtype match {
        case "<f8" => bb.getDouble(i * 8)
        case "<f4" => bb.getFloat(i * 4).toDouble
        case "<i8" => bb.getLong(i * 8).toDouble
        case "<i4" => bb.getInt(i * 4).toDouble
        case "<i2" => bb.getShort(i * 2).toDouble
        case "<u1" | "|u1" => (bb.get(i) & 0xff).toDouble
      }
      out(i) =
        if (meta.missingValue.contains(raw) || raw.isNaN) Double.NaN
        else raw * meta.scaleFactor.getOrElse(1.0) + meta.addOffset.getOrElse(0.0)
      i += 1
    }
    out
  }
}
