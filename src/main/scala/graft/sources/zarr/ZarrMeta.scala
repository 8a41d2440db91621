package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Inflater

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Zarr v2 AND v3 store metadata + chunk IO (public specs: zarr-specs v2 and
  * v3; layouts as produced by xarray/zarr-python 2.x and 3.x — the
  * reference's storage format, weather_mv/test_data/test_data.zarr).
  *
  * Supported surface (v2): C-order little-endian arrays, dtypes
  * `<f8 <f4 <i8 <i4 <i2 <u1`, compressor `null`, `{"id": "zlib"}`,
  * `{"id": "zstd"}` (one frame per chunk — decoded by [[Zstd]]), or
  * `{"id": "blosc"}` with EVERY numcodecs cname — blosclz, lz4, snappy,
  * zlib, zstd (zarr-python 2.x's DEFAULT compressor — decoded by
  * [[Blosc]]), `.zattrs` conventions `_ARRAY_DIMENSIONS` (xarray),
  * `scale_factor`, `add_offset`, `missing_value`, and
  * `units: "seconds since 1970-01-01"` for epoch time coordinates.
  *
  * Supported surface (v3, sniffed by the root `zarr.json`): regular chunk
  * grid, `default` ("c/0/1") and `v2` chunk-key encodings with either
  * separator, `bytes` codec at both endians, `gzip`/`zstd` (zarr-python
  * 3's DEFAULT compressor)/`blosc` (all five cnames) compression,
  * `sharding_indexed` (read and write, bytes [+ crc32c] index codecs),
  * `dimension_names`, numeric/"NaN" fill values, inline
  * `consolidated_metadata` (zarr-python 3's successor to `.zmetadata`),
  * and the same CDL attribute conventions.
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
      epochSecondsTime: Boolean,
      // v3 chunk addressing: v2 keys are "0.1"; v3 default keys are
      // "c/0/1" (separator configurable); v3 may also elect v2-style keys
      v3DefaultKeys: Boolean = false,
      keySep: String = ".",
      // v3 sharding_indexed: `chunks` above is the INNER chunk shape (the
      // read/prune granularity); `shardChunks` is the outer shard shape in
      // elements; inner chunks pack into one shard object with a binary
      // index at `shardIndexAtEnd` (true = trailing), crc32c-checked when
      // `shardIndexCrc`
      shardChunks: Option[Seq[Int]] = None,
      shardIndexAtEnd: Boolean = true,
      shardIndexCrc: Boolean = true,
      // v2 `filters`: a single numcodecs Delta (cumulative-sum inverse,
      // applied between decompression and dtype decode) is supported;
      // anything else raises a directed error at parse time
      deltaFilter: Boolean = false) {
    def chunkGrid: Seq[Int] = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def chunkKey(chunkIdx: Seq[Int]): String =
      if (v3DefaultKeys) ("c" +: chunkIdx.map(_.toString)).mkString(keySep)
      else chunkIdx.mkString(keySep)
    /** Inner chunks per shard, per dim (sharded arrays only). */
    def innerPerShard: Seq[Int] =
      shardChunks.get.zip(chunks).map { case (o, c) => (o + c - 1) / c }
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
    // `filters` apply between the compressor and the raw bytes; ignoring
    // one would decode WRONG values silently, so anything unrecognized is
    // a directed error, not a pass-through
    val delta = (za \ "filters") match {
      case JNull | JNothing | JArray(Nil) => false
      case JArray(List(f)) if (f \ "id").extractOpt[String].contains("delta") =>
        val dt = (f \ "dtype").extractOpt[String]
        val at = (f \ "astype").extractOpt[String].orElse(dt)
        require(at == dt, s"delta filter astype $at != dtype $dt (unsupported)")
        true
      case other =>
        throw new UnsupportedOperationException(
          s"zarr v2 filters ${JsonMethods.compact(JsonMethods.render(other))} " +
            "— only a single numcodecs delta filter is supported")
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
      epochSecondsTime = units.startsWith("seconds since 1970-01-01"),
      deltaFilter = delta)
  }

  /** Parse a v3 array `zarr.json` into the common ArrayMeta. */
  private def metaFromJsonV3(name: String, j: JValue): ArrayMeta = {
    require((j \ "node_type").extractOpt[String].contains("array"),
      s"$name/zarr.json is not an array node")
    var endian = "little"
    var comp: Option[String] = None
    var innerChunks: Option[Seq[Int]] = None
    var indexAtEnd = true
    var indexCrc = false
    def applyCodecs(codecs: Seq[JValue]): Unit = codecs.foreach { c =>
      (c \ "name").extract[String] match {
        case "bytes" => endian =
          (c \ "configuration" \ "endian").extractOpt[String].getOrElse("little")
        case "gzip" => comp = Some("gzip")
        case "zlib" => comp = Some("zlib")
        case "zstd" => comp = Some("zstd")
        case "blosc" => comp = Some("blosc")
        case "sharding_indexed" =>
          val cfg = c \ "configuration"
          innerChunks = Some((cfg \ "chunk_shape").extract[Seq[Int]])
          indexAtEnd =
            (cfg \ "index_location").extractOpt[String].forall(_ == "end")
          val idxNames = (cfg \ "index_codecs").extract[Seq[JValue]]
            .map(ic => (ic \ "name").extract[String])
          require(idxNames.forall(n => n == "bytes" || n == "crc32c"),
            s"zarr v3 shard index codecs $idxNames on $name (bytes [+ crc32c] only)")
          indexCrc = idxNames.contains("crc32c")
          applyCodecs((cfg \ "codecs").extract[Seq[JValue]])
        case other => throw new UnsupportedOperationException(
          s"zarr v3 codec '$other' on $name (supported: bytes, gzip, zstd, " +
            "blosc, sharding_indexed; rewrite with zarr.copy_store to a " +
            "supported-codec store)")
      }
    }
    applyCodecs((j \ "codecs").extract[Seq[JValue]])
    val dt = (j \ "data_type").extract[String] match {
      case "float64" => "f8"
      case "float32" => "f4"
      case "int64" => "i8"
      case "int32" => "i4"
      case "int16" => "i2"
      case "uint8" => "u1"
      case other => throw new UnsupportedOperationException(
        s"zarr v3 data_type '$other' on $name")
    }
    val grid = j \ "chunk_grid"
    require((grid \ "name").extractOpt[String].forall(_ == "regular"),
      s"zarr v3 chunk grid '${(grid \ "name").extractOpt[String]}' (regular only)")
    val cke = j \ "chunk_key_encoding"
    val ckeName = (cke \ "name").extractOpt[String].getOrElse("default")
    val sep = (cke \ "configuration" \ "separator").extractOpt[String]
      .getOrElse(if (ckeName == "default") "/" else ".")
    val attrs = (j \ "attributes") match { case JNothing => JObject(); case a => a }
    val units = (attrs \ "units").extractOpt[String].getOrElse("")
    val gridChunks = (grid \ "configuration" \ "chunk_shape").extract[Seq[Int]]
    ArrayMeta(
      name = name,
      shape = (j \ "shape").extract[Seq[Int]],
      // sharded arrays: grid chunk = SHARD; read granularity = inner chunk
      chunks = innerChunks.getOrElse(gridChunks),
      dtype = (if (endian == "big") ">" else "<") + dt,
      compressor = comp,
      fillValue = (j \ "fill_value") match {
        case JString(s) => Some(java.lang.Double.parseDouble(s))
        case JNull | JNothing => None
        case v => v.extractOpt[Double]
      },
      dims = (j \ "dimension_names").extractOpt[Seq[String]].getOrElse(Nil),
      scaleFactor = (attrs \ "scale_factor").extractOpt[Double],
      addOffset = (attrs \ "add_offset").extractOpt[Double],
      missingValue = (attrs \ "missing_value").extractOpt[Double],
      epochSecondsTime = units.startsWith("seconds since 1970-01-01"),
      v3DefaultKeys = ckeName == "default",
      keySep = sep,
      shardChunks = innerChunks.map(_ => gridChunks),
      shardIndexAtEnd = indexAtEnd,
      shardIndexCrc = indexCrc)
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

  /** v3 array metas: the root `zarr.json`'s inline `consolidated_metadata`
    * when present (one read plans the store — zarr-python 3's successor to
    * `.zmetadata`), else one `zarr.json` read per child directory. */
  private def v3Metas(conf: Configuration, store: String,
      root: JValue): Seq[ArrayMeta] = {
    val consolidated = (root \ "consolidated_metadata" \ "metadata") match {
      case JObject(fields) =>
        Some(fields.collect {
          case (name, j) if (j \ "node_type").extractOpt[String].contains("array") =>
            metaFromJsonV3(name, j)
        }.sortBy(_.name))
      case _ => None
    }
    consolidated.getOrElse {
      val p = new Path(store)
      val fs = p.getFileSystem(conf)
      fs.listStatus(p).filter(_.isDirectory).map(_.getPath.getName).sorted.toSeq
        .flatMap(n => readJson(conf, s"$store/$n/zarr.json")
          .filter(j => (j \ "node_type").extractOpt[String].contains("array"))
          .map(j => metaFromJsonV3(n, j)))
    }
  }

  /** Open a store (v2 or v3, sniffed by the root `zarr.json`): data vars =
    * arrays spanning the maximal dim set; coordinates = 1-d arrays named
    * after a dimension. Consolidated metadata is preferred; absent that,
    * the store is listed. */
  def open(conf: Configuration, store: String): Store = {
    val metas = readJson(conf, s"$store/zarr.json") match {
      case Some(root) =>
        require((root \ "zarr_format").extractOpt[Int].contains(3),
          s"unexpected zarr_format in $store/zarr.json")
        v3Metas(conf, store, root)
      case None => consolidatedMetas(conf, store).getOrElse(
        listArrays(conf, store).map(n => readArrayMeta(conf, store, n)))
    }
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
    val fill = () => Array.fill(n)(meta.fillValue.getOrElse(Double.NaN))
    def decompress(raw: Array[Byte]): Array[Byte] = meta.compressor match {
      case Some("zlib") => inflate(raw, n * dtypeBytes(meta.dtype))
      case Some("gzip") => gunzip(raw, n * dtypeBytes(meta.dtype))
      // whole chunk object = one zstd frame (numcodecs Zstd / v3 zstd codec)
      case Some("zstd") =>
        Zstd.decompress(raw, 0, raw.length, n * dtypeBytes(meta.dtype))
      // blosc chunks are self-describing (header carries codec/shuffle/
      // sizes), so one case covers every cname the codec supports
      case Some("blosc") => Blosc.decompress(raw)
      case Some(other) =>
        throw new UnsupportedOperationException(
          s"zarr compressor '$other' not supported (use zlib, gzip, zstd, blosc, or null)")
      case None => raw
    }
    def defilter(raw: Array[Byte]): Array[Byte] =
      if (meta.deltaFilter) undelta(decompress(raw), meta.dtype)
      else decompress(raw)
    meta.shardChunks match {
      case None =>
        readFile(conf, s"$store/${meta.name}/${meta.chunkKey(chunkIdx)}") match {
          case None => fill()
          case Some(raw) => decode(defilter(raw), meta, n)
        }
      case Some(_) =>
        val per = meta.innerPerShard
        val shardIdx = chunkIdx.zip(per).map { case (ci, p) => ci / p }
        val inner = chunkIdx.zip(per).map { case (ci, p) => ci % p }
        val linear = inner.zip(per).foldLeft(0L) { case (acc, (i, p)) => acc * p + i }
        readShardEntry(conf,
          s"$store/${meta.name}/${meta.chunkKey(shardIdx)}",
          meta, per.map(_.toLong).product, linear) match {
          case None => fill()
          case Some(raw) => decode(defilter(raw), meta, n)
        }
    }
  }

  /** One inner chunk's encoded bytes out of a shard object
    * (`sharding_indexed` codec): parse the binary index (u64-LE
    * offset/nbytes per inner chunk in C-order, 2^64-1 = missing, optional
    * trailing crc32c), then ranged-read the entry. Two ranged reads per
    * chunk — at fixture scale per call; a production task reads its
    * shard's index once and serves all its inner chunks from it, which is
    * exactly why sharding keeps 100 TB stores at sane object counts. */
  private def readShardEntry(conf: Configuration, path: String, meta: ArrayMeta,
      innerCount: Long, linear: Long): Option[Array[Byte]] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    if (!fs.exists(p)) return None
    val fileLen = fs.getFileStatus(p).getLen
    val indexLen = 16L * innerCount + (if (meta.shardIndexCrc) 4 else 0)
    require(fileLen >= indexLen, s"shard $path shorter than its index")
    val in = fs.open(p)
    try {
      val idx = new Array[Byte](indexLen.toInt)
      in.readFully(if (meta.shardIndexAtEnd) fileLen - indexLen else 0L, idx)
      if (meta.shardIndexCrc) {
        val crc = new java.util.zip.CRC32C()
        crc.update(idx, 0, idx.length - 4)
        val stored = ByteBuffer.wrap(idx, idx.length - 4, 4)
          .order(ByteOrder.LITTLE_ENDIAN).getInt & 0xffffffffL
        require(crc.getValue == stored,
          s"shard index crc32c mismatch in $path")
      }
      val bb = ByteBuffer.wrap(idx).order(ByteOrder.LITTLE_ENDIAN)
      val off = bb.getLong((linear * 16).toInt)
      val nbytes = bb.getLong((linear * 16).toInt + 8)
      if (off == -1L && nbytes == -1L) None // 2^64-1: chunk not present
      else {
        val raw = new Array[Byte](nbytes.toInt)
        in.readFully(off, raw)
        Some(raw)
      }
    } finally in.close()
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

  def dtypeBytes(dtype: String): Int = dtype.drop(1) match {
    case "f8" | "i8" => 8
    case "f4" | "i4" => 4
    case "i2" => 2
    case "u1" => 1
    case _ => throw new UnsupportedOperationException(s"zarr dtype '$dtype'")
  }

  /** Inverse of the numcodecs Delta filter: cumulative sum in the array's
    * OWN dtype — integer wraparound and float32 rounding follow from doing
    * the arithmetic at that width, exactly as numcodecs does. */
  private[zarr] def undelta(bytes: Array[Byte], dtype: String): Array[Byte] = {
    val order =
      if (dtype.startsWith(">")) java.nio.ByteOrder.BIG_ENDIAN
      else java.nio.ByteOrder.LITTLE_ENDIAN
    val bb = java.nio.ByteBuffer.wrap(bytes).order(order)
    dtype.drop(1) match {
      case "f8" =>
        val b = bb.asDoubleBuffer()
        var acc = 0.0
        (0 until b.limit()).foreach { i => acc += b.get(i); b.put(i, acc) }
      case "f4" =>
        val b = bb.asFloatBuffer()
        var acc = 0.0f
        (0 until b.limit()).foreach { i => acc += b.get(i); b.put(i, acc) }
      case "i8" =>
        val b = bb.asLongBuffer()
        var acc = 0L
        (0 until b.limit()).foreach { i => acc += b.get(i); b.put(i, acc) }
      case "i4" =>
        val b = bb.asIntBuffer()
        var acc = 0
        (0 until b.limit()).foreach { i => acc += b.get(i); b.put(i, acc) }
      case "i2" =>
        val b = bb.asShortBuffer()
        var acc: Short = 0
        (0 until b.limit()).foreach { i =>
          acc = (acc + b.get(i)).toShort; b.put(i, acc)
        }
      case "u1" =>
        var acc = 0
        bytes.indices.foreach { i =>
          acc = (acc + (bytes(i) & 0xff)) & 0xff; bytes(i) = acc.toByte
        }
      case _ => throw new UnsupportedOperationException(
        s"delta filter over zarr dtype '$dtype'")
    }
    bytes
  }

  private def gunzip(raw: Array[Byte], expected: Int): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw))
    try {
      val out = new Array[Byte](expected)
      var off = 0
      var n = in.read(out, off, expected - off)
      while (n > 0 && off + n < expected) { off += n; n = in.read(out, off, expected - off) }
      if (n > 0) off += n
      if (off < expected)
        throw new java.io.IOException(
          s"truncated gzip zarr chunk ($off of $expected bytes)")
      out
    } finally in.close()
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
    val order =
      if (meta.dtype.startsWith(">")) ByteOrder.BIG_ENDIAN else ByteOrder.LITTLE_ENDIAN
    val bb = ByteBuffer.wrap(bytes).order(order)
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val raw: Double = meta.dtype.drop(1) match {
        case "f8" => bb.getDouble(i * 8)
        case "f4" => bb.getFloat(i * 4).toDouble
        case "i8" => bb.getLong(i * 8).toDouble
        case "i4" => bb.getInt(i * 4).toDouble
        case "i2" => bb.getShort(i * 2).toDouble
        case "u1" => (bb.get(i) & 0xff).toDouble
      }
      out(i) =
        if (meta.missingValue.contains(raw) || raw.isNaN) Double.NaN
        else raw * meta.scaleFactor.getOrElse(1.0) + meta.addOffset.getOrElse(0.0)
      i += 1
    }
    out
  }
}
