package graft.sources.zarr

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.hdf5.Hdf5
import graft.sources.hdf5.Hdf5.{DatasetMeta, UnsupportedHdf5}

/** Kerchunk-style reference building — the fsspec ReferenceFileSystem
  * pattern (public: fsspec/kerchunk): index a native NetCDF-4/HDF5 file's
  * chunk map ONCE into a small JSON of `zarr key -> [uri, offset, length]`
  * entries, then serve the archive through the existing Zarr DataSource-V2
  * reader ([[ZarrMeta.openRefs]]) without rewriting a byte. At 100 TB this
  * is the difference between re-materializing an archive and reading it in
  * place: the refs JSON is O(chunks) of metadata (KBs-MBs), every data
  * byte stays in the original files, and chunk-grid partition planning +
  * coordinate predicate pruning work exactly as for a real zarr store —
  * partitions carry only their own window's references.
  *
  * Scope: numeric variables (the hypercube row model), contiguous /
  * chunked (all index flavors the HDF5 reader handles) / compact layouts,
  * deflate + shuffle filters (netCDF-4's defaults — mapped to the zarr
  * zlib compressor + numcodecs shuffle filter, whose decode composition
  * equals HDF5's); anything else raises a directed error naming the
  * variable rather than emitting references that would decode wrong. */
object Kerchunk {

  /** Scan one NetCDF-4/HDF5 file into a ReferenceFileSystem v1 JSON
    * string. `uri` is the target written into the references (defaults to
    * `path` itself; pass an absolute/scheme-qualified form for portable
    * refs). */
  def scanNetCDF4(conf: Configuration, path: String,
      uri: String = null): String = {
    val target = Option(uri).getOrElse(path)
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
      val meta = Hdf5.parse(read, fileLen)
      val dimScales = meta.datasets.filter(
        _.attrs.get("CLASS").contains("DIMENSION_SCALE"))
      val dimByAddr = dimScales.map(d => d.objAddr -> d).toMap
      def baseName(pth: String): String = pth.split('/').last
      def dimsOf(d: DatasetMeta): Seq[String] =
        d.attrs.get("DIMENSION_LIST") match {
          case Some(refs: Seq[_]) if refs.size == d.shape.size =>
            refs.map(r => baseName(dimByAddr.getOrElse(r.asInstanceOf[Long],
              throw UnsupportedHdf5(
                s"${d.path}: DIMENSION_LIST ref $r not a dimension scale")).path))
          case _ =>
            val byId = dimScales.sortBy(s => s.attrs.get("_Netcdf4Dimid")
              .collect { case x: Double => x }.getOrElse(1e9))
            d.shape.map { s =>
              baseName(byId.find(_.shape.headOption.contains(s)).getOrElse(
                throw UnsupportedHdf5(
                  s"${d.path}: no dimension scale of size $s")).path)
            }
        }
      val entries = Seq.newBuilder[(String, String)]
      entries += ".zgroup" -> ("\"" + escape("""{"zarr_format": 2}""") + "\"")
      meta.datasets.foreach { ds =>
        val name = baseName(ds.path)
        if (!ds.dtype.isNumeric)
          throw UnsupportedHdf5(s"$name: kerchunk references cover numeric " +
            s"variables; dtype class ${ds.dtype.clazz} is not referenceable")
        val dims =
          if (dimByAddr.contains(ds.objAddr)) Seq(name) else dimsOf(ds)
        entries ++= datasetEntries(read, ds, name, dims, target)
      }
      val body = entries.result().map { case (k, v) => s""""$k": $v""" }
        .mkString(", ")
      s"""{"version": 1, "refs": {$body}}"""
    } finally in.close()
  }

  /** Write refs for every file matching `pattern` (one refs json per
    * file, `<file>.refs.json` alongside unless `outDir` given). Returns
    * the refs paths. */
  def scanAll(conf: Configuration, pattern: String,
      outDir: String = null): Seq[String] = {
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(_.getPath)
    require(files.nonEmpty, s"no files match $pattern")
    files.map { f =>
      val json = scanNetCDF4(conf, f.toString)
      val out =
        if (outDir == null) new Path(f.getParent, f.getName + ".refs.json")
        else new Path(outDir, f.getName + ".refs.json")
      val os = out.getFileSystem(conf).create(out, true)
      try os.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally os.close()
      out.toString
    }
  }

  private def datasetEntries(read: (Long, Int) => Array[Byte],
      ds: DatasetMeta, name: String, dims: Seq[String],
      uri: String): Seq[(String, String)] = {
    val dt = ds.dtype
    val endian = if (dt.littleEndian) "<" else ">"
    val dtype = (dt.clazz, dt.size, dt.signed) match {
      case (1, 4, _) => s"${endian}f4"
      case (1, 8, _) => s"${endian}f8"
      case (1, 2, _) => s"${endian}f2"
      case (0, w, true) => s"${endian}i$w"
      case (0, w, false) => s"${endian}u$w"
      case _ => throw UnsupportedHdf5(s"$name: unmapped numeric dtype " +
        s"(class ${dt.clazz}, ${dt.size} bytes)")
    }
    // netCDF-4's default pipeline: optional shuffle (id 2) then deflate
    // (id 1) — mapped to numcodecs shuffle filter + zarr zlib compressor.
    // Anything else would decode WRONG through zarr codecs: directed error.
    var compressor = "null"
    var filters = "null"
    ds.filters.foreach { f =>
      f.id match {
        case 1 =>
          val lvl = f.clientValues.headOption.getOrElse(6)
          compressor = s"""{"id": "zlib", "level": $lvl}"""
        case 2 =>
          val esz = f.clientValues.headOption.getOrElse(dt.size)
          filters = s"""[{"id": "shuffle", "elementsize": $esz}]"""
        case other => throw UnsupportedHdf5(
          s"$name: HDF5 filter $other has no zarr codec equivalent " +
            "(deflate + shuffle only)")
      }
    }
    val shape = ds.shape.map(_.toInt)
    val (chunks, chunkEntries) = ds.layout match {
      case Hdf5.Contiguous(addr, size) =>
        val key = if (shape.isEmpty) "0" else shape.map(_ => "0").mkString(".")
        (shape, Seq(s"$name/$key" -> s"""["${escape(uri)}", $addr, $size]"""))
      case Hdf5.Compact(data) =>
        val key = if (shape.isEmpty) "0" else shape.map(_ => "0").mkString(".")
        val b64 = java.util.Base64.getEncoder.encodeToString(data)
        (shape, Seq(s"$name/$key" -> s""""base64:$b64""""))
      case ck: Hdf5.Chunked =>
        val refs = Hdf5.chunkRefs(read, ds)
        val es = refs.map { r =>
          if (r.filterMask != 0) throw UnsupportedHdf5(
            s"$name: chunk with partial filter mask ${r.filterMask}")
          val idx = r.offsets.zip(ck.chunkDims)
            .map { case (o, c) => (o / c).toString }.mkString(".")
          s"$name/$idx" -> s"""["${escape(uri)}", ${r.addr}, ${r.nBytes}]"""
        }
        (ck.chunkDims, es)
    }
    val fill = if (dt.clazz == 1) "\"NaN\"" else "0"
    val za =
      s"""{"zarr_format": 2, "shape": [${shape.mkString(", ")}], """ +
        s""""chunks": [${chunks.mkString(", ")}], "dtype": "$dtype", """ +
        s""""compressor": $compressor, "filters": $filters, """ +
        s""""fill_value": $fill, "order": "C"}"""
    val attrPairs = Seq.newBuilder[String]
    attrPairs += s""""_ARRAY_DIMENSIONS": [${
      dims.map(d => s""""$d"""").mkString(", ")}]"""
    def num(k: String): Option[Double] = ds.attrs.get(k).collect {
      case d: Double => d
      case s: Seq[_] if s.nonEmpty => s.head.asInstanceOf[Double]
    }
    def str(k: String): Option[String] =
      ds.attrs.get(k).collect { case s: String => s }
    num("scale_factor").foreach(v => attrPairs += s""""scale_factor": $v""")
    num("add_offset").foreach(v => attrPairs += s""""add_offset": $v""")
    num("missing_value").orElse(num("_FillValue"))
      .foreach(v => attrPairs += s""""missing_value": ${fmtNum(v)}""")
    str("units").foreach(v => attrPairs += s""""units": "${escape(v)}"""")
    str("calendar").foreach(v => attrPairs += s""""calendar": "${escape(v)}"""")
    val zattrs = attrPairs.result().mkString("{", ", ", "}")
    Seq(
      s"$name/.zarray" -> ("\"" + escape(za) + "\""),
      s"$name/.zattrs" -> ("\"" + escape(zattrs) + "\"")) ++ chunkEntries
  }

  private def fmtNum(v: Double): String =
    if (v.isNaN) "\"NaN\"" else v.toString

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c => c.toString
    }
}
