package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WebDataset-style tar-shard ingestion for multimodal training samples.
  *
  * The de-facto layout for image/caption (and audio/video) training data is
  * a directory of `.tar` shards whose members share a basename per sample —
  * `000123.jpg` + `000123.txt` + `000123.json` — read shard-sequentially
  * (the WebDataset convention, public: github.com/webdataset/webdataset).
  * The tar format itself is POSIX ustar (512-byte headers, octal sizes,
  * 512-padding), implemented here from the public spec so shards on any
  * Hadoop filesystem read without external tooling.
  *
  * Scale shape: one task per SHARD (tar members must be walked
  * sequentially, so the shard is the parallelism unit — exactly how
  * WebDataset trains); member bytes never leave their task except as the
  * requested binary column. Supported member kinds: regular files ('0' /
  * NUL), GNU long names ('L'), pax extended headers ('x'/'g' — path
  * override honored, other records skipped), directories and link entries
  * skipped. Anything else raises a directed error.
  */
object TarShards {

  final case class UnsupportedTar(msg: String)
      extends RuntimeException(s"unsupported tar: $msg")

  val schema: StructType = StructType(Seq(
    StructField("shard_uri", StringType, nullable = false),
    StructField("key", StringType, nullable = false),   // basename pre first '.'
    StructField("ext", StringType, nullable = false),   // remainder ("" if none)
    StructField("size", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  val metaSchema: StructType = StructType(schema.fields.filterNot(_.name == "content"))

  /** Member LISTING without content: headers are read, payload byte ranges
    * are skipped — indexing a shard costs O(members) x 512 B of IO, not the
    * shard's size. */
  def readMeta(spark: SparkSession, pattern: String,
      partitions: Int = 0): DataFrame =
    readImpl(spark, pattern, partitions, withContent = false)

  /** One row per tar member across every shard matching `pattern`
    * (glob — one input task per shard). */
  def read(spark: SparkSession, pattern: String, partitions: Int = 0): DataFrame =
    readImpl(spark, pattern, partitions, withContent = true)

  private def readImpl(spark: SparkSession, pattern: String, partitions: Int,
      withContent: Boolean): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val shards = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(_.getPath.toString)
    require(shards.nonEmpty, s"no tar shards match $pattern")
    val tconf = TaskConf(conf)
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(shards.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(shards, nPart).flatMap { uri =>
      val c = tconf.value
      val path = new Path(uri)
      val fsys = path.getFileSystem(c)
      val in = fsys.open(path)
      // stream members lazily — a shard can be ~1 GB and must never be
      // materialized whole; the stream closes on exhaustion AND on task
      // completion (covers failed/short-circuited tasks)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case _: java.io.IOException => }))
      val fileLen = fsys.getFileStatus(path).getLen
      // tar walks are strictly forward: serve the 512-byte headers (and
      // small members) from a sliding 256 KiB window instead of one
      // positioned read per header — object stores and NFS punish tiny
      // random reads far more than one sequential refill
      val bufSize = 256 * 1024
      val buf = new Array[Byte](bufSize)
      var bufStart = -1L
      var bufLen = 0
      val readAt = (off: Long, len: Int) => {
        val b = new Array[Byte](len)
        if (len >= bufSize) in.readFully(off, b)
        else {
          if (off < bufStart || off + len > bufStart + bufLen) {
            bufStart = off
            bufLen = math.min(bufSize.toLong, fileLen - off).toInt
            in.readFully(off, buf, 0, bufLen)
          }
          System.arraycopy(buf, (off - bufStart).toInt, b, 0, len)
        }
        b
      }
      val it = members(uri, readAt, fileLen, withContent)
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = it.hasNext
          if (!h) try in.close() catch { case _: java.io.IOException => }
          h
        }
        override def next(): Row = it.next()
      }
    }
    spark.createDataFrame(rdd, if (withContent) schema else metaSchema)
  }

  /** Group members into WebDataset samples: one row per (shard, key) with
    * an ext -> content map — the shape a training loader consumes. */
  def samples(members: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    members.groupBy(col("shard_uri"), col("key"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("ext"), col("content"))))).as("parts"),
        sum(col("size")).as("sample_bytes"))
  }

  private def members(uri: String, readAt: (Long, Int) => Array[Byte],
      fileLen: Long, withContent: Boolean = true): Iterator[Row] =
    new Iterator[Row] {
    private var off = 0L
    private var pendingLongName: Option[String] = None
    private var pendingPaxPath: Option[String] = None
    private var nextRow: Row = null
    advance()

    override def hasNext: Boolean = nextRow != null
    override def next(): Row = {
      val r = nextRow
      advance()
      r
    }

    @scala.annotation.tailrec
    private def fetch(): Row = {
      if (off + 512 > fileLen) return null
      val h = readAt(off, 512)
      if (h.forall(_ == 0)) return null // end-of-archive zero block
      val rawName = cstr(h, 0, 100)
      val size = octal(h, 124, 12)
      val typeflag = h(156).toChar
      val magic = cstr(h, 257, 6)
      if (magic != "ustar" && magic != "ustar ")
        throw UnsupportedTar(s"bad magic '$magic' at offset $off in $uri")
      val dataOff = off + 512
      val padded = (size + 511) / 512 * 512
      off = dataOff + padded
      typeflag match {
        case '0' | '\u0000' =>
          val prefix = cstr(h, 345, 155)
          val name0 = pendingLongName.getOrElse(pendingPaxPath.getOrElse(
            if (prefix.nonEmpty) s"$prefix/$rawName" else rawName))
          pendingLongName = None; pendingPaxPath = None
          val base = name0.substring(name0.lastIndexOf('/') + 1)
          val dot = base.indexOf('.')
          val (key, ext) =
            if (dot < 0) (base, "") else (base.substring(0, dot), base.substring(dot + 1))
          if (!withContent) Row(uri, key, ext, size)
          else {
            if (size > Int.MaxValue - 8)
              throw UnsupportedTar(s"member $name0 of $size bytes in $uri")
            val content = if (size == 0) Array.emptyByteArray
              else readAt(dataOff, size.toInt)
            Row(uri, key, ext, size, content)
          }
        case 'L' => // GNU long name: payload is the next member's name
          pendingLongName = Some(new String(readAt(dataOff, size.toInt),
            java.nio.charset.StandardCharsets.UTF_8).takeWhile(_ != '\u0000'))
          fetch()
        case 'x' | 'g' => // pax: "len key=value\n" records; honor `path`
          val body = new String(readAt(dataOff, size.toInt),
            java.nio.charset.StandardCharsets.UTF_8)
          body.split("\n").foreach { rec =>
            val sp = rec.indexOf(' ')
            if (sp > 0) {
              val kv = rec.substring(sp + 1)
              val eq = kv.indexOf('=')
              if (eq > 0 && kv.substring(0, eq) == "path" && typeflag == 'x')
                pendingPaxPath = Some(kv.substring(eq + 1))
            }
          }
          fetch()
        case '5' | '1' | '2' => fetch() // directories and links: skip
        case other =>
          throw UnsupportedTar(s"member type '$other' for $rawName in $uri")
      }
    }

    private def advance(): Unit = nextRow = fetch()
  }

  /** DISTRIBUTED WebDataset export: each input partition writes one
    * `shard-NNNNN.tar` under `dir` with members named `<key>.<ext>` —
    * the write-side mirror of [[read]]/[[samples]]. Rows need (key, ext,
    * content) columns; repartition upstream to size shards (the usual
    * recipe: `df.repartition(n)` for ~even shards, or range-partition by
    * a sort key for curriculum-ordered shards). Returns shard count. */
  def writeShards(df: DataFrame, dir: String, keyCol: String = "key",
      extCol: String = "ext", contentCol: String = "content"): Int = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // clear stale shards: a re-run with fewer partitions must not leave
    // higher-numbered shards from the previous run for the read glob
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(conf)
    Option(dfs.globStatus(new Path(s"$dir/shard-*.tar")))
      .foreach(_.foreach(st => dfs.delete(st.getPath, false)))
    val tconf = TaskConf(conf)
    val rows = df.select(col(keyCol).cast("string"), col(extCol).cast("string"),
      col(contentCol))
    // bind the RDD ONCE: a second .rdd call builds a new plan whose
    // runtime partition count (AQE) could disagree with the one executed
    val rdd = rows.rdd
    val n = rdd.getNumPartitions
    rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val c = tconf.value
      val finalPath = new Path(f"$dir/shard-$pid%05d.tar")
      // task-attempt temp file + rename: duplicate attempts (speculation,
      // zombies) never interleave writes into the final shard
      val tmp = new Path(f"$dir/.shard-$pid%05d.${tc.taskAttemptId()}%d.tmp")
      val fs = finalPath.getFileSystem(c)
      val out = fs.create(tmp, true)
      try {
        it.foreach { r =>
          val key = r.getString(0)
          val ext = r.getString(1)
          val content = r.getAs[Array[Byte]](2)
          if (key == null || ext == null || content == null)
            throw UnsupportedTar(
              s"null ${if (key == null) "key" else if (ext == null) "ext"
              else "content"} in shard $pid (use '' for members without an " +
                "extension)")
          if (key.contains('.')) throw UnsupportedTar(
            s"key '$key' contains '.' — read() splits the member name at " +
              "the first dot, so dotted keys would not round-trip")
          val name = if (ext.isEmpty) key else s"$key.$ext"
          writeMember(out, name, content)
        }
        // empty partitions still leave a valid (empty) shard — deterministic
        // shard numbering beats missing files for downstream loaders
        out.write(new Array[Byte](1024))
      } finally out.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        fs.delete(tmp, false)
        throw UnsupportedTar(s"could not commit shard $pid to $finalPath")
      }
    }
    n
  }

  /** Fixture/export writer: plain ustar, one member per (name, bytes). */
  def write(path: String, entries: Seq[(String, Array[Byte])],
      conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try {
      entries.foreach { case (name, bytes) => writeMember(out, name, bytes) }
      out.write(new Array[Byte](1024))    // end-of-archive
    } finally out.close()
  }

  private def writeMember(out: java.io.OutputStream, name: String,
      bytes: Array[Byte]): Unit = {
    require(name.getBytes("UTF-8").length <= 100,
      s"writer emits plain ustar names <= 100 bytes: $name")
    val h = new Array[Byte](512)
    putStr(h, 0, name)
    putOctal(h, 100, 7, 420)          // 0644
    putOctal(h, 108, 7, 0); putOctal(h, 116, 7, 0)
    putOctal(h, 124, 11, bytes.length)
    putOctal(h, 136, 11, 0)           // mtime
    java.util.Arrays.fill(h, 148, 156, ' '.toByte) // checksum spaces
    h(156) = '0'
    putStr(h, 257, "ustar"); h(263) = 0
    h(264) = '0'; h(265) = '0'        // version
    val sum = h.map(_ & 0xff).sum
    putOctal(h, 148, 6, sum); h(154) = 0; h(155) = ' '
    out.write(h)
    out.write(bytes)
    val pad = (512 - bytes.length % 512) % 512
    if (pad > 0) out.write(new Array[Byte](pad))
  }

  private def cstr(b: Array[Byte], off: Int, len: Int): String = {
    var end = off
    while (end < off + len && b(end) != 0) end += 1
    new String(b, off, end - off, java.nio.charset.StandardCharsets.UTF_8)
  }

  private def octal(b: Array[Byte], off: Int, len: Int): Long = {
    if ((b(off) & 0x80) != 0) { // GNU base-256 (members >= 8 GiB)
      var i = off + 1
      while (i < off + len - 8) {
        if (b(i) != 0) throw UnsupportedTar(
          "base-256 numeric field out of Long range")
        i += 1
      }
      var v = (b(off) & 0x3f).toLong
      while (i < off + len) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      if (v < 0) throw UnsupportedTar("base-256 numeric field out of Long range")
      return v
    }
    var v = 0L
    var i = off
    // tolerate leading spaces/NULs and stop at terminator
    while (i < off + len && (b(i) == ' ' || b(i) == 0)) i += 1
    while (i < off + len && b(i) >= '0' && b(i) <= '7') {
      v = v * 8 + (b(i) - '0')
      i += 1
    }
    v
  }

  private def putStr(b: Array[Byte], off: Int, s: String): Unit = {
    val bs = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    System.arraycopy(bs, 0, b, off, bs.length)
  }

  private def putOctal(b: Array[Byte], off: Int, width: Int, v: Long): Unit = {
    val s = java.lang.Long.toOctalString(v)
    val padded = ("0" * (width - s.length)) + s
    putStr(b, off, padded)
  }
}
