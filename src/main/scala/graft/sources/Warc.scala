package graft.sources

import java.io.{ByteArrayOutputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater, Inflater}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (Web ARChive, ISO 28500 / WARC 1.0–1.1) ingestion — the Common
  * Crawl container, and the canonical ~100 TB text-corpus source format.
  *
  * Layout (public spec + the Common Crawl convention): a `.warc.gz` file is
  * a CONCATENATION of gzip members, one WARC record per member, so any
  * record can be fetched independently given its compressed offset — which
  * is exactly what the CDX index publishes. This reader walks the members
  * with a raw [[java.util.zip.Inflater]] (RFC 1952 framing parsed here)
  * instead of one big `GZIPInputStream`, so every row carries the
  * compressed member `offset`/`length` a CDX-style index needs. Plain
  * `.warc` files are parsed sequentially with record start offsets.
  *
  * Scale shape: one task per FILE (gzip member walks are strictly forward;
  * the file is the parallelism unit, as in Common Crawl processing where a
  * crawl ships as ~64k independent ~1 GB warc.gz files). Record bytes never
  * leave their task except as the projected payload column.
  *
  * HTTP blocks (`Content-Type: application/http...`) are split into status
  * / headers / body; `Transfer-Encoding: chunked` bodies are de-chunked
  * when well-formed (raw capture bytes are kept verbatim otherwise — crawl
  * data is dirty and one malformed record must not kill a 100 TB job).
  *
  * Reference behavior: weather-tools has no web-corpus reader; this is part
  * of the beyond-reference training-data surface (builder brief), next to
  * [[TarShards]] (WebDataset) on the ingestion side.
  */
object Warc {

  /** Hard cap on a single decompressed member — a corrupt or hostile
    * length must fail as a directed format error, not an undirected OOM. */
  private val MaxMemberBytes: Int = 1 << 30

  final case class UnsupportedWarc(msg: String)
      extends RuntimeException(s"unsupported warc: $msg")

  val schema: StructType = StructType(Seq(
    StructField("file_uri", StringType, nullable = false),
    // compressed gzip-member offset/length for .warc.gz (the CDX address);
    // record byte offset/length for plain .warc
    StructField("offset", LongType, nullable = false),
    StructField("length", LongType, nullable = false),
    StructField("warc_type", StringType, nullable = false),
    StructField("record_id", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    StructField("payload", BinaryType, nullable = false)))

  /** One row per WARC record across every file matching `pattern` (glob —
    * one input task per file; `.gz` suffix or gzip magic selects the
    * member-walking path). */
  def read(spark: SparkSession, pattern: String, partitions: Int = 0): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(_.getPath.toString)
    require(files.nonEmpty, s"no warc files match $pattern")
    val tconf = TaskConf(conf)
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(files.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(files, nPart).flatMap { uri =>
      val c = tconf.value
      val path = new Path(uri)
      val fsys = path.getFileSystem(c)
      val in = fsys.open(path)
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ =>
          try in.close() catch { case _: java.io.IOException => }))
      val feed = new Feed(in.readFully(_, _, _, _), fsys.getFileStatus(path).getLen)
      val head = feed.peek2()
      val recs =
        if (head == 0x1f8b) gzipRecords(uri, feed)
        else plainRecords(uri, feed)
      new Iterator[Row] {
        override def hasNext: Boolean = {
          val h = recs.hasNext
          if (!h) try in.close() catch { case _: java.io.IOException => }
          h
        }
        override def next(): Row = recs.next()
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** CDX-style random access: fetch exactly the records named by
    * `index` rows (`file_uri`, `offset`, and for `.gz` files optionally
    * `length`) via positioned reads — the Common Crawl selective-read
    * pattern, where a (tiny) index query names the records and only those
    * byte ranges are ever read from the (huge) crawl.
    *
    * Scale shape: the index is repartitioned by `file_uri` and sorted by
    * offset inside each partition, so each task opens a file once and walks
    * its fetch list strictly forward. Cost is O(selected bytes), not
    * O(crawl bytes). */
  def fetch(index: DataFrame, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.functions.col
    val spark = index.sparkSession
    val tconf = TaskConf(new Configuration(spark.sparkContext.hadoopConfiguration))
    // a multi-record gzip member puts SEVERAL index rows at one offset and
    // each parse emits every record in the member — dedup the addresses or
    // those records would come back once per index row
    val sel = index.select(col("file_uri").cast("string"),
      col("offset").cast("long")).dropDuplicates("file_uri", "offset")
    val nPart = if (partitions > 0) partitions
      else spark.sparkContext.defaultParallelism
    val sorted = sel.repartition(nPart, col("file_uri"))
      .sortWithinPartitions(col("file_uri"), col("offset"))
    val rdd = sorted.rdd.mapPartitions { it =>
      val c = tconf.value
      var curUri: String = null
      var in: org.apache.hadoop.fs.FSDataInputStream = null
      var feed: Feed = null
      def open(uri: String): Feed = {
        if (uri != curUri) {
          if (in != null) try in.close() catch { case _: java.io.IOException => }
          val path = new Path(uri)
          val fsys = path.getFileSystem(c)
          in = fsys.open(path)
          // ONE feed per file: consecutive offsets walk forward and reuse
          // the 256 KiB window, so clustered records cost one read
          val handle = in
          feed = new Feed(handle.readFully(_, _, _, _),
            fsys.getFileStatus(path).getLen)
          curUri = uri
        }
        feed
      }
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ =>
          if (in != null) try in.close() catch { case _: java.io.IOException => }))
      it.flatMap { r =>
        val uri = r.getString(0)
        val off = r.getLong(1)
        val f = open(uri)
        f.seekTo(off)
        if (f.peek2() == 0x1f8b) {
          val bytes = inflateMember(f, uri)
          parseAll(uri, bytes, off, f.pos - off)
        } else {
          val start = f.pos
          val rec = parseOne(uri, new FeedStream(f))
          List(row(uri, start, f.pos - start, rec))
        }
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** One row per WARC record from whole-file BYTES columns — the
    * streaming-ingest surface: `spark.readStream.format("binaryFile")`
    * delivers newly-landed crawl files as (path, content) rows, and this
    * stateless flatMap turns them into the same record schema as [[read]],
    * so the whole downstream pipeline (HTTP filter, extraction, dedup)
    * runs unchanged on a stream. Works on batch DataFrames too. */
  def recordsFrom(df: DataFrame, uriCol: String = "path",
      bytesCol: String = "content"): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col(uriCol).cast("string"), col(bytesCol).cast("binary"))
      .flatMap { r =>
        val uri = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val feed = new Feed(
            (off, b, o, n) => System.arraycopy(bytes, off.toInt, b, o, n),
            bytes.length.toLong)
          if (feed.peek2() == 0x1f8b) gzipRecords(uri, feed)
          else plainRecords(uri, feed)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  // ------------------------------------------------------------------ feed

  /** Buffered strictly-forward byte source over a Hadoop stream: refills a
    * 256 KiB window sequentially (object stores punish tiny reads) and
    * exposes the internal buffer to the Inflater so member bytes are never
    * copied twice. */
  private final class Feed(readAt: (Long, Array[Byte], Int, Int) => Unit,
      val fileLen: Long) {
    private val buf = new Array[Byte](256 * 1024)
    private var len = 0
    var ptr = 0
    private var bufStart = 0L // absolute offset of buf(0)

    def pos: Long = bufStart + ptr

    /** Ensure >= 1 readable byte; false at EOF. */
    def fill(): Boolean = {
      if (ptr < len) return true
      bufStart += len
      ptr = 0
      len = math.min(buf.length.toLong, fileLen - bufStart).toInt
      if (len <= 0) { len = 0; return false }
      readAt(bufStart, buf, 0, len)
      true
    }

    def readByte(): Int = if (!fill()) -1 else { val b = buf(ptr) & 0xff; ptr += 1; b }

    /** First two bytes as a big-endian pair without consuming (for magic
      * sniffing); -1 if the file is shorter. */
    def peek2(): Int = {
      if (!fill()) return -1
      if (len - ptr >= 2) return ((buf(ptr) & 0xff) << 8) | (buf(ptr + 1) & 0xff)
      if (fileLen - pos < 2) return -1
      val b0 = buf(ptr) & 0xff
      val b1 = new Array[Byte](1)
      readAt(pos + 1, b1, 0, 1)
      (b0 << 8) | (b1(0) & 0xff)
    }

    def readN(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var got = 0
      while (got < n) {
        if (!fill()) throw UnsupportedWarc(s"truncated at offset $pos")
        val take = math.min(n - got, len - ptr)
        System.arraycopy(buf, ptr, out, got, take)
        ptr += take
        got += take
      }
      out
    }

    /** Give the Inflater the current window tail; returns (array, off, n). */
    def window(): (Array[Byte], Int, Int) = {
      if (!fill()) throw UnsupportedWarc(s"truncated gzip member at offset $pos")
      (buf, ptr, len - ptr)
    }

    def consume(n: Int): Unit = ptr += n
    def unconsume(n: Int): Unit = ptr -= n
    def atEof: Boolean = pos >= fileLen

    /** Reposition; offsets inside the current window reuse it. */
    def seekTo(off: Long): Unit = {
      if (off >= bufStart && off <= bufStart + len) ptr = (off - bufStart).toInt
      else { bufStart = off; ptr = 0; len = 0 }
    }
  }

  // ------------------------------------------------------- gzip member walk

  /** RFC 1952 member header + raw-deflate body + CRC32/ISIZE trailer; the
    * trailer is verified (a corrupt member fails loudly, not silently). */
  private def inflateMember(feed: Feed, uri: String): Array[Byte] = {
    val start = feed.pos
    def b(): Int = {
      val v = feed.readByte()
      if (v < 0) throw UnsupportedWarc(s"truncated gzip header at $start in $uri")
      v
    }
    if (b() != 0x1f || b() != 0x8b)
      throw UnsupportedWarc(s"bad gzip magic at offset $start in $uri")
    if (b() != 8) throw UnsupportedWarc(s"gzip compression method != deflate in $uri")
    val flg = b()
    var i = 0
    while (i < 6) { b(); i += 1 } // MTIME(4) XFL OS
    if ((flg & 0x04) != 0) { // FEXTRA
      val xlen = b() | (b() << 8)
      feed.readN(xlen)
    }
    if ((flg & 0x08) != 0) while (b() != 0) () // FNAME
    if ((flg & 0x10) != 0) while (b() != 0) () // FCOMMENT
    if ((flg & 0x02) != 0) { b(); b() } // FHCRC
    val inf = new Inflater(true)
    val out = new ByteArrayOutputStream(64 * 1024)
    val chunk = new Array[Byte](64 * 1024)
    try {
      while (!inf.finished()) {
        if (inf.needsInput()) {
          val (arr, off, n) = feed.window()
          inf.setInput(arr, off, n)
          feed.consume(n)
        }
        val n = inf.inflate(chunk)
        if (n > 0) out.write(chunk, 0, n)
        else if (!inf.finished() && inf.needsDictionary())
          throw UnsupportedWarc(s"deflate preset dictionary in $uri")
        if (out.size() > MaxMemberBytes)
          throw UnsupportedWarc(
            s"gzip member over $MaxMemberBytes bytes at $start in $uri")
      }
      feed.unconsume(inf.getRemaining)
    } finally inf.end()
    val bytes = out.toByteArray
    val crc = feed.readN(4)
    val isize = feed.readN(4)
    val crcVal = le32(crc)
    val want = new CRC32
    want.update(bytes, 0, bytes.length)
    if (crcVal != want.getValue)
      throw UnsupportedWarc(s"gzip CRC mismatch at member offset $start in $uri")
    if (le32(isize) != (bytes.length.toLong & 0xffffffffL))
      throw UnsupportedWarc(s"gzip ISIZE mismatch at member offset $start in $uri")
    bytes
  }

  private def le32(b: Array[Byte]): Long =
    (b(0) & 0xffL) | ((b(1) & 0xffL) << 8) | ((b(2) & 0xffL) << 16) |
      ((b(3) & 0xffL) << 24)

  private def gzipRecords(uri: String, feed: Feed): Iterator[Row] =
    new Iterator[Row] {
      private var queued: List[Row] = Nil
      advance()

      private def advance(): Unit = {
        while (queued.isEmpty && !feed.atEof) {
          val start = feed.pos
          val bytes = inflateMember(feed, uri)
          val memberLen = feed.pos - start
          // one record per member is the CC convention, but the spec allows
          // several — parse all, each addressed by the member offset
          queued = parseAll(uri, bytes, start, memberLen)
        }
      }

      override def hasNext: Boolean = queued.nonEmpty
      override def next(): Row = {
        val r = queued.head
        queued = queued.tail
        advance()
        r
      }
    }

  private def plainRecords(uri: String, feed: Feed): Iterator[Row] =
    new Iterator[Row] {
      override def hasNext: Boolean = { skipBlank(); !feed.atEof }
      override def next(): Row = {
        skipBlank()
        val start = feed.pos
        val r = parseOne(uri, new FeedStream(feed))
        row(uri, start, feed.pos - start, r)
      }
      private def skipBlank(): Unit = {
        var done = false
        while (!done && !feed.atEof) {
          val b = feed.readByte()
          if (b != '\r' && b != '\n') { feed.unconsume(1); done = true }
        }
      }
    }

  // ------------------------------------------------------------ warc parse

  /** Minimal sequential byte-stream view used by the record parser. */
  private trait RecStream {
    def readLine(): String // CRLF- (or LF-)terminated, ISO-8859-1, no EOL
    def readN(n: Int): Array[Byte]
    def exhausted: Boolean
  }

  private final class FeedStream(feed: Feed) extends RecStream {
    def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      var b = feed.readByte()
      while (b >= 0 && b != '\n') {
        if (b != '\r') sb.append(b.toChar)
        b = feed.readByte()
      }
      sb.toString
    }
    def readN(n: Int): Array[Byte] = feed.readN(n)
    def exhausted: Boolean = feed.atEof
  }

  private final class BytesStream(bytes: Array[Byte]) extends RecStream {
    private var i = 0
    def readLine(): String = {
      val sb = new java.lang.StringBuilder(64)
      while (i < bytes.length && bytes(i) != '\n') {
        if (bytes(i) != '\r') sb.append((bytes(i) & 0xff).toChar)
        i += 1
      }
      if (i < bytes.length) i += 1
      sb.toString
    }
    def readN(n: Int): Array[Byte] = {
      if (i + n > bytes.length)
        throw UnsupportedWarc(s"record block truncated ($n wanted, ${bytes.length - i} left)")
      val out = java.util.Arrays.copyOfRange(bytes, i, i + n)
      i += n
      out
    }
    def exhausted: Boolean = {
      while (i < bytes.length && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
      i >= bytes.length
    }
  }

  private final case class Rec(headers: Map[String, String], block: Array[Byte])

  private def parseAll(uri: String, bytes: Array[Byte], offset: Long,
      length: Long): List[Row] = {
    val s = new BytesStream(bytes)
    val out = List.newBuilder[Row]
    while (!s.exhausted) out += row(uri, offset, length, parseOne(uri, s))
    out.result()
  }

  private def parseOne(uri: String, s: RecStream): Rec = {
    var version = s.readLine()
    while (version.isEmpty && !s.exhausted) version = s.readLine()
    if (!version.startsWith("WARC/0.") && !version.startsWith("WARC/1."))
      throw UnsupportedWarc(s"bad version line '$version' in $uri")
    val hdrs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var last: String = null
    var line = s.readLine()
    while (line.nonEmpty) {
      if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') && last != null)
        hdrs(last) = hdrs(last) + " " + line.trim // obs-fold continuation
      else {
        val colon = line.indexOf(':')
        if (colon <= 0) throw UnsupportedWarc(s"bad header line '$line' in $uri")
        last = line.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)
        hdrs(last) = line.substring(colon + 1).trim
      }
      line = s.readLine()
    }
    val clen = hdrs.getOrElse("content-length",
      throw UnsupportedWarc(s"record without Content-Length in $uri"))
    val n = try clen.toLong catch {
      case _: NumberFormatException =>
        throw UnsupportedWarc(s"bad Content-Length '$clen' in $uri")
    }
    if (n > Int.MaxValue - 8)
      throw UnsupportedWarc(s"record block of $n bytes in $uri")
    Rec(hdrs.toMap, s.readN(n.toInt))
  }

  private def row(uri: String, offset: Long, length: Long, r: Rec): Row = {
    val wtype = r.headers.getOrElse("warc-type", "unknown")
      .toLowerCase(java.util.Locale.ROOT)
    val target = r.headers.get("warc-target-uri")
      .map(u => if (u.length >= 2 && u.head == '<' && u.last == '>')
        u.substring(1, u.length - 1) else u) // WARC/1.0 angle-bracket form
    val ctype = r.headers.get("content-type")
    val isHttp = ctype.exists(
      _.toLowerCase(java.util.Locale.ROOT).startsWith("application/http"))
    val (status, httpCt, payload) =
      if (isHttp) parseHttp(r.block) else (None, None, r.block)
    Row(uri, offset, length, wtype,
      r.headers.get("warc-record-id").orNull,
      target.orNull,
      r.headers.get("warc-date").orNull,
      ctype.orNull,
      r.block.length.toLong,
      status.map(Integer.valueOf).orNull,
      httpCt.orNull,
      payload)
  }

  // ------------------------------------------------------------ http parse

  /** Split an `application/http` block into (status, content-type, body).
    * Request blocks yield status None. A block with no header/body boundary
    * is returned whole (dirty captures survive). */
  private[graft] def parseHttp(block: Array[Byte]): (Option[Int], Option[String], Array[Byte]) = {
    val boundary = indexOfCrlfCrlf(block)
    if (boundary < 0) return (None, None, block)
    val head = new String(block, 0, boundary, StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    val status =
      if (lines.head.startsWith("HTTP/")) {
        val parts = lines.head.split(" +")
        if (parts.length >= 2 && parts(1).forall(_.isDigit) && parts(1).length <= 3)
          Some(parts(1).toInt)
        else None
      } else None
    val hdrs = lines.tail.flatMap { l =>
      val c = l.indexOf(':')
      if (c <= 0) None
      else Some(l.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT) ->
        l.substring(c + 1).trim)
    }.toMap
    var body = java.util.Arrays.copyOfRange(block, boundary + 4, block.length)
    if (hdrs.get("transfer-encoding")
        .exists(_.toLowerCase(java.util.Locale.ROOT).contains("chunked")))
      dechunk(body).foreach(b => body = b)
    (status, hdrs.get("content-type"), body)
  }

  private def indexOfCrlfCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  /** RFC 9112 §7.1 chunked coding; None when malformed (caller keeps the
    * raw capture bytes — never fail a crawl job on one dirty record). */
  private[graft] def dechunk(body: Array[Byte]): Option[Array[Byte]] = {
    val out = new ByteArrayOutputStream(body.length)
    var i = 0
    def line(): String = {
      val sb = new java.lang.StringBuilder(16)
      while (i < body.length && body(i) != '\n') {
        if (body(i) != '\r') sb.append((body(i) & 0xff).toChar)
        i += 1
      }
      if (i >= body.length) return null
      i += 1
      sb.toString
    }
    var done = false
    while (!done) {
      val l = line()
      if (l == null) return None
      val semi = l.indexOf(';')
      val hexs = (if (semi >= 0) l.substring(0, semi) else l).trim
      if (hexs.isEmpty || !hexs.forall(c => Character.digit(c, 16) >= 0)) return None
      val n = try java.lang.Long.parseLong(hexs, 16) catch {
        case _: NumberFormatException => return None
      }
      if (n > Int.MaxValue || i + n > body.length) return None
      if (n == 0) done = true
      else {
        out.write(body, i, n.toInt)
        i += n.toInt
        // chunk-terminating CRLF
        if (i + 1 >= body.length || body(i) != '\r' || body(i + 1) != '\n') return None
        i += 2
      }
    }
    // trailer section: header lines until a blank line (or end)
    var l = line()
    while (l != null && l.nonEmpty) l = line()
    Some(out.toByteArray)
  }

  // -------------------------------------------------------- charset decode

  /** Append a `text` column: the payload decoded with the charset the
    * capture DECLARES — the `charset=` parameter of the HTTP Content-Type,
    * else a `<meta charset=...>` / http-equiv sniff in the first 1 KiB,
    * else UTF-8. Unknown charsets fall back to UTF-8; malformed input
    * decodes with replacement characters (crawl payloads lie about their
    * encoding constantly — a blind UTF-8 cast would mojibake every legacy
    * windows-1252 page). Compiled per-row map; all input columns carried. */
  def withPayloadText(df: DataFrame, payloadCol: String = "payload",
      httpCtCol: String = "http_content_type", outCol: String = "text"): DataFrame = {
    import org.apache.spark.sql.functions.col
    val schema = StructType(df.schema.fields :+
      StructField(outCol, StringType, nullable = false))
    val payIdx = df.schema.fieldIndex(payloadCol)
    val ctIdx = df.schema.fieldIndex(httpCtCol)
    df.map { r =>
      val payload = if (r.isNullAt(payIdx)) Array.emptyByteArray
        else r.getAs[Array[Byte]](payIdx)
      val ct = if (r.isNullAt(ctIdx)) null else r.getString(ctIdx)
      Row.fromSeq(r.toSeq :+ decodePayload(payload, ct))
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private[graft] def decodePayload(payload: Array[Byte], httpCt: String): String = {
    val declared = Option(httpCt).flatMap(charsetParam)
      .orElse(sniffMetaCharset(payload))
    val cs = declared.flatMap { name =>
      try Some(java.nio.charset.Charset.forName(name.trim))
      catch { case _: Exception => None }
    }.getOrElse(java.nio.charset.StandardCharsets.UTF_8)
    cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .decode(java.nio.ByteBuffer.wrap(payload)).toString
  }

  private def charsetParam(ct: String): Option[String] = {
    // operate entirely on the lowered string: indices into the original can
    // desynchronize under one-to-many lowercase mappings, and charset names
    // are case-insensitive anyway
    val lower = ct.toLowerCase(java.util.Locale.ROOT)
    val i = lower.indexOf("charset=")
    if (i < 0) None
    else {
      val j = i + 8
      var end = j
      while (end < lower.length && lower.charAt(end) != ';' && lower.charAt(end) != ' ')
        end += 1
      val v = lower.substring(j, end).stripPrefix("\"").stripSuffix("\"")
      if (v.isEmpty) None else Some(v)
    }
  }

  /** `<meta charset="x">` or `<meta http-equiv=... content="...charset=x">`
    * in the first 1 KiB, matched over an ISO-8859-1 view (byte-transparent,
    * and every charset name is ASCII). */
  private def sniffMetaCharset(payload: Array[Byte]): Option[String] = {
    val n = math.min(payload.length, 1024)
    if (n == 0) return None
    val head = new String(payload, 0, n, StandardCharsets.ISO_8859_1)
      .toLowerCase(java.util.Locale.ROOT)
    val m = MetaCharsetRe.findFirstMatchIn(head)
    m.map(g => Option(g.group(1)).getOrElse(g.group(2)))
  }

  private val MetaCharsetRe =
    """<meta[^>]*charset\s*=\s*["']?([a-z0-9_\-]+)["']?|<meta[^>]*content\s*=\s*["'][^"']*charset=([a-z0-9_\-]+)""".r

  // ---------------------------------------------------------------- writer

  final case class WarcRec(
      warcType: String,
      block: Array[Byte],
      targetUri: String = null,
      contentType: String = "application/octet-stream",
      date: String = "2026-01-01T00:00:00Z",
      recordId: String = null)

  /** DISTRIBUTED WARC/WET export: each input partition writes one
    * `crawl-NNNNN.warc.gz` under `dir` in the gzip-per-record layout, one
    * record per row — the write-side mirror of [[read]]. With the
    * defaults (`conversion` records, `text/plain`) this emits the WET
    * convention for extracted-text corpora; repartition upstream to size
    * shards. Task-attempt temp files + rename keep duplicate attempts
    * from interleaving. Returns the shard count. */
  def writeShards(df: DataFrame, dir: String,
      uriCol: String = "target_uri", contentCol: String = "content",
      warcType: String = "conversion", contentType: String = "text/plain",
      date: String = "2026-01-01T00:00:00Z"): Int = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    // clear stale shards: a re-run with fewer partitions must not leave
    // higher-numbered shards from the previous run for the read glob
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(conf)
    Option(dfs.globStatus(new Path(s"$dir/crawl-*.warc.gz")))
      .foreach(_.foreach(st => dfs.delete(st.getPath, false)))
    val tconf = TaskConf(conf)
    val rows = df.select(col(uriCol).cast("string"),
      col(contentCol).cast("binary"))
    // bind the RDD once: a second .rdd call could re-plan to a different
    // runtime partition count under AQE
    val rdd = rows.rdd
    val n = rdd.getNumPartitions
    rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val c = tconf.value
      val finalPath = new Path(f"$dir/crawl-$pid%05d.warc.gz")
      val tmp = new Path(f"$dir/.crawl-$pid%05d.${tc.taskAttemptId()}%d.tmp")
      val fs = finalPath.getFileSystem(c)
      val out = fs.create(tmp, true)
      try {
        var idx = 0
        it.foreach { r =>
          val uri = r.getString(0)
          val content = r.getAs[Array[Byte]](1)
          if (uri == null || content == null)
            throw UnsupportedWarc(
              s"null ${if (uri == null) "uri" else "content"} in shard $pid")
          val rec = WarcRec(warcType, content, targetUri = uri,
            contentType = contentType, date = date,
            recordId = f"<urn:graft:shard-$pid%05d-rec-$idx%06d>")
          out.write(gzipMember(recordBytes(rec, idx)))
          idx += 1
        }
      } finally out.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        fs.delete(tmp, false)
        throw UnsupportedWarc(s"could not commit shard $pid to $finalPath")
      }
    }
    n
  }

  /** Fixture/export writer. `gzipPerRecord = true` emits the Common Crawl
    * layout (one gzip member per record, independently fetchable);
    * `false` emits a plain `.warc`. */
  def write(path: String, recs: Seq[WarcRec], gzipPerRecord: Boolean = true,
      conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try {
      recs.zipWithIndex.foreach { case (r, i) =>
        val bytes = recordBytes(r, i)
        if (gzipPerRecord) out.write(gzipMember(bytes)) else out.write(bytes)
      }
    } finally out.close()
  }

  private def recordBytes(r: WarcRec, idx: Int): Array[Byte] = {
    val sb = new java.lang.StringBuilder(256)
    sb.append("WARC/1.0\r\n")
    sb.append("WARC-Type: ").append(r.warcType).append("\r\n")
    val rid = if (r.recordId != null) r.recordId
      else f"<urn:graft:rec-$idx%06d>"
    sb.append("WARC-Record-ID: ").append(rid).append("\r\n")
    sb.append("WARC-Date: ").append(r.date).append("\r\n")
    if (r.targetUri != null)
      sb.append("WARC-Target-URI: ").append(r.targetUri).append("\r\n")
    sb.append("Content-Type: ").append(r.contentType).append("\r\n")
    sb.append("Content-Length: ").append(r.block.length).append("\r\n\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + r.block.length + 4)
    out.write(head)
    out.write(r.block)
    out.write('\r'); out.write('\n'); out.write('\r'); out.write('\n')
    out.toByteArray
  }

  /** An HTTP response block for a `response` record; `chunked = true`
    * stores the body in chunked transfer coding (split into two chunks) —
    * the reader must de-chunk it back to `body`. */
  def httpResponse(status: Int, contentType: String, body: Array[Byte],
      chunked: Boolean = false): Array[Byte] = {
    val reason = status match {
      case 200 => "OK"; case 301 => "Moved Permanently"; case 404 => "Not Found"
      case _ => "Status"
    }
    val sb = new java.lang.StringBuilder(128)
    sb.append("HTTP/1.1 ").append(status).append(' ').append(reason).append("\r\n")
    sb.append("Content-Type: ").append(contentType).append("\r\n")
    if (chunked) sb.append("Transfer-Encoding: chunked\r\n")
    else sb.append("Content-Length: ").append(body.length).append("\r\n")
    sb.append("\r\n")
    val head = sb.toString.getBytes(StandardCharsets.ISO_8859_1)
    val out = new ByteArrayOutputStream(head.length + body.length + 32)
    out.write(head)
    if (!chunked) out.write(body)
    else {
      val cut = body.length / 2
      def chunk(off: Int, n: Int): Unit = {
        out.write(java.lang.Integer.toHexString(n).getBytes(StandardCharsets.ISO_8859_1))
        out.write('\r'); out.write('\n')
        out.write(body, off, n)
        out.write('\r'); out.write('\n')
      }
      if (cut > 0) chunk(0, cut)
      if (body.length - cut > 0) chunk(cut, body.length - cut)
      out.write("0\r\n\r\n".getBytes(StandardCharsets.ISO_8859_1))
    }
    out.toByteArray
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(bytes.length / 2 + 64)
    // RFC 1952 header: magic, deflate, no flags, zero mtime, XFL 0, OS 255
    out.write(Array[Byte](0x1f, 0x8b.toByte, 8, 0, 0, 0, 0, 0, 0, 0xff.toByte))
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    d.setInput(bytes)
    d.finish()
    val chunk = new Array[Byte](8192)
    while (!d.finished()) {
      val n = d.deflate(chunk)
      out.write(chunk, 0, n)
    }
    d.end()
    val crc = new CRC32
    crc.update(bytes, 0, bytes.length)
    writeLe32(out, crc.getValue)
    writeLe32(out, bytes.length.toLong & 0xffffffffL)
    out.toByteArray
  }

  private def writeLe32(out: OutputStream, v: Long): Unit = {
    out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
    out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
  }
}
