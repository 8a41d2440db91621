package graft.sources

import java.util.zip.{CRC32C, GZIPInputStream, GZIPOutputStream}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** TFRecord — the TensorFlow training-data container (TFDS exports,
  * tf.data input pipelines, many published LLM corpora). Everything here
  * is from the PUBLIC format documentation: the record framing
  * (tensorflow/core/lib/io/record_writer docs: u64-LE length, u32-LE
  * masked CRC-32C of the length bytes, payload, u32-LE masked CRC-32C of
  * the payload; mask = ((crc >>> 15) | (crc << 17)) + 0xa282ead8) and the
  * `tf.train.Example` protobuf schema (example.proto / feature.proto:
  * Example{1: Features}, Features{1: map<string, Feature>},
  * Feature{1: BytesList, 2: FloatList, 3: Int64List}), decoded by a
  * hand-rolled proto-wire walk — no protobuf dependency.
  *
  * Scale model: TFRecord files carry no sync markers, so a bare file is
  * NOT splittable — the parallelism unit is the FILE (exactly the
  * WARC/tar shape; corpora ship as many ~100 MB–1 GB shards). With the
  * ecosystem-standard `.idx` SIDECAR beside a plain shard (the DALI
  * `tfrecord2idx` text convention, written here by [[writeIndex]]),
  * large shards fan out as record-aligned byte-range tasks instead —
  * the splittable path for coarse-sharded archives. Reads stream
  * sequentially through a buffered window, never materializing a shard.
  * Compressed shards (`tf.io.TFRecordOptions` GZIP or ZLIB) are sniffed
  * by content — a verified plain-framing CRC beats any header byte — and
  * inflated on the fly. A length field that overruns the
  * file or a CRC mismatch is a DIRECTED error (corrupt shard or a
  * compression-option mismatch), never silent corruption.
  *
  * Reference scope note: the reference engine has no TFRecord surface;
  * this is part of the beyond-reference training-data pipeline layer
  * (SURVEY "training-data ops"). */
object TfRecord {
  final case class UnsupportedTfRecord(msg: String)
    extends RuntimeException(msg)

  /** One typed column pulled out of each record's tf.Example features.
    * `kind`: int64 | float | bytes | string (string = UTF-8 bytes_list).
    * `scalar` = first value (null when the feature is absent/empty);
    * otherwise the whole list as an array column. */
  final case class FeatureSpec(name: String, kind: String,
      scalar: Boolean = true) {
    require(Set("int64", "float", "bytes", "string")(kind),
      s"feature kind '$kind' (int64/float/bytes/string)")
  }

  // ------------------------------------------------------------ framing

  private def maskedCrc(b: Array[Byte], off: Int, len: Int): Int = {
    val c = new CRC32C()
    c.update(b, off, len)
    val crc = c.getValue.toInt
    ((crc >>> 15) | (crc << 17)) + 0xa282ead8
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private def le64(b: Array[Byte], off: Int): Long =
    (le32(b, off) & 0xffffffffL) | ((le32(b, off + 4) & 0xffffffffL) << 32)

  private def putLe32(o: java.io.OutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >>> 8) & 0xff)
    o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
  }

  /** Streaming record walk over one (possibly gzipped) shard. */
  private def recordIterator(uri: String, in: java.io.InputStream,
      maxRecordBytes: Long): Iterator[Array[Byte]] = new Iterator[Array[Byte]] {
    private val din = new java.io.DataInputStream(
      new java.io.BufferedInputStream(in, 256 * 1024))
    private var nextRec: Array[Byte] = _
    private var done = false
    private var recNo = 0L

    private def readFullyOrNull(n: Int): Array[Byte] = {
      val b = new Array[Byte](n)
      var got = 0
      while (got < n) {
        val r = din.read(b, got, n - got)
        if (r < 0) {
          if (got == 0 && n == 12) return null // clean EOF at a record head
          throw UnsupportedTfRecord(
            s"$uri: truncated record $recNo ($got of $n bytes)")
        }
        got += r
      }
      b
    }

    private def fetch(): Array[Byte] = {
      val head = readFullyOrNull(12)
      if (head == null) return null
      val len = le64(head, 0)
      if (maskedCrc(head, 0, 8) != le32(head, 8))
        throw UnsupportedTfRecord(s"$uri: record $recNo length CRC mismatch " +
          "(corrupt shard, or a compression-option mismatch)")
      if (len < 0 || len > maxRecordBytes)
        throw UnsupportedTfRecord(
          s"$uri: record $recNo declares $len bytes (cap $maxRecordBytes)")
      val body = new Array[Byte](len.toInt + 4)
      try din.readFully(body)
      catch { case _: java.io.EOFException => throw UnsupportedTfRecord(
        s"$uri: truncated record $recNo (wanted ${len + 4} bytes past the head)") }
      if (maskedCrc(body, 0, len.toInt) != le32(body, len.toInt))
        throw UnsupportedTfRecord(s"$uri: record $recNo data CRC mismatch")
      recNo += 1
      java.util.Arrays.copyOf(body, len.toInt)
    }

    override def hasNext: Boolean = {
      if (!done && nextRec == null) {
        nextRec = fetch()
        if (nextRec == null) { done = true; din.close() }
      }
      !done
    }
    override def next(): Array[Byte] = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextRec; nextRec = null; r
    }
  }

  // ------------------------------------------------------- proto decode

  /** One decoded feature: exactly one of the three lists is non-null —
    * the tf.train.Feature oneof. */
  final case class Decoded(longs: Array[Long], floats: Array[Float],
      blobs: Seq[Array[Byte]])

  private final class ProtoCur(val b: Array[Byte], var p: Int, val end: Int) {
    def varint(): Long = {
      var v = 0L
      var shift = 0
      while (shift < 64) {
        if (p >= end) throw UnsupportedTfRecord("truncated varint")
        val byte = b(p); p += 1
        v |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return v
        shift += 7
      }
      throw UnsupportedTfRecord("varint over 10 bytes")
    }
    def sub(len: Int): ProtoCur = {
      if (len < 0 || p + len > end) throw UnsupportedTfRecord(
        s"length-delimited field of $len bytes overruns the message")
      val c = new ProtoCur(b, p, p + len)
      p += len
      c
    }
    def fixed32(): Int = {
      if (p + 4 > end) throw UnsupportedTfRecord("truncated fixed32")
      val v = le32(b, p); p += 4; v
    }
    def skip(wire: Int): Unit = wire match {
      case 0 => varint()
      case 1 => p += 8
      case 2 => val n = varint().toInt; sub(n)
      case 5 => p += 4
      case w => throw UnsupportedTfRecord(s"proto wire type $w")
    }
    def hasMore: Boolean = p < end
  }

  /** Decode a tf.train.Example payload into feature name -> lists. Proto3
    * allows both packed and expanded repeated scalars — both decode. */
  def parseExample(record: Array[Byte]): Map[String, Decoded] = {
    var out = Map.empty[String, Decoded]
    val ex = new ProtoCur(record, 0, record.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      val (field, wire) = ((tag >>> 3).toInt, (tag & 7).toInt)
      if (field == 1 && wire == 2) // Example.features
        out = out ++ parseFeaturesMsg(ex.sub(ex.varint().toInt))
      else ex.skip(wire)
    }
    out
  }

  private def parseFeature(c: ProtoCur): Decoded = {
    var longs: ArrayBuffer[Long] = null
    var floats: ArrayBuffer[Float] = null
    var blobs: ArrayBuffer[Array[Byte]] = null
    while (c.hasMore) {
      val tag = c.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // BytesList
          val l = c.sub(c.varint().toInt)
          if (blobs == null) blobs = ArrayBuffer.empty
          while (l.hasMore) {
            val ltag = l.varint()
            if ((ltag >>> 3).toInt == 1 && (ltag & 7) == 2) {
              val v = l.sub(l.varint().toInt)
              blobs += java.util.Arrays.copyOfRange(v.b, v.p, v.end)
            } else l.skip((ltag & 7).toInt)
          }
        case (2, 2) => // FloatList
          val l = c.sub(c.varint().toInt)
          if (floats == null) floats = ArrayBuffer.empty
          while (l.hasMore) {
            val ltag = l.varint()
            ((ltag >>> 3).toInt, (ltag & 7).toInt) match {
              case (1, 2) => // packed
                val packed = l.sub(l.varint().toInt)
                while (packed.hasMore)
                  floats += java.lang.Float.intBitsToFloat(packed.fixed32())
              case (1, 5) => // expanded
                floats += java.lang.Float.intBitsToFloat(l.fixed32())
              case (_, w) => l.skip(w)
            }
          }
        case (3, 2) => // Int64List
          val l = c.sub(c.varint().toInt)
          if (longs == null) longs = ArrayBuffer.empty
          while (l.hasMore) {
            val ltag = l.varint()
            ((ltag >>> 3).toInt, (ltag & 7).toInt) match {
              case (1, 2) => // packed
                val packed = l.sub(l.varint().toInt)
                while (packed.hasMore) longs += packed.varint()
              case (1, 0) => longs += l.varint() // expanded
              case (_, w) => l.skip(w)
            }
          }
        case (_, w) => c.skip(w)
      }
    }
    Decoded(
      if (longs == null) null else longs.toArray,
      if (floats == null) null else floats.toArray,
      if (blobs == null) null else blobs.toSeq)
  }

  // ------------------------------------------------------------- reads

  private def shardsOf(spark: SparkSession, pattern: String): Seq[String] =
    shardsWithLen(spark, pattern).map(_._1)

  /** The glob's (path, length) pairs — lengths ride along so planning
    * never re-stats what the listing already returned. */
  private def shardsWithLen(spark: SparkSession,
      pattern: String): Seq[(String, Long)] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val shards = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(st => (st.getPath.toString, st.getLen))
    require(shards.nonEmpty, s"no tfrecord shards match $pattern")
    shards
  }

  private def openShard(c: Configuration, uri: String): java.io.InputStream = {
    val path = new Path(uri)
    val fs = path.getFileSystem(c)
    val raw = fs.open(path)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ =>
        try raw.close() catch { case _: java.io.IOException => }))
    // compression option (tf.io.TFRecordOptions: GZIP or ZLIB) sniffed by
    // content, not extension — a mis-named shard must not garble the
    // framing. A PLAIN shard is recognized positively by its first
    // record's length CRC-32C, so a record whose length bytes happen to
    // spell a zlib/gzip header can never be mis-inflated.
    sniffHead(raw) match {
      case ShardGzip => new GZIPInputStream(raw, 64 * 1024)
      case ShardZlib => new java.util.zip.InflaterInputStream(raw,
        new java.util.zip.Inflater(), 64 * 1024)
      case ShardPlain => raw
    }
  }

  private sealed trait ShardEncoding
  private case object ShardPlain extends ShardEncoding
  private case object ShardGzip extends ShardEncoding
  private case object ShardZlib extends ShardEncoding

  /** Looped 12-byte head probe (a single read() may legally return one
    * byte); leaves the stream positioned at 0. Plain framing wins when
    * the first record's length CRC verifies; otherwise the gzip magic,
    * then the zlib header (0x78 CMF with a valid FCHECK). */
  private def sniffHead(
      raw: org.apache.hadoop.fs.FSDataInputStream): ShardEncoding = {
    val head = new Array[Byte](12)
    var got = 0
    var r = 0
    while (got < 12 && r >= 0) {
      r = raw.read(head, got, 12 - got)
      if (r > 0) got += r
    }
    raw.seek(0L)
    if (got >= 12 && maskedCrc(head, 0, 8) == le32(head, 8)) ShardPlain
    else if (got >= 2 && head(0) == 0x1f.toByte && head(1) == 0x8b.toByte)
      ShardGzip
    else if (got >= 2 && head(0) == 0x78.toByte &&
      ((head(0) & 0xff) * 256 + (head(1) & 0xff)) % 31 == 0) ShardZlib
    else ShardPlain // let the framing CRC produce the directed error
  }

  /** `.idx` sidecars and their (attempt-unique) temp files are never
    * shards themselves. */
  private def isIndexArtifact(uri: String): Boolean =
    uri.endsWith(".idx") || IdxTmpRe.matcher(uri).find()
  private val IdxTmpRe =
    java.util.regex.Pattern.compile("""\.idx(\.\d+)?\.tmp$""")

  private val recordsSchema = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_index", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))

  /** Write the ecosystem-standard `.idx` SIDECAR (the public DALI
    * `tfrecord2idx` convention: one "offset size" text line per record,
    * size covering the 16 framing bytes) for every PLAIN shard matching
    * `pattern` — one task per shard, walked with full CRC verification.
    * GZIP shards are skipped (an index cannot make an unseekable stream
    * splittable). With sidecars present, [[records]]/[[examples]] fan
    * large shards out as record-aligned byte-range tasks. Returns the
    * number of sidecars written. */
  def writeIndex(spark: SparkSession, pattern: String): Int = {
    val shards = shardsOf(spark, pattern).filterNot(isIndexArtifact)
    val tconf = TaskConf(new Configuration(spark.sparkContext.hadoopConfiguration))
    val n = spark.sparkContext.parallelize(shards,
      math.max(1, math.min(shards.size, spark.sparkContext.defaultParallelism)))
      .map { uri =>
        val c = tconf.value
        val path = new Path(uri)
        val fs = path.getFileSystem(c)
        val probe = fs.open(path)
        val compressed = try sniffHead(probe) != ShardPlain finally probe.close()
        if (compressed) 0
        else {
          // attempt-unique temp + rename: speculative/zombie attempts must
          // never interleave writes into one file (the writeShards rule)
          val attempt = Option(org.apache.spark.TaskContext.get())
            .map(_.taskAttemptId()).getOrElse(0L)
          val tmp = new Path(s"$uri.idx.$attempt.tmp")
          val in = fs.open(path)
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit] { _ =>
              try in.close() catch { case _: java.io.IOException => }
              try fs.delete(tmp, false) catch { case _: java.io.IOException => }
            })
          val out = fs.create(tmp, true)
          var off = 0L
          try {
            recordIterator(uri, in, 256L << 20).foreach { rec =>
              val size = rec.length.toLong + 16
              out.write(s"$off $size\n".getBytes("US-ASCII"))
              off += size
            }
          } finally out.close()
          val fin = new Path(s"$uri.idx")
          if (fs.exists(fin)) fs.delete(fin, false)
          if (!fs.rename(tmp, fin)) throw UnsupportedTfRecord(
            s"could not commit index for $uri")
          1
        }
      }.sum().toInt
    n
  }

  /** Record-aligned splits for one shard from its `.idx` sidecar:
    * (startOffset, startOrdinal) per ~`maxSplitBytes`, parsed streaming
    * (O(1) memory however many records). None = no sidecar / too small. */
  private def plannedSplits(fs: org.apache.hadoop.fs.FileSystem, uri: String,
      shardLen: Long, maxSplitBytes: Long): Option[Seq[(Long, Long, Long)]] = {
    val idx = new Path(s"$uri.idx")
    if (shardLen <= maxSplitBytes || !fs.exists(idx)) return None
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(idx), "US-ASCII"))
    try {
      val starts = Seq.newBuilder[(Long, Long)] // (byte offset, ordinal)
      starts += ((0L, 0L))
      var nextBoundary = maxSplitBytes
      var ordinal = 0L
      var tail = 0L // last offset + size: must land exactly on shardLen
      var line = in.readLine()
      while (line != null) {
        if (line.nonEmpty) {
          val sp = line.indexOf(' ')
          // a malformed index silently shifts every later ordinal —
          // directed error, never a silent mis-keying
          val (off, size) =
            try {
              require(sp > 0)
              (line.substring(0, sp).toLong, line.substring(sp + 1).trim.toLong)
            } catch { case _: Exception => throw UnsupportedTfRecord(
              s"$uri.idx: malformed index line '$line' — regenerate with " +
                "writeIndex (stale or interrupted sidecar)") }
          if (off != tail) throw UnsupportedTfRecord(
            s"$uri.idx: record offset $off does not follow $tail — the " +
              "index does not describe this shard (regenerate with writeIndex)")
          if (off >= nextBoundary) {
            starts += ((off, ordinal))
            nextBoundary = off + maxSplitBytes
          }
          tail = off + size
          ordinal += 1
        }
        line = in.readLine()
      }
      if (tail != shardLen) throw UnsupportedTfRecord(
        s"$uri.idx: index covers $tail bytes but the shard is $shardLen — " +
          "STALE sidecar (the shard was rewritten); regenerate with writeIndex")
      val s = starts.result()
      Some(s.zipWithIndex.map { case ((off, ord), i) =>
        (off, if (i + 1 < s.size) s(i + 1)._1 else shardLen, ord)
      })
    } finally in.close()
  }

  /** The (uri, startOffset, endOffset, startOrdinal) task list: one task
    * per shard, or record-aligned ranges when an `.idx` sidecar covers a
    * large plain shard. */
  private def planTasks(spark: SparkSession, shards: Seq[(String, Long)],
      maxSplitBytes: Long): Seq[(String, Long, Long, Long)] = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    shards.filterNot(x => isIndexArtifact(x._1)).flatMap { case (uri, len) =>
      val fs = new Path(uri).getFileSystem(conf)
      plannedSplits(fs, uri, len, maxSplitBytes) match {
        case Some(splits) => splits.map { case (s, e, ord) => (uri, s, e, ord) }
        case None => Seq((uri, 0L, len, 0L))
      }
    }
  }

  /** Stream a shard's records over [start, end): seek once, then walk the
    * framing; `record_index` stays the FILE-level ordinal (stable ids
    * across split plans). */
  private def rangeIterator(c: Configuration, uri: String, start: Long,
      end: Long, fileLen: Long, baseOrdinal: Long,
      maxRecordBytes: Long): Iterator[(Array[Byte], Long)] = {
    // bound the walk BEFORE fetching: boundaries are record-aligned, so a
    // split must never read (or CRC-verify) its neighbor's first record
    def bounded(under: Iterator[Array[Byte]],
        startConsumed: Long): Iterator[(Array[Byte], Long)] =
      new Iterator[(Array[Byte], Long)] {
        private var consumed = startConsumed
        private var i = baseOrdinal
        override def hasNext: Boolean = consumed < end && under.hasNext
        override def next(): (Array[Byte], Long) = {
          val r = under.next()
          consumed += r.length.toLong + 16
          val out = (r, i)
          i += 1
          out
        }
      }
    if (start == 0L) {
      // whole file (or leading range): gzip sniff applies
      val under = recordIterator(uri, openShard(c, uri), maxRecordBytes)
      if (end >= fileLen)
        under.zipWithIndex.map { case (r, i) => (r, i.toLong) }
      else bounded(under, 0L)
    } else {
      val raw = new Path(uri).getFileSystem(c).open(new Path(uri))
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ =>
          try raw.close() catch { case _: java.io.IOException => }))
      raw.seek(start)
      bounded(recordIterator(uri, raw, maxRecordBytes), start)
    }
  }

  /** One row per record across every shard matching `pattern`. One task
    * per shard by default; plain shards with a `.idx` sidecar (see
    * [[writeIndex]]) larger than `maxSplitBytes` fan out record-aligned
    * byte-range tasks — the splittable 100 TB read path. */
  def records(spark: SparkSession, pattern: String, partitions: Int = 0,
      maxRecordBytes: Long = 256L << 20,
      maxSplitBytes: Long = 64L << 20): DataFrame = {
    val shards = shardsWithLen(spark, pattern)
    val lens = shards.toMap
    val tasks = planTasks(spark, shards, maxSplitBytes)
      .map { case (uri, st, en, ord) => (uri, st, en, lens(uri), ord) }
    val tconf = TaskConf(new Configuration(spark.sparkContext.hadoopConfiguration))
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(tasks, nPart).flatMap {
      case (uri, st, en, len, ord) =>
        rangeIterator(tconf.value, uri, st, en, len, ord, maxRecordBytes)
          .map { case (rec, i) => Row(uri, i, rec) }
    }
    spark.createDataFrame(rdd, recordsSchema)
  }

  /** One row per record from whole-file BYTES columns — the streaming
    * surface: `readStream.format("binaryFile")` delivers newly-landed
    * shards as (path, content) rows and this stateless flatMap walks the
    * framing in memory (gzip sniffed per file), so TFRecord deliveries
    * stream through unchanged pipelines. Works on batch DataFrames too. */
  def recordsFrom(df: DataFrame, uriCol: String = "path",
      bytesCol: String = "content",
      maxRecordBytes: Long = 256L << 20): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(col(uriCol).cast("string"), col(bytesCol).cast("binary"))
      .flatMap { r =>
        val uri = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val raw: java.io.InputStream = new java.io.ByteArrayInputStream(bytes)
          val in =
            if (bytes.length >= 2 && bytes(0) == 0x1f.toByte &&
              bytes(1) == 0x8b.toByte) new GZIPInputStream(raw, 64 * 1024)
            else raw
          recordIterator(uri, in, maxRecordBytes)
            .zipWithIndex.map { case (rec, i) => Row(uri, i.toLong, rec) }
        }
      }(org.apache.spark.sql.Encoders.row(recordsSchema))
  }

  private def specField(s: FeatureSpec): StructField = {
    val base: DataType = s.kind match {
      case "int64" => LongType
      case "float" => FloatType
      case "bytes" => BinaryType
      case "string" => StringType
    }
    StructField(s.name,
      if (s.scalar) base else ArrayType(base, containsNull = false),
      nullable = true)
  }

  /** Typed columns from each record's tf.Example features: `file`,
    * `record_index`, then one column per [[FeatureSpec]]. A feature that
    * is absent (or present with the wrong oneof kind) yields null —
    * tf.io.parse_example's default-less behavior, made observable. */
  def examples(spark: SparkSession, pattern: String, spec: Seq[FeatureSpec],
      partitions: Int = 0, maxRecordBytes: Long = 256L << 20,
      maxSplitBytes: Long = 64L << 20): DataFrame = {
    require(spec.nonEmpty, "examples() needs at least one FeatureSpec")
    val shards = shardsWithLen(spark, pattern)
    val lens = shards.toMap
    val tasks = planTasks(spark, shards, maxSplitBytes)
      .map { case (uri, st, en, ord) => (uri, st, en, lens(uri), ord) }
    val tconf = TaskConf(new Configuration(spark.sparkContext.hadoopConfiguration))
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(tasks.size, spark.sparkContext.defaultParallelism))
    val specL = spec // serializable copy for the closure
    val rdd = spark.sparkContext.parallelize(tasks, nPart).flatMap {
      case (uri, st, en, len, ord) =>
      rangeIterator(tconf.value, uri, st, en, len, ord, maxRecordBytes)
        .map { case (rec, i) =>
          val feats = parseExample(rec)
          val cols = specL.map { s =>
            feats.get(s.name) match {
              case None => null
              case Some(d) => s.kind match {
                case "int64" =>
                  if (d.longs == null) null
                  else if (s.scalar) {
                    if (d.longs.isEmpty) null else java.lang.Long.valueOf(d.longs(0))
                  } else d.longs.toSeq
                case "float" =>
                  if (d.floats == null) null
                  else if (s.scalar) {
                    if (d.floats.isEmpty) null else java.lang.Float.valueOf(d.floats(0))
                  } else d.floats.toSeq
                case "bytes" =>
                  if (d.blobs == null) null
                  else if (s.scalar) d.blobs.headOption.orNull
                  else d.blobs
                case "string" =>
                  if (d.blobs == null) null
                  else if (s.scalar)
                    d.blobs.headOption.map(new String(_, "UTF-8")).orNull
                  else d.blobs.map(new String(_, "UTF-8"))
              }
            }
          }
          Row.fromSeq(Seq(uri, i) ++ cols)
        }
    }
    spark.createDataFrame(rdd, StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("record_index", LongType, nullable = false) +:
        specL.map(specField)))
  }

  /** Decode a tf.train.SequenceExample payload: (context features,
    * feature_lists) — SequenceExample{1: Features context,
    * 2: FeatureLists}, FeatureLists{1: map<string, FeatureList>},
    * FeatureList{1: repeated Feature}. Each list entry is one per-STEP
    * Feature (itself a value list). */
  def parseSequenceExample(record: Array[Byte])
      : (Map[String, Decoded], Map[String, Seq[Decoded]]) = {
    var context = Map.empty[String, Decoded]
    val lists = Map.newBuilder[String, Seq[Decoded]]
    val ex = new ProtoCur(record, 0, record.length)
    while (ex.hasMore) {
      val tag = ex.varint()
      ((tag >>> 3).toInt, (tag & 7).toInt) match {
        case (1, 2) => // context: a Features message — reuse the map walk
          val sub = ex.sub(ex.varint().toInt)
          context = context ++ parseFeaturesMsg(sub)
        case (2, 2) => // feature_lists
          val fls = ex.sub(ex.varint().toInt)
          while (fls.hasMore) {
            val ftag = fls.varint()
            if ((ftag >>> 3).toInt == 1 && (ftag & 7) == 2) { // map entry
              val entry = fls.sub(fls.varint().toInt)
              var key: String = null
              val steps = Seq.newBuilder[Decoded]
              while (entry.hasMore) {
                val etag = entry.varint()
                ((etag >>> 3).toInt, (etag & 7).toInt) match {
                  case (1, 2) =>
                    val kc = entry.sub(entry.varint().toInt)
                    key = new String(kc.b, kc.p, kc.end - kc.p, "UTF-8")
                  case (2, 2) => // FeatureList
                    val fl = entry.sub(entry.varint().toInt)
                    while (fl.hasMore) {
                      val ltag = fl.varint()
                      if ((ltag >>> 3).toInt == 1 && (ltag & 7) == 2)
                        steps += parseFeature(fl.sub(fl.varint().toInt))
                      else fl.skip((ltag & 7).toInt)
                    }
                  case (_, w) => entry.skip(w)
                }
              }
              if (key != null) lists += key -> steps.result()
            } else fls.skip((ftag & 7).toInt)
          }
        case (_, w) => ex.skip(w)
      }
    }
    (context, lists.result())
  }

  /** The Features message walk shared by Example and SequenceExample
    * context: map entries of (name, Feature). */
  private def parseFeaturesMsg(features: ProtoCur): Map[String, Decoded] = {
    val out = Map.newBuilder[String, Decoded]
    while (features.hasMore) {
      val ftag = features.varint()
      if ((ftag >>> 3).toInt == 1 && (ftag & 7) == 2) {
        val entry = features.sub(features.varint().toInt)
        var key: String = null
        var value: Decoded = null
        while (entry.hasMore) {
          val etag = entry.varint()
          ((etag >>> 3).toInt, (etag & 7).toInt) match {
            case (1, 2) =>
              val kc = entry.sub(entry.varint().toInt)
              key = new String(kc.b, kc.p, kc.end - kc.p, "UTF-8")
            case (2, 2) => value = parseFeature(entry.sub(entry.varint().toInt))
            case (_, w) => entry.skip(w)
          }
        }
        if (key != null && value != null) out += key -> value
      } else features.skip((ftag & 7).toInt)
    }
    out.result()
  }

  /** Typed columns from tf.train.SequenceExample records: context specs
    * become the same columns [[examples]] emits; each list spec becomes a
    * per-STEP array column — scalar list specs take each step's first
    * value (`array<base>`, the common one-value-per-step layout), non-
    * scalar specs keep each step's whole list (`array<array<base>>`). */
  def sequenceExamples(spark: SparkSession, pattern: String,
      contextSpec: Seq[FeatureSpec], listSpec: Seq[FeatureSpec],
      partitions: Int = 0, maxRecordBytes: Long = 256L << 20): DataFrame = {
    require(contextSpec.nonEmpty || listSpec.nonEmpty,
      "sequenceExamples() needs at least one FeatureSpec")
    val shards = shardsOf(spark, pattern)
    val tconf = TaskConf(new Configuration(spark.sparkContext.hadoopConfiguration))
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(shards.size, spark.sparkContext.defaultParallelism))
    val (ctxL, listL) = (contextSpec, listSpec)
    def scalarOf(s: FeatureSpec, d: Decoded): Any = s.kind match {
      case "int64" =>
        if (d.longs == null || d.longs.isEmpty) null
        else java.lang.Long.valueOf(d.longs(0))
      case "float" =>
        if (d.floats == null || d.floats.isEmpty) null
        else java.lang.Float.valueOf(d.floats(0))
      case "bytes" => if (d.blobs == null) null else d.blobs.headOption.orNull
      case "string" =>
        if (d.blobs == null) null
        else d.blobs.headOption.map(new String(_, "UTF-8")).orNull
    }
    def listOf(s: FeatureSpec, d: Decoded): Any = s.kind match {
      case "int64" => if (d.longs == null) null else d.longs.toSeq
      case "float" => if (d.floats == null) null else d.floats.toSeq
      case "bytes" => d.blobs
      case "string" =>
        if (d.blobs == null) null else d.blobs.map(new String(_, "UTF-8"))
    }
    val rdd = spark.sparkContext.parallelize(shards, nPart).flatMap { uri =>
      recordIterator(uri, openShard(tconf.value, uri), maxRecordBytes)
        .zipWithIndex.map { case (rec, i) =>
          val (ctx, lists) = parseSequenceExample(rec)
          val ctxCols = ctxL.map { s =>
            ctx.get(s.name) match {
              case None => null
              case Some(d) => if (s.scalar) scalarOf(s, d) else listOf(s, d)
            }
          }
          val listCols = listL.map { s =>
            lists.get(s.name) match {
              case None => null
              case Some(steps) =>
                if (s.scalar) steps.map(scalarOf(s, _))
                else steps.map(listOf(s, _))
            }
          }
          Row.fromSeq(Seq(uri, i.toLong) ++ ctxCols ++ listCols)
        }
    }
    def listField(s: FeatureSpec): StructField = {
      val inner = specField(s) // scalar -> base, else array<base>
      StructField(s.name, ArrayType(inner.dataType, containsNull = true),
        nullable = true)
    }
    spark.createDataFrame(rdd, StructType(
      StructField("file", StringType, nullable = false) +:
        StructField("record_index", LongType, nullable = false) +:
        (ctxL.map(specField) ++ listL.map(listField))))
  }

  /** Encode one tf.train.SequenceExample: context features as in
    * [[encodeExample]], plus per-name step lists (each step a value
    * list of one runtime type). */
  def encodeSequenceExample(context: Seq[(String, Seq[Any])],
      lists: Seq[(String, Seq[Seq[Any]])]): Array[Byte] = {
    val ctxMsg =
      if (context.isEmpty) Array.empty[Byte]
      else {
        // encodeExample emits Example{1: Features}; its payload body IS a
        // Features message, which SequenceExample.context (field 1) reuses
        encodeExample(context)
      }
    val listEntries = lists.map { case (name, steps) =>
      val fl = steps.flatMap(step => lenDelim(1, featureBytes(name, step))).toArray
      lenDelim(1, lenDelim(1, name.getBytes("UTF-8")) ++ lenDelim(2, fl))
    }
    ctxMsg ++ lenDelim(2, listEntries.flatten.toArray)
  }

  /** The Feature message body for one value list (shared by Example map
    * entries and FeatureList steps). */
  private def featureBytes(name: String, values: Seq[Any]): Array[Byte] =
    values.headOption match {
      case Some(_: Long) | None =>
        lenDelim(3, lenDelim(1,
          values.flatMap(v => varintBytes(v.asInstanceOf[Long])).toArray))
      case Some(_: Float) =>
        val packed = new Array[Byte](values.size * 4)
        values.zipWithIndex.foreach { case (v, i) =>
          val bits = java.lang.Float.floatToIntBits(v.asInstanceOf[Float])
          packed(i * 4) = bits.toByte
          packed(i * 4 + 1) = (bits >>> 8).toByte
          packed(i * 4 + 2) = (bits >>> 16).toByte
          packed(i * 4 + 3) = (bits >>> 24).toByte
        }
        lenDelim(2, lenDelim(1, packed))
      case Some(_: Array[Byte]) =>
        lenDelim(1, values.flatMap(v =>
          lenDelim(1, v.asInstanceOf[Array[Byte]])).toArray)
      case Some(_: String) =>
        lenDelim(1, values.flatMap(v =>
          lenDelim(1, v.asInstanceOf[String].getBytes("UTF-8"))).toArray)
      case Some(other) => throw UnsupportedTfRecord(
        s"feature '$name': unencodable value class ${other.getClass.getName}")
    }

  // ------------------------------------------------------------ writes

  private def varintBytes(v: Long): Array[Byte] = {
    val out = new ArrayBuffer[Byte](10)
    var x = v
    var more = true
    while (more) {
      val b = (x & 0x7f).toInt
      x = x >>> 7
      more = x != 0
      out += (if (more) (b | 0x80) else b).toByte
    }
    out.toArray
  }

  private def tagged(field: Int, wire: Int, body: Array[Byte]): Array[Byte] =
    varintBytes(((field.toLong << 3) | wire)) ++ body

  private def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
    tagged(field, 2, varintBytes(body.length.toLong) ++ body)

  /** Encode one tf.train.Example. Values per feature, by runtime type:
    * Seq[Long] -> Int64List, Seq[Float] -> FloatList (packed, as the
    * TensorFlow encoder emits), Seq[Array[Byte]] -> BytesList,
    * Seq[String] -> UTF-8 BytesList. */
  def encodeExample(features: Seq[(String, Seq[Any])]): Array[Byte] = {
    val entries = features.map { case (name, values) =>
      lenDelim(1, lenDelim(1, name.getBytes("UTF-8")) ++
        lenDelim(2, featureBytes(name, values)))
    }
    lenDelim(1, entries.flatten.toArray)
  }

  private def writeRecord(o: java.io.OutputStream, rec: Array[Byte]): Unit = {
    val head = new Array[Byte](8)
    var i = 0
    while (i < 8) { head(i) = ((rec.length.toLong >>> (8 * i)) & 0xff).toByte; i += 1 }
    o.write(head)
    putLe32(o, maskedCrc(head, 0, 8))
    o.write(rec)
    putLe32(o, maskedCrc(rec, 0, rec.length))
  }

  /** Fixture/export writer: one shard from in-memory records. */
  def write(path: String, recordsSeq: Seq[Array[Byte]], gzip: Boolean = false,
      conf: Configuration = new Configuration(),
      zlib: Boolean = false): Unit = {
    require(!(gzip && zlib), "gzip and zlib are exclusive TFRecordOptions")
    val p = new Path(path)
    val raw = p.getFileSystem(conf).create(p, true)
    val out: java.io.OutputStream =
      if (gzip) new GZIPOutputStream(raw, 64 * 1024)
      else if (zlib) new java.util.zip.DeflaterOutputStream(raw,
        new java.util.zip.Deflater(), 64 * 1024)
      else raw
    try recordsSeq.foreach(writeRecord(out, _)) finally out.close()
  }

  /** Distributed TFRecord export: one shard per partition (repartition
    * upstream to size shards), rows encoded to tf.Examples through `spec`,
    * task-attempt temp + rename commit so speculative attempts never
    * interleave. Returns the shard count. */
  def writeShards(df: DataFrame, dir: String, spec: Seq[FeatureSpec],
      gzip: Boolean = false): Int = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val ext = if (gzip) "tfrecord.gz" else "tfrecord"
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(conf)
    // clear stale shards: a re-run with fewer partitions must not leave
    // higher-numbered shards behind for the read glob
    Seq("tfrecord", "tfrecord.gz", "tfrecord.idx", "tfrecord.idx.*.tmp")
      .foreach { e =>
        Option(dfs.globStatus(new Path(s"$dir/shard-*.$e")))
          .foreach(_.foreach(st => dfs.delete(st.getPath, false)))
      }
    val tconf = TaskConf(conf)
    val specL = spec
    // cast each column to the spec's exact element type up front, so the
    // partition encoder sees the one runtime shape it expects
    val rows = df.select(spec.map { s =>
      val t = s.kind match {
        case "int64" => "bigint"
        case "float" => "float"
        case "bytes" => "binary"
        case "string" => "string"
      }
      (if (s.scalar) col(s.name).cast(t)
       else col(s.name).cast(s"array<$t>")).as(s.name)
    }: _*)
    val rdd = rows.rdd // bind ONCE: AQE must not re-plan between count and run
    val n = rdd.getNumPartitions
    rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val c = tconf.value
      val finalPath = new Path(f"$dir/shard-$pid%05d.$ext")
      val tmp = new Path(f"$dir/.shard-$pid%05d.${tc.taskAttemptId()}%d.tmp")
      val fs = finalPath.getFileSystem(c)
      val raw = fs.create(tmp, true)
      val out: java.io.OutputStream =
        if (gzip) new GZIPOutputStream(raw, 64 * 1024) else raw
      try {
        it.foreach { r =>
          val feats = specL.zipWithIndex.flatMap { case (s, i) =>
            if (r.isNullAt(i)) None
            else Some(s.name -> (s.kind match {
              case "int64" =>
                if (s.scalar) Seq(r.getLong(i))
                else r.getSeq[Long](i)
              case "float" =>
                if (s.scalar) Seq(r.getFloat(i))
                else r.getSeq[Float](i)
              case "bytes" =>
                if (s.scalar) Seq(r.getAs[Array[Byte]](i))
                else r.getSeq[Array[Byte]](i)
              case "string" =>
                if (s.scalar) Seq(r.getString(i))
                else r.getSeq[String](i)
            }))
          }
          writeRecord(out, encodeExample(feats))
        }
      } finally out.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        fs.delete(tmp, false)
        throw UnsupportedTfRecord(s"could not commit shard $pid to $finalPath")
      }
    }
    n
  }
}
