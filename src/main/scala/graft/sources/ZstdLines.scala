package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.sources.zarr.Zstd

/** Zstd-compressed line corpora (`.jsonl.zst` / `.txt.zst`) — the format
  * most public LLM text corpora actually ship in (The Pile, RedPajama,
  * Dolma, OSCAR all distribute zstd-compressed JSON lines). Spark's text
  * reader can't open them without a native Hadoop zstd codec; this source
  * decodes through the repo's own RFC 8878 decoder (`zarr/Zstd`), so the
  * path needs zero native code.
  *
  * Two layouts, sniffed per file:
  *
  *  - **zstd seekable format** (the public spec in facebook/zstd
  *    `contrib/seekable_format/zstd_seekable_compression_format.md`): a
  *    final skippable frame (magic 0x184D2A5E) carries a per-frame seek
  *    table — (compressed size, decompressed size) for every data frame —
  *    closed by a 9-byte footer (`frame count, descriptor, 0x8F92EAB1`).
  *    Consecutive frames group into ~`targetSpanBytes` spans, ONE TASK PER
  *    SPAN: this is the splittable 100 TB read path, same shape as a
  *    parquet row-group or Zarr chunk-grid scan. Tasks re-read the (tiny)
  *    seek table themselves, so the plan ships only (uri, firstFrame,
  *    frameCount) triples, never per-frame offsets.
  *
  *  - plain (possibly multi-frame) zstd streams: frames are not
  *    independently addressable, so the file is ONE task walking
  *    concatenated frames — exactly what `zstd file.jsonl` or a python
  *    `ZstdCompressor` stream produces. Skippable frames interleave freely.
  *
  * Line ownership across span boundaries is exact, not heuristic: a line
  * belongs to the span containing its FIRST byte. A task whose span starts
  * at decompressed offset S > 0 decodes the single preceding frame to see
  * whether byte S-1 is '\n' (a line starts at S) or not (the first partial
  * line belongs upstream and is skipped); a line that starts inside the
  * span but ends past it is finished by decoding subsequent frames. Every
  * row carries the line's global decompressed byte offset — the same
  * address the uncompressed file would give.
  *
  * The reference ingests newline-delimited JSON through Beam's TextIO
  * (weather_mv reads BigQuery-bound rows); this source is the Spark-native
  * equivalent for the compressed-corpus case.
  */
object ZstdLines {

  final case class UnsupportedZstdLines(msg: String)
      extends RuntimeException(s"unsupported zstd-lines file: $msg")

  private def bad(msg: String): Nothing = throw UnsupportedZstdLines(msg)

  val schema: StructType = StructType(Seq(
    StructField("file_uri", StringType, nullable = false),
    // decompressed byte offset of the line start (the address the
    // uncompressed file would have) — a stable unique line id
    StructField("offset", LongType, nullable = false),
    StructField("value", StringType, nullable = false)))

  private val SeekableMagic = 0x8F92EAB1
  private val SeekTableSkippableMagic = 0x184D2A5E
  private val MaxFrameBytes = 1 << 30

  /** One data frame from the seek table: compressed span within the file
    * and its decompressed size/global offset. */
  private final case class FrameEntry(
      compOff: Long, compLen: Int, decompOff: Long, decompLen: Int)

  /** ------------------------------------------------------------- reader */

  /** One row per text line across every file matching `pattern` (glob).
    * Seekable files fan out one task per ~`targetSpanBytes` of
    * decompressed data; plain streams read as one task per file.
    * `dictPath` names an RFC 8878 dictionary (`zstd --train` output or raw
    * priming content) applied to every frame — the layout of dict-trained
    * corpus shards; parsed once on the driver and shipped in the task
    * closure (dictionaries are KBs). */
  def read(spark: SparkSession, pattern: String,
      targetSpanBytes: Long = 64L << 20, partitions: Int = 0,
      dictPath: Option[String] = None): DataFrame = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val dict: Zstd.Dict = dictPath.map { dp =>
      val dpPath = new Path(dp)
      val dfs = dpPath.getFileSystem(conf)
      val len = dfs.getFileStatus(dpPath).getLen
      if (len > (8L << 20)) bad(s"dictionary $dp is ${len} bytes (cap 8 MiB)")
      val buf = new Array[Byte](len.toInt)
      val in = dfs.open(dpPath)
      try in.readFully(0, buf) finally in.close()
      Zstd.parseDictionary(buf)
    }.orNull
    val p = new Path(pattern)
    val fs = p.getFileSystem(conf)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Nil)
      .filter(_.isFile).map(st => (st.getPath.toString, st.getLen))
    require(files.nonEmpty, s"no zstd-lines files match $pattern")
    val tconf = TaskConf(conf)

    // plan: (uri, firstFrameIdx, frameCount); (-1, -1) = whole-file stream
    val spans: Seq[(String, Int, Int)] = files.flatMap { case (uri, len) =>
      if (len == 0) Nil
      else readSeekTable(conf, uri, len) match {
        case None => Seq((uri, -1, -1))
        case Some(frames) =>
          if (frames.isEmpty) Nil
          else {
            val out = Seq.newBuilder[(String, Int, Int)]
            var first = 0
            var bytes = 0L
            var i = 0
            while (i < frames.length) {
              bytes += frames(i).decompLen
              if (bytes >= targetSpanBytes || i == frames.length - 1) {
                out += ((uri, first, i - first + 1))
                first = i + 1
                bytes = 0L
              }
              i += 1
            }
            out.result()
          }
      }
    }
    if (spans.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(spans.size,
        spark.sparkContext.defaultParallelism))
    val rdd = spark.sparkContext.parallelize(spans, nPart).flatMap {
      case (uri, firstFrame, frameCount) =>
        RangedIO.rows(uri, tconf) { in =>
          val fileLen = new Path(uri).getFileSystem(tconf.value)
            .getFileStatus(new Path(uri)).getLen
          if (firstFrame < 0)
            streamLines(uri, in.readFully(_, _, _, _), fileLen, dict)
          else {
            val frames = readSeekTableWith(in.readFully(_, _, _, _), fileLen)
              .getOrElse(bad(s"$uri: seek table vanished between plan and task"))
            spanLines(uri, in.readFully(_, _, _, _), frames, firstFrame,
              frameCount, dict)
          }
        }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** One row per line from whole-file BYTES columns — the streaming
    * surface: `readStream.format("binaryFile")` delivers newly-landed
    * `.jsonl.zst` shards as (path, content) rows and this stateless
    * flatMap walks their frames in memory (a trailing seekable-format
    * seek table is skipped like any skippable frame), so corpus
    * deliveries stream through unchanged pipelines. Works on batch
    * DataFrames too. `dictBytes` applies an RFC 8878 dictionary to every
    * frame (dict-trained shard deliveries). */
  def linesFrom(df: DataFrame, uriCol: String = "path",
      bytesCol: String = "content",
      dictBytes: Option[Array[Byte]] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    val dict = dictBytes.map(Zstd.parseDictionary).orNull
    df.select(col(uriCol).cast("string"), col(bytesCol).cast("binary"))
      .flatMap { r =>
        val uri = r.getString(0)
        val bytes = r.getAs[Array[Byte]](1)
        if (bytes == null || bytes.isEmpty) Iterator.empty
        else {
          val readAt = (pos: Long, buf: Array[Byte], off: Int, len: Int) =>
            System.arraycopy(bytes, pos.toInt, buf, off, len)
          streamLines(uri, readAt, bytes.length.toLong, dict)
        }
      }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** Parse the seekable-format footer + table, or None when the file is a
    * plain stream. Driver-side convenience over [[readSeekTableWith]]. */
  private def readSeekTable(conf: Configuration, uri: String,
      fileLen: Long): Option[Array[FrameEntry]] = {
    val path = new Path(uri)
    val fs = path.getFileSystem(conf)
    val in = fs.open(path)
    try readSeekTableWith(in.readFully(_, _, _, _), fileLen)
    finally in.close()
  }

  private def readSeekTableWith(
      readAt: (Long, Array[Byte], Int, Int) => Unit,
      fileLen: Long): Option[Array[FrameEntry]] = {
    if (fileLen < 17) return None // skippable header 8 + footer 9
    val footer = new Array[Byte](9)
    readAt(fileLen - 9, footer, 0, 9)
    if (le32(footer, 5) != SeekableMagic) return None
    val nFrames = le32(footer, 0)
    val desc = footer(4) & 0xff
    if ((desc & 0x7c) != 0)
      bad(f"seek-table descriptor reserved bits set (0x$desc%02x)")
    val withChecksum = (desc & 0x80) != 0
    val entrySize = if (withChecksum) 12 else 8
    if (nFrames < 0 || nFrames > ((fileLen - 17) / entrySize))
      bad(s"seek table claims $nFrames frames in a $fileLen-byte file")
    val tablePayload = nFrames.toLong * entrySize + 9
    val tableStart = fileLen - 8 - tablePayload
    if (tableStart < 0) bad("seek table larger than the file")
    val head = new Array[Byte](8)
    readAt(tableStart, head, 0, 8)
    if (le32(head, 0) != SeekTableSkippableMagic)
      bad("footer names a seek table but the skippable magic is absent")
    if ((le32(head, 4) & 0xffffffffL) != tablePayload)
      bad(s"seek-table frame size disagrees with the footer frame count")
    if (nFrames.toLong * entrySize > Int.MaxValue - 8)
      bad(s"seek table with $nFrames frames exceeds a JVM array")
    val entries = new Array[Byte](nFrames * entrySize)
    readAt(tableStart + 8, entries, 0, entries.length)
    val out = Array.newBuilder[FrameEntry]
    var compOff = 0L
    var decompOff = 0L
    var i = 0
    while (i < nFrames) {
      val cLen = le32(entries, i * entrySize)
      val dLen = le32(entries, i * entrySize + 4)
      if (cLen < 0 || dLen < 0)
        bad(s"seek-table entry $i exceeds 2 GiB (c=$cLen d=$dLen)")
      if (dLen > 0) out += FrameEntry(compOff, cLen, decompOff, dLen)
      compOff += cLen & 0xffffffffL
      decompOff += dLen & 0xffffffffL
      i += 1
    }
    if (compOff != tableStart)
      bad(s"seek-table compressed sizes sum to $compOff, data region is $tableStart")
    Some(out.result())
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Decode one seek-table frame via a positioned read. */
  private def decodeFrame(readAt: (Long, Array[Byte], Int, Int) => Unit,
      fe: FrameEntry, dict: Zstd.Dict): Array[Byte] = {
    if (fe.decompLen > MaxFrameBytes)
      bad(s"frame decompresses to ${fe.decompLen} bytes (cap $MaxFrameBytes)")
    val comp = new Array[Byte](fe.compLen)
    readAt(fe.compOff, comp, 0, fe.compLen)
    val chunk =
      Zstd.decompress(comp, 0, fe.compLen, sizeHint = fe.decompLen, dict = dict)
    // span ownership is computed from the seek table's decompressed sizes;
    // a frame whose actual size disagrees would silently drift chunkGlobal
    // and drop or duplicate lines across tasks — fail directed instead
    if (chunk.length != fe.decompLen)
      bad(s"frame at ${fe.compOff} decoded ${chunk.length} bytes, " +
        s"seek table says ${fe.decompLen}")
    chunk
  }

  /** Lines owned by frames [firstFrame, firstFrame+frameCount) — see the
    * ownership rule in the object doc. */
  private def spanLines(uri: String,
      readAt: (Long, Array[Byte], Int, Int) => Unit,
      frames: Array[FrameEntry], firstFrame: Int, frameCount: Int,
      dict: Zstd.Dict = null): Iterator[Row] = {
    val spanStart = frames(firstFrame).decompOff
    val lastIdx = firstFrame + frameCount - 1
    val spanEnd = frames(lastIdx).decompOff + frames(lastIdx).decompLen

    // does a line start exactly at spanStart? (previous frame's last byte)
    val freshLineAtStart = spanStart == 0 || {
      val prev = decodeFrame(readAt, frames(firstFrame - 1), dict)
      prev.length == 0 || prev(prev.length - 1) == '\n'
    }

    new Iterator[Row] {
      private var frameIdx = firstFrame
      private var chunk: Array[Byte] = null
      private var chunkPos = 0
      private var chunkGlobal = 0L  // global offset of chunk(0)
      private var lineStart = spanStart
      private val carry = new java.io.ByteArrayOutputStream()
      private var skippedHead = freshLineAtStart
      private var done = false
      private var pending: Row = null

      private def loadNext(): Boolean = {
        if (frameIdx >= frames.length) return false
        val fe = frames(frameIdx)
        chunk = decodeFrame(readAt, fe, dict)
        chunkGlobal = fe.decompOff
        chunkPos = 0
        frameIdx += 1
        true
      }

      private def advance(): Unit = {
        while (pending == null && !done) {
          if (chunk == null || chunkPos >= chunk.length) {
            // past the span and nothing carried: the remaining lines all
            // start in later spans — stop without touching their frames
            val pastSpan = chunkGlobal + (if (chunk == null) 0 else chunk.length) >= spanEnd
            if (pastSpan && carry.size() == 0 && skippedHead) { done = true; return }
            if (!loadNext()) {
              // EOF: an unterminated final line is owned by its starter
              if (carry.size() > 0 && skippedHead && lineStart < spanEnd) {
                pending = Row(uri, lineStart,
                  new String(carry.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
                carry.reset()
              }
              done = true
              return
            }
          }
          val nl = findNewline(chunk, chunkPos, '\n')
          if (nl < 0) {
            if (skippedHead) carry.write(chunk, chunkPos, chunk.length - chunkPos)
            chunkPos = chunk.length
          } else {
            if (!skippedHead) {
              // the partial head line belongs to the upstream span
              skippedHead = true
              lineStart = chunkGlobal + nl + 1
              chunkPos = nl + 1
              // head line ran past the span: nothing here is ours
              if (lineStart >= spanEnd) { done = true; return }
            } else {
              carry.write(chunk, chunkPos, nl - chunkPos)
              val bytes = carry.toByteArray
              carry.reset()
              val start = lineStart
              lineStart = chunkGlobal + nl + 1
              chunkPos = nl + 1
              if (start < spanEnd) {
                val s = new String(stripCr(bytes),
                  java.nio.charset.StandardCharsets.UTF_8)
                pending = Row(uri, start, s)
              } else { done = true; return } // started past the span: not ours
            }
          }
        }
      }

      override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
  }

  /** Whole-file walk over concatenated frames (plain zstd streams). */
  private def streamLines(uri: String,
      readAt: (Long, Array[Byte], Int, Int) => Unit,
      fileLen: Long, dict: Zstd.Dict = null): Iterator[Row] = {
    if (fileLen > MaxFrameBytes)
      bad(s"$uri: ${fileLen}-byte non-seekable stream exceeds the " +
        s"single-task cap ($MaxFrameBytes); recompress with a seek table " +
        "(ZstdLines.writeShards) for splittable reads")
    val comp = new Array[Byte](fileLen.toInt)
    readAt(0L, comp, 0, comp.length)
    new Iterator[Row] {
      private var off = 0
      private var chunk: Array[Byte] = null
      private var chunkPos = 0
      private var lineStart = 0L
      private var emitted = 0L
      private val carry = new java.io.ByteArrayOutputStream()
      private var done = false
      private var pending: Row = null

      private def loadNext(): Boolean = {
        off += Zstd.skippableRunLength(comp, off, comp.length)
        if (off >= comp.length) return false
        val (data, next) = Zstd.decompressFrameAt(comp, off, comp.length, dict = dict)
        off = next
        chunk = data
        chunkPos = 0
        true
      }

      private def advance(): Unit = {
        while (pending == null && !done) {
          if (chunk == null || chunkPos >= chunk.length) {
            if (!loadNext()) {
              if (carry.size() > 0) {
                pending = Row(uri, lineStart,
                  new String(carry.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
                carry.reset()
              }
              done = true
              return
            }
          }
          val nl = findNewline(chunk, chunkPos, '\n')
          if (nl < 0) {
            carry.write(chunk, chunkPos, chunk.length - chunkPos)
            emitted += chunk.length - chunkPos
            chunkPos = chunk.length
          } else {
            carry.write(chunk, chunkPos, nl - chunkPos)
            emitted += nl - chunkPos + 1
            chunkPos = nl + 1
            val bytes = carry.toByteArray
            carry.reset()
            val start = lineStart
            lineStart = emitted
            pending = Row(uri, start, new String(stripCr(bytes),
              java.nio.charset.StandardCharsets.UTF_8))
          }
        }
      }

      override def hasNext: Boolean = { if (pending == null) advance(); pending != null }
      override def next(): Row = {
        if (!hasNext) throw new NoSuchElementException
        val r = pending; pending = null; r
      }
    }
  }

  private def findNewline(b: Array[Byte], from: Int, ch: Char): Int = {
    var i = from
    while (i < b.length) { if (b(i) == ch) return i; i += 1 }
    -1
  }

  private def stripCr(b: Array[Byte]): Array[Byte] =
    if (b.length > 0 && b(b.length - 1) == '\r')
      java.util.Arrays.copyOf(b, b.length - 1)
    else b

  /** ------------------------------------------------------------- writer */

  /** DISTRIBUTED export: each input partition writes one seekable
    * `<prefix>-NNNNN.jsonl.zst` shard under `dir`, one line per row of
    * `col`, frames cut at line boundaries every ~`frameBytes` of
    * decompressed data (so a later read at the same granularity never
    * straddles). Returns the shard count. Repartition upstream to size
    * shards. */
  def writeShards(df: DataFrame, dir: String, col: String = "value",
      prefix: String = "part", frameBytes: Int = 4 << 20): Int = {
    import org.apache.spark.sql.functions.{col => c}
    val spark = df.sparkSession
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    val dirPath = new Path(dir)
    val dfs = dirPath.getFileSystem(conf)
    Option(dfs.globStatus(new Path(s"$dir/$prefix-*.jsonl.zst")))
      .foreach(_.foreach(st => dfs.delete(st.getPath, false)))
    val tconf = TaskConf(conf)
    val rows = df.select(c(col).cast("string"))
    val rdd = rows.rdd
    val n = rdd.getNumPartitions
    rdd.foreachPartition { it =>
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val cc = tconf.value
      val finalPath = new Path(f"$dir/$prefix-$pid%05d.jsonl.zst")
      val tmp = new Path(f"$dir/.$prefix-$pid%05d.${tc.taskAttemptId()}%d.tmp")
      val fs = finalPath.getFileSystem(cc)
      val out = fs.create(tmp, true)
      try {
        val frames = Seq.newBuilder[(Int, Int)]
        val buf = new java.io.ByteArrayOutputStream(frameBytes + 4096)
        def flush(): Unit = if (buf.size() > 0) {
          val data = buf.toByteArray
          buf.reset()
          val comp = Zstd.compressStore(data)
          out.write(comp)
          frames += ((comp.length, data.length))
        }
        it.foreach { r =>
          val s = r.getString(0)
          if (s == null) bad(s"null line in shard $pid")
          if (s.indexOf('\n') >= 0)
            bad(s"embedded newline in shard $pid — lines must be single-line " +
              "(JSON-encode multi-line text first)")
          buf.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          buf.write('\n')
          if (buf.size() >= frameBytes) flush()
        }
        flush()
        out.write(seekTableBytes(frames.result()))
      } finally out.close()
      if (fs.exists(finalPath)) fs.delete(finalPath, false)
      if (!fs.rename(tmp, finalPath)) {
        fs.delete(tmp, false)
        bad(s"could not commit shard $pid to $finalPath")
      }
    }
    n
  }

  /** Fixture/driver-side writer: one seekable file of `lines`. */
  def write(path: String, lines: Seq[String], frameBytes: Int = 4 << 20,
      conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try {
      val frames = Seq.newBuilder[(Int, Int)]
      val buf = new java.io.ByteArrayOutputStream(frameBytes + 4096)
      def flush(): Unit = if (buf.size() > 0) {
        val data = buf.toByteArray
        buf.reset()
        val comp = Zstd.compressStore(data)
        out.write(comp)
        frames += ((comp.length, data.length))
      }
      lines.foreach { s =>
        buf.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        buf.write('\n')
        if (buf.size() >= frameBytes) flush()
      }
      flush()
      out.write(seekTableBytes(frames.result()))
    } finally out.close()
  }

  /** The seekable-format trailer: skippable frame + entries + footer. */
  private def seekTableBytes(frames: Seq[(Int, Int)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(frames.size * 8 + 32)
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w32(v: Int): Unit = { w8(v); w8(v >>> 8); w8(v >>> 16); w8(v >>> 24) }
    w32(SeekTableSkippableMagic)
    w32(frames.size * 8 + 9)
    frames.foreach { case (cLen, dLen) => w32(cLen); w32(dLen) }
    w32(frames.size)
    w8(0) // descriptor: no per-frame checksums
    w32(SeekableMagic)
    out.toByteArray
  }
}
