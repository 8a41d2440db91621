package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.CRC32

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.json4s._
import org.json4s.jackson.JsonMethods

/** The Apache Iceberg PUFFIN container (public spec:
  * iceberg.apache.org/puffin-spec) — the indexed-blob sidecar file that
  * Iceberg v3 stores deletion vectors (and statistics sketches) in.
  *
  * Layout: `Magic("PFA1") · Blob* · Magic · FooterPayload(JSON) ·
  * FooterPayloadSize(i32 LE) · Flags(4 bytes) · Magic`. The footer JSON
  * lists each blob's `type`, `fields`, `snapshot-id`, `sequence-number`,
  * `offset`, `length`, optional `compression-codec`, and `properties`.
  *
  * The `deletion-vector-v1` blob type holds one data file's deleted row
  * positions as `i32 BE length · magic D1 D3 39 64 · 64-bit roaring
  * bitmap (portable) · i32 BE CRC-32 of magic+bitmap` — byte-identical
  * framing to Delta Lake's deletion-vector file blobs (table-spec
  * "Deletion vectors"), so decoding reuses [[DeletionVector]] verbatim.
  *
  * Reader half serves v3 merge-on-read ([[IcebergTable]]); the writer
  * half lets specs and the table writer author real Puffin fixtures.
  * Directed guards: bad magic, compressed footer (flag bit 0), blob
  * compression codecs. */
object Puffin {
  final case class BadPuffin(msg: String) extends RuntimeException(msg)

  private val Magic = Array[Byte](0x50, 0x46, 0x41, 0x31) // "PFA1"

  private implicit val formats: Formats = DefaultFormats

  /** One footer blob entry. `offset`/`length` locate the raw blob bytes
    * in the file. */
  final case class BlobMeta(tpe: String, fields: Seq[Int],
      snapshotId: Long, sequenceNumber: Long, offset: Long, length: Long,
      compression: Option[String], properties: Map[String, String])

  // ---------------------------------------------------------------- read

  /** Parse the footer: (blobs, file properties). One ranged read of the
    * file tail — O(footer) IO, no blob bytes touched. */
  def footer(path: String, conf: Configuration)
      : (Seq[BlobMeta], Map[String, String]) = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    if (len < 20) throw BadPuffin(s"$path: ${len}B is too short for Puffin")
    val in = fs.open(p)
    try {
      val tail = new Array[Byte](12)
      in.readFully(len - 12, tail)
      if (!tail.drop(8).sameElements(Magic)) throw BadPuffin(
        s"$path: trailing magic missing — not a Puffin file")
      val flags = tail.slice(4, 8)
      if ((flags(0) & 0x01) != 0) throw BadPuffin(
        s"$path: compressed footer payload (flag bit 0) is not implemented")
      val payloadSize = ByteBuffer.wrap(tail, 0, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt
      if (payloadSize < 2 || payloadSize > len - 20) throw BadPuffin(
        s"$path: footer payload size $payloadSize out of range")
      val head = new Array[Byte](4)
      in.readFully(0, head)
      if (!head.sameElements(Magic)) throw BadPuffin(
        s"$path: leading magic missing — not a Puffin file")
      // the footer's own leading magic sits just before the payload
      val fmagic = new Array[Byte](4)
      in.readFully(len - 12 - payloadSize - 4, fmagic)
      if (!fmagic.sameElements(Magic)) throw BadPuffin(
        s"$path: footer magic missing before the payload")
      val payload = new Array[Byte](payloadSize)
      in.readFully(len - 12 - payloadSize, payload)
      val j = JsonMethods.parse(new String(payload, "UTF-8"))
      val blobs = (j \ "blobs").extractOpt[Seq[JValue]].getOrElse(Nil).map { b =>
        BlobMeta(
          (b \ "type").extract[String],
          (b \ "fields").extractOpt[Seq[Int]].getOrElse(Nil),
          (b \ "snapshot-id").extractOpt[Long].getOrElse(-1L),
          (b \ "sequence-number").extractOpt[Long].getOrElse(-1L),
          (b \ "offset").extract[Long],
          (b \ "length").extract[Long],
          (b \ "compression-codec").extractOpt[String],
          (b \ "properties").extractOpt[Map[String, String]]
            .getOrElse(Map.empty))
      }
      val props = (j \ "properties").extractOpt[Map[String, String]]
        .getOrElse(Map.empty)
      (blobs, props)
    } finally in.close()
  }

  /** Blob bytes for one footer entry, decompressed when the footer
    * declares a codec. Deletion vectors are stored uncompressed per the
    * table spec; STATS blobs (the datasketches family) default to
    * `zstd`, decoded through the in-repo RFC 8878 implementation. `lz4`
    * stays a directed error. */
  def readBlob(path: String, meta: BlobMeta, conf: Configuration)
      : Array[Byte] = {
    require(meta.length <= Int.MaxValue, s"$path: ${meta.length}B blob")
    val p = new Path(path)
    val in = p.getFileSystem(conf).open(p)
    val raw =
      try {
        val out = new Array[Byte](meta.length.toInt)
        in.readFully(meta.offset, out)
        out
      } finally in.close()
    meta.compression.filter(_.nonEmpty) match {
      case None => raw
      case Some("zstd") =>
        graft.sources.zarr.Zstd.decompress(raw, 0, raw.length)
      case Some(other) => throw BadPuffin(
        s"$path: blob compression-codec '$other' is not implemented " +
          "(zstd or uncompressed only)")
    }
  }

  // --------------------------------------------------------------- write

  /** Frame sorted deleted-row positions as a `deletion-vector-v1` blob:
    * `i32 BE length · (magic + portable bitmap) · i32 BE CRC-32`. */
  def dvBlob(positions: Array[Long]): Array[Byte] = {
    val data = DeletionVector.serialize(positions) // LE magic + bitmaps
    val out = ByteBuffer.allocate(4 + data.length + 4)
    out.putInt(data.length)
    out.put(data)
    val crc = new CRC32(); crc.update(data)
    out.putInt(crc.getValue.toInt)
    out.array()
  }

  /** A to-be-written blob: metadata (offset/length filled in by
    * [[writeFile]]) plus its bytes — ALREADY compressed when
    * `compression` names a codec (the writer is byte-passthrough; the
    * footer records the label). */
  final case class Blob(tpe: String, fields: Seq[Int], snapshotId: Long,
      sequenceNumber: Long, properties: Map[String, String],
      bytes: Array[Byte], compression: Option[String] = None)

  /** Write a Puffin file; returns each blob's final (offset, length) in
    * input order — what a v3 manifest entry's `content_offset` /
    * `content_size_in_bytes` record. */
  def writeFile(path: String, blobs: Seq[Blob],
      fileProperties: Map[String, String],
      conf: Configuration): Seq[(Long, Long)] = {
    val p = new Path(path)
    val out = p.getFileSystem(conf).create(p, true)
    try {
      out.write(Magic)
      var offset = 4L
      val placed = blobs.map { b =>
        val at = offset
        out.write(b.bytes)
        offset += b.bytes.length
        (at, b.bytes.length.toLong)
      }
      def jstr(s: String) = JsonMethods.compact(JString(s))
      val blobJson = blobs.zip(placed).map { case (b, (at, len)) =>
        val props = b.properties.map { case (k, v) =>
          s"${jstr(k)}: ${jstr(v)}"
        }.mkString(", ")
        val codec = b.compression
          .map(c => s""", "compression-codec": ${jstr(c)}""").getOrElse("")
        s"""{"type": ${jstr(b.tpe)}, "fields": [${b.fields.mkString(", ")}],
           | "snapshot-id": ${b.snapshotId},
           | "sequence-number": ${b.sequenceNumber},
           | "offset": $at, "length": $len$codec,
           | "properties": {$props}}""".stripMargin
      }.mkString(", ")
      val fileProps = fileProperties.map { case (k, v) =>
        s"${jstr(k)}: ${jstr(v)}"
      }.mkString(", ")
      val payload =
        s"""{"blobs": [$blobJson], "properties": {$fileProps}}"""
          .getBytes("UTF-8")
      out.write(Magic)
      out.write(payload)
      val tail = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      tail.putInt(payload.length)
      tail.putInt(0) // flags: uncompressed footer
      out.write(tail.array())
      out.write(Magic)
      placed
    } finally out.close()
  }
}
