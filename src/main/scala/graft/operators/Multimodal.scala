package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise via `mapPartitions`.
  *
  * The actual codec work (JPEG decode, audio resample, video frame grab) is
  * STUBBED — the container has no media libraries — behind [[MediaCodec]];
  * the Spark-side contract (schema, partition-preserving batch shape,
  * deterministic outputs) is real and tested. Swapping in a real codec is a
  * one-object change with no plan-shape impact.
  */
object Multimodal {

  final case class MediaMeta(
      nBytes: Long,
      contentMd5: String,
      width: Int,
      height: Int,
      format: String)

  final case class MediaRow(id: Long, content: Array[Byte])
  final case class DecodedRow(id: Long, nBytes: Long, contentMd5: String,
      width: Int, height: Int, format: String, featNorm: Double)

  /** The stub codec: deterministic pseudo-decode derived from the bytes.
    * REAL IMPLEMENTATION REQUIRED for production — see class doc. */
  object MediaCodec {
    def probe(content: Array[Byte]): MediaMeta = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(content).map("%02x".format(_)).mkString
      val n = content.length.toLong
      MediaMeta(n, hex, (n % 64).toInt + 1, ((n / 7) % 64).toInt + 1,
        (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
    }

    /** Stub "feature extraction": mean byte value as a 1-d feature. A real
      * codec would decode and run a vision/audio model here. */
    def feature(content: Array[Byte]): Double =
      if (content.isEmpty) 0.0
      else content.map(b => (b & 0xff).toDouble).sum / content.length
  }

  /** Attach a binary column (the ingest shape: any string/blob source). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): Dataset[MediaRow] = {
    implicit val enc = Encoders.product[MediaRow]
    df.select(col(idCol).cast("long").as("id"),
      col(payloadCol).cast("binary").as("content")).as[MediaRow]
  }

  /** Batch decode via mapPartitions: one codec instance per partition (the
    * expensive-init pattern Pandas UDFs use), rows stream through without
    * materializing the partition. */
  def decode(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    implicit val enc = Encoders.product[DecodedRow]
    media.mapPartitions { it =>
      it.map { r =>
        val m = MediaCodec.probe(r.content)
        DecodedRow(r.id, m.nBytes, m.contentMd5, m.width, m.height, m.format,
          MediaCodec.feature(r.content))
      }
    }
  }

  /** Frame-sampling plumbing: every k-th chunk of the payload as a "frame"
    * (stand-in for video frame extraction; preserves the explode shape a
    * real sampler produces). */
  def sampleFrames(media: Dataset[MediaRow], chunkBytes: Int, everyK: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      r.content.grouped(chunkBytes).zipWithIndex
        .filter { case (_, i) => i % everyK == 0 }
        .map { case (chunk, i) => (r.id, i, chunk.length, MediaCodec.probe(chunk).contentMd5) }
    }.toDF("id", "frame_idx", "frame_bytes", "frame_md5")
  }
}
