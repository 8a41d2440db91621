package graft.operators

import java.awt.image.BufferedImage

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed batch-wise via `mapPartitions`.
  *
  * Image decode is REAL: `javax.imageio` ships in the JDK and reads
  * JPEG/PNG/BMP/GIF/WBMP with zero dependencies, so [[MediaCodec]] probes
  * true dimensions/format and computes pixel-level features (mean luminance,
  * 8x8 dHash for near-duplicate detection). Bytes no JDK reader accepts
  * (audio, video, exotic image codecs — libraries absent in this container)
  * fall back to the deterministic pseudo-probe so the pipeline shape stays
  * total; `decoded=false` marks the fallback rows.
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
      width: Int, height: Int, format: String, featNorm: Double,
      decoded: Boolean, dhash: Long)

  /** JDK-native image codec with a deterministic fallback for bytes the JDK
    * cannot decode (non-image media; their real codecs are not in this
    * container). */
  object MediaCodec {

    /** Real decode via `javax.imageio`; None when no installed reader
      * accepts the bytes. */
    def decodeImage(content: Array[Byte]): Option[BufferedImage] =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content)))
      catch { case _: Exception => None }

    /** Header probe: real width/height/format from the matching ImageIO
      * reader (dimensions come from the header — no full pixel decode);
      * falls back to [[pseudoProbe]]. */
    def probe(content: Array[Byte]): MediaMeta = {
      val real =
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(content))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (readers.hasNext) {
              val r = readers.next()
              r.setInput(iis)
              try Some(MediaMeta(content.length.toLong, md5Hex(content),
                r.getWidth(0), r.getHeight(0), r.getFormatName.toLowerCase))
              finally r.dispose()
            } else None
          } finally if (iis != null) iis.close()
        } catch { case _: Exception => None }
      real.getOrElse(pseudoProbe(content))
    }

    /** The deterministic fallback: pseudo-decode derived from the bytes
      * (same formulas the q27 oracle mirrors in SQL). */
    def pseudoProbe(content: Array[Byte]): MediaMeta = {
      val n = content.length.toLong
      MediaMeta(n, md5Hex(content), (n % 64).toInt + 1, ((n / 7) % 64).toInt + 1,
        (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
    }

    private def md5Hex(content: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(content).map("%02x".format(_)).mkString

    /** Rec.601 luma of one ARGB pixel, 0..255. */
    private def luma(argb: Int): Double =
      0.299 * ((argb >> 16) & 0xff) + 0.587 * ((argb >> 8) & 0xff) +
        0.114 * (argb & 0xff)

    /** Mean luminance over all pixels (the pixel-level feature). */
    def meanLuminance(img: BufferedImage): Double = {
      val (w, h) = (img.getWidth, img.getHeight)
      var sum = 0.0
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { sum += luma(img.getRGB(x, y)); x += 1 }
        y += 1
      }
      sum / (w.toLong * h)
    }

    /** 64-bit difference hash: deterministic box-average downsample of the
      * luma plane to a 9x8 grid, bit (r, c) = cell(r, c+1) > cell(r, c) —
      * the standard perceptual near-dup fingerprint. Manual box filter (not
      * Graphics2D scaling) so the hash is bit-stable across JVMs and
      * ENCODINGS: the same pixels hash identically from PNG and BMP bytes. */
    def dHash64(img: BufferedImage): Long = {
      val (gw, gh) = (9, 8)
      val (w, h) = (img.getWidth, img.getHeight)
      val cells = Array.ofDim[Double](gh, gw)
      var r = 0
      while (r < gh) {
        val y0 = r * h / gh
        val y1 = math.max((r + 1) * h / gh, y0 + 1)
        var c = 0
        while (c < gw) {
          val x0 = c * w / gw
          val x1 = math.max((c + 1) * w / gw, x0 + 1)
          var sum = 0.0
          var y = math.min(y0, h - 1)
          val yEnd = math.min(y1, h)
          val xEnd = math.min(x1, w)
          var n = 0
          while (y < yEnd) {
            var x = math.min(x0, w - 1)
            while (x < xEnd) { sum += luma(img.getRGB(x, y)); n += 1; x += 1 }
            y += 1
          }
          cells(r)(c) = if (n == 0) 0.0 else sum / n
          c += 1
        }
        r += 1
      }
      var bits = 0L
      var k = 0
      while (k < 64) {
        val row = k / 8
        val col = k % 8
        if (cells(row)(col + 1) > cells(row)(col)) bits |= 1L << k
        k += 1
      }
      bits
    }

    /** Feature: mean luminance for decodable images; mean byte value for
      * everything else (the stub's formula). */
    def feature(content: Array[Byte]): Double =
      decodeImage(content).map(meanLuminance).getOrElse(
        if (content.isEmpty) 0.0
        else content.map(b => (b & 0xff).toDouble).sum / content.length)

    /** Deterministic box-average resize (the thumbnail/feature-grid step of
      * an image pipeline). Same cell walk as [[dHash64]] but per RGB channel
      * and to an arbitrary grid, so output pixels are bit-stable across JVMs
      * — unlike `Graphics2D` interpolation, which is renderer-dependent. */
    def resizeBox(img: BufferedImage, outW: Int, outH: Int): BufferedImage = {
      require(outW > 0 && outH > 0, "resize target must be positive")
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new BufferedImage(outW, outH, BufferedImage.TYPE_INT_RGB)
      var r = 0
      while (r < outH) {
        val y0 = math.min(r * h / outH, h - 1)
        val yEnd = math.min(math.max((r + 1) * h / outH, y0 + 1), h)
        var c = 0
        while (c < outW) {
          val x0 = math.min(c * w / outW, w - 1)
          val xEnd = math.min(math.max((c + 1) * w / outW, x0 + 1), w)
          var (sr, sg, sb) = (0L, 0L, 0L)
          var n = 0
          var y = y0
          while (y < yEnd) {
            var x = x0
            while (x < xEnd) {
              val p = img.getRGB(x, y)
              sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
              n += 1; x += 1
            }
            y += 1
          }
          out.setRGB(c, r,
            ((sr / n).toInt << 16) | ((sg / n).toInt << 8) | (sb / n).toInt)
          c += 1
        }
        r += 1
      }
      out
    }

    /** Re-encode to PNG bytes (JDK writer — lossless, so
      * decode∘encode == identity on the pixel grid). */
    def encodePng(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
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
        MediaCodec.decodeImage(r.content) match {
          case Some(img) =>
            val m = MediaCodec.probe(r.content)
            DecodedRow(r.id, m.nBytes, m.contentMd5, m.width, m.height,
              m.format, MediaCodec.meanLuminance(img),
              decoded = true, dhash = MediaCodec.dHash64(img))
          case None =>
            val m = MediaCodec.pseudoProbe(r.content)
            DecodedRow(r.id, m.nBytes, m.contentMd5, m.width, m.height, m.format,
              MediaCodec.feature(r.content), decoded = false, dhash = 0L)
        }
      }
    }
  }

  /** Near-duplicate image pairs by dHash: 4x16-bit band LSH over the 64-bit
    * hash (two hashes within Hamming distance <= 3 must agree on at least
    * one band), exact Hamming verify on candidates only — the image-side
    * mirror of the SimHash text pipeline, same scale shape. */
  def imageNearDups(decoded: Dataset[DecodedRow], maxHamming: Int = 3): DataFrame = {
    val hashes = decoded.filter(col("decoded")).select(col("id"), col("dhash"))
    val banded = hashes.select(col("id"), col("dhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(lit(0xffffL)).as("key"))): _*))
        .as("bk"))
      .select(col("id"), col("dhash"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("id").as("id_a"), col("dhash").as("h_a"),
      col("band"), col("key"))
    val b = banded.select(col("id").as("id_b"), col("dhash").as("h_b"),
      col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        Dedup.hammingDistance(col("h_a"), col("h_b")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  final case class AudioRow(id: Long, nBytes: Long, sampleRate: Int,
      channels: Int, nFrames: Long, durationMs: Double, rms: Double,
      zeroCrossings: Long, decoded: Boolean)

  /** Batch audio decode via the pure-JVM [[Wav]] codec — the audio-side
    * mirror of [[decode]]: RIFF/WAVE bytes stream through `mapPartitions`,
    * undecodable payloads keep the row with `decoded=false` (zeroed
    * features) so one bad blob cannot fail a 100 TB scan. */
  def decodeAudio(media: Dataset[MediaRow]): Dataset[AudioRow] = {
    implicit val enc = Encoders.product[AudioRow]
    media.mapPartitions { it =>
      it.map { r =>
        try {
          val a = Wav.decode(r.content)
          AudioRow(r.id, r.content.length.toLong, a.sampleRate, a.channels,
            a.nFrames.toLong, a.durationMs, a.rms, a.zeroCrossings.toLong,
            decoded = true)
        } catch {
          case _: Wav.UnsupportedWav =>
            AudioRow(r.id, r.content.length.toLong, 0, 0, 0L, 0.0, 0.0, 0L,
              decoded = false)
        }
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
