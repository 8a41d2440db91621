package graft.sources.grib

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.sources.TaskConf

/** Distributed long-format reader for GRIB edition 2 — same row model,
  * channel synthesis, and scale shape as [[Grib1Reader]] (driver indexes
  * headers only; tasks ranged-read their own packed-data spans; streams
  * close on task completion). */
object Grib2Reader {

  /** Index per MESSAGE: (offset, length, fields) — header-only reads. */
  def indexMessages(conf: Configuration,
      path: String): Seq[(Long, Long, Seq[Grib2.Field])] = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    def read(off: Long, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      in.readFully(off, b)
      b
    }
    try {
      val out = Seq.newBuilder[(Long, Long, Seq[Grib2.Field])]
      var off = Grib1Reader.nextMessage(read _, fileLen, 0L)
      while (off >= 0 && off + 16 <= fileLen) {
        val (fields, total) = Grib2.parseMessage(read _, off)
        out += ((off, total, fields))
        off = Grib1Reader.nextMessage(read _, fileLen, off + total)
      }
      out.result()
    } finally in.close()
  }

  /** Every FIELD of the file (messages may carry several). */
  def indexFields(conf: Configuration, path: String): Seq[Grib2.Field] =
    indexMessages(conf, path).flatMap(_._3)

  private def sessionConf(spark: SparkSession): Configuration =
    new Configuration(spark.sparkContext.hadoopConfiguration)

  def readLongFormat(spark: SparkSession, path: String,
      partitions: Int = 0): DataFrame =
    fromIndex(spark, path, indexFields(sessionConf(spark), path), partitions)

  def fromIndex(spark: SparkSession, path: String, fields: Seq[Grib2.Field],
      partitions: Int = 0): DataFrame = {
    require(fields.nonEmpty, s"no GRIB2 fields in $path")
    val nPart = if (partitions > 0) partitions
      else math.max(1, math.min(fields.size, spark.sparkContext.defaultParallelism))
    val pathLocal = path
    val tconf = TaskConf(sessionConf(spark))
    val rdd = spark.sparkContext.parallelize(fields, nPart).mapPartitions { it =>
      graft.sources.RangedIO.rows(pathLocal, tconf) { in =>
        it.flatMap { f =>
          val data = new Array[Byte](f.dataBytes)
          in.readFully(f.dataOffset, data)
          val bitmap =
            if (f.bitmapOffset >= 0) {
              val b = new Array[Byte](f.bitmapBytes)
              in.readFully(f.bitmapOffset, b)
              b
            } else null
          val values = Grib2.decodeValues(f, data, bitmap)
          val time = java.time.LocalDateTime.ofEpochSecond(
            f.validTimeEpochSec, 0, java.time.ZoneOffset.UTC)
          val level = f.levelName
          val height = f.levelHeight
          val stepType = f.stepType
          val shortName = f.shortName
          val channel = graft.operators.Mover.channelName(level, height, stepType, shortName)
          (0 until f.nPoints).iterator.map { k =>
            val j = k / f.ni
            val i = k % f.ni
            val v = values(k)
            Row(time, f.latOf(j), f.lonOf(i), level, height, stepType, shortName,
              channel, if (v.isNaN) null else java.lang.Double.valueOf(v))
          }
        }
      }
    }
    spark.createDataFrame(rdd, Grib1Reader.longSchema)
  }

  def readMerged(spark: SparkSession, path: String, partitions: Int = 0): DataFrame = {
    val fields = indexFields(sessionConf(spark), path)
    val channels = fields
      .map(f => graft.operators.Mover.channelName(
        f.levelName, f.levelHeight, f.stepType, f.shortName))
      .distinct
    val long = fromIndex(spark, path, fields, partitions)
      .select("time", "latitude", "longitude", "channel", "value")
    graft.operators.Mover.mergeChannels(
      long, Seq("time", "latitude", "longitude"), "channel", "value", channels)
  }
}

/** Edition-sniffing facade: byte 8 of the indicator section says 1 or 2;
  * dispatch accordingly (cfgrib reads both transparently — so does this). */
object GribReader {
  def edition(conf: Configuration, path: String): Int = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val fileLen = fs.getFileStatus(p).getLen
    val in = fs.open(p)
    def read(off: Long, len: Int): Array[Byte] = {
      val b = new Array[Byte](len)
      in.readFully(off, b)
      b
    }
    try {
      // magic scan: bulletin headers may precede the first message
      val off = Grib1Reader.nextMessage(read _, fileLen, 0L)
      require(off >= 0 && off + 8 <= fileLen, s"not a GRIB file: $path")
      Grib1.u8(read(off, 8), 7)
    } finally in.close()
  }

  def readLongFormat(spark: SparkSession, path: String, partitions: Int = 0): DataFrame =
    editionOf(spark, path) match {
      case 1 => Grib1Reader.readLongFormat(spark, path, partitions)
      case 2 => Grib2Reader.readLongFormat(spark, path, partitions)
      case e => throw Grib1.UnsupportedGrib(s"edition $e")
    }

  def readMerged(spark: SparkSession, path: String, partitions: Int = 0): DataFrame =
    editionOf(spark, path) match {
      case 1 => Grib1Reader.readMerged(spark, path, partitions)
      case 2 => Grib2Reader.readMerged(spark, path, partitions)
      case e => throw Grib1.UnsupportedGrib(s"edition $e")
    }

  private def editionOf(spark: SparkSession, path: String): Int =
    edition(new Configuration(spark.sparkContext.hadoopConfiguration), path)
}
