package graft.sources

import java.util.zip.GZIPOutputStream

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CDXJ capture-index files — the lookup side of a web archive (public
  * format: pywb docs; Common Crawl ships one per crawl as `cdx-NNNNN.gz`).
  * Each line is `<surt-key> <timestamp> <json>`, where the JSON carries the
  * capture's url/mime/status/digest and its WARC address
  * (filename/offset/length) — exactly what [[Warc.fetch]] consumes.
  *
  * The reader is pure DataFrame ops over `spark.read.text` (gz text files:
  * one task per file, Spark's native codec path): two `substring_index`
  * splits for the key/timestamp, `from_json` for the body, casts for the
  * numeric address fields. Everything stays in whole-stage codegen — no
  * custom parser is warranted for a line format this regular.
  */
object CdxIndex {

  /** CDXJ JSON body fields (all strings on the wire, per the format). */
  private val BodySchema = StructType(Seq(
    StructField("url", StringType), StructField("mime", StringType),
    StructField("status", StringType), StructField("digest", StringType),
    StructField("length", StringType), StructField("offset", StringType),
    StructField("filename", StringType)))

  /** One row per index line: (surt, timestamp, url, mime, status, digest,
    * length, offset, filename). Lines without a JSON body are dropped. */
  def read(spark: SparkSession, pattern: String): DataFrame = {
    val raw = spark.read.textFile(pattern).toDF("line")
    parseLines(raw, col("line"))
  }

  /** The same parse over an arbitrary string column (for streams or
    * already-loaded data). */
  def parseLines(df: DataFrame, line: Column): DataFrame = {
    val jsonStart = instr(line, "{")
    val prefix = trim(line.substr(lit(1), (jsonStart - 1).cast("int")))
    val body = from_json(line.substr(jsonStart, lit(1 << 24)), BodySchema)
    // malformed JSON parses (PERMISSIVE) to an all-null struct; a capture
    // line with neither url nor filename carries nothing addressable —
    // both drop here, while sparse-but-valid records keep per-field nulls
    df.filter(jsonStart > 0 &&
        (body.getField("url").isNotNull || body.getField("filename").isNotNull))
      .select(
        substring_index(prefix, " ", 1).as("surt"),
        substring_index(prefix, " ", -1).as("timestamp"),
        body.getField("url").as("url"),
        body.getField("mime").as("mime"),
        body.getField("status").cast("int").as("status"),
        body.getField("digest").as("digest"),
        body.getField("length").cast("long").as("length"),
        body.getField("offset").cast("long").as("offset"),
        body.getField("filename").as("filename"))
  }

  /** Project an index selection into the (file_uri, offset) shape
    * [[Warc.fetch]] takes, resolving relative CDX filenames against
    * `base` (Common Crawl filenames are paths relative to the data
    * bucket). Records without an address — revisit/screenshot entries
    * with no filename or offset — are dropped here rather than handed to
    * fetch as nulls. */
  def fetchIndex(cdx: DataFrame, base: String): DataFrame = {
    val sep = if (base.endsWith("/") || base.isEmpty) "" else "/"
    cdx.filter(col("filename").isNotNull && col("offset").isNotNull)
      .select(
      when(col("filename").rlike("^[a-z][a-z0-9+.-]*:/") || lit(base.isEmpty),
        col("filename"))
        .otherwise(concat(lit(base + sep), col("filename"))).as("file_uri"),
      col("offset"))
  }

  /** Render records (e.g. a [[Warc.read]] projection joined with
    * [[graft.functions.TextFunctions.surtKey]]) back into CDXJ lines —
    * the index-build half. Expects surt/timestamp/url/mime/status/digest/
    * length/offset/filename columns; null-valued fields are omitted from
    * the JSON, matching the format's sparse convention. */
  def toLines(df: DataFrame): DataFrame =
    df.select(concat(
      col("surt"), lit(" "), col("timestamp"), lit(" "),
      to_json(struct(
        col("url"), col("mime"), col("status").cast("string").as("status"),
        col("digest"), col("length").cast("string").as("length"),
        col("offset").cast("string").as("offset"), col("filename")))
    ).as("line"))

  /** Fixture writer: one gzipped CDXJ file from pre-rendered lines. */
  def writeGz(path: String, lines: Seq[String],
      conf: Configuration = new Configuration()): Unit = {
    val p = new Path(path)
    val out = new GZIPOutputStream(p.getFileSystem(conf).create(p, true))
    try lines.foreach { l =>
      out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write('\n')
    } finally out.close()
  }
}
