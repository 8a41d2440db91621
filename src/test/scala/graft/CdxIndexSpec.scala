package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.sources.{CdxIndex, Warc}
import graft.sources.Warc.WarcRec

class CdxIndexSpec extends SparkSpec {
  import spark.implicits._

  test("cdxj lines parse into typed capture rows") {
    val dir = java.nio.file.Files.createTempDirectory("cdx").toString
    CdxIndex.writeGz(s"$dir/cdx-00000.gz", Seq(
      """com,example)/a 20260101120000 {"url": "https://example.com/a", "mime": "text/html", "status": "200", "digest": "AAAA", "length": "512", "offset": "0", "filename": "crawl/seg/f.warc.gz"}""",
      """com,example)/b 20260102130000 {"url": "https://example.com/b", "status": "404", "offset": "512", "filename": "crawl/seg/f.warc.gz"}""",
      "garbage line without json",
      "com,example)/broken 20260101120000 {not valid json at all"))
    val cdx = CdxIndex.read(spark, s"$dir/cdx-*.gz").orderBy($"surt")
    assert(cdx.count() == 2) // JSON-less AND malformed-JSON lines both drop
    val a = cdx.head()
    assert(a.getAs[String]("surt") == "com,example)/a")
    assert(a.getAs[String]("timestamp") == "20260101120000")
    assert(a.getAs[Int]("status") == 200)
    assert(a.getAs[Long]("length") == 512L && a.getAs[Long]("offset") == 0L)
    // sparse lines: absent fields are null, address fields still typed
    val b = cdx.collect()(1)
    assert(b.isNullAt(b.fieldIndex("mime")) && b.getAs[Long]("offset") == 512L)
    // fetchIndex resolves relative filenames against the data base
    val fi = CdxIndex.fetchIndex(cdx, "file:/data").orderBy($"offset").head()
    assert(fi.getString(0) == "file:/data/crawl/seg/f.warc.gz")
    // address-less records (revisit entries) drop instead of reaching
    // fetch as nulls
    val withRevisit = cdx.unionByName(spark.sql(
      """SELECT 'com,example)/r' surt, '20260101120000' timestamp,
        |'https://example.com/r' url, CAST(NULL AS STRING) mime,
        |304 status, CAST(NULL AS STRING) digest, CAST(NULL AS BIGINT) length,
        |CAST(NULL AS BIGINT) offset, CAST(NULL AS STRING) filename
        |""".stripMargin))
    assert(CdxIndex.fetchIndex(withRevisit, "file:/data").count() == 2)
  }

  test("index-build round-trip: crawl -> surt index -> selective fetch") {
    val dir = java.nio.file.Files.createTempDirectory("cdxrt").toString
    // a small crawl
    val recs = (0 until 20).map { i =>
      WarcRec("response",
        Warc.httpResponse(if (i % 4 == 3) 404 else 200, "text/html",
          s"body-$i".getBytes("UTF-8")),
        targetUri = s"https://www.Example.com/p/$i",
        contentType = "application/http; msgtype=response")
    }
    Warc.write(s"$dir/f0.warc.gz", recs.take(10))
    Warc.write(s"$dir/f1.warc.gz", recs.drop(10))
    // build the index FROM the crawl: records -> surt keys + addresses
    val crawl = Warc.read(spark, s"$dir/f*.warc.gz")
      .filter($"warc_type" === "response")
    val indexed = crawl.select(
      TextFunctions.surtKey($"target_uri").as("surt"),
      lit("20260101000000").as("timestamp"),
      $"target_uri".as("url"),
      $"http_content_type".as("mime"),
      $"http_status".as("status"),
      md5($"payload").as("digest"),
      $"length", $"offset", $"file_uri".as("filename"))
    val lines = CdxIndex.toLines(indexed).as[String].collect().sorted
    assert(lines.head.startsWith("com,example)/p/0 20260101000000 {"))
    CdxIndex.writeGz(s"$dir/cdx-00000.gz", lines)
    // the consumer side: parse the index, select 200s, fetch only those
    val cdx = CdxIndex.read(spark, s"$dir/cdx-*.gz")
    assert(cdx.count() == 20)
    val sel = CdxIndex.fetchIndex(cdx.filter($"status" === 200), base = "")
    val fetched = Warc.fetch(sel)
    assert(fetched.count() == 15)
    assert(fetched.select(md5($"payload")).distinct().count() == 15)
    // digests from the index agree with the fetched payloads
    val byUri = fetched.select($"target_uri", md5($"payload").as("d"))
    val joinCheck = cdx.filter($"status" === 200)
      .join(byUri, cdx("url") === byUri("target_uri"))
      .filter($"digest" === $"d")
    assert(joinCheck.count() == 15)
  }
}
