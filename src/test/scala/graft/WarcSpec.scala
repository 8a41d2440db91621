package graft

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

import org.apache.spark.sql.functions._

import graft.sources.Warc
import graft.sources.Warc.WarcRec

class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def b(s: String): Array[Byte] = s.getBytes(UTF_8)

  private def fixture(dir: String, gz: Boolean): String = {
    val ext = if (gz) "warc.gz" else "warc"
    val path = s"$dir/crawl-000.$ext"
    Warc.write(path, Seq(
      WarcRec("warcinfo", b("software: graft\r\n"),
        contentType = "application/warc-fields"),
      WarcRec("response",
        Warc.httpResponse(200, "text/html; charset=utf-8",
          b("<html><body>hello</body></html>")),
        targetUri = "https://example.test/a",
        contentType = "application/http; msgtype=response"),
      WarcRec("response",
        Warc.httpResponse(404, "text/plain", b("gone")),
        targetUri = "<https://example.test/missing>",
        contentType = "application/http;msgtype=response"),
      WarcRec("request",
        b("GET /a HTTP/1.1\r\nHost: example.test\r\n\r\n"),
        targetUri = "https://example.test/a",
        contentType = "application/http; msgtype=request"),
      WarcRec("resource", b("raw bytes"), targetUri = "https://example.test/r")),
      gzipPerRecord = gz)
    path
  }

  test("gzip-per-record warc round-trips records with CDX-style member offsets") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    val path = fixture(dir, gz = true)
    val df = Warc.read(spark, path).cache()
    assert(df.count() == 5)
    assert(df.select($"warc_type").as[String].collect().sorted.toSeq ==
      Seq("request", "resource", "response", "response", "warcinfo"))
    // member offsets: strictly increasing, first at 0, lengths tile the file
    val om = df.select($"offset", $"length").as[(Long, Long)].collect().sortBy(_._1)
    assert(om.head._1 == 0L)
    om.sliding(2).foreach { case Array((o1, l1), (o2, _)) => assert(o1 + l1 == o2)
      case _ => }
    val fileLen = new java.io.File(path).length()
    assert(om.last._1 + om.last._2 == fileLen)
    // the offsets are REAL addresses: records re-read independently from them
    val ok = df.filter($"target_uri" === "https://example.test/a" &&
      $"warc_type" === "response").head()
    assert(ok.getAs[Int]("http_status") == 200)
    assert(ok.getAs[String]("http_content_type") == "text/html; charset=utf-8")
    assert(new String(ok.getAs[Array[Byte]]("payload"), UTF_8) ==
      "<html><body>hello</body></html>")
    // WARC/1.0 angle-bracket target URIs are unwrapped
    assert(df.filter($"http_status" === 404).head()
      .getAs[String]("target_uri") == "https://example.test/missing")
    // request records carry no status; payload is the HTTP request body
    val req = df.filter($"warc_type" === "request").head()
    assert(req.isNullAt(req.fieldIndex("http_status")))
    // non-http records pass the block through verbatim
    assert(new String(df.filter($"warc_type" === "resource").head()
      .getAs[Array[Byte]]("payload"), UTF_8) == "raw bytes")
    df.unpersist()
  }

  test("plain .warc parses the same records with record offsets") {
    val dir = java.nio.file.Files.createTempDirectory("warcp").toString
    val path = fixture(dir, gz = false)
    val df = Warc.read(spark, path)
    assert(df.count() == 5)
    val offs = df.select($"offset").as[Long].collect().sorted
    assert(offs.head == 0L && offs.distinct.length == 5)
    assert(df.filter($"warc_type" === "response" && $"http_status" === 200)
      .select(length($"payload")).as[Int].head() == 31)
  }

  test("chunked transfer coding is de-chunked; malformed chunking keeps raw bytes") {
    val body = b("chunked payload body, long enough to split")
    val block = Warc.httpResponse(200, "text/html", body, chunked = true)
    // the stored block really is chunked (hex size line present)
    val blockStr = new String(block, ISO_8859_1)
    assert(blockStr.contains("Transfer-Encoding: chunked"))
    val (st, ct, payload) = Warc.parseHttp(block)
    assert(st.contains(200) && ct.contains("text/html"))
    assert(payload.sameElements(body))
    // malformed: size line lies — parser must fall back to the raw capture
    val bad = blockStr.replaceFirst("\r\n\r\n", "\r\n\r\nzz-not-hex\r\n")
      .getBytes(ISO_8859_1)
    val (_, _, raw) = Warc.parseHttp(bad)
    assert(new String(raw, ISO_8859_1).startsWith("zz-not-hex"))
    assert(Warc.dechunk(b("5\r\nhello\r\nno-terminator")).isEmpty)
  }

  test("multiple records in one gzip member parse and share the member address") {
    val dir = java.nio.file.Files.createTempDirectory("warcm").toString
    // build two records, gzip them TOGETHER into one member
    val tmpPlain = s"$dir/two.warc"
    Warc.write(tmpPlain, Seq(
      WarcRec("resource", b("first"), targetUri = "u:1"),
      WarcRec("resource", b("second"), targetUri = "u:2")), gzipPerRecord = false)
    val plain = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(tmpPlain))
    val gzPath = s"$dir/two.warc.gz"
    val out = new java.io.FileOutputStream(gzPath)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(plain); gz.close()
    val df = Warc.read(spark, gzPath)
    val rows = df.select($"offset", $"target_uri").as[(Long, String)].collect().sorted
    assert(rows.toSeq == Seq((0L, "u:1"), (0L, "u:2")))
  }

  test("corrupt gzip members and truncated records fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("warcx").toString
    val path = fixture(dir, gz = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // flip a payload byte deep in the first member: CRC must catch it
    bytes(40) = (bytes(40) ^ 0x55).toByte
    val broken = s"$dir/broken.warc.gz"
    java.nio.file.Files.write(java.nio.file.Paths.get(broken), bytes)
    // either our CRC check or the Inflater itself must reject the member
    intercept[Exception] {
      Warc.read(spark, broken).count()
    }
    // truncated plain record: Content-Length promises more than the file has
    val trunc = s"$dir/trunc.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(trunc),
      b("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 99\r\n\r\nshort"))
    intercept[Exception] { Warc.read(spark, trunc).count() }
    intercept[IllegalArgumentException] {
      Warc.read(spark, s"$dir/nope-*.warc.gz")
    }
  }

  test("fetch: CDX-style random access reads only the indexed records") {
    val dir = java.nio.file.Files.createTempDirectory("warcf").toString
    val gzPath = fixture(dir, gz = true)
    val plainPath = fixture(s"$dir/p", gz = false)
    // index = full read projected to addresses; then fetch a SUBSET
    val idx = Warc.read(spark, gzPath)
      .filter($"warc_type" === "response")
      .select($"file_uri", $"offset")
    val fetched = Warc.fetch(idx)
    assert(fetched.count() == 2)
    assert(fetched.select($"http_status").as[Int].collect().sorted.toSeq ==
      Seq(200, 404))
    assert(new String(fetched.filter($"http_status" === 200).head()
      .getAs[Array[Byte]]("payload"), UTF_8) == "<html><body>hello</body></html>")
    // duplicated addresses (as a multi-record member's index rows would
    // be) fetch each record exactly once
    assert(Warc.fetch(idx.union(idx)).count() == 2)
    // plain-file addresses resolve through the same API
    val pidx = Warc.read(spark, plainPath)
      .filter($"warc_type" === "resource").select($"file_uri", $"offset")
    val p = Warc.fetch(pidx)
    assert(p.count() == 1)
    assert(new String(p.head().getAs[Array[Byte]]("payload"), UTF_8) == "raw bytes")
  }

  test("withPayloadText decodes by declared charset, meta sniff, utf-8 fallback") {
    // windows-1252 declared in the HTTP header: 0x93/0x94 are curly quotes
    val w1252 = Array[Byte]('a', 0x93.toByte, 'b', 0x94.toByte)
    // meta-declared iso-8859-1: 0xE9 is e-acute
    val metaDoc = ("<html><head><meta charset=\"iso-8859-1\"></head>" +
      "<body>caf").getBytes(ISO_8859_1) ++ Array(0xE9.toByte)
    // undeclared valid utf-8
    val utf = "héllo".getBytes(UTF_8)
    // undeclared INVALID utf-8: must replace, never throw
    val junk = Array[Byte]('x', 0xFF.toByte, 'y')
    val df = Seq(
      (1L, w1252, "text/html; charset=windows-1252"),
      (2L, metaDoc, "text/html"),
      (3L, utf, null.asInstanceOf[String]),
      (4L, junk, "text/plain")).toDF("id", "payload", "http_content_type")
    val out = Warc.withPayloadText(df).orderBy($"id")
      .select($"text").as[String].collect()
    assert(out(0) == "a“b”")
    assert(out(1).endsWith("café"))
    assert(out(2) == "héllo")
    assert(out(3) == "x�y")
    // header matching is locale-independent (Turkish dotless-i) and the
    // charset parameter parses case-insensitively
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      assert(Warc.decodePayload("caf".getBytes(ISO_8859_1) ++ Array(0xE9.toByte),
        "text/html; CHARSET=ISO-8859-1") == "café")
    } finally java.util.Locale.setDefault(saved)
    // http-equiv form sniffs too
    assert(Warc.decodePayload(
      ("<meta http-equiv=\"Content-Type\" content=\"text/html; " +
        "charset=iso-8859-1\">caf").getBytes(ISO_8859_1) ++ Array(0xE9.toByte),
      null).endsWith("café"))
    // unknown charset name falls back to utf-8 instead of throwing
    assert(Warc.decodePayload("ok".getBytes(UTF_8),
      "text/html; charset=no-such-charset") == "ok")
  }

  test("writeShards exports WET-style conversion shards that round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("wet").toString + "/out"
    val df = spark.range(0, 50)
      .selectExpr("concat('https://w.test/d/', id) AS target_uri",
        "cast(concat('extracted text ', id) AS BINARY) AS content")
      .repartition(4)
    assert(Warc.writeShards(df, dir) == 4)
    val back = Warc.read(spark, s"$dir/crawl-*.warc.gz")
    assert(back.count() == 50)
    assert(back.select($"warc_type").distinct().as[String].collect().toSeq ==
      Seq("conversion"))
    assert(back.select($"content_type").distinct().as[String].head() ==
      "text/plain")
    val one = back.filter($"target_uri" === "https://w.test/d/7").head()
    assert(new String(one.getAs[Array[Byte]]("payload"), UTF_8) ==
      "extracted text 7")
    // re-export over the same dir stays consistent (stale shards cleared)
    assert(Warc.writeShards(df.repartition(2), dir) == 2)
    assert(Warc.read(spark, s"$dir/crawl-*.warc.gz").count() == 50)
    // an empty partition still leaves a readable (empty) shard
    val empty = spark.range(0, 1)
      .selectExpr("concat('u:', id) AS target_uri",
        "cast('x' AS BINARY) AS content")
      .repartition(3)
    assert(Warc.writeShards(empty, s"$dir/e") == 3)
    assert(Warc.read(spark, s"$dir/e/crawl-*.warc.gz").count() == 1)
  }

  test("recordsFrom runs the warc pipeline on a STREAM of arriving files") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits.newProductEncoder
    val dir = java.nio.file.Files.createTempDirectory("warcs").toString
    val path = fixture(dir, gz = true)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    // batch parse of the same bytes is the reference result
    val batch = Warc.recordsFrom(
      Seq(("file:a", bytes)).toDF("path", "content"))
      .select($"warc_type", $"target_uri", md5($"payload").as("d"))
      .collect().map(_.toSeq).sortBy(_.toString)
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(String, Array[Byte])]
    val streamed = Warc.recordsFrom(in.toDF().toDF("path", "content"))
      .select($"warc_type", $"target_uri", md5($"payload").as("d"))
    val q = streamed.writeStream.format("memory").queryName("warc_stream")
      .outputMode("append").start()
    try {
      in.addData(("file:a", bytes))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("warc_stream").collect().map(_.toSeq).sortBy(_.toString)
    assert(got.toSeq == batch.toSeq) // stream == batch, record for record
    assert(got.length == 5)
  }

  test("one task per file: partition count tracks the file list") {
    val dir = java.nio.file.Files.createTempDirectory("warcn").toString
    (0 until 3).foreach { i =>
      Warc.write(s"$dir/part-$i.warc.gz",
        Seq(WarcRec("resource", b(s"f$i"), targetUri = s"u:$i")))
    }
    val df = Warc.read(spark, s"$dir/part-*.warc.gz")
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 3)
  }
}
