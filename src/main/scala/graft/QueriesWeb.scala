package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HtmlText
import graft.sources.{CdxIndex, Tables, Warc}

/** Web-corpus (Common Crawl style) ingestion + extraction queries: WARC
  * container reading, HTML → text extraction, boilerplate classification,
  * and the composed crawl → clean-text accounting pipeline. Fixture blobs
  * are synthesized from table-derived parameters (the established format-
  * query pattern here), so every DuckDB oracle recomputes the planted
  * values arithmetically.
  */
object QueriesWeb {

  /** q136 fixture: n rows of (id, score, name, emb[4]) across 3 ZSTD-
    * compressed record batches, values derived arithmetically. */
  private def writeArrowFixture(path: String, n: Int): Unit =
    graft.sources.ArrowIpc.writeFixture(path,
      (0 until n).map { r =>
        (r.toLong, (r % 37) / 4.0, Some(s"rec-$r"),
          (0 until 4).map(c => (r * 4 + c) / 8.0))
      }, batchRows = (n + 2) / 3, zstd = true)

  lazy val all: Seq[Q] = Seq(

    // ------------------------------------------------------- source: WARC container
    // Two gzip-per-record .warc.gz shards (the Common Crawl layout) of HTTP
    // responses with table-derived URIs/statuses/bodies; every 5th body is
    // stored in chunked transfer coding and must come back de-chunked. The
    // oracle recomputes uri/status/length/md5 from the same derivation.
    Q("q120_warc_meta", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 80),
      p AS (SELECT rn0,
                   'https://example-' || CAST(rn0 % 7 AS VARCHAR)
                     || '.test/page/' || CAST(rn0 AS VARCHAR) AS uri,
                   CASE WHEN rn0 % 4 = 3 THEN 404 ELSE 200 END AS status,
                   'payload-' || CAST(rn0 AS VARCHAR) || '-'
                     || repeat('y', CAST(o_orderkey % 211 AS INT)) AS body
            FROM o)
      SELECT uri AS target_uri, CAST(status AS INT) AS http_status,
             CAST(length(body) AS BIGINT) AS payload_bytes,
             md5(body) AS digest,
             'text/html; charset=utf-8' AS http_content_type
      FROM p ORDER BY target_uri"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q120", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(80)
            .select(($"o_orderkey" % 211).cast("int"))
            .collect().map(_.getInt(0))
          val recs = params.zipWithIndex.map { case (pad, i) =>
            val uri = s"https://example-${i % 7}.test/page/$i"
            val status = if (i % 4 == 3) 404 else 200
            val body = s"payload-$i-${"y" * pad}".getBytes("UTF-8")
            Warc.WarcRec("response",
              Warc.httpResponse(status, "text/html; charset=utf-8", body,
                chunked = i % 5 == 0),
              targetUri = uri,
              contentType = "application/http; msgtype=response")
          }.toSeq
          val info = Warc.WarcRec("warcinfo", "software: graft\r\n".getBytes("UTF-8"),
            contentType = "application/warc-fields")
          Warc.write(s"$dir/crawl-000.warc.gz", info +: recs.take(40))
          Warc.write(s"$dir/crawl-001.warc.gz", info +: recs.drop(40))
        }
        Warc.read(s, s"$dir/crawl-*.warc.gz")
          .filter($"warc_type" === "response")
          .select($"target_uri", $"http_status",
            length($"payload").cast("long").as("payload_bytes"),
            md5($"payload").as("digest"), $"http_content_type")
          .orderBy($"target_uri")
      }),

    // ------------------------------------------------------- text: HTML -> text extraction
    // Full extraction semantics over planted HTML: title/heading blocks,
    // script+style+comment stripping, entity decoding, block-boundary
    // newlines. The oracle rebuilds the expected text from `text` directly.
    Q("q121_html_text", Some("""
      SELECT doc_id AS id,
             'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
             'Heading ' || CAST(doc_id % 7 AS VARCHAR) || chr(10) ||
             text || ' & more' || chr(10) ||
             'tail ' || CAST(doc_id % 5 AS VARCHAR) AS text
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val derived = Tables.documents(s, d).select($"doc_id",
          concat(lit("<html><head><title>Doc "), $"doc_id",
            lit("</title><script>var x = \"<p>no</p>\";</script>" +
              "<style>p{color:red}</style></head><body><!-- hidden -->" +
              "<h1>Heading "), $"doc_id" % 7,
            lit("</h1><p>"), $"text",
            lit(" &amp; more</p><div>tail "), $"doc_id" % 5,
            lit("</div></body></html>")).as("html"))
        HtmlText.htmlTextFlat(derived, "doc_id", "html")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- text: boilerplate classification
    // jusText-style main-content extraction: the nav block (link density
    // 1.0) and the short footer fall out; both paragraphs survive. Block
    // and survivor counts are structural constants of the planted page.
    Q("q122_html_main", Some("""
      SELECT doc_id AS id,
             text || chr(10) || 'Second paragraph about topic '
               || CAST(doc_id % 9 AS VARCHAR)
               || ' with enough plain words here' AS main_text,
             4 AS n_blocks, 2 AS n_good
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val derived = Tables.documents(s, d).select($"doc_id",
          concat(lit("<body><nav><a href=\"/\">Home</a> " +
              "<a href=\"/about\">About</a> <a href=\"/c\">Contact</a></nav><p>"),
            $"text",
            lit("</p><p>Second paragraph about topic "), $"doc_id" % 9,
            lit(" with enough plain words here</p>" +
              "<footer>(c) 2026 example site</footer></body>")).as("html"))
        HtmlText.htmlMainTextFlat(derived, "doc_id", "html",
            minWords = 5, maxLinkDensity = 0.4)
          .orderBy($"id")
      }),

    // ------------------------------------------------------- source: CDX index -> fetch -> charset decode
    // The selective-read pattern: a full pass builds the (file, offset)
    // index, then ONLY the HTTP-200 records are fetched back by positioned
    // reads and decoded with their DECLARED charset (iso-8859-1 bodies
    // carry an 0xE9 e-acute that a blind utf-8 cast would mangle). The
    // oracle emits the decoded strings directly.
    Q("q124_warc_fetch", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 60),
      p AS (SELECT rn0,
                   'https://example-' || CAST(rn0 % 5 AS VARCHAR)
                     || '.test/doc/' || CAST(rn0 AS VARCHAR) AS uri,
                   CASE WHEN rn0 % 4 = 3 THEN 404 ELSE 200 END AS status,
                   'page ' || CAST(rn0 AS VARCHAR) || ' café '
                     || repeat('z', CAST(o_orderkey % 97 AS INT)) AS body
            FROM o)
      SELECT uri AS target_uri, body AS text
      FROM p WHERE status = 200 ORDER BY target_uri"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q124", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(60)
            .select(($"o_orderkey" % 97).cast("int"))
            .collect().map(_.getInt(0))
          val recs = params.zipWithIndex.map { case (pad, i) =>
            val body = s"page $i café ${"z" * pad}".getBytes("ISO-8859-1")
            Warc.WarcRec("response",
              Warc.httpResponse(if (i % 4 == 3) 404 else 200,
                "text/html; charset=iso-8859-1", body),
              targetUri = s"https://example-${i % 5}.test/doc/$i",
              contentType = "application/http; msgtype=response")
          }.toSeq
          Warc.write(s"$dir/crawl-000.warc.gz", recs.take(30))
          Warc.write(s"$dir/crawl-001.warc.gz", recs.drop(30))
        }
        val idx = Warc.read(s, s"$dir/crawl-*.warc.gz")
          .filter($"warc_type" === "response" && $"http_status" === 200)
          .select($"file_uri", $"offset")
        Warc.withPayloadText(Warc.fetch(idx))
          .select($"target_uri", $"text")
          .orderBy($"target_uri")
      }),

    // ------------------------------------------------------- text: SURT index keys
    // The canonical CDX key transform: scheme/port/fragment dropped, www.
    // stripped, host labels reversed comma-joined, lowercased. The oracle
    // assembles the expected keys from the same planted URL components —
    // an independent statement of the whole transform.
    Q("q125_surt_keys", Some("""
      SELECT doc_id AS id,
             'com,example,site-' || CAST(doc_id % 7 AS VARCHAR)
               || ')/page/' || CAST(doc_id AS VARCHAR)
               || CASE WHEN doc_id % 3 = 0
                       THEN '?ref=' || CAST(doc_id % 11 AS VARCHAR)
                       ELSE '' END AS surt
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val urls = Tables.documents(s, d).select($"doc_id",
          concat(lit("https://WWW.Site-"), $"doc_id" % 7,
            lit(".Example.COM:443/Page/"), $"doc_id",
            when($"doc_id" % 3 === 0,
              concat(lit("?ref="), $"doc_id" % 11)).otherwise(lit("")),
            lit("#Frag")).as("url"))
        urls.select($"doc_id".as("id"),
            graft.functions.TextFunctions.surtKey($"url").as("surt"))
          .orderBy($"id")
      }),

    // ------------------------------------------------------- text: markdown-structured extraction
    // Structure-preserving extraction: heading levels as '#' prefixes,
    // list items as bullets, blockquotes as '> ' — the shape LLM training
    // pipelines extract so document structure survives into the tokens.
    Q("q126_html_markdown", Some("""
      SELECT doc_id AS id,
             '# Doc ' || CAST(doc_id AS VARCHAR) || chr(10) ||
             '## Summary' || chr(10) ||
             '- words ' || CAST(doc_id % 13 AS VARCHAR) || chr(10) ||
             '- lang ' || CAST(doc_id % 4 AS VARCHAR) || chr(10) ||
             '> ' || text || chr(10) || 'tail' AS markdown
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val derived = Tables.documents(s, d).select($"doc_id",
          concat(lit("<html><body><h1>Doc "), $"doc_id",
            lit("</h1><h2>Summary</h2><ul><li>words "), $"doc_id" % 13,
            lit("</li><li>lang "), $"doc_id" % 4,
            lit("</ul><blockquote>"), $"text",
            lit("</blockquote><p>tail</p></body></html>")).as("html"))
        graft.functions.HtmlText.htmlMarkdownFlat(derived, "doc_id", "html")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- compliance: robots.txt replay
    // RFC 9309 evaluation over the corpus: six domains share a robots body
    // (Disallow /private, Allow /private/ok, Disallow *.pdf$), the seventh
    // has no robots row. Path shapes cycle by doc_id so the expected
    // verdict is pure arithmetic.
    Q("q127_robots_replay", Some("""
      SELECT doc_id AS id,
             CASE WHEN doc_id % 7 = 6 THEN TRUE
                  WHEN doc_id % 4 = 1 THEN FALSE
                  WHEN doc_id % 4 = 3 THEN FALSE
                  ELSE TRUE END AS allowed
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val body = "User-agent: graftbot\nDisallow: /private\n" +
          "Allow: /private/ok\nDisallow: *.pdf$\n\n" +
          "User-agent: *\nDisallow: /\n"
        val robots = (0 until 6).map(k => (s"site-$k.example", body))
          .toDF("domain", "robots_txt")
        val urls = Tables.documents(s, d).select($"doc_id".as("id"),
          concat(lit("https://site-"), $"doc_id" % 7, lit(".example"),
            expr("""CASE CAST(doc_id % 4 AS INT)
              WHEN 0 THEN '/page/' || doc_id
              WHEN 1 THEN '/private/' || doc_id
              WHEN 2 THEN '/private/ok/' || doc_id
              ELSE '/files/' || doc_id || '.pdf' END""")).as("url"))
        graft.operators.RobotsTxt.evaluate(urls, "url", robots,
            "domain", "robots_txt", agent = "GraftBot/1.0")
          .select($"id", $"allowed")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- text: page metadata extraction
    // Title / meta-description / canonical / lang pulled from planted
    // heads with mixed attribute orders and entities; the oracle rebuilds
    // each field from the same derivation.
    Q("q128_page_meta", Some("""
      SELECT doc_id AS id,
             'Doc ' || CAST(doc_id AS VARCHAR) || ' & friends' AS title,
             'About topic ' || CAST(doc_id % 13 AS VARCHAR) AS description,
             'https://canon.example/d/' || CAST(doc_id AS VARCHAR) AS canonical,
             CASE WHEN doc_id % 3 = 0 THEN 'en' ELSE 'de' END AS lang
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val derived = Tables.documents(s, d).select($"doc_id",
          concat(lit("<html lang=\""),
            when($"doc_id" % 3 === 0, "en").otherwise("de"),
            lit("\"><head><title>Doc "), $"doc_id",
            lit(" &amp; friends</title><meta content=\"About topic "),
            $"doc_id" % 13,
            lit("\" name=\"description\"><link href=\"https://canon.example/d/"),
            $"doc_id",
            lit("\" rel=\"canonical\"></head><body>x</body></html>")).as("html"))
        graft.functions.HtmlText.pageMetaFlat(derived, "doc_id", "html")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- sink: distributed WET export
    // The write half of the crawl pipeline: extracted text exported as
    // gzip-per-record conversion shards (one per partition) and read back
    // through the same reader; the oracle recomputes uri + md5(text).
    Q("q129_wet_export", Some("""
      SELECT 'https://wet.example/doc/' || CAST(doc_id AS VARCHAR)
               AS target_uri,
             md5('clean ' || text) AS digest,
             CAST(length('clean ' || text) AS BIGINT) AS n_bytes
      FROM documents ORDER BY target_uri"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.path("q129", d, "wet") { out =>
          val corpus = Tables.documents(s, d).select(
            concat(lit("https://wet.example/doc/"), $"doc_id").as("target_uri"),
            concat(lit("clean "), $"text").cast("binary").as("content"))
            .repartition(3)
          Warc.writeShards(corpus, out)
        }
        Warc.read(s, s"$dir/crawl-*.warc.gz")
          .select($"target_uri", md5($"payload").as("digest"),
            length($"payload").cast("long").as("n_bytes"))
          .orderBy($"target_uri")
      }),

    // ------------------------------------------------------- dedup: latest capture per canonical URL
    // Multi-crawl URL dedup, the standard CC preprocessing step: two
    // captures of every page (differing in www./case, which surtKey
    // canonicalizes into ONE key) keep only the newest by WARC date via a
    // per-key window. The oracle derives the winner arithmetically.
    Q("q130_url_latest", Some("""
      SELECT doc_id AS id,
             'example,site-' || CAST(doc_id % 7 AS VARCHAR) || ')/p/'
               || CAST(doc_id AS VARCHAR) AS surt,
             CASE WHEN doc_id % 2 = 0 THEN 'crawl-B' ELSE 'crawl-A' END
               AS crawl,
             CASE WHEN doc_id % 2 = 0 THEN '2026-02-20T00:00:00Z'
                  ELSE '2026-01-10T00:00:00Z' END AS warc_date
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        import s.implicits._
        val docs = Tables.documents(s, d)
        val capA = docs.select($"doc_id".as("id"),
          concat(lit("https://www.Site-"), $"doc_id" % 7,
            lit(".Example/p/"), $"doc_id").as("url"),
          lit("2026-01-10T00:00:00Z").as("warc_date"),
          lit("crawl-A").as("crawl"))
        val capB = docs.select($"doc_id".as("id"),
          concat(lit("https://site-"), $"doc_id" % 7,
            lit(".example/P/"), $"doc_id").as("url"),
          when($"doc_id" % 2 === 0, "2026-02-20T00:00:00Z")
            .otherwise("2026-01-05T00:00:00Z").as("warc_date"),
          lit("crawl-B").as("crawl"))
        val keyed = capA.union(capB).withColumn("surt",
          graft.functions.TextFunctions.surtKey($"url"))
        val w = Window.partitionBy($"surt")
          .orderBy($"warc_date".desc, $"crawl".desc)
        keyed.withColumn("__rn", row_number().over(w))
          .filter($"__rn" === 1)
          .select($"id", $"surt", $"crawl", $"warc_date")
          .orderBy($"id")
      }),

    // ------------------------------------------------------- source: CDX surt-prefix pushdown
    // Host lookup over SURT-sorted plain index shards: the driver
    // binary-searches each shard's byte range for the prefix run via small
    // ranged reads and prunes shards outside it (CdxIndex.readPrefix) —
    // the whole-shard scan never happens. The oracle recomputes the same
    // host's captures with a LIKE filter over the full planted set.
    Q("q141_cdx_prefix", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT 'test,site-' || CAST(rn0 % 9 AS VARCHAR) || ')/d/'
               || lpad(CAST(rn0 AS VARCHAR), 4, '0') AS surt,
             'https://site-' || CAST(rn0 % 9 AS VARCHAR) || '.test/d/'
               || lpad(CAST(rn0 AS VARCHAR), 4, '0') AS url,
             CAST((o_orderkey % 977) * 3 AS BIGINT) AS offset
      FROM o
      WHERE rn0 % 9 = 3
      ORDER BY surt"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q141", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(120)
            .select(($"o_orderkey" % 977).cast("long"))
            .collect().map(_.getLong(0))
          val sorted = params.zipWithIndex.map { case (k, i) =>
            f"test,site-${i % 9})/d/$i%04d 20260101000000 " +
              f"""{"url": "https://site-${i % 9}.test/d/$i%04d", """ +
              s""""status": "200", "offset": "${k * 3}", """ +
              s""""filename": "seg/f.warc.gz"}"""
          }.sorted
          val (lo, hi) = sorted.splitAt(sorted.size / 2)
          CdxIndex.writePlain(s"$dir/part-0.cdx", lo)
          CdxIndex.writePlain(s"$dir/part-1.cdx", hi)
        }
        CdxIndex.readPrefix(s, s"$dir/part-*.cdx", "test,site-3)")
          .select($"surt", $"url", $"offset")
          .orderBy($"surt")
      }),

    // ------------------------------------------------------- source: CDX zipnum build + lookup
    // The full Common Crawl index cycle: distributed zipnum BUILD (range-
    // partitioned global surt sort, one task per gz shard of gzip members,
    // driver writes cluster.idx from per-member entries) then the zipnum
    // LOOKUP (binary-search cluster.idx, fetch only the covering members).
    // The oracle recomputes the host's captures from the planted set.
    Q("q142_cdx_zipnum", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT 'test,site-' || CAST(rn0 % 9 AS VARCHAR) || ')/d/'
               || lpad(CAST(rn0 AS VARCHAR), 4, '0') AS surt,
             'https://site-' || CAST(rn0 % 9 AS VARCHAR) || '.test/d/'
               || lpad(CAST(rn0 AS VARCHAR), 4, '0') AS url,
             CAST((o_orderkey % 977) * 3 AS BIGINT) AS offset
      FROM o
      WHERE rn0 % 9 = 4
      ORDER BY surt"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q142", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(120)
            .select(($"o_orderkey" % 977).cast("long"))
            .collect().map(_.getLong(0))
          val lines = params.zipWithIndex.map { case (k, i) =>
            f"test,site-${i % 9})/d/$i%04d 20260101000000 " +
              f"""{"url": "https://site-${i % 9}.test/d/$i%04d", """ +
              s""""status": "200", "offset": "${k * 3}", """ +
              s""""filename": "seg/f.warc.gz"}"""
          }
          // deliberately unsorted input: the BUILD owns the global sort
          val df = s.createDataFrame(
            s.sparkContext.parallelize(
              lines.reverse.map(org.apache.spark.sql.Row(_)), 5),
            org.apache.spark.sql.types.StructType(Seq(
              org.apache.spark.sql.types.StructField("line",
                org.apache.spark.sql.types.StringType))))
          CdxIndex.writeZipnumShards(df, dir, shards = 2, linesPerMember = 10)
        }
        CdxIndex.readPrefixZipnum(s, s"$dir/cluster.idx", "test,site-4)")
          .select($"surt", $"url", $"offset")
          .orderBy($"surt")
      }),

    // ------------------------------------------------------- source: CDXJ capture index
    // The lookup side of a web archive: gzipped `surt timestamp {json}`
    // lines parse into typed capture rows (sparse fields null, addresses
    // cast). The oracle recomputes every planted field.
    Q("q131_cdx_index", Some("""
      WITH o AS (SELECT o_orderkey,
                        row_number() OVER (ORDER BY o_orderkey) - 1 AS rn0
                 FROM orders ORDER BY o_orderkey LIMIT 120)
      SELECT 'test,site-' || CAST(rn0 % 9 AS VARCHAR) || ')/d/'
               || CAST(rn0 AS VARCHAR) AS surt,
             '2026010' || CAST(1 + rn0 % 9 AS VARCHAR) || '000000'
               AS timestamp,
             'https://site-' || CAST(rn0 % 9 AS VARCHAR) || '.test/d/'
               || CAST(rn0 AS VARCHAR) AS url,
             CASE WHEN rn0 % 4 = 3 THEN 404 ELSE 200 END AS status,
             CAST((o_orderkey % 977) * 3 AS BIGINT) AS offset,
             CAST(200 + o_orderkey % 977 AS BIGINT) AS length,
             'seg/' || CAST(rn0 % 5 AS VARCHAR) || '/f.warc.gz' AS filename
      FROM o ORDER BY surt"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q131", d) { dir =>
          val params = Tables.orders(s, d).orderBy($"o_orderkey").limit(120)
            .select(($"o_orderkey" % 977).cast("long"))
            .collect().map(_.getLong(0))
          val lines = params.zipWithIndex.map { case (k, i) =>
            val status = if (i % 4 == 3) 404 else 200
            s"""test,site-${i % 9})/d/$i 2026010${1 + i % 9}000000 """ +
              s"""{"url": "https://site-${i % 9}.test/d/$i", "status": "$status", """ +
              s""""offset": "${k * 3}", "length": "${200 + k}", """ +
              s""""filename": "seg/${i % 5}/f.warc.gz"}"""
          }
          CdxIndex.writeGz(s"$dir/cdx-00000.gz", lines.take(60))
          CdxIndex.writeGz(s"$dir/cdx-00001.gz", lines.drop(60))
        }
        CdxIndex.read(s, s"$dir/cdx-*.gz")
          .select($"surt", $"timestamp", $"url", $"status", $"offset",
            $"length", $"filename")
          .orderBy($"surt")
      }),

    // ------------------------------------------------------- multimodal: G.711 telephony audio
    // A-law/mu-law WAVs (the telephony speech-corpus codings) decode
    // through the same audio feature path as PCM; constant-companding
    // payloads (A-law 0xD5/0x55 = +-8, mu-law 0x80/0x00 = +-32124) make
    // every feature — including RMS — closed-form for the oracle.
    Q("q132_g711_audio", Some("""
      WITH p AS (SELECT doc_id,
                        1 + doc_id % 2 AS channels,
                        500 + doc_id % 200 AS n_frames,
                        CASE WHEN doc_id % 2 = 0 THEN CAST(8 AS DOUBLE)
                             ELSE CAST(32124 AS DOUBLE) END AS amp
                 FROM documents)
      SELECT doc_id, 8000 AS sample_rate, channels, n_frames,
             round(n_frames * 1000.0 / 8000, 3) AS duration_ms,
             round(amp, 3) AS rms,
             (n_frames - 1) // 4 AS zero_crossings,
             CASE WHEN doc_id % 2 = 0 THEN 'alaw' ELSE 'ulaw' END AS coding
      FROM p ORDER BY doc_id"""))(
      (s, d) => {
        import s.implicits._
        import org.apache.spark.sql.Encoders
        import graft.operators.{Multimodal, Wav}
        val ids = Tables.documents(s, d).select($"doc_id".cast("long"))
          .as[Long](Encoders.scalaLong)
        val media = ids.map { id =>
          val alaw = id % 2 == 0
          val channels = (1 + id % 2).toInt
          val nFrames = (500 + id % 200).toInt
          val payload = new Array[Byte](nFrames * channels)
          var i = 0
          while (i < nFrames) {
            val pos = (i / 4) % 2 == 0
            val b: Byte =
              if (alaw) (if (pos) 0xD5 else 0x55).toByte
              else (if (pos) 0x80 else 0x00).toByte
            var c = 0
            while (c < channels) { payload(i * channels + c) = b; c += 1 }
            i += 1
          }
          (id, Wav.encodeRaw(if (alaw) 6 else 7, 8, 8000, channels, payload))
        }(Encoders.tuple(Encoders.scalaLong, Encoders.BINARY))
          .toDF("doc_id", "content")
        Multimodal.decodeAudio(Multimodal.asMedia(media, "doc_id", "content"))
          .select($"id".as("doc_id"),
            $"sampleRate".cast("long").as("sample_rate"),
            $"channels".cast("long").as("channels"),
            $"nFrames".as("n_frames"),
            round($"durationMs", 3).as("duration_ms"),
            round($"rms", 3).as("rms"),
            $"zeroCrossings".as("zero_crossings"),
            when($"id" % 2 === 0, "alaw").otherwise("ulaw").as("coding"))
          .orderBy($"doc_id")
      }),

    // ------------------------------------------------------- source: NumPy .npy matrix
    // The embedding-matrix container: a 2-D <f4 .npy written from
    // table-derived values fans out row-range positioned reads and comes
    // back as (row, values); posexplode flattens for the oracle, which
    // recomputes every element (f4 storage keeps these values exact —
    // quarters fit a float mantissa).
    Q("q133_npy_matrix", Some("""
      WITH o AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS r
                 FROM orders ORDER BY o_orderkey LIMIT 120),
      c AS (SELECT unnest(range(0, 8)) AS c)
      SELECT o.r AS row, c.c AS col,
             CAST((o.r * 31 + c.c * 7) % 100 AS DOUBLE) / 4 AS value
      FROM o, c ORDER BY row, col"""))(
      (s, d) => {
        import s.implicits._
        val path = Fixtures.path("q133", d, "emb.npy") { p =>
          val n = Tables.orders(s, d).orderBy($"o_orderkey").limit(120).count().toInt
          val vals = for (r <- 0 until n; c <- 0 until 8)
            yield ((r * 31 + c * 7) % 100) / 4.0
          graft.sources.Npy.write(p, Seq(n, 8), vals, descr = "<f4")
        }
        graft.sources.Npy.read(s, path)
          .select($"row", posexplode($"values").as(Seq("col", "value")))
          .select($"row", $"col".cast("long").as("col"), $"value")
          .orderBy($"row", $"col")
      }),

    // ------------------------------------------------------- source: safetensors tensors
    // The HF weight/activation container: a two-tensor file (a 2-D F32
    // matrix + a 1-D bias) reads back tensor-tagged rows via header-planned
    // positioned reads; eighths stay exact in F32 for the oracle.
    Q("q134_safetensors", Some("""
      WITH o AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS r
                 FROM orders ORDER BY o_orderkey LIMIT 90),
      c AS (SELECT unnest(range(0, 6)) AS c),
      emb AS (SELECT 'emb' AS tensor, o.r AS row, c.c AS col,
                     CAST((o.r * 13 + c.c * 5) % 64 AS DOUBLE) / 8 AS value
              FROM o, c),
      bias AS (SELECT 'bias' AS tensor, c.c AS row, CAST(0 AS BIGINT) AS col,
                      CAST(c.c AS DOUBLE) / 4 - 0.5 AS value
               FROM c)
      SELECT * FROM (SELECT * FROM emb UNION ALL SELECT * FROM bias)
      ORDER BY tensor, row, col"""))(
      (s, d) => {
        import s.implicits._
        val path = Fixtures.path("q134", d, "acts.safetensors") { p =>
          val n = Tables.orders(s, d).orderBy($"o_orderkey").limit(90).count().toInt
          val emb = for (r <- 0 until n; c <- 0 until 6)
            yield ((r * 13 + c * 5) % 64) / 8.0
          val bias = (0 until 6).map(c => c / 4.0 - 0.5)
          graft.sources.Safetensors.write(p, Seq(
            ("emb", Seq(n.toLong, 6L), emb), ("bias", Seq(6L), bias)))
        }
        graft.sources.Safetensors.read(s, path)
          .select($"tensor", $"row",
            posexplode($"values").as(Seq("col", "value")))
          .select($"tensor", $"row", $"col".cast("long").as("col"), $"value")
          .orderBy($"tensor", $"row", $"col")
      }),

    // ------------------------------------------------------- composed: npy embeddings -> ANN scoring
    // The integration the npy reader exists for: an embedding matrix from
    // disk scored against a query vector with the native codegen'd
    // DotProduct expression, top-10 by score. Eighths and small integers
    // keep every product exact for the oracle.
    Q("q135_npy_topk", Some("""
      WITH o AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS r
                 FROM orders ORDER BY o_orderkey LIMIT 200),
      c AS (SELECT unnest(range(0, 6)) AS c),
      s AS (SELECT o.r,
                   sum(CAST((o.r * 17 + c.c * 3) % 32 AS DOUBLE) / 8
                       * (c.c + 1)) AS score
            FROM o, c GROUP BY o.r)
      SELECT r AS row, round(score, 6) AS score
      FROM s ORDER BY score DESC, row LIMIT 10"""))(
      (s, d) => {
        import s.implicits._
        val path = Fixtures.path("q135", d, "emb.npy") { p =>
          val n = Tables.orders(s, d).orderBy($"o_orderkey").limit(200).count().toInt
          val vals = for (r <- 0 until n; c <- 0 until 6)
            yield ((r * 17 + c * 3) % 32) / 8.0
          graft.sources.Npy.write(p, Seq(n, 6), vals, descr = "<f4")
        }
        val q = array((1 to 6).map(k => lit(k.toDouble)): _*)
        graft.sources.Npy.read(s, path)
          .select($"row",
            round(graft.functions.DotProduct($"values", q), 6).as("score"))
          .orderBy($"score".desc, $"row")
          .limit(10)
      }),

    // ------------------------------------------------------- source: Arrow IPC / Feather v2
    // The columnar interchange file (pyarrow feather, HF datasets cache),
    // read batch-per-task through the bundled arrow-vector library with
    // ZSTD buffer compression; the oracle recomputes ids, quarters-exact
    // scores, names, and the exploded embedding elements.
    Q("q136_arrow_ipc", Some("""
      WITH o AS (SELECT row_number() OVER (ORDER BY o_orderkey) - 1 AS r
                 FROM orders ORDER BY o_orderkey LIMIT 150),
      c AS (SELECT unnest(range(0, 4)) AS c)
      SELECT o.r AS id,
             CAST(o.r % 37 AS DOUBLE) / 4 AS score,
             'rec-' || CAST(o.r AS VARCHAR) AS name,
             c.c AS pos,
             CAST(o.r * 4 + c.c AS DOUBLE) / 8 AS elem
      FROM o, c ORDER BY id, pos"""))(
      (s, d) => {
        import s.implicits._
        val path = Fixtures.path("q136", d, "data.arrow") { p =>
          val n = Tables.orders(s, d).orderBy($"o_orderkey").limit(150).count().toInt
          writeArrowFixture(p, n)
        }
        graft.sources.ArrowIpc.read(s, path)
          .select($"id", $"score", $"name",
            posexplode($"emb").as(Seq("pos", "elem")))
          .select($"id", $"score", $"name", $"pos".cast("long").as("pos"),
            $"elem")
          .orderBy($"id", $"pos")
      }),

    // ------------------------------------------------------- composed: crawl -> clean-text accounting
    // The end-to-end Common Crawl recipe in one plan: WARC shards -> HTTP
    // 200 filter -> main-content extraction -> token accounting per source
    // domain. Every 5th page 404s and must drop out; tokens per page =
    // words(text) + the 10-word second paragraph.
    Q("q123_cc_pipeline", Some("""
      WITH d AS (SELECT doc_id, text,
                        row_number() OVER (ORDER BY doc_id) - 1 AS rn0
                 FROM documents ORDER BY doc_id LIMIT 500),
      live AS (SELECT * FROM d WHERE rn0 % 5 <> 4),
      t AS (SELECT 'site-' || CAST(doc_id % 7 AS VARCHAR) || '.example' AS domain,
                   len(string_split(text, ' ')) + 10 AS toks
            FROM live)
      SELECT domain, count(*) AS docs, CAST(sum(toks) AS BIGINT) AS tokens
      FROM t GROUP BY domain ORDER BY domain"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q123", d) { dir =>
          val docs = Tables.documents(s, d).orderBy($"doc_id").limit(500)
            .select($"doc_id", $"text").collect()
            .map(r => (r.getLong(0), r.getString(1)))
          val recs = docs.zipWithIndex.map { case ((id, text), i) =>
            val host = s"site-${id % 7}.example"
            val html = "<body><nav><a href=\"/\">Home</a> <a href=\"/x\">More</a>" +
              s"</nav><p>$text</p><p>Second paragraph about topic ${id % 9} " +
              "with enough plain words here</p><footer>(c) 2026</footer></body>"
            Warc.WarcRec("response",
              Warc.httpResponse(if (i % 5 == 4) 404 else 200,
                "text/html; charset=utf-8", html.getBytes("UTF-8")),
              targetUri = s"https://$host/doc/$id",
              contentType = "application/http; msgtype=response")
          }.toSeq
          recs.grouped((recs.size + 3) / 4).zipWithIndex.foreach { case (g, k) =>
            Warc.write(f"$dir/crawl-$k%03d.warc.gz", g)
          }
        }
        val pages = Warc.read(s, s"$dir/crawl-*.warc.gz")
          .filter($"warc_type" === "response" && $"http_status" === 200)
          .select($"target_uri", $"payload".cast("string").as("html"))
        val main = HtmlText.htmlMainTextFlat(pages, "target_uri", "html")
        main
          .select(
            graft.functions.TextFunctions.urlDomain($"id").as("domain"),
            graft.functions.TextFunctions.tokenCount($"main_text").as("toks"))
          .groupBy($"domain")
          .agg(count(lit(1)).as("docs"), sum($"toks").cast("long").as("tokens"))
          .orderBy($"domain")
      }),

    // ------------------------------------------------------- source: .jsonl.zst corpora
    // The dominant LLM-corpus shipping format (The Pile / RedPajama /
    // Dolma layout): documents serialize to JSON lines, export as seekable
    // zstd shards (distributed, one shard per partition), read back
    // span-split through the own RFC 8878 decoder, and parse with
    // from_json. Small frame/span targets force many frames per shard and
    // many tasks per file, so mid-line span boundaries are really
    // exercised; the oracle recomputes every field (and an md5 of the
    // text) straight from the documents table.
    Q("q137_jsonl_zst", Some("""
      SELECT doc_id AS id, lang, n_chars, md5(text) AS digest
      FROM documents ORDER BY id"""))(
      (s, d) => {
        import s.implicits._
        val dir = Fixtures.dir("q137", d) { dir =>
          val lines = Tables.documents(s, d)
            .select(to_json(struct($"doc_id", $"lang", $"n_chars", $"text"))
              .as("value"))
          graft.sources.ZstdLines.writeShards(
            lines.repartition(3), dir, frameBytes = 8192)
        }
        val schema = "doc_id BIGINT, lang STRING, n_chars BIGINT, text STRING"
        graft.sources.ZstdLines.read(s, s"$dir/part-*.jsonl.zst",
            targetSpanBytes = 16384)
          .select(from_json($"value", org.apache.spark.sql.types.StructType
            .fromDDL(schema)).as("j"))
          .select($"j.doc_id".as("id"), $"j.lang".as("lang"),
            $"j.n_chars".as("n_chars"), md5($"j.text").as("digest"))
          .orderBy($"id")
      })
  )
}
