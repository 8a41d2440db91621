package graft

import org.apache.spark.sql.functions._

import graft.functions.HtmlText
import graft.sources.Warc
import graft.sources.Warc.WarcRec

/** Deterministic fuzz for the web-corpus readers: WARC round-trips with
  * adversarial payloads (record-boundary byte sequences INSIDE payloads —
  * Content-Length framing must make them inert) and tag-soup through the
  * HTML extractor (must never throw, never hang, always normalize). */
class WebFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("warc round-trips adversarial payloads byte-exactly (both layouts)") {
    val rng = new scala.util.Random(0x57A12C)
    val payloads = (0 until 60).map { i =>
      val n = rng.nextInt(2000)
      val b = new Array[Byte](n)
      rng.nextBytes(b)
      // plant framing-shaped bytes inside payloads: a parser that scans
      // for separators instead of honoring Content-Length would break
      i % 4 match {
        case 0 if n >= 20 =>
          System.arraycopy("\r\n\r\nWARC/1.0\r\n".getBytes("ISO-8859-1"), 0, b, 5, 14)
        case 1 if n >= 30 =>
          System.arraycopy("\r\nContent-Length: 0\r\n\r\n".getBytes("ISO-8859-1"), 0, b, 2, 23)
        case 2 if n >= 10 =>
          java.util.Arrays.fill(b, 0, 10, 0x0a.toByte)
        case _ => ()
      }
      b
    }
    val recs = payloads.zipWithIndex.map { case (b, i) =>
      WarcRec("resource", b, targetUri = s"urn:fuzz:$i")
    }
    for (gz <- Seq(true, false)) {
      val dir = java.nio.file.Files.createTempDirectory("warcfz").toString
      val path = s"$dir/fuzz.warc" + (if (gz) ".gz" else "")
      Warc.write(path, recs, gzipPerRecord = gz)
      val back = Warc.read(spark, path)
        .select($"target_uri", md5($"payload").as("d"), length($"payload"))
        .as[(String, String, Int)].collect().sortBy(_._1)
      assert(back.length == 60)
      payloads.zipWithIndex.foreach { case (b, i) =>
        val row = back.find(_._1 == s"urn:fuzz:$i").get
        val md = java.security.MessageDigest.getInstance("MD5")
        val want = md.digest(b).map("%02x".format(_)).mkString
        assert(row._2 == want && row._3 == b.length,
          s"payload $i mismatched under gz=$gz")
      }
    }
  }

  test("html extractor survives seeded tag soup without throwing or hanging") {
    val rng = new scala.util.Random(0x5011)
    val atoms = Array("<", ">", "</", "<!--", "-->", "<![CDATA[", "]]>", "&",
      "&amp;", "&#", "&#x", ";", "\"", "'", "=", "/", "<div", "<a href=",
      "<script", "</script>", "<p>", "</p>", "<h1", "text ", "zz", "\n",
      "<!DOCTYPE", "<?php", "<meta ", "<li", " ", "&#x110000;", "&#0;")
    (0 until 200).foreach { trial =>
      val sb = new StringBuilder
      val n = 1 + rng.nextInt(80)
      (0 until n).foreach(_ => sb.append(atoms(rng.nextInt(atoms.length))))
      val soup = sb.toString
      val t0 = System.nanoTime()
      val blocks = HtmlText.blocks(soup)     // must not throw
      val md = HtmlText.markdown(soup)       // structured path too
      val meta = HtmlText.pageMeta(soup)
      assert(System.nanoTime() - t0 < 2e9, s"slow on trial $trial")
      // normalization invariants: no leading/trailing/double spaces, no
      // empty blocks, link chars never exceed total chars
      blocks.foreach { b =>
        assert(b.text.nonEmpty && b.text == b.text.trim)
        assert(!b.text.contains("  "))
        assert(b.linkChars <= b.chars)
      }
      assert(md != null && meta != null)
    }
  }
}
