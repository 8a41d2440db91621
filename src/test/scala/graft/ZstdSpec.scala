package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.zarr.Zstd
import com.github.luben.zstd.{Zstd => RefZstd, ZstdCompressCtx, ZstdOutputStream, ZstdDictCompress}

/** The pure-JVM zstd decoder (RFC 8878) vs the REFERENCE encoder: zstd-jni
  * ships on the Spark classpath (Spark's own shuffle codec), so every frame
  * here is produced by real libzstd — levels 1..22 cover raw/RLE/compressed
  * blocks, 1- and 4-stream Huffman literals, treeless literals, FSE and
  * repeat sequence tables, and the repeat-offset history. The decoder must
  * byte-match on all of them. */
class ZstdSpec extends AnyFunSuite {

  private def roundTrip(data: Array[Byte], level: Int): Unit = {
    val packed = RefZstd.compress(data, level)
    val out = Zstd.decompress(packed, 0, packed.length)
    assert(out.length == data.length, s"level=$level n=${data.length}")
    assert(java.util.Arrays.equals(out, data),
      s"level=$level n=${data.length}: decoded bytes differ")
  }

  private val rng = new scala.util.Random(20260813)

  // payload shapes chosen to force distinct literal/sequence modes
  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty" -> Array.emptyByteArray,
    "one-byte" -> Array[Byte](42),
    "all-zero-200k" -> new Array[Byte](200 * 1024), // RLE blocks
    "tiny-text" -> "the quick brown fox".getBytes("UTF-8"),
    // repetitive text: long matches, repeat offsets, compressed literals
    "repetitive-text-300k" -> {
      val sb = new StringBuilder
      var i = 0
      while (sb.length < 300 * 1024) {
        sb.append(s"station-${i % 97} reported temperature ${250 + i % 40}.${i % 10} kelvin at hour ${i % 24}\n")
        i += 1
      }
      sb.toString.getBytes("UTF-8")
    },
    // skewed byte histogram but little structure: dense Huffman literals
    "skewed-bytes-100k" -> Array.tabulate(100 * 1024) { _ =>
      val r = rng.nextInt(100)
      (if (r < 60) r / 10 else rng.nextInt(256)).toByte
    },
    // incompressible: raw blocks
    "random-64k" -> Array.fill(64 * 1024)(rng.nextInt().toByte),
    // shuffled little-endian doubles, the Zarr chunk shape
    "zarr-chunk-512k" -> {
      val bb = java.nio.ByteBuffer.allocate(512 * 1024)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 64 * 1024).foreach(i => bb.putDouble(250.0 + (i % 1440) * 0.01))
      bb.array()
    })

  test("decoder matches the reference encoder across levels and payloads") {
    for ((name, data) <- payloads; level <- Seq(1, 3, 9, 19)) {
      withClue(s"$name @ level $level: ") { roundTrip(data, level) }
    }
    // max level on the most structured payloads (large window, long matches)
    roundTrip(payloads.find(_._1 == "repetitive-text-300k").get._2, 22)
    roundTrip(payloads.find(_._1 == "zarr-chunk-512k").get._2, 22)
  }

  test("multi-megabyte frame (many blocks, cross-block repeat modes)") {
    val n = 4 * 1024 * 1024
    val data = Array.tabulate(n) { i =>
      (((i / 3) % 251) ^ ((i / 7919) % 17)).toByte
    }
    roundTrip(data, 3)
    roundTrip(data, 17)
  }

  test("checksum frames decode (checksum consumed, not verified)") {
    val ctx = new ZstdCompressCtx()
    try {
      ctx.setLevel(6)
      ctx.setChecksum(true)
      val data = payloads.find(_._1 == "repetitive-text-300k").get._2
      val packed = ctx.compress(data)
      val out = Zstd.decompress(packed, 0, packed.length)
      assert(java.util.Arrays.equals(out, data))
    } finally ctx.close()
  }

  test("streaming frame without content size decodes against the size hint") {
    val data = payloads.find(_._1 == "repetitive-text-300k").get._2
    val bos = new java.io.ByteArrayOutputStream()
    val zos = new ZstdOutputStream(bos, 3)
    zos.write(data); zos.close()
    val packed = bos.toByteArray
    val out = Zstd.decompress(packed, 0, packed.length, sizeHint = data.length)
    assert(java.util.Arrays.equals(out, data))
  }

  test("leading skippable frame is skipped") {
    val data = "payload behind a skippable frame".getBytes("UTF-8")
    val packed = RefZstd.compress(data, 3)
    val skip = new Array[Byte](8 + 5)
    def le(off: Int, v: Int): Unit =
      (0 until 4).foreach(i => skip(off + i) = (v >>> (8 * i)).toByte)
    le(0, 0x184D2A53); le(4, 5) // magic 0x184D2A5?, 5-byte payload
    val framed = skip ++ packed
    val out = Zstd.decompress(framed, 0, framed.length)
    assert(new String(out, "UTF-8") == "payload behind a skippable frame")
  }

  // deterministic JSON-ish records sharing heavy structure — the classic
  // dictionary-training distribution (corpus shards from `zstd --train`)
  private def trainedDict(): Array[Byte] = {
    val r = new scala.util.Random(7)
    val words = Array("the", "quick", "brown", "shard", "zstd", "corpus",
      "payload", "record", "field", "value", "spark", "entropy")
    def rec(id: Int): String =
      s"""{"id": $id, "kind": "event", "payload": "${
        Seq.fill(6)(words(r.nextInt(words.length))).mkString(" ")
      }", "score": ${r.nextInt(999)}}"""
    val samples = Array.tabulate(96)(k =>
      (0 until 24).map(j => rec(k * 100 + j)).mkString("\n").getBytes("UTF-8"))
    val dictBuf = new Array[Byte](8 * 1024)
    val dictLen = RefZstd.trainFromBuffer(samples, dictBuf)
    assert(dictLen > 0, s"dict training failed: $dictLen")
    java.util.Arrays.copyOf(dictBuf, dictLen.toInt)
  }

  test("dictionary frames decode: entropy-table seeding + window priming") {
    val dictBytes = trainedDict()
    val dict = Zstd.parseDictionary(dictBytes)
    assert(dict.id != 0)
    val r = new scala.util.Random(11)
    val words = Array("the", "quick", "brown", "shard", "zstd", "corpus",
      "payload", "record", "field", "value", "spark", "entropy")
    val payloads = (0 until 4).map { p =>
      (0 until 50).map(j => s"""{"id": ${90000 + p * 100 + j}, "kind": """ +
        s""""event", "payload": "${
          Seq.fill(6)(words(r.nextInt(words.length))).mkString(" ")
        }", "score": ${r.nextInt(999)}}""").mkString("\n").getBytes("UTF-8")
    }
    // every level family: fast (raw/rle-heavy), default, btopt, btultra2 —
    // dict references (early small offsets into dict content, repeat-mode
    // tables against the dict's, treeless literals on the dict's Huffman)
    for (level <- Seq(1, 3, 9, 19); data <- payloads) {
      val ctx = new ZstdCompressCtx()
      try {
        ctx.setLevel(level)
        ctx.loadDict(new ZstdDictCompress(dictBytes, level))
        val packed = ctx.compress(data)
        assert(packed.length < data.length, s"level $level did not compress")
        val out = Zstd.decompress(packed, 0, packed.length, dict = dict)
        assert(java.util.Arrays.equals(out, data),
          s"level=$level n=${data.length}: dict-decoded bytes differ")
      } finally ctx.close()
    }
  }

  test("raw-content dictionaries prime the window (no magic, no tables)") {
    // zstd accepts any blob without the dict magic as pure window priming
    val raw = ("""{"id": 1, "kind": "event", "payload": "the quick brown", """ +
      """"score": 7}""" * 6).getBytes("UTF-8")
    val data = ("""{"id": 2, "kind": "event", "payload": "the quick brown", """ +
      """"score": 9}""" * 20).getBytes("UTF-8")
    val ctx = new ZstdCompressCtx()
    try {
      ctx.setLevel(3)
      ctx.loadDict(new ZstdDictCompress(raw, 3))
      val packed = ctx.compress(data)
      val dict = Zstd.parseDictionary(raw)
      assert(dict.id == 0)
      val out = Zstd.decompress(packed, 0, packed.length, dict = dict)
      assert(java.util.Arrays.equals(out, data))
    } finally ctx.close()
  }

  test("unknown or mismatched dictionary ids fail directed") {
    val dictBytes = trainedDict()
    val data = ("""{"id": 5, "kind": "event"}""" * 30).getBytes("UTF-8")
    val ctx = new ZstdCompressCtx()
    try {
      ctx.setLevel(3)
      ctx.loadDict(new ZstdDictCompress(dictBytes, 3))
      val packed = ctx.compress(data)
      val e = intercept[Zstd.UnsupportedZstd] {
        Zstd.decompress(packed, 0, packed.length)
      }
      assert(e.getMessage.contains("unknown dictionary id"), e.getMessage)
      // a different dictionary (different id) is rejected, not misapplied
      val other = dictBytes.clone()
      other(4) = (other(4) ^ 1).toByte // flip a dict-id bit
      val e2 = intercept[Zstd.UnsupportedZstd] {
        Zstd.decompress(packed, 0, packed.length,
          dict = Zstd.parseDictionary(other))
      }
      assert(e2.getMessage.contains("unknown dictionary id"), e2.getMessage)
    } finally ctx.close()
  }

  test("corrupt dictionary-coded frames fail directed, never emit garbage") {
    val dictBytes = trainedDict()
    val dict = Zstd.parseDictionary(dictBytes)
    val data = ("""{"id": 9, "kind": "event", "payload": "x"}""" * 40)
      .getBytes("UTF-8")
    val ctx = new ZstdCompressCtx()
    val packed = try {
      ctx.setLevel(19)
      ctx.loadDict(new ZstdDictCompress(dictBytes, 19))
      ctx.compress(data)
    } finally ctx.close()
    // truncations at every length must raise SOMETHING typed, and a rare
    // "successful" decode of a prefix must never silently pass as complete
    for (len <- 8 until packed.length) {
      try {
        val out = Zstd.decompress(packed, 0, len, dict = dict)
        assert(out.length != data.length ||
          !java.util.Arrays.equals(out, data) || len == packed.length,
          s"truncation at $len decoded 'successfully'")
      } catch {
        case _: Zstd.UnsupportedZstd | _: IllegalArgumentException |
            _: ArrayIndexOutOfBoundsException => ()
      }
    }
    // corrupt dictionaries: truncation inside the entropy tables is typed
    for (len <- Seq(9, 16, 64, dictBytes.length / 2)) {
      try Zstd.parseDictionary(java.util.Arrays.copyOf(dictBytes, len))
      catch {
        case _: IllegalArgumentException | _: ArrayIndexOutOfBoundsException |
            _: Zstd.UnsupportedZstd => ()
      }
    }
  }

  test("committed CLI fixtures decode (cross-version: zstd 1.5.7 -D frames)") {
    def res(name: String): Array[Byte] = {
      val in = getClass.getResourceAsStream(s"/zstd/$name")
      assert(in != null, s"missing fixture $name")
      try in.readAllBytes() finally in.close()
    }
    val dict = Zstd.parseDictionary(res("corpus.dict"))
    assert(dict.id == 7777L)
    for (p <- Seq("a", "b", "c"); lvl <- Seq("l3", "l19")) {
      val want = res(s"payload_$p.json")
      val got = Zstd.decompress(res(s"payload_${p}_$lvl.zst"), 0,
        res(s"payload_${p}_$lvl.zst").length, dict = dict)
      assert(java.util.Arrays.equals(got, want), s"payload_$p $lvl")
    }
    val rawDict = Zstd.parseDictionary(res("rawdict.bin"))
    val got = Zstd.decompress(res("payload_a_raw.zst"), 0,
      res("payload_a_raw.zst").length, dict = rawDict)
    assert(java.util.Arrays.equals(got, res("payload_a.json")))
  }

  test("corrupt frames fail with directed errors, not garbage output") {
    assert(intercept[IllegalArgumentException] {
      Zstd.decompress(Array[Byte](1, 2, 3, 4, 5), 0, 5)
    }.getMessage.contains("magic"))
    val ok = RefZstd.compress("some zstd payload to corrupt".getBytes("UTF-8"), 3)
    // truncation mid-frame must throw, never return a wrong-length buffer
    for (cut <- Seq(ok.length / 2, ok.length - 1)) {
      intercept[RuntimeException] { Zstd.decompress(ok, 0, cut) }
    }
    // skippable frame with a crafted size >= 2^31: the unsigned read +
    // bound check must throw — a signed read would hold `off` in place
    // (size -8) and spin forever
    val spin = Array[Byte](0x50, 0x2A, 0x4D, 0x18,
      0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    assert(intercept[IllegalArgumentException] {
      Zstd.decompress(spin, 0, spin.length, 4)
    }.getMessage.contains("skippable"))
  }

  test("truncated and bit-flipped frames never escape the directed error") {
    // the blosc-split shape: the frame sits inside a larger array with live
    // bytes after it, so any read past srcOff+srcLen would silently consume
    // the adjacent split instead of failing — exactly the ADVICE defect
    val payload = Array.tabulate(6000)(i => ((i * 131) % 253).toByte)
    val frame = RefZstd.compress(payload, 19) // high level → FSE tables present
    val padded = new Array[Byte](frame.length + 64)
    System.arraycopy(frame, 0, padded, 0, frame.length)
    java.util.Arrays.fill(padded, frame.length, padded.length, 0x5A.toByte)
    def expectDirected(len: Int, what: String): Unit =
      try {
        val out = Zstd.decompress(padded, 0, len, payload.length)
        // decoding "successfully" from a truncated prefix is only legal if
        // the result is actually right (truncation past the frame end)
        assert(len >= frame.length && java.util.Arrays.equals(out, payload), what)
      } catch {
        case _: IllegalArgumentException | _: Zstd.UnsupportedZstd => () // directed
        case e: Throwable => fail(s"$what leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    // every truncation point, including each header byte
    for (cut <- 0 until frame.length) expectDirected(cut, s"truncated at $cut")
    // bit-flip fuzz across the whole frame (headers, FSE tables, payload)
    val rng = new scala.util.Random(42)
    for (_ <- 0 until 2000) {
      val mut = padded.clone()
      val pos = rng.nextInt(frame.length)
      mut(pos) = (mut(pos) ^ (1 << rng.nextInt(8))).toByte
      try Zstd.decompress(mut, 0, frame.length, payload.length)
      catch {
        case _: IllegalArgumentException | _: Zstd.UnsupportedZstd => ()
        case e: Throwable => fail(
          s"bit flip at $pos leaked ${e.getClass.getName}: ${e.getMessage}")
      }
    }
  }

  test("store-mode encoder emits frames the reference decoder accepts") {
    for ((name, data) <- payloads) {
      val packed = Zstd.compressStore(data)
      withClue(s"$name: ") {
        // our own decoder reads it back...
        assert(java.util.Arrays.equals(Zstd.decompress(packed, 0, packed.length), data))
        // ...and so does real libzstd (frame validity oracle)
        val ref = RefZstd.decompress(packed, data.length)
        assert(java.util.Arrays.equals(ref, data))
      }
    }
    // RLE blocks actually shrink constant runs
    assert(Zstd.compressStore(new Array[Byte](200 * 1024)).length < 64)
  }
}
