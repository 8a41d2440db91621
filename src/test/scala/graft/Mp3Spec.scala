package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Mp3

class Mp3Spec extends AnyFunSuite {

  test("CBR stubs probe exactly: rates, channels, frames, duration") {
    val m = Mp3.probe(Mp3.writeStub(44100, 2, 128, frames = 100))
    assert(m.sampleRate == 44100 && m.channels == 2 && m.bitrateKbps == 128)
    assert(m.frames == 100 && !m.vbrTagged)
    assert(math.abs(m.durationSec - 100.0 * 1152 / 44100) < 1e-12)
    // MPEG-2 (22.05 kHz) halves the samples per frame
    val m2 = Mp3.probe(Mp3.writeStub(22050, 1, 64, frames = 50))
    assert(m2.sampleRate == 22050 && m2.channels == 1)
    assert(math.abs(m2.durationSec - 50.0 * 576 / 22050) < 1e-12)
    // MPEG-2.5 (8 kHz speech)
    val m25 = Mp3.probe(Mp3.writeStub(8000, 1, 16, frames = 25))
    assert(m25.sampleRate == 8000 && m25.frames == 25)
  }

  test("Xing tags, ID3 wrappers, and junk prefixes are handled") {
    val x = Mp3.probe(Mp3.writeStub(48000, 2, 192, frames = 40, xing = true))
    assert(x.vbrTagged && x.frames == 40)
    val id3 = Mp3.probe(Mp3.writeStub(44100, 2, 128, frames = 10, id3Bytes = 300))
    assert(id3.frames == 10 && id3.sampleRate == 44100)
    // leading junk before the first sync is scanned past
    val junked = "JUNKJUNK".getBytes ++ Mp3.writeStub(44100, 1, 96, frames = 8)
    assert(Mp3.probe(junked).frames == 8)
    // ID3v1 trailer is excluded from the walk
    val v1tail = Mp3.writeStub(44100, 1, 96, frames = 8) ++
      ("TAG" + "x" * 125).getBytes
    assert(Mp3.probe(v1tail).frames == 8)
    // no sync at all raises a directed error
    val e = intercept[Mp3.UnsupportedMp3](Mp3.probe(new Array[Byte](64)))
    assert(e.getMessage.contains("sync"))
  }

  test("sync-bit junk, CRC frames, and truncation at the Xing field") {
    // 0xFF 0xFF looks like a Layer I sync — the scan must skip it, not throw
    val junked = Array(0xff.toByte, 0xff.toByte) ++
      Mp3.writeStub(44100, 1, 96, frames = 6)
    assert(Mp3.probe(junked).frames == 6)
    // a pure Layer I/II stream names the layer in the directed error
    val l1 = Array.tabulate[Byte](64)(i =>
      if (i % 4 == 0) 0xff.toByte else if (i % 4 == 1) 0xfe.toByte else 0)
    assert(intercept[Mp3.UnsupportedMp3](Mp3.probe(l1))
      .getMessage.contains("Layer I/II"))
    // CRC-protected first frame (protection bit 0): Xing sits 2 bytes later
    val prot = Mp3.writeStub(44100, 2, 128, frames = 20, xing = true)
    val moved = prot.clone()
    moved(1) = (moved(1) & 0xfe).toByte // set protection (CRC present)
    // shift the frame payload (incl. the Xing region) down by 2 to make
    // room for the CRC — frame is zero-padded so the tail truncation is safe
    val frameLen = 144 * 128 * 1000 / 44100
    System.arraycopy(prot, 4, moved, 6, frameLen - 6)
    val pm = Mp3.probe(moved)
    assert(pm.vbrTagged && pm.frames == 20)
    // truncated right after the Xing flags: no crash, CBR-walk fallback
    val cut = java.util.Arrays.copyOf(
      Mp3.writeStub(44100, 2, 128, frames = 2, xing = true), 4 + 32 + 8)
    val cm = Mp3.probe(cut)
    assert(!cm.vbrTagged)
  }
}

class FlacSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.Flac

  test("STREAMINFO round-trips rate/channels/bits/samples exactly") {
    val m = Flac.probe(Flac.writeStub(16000, 1, 16, totalSamples = 160000))
    assert(m.sampleRate == 16000 && m.channels == 1 && m.bitsPerSample == 16)
    assert(m.totalSamples == 160000 && m.durationSec == 10.0)
    // 8-channel 24-bit 96 kHz with a > 32-bit sample count
    val hi = Flac.probe(Flac.writeStub(96000, 8, 24, totalSamples = 5L << 32))
    assert(hi.sampleRate == 96000 && hi.channels == 8 && hi.bitsPerSample == 24)
    assert(hi.totalSamples == (5L << 32))
    // unknown length streams report duration 0
    assert(Flac.probe(Flac.writeStub(44100, 2, 16, 0)).durationSec == 0.0)
  }

  test("directed errors on junk and truncation") {
    val e = intercept[Flac.UnsupportedFlac](Flac.probe("RIFF....".getBytes))
    assert(e.getMessage.contains("fLaC"))
    val ok = Flac.writeStub(44100, 2, 16, 1000)
    val cut = java.util.Arrays.copyOf(ok, 20)
    assert(intercept[Flac.UnsupportedFlac](Flac.probe(cut))
      .getMessage.contains("STREAMINFO"))
  }
}

class OggSpec extends org.scalatest.funsuite.AnyFunSuite {
  import graft.operators.Ogg

  test("Opus and Vorbis id headers + last-granule durations probe exactly") {
    // Opus: granule counts 48 kHz samples; duration excludes pre-skip
    val o = Ogg.probe(Ogg.writeStub("opus", 16000, 1, granule = 48312, preSkip = 312))
    assert(o.codec == "opus" && o.sampleRate == 16000 && o.channels == 1)
    assert(o.preSkip == 312 && o.totalSamples == 48000)
    assert(o.durationSec == 1.0)
    // Vorbis: granule counts STREAM-rate samples
    val v = Ogg.probe(Ogg.writeStub("vorbis", 44100, 2, granule = 88200))
    assert(v.codec == "vorbis" && v.sampleRate == 44100 && v.channels == 2)
    assert(v.durationSec == 2.0)
  }

  test("directed errors on junk, truncation, and unknown codecs") {
    assert(intercept[Ogg.UnsupportedOgg](Ogg.probe("not ogg".getBytes))
      .getMessage.contains("OggS"))
    val ok = Ogg.writeStub("opus", 48000, 2, granule = 960)
    // first packet neither OpusHead nor vorbis
    val other = ok.clone()
    "XXXXHead".getBytes.copyToArray(other, 27 + 1) // clobber the id packet
    assert(intercept[Ogg.UnsupportedOgg](Ogg.probe(other))
      .getMessage.contains("OpusHead"))
    // id page only: the header page's granule 0 yields duration 0
    // (an empty stream, not an error)
    val idOnly = java.util.Arrays.copyOf(ok, 27 + 1 + 19)
    assert(Ogg.probe(idOnly).durationSec == 0.0)
    // truncated mid-lacing-table raises a directed error
    assert(intercept[Ogg.UnsupportedOgg](Ogg.probe(
      java.util.Arrays.copyOf(ok, 30))).getMessage.contains("truncated"))
    // chained streams (a second BOS with another serial) are refused
    // rather than reporting one chain's duration as the file's
    val chain2 = Ogg.writeStub("opus", 48000, 2, granule = 4800)
    // give the second chain a different serial on both its pages
    (0 until chain2.length - 27).foreach { o =>
      if (chain2(o) == 'O' && chain2(o + 1) == 'g' && chain2(o + 2) == 'g' &&
        chain2(o + 3) == 'S') chain2(o + 14) = 0x11
    }
    assert(intercept[Ogg.UnsupportedOgg](Ogg.probe(ok ++ chain2))
      .getMessage.contains("chained"))
  }
}

class ScriptStatsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.TextFunctions

  test("script fractions and dominant script match hand counts") {
    val rows = Seq(
      (1L, "hello world"),             // 10 latin, 1 space
      (2L, "Привет мир 42"),           // 9 cyrillic, 2 digit, 2 space
      (3L, "你好 world"),               // 2 han, 5 latin, 1 space
      (4L, "   "),                     // spaces only
      (5L, ""))
    val got = TextFunctions.scriptStats(rows.toDF("doc_id", "text"),
      "doc_id", "text").orderBy($"doc_id").collect()
    val r1 = got(0)
    assert(r1.getLong(1) == 11 &&
      r1.getDouble(2) == 10.0 / 11 && r1.getAs[String]("dominant_script") == "latin")
    val r2 = got(1)
    assert(r2.getDouble(3) == 9.0 / 13 && r2.getDouble(8) == 2.0 / 13 &&
      r2.getAs[String]("dominant_script") == "cyrillic")
    val r3 = got(2)
    assert(r3.getDouble(4) == 2.0 / 8 &&
      r3.getAs[String]("dominant_script") == "latin") // 5 latin beats 2 han
    assert(got(3).getAs[String]("dominant_script") == "none")
    assert(got(4).getLong(1) == 0L &&
      got(4).getAs[String]("dominant_script") == "none")
  }
}
