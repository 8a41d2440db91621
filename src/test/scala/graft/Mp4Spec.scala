package graft

import graft.operators.Mp4

class Mp4Spec extends SparkSpec {
  import spark.implicits._

  test("stub writer round-trips container metadata exactly") {
    val bytes = Mp4.writeStub("isom", timescale = 30000, duration = 90000,
      width = 1920, height = 1080, videoFrames = 75, audioSamples = 132300)
    val m = Mp4.probe(bytes)
    assert(m.brand == "isom")
    assert(m.durationSec == 3.0)
    assert(m.width == 1920 && m.height == 1080)
    assert(m.videoFrames == 75 && m.audioSamples == 132300)
    assert(m.trackCount == 2)
    assert(m.fps == 25.0)
    // video-only variant
    val v = Mp4.probe(Mp4.writeStub("mp42", 1000, 12500, 640, 360, 300))
    assert(v.durationSec == 12.5 && v.trackCount == 1 && v.audioSamples == 0)
  }

  test("probe walks nested and unknown boxes; directed errors on garbage") {
    val bytes = Mp4.writeStub("isom", 600, 1200, 320, 240, 50)
    // prepend an unknown box between ftyp and moov: still parses
    val ftypLen = 24
    val free = Array[Byte](0, 0, 0, 12, 'f', 'r', 'e', 'e', 1, 2, 3, 4)
    val patched = bytes.take(ftypLen) ++ free ++ bytes.drop(ftypLen)
    assert(Mp4.probe(patched).durationSec == 2.0)
    // non-BMFF payload raises a directed error
    val e = intercept[Mp4.UnsupportedMp4](Mp4.probe("not a video".getBytes))
    assert(e.getMessage.contains("ftyp"))
    // a box overrunning the file raises, not loops
    val bad = bytes.clone()
    bad(ftypLen) = 0x7f // huge moov size
    val e2 = intercept[Mp4.UnsupportedMp4](Mp4.probe(bad))
    assert(e2.getMessage.contains("exceeds"), e2.getMessage)
  }

  test("mp4Meta probes a binary column distributed") {
    val rows = (1L to 20L).map { i =>
      i -> Mp4.writeStub("isom", 1000, i * 500, 160 * i.toInt, 90 * i.toInt,
        i * 10, if (i % 2 == 0) i * 100 else 0)
    }
    val df = rows.toDF("doc_id", "payload")
    val got = Mp4.mp4Meta(df, "doc_id", "payload")
      .orderBy($"id").collect()
    assert(got.length == 20)
    val r3 = got(2)
    assert(r3.getDouble(2) == 1.5 && r3.getInt(3) == 480 &&
      r3.getLong(5) == 30 && r3.getLong(6) == 0)
    assert(got(3).getLong(6) == 400)
  }
}
