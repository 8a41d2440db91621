package graft

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.grib.Jpeg2000

/** Layered round-trip coverage for the pure-JVM JPEG 2000 codec (GRIB2
  * template 5.40). Layering matters: the full encode->decode cycle alone
  * could hide a compensating bug pair, so the DWT is also proven
  * self-inverse in isolation, and the codec is driven across shapes that
  * stress each Tier-1/Tier-2 edge (stripe remainders, run-length columns,
  * multi-codeblock bands, degenerate 1-pixel-wide subbands, empty
  * resolutions).
  */
class Jpeg2000Spec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, depth: Int, levels: Int,
      gen: Int => Long): Unit = {
    val samples = Array.tabulate(w * h)(gen)
    val cs = Jpeg2000.encode(w, h, depth, samples, levels)
    val img = Jpeg2000.decode(cs)
    assert(img.width == w && img.height == h && img.depth == depth)
    assert(img.samples.sameElements(samples),
      s"lossless mismatch at ${w}x$h depth=$depth levels=$levels")
  }

  test("5/3 DWT is exactly self-inverse across shapes and levels") {
    // Driven through the public API at depth high enough that every
    // coefficient path (odd dims, length-1 rows/columns) is exercised.
    val rnd = new Random(7)
    for {
      (w, h) <- Seq((1, 1), (2, 1), (1, 2), (3, 3), (5, 1), (1, 7), (7, 5),
        (16, 16), (65, 33), (100, 3))
      levels <- Seq(0, 1, 2, 5)
    } roundTrip(w, h, 12, levels, _ => rnd.nextInt(1 << 12).toLong)
  }

  test("lossless round-trip at representative GRIB depths") {
    val rnd = new Random(42)
    for (depth <- Seq(1, 2, 8, 12, 16, 24)) {
      roundTrip(30, 20, depth, 2, _ => (rnd.nextLong() & Long.MaxValue) % (1L << depth))
    }
  }

  test("constant and near-constant fields (all-zero codeblocks, RL mode)") {
    roundTrip(64, 64, 16, 5, _ => 0L)           // nothing significant anywhere
    roundTrip(64, 64, 16, 5, _ => 12345L)       // constant: only LL carries data
    roundTrip(50, 40, 8, 2, i => if (i == 999) 200L else 0L) // single spike
  }

  test("multi-codeblock bands (image larger than 64x64)") {
    val rnd = new Random(3)
    roundTrip(150, 130, 16, 2, _ => rnd.nextInt(1 << 16).toLong)
    roundTrip(129, 65, 10, 1, _ => rnd.nextInt(1 << 10).toLong)
  }

  test("extreme dynamic range: alternating min/max (worst-case DWT growth)") {
    for (depth <- Seq(8, 16, 24))
      roundTrip(33, 17, depth, 3, i => if (i % 2 == 0) 0L else (1L << depth) - 1)
  }

  test("single-row and single-column images (the bitmap n x 1 layout)") {
    val rnd = new Random(11)
    roundTrip(200, 1, 16, 0, _ => rnd.nextInt(1 << 16).toLong)
    roundTrip(200, 1, 16, 3, _ => rnd.nextInt(1 << 16).toLong)
    roundTrip(1, 97, 12, 2, _ => rnd.nextInt(1 << 12).toLong)
  }

  test("smooth gradient (typical geophysical field, deep wavelet cascade)") {
    roundTrip(80, 60, 16, 5, i => {
      val x = i % 80; val y = i / 80
      (1000 + 40 * x + 25 * y + ((x * y) % 7)).toLong
    })
  }

  private def roundTrip97(w: Int, h: Int, depth: Int, levels: Int,
      gen: Int => Long, tol: Long = 1L): Unit = {
    val samples = Array.tabulate(w * h)(gen)
    val cs = Jpeg2000.encode(w, h, depth, samples, levels, irreversible = true)
    val img = Jpeg2000.decode(cs)
    assert(img.width == w && img.height == h && img.depth == depth)
    val maxErr = img.samples.zip(samples).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= tol,
      s"9/7 max error $maxErr > $tol at ${w}x$h depth=$depth levels=$levels")
  }

  test("9/7 irreversible round-trip stays inside the quantizer tolerance") {
    // smooth geophysical-style field: the archived-ECMWF lossy shape
    roundTrip97(80, 60, 16, 5, i => {
      val x = i % 80; val y = i / 80
      (1000 + 40 * x + 25 * y + ((x * y) % 7)).toLong
    })
    // odd dims, shallow + deep cascades, multi-codeblock band
    val rnd = new Random(19)
    roundTrip97(65, 33, 12, 2, _ => rnd.nextInt(1 << 12).toLong, tol = 2L)
    roundTrip97(150, 130, 10, 3, i => ((i % 150) * 3 + (i / 150) * 2).toLong)
    roundTrip97(7, 5, 8, 1, i => (i * 9 % 251).toLong)
    // constant field: only LL carries data, everything else run-length
    roundTrip97(64, 64, 16, 5, _ => 12345L, tol = 0L)
  }

  test("directed error narrowed: derived quantization, not the 9/7 transform") {
    val cs = Jpeg2000.encode(16, 16, 8,
      Array.tabulate(256)(i => (i % 200).toLong), 2, irreversible = true)
    // mutate Sqcd (first QCD body byte) from expounded (2) to derived (1)
    val qcdAt = {
      var i = 0
      while (!((cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x5c)) i += 1
      i
    }
    val mutated = cs.clone()
    mutated(qcdAt + 4) = (((mutated(qcdAt + 4) & 0xff) & 0xe0) | 1).toByte
    val e = intercept[graft.sources.grib.Grib1.UnsupportedGrib] {
      Jpeg2000.decode(mutated)
    }
    assert(e.getMessage.contains("derived"), e.getMessage)
  }

  test("multiple tile-parts of the single tile concatenate to the same image") {
    val rnd = new Random(41)
    val (w, h, depth, levels) = (90, 70, 12, 3)
    val samples = Array.tabulate(w * h) { i =>
      (800 + 40.0 * math.sin(i / 97.0) + rnd.nextInt(9)).toLong
    }
    val single = Jpeg2000.encode(w, h, depth, samples, levels)
    // every legal split count: 2 parts up to one packet per part
    (2 to levels + 1).foreach { parts =>
      val cs = Jpeg2000.encode(w, h, depth, samples, levels, tileParts = parts)
      // structurally: `parts` SOT markers, sequential TPsot, TNsot = parts
      def u16(i: Int): Int = ((cs(i) & 0xff) << 8) | (cs(i + 1) & 0xff)
      var sots = 0
      var p = 0
      while (p + 1 < cs.length) {
        if (u16(p) == 0xff90) {
          // SOT: Lsot(+2) Isot(+4) Psot(u32 at +6) TPsot(+10) TNsot(+11)
          assert((cs(p + 10) & 0xff) == sots, s"TPsot order at part $sots")
          assert((cs(p + 11) & 0xff) == parts, "TNsot")
          sots += 1
          val psot = ((cs(p + 6) & 0xff) << 24) | ((cs(p + 7) & 0xff) << 16) |
            ((cs(p + 8) & 0xff) << 8) | (cs(p + 9) & 0xff)
          p += psot // Psot spans SOT through the end of the tile-part
        } else p += 1
      }
      assert(sots == parts, s"expected $parts SOT markers")
      val img = Jpeg2000.decode(cs)
      assert(img.samples.sameElements(samples), s"$parts tile-parts mismatch")
      // the split stream carries the same packet bytes as the single-part one
      assert(cs.length == single.length + (parts - 1) * 14,
        "tile-parts add exactly one SOT+SOD header per extra part")
    }
    // out-of-order TPsot is a directed error, not silent misdecode
    val two = Jpeg2000.encode(w, h, depth, samples, levels, tileParts = 2)
    // find the second SOT and overwrite its TPsot with 0
    var p = 2
    var seen = 0
    var secondSot = -1
    while (secondSot < 0 && p + 1 < two.length) {
      if (((two(p) & 0xff) << 8 | (two(p + 1) & 0xff)) == 0xff90) {
        seen += 1
        if (seen == 2) secondSot = p else p += 2
      } else p += 1
    }
    assert(secondSot > 0)
    two(secondSot + 10) = 0
    val err = intercept[Exception](Jpeg2000.decode(two))
    assert(err.getMessage.contains("tile-part order"), err.getMessage)
  }

  test("multi-tile codestreams: tile grid round-trips bit-exact, edge tiles included") {
    val rnd = new Random(43)
    val (w, h, depth, levels) = (90, 70, 12, 3)
    val samples = Array.tabulate(w * h) { i =>
      (700 + 30.0 * math.cos(i / 53.0) + rnd.nextInt(17)).toLong
    }
    // 2x2 grid with ragged right/bottom tiles (48+42 x 40+30), and a
    // degenerate-direction 3x1 grid; both must reproduce the image exactly
    for ((txs, tys) <- Seq((48, 40), (32, 70))) {
      val cs = Jpeg2000.encode(w, h, depth, samples, levels,
        tileSize = Some((txs, tys)))
      val ntx = (w + txs - 1) / txs
      val nty = (h + tys - 1) / tys
      def u16(i: Int): Int = ((cs(i) & 0xff) << 8) | (cs(i + 1) & 0xff)
      // SIZ carries the tile grid (XTsiz at body+18, YTsiz at +22; SIZ body
      // starts at offset 6: SOC(2) + marker(2) + Lsiz(2))
      assert((u16(24) << 16 | u16(26)) == txs, "XTsiz")
      assert((u16(28) << 16 | u16(30)) == tys, "YTsiz")
      // one SOT per tile, raster Isot order, single tile-part each
      var p = 0
      var isots = List.empty[Int]
      while (p + 1 < cs.length) {
        if (u16(p) == 0xff90) {
          isots ::= u16(p + 4)
          assert((cs(p + 10) & 0xff) == 0 && (cs(p + 11) & 0xff) == 1,
            "TPsot/TNsot of a one-part tile")
          val psot = ((cs(p + 6) & 0xff) << 24) | ((cs(p + 7) & 0xff) << 16) |
            ((cs(p + 8) & 0xff) << 8) | (cs(p + 9) & 0xff)
          p += psot
        } else p += 1
      }
      assert(isots.reverse == (0 until ntx * nty).toList,
        s"Isot sequence for ${ntx}x$nty grid")
      val img = Jpeg2000.decode(cs)
      assert(img.width == w && img.height == h)
      assert(img.samples.sameElements(samples),
        s"multi-tile ${ntx}x$nty round-trip mismatch")
    }
    // a missing tile is a directed error, not a silently-black region:
    // truncate the last tile (its SOT..EOC span) and re-terminate
    val cs = Jpeg2000.encode(w, h, depth, samples, levels, tileSize = Some((48, 40)))
    def u16At(a: Array[Byte], i: Int): Int = ((a(i) & 0xff) << 8) | (a(i + 1) & 0xff)
    var p = 0
    var lastSot = -1
    while (p + 1 < cs.length) {
      if (u16At(cs, p) == 0xff90) {
        lastSot = p
        val psot = ((cs(p + 6) & 0xff) << 24) | ((cs(p + 7) & 0xff) << 16) |
          ((cs(p + 8) & 0xff) << 8) | (cs(p + 9) & 0xff)
        p += psot
      } else p += 1
    }
    val truncated = cs.take(lastSot) ++ Array[Byte](0xff.toByte, 0xd9.toByte)
    val err = intercept[Exception](Jpeg2000.decode(truncated))
    assert(err.getMessage.contains("missing tile"), err.getMessage)
    // 9/7 lossy multi-tile stays inside the quantizer tolerance per tile
    val lossy = Jpeg2000.decode(Jpeg2000.encode(w, h, depth, samples, levels,
      irreversible = true, tileSize = Some((48, 40))))
    val maxErr = samples.indices.map(i => math.abs(lossy.samples(i) - samples(i))).max
    assert(maxErr <= 2, s"9/7 multi-tile max error $maxErr")
  }

  test("compression is real on smooth data (not a stored-bytes shell)") {
    val w = 100; val h = 80
    val samples = Array.tabulate(w * h)(i => (500 + (i % w) + (i / w)).toLong)
    val cs = Jpeg2000.encode(w, h, 16, samples, 5)
    assert(cs.length < w * h * 2 / 4,
      s"smooth 16-bit field should compress well below raw (got ${cs.length} of ${w * h * 2})")
  }
}
