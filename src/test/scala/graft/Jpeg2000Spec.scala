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

  test("directed error for the 9/7 irreversible (lossy) transform") {
    val cs = Jpeg2000.encode(8, 8, 8, Array.fill(64)(5L), 1)
    // Flip SPcod transform byte (last byte of COD) from 1 (5/3) to 0 (9/7).
    val codAt = {
      var i = 0
      while (!((cs(i) & 0xff) == 0xff && (cs(i + 1) & 0xff) == 0x52)) i += 1
      i
    }
    val lcod = ((cs(codAt + 2) & 0xff) << 8) | (cs(codAt + 3) & 0xff)
    val mutated = cs.clone()
    mutated(codAt + 2 + lcod - 1) = 0
    val e = intercept[graft.sources.grib.Grib1.UnsupportedGrib] {
      Jpeg2000.decode(mutated)
    }
    assert(e.getMessage.contains("9/7"))
  }

  test("compression is real on smooth data (not a stored-bytes shell)") {
    val w = 100; val h = 80
    val samples = Array.tabulate(w * h)(i => (500 + (i % w) + (i / w)).toLong)
    val cs = Jpeg2000.encode(w, h, 16, samples, 5)
    assert(cs.length < w * h * 2 / 4,
      s"smooth 16-bit field should compress well below raw (got ${cs.length} of ${w * h * 2})")
  }
}
