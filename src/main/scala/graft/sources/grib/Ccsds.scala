package graft.sources.grib

import scala.collection.mutable.ArrayBuffer

import graft.sources.grib.Grib1.UnsupportedGrib

/** CCSDS 121.0-B lossless coding (the "AEC"/libaec algorithm) for GRIB2
  * data representation template 5.42 — ECMWF's operational packing for new
  * GRIB2 output (the reference reads it free via eccodes+libaec,
  * weather_mv/loader_pipeline/sinks.py:371-389). Pure JVM, both directions,
  * implementing the public spec (CCSDS 121.0-B-3):
  *
  *  - samples preprocessed by the unit-delay predictor + standard mapper,
  *    the reference sample transmitted raw at each reference sample
  *    interval (RSI);
  *  - per-block adaptive options: zero-block runs (incl. remainder-of-
  *    segment), second extension, fundamental sequence (k = 0), sample
  *    splitting k, and no-compression, chosen per J-sample block;
  *  - option ID width follows the dynamic range (3/4/5 bits for
  *    n <= 8/16/32).
  *
  * Scope: unsigned samples with the preprocessor — the form GRIB 5.42
  * carries (X values are non-negative scaled offsets). The restricted
  * low-range code option and the MSB/3-byte uncoded-I/O framing flags do
  * not affect the coded stream GRIB embeds. */
object Ccsds {

  final case class Params(
      bitsPerSample: Int, // n: dynamic range of the samples
      blockSize: Int,     // J: samples per coded block
      rsi: Int,           // blocks per reference sample interval
      preprocess: Boolean)

  private val SegmentBlocks = 64 // zero-run segment span (ROS scope)

  private def idLen(n: Int): Int =
    if (n <= 8) 3 else if (n <= 16) 4 else 5

  // ---------------------------------------------------------------- bit io

  private final class BitIn(b: Array[Byte]) {
    private var pos = 0L
    def bits(n: Int): Long = {
      var v = 0L
      var i = 0
      while (i < n) {
        v = (v << 1) | ((b((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1)
        pos += 1
        i += 1
      }
      v
    }
    /** Fundamental-sequence codeword: m zeros then a one -> value m. */
    def fs(): Long = {
      var m = 0L
      while (((b((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1) == 0) {
        m += 1
        pos += 1
        if ((pos >> 3) >= b.length) throw UnsupportedGrib("truncated CCSDS stream")
      }
      pos += 1
      m
    }
  }

  private final class BitOut {
    private val buf = ArrayBuffer.empty[Byte]
    private var cur = 0
    private var nbits = 0
    def bits(v: Long, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >> i) & 1L).toInt
        nbits += 1
        if (nbits == 8) { buf += cur.toByte; cur = 0; nbits = 0 }
        i -= 1
      }
    }
    def fs(m: Long): Unit = {
      var i = 0L
      while (i < m) { bits(0, 1); i += 1 }
      bits(1, 1)
    }
    def result(): Array[Byte] = {
      if (nbits > 0) { buf += (cur << (8 - nbits)).toByte; cur = 0; nbits = 0 }
      buf.toArray
    }
  }

  // ----------------------------------------------------------- preprocess

  /** Standard mapper: prediction delta vs previous sample -> non-negative
    * mapped value; theta = min(x_prev, M - x_prev). */
  private def mapDelta(xPrev: Long, x: Long, maxVal: Long): Long = {
    val delta = x - xPrev
    val theta = math.min(xPrev, maxVal - xPrev)
    if (delta >= -theta && delta <= theta) {
      if (delta >= 0) 2 * delta else -2 * delta - 1
    } else theta + math.abs(delta)
  }

  private def unmapDelta(xPrev: Long, d: Long, maxVal: Long): Long = {
    val theta = math.min(xPrev, maxVal - xPrev)
    if (d <= 2 * theta) {
      if ((d & 1L) == 0) xPrev + d / 2 else xPrev - (d + 1) / 2
    } else {
      if (theta == xPrev) xPrev + (d - theta) // closer to 0: delta positive
      else xPrev - (d - theta)                // closer to max: delta negative
    }
  }

  /** Second-extension pair index: m = (d0+d1)(d0+d1+1)/2 + d1. */
  private def seIndex(d0: Long, d1: Long): Long =
    (d0 + d1) * (d0 + d1 + 1) / 2 + d1

  private def seUnpair(m: Long): (Long, Long) = {
    var t = 0L
    while ((t + 1) * (t + 2) / 2 <= m) t += 1
    val d1 = m - t * (t + 1) / 2
    (t - d1, d1)
  }

  // ---------------------------------------------------------------- decode

  /** Decode `nSamples` unsigned samples. */
  def decode(data: Array[Byte], p: Params, nSamples: Int): Array[Long] = {
    require(p.bitsPerSample >= 1 && p.bitsPerSample <= 32,
      s"CCSDS bits per sample ${p.bitsPerSample}")
    val n = p.bitsPerSample
    val J = p.blockSize
    val maxVal = (1L << n) - 1
    val in = new BitIn(data)
    val out = new Array[Long](nSamples)
    val id = idLen(n)
    val uncompId = (1 << id) - 1
    var sample = 0
    while (sample < nSamples) {
      val rsiBlocks = math.min(p.rsi, (nSamples - sample + J - 1) / J)
      var block = 0
      var xPrev = 0L
      def put(i: Int, d: Long): Unit = {
        val v = if (p.preprocess) unmapDelta(xPrev, d, maxVal) else d
        out(sample + i) = v
        xPrev = v
      }
      while (block < rsiBlocks && sample < nSamples) {
        val isRef = p.preprocess && block == 0
        val bs = math.min(J, nSamples - sample)
        val opt = in.bits(id).toInt
        if (opt == uncompId) {
          // no compression: raw samples; xPrev continuity from the last one
          var i = 0
          while (i < bs) {
            val raw = in.bits(n)
            out(sample + i) = raw
            xPrev = raw
            i += 1
          }
          sample += bs
          block += 1
        } else if (opt == 0) {
          val second = in.bits(1)
          if (isRef) { xPrev = in.bits(n); out(sample) = xPrev }
          val start = if (isRef) 1 else 0
          if (second == 0) {
            // zero-block run: q+1 in 1..4 literal, 5 = ROS, > 5 -> q blocks
            val q = in.fs()
            val requested =
              if (q + 1 <= 4) (q + 1).toInt
              else if (q + 1 == 5) SegmentBlocks - (block % SegmentBlocks)
              else q.toInt
            var zb = 0
            val runLimit = math.min(requested, rsiBlocks - block)
            while (zb < runLimit && sample < nSamples) {
              val bsz = math.min(J, nSamples - sample)
              var i = if (zb == 0) start else 0
              while (i < bsz) { put(i, 0L); i += 1 }
              sample += bsz
              zb += 1
            }
            block += zb
          } else {
            // second extension: pairs aligned to the block grid; a ref
            // block's first pair carries only sample 1
            var i = start
            while (i < bs) {
              val (d0, d1) = seUnpair(in.fs())
              if (i % 2 == 1) { put(i, d1); i += 1 }
              else {
                put(i, d0); i += 1
                if (i < bs) { put(i, d1); i += 1 }
              }
            }
            sample += bs
            block += 1
          }
        } else {
          // sample splitting, k = opt - 1 (k = 0 = fundamental sequence)
          val k = opt - 1
          if (isRef) { xPrev = in.bits(n); out(sample) = xPrev }
          val start = if (isRef) 1 else 0
          val ds = new Array[Long](bs)
          var i = start
          while (i < bs) { ds(i) = in.fs() << k; i += 1 }
          if (k > 0) {
            i = start
            while (i < bs) { ds(i) |= in.bits(k); i += 1 }
          }
          i = start
          while (i < bs) { put(i, ds(i)); i += 1 }
          sample += bs
          block += 1
        }
      }
    }
    out
  }

  // ---------------------------------------------------------------- encode

  private final case class Blk(abs: Array[Long], ds: Array[Long], isRef: Boolean)

  /** Encode unsigned samples (each must fit `bitsPerSample`). */
  def encode(xs: Array[Long], p: Params): Array[Byte] = {
    val n = p.bitsPerSample
    val J = p.blockSize
    val maxVal = (1L << n) - 1
    require(xs.forall(x => x >= 0 && x <= maxVal), "sample out of range")
    val outB = new BitOut
    val id = idLen(n)
    val uncompId = (1 << id) - 1
    val maxK = math.max(0, math.min(n - 1, uncompId - 2)) // id = k+1 <= 2^id-2

    var sample = 0
    while (sample < xs.length) {
      val rsiBlocks = math.min(p.rsi, (xs.length - sample + J - 1) / J)
      // map this interval's blocks
      val blocks = ArrayBuffer.empty[Blk]
      var xPrev = 0L
      var s = sample
      var b = 0
      while (b < rsiBlocks && s < xs.length) {
        val bs = math.min(J, xs.length - s)
        val isRef = p.preprocess && b == 0
        val abs = new Array[Long](bs)
        val ds = new Array[Long](bs)
        var i = 0
        while (i < bs) {
          val x = xs(s + i)
          abs(i) = x
          if (p.preprocess) {
            if (isRef && i == 0) { ds(i) = 0; xPrev = x }
            else { ds(i) = mapDelta(xPrev, x, maxVal); xPrev = x }
          } else ds(i) = x
          i += 1
        }
        blocks += Blk(abs, ds, isRef)
        s += bs
        b += 1
      }
      // emit, folding zero runs
      var bi = 0
      while (bi < blocks.size) {
        val blk = blocks(bi)
        val start = if (blk.isRef) 1 else 0
        val codedZero = (start until blk.ds.length).forall(blk.ds(_) == 0L)
        if (codedZero) {
          var run = 1
          while (bi + run < blocks.size && {
            val nb = blocks(bi + run)
            !nb.isRef && nb.ds.forall(_ == 0L)
          } && (bi % SegmentBlocks) + run < SegmentBlocks) run += 1
          outB.bits(0, id); outB.bits(0, 1)
          if (blk.isRef) outB.bits(blk.abs(0), n)
          val toSegmentEnd = SegmentBlocks - (bi % SegmentBlocks)
          if (run == toSegmentEnd && bi + run < blocks.size) outB.fs(4) // ROS
          else if (run <= 4) outB.fs(run - 1)
          else outB.fs(run) // q = run decodes back to run for q+1 > 5
          bi += run
        } else {
          // cost the candidate options
          var bestK = 0
          var splitBits = Long.MaxValue
          var k = 0
          while (k <= maxK) {
            var cost = 0L
            var i = start
            while (i < blk.ds.length) { cost += (blk.ds(i) >> k) + 1 + k; i += 1 }
            if (cost < splitBits) { splitBits = cost; bestK = k }
            k += 1
          }
          var seBits = 1L
          var seOk = true
          var i = start
          while (i < blk.ds.length && seOk) {
            val m =
              if (i % 2 == 1) seIndex(0L, blk.ds(i))
              else seIndex(blk.ds(i),
                if (i + 1 < blk.ds.length) blk.ds(i + 1) else 0L)
            if (m > 8L * p.blockSize * p.bitsPerSample) seOk = false
            seBits += m + 1
            i += (if (i % 2 == 1) 1 else 2)
          }
          val uncompBits = blk.ds.length.toLong * n - (if (blk.isRef) n else 0)
          val seTotal = if (seOk) seBits else Long.MaxValue
          if (uncompBits <= splitBits && uncompBits <= seTotal) {
            outB.bits(uncompId, id)
            var j = 0
            while (j < blk.abs.length) { outB.bits(blk.abs(j), n); j += 1 }
          } else if (seTotal < splitBits) {
            outB.bits(0, id); outB.bits(1, 1)
            if (blk.isRef) outB.bits(blk.abs(0), n)
            var j = start
            while (j < blk.ds.length) {
              if (j % 2 == 1) { // ref block's first pair: only sample 1
                outB.fs(seIndex(0L, blk.ds(j))); j += 1
              } else {
                outB.fs(seIndex(blk.ds(j),
                  if (j + 1 < blk.ds.length) blk.ds(j + 1) else 0L))
                j += 2
              }
            }
          } else {
            outB.bits(bestK + 1, id)
            if (blk.isRef) outB.bits(blk.abs(0), n)
            var j = start
            while (j < blk.ds.length) { outB.fs(blk.ds(j) >> bestK); j += 1 }
            if (bestK > 0) {
              j = start
              while (j < blk.ds.length) {
                outB.bits(blk.ds(j) & ((1L << bestK) - 1), bestK); j += 1
              }
            }
          }
          bi += 1
        }
      }
      sample = s
    }
    outB.result()
  }
}
