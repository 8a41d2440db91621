package graft.sources.grib

import java.io.ByteArrayOutputStream

import graft.sources.grib.Grib1.UnsupportedGrib

/** Pure-JVM JPEG 2000 Part-1 (ISO/IEC 15444-1 / ITU-T T.800) codestream
  * codec for GRIB2 data representation template 5.40 (JPEG2000 packing) —
  * the packing the reference reads for free through eccodes+openjpeg
  * (weather_mv/loader_pipeline/sinks.py:371-389).
  *
  * Scope: the profile eccodes emits and operational GRIB archives carry —
  * any regular tile grid (each tile in any number of tile-parts,
  * concatenated in TPsot order; tiles decode independently and stitch),
  * one component, one quality layer, reversible 5/3 wavelet
  * (lossless) OR irreversible 9/7 (the lossy coding some archived ECMWF
  * dissemination streams use) with expounded scalar quantization, 64x64
  * codeblocks, default (whole-subband) precincts, no coder
  * bypass/reset/termall options. Within that profile both directions are
  * implemented from the public spec:
  *
  *  - MQ arithmetic coder (T.800 Annex C, the 47-state Qe table);
  *  - EBCOT Tier-1 bitplane coding (Annex D): significance propagation,
  *    magnitude refinement and cleanup passes, run-length mode, sign
  *    contexts;
  *  - Tier-2 packet headers (Annex B): inclusion + zero-bitplane tag
  *    trees, coding-pass codewords, Lblock length signalling, FF-stuffed
  *    bit packing;
  *  - reversible 5/3 lifting DWT and irreversible 9/7 float lifting
  *    (Annex F) with symmetric extension; deadzone quantization +
  *    midpoint dequantization (Annex E, expounded style);
  *  - codestream markers: SOC/SIZ/COD/QCD/COM/SOT/SOD/EOC.
  *
  * Anything outside the profile (multiple components, precinct
  * partitions, derived quantization, RGN/POC/PPM) raises a directed
  * [[UnsupportedGrib]] naming the feature, same policy as the other GRIB
  * codecs here.
  */
private[graft] object Jpeg2000 {

  final case class Image(width: Int, height: Int, depth: Int, samples: Array[Long])

  // ------------------------------------------------------------------ limits

  private val MaxDim = 1 << 20
  private val MaxDepth = 28 // keeps 5/3 coefficients comfortably in Int

  // ------------------------------------------------ MQ coder (T.800 Annex C)

  // 47-state probability table: Qe, next-state MPS, next-state LPS, switch.
  private val QeTab = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val NmpsTab = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18, 19, 20,
    21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38,
    39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val NlpsTab = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15, 16, 17,
    18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val SwitchTab = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  // Context indices (19 total): 0-8 zero coding, 9-13 sign, 14-16 magnitude
  // refinement, 17 run-length, 18 uniform.
  private val CtxSc0 = 9
  private val CtxMr0 = 14
  private val CtxRl = 17
  private val CtxUni = 18
  private val NCtx = 19

  private def freshStates(): Array[Int] = {
    val s = new Array[Int](NCtx)
    s(0) = 4; s(CtxRl) = 3; s(CtxUni) = 46
    s
  }

  /** MQ encoder, software conventions of T.800 C.2 (one sentinel byte at
    * the head of the buffer absorbs the init-time "byte before the data";
    * it must still be zero at flush). */
  private final class MqEncoder {
    private val states = freshStates()
    private val mps = new Array[Int](NCtx)
    private var a = 0x8000
    private var c = 0
    private var ct = 12
    private var buf = new Array[Byte](64)
    private var n = 1 // buf(0) is the sentinel

    private def push(v: Int): Unit = {
      if (n == buf.length) buf = java.util.Arrays.copyOf(buf, n * 2)
      buf(n) = v.toByte
      n += 1
    }

    private def byteOut(): Unit = {
      val last = buf(n - 1) & 0xff
      if (last == 0xff) {
        push((c >> 20) & 0xff); c &= 0xfffff; ct = 7
      } else if ((c & 0x8000000) == 0) {
        push((c >> 19) & 0xff); c &= 0x7ffff; ct = 8
      } else {
        buf(n - 1) = (last + 1).toByte // propagate the carry
        if ((buf(n - 1) & 0xff) == 0xff) {
          c &= 0x7ffffff
          push((c >> 20) & 0xff); c &= 0xfffff; ct = 7
        } else {
          push((c >> 19) & 0xff); c &= 0x7ffff; ct = 8
        }
      }
    }

    private def renorm(): Unit = {
      while ({
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteOut()
        (a & 0x8000) == 0
      }) ()
    }

    def encode(cx: Int, d: Int): Unit = {
      val i = states(cx)
      val qe = QeTab(i)
      if (d == mps(cx)) {
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          states(cx) = NmpsTab(i)
          renorm()
        } else c += qe
      } else {
        a -= qe
        if (a < qe) c += qe else a = qe
        if (SwitchTab(i) == 1) mps(cx) = 1 - mps(cx)
        states(cx) = NlpsTab(i)
        renorm()
      }
    }

    def flush(): Array[Byte] = {
      // SETBITS then two byteouts (C.2.9)
      val tempc = c + a
      c |= 0xffff
      if (c >= tempc) c -= 0x8000
      c <<= ct; byteOut()
      c <<= ct; byteOut()
      require(buf(0) == 0, "MQ carry escaped into the sentinel byte")
      var end = n
      if ((buf(end - 1) & 0xff) == 0xff) end -= 1 // trailing FF is implicit
      java.util.Arrays.copyOfRange(buf, 1, end)
    }
  }

  /** MQ decoder (T.800 C.3); reads past the end as 0xFF/1-bits, the
    * spec's marker-terminated convention. */
  private final class MqDecoder(data: Array[Byte], off: Int, len: Int) {
    private val states = freshStates()
    private val mps = new Array[Int](NCtx)
    private var bp = off
    private val end = off + len
    private var c = 0
    private var ct = 0
    private var a = 0

    private def byteAt(i: Int): Int = if (i < end) data(i) & 0xff else 0xff

    private def byteIn(): Unit = {
      if (byteAt(bp) == 0xff) {
        if (byteAt(bp + 1) > 0x8f) { c += 0xff00; ct = 8 }
        else { bp += 1; c += byteAt(bp) << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp) << 8; ct = 8 }
    }

    // INITDEC
    c = byteAt(bp) << 16
    byteIn()
    c <<= 7; ct -= 7; a = 0x8000

    private def renorm(): Unit = {
      while ({
        if (ct == 0) byteIn()
        a <<= 1; c <<= 1; ct -= 1
        (a & 0x8000) == 0
      }) ()
    }

    def decode(cx: Int): Int = {
      val i = states(cx)
      val qe = QeTab(i)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xffff) < qe) {
        // LPS exchange path
        if (a < qe) { a = qe; d = mps(cx); states(cx) = NmpsTab(i) }
        else {
          a = qe; d = 1 - mps(cx)
          if (SwitchTab(i) == 1) mps(cx) = 1 - mps(cx)
          states(cx) = NlpsTab(i)
        }
        renorm()
      } else {
        c -= qe << 16
        if ((a & 0x8000) == 0) {
          if (a < qe) {
            d = 1 - mps(cx)
            if (SwitchTab(i) == 1) mps(cx) = 1 - mps(cx)
            states(cx) = NlpsTab(i)
          } else { d = mps(cx); states(cx) = NmpsTab(i) }
          renorm()
        } else d = mps(cx)
      }
      d
    }
  }

  // ------------------------------------- packet-header bit I/O (FF stuffing)

  /** MSB-first bit writer; a byte following an emitted 0xFF carries only 7
    * bits (stuffed 0 in its MSB). A header never ends on 0xFF (B.10.1). */
  private final class HeadWriter {
    private val out = new ByteArrayOutputStream()
    private var cur = 0
    private var nbits = 0
    private var lastFF = false

    def bit(b: Int): Unit = {
      val cap = if (lastFF) 7 else 8
      cur = (cur << 1) | (b & 1)
      nbits += 1
      if (nbits == cap) {
        out.write(cur & 0xff)
        lastFF = (cur & 0xff) == 0xff
        cur = 0; nbits = 0
      }
    }

    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }

    /** Pad to a byte boundary; guarantee the header does not end on FF. */
    def alignFlush(): Array[Byte] = {
      if (nbits > 0) {
        val cap = if (lastFF) 7 else 8
        cur <<= (cap - nbits)
        out.write(cur & 0xff)
        lastFF = (cur & 0xff) == 0xff
        cur = 0; nbits = 0
      }
      if (lastFF) { out.write(0); lastFF = false }
      out.toByteArray
    }
  }

  /** Mirror reader for [[HeadWriter]]. */
  private final class HeadReader(data: Array[Byte], var pos: Int) {
    private var cur = 0
    private var nbits = 0
    private var lastFF = false

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= data.length) throw new UnsupportedGrib("JPEG2000 packet header truncated")
        cur = data(pos) & 0xff; pos += 1
        nbits = if (lastFF) 7 else 8
        if (lastFF) cur &= 0x7f
        lastFF = cur == 0xff && nbits == 8
      }
      nbits -= 1
      (cur >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def align(): Unit = {
      nbits = 0
      if (lastFF) { pos += 1; lastFF = false } // stuffed byte after a final FF
    }
  }

  // ------------------------------------------------- tag trees (T.800 B.10.2)

  private final class TagTree(val w: Int, val h: Int) {
    // levels(0) = leaves, levels(last) = single root; per-node (value, low, known)
    private val dims = {
      val b = Seq.newBuilder[(Int, Int)]
      var (cw, ch) = (math.max(w, 1), math.max(h, 1))
      b += ((cw, ch))
      while (cw > 1 || ch > 1) { cw = (cw + 1) / 2; ch = (ch + 1) / 2; b += ((cw, ch)) }
      b.result()
    }
    private val value = dims.map { case (a, b) => Array.fill(a * b)(0) }.toArray
    private val low = dims.map { case (a, b) => new Array[Int](a * b) }.toArray
    private val known = dims.map { case (a, b) => new Array[Boolean](a * b) }.toArray

    /** Encoder: fix leaf values, propagate min upward. */
    def setValues(leaves: Array[Int]): Unit = {
      require(leaves.length == w * h)
      System.arraycopy(leaves, 0, value(0), 0, leaves.length)
      var l = 1
      while (l < dims.length) {
        val (cw, ch) = dims(l)
        val (pw, ph) = dims(l - 1)
        var y = 0
        while (y < ch) {
          var x = 0
          while (x < cw) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val sx = 2 * x + dx; val sy = 2 * y + dy
                if (sx < pw && sy < ph) m = math.min(m, value(l - 1)(sy * pw + sx))
                dx += 1
              }
              dy += 1
            }
            value(l)(y * cw + x) = m
            x += 1
          }
          y += 1
        }
        l += 1
      }
    }

    private def path(x: Int, y: Int): Seq[(Int, Int)] = {
      // root-first list of (level, index)
      var cx = x; var cy = y
      val rev = Seq.newBuilder[(Int, Int)]
      var l = 0
      while (l < dims.length) {
        rev += ((l, cy * dims(l)._1 + cx))
        cx >>= 1; cy >>= 1; l += 1
      }
      rev.result().reverse
    }

    def encode(x: Int, y: Int, threshold: Int, w0: HeadWriter): Unit = {
      var lowBound = 0
      path(x, y).foreach { case (l, i) =>
        if (low(l)(i) < lowBound) low(l)(i) = lowBound
        while (!known(l)(i) && low(l)(i) < threshold) {
          if (low(l)(i) == value(l)(i)) { known(l)(i) = true; w0.bit(1) }
          else { low(l)(i) += 1; w0.bit(0) }
        }
        lowBound = if (known(l)(i)) value(l)(i) else low(l)(i)
      }
    }

    /** Returns (leafKnown, leafValueOrLow) after processing `threshold`. */
    def decode(x: Int, y: Int, threshold: Int, r: HeadReader): (Boolean, Int) = {
      var lowBound = 0
      var resKnown = false
      var resVal = 0
      path(x, y).foreach { case (l, i) =>
        if (low(l)(i) < lowBound) low(l)(i) = lowBound
        while (!known(l)(i) && low(l)(i) < threshold) {
          if (r.bit() == 1) { known(l)(i) = true; value(l)(i) = low(l)(i) }
          else low(l)(i) += 1
        }
        lowBound = if (known(l)(i)) value(l)(i) else low(l)(i)
        resKnown = known(l)(i); resVal = lowBound
      }
      (resKnown, resVal)
    }

    /** Decoder: raise thresholds until the leaf value is fully resolved. */
    def decodeValue(x: Int, y: Int, r: HeadReader): Int = {
      var t = 1
      var res = decode(x, y, t, r)
      while (!res._1) { t += 1; res = decode(x, y, t, r) }
      res._2
    }
  }

  // ------------------------------------------- 5/3 reversible DWT (Annex F)

  /** In-place interleaved 1D forward lift on n samples at (off, stride);
    * even absolute positions are low-pass (all our signals start at 0). */
  private def fwd1d(a: Array[Int], off: Int, stride: Int, n: Int): Unit = {
    if (n <= 1) return // single even sample: identity
    @inline def g(i: Int): Int = {
      // symmetric extension around 0 and n-1
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      a(off + j * stride)
    }
    var i = 1
    while (i < n) { a(off + i * stride) -= (g(i - 1) + g(i + 1)) >> 1; i += 2 }
    i = 0
    while (i < n) { a(off + i * stride) += (g(i - 1) + g(i + 1) + 2) >> 2; i += 2 }
  }

  private def inv1d(a: Array[Int], off: Int, stride: Int, n: Int): Unit = {
    if (n <= 1) return
    @inline def g(i: Int): Int = {
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      a(off + j * stride)
    }
    var i = 0
    while (i < n) { a(off + i * stride) -= (g(i - 1) + g(i + 1) + 2) >> 2; i += 2 }
    i = 1
    while (i < n) { a(off + i * stride) += (g(i - 1) + g(i + 1)) >> 1; i += 2 }
  }

  // --------------------------------------- 9/7 irreversible DWT (Annex F)

  // CDF 9/7 lifting constants (T.800 F.4.8.2). With the K scaling below the
  // subband nominal ranges match the 5/3 convention: a constant signal maps
  // to lowpass gain 1 (LL keeps the component's dynamic range) and a
  // Nyquist signal to highpass gain 2 (HL/LH +1 bit, HH +2), which is what
  // the QCD exponent arithmetic (Mb = eps_b + G - 1) assumes.
  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  private def fwd1d97(a: Array[Double], off: Int, stride: Int, n: Int): Unit = {
    if (n <= 1) return
    @inline def g(i: Int): Double = {
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      a(off + j * stride)
    }
    @inline def lift(start: Int, c: Double): Unit = {
      var i = start
      while (i < n) { a(off + i * stride) += c * (g(i - 1) + g(i + 1)); i += 2 }
    }
    lift(1, A97); lift(0, B97); lift(1, G97); lift(0, D97)
    var i = 0
    while (i < n) { a(off + i * stride) /= K97; i += 2 }
    i = 1
    while (i < n) { a(off + i * stride) *= K97; i += 2 }
  }

  private def inv1d97(a: Array[Double], off: Int, stride: Int, n: Int): Unit = {
    if (n <= 1) return
    var i = 0
    while (i < n) { a(off + i * stride) *= K97; i += 2 }
    i = 1
    while (i < n) { a(off + i * stride) /= K97; i += 2 }
    @inline def g(i: Int): Double = {
      val j = if (i < 0) -i else if (i >= n) 2 * n - 2 - i else i
      a(off + j * stride)
    }
    @inline def lift(start: Int, c: Double): Unit = {
      var k = start
      while (k < n) { a(off + k * stride) += c * (g(k - 1) + g(k + 1)); k += 2 }
    }
    lift(0, -D97); lift(1, -G97); lift(0, -B97); lift(1, -A97)
  }

  /** Forward 9/7 on doubles, same band split as [[fdwt]]. */
  private def fdwt97(plane: Array[Double], w: Int, h: Int,
      levels: Int): (Array[Array[Array[Double]]], Array[Double]) = {
    var cur = plane
    var cw = w; var ch = h
    val hi = new Array[Array[Array[Double]]](levels + 1)
    var l = 1
    while (l <= levels) {
      var x = 0
      while (x < cw) { fwd1d97(cur, x, cw, ch); x += 1 }
      var y = 0
      while (y < ch) { fwd1d97(cur, y * cw, 1, cw); y += 1 }
      val lw = ceilHalf(cw); val lh = ceilHalf(ch)
      val ll = new Array[Double](lw * lh)
      val hl = new Array[Double]((cw - lw) * lh)
      val lv = new Array[Double](lw * (ch - lh))
      val hh = new Array[Double]((cw - lw) * (ch - lh))
      y = 0
      while (y < ch) {
        x = 0
        while (x < cw) {
          val v = cur(y * cw + x)
          val ex = (x & 1) == 0; val ey = (y & 1) == 0
          if (ex && ey) ll((y >> 1) * lw + (x >> 1)) = v
          else if (!ex && ey) hl((y >> 1) * (cw - lw) + (x >> 1)) = v
          else if (ex && !ey) lv((y >> 1) * lw + (x >> 1)) = v
          else hh((y >> 1) * (cw - lw) + (x >> 1)) = v
          x += 1
        }
        y += 1
      }
      hi(l) = Array(hl, lv, hh)
      cur = ll; cw = lw; ch = lh
      l += 1
    }
    (hi, cur)
  }

  /** Inverse 9/7 on doubles, mirror of [[idwt]]. */
  private def idwt97(ll0: Array[Double], hi: Array[Array[Array[Double]]],
      w: Int, h: Int, levels: Int): Array[Double] = {
    def cdiv(n: Int, l: Int): Int = {
      var v = n; var i = 0
      while (i < l) { v = ceilHalf(v); i += 1 }
      v
    }
    var cur = ll0
    var l = levels
    while (l >= 1) {
      val pw = cdiv(w, l - 1); val ph = cdiv(h, l - 1)
      val lw = ceilHalf(pw); val lh = ceilHalf(ph)
      val Array(hl, lv, hh) = hi(l)
      val out = new Array[Double](pw * ph)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          val ex = (x & 1) == 0; val ey = (y & 1) == 0
          out(y * pw + x) =
            if (ex && ey) cur((y >> 1) * lw + (x >> 1))
            else if (!ex && ey) hl((y >> 1) * (pw - lw) + (x >> 1))
            else if (ex && !ey) lv((y >> 1) * lw + (x >> 1))
            else hh((y >> 1) * (pw - lw) + (x >> 1))
          x += 1
        }
        y += 1
      }
      y = 0
      while (y < ph) { inv1d97(out, y * pw, 1, pw); y += 1 }
      var x = 0
      while (x < pw) { inv1d97(out, x, pw, ph); x += 1 }
      cur = out
      l -= 1
    }
    cur
  }

  private def ceilHalf(n: Int): Int = (n + 1) / 2

  /** Band geometry at resolution r (0..levels) of a levels-deep transform of
    * a w x h tile: list of (orientation, bandW, bandH). Orientation: 0 LL,
    * 1 HL, 2 LH, 3 HH. */
  private def bandsAt(r: Int, levels: Int, w: Int, h: Int): Seq[(Int, Int, Int)] = {
    def cdiv(n: Int, l: Int): Int = {
      var v = n; var i = 0
      while (i < l) { v = ceilHalf(v); i += 1 }
      v
    }
    if (r == 0) Seq((0, cdiv(w, levels), cdiv(h, levels)))
    else {
      val l = levels - r + 1
      val pw = cdiv(w, l - 1); val ph = cdiv(h, l - 1)
      val lw = ceilHalf(pw); val lh = ceilHalf(ph)
      Seq((1, pw - lw, lh), (2, lw, ph - lh), (3, pw - lw, ph - lh))
    }
  }

  private def bandGain(orient: Int): Int = orient match {
    case 0 => 0
    case 1 | 2 => 1
    case 3 => 2
  }

  /** Forward DWT: returns (bands(level)(orient) coefficient arrays, final
    * LL). bands is indexed by decomposition level 1..levels, each holding
    * HL/LH/HH arrays in band raster order. */
  private def fdwt(plane: Array[Int], w: Int, h: Int,
      levels: Int): (Array[Array[Array[Int]]], Array[Int]) = {
    var cur = plane
    var cw = w; var ch = h
    val hi = new Array[Array[Array[Int]]](levels + 1)
    var l = 1
    while (l <= levels) {
      // vertical (columns) then horizontal (rows), per F.4.2
      var x = 0
      while (x < cw) { fwd1d(cur, x, cw, ch); x += 1 }
      var y = 0
      while (y < ch) { fwd1d(cur, y * cw, 1, cw); y += 1 }
      val lw = ceilHalf(cw); val lh = ceilHalf(ch)
      val ll = new Array[Int](lw * lh)
      val hl = new Array[Int]((cw - lw) * lh)
      val lv = new Array[Int](lw * (ch - lh))
      val hh = new Array[Int]((cw - lw) * (ch - lh))
      y = 0
      while (y < ch) {
        x = 0
        while (x < cw) {
          val v = cur(y * cw + x)
          val ex = (x & 1) == 0; val ey = (y & 1) == 0
          if (ex && ey) ll((y >> 1) * lw + (x >> 1)) = v
          else if (!ex && ey) hl((y >> 1) * (cw - lw) + (x >> 1)) = v
          else if (ex && !ey) lv((y >> 1) * lw + (x >> 1)) = v
          else hh((y >> 1) * (cw - lw) + (x >> 1)) = v
          x += 1
        }
        y += 1
      }
      hi(l) = Array(hl, lv, hh)
      cur = ll; cw = lw; ch = lh
      l += 1
    }
    (hi, cur)
  }

  /** Inverse DWT from per-level band arrays back to the full plane. */
  private def idwt(ll0: Array[Int], hi: Array[Array[Array[Int]]], w: Int,
      h: Int, levels: Int): Array[Int] = {
    def cdiv(n: Int, l: Int): Int = {
      var v = n; var i = 0
      while (i < l) { v = ceilHalf(v); i += 1 }
      v
    }
    var cur = ll0
    var l = levels
    while (l >= 1) {
      val pw = cdiv(w, l - 1); val ph = cdiv(h, l - 1)
      val lw = ceilHalf(pw); val lh = ceilHalf(ph)
      val Array(hl, lv, hh) = hi(l)
      val out = new Array[Int](pw * ph)
      var y = 0
      while (y < ph) {
        var x = 0
        while (x < pw) {
          val ex = (x & 1) == 0; val ey = (y & 1) == 0
          out(y * pw + x) =
            if (ex && ey) cur((y >> 1) * lw + (x >> 1))
            else if (!ex && ey) hl((y >> 1) * (pw - lw) + (x >> 1))
            else if (ex && !ey) lv((y >> 1) * lw + (x >> 1))
            else hh((y >> 1) * (pw - lw) + (x >> 1))
          x += 1
        }
        y += 1
      }
      // inverse of (vertical, horizontal): rows first, then columns
      y = 0
      while (y < ph) { inv1d(out, y * pw, 1, pw); y += 1 }
      var x = 0
      while (x < pw) { inv1d(out, x, pw, ph); x += 1 }
      cur = out
      l -= 1
    }
    cur
  }

  // --------------------------------------------- EBCOT Tier-1 (Annex D)

  // per-sample flag bits
  private val FSig = 1
  private val FVisit = 2
  private val FRefined = 4
  private val FNeg = 8

  private def zcCtx(orient: Int, hs: Int, vs: Int, ds: Int): Int = {
    val (h, v) = if (orient == 1) (vs, hs) else (hs, vs) // HL transposes
    if (orient == 3) {
      if (ds >= 3) 8
      else if (ds == 2) { if (h + v >= 1) 7 else 6 }
      else if (ds == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (ds >= 1) 6 else 5 }
      else {
        if (v == 2) 4 else if (v == 1) 3
        else if (ds >= 2) 2 else if (ds == 1) 1 else 0
      }
    }
  }

  private def scCtxXor(hc: Int, vc: Int): (Int, Int) = (hc, vc) match {
    case (1, 1) => (CtxSc0 + 4, 0)
    case (1, 0) => (CtxSc0 + 3, 0)
    case (1, -1) => (CtxSc0 + 2, 0)
    case (0, 1) => (CtxSc0 + 1, 0)
    case (0, 0) => (CtxSc0, 0)
    case (0, -1) => (CtxSc0 + 1, 1)
    case (-1, 1) => (CtxSc0 + 2, 1)
    case (-1, 0) => (CtxSc0 + 3, 1)
    case (-1, -1) => (CtxSc0 + 4, 1)
  }

  /** Shared T1 state: neighbor sums over the flags array. */
  private final class T1(val w: Int, val h: Int, val orient: Int) {
    val flags = new Array[Int](w * h)
    val mag = new Array[Int](w * h)

    @inline def sig(x: Int, y: Int): Int =
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else flags(y * w + x) & FSig

    @inline def signOf(x: Int, y: Int): Int = {
      // 0 insignificant, +1 significant positive, -1 significant negative
      if (x < 0 || y < 0 || x >= w || y >= h) 0
      else {
        val f = flags(y * w + x)
        if ((f & FSig) == 0) 0 else if ((f & FNeg) != 0) -1 else 1
      }
    }

    def zc(x: Int, y: Int): Int = {
      val hs = sig(x - 1, y) + sig(x + 1, y)
      val vs = sig(x, y - 1) + sig(x, y + 1)
      val ds = sig(x - 1, y - 1) + sig(x + 1, y - 1) + sig(x - 1, y + 1) + sig(x + 1, y + 1)
      zcCtx(orient, hs, vs, ds)
    }

    def sc(x: Int, y: Int): (Int, Int) = {
      val hc = math.max(-1, math.min(1, signOf(x - 1, y) + signOf(x + 1, y)))
      val vc = math.max(-1, math.min(1, signOf(x, y - 1) + signOf(x, y + 1)))
      scCtxXor(hc, vc)
    }

    def mrCtx(x: Int, y: Int): Int = {
      val f = flags(y * w + x)
      if ((f & FRefined) != 0) CtxMr0 + 2
      else {
        val any = sig(x - 1, y) + sig(x + 1, y) + sig(x, y - 1) + sig(x, y + 1) +
          sig(x - 1, y - 1) + sig(x + 1, y - 1) + sig(x - 1, y + 1) + sig(x + 1, y + 1)
        if (any > 0) CtxMr0 + 1 else CtxMr0
      }
    }

    def clearVisit(): Unit = {
      var i = 0
      while (i < flags.length) { flags(i) &= ~FVisit; i += 1 }
    }
  }

  /** Encode one codeblock of signed coefficients. Returns
    * (mqBytes, numbps, npasses); numbps == 0 means "not included". */
  private def encodeBlock(coef: Array[Int], w: Int, h: Int,
      orient: Int): (Array[Byte], Int, Int) = {
    var maxMag = 0
    var i = 0
    while (i < coef.length) {
      val m = math.abs(coef(i))
      if (m > maxMag) maxMag = m
      i += 1
    }
    val numbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    if (numbps == 0) return (Array.emptyByteArray, 0, 0)

    val t1 = new T1(w, h, orient)
    i = 0
    while (i < coef.length) {
      t1.mag(i) = math.abs(coef(i))
      if (coef(i) < 0) t1.flags(i) |= FNeg
      i += 1
    }
    val mq = new MqEncoder

    @inline def bitOf(idx: Int, p: Int): Int = (t1.mag(idx) >> p) & 1

    def codeSign(x: Int, y: Int): Unit = {
      val (cx, xr) = t1.sc(x, y)
      val s = if ((t1.flags(y * w + x) & FNeg) != 0) 1 else 0
      mq.encode(cx, s ^ xr)
    }

    def spp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if ((t1.flags(idx) & FSig) == 0 && t1.zc(x, y) != 0) {
              val b = bitOf(idx, p)
              mq.encode(t1.zc(x, y), b)
              if (b == 1) { t1.flags(idx) |= FSig; codeSign(x, y) }
              t1.flags(idx) |= FVisit
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            val f = t1.flags(idx)
            if ((f & FSig) != 0 && (f & FVisit) == 0) {
              mq.encode(t1.mrCtx(x, y), bitOf(idx, p))
              t1.flags(idx) |= FRefined
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cleanup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val full = y0 + 4 <= h
          var rlEligible = full
          if (full) {
            var k = 0
            while (rlEligible && k < 4) {
              val idx = (y0 + k) * w + x
              if ((t1.flags(idx) & (FSig | FVisit)) != 0 || t1.zc(x, y0 + k) != 0)
                rlEligible = false
              k += 1
            }
          }
          var yStart = y0
          if (rlEligible) {
            var first = -1
            var k = 0
            while (first < 0 && k < 4) {
              if (bitOf((y0 + k) * w + x, p) == 1) first = k
              k += 1
            }
            if (first < 0) {
              mq.encode(CtxRl, 0)
              yStart = y0 + 4 // column done
            } else {
              mq.encode(CtxRl, 1)
              mq.encode(CtxUni, (first >> 1) & 1)
              mq.encode(CtxUni, first & 1)
              val idx = (y0 + first) * w + x
              t1.flags(idx) |= FSig
              codeSign(x, y0 + first)
              yStart = y0 + first + 1
            }
          }
          var y = yStart
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if ((t1.flags(idx) & (FSig | FVisit)) == 0) {
              val b = bitOf(idx, p)
              mq.encode(t1.zc(x, y), b)
              if (b == 1) { t1.flags(idx) |= FSig; codeSign(x, y) }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      t1.clearVisit()
    }

    var p = numbps - 1
    cleanup(p)
    p -= 1
    while (p >= 0) { spp(p); mrp(p); cleanup(p); p -= 1 }
    (mq.flush(), numbps, 3 * numbps - 2)
  }

  /** Decode one codeblock: returns signed coefficients (row-major w x h). */
  private def decodeBlock(data: Array[Byte], off: Int, len: Int, w: Int,
      h: Int, orient: Int, numbps: Int, npasses: Int): Array[Int] = {
    val t1 = new T1(w, h, orient)
    val mq = new MqDecoder(data, off, len)

    def readSign(x: Int, y: Int): Unit = {
      val (cx, xr) = t1.sc(x, y)
      if ((mq.decode(cx) ^ xr) == 1) t1.flags(y * w + x) |= FNeg
    }

    def spp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if ((t1.flags(idx) & FSig) == 0 && t1.zc(x, y) != 0) {
              if (mq.decode(t1.zc(x, y)) == 1) {
                t1.flags(idx) |= FSig
                t1.mag(idx) |= 1 << p
                readSign(x, y)
              }
              t1.flags(idx) |= FVisit
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def mrp(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          var y = y0
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            val f = t1.flags(idx)
            if ((f & FSig) != 0 && (f & FVisit) == 0) {
              t1.mag(idx) |= mq.decode(t1.mrCtx(x, y)) << p
              t1.flags(idx) |= FRefined
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
    }

    def cleanup(p: Int): Unit = {
      var y0 = 0
      while (y0 < h) {
        var x = 0
        while (x < w) {
          val full = y0 + 4 <= h
          var rlEligible = full
          if (full) {
            var k = 0
            while (rlEligible && k < 4) {
              val idx = (y0 + k) * w + x
              if ((t1.flags(idx) & (FSig | FVisit)) != 0 || t1.zc(x, y0 + k) != 0)
                rlEligible = false
              k += 1
            }
          }
          var yStart = y0
          if (rlEligible) {
            if (mq.decode(CtxRl) == 0) yStart = y0 + 4
            else {
              val first = (mq.decode(CtxUni) << 1) | mq.decode(CtxUni)
              val idx = (y0 + first) * w + x
              t1.flags(idx) |= FSig
              t1.mag(idx) |= 1 << p
              readSign(x, y0 + first)
              yStart = y0 + first + 1
            }
          }
          var y = yStart
          val yEnd = math.min(y0 + 4, h)
          while (y < yEnd) {
            val idx = y * w + x
            if ((t1.flags(idx) & (FSig | FVisit)) == 0) {
              if (mq.decode(t1.zc(x, y)) == 1) {
                t1.flags(idx) |= FSig
                t1.mag(idx) |= 1 << p
                readSign(x, y)
              }
            }
            y += 1
          }
          x += 1
        }
        y0 += 4
      }
      t1.clearVisit()
    }

    var passes = npasses
    var p = numbps - 1
    if (passes > 0 && p >= 0) { cleanup(p); passes -= 1; p -= 1 }
    while (passes > 0 && p >= 0) {
      spp(p); passes -= 1
      if (passes > 0) { mrp(p); passes -= 1 }
      if (passes > 0) { cleanup(p); passes -= 1 }
      p -= 1
    }

    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = if ((t1.flags(i) & FNeg) != 0) -t1.mag(i) else t1.mag(i)
      i += 1
    }
    out
  }

  // ------------------------------------------------------- Tier-2 + markers

  private val CbExp = 6 // 64x64 codeblocks
  private val GuardBits = 2

  private final case class Cb(x0: Int, y0: Int, w: Int, h: Int)

  private def blocksOf(bw: Int, bh: Int): (Int, Int, Seq[Cb]) = {
    if (bw <= 0 || bh <= 0) return (0, 0, Seq.empty)
    val nx = (bw + (1 << CbExp) - 1) >> CbExp
    val ny = (bh + (1 << CbExp) - 1) >> CbExp
    val cbs = for (cy <- 0 until ny; cx <- 0 until nx) yield {
      val x0 = cx << CbExp; val y0 = cy << CbExp
      Cb(x0, y0, math.min(1 << CbExp, bw - x0), math.min(1 << CbExp, bh - y0))
    }
    (nx, ny, cbs)
  }

  private def floorLog2(n: Int): Int = 31 - Integer.numberOfLeadingZeros(n)

  // ------------------------------------------------------------------ encode

  // extra fractional precision bits the irreversible writer keeps: the
  // quantization step for band b is 2^(R_b - eps_b) with eps_b = R_b + P97,
  // i.e. a power-of-two step of 1/2^P97 (mantissa 0) — max reconstruction
  // error 1/2^(P97+1) per coefficient, far inside the +-0.5 integer
  // rounding budget after synthesis
  private val P97 = 6

  /** Encode unsigned `depth`-bit samples (row-major w x h) as a
    * single-tile single-component JPEG 2000 codestream: reversible 5/3
    * (lossless, the default) or, with `irreversible`, the 9/7 float
    * wavelet + deadzone scalar quantization (expounded style, Annex E). */
  def encode(width: Int, height: Int, depth: Int, samples: Array[Long],
      levels: Int = 5, irreversible: Boolean = false,
      tileParts: Int = 1, tileSize: Option[(Int, Int)] = None): Array[Byte] = {
    require(width >= 1 && height >= 1 && width <= MaxDim && height <= MaxDim,
      s"image dims ${width}x$height")
    require(depth >= 1 && depth <= MaxDepth, s"sample depth $depth (1..$MaxDepth)")
    require(samples.length == width * height,
      s"${samples.length} samples for ${width}x$height")
    require(levels >= 0 && levels <= 32, s"decomposition levels $levels")
    // tile-parts split the single tile's packet stream at packet
    // (= resolution, in this one-layer profile) boundaries
    require(tileParts >= 1 && tileParts <= levels + 1,
      s"$tileParts tile-parts for ${levels + 1} packets")
    require(tileSize.isEmpty || tileParts == 1,
      "tileParts splitting applies to single-tile codestreams")
    val (xtsiz, ytsiz) = tileSize.getOrElse((width, height))
    require(xtsiz >= 1 && ytsiz >= 1, s"tile size ${xtsiz}x$ytsiz")
    val ntx = (width + xtsiz - 1) / xtsiz
    val nty = (height + ytsiz - 1) / ytsiz
    val ntiles = ntx * nty
    require(ntiles <= 65535, s"$ntiles tiles exceed the 16-bit Isot space")

    val shift = 1 << (depth - 1)
    // per-band quantization exponent: reversible bands carry exact
    // coefficients (exponent = nominal range, no quantization); 9/7 bands
    // quantize by 2^-(P97) of the nominal range
    def epsOf(orient: Int): Int =
      depth + bandGain(orient) + (if (irreversible) P97 else 0)

    // encode ONE tile's tw x th samples into its packet stream; returns
    // (stream bytes, end offset of each packet — the tile-part cut points)
    def encodeTileStream(tw: Int, th: Int,
        tsamples: Array[Long]): (Array[Byte], Seq[Int]) = {
    val (hi, ll) =
      if (!irreversible) {
        val plane = new Array[Int](tsamples.length)
        var i = 0
        while (i < tsamples.length) {
          val v = tsamples(i)
          require(v >= 0 && v < (1L << depth), s"sample $v exceeds $depth bits")
          plane(i) = v.toInt - shift
          i += 1
        }
        fdwt(plane, tw, th, levels)
      } else {
        val planeD = new Array[Double](tsamples.length)
        var i = 0
        while (i < tsamples.length) {
          val v = tsamples(i)
          require(v >= 0 && v < (1L << depth), s"sample $v exceeds $depth bits")
          planeD(i) = (v - shift).toDouble
          i += 1
        }
        val (hiD, llD) = fdwt97(planeD, tw, th, levels)
        // deadzone quantizer (E.4): q = sign(c) * floor(|c| / delta)
        def quant(a: Array[Double]): Array[Int] = {
          val q = new Array[Int](a.length)
          var k = 0
          while (k < a.length) {
            val c = a(k)
            val m = math.floor(math.abs(c) * (1 << P97)).toInt
            q(k) = if (c < 0) -m else m
            k += 1
          }
          q
        }
        (hiD.map(l => if (l == null) null else l.map(quant)), quant(llD))
      }

    val body = new ByteArrayOutputStream()
    val packetEnds = scala.collection.mutable.ArrayBuffer.empty[Int]
    var r = 0
    while (r <= levels) {
      val bands = bandsAt(r, levels, tw, th)
      val bandArr: Seq[Array[Int]] =
        if (r == 0) Seq(ll) else hi(levels - r + 1).toSeq
      val hw = new HeadWriter
      val chunks = new ByteArrayOutputStream()
      val anyBlocks = bands.exists { case (_, bw, bh) => bw > 0 && bh > 0 }
      if (!anyBlocks) hw.bit(0)
      else {
        hw.bit(1) // non-empty packet
        bands.zip(bandArr).foreach { case ((orient, bw, bh), arr) =>
          val (nx, ny, cbs) = blocksOf(bw, bh)
          if (cbs.nonEmpty) {
            val mb = epsOf(orient) + GuardBits - 1
            val incl = new TagTree(nx, ny)
            val zbp = new TagTree(nx, ny)
            val coded = cbs.map { cb =>
              val c = new Array[Int](cb.w * cb.h)
              var yy = 0
              while (yy < cb.h) {
                var xx = 0
                while (xx < cb.w) {
                  c(yy * cb.w + xx) = arr((cb.y0 + yy) * bw + cb.x0 + xx)
                  xx += 1
                }
                yy += 1
              }
              encodeBlock(c, cb.w, cb.h, orient)
            }
            coded.foreach { case (_, numbps, _) =>
              require(numbps <= mb,
                s"codeblock needs $numbps bitplanes > Mb=$mb (depth $depth)")
            }
            incl.setValues(coded.map { case (_, n, _) => if (n > 0) 0 else 1 }.toArray)
            zbp.setValues(coded.map { case (_, n, _) =>
              if (n > 0) mb - n else 0
            }.toArray)
            var ci = 0
            while (ci < cbs.length) {
              val cx = ci % nx; val cy = ci / nx
              val (bytes, numbps, npasses) = coded(ci)
              incl.encode(cx, cy, 1, hw)
              if (numbps > 0) {
                // zero-bitplane sweep until resolved
                var t = 1
                val missing = epsOf(orient) + GuardBits - 1 - numbps
                while (t <= missing + 1) { zbp.encode(cx, cy, t, hw); t += 1 }
                // number of coding passes (B.10.6)
                if (npasses == 1) hw.bit(0)
                else if (npasses == 2) { hw.bits(2, 2) }
                else if (npasses <= 5) { hw.bits(3, 2); hw.bits(npasses - 3, 2) }
                else if (npasses <= 36) { hw.bits(0xf, 4); hw.bits(npasses - 6, 5) }
                else { hw.bits(0x1ff, 9); hw.bits(npasses - 37, 7) }
                // Lblock + length (B.10.7), one codeword segment
                var lblock = 3
                val lenBitsNeeded =
                  if (bytes.length == 0) 0
                  else 32 - Integer.numberOfLeadingZeros(bytes.length)
                while (lenBitsNeeded > lblock + floorLog2(npasses)) {
                  hw.bit(1); lblock += 1
                }
                hw.bit(0)
                hw.bits(bytes.length, lblock + floorLog2(npasses))
                chunks.write(bytes, 0, bytes.length)
              }
              ci += 1
            }
          }
        }
      }
      val hdr = hw.alignFlush()
      body.write(hdr, 0, hdr.length)
      val ch = chunks.toByteArray
      body.write(ch, 0, ch.length)
      packetEnds += body.size()
      r += 1
    }
    (body.toByteArray, packetEnds.toSeq)
    } // encodeTileStream

    // ---- markers
    val out = new ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >> 8) & 0xff); out.write(v & 0xff) }
    def u32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    u16(0xff4f) // SOC
    u16(0xff51) // SIZ
    u16(41); u16(0) // Lsiz, Rsiz
    u32(width); u32(height); u32(0); u32(0) // Xsiz..YOsiz
    u32(xtsiz); u32(ytsiz); u32(0); u32(0)  // tile grid
    u16(1) // one component
    out.write(depth - 1) // Ssiz: unsigned, depth bits
    out.write(1); out.write(1) // XRsiz, YRsiz
    u16(0xff52) // COD
    u16(12) // Lcod (no precinct list)
    out.write(0) // Scod: default precincts, no SOP/EPH
    out.write(0) // progression LRCP
    u16(1) // one layer
    out.write(0) // no MCT
    out.write(levels)
    out.write(CbExp - 2); out.write(CbExp - 2) // codeblock 64x64
    out.write(0) // codeblock style: none
    out.write(if (irreversible) 0 else 1) // transform: 0 = 9/7, 1 = 5/3
    u16(0xff5c) // QCD
    if (!irreversible) {
      u16(3 + (3 * levels + 1)) // Lqcd
      out.write((GuardBits << 5) | 0) // Sqcd: no quantization, G guard bits
      out.write((depth + 0) << 3) // LL exponent
      var rr = 1
      while (rr <= levels) {
        out.write((depth + 1) << 3) // HL
        out.write((depth + 1) << 3) // LH
        out.write((depth + 2) << 3) // HH
        rr += 1
      }
    } else {
      // scalar expounded (style 2): u16 per band, exponent << 11 | mantissa
      u16(3 + 2 * (3 * levels + 1)) // Lqcd
      out.write((GuardBits << 5) | 2)
      u16(epsOf(0) << 11) // LL, mantissa 0 (power-of-two steps)
      var rr = 1
      while (rr <= levels) {
        u16(epsOf(1) << 11); u16(epsOf(2) << 11); u16(epsOf(3) << 11)
        rr += 1
      }
    }
    if (ntiles == 1) {
      val (data, packetEnds) = encodeTileStream(width, height, samples)
      // split the packet stream across tileParts at packet boundaries:
      // part k takes packets [k*(levels+1)/tileParts, (k+1)*(levels+1)/tileParts)
      val nPackets = levels + 1
      val cuts: Seq[Int] = 0 +: (1 to tileParts).map { k =>
        if (k == tileParts) data.length
        else packetEnds(k * nPackets / tileParts - 1)
      }
      var tp = 0
      while (tp < tileParts) {
        val (from, until) = (cuts(tp), cuts(tp + 1))
        u16(0xff90) // SOT
        u16(10); u16(0) // Lsot, Isot
        u32(12 + 2 + (until - from).toLong) // Psot
        out.write(tp); out.write(tileParts) // TPsot, TNsot
        u16(0xff93) // SOD
        out.write(data, from, until - from)
        tp += 1
      }
    } else {
      // true multi-tile: each tile's sub-image encodes independently into
      // one tile-part (raster Isot order)
      var t = 0
      while (t < ntiles) {
        val tx = t % ntx; val ty = t / ntx
        val tw = math.min(xtsiz, width - tx * xtsiz)
        val th = math.min(ytsiz, height - ty * ytsiz)
        val sub = new Array[Long](tw * th)
        var yy = 0
        while (yy < th) {
          System.arraycopy(samples, (ty * ytsiz + yy) * width + tx * xtsiz,
            sub, yy * tw, tw)
          yy += 1
        }
        val (data, _) = encodeTileStream(tw, th, sub)
        u16(0xff90) // SOT
        u16(10); u16(t) // Lsot, Isot
        u32(12 + 2 + data.length.toLong) // Psot
        out.write(0); out.write(1) // TPsot, TNsot
        u16(0xff93) // SOD
        out.write(data, 0, data.length)
        t += 1
      }
    }
    u16(0xffd9) // EOC
    out.toByteArray
  }

  // ------------------------------------------------------------------ decode

  def decode(cs: Array[Byte]): Image = {
    def u16(i: Int): Int = ((cs(i) & 0xff) << 8) | (cs(i + 1) & 0xff)
    def u32(i: Int): Long =
      ((cs(i) & 0xffL) << 24) | ((cs(i + 1) & 0xffL) << 16) |
        ((cs(i + 2) & 0xffL) << 8) | (cs(i + 3) & 0xffL)
    require(cs.length >= 4 && u16(0) == 0xff4f, "not a JPEG 2000 codestream")

    var width = 0; var height = 0; var depth = 0
    var xtsiz = 0; var ytsiz = 0 // tile grid (== image for single-tile)
    var levels = -1
    var layers = 1
    var guard = GuardBits
    var irrev = false
    var qStyle = 0
    var qExps: Array[Int] = null  // per-band exponents, SPqcd order
    var qMants: Array[Int] = null // per-band mantissas (style 2)
    var dataOff = -1; var dataLen = -1
    // per-tile data segments: tile-parts concatenate in TPsot order
    val tileSegs = scala.collection.mutable.LinkedHashMap
      .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Int)]]

    var pos = 2
    var sawSiz = false
    var done = false
    while (!done) {
      if (pos + 2 > cs.length) throw new UnsupportedGrib("JPEG2000 codestream truncated")
      val marker = u16(pos)
      marker match {
        case 0xffd9 => done = true
        case 0xff93 =>
          throw new UnsupportedGrib("JPEG2000 SOD before SOT")
        case _ =>
          val lseg = u16(pos + 2)
          val body = pos + 4
          marker match {
            case 0xff51 => // SIZ
              sawSiz = true
              if (u16(body) != 0)
                throw new UnsupportedGrib(s"JPEG2000 profile Rsiz=${u16(body)} (only 0)")
              width = u32(body + 2).toInt; height = u32(body + 6).toInt
              if (u32(body + 10) != 0 || u32(body + 14) != 0)
                throw new UnsupportedGrib("JPEG2000 image offset != 0")
              xtsiz = u32(body + 18).toInt; ytsiz = u32(body + 22).toInt
              if (u32(body + 26) != 0 || u32(body + 30) != 0)
                throw new UnsupportedGrib("JPEG2000 tile grid offset != 0")
              if (xtsiz < 1 || ytsiz < 1)
                throw new UnsupportedGrib("JPEG2000 zero tile size")
              val ncomp = u16(body + 34)
              if (ncomp != 1)
                throw new UnsupportedGrib(s"JPEG2000 $ncomp components (GRIB carries 1)")
              val ssiz = cs(body + 36) & 0xff
              if ((ssiz & 0x80) != 0)
                throw new UnsupportedGrib("JPEG2000 signed component in GRIB payload")
              depth = (ssiz & 0x7f) + 1
              if ((cs(body + 37) & 0xff) != 1 || (cs(body + 38) & 0xff) != 1)
                throw new UnsupportedGrib("JPEG2000 subsampled component")
            case 0xff52 => // COD
              val scod = cs(body) & 0xff
              if ((scod & 1) != 0)
                throw new UnsupportedGrib("JPEG2000 user-defined precincts")
              // scod bits 1/2 (SOP/EPH) tolerated? We don't parse SOP/EPH.
              if ((scod & 6) != 0)
                throw new UnsupportedGrib("JPEG2000 SOP/EPH markers")
              layers = u16(body + 2)
              if (layers != 1)
                throw new UnsupportedGrib(s"JPEG2000 $layers quality layers (1 expected)")
              levels = cs(body + 5) & 0xff
              val cbw = (cs(body + 6) & 0x0f) + 2
              val cbh = (cs(body + 7) & 0x0f) + 2
              if (cbw != CbExp || cbh != CbExp)
                throw new UnsupportedGrib(s"JPEG2000 ${1 << cbw}x${1 << cbh} codeblocks (64x64 expected)")
              val cbstyle = cs(body + 8) & 0xff
              if (cbstyle != 0)
                throw new UnsupportedGrib(f"JPEG2000 codeblock style 0x$cbstyle%02x (bypass/reset/termall/causal/segsym)")
              val xform = cs(body + 9) & 0xff
              if (xform != 0 && xform != 1)
                throw new UnsupportedGrib(s"JPEG2000 transform $xform (0 = 9/7, 1 = 5/3)")
              irrev = xform == 0
            case 0xff5c => // QCD
              val sq = cs(body) & 0xff
              guard = (sq >> 5) & 7
              qStyle = sq & 0x1f
              (sq & 0x1f) match {
                case 0 => // no quantization (reversible): 8-bit exponents
                  qExps = Array.tabulate(lseg - 3)(k => (cs(body + 1 + k) & 0xff) >> 3)
                  qMants = Array.fill(lseg - 3)(0)
                case 2 => // scalar expounded: u16 exponent/mantissa per band
                  val n = (lseg - 3) / 2
                  qExps = Array.tabulate(n)(k => u16(body + 1 + 2 * k) >> 11)
                  qMants = Array.tabulate(n)(k => u16(body + 1 + 2 * k) & 0x7ff)
                case 1 =>
                  throw new UnsupportedGrib(
                    "JPEG2000 scalar derived quantization (expounded only)")
                case other =>
                  throw new UnsupportedGrib(s"JPEG2000 quantization style $other")
              }
            case 0xff90 => // SOT
              val isot = u16(body)
              val psot = u32(body + 2)
              val tpsot = cs(body + 6) & 0xff
              // tile-parts of a tile must arrive in TPsot order — their
              // data segments concatenate into that tile's packet stream
              // (ISO 15444-1 A.4.2: tile-parts split at packet boundaries)
              val segs = tileSegs.getOrElseUpdate(isot,
                scala.collection.mutable.ArrayBuffer.empty)
              if (tpsot != segs.size)
                throw new UnsupportedGrib(
                  s"JPEG2000 tile-part order: TPsot $tpsot after ${segs.size} " +
                    s"part(s) of tile $isot")
              // scan forward to SOD
              var p2 = pos + 2 + lseg
              if (u16(p2) != 0xff93)
                throw new UnsupportedGrib("JPEG2000 marker between SOT and SOD")
              dataOff = p2 + 2
              dataLen =
                if (psot == 0) cs.length - 2 - dataOff
                else (pos + psot).toInt - dataOff
              if (dataLen < 0 || dataOff + dataLen > cs.length)
                throw new UnsupportedGrib("JPEG2000 tile-part overruns codestream")
              segs += ((dataOff, dataLen))
            case 0xff53 | 0xff5d =>
              throw new UnsupportedGrib("JPEG2000 per-component COC/QCC overrides")
            case 0xff5e => throw new UnsupportedGrib("JPEG2000 RGN (ROI) segment")
            case 0xff5f => throw new UnsupportedGrib("JPEG2000 POC progression change")
            case 0xff60 | 0xff61 =>
              throw new UnsupportedGrib("JPEG2000 PPM/PPT packed headers")
            case _ => // COM, TLM, PLM, PLT, CRG: skip
          }
          if (marker == 0xff90) {
            // jump over tile data to the marker after it
            pos = dataOff + dataLen
          } else pos = pos + 4 + (lseg - 2)
      }
    }
    require(sawSiz && levels >= 0 && tileSegs.nonEmpty, "JPEG2000 missing SIZ/COD/SOT")
    require(width >= 1 && height >= 1 && width <= MaxDim && height <= MaxDim,
      s"JPEG2000 dims ${width}x$height")
    if (depth > MaxDepth)
      throw new UnsupportedGrib(s"JPEG2000 ${depth}-bit samples (max $MaxDepth)")

    val ntx = (width + xtsiz - 1) / xtsiz
    val nty = (height + ytsiz - 1) / ytsiz
    val ntiles = ntx * nty
    (0 until ntiles).foreach { t =>
      if (!tileSegs.contains(t))
        throw new UnsupportedGrib(s"JPEG2000 missing tile $t of $ntiles")
    }
    tileSegs.keys.foreach { t =>
      if (t < 0 || t >= ntiles)
        throw new UnsupportedGrib(s"JPEG2000 tile index $t outside ${ntx}x$nty grid")
    }

    // one tile-part reads in place; several concatenate into the tile's
    // packet stream (archived ECMWF fields split large tiles this way)
    def tileStream(t: Int): (Array[Byte], Int, Int) = {
      val segs = tileSegs(t)
      if (segs.size == 1) (cs, segs.head._1, segs.head._2)
      else {
        val total = segs.iterator.map(_._2).sum
        val buf = new Array[Byte](total)
        var o = 0
        segs.foreach { case (off, len) =>
          System.arraycopy(cs, off, buf, o, len); o += len
        }
        (buf, 0, total)
      }
    }

    // decode ONE tile's packet stream into its tw x th sample plane
    def decodeTilePlane(streamBuf: Array[Byte], streamOff: Int, streamLen: Int,
        tw: Int, th: Int): Array[Long] = {
    // ---- decode packets, resolution by resolution
    val hi = new Array[Array[Array[Int]]](levels + 1)
    var ll0: Array[Int] = null
    val rdr = new HeadReader(streamBuf, streamOff)
    val dataEnd = streamOff + streamLen
    var r = 0
    while (r <= levels) {
      val bands = bandsAt(r, levels, tw, th)
      val perBand = bands.map { case (orient, bw, bh) =>
        (orient, bw, bh, new Array[Int](math.max(bw * bh, 0)))
      }
      // header
      val pending = Seq.newBuilder[(Array[Int], Int, Int, Cb, Int, Int, Int)]
      // (bandArr, bw, orient, cb, numbps, npasses, chunkLen)
      val anyBlocks = bands.exists { case (_, bw, bh) => bw > 0 && bh > 0 }
      if (rdr.pos > dataEnd) throw new UnsupportedGrib("JPEG2000 tile data truncated")
      val nonEmpty = rdr.bit() == 1
      if (anyBlocks && nonEmpty) {
        perBand.foreach { case (orient, bw, bh, arr) =>
          val (nx, ny, cbs) = blocksOf(bw, bh)
          if (cbs.nonEmpty) {
            val mb = {
              // SPqcd band order: LL, then (HL, LH, HH) per resolution
              val bandIdx = if (r == 0) 0 else 1 + 3 * (r - 1) + (orient - 1)
              if (qExps == null || bandIdx >= qExps.length)
                throw new UnsupportedGrib("JPEG2000 QCD missing subband exponent")
              qExps(bandIdx) + guard - 1
            }
            val incl = new TagTree(nx, ny)
            val zbp = new TagTree(nx, ny)
            var ci = 0
            while (ci < cbs.length) {
              val cx = ci % nx; val cy = ci / nx
              val (known, v) = incl.decode(cx, cy, 1, rdr)
              if (known && v == 0) {
                val missing = zbp.decodeValue(cx, cy, rdr)
                val numbps = mb - missing
                if (numbps < 0)
                  throw new UnsupportedGrib(
                    s"JPEG2000 zero-bitplanes $missing exceed Mb=$mb")
                val npasses = {
                  if (rdr.bit() == 0) 1
                  else if (rdr.bit() == 0) 2
                  else {
                    val v2 = rdr.bits(2)
                    if (v2 < 3) 3 + v2
                    else {
                      val v5 = rdr.bits(5)
                      if (v5 < 31) 6 + v5 else 37 + rdr.bits(7)
                    }
                  }
                }
                var lblock = 3
                while (rdr.bit() == 1) lblock += 1
                val chunkLen = rdr.bits(lblock + floorLog2(npasses))
                pending += ((arr, bw, orient, cbs(ci), numbps, npasses, chunkLen))
              }
              ci += 1
            }
          }
        }
      } else if (!anyBlocks && nonEmpty)
        throw new UnsupportedGrib("JPEG2000 non-empty packet for empty resolution")
      rdr.align()
      // bodies
      var bodyPos = rdr.pos
      pending.result().foreach { case (arr, bw, orient, cb, numbps, npasses, clen) =>
        if (bodyPos + clen > dataEnd)
          throw new UnsupportedGrib("JPEG2000 codeblock chunk overruns tile data")
        val coefs = decodeBlock(streamBuf, bodyPos, clen, cb.w, cb.h, orient, numbps, npasses)
        var yy = 0
        while (yy < cb.h) {
          var xx = 0
          while (xx < cb.w) {
            arr((cb.y0 + yy) * bw + cb.x0 + xx) = coefs(yy * cb.w + xx)
            xx += 1
          }
          yy += 1
        }
        bodyPos += clen
      }
      rdr.pos = bodyPos
      if (r == 0) ll0 = perBand.head._4
      else hi(levels - r + 1) = perBand.map(_._4).toArray
      r += 1
    }

    val shift = 1 << (depth - 1)
    if (!irrev && qStyle != 0)
      throw new UnsupportedGrib("JPEG2000 quantized 5/3 codestream (style " +
        s"$qStyle with the reversible transform)")
    if (!irrev) {
      val plane = idwt(ll0, hi, tw, th, levels)
      val out = new Array[Long](plane.length)
      var i = 0
      while (i < plane.length) { out(i) = plane(i).toLong + shift; i += 1 }
      out
    } else {
      // dequantize (E.1.1: delta_b = 2^(R_b - eps_b) * (1 + mu_b/2^11)),
      // midpoint reconstruction sign(q) * (|q| + 0.5) * delta, then the
      // 9/7 float synthesis
      def dequant(q: Array[Int], r: Int, orient: Int): Array[Double] = {
        val bandIdx = if (r == 0) 0 else 1 + 3 * (r - 1) + (orient - 1)
        if (qExps == null || bandIdx >= qExps.length)
          throw new UnsupportedGrib("JPEG2000 QCD missing subband exponent")
        val rb = depth + bandGain(orient)
        val delta = math.pow(2.0, rb - qExps(bandIdx)) *
          (1.0 + qMants(bandIdx) / 2048.0)
        val d = new Array[Double](q.length)
        var k = 0
        while (k < q.length) {
          val v = q(k)
          d(k) = if (v == 0) 0.0
            else if (v > 0) (v + 0.5) * delta
            else (v - 0.5) * delta
          k += 1
        }
        d
      }
      val hiD = new Array[Array[Array[Double]]](levels + 1)
      var l = 1
      while (l <= levels) {
        val r = levels - l + 1
        hiD(l) = Array(dequant(hi(l)(0), r, 1), dequant(hi(l)(1), r, 2),
          dequant(hi(l)(2), r, 3))
        l += 1
      }
      val plane = idwt97(dequant(ll0, 0, 0), hiD, tw, th, levels)
      val maxV = (1L << depth) - 1
      val out = new Array[Long](plane.length)
      var i = 0
      while (i < plane.length) {
        val v = math.rint(plane(i)).toLong + shift
        out(i) = if (v < 0) 0L else if (v > maxV) maxV else v
        i += 1
      }
      out
    }
    } // decodeTilePlane

    if (ntiles == 1) {
      val (b, o, l) = tileStream(0)
      Image(width, height, depth, decodeTilePlane(b, o, l, width, height))
    } else {
      // stitch each independently-coded tile into the image plane
      val out = new Array[Long](width * height)
      var t = 0
      while (t < ntiles) {
        val tx = t % ntx; val ty = t / ntx
        val tw = math.min(xtsiz, width - tx * xtsiz)
        val th = math.min(ytsiz, height - ty * ytsiz)
        val (b, o, l) = tileStream(t)
        val plane = decodeTilePlane(b, o, l, tw, th)
        var yy = 0
        while (yy < th) {
          System.arraycopy(plane, yy * tw, out,
            (ty * ytsiz + yy) * width + tx * xtsiz, tw)
          yy += 1
        }
        t += 1
      }
      Image(width, height, depth, out)
    }
  }
}
