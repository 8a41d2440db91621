package graft

import graft.functions.FastText
import graft.functions.FastText.Model

/** fastText `.bin` loading + supervised inference over hand-authored
  * planted-weight models: byte-level round trip, the signed-FNV hash and
  * unsigned-modulo bucketing, subword/word-ngram row sets, softmax/ova
  * prediction, hierarchical softmax, and the directed guards (quantized, pruned, ns, non-sup,
  * bad magic). */
class FastTextSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("fasttext").toString

  private val conf = new org.apache.hadoop.conf.Configuration()

  /** dim-4 planted model: identity-ish word vectors, no subwords. */
  private def flatModel(loss: String = "softmax",
      wordNgrams: Int = 1, maxn: Int = 0, bucket: Int = 0,
      extraRows: Int = 0): Model = {
    def e(i: Int): Array[Float] = {
      val a = new Array[Float](4); a(i) = 1.0f; a
    }
    Model(dim = 4, minn = 0, maxn = maxn, bucket = bucket,
      wordNgrams = wordNgrams, loss = loss,
      words = Map("alpha" -> 0, "beta" -> 1, "gamma" -> 2, "</s>" -> 3),
      labels = Array("good", "bad"),
      input = Array.tabulate(4 + extraRows)(i =>
        if (i < 4) e(i) else Array.fill(4)(0.25f)),
      output = Array(
        Array(1.0f, 2.0f, -1.0f, 0.5f),
        Array(0.25f, -0.25f, 2.5f, -0.125f)))
  }

  test("bin round trip: args, dictionary, matrices, label order") {
    val dir = tmp()
    val m = flatModel()
    FastText.write(s"$dir/m.bin", m, conf)
    val back = FastText.load(s"$dir/m.bin", conf)
    assert(back.dim == 4 && back.maxn == 0 && back.wordNgrams == 1)
    assert(back.loss == "softmax")
    assert(back.words == m.words)
    assert(back.labels.toSeq == Seq("good", "bad"))
    assert(back.input.map(_.toSeq).toSeq == m.input.map(_.toSeq).toSeq)
    assert(back.output.map(_.toSeq).toSeq == m.output.map(_.toSeq).toSeq)
  }

  test("hash matches fastText's signed-FNV-1a reference values") {
    // reference values computed from the published algorithm
    // (h = 2166136261; h ^= int8(c); h *= 16777619), which every
    // conforming implementation reproduces
    def ref(s: String): Int = {
      var h = 0x811c9dc5
      s.getBytes("UTF-8").foreach { b => h ^= b.toInt; h *= 16777619 }
      h
    }
    Seq("hello", "über", "", "日本語").foreach { w =>
      assert(FastText.hash(w) == ref(w))
    }
    // the sign extension matters: a byte >= 0x80 must flip high bits
    assert(FastText.hash("ü") != {
      var h = 0x811c9dc5
      "ü".getBytes("UTF-8").foreach { b => h ^= (b & 0xff); h *= 16777619 }
      h
    })
  }

  test("softmax prediction: closed-form scores, OOV ignored when maxn=0") {
    val m = flatModel()
    // "alpha beta": rows alpha, beta, eos -> hidden (1/3, 1/3, 0, 1/3)
    val scored = FastText.scoreLine("alpha beta", m)
    val sg = (1.0 / 3) * 1.0 + (1.0 / 3) * 2.0 + (1.0 / 3) * 0.5
    val sb = (1.0 / 3) * 0.25 + (1.0 / 3) * -0.25 + (1.0 / 3) * -0.125
    val zg = math.exp(sg) / (math.exp(sg) + math.exp(sb))
    assert(scored.head._1 == "good")
    assert(math.abs(scored.head._2 - zg) < 1e-12, s"${scored.head._2} vs $zg")
    // OOV token contributes nothing with maxn=0: same scores
    assert(FastText.scoreLine("alpha zzz beta", m).head._2 == scored.head._2)
    // gamma-heavy text flips to bad (output row 2 dominates)
    assert(FastText.scoreLine("gamma gamma", m).head._1 == "bad")
  }

  test("ova prediction applies the per-label sigmoid") {
    val m = flatModel(loss = "ova")
    val scored = FastText.scoreLine("alpha", m).toMap
    // hidden (1/2, 0, 0, 1/2); s_good .75, s_bad .0625
    assert(math.abs(scored("good") - 1.0 / (1 + math.exp(-0.75))) < 1e-12)
    assert(math.abs(scored("bad") - 1.0 / (1 + math.exp(-0.0625))) < 1e-12)
  }

  test("subword rows: boundaries, UTF-8 starts, unsigned bucketing") {
    val bucket = 7
    val m = flatModel(maxn = 3, bucket = bucket, extraRows = bucket)
      .copy(minn = 2)
    // an OOV word contributes hashed ngram rows (plus the EOS id 3)
    val rows = FastText.lineRows("qq", m)
    assert(rows.count(_ == 3) == 1 &&
      rows.filter(_ != 3).forall(r => r >= 4 && r < 4 + bucket) &&
      rows.count(_ >= 4) > 0, rows.toSeq.toString)
    // known words carry their id AND their ngram rows; EOS only its id
    val rows2 = FastText.lineRows("alpha", m)
    assert(rows2.contains(0) && rows2.contains(3))
    assert(rows2.count(_ >= 4) > 0)
    assert(FastText.lineRows("", m).toSeq == Seq(3)) // just EOS
  }

  test("wordNgrams=2 adds one rolled-hash row per adjacent pair") {
    val bucket = 101
    val m = flatModel(wordNgrams = 2, bucket = bucket, extraRows = bucket)
    val rows = FastText.lineRows("alpha beta", m)
    // words alpha, beta, eos + 2 bigram rows (alpha-beta, beta-eos)
    assert(rows.count(_ < 4) == 3 && rows.count(_ >= 4) == 2, rows.toSeq)
    val expected = {
      // int32 -> uint64 is SIGN-extended in fastText's roll
      def u(s: String): Long = FastText.hash(s).toLong
      Seq(u("alpha") * 116049371L + u("beta"),
        u("beta") * 116049371L + u("</s>"))
        .map(h => 4 + java.lang.Long.remainderUnsigned(h, bucket).toInt)
    }
    assert(rows.filter(_ >= 4).toSeq == expected)
  }

  test("predictTop runs distributed and matches scoreLine") {
    val m = flatModel()
    val df = Seq((1L, "alpha beta"), (2L, "gamma gamma"), (3L, "alpha"))
      .toDF("doc_id", "text")
    val got = FastText.predictTop(df, "doc_id", "text", m)
      .orderBy($"id").collect()
    assert(got.map(_.getString(1)).toSeq == Seq("good", "bad", "good"))
    assert(got(0).getDouble(2) ==
      FastText.scoreLine("alpha beta", m).head._2)
  }

  test("guards directed: cbow model, magic, version; ns predicts like ova") {
    val dir = tmp()
    FastText.write(s"$dir/m.bin", flatModel(), conf)
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/m.bin"))
    def patched(f: Array[Byte] => Unit): Array[Byte] = {
      val b = bytes.clone(); f(b); b
    }
    def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >>> 8) & 0xff).toByte
      b(off + 2) = ((v >>> 16) & 0xff).toByte
      b(off + 3) = ((v >>> 24) & 0xff).toByte
    }
    def expect(b: Array[Byte], needle: String): Unit = {
      val e = intercept[Exception] { FastText.loadBytes(b, "t") }
      assert(e.getMessage.contains(needle), e.getMessage)
    }
    expect(patched(b => le32(b, 0, 42)), "magic")
    expect(patched(b => le32(b, 4, 99)), "version")
    expect(patched(b => le32(b, 36, 1)), "supervised") // model = cbow
    // ns loss LOADS and predicts exactly like ova (fastText's
    // NegativeSamplingLoss inherits BinaryLogisticLoss::predict)
    val nsModel = FastText.loadBytes(patched(b => le32(b, 32, 2)), "t")
    assert(nsModel.loss == "ns")
    val ovaModel = FastText.loadBytes(patched(b => le32(b, 32, 4)), "t")
    assert(FastText.scoreLine("alpha beta", nsModel).toSeq ==
      FastText.scoreLine("alpha beta", ovaModel).toSeq)
  }

  test("hierarchical softmax: Huffman tree from counts, sigmoid products") {
    // counts (5,3,2) descending, fastText dictionary order. loss.cc
    // buildTree gives internal node 0 = (left leaf 2, right leaf 1) and
    // the root = (left node 3, right leaf 0) — pinned exactly:
    assert(FastText.buildHuffman(Array(5L, 3L, 2L)).toSeq ==
      Seq((2, 1), (3, 0)))
    val dir = tmp()
    def e(i: Int): Array[Float] = { val a = new Array[Float](2); a(i) = 1f; a }
    val m = FastText.Model(dim = 2, minn = 0, maxn = 0, bucket = 0,
      wordNgrams = 1, loss = "hs",
      words = Map("alpha" -> 0, "beta" -> 1, "</s>" -> 2),
      labels = Array("a", "b", "c"),
      input = Array(e(0), e(1), new Array[Float](2)),
      // rows 0 and 1 score internal nodes; row 2 exists but is unused
      // (real hs models carry nlabels output rows)
      output = Array(Array(0.8f, -0.4f), Array(-0.2f, 0.6f),
        new Array[Float](2)),
      labelCounts = Array(5L, 3L, 2L))
    // write → load round trip persists loss AND label counts
    FastText.write(s"$dir/hs.bin", m, conf)
    val back = FastText.load(s"$dir/hs.bin", conf)
    assert(back.loss == "hs")
    assert(back.labelCounts.toSeq == Seq(5L, 3L, 2L))
    // closed form for "alpha beta": hidden = (e0 + e1 + 0)/3;
    // P(a) = f_root, P(b) = (1−f_root)·f_int, P(c) = (1−f_root)·(1−f_int)
    val h = 1.0 / 3
    def sig(x: Double) = 1.0 / (1.0 + math.exp(-x))
    val fInt = sig(0.8f * h - 0.4f * h)
    val fRoot = sig(-0.2f * h + 0.6f * h)
    val got = FastText.scoreLine("alpha beta", back).toMap
    assert(math.abs(got("a") - fRoot) < 1e-9, got.toString)
    assert(math.abs(got("b") - (1 - fRoot) * fInt) < 1e-9, got.toString)
    assert(math.abs(got("c") - (1 - fRoot) * (1 - fInt)) < 1e-9, got.toString)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    // a model without stored counts still predicts (uniform tree)
    val uniform = m.copy(labelCounts = Array.empty)
    assert(FastText.scoreLine("alpha", uniform).map(_._2).sum > 0.999)
  }

  test(".ftz: product-quantized matrices + pruned dictionary load exactly") {
    // Hand-author the quantize(-qnorm -cutoff) byte layout: per-row
    // subquantizer codes select planted codebook centroids, per-row norm
    // codes scale them, and the pruned dictionary remaps two surviving
    // word-ngram buckets to compact rows 4 and 5.
    val bucket = 100
    def u(sx: String): Long = FastText.hash(sx).toLong
    val hAB = java.lang.Long.remainderUnsigned(
      u("alpha") * 116049371L + u("beta"), bucket).toInt
    val hBE = java.lang.Long.remainderUnsigned(
      u("beta") * 116049371L + u("</s>"), bucket).toInt
    assert(hAB != hBE) // the fixture relies on distinct buckets
    val pruneIdx = Map(hAB -> 0, hBE -> 1)
    // target decoded rows: identity words (norm 1), bucket rows
    // 0.5 * (0.5, 0.5, 0.5, 0.5) through the norm quantizer
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >>> 32).toInt) }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    i32(FastText.Magic); i32(FastText.Version)
    i32(4); i32(5); i32(5); i32(1); i32(5) // dim ws epoch minCount neg
    i32(2) // wordNgrams
    i32(3); i32(3) // loss softmax, model sup
    i32(bucket); i32(0); i32(0); i32(100) // bucket minn maxn lrUpdateRate
    i64(java.lang.Double.doubleToLongBits(1e-4))
    i32(6); i32(4); i32(2) // dict size, nwords, nlabels
    i64(1000L)
    i64(2L) // pruneidx_size
    def entry(w: String, tpe: Int): Unit = {
      out.write(w.getBytes("UTF-8")); out.write(0); i64(1L); out.write(tpe)
    }
    Seq("alpha", "beta", "gamma", "</s>").foreach(entry(_, 0))
    Seq("__label__good", "__label__bad").foreach(entry(_, 1))
    pruneIdx.toSeq.sortBy(_._2).foreach { case (h, cidx) =>
      i32(h); i32(cidx)
    }
    out.write(1) // quant_input
    // QuantMatrix: qnorm, m=6, n=4, codes, pq, norm codes, npq
    out.write(1) // qnorm
    i64(6L); i64(4L)
    i32(12) // codesize = 6 rows x 2 subq
    (0 until 6).foreach { r => out.write(r); out.write(r) } // codes (r, r)
    i32(4); i32(2); i32(2); i32(2) // pq: dim nsubq dsub lastdsub
    // centroids: 4 * 256 floats; subq s centroid c lives at (s*256+c)*2
    val cent = new Array[Float](4 * 256)
    def e(i: Int): Array[Float] = {
      val a = new Array[Float](4); a(i) = 1.0f; a
    }
    val wantRows = Array(e(0), e(1), e(2), e(3),
      Array(0.25f, 0.25f, 0.25f, 0.25f), Array(0.25f, 0.25f, 0.25f, 0.25f))
    val norms = Array(1.0f, 1.0f, 1.0f, 1.0f, 0.5f, 0.5f)
    (0 until 6).foreach { r =>
      cent((0 * 256 + r) * 2) = wantRows(r)(0) / norms(r)
      cent((0 * 256 + r) * 2 + 1) = wantRows(r)(1) / norms(r)
      cent((1 * 256 + r) * 2) = wantRows(r)(2) / norms(r)
      cent((1 * 256 + r) * 2 + 1) = wantRows(r)(3) / norms(r)
    }
    cent.foreach(f32)
    (0 until 6).foreach(r => out.write(r)) // norm codes (r)
    i32(1); i32(1); i32(1); i32(1) // npq: dim nsubq dsub lastdsub
    val ncent = new Array[Float](256)
    (0 until 6).foreach(r => ncent(r) = norms(r))
    ncent.foreach(f32)
    out.write(0) // qout
    i64(2L); i64(4L) // dense output 2 x 4
    Seq(1.0f, 2.0f, -1.0f, 0.5f, 0.25f, -0.25f, 2.5f, -0.125f).foreach(f32)

    val m = FastText.loadBytes(out.toByteArray, "ftz")
    assert(m.pruneIdx.contains(pruneIdx))
    (0 until 6).foreach { r =>
      assert(m.input(r).toSeq == wantRows(r).toSeq, s"row $r: ${m.input(r).toSeq}")
    }
    // scoring equals an equivalent hand-built dense model
    val dense = Model(dim = 4, minn = 0, maxn = 0, bucket = bucket,
      wordNgrams = 2, loss = "softmax",
      words = Map("alpha" -> 0, "beta" -> 1, "gamma" -> 2, "</s>" -> 3),
      labels = Array("good", "bad"),
      input = wantRows, output = m.output, pruneIdx = Some(pruneIdx))
    Seq("alpha beta", "beta gamma", "alpha qq gamma").foreach { line =>
      assert(FastText.scoreLine(line, m).toSeq ==
        FastText.scoreLine(line, dense).toSeq, line)
    }
    // a PRUNED-AWAY word-ngram bucket contributes nothing: "gamma </s>"
    // bigram is not in pruneIdx, so only word rows participate
    val rows = FastText.lineRows("gamma", m)
    assert(rows.toSeq == Seq(2, 3), rows.toSeq)
  }
}
