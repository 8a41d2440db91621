package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** fastText supervised-model loading and inference — the PUBLIC `.bin`
  * format from facebookresearch/fastText (fasttext.cc `loadModel` /
  * `saveModel`, args.cc, dictionary.cc, densematrix.cc): magic
  * 793712314 + version, the Args block, the dictionary (null-terminated
  * words, counts, entry types, prune index), a quantization flag, and the
  * dense input/output float32 matrices. Production language-ID and
  * quality classifiers (the lid.176 class of models) ship in exactly this
  * container, so loading it turns the engine's linear-classifier surface
  * into a runner for real deployed models instead of hand-planted
  * weights.
  *
  * Inference follows the supervised path faithfully: whitespace
  * tokenization + the `</s>` EOS token, dictionary lookup, character
  * n-gram subwords (`minn`..`maxn`, `<`/`>` boundaries, UTF-8
  * continuation-byte aware) hashed into `bucket` rows with fastText's
  * signed-FNV-1a, `wordNgrams` hashes (`h * 116049371 + next`), the
  * averaged hidden vector, and a softmax (or one-vs-all sigmoid) over
  * the output matrix.
  *
  * Product-quantized `.ftz` models (quantmatrix.cc/productquantizer.cc:
  * per-row subquantizer codes + 256-centroid codebooks, optional norm
  * quantizer) DEQUANTIZE to dense at load, and pruned dictionaries
  * (`quantize -cutoff`) remap surviving bucket hashes through the stored
  * prune index — the distributed lid.176.ftz shape loads as-is.
  *
  * Execution model: the model is a DRIVER-side object broadcast once;
  * scoring is a compiled `Dataset.map` (the HfTokenizer pattern — no
  * UDF registration, no per-row interpretation). Losses: softmax,
  * one-vs-all sigmoid, negative sampling (prediction-side it IS the
  * ova sigmoid — loss.cc's NegativeSamplingLoss inherits
  * BinaryLogisticLoss::predict), and HIERARCHICAL SOFTMAX — the hs tree
  * rebuilds from the dictionary's label counts exactly as loss.cc
  * buildTree does (two-pointer merge, strict-< tie-breaks), and
  * prediction is the root-to-leaf sigmoid product. Guard rails
  * (directed): non-supervised models, bad
  * magic/version. */
object FastText {
  final case class UnsupportedFastText(msg: String)
    extends RuntimeException(msg)

  val Magic = 793712314
  val Version = 12

  /** A loaded supervised model (dense or dequantized). `input` rows:
    * word ids (0..nwords-1) then hash rows — all `bucket` of them for an
    * unpruned model, or the retained compact set when `pruneIdx` maps
    * surviving bucket hashes to compact indexes (the `quantize -cutoff`
    * shape every distributed .ftz carries). `output` rows: one per
    * label, in label-id order (for `hs` only the first nlabels−1 rows
    * are used — they score the Huffman tree's INTERNAL nodes).
    * `labelCounts` (label-id order) rebuild that tree exactly as
    * training did. */
  final case class Model(dim: Int, minn: Int, maxn: Int, bucket: Int,
      wordNgrams: Int, loss: String,
      words: Map[String, Int], labels: Array[String],
      input: Array[Array[Float]], output: Array[Array[Float]],
      pruneIdx: Option[Map[Int, Int]] = None,
      labelCounts: Array[Long] = Array.empty)
    extends Serializable {
    require(pruneIdx.isDefined ||
      input.length >= words.size + (if (maxn > 0 || wordNgrams > 1) bucket else 0),
      s"input matrix has ${input.length} rows for ${words.size} words + $bucket buckets")
    require(output.length == labels.length,
      s"output matrix has ${output.length} rows for ${labels.length} labels")

    /** The Huffman tree over the label counts, rebuilt lazily per JVM
      * (loss.cc stores no tree in the file — every loader rebuilds it
      * from the dictionary counts). `(left, right)` per internal node,
      * indexed `node − nlabels`; hand-built models without counts get
      * uniform ones (deterministic, same builder). */
    @transient lazy val hsTree: Array[(Int, Int)] =
      FastText.buildHuffman(
        if (labelCounts.length == labels.length) labelCounts
        else Array.fill(labels.length)(1L))

    /** dictionary.cc pushHash: a raw bucket hash -> input row, or -1 when
      * the bucket was pruned away. */
    private[graft] def bucketRow(h: Int): Int = pruneIdx match {
      case None => words.size + h
      case Some(m) => m.get(h).map(words.size + _).getOrElse(-1)
    }
  }

  /** loss.cc `HierarchicalSoftmaxLoss::buildTree`, faithfully: counts in
    * dictionary order (descending — the dictionary is count-sorted), the
    * two-pointer merge over [leaves | internal], STRICT `<` tie-breaks,
    * internal nodes pre-seeded with 1e15. Returns `(left, right)` per
    * internal node; the root is the last one (tree node 2·n−2). */
  private[graft] def buildHuffman(counts: Array[Long]): Array[(Int, Int)] = {
    val osz = counts.length
    if (osz <= 1) return Array.empty
    val n = 2 * osz - 1
    val cnt = new Array[Long](n)
    Array.copy(counts, 0, cnt, 0, osz)
    java.util.Arrays.fill(cnt, osz, n, 1000000000000000L) // 1e15, as in C++
    val left = new Array[Int](osz - 1)
    val right = new Array[Int](osz - 1)
    var leaf = osz - 1
    var node = osz
    var i = osz
    while (i < n) {
      var mini0 = 0
      var mini1 = 0
      if (leaf >= 0 && cnt(leaf) < cnt(node)) { mini0 = leaf; leaf -= 1 }
      else { mini0 = node; node += 1 }
      if (leaf >= 0 && cnt(leaf) < cnt(node)) { mini1 = leaf; leaf -= 1 }
      else { mini1 = node; node += 1 }
      left(i - osz) = mini0
      right(i - osz) = mini1
      cnt(i) = cnt(mini0) + cnt(mini1)
      i += 1
    }
    left.zip(right)
  }

  // ------------------------------------------------------------- hashing

  /** fastText's FNV-1a variant: the byte is SIGN-EXTENDED before the
    * xor (dictionary.cc `Dictionary::hash` casts through int8_t). */
  def hash(s: String): Int = hashBytes(s.getBytes("UTF-8"))

  /** Character n-grams of `<word>` between minn..maxn, skipping UTF-8
    * continuation bytes as start positions and extending each step to a
    * codepoint boundary; the whole-token 1-gram cases fastText skips are
    * skipped here too (dictionary.cc computeSubwords). Emits bucket-row
    * indexes (nwords + hash % bucket). */
  private def subwordRows(word: String, m: Model): Seq[Int] = {
    val w = ("<" + word + ">").getBytes("UTF-8")
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i < w.length) {
      if ((w(i) & 0xc0) != 0x80) {
        var j = i
        var n = 1
        val ngram = new java.io.ByteArrayOutputStream()
        while (j < w.length && n <= m.maxn) {
          ngram.write(w(j)); j += 1
          while (j < w.length && (w(j) & 0xc0) == 0x80) {
            ngram.write(w(j)); j += 1
          }
          if (n >= m.minn && !(n == 1 && (i == 0 || j == w.length))) {
            val h = hashBytes(ngram.toByteArray)
            // uint32 % int32 in fastText — unsigned remainder, not floorMod
            val row = m.bucketRow(
              java.lang.Integer.remainderUnsigned(h, m.bucket))
            if (row >= 0) out += row
          }
          n += 1
        }
      }
      i += 1
    }
    out.result()
  }

  private def hashBytes(bytes: Array[Byte]): Int = {
    var h = 0x811c9dc5 // 2166136261
    var i = 0
    while (i < bytes.length) {
      h = h ^ bytes(i).toInt // sign-extended byte, per dictionary.cc
      h = h * 16777619
      i += 1
    }
    h
  }

  /** The input-matrix row set for one line of text (dictionary.cc
    * getLine + addSubwords + addWordNgrams, supervised path): known words
    * contribute their id (+ char n-grams when maxn > 0), OOV words their
    * char n-grams only, every token's hash feeds the word-ngram rolls. */
  private[graft] def lineRows(text: String, m: Model): Array[Int] = {
    val nwords = m.words.size
    val toks = text.split("[ \\t\\n\\u000b\\f\\r]+").filter(_.nonEmpty) :+ "</s>"
    val rows = Array.newBuilder[Int]
    val tokenHashes = Array.newBuilder[Long]
    toks.foreach { t =>
      val wid = m.words.getOrElse(t, -1)
      if (wid >= 0) {
        if (m.maxn <= 0) rows += wid
        else {
          rows += wid
          if (t != "</s>") rows ++= subwordRows(t, m)
        }
      } else if (m.maxn > 0 && t != "</s>") {
        rows ++= subwordRows(t, m)
      }
      // fastText stores token hashes as int32_t and converts to uint64_t
      // for the roll — SIGN-extended, not zero-extended (dictionary.cc:
      // `uint64_t h = hashes[i]`); toLong reproduces that exactly
      tokenHashes += hash(t).toLong
    }
    if (m.wordNgrams > 1) {
      val hs = tokenHashes.result()
      var i = 0
      while (i < hs.length) {
        var h = hs(i)
        var j = i + 1
        while (j < hs.length && j < i + m.wordNgrams) {
          h = h * 116049371L + hs(j)
          // uint64 % bucket in fastText — unsigned remainder
          val row = m.bucketRow(
            java.lang.Long.remainderUnsigned(h, m.bucket.toLong).toInt)
          if (row >= 0) rows += row
          j += 1
        }
        i += 1
      }
    }
    rows.result()
  }

  /** (label, probability) pairs for one line, descending. */
  def scoreLine(text: String, m: Model): Array[(String, Double)] = {
    val rows = lineRows(text, m)
    if (rows.isEmpty)
      return m.labels.map(l => (l, Double.NaN))
    val hidden = new Array[Double](m.dim)
    rows.foreach { r =>
      val v = m.input(r)
      var d = 0
      while (d < m.dim) { hidden(d) += v(d); d += 1 }
    }
    var d = 0
    while (d < m.dim) { hidden(d) /= rows.length; d += 1 }
    val raw = m.output.map { o =>
      var s = 0.0
      var i = 0
      while (i < m.dim) { s += o(i) * hidden(i); i += 1 }
      s
    }
    val probs = m.loss match {
      case "softmax" =>
        val mx = raw.max
        val ex = raw.map(s => math.exp(s - mx))
        val z = ex.sum
        ex.map(_ / z)
      // negative sampling trains differently but PREDICTS exactly like
      // ova: an independent sigmoid per output row (fastText's
      // NegativeSamplingLoss inherits BinaryLogisticLoss::predict)
      case "ova" | "ns" => raw.map(s => 1.0 / (1.0 + math.exp(-s)))
      case "hs" =>
        // loss.cc dfs: each INTERNAL node's sigmoid splits probability
        // between its left (1−f) and right (f) subtrees; a leaf's
        // probability is the product along its root path. Exhaustive
        // walk — label counts are small, and serving every label's
        // probability matches the softmax/ova arms.
        val osz = m.labels.length
        if (osz == 1) Array(1.0)
        else {
          val tree = m.hsTree
          val out = new Array[Double](osz)
          def dfs(node: Int, logp: Double): Unit =
            if (node < osz) out(node) = math.exp(logp)
            else {
              val f = 1.0 / (1.0 + math.exp(-raw(node - osz)))
              val (l, r) = tree(node - osz)
              dfs(l, logp + math.log(1.0 - f))
              dfs(r, logp + math.log(f))
            }
          dfs(2 * osz - 2, 0.0)
          out
        }
      case other => throw UnsupportedFastText(
        s"loss '$other' prediction is not implemented " +
          "(softmax/ova/hs/ns only)")
    }
    m.labels.zip(probs).sortBy(-_._2)
  }

  /** Top-1 prediction per row: (idCol, label, prob). Compiled map over a
    * broadcast model — the matrices ship to each executor once, rows
    * stream through codegen'd serialization. */
  def predictTop(df: DataFrame, idCol: String, textCol: String,
      m: Model): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(m)
    df.select(org.apache.spark.sql.functions.col(idCol).cast("long"),
        org.apache.spark.sql.functions.col(textCol))
      .as[(Long, String)]
      .map { case (id, text) =>
        val best = scoreLine(Option(text).getOrElse(""), bc.value).head
        (id, best._1, best._2)
      }
      .toDF("id", "label", "prob")
  }

  // ------------------------------------------------------------ bin load

  private final class Cur(val bb: ByteBuffer) {
    def i32(): Int = bb.getInt
    def i64(): Long = bb.getLong
    def f64(): Double = bb.getDouble
    def i8(): Int = bb.get.toInt
    def cstr(): String = {
      val out = new java.io.ByteArrayOutputStream()
      var b = bb.get
      while (b != 0) { out.write(b); b = bb.get }
      new String(out.toByteArray, "UTF-8")
    }
  }

  /** Load a fastText `.bin` supervised model. The file is read fully
    * driver-side (models are tens–hundreds of MB; the corpus never is)
    * and the matrices broadcast at predict time. */
  def load(path: String, conf: Configuration): Model = {
    val p = new Path(path)
    val fs = p.getFileSystem(conf)
    val len = fs.getFileStatus(p).getLen
    require(len < Int.MaxValue, s"$path: ${len}B model exceeds the 2 GiB read")
    val bytes = new Array[Byte](len.toInt)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    loadBytes(bytes, path)
  }

  private[graft] def loadBytes(bytes: Array[Byte], what: String): Model = {
    val c = new Cur(ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN))
    val magic = c.i32()
    if (magic != Magic) throw UnsupportedFastText(
      s"$what: magic $magic != $Magic — not a fastText model " +
        "(note: .vec files are text embeddings, not models)")
    val version = c.i32()
    if (version > Version) throw UnsupportedFastText(
      s"$what: model version $version is newer than the supported $Version")
    // Args (args.cc save order)
    val dim = c.i32()
    c.i32() // ws
    c.i32() // epoch
    c.i32() // minCount
    c.i32() // neg
    val wordNgrams = c.i32()
    val loss = c.i32() match {
      case 1 => "hs"
      case 2 => "ns"
      case 3 => "softmax"
      case 4 => "ova"
      case o => throw UnsupportedFastText(s"$what: unknown loss enum $o")
    }
    val model = c.i32() // 1 cbow, 2 sg, 3 sup
    if (model != 3) throw UnsupportedFastText(
      s"$what: model type $model is not supervised — only classifier " +
        "models predict labels")
    val bucket = c.i32()
    val minn = c.i32()
    var maxn = c.i32()
    c.i32() // lrUpdateRate
    c.f64() // t
    if (version == 11) maxn = 0 // fasttext.cc back-compat rule for sup
    // Dictionary (dictionary.cc save order). Label COUNTS are kept: the
    // hs loss rebuilds its Huffman tree from them at load, exactly as
    // fastText's own loader does.
    val size = c.i32()
    val nwords = c.i32()
    val nlabels = c.i32()
    c.i64() // ntokens
    val pruneIdxSize = c.i64()
    val words = Map.newBuilder[String, Int]
    val labels = Array.newBuilder[String]
    val labelCounts = Array.newBuilder[Long]
    var wi = 0
    var i = 0
    while (i < size) {
      val w = c.cstr()
      val count = c.i64()
      val tpe = c.i8()
      if (tpe == 0) { words += w -> wi; wi += 1 }
      else { labels += w.stripPrefix("__label__"); labelCounts += count }
      i += 1
    }
    if (wi != nwords || size - wi != nlabels) throw UnsupportedFastText(
      s"$what: dictionary counts disagree (declared $nwords words/" +
        s"$nlabels labels, read $wi/${size - wi})")
    // pruneidx_size >= 0 marks a PRUNED dictionary (quantize -cutoff —
    // every distributed .ftz): surviving bucket hashes remap to compact
    // input rows through the stored (hash, index) pairs
    val pruneIdx: Option[Map[Int, Int]] =
      if (pruneIdxSize < 0) None
      else Some((0L until pruneIdxSize).map(_ => c.i32() -> c.i32()).toMap)
    val quantInput = c.i8() != 0
    def denseMatrix(): Array[Array[Float]] = {
      val m = c.i64()
      val n = c.i64()
      require(n == dim, s"$what: matrix cols $n != dim $dim")
      require(m >= 0 && m < Int.MaxValue / 4, s"$what: matrix rows $m")
      Array.fill(m.toInt) {
        val row = new Array[Float](dim)
        var j = 0
        while (j < dim) { row(j) = c.bb.getFloat; j += 1 }
        row
      }
    }
    // productquantizer.cc load: dim, nsubq, dsub, lastdsub (int32), then
    // dim * 256 float32 centroids
    def pqLoad(): (Int, Int, Int, Int, Array[Float]) = {
      val pdim = c.i32(); val nsubq = c.i32()
      val dsub = c.i32(); val lastdsub = c.i32()
      require(pdim > 0 && pdim < (1 << 26), s"$what: pq dim $pdim")
      val cent = new Array[Float](pdim * 256)
      var i = 0
      while (i < cent.length) { cent(i) = c.bb.getFloat; i += 1 }
      (pdim, nsubq, dsub, lastdsub, cent)
    }
    // quantmatrix.cc load (.ftz): qnorm flag, m/n (int64), codes, the
    // product quantizer, and when qnorm the per-row norm codes + their
    // one-dim quantizer. Dequantized to a dense matrix at load — the
    // model is MBs; the corpus it scores is what stays distributed.
    def quantMatrix(): Array[Array[Float]] = {
      val qnorm = c.i8() != 0
      val m = c.i64()
      val n = c.i64()
      require(n == dim, s"$what: quant matrix cols $n != dim $dim")
      require(m >= 0 && m < Int.MaxValue / 8, s"$what: quant matrix rows $m")
      val codesize = c.i32()
      val codes = new Array[Byte](codesize)
      c.bb.get(codes)
      val (pdim, nsubq, dsub, lastdsub, cent) = pqLoad()
      require(pdim == dim,
        s"$what: product quantizer dim $pdim != model dim $dim")
      require(codesize.toLong == m * nsubq,
        s"$what: $codesize code bytes for $m rows x $nsubq subquantizers")
      val (normCodes, normCent) =
        if (!qnorm) (null: Array[Byte], null: Array[Float])
        else {
          val nc = new Array[Byte](m.toInt)
          c.bb.get(nc)
          val (nd, _, _, _, ncent) = pqLoad()
          require(nd == 1, s"$what: norm quantizer dim $nd != 1")
          (nc, ncent)
        }
      Array.tabulate(m.toInt) { r =>
        val row = new Array[Float](dim)
        val norm = if (normCodes == null) 1.0f
          else normCent(normCodes(r) & 0xff)
        var sub = 0
        while (sub < nsubq) {
          val code = codes(r * nsubq + sub) & 0xff
          val d = if (sub == nsubq - 1) lastdsub else dsub
          // get_centroids: (sub*256 + code)*dsub, except the LAST
          // subquantizer strides by lastdsub within its block
          val base =
            if (sub == nsubq - 1) sub * 256 * dsub + code * lastdsub
            else (sub * 256 + code) * dsub
          var j = 0
          while (j < d) { row(sub * dsub + j) = norm * cent(base + j); j += 1 }
          sub += 1
        }
        row
      }
    }
    val input = if (quantInput) quantMatrix() else denseMatrix()
    val qout = c.i8() != 0
    val output = if (quantInput && qout) quantMatrix() else denseMatrix()
    Model(dim, minn, maxn, bucket, wordNgrams, loss,
      words.result(), labels.result(), input, output, pruneIdx,
      labelCounts.result())
  }

  // ----------------------------------------------------------- bin write

  /** Serialize a dense supervised model in the `.bin` layout — the
    * fixture/round-trip half (specs author planted-weight models; real
    * models are read, not written, through this engine). */
  def write(path: String, m: Model, conf: Configuration): Unit = {
    val out = new java.io.ByteArrayOutputStream()
    def i32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def i64(v: Long): Unit = { i32(v.toInt); i32((v >>> 32).toInt) }
    def f32(v: Float): Unit = i32(java.lang.Float.floatToIntBits(v))
    i32(Magic); i32(Version)
    i32(m.dim); i32(5); i32(5); i32(1); i32(5) // ws epoch minCount neg
    i32(m.wordNgrams)
    i32(m.loss match { case "softmax" => 3; case "ova" => 4
      case "hs" => 1; case _ => 2 })
    i32(3) // supervised
    i32(m.bucket); i32(m.minn); i32(m.maxn); i32(100) // lrUpdateRate
    i64(java.lang.Double.doubleToLongBits(1e-4))
    val wordList = m.words.toSeq.sortBy(_._2)
    i32(wordList.size + m.labels.length)
    i32(wordList.size); i32(m.labels.length)
    i64(1000L) // ntokens
    i64(-1L) // pruneidx_size: -1 = never pruned
    def entry(w: String, tpe: Int, count: Long): Unit = {
      out.write(w.getBytes("UTF-8")); out.write(0)
      i64(count); out.write(tpe)
    }
    wordList.foreach { case (w, _) => entry(w, 0, 1L) }
    m.labels.zipWithIndex.foreach { case (l, i) =>
      // label counts persist — the hs Huffman tree rebuilds from them
      entry("__label__" + l, 1,
        if (i < m.labelCounts.length) m.labelCounts(i) else 1L)
    }
    out.write(0) // quant_input = false
    def mat(rows: Array[Array[Float]]): Unit = {
      i64(rows.length.toLong); i64(m.dim.toLong)
      rows.foreach(_.foreach(f32))
    }
    mat(m.input)
    out.write(0) // qout = false
    mat(m.output)
    val p = new Path(path)
    val os = p.getFileSystem(conf).create(p, true)
    try os.write(out.toByteArray) finally os.close()
  }
}
