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
  * Execution model: the model is a DRIVER-side object broadcast once;
  * scoring is a compiled `Dataset.map` (the HfTokenizer pattern — no
  * UDF registration, no per-row interpretation). Guard rails (directed):
  * product-quantized models (`.ftz` — requant with fastText or export
  * dense), pruned dictionaries, hierarchical-softmax / negative-sampling
  * losses, non-supervised models. */
object FastText {
  final case class UnsupportedFastText(msg: String)
    extends RuntimeException(msg)

  val Magic = 793712314
  val Version = 12

  /** A loaded dense supervised model. `input` rows: word ids
    * (0..nwords-1) then `bucket` hash rows; `output` rows: one per
    * label, in label-id order. */
  final case class Model(dim: Int, minn: Int, maxn: Int, bucket: Int,
      wordNgrams: Int, loss: String,
      words: Map[String, Int], labels: Array[String],
      input: Array[Array[Float]], output: Array[Array[Float]])
    extends Serializable {
    require(input.length >= words.size + (if (maxn > 0 || wordNgrams > 1) bucket else 0),
      s"input matrix has ${input.length} rows for ${words.size} words + $bucket buckets")
    require(output.length == labels.length,
      s"output matrix has ${output.length} rows for ${labels.length} labels")
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
  private def subwordRows(word: String, minn: Int, maxn: Int, bucket: Int,
      nwords: Int): Seq[Int] = {
    val w = ("<" + word + ">").getBytes("UTF-8")
    val out = Seq.newBuilder[Int]
    var i = 0
    while (i < w.length) {
      if ((w(i) & 0xc0) != 0x80) {
        var j = i
        var n = 1
        val ngram = new java.io.ByteArrayOutputStream()
        while (j < w.length && n <= maxn) {
          ngram.write(w(j)); j += 1
          while (j < w.length && (w(j) & 0xc0) == 0x80) {
            ngram.write(w(j)); j += 1
          }
          if (n >= minn && !(n == 1 && (i == 0 || j == w.length))) {
            val h = hashBytes(ngram.toByteArray)
            // uint32 % int32 in fastText — unsigned remainder, not floorMod
            out += nwords + java.lang.Integer.remainderUnsigned(h, bucket)
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
          if (t != "</s>") rows ++= subwordRows(t, m.minn, m.maxn, m.bucket, nwords)
        }
      } else if (m.maxn > 0 && t != "</s>") {
        rows ++= subwordRows(t, m.minn, m.maxn, m.bucket, nwords)
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
          rows += nwords +
            java.lang.Long.remainderUnsigned(h, m.bucket.toLong).toInt
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
      case "ova" => raw.map(s => 1.0 / (1.0 + math.exp(-s)))
      case other => throw UnsupportedFastText(
        s"loss '$other' prediction is not implemented (softmax/ova only)")
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
    if (loss == "hs" || loss == "ns") throw UnsupportedFastText(
      s"$what: $loss-trained prediction is not implemented " +
        "(softmax/ova models only)")
    // Dictionary (dictionary.cc save order)
    val size = c.i32()
    val nwords = c.i32()
    val nlabels = c.i32()
    c.i64() // ntokens
    val pruneIdxSize = c.i64()
    val words = Map.newBuilder[String, Int]
    val labels = Array.newBuilder[String]
    var wi = 0
    var i = 0
    while (i < size) {
      val w = c.cstr()
      c.i64() // count
      val tpe = c.i8()
      if (tpe == 0) { words += w -> wi; wi += 1 }
      else labels += w.stripPrefix("__label__")
      i += 1
    }
    if (wi != nwords || size - wi != nlabels) throw UnsupportedFastText(
      s"$what: dictionary counts disagree (declared $nwords words/" +
        s"$nlabels labels, read $wi/${size - wi})")
    // pruneidx_size >= 0 marks a PRUNED dictionary (even 0: every ngram
    // bucket dropped); bucket rows then remap through pruneidx and a
    // straight read would silently mis-bucket
    if (pruneIdxSize >= 0) throw UnsupportedFastText(
      s"$what: pruned dictionary ($pruneIdxSize prune entries) is not " +
        "implemented — export an unpruned model")
    val quantInput = c.i8() != 0
    if (quantInput) throw UnsupportedFastText(
      s"$what: product-quantized input matrix (.ftz) is not implemented " +
        "— load the dense .bin export")
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
    val input = denseMatrix()
    c.i8() // qout flag — meaningless when the input is dense
    val output = denseMatrix()
    Model(dim, minn, maxn, bucket, wordNgrams, loss,
      words.result(), labels.result(), input, output)
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
    def entry(w: String, tpe: Int): Unit = {
      out.write(w.getBytes("UTF-8")); out.write(0)
      i64(1L); out.write(tpe)
    }
    wordList.foreach { case (w, _) => entry(w, 0) }
    m.labels.foreach(l => entry("__label__" + l, 1))
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
