package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Hugging Face `tokenizer.json` interop — tokenize a corpus with a
  * PRODUCTION tokenizer (the GPT-2/Llama byte-level BPE family), built
  * from the PUBLIC file format of the huggingface/tokenizers library and
  * the GPT-2 byte-level scheme (openai/gpt-2 encoder.py): the
  * bytes-to-unicode table, the contraction/letters/numbers/other
  * pre-tokenization regex, and greedy lowest-rank merge application.
  * Token counting under the real vocabulary is the load-bearing use:
  * packing budgets, per-document costs, and length filters all key on
  * the deployed tokenizer's ids, not a whitespace proxy.
  *
  * Scope (directed, never silently wrong): model.type "BPE";
  * pre_tokenizer ByteLevel (regex on/off, add_prefix_space honored) or
  * Whitespace; normalizer absent or any Sequence of NFC/NFKC/NFD/NFKD/
  * Lowercase; added/special tokens split out greedily BEFORE
  * pre-tokenization (longest first) and map to their own ids. WordPiece/
  * Unigram models are named rejections.
  *
  * Scale model: the spec is a driver-side object (vocab + ranks, a few
  * MB for a 50k vocab) that ships ONCE into a compiled `Dataset.map` —
  * per-row encode runs as one JVM lambda, no UDF registry, no shuffle. */
object HfTokenizer {
  final case class UnsupportedTokenizer(msg: String)
    extends RuntimeException(msg)

  final case class Spec(
      vocab: Map[String, Int],
      ranks: Map[(String, String), Int],
      byteLevel: Boolean,
      addPrefixSpace: Boolean,
      useRegex: Boolean,
      normalizers: Seq[String],          // applied in order
      specials: Seq[(String, Int)],      // longest-first at encode time
      unkId: Option[Int]) extends Serializable

  private implicit val formats: Formats = DefaultFormats

  // GPT-2's bytes_to_unicode (encoder.py): printable latin-1 ranges map
  // to themselves, every other byte maps to 256+n in discovery order
  private[graft] val byteToChar: Array[Char] = {
    val direct = (('!' to '~') ++ ('¡' to '¬') ++
      ('®' to 'ÿ')).map(_.toInt).toSet
    val out = new Array[Char](256)
    var n = 0
    (0 until 256).foreach { b =>
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
    }
    out
  }

  // the ByteLevel pre-tokenization regex (tokenizers' ByteLevel, from
  // GPT-2): contractions, optional-space letter runs, number runs,
  // punctuation runs, trailing-space handling
  private val ByteLevelRe = java.util.regex.Pattern.compile(
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""")
  private val WhitespaceRe2 = java.util.regex.Pattern.compile("""\w+|[^\w\s]+""")

  // ------------------------------------------------------------- loading

  def load(path: String): Spec =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(json: String): Spec = {
    val j = JsonMethods.parse(json)
    val model = j \ "model"
    val mType = (model \ "type").extractOpt[String].getOrElse("BPE")
    if (mType != "BPE") throw UnsupportedTokenizer(
      s"model.type $mType (BPE only — WordPiece/Unigram are different algorithms)")
    val vocab = (model \ "vocab") match {
      case JObject(fields) => fields.map { case (k, v) => k -> v.extract[Int] }.toMap
      case _ => throw UnsupportedTokenizer("model.vocab missing")
    }
    // merges ship as "a b" strings (classic) or ["a", "b"] pairs (newer)
    val ranks = (model \ "merges") match {
      case JArray(ms) => ms.zipWithIndex.map {
        case (JString(s), i) =>
          val sp = s.indexOf(' ')
          if (sp < 0) throw UnsupportedTokenizer(s"malformed merge '$s'")
          (s.take(sp), s.drop(sp + 1)) -> i
        case (JArray(List(JString(a), JString(b))), i) => (a, b) -> i
        case (other, _) => throw UnsupportedTokenizer(s"malformed merge $other")
      }.toMap
      case _ => Map.empty[(String, String), Int]
    }
    // pre_tokenizer: ByteLevel, Whitespace, or a Sequence containing them
    def flat(p: JValue): Seq[JValue] = (p \ "type").extractOpt[String] match {
      case Some("Sequence") =>
        (p \ "pretokenizers").extract[Seq[JValue]].flatMap(flat)
      case Some(_) => Seq(p)
      case None => Nil
    }
    val pres = flat(j \ "pre_tokenizer")
    val byteLevelPre = pres.find(p =>
      (p \ "type").extractOpt[String].contains("ByteLevel"))
    val whitespacePre = pres.exists(p => (p \ "type").extractOpt[String]
      .exists(t => t == "Whitespace" || t == "WhitespaceSplit"))
    pres.foreach { p =>
      val t = (p \ "type").extract[String]
      if (t != "ByteLevel" && t != "Whitespace" && t != "WhitespaceSplit")
        throw UnsupportedTokenizer(s"pre_tokenizer $t " +
          "(ByteLevel / Whitespace only)")
    }
    if (byteLevelPre.isEmpty && !whitespacePre && pres.nonEmpty)
      throw UnsupportedTokenizer("unrecognized pre_tokenizer stack")
    // normalizer: absent, a single named one, or a Sequence
    def flatN(p: JValue): Seq[String] = (p \ "type").extractOpt[String] match {
      case Some("Sequence") =>
        (p \ "normalizers").extract[Seq[JValue]].flatMap(flatN)
      case Some(t) => Seq(t)
      case None => Nil
    }
    val norms = flatN(j \ "normalizer")
    norms.foreach { n =>
      if (!Set("NFC", "NFKC", "NFD", "NFKD", "Lowercase")(n))
        throw UnsupportedTokenizer(s"normalizer $n " +
          "(NFC/NFKC/NFD/NFKD/Lowercase only)")
    }
    val specials = (j \ "added_tokens").extractOpt[Seq[JValue]].getOrElse(Nil)
      .map(t => ((t \ "content").extract[String], (t \ "id").extract[Int]))
      .sortBy(-_._1.length)
    val unk = (model \ "unk_token").extractOpt[String]
      .flatMap(u => vocab.get(u))
    Spec(vocab, ranks,
      byteLevel = byteLevelPre.isDefined,
      addPrefixSpace = byteLevelPre.exists(p =>
        (p \ "add_prefix_space").extractOpt[Boolean].getOrElse(false)),
      useRegex = byteLevelPre.forall(p =>
        (p \ "use_regex").extractOpt[Boolean].getOrElse(true)),
      normalizers = norms, specials = specials, unkId = unk)
  }

  // ------------------------------------------------------------ encoding

  /** Encode one string to token ids (the local/test surface; [[encode]]
    * runs this per row inside a compiled map). */
  def encodeString(spec: Spec, text0: String): Seq[Int] = {
    if (text0 == null || text0.isEmpty) return Nil
    // specials split out first, longest-first, never normalized
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    def encodePlain(raw: String): Unit = {
      if (raw.isEmpty) return
      var text = raw
      spec.normalizers.foreach {
        case "Lowercase" => text = text.toLowerCase(java.util.Locale.ROOT)
        case nf => text = java.text.Normalizer.normalize(text,
          java.text.Normalizer.Form.valueOf(nf))
      }
      if (spec.byteLevel && spec.addPrefixSpace && !text.startsWith(" "))
        text = " " + text
      val pieces: Iterator[String] =
        if (spec.byteLevel && spec.useRegex) {
          val m = ByteLevelRe.matcher(text)
          Iterator.continually(if (m.find()) m.group() else null)
            .takeWhile(_ != null)
        } else if (spec.byteLevel) Iterator.single(text)
        else {
          val m = WhitespaceRe2.matcher(text)
          Iterator.continually(if (m.find()) m.group() else null)
            .takeWhile(_ != null)
        }
      pieces.foreach { piece =>
        val sym =
          if (spec.byteLevel)
            piece.getBytes("UTF-8").map(b => byteToChar(b & 0xff).toString)
          else piece.map(_.toString).toArray
        var parts = sym
        var done = parts.length < 2
        while (!done) {
          var best = -1
          var bestRank = Int.MaxValue
          var i = 0
          while (i < parts.length - 1) {
            val r = spec.ranks.getOrElse((parts(i), parts(i + 1)), Int.MaxValue)
            if (r < bestRank) { bestRank = r; best = i }
            i += 1
          }
          if (best < 0 || bestRank == Int.MaxValue) done = true
          else {
            parts = (parts.take(best) :+ (parts(best) + parts(best + 1))) ++
              parts.drop(best + 2)
            done = parts.length < 2
          }
        }
        parts.foreach { p =>
          spec.vocab.get(p) match {
            case Some(id) => out += id
            case None => spec.unkId match {
              case Some(u) => out += u
              case None => throw UnsupportedTokenizer(
                s"token '$p' not in vocab and no unk_token declared")
            }
          }
        }
      }
    }
    // greedy special-token scan: find the earliest (then longest) special
    var rest = text0
    while (rest.nonEmpty) {
      var bestIdx = -1
      var bestTok: (String, Int) = null
      spec.specials.foreach { case (s, id) =>
        val i = rest.indexOf(s)
        if (i >= 0 && (bestIdx < 0 || i < bestIdx ||
          (i == bestIdx && s.length > bestTok._1.length))) {
          bestIdx = i; bestTok = (s, id)
        }
      }
      if (bestIdx < 0) { encodePlain(rest); rest = "" }
      else {
        encodePlain(rest.take(bestIdx))
        out += bestTok._2
        rest = rest.drop(bestIdx + bestTok._1.length)
      }
    }
    out.toSeq
  }

  /** (id, n_tokens, token_ids) per row — one compiled map, spec shipped
    * once in the closure. */
  def encode(df: DataFrame, idCol: String, textCol: String,
      spec: Spec): DataFrame = {
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val schema = StructType(Seq(
      in.schema.fields(0),
      StructField("n_tokens", LongType, nullable = false),
      StructField("token_ids", ArrayType(IntegerType), nullable = false)))
    in.map { row =>
      val ids = encodeString(spec, if (row.isNullAt(1)) "" else row.getString(1))
      org.apache.spark.sql.Row(row.get(0), ids.length.toLong, ids)
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
