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
  * All three model families decode: "BPE" (greedy lowest-rank merges,
  * byte-level or character symbols), "WordPiece" (the published BERT
  * greedy longest-match with "##" continuations and the one-unk-per-bad-
  * word rule), and "Unigram" (the SentencePiece Viterbi lattice over
  * piece log-probs, with "<0xNN>" byte fallback when the model declares
  * it). Pre-tokenizers: ByteLevel (regex on/off, add_prefix_space),
  * Whitespace, BertPreTokenizer (punctuation isolation), and Metaspace
  * (the SentencePiece "▁" scheme, prepend honored). Normalizers: NFC/
  * NFKC/NFD/NFKD/Lowercase/StripAccents, with BertNormalizer expanding
  * to its published steps. Added/special tokens split out greedily
  * BEFORE pre-tokenization (longest first) and map to their own ids.
  * Anything else is a NAMED rejection, never a silent mis-tokenization.
  *
  * Scale model: the spec is a driver-side object (vocab + ranks, a few
  * MB for a 50k vocab) that ships ONCE into a compiled `Dataset.map` —
  * per-row encode runs as one JVM lambda, no UDF registry, no shuffle. */
object HfTokenizer {
  final case class UnsupportedTokenizer(msg: String)
    extends RuntimeException(msg)

  final case class Spec(
      modelType: String,                 // BPE | WordPiece | Unigram
      vocab: Map[String, Int],
      ranks: Map[(String, String), Int],
      byteLevel: Boolean,
      addPrefixSpace: Boolean,
      useRegex: Boolean,
      normalizers: Seq[String],          // applied in order
      specials: Seq[(String, Int)],      // longest-first at encode time
      unkId: Option[Int],
      // WordPiece (BERT): the "##" continuation prefix + the per-word cap
      contPrefix: String = "##",
      maxInputChars: Int = 100,
      bertPre: Boolean = false,          // BertPreTokenizer punct isolation
      // Unigram (SentencePiece): piece log-probs, the Metaspace
      // replacement char, and byte fallback ("<0xNN>" pieces)
      logProbs: Map[String, Double] = Map.empty,
      metaspace: Boolean = false,
      metaReplacement: Char = '▁',
      byteFallback: Boolean = false) extends Serializable {
    /** The Unigram lattice's unknown-edge score: one fold over the piece
      * log-probs, computed once per Spec instance (per JVM after
      * deserialization), never per word. */
    @transient lazy val unknownPenalty: Double =
      logProbs.values.foldLeft(0.0)(math.min) - 10.0
  }

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
  // punctuation runs, trailing-space handling. UNICODE_CHARACTER_CLASS
  // makes Java's \s and \w match the Rust/Python regex semantics the
  // reference implementations use (NBSP is whitespace, é is a word char)
  private val UFlag = java.util.regex.Pattern.UNICODE_CHARACTER_CLASS
  private val ByteLevelRe = java.util.regex.Pattern.compile(
    """'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    UFlag)
  private val WhitespaceRe2 =
    java.util.regex.Pattern.compile("""\w+|[^\w\s]+""", UFlag)
  // BertPreTokenizer: whitespace split + every punctuation char isolated —
  // BERT's _is_punctuation also counts the ASCII SYMBOL ranges
  // ($ + < = > ^ ` | ~) as punctuation regardless of Unicode category
  private val BertPreRe = java.util.regex.Pattern.compile(
    """[^\s\p{P}$+<=>^`|~]+|[\p{P}$+<=>^`|~]""", UFlag)

  // ------------------------------------------------------------- loading

  def load(path: String): Spec =
    parse(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"))

  def parse(json: String): Spec = {
    val j = JsonMethods.parse(json)
    val model = j \ "model"
    val mType = (model \ "type").extractOpt[String].getOrElse("BPE")
    if (!Set("BPE", "WordPiece", "Unigram")(mType))
      throw UnsupportedTokenizer(
        s"model.type $mType (BPE / WordPiece / Unigram only)")
    // BPE and WordPiece carry {token: id}; Unigram carries [[piece, logp]]
    val (vocab, logProbs) = (model \ "vocab") match {
      case JObject(fields) =>
        (fields.map { case (k, v) => k -> v.extract[Int] }.toMap,
          Map.empty[String, Double])
      case JArray(entries) if mType == "Unigram" =>
        val pieces = entries.map {
          case JArray(List(JString(p), lp)) => p -> lp.extract[Double]
          case other => throw UnsupportedTokenizer(s"malformed unigram entry $other")
        }
        (pieces.zipWithIndex.map { case ((p, _), i) => p -> i }.toMap,
          pieces.toMap)
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
    // pre_tokenizer: ByteLevel / Whitespace / BertPreTokenizer /
    // Metaspace, possibly inside a Sequence
    def flat(p: JValue): Seq[JValue] = (p \ "type").extractOpt[String] match {
      case Some("Sequence") =>
        (p \ "pretokenizers").extract[Seq[JValue]].flatMap(flat)
      case Some(_) => Seq(p)
      case None => Nil
    }
    val pres = flat(j \ "pre_tokenizer")
    val byteLevelPre = pres.find(p =>
      (p \ "type").extractOpt[String].contains("ByteLevel"))
    val metaspacePre = pres.find(p =>
      (p \ "type").extractOpt[String].contains("Metaspace"))
    val bertPre = pres.exists(p =>
      (p \ "type").extractOpt[String].contains("BertPreTokenizer"))
    pres.foreach { p =>
      val t = (p \ "type").extract[String]
      if (!Set("ByteLevel", "Whitespace", "WhitespaceSplit",
        "BertPreTokenizer", "Metaspace")(t))
        throw UnsupportedTokenizer(s"pre_tokenizer $t " +
          "(ByteLevel / Whitespace / BertPreTokenizer / Metaspace only)")
    }
    // normalizer: absent, a single named one, or a Sequence; BertNormalizer
    // expands to its published steps (lowercase + NFD-strip-accents)
    def flatN(p: JValue): Seq[String] = (p \ "type").extractOpt[String] match {
      case Some("Sequence") =>
        (p \ "normalizers").extract[Seq[JValue]].flatMap(flatN)
      case Some("BertNormalizer") =>
        val lower = (p \ "lowercase").extractOpt[Boolean].getOrElse(true)
        val strip = (p \ "strip_accents").extractOpt[Boolean].getOrElse(lower)
        (if (strip) Seq("StripAccents") else Nil) ++
          (if (lower) Seq("Lowercase") else Nil)
      case Some(t) => Seq(t)
      case None => Nil
    }
    val norms = flatN(j \ "normalizer")
    norms.foreach { n =>
      if (!Set("NFC", "NFKC", "NFD", "NFKD", "Lowercase", "StripAccents")(n))
        throw UnsupportedTokenizer(s"normalizer $n " +
          "(NFC/NFKC/NFD/NFKD/Lowercase/StripAccents only)")
    }
    val specials = (j \ "added_tokens").extractOpt[Seq[JValue]].getOrElse(Nil)
      .map(t => ((t \ "content").extract[String], (t \ "id").extract[Int]))
      .sortBy(-_._1.length)
    val unk = (model \ "unk_token").extractOpt[String].flatMap(vocab.get)
      .orElse((model \ "unk_id").extractOpt[Int]) // Unigram declares an index
    // Metaspace prepend: new "prepend_scheme" or legacy "add_prefix_space"
    val metaPrepend = metaspacePre.exists { p =>
      (p \ "prepend_scheme").extractOpt[String] match {
        case Some(s) => s != "never"
        case None => (p \ "add_prefix_space").extractOpt[Boolean].getOrElse(true)
      }
    }
    Spec(mType, vocab, ranks,
      byteLevel = byteLevelPre.isDefined,
      // huggingface/tokenizers' ByteLevel DEFAULT is add_prefix_space =
      // true (GPT-2's shipped json sets false explicitly)
      addPrefixSpace = byteLevelPre.exists(p =>
        (p \ "add_prefix_space").extractOpt[Boolean].getOrElse(true)) ||
        metaPrepend,
      useRegex = byteLevelPre.forall(p =>
        (p \ "use_regex").extractOpt[Boolean].getOrElse(true)),
      normalizers = norms, specials = specials, unkId = unk,
      contPrefix = (model \ "continuing_subword_prefix")
        .extractOpt[String].getOrElse("##"),
      maxInputChars = (model \ "max_input_chars_per_word")
        .extractOpt[Int].getOrElse(100),
      bertPre = bertPre,
      logProbs = logProbs,
      metaspace = metaspacePre.isDefined,
      metaReplacement = metaspacePre.flatMap(p =>
        (p \ "replacement").extractOpt[String].flatMap(_.headOption))
        .getOrElse('▁'),
      byteFallback = (model \ "byte_fallback")
        .extractOpt[Boolean].getOrElse(false))
  }

  // ------------------------------------------------------------ encoding

  /** Encode one string to token ids (the local/test surface; [[encode]]
    * runs this per row inside a compiled map). */
  def encodeString(spec: Spec, text0: String): Seq[Int] = {
    if (text0 == null || text0.isEmpty) return Nil
    // specials split out first, longest-first, never normalized
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    def idOf(p: String): Int = spec.vocab.get(p) match {
      case Some(id) => id
      case None => spec.unkId.getOrElse(throw UnsupportedTokenizer(
        s"token '$p' not in vocab and no unk_token declared"))
    }
    def bpePiece(piece: String): Unit = {
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
      parts.foreach(p => out += idOf(p))
    }
    // the published WordPiece algorithm (BERT tokenization.py): greedy
    // longest-match, continuation pieces carry the "##" prefix, any
    // unmatchable word collapses to ONE unk
    def wordPiece(piece: String): Unit = {
      if (piece.length > spec.maxInputChars) {
        out += spec.unkId.getOrElse(throw UnsupportedTokenizer(
          s"word over max_input_chars_per_word and no unk_token"))
        return
      }
      val found = scala.collection.mutable.ArrayBuffer.empty[Int]
      var start = 0
      var bad = false
      while (start < piece.length && !bad) {
        var end = piece.length
        var cur = -1
        while (end > start && cur < 0) {
          val sub = (if (start > 0) spec.contPrefix else "") +
            piece.substring(start, end)
          spec.vocab.get(sub) match {
            case Some(id) => cur = id
            case None => end -= 1
          }
        }
        if (cur < 0) bad = true
        else { found += cur; start = end }
      }
      if (bad) out += spec.unkId.getOrElse(throw UnsupportedTokenizer(
        s"word '$piece' has no WordPiece segmentation and no unk_token"))
      else out ++= found
    }
    // Unigram Viterbi (the SentencePiece lattice): best log-prob
    // segmentation over vocabulary pieces; characters no piece covers take
    // byte-fallback "<0xNN>" pieces when declared, else one unk each
    def unigram(piece: String): Unit = {
      val n = piece.length
      val NegInf = Double.NegativeInfinity
      val UnknownPenalty = spec.unknownPenalty
      val best = Array.fill(n + 1)(NegInf)
      val back = new Array[Int](n + 1) // start index of the piece ending here
      val backUnk = new Array[Boolean](n + 1)
      best(0) = 0.0
      var i = 1
      while (i <= n) {
        var jj = 0
        while (jj < i) {
          if (best(jj) != NegInf) {
            val sub = piece.substring(jj, i)
            spec.logProbs.get(sub) match {
              case Some(lp) if best(jj) + lp > best(i) =>
                best(i) = best(jj) + lp; back(i) = jj; backUnk(i) = false
              case _ =>
                // single-char unknown edge keeps the lattice connected
                if (i - jj == 1 && best(jj) + UnknownPenalty > best(i)) {
                  best(i) = best(jj) + UnknownPenalty
                  back(i) = jj; backUnk(i) = true
                }
            }
          }
          jj += 1
        }
        i += 1
      }
      val rev = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
      var pos = n
      while (pos > 0) {
        rev += ((piece.substring(back(pos), pos), backUnk(pos)))
        pos = back(pos)
      }
      rev.reverse.foreach { case (p, unk) =>
        if (!unk) out += spec.vocab(p)
        else if (spec.byteFallback) {
          p.getBytes("UTF-8").foreach { b =>
            val bp = f"<0x${b & 0xff}%02X>"
            out += spec.vocab.getOrElse(bp, throw UnsupportedTokenizer(
              s"byte_fallback piece $bp missing from the unigram vocab"))
          }
        } else out += spec.unkId.getOrElse(throw UnsupportedTokenizer(
          s"'$p' has no unigram piece and no unk id"))
      }
    }
    def encodePlain(raw: String): Unit = {
      if (raw.isEmpty) return
      var text = raw
      spec.normalizers.foreach {
        case "Lowercase" => text = text.toLowerCase(java.util.Locale.ROOT)
        case "StripAccents" => text = java.text.Normalizer
          .normalize(text, java.text.Normalizer.Form.NFD)
          .replaceAll("\\p{Mn}", "")
        case nf => text = java.text.Normalizer.normalize(text,
          java.text.Normalizer.Form.valueOf(nf))
      }
      if (text.isEmpty) return // normalizers can empty the segment
      if (spec.byteLevel && spec.addPrefixSpace && !text.startsWith(" "))
        text = " " + text
      if (spec.metaspace) {
        text = text.replace(' ', spec.metaReplacement)
        if (spec.addPrefixSpace && text.head != spec.metaReplacement)
          text = spec.metaReplacement + text
      }
      def matches(p: java.util.regex.Pattern): Iterator[String] = {
        val m = p.matcher(text)
        Iterator.continually(if (m.find()) m.group() else null)
          .takeWhile(_ != null)
      }
      val pieces: Iterator[String] =
        if (spec.byteLevel && spec.useRegex) matches(ByteLevelRe)
        else if (spec.byteLevel) Iterator.single(text)
        else if (spec.metaspace) {
          val r = java.util.regex.Pattern.quote(spec.metaReplacement.toString)
          matches(java.util.regex.Pattern.compile(s"$r[^$r]*|[^$r]+"))
        } else if (spec.bertPre) matches(BertPreRe)
        else matches(WhitespaceRe2)
      pieces.foreach { piece =>
        spec.modelType match {
          case "BPE" => bpePiece(piece)
          case "WordPiece" => wordPiece(piece)
          case "Unigram" => unigram(piece)
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

  /** Word-aligned chunking under the DEPLOYED token budget: split each
    * document at whitespace, count every word's tokens under `spec` IN
    * ITS IN-CHUNK POSITION (a chunk's first word encodes bare, later
    * words with their joining space — exactly how the emitted text
    * re-encodes, since merges never cross pre-token boundaries), and
    * pack GREEDILY into chunks of at most `maxTokens`.
    *
    * Contract: the `chunk` column is whitespace-NORMALIZED (words joined
    * by single spaces; newlines/tabs/space runs collapse) and `n_tokens`
    * is the EXACT token count of that emitted text — re-encoding a chunk
    * reproduces its count, and no chunk exceeds the budget except a
    * single word that alone exceeds it (emitted alone, flagged by its
    * count — word-aligned chunking cannot split it, the same one-item
    * overrun contract as sequence packing). Byte-level specs with
    * `use_regex = false` are rejected directed: their merges CAN cross
    * spaces, so word-positional counting would lie. */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      spec: Spec, maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens $maxTokens")
    if (spec.byteLevel && !spec.useRegex) throw UnsupportedTokenizer(
      "chunkByTokens under ByteLevel use_regex=false: merges can cross " +
        "whitespace, so word-aligned counting cannot be exact")
    import org.apache.spark.sql.types._
    val in = df.select(col(idCol).as("id"), col(textCol).cast("string").as("t"))
    val schema = StructType(Seq(
      in.schema.fields(0),
      StructField("chunk_idx", IntegerType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("chunk", StringType, nullable = false)))
    // whether a word's encoding depends on a preceding space (byte-level
    // keeps the space as Ġ; Metaspace turns it into the replacement char)
    val spaceSensitive = spec.byteLevel || spec.metaspace
    in.flatMap { row =>
      if (row.isNullAt(1)) Iterator.empty
      else {
        val id = row.get(0)
        val words = row.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
        val cur = new StringBuilder
        var curTokens = 0L
        var idx = 0
        def flush(): Unit = if (cur.nonEmpty) {
          out += org.apache.spark.sql.Row(id, idx, curTokens, cur.toString)
          idx += 1; cur.clear(); curTokens = 0L
        }
        words.foreach { w =>
          lazy val nFirst = encodeString(spec, w).length
          val nMid =
            if (spaceSensitive) encodeString(spec, " " + w).length else nFirst
          val asMid = cur.nonEmpty
          val n = if (asMid) nMid else nFirst
          if (curTokens > 0 && curTokens + n > maxTokens) {
            flush()
            cur.append(w)
            curTokens = nFirst.toLong // it now STARTS a chunk: bare shape
          } else {
            if (asMid) cur.append(' ')
            cur.append(w)
            curTokens += n
          }
        }
        flush()
        out.iterator
      }
    }(org.apache.spark.sql.Encoders.row(schema))
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
