package graft

import graft.functions.HfTokenizer

/** tokenizer.json interop: byte-level BPE (the GPT-2 scheme — the
  * bytes-to-unicode table, the contraction regex, greedy merge order),
  * whitespace BPE with normalizers, special tokens, and the DataFrame
  * encode surface. */
class HfTokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("bytes_to_unicode matches the GPT-2 table at its anchor points") {
    val m = HfTokenizer.byteToChar
    assert(m('a'.toInt) == 'a' && m('!'.toInt) == '!' && m('~'.toInt) == '~')
    assert(m(0xFF) == 'ÿ')
    assert(m(0x20) == 'Ġ') // space: the 33rd non-printable -> 256+32
    assert(m(0x0A) == 'Ċ') // newline: 256+10
    assert(m.distinct.length == 256) // a bijection
  }

  private val byteLevelJson =
    """{
      |  "model": {"type": "BPE", "unk_token": null,
      |    "vocab": {"a": 0, "b": 1, "ab": 2, "Ġ": 3, "Ġab": 4,
      |              "c": 5, "<|eot|>": 6, "'": 7, "s": 8, "'s": 9},
      |    "merges": ["a b", "Ġ ab", "' s"]},
      |  "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false,
      |    "use_regex": true},
      |  "normalizer": null,
      |  "added_tokens": [{"id": 6, "content": "<|eot|>", "special": true}]
      |}""".stripMargin

  test("byte-level BPE: regex pre-tokens, space prefix, merges, specials") {
    val spec = HfTokenizer.parse(byteLevelJson)
    assert(spec.byteLevel && !spec.addPrefixSpace && spec.useRegex)
    // "ab ab" -> pre-tokens ["ab", " ab"] -> [ab, Ġab]
    assert(HfTokenizer.encodeString(spec, "ab ab") == Seq(2, 4))
    // contraction: "ab's" -> ["ab", "'s"] via the 's branch of the regex
    assert(HfTokenizer.encodeString(spec, "ab's") == Seq(2, 9))
    // special tokens split out before any byte mapping
    assert(HfTokenizer.encodeString(spec, "ab<|eot|>ab ab") ==
      Seq(2, 6, 2, 4))
    assert(HfTokenizer.encodeString(spec, "") == Nil)
    // unknown byte with no unk_token is a directed error
    val e = intercept[Exception] { HfTokenizer.encodeString(spec, "zz") }
    assert(e.getMessage.contains("not in vocab"), e.getMessage)
  }

  test("add_prefix_space prepends exactly one leading space") {
    val spec = HfTokenizer.parse(byteLevelJson
      .replace("\"add_prefix_space\": false", "\"add_prefix_space\": true"))
    // "ab" -> " ab" -> [Ġab]
    assert(HfTokenizer.encodeString(spec, "ab") == Seq(4))
    // already-spaced input is not double-prefixed
    assert(HfTokenizer.encodeString(spec, " ab") == Seq(4))
  }

  private val wsJson =
    """{
      |  "model": {"type": "BPE", "unk_token": "[UNK]",
      |    "vocab": {"a": 0, "b": 1, "ab": 2, "abab": 3, "c": 4, "[UNK]": 5},
      |    "merges": [["a", "b"], ["ab", "ab"]]},
      |  "pre_tokenizer": {"type": "Whitespace"},
      |  "normalizer": {"type": "Sequence", "normalizers": [
      |    {"type": "NFC"}, {"type": "Lowercase"}]}
      |}""".stripMargin

  test("whitespace BPE with normalizers, pair-array merges, unk fallback") {
    val spec = HfTokenizer.parse(wsJson)
    assert(!spec.byteLevel && spec.normalizers == Seq("NFC", "Lowercase"))
    // "ABAB ab c" lowercases, then a,b,a,b -> ab,ab -> abab
    assert(HfTokenizer.encodeString(spec, "ABAB ab c") == Seq(3, 2, 4))
    // unknown symbol maps to [UNK]
    assert(HfTokenizer.encodeString(spec, "az") == Seq(0, 5))
  }

  test("DataFrame encode: compiled map, counts and ids per row") {
    val spec = HfTokenizer.parse(wsJson)
    val df = Seq((1L, "abab ab"), (2L, "c"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = HfTokenizer.encode(df, "doc_id", "text", spec)
      .orderBy($"id").collect()
    assert(out(0).getLong(1) == 2 &&
      out(0).getSeq[Int](2) == Seq(3, 2))
    assert(out(1).getSeq[Int](2) == Seq(4))
    assert(out(2).getLong(1) == 0)
  }

  private val wordPieceJson =
    """{
      |  "model": {"type": "WordPiece", "unk_token": "[UNK]",
      |    "continuing_subword_prefix": "##",
      |    "max_input_chars_per_word": 10,
      |    "vocab": {"[UNK]": 0, "un": 1, "##aff": 2, "##able": 3,
      |              "##ably": 4, "runn": 5, "##ing": 6, "!": 7, "the": 8}},
      |  "pre_tokenizer": {"type": "BertPreTokenizer"},
      |  "normalizer": {"type": "BertNormalizer", "lowercase": true,
      |    "strip_accents": true}
      |}""".stripMargin

  test("WordPiece: greedy longest-match, ## continuations, bad-word unk") {
    val spec = HfTokenizer.parse(wordPieceJson)
    assert(spec.modelType == "WordPiece" && spec.bertPre)
    assert(spec.normalizers == Seq("StripAccents", "Lowercase"))
    // the classic example shape: unaffable -> un ##aff ##able
    assert(HfTokenizer.encodeString(spec, "unaffable") == Seq(1, 2, 3))
    // BertNormalizer folds case and accents: "Unaffáble" matches too
    assert(HfTokenizer.encodeString(spec, "Unaffáble") == Seq(1, 2, 3))
    // punctuation isolates; an unsegmentable word is ONE unk
    assert(HfTokenizer.encodeString(spec, "running zzz!") ==
      Seq(5, 6, 0, 7))
    // a word over max_input_chars_per_word collapses to unk outright
    assert(HfTokenizer.encodeString(spec, "x" * 11) == Seq(0))
  }

  private val unigramJson =
    """{
      |  "model": {"type": "Unigram", "unk_id": 0, "byte_fallback": false,
      |    "vocab": [["<unk>", -8.0], ["▁", -3.0], ["▁the", -1.0],
      |              ["▁th", -4.0], ["e", -2.5], ["th", -3.5],
      |              ["▁cat", -1.5], ["c", -5.0], ["▁ca", -4.5],
      |              ["t", -5.0]]},
      |  "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
      |    "prepend_scheme": "always"},
      |  "normalizer": null
      |}""".stripMargin

  test("Unigram: Viterbi picks the max-log-prob segmentation") {
    val spec = HfTokenizer.parse(unigramJson)
    assert(spec.modelType == "Unigram" && spec.metaspace && spec.addPrefixSpace)
    // "the cat" -> ▁the (-1.0) beats ▁th+e (-6.5); ▁cat (-1.5) beats
    // ▁ca+t (-9.5)
    assert(HfTokenizer.encodeString(spec, "the cat") == Seq(2, 6))
    // unknown char takes the unk id (no byte_fallback here)
    assert(HfTokenizer.encodeString(spec, "the q") == Seq(2, 1, 0))
  }

  test("Unigram byte fallback emits <0xNN> pieces for uncovered chars") {
    val spec = HfTokenizer.parse(unigramJson
      .replace("\"byte_fallback\": false", "\"byte_fallback\": true")
      .replace("[\"t\", -5.0]",
        "[\"t\", -5.0], [\"<0x71>\", -9.0], [\"<0xC3>\", -9.0], [\"<0xA9>\", -9.0]"))
    // 'q' = 0x71 -> its byte piece (id 10)
    assert(HfTokenizer.encodeString(spec, "the q") == Seq(2, 1, 10))
    // 'é' = 0xC3 0xA9 -> two byte pieces
    assert(HfTokenizer.encodeString(spec, "the é") == Seq(2, 1, 11, 12))
  }

  test("Unicode character classes match the reference regex semantics") {
    // \w and \s must be Unicode-aware like the Rust/Python engines:
    // "café" is ONE Whitespace pre-token, not caf + é
    val ws = HfTokenizer.parse(
      """{"model": {"type": "BPE", "unk_token": "[UNK]",
           "vocab": {"c": 0, "a": 1, "f": 2, "ca": 3, "caf": 4, "é": 5,
                     "café": 6, "[UNK]": 7},
           "merges": ["c a", "ca f", "caf é"]},
         "pre_tokenizer": {"type": "Whitespace"}, "normalizer": null}""")
    assert(HfTokenizer.encodeString(ws, "café") == Seq(6))
    // ByteLevel: NBSP (\u00A0) is \s under the Unicode flag, so it
    // splits into its own run instead of folding into the following
    // punctuation run - the (l-stroke, !) merge can then never fire
    // across the boundary (NBSP's UTF-8 bytes 0xC2 0xA0 map to the
    // GPT-2 byte table chars below)
    val bl = HfTokenizer.parse(
      """{"model": {"type": "BPE", "unk_token": null,
           "vocab": {"x": 0, "\u00C2": 1, "\u0142": 2, "!": 3,
                     "\u0142!": 4},
           "merges": ["\u0142 !"]},
         "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": false,
           "use_regex": true}, "normalizer": null}""")
    assert(HfTokenizer.encodeString(bl, "x\u00A0!") == Seq(0, 1, 2, 3))
  }

  test("BERT punctuation includes the ASCII symbol ranges") {
    // '+' is \p{S}, but BERT's _is_punctuation splits on it: "1+2" must
    // pre-tokenize to three pieces, not collapse to one unk word
    val spec = HfTokenizer.parse(
      """{"model": {"type": "WordPiece", "unk_token": "[UNK]",
           "vocab": {"[UNK]": 0, "1": 1, "+": 2, "2": 3, "$": 4}},
         "pre_tokenizer": {"type": "BertPreTokenizer"},
         "normalizer": null}""")
    assert(HfTokenizer.encodeString(spec, "1+2") == Seq(1, 2, 3))
    assert(HfTokenizer.encodeString(spec, "$1") == Seq(4, 1))
  }

  test("ByteLevel add_prefix_space DEFAULTS to true when the key is absent") {
    val spec = HfTokenizer.parse(byteLevelJson
      .replace(""""add_prefix_space": false,""", ""))
    assert(spec.addPrefixSpace)
    assert(HfTokenizer.encodeString(spec, "ab") == Seq(4)) // Ġab
  }

  test("chunkByTokens packs words greedily under the real token budget") {
    val spec = HfTokenizer.parse(wsJson) // a=1tok ab=1tok abab=1tok c=1tok
    // word token counts under wsJson: "abab"->1, "ab"->1, "c"->1, "az"->2
    val df = Seq((1L, "abab ab c az abab"), (2L, ""), (3L, "abab")).toDF("doc_id", "text")
    val out = HfTokenizer.chunkByTokens(df, "doc_id", "text", spec, maxTokens = 3)
      .orderBy($"id", $"chunk_idx").collect()
    // doc 1 counts: 1,1,1,2,1 -> chunks [abab ab c](3), [az abab](3)
    val d1 = out.filter(_.getLong(0) == 1L)
    assert(d1.map(_.getString(3)).toSeq == Seq("abab ab c", "az abab"))
    assert(d1.map(_.getLong(2)).toSeq == Seq(3L, 3L))
    assert(!out.exists(_.getLong(0) == 2L)) // empty doc: no chunks
    assert(out.filter(_.getLong(0) == 3L).map(_.getString(3)).toSeq == Seq("abab"))
    // a single over-budget word still emits alone, flagged by its count
    val big = Seq((9L, "azazaz ab")).toDF("doc_id", "text") // azazaz = 6 toks
    val o2 = HfTokenizer.chunkByTokens(big, "doc_id", "text", spec, maxTokens = 3)
      .orderBy($"chunk_idx").collect()
    assert(o2.map(_.getString(3)).toSeq == Seq("azazaz", "ab"))
    assert(o2.head.getLong(2) == 6L)
    // byte-level POSITIONAL counting: n_tokens equals the emitted chunk's
    // own re-encoded count (first word bare, later words space-joined)
    val bl = HfTokenizer.parse(byteLevelJson)
    val df3 = Seq((7L, "ab ab ab ab ab")).toDF("doc_id", "text")
    val o3 = HfTokenizer.chunkByTokens(df3, "doc_id", "text", bl, maxTokens = 3)
      .orderBy($"chunk_idx").collect()
    o3.foreach { r =>
      assert(r.getLong(2) ==
        HfTokenizer.encodeString(bl, r.getString(3)).length,
        s"chunk '${r.getString(3)}' count mismatch")
      assert(r.getLong(2) <= 3)
    }
    assert(o3.map(_.getString(3)).mkString(" ") == "ab ab ab ab ab")
  }

  test("unsupported models and pre-tokenizers are named rejections") {
    val lg = wsJson.replace("\"type\": \"BPE\"", "\"type\": \"Marian\"")
    val e = intercept[Exception] { HfTokenizer.parse(lg) }
    assert(e.getMessage.contains("Marian"), e.getMessage)
    val digits = byteLevelJson.replace("\"type\": \"ByteLevel\"",
      "\"type\": \"Digits\"")
    val e2 = intercept[Exception] { HfTokenizer.parse(digits) }
    assert(e2.getMessage.contains("Digits"), e2.getMessage)
  }
}
