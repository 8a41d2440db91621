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

  test("non-BPE models and exotic pre-tokenizers are named rejections") {
    val wp = wsJson.replace("\"type\": \"BPE\"", "\"type\": \"WordPiece\"")
    val e = intercept[Exception] { HfTokenizer.parse(wp) }
    assert(e.getMessage.contains("WordPiece"), e.getMessage)
    val metaspace = byteLevelJson.replace("\"type\": \"ByteLevel\"",
      "\"type\": \"Metaspace\"")
    val e2 = intercept[Exception] { HfTokenizer.parse(metaspace) }
    assert(e2.getMessage.contains("Metaspace"), e2.getMessage)
  }
}
