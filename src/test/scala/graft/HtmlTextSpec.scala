package graft

import org.apache.spark.sql.functions._

import graft.functions.HtmlText

class HtmlTextSpec extends SparkSpec {
  import spark.implicits._

  test("extract: tags, raw-skip subtrees, comments, entities") {
    val html =
      """<!DOCTYPE html><html><head><title>My Page</title>
        |<script>var x = "<p>not text</p>";</script>
        |<style>p { color: red }</style></head>
        |<body><!-- a comment --><h1>Heading</h1>
        |<p>Tom &amp; Jerry &lt;3 &#65;&#x42;</p>
        |<noscript><p>js off</p></noscript>
        |<div>tail</div></body></html>""".stripMargin
    assert(HtmlText.extract(html) ==
      "My Page\nHeading\nTom & Jerry <3 AB\ntail")
  }

  test("extract: inline tags merge, block tags split, whitespace collapses") {
    val html = "<p>one  <b>two</b>\n\t three</p><p>four</p>five<br>six"
    assert(HtmlText.extract(html) == "one two three\nfour\nfive\nsix")
  }

  test("extract: quoted '>' in attributes, bare '<', CDATA, unknown entity") {
    assert(HtmlText.extract("""<a title="a>b" href='c>d'>link</a> text""") ==
      "link text")
    assert(HtmlText.extract("x < y and z") == "x < y and z")
    assert(HtmlText.extract("a<![CDATA[ hidden ]]>b") == "ab")
    // unknown / unterminated references stay literal
    assert(HtmlText.extract("<p>&nosuch; &amp</p>") == "&nosuch; &amp")
    // supplementary-plane numeric reference
    assert(HtmlText.extract("<p>&#x1F600;</p>") == new String(Character.toChars(0x1F600)))
  }

  test("extract: unterminated comment and raw element swallow the tail") {
    assert(HtmlText.extract("a<!-- no end") == "a")
    assert(HtmlText.extract("a<script>no end") == "a")
    // close tag of a raw element found case-insensitively
    assert(HtmlText.extract("a<SCRIPT>x=1</ScRiPt>b") == "ab")
  }

  test("blocks: link density flags nav/footer boilerplate") {
    val html =
      """<body><nav><a href="/">Home</a> <a href="/a">About</a></nav>
        |<p>This paragraph has plenty of real content words in it.</p>
        |<p>See <a href="/x">one link</a> amid much longer running text that
        |clearly dominates the block character count here.</p>
        |<footer>© 2026</footer></body>""".stripMargin
    val bs = HtmlText.blocks(html)
    assert(bs.length == 4)
    assert(bs(0).linkDensity == 1.0) // nav: all chars inside anchors
    assert(bs(1).linkDensity == 0.0)
    assert(bs(2).linkDensity > 0 && bs(2).linkDensity < 0.2)
    val main = HtmlText.mainText(html, minWords = 5, maxLinkDensity = 0.4)
    assert(main ==
      "This paragraph has plenty of real content words in it.\n" +
        "See one link amid much longer running text that clearly dominates " +
        "the block character count here.")
  }

  test("dataframe surface: htmlTextFlat / htmlMainTextFlat / htmlBlocksFlat") {
    val df = Seq(
      (1L, "<nav><a href='/'>Home Nav Bar</a></nav><p>six words of actual body content</p>"),
      (2L, "<p>&copy; tiny</p>"),
      (3L, null.asInstanceOf[String])).toDF("id", "html")
    val all = HtmlText.htmlTextFlat(df, "id", "html")
      .orderBy($"id").as[(Long, String)].collect()
    assert(all(0)._2 == "Home Nav Bar\nsix words of actual body content")
    assert(all(1)._2 == "© tiny")
    assert(all(2)._2 == "")
    val main = HtmlText.htmlMainTextFlat(df, "id", "html", minWords = 5)
      .orderBy($"id").collect()
    assert(main(0).getString(1) == "six words of actual body content")
    assert(main(0).getInt(2) == 2 && main(0).getInt(3) == 1)
    assert(main(1).getString(1) == "" && main(1).getInt(2) == 1)
    assert(main(2).getInt(2) == 0)
    val blocks = HtmlText.htmlBlocksFlat(df, "id", "html")
    assert(blocks.count() == 3)
    val b0 = blocks.filter($"id" === 1 && $"block_idx" === 0).head()
    assert(b0.getString(2) == "Home Nav Bar" && b0.getDouble(4) == 1.0)
  }

  test("unquoted href ending in '/' is not a self-closing tag") {
    // HTML5 tokenizer semantics: inside an unquoted attribute value a '/'
    // belongs to the value, so this anchor OPENS and its text counts
    val bs = HtmlText.blocks("<p><a href=http://x.test/>Home</a> <a " +
      "href=http://x.test/about/>About</a></p>")
    assert(bs.head.linkDensity == 1.0)
    // ... while a '/' after a quoted value or the name still self-closes
    assert(HtmlText.blocks("<p><a href=\"x\"/>plain</p>").head.linkDensity == 0.0)
  }

  test("tag matching is locale-independent (Turkish dotless-i)") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(new java.util.Locale("tr", "TR"))
      // "SCRIPT".toLowerCase would be "scrıpt" under tr — contents must
      // still be dropped, and <DIV> must still split blocks
      assert(HtmlText.extract("a<SCRIPT>x=1</SCRIPT>b<DIV>c</DIV>") == "ab\nc")
    } finally java.util.Locale.setDefault(saved)
  }

  test("markdown extraction keeps heading levels, bullets, and quotes") {
    val html =
      """<body><h1>Title</h1><p>Intro paragraph.</p>
        |<h2>Section</h2><ul><li>first item</li><li>second item</ul>
        |<blockquote>quoted wisdom</blockquote><p>tail</p></body>""".stripMargin
    assert(HtmlText.markdown(html) ==
      "# Title\nIntro paragraph.\n## Section\n- first item\n- second item\n" +
        "> quoted wisdom\ntail")
    // flat extraction is unchanged by the structure tracking
    assert(HtmlText.extract(html) ==
      "Title\nIntro paragraph.\nSection\nfirst item\nsecond item\n" +
        "quoted wisdom\ntail")
    val df = Seq((1L, "<h3>Deep</h3><li>x</li>")).toDF("id", "html")
    assert(HtmlText.htmlMarkdownFlat(df, "id", "html")
      .head().getString(1) == "### Deep\n- x")
  }

  test("surtKey canonicalizes URLs into sort-friendly CDX keys") {
    import graft.functions.TextFunctions.surtKey
    val df = Seq(
      "https://WWW.Example.COM/Path/One?q=2",
      "http://a.b.example.org:8080/x#frag",
      "https://example.com",
      "https://www.example.com/").toDF("url")
    val keys = df.select(surtKey($"url")).as[String].collect()
    assert(keys(0) == "com,example)/path/one?q=2")
    assert(keys(1) == "org,example,b,a)/x")
    assert(keys(2) == "com,example)/")
    assert(keys(3) == "com,example)/")
    // the sort-adjacency property: one host's pages group under one prefix
    assert(keys(0).startsWith("com,example)") && keys(2).startsWith("com,example)"))
    // a bare host with only a query still gets the root slash — the same
    // resource must never yield two keys
    val rootQ = Seq("https://example.com?page=2", "https://example.com/?page=2")
      .toDF("url").select(surtKey($"url")).as[String].collect()
    assert(rootQ(0) == "com,example)/?page=2" && rootQ(1) == rootQ(0))
  }

  test("pageMeta: title, description, canonical, lang in any attribute order") {
    val html =
      """<!DOCTYPE html><html LANG="en-US"><head>
        |<title> Tom &amp; Jerry —  a retrospective </title>
        |<meta content="Cats &amp; mice, reviewed." name="description">
        |<link href="https://ex.test/canon" rel="canonical">
        |</head><body>x</body></html>""".stripMargin
    val m = HtmlText.pageMeta(html)
    assert(m.title.contains("Tom & Jerry — a retrospective"))
    assert(m.description.contains("Cats & mice, reviewed."))
    assert(m.canonical.contains("https://ex.test/canon"))
    assert(m.lang.contains("en-US"))
    // absent pieces stay None; rows survive through the DataFrame surface
    val none = HtmlText.pageMeta("<p>no head</p>")
    assert(none == HtmlText.PageMeta(None, None, None, None))
    val df = Seq((1L, html), (2L, "<p>bare</p>")).toDF("id", "html")
    val rows = HtmlText.pageMetaFlat(df, "id", "html").orderBy($"id").collect()
    assert(rows(0).getString(1) == "Tom & Jerry — a retrospective")
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(4))
    // a <title> inside body SVG (an icon label) is NOT the page title
    assert(HtmlText.pageMeta(
      "<html><head></head><body><svg><title>Pie chart</title></svg></body>")
      .title.isEmpty)
    // quoted '>' inside content survives; prefix names don't match
    val tricky = HtmlText.pageMeta("<head>" +
      "<meta name=\"description-translated\" content=\"wrong\">" +
      "<meta name=\"description\" content=\"5 > 3 wins\"></head><body>")
    assert(tricky.description.contains("5 > 3 wins"))
    // xml:lang / data-lang never shadow the real lang attribute
    assert(HtmlText.pageMeta("<html xml:lang=\"fr\" lang=\"en\"><head></head>")
      .lang.contains("en"))
  }

  test("nested and self-closing anchors keep link accounting sane") {
    // self-closing <a/> must not open an anchor scope
    val b1 = HtmlText.blocks("<p>start <a/>plain tail text</p>")
    assert(b1.head.linkDensity == 0.0)
    // stray close never drives the depth negative
    val b2 = HtmlText.blocks("</a><p>after stray close</p>")
    assert(b2.head.linkDensity == 0.0)
    val b3 = HtmlText.blocks("<p><a href='/'>all of it linked</a></p>")
    assert(b3.head.linkDensity == 1.0)
  }
}
