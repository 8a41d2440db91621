package graft.functions

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** HTML → text extraction for web-corpus (Common Crawl) pipelines.
  *
  * A single-pass character state machine (no DOM, no external parser):
  * comments / doctypes / processing instructions are skipped, the contents
  * of `script`/`style`/`noscript`/`template`/`svg` are dropped wholesale,
  * character references (named subset + numeric, incl. supplementary
  * planes) are decoded, and text is segmented into BLOCKS at block-level
  * tag boundaries. On top of the block stream sits a jusText/trafilatura
  * style boilerplate classifier: a block is content when it has at least
  * `minWords` words and link density (chars inside `<a>` / all chars) at
  * most `maxLinkDensity` — nav bars, footers, and button rows fall out
  * without any site-specific rules (Pomikálek 2011, public thesis;
  * trafilatura: public, Barbaresi 2021).
  *
  * Everything is per-row compiled JVM code via `Dataset.map` with an
  * explicit Row encoder — the established hot-path shape in this repo
  * (zero `udf()` registrations); one pass per document, O(doc length).
  */
object HtmlText {

  // ------------------------------------------------------------- core model

  /** One text block: normalized text, total chars, chars emitted inside
    * anchor elements (for link density), and the block-level tag that
    * opened it (`"p"` when none did — e.g. bare text). */
  final case class Block(text: String, chars: Int, linkChars: Int,
      kind: String = "p") {
    def words: Int = if (text.isEmpty) 0 else {
      var n = 1
      var i = 0
      while (i < text.length) { if (text.charAt(i) == ' ') n += 1; i += 1 }
      n
    }
    def linkDensity: Double = if (chars == 0) 0.0 else linkChars.toDouble / chars
  }

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
    "h1", "h2", "h3", "h4", "h5", "h6", "table", "tr", "td", "th",
    "thead", "tbody", "tfoot", "caption", "blockquote", "pre",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "figure", "figcaption", "form", "fieldset", "title", "head", "body",
    "html", "option", "select", "button")

  /** Elements whose subtree is dropped entirely. */
  private val RawSkipTags: Set[String] = Set(
    "script", "style", "noscript", "template", "svg")

  /** Block kinds that keep their identity for structured (markdown)
    * output. */
  private val StructureTags: Set[String] = Set(
    "h1", "h2", "h3", "h4", "h5", "h6", "li", "blockquote")

  private val Entities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> "\u00A0", "copy" -> "©", "reg" -> "®",
    "trade" -> "™", "mdash" -> "—", "ndash" -> "–",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "middot" -> "·",
    "laquo" -> "«", "raquo" -> "»", "deg" -> "°",
    "times" -> "×", "plusmn" -> "±", "sect" -> "§",
    "para" -> "¶", "bull" -> "•", "euro" -> "€",
    "pound" -> "£", "yen" -> "¥", "cent" -> "¢")

  /** Parse `html` into its non-empty text blocks, in document order. */
  def blocks(html: String): Array[Block] = {
    if (html == null) return Array.empty
    val out = Array.newBuilder[Block]
    val cur = new java.lang.StringBuilder(256)
    var curLink = 0
    var anchorDepth = 0
    var curKind = "p"

    def flush(): Unit = {
      val (text, chars) = normalize(cur)
      if (chars > 0) out += Block(text, chars, math.min(curLink, chars), curKind)
      cur.setLength(0)
      curLink = 0
    }
    def emit(s: String): Unit = {
      cur.append(s)
      if (anchorDepth > 0) curLink += countNonSpace(s)
    }
    // per-char fast path: the bulk of a document goes through here — one
    // String per corpus character would dominate extraction cost
    def emitChar(c: Char): Unit = {
      cur.append(c)
      if (anchorDepth > 0 && !isWs(c)) curLink += 1
    }

    val n = html.length
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (html.startsWith("<![CDATA[", i)) {
          val end = html.indexOf("]]>", i + 9)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else if (i + 1 < n &&
            (isTagStart(html.charAt(i + 1)) || html.charAt(i + 1) == '/')) {
          val closing = html.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          var j = nameStart
          while (j < n && isTagChar(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          // scan to the tag's '>' honoring quoted attribute values; track
          // whether the char before '>' sits inside an UNQUOTED attribute
          // value — there a '/' belongs to the value (`href=http://x/`),
          // not to a self-closing solidus (HTML5 tokenizer semantics)
          var quote = 0.toChar
          var inUnquoted = false
          var prevInUnquoted = false
          while (j < n && (quote != 0 || html.charAt(j) != '>')) {
            val ch = html.charAt(j)
            prevInUnquoted = inUnquoted
            if (quote != 0) { if (ch == quote) quote = 0 }
            else if (inUnquoted) {
              if (ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') inUnquoted = false
            }
            else if (ch == '"' || ch == '\'') quote = ch
            else if (ch == '=') {
              var k = j + 1
              while (k < n && (html.charAt(k) == ' ' || html.charAt(k) == '\t')) k += 1
              if (k < n && html.charAt(k) != '"' && html.charAt(k) != '\'' &&
                  html.charAt(k) != '>')
                inUnquoted = true
            }
            j += 1
          }
          val tagEnd = if (j < n) j + 1 else n
          if (name.isEmpty) i = tagEnd
          else if (!closing && RawSkipTags.contains(name)) {
            // drop subtree: find the matching close tag, case-insensitive
            val close = indexOfClose(html, tagEnd, name)
            i = close
          } else {
            if (name == "a") {
              val selfClosing = tagEnd >= 2 && html.charAt(tagEnd - 1) == '>' &&
                html.charAt(tagEnd - 2) == '/' && !prevInUnquoted
              if (closing) anchorDepth = math.max(0, anchorDepth - 1)
              else if (!selfClosing) anchorDepth += 1
            }
            // unknown elements count as inline (spans, custom elements) —
            // the conservative choice: a missed split merges blocks, never
            // loses text
            if (BlockTags.contains(name)) {
              flush()
              // the block that FOLLOWS an opening h*/li tag belongs to it;
              // any closing block tag ends that scope
              curKind = if (closing) "p"
                else if (StructureTags.contains(name)) name
                else "p"
            }
            i = tagEnd
          }
        } else {
          emit("<") // bare '<' in text ("a < b")
          i += 1
        }
      } else if (c == '&') {
        val (s, next) = entity(html, i)
        emit(s)
        i = next
      } else {
        emitChar(c)
        i += 1
      }
    }
    flush()
    out.result()
  }

  /** All text: non-empty normalized blocks joined by '\n'. */
  def extract(html: String): String = blocks(html).map(_.text).mkString("\n")

  /** Content text only: blocks passing the word-count + link-density
    * classifier, joined by '\n'. */
  def mainText(html: String, minWords: Int = 5,
      maxLinkDensity: Double = 0.4): String =
    blocks(html).filter(b => b.words >= minWords && b.linkDensity <= maxLinkDensity)
      .map(_.text).mkString("\n")

  /** Markdown-structured extraction: headings keep their level as `#`
    * prefixes, list items become `- ` bullets, blockquotes `> ` — the
    * document shape LLM training pipelines increasingly extract instead of
    * flat text, because structure survives into the tokens. Everything
    * else renders as plain paragraphs. */
  def markdown(html: String): String =
    blocks(html).map { b =>
      b.kind match {
        case k if k.length == 2 && k.charAt(0) == 'h' =>
          "#" * (k.charAt(1) - '0') + " " + b.text
        case "li" => "- " + b.text
        case "blockquote" => "> " + b.text
        case _ => b.text
      }
    }.mkString("\n")

  private def isTagStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isTagChar(c: Char): Boolean =
    isTagStart(c) || (c >= '0' && c <= '9') || c == '-' || c == ':'

  private def indexOfClose(html: String, from: Int, name: String): Int = {
    val n = html.length
    var i = from
    while (i < n) {
      val hit = html.indexOf('<', i)
      if (hit < 0 || hit + 1 >= n) return n
      if (html.charAt(hit + 1) == '/' &&
          html.regionMatches(true, hit + 2, name, 0, name.length)) {
        val after = hit + 2 + name.length
        if (after >= n) return n
        val ch = html.charAt(after)
        if (ch == '>' || ch == ' ' || ch == '\t' || ch == '\n' || ch == '\r') {
          val end = html.indexOf('>', after)
          return if (end < 0) n else end + 1
        }
      }
      i = hit + 1
    }
    n
  }

  /** Decode one character reference at `i` (which points at '&'); returns
    * (decoded text, next index). Unknown references stay literal. */
  private def entity(html: String, i: Int): (String, Int) = {
    val n = html.length
    if (i + 1 >= n) return ("&", i + 1)
    if (html.charAt(i + 1) == '#') {
      val hex = i + 2 < n && (html.charAt(i + 2) == 'x' || html.charAt(i + 2) == 'X')
      var j = if (hex) i + 3 else i + 2
      var cp = 0L
      val start = j
      while (j < n && j - start < 7 && Character.digit(html.charAt(j), if (hex) 16 else 10) >= 0) {
        cp = cp * (if (hex) 16 else 10) + Character.digit(html.charAt(j), if (hex) 16 else 10)
        j += 1
      }
      if (j == start || j >= n || html.charAt(j) != ';' ||
          cp <= 0 || cp > 0x10ffff || (cp >= 0xd800 && cp <= 0xdfff))
        ("&", i + 1)
      else (new String(Character.toChars(cp.toInt)), j + 1)
    } else {
      var j = i + 1
      while (j < n && j - i <= 10 && html.charAt(j).isLetter) j += 1
      if (j < n && html.charAt(j) == ';') {
        Entities.get(html.substring(i + 1, j)) match {
          case Some(s) => (s, j + 1)
          case None => ("&", i + 1)
        }
      } else ("&", i + 1)
    }
  }

  private def countNonSpace(s: String): Int = {
    var n = 0
    var i = 0
    while (i < s.length) { if (!isWs(s.charAt(i))) n += 1; i += 1 }
    n
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
      c == '\u000B' || c == '\u00A0'

  /** Collapse whitespace runs to single spaces and trim; returns the text
    * and its non-space char count. */
  private def normalize(sb: java.lang.StringBuilder): (String, Int) = {
    val out = new java.lang.StringBuilder(sb.length)
    var chars = 0
    var pendingSpace = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (isWs(c)) pendingSpace = out.length() > 0
      else {
        if (pendingSpace) { out.append(' '); pendingSpace = false }
        out.append(c)
        chars += 1
      }
      i += 1
    }
    (out.toString, chars)
  }

  // --------------------------------------------------------- page metadata

  /** Page-level metadata a crawl pipeline keys on: the `<title>` text,
    * `<meta name="description">`, the `rel="canonical"` URL, and the
    * `<html lang>` attribute — each None when absent. Scans only the
    * document head region (first occurrence wins, matching browser
    * behavior); attribute order inside the tags is free. */
  final case class PageMeta(title: Option[String], description: Option[String],
      canonical: Option[String], lang: Option[String])

  def pageMeta(html: String): PageMeta = {
    if (html == null) return PageMeta(None, None, None, None)
    // scope to the head region: a <title> inside body SVG (an icon label)
    // or <meta> soup after the body must not become page metadata
    val bodyIdx = BodyStartRe.findFirstMatchIn(html).map(_.start)
      .getOrElse(html.length)
    val head = html.substring(0, bodyIdx)
    val title = TitleRe.findFirstMatchIn(head).map(m =>
      normalizeString(decodeEntities(m.group(1))))
    // match whole tags with quoted attributes allowed to contain '>', then
    // select by EXACT attribute value — a prefix regex would take
    // name="description-translated" for the description
    def tagWith(tagRe: scala.util.matching.Regex, selAttr: String,
        selValue: String, valueAttr: String): Option[String] =
      tagRe.findAllMatchIn(head)
        .find(m => attrValue(m.group(0), selAttr)
          .exists(_.equalsIgnoreCase(selValue)))
        .flatMap(m => attrValue(m.group(0), valueAttr)
          .map(v => normalizeString(decodeEntities(v))))
    PageMeta(
      title.filter(_.nonEmpty),
      tagWith(MetaTagRe, "name", "description", "content").filter(_.nonEmpty),
      tagWith(LinkTagRe, "rel", "canonical", "href").filter(_.nonEmpty),
      HtmlTagRe.findFirstMatchIn(head)
        .flatMap(m => attrValue(m.group(0), "lang")).map(_.trim).filter(_.nonEmpty))
  }

  /** (id, title, description, canonical, lang): page metadata columns. */
  def pageMetaFlat(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val in = df.select(col(idCol).as("id"), col(htmlCol).cast("string").as("h"))
    val schema = StructType(Seq(in.schema.fields(0),
      StructField("title", StringType, nullable = true),
      StructField("description", StringType, nullable = true),
      StructField("canonical", StringType, nullable = true),
      StructField("lang", StringType, nullable = true)))
    in.map { row =>
      val m = if (row.isNullAt(1)) PageMeta(None, None, None, None)
        else pageMeta(row.getString(1))
      Row(row.get(0), m.title.orNull, m.description.orNull,
        m.canonical.orNull, m.lang.orNull)
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private val BodyStartRe = "(?i)<body\\b".r
  private val TitleRe =
    "(?is)<title[^>]*>(.*?)</title".r
  // a whole tag, with quoted attribute values free to contain '>'
  private val MetaTagRe =
    "(?is)<meta\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>".r
  private val LinkTagRe =
    "(?is)<link\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>".r
  private val HtmlTagRe =
    "(?is)<html\\b(?:[^>\"']|\"[^\"]*\"|'[^']*')*>".r

  /** Value of `name=...` inside one tag string: double-quoted,
    * single-quoted, or unquoted. The lookbehind keeps `lang` from
    * matching inside `xml:lang` or `data-lang`. */
  private def attrValue(tag: String, name: String): Option[String] = {
    val re = ("(?is)(?<![\\w:-])" + name +
      "\\s*=\\s*(?:\"([^\"]*)\"|'([^']*)'|([^\\s>]+))").r
    re.findFirstMatchIn(tag).map { m =>
      if (m.group(1) != null) m.group(1)
      else if (m.group(2) != null) m.group(2)
      else m.group(3)
    }
  }

  /** Entity-decode a short metadata string with the same tables the block
    * scanner uses. */
  private def decodeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val out = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '&') {
        val (t, next) = entity(s, i)
        out.append(t)
        i = next
      } else {
        out.append(s.charAt(i))
        i += 1
      }
    }
    out.toString
  }

  private def normalizeString(s: String): String = {
    val sb = new java.lang.StringBuilder(s)
    normalize(sb)._1
  }

  // ------------------------------------------------------ DataFrame surface

  /** (id, text): all extracted text per document. */
  def htmlTextFlat(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    mapDocs(df, idCol, htmlCol, "text")((h: String) => extract(h))

  /** (id, markdown): structure-preserving extraction per document. */
  def htmlMarkdownFlat(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    mapDocs(df, idCol, htmlCol, "markdown")((h: String) => markdown(h))

  /** (id, main_text, n_blocks, n_good): boilerplate-classified content. */
  def htmlMainTextFlat(df: DataFrame, idCol: String, htmlCol: String,
      minWords: Int = 5, maxLinkDensity: Double = 0.4): DataFrame = {
    val in = df.select(col(idCol).as("id"), col(htmlCol).cast("string").as("h"))
    val schema = StructType(Seq(in.schema.fields(0),
      StructField("main_text", StringType, nullable = false),
      StructField("n_blocks", IntegerType, nullable = false),
      StructField("n_good", IntegerType, nullable = false)))
    in.map { row =>
      val id = row.get(0)
      val bs = if (row.isNullAt(1)) Array.empty[Block] else blocks(row.getString(1))
      val good = bs.filter(b => b.words >= minWords && b.linkDensity <= maxLinkDensity)
      Row(id, good.map(_.text).mkString("\n"), bs.length, good.length)
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  /** (id, block_idx, text, n_words, link_density): the raw block stream —
    * the debugging / custom-classifier surface. */
  def htmlBlocksFlat(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val in = df.select(col(idCol).as("id"), col(htmlCol).cast("string").as("h"))
    val schema = StructType(Seq(in.schema.fields(0),
      StructField("block_idx", IntegerType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("n_words", IntegerType, nullable = false),
      StructField("link_density", DoubleType, nullable = false)))
    in.flatMap { row =>
      if (row.isNullAt(1)) Iterator.empty
      else {
        val id = row.get(0)
        blocks(row.getString(1)).iterator.zipWithIndex.map { case (b, k) =>
          Row(id, k, b.text, b.words, b.linkDensity)
        }
      }
    }(org.apache.spark.sql.Encoders.row(schema))
  }

  private def mapDocs(df: DataFrame, idCol: String, htmlCol: String,
      outName: String)(f: String => String): DataFrame = {
    val in = df.select(col(idCol).as("id"), col(htmlCol).cast("string").as("h"))
    val schema = StructType(Seq(in.schema.fields(0),
      StructField(outName, StringType, nullable = false)))
    in.map { row =>
      Row(row.get(0), if (row.isNullAt(1)) "" else f(row.getString(1)))
    }(org.apache.spark.sql.Encoders.row(schema))
  }
}
