package graft.functions

/** HTML main-content extraction — the boilerplate-stripping step every
  * web-scale text pipeline runs between the WARC walk and quality
  * scoring (CCNet/RefinedWeb-style). JDK-only, single-pass state
  * machine over the markup:
  *
  *  - tags stripped with QUOTE-AWARE scanning (a '>' inside a quoted
  *    attribute value does not end the tag);
  *  - <script>/<style> BODIES skipped entirely (markup-looking strings
  *    inside them never leak into the text);
  *  - comments skipped (including markup inside them);
  *  - character references decoded: the five named entities plus
  *    decimal/hex numeric references;
  *  - every stripped construct contributes a space so adjacent text
  *    blocks never concatenate into one word, then whitespace is
  *    collapsed ([ \t\r\n]+ -> ' ', trimmed) — the normalization the
  *    oracle replays with one regexp.
  *
  * The extractor is TOLERANT: truncated/hostile markup yields the text
  * that was recovered, never a throw (the Media parser discipline).
  */
object Html {

  /** Extraction result: the normalized text plus the boilerplate
    * counters a curation pipeline filters on (link density etc.).
    */
  final case class Extract(
      text: String,
      nLinks: Int,
      nScriptBlocks: Int,
      nStyleBlocks: Int,
      nCommentBlocks: Int,
      nTags: Int
  )

  /** Escape text for embedding in HTML (the fixture/builder side):
    * the five standard characters, apostrophe as a DECIMAL reference
    * so the extractor's numeric path is exercised on every document
    * that carries one.
    */
  def escapeText(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 16)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&#39;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Collapse [ \t\r\n]+ to one space and trim — kept identical to the
    * oracle's `regexp_replace(x, '[ \t\r\n]+', ' ', 'g')` + trim.
    */
  def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def startsWithIgnoreCase(s: String, i: Int, prefix: String): Boolean = {
    if (i + prefix.length > s.length) return false
    var j = 0
    while (j < prefix.length) {
      if (Character.toLowerCase(s.charAt(i + j)) != prefix.charAt(j)) return false
      j += 1
    }
    true
  }

  /** Single-pass extraction (see object doc). Never throws on hostile
    * or truncated markup.
    */
  def extract(html: String): Extract = {
    val out = new java.lang.StringBuilder(html.length)
    var nLinks = 0
    var nScript = 0
    var nStyle = 0
    var nComment = 0
    var nTags = 0
    var i = 0
    val n = html.length

    /** Skip forward from just after an opening construct to just after
      * the case-insensitive terminator; EOF-tolerant.
      */
    def skipUntil(from: Int, terminator: String): Int = {
      var j = from
      while (j < n && !startsWithIgnoreCase(html, j, terminator)) j += 1
      math.min(n, j + terminator.length)
    }

    /** Scan a tag from the '<' at `from`: quote-aware (a '>' inside a
      * quoted attribute does not close it). Returns the index just
      * after the closing '>'.
      */
    def skipTag(from: Int): Int = {
      var j = from + 1
      var quote: Char = 0
      while (j < n) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return j + 1
        j += 1
      }
      n // unclosed tag at EOF: consume the rest, keep what we have
    }

    /** Skip a raw-text element body from just after its open tag to
      * just after its case-insensitive close tag; EOF-tolerant.
      */
    def skipRawBody(afterOpenTag: Int, closePrefix: String): Int = {
      var j = afterOpenTag
      while (j < n && !startsWithIgnoreCase(html, j, closePrefix)) j += 1
      if (j >= n) n else skipTag(j) // skipTag consumes "</script ... >"
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (startsWithIgnoreCase(html, i, "<!--")) {
          nComment += 1
          i = skipUntil(i + 4, "-->")
        } else if (startsWithIgnoreCase(html, i, "<script")) {
          nScript += 1; nTags += 1
          i = skipRawBody(skipTag(i), "</script")
        } else if (startsWithIgnoreCase(html, i, "<style")) {
          nStyle += 1; nTags += 1
          i = skipRawBody(skipTag(i), "</style")
        } else {
          nTags += 1
          if (startsWithIgnoreCase(html, i, "<a") &&
              (i + 2 >= n || !Character.isLetterOrDigit(html.charAt(i + 2)))) nLinks += 1
          i = skipTag(i)
        }
        out.append(' ') // stripped construct = block separator
      } else if (c == '&') {
        // character reference: named (the five) or numeric (dec/hex)
        val semi = {
          var j = i + 1
          val lim = math.min(n, i + 10)
          while (j < lim && html.charAt(j) != ';') j += 1
          if (j < lim && j < n && html.charAt(j) == ';') j else -1
        }
        if (semi < 0) { out.append(c); i += 1 }
        else {
          val body = html.substring(i + 1, semi)
          val decoded: Option[String] = body match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case b if b.startsWith("#x") || b.startsWith("#X") =>
              try Some(new String(Character.toChars(Integer.parseInt(b.substring(2), 16))))
              catch { case _: Exception => None }
            case b if b.startsWith("#") =>
              try Some(new String(Character.toChars(Integer.parseInt(b.substring(1)))))
              catch { case _: Exception => None }
            case _ => None
          }
          decoded match {
            case Some(s) => out.append(s); i = semi + 1
            case None => out.append(c); i += 1 // unknown entity: literal '&'
          }
        }
      } else {
        out.append(c)
        i += 1
      }
    }

    Extract(collapseWs(out.toString), nLinks, nScript, nStyle, nComment, nTags)
  }

  /** The deterministic page fixture (the query/oracle side): the
    * document text HTML-escaped into a page with every boilerplate
    * class the extractor must strip — raw-text script with
    * markup-looking strings inside, style, a comment, quote-aware
    * attributes (a '>' inside a quoted value), nav links (one carrying
    * a named entity), a footer — so the expected extraction is a pure
    * string formula the oracle replays.
    */
  def fixturePage(docId: Long, text: String): String =
    s"""<!DOCTYPE html>
<html><head><title>Doc $docId</title>
<style>body { color: #000; } /* <p>not text</p> */</style>
<script type="text/javascript">var x = "<p>not text</p>"; if (1 > 0) { x = "&amp;"; }</script>
</head>
<body>
<!-- boilerplate nav: <div>also not text</div> -->
<nav><a href="/">Home</a> <a href="/about" title="a>b">About</a> <a href="/qa">Q&amp;A</a></nav>
<p>${escapeText(text)}</p>
<footer>(c) example.org&#39;s corpus</footer>
</body></html>"""
}
