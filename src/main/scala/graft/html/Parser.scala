package graft.html

import scala.collection.mutable

/** Raised when the document cannot be parsed at all (mirrors lxml raising
  * ParserError → reference wraps as ValueError, breadability/document.py:97-100). */
final class HtmlParseError(msg: String) extends RuntimeException(msg)

/**
 * From-scratch lenient HTML tokenizer + tree builder approximating
 * libxml2's HTML parser (the parser behind lxml's `document_fromstring`,
 * reference breadability/document.py:90-107). No third-party parser jars
 * exist in this sandbox, so parity is corpus-driven: implied
 * html/head/body, libxml2-style auto-close, void elements, entity decoding
 * (named requires ';', numeric doesn't), script/style raw text, stray end
 * tags ignored, XML-style self-closing honored, tag/attr names lowercased,
 * first duplicate attribute wins.
 *
 * Comments and processing instructions are *skipped at parse time*: the
 * reference's cleaner removes them immediately after parsing with
 * `drop_tree` (tail merged left, lxml clean.py semantics), which yields a
 * tree character-for-character identical to never materializing them.
 */
object Parser {

  // libxml2's HTML4 empty-element set (htmlElemDesc) — NOT the HTML5 list:
  // embed/source/track/wbr/keygen/command are ordinary container elements
  // to libxml2, and parity with the reference's lxml trees requires
  // treating them the same way.
  private val Void = Set(
    "area", "base", "basefont", "br", "col", "frame", "hr", "img",
    "input", "isindex", "link", "meta", "param")

  private val RawText = Set("script", "style")

  // string-pool canonical instances of the attribute names the engine
  // queries by literal (class/id every scoring phase, href/src/style in
  // cleaning/urls) — parseAttrName maps onto these so AttrMap probes
  // compare by reference. VALUES must be the literals themselves.
  private val CommonAttrNames: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](32)
    for (a <- Seq("class", "id", "href", "src", "style", "rel", "type",
      "name", "content", "title", "alt", "width", "height", "value"))
      m.put(a, a)
    m
  }

  private val HeadOnly = Set("title", "meta", "link", "style", "script", "base", "isindex")

  /** Start of any of these closes an open <p> (libxml2/html5 block list). */
  private val ClosesP = Set(
    "address", "article", "aside", "blockquote", "center", "details",
    "dialog", "dir", "div", "dl", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header",
    "hgroup", "hr", "listing", "main", "menu", "nav", "ol", "p",
    "plaintext", "pre", "section", "summary", "table", "ul", "xmp",
    "li", "dt", "dd", "tr", "td", "th", "tbody", "thead", "tfoot",
    "caption", "colgroup", "option", "optgroup")

  /** Should the currently-open `top` be auto-closed by a new start tag `t`? */
  private def closes(t: String, top: String): Boolean = top match {
    case "p"        => ClosesP.contains(t)
    case "li"       => t == "li"
    case "dt" | "dd" => t == "dt" || t == "dd"
    case "option"   => t == "option" || t == "optgroup"
    case "optgroup" => t == "optgroup"
    case "td" | "th" =>
      t == "td" || t == "th" || t == "tr" || t == "tbody" || t == "thead" || t == "tfoot"
    case "tr"       => t == "tr" || t == "tbody" || t == "thead" || t == "tfoot"
    case "thead" | "tbody" => t == "tbody" || t == "tfoot"
    case "caption" | "colgroup" =>
      t == "tr" || t == "td" || t == "th" || t == "tbody" || t == "thead" || t == "tfoot"
    case "a"        => t == "a"
    case "nobr"     => t == "nobr"
    case _          => false
  }

  /** libxml2 end-of-line handling (xmlCurrentChar, XML §2.11, shared by
    * the HTML parser): every `\r\n` pair and lone `\r` in the input —
    * text AND attribute values — reaches the DOM as `\n`. Required for
    * byte-identical extracted text on CRLF source pages. */
  private def normalizeEol(s: String): String = {
    if (s == null || s.indexOf('\r') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\r') {
        sb.append('\n')
        if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 1
      } else sb.append(c)
      i += 1
    }
    sb.toString
  }

  /** Parse a full document; returns the `<html>` root element. */
  def parseDocument(input: String): Node = {
    if (input == null || PyText.strip(input).isEmpty)
      throw new HtmlParseError("Document is empty")
    new Builder(normalizeEol(input)).run()
  }

  /** lxml `fragment_fromstring`: the input must yield exactly one element. */
  def parseFragment(input: String): Node = {
    val html = parseDocument(input)
    val body = html.find("body")
    val container = if (body != null) body else html
    val kids = container.children
    if (kids.length != 1)
      throw new HtmlParseError(s"Fragment has ${kids.length} elements, expected 1")
    val el = kids.head
    container.remove(el)
    el.tail = null
    el
  }

  private final class Builder(s: String) {
    private val n = s.length
    private var i = 0
    private var html: Node = null
    private var head: Node = null
    private var body: Node = null
    private val stack = mutable.ArrayBuffer.empty[Node]

    private def top: Node = if (stack.nonEmpty) stack.last else null

    private def ensureHtml(): Node = {
      if (html == null) { html = new Node("html") }
      html
    }

    private def ensureHead(): Node = {
      ensureHtml()
      if (head == null) { head = new Node("head"); head.parent = html; html.children.prepend(head) }
      head
    }

    private def ensureBody(): Node = {
      ensureHtml()
      if (body == null) { body = new Node("body"); html.append(body) }
      body
    }

    def run(): Node = {
      val textBuf = new java.lang.StringBuilder
      while (i < n) {
        val c = s.charAt(i)
        if (c == '<' && i + 1 < n) {
          val c1 = s.charAt(i + 1)
          if (c1 == '!') {
            flushText(textBuf)
            if (s.startsWith("<!--", i)) skipComment()
            else skipBogus() // <!DOCTYPE ...>, <![CDATA[ ...
          } else if (c1 == '?') {
            flushText(textBuf); skipBogus()
          } else if (c1 == '/') {
            flushText(textBuf); endTag()
          } else if (isNameStart(c1)) {
            flushText(textBuf); startTag()
          } else {
            textBuf.append(c); i += 1
          }
        } else if (c == '&') {
          val r = tryEntity(i)
          if (r != null) { textBuf.append(r._1); i = r._2 }
          else { textBuf.append(c); i += 1 }
        } else {
          // bulk-copy plain character data up to the next markup char
          var j = i
          if (s.charAt(j) == '<') j += 1 // literal trailing '<'
          while (j < n && { val ch = s.charAt(j); ch != '<' && ch != '&' }) j += 1
          textBuf.append(s, i, j)
          i = j
        }
      }
      flushText(textBuf)
      if (html == null) throw new HtmlParseError("Document is empty")
      html
    }

    private def isNameStart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')

    /**
     * Try to decode a character reference starting at `pos` (at '&').
     * Returns (decoded, nextPos) or null. Named refs require ';' (libxml2
     * HTML mode); numeric refs don't.
     */
    private def tryEntity(pos: Int): (String, Int) = {
      var j = pos + 1
      if (j >= n) return null
      if (s.charAt(j) == '#') {
        j += 1
        var cp = 0L
        var any = false
        if (j < n && (s.charAt(j) == 'x' || s.charAt(j) == 'X')) {
          j += 1
          while (j < n && isHex(s.charAt(j)) && cp < 0x7FFFFFFFL) {
            cp = cp * 16 + Character.digit(s.charAt(j), 16); any = true; j += 1
          }
        } else {
          while (j < n && s.charAt(j) >= '0' && s.charAt(j) <= '9' && cp < 0x7FFFFFFFL) {
            cp = cp * 10 + (s.charAt(j) - '0'); any = true; j += 1
          }
        }
        if (!any) return null
        if (j < n && s.charAt(j) == ';') j += 1
        if (cp <= 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) return ("", j)
        return (new String(Character.toChars(cp.toInt)), j)
      }
      val start = j
      while (j < n && isEntityNameChar(s.charAt(j)) && j - start < 32) j += 1
      if (j >= n || s.charAt(j) != ';' || j == start) return null
      Entities.byName.get(s.substring(start, j)) match {
        case Some(cp) => (new String(Character.toChars(cp)), j + 1)
        case None     => null
      }
    }

    private def isHex(c: Char): Boolean =
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')
    private def isEntityNameChar(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')

    private def skipComment(): Unit = {
      val end = s.indexOf("-->", i + 4)
      i = if (end < 0) n else end + 3
    }

    private def skipBogus(): Unit = {
      val end = s.indexOf('>', i + 1)
      i = if (end < 0) n else end + 1
    }

    /** Append accumulated character data at the current insertion point. */
    private def flushText(buf: java.lang.StringBuilder): Unit = {
      if (buf.length() == 0) return
      val text = buf.toString
      buf.setLength(0)
      val blank = PyText.isBlank(text)
      var target = top
      if (target == null || (target eq html) || (target eq head)) {
        // libxml2 drops blank character data outside body content
        if (blank) return
        target = ensureBody()
        if (stack.isEmpty || (stack.last eq html)) { stack.clear(); stack += html; stack += body }
      }
      appendText(target, text)
    }

    private def appendText(target: Node, text: String): Unit = {
      if (target.children.nonEmpty) {
        val last = target.children.last
        last.tail = (if (last.tail == null) "" else last.tail) + text
      } else {
        target.text = (if (target.text == null) "" else target.text) + text
      }
    }

    private def startTag(): Unit = {
      // at '<', next char is a letter
      var j = i + 1
      while (j < n && isNamePart(s.charAt(j))) j += 1
      val name = lowerSlice(i + 1, j)
      i = j
      val attrs = new AttrMap
      var selfClosing = false
      var closed = false
      while (!closed && i < n) {
        skipWs()
        if (i >= n) { closed = true }
        else s.charAt(i) match {
          case '>' => i += 1; closed = true
          case '/' =>
            if (i + 1 < n && s.charAt(i + 1) == '>') { selfClosing = true; i += 2; closed = true }
            else i += 1
          case _ =>
            val an = parseAttrName()
            if (an.isEmpty) { i += 1 } // skip junk char
            else {
              skipWs()
              var av = ""
              if (i < n && s.charAt(i) == '=') {
                i += 1; skipWs()
                av = parseAttrValue()
              }
              if (!attrs.contains(an)) attrs(an) = av
            }
        }
      }
      insertElement(name, attrs, selfClosing)
    }

    private def isNamePart(c: Char): Boolean =
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9') ||
        c == '-' || c == '_' || c == ':' || c == '.'

    private def skipWs(): Unit =
      while (i < n && (s.charAt(i) == ' ' || s.charAt(i) == '\t' || s.charAt(i) == '\n' ||
        s.charAt(i) == '\r' || s.charAt(i) == '\f')) i += 1

    private def parseAttrName(): String = {
      val start = i
      while (i < n && { val c = s.charAt(i)
        c != '=' && c != '>' && c != '/' && c != ' ' && c != '\t' && c != '\n' && c != '\r' && c != '\f' }) i += 1
      val name = lowerSlice(start, i)
      // canonicalize common attribute names to the string-pool constants
      // the query sites pass as literals: AttrMap's linear probe then
      // hits String.equals' reference fast path instead of comparing
      // chars on every match (JFR r7: indexOf ~3.7% of self-time)
      val pooled = Parser.CommonAttrNames.get(name)
      if (pooled != null) pooled else name
    }

    /** Lowercased substring without the extra toLowerCase allocation when
      * the slice is already lowercase ASCII (the common case). */
    private def lowerSlice(from: Int, until: Int): String = {
      var k = from
      var needsLower = false
      while (k < until && !needsLower) {
        val c = s.charAt(k)
        if (c >= 'A' && c <= 'Z') needsLower = true
        k += 1
      }
      val sub = s.substring(from, until)
      if (needsLower) sub.toLowerCase(java.util.Locale.ROOT) else sub
    }

    /** Entity-decode s[start,end) in bulk runs. An entity scan can never
      * cross `end`: entity bodies are alnum/#/x + ';', and `end` always
      * sits on a quote, '>', or whitespace. */
    private def decodeValueRange(start: Int, end: Int): String = {
      val sb = new java.lang.StringBuilder(end - start)
      var j = start
      var run = start
      while (j < end) {
        if (s.charAt(j) == '&') {
          if (j > run) sb.append(s, run, j)
          val r = tryEntity(j)
          if (r != null) { sb.append(r._1); j = r._2 } else { sb.append('&'); j += 1 }
          run = j
        } else j += 1
      }
      if (end > run) sb.append(s, run, end)
      sb.toString
    }

    private def parseAttrValue(): String = {
      if (i >= n) return ""
      val c = s.charAt(i)
      if (c == '"' || c == '\'') {
        i += 1
        val start = i
        var amp = false
        while (i < n && s.charAt(i) != c) {
          if (s.charAt(i) == '&') amp = true
          i += 1
        }
        val end = i
        if (i < n) i += 1
        if (!amp) s.substring(start, end) else decodeValueRange(start, end)
      } else {
        val start = i
        var amp = false
        while (i < n && { val ch = s.charAt(i)
          ch != '>' && ch != ' ' && ch != '\t' && ch != '\n' && ch != '\r' && ch != '\f' }) {
          if (s.charAt(i) == '&') amp = true
          i += 1
        }
        val end = i
        if (!amp) s.substring(start, end) else decodeValueRange(start, end)
      }
    }

    private def insertElement(name: String, attrs: AttrMap, selfClosing: Boolean): Unit = {
      name match {
        case "html" =>
          ensureHtml()
          attrs.foreach { case (k, v) => if (!html.attrs.contains(k)) html.attrs(k) = v }
          stack.clear(); stack += html
          return
        case "head" =>
          ensureHead()
          attrs.foreach { case (k, v) => if (!head.attrs.contains(k)) head.attrs(k) = v }
          stack.clear(); stack += html; stack += head
          return
        case "body" =>
          ensureBody()
          attrs.foreach { case (k, v) => if (!body.attrs.contains(k)) body.attrs(k) = v }
          stack.clear(); stack += html; stack += body
          return
        case _ =>
      }

      // Decide the container when nothing content-level is open yet.
      val t0 = top
      if (t0 == null || (t0 eq html)) {
        if (HeadOnly.contains(name) && body == null) {
          val h = ensureHead()
          stack.clear(); stack += html; stack += h
        } else {
          val b = ensureBody()
          stack.clear(); stack += html; stack += b
        }
      } else if ((t0 eq head) && !HeadOnly.contains(name)) {
        val b = ensureBody()
        stack.clear(); stack += html; stack += b
      }

      // auto-close
      while (stack.nonEmpty && (stack.last ne html) && (stack.last ne head) && (stack.last ne body) &&
        closes(name, stack.last.tag)) {
        stack.remove(stack.length - 1)
      }
      val target = if (stack.nonEmpty) stack.last else ensureBody()

      val el = new Node(name)
      attrs.foreach { case (k, v) => el.attrs(k) = v }
      target.append(el)

      if (RawText.contains(name) && !selfClosing) {
        el.text = rawTextUntilClose(name)
      } else if (!Void.contains(name) && !selfClosing) {
        stack += el
      }
    }

    /** Consume raw text content for <script>/<style> up to its end tag. */
    private def rawTextUntilClose(name: String): String = {
      val contentStart = i
      val needle = "</" + name
      var from = contentStart
      while (true) {
        val k = indexOfIgnoreCase(needle, from)
        if (k < 0) {
          i = n
          return s.substring(contentStart, n)
        }
        val after = k + needle.length
        if (after >= n || s.charAt(after) == '>' || s.charAt(after) == ' ' ||
          s.charAt(after) == '\t' || s.charAt(after) == '\n' || s.charAt(after) == '/') {
          val gt = s.indexOf('>', after)
          i = if (gt < 0) n else gt + 1
          return s.substring(contentStart, k)
        }
        from = after
      }
      "" // unreachable
    }

    private def indexOfIgnoreCase(needle: String, from: Int): Int = {
      val m = needle.length
      var k = math.max(from, 0)
      while (k <= n - m) {
        var p = 0
        while (p < m && Character.toLowerCase(s.charAt(k + p)) == needle.charAt(p)) p += 1
        if (p == m) return k
        k += 1
      }
      -1
    }

    private def endTag(): Unit = {
      // at '</'
      var j = i + 2
      while (j < n && isNamePart(s.charAt(j))) j += 1
      val name = lowerSlice(i + 2, j)
      val gt = s.indexOf('>', j)
      i = if (gt < 0) n else gt + 1
      if (name.isEmpty) return
      name match {
        case "html" => stack.clear(); if (html != null) stack += html; return
        case "body" => stack.clear(); if (html != null) { stack += html }; return
        case "head" => stack.clear(); if (html != null) { stack += html }; return
        case _ =>
      }
      // find matching open element; ignore stray end tags (libxml2)
      var k = stack.length - 1
      while (k >= 0 && stack(k).tag != name) k -= 1
      if (k >= 0 && (stack(k) ne html) && (stack(k) ne head) && (stack(k) ne body)) {
        stack.remove(k, stack.length - k)
      }
    }
  }
}
