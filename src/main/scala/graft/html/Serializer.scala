package graft.html

/**
 * HTML serializer matching lxml's `tounicode` output rules closely enough
 * for the reference's substring assertions and `ok_embedded_video`
 * (breadability/readable.py:55-64, 402-404): insertion-order attributes,
 * `&amp;/&lt;/&gt;` escaping in text, `&quot;` in attribute values, void
 * elements without end tags, raw script/style content.
 */
object Serializer {

  // libxml2's HTML4 empty-element set (htmlElemDesc) — NOT the HTML5 list:
  // embed/source/track/wbr/keygen/command are ordinary container elements
  // to libxml2, and parity with the reference's lxml trees requires
  // treating them the same way.
  private val Void = Set(
    "area", "base", "basefont", "br", "col", "frame", "hr", "img",
    "input", "isindex", "link", "meta", "param")

  private val RawText = Set("script", "style")

  def toUnicode(node: Node, withTail: Boolean = true): String = {
    val sb = new java.lang.StringBuilder
    write(sb, node, withTail)
    sb.toString
  }

  private def write(sb: java.lang.StringBuilder, n: Node, withTail: Boolean): Unit = {
    sb.append('<').append(n.tag)
    n.attrs.foreach { case (k, v) =>
      sb.append(' ').append(k).append('=')
      // xmlBufWriteQuotedString quote selection: a value containing a
      // double quote (and no single quote) is SINGLE-quoted with the
      // double quote left raw; only a value containing both kinds gets
      // double quotes with &quot;. Reachable on the real corpus
      // (businessinsider: an alt attribute quoting a phrase).
      if (v.indexOf('"') >= 0 && v.indexOf('\'') < 0) {
        sb.append('\'')
        escapeAttr(sb, v, escapeQuote = false)
        sb.append('\'')
      } else {
        sb.append('"')
        escapeAttr(sb, v, escapeQuote = true)
        sb.append('"')
      }
    }
    if (Void.contains(n.tag)) {
      sb.append('>')
    } else {
      sb.append('>')
      if (n.text != null) {
        if (RawText.contains(n.tag)) sb.append(n.text) else escapeText(sb, n.text)
      }
      n.children.foreach(c => write(sb, c, withTail = true))
      sb.append("</").append(n.tag).append('>')
    }
    if (withTail && n.tail != null) escapeText(sb, n.tail)
  }

  private def escapeText(sb: java.lang.StringBuilder, s: String): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case c   => sb.append(c)
      }
      i += 1
    }
  }

  // xmlBufAttrSerializeTxtContent: control whitespace in attribute values
  // is emitted as character references (a \n can reach an attribute via
  // libxml2's CRLF→LF input normalization; \r only from programmatic
  // trees). Text nodes do NOT get these — only & < > there.
  private def escapeAttr(sb: java.lang.StringBuilder, s: String,
                         escapeQuote: Boolean): Unit = {
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'                  => sb.append("&amp;")
        case '<'                  => sb.append("&lt;")
        case '>'                  => sb.append("&gt;")
        case '"' if escapeQuote   => sb.append("&quot;")
        case '\n'                 => sb.append("&#10;")
        case '\r'                 => sb.append("&#13;")
        case '\t'                 => sb.append("&#9;")
        case c                    => sb.append(c)
      }
      i += 1
    }
  }
}
