package graft.extract

import graft.html.{Node, PyText}
import scala.collection.mutable

/**
 * E16 — annotated-text serialization (breadability/annotated_text.py:20-89).
 * A SAX-order walk of the readable DOM producing paragraphs of
 * (text, sorted-unique-semantic-tag-annotation) chunks:
 *   - chunks flush to a paragraph on </p>, on </ol> / </ul> / </pre>
 *     (which also pop the path), and at document end;
 *   - blank chunks are skipped;
 *   - adjacent chunks with equal annotations merge by concatenation then
 *     shrink — EXCEPT annotations containing "li", which stay itemized.
 */
object AnnotatedText {

  /** annotated_text.py:12-17 */
  val SemanticTags: Set[String] = Set(
    "a", "abbr", "acronym", "b", "big", "blink", "blockquote", "cite", "code",
    "dd", "del", "dfn", "dir", "dl", "dt", "em", "h", "h1", "h2", "h3", "h4",
    "h5", "h6", "i", "ins", "kbd", "li", "marquee", "menu", "ol", "pre", "q",
    "s", "samp", "strike", "strong", "sub", "sup", "tt", "u", "ul", "var")

  /** One text chunk: annotations is null for un-annotated text. */
  final case class Chunk(text: String, annotations: List[String])
  type Paragraph = List[Chunk]

  def parse(dom: Node): List[Paragraph] = {
    val h = new Handler
    saxify(dom, h)
    h.endDocument()
    h.content.toList
  }

  /** Emit SAX-equivalent events for the subtree rooted at `dom` (root tail
    * excluded, matching lxml.sax.saxify of an element). */
  private def saxify(dom: Node, h: Handler): Unit = {
    def walk(n: Node): Unit = {
      h.startElement(n.tag)
      if (n.text != null && n.text.nonEmpty) h.characters(n.text)
      n.children.foreach { c =>
        walk(c)
        if (c.tail != null && c.tail.nonEmpty) h.characters(c.tail)
      }
      h.endElement(n.tag)
    }
    walk(dom)
  }

  private final class Handler {
    val content = mutable.ListBuffer.empty[Paragraph]
    private var paragraph = mutable.ListBuffer.empty[(String, List[String])]
    private val domPath = mutable.ArrayBuffer.empty[String]

    def startElement(name: String): Unit =
      if (SemanticTags.contains(name)) domPath += name

    def endElement(name: String): Unit = {
      if (name == "p" && paragraph.nonEmpty) {
        appendParagraph()
      } else if ((name == "ol" || name == "ul" || name == "pre") && paragraph.nonEmpty) {
        appendParagraph()
        if (domPath.nonEmpty) domPath.remove(domPath.length - 1)
      } else if (SemanticTags.contains(name)) {
        if (domPath.nonEmpty) domPath.remove(domPath.length - 1)
      }
    }

    def endDocument(): Unit = if (paragraph.nonEmpty) appendParagraph()

    def characters(text: String): Unit = {
      if (PyText.isBlank(text)) return
      val ann = if (domPath.nonEmpty) domPath.toSet.toList.sorted else null
      paragraph += ((text, ann))
    }

    private def appendParagraph(): Unit = {
      content += processParagraph(paragraph.toList)
      paragraph = mutable.ListBuffer.empty
    }
  }

  /** annotated_text.py:65-78 — groupby(annotation): li stays itemized,
    * everything else concatenates then shrinks. Package-visible so the
    * transliterated _process_paragraph test (test_annotated_text.py:98-113)
    * can exercise it directly. */
  private[graft] def processParagraph(p: List[(String, List[String])]): Paragraph = {
      val out = mutable.ListBuffer.empty[Chunk]
      var i = 0
      while (i < p.length) {
        val ann = p(i)._2
        var j = i
        while (j < p.length && p(j)._2 == ann) j += 1
        val group = p.slice(i, j)
        if (ann != null && ann.contains("li")) {
          group.foreach { case (t, _) => out += Chunk(PyText.shrinkText(t), ann) }
        } else {
          out += Chunk(PyText.shrinkText(group.map(_._1).mkString("")), ann)
        }
        i = j
      }
      out.toList
    }
  }
