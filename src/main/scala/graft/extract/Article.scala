package graft.extract

import graft.html.{HtmlParseError, Node, Parser, PyText, Serializer, Urls}
import graft.extract.Scoring.ScoredNode
import scala.collection.mutable

/**
 * E1→E17 wired — the reference's `Article` lifecycle
 * (breadability/readable.py:353-458) as a per-row pure computation. Stages
 * are lazy to mirror the reference's `cached_property` chain (the same
 * mutable DOM flows through them in order).
 */
final class Article private (html: String, url: String,
                             returnFragment: Boolean) {

  /** OriginalDocument.dom (document.py:127-137): decode → breaks→p →
    * parse + absolutize. Throws HtmlParseError on unparseable input. */
  lazy val originalDom: Node = {
    val converted = Breaks.convertBreaksToParagraphs(html)
    val dom = Parser.parseDocument(converted)
    Urls.absolutizeLinks(dom, url)
    dom
  }

  /** OriginalDocument.links (document.py:139-142). */
  def links: List[Node] =
    try originalDom.findAll("a") catch { case _: Throwable => Nil }

  /** document.py:145-151 */
  lazy val title: String = {
    try {
      val t = originalDom.find("title")
      if (t == null || t.text == null) "" else PyText.strip(t.text)
    } catch { case _: Throwable => "" }
  }

  /** Article.dom (readable.py:374-383): clean in place + leaf div → p;
    * null when parsing failed. */
  lazy val dom: Node = {
    try {
      val d = originalDom
      Clean(d)
      Readable.leafDivElementsIntoParagraphs(d)
    } catch {
      case _: HtmlParseError => null
    }
  }

  var nodesPruned: Long = 0L

  /** Article.candidates (readable.py:385-395). null ⇔ reference None/{}-falsy. */
  lazy val candidates: mutable.LinkedHashMap[Node, ScoredNode] = {
    if (dom == null || dom.children.isEmpty) null
    else {
      val (cands, unlikely) = Readable.findCandidates(dom)
      nodesPruned += unlikely.count(_.parent != null)
      Readable.dropNodesWithParents(unlikely)
      cands
    }
  }

  /** readable.py:410-437 — always the <div id="readabilityBody"> element. */
  lazy val readableDom: Node = computeReadable()

  private def computeReadable(): Node = {
    if (candidates == null || candidates.isEmpty) return handleNoCandidates()
    val best = candidates.valuesIterator.toList.sortBy(c => -c.contentScore) // stable
    val winner = best.head
    val updatedWinner = Readable.checkSiblings(winner, candidates)
    val prepped = Readable.prepArticle(updatedWinner.node)
    if (prepped == null) return handleNoCandidates()
    val dom2 = Readable.documentFromFragment(
      Readable.buildBaseDocument(prepped), returnFragment)
    Readable.removeOrphans(findReadabilityBody(dom2))
  }

  private def findReadabilityBody(n: Node): Node = {
    if (n.attrs.getOrElse("id", null) == "readabilityBody") return n
    var res: Node = null
    def walk(m: Node): Unit = {
      if (res != null) return
      if (m.attrs.getOrElse("id", null) == "readabilityBody") { res = m; return }
      m.children.foreach(walk)
    }
    walk(n.root)
    if (res != null) res else n
  }

  /** readable.py:446-458. NOTE the reference quirk at readable.py:458:
    * `build_error_document(self._return_fragment)` passes the flag as the
    * unused `dom` POSITIONAL arg, so error documents are ALWAYS fragments
    * regardless of return_fragment — reproduced here. */
  private def handleNoCandidates(): Node = {
    if (dom != null && dom.children.nonEmpty) {
      val prepped = Readable.prepArticle(dom)
      if (prepped == null) return Readable.buildErrorDocument()
      val base = Readable.documentFromFragment(
        Readable.buildBaseDocument(prepped), returnFragment)
      Readable.removeOrphans(findReadabilityBody(base))
    } else {
      Readable.buildErrorDocument()
    }
  }

  /** Article.readable (readable.py:402-404): serialized with tail (lxml default).
    * NOTE parity: even with returnFragment=false this serializes the div —
    * lxml's tounicode(element) serializes the subtree only; the shell is
    * reachable as the div's ancestry (see fullHtml). */
  lazy val readable: String = Serializer.toUnicode(readableDom)

  /** The whole tree the readable div lives in: with returnFragment=false,
    * the NULL_DOCUMENT shell (readable.py:42-50) with the extracted div in
    * its body — the full-HTML-document output. (Convenience the reference
    * leaves to `tounicode(div.getroottree())` at call sites.) */
  lazy val fullHtml: String = Serializer.toUnicode(readableDom.root)

  /** Article.main_text (readable.py:397-400): annotated paragraphs of the
    * readabilityBody subtree (reference deepcopies; our walk is read-only). */
  lazy val mainText: List[AnnotatedText.Paragraph] = AnnotatedText.parse(readableDom)

  def isParseError: Boolean =
    readableDom.attrs.getOrElse("class", null) == "parsing-error"
}

object Article {
  def apply(html: String, url: String = null,
            returnFragment: Boolean = true): Article =
    new Article(html, url, returnFragment)
  def fromBytes(html: Array[Byte], url: String = null,
                returnFragment: Boolean = true): Article =
    new Article(Decode.decodeHtml(html), url, returnFragment)
}
