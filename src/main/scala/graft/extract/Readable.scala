package graft.extract

import graft.html.{Node, PyText, Serializer}
import graft.extract.Scoring.ScoredNode
import scala.collection.mutable

/**
 * E5, E6, E8–E15 — the per-document readable pipeline
 * (breadability/readable.py). Each function cites its reference source.
 */
object Readable {

  val ScorableTags: Set[String] = Set("div", "p", "td", "pre", "article") // readable.py:34

  /** readable.py:55-64 — serialized subtree mentions a whitelisted video host. */
  def okEmbeddedVideo(node: Node): Boolean = {
    val s = Serializer.toUnicode(node)
    s.contains("youtube") || s.contains("blip.tv") || s.contains("vimeo")
  }

  /** E5 readable.py:461-476 — leaf <div> (no div/p element child) becomes <p>. */
  def leafDivElementsIntoParagraphs(document: Node): Node = {
    val divs = (if (document.tag == "div") List(document) else Nil) ++ document.findAll("div")
    divs.foreach { el =>
      val childTags = el.children.map(_.tag)
      if (!childTags.contains("div") && !childTags.contains("p")) el.tag = "p"
    }
    document
  }

  /** readable.py:330-350 */
  def isBadLink(node: Node): Boolean = {
    if (node.tag != "a") return false
    val name = node.attrs.getOrElse("name", null)
    val href = node.attrs.getOrElse("href", null)
    if (name != null && name.nonEmpty && (href == null || href.isEmpty)) return true
    if (href != null) {
      val parts = href.split("#", -1)
      if (parts.length == 2 && PyText.pyLen(parts(1)) > 25) return true
    }
    false
  }

  /** E6 readable.py:305-327 — document-order partitioning (determinism fix vs
    * the reference's hash sets, SURVEY.md Q14). */
  def findCandidates(document: Node): (mutable.LinkedHashMap[Node, ScoredNode], List[Node]) = {
    val nodesToScore = mutable.ArrayBuffer.empty[Node]
    val shouldRemove = mutable.ArrayBuffer.empty[Node]
    document.iterAll.foreach { node =>
      if (Scoring.isUnlikelyNode(node)) shouldRemove += node
      else if (isBadLink(node)) shouldRemove += node
      else if (ScorableTags.contains(node.tag)) nodesToScore += node
    }
    // the tree is static until the drops are applied after scoring — one
    // shared memo for the whole scoring pass
    (Scoring.scoreCandidates(nodesToScore, new TextCache), shouldRemove.toList)
  }

  /** E8 readable.py:213-224 */
  def dropNodesWithParents(nodes: Iterable[Node]): Unit =
    nodes.foreach { node => if (node.parent != null) node.dropTree() }

  /** E10 readable.py:113-166 — pull related siblings into the winner. */
  def checkSiblings(candidateNode: ScoredNode,
                    candidateList: mutable.LinkedHashMap[Node, ScoredNode]): ScoredNode = {
    val candidateCss = candidateNode.node.attrs.getOrElse("class", null)
    val potentialTarget = candidateNode.contentScore * 0.2
    val siblingTargetScore = if (potentialTarget > 10) potentialTarget else 10.0
    val parent = candidateNode.node.parent
    val siblings = if (parent != null) parent.children.toList else Nil

    siblings.foreach { sibling =>
      var append = false
      var contentBonus = 0.0

      if (sibling eq candidateNode.node) append = true

      if (candidateCss != null && candidateCss.nonEmpty &&
        sibling.attrs.getOrElse("class", null) == candidateCss) {
        contentBonus += candidateNode.contentScore * 0.2
      }

      candidateList.get(sibling).foreach { sn =>
        if (sn.contentScore + contentBonus >= siblingTargetScore) append = true
      }

      if (sibling.tag == "p") {
        // subtree-scoped cache: a root-scoped one would re-index the whole
        // document per sibling — O(doc × p-siblings) on listing-like pages
        val cache = TextCache.forSubtree(sibling)
        val linkDensity = Scoring.getLinkDensityCached(sibling, cache)
        val content = cache.textContent(sibling)
        val contentLength = PyText.pyLen(content)
        if (contentLength > 80 && linkDensity < 0.25) append = true
        else if (contentLength < 80 && linkDensity == 0.0 && content.contains(". ")) append = true
      }

      if (append) {
        if (sibling.tag != "div" && sibling.tag != "p") sibling.tag = "div"
        if (candidateNode.node ne sibling) candidateNode.node.append(sibling)
      }
    }
    candidateNode
  }

  /** E12 readable.py:227-290 — all six conditional-drop rules, incl. the
    * deliberate li−100 discount (readable.py:252) and content_score
    * hardwired to 0 (readable.py:233-235). */
  def cleanConditionally(node: Node): Boolean =
    cleanConditionally(node, new TextCache)

  def cleanConditionally(node: Node, cache: TextCache): Boolean = {
    if (!Set("form", "table", "ul", "div", "p").contains(node.tag)) return false
    val weight = Scoring.getClassWeight(node)
    val contentScore = 0
    if (weight + contentScore < 0) return true

    val commasCount = cache.commaCount(node)
    if (commasCount < 10) {
      val (p, img, li0, inputs, embeds) = cache.conditionalCounts(node)
      val li = li0 - 100
      var embed = 0
      embeds.foreach { e => if (cache.okEmbeddedVideo(e)) embed += 1 }
      val linkDensity = Scoring.getLinkDensityCached(node, cache)
      val contentLength = cache.rawPyLen(node)

      if (li > p && node.tag != "ul" && node.tag != "ol") return true
      else if (inputs > p / 3.0) return true
      else if (contentLength < 25 && (img == 0 || img > 2)) return true
      else if (weight < 25 && linkDensity > 0.2) return true
      else if (weight >= 25 && linkDensity > 0.5) return true
      else if ((embed == 1 && contentLength < 75) || embed > 1) return true
      return false
    }
    false
  }

  /** E11 readable.py:169-210 — final prune; collect during one pass, drop
    * after (tree is static during collection ⇒ one shared text memo). */
  def cleanDocument(node: Node): Node = {
    if (node == null || node.children.isEmpty) return null
    val cache = new TextCache
    val toDrop = mutable.ArrayBuffer.empty[Node]
    node.iterAll.foreach { n =>
      if (n.attrs.contains("style")) n.attrs("style") = ""
      if ((n.tag == "object" || n.tag == "embed") && !cache.okEmbeddedVideo(n)) toDrop += n
      if (Set("h1", "h2", "h3", "h4").contains(n.tag) && Scoring.getClassWeight(n) < 0) toDrop += n
      if ((n.tag == "h3" || n.tag == "h4") && Scoring.getLinkDensityCached(n, cache) > 0.33) toDrop += n
      if (n.tag == "div" || n.tag == "p") {
        // len(shrink_text(text_content())) ≡ normStrippedLen
        if (cache.normStrippedLen(n) < 5 && n.children.isEmpty) toDrop += n
      }
      if (cleanConditionally(n, cache)) toDrop += n
    }
    dropNodesWithParents(toDrop)
    node
  }

  /** readable.py:293-302 */
  def prepArticle(doc: Node): Node = cleanDocument(doc)

  /** E13 readable.py:67-85 — body → <div id="readabilityBody">, else wrap. */
  def buildBaseDocument(dom: Node): Node = {
    val bodyElement = dom.find("body")
    if (bodyElement == null) {
      val fragment = new Node("div")
      fragment.set("id", "readabilityBody")
      fragment.append(dom)
      fragment
    } else {
      bodyElement.tag = "div"
      bodyElement.set("id", "readabilityBody")
      bodyElement
    }
  }

  /** readable.py:88-98 */
  def buildErrorDocument(): Node = {
    val fragment = new Node("div")
    fragment.set("id", "readabilityBody")
    fragment.set("class", "parsing-error")
    fragment
  }

  /** readable.py:42-50 — the empty shell a non-fragment result is wrapped
    * in (whitespace layout preserved verbatim). */
  val NullDocument: String =
    "\n<html>\n    <head>\n        <meta http-equiv=\"Content-Type\" " +
      "content=\"text/html;charset=UTF-8\">\n    </head>\n    <body>\n    " +
      "</body>\n</html>\n"

  /**
   * readable.py:101-110 — `document_from_fragment`: with
   * `returnFragment=false` the fragment is moved (lxml append semantics:
   * tail travels with it) into NULL_DOCUMENT's body, so the readable div
   * gains an html>body ancestry. The net value `_readable` works with is
   * the div itself in BOTH modes (readable.py:437 re-selects it by id), so
   * this returns the fragment — attached to the shell when wrapped.
   * (The reference also assigns `document.doctype`, which on an lxml
   * element proxy is a no-op side attribute — nothing to mirror.)
   */
  def documentFromFragment(fragment: Node, returnFragment: Boolean): Node = {
    if (!returnFragment) {
      val shell = graft.html.Parser.parseDocument(NullDocument)
      shell.find("body").append(fragment)
    }
    fragment
  }

  /** E14 readable.py:439-444 — unwrap same-tag only children; live iteration
    * with lxml's one-step-ahead successor (see Node.iterDescendantsLive). */
  def removeOrphans(dom: Node): Node = {
    val it = dom.iterDescendantsLive
    while (it.hasNext) {
      val node = it.next()
      if (node.children.length == 1 && node.children.head.tag == node.tag) node.dropTag()
    }
    dom
  }
}
