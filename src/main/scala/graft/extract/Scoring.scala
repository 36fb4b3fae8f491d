package graft.extract

import graft.html.{Node, PyText}
import java.util.regex.Pattern
import scala.collection.mutable

/**
 * E7 + scalar helpers — candidate scoring (breadability/scoring.py).
 * Regex alternations verbatim from scoring.py:19-38; score constants from
 * scoring.py:141-222 and ScoredNode priors from scoring.py:234-249.
 */
object Scoring {

  val ClsUnlikely: Pattern = Pattern.compile(
    "combx|comment|community|disqus|extra|foot|header|menu|remark|rss|" +
      "shoutbox|sidebar|sponsor|ad-break|agegate|pagination|pager|perma|popup|" +
      "tweet|twitter|social|breadcrumb",
    Pattern.CASE_INSENSITIVE)

  val ClsMaybe: Pattern = Pattern.compile(
    "and|article|body|column|main|shadow|entry", Pattern.CASE_INSENSITIVE)

  val ClsWeightPositive: Pattern = Pattern.compile(
    "article|body|content|entry|main|page|pagination|post|text|blog|story",
    Pattern.CASE_INSENSITIVE)

  val ClsWeightNegative: Pattern = Pattern.compile(
    "combx|comment|com-|contact|foot|footer|footnote|head|masthead|media|meta|" +
      "outbrain|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|" +
      "tool|widget",
    Pattern.CASE_INSENSITIVE)

  /** scoring.py:56-69 — md5(serialized node)[:8]. Byte-exact vs lxml on
    * scoring fragments: Serializer.toUnicode reproduces lxml's tostring
    * bytes there, so the reference pin `'ffa4c519'`
    * (test_scoring.py:210-222) passes exactly (ScoringSpec). */
  def generateHashId(node: Node): String = {
    val content =
      if (node == null) "None".getBytes(java.nio.charset.StandardCharsets.UTF_8)
      else try graft.html.Serializer.toUnicode(node).getBytes(java.nio.charset.StandardCharsets.UTF_8)
      catch { case _: Throwable => node.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8) }
    java.security.MessageDigest.getInstance("MD5").digest(content)
      .take(4).map(b => f"$b%02x").mkString
  }

  /** scoring.py:43-53 */
  def checkNodeAttributes(pattern: Pattern, node: Node, attributes: String*): Boolean =
    attributes.exists { a =>
      val v = node.attrs.getOrElse(a, null)
      v != null && pattern.matcher(v).find()
    }

  /** Thread-local memo of `pattern.find(value)` — class/id strings repeat
    * heavily within and across documents, and these four regexes are the
    * per-node cost driver of the scoring pass. Pure function of the
    * string; bounded (cleared at 8k entries). */
  private final class MemoPattern(p: Pattern) {
    private val tl = ThreadLocal.withInitial(
      () => new java.util.HashMap[String, java.lang.Boolean](512))
    def find(s: String): Boolean = {
      val m = tl.get()
      val hit = m.get(s)
      if (hit != null) return hit.booleanValue()
      if (m.size > 8192) m.clear()
      val r = p.matcher(s).find()
      m.put(s, java.lang.Boolean.valueOf(r))
      r
    }
    def check(node: Node, a1: String): Boolean = {
      val v = node.attrs.getOrElse(a1, null)
      v != null && find(v)
    }
    def check(node: Node, a1: String, a2: String): Boolean =
      check(node, a1) || check(node, a2)
  }

  private val MemoUnlikely = new MemoPattern(ClsUnlikely)
  private val MemoMaybe = new MemoPattern(ClsMaybe)
  private val MemoPos = new MemoPattern(ClsWeightPositive)
  private val MemoNeg = new MemoPattern(ClsWeightNegative)

  /** scoring.py:72-100 — link-text / text ratio with the 50-chars-per-img bonus. */
  def getLinkDensity(node: Node, nodeText: String = null): Double =
    getLinkDensityCached(node, new TextCache)

  /** Same formula evaluated through a phase-local memo (identical values;
    * avoids the reference's O(n·depth) rescans, SURVEY.md §4.1). */
  def getLinkDensityCached(node: Node, cache: TextCache): Double = {
    val textLength = cache.normStrippedLen(node)
    if (textLength == 0) return 0.0
    val linksLength = cache.linksLengthSum(node)
    val imgBonuses = 50L * cache.imgCount(node)
    val adj = math.max(0L, linksLength - imgBonuses)
    adj.toDouble / textLength
  }

  /** scoring.py:107-125 — class and id weighed independently (±25 each). */
  def getClassWeight(node: Node): Int = {
    var weight = 0
    val cls = node.attrs.getOrElse("class", null)
    val id = node.attrs.getOrElse("id", null)
    if (cls != null) {
      if (MemoNeg.find(cls)) weight -= 25
      if (MemoPos.find(cls)) weight += 25
    }
    if (id != null) {
      if (MemoNeg.find(id)) weight -= 25
      if (MemoPos.find(id)) weight += 25
    }
    weight
  }

  /** scoring.py:128-138 — <body> is never unlikely. */
  def isUnlikelyNode(node: Node): Boolean = {
    if (node.tag == "body") return false // cheap reject before attr reads
    val cls = node.attrs.getOrElse("class", null)
    val id = node.attrs.getOrElse("id", null)
    val unlikely = (cls != null && MemoUnlikely.find(cls)) ||
      (id != null && MemoUnlikely.find(id))
    if (!unlikely) return false
    !((cls != null && MemoMaybe.find(cls)) || (id != null && MemoMaybe.find(id)))
  }

  /** ScoredNode — tag prior (assignment, not sum) + class weight (scoring.py:234-249). */
  final class ScoredNode(val node: Node) {
    var contentScore: Double = {
      var s = 0.0
      node.tag match {
        case "div" | "article"            => s = 5
        case "pre" | "td" | "blockquote"  => s = 3
        case "address" | "ol" | "ul" | "dl" | "dd" | "dt" | "li" | "form" => s = -3
        case "h1" | "h2" | "h3" | "h4" | "h5" | "h6" | "th"              => s = -5
        case _                            =>
      }
      s
    }
    contentScore += getClassWeight(node)

    /** scoring.py:251-253 */
    def hashId: String = generateHashId(node)
  }

  /**
   * scoring.py:141-222 — per scorable node with parent+grandparent and
   * ≥25 chars of text: base 1 + 0.25/comma − 0.5/quote + min(len/100, 3);
   * parent gets 1×, grandparent 0.5×, node itself 1×; finally every
   * candidate ×(1 − link_density). Candidates keyed by node identity in
   * insertion order (we iterate nodes in document order ⇒ deterministic).
   */
  def scoreCandidates(nodes: Iterable[Node]): mutable.LinkedHashMap[Node, ScoredNode] =
    scoreCandidates(nodes, new TextCache)

  def scoreCandidates(nodes: Iterable[Node], cache: TextCache): mutable.LinkedHashMap[Node, ScoredNode] = {
    val MinHitLength = 25
    val candidates = mutable.LinkedHashMap.empty[Node, ScoredNode]
    nodes.foreach { node =>
      val parent = node.parent
      if (parent != null) {
        val grand = parent.parent
        if (grand != null) {
          // (len(inner_text.strip()), commas, quotes) in one scan — commas
          // and quotes are non-whitespace so stripping cannot change them
          val (innerLen, commas, quotes) = cache.innerTextMetrics(node)
          if (innerLen >= MinHitLength) {
            // insertion order parent→grand→node is load-bearing: the winner
            // sort is stable on it (Q14); getOrElseUpdate preserves it with
            // one lookup per key instead of contains+apply+update
            val pSn = candidates.getOrElseUpdate(parent, new ScoredNode(parent))
            val gSn = candidates.getOrElseUpdate(grand, new ScoredNode(grand))
            var contentScore = 1.0
            contentScore += commas * 0.25
            contentScore += quotes * -0.5
            contentScore += math.min(innerLen / 100.0, 3.0)
            pSn.contentScore += contentScore
            gSn.contentScore += contentScore / 2.0
            val nSn = candidates.getOrElseUpdate(node, new ScoredNode(node))
            nSn.contentScore += contentScore
          }
        }
      }
    }
    candidates.valuesIterator.foreach { c =>
      c.contentScore *= (1.0 - getLinkDensityCached(c.node, cache))
    }
    candidates
  }
}
