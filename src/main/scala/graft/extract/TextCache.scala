package graft.extract

import java.util.IdentityHashMap

import graft.html.{Node, PyText}

/**
 * Per-phase text index over a *static* tree — the engine's fix for the
 * reference's acknowledged perf debt ("we do a lot of looping and re-drop
 * some nodes", reference README.rst:122-124; rescans in scoring.py:94-97
 * and readable.py:242-261 are O(n·depth) per call).
 *
 * One DFS concatenates every text/tail into a single buffer and records
 * [start,end) per node; a node's `text_content()` is exactly that segment
 * (a node's content stream is contiguous in document order, excluding its
 * own tail). All metrics the pipeline needs (lengths, comma/quote counts,
 * normalized-stripped lengths) are then O(segment) scans with no string
 * allocation. Values are DEFINED identically to the reference's uncached
 * formulas; only the evaluation strategy changes — equivalence is pinned
 * by the transliterated reference suites.
 *
 * Valid only while the tree is not structurally mutated; each
 * batch-collect-then-drop phase builds one cache and discards it.
 */
object TextCache {
  /** Generation counter backing the per-node memo slots (Node.tc*):
    * every cache instance gets a unique gen, so a stale slot from an
    * earlier cache can never read as valid. Long: wrap-around is
    * unreachable (a node would have to outlive 2^63 cache creations). */
  private val genCounter = new java.util.concurrent.atomic.AtomicLong(0L)

  /** A cache indexing only `n`'s subtree — for per-sibling probes
    * (readable.py:113-166) where indexing from the document root would be
    * O(doc) per sibling. Only `n` and its descendants may be queried. */
  def forSubtree(n: Node): TextCache = {
    val c = new TextCache
    c.subtreeScope = n
    c
  }
}

final class TextCache {

  private[extract] var subtreeScope: Node = null

  private val buf = new java.lang.StringBuilder(1 << 12)
  // Two-layer memos: a generation-stamped slot ON each node (Node.tc*)
  // is the fast layer — a slot is valid iff its gen matches this cache's
  // — over cache-local IdentityHashMaps as the AUTHORITATIVE layer. The
  // slots eliminate the dominant map-GET traffic (~8 lookups per node
  // per phase; the maps' put/get/resize was ~6% of single-core
  // self-time, JFR r6) for the sequential one-live-cache case, while
  // the maps keep TWO live caches over the same tree correct AND cheap:
  // with slots alone, every cache switch found the other cache's gen
  // and re-walked (and re-appended!) the whole document — a measured
  // 735× cliff on the fast-vs-fallback parity test, plus unbounded
  // buffer growth. A slot stamped by another cache simply falls through
  // to this cache's own map. NOT thread-safe ACROSS CACHES on a shared
  // tree (slot stores race) — trees and their caches are per-document,
  // single-threaded everywhere in the engine.
  private val gen = TextCache.genCounter.incrementAndGet()
  // presized past typical article node counts: JFR r7 showed
  // IdentityHashMap.resize churn at the 512 expected-size default
  private val segIdx = new IdentityHashMap[Node, java.lang.Long](2048)
  private val normLenMemo = new IdentityHashMap[Node, Integer](1024)
  private val videoMemo = new IdentityHashMap[Node, java.lang.Boolean](64)
  private val densityMemo = new IdentityHashMap[Node, java.lang.Long](2048)

  // ---- prefix sums over the text stream --------------------------------
  // One O(n) pass makes every per-node metric O(1) + short boundary scans
  // (JFR showed the repeated segment scans were the scoring hot spot).
  // Bounded: docs above the threshold fall back to direct scans so peak
  // memory stays small on giant pages.
  private[graft] var arrayThreshold: Int = 1 << 21 // 2M chars
  private var snap: String = null
  // CHECKPOINTED prefix sums, one entry per 8 chars (round 5): the former
  // per-char arrays wrote (and first zeroed) 16 bytes per char per phase
  // cache — the dominant build cost (JFR r5: ensureArrays was 14% of
  // self-time) and a DRAM-bandwidth term at 32 threads (BENCH.md §2).
  // A checkpoint stores the counts over [0, k*8); a query scans ≤7 chars
  // forward from its checkpoint. Values are IDENTICAL to the per-char
  // formulation (pinned by the golden/scoring suites); only the storage
  // density changed (2 bytes per char instead of 16).
  // cpPacked entry: prevWs<<63 | totalCps<<42 | nonWsCps<<21 | wsRunStarts
  // (each 21 bits — covers the threshold; prevWs seeds the run-start
  // scan). cpPunct entry: commas<<21 | quotes.
  // Surrogate-pair convention (same as the per-char arrays had): a pair
  // counts at its START; a checkpoint landing on a pair MIDDLE stores the
  // counts INCLUDING the pair, and forward scans skip middle positions.
  private var cpPacked: Array[Long] = null
  private var cpPunct: Array[Long] = null

  private def ensureArrays(): Boolean = {
    if (snap != null && snap.length == buf.length) return cpPacked != null
    snap = buf.toString // (re)take — a new root may have been indexed
    // null BEFORE the threshold check: a retake that falls back must not
    // leave arrays built over an earlier, shorter snapshot — the next
    // stable-length call would return them as valid and index out of
    // their bounds
    cpPacked = null
    cpPunct = null
    val len = snap.length
    // STRICTLY below the threshold: at len == 2^21 exactly a count can
    // reach 2^21, which overflows the 21-bit checkpoint fields (and would
    // collide with the prevWs flag in bit 63)
    if (len >= arrayThreshold) return false
    val packed = new Array[Long]((len >> 3) + 1)
    val punct = new Array[Long]((len >> 3) + 1)
    var i = 0
    var prevWs = false
    var vt = 0L; var vp = 0L; var vr = 0L
    var vc = 0L; var vq = 0L
    while (i < len) {
      if ((i & 7) == 0) {
        val pw = if (prevWs) 1L << 63 else 0L
        packed(i >> 3) = pw | (vt << 42) | (vp << 21) | vr
        punct(i >> 3) = (vc << 21) | vq
      }
      // inlined codePointAt: the sequential charAt walk avoids repeated
      // bounds/surrogate re-checks (this loop was the top self-time leaf);
      // surrogate detection by range compare, not method call (JFR round 8)
      val c1 = snap.charAt(i)
      var cp: Int = c1
      var w = 1
      if (c1 >= 0xD800 && c1 < 0xDC00 && i + 1 < len) {
        val c2 = snap.charAt(i + 1)
        if (c2 >= 0xDC00 && c2 < 0xE000) { cp = Character.toCodePoint(c1, c2); w = 2 }
      }
      val ws = PyText.isPySpace(cp)
      vt += 1
      if (!ws) vp += 1
      if (ws && !prevWs) vr += 1
      if (cp == ',') vc += 1 else if (cp == '"') vq += 1
      if (w == 2 && ((i + 1) & 7) == 0) {
        // the pair STRADDLES a checkpoint boundary: the middle position's
        // checkpoint stores counts INCLUDING the pair (scans from it skip
        // the middle), prevWs = this pair's ws-ness (pairs are never ws)
        val pw = if (ws) 1L << 63 else 0L
        packed((i + 1) >> 3) = pw | (vt << 42) | (vp << 21) | vr
        punct((i + 1) >> 3) = (vc << 21) | vq
      }
      prevWs = ws
      i += w
    }
    if ((len & 7) == 0) {
      // queries at i == len read checkpoint len>>3, which the loop never
      // reaches when len is a multiple of 8 (idempotent with the straddle
      // write when a pair ends exactly at len)
      val pw = if (prevWs) 1L << 63 else 0L
      packed(len >> 3) = pw | (vt << 42) | (vp << 21) | vr
      punct(len >> 3) = (vc << 21) | vq
    }
    cpPacked = packed
    cpPunct = punct
    true
  }

  /** packed (totalCps<<42 | nonWs<<21 | runs) over [0,i): checkpoint +
    * a ≤7-char forward scan. Pair-middle positions contribute nothing
    * (their pair was counted at its start — or inside the checkpoint when
    * the pair straddles it). */
  private def packedAt(i: Int): Long = {
    val k = i >> 3
    val raw = cpPacked(k)
    var prevWs = raw < 0 // bit 63
    var vt = (raw >>> 42) & 0x1FFFFF
    var vp = (raw >>> 21) & 0x1FFFFF
    var vr = raw & 0x1FFFFF
    var j = k << 3
    while (j < i) {
      val c1 = snap.charAt(j)
      if (c1 >= 0xDC00 && c1 < 0xE000 && j > 0 &&
          { val p = snap.charAt(j - 1); p >= 0xD800 && p < 0xDC00 }) {
        j += 1 // pair middle: already counted
      } else {
        var cp: Int = c1
        var w = 1
        if (c1 >= 0xD800 && c1 < 0xDC00 && j + 1 < snap.length) {
          val c2 = snap.charAt(j + 1)
          if (c2 >= 0xDC00 && c2 < 0xE000) { cp = Character.toCodePoint(c1, c2); w = 2 }
        }
        val ws = PyText.isPySpace(cp)
        vt += 1
        if (!ws) vp += 1
        if (ws && !prevWs) vr += 1
        prevWs = ws
        j += w
      }
    }
    (vt << 42) | (vp << 21) | vr
  }

  /** (commas<<21 | quotes) over [0,i) — same checkpoint + scan shape.
    * No surrogate handling needed: no surrogate half equals ',' or '"'. */
  private def punctAt(i: Int): Long = {
    val k = i >> 3
    var vc = (cpPunct(k) >>> 21) & 0x1FFFFF
    var vq = cpPunct(k) & 0x1FFFFF
    var j = k << 3
    while (j < i) {
      val c1 = snap.charAt(j)
      if (c1 == ',') vc += 1 else if (c1 == '"') vq += 1
      j += 1
    }
    (vc << 21) | vq
  }

  @inline private def totalAt(i: Int): Int = ((packedAt(i) >>> 42) & 0x1FFFFF).toInt
  @inline private def nonWsAt(i: Int): Int = ((packedAt(i) >>> 21) & 0x1FFFFF).toInt
  @inline private def runsAt(i: Int): Int = (packedAt(i) & 0x1FFFFF).toInt
  @inline private def commasAt(i: Int): Int = ((punctAt(i) >>> 21) & 0x1FFFFF).toInt
  @inline private def quotesAt(i: Int): Int = (punctAt(i) & 0x1FFFFF).toInt

  /** Stripped bounds of [a0,b0) in the snapshot (short boundary scans).
    * Surrogate pairs are never whitespace, so the walk can stop at any
    * surrogate half without decoding the pair. */
  private def strippedBounds(a0: Int, b0: Int): Long = {
    var a = a0
    var b = b0
    var run = true
    while (run && a < b) {
      val c = snap.charAt(a)
      if (c >= 0xD800 && c < 0xE000) run = false // astral: not whitespace
      else if (PyText.isPySpace(c)) a += 1
      else run = false
    }
    run = true
    while (run && b > a) {
      val c = snap.charAt(b - 1)
      if (c >= 0xD800 && c < 0xE000) run = false
      else if (PyText.isPySpace(c)) b -= 1
      else run = false
    }
    (a.toLong << 32) | b.toLong
  }

  /** This cache's segment for `n`, indexing on first touch. The slot is
    * checked first; a slot stamped by ANOTHER live cache falls through
    * to this cache's own map (which re-stamps the slot — alternating
    * caches each keep their own memo, as the map-only design did). An
    * out-of-scope query stays a loud error, never a stale/zero read
    * (forSubtree: only the subtree may be queried). */
  private def segOf(n: Node): Long = {
    if (n.tcSegGen == gen) return n.tcSeg
    val hit = segIdx.get(n)
    if (hit != null) {
      val seg = hit.longValue()
      n.tcSeg = seg
      n.tcSegGen = gen
      return seg
    }
    index(if (subtreeScope != null) subtreeScope else n.root)
    val after = segIdx.get(n)
    if (after == null)
      throw new IllegalStateException(
        s"<${n.tag}> is outside this TextCache's indexed scope")
    val seg = after.longValue()
    n.tcSeg = seg
    n.tcSegGen = gen
    seg
  }

  private def index(n: Node): Unit = {
    if (segIdx.containsKey(n)) return
    val start = buf.length
    if (n.text != null) buf.append(n.text)
    var i = 0
    while (i < n.children.length) {
      val c = n.children(i)
      index(c)
      if (c.tail != null) buf.append(c.tail)
      i += 1
    }
    val seg = (start.toLong << 32) | buf.length
    segIdx.put(n, java.lang.Long.valueOf(seg))
    n.tcSeg = seg
    n.tcSegGen = gen
  }

  /** node.text_content() as a string (allocates; prefer the metric APIs). */
  def textContent(n: Node): String = {
    val seg = segOf(n)
    buf.substring((seg >>> 32).toInt, (seg & 0xFFFFFFFFL).toInt)
  }

  /** (strippedPyLen, commas, quotes) of text_content() —
    * everything score_candidates needs per scorable (scoring.py:161-196).
    * Commas/quotes are whitespace-free so stripping cannot change them. */
  def innerTextMetrics(n: Node): (Int, Int, Int) = {
    val seg = segOf(n)
    val from = (seg >>> 32).toInt
    val to = (seg & 0xFFFFFFFFL).toInt
    val fast = ensureArrays()
    var commas = 0
    var quotes = 0
    if (fast) {
      val ua = punctAt(from)
      val ub = punctAt(to)
      commas = (((ub >>> 21) & 0x1FFFFF) - ((ua >>> 21) & 0x1FFFFF)).toInt
      quotes = ((ub & 0x1FFFFF) - (ua & 0x1FFFFF)).toInt
    } else {
      var i = from
      while (i < to) {
        val ch = snap.charAt(i)
        if (ch == ',') commas += 1 else if (ch == '"') quotes += 1
        i += 1
      }
    }
    val ab = strippedBounds(from, to)
    val a = (ab >>> 32).toInt
    val b = (ab & 0xFFFFFFFFL).toInt
    val stripped = if (fast) totalAt(b) - totalAt(a) else snap.codePointCount(a, b)
    (stripped, commas, quotes)
  }

  /** Python len(text_content()) — raw code points. */
  def rawPyLen(n: Node): Int = {
    val seg = segOf(n)
    val from = (seg >>> 32).toInt
    val to = (seg & 0xFFFFFFFFL).toInt
    if (ensureArrays()) totalAt(to) - totalAt(from)
    else snap.codePointCount(from, to)
  }

  /** Python text_content().count(','). */
  def commaCount(n: Node): Int = {
    val seg = segOf(n)
    val fast = ensureArrays()
    val from = (seg >>> 32).toInt
    val to = (seg & 0xFFFFFFFFL).toInt
    if (fast) return commasAt(to) - commasAt(from)
    var cnt = 0
    var i = from
    while (i < to) { if (snap.charAt(i) == ',') cnt += 1; i += 1 }
    cnt
  }

  /** len(normalize_whitespace(text_content().strip())) — density terms.
    * Fast path: (#non-ws cps) + (#ws runs) within the stripped bounds —
    * each run contributes exactly one output char; with the bounds sitting
    * on non-ws code points, every overlapping run starts inside them. */
  def normStrippedLen(n: Node): Int = {
    if (n.tcNormGen == gen) return n.tcNormLen
    val memoHit = normLenMemo.get(n)
    if (memoHit != null) {
      val v = memoHit.intValue()
      n.tcNormLen = v; n.tcNormGen = gen
      return v
    }
    val seg = segOf(n)
    val from = (seg >>> 32).toInt
    val to = (seg & 0xFFFFFFFFL).toInt
    val cnt =
      if (ensureArrays()) {
        val ab = strippedBounds(from, to)
        val a = (ab >>> 32).toInt
        val b = (ab & 0xFFFFFFFFL).toInt
        val pa = packedAt(a)
        val pb = packedAt(b)
        ((((pb >>> 21) & 0x1FFFFF) - ((pa >>> 21) & 0x1FFFFF)) +
          ((pb & 0x1FFFFF) - (pa & 0x1FFFFF))).toInt
      } else {
        val ab = strippedBounds(from, to)
        val a = (ab >>> 32).toInt
        val b = (ab & 0xFFFFFFFFL).toInt
        var c = 0
        var i = a
        while (i < b) {
          val cp = snap.codePointAt(i)
          if (PyText.isPySpace(cp)) {
            c += 1
            while (i < b && PyText.isPySpace(snap.codePointAt(i))) i += Character.charCount(snap.codePointAt(i))
          } else {
            c += 1
            i += Character.charCount(cp)
          }
        }
        c
      }
    normLenMemo.put(n, Integer.valueOf(cnt))
    n.tcNormLen = cnt
    n.tcNormGen = gen
    cnt
  }

  // links-length and img-count fused: getLinkDensity needs BOTH per
  // candidate (scoring.py:87-104), so one bottom-up recursion + one memo
  // entry (linksLen<<32 | imgs; both < 2^31 — text length is bounded by
  // the 16 MiB oversize guard) halves the recursion and map traffic of
  // two separate passes.
  private def densitySums(n: Node): Long = {
    if (n.tcDensGen == gen) return n.tcDens
    val memoHit = densityMemo.get(n)
    if (memoHit != null) {
      val v = memoHit.longValue()
      n.tcDens = v; n.tcDensGen = gen
      return v
    }
    var links = 0L
    var imgs = 0L
    var i = 0
    while (i < n.children.length) {
      val c = n.children(i)
      val sub = densitySums(c)
      links += (sub >>> 32)
      imgs += (sub & 0xFFFFFFFFL)
      if (c.tag == "a") links += normStrippedLen(c)
      else if (c.tag == "img") imgs += 1
      i += 1
    }
    val packed = (links << 32) | imgs
    densityMemo.put(n, java.lang.Long.valueOf(packed))
    n.tcDens = packed
    n.tcDensGen = gen
    packed
  }

  /** Σ over descendant <a> of normStrippedLen — link-density numerator
    * (scoring.py:94). Memoized bottom-up: nested candidates share work. */
  def linksLengthSum(n: Node): Long = densitySums(n) >>> 32

  /** Count of descendant <img> (memoized bottom-up). */
  def imgCount(n: Node): Int = (densitySums(n) & 0xFFFFFFFFL).toInt

  /** Count of descendants with the given tag. */
  def countTag(n: Node, tag: String): Int = {
    var cnt = 0
    def walk(m: Node): Unit = {
      var i = 0
      while (i < m.children.length) {
        val c = m.children(i)
        if (c.tag == tag) cnt += 1
        walk(c)
        i += 1
      }
    }
    walk(n)
    cnt
  }

  /** All five clean_conditionally descendant counts in ONE subtree walk
    * (reference does five separate findall passes, readable.py:250-256). */
  def conditionalCounts(n: Node): (Int, Int, Int, Int, List[Node]) = {
    var p, img, li, inputs = 0
    var embeds: List[Node] = Nil
    def walk(m: Node): Unit = {
      var i = 0
      while (i < m.children.length) {
        val c = m.children(i)
        c.tag match {
          case "p"     => p += 1
          case "img"   => img += 1
          case "li"    => li += 1
          case "input" => inputs += 1
          case "embed" => embeds = c :: embeds
          case _       =>
        }
        walk(c)
        i += 1
      }
    }
    walk(n)
    (p, img, li, inputs, embeds.reverse)
  }

  /**
   * ok_embedded_video without serialization: `tounicode(node)` contains a
   * keyword iff some node part (tag/attr name/attr value/text/descendant
   * tail) contains it — the serializer's inserted characters (<, >, ", =,
   * /) cannot complete a keyword across part boundaries, and escaping only
   * rewrites &, <, >, " which no keyword contains.
   */
  def containsVideoKeyword(n: Node): Boolean = {
    if (n.tcVideoGen == gen) return n.tcVideo
    val memoHit = videoMemo.get(n)
    if (memoHit != null) {
      val v = memoHit.booleanValue()
      n.tcVideo = v; n.tcVideoGen = gen
      return v
    }
    def part(s: String): Boolean =
      s != null && (s.contains("youtube") || s.contains("blip.tv") || s.contains("vimeo"))
    var found = part(n.tag) || part(n.text)
    if (!found) {
      val it = n.attrs.iterator
      while (!found && it.hasNext) {
        val (k, v) = it.next()
        found = part(k) || part(v)
      }
    }
    var i = 0
    while (!found && i < n.children.length) {
      val c = n.children(i)
      found = containsVideoKeyword(c) || part(c.tail)
      i += 1
    }
    videoMemo.put(n, java.lang.Boolean.valueOf(found))
    n.tcVideo = found
    n.tcVideoGen = gen
    found
  }

  /** tounicode(node) includes the node's own tail (lxml with_tail=True) —
    * the top-level ok_embedded_video check must include it too. */
  def okEmbeddedVideo(n: Node): Boolean =
    containsVideoKeyword(n) ||
      (n.tail != null && (n.tail.contains("youtube") ||
        n.tail.contains("blip.tv") || n.tail.contains("vimeo")))
}
