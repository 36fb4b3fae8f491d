package graft.html

/**
 * URL resolution matching Python's `urllib.parse.urljoin` (which lxml's
 * `make_links_absolute` delegates to; reference usage at
 * breadability/document.py:102-105). Tolerant parsing — never throws.
 */
object Urls {

  private case class Split(scheme: String, netloc: String, path: String,
                           query: String, fragment: String) {
    def unsplit: String = {
      val sb = new StringBuilder
      if (scheme != null) sb.append(scheme).append(':')
      if (netloc != null) sb.append("//").append(netloc)
      sb.append(path)
      if (query != null) sb.append('?').append(query)
      if (fragment != null) sb.append('#').append(fragment)
      sb.toString
    }
  }

  private def split(url: String): Split = {
    var rest = url
    var fragment: String = null
    val hi = rest.indexOf('#')
    if (hi >= 0) { fragment = rest.substring(hi + 1); rest = rest.substring(0, hi) }
    var query: String = null
    val qi = rest.indexOf('?')
    if (qi >= 0) { query = rest.substring(qi + 1); rest = rest.substring(0, qi) }
    var scheme: String = null
    val ci = rest.indexOf(':')
    if (ci > 0 && rest.substring(0, ci).matches("[A-Za-z][A-Za-z0-9+.-]*")) {
      scheme = rest.substring(0, ci).toLowerCase(java.util.Locale.ROOT)
      rest = rest.substring(ci + 1)
    }
    var netloc: String = null
    if (rest.startsWith("//")) {
      var end = rest.length
      var k = 2
      var found = false
      while (k < rest.length && !found) {
        val c = rest.charAt(k)
        if (c == '/' || c == '?' || c == '#') { end = k; found = true }
        k += 1
      }
      netloc = rest.substring(2, end)
      rest = rest.substring(end)
    }
    Split(scheme, netloc, rest, query, fragment)
  }

  private def removeDotSegments(path: String): String = {
    if (path.isEmpty) return path
    val segs = path.split("/", -1).toList
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val absolute = path.startsWith("/")
    var i = 0
    val n = segs.length
    segs.zipWithIndex.foreach { case (seg, idx) =>
      seg match {
        case "." =>
          if (idx == n - 1) out += ""
        case ".." =>
          if (out.nonEmpty && out.last != ".." && !(out.length == 1 && out.head == "")) {
            out.remove(out.length - 1)
          } else if (!absolute) {
            out += ".."
          }
          if (idx == n - 1) out += ""
        case s => out += s
      }
      i += 1
    }
    var res = out.mkString("/")
    if (absolute && !res.startsWith("/")) res = "/" + res
    res
  }

  /** Python urljoin(base, url). */
  def urljoin(base: String, url: String): String = {
    if (base == null || base.isEmpty) return url
    if (url == null || url.isEmpty) return base
    val b = split(base)
    val r0 = split(url)
    // Python: a relative ref with the SAME scheme is still treated as relative
    val r = if (r0.scheme != null && r0.scheme != b.scheme) return url
            else r0.copy(scheme = b.scheme)
    if (r.netloc != null) return r.copy(scheme = b.scheme).unsplit
    if (r.path.isEmpty && r.query == null) {
      // only fragment (or nothing) — keep base path/query
      return Split(b.scheme, b.netloc, b.path, b.query, r.fragment).unsplit
    }
    if (r.path.isEmpty) {
      return Split(b.scheme, b.netloc, b.path, r.query, r.fragment).unsplit
    }
    val mergedPath =
      if (r.path.startsWith("/")) r.path
      else {
        val bp = if (b.netloc != null && b.path.isEmpty) "/" else b.path
        val cut = bp.lastIndexOf('/')
        (if (cut >= 0) bp.substring(0, cut + 1) else "") + r.path
      }
    Split(b.scheme, b.netloc, removeDotSegments(mergedPath), r.query, r.fragment).unsplit
  }

  /** Attributes lxml's iterlinks covers that matter for Common-Crawl HTML. */
  private val LinkAttrs = List(
    "href", "src", "action", "archive", "background", "cite", "classid",
    "codebase", "data", "icon", "longdesc", "manifest", "poster", "profile",
    "usemap")

  /**
   * lxml `resolve_base_href` + `make_links_absolute` (document.py:102-105):
   * applies any `<base href>` to all links and removes the base tags; then
   * (if `baseHref` given) joins every link attribute against it.
   */
  def absolutizeLinks(root: Node, baseHref: String): Unit = {
    // resolve <base href> first (lxml: last base wins, all base tags dropped)
    var docBase: String = null
    val bases = root.findAll("base") ++ (if (root.tag == "base") List(root) else Nil)
    bases.foreach { b =>
      b.get("href").foreach(h => docBase = h)
      if (b.parent != null) b.dropTree()
    }
    if (docBase != null) applyBase(root, docBase)
    if (baseHref != null && baseHref.nonEmpty) applyBase(root, baseHref)
  }

  private def applyBase(root: Node, base: String): Unit = {
    def walk(n: Node): Unit = {
      LinkAttrs.foreach { a =>
        val v = n.attrs.getOrElse(a, null)
        if (v != null) n.attrs(a) = urljoin(base, v)
      }
      n.children.foreach(walk)
    }
    walk(root)
  }
}
