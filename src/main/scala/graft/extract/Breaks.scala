package graft.extract

import java.util.regex.{Matcher, Pattern}

/**
 * E2 — string-level `<br>`/`<hr>` run → `</p><p>` rewrite
 * (breadability/document.py:64-87): a run of break tags is replaced iff it
 * contains an `<hr` or at least two `<br`; otherwise left untouched.
 */
object Breaks {

  private val BreakTags =
    Pattern.compile("""(?:<\s*[bh]r[^>]*>\s*)+""", Pattern.CASE_INSENSITIVE)

  def convertBreaksToParagraphs(html: String): String = {
    if (!hasBreakCandidate(html)) return html // fast path: no <br/<hr at all
    val m = BreakTags.matcher(html)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val tags = m.group()
      // NOTE: the reference's replacement callback is case-SENSITIVE even
      // though the run pattern is case-insensitive (document.py:79-87).
      val replacement =
        if (tags.contains("<hr")) "</p><p>"
        else if (countOccurrences(tags, "<br") > 1) "</p><p>"
        else tags
      m.appendReplacement(sb, Matcher.quoteReplacement(replacement))
    }
    m.appendTail(sb)
    sb.toString
  }

  /** One cheap scan for '<' [ws]* [bBhH][rR] — the regex only ever matches
    * where this does, so skipping it preserves the rewrite exactly. */
  private def hasBreakCandidate(s: String): Boolean = {
    var i = s.indexOf('<')
    while (i >= 0 && i < s.length - 2) {
      var j = i + 1
      while (j < s.length && { val c = s.charAt(j)
        c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == 0x0B }) j += 1
      if (j + 1 < s.length) {
        val c0 = s.charAt(j)
        val c1 = s.charAt(j + 1)
        if ((c0 == 'b' || c0 == 'B' || c0 == 'h' || c0 == 'H') && (c1 == 'r' || c1 == 'R'))
          return true
      }
      i = s.indexOf('<', i + 1)
    }
    false
  }

  private def countOccurrences(s: String, sub: String): Int = {
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }
}
