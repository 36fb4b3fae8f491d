package graft.extract

import java.util.regex.{Matcher, Pattern}

/**
 * E2 — string-level `<br>`/`<hr>` run → `</p><p>` rewrite
 * (breadability/document.py:64-87): a run of break tags is replaced iff it
 * contains an `<hr` or at least two `<br`; otherwise left untouched.
 *
 * The hot path is a hand-rolled scanner; `convertBreaksViaRegex` keeps the
 * direct transliteration of the reference's regex and a property test pins
 * scanner ≡ regex on break-tag soup.
 */
object Breaks {

  private val BreakTags =
    Pattern.compile("""(?:<\s*[bh]r[^>]*>\s*)+""", Pattern.CASE_INSENSITIVE)

  def convertBreaksToParagraphs(html: String): String = {
    val n = html.length
    var i = html.indexOf('<')
    if (i < 0) return html
    var sb: java.lang.StringBuilder = null
    var copied = 0
    while (i >= 0 && i < n) {
      val runEnd = matchRun(html, i)
      if (runEnd > i) {
        val run = html.substring(i, runEnd)
        // NOTE: the reference's replacement callback is case-SENSITIVE even
        // though the run pattern is case-insensitive (document.py:79-87)
        val replace = run.contains("<hr") || countOccurrences(run, "<br") > 1
        if (replace) {
          if (sb == null) sb = new java.lang.StringBuilder(n + 16)
          sb.append(html, copied, i).append("</p><p>")
          copied = runEnd
        }
        i = html.indexOf('<', runEnd)
      } else {
        i = html.indexOf('<', i + 1)
      }
    }
    if (sb == null) html
    else { sb.append(html, copied, n); sb.toString }
  }

  /** End index of the maximal `(?:<\s*[bh]r[^>]*>\s*)+` run starting at
    * `start` (which must be '<'), or `start` when there is no match. */
  private def matchRun(s: String, start: Int): Int = {
    val n = s.length
    var pos = start
    var end = start // end of last complete tag+trailing-ws
    var matched = false
    var continue = true
    while (continue) {
      var j = pos
      if (j >= n || s.charAt(j) != '<') continue = false
      else {
        j += 1
        while (j < n && isJavaWs(s.charAt(j))) j += 1
        if (j + 1 < n && { val c = s.charAt(j)
          c == 'b' || c == 'B' || c == 'h' || c == 'H' } && {
          val c = s.charAt(j + 1); c == 'r' || c == 'R' }) {
          j += 2
          while (j < n && s.charAt(j) != '>') j += 1
          if (j < n) { // found '>'
            j += 1
            while (j < n && isJavaWs(s.charAt(j))) j += 1
            matched = true
            end = j
            pos = j
          } else continue = false // unterminated tag — no match
        } else continue = false
      }
    }
    if (matched) end else start
  }

  private def isJavaWs(c: Char): Boolean = // Java regex \s
    c == ' ' || c == '\t' || c == '\n' || c == 0x0B || c == '\f' || c == '\r'

  /** Direct transliteration of the reference regex path (used by the
    * equivalence property test). */
  def convertBreaksViaRegex(html: String): String = {
    val m = BreakTags.matcher(html)
    val sb = new java.lang.StringBuilder
    while (m.find()) {
      val tags = m.group()
      val replacement =
        if (tags.contains("<hr")) "</p><p>"
        else if (countOccurrences(tags, "<br") > 1) "</p><p>"
        else tags
      m.appendReplacement(sb, Matcher.quoteReplacement(replacement))
    }
    m.appendTail(sb)
    sb.toString
  }

  private def countOccurrences(s: String, sub: String): Int = {
    var n = 0
    var i = s.indexOf(sub)
    while (i >= 0) { n += 1; i = s.indexOf(sub, i + sub.length) }
    n
  }
}
