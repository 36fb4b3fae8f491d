package graft.extract

import java.nio.ByteBuffer
import java.nio.charset.{Charset, CharsetDecoder, CodingErrorAction}
import java.util.regex.Pattern

/**
 * E1 — charset sniff & decode, the reference's 5-step cascade
 * (breadability/document.py:28-61):
 *   1. declared <meta charset> → decode(declared, ignore)
 *   2. strict UTF-8
 *   3. "99% is UTF-8" heuristic on tag-stripped bytes → utf-8 ignore
 *   4. chardet guess (replaced by a small deterministic fallback — the
 *      sandbox has no chardet; windows-1252 decodes any byte stream, which
 *      is also chardet's dominant answer for non-UTF-8 web bytes)
 *   5. decode(guess, ignore)
 */
object Decode {

  // document.py:22-25 (bytes regex, applied via latin-1 transparency)
  private val CharsetMeta = Pattern.compile(
    """<meta[^>]+charset=["']?([^'"/>\s]+)""", Pattern.CASE_INSENSITIVE)
  // document.py:20
  private val TagMark = Pattern.compile("""</?[^>]*>\s*""")

  private def ignoreDecoder(cs: Charset): CharsetDecoder =
    cs.newDecoder()
      .onMalformedInput(CodingErrorAction.IGNORE)
      .onUnmappableCharacter(CodingErrorAction.IGNORE)

  private def decodeIgnore(bytes: Array[Byte], cs: Charset): String =
    ignoreDecoder(cs).decode(ByteBuffer.wrap(bytes)).toString

  private def lookup(name: String): Option[Charset] =
    try Some(Charset.forName(name)) catch { case _: Exception => None }

  def decodeHtml(html: Array[Byte]): String = {
    // transparent byte→char view for the meta regex (mirrors the bytes regex)
    val latin1 = new String(html, java.nio.charset.StandardCharsets.ISO_8859_1)
    val m = CharsetMeta.matcher(latin1)
    if (m.find()) {
      val declared = m.group(1)
      lookup(declared) match {
        case Some(cs) => return decodeIgnore(html, cs)
        case None     => // unknown encoding: proceed as if not found
      }
    }
    // strict utf-8
    try {
      val strict = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
      return strict.decode(ByteBuffer.wrap(html)).toString
    } catch { case _: java.nio.charset.CharacterCodingException => }

    // "99% of text is UTF-8" heuristic on tag-stripped bytes (document.py:47-53)
    val textBytesStr = TagMark.matcher(latin1).replaceAll(" ")
    val textBytes = textBytesStr.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val diff = decodeIgnore(textBytes, java.nio.charset.StandardCharsets.UTF_8)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val sizesMax = math.max(diff.length, textBytes.length)
    if (math.abs(textBytes.length - diff.length) < sizesMax * 0.01) {
      return decodeIgnore(html, java.nio.charset.StandardCharsets.UTF_8)
    }

    // deterministic fallback in place of chardet (document.py:56-61):
    // score a small candidate set by letter/printable ratio of the decoded
    // text and keep the best — covers the common non-UTF-8 web encodings
    // without a trained model. Logged nowhere (pure function); the metric
    // for "fallback fired" is derivable from status + declared-charset.
    bestGuessDecode(textBytes)
      .map(cs => decodeIgnore(html, cs))
      .getOrElse(decodeIgnore(html, Charset.forName("windows-1252")))
  }

  /** Candidate single-byte/legacy encodings by web prevalence. */
  private val FallbackCharsets: Seq[String] = Seq(
    "windows-1252", "windows-1251", "iso-8859-2", "windows-1250",
    "iso-8859-15", "koi8-r", "shift_jis", "gbk", "big5", "euc-kr")

  private def bestGuessDecode(textBytes: Array[Byte]): Option[Charset] = {
    var best: Charset = null
    var bestScore = -1.0
    FallbackCharsets.foreach { name =>
      lookup(name).foreach { cs =>
        val decoded = decodeIgnore(textBytes, cs)
        if (decoded.nonEmpty) {
          var letters = 0
          var control = 0
          var i = 0
          while (i < decoded.length) {
            val c = decoded.charAt(i)
            if (Character.isLetter(c)) letters += 1
            else if (Character.isISOControl(c) && c != '\n' && c != '\r' && c != '\t') control += 1
            i += 1
          }
          val score = (letters - 4.0 * control).toDouble / decoded.length
          if (score > bestScore) { bestScore = score; best = cs }
        }
      }
    }
    Option(best)
  }
}
