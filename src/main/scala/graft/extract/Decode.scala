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

  /** Candidate single-byte/legacy encodings by web prevalence. big5 sits
    * before gbk: gbk decodes big5 bytes cleanly (tie) while big5 decoding
    * gbk bytes hits malformed sequences (penalized) — so this order
    * resolves the clean-tie in favor of the codec that survives both. */
  // euc-jp sits after big5/gbk: Chinese bytes decode cleanly (all
  // ideographs) under euc-jp too — a tie the earlier codec must win;
  // real euc-jp text still wins on its kana + common-ideograph bonus.
  private val FallbackCharsets: Seq[String] = Seq(
    "windows-1252", "windows-1251", "iso-8859-2", "windows-1250",
    "iso-8859-15", "koi8-r", "shift_jis", "big5", "gbk", "euc-jp", "euc-kr")

  /** Tiny frequency model: the ~190 highest-frequency ideographs of
    * published zh/ja frequency lists (union; both languages' top-100).
    * A correct decode of real text hits these constantly; a cross-codec
    * misdecode lands on rare ideographs and hits almost never — GBK and
    * EUC-JP map kana rows identically (GB2312 inherited the JIS kana), so
    * kana counts alone cannot separate them. */
  private val CommonCjk: Set[Char] =
    ("的一是不了人我在有他这中大来上国个到说们为子和你地出道也时年得就那要下以生会自着去之过家学对可她里后" +
      "小么心多天而能好都然没日于起还发成事只作当想看文无开手十用主行方又如前所本见经头面公同三已老从动两长" +
      "知民样现分将外但身些与高意进把法此实回二理美点月明其种声全工己话儿者向情部正名定女问力机给等很业最间新" +
      "会人年大十二本中長出三同時政事自行社見月分議後前民生連五発間対上部東者党地合市業内相方四定今回新場金員" +
      "九入選立開手米力学問高代明実円関決子動京全目表戦経通外最言氏現理調体化田当八六約主題下首意法不来作性的" +
      "要用制治度務強気小七成期公持野協取都和統以機語記").toSet

  /** Deterministic chardet stand-in. Three structural signals per
    * candidate, no trained model:
    *  - letters good, control chars bad (as before);
    *  - malformed sequences are heavily penalized: decoding with REPLACE
    *    turns every invalid byte run into U+FFFD, so the correct multi-byte
    *    codec shows zero replacements while wrong ones light up;
    *  - a clean decode dominated by CJK/kana gets a bonus — byte soup
    *    decoded through a single-byte codec yields plausible letter ratios
    *    (every byte is "a letter") but can never yield coherent CJK blocks.
    */
  private def bestGuessDecode(textBytes: Array[Byte]): Option[Charset] = {
    var best: Charset = null
    var bestScore = -1e9
    FallbackCharsets.foreach { name =>
      lookup(name).foreach { cs =>
        val decoded =
          try cs.newDecoder()
            .onMalformedInput(CodingErrorAction.REPLACE)
            .onUnmappableCharacter(CodingErrorAction.REPLACE)
            .decode(ByteBuffer.wrap(textBytes)).toString
          catch { case _: Exception => "" }
        if (decoded.nonEmpty) {
          var letters = 0
          var control = 0
          var repl = 0
          var ideo = 0
          var kana = 0
          var hangul = 0
          var common = 0
          var i = 0
          while (i < decoded.length) {
            val c = decoded.charAt(i)
            if (c == '�') repl += 1
            else if (Character.isLetter(c)) {
              letters += 1
              val b = Character.UnicodeBlock.of(c)
              if (b == Character.UnicodeBlock.CJK_UNIFIED_IDEOGRAPHS) {
                ideo += 1
                if (CommonCjk.contains(c)) common += 1
              }
              else if (b == Character.UnicodeBlock.HIRAGANA ||
                b == Character.UnicodeBlock.KATAKANA) kana += 1
              else if (b == Character.UnicodeBlock.HANGUL_SYLLABLES) hangul += 1
            } else if (Character.isISOControl(c) && c != '\n' && c != '\r' && c != '\t') control += 1
            i += 1
          }
          // CJK bonus is the MAX over blocks (correct decodes are
          // script-homogeneous; misdecodes are mixed), weighted by how hard
          // the block is to hallucinate: kana sits in a narrow range only
          // shift_jis/euc-jp produce (1.0); euc-kr hallucinates hangul from
          // any clean 2-byte soup (0.6); every CJK codec hallucinates
          // ideographs (0.5). Measured on jp/zh/kr cross-decodes.
          val cjkBonus = math.max(1.0 * kana, math.max(0.6 * hangul, 0.5 * ideo))
          val score =
            (letters - 4.0 * control - 10.0 * repl + cjkBonus + 0.5 * common) /
              decoded.length
          if (score > bestScore) { bestScore = score; best = cs }
        }
      }
    }
    Option(best)
  }
}
