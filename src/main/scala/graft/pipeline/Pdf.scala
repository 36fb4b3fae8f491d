package graft.pipeline

import java.nio.charset.StandardCharsets.UTF_8

/**
 * Minimal-but-real PDF text extraction (the "PDF/layout parse" leg of
 * main-content extraction). No external libraries: FlateDecode via
 * `java.util.zip`, everything else is the PDF 1.4 file syntax.
 *
 * `extract` handles the subset a crawl pipeline actually meets in
 * machine-generated documents:
 *  - object scanning (`N 0 obj … endobj`), page-tree resolution
 *    (Catalog → /Pages → /Kids order → per-page /Contents),
 *  - content streams raw or /FlateDecode,
 *  - text operators: `(…) Tj`, `[(…) n (…)] TJ`, line moves
 *    `Td`/`TD`/`T*` (each starts a new line), `BT`/`ET` blocks,
 *  - literal-string escapes: \n \r \t \b \f \( \) \\ , octal \ddd, and
 *    backslash-newline continuation; nested balanced parens; bytes are
 *    decoded as UTF-8 (what `synthesize` writes).
 *
 * `synthesize` builds a deterministic single-font PDF (one content
 * stream per page, FlateDecode, correct xref) from page texts — the
 * sandbox stand-in for crawled PDF bytes (no external data), and the
 * generator for the q31 round-trip oracle: extract(synthesize(pages))
 * == pages, so DuckDB can reproduce the expected output from the source
 * text alone while the Spark side does the full byte-level parse.
 */
object Pdf {

  // ---- synthesis -------------------------------------------------------

  private def deflate(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 3 + 64)
    val buf = new Array[Byte](8192)
    while (!inf.finished() && !inf.needsInput()) out.write(buf, 0, inf.inflate(buf))
    inf.end()
    out.toByteArray
  }

  private def escapeString(s: String): Array[Byte] = {
    val bytes = s.getBytes(UTF_8)
    val out = new java.io.ByteArrayOutputStream(bytes.length + 16)
    bytes.foreach {
      case b @ ('(' | ')' | '\\') => out.write('\\'); out.write(b)
      case b => out.write(b)
    }
    out.toByteArray
  }

  /** One PDF, one page per element of `pages`; each page's text is split
    * on '\n' into `Td`-separated lines (so layout survives round-trip). */
  def synthesize(pages: Seq[String]): Array[Byte] = {
    val n = pages.length
    val out = new java.io.ByteArrayOutputStream(4096)
    val offsets = scala.collection.mutable.ArrayBuffer[Int]()
    def bytes(s: String): Array[Byte] = s.getBytes(UTF_8)
    def obj(body: Array[Byte]*): Unit = {
      offsets += out.size()
      body.foreach(out.write)
    }
    out.write(bytes("%PDF-1.4\n"))
    // 1: catalog, 2: pages, 3..3+n-1: page objs, 3+n..3+2n-1: contents, last: font
    val firstPage = 3
    val firstContent = 3 + n
    val fontObj = 3 + 2 * n
    obj(bytes(s"1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n"))
    val kids = (0 until n).map(i => s"${firstPage + i} 0 R").mkString(" ")
    obj(bytes(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n"))
    (0 until n).foreach { i =>
      obj(bytes(s"${firstPage + i} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/MediaBox [0 0 612 792] /Contents ${firstContent + i} 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> >> endobj\n"))
    }
    (0 until n).foreach { i =>
      val content = new java.io.ByteArrayOutputStream(256)
      content.write(bytes("BT /F1 12 Tf 72 720 Td "))
      val lines = pages(i).split("\n", -1)
      lines.zipWithIndex.foreach { case (line, j) =>
        if (j > 0) content.write(bytes("0 -14 Td "))
        content.write('(')
        content.write(escapeString(line))
        content.write(bytes(") Tj "))
      }
      content.write(bytes("ET"))
      val packed = deflate(content.toByteArray)
      obj(bytes(s"${firstContent + i} 0 obj << /Length ${packed.length} " +
        "/Filter /FlateDecode >> stream\n"),
        packed, bytes("\nendstream endobj\n"))
    }
    obj(bytes(s"$fontObj 0 obj << /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >> endobj\n"))
    val xrefPos = out.size()
    out.write(bytes(s"xref\n0 ${offsets.length + 1}\n0000000000 65535 f \n"))
    offsets.foreach(o => out.write(bytes(f"$o%010d 00000 n \n")))
    out.write(bytes(s"trailer << /Size ${offsets.length + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefPos\n%%EOF\n"))
    out.toByteArray
  }

  // ---- extraction ------------------------------------------------------

  /** Page texts in /Kids order; lines within a page joined with '\n'. */
  def extract(pdf: Array[Byte]): Seq[String] = {
    val objs = scanObjects(pdf)
    val pagesObj = objs.values.find(o => dictOf(o).contains("/Type /Pages"))
    val kidRefs: Option[Seq[Int]] = pagesObj.flatMap { body =>
      val d = dictOf(body)
      val ki = d.indexOf("/Kids")
      if (ki < 0) None
      else {
        val kids = d.substring(ki)
        val end = kids.indexOf(']')
        val scope = if (end >= 0) kids.substring(0, end + 1) else kids
        Some("(\\d+) 0 R".r.findAllMatchIn(scope).map(_.group(1).toInt).toSeq)
      }
    }
    val pageRefs: Seq[Int] = kidRefs.getOrElse {
      // degraded file: every /Type /Page object, in object order
      objs.toSeq.sortBy(_._1).collect {
        case (num, body) if dictOf(body).contains("/Type /Page") &&
          !dictOf(body).contains("/Type /Pages") => num
      }
    }
    pageRefs.flatMap { ref =>
      objs.get(ref).map { page =>
        val d = dictOf(page)
        val contents = "/Contents (\\d+) 0 R".r.findFirstMatchIn(d).map(_.group(1).toInt)
        contents.flatMap(objs.get) match {
          case Some(cobj) => textFromContent(streamBytes(cobj))
          case None       => ""
        }
      }
    }
  }

  /** objNum → raw object body bytes (between `N 0 obj` and `endobj`).
    * Sequential scanner, binary-safe: a stream payload may contain the
    * bytes `endobj`/`endstream`, so stream objects are skipped by their
    * /Length dict entry (falling back to an `endstream` scan only when
    * /Length is absent or out of range) — never by searching the payload. */
  private def scanObjects(pdf: Array[Byte]): Map[Int, Array[Byte]] = {
    // the ASCII skeleton is read through a latin-1 view (lossless)
    val s = new String(pdf, StandardCharsets_ISO)
    val n = s.length
    val objs = scala.collection.mutable.Map[Int, Array[Byte]]()
    val head = java.util.regex.Pattern.compile("(\\d+) 0 obj").matcher(s)
    var from = 0
    while (from < n && head.find(from)) {
      val num = head.group(1).toInt
      val bodyStart = head.end
      // does a stream keyword open before the next endobj would?
      val streamAt = s.indexOf("stream", bodyStart)
      val endobjAt = s.indexOf("endobj", bodyStart)
      val bodyEnd =
        if (streamAt >= 0 && (endobjAt < 0 || streamAt < endobjAt)) {
          // stream object: skip exactly /Length payload bytes
          val dict = s.substring(bodyStart, streamAt)
          var payloadStart = streamAt + "stream".length
          if (payloadStart < n && s.charAt(payloadStart) == '\r') payloadStart += 1
          if (payloadStart < n && s.charAt(payloadStart) == '\n') payloadStart += 1
          val len = "/Length (\\d+)".r.findFirstMatchIn(dict).map(_.group(1).toLong)
          val afterPayload = len match {
            case Some(l) if payloadStart + l <= n => payloadStart + l.toInt
            case _ => // degraded: no usable /Length — scan for endstream
              val e = s.indexOf("endstream", payloadStart)
              if (e >= 0) e else n
          }
          val e = s.indexOf("endobj", afterPayload)
          if (e >= 0) e else n
        } else if (endobjAt >= 0) endobjAt
        else n
      objs(num) = java.util.Arrays.copyOfRange(pdf, bodyStart, bodyEnd)
      from = math.min(n, bodyEnd + "endobj".length)
    }
    objs.toMap
  }

  private val StandardCharsets_ISO = java.nio.charset.StandardCharsets.ISO_8859_1

  /** The dictionary text of an object body (up to `stream` if present). */
  private def dictOf(body: Array[Byte]): String = {
    val s = new String(body, StandardCharsets_ISO)
    val i = s.indexOf("stream")
    if (i >= 0) s.substring(0, i) else s
  }

  /** Raw (decoded) stream payload of a stream object: exactly /Length
    * bytes after the `stream` keyword EOL (binary-safe — the payload may
    * contain `endstream`); endstream-scan only as the degraded path. */
  private def streamBytes(body: Array[Byte]): Array[Byte] = {
    val s = new String(body, StandardCharsets_ISO)
    val kw = s.indexOf("stream")
    if (kw < 0) return Array.emptyByteArray
    var start = kw + "stream".length
    if (start < body.length && body(start) == '\r') start += 1
    if (start < body.length && body(start) == '\n') start += 1
    val len = "/Length (\\d+)".r.findFirstMatchIn(s.substring(0, kw))
      .map(_.group(1).toLong)
    val stop = len match {
      case Some(l) if start + l <= body.length => start + l.toInt
      case _ =>
        val end = s.indexOf("endstream", start)
        var e = if (end > start) end else body.length
        // strip the EOL the writer put before `endstream`
        if (e > start && body(e - 1) == '\n') e -= 1
        if (e > start && body(e - 1) == '\r') e -= 1
        e
    }
    val raw = java.util.Arrays.copyOfRange(body, start, stop)
    if (dictOf(body).contains("/FlateDecode"))
      try inflate(raw) catch { case _: Exception => Array.emptyByteArray }
    else raw
  }

  /** Text from a content stream: strings emitted by Tj/TJ accumulate on
    * the current line; Td/TD/T* start a new line. */
  private def textFromContent(content: Array[Byte]): String = {
    val lines = scala.collection.mutable.ArrayBuffer[java.lang.StringBuilder]()
    var cur: java.lang.StringBuilder = null
    var pending: String = null // last parsed string, emitted on Tj
    val pendingArr = scala.collection.mutable.ArrayBuffer[String]() // for TJ
    var inArray = false
    def line(): java.lang.StringBuilder = {
      if (cur == null) { cur = new java.lang.StringBuilder; lines += cur }
      cur
    }
    var i = 0
    val n = content.length
    def parseString(): String = {
      // content(i) == '(' on entry
      val out = new java.io.ByteArrayOutputStream(64)
      var depth = 1
      i += 1
      while (i < n && depth > 0) {
        val b = content(i)
        if (b == '\\') {
          i += 1
          if (i < n) {
            content(i) match {
              case 'n' => out.write('\n'); i += 1
              case 'r' => out.write('\r'); i += 1
              case 't' => out.write('\t'); i += 1
              case 'b' => out.write('\b'); i += 1
              case 'f' => out.write('\f'); i += 1
              case '\n' => i += 1 // continuation
              case '\r' =>
                i += 1
                if (i < n && content(i) == '\n') i += 1
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = 0
                while (k < 3 && i < n && content(i) >= '0' && content(i) <= '7') {
                  v = v * 8 + (content(i) - '0'); i += 1; k += 1
                }
                out.write(v)
              case other => out.write(other); i += 1
            }
          }
        } else {
          if (b == '(') depth += 1
          else if (b == ')') depth -= 1
          if (depth > 0) out.write(b)
          i += 1
        }
      }
      new String(out.toByteArray, UTF_8)
    }
    def isDelim(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '(' ||
        b == ')' || b == '[' || b == ']' || b == '<' || b == '>' || b == '/'
    while (i < n) {
      val b = content(i)
      if (b == '(') {
        val s = parseString()
        if (inArray) pendingArr += s else pending = s
      } else if (b == '[') { inArray = true; pendingArr.clear(); i += 1 }
      else if (b == ']') { inArray = false; i += 1 }
      else if (!isDelim(b)) {
        val start = i
        while (i < n && !isDelim(content(i))) i += 1
        new String(content, start, i - start, StandardCharsets_ISO) match {
          case "Tj" => if (pending != null) { line().append(pending); pending = null }
          case "TJ" => pendingArr.foreach(line().append(_)); pendingArr.clear()
          case "Td" | "TD" | "T*" => cur = null // next string starts a new line
          case _ => // operands (numbers, names) and other operators
        }
      } else i += 1
    }
    lines.map(_.toString).mkString("\n")
  }
}
