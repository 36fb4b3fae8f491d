package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Pdf
import java.nio.charset.StandardCharsets.UTF_8

/** PDF synthesis + text extraction (the PDF/layout-parse leg). */
class PdfSpec extends AnyFunSuite {

  test("round-trip: multi-page, multi-line, parens/backslash escapes, unicode") {
    val pages = Seq(
      "hello world\nsecond line\nthird line",
      "page two with (parens) and \\backslash\\ and a)stray",
      "čeština — příliš žluťoučký kůň\n中文文本也可以",
      "", // empty page
      "trailing\n\nblank line kept")
    val out = Pdf.extract(Pdf.synthesize(pages))
    assert(out == pages, out.mkString("<<<", "|||", ">>>"))
  }

  test("synthesized file is structurally a PDF: header, xref, flate streams") {
    val pdf = Pdf.synthesize(Seq("abc"))
    val s = new String(pdf, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.contains("/Type /Catalog") && s.contains("/Type /Pages"))
    assert(s.contains("/Filter /FlateDecode"))
    assert(s.contains("xref") && s.contains("startxref") && s.endsWith("%%EOF\n"))
    // xref offsets are real: every entry points at "N 0 obj"
    val xref = s.substring(s.indexOf("xref"))
    val offsets = "(\\d{10}) 00000 n".r.findAllMatchIn(xref).map(_.group(1).toInt).toSeq
    offsets.foreach(o => assert(s.startsWith(s"${s.substring(o).takeWhile(_.isDigit)} 0 obj", o)))
  }

  test("handcrafted uncompressed stream: TJ arrays, octal escapes, T*") {
    val content = "BT (A\\101) Tj T* [(B) (C)] TJ 0 -14 Td (\\050x\\051) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>\n%%EOF\n").getBytes(UTF_8)
    // \101 = 'A' octal; \050/\051 = parens
    assert(Pdf.extract(pdf) == Seq("AA\nBC\n(x)"))
  }

  test("kids order wins over object order") {
    val c1 = "BT (first) Tj ET"
    val c2 = "BT (second) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [5 0 R 3 0 R] /Count 2 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${c1.length} >> stream\n$c1\nendstream endobj\n" +
      "5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n" +
      s"6 0 obj << /Length ${c2.length} >> stream\n$c2\nendstream endobj\n" +
      "trailer << /Size 7 /Root 1 0 R >>\n%%EOF\n").getBytes(UTF_8)
    assert(Pdf.extract(pdf) == Seq("second", "first"))
  }

  test("stream payloads containing 'endobj'/'endstream' bytes do not " +
    "truncate object scanning (/Length is authoritative)") {
    val content = "BT (endobj endstream inside a string) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "5 0 obj << /Type /Font >> endobj\n" + // object AFTER the tricky stream
      "trailer << /Size 6 /Root 1 0 R >>\n%%EOF\n").getBytes(UTF_8)
    assert(Pdf.extract(pdf) == Seq("endobj endstream inside a string"))
  }

  test("garbage and truncated inputs do not throw") {
    assert(Pdf.extract("not a pdf at all".getBytes(UTF_8)).isEmpty)
    assert(Pdf.extract(Array.emptyByteArray).isEmpty)
    val truncated = Pdf.synthesize(Seq("some text")).take(80)
    Pdf.extract(truncated) // must not throw
  }
}
