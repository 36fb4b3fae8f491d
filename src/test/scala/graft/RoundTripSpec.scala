package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{Parser, Serializer}
import graft.extract.{Article, Extractor, TextCache}

/** Cross-checks between independent implementations of the same
  * semantics — the cheapest way to catch drift in either. */
class RoundTripSpec extends AnyFunSuite {

  private val docs = Seq(
    "document_min.html", "annotated_1.html", "document_scripts.html",
    "h1_and_2_paragraphs.html", "test_readable_unlikely.html").map(Fixtures.snippet) ++
    Seq("zdrojak_automaticke_zabezpeceni.html", "ars.001.html").map(Fixtures.article)

  test("serialize∘parse reaches a fixpoint after one round") {
    docs.foreach { html =>
      val once = Serializer.toUnicode(Parser.parseDocument(html))
      val twice = Serializer.toUnicode(Parser.parseDocument(once))
      assert(once == twice, once.take(200))
    }
  }

  test("re-parsing our serialization preserves the extracted main text") {
    docs.foreach { html =>
      val a1 = Article(html)
      val a2 = Article(Serializer.toUnicode(a1.originalDom))
      assert(Extractor.flatten(a1.mainText) == Extractor.flatten(a2.mainText))
    }
  }

  test("TextCache.textContent ≡ Node.textContent on every node") {
    docs.foreach { html =>
      val dom = Parser.parseDocument(html)
      val cache = new TextCache
      dom.iterAll.foreach { n =>
        assert(cache.textContent(n) == n.textContent)
      }
    }
  }

  test("libxml2 EOL handling: CRLF and lone CR reach the DOM as LF " +
    "(xmlCurrentChar, XML §2.11 — shared by the HTML parser)") {
    val dom = Parser.parseDocument(
      "<html><body><p title=\"a\r\nb\rc\">line1\r\nline2\rline3</p></body></html>")
    val p = dom.find("p")
    assert(p.text == "line1\nline2\nline3")
    assert(p.attrs("title") == "a\nb\nc")
    // no CR anywhere in the tree
    dom.iterAll.foreach { n =>
      assert(n.text == null || !n.text.contains('\r'))
      assert(n.tail == null || !n.tail.contains('\r'))
    }
  }

  test("attribute serialization: control whitespace as character refs " +
    "(xmlBufAttrSerializeTxtContent); text nodes only escape & < >") {
    val dom = Parser.parseDocument(
      "<html><body><p title=\"a\r\nb\tc&amp;d\">x &amp; y</p></body></html>")
    val out = Serializer.toUnicode(dom.find("p"))
    assert(out == "<p title=\"a&#10;b&#9;c&amp;d\">x &amp; y</p>", out)
    // programmatic \r (cannot come from parsing) serializes as &#13;
    val node = Parser.parseDocument("<html><body><p t=\"x\">.</p></body></html>").find("p")
    node.set("t", "a\rb")
    assert(Serializer.toUnicode(node) == "<p t=\"a&#13;b\">.</p>")
  }
}
