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
}
