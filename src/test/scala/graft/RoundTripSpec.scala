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

  // ---- E17 serializer divergence inventory (VERDICT r3 item 6) --------
  // lxml's serializer is libxml2 C (HTMLtree.c); it cannot run offline, so
  // each divergence CLASS vs its documented rules is pinned here: classes
  // 1–3 are conformant by construction, classes 4–6 are known divergences
  // whose constructs are then shown NOT to occur in any article's readable
  // output (last test). Inventory with libxml2 cites lives in BENCH.md §4.

  test("E17 class 1: script/style serialize as raw text, no entity escaping " +
    "(libxml2 htmlNodeDumpOutputInternal raw-text path)") {
    val dom = Parser.parseDocument(
      "<html><head><script>if (a < b && c > 0) { x(\"q\"); }</script>" +
        "<style>p > a { color: red; }</style></head><body><p>t</p></body></html>")
    val script = Serializer.toUnicode(dom.find("script"))
    assert(script == "<script>if (a < b && c > 0) { x(\"q\"); }</script>", script)
    val style = Serializer.toUnicode(dom.find("style"))
    assert(style == "<style>p > a { color: red; }</style>", style)
  }

  test("E17 class 2: named-entity policy — text escapes exactly {& < >} " +
    "as named refs; quotes and non-ASCII stay raw (unicode output)") {
    val node = Parser.parseDocument(
      "<html><body><p>a &amp; b &lt; c &gt; d \"q\" 'r'  č</p></body></html>")
      .find("p")
    assert(Serializer.toUnicode(node) ==
      "<p>a &amp; b &lt; c &gt; d \"q\" 'r'  č</p>")
  }

  test("E17 class 3: void elements get no end tag, per libxml2's HTML4 " +
    "empty set — embed/source/wbr are NOT void to libxml2") {
    val dom = Parser.parseDocument(
      "<html><body><p>a<br>b<img src=\"x\">c</p></body></html>")
    assert(Serializer.toUnicode(dom.find("p")) ==
      "<p>a<br>b<img src=\"x\">c</p>")
    // embed is a container element in libxml2 (htmlElemDesc), unlike HTML5
    val e = Parser.parseDocument("<html><body><embed src=\"v\"></embed></body></html>")
    assert(Serializer.toUnicode(e.find("embed")).endsWith("</embed>"))
  }

  test("E17 class 4 (KNOWN divergence, pinned): boolean attributes are " +
    "written name=\"\", where libxml2 htmlIsBooleanAttr minimizes to bare name") {
    val node = Parser.parseDocument(
      "<html><body><option selected>x</option></body></html>").find("option")
    // OUR rule (stable, pinned): always name="value" form
    assert(Serializer.toUnicode(node) == "<option selected=\"\">x</option>")
  }

  test("E17 class 5 (closed r4): xmlBufWriteQuotedString quote selection — " +
    "a value with a double quote (no single) is single-quoted raw; both " +
    "kinds → double-quoted with &quot;; else double-quoted") {
    val node = Parser.parseDocument(
      "<html><body><p t=\"x\">.</p></body></html>").find("p")
    node.set("t", "say \"hi\"")
    assert(Serializer.toUnicode(node) == "<p t='say \"hi\"'>.</p>")
    node.set("t", "it's \"both\"")
    assert(Serializer.toUnicode(node) == "<p t=\"it's &quot;both&quot;\">.</p>")
    node.set("t", "it's single-only")
    assert(Serializer.toUnicode(node) == "<p t=\"it's single-only\">.</p>")
    // this construct occurs in the real corpus (businessinsider alt text),
    // and the single-quoted form must survive a round trip
    val rt = Parser.parseDocument(
      "<html><body><p t='say \"hi\"'>.</p></body></html>").find("p")
    assert(rt.attrs("t") == "say \"hi\"")
    assert(Serializer.toUnicode(rt) == "<p t='say \"hi\"'>.</p>")
  }

  test("E17 class 6: no doctype anywhere in readable output — fragment " +
    "mode wraps a div, full mode uses NULL_DOCUMENT which has no doctype " +
    "(readable.py:42-50)") {
    val html = Fixtures.snippet("document_min.html")
    val frag = Article(html)
    assert(frag.readable.startsWith("<div id=\"readabilityBody\""))
    val full = Article(html, returnFragment = false)
    assert(full.fullHtml.startsWith("<html"))
    assert(!full.fullHtml.toLowerCase.contains("<!doctype"))
  }

  test("E17: the remaining divergence class (4, boolean attrs) cannot " +
    "fire on any article's readable output, and no script/style survive " +
    "cleaning; class-5 constructs (double quotes in attrs) DO occur and " +
    "are now serialized by the libxml2 rule") {
    // libxml2's htmlIsBooleanAttr list (HTMLtree.c)
    val booleanAttrs = Set("checked", "compact", "declare", "defer",
      "disabled", "ismap", "multiple", "nohref", "noresize", "noshade",
      "nowrap", "readonly", "selected")
    var sawClass5Construct = false
    graft.job.FixtureGen.Articles.foreach { name =>
      val a = Article(Fixtures.article(name))
      a.readableDom.iterAll.foreach { n =>
        assert(!Set("script", "style").contains(n.tag), s"$name: <${n.tag}> survived")
        n.attrs.foreach { case (k, v) =>
          assert(!booleanAttrs.contains(k.toLowerCase),
            s"$name: boolean attr $k on <${n.tag}> — divergence class 4 reachable")
          if (v.contains('"')) sawClass5Construct = true
        }
      }
    }
    // the corpus genuinely exercises the quote-selection rule
    assert(sawClass5Construct,
      "expected at least one double-quote-bearing attr value in the corpus")
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
