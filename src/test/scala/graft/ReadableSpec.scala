package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.{Parser, Serializer}
import graft.extract.{Article, Readable}

/** Transliterated from /root/reference/tests/test_readable.py. */
class ReadableSpec extends AnyFunSuite {

  test("load doc → div#readabilityBody (test_readable.py:19-53)") {
    val doc = Article.fromBytes(Fixtures.snippetBytes("document_min.html"))
    assert(doc.readableDom.tag == "div")
    assert(doc.readableDom.attrs("id") == "readabilityBody")
    assert(doc.title == "Min Document Title")
  }

  test("no scripts / styles / links survive (test_readable.py:34-41)") {
    val doc = Article.fromBytes(Fixtures.snippetBytes("document_scripts.html"))
    val readable = doc.readableDom
    assert(readable.findAll("script").isEmpty)
    assert(readable.findAll("style").isEmpty)
    assert(readable.findAll("link").isEmpty)
  }

  test("body synthesized when missing (test_readable.py:56-77)") {
    val d1 = Article.fromBytes(Fixtures.snippetBytes("document_no_body.html"))
    assert(d1.readableDom.tag == "div" && d1.readableDom.attrs("id") == "readabilityBody")
    val d2 = Article.fromBytes(Fixtures.snippetBytes("document_only_content.html"))
    assert(d2.readableDom.tag == "div" && d2.readableDom.attrs("id") == "readabilityBody")
  }

  test("no content → parsing-error div (test_readable.py:80-86)") {
    val doc = Article("")
    assert(doc.readableDom.tag == "div")
    assert(doc.readableDom.attrs("id") == "readabilityBody")
    assert(doc.readableDom.attrs("class") == "parsing-error")
  }

  test("return_fragment=false wraps the div in the NULL_DOCUMENT shell " +
    "(readable.py:42-50,101-110,356-366)") {
    val frag = Article.fromBytes(Fixtures.snippetBytes("document_min.html"))
    val full = Article.fromBytes(Fixtures.snippetBytes("document_min.html"),
      returnFragment = false)
    // readable_dom is the div in BOTH modes (readable.py:437 re-selects it)
    assert(full.readableDom.tag == "div")
    assert(full.readableDom.attrs("id") == "readabilityBody")
    // ...but in full mode its ancestry is the NULL_DOCUMENT shell
    assert(full.readableDom.parent.tag == "body")
    assert(full.readableDom.parent.parent.tag == "html")
    val head = full.readableDom.root.find("head")
    assert(head != null && head.find("meta") != null)
    assert(head.find("meta").attrs("http-equiv") == "Content-Type")
    // `readable` serializes the div subtree in both modes (lxml tounicode
    // semantics) — byte-identical output
    assert(full.readable == frag.readable)
    // fullHtml serializes the shell
    assert(full.fullHtml.contains("<html>"))
    assert(full.fullHtml.contains("text/html;charset=UTF-8"))
    assert(full.fullHtml.contains("readabilityBody"))
    assert(!frag.fullHtml.contains("charset=UTF-8")) // no shell in fragment mode
    // main_text unaffected by the wrapper
    assert(full.mainText == frag.mainText)
  }

  test("error documents are ALWAYS fragments — readable.py:458 passes the " +
    "flag as the unused dom positional (reference quirk)") {
    val doc = Article("", returnFragment = false)
    assert(doc.readableDom.attrs("class") == "parsing-error")
    assert(doc.readableDom.parent == null) // not wrapped, despite the flag
  }

  test("unlikely candidates are wiped (test_readable.py:92-123)") {
    val doc = Article.fromBytes(Fixtures.snippetBytes("test_readable_unlikely.html"))
    val readable = doc.readable
    val mustNotAppear = List(
      "comment", "disqus", "foot", "header", "menu",
      "rss", "shoutbox", "sidebar", "sponsor", "ad-break", "agegate",
      "pager", "popup", "tweet", "twitter", "imgBlogpostPermalink")
    val wantToAppear = Set("and", "article", "body", "column", "main", "shadow")
    // every remaining class/id token that contains an unlikely keyword must
    // co-occur with a maybe-keyword token (the reference's loop, simplified)
    val classRe = """(?:class|id)="([^"]*)"""".r
    classRe.findAllMatchIn(readable).foreach { m =>
      val tokens = m.group(1).split("\\s+").toList
      mustNotAppear.foreach { bad =>
        if (tokens.exists(_.contains(bad))) {
          assert(tokens.exists(t => wantToAppear.exists(t.contains)),
            s"unlikely token '$bad' survived without maybe-override in '${m.group(1)}'")
        }
      }
    }
    // NOTE: the reference's own rules drop "Final content." too (<25 chars,
    // clean_conditionally readable.py:271-273); its test only asserts the
    // unlikely-class/id removals above.
  }

  test("leaf div → p exact serialization (test_readable.py:126-156)") {
    val d1 = Parser.parseDocument("<html><body><div>simple</div></body></html>")
    assert(Serializer.toUnicode(Readable.leafDivElementsIntoParagraphs(d1)) ==
      "<html><body><p>simple</p></body></html>")

    val d2 = Parser.parseDocument("""<html><body><div>simple<a href="">link</a></div></body></html>""")
    assert(Serializer.toUnicode(Readable.leafDivElementsIntoParagraphs(d2)) ==
      """<html><body><p>simple<a href="">link</a></p></body></html>""")

    val d3 = Parser.parseDocument("<html><body><div>text<div>child</div>aftertext</div></body></html>")
    assert(Serializer.toUnicode(Readable.leafDivElementsIntoParagraphs(d3)) ==
      "<html><body><div>text<p>child</p>aftertext</div></body></html>")
  }

  test("bad links (test_readable.py:159-169)") {
    val badLinks = List(
      """<a name="amazonAndGoogleHaveMadeAnAudaciousGrabOfNamespaceOnTheInternetAsFarAsICanSeeTheresBeenNoMentionOfThisInTheTechPress">&nbsp;</a>""",
      """<a href="#amazonAndGoogleHaveMadeAnAudaciousGrabOfNamespaceOnTheInternetAsFarAsICanSeeTheresBeenNoMentionOfThisInTheTechPress"><img src="http://scripting.com/images/2001/09/20/sharpPermaLink3.gif" class="imgBlogpostPermalink" width="6" height="9" border="0" alt="permalink"></a>""",
      """<a href="http://scripting.com/stories/2012/06/15/theTechPressIsOutToLunch.html#anExampleGoogleDoesntIntendToShareBlogAndItWillOnlyBeUsedToPointToBloggerSitesIfYouHaveATumblrOrWordpressBlogYouCantHaveABlogDomainHereIsTheAHrefhttpgtldresulticannorgapplicationresultapplicationstatusapplicationdetails527publicListingaOfGooglesAHrefhttpdropboxscriptingcomdavemiscgoogleblogapplicationhtmlapplicationa"><img src="http://scripting.com/images/2001/09/20/sharpPermaLink3.gif" class="imgBlogpostPermalink" width="6" height="9" border="0" alt="permalink"></a>""")
    badLinks.foreach { l =>
      assert(Readable.isBadLink(Parser.parseFragment(l)), l.take(60))
    }
  }

  test("main_text: empty doc (test_readable.py:308-312)") {
    assert(Article("").mainText == Nil)
  }

  test("main_text: no annotations (test_readable.py:315-319)") {
    val at = Article("<div><p>This is text with no annotations</p></div>").mainText
    assert(at == List(List(
      graft.extract.AnnotatedText.Chunk("This is text with no annotations", null))))
  }

  test("main_text: one annotation (test_readable.py:322-330)") {
    val at = Article("<div><p>This is text\r\twith <del>no</del> annotations</p></div>").mainText
    assert(at == List(List(
      graft.extract.AnnotatedText.Chunk("This is text\nwith", null),
      graft.extract.AnnotatedText.Chunk("no", List("del")),
      graft.extract.AnnotatedText.Chunk("annotations", null))))
  }

  test("main_text: annotated_1 snippet (test_readable.py:333-352)") {
    val at = Article.fromBytes(Fixtures.snippetBytes("annotated_1.html")).mainText
    import graft.extract.AnnotatedText.Chunk
    assert(at == List(
      List(
        Chunk("Paragraph is more", null),
        Chunk("better", List("em")),
        Chunk(".\nThis text is very", null),
        Chunk("pretty", List("strong")),
        Chunk("'cause she's girl.", null)),
      List(
        Chunk("This is not", null),
        Chunk("crap", List("big")),
        Chunk("so", null),
        Chunk("readability", List("dfn")),
        Chunk("me :)", null))))
  }
}
