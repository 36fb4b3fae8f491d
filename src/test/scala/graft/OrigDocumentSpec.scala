package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{Article, Breaks, Decode}

/** Transliterated from /root/reference/tests/test_orig_document.py. */
class OrigDocumentSpec extends AnyFunSuite {

  test("convert br tags to paragraphs (test_orig_document.py:23-28)") {
    val returned = Breaks.convertBreaksToParagraphs(
      "<div>HI<br><br>How are you?<br><br> \t \n  <br>Fine\n I guess</div>")
    assert(returned == "<div>HI</p><p>How are you?</p><p>Fine\n I guess</div>")
  }

  test("convert hr tags to paragraphs (test_orig_document.py:31-35)") {
    val returned = Breaks.convertBreaksToParagraphs(
      "<div>HI<br><br>How are you?<hr/> \t \n  <br>Fine\n I guess</div>")
    assert(returned == "<div>HI</p><p>How are you?</p><p>Fine\n I guess</div>")
  }

  test("break-rewrite scanner ≡ reference regex (property)") {
    val rnd = new scala.util.Random(7)
    val pieces = Array(
      "<br>", "<br/>", "<br >", "<BR>", "<Br/>", "< br>", "<\tbr>", "<hr>",
      "<hr/>", "<HR class=x>", "<br", "<b>", "<h1>", "text", " ", "\n",
      ">", "<", "<br attr='v'>", "<hr\n>", "x<bry>", "<brr>", "<h r>")
    (1 to 800).foreach { _ =>
      val s = (0 until rnd.nextInt(12)).map(_ => pieces(rnd.nextInt(pieces.length))).mkString
      assert(Breaks.convertBreaksToParagraphs(s) == Breaks.convertBreaksViaRegex(s),
        s"input=$s")
    }
  }

  test("read min document: title (test_orig_document.py:38-43)") {
    val a = Article.fromBytes(Fixtures.snippetBytes("document_min.html"))
    assert(a.title == "Min Document Title")
  }

  test("base url absolutizes links (test_orig_document.py:46-68)") {
    val a = Article.fromBytes(
      Fixtures.snippetBytes("document_absolute_url.html"),
      "http://blog.mitechie.com/test.html")
    val links = a.originalDom.findAll("a")
    assert(links.length == 3)
    val blog = links.count(_.attrs("href").startsWith("http://blog.mitechie.com"))
    assert(blog == 2)
    assert(links.length - blog == 1)
  }

  test("no br survives break conversion (test_orig_document.py:71-75)") {
    val a = Article.fromBytes(Fixtures.snippetBytes("document_min.html"))
    assert(a.originalDom.find("br") == null)
  }

  test("empty / tags-only / missing title (test_orig_document.py:78-98)") {
    assert(Article("<html><head><title></title></head><body></body></html>").title == "")
    assert(Article("<html><head><title><em></em></title></head><body></body></html>").title == "")
    assert(Article("<html><head></head><body></body></html>").title == "")
  }

  test("encoding: iso-8859-2 bytes decode to a string (test_orig_document.py:101-106)") {
    val text = "ľščťžýáíéäúňôůě".getBytes("iso-8859-2")
    val html = Decode.decodeHtml(text)
    assert(html != null && html.nonEmpty)
  }

  test("encoding fallback recovers Czech iso-8859-2 body without meta tag") {
    val czech = "Příliš žluťoučký kůň úpěl ďábelské ódy. " * 20
    val html = s"<html><body><p>$czech</p></body></html>"
    val decoded = Decode.decodeHtml(html.getBytes("iso-8859-2"))
    assert(decoded.contains("žluťoučký"), decoded.take(120))
  }

  test("encoding fallback recovers Russian windows-1251 body without meta tag") {
    val ru = "Съешь же ещё этих мягких французских булок да выпей чаю. " * 20
    val html = s"<html><body><p>$ru</p></body></html>"
    val decoded = Decode.decodeHtml(html.getBytes("windows-1251"))
    assert(decoded.contains("французских"), decoded.take(120))
  }

  test("encoding fallback recovers CJK bodies without meta tag " +
    "(shift_jis / gbk / big5 / euc-kr)") {
    def roundTrip(text: String, cs: String, needle: String): Unit = {
      val html = s"<html><body><p>${text * 5}</p></body></html>"
      val decoded = Decode.decodeHtml(html.getBytes(java.nio.charset.Charset.forName(cs)))
      assert(decoded.contains(needle), s"$cs: ${decoded.take(120)}")
    }
    roundTrip("これは日本語のテキストです。記事の本文はここにあります。", "shift_jis", "日本語")
    roundTrip("これは日本語のテキストです。記事の本文はここにあります。", "euc-jp", "日本語")
    roundTrip("这是一篇用于测试网页字符编码检测的中文文章内容。", "gbk", "中文")
    roundTrip("這是一篇用於測試網頁字元編碼檢測的中文文章內容。", "big5", "中文")
    roundTrip("이것은 문자 인코딩 감지를 테스트하기 위한 한국어 기사 본문입니다. ", "euc-kr", "한국어")
  }

  test("encoding: short utf-8 round trip (test_orig_document.py:108-113)") {
    val text = "ľščťžýáíé".getBytes("utf-8")
    assert(Decode.decodeHtml(text) == "ľščťžýáíé")
  }
}
