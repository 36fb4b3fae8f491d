package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Article

/** Transliterated from /root/reference/tests/test_articles (per-article test_article.py). */
class ArticlesSpec extends AnyFunSuite {

  test("antipope_org: parses, comments/beta removed") {
    val doc = Article.fromBytes(Fixtures.articleBytes("corpus_antipope_org.html"))
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    assert(!readable.contains("class=\"comments\""))
    assert(!readable.contains("id=\"beta\""))
  }

  test("businessinsider-com (no url): images preserved") {
    val doc = Article.fromBytes(Fixtures.articleBytes("corpus_businessinsider-com.html"))
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    assert(readable.contains("bharath-kumar-a-co-founder-at-pugmarksme-suggests-working-on-a-sunday-late-night.jpg"))
    assert(readable.contains("bryan-guido-hassin-a-university-professor-and-startup-junkie-uses-airplane-days.jpg"))
  }

  test("businessinsider_com (with url): images preserved") {
    val doc = Article.fromBytes(
      Fixtures.articleBytes("corpus_businessinsider_com.html"),
      "http://www.businessinsider.com/tech-ceos-favorite-productivity-hacks-2013-8")
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    assert(readable.contains("bharath-kumar-a-co-founder-at-pugmarksme-suggests-working-on-a-sunday-late-night.jpg"))
    assert(readable.contains("bryan-guido-hassin-a-university-professor-and-startup-junkie-uses-airplane-days.jpg"))
  }

  test("cz_zdrojak_tests: kept and dropped sentences") {
    val doc = Article.fromBytes(
      Fixtures.articleBytes("corpus_cz_zdrojak_tests.html"),
      "http://www.zdrojak.cz/clanky/jeste-k-testovani/")
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    // NOTE: the article (and the reference's assertion) uses NBSP after
    // one-letter prepositions — "S automatizovaným", "v několika".
    assert(readable.contains("S automatizovaným testováním kódu (a ve zbytku článku budu mít na mysli právě to) jsem se setkal v několika firmách."))
    assert(readable.contains("Ke čtení naleznete mnoho různých materiálů, od teoretických po praktické ukázky."))
    assert(!readable.contains("Pokud vás problematika zajímá, využijte možnosti navštívit školení"))
  }

  test("scripting_com: content kept, junk dropped") {
    val doc = Article.fromBytes(Fixtures.articleBytes("corpus_scripting_com.html"))
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    assert(readable.contains("Amazon and Google"))
    assert(!readable.contains("Linkblog updated"))
    assert(!readable.contains("#anExampleGoogleDoesntIntendToShareBlogAndItWill"))
  }

  test("sweetshark: content after video kept") {
    val doc = Article.fromBytes(
      Fixtures.articleBytes("corpus_sweetshark.html"),
      "http://sweetshark.livejournal.com/11564.html")
    val readable = doc.readable
    assert(readable.contains("id=\"readabilityBody\""))
    assert(readable.contains("Stay hungry, Stay foolish"))
  }
}
