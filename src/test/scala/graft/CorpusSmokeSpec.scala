package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Article

/** Breadth smoke over every HTML document shipped with the reference:
  * all must parse, produce a readabilityBody div and (for real articles)
  * non-trivial main text. */
class CorpusSmokeSpec extends AnyFunSuite {

  private val articles = Seq(
    "ars.001.html", "automation_blog.html", "django-tutorial.001.html",
    "mitchie-blog.001.html", "python.org-wiki.performancetips.html",
    "zdrojak_automaticke_zabezpeceni.html",
    "corpus_antipope_org.html", "corpus_businessinsider-com.html",
    "corpus_businessinsider_com.html", "corpus_cz_zdrojak_tests.html",
    "corpus_scripting_com.html", "corpus_sweetshark.html")

  articles.foreach { name =>
    test(s"$name extracts non-trivially") {
      val doc = Article.fromBytes(Fixtures.articleBytes(name))
      val readable = doc.readable
      assert(readable.contains("id=\"readabilityBody\""))
      assert(!doc.isParseError)
      val text = graft.extract.Extractor.flatten(doc.mainText)
      assert(text.length > 200, s"suspiciously short main text (${text.length}): ${text.take(120)}")
    }
  }

  test("driver contract: SparkEntry.entry returns > 0 rows with ok " +
    "status over the sf0.001 pages (the driver's smoke check)") {
    assume(new java.io.File("/root/testdata/sf0.001").isDirectory)
    val out = SparkEntry.entry(SparkSessionFixture.spark)
    val rows = out.collect()
    assert(rows.length > 0)
    assert(rows.exists(_.getAs[String]("status") == "ok"))
    assert(out.columns.toSeq ==
      Seq("url", "status", "title", "text_len"))
  }
}
