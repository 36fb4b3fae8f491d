package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extract.{Extractor, Page}
import graft.job.FixtureGen

/** End-to-end Spark extraction: fixture corpus through the typed-map
  * pipeline, plus the determinism property the north rule requires
  * (same input ⇒ same bytes at any parallelism). */
class SparkExtractSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private lazy val fixturePages: Seq[Page] =
    FixtureGen.fixtureRows("src/test/resources/fixtures")

  test("full corpus extracts via Dataset.map with ok/error statuses") {
    import spark.implicits._
    val out = spark.createDataset(fixturePages).map(Extractor.extract).collect()
    assert(out.length == 14)
    assert(out.forall(_.status == "ok"))
    val byUrl = out.map(e => e.url -> e).toMap
    val zdrojak = byUrl("fixture://articles/corpus_cz_zdrojak_tests.html")
    assert(zdrojak.readable_html.contains("id=\"readabilityBody\""))
    assert(zdrojak.title == "Ještě k testování | Zdroják")
    val antipope = byUrl("fixture://articles/corpus_antipope_org.html")
    assert(!antipope.readable_html.contains("class=\"comments\""))
  }

  test("determinism: identical bytes at 1, 3 and 13 partitions") {
    import spark.implicits._
    def run(parts: Int): Map[String, String] =
      spark.createDataset(fixturePages).repartition(parts)
        .map(Extractor.extract)
        .select($"url", $"extracted_text")
        .as[(String, String)].collect().toMap
    val r1 = run(1)
    val r3 = run(3)
    val r13 = run(13)
    assert(r1 == r3)
    assert(r1 == r13)
  }

  test("empty html row → parsing-error status, not an exception") {
    import spark.implicits._
    val rows = Seq(
      Page("x://empty", new java.sql.Timestamp(0), Array.emptyByteArray, "", ""),
      Page("x://null", new java.sql.Timestamp(0), null, "", ""))
    val out = spark.createDataset(rows).map(Extractor.extract).collect()
    assert(out.forall(_.status == "parsing-error"))
    assert(out.forall(_.extracted_text == ""))
  }

  test("oversize html row → oversize status") {
    import spark.implicits._
    val big = new Array[Byte](Extractor.MaxHtmlBytes + 1)
    java.util.Arrays.fill(big, 'a'.toByte)
    val out = spark.createDataset(Seq(Page("x://big", new java.sql.Timestamp(0), big, "", "")))
      .map(Extractor.extract).collect()
    assert(out.head.status == "oversize")
  }
}
