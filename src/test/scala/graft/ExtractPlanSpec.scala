package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.Extractor
import graft.job.FixtureGen
import graft.plans.GraftExtract

/** Plan-level extraction operator: logical node + injected strategy +
  * physical exec must produce exactly what the Dataset.map path does. */
class ExtractPlanSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  test("GraftExtract plans through ExtractStrategy and shows in explain") {
    import spark.implicits._
    val pages = spark.createDataset(FixtureGen.fixtureRows("src/test/resources/fixtures")).toDF()
    val out = GraftExtract(pages)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("GraftExtract"), plan.take(1500))
    assert(out.count() == 14)
  }

  test("plan-level operator output == Dataset.map output, byte for byte") {
    import spark.implicits._
    val rows = FixtureGen.fixtureRows("src/test/resources/fixtures")
    val pages = spark.createDataset(rows).toDF()
    val viaPlan = GraftExtract(pages)
      .select($"url", $"extracted_text", $"status", $"title")
      .as[(String, String, String, String)].collect().sortBy(_._1)
    val viaMap = spark.createDataset(rows).map(Extractor.extract)
      .select($"url", $"extracted_text", $"status", $"title")
      .as[(String, String, String, String)].collect().sortBy(_._1)
    assert(viaPlan.toSeq == viaMap.toSeq)
  }

  test("filters/pruning still reach the scan below the operator") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pages_plan").toString + "/pages"
    val rows = FixtureGen.fixtureRows("src/test/resources/fixtures")
    spark.createDataset(rows).toDF().write.parquet(dir)
    val pages = spark.read.parquet(dir).where($"url".startsWith("fixture://articles/"))
    val out = GraftExtract(pages)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(url), StringStartsWith(url,fixture://articles/)"),
      plan.take(3000))
    assert(out.count() == 6)
  }
}
