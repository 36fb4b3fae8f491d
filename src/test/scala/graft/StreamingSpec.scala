package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.job.{FixtureGen, PageTableIO}
import graft.streaming.ExtractStream

/** Structured Streaming e2e: file-source micro-batch extraction with
  * checkpointed exactly-once output. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  test("AvailableNow stream extracts the fixture corpus exactly once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("stream").toString
    val pagesDir = s"$base/pages"
    val rows = FixtureGen.fixtureRows("src/test/resources/fixtures")
    // plain (unpartitioned) parquet input for the file source
    spark.createDataset(rows).toDF().write.parquet(pagesDir)

    val q = ExtractStream.extractQuery(spark, pagesDir, s"$base/out", s"$base/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 14)
    assert(out.where($"status" === "ok").count() == 14)

    // restart with same checkpoint: no new data → no duplicates
    val q2 = ExtractStream.extractQuery(spark, pagesDir, s"$base/out", s"$base/ckpt")
    q2.awaitTermination(60000)
    assert(spark.read.parquet(s"$base/out").count() == 14)
  }

  test("watermarked window metrics aggregate per hour") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("streamw").toString
    val pagesDir = s"$base/pages"
    val rows = FixtureGen.fixtureRows("src/test/resources/fixtures")
    spark.createDataset(rows).toDF().write.parquet(pagesDir)

    val q = ExtractStream.metricsQuery(spark, pagesDir, s"$base/out", s"$base/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/out")
    // append mode emits only windows sealed by the watermark — with rows
    // spread across 14 distinct hours, at least the earliest are sealed
    assert(out.count() >= 1)
    assert(out.select("docs").as[Long].collect().forall(_ >= 1L))
  }
}
