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

  test("streaming exact dedup keeps one row per content fingerprint " +
    "(watermark-bounded state)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("streamd").toString
    val pagesDir = s"$base/pages"
    // 12 rows, 4 distinct texts (each duplicated 3x across urls/hours)
    val rows = (0 until 12).map { i =>
      graft.extract.Page(s"https://h${i % 3}.example.org/p/$i",
        new java.sql.Timestamp(1767225600000L + i * 3600000L),
        Array.emptyByteArray, s"content variant ${i % 4}", "en")
    }
    spark.createDataset(rows).toDF().write.parquet(pagesDir)

    val q = graft.streaming.StatefulOps.dedupQuery(
      spark, pagesDir, s"$base/out", s"$base/ckpt")
    q.awaitTermination(120000)
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() == 4)
    assert(out.select("fp").distinct().count() == 4)
  }

  test("per-host crawl stats via mapGroupsWithState (custom state)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("streams").toString
    val pagesDir = s"$base/pages"
    val rows = (0 until 10).map { i =>
      graft.extract.Page(s"https://h${i % 2}.example.org/p/$i",
        new java.sql.Timestamp(1767225600000L + i * 60000L),
        Array.fill(100 + i)(0x41.toByte), s"t$i", "en")
    }
    spark.createDataset(rows).toDF().write.parquet(pagesDir)

    val q = graft.streaming.StatefulOps.hostStatsQuery(
      spark, pagesDir, "host_stats_test", s"$base/ckpt")
    q.awaitTermination(120000)
    // update-mode memory sink: last row per host is the final state
    val stats = spark.sql(
      """SELECT host, max(docs) AS docs, max(bytes) AS bytes
        |FROM host_stats_test GROUP BY host""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("h0.example.org")._1 == 5)
    assert(stats("h1.example.org")._1 == 5)
    // bytes: h0 gets pages 0,2,4,6,8 → sizes 100,102,104,106,108 = 520
    assert(stats("h0.example.org")._2 == 520)
    assert(stats("h1.example.org")._2 == 525)
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
