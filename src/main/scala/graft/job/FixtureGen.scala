package graft.job

import org.apache.spark.sql.SparkSession
import graft.extract.Page
import java.nio.file.{Files, Paths}
import java.sql.Timestamp

/**
 * Deterministic (seed=42, no wall clock) pages-table synthesis from the
 * fixture corpus (FIXTURES.md §2-3) — the sandbox stand-in for a
 * Common-Crawl Iceberg table. Two outputs:
 *
 *   fixtures: one row per fixture html (14 rows)
 *   bench:    the 6 articles replicated K× with urls fixture://<name>/<i>,
 *             warc_ts striped across 30 days, plus a 1% skew tail whose
 *             html is repeated ×20 (giant-row salting exercise)
 *
 * Usage: FixtureGen <fixturesHtmlDir> <outDir> [replication K]
 */
object FixtureGen {

  val Articles = Seq(
    "corpus_antipope_org.html", "corpus_businessinsider-com.html",
    "corpus_businessinsider_com.html", "corpus_cz_zdrojak_tests.html",
    "corpus_scripting_com.html", "corpus_sweetshark.html")

  val Snippets = Seq(
    "annotated_1.html", "document_absolute_url.html", "document_min.html",
    "document_no_body.html", "document_only_content.html",
    "document_scripts.html", "h1_and_2_paragraphs.html",
    "test_readable_unlikely.html")

  val Epoch: Long = 1767225600000L // 2026-01-01T00:00:00Z — fixed, not wall clock

  def main(args: Array[String]): Unit = {
    val resourceDir = args(0)
    val outDir = args(1)
    val k = if (args.length > 2) args(2).toInt else 2000

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-fixturegen")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    writeFixtures(spark, resourceDir, s"$outDir/pages_fixtures")
    writeBench(spark, resourceDir, s"$outDir/pages_bench", k)
    spark.stop()
  }

  private def load(dir: String, sub: String, name: String): Array[Byte] =
    Files.readAllBytes(Paths.get(dir, sub, name))

  def fixtureRows(resourceDir: String): Seq[Page] = {
    val arts = Articles.zipWithIndex.map { case (n, i) =>
      Page(s"fixture://articles/$n", new Timestamp(Epoch + i * 3600L * 1000),
        load(resourceDir, "articles", n), "", "")
    }
    val snips = Snippets.zipWithIndex.map { case (n, i) =>
      Page(s"fixture://snippets/$n", new Timestamp(Epoch + (100 + i) * 3600L * 1000),
        load(resourceDir, "snippets", n), "", "")
    }
    arts ++ snips
  }

  def writeFixtures(spark: SparkSession, resourceDir: String, out: String): Unit = {
    import spark.implicits._
    val ds = spark.createDataset(fixtureRows(resourceDir))
    PageTableIO.write(ds.toDF(), out, numBuckets = 8)
  }

  /** Seeded bench table: K copies of each article; deterministic skew tail. */
  def writeBench(spark: SparkSession, resourceDir: String, out: String, k: Int): Unit = {
    import spark.implicits._
    val articles = Articles.map(n => (n, load(resourceDir, "articles", n)))
    val bcArticles = spark.sparkContext.broadcast(articles)
    val dayMs = 86400L * 1000

    val rows = spark.range(0, k.toLong * articles.length, 1, spark.sparkContext.defaultParallelism)
      .as[Long]
      .map { i =>
        val arts = bcArticles.value
        val (name, html) = arts((i % arts.length).toInt)
        val rep = i / arts.length
        // deterministic pseudo-random striping (splitmix-ish on seed 42)
        val h = {
          var z = i + 42L * 0x9E3779B97F4A7C15L
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z ^ (z >>> 31)
        }
        val day = java.lang.Long.remainderUnsigned(h, 30L)
        val giant = java.lang.Long.remainderUnsigned(h >>> 8, 100L) == 0L // 1% skew tail
        val body = if (giant) {
          val sb = new java.io.ByteArrayOutputStream(html.length * 20)
          var j = 0; while (j < 20) { sb.write(html); j += 1 }
          sb.toByteArray
        } else html
        Page(s"fixture://$name/$rep", new Timestamp(Epoch + day * dayMs), body, "", "")
      }
    PageTableIO.write(rows.toDF(), out, numBuckets = 16)
  }
}
