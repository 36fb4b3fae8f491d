package graft

import org.apache.spark.sql.SparkSession
import graft.extract.{Extractor, Page}

/**
 * Benchmark main (driver contract): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR plus the extraction headline (docs/sec over the
 * replicated real-article corpus), printing ONE JSON line.
 *
 * Env knobs:
 *   SPARK_GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
 *   SPARK_GRAFT_BENCH_DOCS  headline corpus size (default 3000 docs)
 *   SPARK_GRAFT_ARTICLES    dir with fixture articles (default repo path)
 */
object Bench {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "12000").toInt

    val spark = SparkSession.builder()
      .appName("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- extraction headline: docs/sec over replicated real articles ----
    val articleDir = sys.env.getOrElse("SPARK_GRAFT_ARTICLES",
      "/root/repo/src/test/resources/fixtures/articles")
    val names = graft.job.FixtureGen.Articles
    val articles: Seq[(String, Array[Byte])] =
      if (new java.io.File(articleDir).isDirectory)
        names.map(n => (n, java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(articleDir, n))))
      else Seq.empty

    var docsPerSec = 0.0
    var mbPerSec = 0.0
    var extractSec = 0.0
    if (articles.nonEmpty) {
      val bc = spark.sparkContext.broadcast(articles)
      val totalBytes = articles.map(_._2.length.toLong).sum * (benchDocs / articles.length)
      def corpus = spark.range(0, benchDocs, 1, cpus.toInt * 2).map { i =>
        val arts = bc.value
        val (name, html) = arts((i % arts.length).toInt)
        Page(s"bench://$name/$i", new java.sql.Timestamp(1767225600000L + i * 60000L),
          html, "", "")
      }
      // warmup (JIT) on a slice, then best-of-2 timed runs (the sandbox
      // host has noisy neighbors; short single runs under-measure)
      corpus.limit(600).map(Extractor.extract).count()
      var bestSec = Double.MaxValue
      var n = 0L
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        n = corpus.map(Extractor.extract)
          .select("status").where($"status" === "ok").count()
        bestSec = math.min(bestSec, (System.nanoTime() - t0) / 1e9)
      }
      extractSec = bestSec
      docsPerSec = n / extractSec
      mbPerSec = totalBytes / 1e6 / extractSec
    }

    // ---- per-query timings: best-of-2 (same protocol as the extraction
    // headline — the sandbox host has noisy neighbors and a single-shot
    // run can capture a 10–20× artifact; see BENCH.md §2) -----------------
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // best-of over SUCCESSFUL runs only — a fast crash must not report
      // as a fast query; if every attempt fails, report the worst elapsed
      // and log the failure
      var best = Double.MaxValue
      var worstFail = 0.0
      var failures = 0
      (1 to 2).foreach { _ =>
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          failures += 1
          System.err.println(s"bench: $name failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) best = math.min(best, dt) else worstFail = math.max(worstFail, dt)
      }
      name -> (if (best != Double.MaxValue) best else worstFail)
    }
    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + extractSec

    val json =
      f"""{"metric":"extract_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/sec","total_sec":$total%.2f,"extract_sec":$extractSec%.2f,"extract_mb_per_sec":$mbPerSec%.1f,"bench_docs":$benchDocs,"cpus":$cpus,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // bare-file copy so harnesses don't have to scrape the JSON line out of
    // sbt's [info]-prefixed stdout (env-overridable path)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"bench.json write failed: $e") }
    spark.stop()
  }
}
