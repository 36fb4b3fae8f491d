package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.{Extractor, Page}

/**
 * Benchmark main (driver contract): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR plus the extraction headline (docs/sec over the
 * replicated real-article corpus), printing ONE JSON line.
 *
 * Noise protocol (the sandbox host has noisy neighbors — identical runs
 * can vary 10×, see BENCH.md §2):
 *  - every query is best-of-2 over SUCCESSFUL runs;
 *  - the extraction headline is ADAPTIVE best-of-N: attempt 1 runs before
 *    the query loop and attempt 2 after it (the ~30 s loop separates the
 *    two measurement windows, so one noisy neighbor can't sit on both);
 *    if the two attempts still disagree by >3× the measurement window is
 *    suspect and up to 2 more attempts are taken (BENCH_r02/r03 captured
 *    20–29× artifacts when both attempts shared one window);
 *  - a query that fails EVERY attempt is reported in a `failed` array and
 *    its `queries` value is the NEGATED worst elapsed — never confusable
 *    with a successful timing — and is excluded from total_sec.
 *
 * Env knobs:
 *   SPARK_GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
 *   SPARK_GRAFT_BENCH_DOCS  headline corpus size (default 12000 docs)
 *   SPARK_GRAFT_ARTICLES    dir with fixture articles (default repo path)
 */
object Bench {

  /** One timed attempt per query, best-of over `attempts` SUCCESSFUL runs.
    * Returns (name -> seconds) with failed-on-every-attempt queries
    * reported as NEGATIVE worst-elapsed, plus the list of failed names.
    * Pulled out of main so the failure-marking contract is unit-testable. */
  def benchQueries(spark: SparkSession, sfDir: String,
                   queries: Map[String, (SparkSession, String) => DataFrame],
                   attempts: Int = 2): (Seq[(String, Double)], Seq[String]) = {
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      var best = Double.MaxValue
      var worstFail = 0.0
      var failures = 0
      (1 to attempts).foreach { _ =>
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
      if (best == Double.MaxValue) { failed += name; name -> -worstFail }
      else name -> best
    }
    (results, failed.toSeq)
  }

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

    // ---- extraction headline corpus: replicated real articles ----------
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
    var extractAttempts = List.empty[Double]
    def extractAttempt(corpus: => org.apache.spark.sql.Dataset[Page]): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = corpus.map(Extractor.extract)
        .select("status").where($"status" === "ok").count()
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val corpusOpt: Option[() => org.apache.spark.sql.Dataset[Page]] =
      if (articles.isEmpty) None
      else {
        val bc = spark.sparkContext.broadcast(articles)
        Some(() => spark.range(0, benchDocs, 1, cpus.toInt * 2).map { i =>
          val arts = bc.value
          val (name, html) = arts((i % arts.length).toInt)
          Page(s"bench://$name/$i", new java.sql.Timestamp(1767225600000L + i * 60000L),
            html, "", "")
        })
      }
    var okDocs = 0L
    val totalBytes =
      if (articles.isEmpty) 0L
      else articles.map(_._2.length.toLong).sum * (benchDocs / articles.length)

    // warmup (JIT) then extraction attempt 1 — BEFORE the query loop
    corpusOpt.foreach { corpus =>
      corpus().limit(600).map(Extractor.extract).count()
      val (sec, n) = extractAttempt(corpus())
      extractAttempts ::= sec; okDocs = n
    }

    // ---- per-query timings (best-of-2, failures marked) -----------------
    val (results, failedQs) = benchQueries(spark, sfDir, SparkEntry.queries)

    // extraction attempt 2 — AFTER the query loop (separate time window);
    // adaptive: >3× disagreement means a noisy window, take up to 2 more
    corpusOpt.foreach { corpus =>
      extractAttempts ::= extractAttempt(corpus())._1
      var extra = 0
      while (extra < 2 && extractAttempts.max / extractAttempts.min > 3.0) {
        System.err.println(f"bench: extraction attempts disagree >3x " +
          f"(${extractAttempts.min}%.2f..${extractAttempts.max}%.2f s) — retrying")
        extractAttempts ::= extractAttempt(corpus())._1
        extra += 1
      }
      extractSec = extractAttempts.min
      docsPerSec = okDocs / extractSec
      mbPerSec = totalBytes / 1e6 / extractSec
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val failedJson = failedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ > 0).sum + extractSec

    val json =
      f"""{"metric":"extract_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/sec","total_sec":$total%.2f,"extract_sec":$extractSec%.2f,"extract_attempts":${extractAttempts.size},"extract_mb_per_sec":$mbPerSec%.1f,"bench_docs":$benchDocs,"cpus":$cpus,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
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
