package graft.job

import org.apache.spark.sql.SparkSession
import graft.extract.{Extractor, Page}
import java.nio.file.{Files, Paths}

/**
 * One simulated executor for the multi-process scaling proxy: a JVM with
 * local[cpus] extracting `docs` documents, printing elapsed seconds.
 * tools/scaling_proxy.sh launches 1 vs 4 of these concurrently — the
 * faithful sandbox stand-in for "N executors vs 4N executors" (separate
 * JVMs, separate heaps/GC, shared box), per the BASELINE.json north rule.
 */
object ExecutorWorker {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val docs = args(1).toInt
    val tag = if (args.length > 2) args(2) else "w0"
    val articleDir = sys.env.getOrElse("SPARK_GRAFT_ARTICLES",
      "/root/repo/src/test/resources/fixtures/articles")
    val articles = FixtureGen.Articles.map(n =>
      (n, Files.readAllBytes(Paths.get(articleDir, n))))

    val spark = SparkSession.builder()
      .appName(s"graft-worker-$tag")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(articles)
    def corpus(n: Int) = spark.range(0, n, 1, cpus * 2).map { i =>
      val arts = bc.value
      val (name, html) = arts((i % arts.length).toInt)
      Page(s"bench://$tag/$name/$i", new java.sql.Timestamp(1767225600000L + i * 60000L), html, "", "")
    }
    corpus(math.min(600, docs)).map(Extractor.extract).count() // JIT warm
    val t0 = System.nanoTime()
    val ok = corpus(docs).map(Extractor.extract)
      .select("status").where($"status" === "ok").count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"worker":"$tag","cpus":$cpus,"docs":$docs,"ok":$ok,"sec":$sec%.2f,"docs_per_sec":${ok / sec}%.1f}""")
    spark.stop()
  }
}
