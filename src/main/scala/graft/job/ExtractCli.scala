package graft.job

import graft.extract.{Article, Extractor, Page}
import java.nio.file.{Files, Paths}

/**
 * Single-document debug CLI — the Spark-free equivalent of the reference's
 * `breadability <resource>` console script (reference scripts/client.py:51-86):
 * reads one HTML file, runs the full extraction, prints the readable HTML
 * (default) or the annotated main text (`--text`).
 *
 * Usage: runMain graft.job.ExtractCli [--text|--meta] <file.html> [url]
 */
object ExtractCli {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    if (rest.isEmpty) {
      System.err.println("usage: ExtractCli [--text|--meta] <file.html> [url]")
      sys.exit(2)
    }
    val path = rest(0)
    val url = if (rest.length > 1) rest(1) else null
    val bytes = Files.readAllBytes(Paths.get(path))
    if (flags.contains("--meta")) {
      val page = Page(if (url == null) s"file://$path" else url,
        new java.sql.Timestamp(0L), bytes, "", "")
      val ex = Extractor.extract(page)
      println(s"url:        ${ex.url}")
      println(s"status:     ${ex.status}")
      println(s"title:      ${ex.title}")
      println(s"paragraphs: ${ex.paragraphs.length}")
      println(s"candidates: ${ex.metrics.candidates_scored}  pruned: ${ex.metrics.nodes_pruned}")
      println(s"bytes in/out: ${ex.metrics.bytes_in}/${ex.metrics.bytes_out}  parse_ms: ${ex.metrics.parse_ms}")
    } else {
      val article = Article.fromBytes(bytes, url)
      if (flags.contains("--text"))
        println(Extractor.flatten(article.mainText))
      else
        println(article.readable)
    }
  }
}
