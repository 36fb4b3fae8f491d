package graft.job

import graft.extract.{Article, Extractor, Page}
import java.nio.file.{Files, Paths}

/**
 * Single-document debug CLI — the Spark-free equivalent of the reference's
 * `breadability <resource>` console script (reference scripts/client.py).
 *
 * Resource resolution mirrors client.py:57-72: a resource starting with
 * "www" gets an "http://" prefix; http(s) resources are fetched with a
 * User-Agent header (client.py:39-44); anything else is read as a file.
 * Like the reference CLI (client.py:74), the default is the full-document
 * Article (`return_fragment=False`) and `--fragment` switches to the
 * fragment mode; note `Article.readable` serializes the readable div in
 * both modes (lxml tounicode semantics) — `--full-html` additionally
 * prints the wrapping NULL_DOCUMENT shell.
 *
 * Usage: runMain graft.job.ExtractCli
 *          [--text|--meta|--full-html|--warc] [--fragment] <file|url> [url]
 */
object ExtractCli {

  /** client.py:39-44 — custom UA identifying the tool + upstream project. */
  val UserAgent: String =
    "graft/0.2 (breadability-compatible; https://github.com/bookieio/breadability)"

  /** HTTP GET with the custom header — the urllib path of client.py:63-67.
    * Injectable so tests can run against a local stub server. */
  def defaultFetch(url: String): Array[Byte] = {
    val conn = new java.net.URL(url).openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestProperty("User-Agent", UserAgent)
    conn.setConnectTimeout(30000)
    conn.setReadTimeout(30000)
    conn.setInstanceFollowRedirects(true)
    val in = conn.getInputStream
    try in.readAllBytes()
    finally { in.close(); conn.disconnect() }
  }

  /** Pure core (testable): resolve the resource, extract, render output. */
  def run(args: Array[String],
          fetch: String => Array[Byte] = defaultFetch): String = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    require(rest.nonEmpty,
      "usage: ExtractCli [--text|--meta|--full-html|--warc] [--fragment] <file|url> [url]")

    // client.py:57-59 — bare www hosts get a scheme
    val resource0 = rest(0)
    val resource =
      if (resource0.startsWith("www")) "http://" + resource0 else resource0
    val isHttp = resource.startsWith("http://") || resource.startsWith("https://")

    val (bytes, url) =
      if (isHttp) (fetch(resource), resource)
      else (Files.readAllBytes(Paths.get(resource)),
        if (rest.length > 1) rest(1) else null)

    if (flags.contains("--warc")) {
      // batch-debug mode: extract every response record of a WARC file
      // (plain or per-record gzip) and print one summary line per page
      graft.sources.Warc.parseAll(bytes)
        .filter(r => r.recordType == "response" && r.httpStatus / 100 == 2)
        .map { r =>
          val ex = Extractor.extract(Page(r.url, new java.sql.Timestamp(0L),
            r.body, "", ""))
          s"${ex.status}\t${ex.paragraphs.length}\t${ex.metrics.bytes_in}/${ex.metrics.bytes_out}\t${ex.url}\t${ex.title}"
        }.mkString("\n")
    } else if (flags.contains("--meta")) {
      val page = Page(
        if (url == null) s"file://$resource" else url,
        new java.sql.Timestamp(0L), bytes, "", "")
      val ex = Extractor.extract(page)
      s"""url:        ${ex.url}
         |status:     ${ex.status}
         |title:      ${ex.title}
         |paragraphs: ${ex.paragraphs.length}
         |candidates: ${ex.metrics.candidates_scored}  pruned: ${ex.metrics.nodes_pruned}
         |bytes in/out: ${ex.metrics.bytes_in}/${ex.metrics.bytes_out}  parse_ms: ${ex.metrics.parse_ms}""".stripMargin
    } else {
      // client.py:74 — full document unless --fragment
      val article = Article.fromBytes(bytes, url,
        returnFragment = flags.contains("--fragment"))
      if (flags.contains("--text")) Extractor.flatten(article.mainText)
      else if (flags.contains("--full-html")) article.fullHtml
      else article.readable
    }
  }

  def main(args: Array[String]): Unit = {
    try println(run(args))
    catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage)
        sys.exit(2)
    }
  }
}
