package graft.job

import graft.extract._
import graft.html._
import java.nio.file.{Files, Paths}

/** Single-threaded per-stage profiling over the article corpus. */
object PerfProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "src/test/resources/fixtures/articles"
    val names = FixtureGen.Articles
    val arts = names.map(n => (n, Files.readAllBytes(Paths.get(dir, n))))
    val iters = if (args.length > 1) args(1).toInt else 30

    // warmup
    (1 to 10).foreach(_ => arts.foreach { case (_, b) =>
      val a = Article.fromBytes(b); a.mainText; a.readable })

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e6)
    }

    arts.foreach { case (name, bytes) =>
      var tDecode, tBreaks, tParse, tClean, tCand, tRead, tText = 0.0
      (1 to iters).foreach { _ =>
        val (decoded, d1) = time(Decode.decodeHtml(bytes)); tDecode += d1
        val (conv, d2) = time(Breaks.convertBreaksToParagraphs(decoded)); tBreaks += d2
        val (dom, d3) = time(Parser.parseDocument(conv)); tParse += d3
        val (_, d4) = time { Clean(dom); Readable.leafDivElementsIntoParagraphs(dom) }; tClean += d4
        val article = Article.fromBytes(bytes)
        val (_, d5) = time(article.candidates); tCand += d5
        val (_, d6) = time(article.readableDom); tRead += d6
        val (_, d7) = time(article.mainText); tText += d7
      }
      println(f"$name%-42s decode=${tDecode / iters}%6.1f breaks=${tBreaks / iters}%6.1f parse=${tParse / iters}%6.1f clean=${tClean / iters}%6.1f cand=${tCand / iters}%7.1f readable=${tRead / iters}%7.1f text=${tText / iters}%5.1f ms (${bytes.length / 1024} KB)")
    }
    val t0 = System.nanoTime()
    var n = 0
    (1 to iters).foreach(_ => arts.foreach { case (name, b) =>
      val p = Page(name, new java.sql.Timestamp(0), b, "", "")
      if (Extractor.extract(p).status == "ok") n += 1
    })
    val sec = (System.nanoTime() - t0) / 1e9
    val totalMB = arts.map(_._2.length).sum / 1e6 * iters
    println(f"single-thread end-to-end: ${n / sec}%6.1f docs/sec  ${totalMB / sec}%6.1f MB/sec")
  }
}
