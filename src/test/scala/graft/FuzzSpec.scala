package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.extract.{Article, Extractor, Page}
import graft.html.{HtmlParseError, Parser}

/** Robustness: the extractor is total — arbitrary bytes become status rows,
  * never exceptions (scalacheck-style seeded fuzz, deterministic). */
class FuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(42)

  private def randomHtmlish(maxLen: Int): String = {
    val pieces = Array(
      "<div", "<p", "<a href=\"", "</div>", "</p>", "<br>", "<hr/>", ">",
      "\"", "'", "text ", "&amp;", "&#x41;", "&bogus;", "<!-- c -->",
      "<!doctype html>", "<script>var x=1;</script>", "<table><tr><td>",
      "</table>", "<li>item", "<ul>", "=attr", " class=\"comment\"",
      " id=\"main\"", "<<<", ">>>", " ", "ľščť", "😀", "<b><i></b></i>",
      "<p/>", "<style>p{}</style>", "<![CDATA[x]]>", "<?php ?>", "&#0;",
      "<img src=x>", "</", "<", "&", "\n\t ")
    val n = rnd.nextInt(maxLen)
    val sb = new StringBuilder
    (0 until n).foreach(_ => sb.append(pieces(rnd.nextInt(pieces.length))))
    sb.toString
  }

  test("parser: never throws on non-blank soup; blank input raises") {
    (1 to 300).foreach { i =>
      val html = randomHtmlish(60)
      if (html.trim.nonEmpty) {
        try Parser.parseDocument(html)
        catch {
          case _: HtmlParseError => // acceptable only for effectively-empty docs
          case e: Throwable => fail(s"iteration $i threw ${e.getClass} on: ${html.take(200)}")
        }
      }
    }
    intercept[HtmlParseError](Parser.parseDocument("   \n\t  "))
  }

  test("extractor: total over random bytes — always a status row") {
    (1 to 150).foreach { i =>
      val bytes = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(bytes)
      val out = Extractor.extract(Page(s"fuzz://$i", new java.sql.Timestamp(0), bytes, "", ""))
      assert(Set("ok", "parsing-error", "error").contains(out.status), out.status)
    }
  }

  test("extractor: total over random html-ish text") {
    (1 to 150).foreach { i =>
      val bytes = randomHtmlish(80).getBytes("UTF-8")
      val out = Extractor.extract(Page(s"fuzz2://$i", new java.sql.Timestamp(0), bytes, "", ""))
      assert(Set("ok", "parsing-error", "error").contains(out.status))
      assert(out.extracted_text != null)
    }
  }

  test("extraction is deterministic over fuzz corpus") {
    val pages = (1 to 40).map { i =>
      Page(s"det://$i", new java.sql.Timestamp(0), randomHtmlish(80).getBytes("UTF-8"), "", "")
    }
    val a = pages.map(Extractor.extract).map(e => (e.url, e.extracted_text, e.status))
    val b = pages.map(Extractor.extract).map(e => (e.url, e.extracted_text, e.status))
    assert(a == b)
  }

  test("PDF parser: total over mutated and random bytes") {
    val seedPdf = graft.pipeline.Pdf.synthesize(Seq("page one text", "page two\nwith lines"))
    (1 to 200).foreach { i =>
      val mutated = seedPdf.clone()
      // flip a handful of bytes anywhere (headers, dicts, flate payload)
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      try graft.pipeline.Pdf.extract(mutated)
      catch { case e: Throwable => fail(s"pdf fuzz $i threw ${e.getClass}") }
      try graft.pipeline.Pdf.extract(mutated.take(rnd.nextInt(mutated.length)))
      catch { case e: Throwable => fail(s"pdf truncation $i threw ${e.getClass}") }
    }
    val junk = new Array[Byte](4096); rnd.nextBytes(junk)
    graft.pipeline.Pdf.extract(junk) // must not throw
  }

  test("WARC parser: total over mutated and random bytes") {
    val seed = graft.sources.Warc.writeWarc(Seq(
      ("http://f.example/1", "2026-01-01T00:00:00Z", "<html><p>x</p></html>".getBytes("UTF-8"))),
      gzipPerRecord = true)
    (1 to 200).foreach { i =>
      val mutated = seed.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      try graft.sources.Warc.parseAll(mutated)
      catch { case e: Throwable => fail(s"warc fuzz $i threw ${e.getClass}") }
      try graft.sources.Warc.parseAll(mutated.take(rnd.nextInt(mutated.length)))
      catch { case e: Throwable => fail(s"warc truncation $i threw ${e.getClass}") }
    }
    val junk = new Array[Byte](4096); rnd.nextBytes(junk)
    graft.sources.Warc.parseAll(junk) // must not throw
  }

  test("gzip member scanner: total over mutated/truncated/random bytes; " +
    "surviving offsets always start with gzip magic") {
    import graft.sources.Warc
    val seed = Warc.writeWarc((1 to 12).map(i =>
      (s"http://f.example/$i", "2026-01-01T00:00:00Z",
        s"<html><p>member $i</p></html>".getBytes("UTF-8"))),
      gzipPerRecord = true)
    assert(Warc.memberOffsets(seed).length == 13) // warcinfo + 12
    (1 to 200).foreach { i =>
      val mutated = seed.clone()
      (0 until 1 + rnd.nextInt(8)).foreach { _ =>
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      }
      val offs =
        try Warc.memberOffsets(mutated)
        catch { case e: Throwable => fail(s"memberOffsets fuzz $i threw ${e.getClass}") }
      // every reported offset must genuinely sit on a gzip magic
      offs.foreach { o =>
        assert((mutated(o.toInt) & 0xFF) == 0x1F && (mutated(o.toInt + 1) & 0xFF) == 0x8B,
          s"fuzz $i: offset $o not a member boundary")
      }
      try Warc.memberOffsets(mutated.take(rnd.nextInt(mutated.length)))
      catch { case e: Throwable => fail(s"memberOffsets truncation $i threw ${e.getClass}") }
    }
    val junk = new Array[Byte](4096); rnd.nextBytes(junk)
    Warc.memberOffsets(junk) // must not throw
    assert(Warc.memberOffsets(Array.emptyByteArray).isEmpty)
    Warc.memberOffsets(Array[Byte](0x1F, 0x8B.toByte)) // magic-only: no throw
  }

  test("readWithSplits ≡ read property: random record counts/sizes, " +
    "random split targets (seeded)") {
    import graft.sources.Warc
    val spark = SparkSessionFixture.spark
    (1 to 3).foreach { trial =>
      val n = 5 + rnd.nextInt(40)
      val recs = (1 to n).map(i =>
        (s"http://p.example/$trial/$i", "2026-01-01T00:00:00Z",
          (s"<html><p>" + ("y" * rnd.nextInt(3000)) + s"</p></html>").getBytes("UTF-8")))
      val dir = java.nio.file.Files.createTempDirectory(s"warcprop$trial")
      val f = dir.resolve("f.warc.gz")
      java.nio.file.Files.write(f, Warc.writeWarc(recs, gzipPerRecord = true))
      val target = 256L << rnd.nextInt(8) // 256 B .. 32 KB
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("url", "html").collect()
          .map(r => (r.getString(0), java.util.Arrays.hashCode(r.getAs[Array[Byte]](1))))
          .sortBy(_._1).toSeq
      assert(canon(Warc.readWithSplits(spark, Seq(f.toString), target)) ==
        canon(Warc.read(spark, Seq(f.toString))),
        s"trial $trial target $target diverged")
    }
  }
}
