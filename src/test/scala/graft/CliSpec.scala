package graft

import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import graft.job.ExtractCli

/** CLI parity with the reference console script (scripts/client.py):
  * URL fetch with custom UA, www-prefix scheme defaulting, --fragment. */
class CliSpec extends AnyFunSuite {

  private def withServer(body: Array[Byte])(f: (String, () => String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    @volatile var lastUa: String = null
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        lastUa = ex.getRequestHeaders.getFirst("User-Agent")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/doc.html", () => lastUa)
    finally server.stop(0)
  }

  test("http resource is fetched with the custom User-Agent (client.py:39-44,63-67)") {
    withServer(Fixtures.snippetBytes("document_min.html")) { (url, ua) =>
      val out = ExtractCli.run(Array("--meta", url))
      assert(out.contains("status:     ok"))
      assert(out.contains(s"url:        $url"))
      assert(ua() == ExtractCli.UserAgent)
      assert(ua().contains("graft/"))
    }
  }

  test("default output is the readable div; --fragment matches it " +
    "(client.py:74 — tounicode serializes the div in both modes)") {
    withServer(Fixtures.snippetBytes("document_min.html")) { (url, _) =>
      val full = ExtractCli.run(Array(url))
      val frag = ExtractCli.run(Array("--fragment", url))
      assert(full.startsWith("<div id=\"readabilityBody\""))
      assert(full == frag)
      val shell = ExtractCli.run(Array("--full-html", url))
      assert(shell.contains("<html>") && shell.contains("text/html;charset=UTF-8"))
      assert(shell.contains("readabilityBody"))
    }
  }

  test("www resource gets an http:// prefix (client.py:57-59)") {
    var requested: String = null
    val out = ExtractCli.run(Array("--meta", "www.example.com/a.html"),
      fetch = { u => requested = u; Fixtures.snippetBytes("document_min.html") })
    assert(requested == "http://www.example.com/a.html")
    assert(out.contains("status:     ok"))
  }

  test("file path still works, optional url arg absolutizes") {
    val p = java.nio.file.Files.createTempFile("cli", ".html")
    java.nio.file.Files.write(p, Fixtures.snippetBytes("document_min.html"))
    val out = ExtractCli.run(Array("--meta", p.toString, "http://ex.org/x"))
    assert(out.contains("url:        http://ex.org/x"))
    java.nio.file.Files.delete(p)
  }

  test("--warc extracts every response record, one summary line each") {
    import java.nio.charset.StandardCharsets.UTF_8
    val p = java.nio.file.Files.createTempFile("cli", ".warc.gz")
    java.nio.file.Files.write(p, graft.sources.Warc.writeWarc(Seq(
      ("http://w.example/a", "2026-01-01T00:00:00Z",
        Fixtures.snippetBytes("h1_and_2_paragraphs.html")),
      ("http://w.example/b", "2026-01-01T00:01:00Z",
        "<html><head><title>B</title></head><body><p>short</p></body></html>".getBytes(UTF_8))),
      gzipPerRecord = true))
    val out = ExtractCli.run(Array("--warc", p.toString))
    val lines = out.split("\n")
    assert(lines.length == 2, out)
    assert(lines.forall(_.startsWith("ok\t")), out)
    assert(lines(0).contains("http://w.example/a"))
    assert(lines(1).contains("http://w.example/b") && lines(1).contains("B"))
    java.nio.file.Files.delete(p)
  }
}
