package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Warc
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}

/** WARC writer/reader round-trips + the Spark binaryFile ingest path. */
class WarcSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private val recs = Seq(
    ("http://a.example/1", "2026-01-01T00:00:00Z", "<html><body><p>one</p></body></html>".getBytes(UTF_8)),
    ("http://a.example/2", "2026-01-01T00:01:00Z", "<html><body><p>two — čeština 中文</p></body></html>".getBytes(UTF_8)),
    ("http://a.example/3", "2026-01-01T00:02:00Z", Array[Byte](0, 1, 2, '\r', '\n', '\r', '\n', 3)))

  test("plain WARC round-trip: warcinfo + responses, bodies byte-exact") {
    val parsed = Warc.parseAll(Warc.writeWarc(recs))
    assert(parsed.head.recordType == "warcinfo")
    val resp = parsed.filter(_.recordType == "response")
    assert(resp.map(_.url) == recs.map(_._1))
    assert(resp.map(_.warcDate) == recs.map(_._2))
    assert(resp.forall(_.httpStatus == 200))
    resp.zip(recs).foreach { case (r, (_, _, body)) =>
      assert(java.util.Arrays.equals(r.body, body))
    }
  }

  test("per-record-gzip WARC (concatenated members) parses identically") {
    val gz = Warc.writeWarc(recs, gzipPerRecord = true)
    assert((gz(0) & 0xFF) == 0x1F && (gz(1) & 0xFF) == 0x8B)
    val parsed = Warc.parseAll(gz).filter(_.recordType == "response")
    assert(parsed.map(_.url) == recs.map(_._1))
    parsed.zip(recs).foreach { case (r, (_, _, body)) =>
      assert(java.util.Arrays.equals(r.body, body))
    }
  }

  test("garbage, empty, and truncated inputs do not throw") {
    assert(Warc.parseAll(Array.emptyByteArray).isEmpty)
    assert(Warc.parseAll("random bytes, no records".getBytes(UTF_8)).isEmpty)
    val cut = Warc.writeWarc(recs).dropRight(40) // truncated final record
    val parsed = Warc.parseAll(cut)
    assert(parsed.count(_.recordType == "response") >= 1) // prefix records survive
  }

  test("memberOffsets: one offset per gzip member, parseAll from any " +
    "member offset yields exactly the tail records") {
    val many = (1 to 40).map(i =>
      (s"http://m.example/$i", f"2026-01-01T00:${i % 60}%02d:00Z",
        s"<html><body><p>doc $i body text</p></body></html>".getBytes(UTF_8)))
    val gz = Warc.writeWarc(many, gzipPerRecord = true)
    val offs = Warc.memberOffsets(gz)
    assert(offs.length == 41, s"warcinfo + 40 responses, got ${offs.length}") // one member per record
    assert(offs.head == 0L)
    // split at any member boundary: the slice parses to exactly the tail
    Seq(1, 7, 40).foreach { k =>
      val slice = java.util.Arrays.copyOfRange(gz, offs(k).toInt, gz.length)
      val tail = Warc.parseAll(slice).filter(_.recordType == "response")
      assert(tail.map(_.url) == many.drop(k - 1).map(_._1), s"split at member $k")
    }
    // non-gzip input has no members
    assert(Warc.memberOffsets(Warc.writeWarc(many)).isEmpty)
    // truncated final member: offsets up to the damage survive
    assert(Warc.memberOffsets(gz.dropRight(20)).length >= 40)
  }

  test("readWithSplits: multi-member file processed by >1 task, output " +
    "row-identical to the single-task read") {
    import org.apache.spark.sql.functions._
    val many = (1 to 60).map(i =>
      (s"http://s.example/$i", f"2026-01-01T00:${i % 60}%02d:00Z",
        (s"<html><body><p>split doc $i " + ("x" * 500) + "</p></body></html>").getBytes(UTF_8)))
    val dir = java.nio.file.Files.createTempDirectory("warcsplit")
    val f = dir.resolve("big.warc.gz")
    java.nio.file.Files.write(f, Warc.writeWarc(many, gzipPerRecord = true))
    val whole = Warc.read(spark, Seq(f.toString))
    val split = Warc.readWithSplits(spark, Seq(f.toString), targetSplitBytes = 2048)
    // >1 split planned, and >1 distinct task actually read data
    assert(Warc.splitRanges(spark, Seq(f.toString), 2048).count() > 1)
    val nTasks = split.withColumn("pid", spark_partition_id())
      .select("pid").distinct().count()
    assert(nTasks > 1, s"expected >1 reading task, got $nTasks")
    // row-identical output (urls, timestamps, html bytes)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("url"), col("warc_ts"), md5(col("html")))
        .collect().map(_.toSeq).sortBy(_.head.toString).toSeq
    assert(canon(split) == canon(whole))
    // splits cover everything exactly once even when the target exceeds
    // the file size (single split) — degenerate case
    assert(canon(Warc.readWithSplits(spark, Seq(f.toString))) == canon(whole))
  }

  test("splitRanges fails LOUDLY on a file beyond the 2 GB byte-array " +
    "ceiling (never a downstream negative-size allocation)") {
    val dir = java.nio.file.Files.createTempDirectory("warcbig")
    val f = dir.resolve("huge.warc.gz")
    // sparse file: 3 GB length, no disk blocks
    val ch = java.nio.channels.FileChannel.open(f,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.WRITE)
    try { ch.position(3L * 1024 * 1024 * 1024 - 1); ch.write(java.nio.ByteBuffer.wrap(Array[Byte](0))) }
    finally ch.close()
    val e = intercept[org.apache.spark.SparkException] {
      Warc.splitRanges(spark, Seq(f.toString), 1L << 20).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.isInstanceOf[IllegalArgumentException] &&
      c.getMessage.contains("2 GB")), e.getMessage.take(300))
    java.nio.file.Files.delete(f)
  }

  test("Spark ingest: binaryFile scan → pages table; non-2xx filtered") {
    val dir = java.nio.file.Files.createTempDirectory("warcspec")
    java.nio.file.Files.write(dir.resolve("a.warc.gz"),
      Warc.writeWarc(recs.take(2), gzipPerRecord = true))
    // hand-crafted 404 record must be dropped by the reader
    val body404 = "HTTP/1.1 404 Not Found\r\n\r\ngone".getBytes(ISO_8859_1)
    val rec404 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Target-URI: http://a.example/404\r\n" +
      "WARC-Date: 2026-01-01T00:03:00Z\r\n" +
      s"Content-Length: ${body404.length}\r\n\r\n").getBytes(ISO_8859_1) ++
      body404 ++ "\r\n\r\n".getBytes(ISO_8859_1)
    java.nio.file.Files.write(dir.resolve("b.warc"),
      Warc.writeWarc(recs.drop(2)) ++ rec404)
    val pages = Warc.read(spark, dir.toString + "/*")
    assert(pages.columns.toSeq == Seq("url", "warc_ts", "html", "text", "lang"))
    val rows = pages.collect().map(r => r.getString(0)).sorted.toSeq
    assert(rows == Seq("http://a.example/1", "http://a.example/2", "http://a.example/3"))
    val ts = pages.where(org.apache.spark.sql.functions.col("url").endsWith("/2"))
      .select("warc_ts").head.getTimestamp(0)
    assert(ts.getTime == 1767225660000L)
  }
}
