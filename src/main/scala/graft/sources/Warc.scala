package graft.sources

import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * WARC/1.0 ingestion — the wire format Common-Crawl pages actually
 * arrive in — turning raw WARC bytes into the pages table
 * (url, warc_ts, html, text, lang) that the extraction job consumes.
 *
 * Reader semantics (ISO 28500 subset a crawl pipeline meets):
 *  - records = named headers, blank line, Content-Length payload bytes,
 *    `\r\n\r\n` boundary; header names case-insensitive;
 *  - `response` records carry an HTTP/1.1 message: status line + headers
 *    split from the body at the first blank line — the body is the HTML;
 *  - plain files AND per-record-gzip files (concatenated gzip members,
 *    the Common-Crawl layout) — members decode transparently;
 *  - malformed tails/records are skipped, never thrown.
 *
 * Scale shape: WARC files are the unit of parallelism (Common Crawl
 * ships ~10^5 ~1 GB files per snapshot, far more files than executor
 * slots, so per-file granularity saturates a cluster). `read` uses the
 *`binaryFile` source — each file is one task; the record scan is a
 * single forward pass (no random access needed).
 *
 * When files do NOT dominate slots (a handful of 1 GB files on a wide
 * cluster, or a straggling giant file), `readWithSplits` reads SUB-FILE
 * splits: per-record-gzip members make every member offset a valid
 * split point, so pass 1 builds a member-offset index per file (the
 * role Common Crawl's published CDX offset index plays when available)
 * and pass 2 reads each member-aligned ~targetSplitBytes range as its
 * own task. Output is row-identical to `read` (pinned in WarcSpec).
 */
object Warc {

  final case class WarcRecord(url: String, warcDate: String, recordType: String,
                              httpStatus: Int, body: Array[Byte])

  // ---- writer (deterministic synthetic WARCs; no external data) -------

  /** records = (targetUri, warcDate ISO-8601, htmlBytes). */
  def writeWarc(records: Seq[(String, String, Array[Byte])],
                gzipPerRecord: Boolean = false): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(1 << 16)
    writeWarcTo(out, records.iterator, gzipPerRecord)
    out.toByteArray
  }

  /** Stream records to `os` one gzip member at a time — per-record
    * buffers only, never the partition (a 1 M-row task would otherwise
    * hold ~1.5 GB; VERDICT r4 #3). Byte-identical to writeWarc, which
    * delegates here. */
  def writeWarcTo(os: java.io.OutputStream,
                  records: Iterator[(String, String, Array[Byte])],
                  gzipPerRecord: Boolean = false): Unit = {
    def member(record: Array[Byte]): Unit =
      if (gzipPerRecord) {
        val gz = new java.util.zip.GZIPOutputStream(os)
        gz.write(record); gz.finish()
      } else os.write(record)

    val info = ("WARC/1.0\r\n" +
      "WARC-Type: warcinfo\r\n" +
      "WARC-Date: 2026-01-01T00:00:00Z\r\n" +
      "Content-Type: application/warc-fields\r\n" +
      "Content-Length: 23\r\n\r\n" +
      "software: graft-synth\r\n" +
      "\r\n\r\n").getBytes(ISO_8859_1)
    member(info)

    records.foreach { case (uri, date, html) =>
      val http = ("HTTP/1.1 200 OK\r\n" +
        "Content-Type: text/html; charset=UTF-8\r\n" +
        s"Content-Length: ${html.length}\r\n\r\n").getBytes(ISO_8859_1)
      val block = new java.io.ByteArrayOutputStream(http.length + html.length)
      block.write(http); block.write(html)
      val payload = block.toByteArray
      val hdr = ("WARC/1.0\r\n" +
        "WARC-Type: response\r\n" +
        s"WARC-Target-URI: $uri\r\n" +
        s"WARC-Date: $date\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
      val rec = new java.io.ByteArrayOutputStream(hdr.length + payload.length + 4)
      rec.write(hdr); rec.write(payload); rec.write("\r\n\r\n".getBytes(ISO_8859_1))
      member(rec.toByteArray)
    }
  }

  // ---- reader ----------------------------------------------------------

  private def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    // GZIPInputStream reads concatenated members transparently; close()
    // releases the native Inflater eagerly (long-lived executors ingest
    // ~10^5 files — finalizer-time release is not acceptable)
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes), 1 << 16)
    try {
      val out = new java.io.ByteArrayOutputStream(bytes.length * 4 + 64)
      val buf = new Array[Byte](1 << 16)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  /** All records in a WARC byte blob (plain or per-record gzip). */
  def parseAll(raw: Array[Byte]): Seq[WarcRecord] = {
    if (raw.length < 4) return Nil
    val bytes =
      if ((raw(0) & 0xFF) == 0x1F && (raw(1) & 0xFF) == 0x8B)
        try gunzipAll(raw) catch { case _: Exception => return Nil }
      else raw
    val recs = scala.collection.mutable.ArrayBuffer[WarcRecord]()
    var i = 0
    val n = bytes.length
    def lineEnd(from: Int): Int = {
      var j = from
      while (j < n && bytes(j) != '\n') j += 1
      j
    }
    while (i < n) {
      // find the next record header
      while (i < n && !startsWith(bytes, i, "WARC/")) i = lineEnd(i) + 1
      if (i < n) {
        // named headers until blank line
        var url = ""; var date = ""; var rtype = ""; var clen = -1L
        var j = lineEnd(i) + 1
        var blank = false
        while (j < n && !blank) {
          val e = lineEnd(j)
          val line = new String(bytes, j, math.max(0, e - j -
            (if (e > j && bytes(e - 1) == '\r') 1 else 0)), ISO_8859_1)
          if (line.isEmpty) blank = true
          else {
            val c = line.indexOf(':')
            if (c > 0) {
              val k = line.substring(0, c).trim.toLowerCase
              val v = line.substring(c + 1).trim
              k match {
                case "warc-target-uri" => url = v
                case "warc-date"       => date = v
                case "warc-type"       => rtype = v
                case "content-length"  => clen = try v.toLong catch { case _: Exception => -1L }
                case _                 =>
              }
            }
          }
          j = e + 1
        }
        if (clen < 0 || j + clen > n) { i = n } // malformed/truncated tail
        else {
          val payload = java.util.Arrays.copyOfRange(bytes, j, j + clen.toInt)
          if (rtype == "response") {
            // split the HTTP message at the first blank line
            val (status, body) = splitHttp(payload)
            recs += WarcRecord(url, date, rtype, status, body)
          } else recs += WarcRecord(url, date, rtype, 0, payload)
          i = j + clen.toInt
        }
      }
    }
    recs.toSeq
  }

  private def startsWith(bytes: Array[Byte], at: Int, s: String): Boolean = {
    if (at + s.length > bytes.length) return false
    var k = 0
    while (k < s.length) { if (bytes(at + k) != s.charAt(k)) return false; k += 1 }
    true
  }

  private def splitHttp(payload: Array[Byte]): (Int, Array[Byte]) = {
    var i = 0
    val n = payload.length
    var bodyStart = n
    // header/body boundary: CRLFCRLF per spec, but tolerate bare-LF
    // blank lines (misbehaving servers are routine in a crawl)
    while (i < n && bodyStart == n) {
      if (i + 3 < n && payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') bodyStart = i + 4
      else if (i + 1 < n && payload(i) == '\n' && payload(i + 1) == '\n')
        bodyStart = i + 2
      else if (i + 2 < n && payload(i) == '\n' && payload(i + 1) == '\r' &&
        payload(i + 2) == '\n') bodyStart = i + 3
      i += 1
    }
    val statusLineEnd = {
      var j = 0
      while (j < n && payload(j) != '\n') j += 1
      j
    }
    val statusLine = new String(payload, 0, statusLineEnd, ISO_8859_1)
    val status = "HTTP/\\S+ (\\d{3})".r.findFirstMatchIn(statusLine)
      .map(_.group(1).toInt).getOrElse(0)
    (status, java.util.Arrays.copyOfRange(payload, bodyStart, n))
  }

  // ---- Spark source ----------------------------------------------------

  private def toPages(spark: SparkSession,
                      files: org.apache.spark.sql.Dataset[Array[Byte]]): DataFrame = {
    import spark.implicits._
    files.flatMap { bytes =>
      Warc.parseAll(bytes).iterator.collect {
        case r if r.recordType == "response" && r.httpStatus / 100 == 2 =>
          val ts = try java.sql.Timestamp.from(java.time.Instant.parse(r.warcDate))
          catch { case _: Exception => new java.sql.Timestamp(0L) }
          (r.url, ts, r.body, "", "")
      }
    }.toDF("url", "warc_ts", "html", "text", "lang")
  }

  /** Pages-table-shaped DataFrame from WARC files: one task per file
    * (binaryFile source), one forward scan per task. Only `response`
    * records with 2xx status become pages. */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    import spark.implicits._
    toPages(spark,
      spark.read.format("binaryFile").load(pathGlob)
        .select(col("content")).as[Array[Byte]])
  }

  /** Same, over an explicit file list (no glob: callers that already hold
    * concrete paths avoid the FileStreamSink metadata probe logging a
    * crash-shaped FileNotFoundException for glob patterns). */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    if (paths.isEmpty)
      spark.emptyDataset[(String, java.sql.Timestamp, Array[Byte], String, String)]
        .toDF("url", "warc_ts", "html", "text", "lang")
    else toPages(spark,
      spark.read.format("binaryFile").load(paths: _*)
        .select(col("content")).as[Array[Byte]])
  }

  // ---- sub-file splits (CDX-style member-offset index) ------------------

  /** Gzip member boundary offsets in a per-record-gzip blob, one forward
    * pass: each member's deflate stream is inflated-and-discarded to find
    * where it ends (RFC 1952 trailer = 8 bytes after the deflate data).
    * Common Crawl's CDX index ships these offsets precomputed; this
    * builds the same index when none is available. Empty for non-gzip
    * input; a malformed tail ends the scan (same skip-never-throw policy
    * as parseAll). */
  def memberOffsets(bytes: Array[Byte]): Seq[Long] = {
    val offs = scala.collection.mutable.ArrayBuffer[Long]()
    val n = bytes.length
    var i = 0
    try {
      while (i + 1 < n && (bytes(i) & 0xFF) == 0x1F && (bytes(i + 1) & 0xFF) == 0x8B) {
        // parse the header BEFORE recording the offset: a member whose
        // header is corrupt/truncated must not become a split boundary
        val dataStart = gzipHeaderEnd(bytes, i)
        offs += i.toLong
        val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
        try {
          inf.setInput(bytes, dataStart, n - dataStart)
          val buf = new Array[Byte](1 << 16)
          var stuck = false
          while (!inf.finished() && !stuck)
            if (inf.inflate(buf) == 0 && (inf.needsInput() || inf.needsDictionary()))
              stuck = true // truncated member
          if (stuck) i = n
          else i = dataStart + ((n - dataStart) - inf.getRemaining) + 8 // +CRC32+ISIZE
        } finally inf.end()
      }
    } catch { case _: Exception => /* malformed tail: keep offsets so far */ }
    offs.toSeq
  }

  /** Index after the RFC 1952 member header starting at `at`:
    * magic(2) CM(1) FLG(1) MTIME(4) XFL(1) OS(1), then optional
    * FEXTRA / FNAME / FCOMMENT / FHCRC per the FLG bits. Scans are
    * bounded by the array: a header whose NUL-terminated field runs off
    * the end is a truncated member — fail with the same loud
    * IllegalArgumentException class the inflate "stuck" path uses, not
    * an AIOOBE swallowed after a junk offset was already appended. */
  private def gzipHeaderEnd(b: Array[Byte], at: Int): Int = {
    val flg = b(at + 3) & 0xFF
    var i = at + 10
    def scanNulTerminated(field: String): Unit = {
      while (i < b.length && b(i) != 0) i += 1
      require(i < b.length, s"truncated gzip header: unterminated $field at offset $at")
      i += 1
    }
    if ((flg & 4) != 0) {
      require(i + 1 < b.length, s"truncated gzip header: FEXTRA length at offset $at")
      val xlen = (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8); i += 2 + xlen
    }
    if ((flg & 8) != 0) scanNulTerminated("FNAME")
    if ((flg & 16) != 0) scanNulTerminated("FCOMMENT")
    if ((flg & 2) != 0) i += 2 // FHCRC
    require(i <= b.length, s"truncated gzip header at offset $at")
    i
  }

  /** Hadoop Configuration is not Serializable (and Spark's wrapper is
    * private[spark]) — ship the entries and rebuild on the executor. */
  def confEntries(conf: org.apache.hadoop.conf.Configuration): Seq[(String, String)] = {
    val it = conf.iterator()
    val buf = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (it.hasNext) { val e = it.next(); buf += ((e.getKey, e.getValue)) }
    buf.toSeq
  }

  def confFromEntries(entries: Seq[(String, String)]): org.apache.hadoop.conf.Configuration = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Member-aligned split plan: (path, start, end) ranges of roughly
    * `targetSplitBytes`, one index task per file. Exposed for tests and
    * for callers that persist the index (query many ingests against one
    * indexing pass, CDX-style). */
  def splitRanges(spark: SparkSession, paths: Seq[String],
                  targetSplitBytes: Long): org.apache.spark.sql.Dataset[(String, Long, Long)] = {
    import spark.implicits._
    val bcConf = spark.sparkContext.broadcast(
      confEntries(spark.sparkContext.hadoopConfiguration))
    spark.createDataset(paths).flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(confFromEntries(bcConf.value))
      val len = fs.getFileStatus(path).getLen
      // the index pass holds one file in task memory (~1 GB worst case on
      // CC-sized files); with a precomputed CDX index this pass is skipped.
      // JVM byte arrays cap at 2 GB — same ceiling as Spark's own
      // binaryFile source (maxLength = Int.MaxValue) — and the READ side
      // has the same ceiling per split, so an oversized file must fail
      // LOUDLY here, not overflow the Int cast downstream
      if (len > Int.MaxValue - 8)
        throw new IllegalArgumentException(
          s"$p is ${len} bytes — beyond the 2 GB JVM byte-array ceiling " +
            "(the same limit as Spark's binaryFile source). Split the file " +
            "upstream or read it via a CDX offset index.")
      val offs = {
        val bytes = new Array[Byte](len.toInt)
        val in = fs.open(path)
        try in.readFully(0L, bytes) finally in.close()
        memberOffsets(bytes)
      }
      val bounds = (if (offs.isEmpty) Seq(0L) else offs) :+ len
      val out = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
      var start = bounds.head
      var i = 1
      while (i < bounds.length) {
        if ((bounds(i) - start >= targetSplitBytes || i == bounds.length - 1) &&
            bounds(i) > start) {
          out += ((p, start, bounds(i)))
          start = bounds(i)
        }
        i += 1
      }
      out.toSeq
    }
  }

  /** Parallel read of large per-record-gzip WARC files via member-aligned
    * sub-file splits (see class doc). Row-identical to `read`; use when
    * slots ≫ files. */
  def readWithSplits(spark: SparkSession, paths: Seq[String],
                     targetSplitBytes: Long = 128L << 20): DataFrame = {
    import spark.implicits._
    val bcConf = spark.sparkContext.broadcast(
      confEntries(spark.sparkContext.hadoopConfiguration))
    val splits = splitRanges(spark, paths, targetSplitBytes)
      .repartition(spark.sparkContext.defaultParallelism) // splits = parallel unit
    toPages(spark, splits.mapPartitions { it =>
      it.map { case (p, start, end) =>
        val path = new org.apache.hadoop.fs.Path(p)
        val fs = path.getFileSystem(confFromEntries(bcConf.value))
        val buf = new Array[Byte]((end - start).toInt)
        val in = fs.open(path)
        try in.readFully(start, buf) finally in.close()
        buf // every split starts AND ends on a member boundary → parseAll works
      }
    })
  }

  /** Streaming variant: a WARC drop directory as a continuous source —
    * new files become micro-batches (bounded by maxFilesPerTrigger), and
    * the checkpointed file-source log gives exactly-once per file, which
    * is exactly-once per record because records live in exactly one
    * file. Compose with ExtractStream for crawl-to-text streaming. */
  def readStream(spark: SparkSession, pathGlob: String,
                 maxFilesPerTrigger: Int = 64): DataFrame = {
    import spark.implicits._
    // file stream sources require an explicit schema; binaryFile's is fixed
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    toPages(spark,
      spark.readStream.format("binaryFile")
        .schema(binaryFileSchema)
        .option("maxFilesPerTrigger", maxFilesPerTrigger)
        .option("pathGlobFilter", "*.warc*")
        .load(pathGlob)
        .select(col("content")).as[Array[Byte]])
  }
}
