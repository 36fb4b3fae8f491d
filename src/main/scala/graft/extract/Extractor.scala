package graft.extract

/** Input row shape per BASELINE.json `input_hint` (Common-Crawl-style page). */
final case class Page(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

final case class Annotated(text: String, annotations: Seq[String])

final case class ExtractMetrics(
    candidates_scored: Long,
    nodes_pruned: Long,
    bytes_in: Long,
    bytes_out: Long,
    parse_ms: Long)

/** Output row — `extracted_text` is the byte-identical comparison surface
  * (FIXTURES.md §1): paragraph chunks joined with " ", paragraphs joined
  * with "\n\n". */
final case class Extracted(
    url: String,
    warc_ts: java.sql.Timestamp,
    extracted_text: String,
    readable_html: String,
    paragraphs: Seq[Seq[Annotated]],
    title: String,
    status: String,
    metrics: ExtractMetrics)

/**
 * The whole reference algorithm as one deterministic per-row function —
 * the Spark job is `ds.map(Extractor.extract)` (SURVEY.md §3.1): map-only,
 * no shuffle, whole-stage-codegen'd around the call.
 */
object Extractor {

  /** Documents larger than this are not parsed (bounded per-task memory at
    * 10^12-row scale); they get status="oversize". */
  val MaxHtmlBytes: Int = 16 * 1024 * 1024

  def extract(page: Page): Extracted = {
    val t0 = System.nanoTime()
    val bytesIn = if (page.html == null) 0 else page.html.length
    if (page.html == null || bytesIn == 0) {
      return errorRow(page, "parsing-error", bytesIn, t0)
    }
    if (bytesIn > MaxHtmlBytes) {
      return errorRow(page, "oversize", bytesIn, t0)
    }
    try {
      val article = Article.fromBytes(page.html, page.url)
      val paragraphs = article.mainText
      val readableHtml = article.readable
      val status = if (article.isParseError) "parsing-error" else "ok"
      val text = flatten(paragraphs)
      val parseMs = (System.nanoTime() - t0) / 1000000L
      Extracted(
        url = page.url,
        warc_ts = page.warc_ts,
        extracted_text = text,
        readable_html = readableHtml,
        paragraphs = paragraphs.map(_.map(c =>
          Annotated(c.text, if (c.annotations == null) null else c.annotations))),
        title = article.title,
        status = status,
        metrics = ExtractMetrics(
          candidates_scored = if (article.candidates == null) 0L else article.candidates.size.toLong,
          nodes_pruned = article.nodesPruned,
          bytes_in = bytesIn.toLong,
          bytes_out = text.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong,
          parse_ms = parseMs))
    } catch {
      case _: Throwable => errorRow(page, "error", bytesIn, t0)
    }
  }

  /** Canonical text flattening (FIXTURES.md §1). */
  def flatten(paragraphs: List[AnnotatedText.Paragraph]): String =
    paragraphs.map(p => p.map(_.text).mkString(" ")).mkString("\n\n")

  private def errorRow(page: Page, status: String, bytesIn: Long, t0: Long): Extracted =
    Extracted(
      url = page.url,
      warc_ts = page.warc_ts,
      extracted_text = "",
      readable_html = """<div id="readabilityBody" class="parsing-error"></div>""",
      paragraphs = Nil,
      title = "",
      status = status,
      metrics = ExtractMetrics(0L, 0L, bytesIn, 0L, (System.nanoTime() - t0) / 1000000L))
}
