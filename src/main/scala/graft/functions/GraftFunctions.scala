package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import graft.extract.{Article, Decode, ExtractMetrics, Extractor}

/**
 * SQL-callable surface (SURVEY.md §2.3 UDF/UDAF plan): the typed
 * `Dataset.map` is the primary path; these registered functions expose the
 * same per-document operators to `spark.sql(...)` callers. All are
 * deterministic (left as such so Catalyst may collapse/prune them).
 */
object GraftFunctions {

  /** Extracted main text of one HTML payload ("" on parse failure). */
  def extractText(html: Array[Byte], url: String): String = {
    if (html == null || html.isEmpty) return ""
    try {
      val a = Article.fromBytes(html, if (url != null && url.isEmpty) null else url)
      Extractor.flatten(a.mainText)
    } catch { case _: Throwable => "" }
  }

  /** Document title per OriginalDocument.title (document.py:145-151). */
  def extractTitle(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    try Article.fromBytes(html, null).title
    catch { case _: Throwable => "" }
  }

  /** Reference generate_hash_id (scoring.py:56-69): md5 of the serialized
    * node, first 8 hex chars. NOTE: values differ from lxml's because the
    * serialized bytes are ours; the reference semantics (stable, 8-hex,
    * content-addressed) are preserved. Exposed over whole documents. */
  def hashId(html: Array[Byte]): String = {
    val bytes =
      if (html == null) "None".getBytes("UTF-8")
      else try {
        graft.html.Serializer.toUnicode(
          graft.html.Parser.parseDocument(Decode.decodeHtml(html))).getBytes("UTF-8")
      } catch { case _: Throwable => "None".getBytes("UTF-8") }
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    md5.take(4).map(b => f"$b%02x").mkString
  }

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_extract_text",
      (html: Array[Byte], url: String) => extractText(html, url))
    spark.udf.register("graft_extract_title",
      (html: Array[Byte]) => extractTitle(html))
    spark.udf.register("graft_hash_id", (html: Array[Byte]) => hashId(html))
    spark.udf.register("graft_metrics_agg", MetricsAgg.udaf)
  }
}

/** Output of the metrics aggregation. */
final case class MetricsSummary(
    docs: Long, candidates_scored: Long, nodes_pruned: Long,
    bytes_in: Long, bytes_out: Long, max_parse_ms: Long)

/**
 * Typed UDAF (Aggregator) rolling up per-document ExtractMetrics — the
 * §2.3 "metrics rollup" as a reusable aggregate, complementing
 * Dataset.observe. Partial aggregation happens map-side like any
 * Catalyst agg.
 */
object MetricsAgg extends Aggregator[ExtractMetrics, MetricsSummary, MetricsSummary] {
  override def zero: MetricsSummary = MetricsSummary(0L, 0L, 0L, 0L, 0L, 0L)
  override def reduce(b: MetricsSummary, m: ExtractMetrics): MetricsSummary =
    MetricsSummary(b.docs + 1, b.candidates_scored + m.candidates_scored,
      b.nodes_pruned + m.nodes_pruned, b.bytes_in + m.bytes_in,
      b.bytes_out + m.bytes_out, math.max(b.max_parse_ms, m.parse_ms))
  override def merge(a: MetricsSummary, b: MetricsSummary): MetricsSummary =
    MetricsSummary(a.docs + b.docs, a.candidates_scored + b.candidates_scored,
      a.nodes_pruned + b.nodes_pruned, a.bytes_in + b.bytes_in,
      a.bytes_out + b.bytes_out, math.max(a.max_parse_ms, b.max_parse_ms))
  override def finish(r: MetricsSummary): MetricsSummary = r
  override def bufferEncoder: Encoder[MetricsSummary] = Encoders.product[MetricsSummary]
  override def outputEncoder: Encoder[MetricsSummary] = Encoders.product[MetricsSummary]

  def udaf = org.apache.spark.sql.functions.udaf(this)
}
