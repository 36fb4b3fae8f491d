package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, StreamingQuery, Trigger}
import graft.extract.Page
import graft.pipeline.TextOps

/**
 * Stateful streaming operators for a continuous crawl pipeline:
 *
 *  - streaming exact dedup with WATERMARK-BOUNDED state
 *    (`dropDuplicatesWithinWatermark`): the state store only retains
 *    fingerprints inside the lateness horizon, so state size is bounded by
 *    arrival rate × watermark — the only shape that survives an unbounded
 *    stream (a plain dropDuplicates would grow state forever).
 *
 *  - per-host crawl accounting via `mapGroupsWithState` — the custom-state
 *    path (KeyValueGroupedDataset) for logic window aggregations can't
 *    express. State is one tiny record per host; hosts are the shuffle key
 *    so state is partitioned exactly like the input.
 */
object StatefulOps {

  /** Running per-host totals (custom state record). */
  case class HostState(docs: Long, bytes: Long)
  case class HostStat(host: String, docs: Long, bytes: Long)

  private val HostRe = "^[a-z]+://([^/]+)".r

  def hostOf(url: String): String =
    HostRe.findFirstMatchIn(if (url == null) "" else url)
      .map(_.group(1)).getOrElse("")

  /**
   * Streaming exact dedup: normalize-text fingerprint (same definition as
   * the batch `Dedup.exact` / q15, so batch and stream agree), keep the
   * first arrival per fingerprint within the watermark horizon.
   */
  def dedupQuery(spark: SparkSession, pagesDir: String, outDir: String,
                 checkpointDir: String, lateness: String = "24 hours",
                 trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val pages = spark.readStream
      .schema(ExtractStream.PageSchema)
      .parquet(pagesDir)
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withWatermark("warc_ts", lateness)
      .dropDuplicatesWithinWatermark("fp")
    pages
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()
  }

  /**
   * Per-host running crawl stats over a streaming Dataset[Page] —
   * `mapGroupsWithState` with explicit state (update output mode).
   * Takes the typed stream so tests can wire source/sink around it.
   */
  def hostStats(pages: Dataset[Page]): Dataset[HostStat] = {
    import pages.sparkSession.implicits._
    pages
      .groupByKey(p => hostOf(p.url))
      .mapGroupsWithState[HostState, HostStat](GroupStateTimeout.NoTimeout()) {
        (host, rows, state) =>
          var s = state.getOption.getOrElse(HostState(0L, 0L))
          rows.foreach { p =>
            s = HostState(s.docs + 1,
              s.bytes + (if (p.html == null) 0 else p.html.length.toLong))
          }
          state.update(s)
          HostStat(host, s.docs, s.bytes)
      }
  }

  /**
   * Stream–static enrichment join: the continuous-ingest shape where each
   * micro-batch of pages picks up attributes from a slowly-changing
   * dimension (host metadata, crawl policy, language priors). The static
   * side is broadcast into every micro-batch — no stream-side shuffle, no
   * state store; unknown keys survive via left join. At 10^12 rows the
   * dimension stays driver/broadcast-sized (hosts ≪ pages), which is why
   * this beats a stream-stream join for slowly-changing reference data.
   */
  def enrichWithHostDim(pages: DataFrame, hostDim: DataFrame): DataFrame =
    pages
      .withColumn("host", regexp_extract(col("url"), "^[a-z]+://([^/]+)", 1))
      .join(broadcast(hostDim), Seq("host"), "left")

  /** Streaming face of enrichWithHostDim: file source → parquet sink,
    * append mode (a per-row enrichment is stateless). */
  def enrichQuery(spark: SparkSession, pagesDir: String, hostDim: DataFrame,
                  outDir: String, checkpointDir: String,
                  trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    enrichWithHostDim(
      spark.readStream.schema(ExtractStream.PageSchema).parquet(pagesDir),
      hostDim)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(trigger)
      .start()

  /** Streaming face of hostStats: file source → memory/parquet sink is the
    * caller's choice; update mode required by mapGroupsWithState. */
  def hostStatsQuery(spark: SparkSession, pagesDir: String,
                     queryName: String, checkpointDir: String,
                     trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val pages = spark.readStream
      .schema(ExtractStream.PageSchema)
      .parquet(pagesDir)
      .select(col("url"), col("warc_ts"), col("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .as[Page]
    hostStats(pages)
      .writeStream
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .outputMode("update")
      .trigger(trigger)
      .start()
  }
}
