package graft.job

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.extract.Page

/**
 * Iceberg-layout pages table emulated with partitioned Parquet (no Iceberg
 * runtime jar in this sandbox — SURVEY.md §1.2). Layout mirrors Iceberg's
 * `days(warc_ts)` / `bucket(NB, url)` transforms:
 *
 *   pages/warc_day=YYYY-MM-DD/url_bucket=N/part-*.parquet
 *
 * On a real cluster this facade is a drop-in swap for an
 * `iceberg-spark-runtime` catalog table with
 * `PARTITIONED BY (days(warc_ts), bucket(NB, url))`. Partition pruning on
 * `warc_day`/`url_bucket` is handled by the Parquet datasource exactly as
 * Iceberg would prune manifests.
 */
object PageTableIO {

  val DefaultBuckets = 64

  /** Columns the extractor actually reads — project BEFORE the typed map,
    * since `Dataset.map` is a pushdown barrier (SURVEY.md §4.2). */
  val ExtractColumns: Seq[String] = Seq("url", "warc_ts", "html", "text", "lang")

  def addLayoutColumns(df: DataFrame, numBuckets: Int = DefaultBuckets): DataFrame =
    df.withColumn("warc_day", to_date(col("warc_ts")))
      .withColumn("url_bucket", pmod(xxhash64(col("url")), lit(numBuckets)).cast("int"))

  def write(df: DataFrame, path: String, numBuckets: Int = DefaultBuckets,
            mode: String = "overwrite"): Unit =
    addLayoutColumns(df, numBuckets)
      .write.mode(mode)
      .partitionBy("warc_day", "url_bucket")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Typed read of only the extract-relevant columns (column pruning reaches
    * the parquet scan; check `.explain` ReadSchema). */
  def readPages(spark: SparkSession, path: String): Dataset[Page] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(col("url"), col("warc_ts"), col("html"),
        coalesce(col("text"), lit("")).as("text"),
        coalesce(col("lang"), lit("")).as("lang"))
      .as[Page]
  }
}
