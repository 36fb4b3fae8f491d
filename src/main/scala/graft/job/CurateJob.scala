package graft.job

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Sampling, TextOps}

/**
 * The COMPLETE crawl-to-training-set pipeline as one spark-submit job —
 * the composition a 100 TB deployment actually runs, built entirely from
 * the library's own operators:
 *
 *   1. extract     pages/WARC → extracted text (ExtractJob.run: salted
 *                  shuffle, map-only extraction, resumable, metrics)
 *   2. exact dedup fingerprint (md5 of normalized text) keep-first —
 *                  one shuffle on a 16-byte key
 *   3. near dedup  MinHash-LSH pairs → connected components → keep each
 *                  cluster's min url (bucketed equi-joins + O(log d)
 *                  pointer doubling; ids only through every shuffle)
 *   4. quality     qualityScore ≥ minQuality AND repetition gates
 *                  (dup_3gram_frac / top_2gram_frac below thresholds —
 *                  the Gopher-style degenerate-text drop)
 *   5. decontam    drop docs whose 8-gram span containment against a
 *                  held-out eval set exceeds maxContamination (skipped
 *                  when no eval table is given)
 *   6. sample      deterministic per-language stratified quota
 *                  (WindowGroupLimit partial top-n)
 *   7. write       curated rows + a per-stage funnel report
 *                  (<out>/_funnel.json) so every drop is accounted for
 *
 * Every stage is a DataFrame transform over the previous stage's columns
 * — one linear plan per stage boundary, no driver-side row data, and the
 * same operators the oracled queries pin (q13/q15/q17/q26/q30/q50/q51).
 *
 * Usage: CurateJob <pagesDir> <outDir> [--eval <parquet with url,text>]
 *          [--quota N] [--min-quality Q] [--partitions N] [--warc]
 */
object CurateJob {

  final case class Thresholds(minQuality: Double = 0.3,
                              maxDup3Gram: Double = 0.5,
                              maxTop2Gram: Double = 0.2,
                              maxContamination: Double = 0.2,
                              quotaPerLang: Int = 1000)

  def main(args: Array[String]): Unit = {
    val valueFlags = Set("--quota", "--min-quality", "--partitions", "--eval")
    // index-walking parse: a value-flag consumes exactly its next token,
    // so a flag VALUE that string-equals a positional can never swallow
    // the positional (indexOf-based filtering did)
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      if (valueFlags.contains(args(i))) {
        require(i + 1 < args.length && !args(i + 1).startsWith("--"),
          s"${args(i)} requires a value")
        i += 2
      } else {
        if (!args(i).startsWith("--")) pos += args(i)
        i += 1
      }
    }
    require(pos.length >= 2,
      "usage: CurateJob <pagesDir> <outDir> [--eval <parquet>] [--quota N] " +
        "[--min-quality Q] [--partitions N] [--warc]")
    val (pagesDir, outDir) = (pos(0), pos(1))
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .appName("graft-curate")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val th = Thresholds(
      minQuality = opt("--min-quality").map(_.toDouble).getOrElse(0.3),
      quotaPerLang = opt("--quota").map(_.toInt).getOrElse(1000))
    val partitions = opt("--partitions").map(_.toInt).getOrElse(cpus.toInt * 2)
    val funnel = run(spark, pagesDir, outDir, partitions, th,
      evalPath = opt("--eval"),
      warcInput = args.contains("--warc"))
    println(funnel)
    spark.stop()
  }

  /** Runs the full pipeline; returns the funnel JSON (also written to
    * `<out>/_funnel.json`). */
  def run(spark: SparkSession, pagesDir: String, outDir: String,
          partitions: Int, th: Thresholds = Thresholds(),
          evalPath: Option[String] = None,
          warcInput: Boolean = false): String = {

    // 1. extraction (the engine itself; resumable, observed metrics)
    ExtractJob.run(spark, pagesDir, outDir, partitions, resume = false,
      warcInput = warcInput)
    val extracted = spark.read.parquet(s"$outDir/extracted")
      .where(col("status") === "ok")
      .select(col("url"), col("warc_ts"), col("extracted_text").as("text"))
      .localCheckpoint(true) // every later stage re-reads this frame
    val nExtracted = extracted.count()

    // 2. exact dedup: fingerprint keep-first (min url per fingerprint);
    // checkpointed — the count, the LSH shingling and the keep anti-join
    // all consume it (without it the full-corpus window shuffle re-runs
    // three times)
    val exactKeep = extracted
      .withColumn("fp", TextOps.fingerprint(col("text")))
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("fp")).orderBy(col("url"))))
      .where(col("__r") === 1).drop("__r", "fp")
      .localCheckpoint(true)
    val nExact = exactKeep.count()

    // 3. near dedup: LSH pairs → clusters → keep each cluster's min url
    val pairs = Dedup.minhashLsh(exactKeep, "url", "text")
    val clusters = Dedup.duplicateClusters(pairs.select("id_a", "id_b"))
    val nearKeep = exactKeep.join(
      clusters.where(col("id") =!= col("component"))
        .select(col("id").as("url")),
      Seq("url"), "left_anti")
      .localCheckpoint(true)
    val nNear = nearKeep.count()

    // 4. quality + repetition gates
    val rep = TextOps.repetitionStats(nearKeep, "url", "text")
      .select(col("id").as("url"), col("dup_3gram_frac"), col("top_2gram_frac"))
    val scored = nearKeep
      .withColumn("quality", TextOps.qualityScore(col("text")))
      .withColumn("lang", TextOps.langId(col("text")))
      .join(rep, Seq("url"), "left") // single-token docs carry no stats
    val qualityKeep = scored.where(
      col("quality") >= th.minQuality &&
        coalesce(col("dup_3gram_frac") <= th.maxDup3Gram, lit(true)) &&
        coalesce(col("top_2gram_frac") <= th.maxTop2Gram, lit(true)))
      .drop("dup_3gram_frac", "top_2gram_frac")
      .localCheckpoint(true)
    val nQuality = qualityKeep.count()

    // 5. decontamination vs a held-out eval set. The fraction is
    // normalized by the BENCHMARK doc's span count — "does this training
    // candidate contain ≥ X of some eval doc" — NOT by the candidate's
    // own length: a 10,000-span page that verbatim embeds a 500-span
    // benchmark must be dropped even though the overlap is only 5% of
    // the page (the candidate-normalized fraction would wave it through).
    val decontamKeep = evalPath match {
      case None => qualityKeep
      case Some(p) =>
        val eval = spark.read.parquet(p).select(col("url"), col("text"))
        val benchSpanCounts = eval.select(col("url").as("bench_id"),
          size(Dedup.shingleHashes(col("text"), n = 8)).as("bench_spans"))
        // pairs: (eval_id = benchmark id, train_id = candidate id, shared)
        val shared = Dedup.spanContaminationPairs(
          train = qualityKeep, eval = eval, idCol = "url", textCol = "text")
        val contaminated = shared
          .join(benchSpanCounts, shared("eval_id") === benchSpanCounts("bench_id"))
          .where(col("shared_spans").cast("double") / col("bench_spans")
            > th.maxContamination)
          .select(col("train_id").as("url")).distinct()
        qualityKeep.join(contaminated, Seq("url"), "left_anti")
          .localCheckpoint(true)
    }
    val nDecontam = decontamKeep.count()

    // 6. deterministic per-language stratified quota
    val sampled = Sampling.stratifiedQuota(decontamKeep,
      strataCols = Seq("lang"), idCol = "url", n = th.quotaPerLang)
    // 7. curated output + token budget
    val curated = sampled
      .withColumn("bpe_tokens", TextOps.bpeTokenCount(col("text")))
      .select(col("url"), col("warc_ts"), col("lang"), col("quality"),
        col("sample_rank"), col("bpe_tokens"), col("text"))
      .localCheckpoint(true) // count + write from the materialized frame
    val nFinal = curated.count() // a 0-row partitioned dir can't be re-read
    curated.write.mode(SaveMode.Overwrite).partitionBy("lang")
      .parquet(s"$outDir/curated")

    val funnel =
      s"""{"extracted":$nExtracted,"after_exact_dedup":$nExact,""" +
        s""""after_near_dedup":$nNear,"after_quality":$nQuality,""" +
        s""""after_decontam":$nDecontam,"curated":$nFinal}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$outDir/_funnel.json"), funnel)
    funnel
  }
}
