package graft.job

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.TextOps

/**
 * Standalone tokenizer training over any table with a `text` column
 * (extracted output, curated output, or the raw documents table) — the
 * same leg CurateJob runs as its stage 8, as its own spark-submit entry
 * point for pipelines that train the tokenizer separately from
 * curation (the common deployment: curate once, sweep tokenizer sizes).
 *
 * The learn is the batched BPE loop (TextOps.bpeLearnBatched — output
 * identical to the sequential definition, O(merges/batchK) Spark
 * rounds); segmentation applies the learned cascade over the DISTINCT
 * vocabulary in chunks (analyzer-safe at 10k+ merges). Artifacts:
 * `<out>/_bpe_merges` (ordered merge table) and `<out>/_bpe_vocab`
 * (piece, cnt, bpe_tokens). Prints one JSON line with sizes + wall
 * times (the shape graft.Bench emits).
 *
 * Usage: TokenizerJob <docsParquet> <outDir> [--merges N] [--batch K]
 *          [--text-col c]   (e.g. --text-col extracted_text over
 *                            ExtractJob output)
 */
object TokenizerJob {

  def main(args: Array[String]): Unit = {
    val pos = JobArgs.parse(args,
      valueFlags = Set("--merges", "--batch", "--text-col"),
      boolFlags = Set.empty,
      usage = "usage: TokenizerJob <docsParquet> <outDir> [--merges N] " +
        "[--batch K] [--text-col c]")
    require(pos.length >= 2,
      "usage: TokenizerJob <docsParquet> <outDir> [--merges N] [--batch K] " +
        "[--text-col c]")
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val merges = opt("--merges").map(_.toInt).getOrElse(1000)
    val batchK = opt("--batch").map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

    val spark = SparkSession.builder()
      .appName("graft-tokenizer")
      .master(sys.env.getOrElse("SPARK_MASTER", s"local[$cpus]"))
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println(run(spark, pos(0), pos(1), merges, batchK,
      textCol = opt("--text-col").getOrElse("text")))
    spark.stop()
  }

  /** Runs learn + segment, writes both artifacts, returns the JSON line.
    * Timing scope: `learn_sec` (and the merges/sec headline) covers the
    * batched learn ALONE — bpeLearnBatched runs its rounds eagerly, so
    * it is complete when the call returns; corpus tokenization +
    * vocabulary materialization are reported separately as `prep_sec`. */
  def run(spark: SparkSession, docsPath: String, outDir: String,
          merges: Int, batchK: Int = 64, textCol: String = "text"): String = {
    val t0 = System.nanoTime()
    val pieces = TextOps.bpePieces(
      spark.read.parquet(docsPath).select(col(textCol)), col(textCol))
      .localCheckpoint(true) // feeds the iterated learn AND the segment
    val nPieces = pieces.count()
    val tPrep = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val learned = TextOps.bpeLearnBatched(pieces, merges, batchK)
    val nLearned = learned.count() // eager by construction; count is free
    val tLearn = (System.nanoTime() - t1) / 1e9
    writeArtifacts(spark, pieces, learned, outDir)
    val tTotal = (System.nanoTime() - t0) / 1e9
    f"""{"metric":"bpe_merges_per_sec","value":${nLearned / tLearn}%.1f,"unit":"merges/sec","pieces":$nPieces,"merges_learned":$nLearned,"batch_k":$batchK,"prep_sec":$tPrep%.2f,"learn_sec":$tLearn%.2f,"total_sec":$tTotal%.2f}"""
  }

  /** The ONE definition of the tokenizer artifact layout, shared by this
    * job and CurateJob stage 8: `<out>/_bpe_merges` (ordered merge
    * table) + `<out>/_bpe_vocab` (piece, cnt, bpe_tokens segmented once
    * under the learned cascade). */
  private[job] def writeArtifacts(spark: SparkSession,
                                  pieces: org.apache.spark.sql.DataFrame,
                                  learned: org.apache.spark.sql.DataFrame,
                                  outDir: String): Unit = {
    learned.write.mode(SaveMode.Overwrite).parquet(s"$outDir/_bpe_merges")
    val ms = learned.orderBy(col("round")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    TextOps.bpeSegmentCounts(pieces.select(col("piece")), ms)
      .join(pieces, Seq("piece"))
      .select(col("piece"), col("cnt"), col("bpe_tokens"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/_bpe_vocab")
  }
}
