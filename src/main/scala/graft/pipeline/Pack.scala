package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Fixed-context sequence PACKING for training-data export — the GPT-style
 * pretraining recipe: concatenate documents in a deterministic order and
 * cut the token stream into fixed-size chunks (chunk boundaries cross
 * document boundaries; the attention mask, not the packer, handles the
 * seams). The packer answers "which training examples does each document
 * land in" without materializing the token stream itself.
 *
 * Scale shape: a single global prefix sum is a scalability wall (one
 * ordered partition), so packing is per-SHARD — documents hash into
 * `shards` independent streams and each shard packs its own stream with
 * one window prefix-sum PARTITIONED BY shard. 100 TB packs as `shards`
 * independent ordered partitions (the parallelism dial: thousands at
 * cluster scale); chunk identity is (shard, chunk) so no cross-shard
 * coordination exists, and appending a new corpus batch repacks only
 * the shards it touches.
 *
 * Determinism: shard = pmod(hash(id), shards) with the Dedup algo
 * convention (xx64 production / md5-60 for oracled paths), stream order
 * is id asc within shard, token counts are TextOps.tokenCount (the q08
 * definition) — every value an exact integer, cross-engine
 * reproducible.
 */
object Pack {

  /** Deterministic shard assignment: pmod(hash(id), shards). */
  def shardOf(id: Column, shards: Int,
              algo: String = Dedup.AlgoXx64): Column = {
    val h = algo match {
      case Dedup.AlgoXx64 => xxhash64(id.cast("string"))
      case Dedup.AlgoMd5  => Dedup.md5Hash60(id.cast("string"))
      case other => throw new IllegalArgumentException(
        s"unknown shard hash algo '$other'")
    }
    pmod(h, lit(shards.toLong)).cast("int")
  }

  /** Per-document placement: (id, shard, tokens, tok_offset,
    * chunk_first, chunk_last). `tok_offset` = tokens before this doc in
    * its shard's stream; a doc occupies chunks
    * floor(tok_offset / C) .. floor((tok_offset + tokens − 1) / C).
    * Every input doc appears exactly once (tokenCount ≥ 1 — the empty
    * doc carries its single empty token, the q08 convention). */
  def packChunks(df: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int, shards: Int,
                 algo: String = Dedup.AlgoXx64): DataFrame = {
    require(chunkTokens > 0, s"chunkTokens must be positive: $chunkTokens")
    require(shards > 0, s"shards must be positive: $shards")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("id"),
        shardOf(col(idCol), shards, algo).as("shard"),
        TextOps.tokenCount(col(textCol)).cast("long").as("tokens"))
      .withColumn("tok_offset", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .withColumn("chunk_first", floor(col("tok_offset") / chunkTokens))
      .withColumn("chunk_last",
        floor((col("tok_offset") + col("tokens") - 1) / chunkTokens))
  }

  /** INCREMENTAL append: place `newDocs` AFTER an existing placement
    * table — each shard's new stream starts at the shard's current
    * token total, so committed placements never move (the ingest
    * discipline the MinHash/IVF indexes and sketch folds follow:
    * earlier batches are immutable, a crashed append just re-runs).
    * Returns the NEW rows only; union with `existing` for the full
    * table. Equivalent to packChunks over the concatenation when the
    * batch's ids sort after the existing stream's (the append
    * contract — enforce monotone ids, e.g. ingest timestamps, at the
    * call site; pinned in PackSpec). The per-shard base offsets are a
    * shards-sized aggregate (broadcast), so an append touches only the
    * batch. */
  def appendChunks(existing: DataFrame, newDocs: DataFrame,
                   idCol: String, textCol: String,
                   chunkTokens: Int, shards: Int,
                   algo: String = Dedup.AlgoXx64): DataFrame = {
    val base = existing.groupBy(col("shard"))
      .agg(max(col("tok_offset") + col("tokens")).as("__base"))
    packChunks(newDocs, idCol, textCol, chunkTokens, shards, algo)
      .join(base, Seq("shard"), "left")
      .withColumn("__b", coalesce(col("__base"), lit(0L)))
      .withColumn("tok_offset", col("tok_offset") + col("__b"))
      .withColumn("chunk_first", floor(col("tok_offset") / chunkTokens))
      .withColumn("chunk_last",
        floor((col("tok_offset") + col("tokens") - 1) / chunkTokens))
      .drop("__base", "__b")
  }

  /** Per-chunk occupancy from a packChunks frame: (shard, chunk, docs,
    * tokens) — the export manifest's unit; every chunk except possibly
    * each shard's last holds exactly `chunkTokens` tokens. The doc →
    * chunk expansion is span-sized (a doc touching m chunks costs m
    * rows, m ≤ tokens/C + 1). */
  def chunkStats(packed: DataFrame, chunkTokens: Int): DataFrame =
    packed.select(col("shard"), col("tokens"), col("tok_offset"),
        explode(sequence(col("chunk_first"), col("chunk_last"))).as("chunk"))
      .withColumn("overlap",
        least(col("tok_offset") + col("tokens"),
          (col("chunk") + 1) * chunkTokens)
          - greatest(col("tok_offset"), col("chunk") * chunkTokens))
      .groupBy(col("shard"), col("chunk"))
      .agg(count(lit(1)).as("docs"), sum(col("overlap")).as("tokens"))
}
