package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.Pack

/** Sequence packing: per-shard prefix-sum placement and chunk occupancy
  * invariants on planted corpora (the q60/q61 oracles gate the
  * relational path over real data). */
class PackSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def text(tokens: Int): String =
    (0 until tokens).map(j => s"w$j").mkString(" ")

  test("single shard: offsets are the exact prefix sums in id order; " +
    "chunk spans are the floor divisions") {
    val df = docsDf(Seq(
      (1L, text(10)), (2L, text(20)), (3L, text(5)), (4L, text(40))))
    val p = Pack.packChunks(df, "doc_id", "text",
      chunkTokens = 16, shards = 1).collect()
      .map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("tokens"), r.getAs[Long]("tok_offset"),
          r.getAs[Long]("chunk_first"), r.getAs[Long]("chunk_last"))))
      .toMap
    assert(p(1L) == ((10L, 0L, 0L, 0L)))   // tokens 0..9   -> chunk 0
    assert(p(2L) == ((20L, 10L, 0L, 1L)))  // tokens 10..29 -> chunks 0-1
    assert(p(3L) == ((5L, 30L, 1L, 2L)))   // tokens 30..34 -> chunks 1-2
    assert(p(4L) == ((40L, 35L, 2L, 4L)))  // tokens 35..74 -> chunks 2-4
  }

  test("chunkStats: every chunk but the shard's last is exactly full; " +
    "totals and doc-touch counts are conserved") {
    val df = docsDf((1L to 50L).map(i => (i, text(1 + (i % 13).toInt))))
    val chunkTokens = 16
    val packed = Pack.packChunks(df, "doc_id", "text",
      chunkTokens = chunkTokens, shards = 4)
    val stats = Pack.chunkStats(packed, chunkTokens).collect()
      .map(r => (r.getAs[Int]("shard"), r.getAs[Long]("chunk"),
        r.getAs[Long]("docs"), r.getAs[Long]("tokens")))
    // per shard: all chunks full except the last
    stats.groupBy(_._1).foreach { case (_, rows) =>
      val byChunk = rows.sortBy(_._2)
      byChunk.init.foreach(r => assert(r._4 == chunkTokens, r.toString))
      assert(byChunk.last._4 <= chunkTokens)
      // chunk ids are contiguous from 0
      assert(byChunk.map(_._2).toSeq == (0L until byChunk.length).toSeq)
    }
    // token conservation: chunk tokens sum to the corpus token count
    val total = packed.agg(sum("tokens")).head.getLong(0)
    assert(stats.map(_._4).sum == total)
    // doc-touch conservation: sum of docs per chunk = sum over docs of
    // chunks touched
    val touches = packed
      .agg(sum(col("chunk_last") - col("chunk_first") + 1)).head.getLong(0)
    assert(stats.map(_._3).sum == touches)
  }

  test("appendChunks ≡ packChunks over the concatenation when batch ids " +
    "sort after the stream; committed placements never move") {
    val all = (1L to 40L).map(i => (i, text(3 + (i % 9).toInt)))
    val (first, second) = (all.take(25), all.drop(25))
    val chunkTokens = 16
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select("id", "shard", "tokens", "tok_offset", "chunk_first",
        "chunk_last").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
    val existing = Pack.packChunks(docsDf(first), "doc_id", "text",
      chunkTokens, shards = 4)
    val appended = Pack.appendChunks(existing, docsDf(second), "doc_id",
      "text", chunkTokens, shards = 4)
    val full = Pack.packChunks(docsDf(all), "doc_id", "text",
      chunkTokens, shards = 4)
    assert(rows(existing) ++ rows(appended) == rows(full))
    // appending to an empty table is a plain pack
    val fromEmpty = Pack.appendChunks(existing.limit(0),
      docsDf(second), "doc_id", "text", chunkTokens, shards = 4)
    assert(rows(fromEmpty) == rows(Pack.packChunks(docsDf(second),
      "doc_id", "text", chunkTokens, shards = 4)))
  }

  test("sharding is deterministic and respects the algo convention; " +
    "packing a shard is independent of other shards' contents") {
    val df = docsDf((1L to 30L).map(i => (i, text(7))))
    val p1 = Pack.packChunks(df, "doc_id", "text", 16, 4).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("tok_offset"))).sortBy(_._1).toSeq
    val p2 = Pack.packChunks(df, "doc_id", "text", 16, 4).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("tok_offset"))).sortBy(_._1).toSeq
    assert(p1 == p2)
    // drop every doc of one shard: the OTHER shards' placements are
    // byte-identical (append/repack touches only the shards it hits)
    val dropShard = p1.head._2
    val kept = df.where(
      Pack.shardOf(col("doc_id"), 4) =!= dropShard)
    val p3 = Pack.packChunks(kept, "doc_id", "text", 16, 4).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("shard"),
        r.getAs[Long]("tok_offset"))).sortBy(_._1).toSeq
    assert(p3 == p1.filterNot(_._2 == dropShard))
  }
}
