package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus search primitives a training-data pipeline uses for targeted
 * retrieval (contamination lookups, eval-set leakage checks, topical
 * slicing before sampling).
 *
 * BM25 is expressed fully relationally — term-frequency, document
 * frequency, document length and the corpus aggregates are each one
 * aggregation, composed with broadcast joins on the (tiny) term-level
 * frames. At 10^12 rows: tf is one shuffle on (doc, term) over ONLY the
 * matching tokens (the `isin` filter prunes before the shuffle), dfreq
 * and corpus stats are scalar-sized, and scoring is a map-side
 * broadcast-join pass — the same shape an inverted-index engine
 * materializes, derived on the fly.
 */
object Search {

  /**
   * Okapi BM25 (Lucene's idf variant: ln(1 + (N − df + 0.5)/(df + 0.5)))
   * of every document against a bag of query terms. Emits one row per
   * document containing at least one term: (id, bm25).
   *
   * @param k1 term-frequency saturation (default 1.2)
   * @param b  length normalization (default 0.75)
   */
  def bm25(df: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // the token-array table is materialized ONCE (r8, the shingleTable
    // discipline): doc length, the corpus stats, term frequency and the
    // scoring join all derive from it as cheap checkpoint scans — the
    // pre-r8 lazy formulation re-ran the corpus tokenize pass once per
    // consumer (4 tokenizations per query)
    val toks = Mat.corpus(
      df.select(col(idCol).as("id"), Dedup.tokens(col(textCol)).as("t")))
    val dlen = toks.select(col("id"), size(col("t")).cast("double").as("dl"))
    // corpus scalars: one row, broadcast into the scoring pass
    val stats = dlen.agg(count(lit(1)).cast("double").as("n"), avg(col("dl")).as("avgdl"))
    val tf = toks.select(col("id"), explode(col("t")).as("tok"))
      .where(col("tok").isInCollection(terms)) // prune BEFORE the shuffle
      .groupBy(col("id"), col("tok"))
      .agg(count(lit(1)).cast("double").as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).cast("double").as("df"))
    tf.join(dlen, Seq("id"))
      .join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log((col("n") - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("w", col("idf") * col("tf") * lit(k1 + 1) /
        (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("id"))
      .agg(round(sum(col("w")), 4).as("bm25"))
  }
}
