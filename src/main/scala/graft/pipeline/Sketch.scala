package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed sketches for corpus profiling. At 10^12 rows, exact
 * distinct counts (vocabulary size, distinct urls/hosts per slice) need
 * a full shuffle of every distinct value; a HyperLogLog register table
 * is a few KB per group and merges associatively — the standard way a
 * crawl pipeline tracks cardinalities continuously.
 *
 * This HLL is built from DETERMINISTIC, cross-engine-reproducible
 * primitives (md5-60bit hashes, integer-exact rank-of-first-set-bit via
 * bin()-string length, fixed register math) so the whole sketch — not
 * just its contract — verifies against DuckDB (q41). Spark's built-in
 * approx_count_distinct (HLL++) uses engine-private hashing and cannot
 * be oracled; this one can, at the same O(m) state cost.
 */
object Sketch {

  /**
   * Per-group HyperLogLog distinct estimate of `valueCol`.
   *
   * Register construction over the 60-bit md5 hash: bucket = top p bits;
   * rho = 1-based position of the first set bit in the remaining
   * (60−p) bits, or (60−p)+1 when they are all zero — computed
   * integer-exactly as (61−p) − length(bin(rest)) (no float log2).
   * Estimate = α·m²/Σ2^(−r) with empty registers contributing 2⁰, plus
   * the standard small-range linear-counting correction
   * (E ≤ 2.5m ∧ zeros > 0 ⇒ m·ln(m/zeros)).
   *
   * Plan shape: one partial-aggregating shuffle to (group, bucket) —
   * at most m rows per group survive — then a tiny per-group rollup.
   */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: Column,
                  p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 16, s"p=$p out of range")
    val m = 1 << p
    val width = 60 - p
    val h = Dedup.md5Hash60(valueCol)
    val bucket = shiftrightunsigned(h, width)
    val rest = h.bitwiseAND(lit((1L << width) - 1))
    val rho = when(rest === 0, lit(width + 1))
      .otherwise(lit(width + 1) - length(bin(rest)))
    val alpha = 0.7213 / (1 + 1.079 / m)
    df.select((groupCols.map(col) :+ bucket.as("bucket") :+ rho.as("rho")): _*)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(max(col("rho")).as("r"))
      .groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("r"))).as("sinv"), count(lit(1)).as("used"))
      .withColumn("rawE",
        lit(alpha * m.toDouble * m) / (col("sinv") + (lit(m) - col("used"))))
      .withColumn("zeros", lit(m) - col("used"))
      .withColumn("hll_estimate",
        round(when(col("rawE") <= 2.5 * m && col("zeros") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("zeros")))
          .otherwise(col("rawE")), 2))
      .select((groupCols.map(col) :+ col("hll_estimate")): _*)
  }
}
