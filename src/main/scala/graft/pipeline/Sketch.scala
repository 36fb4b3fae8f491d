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
  /** CMS row-i bucket of a value: affine Carter-Wegman over the md5-60
    * hash reduced mod 2^31 (same family and constants as the minhash
    * signatures — Dedup.hashParams — so oracle SQL embeds identical
    * a/b values; pure integer math, overflow-safe under ANSI since
    * a < 2^31 and h' < 2^31). */
  private def cmsBucket(h: Column, a: Long, b: Long, w: Int): Column =
    pmod((lit(a) * pmod(h, lit(2147483647L)) + lit(b)) % lit(Dedup.MersennePrime),
      lit(w.toLong))

  /**
   * Count-min sketch over a value stream: d×w integer counters; an
   * item's estimate is the MIN of its d row counters — always ≥ the true
   * count, within εN with probability 1−δ for w = e/ε, d = ln(1/δ).
   * The fixed-size counter table is the frequency/heavy-hitter state a
   * pipeline keeps where exact per-token counts would be another
   * full-vocabulary shuffle. Pure integer math end-to-end — the sketch
   * reproduces EXACTLY cross-engine (q43).
   */
  def cmsBuild(df: DataFrame, valueCol: Column,
               d: Int = 4, w: Int = 1024): DataFrame = {
    val params = Dedup.hashParams(d)
    val h = Dedup.md5Hash60(valueCol)
    df.select(explode(array(params.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"), cmsBucket(h, a, b, w).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `queries`' values against a built sketch:
    * min over the d row counters (0 when a counter row is absent). */
  def cmsLookup(cms: DataFrame, queries: DataFrame, valueCol: Column,
                d: Int = 4, w: Int = 1024): DataFrame = {
    val params = Dedup.hashParams(d)
    val h = Dedup.md5Hash60(valueCol)
    queries
      .withColumn("__rb", explode(array(params.zipWithIndex.map { case ((a, b), i) =>
        struct(lit(i).as("row"), cmsBucket(h, a, b, w).as("bucket"))
      }: _*)))
      .join(broadcast(cms),
        col("__rb.row") === cms("row") && col("__rb.bucket") === cms("bucket"),
        "left")
      .drop("row", "bucket", "__rb")
      .groupBy(queries.columns.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

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
