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

  /** Row-i bucket of a value: md5-60 over the SALTED value ("value#i") —
    * k fully independent hash functions (an affine family over one base
    * hash collapses: a*h+b mod 2^14 depends only on h's low bits, so all
    * k positions correlate and the Bloom FP rate degenerated to
    * n/m — caught by the FP-rate unit test). Oracle SQL computes the
    * identical salted md5. */
  private def saltedBucket(value: Column, i: Int, w: Int): Column =
    pmod(Dedup.md5Hash60(concat(value.cast("string"), lit(s"#$i"))), lit(w.toLong))

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
    df.select(explode(array((0 until d).map { i =>
        struct(lit(i).as("row"), saltedBucket(valueCol, i, w).as("bucket"))
      }: _*)).as("rb"))
      .groupBy(col("rb.row").as("row"), col("rb.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates against a built sketch: one row per DISTINCT value
    * of `valueCol` in `queries` — (v, cms_estimate), min over the d row
    * counters (0 when a counter row is absent). VALUE-keyed by design:
    * callers re-join wider payloads by value (the ids-only discipline —
    * the exploded probe shuffle carries values, never row payloads). */
  def cmsLookup(cms: DataFrame, queries: DataFrame, valueCol: Column,
                d: Int = 4, w: Int = 1024): DataFrame = {
    queries.select(valueCol.as("v")).distinct()
      .withColumn("__rb", explode(array((0 until d).map { i =>
        struct(lit(i).as("row"), saltedBucket(col("v"), i, w).as("bucket"))
      }: _*)))
      .join(broadcast(cms),
        col("__rb.row") === cms("row") && col("__rb.bucket") === cms("bucket"),
        "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_estimate"))
  }

  /**
   * Bloom filter over a value column — the "have we crawled this url"
   * membership structure a frontier keeps at bits-per-key cost. k
   * independent salted-md5 positions per value (as the CMS rows); the
   * filter is the DISTINCT set-position table, the
   * relational form of the bitmap (a deployment packs it into m/64
   * longs via groupBy(pos >> 6) + bit_or — same information, same
   * math). Membership = ALL k positions present: no false negatives,
   * false positives at ~(1 − e^(−kn/m))^k. Pure integer math —
   * reproduces exactly cross-engine (q44).
   */
  def bloomBuild(df: DataFrame, valueCol: Column,
                 m: Int = 16384, k: Int = 4): DataFrame = {
    df.select(explode(array((0 until k).map(i =>
        saltedBucket(valueCol, i, m)): _*)).as("pos"))
      .distinct()
  }

  /** Membership probe against a built filter: one row per DISTINCT value
    * — (v, bloom_hit), true iff all k positions are set. VALUE-keyed as
    * cmsLookup; the exploded probe join is broadcastable at any filter
    * size that fits m bits. */
  def bloomProbe(filter: DataFrame, probes: DataFrame, valueCol: Column,
                 m: Int = 16384, k: Int = 4): DataFrame = {
    val hits = filter.select(col("pos"), lit(1).as("__set"))
    probes.select(valueCol.as("v")).distinct()
      .withColumn("__pos", explode(array((0 until k).map(i =>
        saltedBucket(col("v"), i, m)): _*)))
      .join(broadcast(hits), col("__pos") === hits("pos"), "left")
      .groupBy(col("v"))
      .agg((sum(coalesce(col("__set"), lit(0))) === k).as("bloom_hit"))
  }

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
