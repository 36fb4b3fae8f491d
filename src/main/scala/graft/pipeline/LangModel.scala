package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * N-gram language-model perplexity scoring — the CCNet-style corpus
 * filter (Wenzek et al. 2020: score every crawled document by the
 * perplexity of an LM trained on a trusted reference corpus; keep the
 * low-perplexity head). The classic production formulation trains a
 * 5-gram KenLM; this is the same signal as a RELATIONAL bigram model
 * with stupid backoff (Brants et al. 2007 — "Large Language Models in
 * Machine Translation": backoff weight a fixed 0.4, no normalization,
 * chosen because it matches Kneser-Ney quality at web scale while
 * keeping the model two count tables).
 *
 * Scale shape (the reason this is relational, not a driver-side model):
 *
 *  - training = ONE corpus pass (adjacent-pair explode) + two
 *    aggregations; the model is two count tables keyed by vocabulary
 *    (bigram table ≪ corpus for natural language — Heaps' law);
 *  - scoring = the document pair stream joined against the two count
 *    tables (bounded-key hash equi-joins; the unigram side
 *    auto-broadcasts when small) + one per-doc aggregation;
 *  - nothing corpus-sized ever reaches the driver: only the (N, V)
 *    scalars (one 1-row aggregate).
 *
 * Determinism / oracle gate: every probability is a ratio of exact
 * integer counts (double division is bit-identical cross-engine); ln
 * may differ by an ulp between JVM and libm, and the per-doc float sum
 * reorders — both absorbed by round(·, 4) on the per-doc MEAN (the q37
 * BM25 precedent: ~1e-13 absolute error vs a 1e-4 rounding grain).
 *
 * Token pairs use the oracled tokenizer (Dedup.tokens: lower/trim,
 * Java∩RE2 whitespace class) and CODEGEN array ops (slice + arrays_zip
 * + explode) — no higher-order functions in the corpus pass.
 */
object LangModel {

  /** A trained bigram model: `bigrams` (w1, w2, c2), `unigrams` (w, c1),
    * `n` = total training tokens, `v` = distinct training vocabulary. */
  case class LmModel(bigrams: DataFrame, unigrams: DataFrame,
                     n: Long, v: Long)

  /** Adjacent-token pairs (id, w1, w2), one row per transition.
    * Documents with < 2 tokens yield no rows (slice of length nt−1 = 0
    * is empty; the all-whitespace document's single "" token never
    * pairs). */
  def tokenPairs(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.tokens(col(textCol))
    val nt = size(toks)
    val zipped = arrays_zip(
      slice(toks, lit(1), nt - 1).as("w1"),
      slice(toks, lit(2), nt - 1).as("w2"))
    df.select(col(idCol).as("id"), explode(zipped).as("p"))
      .select(col("id"), col("p.w1").as("w1"), col("p.w2").as("w2"))
      .where(length(col("w1")) > 0 && length(col("w2")) > 0)
  }

  /** Train the bigram model over a reference corpus: one pair explode +
    * two counted aggregations (materialized via Mat.corpus — for web
    * text the bigram table is the largest model artifact and feeds
    * two scalar reads plus every scoring join). */
  def train(df: DataFrame, idCol: String, textCol: String): LmModel = {
    val bigrams = Mat.corpus(
      tokenPairs(df, idCol, textCol)
        .groupBy("w1", "w2").agg(count(lit(1)).as("c2")))
    val unigrams = Mat.corpus(
      df.select(explode(Dedup.tokens(col(textCol))).as("w"))
        .where(length(col("w")) > 0)
        .groupBy("w").agg(count(lit(1)).as("c1")))
    val totals =
      unigrams.agg(coalesce(sum("c1"), lit(0L)).as("n"),
        count(lit(1)).as("v")).head()
    val (n, v) = (totals.getLong(0), totals.getLong(1))
    // loud, actionable failure instead of a MatchError on Row(null, 0)
    require(n > 0L,
      "LangModel.train: the reference corpus has no tokens " +
        "(empty table, or every text row is empty/whitespace)")
    LmModel(bigrams, unigrams, n, v)
  }

  /**
   * Score documents against a trained model. Stupid backoff:
   *
   *   p(w2|w1) = c2(w1,w2) / c1(w1)                 if the bigram was seen
   *            = α · (c1(w2) + 1) / (N + V)          otherwise
   *
   * (add-one on the unigram so an out-of-vocabulary w2 keeps a finite
   * log — the +V in the denominator is the matching add-one mass).
   * Output: (id, pairs, avg_logp, ppl) with avg_logp = mean ln p over
   * the document's transitions and ppl = exp(−avg_logp), both rounded
   * to 4. Documents with no transitions (< 2 tokens) are absent.
   */
  def perplexity(docs: DataFrame, model: LmModel,
                 idCol: String, textCol: String,
                 alpha: Double = 0.4): DataFrame = {
    val pairs = tokenPairs(docs, idCol, textCol)
    val u1 = model.unigrams.select(col("w").as("w1"), col("c1").as("c1w1"))
    val u2 = model.unigrams.select(col("w").as("w2"), col("c1").as("c1w2"))
    val nv = (model.n + model.v).toDouble
    val p = when(col("c2").isNotNull,
        col("c2").cast("double") / col("c1w1").cast("double"))
      .otherwise(
        (lit(alpha) * (coalesce(col("c1w2"), lit(0L)) + lit(1L)).cast("double"))
          / lit(nv))
    val lpSum = sum(col("lp"))
    val cnt = count(lit(1))
    pairs
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(u1, Seq("w1"), "left")
      .join(u2, Seq("w2"), "left")
      .select(col("id"), log(p).as("lp"))
      .groupBy("id").agg(
        cnt.as("pairs"),
        round(lpSum / cnt, 4).as("avg_logp"),
        round(exp(-(lpSum / cnt)), 4).as("ppl"))
  }

  /** Persist a model: both count tables with (n, v) stamped on every
    * row — the sketch-family convention, so a load can fail loudly on
    * parameter-mixed tables instead of silently mis-scoring. */
  def saveLm(model: LmModel, path: String): Unit = {
    model.bigrams.withColumn("n", lit(model.n)).withColumn("v", lit(model.v))
      .write.mode("overwrite").parquet(s"$path/bigrams")
    model.unigrams.withColumn("n", lit(model.n)).withColumn("v", lit(model.v))
      .write.mode("overwrite").parquet(s"$path/unigrams")
  }

  /** Load a persisted model; fails loudly when the stamped (n, v)
    * params are mixed within or across the two tables. */
  def loadLm(spark: SparkSession, path: String): LmModel = {
    val bg = spark.read.parquet(s"$path/bigrams")
    val ug = spark.read.parquet(s"$path/unigrams")
    def params(df: DataFrame, which: String): (Long, Long) = {
      val rows = df.select(col("n"), col("v")).distinct().collect()
      require(rows.length == 1,
        s"mixed LM params in $path/$which: ${rows.mkString(", ")}")
      (rows(0).getLong(0), rows(0).getLong(1))
    }
    val (n, v) = params(ug, "unigrams")
    val (nb, vb) = params(bg, "bigrams")
    require(nb == n && vb == v,
      s"LM param mismatch at $path: unigrams ($n,$v) vs bigrams ($nb,$vb)")
    LmModel(bg.drop("n", "v"), ug.drop("n", "v"), n, v)
  }
}
