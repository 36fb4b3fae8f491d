package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
 * select raw-corpus documents whose hashed-n-gram distribution looks
 * like a trusted TARGET corpus. The production domain-matching step a
 * pretraining pipeline runs when it wants "more data shaped like
 * Wikipedia/books" out of a web crawl:
 *
 *   1. features: hashed unigram+bigram counts (the paper's feature
 *      space) — fixed `dim`, no vocabulary build;
 *   2. two bag-of-n-grams multinomials, target p̂ and raw q̂, add-one
 *      smoothed over the `dim` buckets;
 *   3. per-doc log importance weight  log w = Σ_f tf_f·(ln p̂_f − ln q̂_f);
 *   4. Gumbel top-k resampling: keep the n docs maximizing
 *      log w + Gumbel(u_id) — equivalent to sampling ∝ w without
 *      replacement, with u_id the md5-derived deterministic uniform the
 *      sampling family already uses (Sampling.weightedSample), so the
 *      selection is reproducible run-over-run and cross-engine.
 *
 * Scale shape: the feature explode is one corpus pass; both count
 * tables and the log-ratio table are dim-bounded (auto-broadcast);
 * scoring is one postings join + per-doc aggregation; the final top-k
 * is a distributed TakeOrdered (orderBy + limit), never a global
 * single-partition window. Nothing corpus-sized reaches the driver.
 *
 * Determinism / oracle gate: counts are exact integers, each log-ratio
 * is an ln of an exact integer ratio, and the Gumbel key is rounded to
 * 6 BEFORE ranking (the q55 precedent) so the (key desc, id asc) total
 * order is cross-engine reproducible; the summed-float ulps sit ~1e-13
 * under the 1e-6 rounding grain.
 */
object Dsir {

  /** Hashed unigram+bigram feature postings (id, f, tf). `algo` follows
    * Dedup's convention: xxhash64 for production, md5-60bit for oracled
    * paths. Bigrams are space-joined adjacent tokens (LangModel's pair
    * stream) — a doc with < 2 tokens still carries its unigrams. */
  def hashedNgramFeatures(df: DataFrame, idCol: String, textCol: String,
                          dim: Int,
                          algo: String = Dedup.AlgoXx64): DataFrame = {
    // ONE corpus tokenize pass for BOTH gram orders (r8; the union of a
    // unigram explode and LangModel.tokenPairs tokenized the corpus
    // twice): zip each token with its successor (null-padded at the
    // end), explode once per position, then expand each position to its
    // unigram plus — when a non-empty successor exists — its bigram.
    // Two codegen Generate steps, no interpreted HOFs; same gram
    // multiset as the union formulation (empty tokens excluded exactly
    // as before: unigrams require the token non-empty, bigrams require
    // BOTH sides non-empty — a pair with an empty w1 contributes its w2
    // unigram from w2's own position row), and the (id, f) groupBy is
    // order-insensitive, so counts are identical.
    val t = Dedup.tokens(col(textCol))
    val z = arrays_zip(
      t.as("w1"),
      concat(slice(t, lit(2), size(t) - 1), array(lit(null).cast("string")))
        .as("w2"))
    val grams = df
      .select(col(idCol).as("id"), explode(z).as("p"))
      .where(length(col("p.w1")) > 0)
      .select(col("id"), explode(
        when(col("p.w2").isNotNull && length(col("p.w2")) > 0,
          array(col("p.w1"), concat_ws(" ", col("p.w1"), col("p.w2"))))
          .otherwise(array(col("p.w1")))).as("g"))
    val h = algo match {
      case Dedup.AlgoXx64 => xxhash64(col("g"))
      case Dedup.AlgoMd5  => Dedup.md5Hash60(col("g"))
      case other => throw new IllegalArgumentException(
        s"unknown feature hash algo '$other'")
    }
    grams
      .select(col("id"), pmod(h, lit(dim.toLong)).cast("int").as("f"))
      .groupBy("id", "f").agg(count(lit(1)).as("tf"))
  }

  /** Per-document log importance weight of `raw` docs toward the
    * `target` distribution: (id, logw). Documents with no tokens are
    * absent (they carry no evidence either way). */
  def logImportanceWeights(raw: DataFrame, target: DataFrame,
                           idCol: String, textCol: String,
                           dim: Int,
                           algo: String = Dedup.AlgoXx64): DataFrame = {
    val rawF = Mat.corpus(hashedNgramFeatures(raw, idCol, textCol, dim, algo))
    // the count tables are dim-bounded: pin them so the scalar total
    // reads below don't recompute the corpus/target feature pass
    val tgtC = Mat.small(hashedNgramFeatures(target, idCol, textCol, dim, algo)
      .groupBy("f").agg(sum("tf").as("ctgt")))
    logWeightsFromCounts(rawF, tgtC, dim)
  }

  /** As logImportanceWeights for the common in-corpus case
    * target = raw.where(pred on the id): featurize the raw corpus ONCE
    * and derive the target count table by filtering the raw POSTINGS on
    * `targetPred` (a predicate over the postings' `id` column). Feature
    * extraction is per-document (the (id, f, tf) groupBy never crosses
    * docs), so filtering postings by id ≡ featurizing the filtered docs
    * — identical counts, one corpus tokenize+hash pass instead of 1.x
    * (r8; the q57 target previously re-tokenized a quarter of the corpus). */
  def logImportanceWeightsSubset(raw: DataFrame, targetPred: org.apache.spark.sql.Column,
                                 idCol: String, textCol: String,
                                 dim: Int,
                                 algo: String = Dedup.AlgoXx64): DataFrame = {
    val rawF = Mat.corpus(hashedNgramFeatures(raw, idCol, textCol, dim, algo))
    val tgtC = Mat.small(rawF.where(targetPred)
      .groupBy("f").agg(sum("tf").as("ctgt")))
    logWeightsFromCounts(rawF, tgtC, dim)
  }

  private def logWeightsFromCounts(rawF: DataFrame, tgtC: DataFrame,
                                   dim: Int): DataFrame = {
    val rawC = Mat.small(rawF.groupBy("f").agg(sum("tf").as("craw")))
    val nTgt = tgtC.agg(coalesce(sum("ctgt"), lit(0L))).head().getLong(0)
    val nRaw = rawC.agg(coalesce(sum("craw"), lit(0L))).head().getLong(0)
    // every raw feature exists in rawC by construction; target side
    // backfills 0 (add-one smoothing keeps the log finite)
    val logRatio = rawC.join(tgtC, Seq("f"), "left")
      .select(col("f"),
        (log((coalesce(col("ctgt"), lit(0L)) + lit(1L)).cast("double")
            / lit((nTgt + dim).toDouble))
          - log((col("craw") + lit(1L)).cast("double")
            / lit((nRaw + dim).toDouble))).as("lr"))
    rawF.join(logRatio, Seq("f"))
      .groupBy("id").agg(sum(col("tf") * col("lr")).as("logw"))
  }

  /** Gumbel top-k importance resampling: the n raw docs maximizing
    * round(logw + g(u_id), 6) under (key desc, id asc). Output
    * (id, logw, key, rank), rank 1..n. */
  def resample(raw: DataFrame, target: DataFrame,
               idCol: String, textCol: String,
               dim: Int, n: Int,
               algo: String = Dedup.AlgoXx64): DataFrame =
    gumbelTopK(logImportanceWeights(raw, target, idCol, textCol, dim, algo), n)

  /** As resample when target = raw.where(pred on id): one corpus
    * featurize pass (see logImportanceWeightsSubset). Identical output
    * to resample(raw, raw.where(...), …) by construction. */
  def resampleSubset(raw: DataFrame, targetPred: org.apache.spark.sql.Column,
                     idCol: String, textCol: String,
                     dim: Int, n: Int,
                     algo: String = Dedup.AlgoXx64): DataFrame =
    gumbelTopK(
      logImportanceWeightsSubset(raw, targetPred, idCol, textCol, dim, algo), n)

  private def gumbelTopK(weights: DataFrame, n: Int): DataFrame = {
    val u = (Dedup.md5Hash60(col("id").cast("string")).cast("double") + 1.0) /
      math.pow(2.0, 60)
    val keyed = weights
      .withColumn("key", round(col("logw") - log(-log(u)), 6))
    // distributed TakeOrdered; the rank window then runs over n rows
    keyed.orderBy(col("key").desc, col("id").asc).limit(n)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("key").desc, col("id").asc)))
  }
}
