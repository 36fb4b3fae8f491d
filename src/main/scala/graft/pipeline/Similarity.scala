package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`Array[Float]`). Two paths:
 *
 *  - bruteKnn: exact top-k by cosine — broadcast the (small) query set,
 *    one pass over the corpus, per-query top-k via window rank. The
 *    baseline and the verifier for the ANN path. Scales linearly in corpus
 *    size with NO shuffle of the corpus (queries are broadcast).
 *
 *  - ivfKnn: IVF-style two-stage search — k-means-free variant using
 *    deterministic hyperplane buckets (same LSH family as
 *    Dedup.embeddingNearDup): probe only the query's bucket (+multi-probe
 *    tables), so the corpus join touches a 1/2^planes fraction per table.
 *    At 10^12 rows this is the path: bucket ids partition the corpus, and
 *    the search is an equi-join on bucket id instead of a cross join.
 */
object Similarity {

  import Dedup.cosine

  /** Exact brute-force cosine top-k: queries × corpus via broadcast. */
  def bruteKnn(corpus: DataFrame, queries: DataFrame,
               idCol: String, vecCol: String, qidCol: String,
               k: Int = 10): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val q = queries.select(col(qidCol).as("qid"), col(vecCol).as("qv"))
    val scored = c.join(broadcast(q))
      .withColumn("cos", round(cosine(col("v"), col("qv")), 6))
      .where(col("id") =!= col("qid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Deterministic IVF hyperplane (distinct seed family from
    * Dedup.hyperplane). Public so oracle SQL can embed the exact doubles. */
  def ivfPlane(table: Int, p: Int, dim: Int): Seq[Double] =
    (0 until dim).map(c => mix64(table * 7919L + p * 131L + c).toDouble / Long.MaxValue)

  /** Hyperplane bucket id (one table); native codegen dot kernel. */
  private def bucketSig(vec: Column, table: Int, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val dot = graft.plans.VectorKernels.dotConst(vec, ivfPlane(table, p, dim))
      when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce((x, y) => x.bitwiseOR(y))
  }

  /**
   * LSH/IVF approximate top-k: candidates = corpus rows sharing a bucket
   * with the query in ANY of `tables` tables; exact cosine re-rank on the
   * candidate set only.
   */
  def ivfKnn(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, qidCol: String,
             k: Int = 10, planes: Int = 8, tables: Int = 4,
             dim: Int = 64): DataFrame = {
    def withBuckets(df: DataFrame, id: String, v: String): DataFrame = {
      val sigs = (0 until tables).map(t => bucketSig(col(v), t, planes, dim).as(s"sig_$t"))
      df.select((Seq(col(id), col(v)) ++ sigs): _*)
        .select(col(id), col(v),
          posexplode(array((0 until tables).map(t => col(s"sig_$t")): _*)))
        .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    }
    val c = withBuckets(corpus.select(col(idCol).as("id"), col(vecCol).as("v")), "id", "v")
    val q = withBuckets(queries.select(col(qidCol).as("qid"), col(vecCol).as("qv")), "qid", "qv")
    val cands = c.join(q, Seq("t", "bucket"))
      .where(col("id") =!= col("qid"))
      .dropDuplicates("qid", "id")
      .withColumn("cos", round(cosine(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }
}
