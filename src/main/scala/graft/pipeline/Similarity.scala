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
   * True IVF with a LEARNED coarse quantizer: `nlist` centroids from a few
   * Lloyd iterations (deterministic init: the nlist lowest-id vectors),
   * corpus partitioned by nearest-centroid list, queries probe only their
   * `nprobe` nearest lists. The quantizer is a tiny model (nlist × dim
   * doubles) — it lives on the driver and broadcasts into the assignment
   * expressions (nlist codegen'd dot products per row, no UDF, no cross
   * join). At 10^12 rows the corpus assignment is one pass, the
   * inverted lists are the shuffle partitioning, and a query touches
   * ~nprobe/nlist of the data. Exact cosine re-rank on candidates only.
   */
  def ivfKmeansKnn(corpus: DataFrame, queries: DataFrame,
                   idCol: String, vecCol: String, qidCol: String,
                   k: Int = 10, nlist: Int = 16, nprobe: Int = 4,
                   iters: Int = 3): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))

    // nearest-centroid assignment as codegen'd expressions over a small
    // centroid table (normalized dot = cosine since centroids are unit)
    def simsCol(v: Column, cents: Array[Array[Double]]): Column =
      array(cents.map(ct => graft.plans.VectorKernels.dotConst(v, ct.toSeq)): _*)
    def assignCol(v: Column, cents: Array[Array[Double]]): Column = {
      val sims = simsCol(v, cents)
      // first index of the max similarity (deterministic tie-break)
      (array_position(sims, array_max(sims)) - 1).cast("int")
    }
    def normalize(vec: Array[Double]): Array[Double] = {
      val n = math.sqrt(vec.map(x => x * x).sum)
      if (n == 0) vec else vec.map(_ / n)
    }

    // deterministic init: the nlist lowest-id vectors
    var centroids: Array[Array[Double]] = c.orderBy(col("id")).limit(nlist)
      .select(col("v")).collect()
      .map(r => normalize(r.getSeq[Float](0).toArray.map(_.toDouble)))

    // Lloyd iterations: assign (distributed) → mean per (list, dim) → new
    // unit centroids (tiny driver-side model update)
    var it = 0
    while (it < iters) {
      val assigned = c.select(assignCol(col("v"), centroids).as("cl"),
        posexplode(col("v")))
        .groupBy(col("cl"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val dim = centroids.head.length
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val seen = new Array[Boolean](nlist)
      assigned.foreach { r =>
        val cl = r.getInt(0)
        sums(cl)(r.getInt(1)) = r.getDouble(2)
        seen(cl) = true
      }
      centroids = centroids.indices.map { i =>
        if (seen(i)) normalize(sums(i)) else centroids(i) // empty list keeps its centroid
      }.toArray
      it += 1
    }

    // inverted lists + nprobe search. Candidate generation carries IDS
    // ONLY (id, cl) — the embedding arrays are re-joined by id for the
    // exact re-rank, so the candidate shuffle payload is bytes, not
    // ×nprobe-duplicated vectors (same discipline as Dedup.minhashLsh).
    val qbase = queries.select(col(qidCol).as("qid"), col(vecCol).as("qv"))
    val lists = c.select(col("id"), assignCol(col("v"), centroids).as("cl"))
    val probes = qbase
      .withColumn("sims", simsCol(col("qv"), centroids))
      // nprobe highest-sim list ids: sort (sim, idx) pairs descending
      .withColumn("probes", slice(transform(
        reverse(array_sort(zip_with(col("sims"),
          sequence(lit(0), lit(nlist - 1)), (s, i) => struct(s.as("s"), i.as("i"))))),
        p => p.getField("i")), 1, nprobe))
      .select(col("qid"), explode(col("probes")).as("cl"))
    val candIds = lists.join(probes, Seq("cl"))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
      .dropDuplicates("qid", "id")
    val cands = candIds
      .join(c, Seq("id"))                // corpus vectors once, by id
      .join(broadcast(qbase), Seq("qid")) // query set is small
      .withColumn("cos", round(Dedup.cosine(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
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
    // buckets computed from the vector, then the vector is DROPPED: the
    // (t, bucket) candidate join carries ids only (×tables duplication of
    // a 64-float array would otherwise dominate shuffle volume at 10^9+
    // rows); vectors are re-joined by id for the exact cosine re-rank.
    def withBuckets(df: DataFrame, id: String, v: String): DataFrame = {
      val sigs = (0 until tables).map(t => bucketSig(col(v), t, planes, dim).as(s"sig_$t"))
      df.select((Seq(col(id)) ++ sigs): _*)
        .select(col(id),
          posexplode(array((0 until tables).map(t => col(s"sig_$t")): _*)))
        .withColumnRenamed("pos", "t").withColumnRenamed("col", "bucket")
    }
    val cbase = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
    val qbase = queries.select(col(qidCol).as("qid"), col(vecCol).as("qv"))
    val c = withBuckets(cbase, "id", "v")
    val q = withBuckets(qbase, "qid", "qv")
    val candIds = c.join(q, Seq("t", "bucket"))
      .where(col("id") =!= col("qid"))
      .select(col("qid"), col("id"))
      .dropDuplicates("qid", "id")
    val cands = candIds
      .join(cbase, Seq("id"))
      .join(broadcast(qbase), Seq("qid"))
      .withColumn("cos", round(cosine(col("v"), col("qv")), 6))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("id").asc)
    cands.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("cos"))
  }
}
