package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.Dedup

/** MinHash-LSH recall against the (1−J^r)^b banding theory.
  *
  * Pins the r7 hash-family fix: the affine family (a·x+b) mod M is
  * min-wise only when M ≈ the domain of x. The earlier M = 2^61−1 over
  * x < 2^31 wrapped at most twice across the domain, so all k orderings
  * were near-monotone in x (heavily correlated bands) — measured 9%
  * false negatives at J=0.93 where independent bands promise 0.001%.
  * With M = 2^31−1 (Spark MLlib's MinHashLSH construction) the measured
  * miss rate matches theory; these corpora are deterministic under the
  * committed hashParams constants, so the assertions are exact pins,
  * not flaky statistics. */
class LshRecallSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  import TestCorpus.prosePair

  test("high-similarity recall: 200/200 planted pairs at J≈0.93 found " +
    "(the broken 2^61−1 family missed ~9% here)") {
    import spark.implicits._
    val docs = (0 until 200).flatMap { s =>
      val (base, variant) = prosePair(s, 3)
      Seq((s"base$s", base), (s"var$s", variant))
    }
    val found = Dedup.minhashLsh(docs.toDF("url", "text"), "url", "text",
      threshold = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val missing = (0 until 200).map(s => (s"base$s", s"var$s")).toSet -- found
    assert(missing.isEmpty, s"LSH missed ${missing.size} pairs at J≈0.93")
  }

  test("the residual near-threshold LSH miss is real and --near exact's " +
    "reason to exist: prefixJaccardJoin catches the pair LSH drops") {
    import spark.implicits._
    // seeds found by a deterministic 1500-seed sweep: at J=0.8413 the
    // banding theory gives a 0.38% miss rate and these two seeds hit it
    for (seed <- Seq(244, 1270)) {
      val (base, variant) = prosePair(seed, 6)
      val df = Seq(("base", base), ("variant", variant)).toDF("url", "text")
      val lsh = Dedup.minhashLsh(df, "url", "text", threshold = 0.8).count()
      assert(lsh == 0L, s"seed $seed: expected a deterministic LSH miss")
      val exact = Dedup.prefixJaccardJoin(df, "url", "text",
        threshold = 0.8, n = 3).collect()
      assert(exact.length == 1, s"seed $seed: exact join must catch it")
      assert(exact.head.getAs[Double]("jaccard") >= 0.8)
    }
  }
}
