package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Dsir}

/** DSIR importance resampling: the feature space, the log-weight closed
  * form (pinned against a from-first-principles computation), the
  * domain-matching direction on a planted corpus, and the deterministic
  * Gumbel top-k shape. The q57 oracle gates the exact md5 path; this
  * spec also covers the production xx64 path. */
class DsirSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("hashedNgramFeatures: unigram+bigram mass, bounded buckets, " +
    "token-less docs absent") {
    val df = docsDf(Seq(
      (1L, "aa bb aa"),   // 3 unigrams + 2 bigrams = tf mass 5
      (2L, "   "),        // no tokens -> absent
      (3L, "cc")))        // 1 unigram, no bigram
    val f = Dsir.hashedNgramFeatures(df, "doc_id", "text", dim = 64)
      .collect()
    assert(f.forall { r =>
      val b = r.getAs[Int]("f"); b >= 0 && b < 64
    })
    val mass = f.groupBy(_.getAs[Long]("id"))
      .view.mapValues(_.map(_.getAs[Long]("tf")).sum).toMap
    assert(mass == Map(1L -> 5L, 3L -> 1L))
  }

  test("logImportanceWeights equals the smoothed log-ratio closed form " +
    "computed from first principles") {
    val raw = docsDf(Seq(
      (1L, "alpha beta alpha gamma"),
      (2L, "delta epsilon delta"),
      (3L, "alpha beta"),
      (4L, "zeta")))
    val target = docsDf(Seq(
      (10L, "alpha beta alpha"),
      (11L, "alpha gamma")))
    val dim = 128
    val got = Dsir.logImportanceWeights(raw, target, "doc_id", "text", dim)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("logw"))
      .toMap
    // reference computation straight from the definition
    def feats(df: org.apache.spark.sql.DataFrame) =
      Dsir.hashedNgramFeatures(df, "doc_id", "text", dim).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Int]("f"),
          r.getAs[Long]("tf")))
    val rawF = feats(raw); val tgtF = feats(target)
    val craw = rawF.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val ctgt = tgtF.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val nRaw = craw.values.sum; val nTgt = ctgt.values.sum
    def lr(f: Int): Double =
      math.log((ctgt.getOrElse(f, 0L) + 1L).toDouble / (nTgt + dim)) -
        math.log((craw(f) + 1L).toDouble / (nRaw + dim))
    val expected = rawF.groupBy(_._1).view
      .mapValues(_.map(r => r._3 * lr(r._2)).sum).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - expected(id)) < 1e-9, s"doc $id")
    }
  }

  test("domain matching: docs shaped like the target outrank off-topic " +
    "docs, and a doc with no tokens is absent") {
    val topic = "the standard model of particle physics describes quarks"
    val noise = "zzqx vvrpl knnty owwes hrrgu lmmbc"
    val raw = docsDf(Seq(
      (1L, topic), (2L, noise),
      (3L, "particle physics quarks and leptons"),
      (4L, "qqwe asdd zxcc vfrr"), (5L, "   ")))
    val target = docsDf(Seq(
      (10L, "particle physics of the standard model"),
      (11L, "quarks leptons and bosons in physics")))
    val w = Dsir.logImportanceWeights(raw, target, "doc_id", "text",
      dim = 4096)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("logw"))
      .toMap
    assert(!w.contains(5L))
    // per-token normalized weight: topic docs above every noise doc
    val len = Map(1L -> 8.0, 2L -> 6.0, 3L -> 6.0, 4L -> 4.0)
    val norm = w.map { case (id, v) => id -> v / len(id) }
    assert(norm(1L) > norm(2L) && norm(1L) > norm(4L))
    assert(norm(3L) > norm(2L) && norm(3L) > norm(4L))
  }

  test("resampleSubset(raw, pred) ≡ resample(raw, raw.where(pred)) — " +
    "the single-featurize path derives the target counts by filtering " +
    "the raw postings (r8; q57's shape)") {
    val raw = docsDf((1L to 60L).map(i =>
      (i, if (i % 4 == 1) "alpha beta gamma shared topic words"
          else s"unique_${i}_a unique_${i}_b filler_$i mixed alpha")))
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("logw"),
        r.getAs[Double]("key"), r.getAs[Int]("rank"))).sortBy(_._4).toSeq
    for (algo <- Seq(Dedup.AlgoXx64, Dedup.AlgoMd5)) {
      val two = canon(Dsir.resample(raw,
        raw.where(pmod(col("doc_id"), lit(4)) === 1),
        "doc_id", "text", dim = 512, n = 20, algo = algo))
      val one = canon(Dsir.resampleSubset(raw,
        pmod(col("id"), lit(4)) === 1,
        "doc_id", "text", dim = 512, n = 20, algo = algo))
      assert(one == two, s"algo=$algo")
    }
  }

  test("resample: rank 1..n under (key desc, id asc), deterministic " +
    "run-over-run, identical across xx64 re-run") {
    val raw = docsDf((1L to 40L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma shared topic words"
          else s"unique_${i}_a unique_${i}_b filler_$i")))
    val target = docsDf(Seq((100L, "alpha beta gamma shared topic")))
    def run() = Dsir.resample(raw, target, "doc_id", "text",
      dim = 1024, n = 10).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("key"),
        r.getAs[Int]("rank")))
    val a = run(); val b = run()
    assert(a.toSeq == b.toSeq)
    assert(a.map(_._3).toSeq == (1 to 10))
    // keys non-increasing in rank order; id asc breaks exact ties
    val sorted = a.sortBy(_._3)
    sorted.sliding(2).foreach { case Array(x, y) =>
      assert(x._2 > y._2 || (x._2 == y._2 && x._1 < y._1))
    }
    // md5 algo path (the oracled shape) produces the same arity
    val m = Dsir.resample(raw, target, "doc_id", "text", dim = 1024,
      n = 10, algo = Dedup.AlgoMd5).collect()
    assert(m.length == 10)
  }
}
