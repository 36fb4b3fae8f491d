package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.LangModel

/** Pins the bigram stupid-backoff LM (q56's operator) from first
  * principles: pair extraction edge cases, hand-computed count tables,
  * the closed-form score of every branch (seen bigram / unseen bigram
  * with seen unigram / out-of-vocabulary word), the in-distribution <
  * out-of-distribution perplexity property the CCNet filter relies on,
  * and the persist lifecycle (roundtrip equality + loud mixed-param
  * loads). */
class LangModelSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def docsDf(rows: Seq[(Long, String)]): DataFrame =
    rows.toDF("doc_id", "text")

  test("tokenPairs: adjacent pairs; <2-token and all-whitespace docs yield none") {
    val d = docsDf(Seq(
      (1L, "A b  c"),            // case-folded, multi-space collapsed
      (2L, "solo"),              // 1 token -> no pairs
      (3L, "   \t  "),           // all-ws -> [""] -> no pairs
      (4L, "x y")))
    val got = LangModel.tokenPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set((1L, "a", "b"), (1L, "b", "c"), (4L, "x", "y")))
  }

  test("train: hand-computed bigram/unigram counts, n, v") {
    // corpus: "a b a" + "a b c" -> tokens a,b,a,a,b,c
    val m = LangModel.train(docsDf(Seq((1L, "a b a"), (2L, "a b c"))),
      "doc_id", "text")
    assert(m.n === 6L)
    assert(m.v === 3L)
    val uni = m.unigrams.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(uni === Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
    val big = m.bigrams.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(big === Map(("a", "b") -> 2L, ("b", "a") -> 1L, ("b", "c") -> 1L))
  }

  test("perplexity: closed form on every probability branch") {
    val m = LangModel.train(docsDf(Seq((1L, "a b a"), (2L, "a b c"))),
      "doc_id", "text")
    // n + v = 9
    val score = LangModel.perplexity(
      docsDf(Seq(
        (10L, "a b"),   // seen bigram: p = c2(a,b)/c1(a) = 2/3
        (11L, "c a"),   // unseen bigram, seen unigram: 0.4*(3+1)/9
        (12L, "a z"))), // unseen word: 0.4*(0+1)/9
      m, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lpSeen = math.log(2.0 / 3.0)
    val lpBack = math.log((0.4 * 4.0) / 9.0)
    val lpOov = math.log((0.4 * 1.0) / 9.0)
    assert(score(10L) === ((1L, r4(lpSeen), r4(math.exp(-lpSeen)))))
    assert(score(11L) === ((1L, r4(lpBack), r4(math.exp(-lpBack)))))
    assert(score(12L) === ((1L, r4(lpOov), r4(math.exp(-lpOov)))))
    // multi-pair doc: mean over transitions
    val multi = LangModel.perplexity(docsDf(Seq((20L, "a b c"))),
      m, "doc_id", "text").collect().head
    val mean = (math.log(2.0 / 3.0) + math.log(1.0 / 2.0)) / 2.0
    assert(multi.getLong(1) === 2L)
    assert(multi.getDouble(2) === r4(mean))
    assert(multi.getDouble(3) === r4(math.exp(-mean)))
  }

  test("perplexity: docs with no transitions are absent") {
    val m = LangModel.train(docsDf(Seq((1L, "a b"))), "doc_id", "text")
    val ids = LangModel.perplexity(
      docsDf(Seq((1L, "a b"), (2L, "solo"), (3L, ""))), m, "doc_id", "text")
      .select("id").as[Long].collect().toSet
    assert(ids === Set(1L))
  }

  test("in-distribution docs score lower perplexity than OOV gibberish") {
    val ref = docsDf((0 until 200).map(i =>
      (i.toLong, TestCorpus.signalProse(i, "common"))))
    val m = LangModel.train(ref, "doc_id", "text")
    val probe = docsDf(Seq(
      // same generator, UNSEEN seed: stopword/signal transitions are
      // in-distribution, the seed-unique words back off
      (1000L, TestCorpus.signalProse(777, "common")),
      (1001L, "zq xv qqj vvk zzt wqx jjy kkp zzv qxw")))
    val ppl = LangModel.perplexity(probe, m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(ppl(1000L) < ppl(1001L),
      s"in-distribution ${ppl(1000L)} should beat gibberish ${ppl(1001L)}")
  }

  test("saveLm/loadLm roundtrip; mixed params fail loudly") {
    val m = LangModel.train(docsDf(Seq((1L, "a b a"), (2L, "a b c"))),
      "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lm").toString
    try {
      LangModel.saveLm(m, dir)
      val loaded = LangModel.loadLm(spark, dir)
      assert(loaded.n === m.n && loaded.v === m.v)
      assert(loaded.bigrams.collect().map(_.toSeq).toSet ===
        m.bigrams.collect().map(_.toSeq).toSet)
      assert(loaded.unigrams.collect().map(_.toSeq).toSet ===
        m.unigrams.collect().map(_.toSeq).toSet)
      // scoring through the loaded model is identical
      val probe = docsDf(Seq((5L, "a b c"), (6L, "c a z")))
      val a = LangModel.perplexity(probe, m, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      val b = LangModel.perplexity(probe, loaded, "doc_id", "text")
        .collect().map(_.toSeq).toSet
      assert(a === b)
      // corrupt: append rows stamped with different params
      m.unigrams.withColumn("n", lit(99L)).withColumn("v", lit(99L))
        .write.mode("append").parquet(s"$dir/unigrams")
      val ex = intercept[IllegalArgumentException] {
        LangModel.loadLm(spark, dir)
      }
      assert(ex.getMessage.contains("mixed LM params"))
    } finally {
      scala.reflect.io.Directory(new java.io.File(dir)).deleteRecursively()
    }
  }
}
