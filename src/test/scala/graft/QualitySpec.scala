package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline.{Dedup, Quality}

/** Learned quality classifier: the iters=1 closed form is pinned against
  * a from-first-principles computation, iters>1 learning against planted
  * separable corpora (the q54 oracle can only gate the exact one-step
  * shape — everything beyond lives here). */
class QualitySpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def docsDf(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private def labelsDf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("id", "y")
  }

  test("hashedFeatures: buckets in [0, dim); bias posting (f = -1, tf = 1) " +
    "on every doc including empty text") {
    val df = docsDf(Seq((1L, "aa bb aa"), (2L, "  "), (3L, "cc")))
    val f = Quality.hashedFeatures(df, "doc_id", "text", dim = 16,
      bias = true).collect()
    assert(f.forall { r =>
      val b = r.getAs[Int]("f"); b == -1 || (b >= 0 && b < 16)
    })
    val biasRows = f.filter(_.getAs[Int]("f") == -1)
    assert(biasRows.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(biasRows.forall(_.getAs[Long]("tf") == 1L))
    // the whitespace-only doc has ONLY its bias posting
    assert(f.count(_.getAs[Long]("id") == 2L) == 1)
    // tf counts repeated tokens
    assert(f.filter(r => r.getAs[Long]("id") == 1L && r.getAs[Int]("f") != -1)
      .map(_.getAs[Long]("tf")).sorted.toSeq == Seq(1L, 2L))
  }

  test("iteration 1 equals the prior-init gradient step computed from " +
    "first principles (p = ybar for every doc), bit-exactly") {
    val df = docsDf(Seq(
      (1L, "aa aa bb"), (2L, "bb cc"), (3L, "aa cc dd"), (4L, "cc cc")))
    val labels = labelsDf(Seq((1L, 1L), (2L, 0L), (3L, 1L), (4L, 0L)))
    val dim = 64
    val feats = Quality.hashedFeatures(df, "doc_id", "text", dim, bias = true)
    val w = Quality.trainLogReg(feats, labels, dim, iters = 1, lr = 1.0)
      .collect().map(r => r.getAs[Int]("f") -> r.getAs[Double]("w")).toMap
    assert(w.size == dim + 1)
    // reference computation straight from the definition
    val fRows = feats.collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Int]("f"), r.getAs[Long]("tf")))
    val y = Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L)
    val n = 4L; val npos = 2L
    val expected = fRows.groupBy(_._2).map { case (f, rows) =>
      val syt = rows.map(r => y(r._1) * r._3).sum
      val stf = rows.map(_._3).sum
      val b0 = if (f == -1) math.log(npos.toDouble / (n - npos).toDouble) else 0.0
      f -> (b0 + 1.0 * (n * syt - npos * stf).toDouble / (n * n).toDouble)
    }
    expected.foreach { case (f, e) => assert(w(f) == e, s"feature $f") }
    // untouched grid features stay exactly 0
    assert(w.filterNot(kv => expected.contains(kv._1)).values.forall(_ == 0.0))
    // balanced classes: the bias gradient is exactly zero, so
    // w(-1) == logit(1/2) == 0 EXACTLY
    assert(w(-1) == 0.0)
  }

  test("bias weight after one step is exactly the prior log-odds " +
    "(integer gradient cancels bit-exactly) under class imbalance") {
    val df = docsDf(Seq((1L, "aa"), (2L, "aa"), (3L, "bb"), (4L, "bb"), (5L, "bb")))
    val labels = labelsDf(Seq((1L, 1L), (2L, 1L), (3L, 0L), (4L, 0L), (5L, 0L)))
    val w = Quality.trainLogReg(
      Quality.hashedFeatures(df, "doc_id", "text", 32, bias = true),
      labels, 32, iters = 1, lr = 0.7)
      .where(col("f") === -1).collect().head.getAs[Double]("w")
    assert(w == math.log(2.0 / 3.0))
  }

  test("planted separable corpus: the model separates held-out classes " +
    "and more iterations widen the margin") {
    val pos = (0 until 20).map(i =>
      (i.toLong, s"signal signal signal filler$i common"))
    val neg = (0 until 20).map(i =>
      (100L + i, s"noise noise noise filler${i + 50} common"))
    val df = docsDf(pos ++ neg)
    val dim = 1024
    val feats = Quality.hashedFeatures(df, "doc_id", "text", dim, bias = true)
    // train on even ids, score the held-out odd ids
    val labels = labelsDf(
      pos.filter(_._1 % 2 == 0).map(p => (p._1, 1L)) ++
      neg.filter(_._1 % 2 == 0).map(p => (p._1, 0L)))
    def margin(iters: Int): Double = {
      val w = Quality.trainLogReg(feats, labels, dim, iters, lr = 1.0)
      val s = Quality.scoreLogReg(feats, w)
        .where(col("id") % 2 === 1).collect()
        .map(r => r.getAs[Long]("id") -> r.getAs[Double]("score")).toMap
      val posMin = s.filter(_._1 < 100L).values.min
      val negMax = s.filter(_._1 >= 100L).values.max
      posMin - negMax
    }
    val m1 = margin(1); val m5 = margin(5)
    assert(m1 > 0.0, s"one step should already separate (margin $m1)")
    assert(m5 > m1, s"more iterations should widen the margin ($m1 -> $m5)")
  }

  test("scoreDocs covers the full id universe row-for-row; a featureless " +
    "doc scores through the intercept alone") {
    val df = docsDf(Seq((1L, "good text here"), (2L, ""), (3L, "more text")))
    val labels = labelsDf(Seq((1L, 1L), (3L, 0L)))
    val dim = 64
    val w = Quality.trainLogReg(
      Quality.hashedFeatures(df, "doc_id", "text", dim, bias = true),
      labels, dim, iters = 2, lr = 0.5)
    val out = Quality.scoreDocs(df, "doc_id", "text", w, dim).collect()
    assert(out.map(_.getAs[Long]("id")).sorted.toSeq == Seq(1L, 2L, 3L))
    assert(out.forall { r =>
      val s = r.getAs[Double]("score"); s > 0.0 && s < 1.0
    })
  }

  test("md5 feature hashing lands tokens in DuckDB-reproducible buckets " +
    "(pmod of the 60-bit md5 prefix)") {
    val df = docsDf(Seq((1L, "alpha beta")))
    val f = Quality.hashedFeatures(df, "doc_id", "text", 256, Dedup.AlgoMd5)
      .collect().map(_.getAs[Int]("f")).sorted
    def bucket(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hex = md.map("%02x".format(_)).mkString.take(15)
      (java.lang.Long.parseLong(hex, 16) % 256).toInt
    }
    assert(f.toSeq == Seq(bucket("alpha"), bucket("beta")).sorted)
  }
}
