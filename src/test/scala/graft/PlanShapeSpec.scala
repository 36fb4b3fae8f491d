package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the properties that keep the 100 TB
  * plan efficient must not regress: column pruning reaches the scan,
  * filters push down, the small join side broadcasts. */
class PlanShapeSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  private val sf = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q02 broadcast join uses BroadcastHashJoin") {
    val p = plan(SparkEntry.queries("q02_broadcast_join")(spark, sf))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("projection before typed map prunes the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .where(col("l_quantity") > 40)
    val p = plan(df)
    assert(p.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40"), p)
    val rs = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(rs.contains("l_orderkey") && rs.contains("l_quantity") && !rs.contains("l_extendedprice"), rs)
  }

  test("pages scan reads only extract columns before the map") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pages").toString
    val rows = graft.job.FixtureGen.fixtureRows("src/test/resources/fixtures")
    graft.job.PageTableIO.write(spark.createDataset(rows).toDF(), dir, numBuckets = 4)
    val ds = graft.job.PageTableIO.readPages(spark, dir)
    val p = plan(ds.select("url").toDF())
    // partition columns present in layout
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.exists(_.startsWith("warc_day=")), files.mkString(","))
  }

  test("salting survives giant rows under ANSI mode (no long overflow)") {
    import spark.implicits._
    val big = new Array[Byte](2 * 1024 * 1024)
    val rows = Seq(
      graft.extract.Page("g://1", new java.sql.Timestamp(0), big, "", ""),
      graft.extract.Page("g://2", new java.sql.Timestamp(0), Array[Byte](60, 112, 62), "", ""))
    val out = graft.job.Salting.saltedRepartition(spark.createDataset(rows).toDF(), 4)
    assert(out.count() == 2)
  }

  test("dedup/ANN family plans contain no cartesian product and keep the " +
    "kernels inside WholeStageCodegen") {
    val sfDir = "/root/testdata/sf0.001"
    for (q <- Seq("q16_ngram_jaccard", "q17_minhash_lsh", "q18_simhash",
      "q19_embedding_neardup", "q21_knn_ivf")) {
      val p = plan(SparkEntry.queries(q)(spark, sfDir))
      assert(!p.contains("CartesianProduct"), s"$q has a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q has a nested-loop join")
    }
    // the native kernels evaluate inside generated code, not as fallback
    // (run the query so AQE finalizes the plan and codegen spans appear)
    val df19 = SparkEntry.queries("q19_embedding_neardup")(spark, sfDir)
    df19.collect()
    val p19 = df19.queryExecution.executedPlan.toString
    assert(p19.contains("graft_cosine") || p19.contains("graft_dot_const"), p19.take(1500))
    // "*(n) " stage prefixes are the WholeStageCodegen markers; the kernel
    // must appear inside one (not in an un-starred interpreted operator)
    assert(p19.linesIterator.exists(l => l.contains("*(") &&
      (l.contains("graft_cosine") || l.contains("graft_dot_const"))),
      "kernels not inside a WholeStageCodegen span:\n" + p19.take(1500))
  }

  test("q30 stratified quota runs as WindowGroupLimit (partial top-n " +
    "before the stratum shuffle) and bernoulli stays a pure pushed filter") {
    val p = plan(SparkEntry.queries("q30_stratified_sample")(spark, sf))
    assert(p.contains("WindowGroupLimit"), p.take(3000))
    // the bernoulli pre-filter must be a Filter, not an exchange/agg
    val q = plan(graft.pipeline.Sampling.bernoulli(
      spark.read.parquet(s"$sf/documents.parquet"), "doc_id", 0.5))
    assert(!q.contains("Exchange"), q.take(2000))
    assert(q.contains("Filter"), q.take(2000))
  }

  test("round-4 operators keep their scale shapes: span dedup has no " +
    "pairwise join, BM25 broadcasts df/stats, winnowing windows by doc, " +
    "shingle kernel runs inside codegen") {
    // q36: postings df-count + join-back — NEVER a self-join pair blowup
    val p36 = plan(SparkEntry.queries("q36_span_dedup")(spark, sf))
    assert(!p36.contains("CartesianProduct") && !p36.contains("BroadcastNestedLoopJoin"))
    // q37: the term-level frames broadcast into the scoring pass
    val p37 = plan(SparkEntry.queries("q37_bm25")(spark, sf))
    assert(p37.contains("BroadcastExchange") || p37.contains("BroadcastHashJoin"), p37.take(2000))
    assert(!p37.contains("CartesianProduct"))
    // q39: exactly one Window, partitioned by the document id — per-doc
    // parallelism, no global ordering
    val p39 = plan(SparkEntry.queries("q39_winnow_fp")(spark, sf))
    // (the operator's internal doc column is named `id`)
    val winLines = p39.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty &&
      winLines.forall(_.contains("windowspecdefinition(id#")), winLines.mkString("\n"))
    // the shingle kernel evaluates inside a WholeStageCodegen span
    val df16 = spark.read.parquet(s"$sf/documents.parquet")
      .select(graft.pipeline.Dedup.shingleHashes(col("text")).as("sh"))
    val p16 = plan(df16)
    assert(p16.linesIterator.exists(l => l.contains("*(") && l.contains("graft_shingle_hash")),
      p16.take(1500))
  }

  test("brute knn broadcasts the query side (corpus never shuffles)") {
    val p = plan(SparkEntry.queries("q20_knn_brute")(spark, "/root/testdata/sf0.001"))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"), p.take(2000))
    assert(!p.contains("CartesianProduct"))
  }

  test("extraction stage plan is map-only after one salted shuffle") {
    import spark.implicits._
    val rows = graft.job.FixtureGen.fixtureRows("src/test/resources/fixtures")
    val df = spark.createDataset(rows).toDF()
    val salted = graft.job.Salting.saltedRepartition(df, 4)
    val mapped = salted.as[graft.extract.Page].map(graft.extract.Extractor.extract)
    val p = plan(mapped.toDF())
    val exchanges = p.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected exactly 1 shuffle, plan:\n${p.take(3000)}")
  }
}
