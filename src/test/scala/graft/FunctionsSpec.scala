package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, MetricsAgg}
import graft.extract.{ExtractMetrics, Scoring}
import graft.html.Parser

/** SQL-callable UDF surface + metrics UDAF + hash ids. */
class FunctionsSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  test("registered SQL UDFs extract through spark.sql") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq(("d1", Fixtures.snippetBytes("annotated_1.html")))
      .toDF("id", "html").createOrReplaceTempView("pages_v")
    val row = spark.sql(
      """SELECT graft_extract_text(html, '') AS text,
        |       graft_extract_title(html) AS title,
        |       graft_hash_id(html) AS hid
        |FROM pages_v""".stripMargin).collect().head
    assert(row.getAs[String]("text").startsWith("Paragraph is more better"))
    assert(row.getAs[String]("title") == "This is title of document")
    assert(row.getAs[String]("hid").matches("[0-9a-f]{8}"))
  }

  test("native NormalizeWs expression via SparkSessionExtensions, codegen'd") {
    val df = spark.sql("""SELECT graft_normalize_ws(' a \t b\nc ') AS n""")
    assert(df.collect().head.getString(0) == " a b\nc ")
    // stays inside whole-stage codegen (no UDF boundary)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }

  test("LSH kernels callable from SQL (graft_cosine / graft_simhash64 / " +
    "graft_minhash_sig)") {
    val cos = spark.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(cos == 1.0)
    val sig = spark.sql(
      "SELECT graft_simhash64(array(7L)) AS s").collect().head.getLong(0)
    assert(sig == 7L) // single element: every set bit is the majority
    val mh = spark.sql(
      "SELECT graft_minhash_sig(array(42L, 7L), 4) AS m")
      .collect().head.getSeq[Long](0)
    assert(mh.length == 4)
    // same values as the DataFrame-side API (same constants for k)
    import spark.implicits._
    val viaApi = Seq(Tuple1(Array(42L, 7L))).toDF("hs")
      .select(graft.pipeline.Dedup.minhashSignatureFromHashes(org.apache.spark.sql.functions.col("hs"), 4))
      .collect().head.getSeq[Long](0)
    assert(mh == viaApi)
    intercept[Exception](spark.sql("SELECT graft_minhash_sig(array(1L), 1 + 1)").collect())
  }

  test("hash ids: stable across parses, distinct across content (test_scoring.py:16-42)") {
    val h1 = Scoring.generateHashId(Parser.parseFragment("<div>ľščťžýáí</div>"))
    val h2 = Scoring.generateHashId(Parser.parseFragment("<div>ľščťžýáí</div>"))
    val hn = Scoring.generateHashId(null)
    val hn2 = Scoring.generateHashId(null)
    assert(h1 == h2)
    assert(hn == hn2)
    assert(h1 != hn)
  }

  test("metrics UDAF rolls up per-partition map-side") {
    import spark.implicits._
    val ms = Seq(
      ExtractMetrics(10, 2, 100, 50, 7),
      ExtractMetrics(20, 3, 200, 80, 9),
      ExtractMetrics(5, 1, 50, 20, 3))
    val ds = spark.createDataset(ms)
    val typed = ds.groupByKey(_ => 1).agg(MetricsAgg.toColumn).collect().head._2
    assert(typed.docs == 3)
    assert(typed.candidates_scored == 35)
    assert(typed.bytes_in == 350)
    assert(typed.max_parse_ms == 9)
  }
}
