package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.pipeline.Similarity

/** Persistable ANN indexes: build once, save, load in a "later batch",
  * search — results identical to the one-shot path, and the loaded
  * search never touches the corpus-side build (the "index once, query
  * many" deployment shape a real 100 TB corpus needs). */
class SimilarityIndexSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private val dim = 16
  private def vecs(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      .toDF("vec_id", "embedding")
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.orderBy("qid", "rank").collect().map(_.toSeq).toSeq

  test("IVF index append: new vectors join their nearest existing list " +
    "(frozen quantizer) — append(save(build(A)), B) ≡ A's centroids " +
    "over A ∪ B, and searches agree") {
    import org.apache.spark.sql.functions.col
    val a = vecs(60)
    val b = vecs(90).where(col("vec_id") >= 60) // disjoint new batch
    val dir = java.nio.file.Files.createTempDirectory("ivfappend").toString
    val built = Similarity.buildIvfIndex(a, "vec_id", "embedding",
      nlist = 8, iters = 2)
    Similarity.saveIvfIndex(built, dir)
    Similarity.appendToIvfIndex(spark, dir, b, "vec_id", "embedding")

    val loaded = Similarity.loadIvfIndex(spark, dir)
    // same frozen quantizer
    assert(loaded.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    // lists ≡ assigning the UNION under A's centroids
    val all = vecs(90)
    val want = all.select(col("vec_id").as("id"),
      graft.pipeline.Similarity.assignCol(col("embedding"), built.centroids).as("cl"))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = loaded.lists.collect()
      .map(r => (r.getLong(r.fieldIndex("id")), r.getInt(r.fieldIndex("cl")))).toSet
    assert(got == want)
    // and a search over the appended index ≡ a search over a fresh
    // same-centroid index on the union
    val queries = all.where(col("vec_id") < 5)
    val viaAppended = canon(Similarity.ivfSearch(loaded, all, queries,
      "vec_id", "embedding", "vec_id", k = 5, nprobe = 3))
    val fresh = graft.pipeline.Similarity.IvfIndex(built.centroids,
      all.select(col("vec_id").as("id"),
        graft.pipeline.Similarity.assignCol(col("embedding"), built.centroids).as("cl")))
    val viaFresh = canon(Similarity.ivfSearch(fresh, all, queries,
      "vec_id", "embedding", "vec_id", k = 5, nprobe = 3))
    assert(viaAppended == viaFresh)

    // replaying the SAME append (crash-and-retry) adds nothing: the
    // seen-id anti-join makes it a no-op, lists stay identical
    val before = loaded.lists.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    Similarity.appendToIvfIndex(spark, dir, b, "vec_id", "embedding")
    val after = Similarity.loadIvfIndex(spark, dir)
      .lists.collect().map(_.toSeq).toSeq.sortBy(_.toString)
    assert(after == before)
  }

  test("IVF index: save → load → search ≡ one-shot ivfKmeansKnn " +
    "(trained quantizer, iters > 0)") {
    val corpus = vecs(80)
    val queries = corpus.where(org.apache.spark.sql.functions.col("vec_id") < 5)
    val direct = Similarity.ivfKmeansKnn(corpus, queries,
      "vec_id", "embedding", "vec_id", k = 5, nlist = 8, nprobe = 3, iters = 2)

    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val built = Similarity.buildIvfIndex(corpus, "vec_id", "embedding",
      nlist = 8, iters = 2)
    Similarity.saveIvfIndex(built, dir)
    val loaded = Similarity.loadIvfIndex(spark, dir)

    // quantizer round-trips bit-exactly (doubles through parquet)
    assert(loaded.centroids.map(_.toSeq).toSeq == built.centroids.map(_.toSeq).toSeq)
    val viaIndex = Similarity.ivfSearch(loaded, corpus, queries,
      "vec_id", "embedding", "vec_id", k = 5, nprobe = 3)
    assert(canon(viaIndex) == canon(direct))

    // the loaded lists are backed by the index parquet, NOT recomputed
    // from the corpus (corpus here is in-memory: a rebuilt lists frame
    // would have no input files at all)
    assert(loaded.lists.inputFiles.exists(_.contains(dir)))
    assert(built.lists.inputFiles.isEmpty)

    // a SECOND query batch reuses the same loaded index — no build step
    val queries2 = corpus.where(org.apache.spark.sql.functions.col("vec_id") >= 70)
    val second = Similarity.ivfSearch(loaded, corpus, queries2,
      "vec_id", "embedding", "vec_id", k = 5, nprobe = 3)
    val secondDirect = Similarity.ivfKmeansKnn(corpus, queries2,
      "vec_id", "embedding", "vec_id", k = 5, nlist = 8, nprobe = 3, iters = 2)
    assert(canon(second) == canon(secondDirect))
  }

  test("MinHash corpus index: save → load → ingest join ≡ one-shot " +
    "minhashLshJoin; parameters travel with the index") {
    import spark.implicits._
    import graft.pipeline.Dedup
    val base = (1 to 60).map(i => s"token$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, (100 to 160).map(i => s"word$i").mkString(" "))).toDF("doc_id", "text")
    val batch = Seq(
      (10L, (1 to 57).map(i => s"token$i").mkString(" ") + " tokenX tokenY tokenZ"),
      (11L, (200 to 260).map(i => s"other$i").mkString(" "))).toDF("doc_id", "text")
    def canon(df: DataFrame) = df.orderBy("id_a", "id_b").collect().map(_.toSeq).toSeq
    val direct = Dedup.minhashLshJoin(corpus, batch, "doc_id", "text",
      k = 32, bands = 16, threshold = 0.5)
    assert(direct.count() == 1) // the planted near-dup pair (1, 10)

    val dir = java.nio.file.Files.createTempDirectory("mhidx").toString
    Dedup.saveMinHashIndex(
      Dedup.buildMinHashIndex(corpus, "doc_id", "text", k = 32, bands = 16), dir)
    val loaded = Dedup.loadMinHashIndex(spark, dir)
    assert(loaded.k == 32 && loaded.bands == 16) // parameters round-trip
    assert(loaded.banded.inputFiles.exists(_.contains(dir)))
    val viaIndex = Dedup.minhashLshJoinIndexed(loaded, batch, "doc_id", "text",
      threshold = 0.5)
    assert(canon(viaIndex) == canon(direct))

    // a SECOND ingest batch against the same loaded index — no corpus work
    val batch2 = Seq(
      (20L, (4 to 60).map(i => s"token$i").mkString(" ") + " tokenA tokenB tokenC"))
      .toDF("doc_id", "text")
    val second = Dedup.minhashLshJoinIndexed(loaded, batch2, "doc_id", "text",
      threshold = 0.5)
    val secondDirect = Dedup.minhashLshJoin(corpus, batch2, "doc_id", "text",
      k = 32, bands = 16, threshold = 0.5)
    assert(canon(second) == canon(secondDirect))
  }

  test("PQ codebooks: save → load round-trips bit-exactly; ADC search on " +
    "loaded codebooks ≡ direct") {
    val corpus = vecs(60)
    val queries = corpus.where(org.apache.spark.sql.functions.col("vec_id") < 4)
    val cb = Similarity.trainPqCodebooks(corpus, "vec_id", "embedding",
      m = 4, ksub = 8, iters = 1)
    val dir = java.nio.file.Files.createTempDirectory("pqcb").toString
    Similarity.savePqCodebooks(cb, spark, dir)
    val loaded = Similarity.loadPqCodebooks(spark, dir)
    assert(loaded.map(_.map(_.toSeq).toSeq).toSeq == cb.map(_.map(_.toSeq).toSeq).toSeq)
    val direct = Similarity.pqAdcSearch(
      Similarity.pqEncode(corpus, "vec_id", "embedding", cb),
      queries, "vec_id", "embedding", cb, k = 5)
    val viaLoaded = Similarity.pqAdcSearch(
      Similarity.pqEncode(corpus, "vec_id", "embedding", loaded),
      queries, "vec_id", "embedding", loaded, k = 5)
    assert(canon(viaLoaded) == canon(direct))
  }

  test("LSH bucket index: save → load → search ≡ one-shot ivfKnn") {
    val corpus = vecs(80)
    val queries = corpus.where(org.apache.spark.sql.functions.col("vec_id") < 5)
    val direct = Similarity.ivfKnn(corpus, queries,
      "vec_id", "embedding", "vec_id", k = 5, planes = 4, tables = 3, dim = dim)

    val dir = java.nio.file.Files.createTempDirectory("lshidx").toString
    val buckets = Similarity.buildLshBuckets(
      corpus.select(org.apache.spark.sql.functions.col("vec_id").as("id"),
        org.apache.spark.sql.functions.col("embedding").as("v")),
      "id", "v", planes = 4, tables = 3, dim = dim)
    Similarity.saveLshIndex(buckets, dir)
    val loaded = Similarity.loadLshIndex(spark, dir)
    assert(loaded.inputFiles.exists(_.contains(dir)))

    val viaIndex = Similarity.lshSearch(loaded, corpus, queries,
      "vec_id", "embedding", "vec_id", k = 5, planes = 4, tables = 3, dim = dim)
    assert(canon(viaIndex) == canon(direct))
  }
}
