package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipeline.Sketch

/** Sketch lifecycle: persist + associative merge. The reason sketches
  * exist at 100 TB is merging per-ingest artifacts into a running sketch
  * without re-scanning history — so the merge law
  * merge(build(A), build(B)) ≡ build(A ∪ B) is pinned EXACTLY (row-level
  * state equality, not just estimate equality) for all four families,
  * save/load round-trips are bit-exact, and parameter-mixed loads fail
  * loudly instead of silently corrupting estimates. */
class SketchLifecycleSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def corpus(ids: Range): DataFrame =
    ids.map(i => (i.toLong, s"value-$i word${i % 7} tok${i % 13}", s"g${i % 3}"))
      .toDF("id", "text", "grp")

  private def canon(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  // a NOT-YET-EXISTING subpath: the save/upsert targets must start absent
  // (an existing empty dir deliberately reads as a crashed overwrite and
  // fails loudly — see Sketch.pathExists)
  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/t"

  // ---- two-level quantile sketch ----------------------------------------

  test("hist2: add-merge ≡ rebuild over the union (exact (bucket, sub) " +
    "counts), and estimates refine the one-level histogram's error to " +
    "the sub-bucket span") {
    import org.apache.spark.sql.functions.{col, lit}
    // lengths spread inside ONE log2 bucket [1024, 2047]: the one-level
    // histogram interpolates the whole 1024-wide span, the two-level one
    // pins the estimate to a 128-wide sub-bucket
    val vals = (0 until 512).map(i => (1024L + 2 * i, s"g${i % 2}"))
    val df = vals.toDF("v", "grp")
    val a = df.where(col("v") % 4 === 0)
    val b = df.where(col("v") % 4 =!= 0)
    val full = Sketch.hist2Build(df, Seq("grp"), col("v"))
    assert(canon(Sketch.hist2Merge(
      Sketch.hist2Build(a, Seq("grp"), col("v")),
      Sketch.hist2Build(b, Seq("grp"), col("v")), Seq("grp"))) == canon(full))
    // every (bucket, sub) count stays within the 2^sBits split bound
    assert(full.select(col("sub")).collect().map(_.getLong(0)).forall(s =>
      s >= 0 && s < 8))
    val est = Sketch.hist2Quantiles(full, Seq("grp"),
      Seq(("s50", 0.5), ("s90", 0.9)))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getDouble(3))).toMap
    // exact percentiles per group ((n−1)·q over the sorted 256 values)
    def exact(g: String, q: Double): Double = {
      val xs = vals.filter(_._2 == g).map(_._1.toDouble).sorted
      val t = (xs.length - 1) * q
      val i = t.toInt
      if (i + 1 < xs.length) xs(i) + (xs(i + 1) - xs(i)) * (t - i) else xs(i)
    }
    for (g <- Seq("g0", "g1")) {
      val (s50, s90) = est(g)
      // sub-bucket span here is 1024/8 = 128: the estimate must land
      // within one span of the exact value (the one-level bucket span,
      // 1024, would not pin this)
      assert(math.abs(s50 - exact(g, 0.5)) <= 128.0,
        s"$g s50=$s50 exact=${exact(g, 0.5)}")
      assert(math.abs(s90 - exact(g, 0.9)) <= 128.0,
        s"$g s90=$s90 exact=${exact(g, 0.9)}")
    }
  }

  test("hist2 lifecycle: save/load round-trips counts and sBits, upsert " +
    "replaces groups, fold accumulates behind the high-water mark, and " +
    "parameter/ownership mixes fail loudly") {
    import org.apache.spark.sql.functions.{col, length}
    val all = corpus(0 until 300)
    val h = Sketch.hist2Build(all, Seq("grp"), length(col("text")))
    val upPath = tmp("h2up")
    Sketch.saveHist2(h, Seq("grp"), 3, upPath)
    val (loaded, s) = Sketch.loadHist2(spark, Seq("grp"), upPath)
    assert(s == 3)
    assert(canon(loaded) == canon(h))
    // upsert: recomputing one group replaces only that group
    val g0 = all.where(col("grp") === "g0")
    Sketch.upsertHist2(spark, Seq("grp"),
      Sketch.hist2Build(g0, Seq("grp"), length(col("text"))), 3, upPath)
    assert(canon(Sketch.loadHist2(spark, Seq("grp"), upPath)._1) == canon(h))
    intercept[IllegalArgumentException] {
      Sketch.upsertHist2(spark, Seq("grp"),
        Sketch.hist2Build(g0, Seq("grp"), length(col("text")), sBits = 4),
        4, upPath)
    }
    // fold: batch halves accumulate to the full build; replay no-ops
    val foldPath = tmp("h2fold")
    val b0 = all.where(col("id") < 150)
    val b1 = all.where(col("id") >= 150)
    Sketch.foldHist2(spark, Seq("grp"),
      Sketch.hist2Build(b0, Seq("grp"), length(col("text"))), 3, foldPath, 0L)
    Sketch.foldHist2(spark, Seq("grp"),
      Sketch.hist2Build(b1, Seq("grp"), length(col("text"))), 3, foldPath, 1L)
    assert(canon(Sketch.loadHist2(spark, Seq("grp"), foldPath)._1) == canon(h))
    Sketch.foldHist2(spark, Seq("grp"),
      Sketch.hist2Build(b1, Seq("grp"), length(col("text"))), 3, foldPath, 1L)
    assert(canon(Sketch.loadHist2(spark, Seq("grp"), foldPath)._1) == canon(h))
    // an upsert against the fold-owned table is a loud error, not an
    // invisible flat write
    intercept[IllegalArgumentException] {
      Sketch.upsertHist2(spark, Seq("grp"), h, 3, foldPath)
    }
  }

  // ---- streaming folds --------------------------------------------------

  test("foldHll/foldHist: batch-local folds accumulate to the full-corpus " +
    "sketch; a replayed batch id no-ops per table (the counter-add " +
    "double-count guard)") {
    val all = corpus(0 until 300)
    val b0 = all.where(col("id") < 100)        // groups g0..g2, partial
    val b1 = all.where(col("id") >= 100)       // rest of every group
    val hllPath = tmp("foldhll")
    val histPath = tmp("foldhist")
    def foldBoth(batch: DataFrame, id: Long): Unit = {
      Sketch.foldHll(spark, Seq("grp"),
        Sketch.hllRegisters(batch, Seq("grp"), col("text")), 9, hllPath, id)
      Sketch.foldHist(spark, Seq("grp"),
        Sketch.histBuild(batch, Seq("grp"), length(col("text"))), histPath, id)
    }
    foldBoth(b0, 0L)
    foldBoth(b1, 1L)
    val wantHll = canon(Sketch.hllRegisters(all, Seq("grp"), col("text")))
    val wantHist = canon(Sketch.histBuild(all, Seq("grp"), length(col("text"))))
    assert(canon(Sketch.loadHll(spark, Seq("grp"), hllPath)._1) == wantHll)
    assert(canon(Sketch.loadHist(spark, Seq("grp"), histPath)) == wantHist)
    // replay batch 1 (a crashed trigger re-runs under the SAME id): the
    // high-water mark makes it a no-op — without it the histogram's
    // counter-add would double-count every batch-1 row
    foldBoth(b1, 1L)
    assert(canon(Sketch.loadHll(spark, Seq("grp"), hllPath)._1) == wantHll)
    assert(canon(Sketch.loadHist(spark, Seq("grp"), histPath)) == wantHist)
    // a NEW group arriving in a later batch folds in without touching
    // committed groups' marks
    val extra = Seq((900L, "fresh text tok", "g9")).toDF("id", "text", "grp")
    foldBoth(extra, 2L)
    val all2 = all.unionByName(extra)
    assert(canon(Sketch.loadHll(spark, Seq("grp"), hllPath)._1) ==
      canon(Sketch.hllRegisters(all2, Seq("grp"), col("text"))))
    assert(canon(Sketch.loadHist(spark, Seq("grp"), histPath)) ==
      canon(Sketch.histBuild(all2, Seq("grp"), length(col("text")))))
    // p mismatch still fails loudly through the fold path
    intercept[IllegalArgumentException] {
      Sketch.foldHll(spark, Seq("grp"),
        Sketch.hllRegisters(all, Seq("grp"), col("text"), p = 10), 10,
        hllPath, 3L)
    }
  }

  test("fold commits are generations: a crash mid-fold (partial gen, no " +
    "_SUCCESS) leaves the previous state readable, and the replayed " +
    "batch commits over it") {
    val all = corpus(0 until 200)
    val b0 = all.where(col("id") < 100)
    val b1 = all.where(col("id") >= 100)
    val path = tmp("foldgen")
    Sketch.foldHist(spark, Seq("grp"),
      Sketch.histBuild(b0, Seq("grp"), length(col("text"))), path, 0L)
    val want01 = canon(Sketch.loadHist(spark, Seq("grp"), path))
    // simulate batch 1 crashing mid-write: a partial generation dir with
    // data but NO _SUCCESS — a flat-overwrite fold would have deleted
    // the only copy of batch 0's counters at this point
    val partial = new java.io.File(s"$path/_gen-1")
    assert(partial.mkdirs())
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/_gen-1/part-00000.parquet"),
      Array[Byte](1, 2, 3)) // torn file: unreadable as parquet
    assert(canon(Sketch.loadHist(spark, Seq("grp"), path)) == want01,
      "a partial generation must be invisible to readers")
    // the replayed batch 1 folds against the intact state and commits
    Sketch.foldHist(spark, Seq("grp"),
      Sketch.histBuild(b1, Seq("grp"), length(col("text"))), path, 1L)
    assert(canon(Sketch.loadHist(spark, Seq("grp"), path)) ==
      canon(Sketch.histBuild(all, Seq("grp"), length(col("text")))))
    // older generations pruned after the commit
    val gens = new java.io.File(path).listFiles
      .filter(_.getName.startsWith("_gen-")).map(_.getName).toSet
    assert(gens == Set("_gen-1"), s"gens=$gens")
  }

  test("a REPLAYED fold over an already-committed generation never " +
    "rewrites the gen dir: at that point it is the ONLY complete " +
    "generation, and an in-place overwrite would first delete it — a " +
    "crash mid-rewrite would lose unrebuildable sketch state (ADVICE r6)") {
    val all = corpus(0 until 200)
    val b0 = all.where(col("id") < 100)
    val b1 = all.where(col("id") >= 100)
    val path = tmp("foldreplay")
    def fold(b: DataFrame, id: Long): Unit =
      Sketch.foldHist(spark, Seq("grp"),
        Sketch.histBuild(b, Seq("grp"), length(col("text"))), path, id)
    fold(b0, 0L)
    fold(b1, 1L) // prunes _gen-0: _gen-1 is now the only complete state
    // sentinel INSIDE the committed gen dir: any rewrite (overwrite mode
    // deletes the dir first) would remove it
    val sentinel = java.nio.file.Paths.get(s"$path/_gen-1/_sentinel")
    java.nio.file.Files.write(sentinel, Array[Byte](7))
    fold(b1, 1L) // replay: HWM makes the merge a content no-op
    assert(java.nio.file.Files.exists(sentinel),
      "replayed fold rewrote the committed generation in place")
    assert(canon(Sketch.loadHist(spark, Seq("grp"), path)) ==
      canon(Sketch.histBuild(all, Seq("grp"), length(col("text")))))
  }

  // ---- HLL --------------------------------------------------------------

  test("HLL: merge(build(A), build(B)) has register-identical state to " +
    "build(A ∪ B), and the estimates agree") {
    val all = corpus(0 until 300)
    val a = all.where(col("id") % 2 === 0)
    val b = all.where(col("id") % 2 =!= 0)
    val full = Sketch.hllRegisters(all, Seq("grp"), col("text"))
    val merged = Sketch.hllMergeRegisters(
      Sketch.hllRegisters(a, Seq("grp"), col("text")),
      Sketch.hllRegisters(b, Seq("grp"), col("text")), Seq("grp"))
    assert(canon(merged) == canon(full))
    assert(canon(Sketch.hllEstimate(merged, Seq("grp"))) ==
      canon(Sketch.hllEstimate(full, Seq("grp"))))
  }

  test("HLL: save → load round-trips registers and p; merging a loaded " +
    "day-2 sketch into a loaded day-1 sketch ≡ building over both days") {
    val d1 = corpus(0 until 120)
    val d2 = corpus(120 until 260)
    val p1 = tmp("hll1"); val p2 = tmp("hll2")
    Sketch.saveHll(Sketch.hllRegisters(d1, Seq("grp"), col("text")),
      Seq("grp"), p = 9, p1)
    Sketch.saveHll(Sketch.hllRegisters(d2, Seq("grp"), col("text")),
      Seq("grp"), p = 9, p2)
    val (r1, pp1) = Sketch.loadHll(spark, Seq("grp"), p1)
    val (r2, pp2) = Sketch.loadHll(spark, Seq("grp"), p2)
    assert(pp1 == 9 && pp2 == 9)
    val merged = Sketch.hllMergeRegisters(r1, r2, Seq("grp"))
    val full = Sketch.hllRegisters(d1.unionByName(d2), Seq("grp"), col("text"))
    assert(canon(merged) == canon(full))
  }

  test("HLL: loading a path whose rows mix p values fails loudly") {
    val path = tmp("hllmix")
    val regs = Sketch.hllRegisters(corpus(0 until 50), Seq("grp"), col("text"))
    regs.withColumn("p", when(col("bucket") % 2 === 0, 9).otherwise(10))
      .write.mode("overwrite").parquet(path)
    val e = intercept[IllegalArgumentException] {
      Sketch.loadHll(spark, Seq("grp"), path)
    }
    assert(e.getMessage.contains("mixes parameters"))
  }

  // ---- CMS --------------------------------------------------------------

  test("CMS: counter-add merge ≡ rebuild over the union (exact counter " +
    "table equality), and lookups agree") {
    val all = corpus(0 until 400).select(explode(split(col("text"), " ")).as("v"))
    val a = corpus(0 until 200).select(explode(split(col("text"), " ")).as("v"))
    val b = corpus(200 until 400).select(explode(split(col("text"), " ")).as("v"))
    val merged = Sketch.cmsMerge(Sketch.cmsBuild(a, col("v")),
      Sketch.cmsBuild(b, col("v")))
    val full = Sketch.cmsBuild(all, col("v"))
    assert(canon(merged) == canon(full))
    val probes = Seq("word0", "tok5", "absent").toDF("v")
    assert(canon(Sketch.cmsLookup(merged, probes, col("v"))) ==
      canon(Sketch.cmsLookup(full, probes, col("v"))))
  }

  test("CMS: save → load round-trips counters and (d, w); mixed (d, w) " +
    "fails loudly") {
    val vals = corpus(0 until 100).select(explode(split(col("text"), " ")).as("v"))
    val cms = Sketch.cmsBuild(vals, col("v"))
    val path = tmp("cms")
    Sketch.saveCms(cms, d = 4, w = 1024, path)
    val (loaded, d, w) = Sketch.loadCms(spark, path)
    assert(d == 4 && w == 1024)
    assert(canon(loaded) == canon(cms))

    val mixed = tmp("cmsmix")
    cms.withColumn("d", lit(4)).withColumn("w", when(col("bucket") < 100, 512).otherwise(1024))
      .write.mode("overwrite").parquet(mixed)
    val e = intercept[IllegalArgumentException] {
      Sketch.loadCms(spark, mixed)
    }
    assert(e.getMessage.contains("mixes parameters"))
  }

  // ---- Bloom ------------------------------------------------------------

  test("Bloom: position-union merge ≡ rebuild; no false negatives across " +
    "a merge; save/load round-trips (m, k)") {
    val a = (0 until 150).map(i => s"url-$i").toDF("v")
    val b = (150 until 300).map(i => s"url-$i").toDF("v")
    val all = (0 until 300).map(i => s"url-$i").toDF("v")
    val merged = Sketch.bloomMerge(Sketch.bloomBuild(a, col("v")),
      Sketch.bloomBuild(b, col("v")))
    val full = Sketch.bloomBuild(all, col("v"))
    assert(canon(merged) == canon(full))
    // every inserted key (either side) must hit the merged filter
    val hits = Sketch.bloomProbe(merged, all, col("v"))
    assert(hits.where(!col("bloom_hit")).count() == 0)

    val path = tmp("bloom")
    Sketch.saveBloom(merged, m = 16384, k = 4, path)
    val (loaded, m, k) = Sketch.loadBloom(spark, path)
    assert(m == 16384 && k == 4)
    assert(canon(loaded) == canon(merged))
  }

  // ---- group upsert (continuous profiling) ------------------------------

  test("upsertHll: incoming groups replace their rows, others survive; " +
    "re-upserting the same group is idempotent; p mismatch fails loudly") {
    val path = tmp("hllup")
    val d1 = corpus(0 until 80).withColumn("day", lit("d1"))
    val d2 = corpus(80 until 150).withColumn("day", lit("d2"))
    Sketch.upsertHll(spark, Seq("day"),
      Sketch.hllRegisters(d1, Seq("day"), col("text")), p = 9, path)
    Sketch.upsertHll(spark, Seq("day"),
      Sketch.hllRegisters(d2, Seq("day"), col("text")), p = 9, path)
    val (regs, p) = Sketch.loadHll(spark, Seq("day"), path)
    assert(p == 9)
    val both = regs.collect().map(_.toSeq).toSet
    // d1's rows are exactly a fresh build's (untouched by d2's upsert)
    assert(both.filter(_.head == "d1") ==
      canon(Sketch.hllRegisters(d1, Seq("day"), col("text"))))
    // re-upserting d2 changes nothing (group replace, not counter add)
    Sketch.upsertHll(spark, Seq("day"),
      Sketch.hllRegisters(d2, Seq("day"), col("text")), p = 9, path)
    assert(Sketch.loadHll(spark, Seq("day"), path)._1
      .collect().map(_.toSeq).toSet == both)
    // a different p must not merge in silently
    val e = intercept[IllegalArgumentException] {
      Sketch.upsertHll(spark, Seq("day"),
        Sketch.hllRegisters(d2, Seq("day"), col("text"), p = 10), p = 10, path)
    }
    assert(e.getMessage.contains("p="))
  }

  test("upsertHist: replace-groups law — upserting a recomputed day twice " +
    "equals once; untouched days keep exact counts") {
    val path = tmp("histup")
    val d1 = (0 until 40).map(i => ("d1", i.toLong + 1)).toDF("day", "v")
    val d2 = (0 until 60).map(i => ("d2", i.toLong * 5 + 1)).toDF("day", "v")
    Sketch.upsertHist(spark, Seq("day"),
      Sketch.histBuild(d1, Seq("day"), col("v")), path)
    Sketch.upsertHist(spark, Seq("day"),
      Sketch.histBuild(d2, Seq("day"), col("v")), path)
    Sketch.upsertHist(spark, Seq("day"),
      Sketch.histBuild(d2, Seq("day"), col("v")), path) // re-run: idempotent
    val loaded = Sketch.loadHist(spark, Seq("day"), path)
    val want = Sketch.histBuild(d1.unionByName(d2), Seq("day"), col("v"))
    assert(canon(loaded) == canon(want))
  }

  // ---- log2-histogram quantile sketch -----------------------------------

  test("histogram: add-merge ≡ rebuild over the union (exact bucket " +
    "counts), including through a save/load round-trip") {
    val all = (0 until 500).map(i => ("g", i.toLong * 3 + 1)).toDF("grp", "v")
    val a = all.where(col("v") % 2 === 0)
    val b = all.where(col("v") % 2 =!= 0)
    val merged = Sketch.histMerge(
      Sketch.histBuild(a, Seq("grp"), col("v")),
      Sketch.histBuild(b, Seq("grp"), col("v")), Seq("grp"))
    val full = Sketch.histBuild(all, Seq("grp"), col("v"))
    assert(canon(merged) == canon(full))

    val path = tmp("hist")
    Sketch.saveHist(merged, Seq("grp"), path)
    assert(canon(Sketch.loadHist(spark, Seq("grp"), path)) == canon(full))
  }

  test("histogram quantiles: planted single-bucket distribution reads off " +
    "the exact in-bucket interpolation; estimates bounded by bucket span") {
    // 11 values all in bucket 4 (bit-length 4: values 8..15): n=11,
    // lo=8, hi=15, t(q) = 10·q, estimate = 8 + 7·(10q/11)
    val vals = (0 until 11).map(_ => ("g", 10L)).toDF("grp", "v")
    val h = Sketch.histBuild(vals, Seq("grp"), col("v"))
    val out = Sketch.histQuantiles(h, Seq("grp"),
      Seq(("q0", 0.0), ("q50", 0.5), ("q100", 1.0))).collect()(0)
    assert(out.getAs[Long]("docs") == 11L)
    assert(out.getAs[Double]("q0") == 8.0)                       // t=0
    assert(out.getAs[Double]("q50") == math.rint((8.0 + 7.0 * (5.0 / 11.0)) * 1e4) / 1e4)
    // t = n−1 = 10 → 8 + 7·(10/11)
    assert(out.getAs[Double]("q100") == math.rint((8.0 + 7.0 * (10.0 / 11.0)) * 1e4) / 1e4)

    // two buckets: 5 values of 3 (bucket 2: lo 2 hi 3) + 5 of 20
    // (bucket 5: lo 16 hi 31): p50 → t=4.5 lands in bucket 2 at
    // (4.5−0)/5 of the span; p90 → t=8.1 in bucket 5 at (8.1−5)/5
    val two = ((0 until 5).map(_ => ("g", 3L)) ++ (0 until 5).map(_ => ("g", 20L)))
      .toDF("grp", "v")
    val o2 = Sketch.histQuantiles(Sketch.histBuild(two, Seq("grp"), col("v")),
      Seq("grp"), Seq(("p50", 0.5), ("p90", 0.9))).collect()(0)
    assert(o2.getAs[Double]("p50") == math.rint((2.0 + 1.0 * (4.5 / 5.0)) * 1e4) / 1e4)
    assert(o2.getAs[Double]("p90") == math.rint((16.0 + 15.0 * (3.1 / 5.0)) * 1e4) / 1e4)
  }
}
