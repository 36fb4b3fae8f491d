package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.extract.Page
import graft.job.{CurateJob, PageTableIO}

/** End-to-end spec for the crawl→training-set composition: every funnel
  * stage (extract, exact dedup, near dedup, quality+repetition gates,
  * decontamination, stratified quota) drops exactly the planted rows,
  * and the funnel report accounts for each. */
class CurateJobSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  private def page(url: String, body: String, hour: Long): Page = {
    val html =
      s"""<html><head><title>T</title></head><body>
         |<div class="article"><p>$body</p></div>
         |</body></html>""".stripMargin
    Page(url, new java.sql.Timestamp(1767225600000L + hour * 3600L * 1000),
      html.getBytes(java.nio.charset.StandardCharsets.UTF_8), "", "")
  }

  // comma-bearing prose that clears the quality gate while docs with
  // DIFFERENT seeds share no 3-gram (two of every three words are
  // seed-unique — only the planted duplicates may near-match)
  private def prose(seed: Int): String =
    (0 until 40).map { j =>
      val w =
        if (j % 3 == 0) Seq("the", "and", "of", "a", "to", "is")((j / 3) % 6)
        else s"word${seed}x$j"
      w + (if (j % 9 == 8) "," else "")
    }.mkString(" ") + s" marker$seed end of document text, which is plain."

  test("the funnel drops exactly the planted rows at each stage") {
    val tmp = java.nio.file.Files.createTempDirectory("curate").toString
    import spark.implicits._

    val pages = Seq(
      page("test://keep/1", prose(1), 0),
      page("test://keep/2", prose(2), 1),
      page("test://keep/3", prose(3), 2),
      // exact duplicate of keep/1 (same body) under a later url
      page("test://xdup/1", prose(1), 3),
      // near duplicate of keep/2: same prose with a tiny tail edit
      page("test://ndup/2", prose(2) + " tiny extra tail word", 4),
      // degenerate repetition: fails the repetition gate
      page("test://rep/1", Seq.fill(60)("loop").mkString(" "), 5),
      // contaminated: verbatim copy of the eval doc's text
      page("test://contam/1", prose(9), 6),
      // contaminated the SNEAKY way: a LONG page embedding the entire
      // eval doc — only ~1/3 of ITS OWN spans overlap, but 100% of the
      // BENCHMARK's do; the benchmark-normalized gate must drop it
      page("test://embed/1", prose(4) + " " + prose(9) + " " + prose(5), 7))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    // held-out eval set containing prose(9)
    Seq(("eval://doc/1", prose(9))).toDF("url", "text")
      .write.parquet(s"$tmp/eval")

    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10),
      evalPath = Some(s"$tmp/eval"))

    val curated = spark.read.parquet(s"$tmp/out/curated")
    val urls = curated.select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://keep/1", "test://keep/2", "test://keep/3"),
      s"funnel=$funnel urls=$urls")
    // funnel accounts for each stage: 8 extracted → 7 (exact dup gone) →
    // 6 (near dup gone) → 5 (repetition gone) → 3 (both the verbatim
    // copy AND the embedding page dropped by decontamination)
    assert(funnel.contains("\"extracted\":8"))
    assert(funnel.contains("\"after_exact_dedup\":7"))
    assert(funnel.contains("\"after_near_dedup\":6"))
    assert(funnel.contains("\"after_quality\":5"))
    assert(funnel.contains("\"after_decontam\":3"))
    assert(funnel.contains("\"curated\":3"))
    // deterministic: re-running into a fresh dir selects the same rows
    val funnel2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out2",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10),
      evalPath = Some(s"$tmp/eval"))
    assert(funnel2 == funnel)
    val urls2 = spark.read.parquet(s"$tmp/out2/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls2 == urls)
    // the curated schema carries the training-set columns
    assert(curated.columns.toSet ==
      Set("url", "warc_ts", "lang", "quality", "sample_rank",
        "bpe_tokens", "text"))
    // decontamination attribution: both planted contaminated docs appear
    // in the audit report with the benchmark that caught them
    val report = spark.read.parquet(s"$tmp/out/_decontam_report")
    assert(report.columns.toSet ==
      Set("train_id", "eval_id", "shared_spans", "bench_spans"))
    val dropped = report.select("train_id", "eval_id").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(dropped == Set(
      ("test://contam/1", "eval://doc/1"),
      ("test://embed/1", "eval://doc/1")), s"report=$dropped")
  }

  test("--resume restarts mid-funnel from the durable stage outputs " +
    "without recomputing committed stages") {
    val tmp = java.nio.file.Files.createTempDirectory("curater").toString
    import spark.implicits._
    val pages = Seq(
      page("test://keep/1", prose(1), 0),
      page("test://keep/2", prose(2), 1),
      page("test://xdup/1", prose(1), 2), // exact dup of keep/1
      page("test://contam/1", prose(9), 3))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    Seq(("eval://doc/1", prose(9))).toDF("url", "text")
      .write.parquet(s"$tmp/eval")
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10)

    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4, th = th, evalPath = Some(s"$tmp/eval"))

    // simulate a crash AFTER the quality stage committed: wipe the later
    // stages AND the raw input — a resume that recomputed any committed
    // stage (or re-extracted) would need the deleted pages dir and crash
    def rmr(p: String): Unit = {
      val hp = new org.apache.hadoop.fs.Path(p)
      hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(hp, true)
    }
    rmr(s"$tmp/out/stage_decontam")
    rmr(s"$tmp/out/_decontam_report")
    rmr(s"$tmp/out/curated")
    rmr(s"$tmp/pages")

    val funnel2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4, th = th, evalPath = Some(s"$tmp/eval"), resume = true)
    assert(funnel2 == funnel, s"resumed funnel must match: $funnel2 vs $funnel")
    val urls = spark.read.parquet(s"$tmp/out/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://keep/1", "test://keep/2"))
    // the rebuilt report still attributes the planted contaminated doc
    val rep = spark.read.parquet(s"$tmp/out/_decontam_report")
      .select("train_id").collect().map(_.getString(0)).toSet
    assert(rep == Set("test://contam/1"))
  }

  test("--bpe-merges learns the tokenizer over the CURATED corpus via " +
    "the batched learner and writes merge + segmented-vocab artifacts " +
    "identical to the sequential loop") {
    val tmp = java.nio.file.Files.createTempDirectory("curatebpe").toString
    import spark.implicits._
    val pages = (0 until 6).map(i => page(s"test://doc/$i", prose(i), i.toLong))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    CurateJob.run(spark, s"$tmp/pages", s"$tmp/out", partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10),
      bpeMerges = 5)
    val merges = spark.read.parquet(s"$tmp/out/_bpe_merges")
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges.size == 5)
    assert(merges.map(_._1) == (1 to 5))
    // the batched artifact equals the sequential learn over the same
    // curated piece table
    val pieces = graft.pipeline.TextOps.bpePieces(
      spark.read.parquet(s"$tmp/out/curated"), col("text"))
    val sequential = graft.pipeline.TextOps.bpeLearn(pieces, 5)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges == sequential)
    // segmented vocabulary: every piece present, counts carried, token
    // counts within [1, piece length]
    val vocab = spark.read.parquet(s"$tmp/out/_bpe_vocab")
    assert(vocab.columns.toSet == Set("piece", "cnt", "bpe_tokens"))
    assert(vocab.count() == pieces.count())
    val bad = vocab.where(col("bpe_tokens") < 1 ||
      col("bpe_tokens") > length(col("piece"))).count()
    assert(bad == 0L)
  }

  test("TokenizerJob: standalone tokenizer training over any text table " +
    "writes the same artifacts as CurateJob stage 8") {
    val tmp = java.nio.file.Files.createTempDirectory("tokjob").toString
    import spark.implicits._
    (0 until 6).map(i => (s"doc$i", prose(i))).toDF("url", "text")
      .write.parquet(s"$tmp/docs")
    val json = graft.job.TokenizerJob.run(spark, s"$tmp/docs", s"$tmp/out",
      merges = 5, batchK = 64)
    assert(json.contains("\"merges_learned\":5"), json)
    val merges = spark.read.parquet(s"$tmp/out/_bpe_merges")
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    val sequential = graft.pipeline.TextOps.bpeLearn(
      graft.pipeline.TextOps.bpePieces(
        spark.read.parquet(s"$tmp/docs"), col("text")), 5)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(merges == sequential)
    assert(spark.read.parquet(s"$tmp/out/_bpe_vocab").count() > 0)
  }

  test("an empty funnel (every doc gated out) still completes and writes " +
    "the funnel report — the 0-row partitioned curated dir must not " +
    "crash the read-back") {
    val tmp = java.nio.file.Files.createTempDirectory("curate0").toString
    import spark.implicits._
    val pages = (0 until 3).map(i => page(s"test://doc/$i", prose(i), i.toLong))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 1.1, quotaPerLang = 10))
    assert(funnel.contains("\"extracted\":3"))
    assert(funnel.contains("\"after_quality\":0"))
    assert(funnel.contains("\"curated\":0"), funnel)
    // the funnel artifact was written (the job reached its last step)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/out/_funnel.json")))
    // resume over the committed empty funnel is also a no-crash no-op
    val funnel2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 1.1, quotaPerLang = 10),
      resume = true)
    assert(funnel2 == funnel)
  }

  test("--near exact catches the planted near-dup pair that MinHash-LSH " +
    "deterministically misses; the funnel records which algorithm ran") {
    val tmp = java.nio.file.Files.createTempDirectory("curatenear").toString
    import spark.implicits._
    // seed 244: a J≈0.84 pair in the banding theory's ~0.4% miss band —
    // a deterministic LSH miss under the committed hashParams constants
    // (LshRecallSpec pins the miss on the raw text; this test pins it
    // through the real extraction path)
    val (base, variant) = TestCorpus.prosePair(244, 6)
    val pages = Seq(
      page("test://keep/1", prose(1), 0),
      page("test://pair/a", base, 1),
      page("test://pair/b", variant, 2))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10)

    val fMinhash = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_mh",
      partitions = 4, th = th, nearAlgo = "minhash")
    assert(fMinhash.contains("\"near_algo\":\"minhash\""))
    assert(fMinhash.contains("\"after_near_dedup\":3"),
      s"LSH should miss the planted J≈0.84 pair: $fMinhash")

    val fExact = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_ex",
      partitions = 4, th = th, nearAlgo = "exact")
    assert(fExact.contains("\"near_algo\":\"exact\""))
    assert(fExact.contains("\"after_near_dedup\":2"),
      s"prefixJaccardJoin must catch the pair LSH missed: $fExact")
    val urls = spark.read.parquet(s"$tmp/out_ex/curated")
      .select("url").collect().map(_.getString(0)).toSet
    // the cluster keeps its min url
    assert(urls == Set("test://keep/1", "test://pair/a"), urls.toString)
  }

  test("--quality-model drops the unlabeled spam doc the heuristic gates " +
    "wave through; scores ride stage_quality for audit") {
    val tmp = java.nio.file.Files.createTempDirectory("curateqm").toString
    import spark.implicits._
    // good docs share `good$j` unigrams, spam docs share `spam$j` —
    // never a 3-gram, so near-dedup can't collapse either class
    val pages = Seq(
      page("test://good/1", TestCorpus.signalProse(1, "good"), 0),
      page("test://good/2", TestCorpus.signalProse(2, "good"), 1),
      page("test://good/3", TestCorpus.signalProse(3, "good"), 2),
      page("test://spam/1", TestCorpus.signalProse(101, "spam"), 3),
      page("test://spam/2", TestCorpus.signalProse(102, "spam"), 4),
      page("test://spam/3", TestCorpus.signalProse(103, "spam"), 5))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10)

    // without the model every doc passes the heuristic gates — the spam
    // is prose-shaped by construction, so its drop below is attributable
    // to the LEARNED gate alone
    val fHeuristic = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_h",
      partitions = 4, th = th)
    assert(fHeuristic.contains("\"quality_model\":false"))
    assert(fHeuristic.contains("\"after_quality\":6"), fHeuristic)

    // label good/1+2 positive and spam/1+2 negative; good/3 and spam/3
    // are HELD OUT — the model must generalize via the shared unigrams
    Seq(("test://good/1", 1L), ("test://good/2", 1L),
      ("test://spam/1", 0L), ("test://spam/2", 0L))
      .toDF("url", "y").write.parquet(s"$tmp/labels")
    val fModel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_m",
      partitions = 4, th = th, qualityModelPath = Some(s"$tmp/labels"))
    assert(fModel.contains("\"quality_model\":true"))
    assert(fModel.contains("\"after_quality\":3"), fModel)
    val urls = spark.read.parquet(s"$tmp/out_m/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://good/1", "test://good/2", "test://good/3"),
      urls.toString)
    // the survivors' model scores ride the stage output for audit
    val probs = spark.read.parquet(s"$tmp/out_m/stage_quality")
      .select("url", "quality_model_prob").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(probs.keySet == urls)
    assert(probs.values.forall(_ >= 0.5), probs.toString)
  }

  test("--lm-ref drops the out-of-distribution doc the heuristic gates " +
    "wave through; lm_ppl rides stage_ppl and the model ships as _lm") {
    val tmp = java.nio.file.Files.createTempDirectory("curatelm").toString
    import spark.implicits._
    // trusted reference corpus: 10 docs sharing the `common` vocabulary
    val ref = (0 until 10).map(i =>
      (s"ref://doc/$i", TestCorpus.signalProse(i, "common")))
      .toDF("url", "text")
    ref.write.parquet(s"$tmp/ref")
    // in-distribution pages reuse reference seeds (their transitions are
    // SEEN bigrams); the OOV doc is prose-shaped — stopwords every 3rd
    // word, commas — so every heuristic gate waves it through, but its
    // seed-unique words never appeared in the reference: 2/3 of its
    // transitions hit the OOV backoff and its perplexity explodes
    val pages = Seq(
      page("test://indist/1", TestCorpus.signalProse(0, "common"), 0),
      page("test://indist/2", TestCorpus.signalProse(1, "common"), 1),
      page("test://indist/3", TestCorpus.signalProse(2, "common"), 2),
      page("test://oov/1", TestCorpus.signalProse(999, "zzqx"), 3))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10,
      maxPerplexity = 100.0)

    // without --lm-ref nothing is ppl-gated: after_ppl mirrors quality
    val fOff = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_off",
      partitions = 4, th = th)
    assert(fOff.contains("\"lm_ref\":false"))
    assert(fOff.contains("\"after_quality\":4"), fOff)
    assert(fOff.contains("\"after_ppl\":4"), fOff)

    val fOn = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_on",
      partitions = 4, th = th, lmRefPath = Some(s"$tmp/ref"))
    assert(fOn.contains("\"lm_ref\":true"))
    assert(fOn.contains("\"after_quality\":4"), fOn)
    assert(fOn.contains("\"after_ppl\":3"), fOn)
    val urls = spark.read.parquet(s"$tmp/out_on/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://indist/1", "test://indist/2",
      "test://indist/3"), urls.toString)
    // survivors' scores ride the stage output for audit
    val ppls = spark.read.parquet(s"$tmp/out_on/stage_ppl")
      .select("url", "lm_ppl").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ppls.keySet == urls)
    assert(ppls.values.forall(_ <= 100.0), ppls.toString)
    // the trained model is a shipped, loadable artifact: scoring the OOV
    // text through it reproduces the drop decision
    val m = graft.pipeline.LangModel.loadLm(spark, s"$tmp/out_on/_lm")
    val oovPpl = graft.pipeline.LangModel.perplexity(
      Seq((1L, TestCorpus.signalProse(999, "zzqx"))).toDF("doc_id", "text"),
      m, "doc_id", "text").select("ppl").head.getDouble(0)
    assert(oovPpl > 100.0, s"OOV doc must score above the gate: $oovPpl")
  }

  test("--dsir-ref/--dsir-n resamples toward the trusted reference " +
    "corpus: the domain-matched docs are drawn, with dsir_logw audit") {
    val tmp = java.nio.file.Files.createTempDirectory("curatedsir").toString
    import spark.implicits._
    // phys docs share `phys$j` unigrams with the reference corpus; off
    // docs share only stopwords — the importance-weight gap (~12 nats)
    // dwarfs the Gumbel noise, so the draw is effectively deterministic
    val pages = Seq(
      page("test://phys/1", TestCorpus.signalProse(1, "phys"), 0),
      page("test://phys/2", TestCorpus.signalProse(2, "phys"), 1),
      page("test://off/1", TestCorpus.signalProse(101, "off"), 2),
      page("test://off/2", TestCorpus.signalProse(102, "off"), 3))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    Seq.tabulate(4)(i =>
      (s"ref://doc/$i", TestCorpus.signalProse(900 + i, "phys")))
      .toDF("url", "text").write.parquet(s"$tmp/ref")
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10)

    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4, th = th,
      dsirRefPath = Some(s"$tmp/ref"), dsirN = 2)
    assert(funnel.contains("\"after_decontam\":4"), funnel)
    assert(funnel.contains("\"dsir\":true"))
    assert(funnel.contains("\"after_dsir\":2"), funnel)
    assert(funnel.contains("\"curated\":2"))
    val sel = spark.read.parquet(s"$tmp/out/stage_dsir")
    assert(sel.columns.contains("dsir_logw"))
    val urls = sel.select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://phys/1", "test://phys/2"),
      s"urls=$urls funnel=$funnel")
    val curated = spark.read.parquet(s"$tmp/out/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(curated == urls)

    // without the flag the stage is skipped and the funnel says so
    val f2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out2",
      partitions = 4, th = th)
    assert(f2.contains("\"dsir\":false"))
    assert(f2.contains("\"after_dsir\":4"), f2)
  }

  test("--strip-substrings rewrites survivors with the duplicated " +
    "boilerplate span removed, keeping the globally-first copy") {
    val tmp = java.nio.file.Files.createTempDirectory("curatestrip").toString
    import spark.implicits._
    // a 12-token license tail shared by two otherwise-unique docs; with
    // the identical 7-token prose trailer immediately before it, the
    // shared run is exactly 19 tokens (the maximal span)
    val lic = "all rights reserved contact the publisher for permission " +
      "to reuse this content"
    val pages = Seq(
      page("test://lica/1", s"${prose(31)} $lic", 0),
      page("test://licb/1", s"${prose(32)} $lic", 1),
      page("test://keep/1", prose(33), 2))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 10)

    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4, th = th, stripSubstrings = 10)
    assert(funnel.contains("\"after_near_dedup\":3"), funnel)
    assert(funnel.contains("\"strip_substrings\":10"))
    assert(funnel.contains("\"after_strip\":3"), funnel)
    assert(funnel.contains("\"after_quality\":3"), funnel)
    assert(funnel.contains("\"curated\":3"))
    val strip = spark.read.parquet(s"$tmp/out/stage_strip")
      .select("url", "text", "stripped_tokens").collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    // lica holds the globally-first copy (min url, pos) — untouched;
    // licb loses the trailer+license run; keep/1 shares only the
    // 7-token trailer (< k = 8) — untouched
    assert(strip("test://lica/1")._1.contains("reserved"))
    assert(strip("test://lica/1")._2 == 0L)
    assert(!strip("test://licb/1")._1.contains("reserved"))
    assert(strip("test://licb/1")._2 == 19L)
    assert(strip("test://keep/1")._2 == 0L)
    // the curated table carries the REWRITTEN text
    val curated = spark.read.parquet(s"$tmp/out/curated")
      .select("url", "text").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(!curated("test://licb/1").contains("reserved"))
    assert(curated("test://lica/1").contains("reserved"))

    // default: the stage is skipped entirely
    val f2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out2",
      partitions = 4, th = th)
    assert(f2.contains("\"strip_substrings\":0"))
    assert(f2.contains("\"after_strip\":3"))
    assert(!new java.io.File(s"$tmp/out2/stage_strip").exists())
  }

  test("kitchen-sink composition: every optional stage enabled at once " +
    "— exact near-dedup, substring strip, learned quality, LM gate, " +
    "decontam, DSIR, token quota, pack, tokenizer") {
    val tmp = java.nio.file.Files.createTempDirectory("curateall").toString
    import spark.implicits._
    val lic = "all rights reserved contact the publisher for permission " +
      "to reuse this content"
    val pages = Seq(
      page("test://phys/1", TestCorpus.signalProse(1, "phys"), 0),
      page("test://phys/2", TestCorpus.signalProse(2, "phys") + " " + lic, 1),
      page("test://phys/3", TestCorpus.signalProse(3, "phys") + " " + lic, 2),
      page("test://off/1", TestCorpus.signalProse(101, "off"), 3),
      page("test://off/2", TestCorpus.signalProse(102, "off"), 4),
      page("test://contam/1", prose(9), 5))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    Seq(("eval://doc/1", prose(9))).toDF("url", "text")
      .write.parquet(s"$tmp/eval")
    Seq.tabulate(4)(i =>
      (s"ref://doc/$i", TestCorpus.signalProse(900 + i, "phys")))
      .toDF("url", "text").write.parquet(s"$tmp/ref")
    Seq(("test://phys/1", 1L), ("test://phys/2", 1L), ("test://off/1", 0L))
      .toDF("url", "y").write.parquet(s"$tmp/labels")

    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.1, maxPerplexity = 1e6,
        minModelProb = 0.0),
      evalPath = Some(s"$tmp/eval"),
      bpeMerges = 5, nearAlgo = "exact",
      qualityModelPath = Some(s"$tmp/labels"),
      lmRefPath = Some(s"$tmp/ref"),
      dsirRefPath = Some(s"$tmp/ref"), dsirN = 3,
      stripSubstrings = 10, quotaTokens = 100000L,
      packChunks = 64, packShards = 2)
    // every stage reports; contam doc dies at decontam, DSIR draws the
    // 3 phys docs (the off docs lose the importance draw)
    for (k <- Seq("extracted", "after_exact_dedup", "near_algo",
      "strip_substrings", "after_strip", "quality_model", "after_quality",
      "lm_ref", "after_ppl", "after_decontam", "dsir", "after_dsir",
      "quota_tokens", "curated"))
      assert(funnel.contains("\"" + k + "\""), s"missing $k in $funnel")
    assert(funnel.contains("\"after_decontam\":5"), funnel)
    assert(funnel.contains("\"after_dsir\":3"), funnel)
    val urls = spark.read.parquet(s"$tmp/out/curated")
      .select("url").collect().map(_.getString(0)).toSet
    assert(urls == Set("test://phys/1", "test://phys/2", "test://phys/3"),
      s"$urls $funnel")
    // the second/third license copies were stripped before the gates
    val strip = spark.read.parquet(s"$tmp/out/stage_strip")
      .select("url", "stripped_tokens").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(strip("test://phys/2") == 0L)
    assert(strip("test://phys/3") > 0L)
    // all artifacts shipped
    for (a <- Seq("_funnel.json", "_decontam_report", "_lm", "_pack",
      "_pack_manifest", "_bpe_merges", "_bpe_vocab"))
      assert(new java.io.File(s"$tmp/out/$a").exists(), a)
  }

  test("quota caps per language; without an eval table decontamination " +
    "is skipped; --pack-chunks ships placement + manifest") {
    val tmp = java.nio.file.Files.createTempDirectory("curateq").toString
    import spark.implicits._
    val pages = (0 until 8).map(i => page(s"test://doc/$i", prose(i), i.toLong))
    PageTableIO.write(spark.createDataset(pages).toDF(), s"$tmp/pages",
      numBuckets = 2)
    val funnel = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 4),
      packChunks = 32, packShards = 2)
    val curated = spark.read.parquet(s"$tmp/out/curated")
    assert(curated.count() == 4) // quota bound, one language (en)
    assert(curated.select(max(col("sample_rank"))).head.getInt(0) == 4)
    assert(funnel.contains("\"curated\":4"))

    // pack export: one placement row per curated doc; every chunk but
    // each shard's last is exactly full; token totals conserve
    val pack = spark.read.parquet(s"$tmp/out/_pack")
    assert(pack.count() == 4)
    val manifest = spark.read.parquet(s"$tmp/out/_pack_manifest")
      .select("shard", "chunk", "tokens").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    manifest.groupBy(_._1).foreach { case (_, rows) =>
      rows.sortBy(_._2).init.foreach(r => assert(r._3 == 32L, r.toString))
    }
    val totalToks = pack.agg(sum(col("tokens"))).head.getLong(0)
    assert(manifest.map(_._3).sum == totalToks)

    // --quota-tokens: the TOKEN-budget mixture fill — each prose doc is
    // ~47 tokens, so a 100-token budget keeps exactly 3 docs (the third
    // overflows), best-quality-first
    val f2 = CurateJob.run(spark, s"$tmp/pages", s"$tmp/out_tb",
      partitions = 4,
      th = CurateJob.Thresholds(minQuality = 0.2, quotaPerLang = 1000),
      quotaTokens = 100L)
    assert(f2.contains("\"quota_tokens\":100"), f2)
    val tb = spark.read.parquet(s"$tmp/out_tb/curated")
      .select("url", "sample_rank", "quality", "bpe_tokens").collect()
    assert(tb.length == 3, tb.mkString(","))
    assert(tb.map(_.getInt(1)).sorted.toSeq == Seq(1, 2, 3))
    // best-first: the kept docs' qualities dominate the dropped ones'
    val keptQ = tb.map(_.getDouble(2)).min
    val allQ = spark.read.parquet(s"$tmp/out_tb/stage_quality")
      .select("url", "quality").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val droppedQ = (allQ -- tb.map(_.getString(0))).values
    assert(droppedQ.forall(q => q <= keptQ), s"kept=$keptQ dropped=$droppedQ")
  }
}
