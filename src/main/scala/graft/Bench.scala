package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.extract.{Extractor, Page}

/**
 * Benchmark main (driver contract): times every SparkEntry query on
 * SPARK_GRAFT_SF_DIR plus the extraction headline (docs/sec over the
 * replicated real-article corpus), printing ONE JSON line.
 *
 * Noise protocol (the sandbox host has noisy neighbors — identical runs
 * can vary 10×, see BENCH.md §2):
 *  - every query is best-of-2 over SUCCESSFUL runs;
 *  - the extraction headline is ADAPTIVE best-of-N: attempt 1 runs before
 *    the query loop and attempt 2 after it (the ~30 s loop separates the
 *    two measurement windows, so one noisy neighbor can't sit on both);
 *    if the two attempts still disagree by >3× the measurement window is
 *    suspect and up to 2 more attempts are taken (BENCH_r02/r03 captured
 *    20–29× artifacts when both attempts shared one window);
 *  - a query that fails EVERY attempt is reported in a `failed` array and
 *    its `queries` value is the NEGATED worst elapsed — never confusable
 *    with a successful timing — and is excluded from total_sec;
 *  - an extraction headline whose EVERY attempt was wall-capped is a
 *    ≤-bound, not a measurement: `value` is NEGATED (same convention)
 *    and `extract_timed_out` is true; per-attempt
 *    tasks_started/tasks_completed counters distinguish host starvation
 *    (≈0 started over a full window) from tasks-ran-but-couldn't-finish.
 *
 * Self-calibration (VERDICT r5 #1): the wall_vs_cpu ratio alone cannot
 * flag a host whose memory-bandwidth contention inflates CPU time itself
 * (stalled cycles are on-CPU — BENCH_r05 recorded 33.7 cpu-sec/kdoc at a
 * healthy-looking 1.15 ratio while a same-day bare-JVM run measured
 * 7.15). The artifact therefore stamps the COMMITTED single-config CPU
 * floor (`cpu_sec_per_kdoc_reference`, from BENCH.md §2's cross-round
 * history at local[32]) and a derived `host_inflation` =
 * measured / reference — any squeezed window is machine-readable from
 * the artifact alone, whether the squeeze lands in wall or in CPU.
 * Attempts are also WALL-CAPPED at max(30 s, 10× the floor-predicted
 * wall): a cancelled attempt is marked `timed_out` (excluded from
 * best-of), bounding a loaded host's artifact at ~2 min of extraction
 * measurement instead of the ~9 min BENCH_r05 spent.
 *
 * Env knobs:
 *   SPARK_GRAFT_SF_DIR      testdata dir (default /root/testdata/sf0.1)
 *   SPARK_GRAFT_CPUS        local[N] parallelism (default 32)
 *   SPARK_GRAFT_BENCH_DOCS  headline corpus size (default 12000 docs)
 *   SPARK_GRAFT_ARTICLES    dir with fixture articles (default repo path)
 */
object Bench {

  /** Committed CPU floor for the extraction headline at local[32],
    * cpu-sec per 1000 docs over the fixture corpus. Source: BENCH.md §2's
    * cross-round history — re-committed 7.0 → 6.0 in round 7 after the
    * isPySpace table / presized memos / attr-name interning changes:
    * ScalingBench's interleaved best-of measured 6.01 at local[32]
    * (4,239 docs/sec) with 5.09–5.17 at local[8].
    * This is an engine property of the committed code, not a host
    * property — re-commit it when an extraction change moves the floor
    * (ScalingBench's interleaved protocol is the measurement to trust). */
  val ReferenceCpuSecPerKdoc: Double = 6.0

  /** One extraction attempt's evidence: wall clock, executor CPU,
    * whether the wall-cap watchdog cancelled it, and how many tasks
    * started/completed inside its window. The task counters attribute a
    * 0.00-cpu capped attempt (BENCH_r06 attempts 2–4): started ≈ 0 means
    * the scheduler never ran tasks (host starvation or a post-cancel
    * scheduler wedge on the PREVIOUS attempt's group), started ≫
    * completed means tasks ran but could not finish inside the cap. */
  final case class Attempt(wallSec: Double, cpuSec: Double, timedOut: Boolean,
                           tasksStarted: Long, tasksCompleted: Long)

  /** Headline sign convention (pure, pinned by BenchSpec): on a run where
    * EVERY attempt hit the wall cap, the rate is a fabricated ≤-bound
    * (docs / cap-wall), not a measurement — NEGATE it (the convention
    * failed queries already use) so no consumer can read it as a timing
    * without noticing; `extract_timed_out` carries the same fact for
    * structured readers. */
  def headlineDocsPerSec(attempts: Seq[Attempt], okDocs: Long,
                         benchDocs: Long): Double = {
    val valid = attempts.filterNot(_.timedOut)
    val allCapped = valid.isEmpty
    val best = (if (valid.nonEmpty) valid else attempts).minBy(_.wallSec)
    // all-capped ⟹ no attempt ever produced a count (okDocs still 0):
    // the bound substitutes the intended corpus size; a COMPLETED attempt
    // that extracted zero ok docs keeps its honest 0.0
    val docs = if (allCapped && okDocs == 0) benchDocs else okDocs
    val rate = docs / best.wallSec
    if (allCapped) -rate else rate
  }

  /** True when `e`'s cause chain is the job-group cancellation our wall
    * cap issues — the ONLY failure the watchdog may classify as a
    * timeout. Any other failure racing the timer (OOM, corrupt input)
    * must surface, not be recorded as a plausible capped attempt. */
  def isCancellation(e: Throwable): Boolean = {
    var t: Throwable = e
    var depth = 0
    while (t != null && depth < 16) {
      val msg = Option(t.getMessage).getOrElse("")
      if (t.isInstanceOf[InterruptedException] ||
        msg.contains("cancelled") || msg.contains("canceled") ||
        msg.contains("SparkContext was shut down")) return true
      t = if (t.getCause eq t) null else t.getCause
      depth += 1
    }
    false
  }

  /** One timed attempt per query, best-of over `attempts` SUCCESSFUL runs.
    * Attempts run ROUND-ROBIN (all queries' attempt 1, then all attempt 2,
    * …) rather than back-to-back: attempt 2 of every query then runs with
    * warm JIT/scan caches AND in a time window separated from attempt 1
    * by the full loop, so one noisy-neighbor burst can't sit on both
    * attempts of the same query (VERDICT r4 #7 warm-up parity).
    * Returns (name -> seconds) with failed-on-every-attempt queries
    * reported as NEGATIVE worst-elapsed, plus the list of failed names.
    * Pulled out of main so the failure-marking contract is unit-testable. */
  def benchQueries(spark: SparkSession, sfDir: String,
                   queries: Map[String, (SparkSession, String) => DataFrame],
                   attempts: Int = 2): (Seq[(String, Double)], Seq[String]) = {
    val names = queries.keys.toSeq.sorted
    val best = scala.collection.mutable.Map[String, Double]()
    val worstFail = scala.collection.mutable.Map[String, Double]().withDefaultValue(0.0)
    (1 to attempts).foreach { _ =>
      names.foreach { name =>
        val t0 = System.nanoTime()
        val ok = try { queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"bench: $name failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
          false
        }
        val dt = (System.nanoTime() - t0) / 1e9
        if (ok) best(name) = math.min(best.getOrElse(name, Double.MaxValue), dt)
        else worstFail(name) = math.max(worstFail(name), dt)
      }
    }
    val failed = names.filterNot(best.contains)
    val results = names.map { n =>
      if (best.contains(n)) n -> best(n) else n -> -worstFail(n)
    }
    (results, failed)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val benchDocs = sys.env.getOrElse("SPARK_GRAFT_BENCH_DOCS", "12000").toInt

    val spark = SparkSession.builder()
      .appName("graft-bench")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- extraction headline corpus: replicated real articles ----------
    val articleDir = sys.env.getOrElse("SPARK_GRAFT_ARTICLES",
      "/root/repo/src/test/resources/fixtures/articles")
    val names = graft.job.FixtureGen.Articles
    val articles: Seq[(String, Array[Byte])] =
      if (new java.io.File(articleDir).isDirectory)
        names.map(n => (n, java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(articleDir, n))))
      else Seq.empty

    var docsPerSec = 0.0
    var mbPerSec = 0.0
    var extractSec = 0.0
    // Executor CPU time per doc is the noise-immune signal the wall clock
    // lacks: a noisy-neighbor host inflates wall while cpu_sec/doc stays
    // flat (rounds 2–4 all saw the driver's wall-clock headline misread a
    // ~3,500 docs/sec engine as ~100; flat CPU with inflated wall is
    // machine-checkable evidence). timedOut marks an attempt cancelled at
    // the wall cap — it never enters the best-of pool.
    var extractAttempts = List.empty[Attempt]
    // wall cap per attempt: 10× the floor-predicted wall, never under 30 s
    // (the floor prediction assumes perfect 32-way scaling the host can't
    // deliver — BENCH.md §2's DRAM ceiling — so the healthy band is ~2–6×
    // the prediction; 10× only triggers on genuinely squeezed windows)
    val attemptCapSec = math.max(30.0,
      // note: the cap scales with the committed floor — re-committing a
      // lower floor also tightens the wall cap proportionally (an
      // all-capped run still degrades gracefully to a flagged bound)
      10.0 * (benchDocs / 1000.0) * ReferenceCpuSecPerKdoc / cpus.toDouble)
    val cpuNs = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasksStarted = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasksEnded = new java.util.concurrent.atomic.AtomicLong(0L)
    val cpuListener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
        tasksStarted.incrementAndGet()
      override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasksEnded.incrementAndGet()
        if (e.taskMetrics != null) cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
      }
    }
    spark.sparkContext.addSparkListener(cpuListener)
    // waitUntilEmpty throws TimeoutException after 10 s — on a squeezed
    // host a backed-up bus must cost a slightly smeared CPU attribution,
    // never the whole benchmark run
    def drainBus(): Unit =
      try org.apache.spark.GraftListenerBusDrain.drain(spark.sparkContext)
      catch { case e: Exception =>
        System.err.println(s"bench: listener bus drain timed out ($e) — " +
          "cpu attribution may smear across attempts")
      }
    def extractAttempt(corpus: => org.apache.spark.sql.Dataset[Page]): (Attempt, Long) = {
      // listener events are posted asynchronously: drain the bus so the
      // cpu/task snapshots bracket exactly this attempt's tasks
      drainBus()
      val cpu0 = cpuNs.get
      val ts0 = tasksStarted.get
      val te0 = tasksEnded.get
      val t0 = System.nanoTime()
      val group = s"graft-extract-attempt-$t0"
      @volatile var timedOut = false
      val watchdog = new java.util.Timer("bench-attempt-watchdog", true)
      spark.sparkContext.setJobGroup(group, "bench extraction attempt",
        interruptOnCancel = true)
      val n = try {
        watchdog.schedule(new java.util.TimerTask {
          override def run(): Unit = {
            timedOut = true
            System.err.println(f"bench: extraction attempt exceeded the " +
              f"$attemptCapSec%.0f s wall cap — cancelling (timed_out)")
            spark.sparkContext.cancelJobGroup(group)
          }
        }, (attemptCapSec * 1000).toLong)
        corpus.map(Extractor.extract)
          .select("status").where($"status" === "ok").count()
      } catch {
        // ONLY our own cancellation reads as a wall-cap timeout; a
        // genuine failure (OOM, corrupt input) racing the watchdog must
        // surface, not be recorded as a plausible capped attempt —
        // otherwise a persistently failing corpus reads as "capped" and
        // the headline fabricates a ≤-bound (ADVICE r6 #3)
        case e: Throwable if timedOut && isCancellation(e) => -1L
      } finally {
        watchdog.cancel()
        spark.sparkContext.clearJobGroup()
      }
      // aborted only when the cancellation actually killed the count —
      // a timer firing in the window after a just-under-the-cap success
      // must not discard a real measurement
      val aborted = timedOut && n == -1L
      val wall = if (aborted) attemptCapSec else (System.nanoTime() - t0) / 1e9
      drainBus()
      (Attempt(wall, (cpuNs.get - cpu0) / 1e9, aborted,
        tasksStarted.get - ts0, tasksEnded.get - te0), n)
    }

    val corpusOpt: Option[() => org.apache.spark.sql.Dataset[Page]] =
      if (articles.isEmpty) None
      else {
        val bc = spark.sparkContext.broadcast(articles)
        Some(() => spark.range(0, benchDocs, 1, cpus.toInt * 2).map { i =>
          val arts = bc.value
          val (name, html) = arts((i % arts.length).toInt)
          Page(s"bench://$name/$i", new java.sql.Timestamp(1767225600000L + i * 60000L),
            html, "", "")
        })
      }
    var okDocs = 0L
    val totalBytes =
      if (articles.isEmpty) 0L
      else articles.map(_._2.length.toLong).sum * (benchDocs / articles.length)

    // warmup (JIT) then extraction attempt 1 — BEFORE the query loop
    corpusOpt.foreach { corpus =>
      corpus().limit(600).map(Extractor.extract).count()
      val (wc, n) = extractAttempt(corpus())
      extractAttempts ::= wc; if (n >= 0) okDocs = n
    }

    // ---- per-query timings (best-of-2, failures marked) -----------------
    val (results, failedQs) = benchQueries(spark, sfDir, SparkEntry.queries)

    // extraction attempt 2 — AFTER the query loop (separate time window);
    // adaptive: >3× disagreement (or fewer than two uncapped attempts)
    // means a noisy window, take up to 2 more
    var cpuSecPerKdoc = 0.0
    var wallVsCpuRatio = 0.0
    var extractTimedOut = false
    corpusOpt.foreach { corpus =>
      val (wc2, n2) = extractAttempt(corpus())
      extractAttempts ::= wc2; if (n2 >= 0) okDocs = n2
      var extra = 0
      def valid = extractAttempts.filterNot(_.timedOut)
      def suspect: Boolean =
        if (valid.size < 2) true
        else { val ws = valid.map(_.wallSec); ws.max / ws.min > 3.0 }
      while (extra < 2 && suspect) {
        val ws = extractAttempts.map(_.wallSec)
        System.err.println(f"bench: extraction window suspect " +
          f"(${ws.min}%.2f..${ws.max}%.2f s, ${valid.size} uncapped) — retrying")
        val (wcE, nE) = extractAttempt(corpus())
        extractAttempts ::= wcE; if (nE >= 0) okDocs = nE
        extra += 1
      }
      // best over uncapped attempts; if EVERY attempt hit the cap the
      // headline is a NEGATED ≤-bound at the cap wall (never confusable
      // with a measured rate) and extract_timed_out says why
      extractTimedOut = valid.isEmpty
      val best = (if (valid.nonEmpty) valid else extractAttempts).minBy(_.wallSec)
      extractSec = best.wallSec
      docsPerSec = headlineDocsPerSec(extractAttempts, okDocs, benchDocs.toLong)
      mbPerSec = totalBytes / 1e6 / extractSec
      // CPU evidence from the best attempt: flat cpu_sec/kdoc across
      // rounds + wall ≫ cpu/cores = loaded host, not a slow engine
      cpuSecPerKdoc = best.cpuSec / (benchDocs / 1000.0)
      val idealWall = best.cpuSec / cpus.toDouble
      wallVsCpuRatio = if (idealWall > 0) extractSec / idealWall else 0.0
    }

    val qs = results.map { case (k, v) => "\"" + k + f"""\":$v%.3f""" }
      .mkString("{", ",", "}")
    val failedJson = failedQs.map("\"" + _ + "\"").mkString("[", ",", "]")
    val attemptsJson = extractAttempts.reverse
      .map { a =>
        f"""{"wall_sec":${a.wallSec}%.2f,"cpu_sec":${a.cpuSec}%.2f,""" +
          f""""timed_out":${a.timedOut},"tasks_started":${a.tasksStarted},""" +
          f""""tasks_completed":${a.tasksCompleted}}""" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ > 0).sum + extractSec
    // host_inflation: measured cpu-sec/kdoc over the committed floor.
    // ~1.0 = trustworthy window; ≫1 = the host inflated cycle cost
    // (memory-bandwidth stalls are on-CPU) and the wall headline
    // under-reads the engine by roughly the same factor.
    val hostInflation =
      if (cpuSecPerKdoc > 0) cpuSecPerKdoc / ReferenceCpuSecPerKdoc else 0.0

    val json =
      f"""{"metric":"extract_docs_per_sec","value":$docsPerSec%.1f,"unit":"docs/sec","total_sec":$total%.2f,"extract_sec":$extractSec%.2f,"extract_attempts":${extractAttempts.size},"extract_attempt_detail":$attemptsJson,"extract_attempt_cap_sec":$attemptCapSec%.1f,"extract_timed_out":$extractTimedOut,"cpu_sec_per_kdoc":$cpuSecPerKdoc%.2f,"cpu_sec_per_kdoc_reference":$ReferenceCpuSecPerKdoc%.2f,"host_inflation":$hostInflation%.2f,"wall_vs_cpu_ratio":$wallVsCpuRatio%.2f,"extract_mb_per_sec":$mbPerSec%.1f,"bench_docs":$benchDocs,"cpus":$cpus,"failed":$failedJson,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // bare-file copy so harnesses don't have to scrape the JSON line out of
    // sbt's [info]-prefixed stdout (env-overridable path)
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case e: Exception => System.err.println(s"bench.json write failed: $e") }
    spark.stop()
  }
}
