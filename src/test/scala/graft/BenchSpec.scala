package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Pins Bench's failure-marking contract: a query that fails every
  * attempt must be distinguishable in the emitted artifact (negative
  * value + `failed` list), never confusable with a fast success
  * (VERDICT r3 "what's wrong" #4). */
class BenchSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark

  test("benchQueries marks a double-crashing query as failed with a " +
    "negative elapsed, and leaves successful timings positive") {
    val qs: Map[String, (SparkSession, String) => DataFrame] = Map(
      "ok_query" -> ((s, _) => s.range(10).toDF("n")),
      "broken_query" -> ((s, _) =>
        // fails at execution time on every attempt (ANSI division by zero
        // is deferred to runtime via a column, not caught at plan time)
        s.range(1).toDF("n").select((lit(1) / col("n") === 99).as("x"))
          .where(col("x")))
    )
    val (results, failed) = Bench.benchQueries(spark, "/nonexistent", qs)
    val m = results.toMap
    assert(failed == Seq("broken_query"))
    assert(m("broken_query") < 0.0, "failed query must report a NEGATIVE elapsed")
    assert(m("ok_query") > 0.0)
    // total-style consumers filter on > 0: only the success survives
    assert(results.map(_._2).count(_ > 0) == 1)
  }

  test("headlineDocsPerSec: an all-capped run emits a NEGATIVE ≤-bound " +
    "(never confusable with a measured rate); any valid attempt emits " +
    "the positive measured rate; a completed zero-doc attempt stays 0.0") {
    val capped = Bench.Attempt(30.0, 0.0, timedOut = true,
      tasksStarted = 5, tasksCompleted = 0)
    val ok = Bench.Attempt(3.0, 90.0, timedOut = false,
      tasksStarted = 100, tasksCompleted = 100)
    // every attempt capped → docs unknown → bound at benchDocs/cap, NEGATED
    assert(Bench.headlineDocsPerSec(Seq(capped, capped), 0L, 12000L) == -400.0)
    // one valid attempt → measured rate from its wall, positive
    assert(Bench.headlineDocsPerSec(Seq(capped, ok), 11000L, 12000L) > 0.0)
    assert(Bench.headlineDocsPerSec(Seq(ok), 12000L, 12000L) == 4000.0)
    // a COMPLETED attempt that extracted zero ok docs reports honest 0.0,
    // not a substituted bound
    assert(Bench.headlineDocsPerSec(Seq(ok), 0L, 12000L) == 0.0)
  }

  test("isCancellation matches only the job-group-cancellation family — " +
    "a genuine failure racing the watchdog must surface (ADVICE r6)") {
    assert(Bench.isCancellation(new org.apache.spark.SparkException(
      "Job 7 cancelled because of a job group cancellation")))
    assert(Bench.isCancellation(
      new RuntimeException("wrapper", new InterruptedException())))
    assert(!Bench.isCancellation(new OutOfMemoryError("heap")))
    assert(!Bench.isCancellation(new RuntimeException(
      "FileNotFoundException: corrupt input split")))
  }

  test("benchQueries with no failures returns an empty failed list") {
    val qs: Map[String, (SparkSession, String) => DataFrame] =
      Map("only" -> ((s, _) => s.range(3).toDF("n")))
    val (results, failed) = Bench.benchQueries(spark, "/nonexistent", qs)
    assert(failed.isEmpty)
    assert(results.head._2 > 0.0)
  }
}
