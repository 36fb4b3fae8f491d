package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.TextOps

/** Planted-corpus pins for the relational BPE merge loop (q48):
  * greedy-leftmost pairing, count-weighted pair statistics, the
  * deterministic tie-break, and early stop when no pair remains. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSessionFixture.spark
  import spark.implicits._

  private def learn(pieces: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] =
    TextOps.bpeLearn(pieces.toDF("piece", "cnt"), rounds)
      .orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("abab: merges (a,b) then (ab,ab), counts weighted by piece count") {
    // "abab"×2: round 1 sees (a,b)×2 and (b,a)×1 per occurrence
    assert(learn(Seq(("abab", 2L)), 3) ==
      Seq((1, "a", "b", 4L), (2, "ab", "ab", 2L)))
  }

  test("aaa: greedy-leftmost — (a,a) pairs once into [aa][a], not [a][aa]") {
    // round 1: (a,a) count 2 (overlapping adjacencies both counted in the
    // STATISTICS); the merge itself is non-overlapping leftmost, leaving
    // [aa][a] → round 2 merges (aa, a)
    assert(learn(Seq(("aaa", 1L)), 3) ==
      Seq((1, "a", "a", 2L), (2, "aa", "a", 1L)))
  }

  test("tie-break: equal counts resolve by (left, right) ascending") {
    assert(learn(Seq(("cd", 1L), ("ab", 1L)), 1) == Seq((1, "a", "b", 1L)))
  }

  test("early stop: once every piece is a single symbol no further " +
    "rounds are emitted") {
    val out = learn(Seq(("ab", 3L)), 5)
    assert(out == Seq((1, "a", "b", 3L)))
  }

  test("count weighting picks the frequent pair over the diverse one") {
    // (x,y) appears in one piece with count 5; (p,q) in two pieces with
    // counts 2+2=4 — frequency wins
    val out = learn(Seq(("xy", 5L), ("pq", 2L), ("pqr", 2L)), 1)
    assert(out == Seq((1, "x", "y", 5L)))
  }

  test("pieces containing the delimiter codepoints are dropped, not " +
    "corrupted") {
    val out = learn(Seq(("a\u0001b", 9L), ("cd", 1L)), 1)
    assert(out == Seq((1, "c", "d", 1L)))
  }

  private def segment(pieces: Seq[String], merges: Seq[(String, String)]): Map[String, Int] =
    TextOps.bpeSegmentCounts(pieces.toDF("piece"), merges)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap

  test("bpeSegmentCounts replays merges in order with greedy-leftmost " +
    "semantics (the apply side of the learner)") {
    // no merges: every char is a token
    assert(segment(Seq("hello"), Nil) == Map("hello" -> 5))
    // one merge: (a,a) over "aaa" → [aa][a] (greedy leftmost)
    assert(segment(Seq("aaa"), Seq(("a", "a"))) == Map("aaa" -> 2))
    // ORDER matters: (a,a) then (aa,a) fully merges "aaa"; the reverse
    // order can't ((aa,a) finds no "aa" symbol yet)
    assert(segment(Seq("aaa"), Seq(("a", "a"), ("aa", "a"))) == Map("aaa" -> 1))
    assert(segment(Seq("aaa"), Seq(("aa", "a"), ("a", "a"))) == Map("aaa" -> 2))
    // multi-piece vocabulary segments independently
    assert(segment(Seq("abab", "ab", "ba"), Seq(("a", "b"), ("ab", "ab"))) ==
      Map("abab" -> 1, "ab" -> 1, "ba" -> 2))
  }

  // reference implementation: lists of symbols, straight from the BPE
  // definition — no delimiters, no string replaces
  private def naive(pieces: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] = {
      var vocab: Seq[(Vector[String], Long)] =
        pieces.groupBy(_._1).toSeq.map { case (p, rs) =>
          (p.map(_.toString).toVector, rs.map(_._2).sum)
        }
      val out = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
      var r = 1
      var done = false
      while (r <= rounds && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        vocab.foreach { case (syms, cnt) =>
          syms.sliding(2).foreach {
            case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + cnt
            case _ =>
          }
        }
        if (counts.isEmpty) done = true
        else {
          val ((l, rt), c) = counts.toSeq
            .minBy { case ((a, b), n) => (-n, a, b) }
          out += ((r, l, rt, c))
          vocab = vocab.map { case (syms, cnt) =>
            val merged = Vector.newBuilder[String]
            var i = 0
            while (i < syms.length) {
              if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
                merged += (l + rt); i += 2 // greedy leftmost
              } else { merged += syms(i); i += 1 }
            }
            (merged.result(), cnt)
          }
          r += 1
        }
      }
      out.toSeq
  }

  test("property: bpeLearn ≡ a naive in-memory BPE on random vocabularies " +
    "(pair statistics, tie-breaks, greedy merging, early stop)") {
    // trials kept small: each learn round is a full Spark job chain and
    // the whole suite must stay fast; the planted tests above cover the
    // deterministic edges, this sweep covers random interaction
    val rnd = new scala.util.Random(77)
    (0 until 4).foreach { trial =>
      val alphabet = "abcd"
      val pieces = (0 until 12 + rnd.nextInt(10)).map { _ =>
        val len = 1 + rnd.nextInt(6)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).toSeq.map { case (p, rs) => (p, rs.map(_._2).sum) }
      val rounds = 2 + rnd.nextInt(2)
      assert(learn(pieces, rounds) == naive(pieces, rounds),
        s"trial $trial pieces=$pieces rounds=$rounds")
    }
  }

  private def learnBatched(pieces: Seq[(String, Long)], merges: Int,
                           batchK: Int): Seq[(Int, String, String, Long)] =
    TextOps.bpeLearnBatched(pieces.toDF("piece", "cnt"), merges, batchK)
      .orderBy("round")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("bpeLearnBatched ≡ sequential on the planted vocabularies, " +
    "including the created-symbol coupling and tie cases") {
    // aaa/abab: created symbols ("aa", "ab") couple consecutive merges —
    // the involved-set guard must serialize them across recounts
    for (pieces <- Seq(
      Seq(("abab", 2L)),
      Seq(("aaa", 1L)),
      Seq(("aaabab", 3L), ("ab", 1L)),
      // ties everywhere: every pair count 1 — strict truncation forces
      // the single-merge fallback each round (= plain sequential)
      Seq(("ab", 1L), ("cd", 1L), ("ef", 1L)),
      // disjoint frequent pairs at distinct counts: one batch round
      Seq(("ab", 9L), ("cd", 7L), ("ef", 5L), ("gh", 3L)));
         k <- Seq(1, 2, 8)) {
      assert(learnBatched(pieces, 6, k) == naive(pieces, 6),
        s"pieces=$pieces batchK=$k")
    }
  }

  test("bpeLearnBatched ≡ sequential on corpora where a batched " +
    "SELF-PAIR's run-collapse mints pairs that outrank later batch " +
    "members (the counterexamples a 650k-corpus differential search " +
    "found against the r5 selection rule)") {
    // (a,a)·199 and (b,b)·32 are involved-set-disjoint, so the old rule
    // batched them — but merging (a,a) over the a-runs creates
    // (aa,aa)·64 > 32, which the sequential loop picks SECOND; the
    // self-pair batch boundary forces (a,a) to apply alone
    val selfPairBoost = Seq(
      ("a", 30L), ("aaaa", 10L), ("aaaaaaa", 27L), ("aaba", 7L),
      ("b", 27L), ("bbba", 16L))
    // same mode later in the learn: (b,b)·18 creates (bb,bb)·6 > (a,a)·1
    val lateBoost = Seq(
      ("aa", 1L), ("abb", 2L), ("baabbab", 19L), ("bbbb", 6L))
    for (pieces <- Seq(selfPairBoost, lateBoost); k <- Seq(2, 4, 6)) {
      assert(learnBatched(pieces, 7, k) == naive(pieces, 7),
        s"pieces=$pieces batchK=$k")
    }
  }

  test("property: bpeLearnBatched ≡ the naive sequential BPE on random " +
    "vocabularies at every batch size") {
    val rnd = new scala.util.Random(41)
    (0 until 3).foreach { trial =>
      val alphabet = "abc" // small alphabet: dense symbol collisions,
      // frequent created-symbol coupling across batches
      val pieces = (0 until 14 + rnd.nextInt(8)).map { _ =>
        val len = 1 + rnd.nextInt(7)
        (Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString,
          (1 + rnd.nextInt(9)).toLong)
      }.groupBy(_._1).toSeq.map { case (p, rs) => (p, rs.map(_._2).sum) }
      val merges = 5 + rnd.nextInt(4)
      val batchK = 1 + rnd.nextInt(4)
      assert(learnBatched(pieces, merges, batchK) == naive(pieces, merges),
        s"trial $trial pieces=$pieces merges=$merges batchK=$batchK")
    }
  }

  test("bpeSegmentCounts applies LONG merge lists in chunks — no " +
    "analyzer blow-up at tokenizer-scale cascades, semantics identical " +
    "to the in-memory greedy replay") {
    // in-memory reference: apply each merge once, greedy leftmost, in
    // order (the same loop naive()'s merge step uses)
    def naiveSeg(piece: String, merges: Seq[(String, String)]): Int = {
      var syms = piece.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val merged = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            merged += (l + r); i += 2
          } else { merged += syms(i); i += 1 }
        }
        syms = merged.result()
      }
      syms.length
    }
    val rnd = new scala.util.Random(13)
    val pieceList = (0 until 50)
      .map(_ => Seq.fill(1 + rnd.nextInt(10))(('a' + rnd.nextInt(3)).toChar)
        .mkString).distinct
    // 600 merges over an evolving symbol space — duplicates and no-ops
    // included, exercising three chunk boundaries at chunkSize=100
    val space = Seq("a", "b", "c", "ab", "bc", "aa", "abc", "ca", "bca")
    val longMerges = (0 until 600).map { _ =>
      (space(rnd.nextInt(space.length)), space(rnd.nextInt(space.length)))
    }
    val got = TextOps.bpeSegmentCounts(pieceList.toDF("piece"), longMerges,
      chunkSize = 100)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(got == pieceList.map(p => p -> naiveSeg(p, longMerges)).toMap)
  }

  test("bpeLearnBatched learns 100+ merges over a realistic vocabulary " +
    "in few Spark rounds, matching the sequential reference") {
    // ~hundreds of distinct word pieces with Zipf-ish counts — the shape
    // a corpus-collapsed piece table has; sequential bpeLearn would cost
    // 120 driver round-trips, the batch path a handful
    val rnd = new scala.util.Random(7)
    val words = (0 until 400).map { i =>
      val len = 3 + rnd.nextInt(6)
      val w = Seq.fill(len)(('a' + rnd.nextInt(6)).toChar).mkString
      (w, (1L + rnd.nextInt(50)) * (1 + 400 / (i + 1)))
    }.groupBy(_._1).toSeq.map { case (p, rs) => (p, rs.map(_._2).sum) }
    val got = learnBatched(words, 120, batchK = 64)
    assert(got.size == 120, s"learned ${got.size} merges")
    assert(got.map(_._1) == (1 to 120), "rounds must be 1..120 in order")
    assert(got == naive(words, 120))
  }

  test("learn → apply round-trip: pieces made of learned merges compress " +
    "to the expected token counts") {
    val pieces = Seq(("the", 10L), ("then", 4L), ("he", 2L))
    val merges = learn(pieces, 2).map(m => (m._2, m._3))
    // round 1: (h,e) appears in all three pieces: 10+4+2 = 16 — top;
    // round 2: (t,he) in "the"+"then": 14
    assert(merges == Seq(("h", "e"), ("t", "he")))
    assert(segment(pieces.map(_._1), merges) ==
      Map("the" -> 1, "then" -> 2, "he" -> 1))
  }
}
