package graft

/** Deterministic planted corpora shared across specs. */
object TestCorpus {

  /** Prose-shaped doc pair: every 3rd word a stopword, commas sprinkled;
    * `editTail` trailing content words replaced with seed-unique
    * variants (editTail=3 ⇒ J≈0.93, editTail=6 ⇒ J≈0.84 on 3-gram
    * shingle sets). Used by LshRecallSpec's recall pins and
    * CurateJobSpec's `--near` planted pair. */
  def prosePair(seed: Int, editTail: Int): (String, String) = {
    def words(edit: Int): String =
      (0 until 60).map { j =>
        val w =
          if (j % 3 == 0) Seq("the", "and", "of", "a", "to", "is")((j / 3) % 6)
          else if (j >= 60 - edit) s"v${seed}e$j"
          else s"w${seed}q$j"
        w + (if (j % 9 == 8) "," else "")
      }.mkString(" ")
    (words(0), words(editTail))
  }

  /** Signal-bearing prose for the learned quality gate: every 3rd word a
    * stopword, every 4th (when not a stopword) a class-shared `signal$j`
    * token, the rest seed-unique — so same-class docs share UNIGRAM
    * features (the model generalizes across them) but never a 3-gram
    * (near-dedup can't collapse them: any 3 consecutive positions
    * include a seed-unique word). Comma every 9th word keeps the
    * heuristic quality gate clear. */
  def signalProse(seed: Int, signal: String): String =
    (0 until 60).map { j =>
      val w =
        if (j % 3 == 0) Seq("the", "and", "of", "a", "to", "is")((j / 3) % 6)
        else if (j % 4 == 0) s"$signal$j"
        else s"u${seed}n$j"
      w + (if (j % 9 == 8) "," else "")
    }.mkString(" ")
}
