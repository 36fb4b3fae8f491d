package graft.job

/** Shared CLI argument discipline for the job mains: index-walking parse
  * (a value-flag consumes exactly its next token, so a flag VALUE that
  * string-equals a positional can never swallow the positional), and
  * UNKNOWN flags are a loud error — a typo'd `--merge 500` must fail
  * fast, not silently train the default and drop `500` as an unread
  * positional after an expensive run. */
object JobArgs {

  /** Returns the positional arguments; throws IllegalArgumentException
    * on an unknown flag or a value-flag missing its value. */
  def parse(args: Array[String], valueFlags: Set[String],
            boolFlags: Set[String], usage: String): Seq[String] = {
    val pos = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < args.length) {
      val a = args(i)
      if (valueFlags.contains(a)) {
        require(i + 1 < args.length && !args(i + 1).startsWith("--"),
          s"$a requires a value\n$usage")
        i += 2
      } else if (boolFlags.contains(a)) {
        i += 1
      } else if (a.startsWith("--")) {
        throw new IllegalArgumentException(s"unknown flag '$a'\n$usage")
      } else {
        pos += a
        i += 1
      }
    }
    pos.toSeq
  }
}
