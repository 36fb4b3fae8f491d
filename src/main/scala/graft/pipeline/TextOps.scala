package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a large-scale training-data pipeline, all as
 * Catalyst Column expressions (whole-stage-codegen'd, no UDFs): whitespace
 * normalization, token counting, heuristic language ID, quality scoring,
 * document fingerprinting. Mirrors of the per-document scalar helpers the
 * extraction engine uses (breadability/utils.py, scoring.py) lifted to
 * column level so they run at scan throughput.
 */
object TextOps {

  /** Collapse whitespace runs to single spaces + trim (column-level analogue
    * of utils.py:36-51 normalize_whitespace). */
  def normalizeWs(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(trim(text), "\\s+"))

  /** BPE-ish subword count: words + punctuation marks counted separately —
    * a cheap stand-in for tokenizer budgeting at corpus scale. */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "\\s+")) +
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("int")

  /** GPT-2-style pre-tokenizer pattern, constrained to the Java∩RE2
    * regex subset (NO lookahead — DuckDB's RE2 must count identical
    * matches): contractions split off first, then optional-space letter
    * runs, digit runs, symbol runs, residual whitespace. Leftmost-first
    * alternation semantics agree between Java and RE2. Whitespace is an
    * EXPLICIT class, not \s: Java's \s includes U+000B (vertical tab),
    * RE2's does not — the one divergence in this subset. */
  private val Ws = " \\t\\n\\x0B\\f\\r"
  val BpeTokenRe: String =
    s"'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^$Ws\\p{L}\\p{N}]+|[$Ws]+"

  /** Pre-tokenizer token count under BpeTokenRe — the token-budget
    * estimate an LLM-data pipeline runs over every document (the true
    * BPE merge step only ever SPLITS these pieces further, so this is
    * the canonical piece count the merges start from). */
  def bpeTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeTokenRe))

  /**
   * Heuristic language ID via stopword hit ratios (n-gram-free variant —
   * the synthetic corpus is space-tokenized). Scores a small stopword set
   * per language and takes the argmax; "und" when nothing matches.
   */
  def langId(text: Column): Column = {
    val norm = normalizeWs(text)
    // script pre-pass (the standard first stage of real lang-id): count
    // characters per unicode script; CJK/Cyrillic text never matches the
    // Latin stopword lists, so it must be decided here. Fractions over
    // non-space characters; thresholds: any meaningful kana → ja,
    // otherwise a quarter of the text in one script wins.
    val nospace = regexp_replace(norm, "\\s", "")
    val total = length(nospace).cast("double")
    def scriptCount(re: String): Column =
      total - length(regexp_replace(nospace, re, "")).cast("double")
    val kana = scriptCount("[\\p{IsHiragana}\\p{IsKatakana}]")
    val hangul = scriptCount("[\\p{IsHangul}]")
    val han = scriptCount("[\\p{IsHan}]")
    val cyr = scriptCount("[\\p{IsCyrillic}]")

    val padded = concat(lit(" "), lower(norm), lit(" "))
    def hits(words: Seq[String]): Column =
      words.map(w => size(split(padded, s"\\s$w\\s")) - 1)
        .reduce(_ + _)
    val en = hits(Seq("the", "and", "of", "a", "to", "is"))
    val de = hits(Seq("der", "die", "und", "das", "ist", "ein"))
    val fr = hits(Seq("le", "la", "et", "les", "des", "est"))
    val es = hits(Seq("el", "de", "y", "que", "los", "una"))
    val best = greatest(en, de, fr, es)
    when(total <= 0, lit("und"))
      .when(kana / total > 0.05, lit("ja"))
      .when(hangul / total > 0.25, lit("ko"))
      .when(han / total > 0.25, lit("zh"))
      .when(cyr / total > 0.25, lit("ru"))
      .when(best <= 0, lit("und"))
      .when(en === best, lit("en"))
      .when(de === best, lit("de"))
      .when(fr === best, lit("fr"))
      .otherwise(lit("es"))
  }

  /**
   * Quality score in [0,1] from length/punctuation/stopword ratios — the
   * standard web-text quality gate shape (length band + sentence-final
   * punctuation + function-word presence − symbol noise).
   */
  def qualityScore(text: Column): Column = {
    val norm = normalizeWs(text)
    val len = length(norm).cast("double")
    val words = tokenCount(norm).cast("double")
    val meanWordLen = when(words > 0, len / words).otherwise(lit(0.0))
    val punct = length(regexp_replace(norm, "[^.!?]", "")).cast("double")
    val symbols = length(regexp_replace(norm, "[\\p{L}\\p{N}\\s.,;:!?'\"()-]", "")).cast("double")
    val stopHits = (size(split(concat(lit(" "), lower(norm), lit(" ")), "\\s(the|and|of|a|to|is)\\s")) - 1).cast("double")
    val lengthBand = when(len >= 200 && len <= 20000, 1.0)
      .when(len >= 50, 0.5).otherwise(0.0)
    val wordShape = when(meanWordLen >= 3 && meanWordLen <= 12, 1.0).otherwise(0.3)
    val punctRate = least(punct / greatest(words, lit(1.0)) * 10.0, lit(1.0))
    val stopRate = least(stopHits / greatest(words, lit(1.0)) * 5.0, lit(1.0))
    val noise = least(symbols / greatest(len, lit(1.0)) * 20.0, lit(1.0))
    round((lengthBand * 0.3 + wordShape * 0.2 + punctRate * 0.2 + stopRate * 0.3) * (lit(1.0) - noise * 0.5), 4)
  }

  /** Document fingerprint: md5 of whitespace-normalized lowercase text —
    * the exact-dedup key (stable across engines). */
  def fingerprint(text: Column): Column =
    md5(lower(normalizeWs(text)))

  /** Query parameters that never affect page identity (tracking only). */
  val TrackingParamRe: String =
    "^(utm_[^=]*|gclid|fbclid|msclkid|mc_eid|igshid|ref_src|spm)(=.*)?$"

  /**
   * Canonical URL for crawl-level dedup: strip the fragment, lowercase
   * scheme+host, drop default ports (:80 http / :443 https), remove
   * tracking query params (order of the surviving params preserved), drop
   * an empty trailing "?". Pure built-in column functions (codegen'd; the
   * per-URL param array is tiny) — DuckDB-mirrorable, so the q27 oracle
   * checks it end-to-end.
   */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val host0 = lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val host = when(scheme === "http", regexp_replace(host0, ":80$", ""))
      .when(scheme === "https", regexp_replace(host0, ":443$", ""))
      .otherwise(host0)
    val rest = regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(
      filter(split(query, "&"), p => !p.rlike(TrackingParamRe)), "&")
    val q = when(length(kept) > 0, concat(lit("?"), kept)).otherwise(lit(""))
    // non-URL inputs (no scheme) pass through unchanged
    when(scheme === "", url)
      .otherwise(concat(scheme, lit("://"), host, path, q))
  }
}
