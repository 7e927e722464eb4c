package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.Scalars

/** Text-analysis ops for training-data pipelines: token counting,
  * quality scoring, language-ID heuristic, document fingerprinting.
  *
  * All pure Column expressions (codegen'd, no UDFs) — at 100 TB these run
  * inside the scan stage with zero extra shuffles.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(Scalars.tokens(text))

  /** Distinct-token ratio — a repetition/quality signal. */
  def distinctRatio(text: Column): Column = {
    val t = Scalars.tokens(text)
    size(array_distinct(t)).cast("double") / size(t)
  }

  /** Mean token length (characters per token). */
  def avgTokenLen(text: Column): Column = {
    val t = Scalars.tokens(text)
    aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("double") / size(t)
  }

  /** Ratio of non-letter, non-digit, non-whitespace characters —
    * punctuation / markup noise signal. Unicode classes, not ASCII:
    * an `[^a-zA-Z0-9 ]` form would count every accented/Cyrillic/CJK
    * letter (and newlines) as "punctuation" and torpedo the quality
    * score of clean non-English text. */
  def punctRatio(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^\\p{L}\\p{N}\\s]", "")))
      .cast("double") / greatest(length(text), lit(1))

  /** Stopword ratio against a small built-in English profile. */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
  def stopwordRatio(text: Column): Column = {
    val t = Scalars.tokens(text)
    size(filter(t, x => EnStopwords.map(s => x === s).reduce(_ || _)))
      .cast("double") / size(t)
  }

  /** Composite quality score in [0,1]: rewards lexical diversity and
    * clean characters, penalizes stopword stuffing. Weights are the
    * usual heuristic mix (Gopher/C4-style rule-of-thumb filters).
    * Empty/whitespace-only text scores 0 — without the guard the
    * phantom [""] token gives junk rows a perfect 1.0 and a
    * quality-ranked curation would keep them preferentially. */
  def qualityScore(text: Column): Column =
    when(length(trim(text)) === 0, 0.0).otherwise(
      distinctRatio(text) * lit(0.5) +
        (lit(1.0) - punctRatio(text)) * lit(0.3) +
        (lit(1.0) - stopwordRatio(text)) * lit(0.2))

  /** Language-ID heuristic: score text against tiny per-language
    * stopword profiles, pick the best; no hits → "und" (ties resolve to
    * the alphabetically-last language, deterministically).
    * (A real deployment swaps in bigger profiles — the plumbing is the
    * same single codegen'd expression.) */
  val LangProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "la", "de", "que", "es"))
  def langId(text: Column): Column = {
    val t = Scalars.tokens(text)
    val scored = LangProfiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(
        size(filter(t, x => words.map(w => x === w).reduce(_ || _))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    // Null text stays null (not "und" — absence of text is not a
    // detected-unknown language).
    when(text.isNull, lit(null).cast("string"))
      .when(best.getField("hits") > 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  /** Document fingerprint: md5 of the token-sorted canonical form —
    * an order-insensitive content identity (exact-dedup key). */
  def fingerprint(text: Column): Column = md5(Scalars.canonicalText(text))

  /** BPE-ish subword segmentation count: GPT-2-style pre-tokenizer
    * regex — word pieces, number runs, punctuation runs — a far better
    * token-cost estimate than whitespace splitting on code/markup. */
  val BpeishPattern = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0)))

  /** Order-SENSITIVE rolling-hash fingerprint (Rabin–Karp polynomial
    * over token hashes, mod 2^40 so the ANSI-mode multiply can't
    * overflow a long): distinguishes permuted texts that [[fingerprint]]
    * deliberately identifies. Token hash = first 10 hex chars of md5 —
    * portable to the SQL oracle. */
  def rollingFingerprint(text: Column): Column = {
    val mod = 1099511627776L // 2^40
    aggregate(
      Scalars.tokens(text),
      lit(0L),
      (acc, tok) => pmod(
        acc * 31 + conv(substring(md5(tok), 1, 10), 16, 10).cast("long"),
        lit(mod)))
  }
}
