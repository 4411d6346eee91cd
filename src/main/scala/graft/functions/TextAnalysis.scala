package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar builders: language identification, BPE-ish token
  * counting, and quality signals (SURVEY.md §2.3 text rows; LLM-pipeline
  * north star). All pure column expressions — codegen-friendly, no UDFs.
  */
object TextAnalysis {
  /** Tiny per-language marker lexicons (function-word heuristics — the
    * classic cheap language-ID signal when no model is available).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "las", "una"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une", "est", "dans"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  /** Language guess from marker-word hits; deterministic tiebreak by the
    * declaration order above ("und" = no hits at all).
    */
  def languageId(text: Column): Column =
    languageIdTokens(split(lower(text), "\\s+"))

  /** [[languageId]] over a pre-tokenised column. Higher-order functions
    * are CodegenFallback, so callers scoring many languages should
    * materialise the token array ONCE in a projection and pass it here —
    * otherwise every language's filter re-runs the regex split.
    */
  def languageIdTokens(toks: Column): Column = {
    val scores = Markers.map { case (lang, words) =>
      lang -> size(filter(toks, (t: Column) => t.isInCollection(words)))
    }
    // Left-to-right max scan: earlier languages win ties (deterministic).
    scores.foldLeft((lit("und"), lit(-1)): (Column, Column)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore && score > 0, lit(lang)).otherwise(bestLang),
          when(score > bestScore, score).otherwise(bestScore))
    }._1
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, "\\s+"), (t: Column) => t =!= ""))

  /** BPE-ish subword-unit count: words + digit runs + punctuation marks
    * counted separately (a cheap stand-in for a real tokenizer's unit
    * count; deterministic regex, no vocabulary).
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(filter(
      split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
      (t: Column) => t.rlike("\\S")))

  /** Rolling-hash document fingerprint: xxhash64 over the document plus
    * position-mixed prefix hashing is overkill for equality grouping —
    * md5 covers content identity; this 64-bit variant is for compact
    * joins/bloom filters at scale.
    */
  def fingerprint64(text: Column): Column = xxhash64(text)
}
