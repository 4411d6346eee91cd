package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Whitespace written as an EXPLICIT class (for embedding in [...]):
    * Java regex \\s includes \\x0B (vertical tab) where RE2's — DuckDB's
    * engine — does not, the one ASCII character the two shorthands
    * disagree on. Every tokenizer here and every mirrored oracle regex
    * uses this class, so a \\x0B in a document cannot split tokens on one
    * engine and not the other.
    */
  val Ws: String = " \\t\\n\\x0B\\f\\r"

  /** `\\s+` with the explicit class — the shared tokenizer split. */
  val WsPlus: String = s"[$Ws]+"

  /** The BPE-ish unit pattern — ONE definition interpolated into both
    * the engine expression ([[tokenCountBpeIsh]]) and the DuckDB oracle
    * text (a hand-copy in the SQL string would drift silently).
    */
  val BpeIshPattern: String = s"[\\p{L}\\p{N}]+|[^\\p{L}\\p{N}$Ws]"

  /** Language guess from marker-word hits; deterministic tiebreak by the
    * declaration order above ("und" = no hits at all).
    */
  def languageId(text: Column): Column =
    languageIdTokens(split(lower(text), WsPlus))

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

  /** Bulk (DataFrame-level) language ID: explode tokens once, count
    * marker hits via a broadcast join against the marker lexicon, argmax
    * with the same declared-priority tiebreak as [[languageId]].
    *
    * Same answers as the per-row Column function (tested), but ONE
    * compiled pass instead of |languages| interpreted HOF scans per row —
    * the shape to use when scoring a whole corpus.
    * Input needs (`idCol`, `textCol`); output: (idCol, guessed_lang).
    */
  def languageIdBulk(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val markers = broadcast(
      Markers.zipWithIndex.flatMap { case ((lang, words), pri) =>
        words.map(w => (w, lang, pri))
      }.toDF("w", "lang", "pri"))
    val hits = docs
      .select(col(idCol), explode(split(lower(col(textCol)), WsPlus)).as("w"))
      .join(markers, Seq("w"))
      .groupBy(col(idCol), col("lang"), col("pri"))
      .agg(count(lit(1)).as("score"))
    // argmax by (score desc, priority asc) — identical tiebreak to the
    // left-to-right max scan in languageIdTokens.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score").desc, col("pri").asc)
    val best = hits
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("lang").as("guessed_lang"))
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("guessed_lang"), lit("und")).as("guessed_lang"))
  }

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    size(filter(split(text, WsPlus), (t: Column) => t =!= ""))

  /** BPE-ish subword-unit count: words + digit runs + punctuation marks
    * counted separately (a cheap stand-in for a real tokenizer's unit
    * count; deterministic regex, no vocabulary).
    *
    * Formulated as `regexp_extract_all` of alnum runs / single non-alnum
    * non-space marks — NOT as a lookaround split: the two count the same
    * units (ScaleOpsSpec pins equality to [[tokenCountBpeIshSplit]] over
    * the fixture corpus), but lookarounds are Java-regex-only, and this
    * form is RE2-expressible so the DuckDB oracle can mirror it verbatim.
    */
  def tokenCountBpeIsh(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeIshPattern), lit(0)))

  /** The original lookaround-split formulation, kept as the reference the
    * spec compares [[tokenCountBpeIsh]] against.
    */
  private[graft] def tokenCountBpeIshSplit(text: Column): Column =
    size(filter(
      split(text, "(?=[^\\p{L}\\p{N}])|(?<=[^\\p{L}\\p{N}])"),
      (t: Column) => t.rlike("\\S")))

  /** Rolling-hash document fingerprint: xxhash64 over the document plus
    * position-mixed prefix hashing is overkill for equality grouping —
    * md5 covers content identity; this 64-bit variant is for compact
    * joins/bloom filters at scale.
    */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** ENGINE-PORTABLE compact fingerprint: the first 60 bits of md5 as a
    * bigint (15 hex chars — fits signed 64-bit in any engine). The
    * md5-digest discipline of `dedup_doc_exact`: when the fingerprint
    * crosses system boundaries (keep-lists, audits, the DuckDB oracle)
    * it must be reproducible outside Spark, which [[fingerprint64]]'s
    * seeded xxhash64 is not. In-engine hot paths (MinHash shingle
    * hashing) keep xxhash64 — ~10× cheaper per call.
    */
  def fingerprintPortable(text: Column): Column =
    conv(substring(md5(text), 1, 15), 16, 10).cast("long")
}
