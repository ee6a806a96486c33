package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization, quality
  * scoring, language ID, fingerprinting. All are pure column expressions
  * (codegen'd, no UDFs) so they pipeline inside whole-stage codegen on a scan
  * of billions of documents; every formula is also expressible in ANSI SQL so
  * the DuckDB oracle can mirror it exactly.
  */
object TextAnalysis {

  /** Whitespace tokens of the lowercased, trimmed text. */
  def tokens(c: Column): Column = split(trim(lower(c)), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish subword count: alphabetic runs, digit runs, and single
    * non-alphanumeric marks each count as one token — a cheap stand-in for a
    * real byte-pair tokenizer's piece count.
    */
  def bpeishCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))

  // Small function-word lists for the n-gram/stopword language heuristic.
  val enStop = Seq("the", "and", "of", "to", "a", "in", "is")
  val esStop = Seq("el", "la", "de", "que", "y", "en", "un")
  val deStop = Seq("der", "die", "und", "das", "ist", "ein", "zu")
  val frStop = Seq("le", "les", "des", "et", "une", "est", "dans")

  /** Count of tokens that appear in `words`. */
  def stopHits(c: Column, words: Seq[String]): Column =
    size(filter(tokens(c), w => w.isInCollection(words)))

  /** Language-ID heuristic: score each candidate language by function-word
    * hits; deterministic priority chain (en > es > de > fr) breaks ties;
    * 'und' when nothing matches.
    */
  def langId(c: Column): Column = {
    val en = stopHits(c, enStop); val es = stopHits(c, esStop)
    val de = stopHits(c, deStop); val fr = stopHits(c, frStop)
    when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Quality score in [0,1]: length factor, stopword density, and mean token
    * length, each capped. The exact arithmetic (including evaluation order
    * and the final round) is mirrored in the oracle SQL.
    */
  def qualityScore(c: Column): Column = {
    val nTokens = tokenCount(c).cast("double")
    val nonspace = length(regexp_replace(c, "\\s", "")).cast("double")
    val avgTok = nonspace / nTokens
    val stopRatio = stopHits(c, enStop).cast("double") / nTokens
    round(
      least(nTokens / 100.0, lit(1.0)) * 0.4 +
      stopRatio * 0.3 +
      least(avgTok / 8.0, lit(1.0)) * 0.3, 6)
  }

  /** Full per-document analysis projection used by the registered queries. */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    docs.select(
      col("doc_id"),
      tokenCount(c).as("n_tokens"),
      bpeishCount(c).as("n_bpeish"),
      length(c).as("n_chars_m"),
      langId(c).as("lang_pred"),
      qualityScore(c).as("quality"))
  }
}
