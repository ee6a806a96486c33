package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocklist phrase filtering — the C4-style "bad words / banned phrases"
  * curation step (Raffel et al. 2020 dropped any page containing a phrase
  * from a public blocklist).
  *
  * Matching is WORD-BOUNDARY-EXACT on the whitespace token stream: the
  * document's tokens are re-joined with single spaces and padded
  * (`" t1 t2 … tn "`), and a phrase hits iff `" phrase "` appears as a
  * substring — so "ssh" never matches inside "session" and multi-word
  * phrases match only token-aligned. Case/whitespace-insensitive via the
  * shared [[TextAnalysis.tokens]] normalization.
  *
  * Shape at scale: the blocklist ships as a constant-folded literal array
  * (real blocklists are 10²–10⁴ phrases — trivially broadcast), and the
  * match is one scan-side `exists`/`filter` higher-order function over that
  * array — ZERO shuffles, whole-stage codegen, combinable with any other
  * scan-side quality rule in the same pass. Past ~10⁵ phrases the right
  * form changes shape: build a rarest-first-token index over the phrase
  * set and semi-join the corpus token stream against it (the
  * `Decontaminate` prefilter-then-verify pattern), or compile the set to
  * an Aho-Corasick automaton in a mapPartitions kernel. The scan-side form
  * here is the honest optimum for the common blocklist size, not a
  * shortcut.
  */
object Filtering {

  /** `" t1 t2 … tn "` — the padded normalized token stream phrase matching
    * runs against.
    */
  def paddedTokens(textCol: Column): Column =
    concat(lit(" "),
      concat_ws(" ", TextAnalysis.tokens(textCol)), lit(" "))

  /** The subset of `phrases` that occur (token-aligned) in `textCol`. */
  def phraseHits(textCol: Column, phrases: Seq[String]): Column = {
    require(phrases.nonEmpty, "empty blocklist")
    val pad = paddedTokens(textCol)
    filter(
      array(phrases.map(lit): _*),
      p => pad.contains(concat(lit(" "), p, lit(" "))))
  }

  /** Annotates each document with `hits` (matched blocklist phrases),
    * `n_hits`, and the `keep` flag (no phrase matched). Callers drop with
    * `.filter(col("keep"))`; the annotated form is kept so audits can
    * count WHICH phrases fire (removal-rate-per-phrase is the standard
    * blocklist health metric).
    */
  def blocklistAnnotate(docs: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val hits = phraseHits(col(textCol), phrases)
    docs.withColumn("hits", hits)
      .withColumn("n_hits", size(col("hits")).cast("long"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** Documents surviving the blocklist — the C4 drop semantics. */
  def blocklistFilter(docs: DataFrame, textCol: String,
      phrases: Seq[String]): DataFrame =
    blocklistAnnotate(docs, textCol, phrases)
      .filter(col("keep")).drop("hits", "n_hits", "keep")

  /** The LARGE-blocklist form: phrases arrive as a TABLE (too many to
    * constant-fold into the scan), and matching goes prefilter-then-verify
    * — the `Decontaminate` posture — instead of per-row scans over the
    * whole list:
    *
    *  1. one corpus token document-frequency agg (vocabulary-sized);
    *  2. each phrase picks its RAREST corpus token as join key (min (df,
    *     token) — deterministic tie-break; a phrase with any token absent
    *     from the corpus can match nothing word-aligned and drops out
    *     here, for free);
    *  3. the corpus (doc, distinct token) stream semi-joins that key table
    *     — candidate volume is Σ_p df(rarest-token of p), the same
    *     sum-of-df bound PPJoin's prefix filter gives;
    *  4. only candidates pay the exact padded-`contains` verify.
    *
    * Returns (id, phrase) hit pairs — aggregate for per-doc keep flags or
    * per-phrase removal rates. Result-identical to [[phraseHits]] over the
    * same list (spec-asserted); only the route differs.
    */
  def blocklistHitsLarge(docs: DataFrame, idCol: String, textCol: String,
      phrases: DataFrame, phraseCol: String = "phrase"): DataFrame = {
    val corpusToks = docs.select(col(idCol),
      explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("w"))
    val dfTab = corpusToks.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val joinTok = phrases
      .select(col(phraseCol).as("phrase"),
        explode(TextAnalysis.tokens(col(phraseCol))).as("w"))
      .join(dfTab, Seq("w"), "left")
      .groupBy(col("phrase"))
      .agg(min(when(col("df").isNotNull,
          struct(col("df"), col("w")))).as("rarest"),
        max(col("df").isNull.cast("int")).as("missing"))
      .filter(col("missing") === 0)
      .select(col("rarest.w").as("w"), col("phrase"))
    val padded = docs.select(col(idCol),
      paddedTokens(col(textCol)).as("pad"))
    corpusToks.join(joinTok, Seq("w"))
      .select(col(idCol), col("phrase")).distinct()
      .join(padded, Seq(idCol))
      .filter(col("pad").contains(
        concat(lit(" "), col("phrase"), lit(" "))))
      .select(col(idCol), col("phrase"))
  }
}
