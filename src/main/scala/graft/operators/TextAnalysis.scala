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

  /** Count of tokens (a materialized token-array column) in `words`. */
  def stopHits(ws: Column, words: Seq[String]): Column =
    size(filter(ws, w => w.isInCollection(words)))

  /** Language-ID heuristic: score each candidate language by function-word
    * hits; deterministic priority chain (en > es > de > fr) breaks ties;
    * 'und' when nothing matches. `ws` is a materialized token column.
    */
  def langId(ws: Column): Column = {
    val en = stopHits(ws, enStop); val es = stopHits(ws, esStop)
    val de = stopHits(ws, deStop); val fr = stopHits(ws, frStop)
    when(en === 0 && es === 0 && de === 0 && fr === 0, "und")
      .when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
  }

  /** Quality score in [0,1]: length factor, stopword density, and mean token
    * length, each capped. The exact arithmetic (including evaluation order
    * and the final round) is mirrored in the oracle SQL. `c` is the raw
    * text, `ws` its materialized token column.
    */
  def qualityScore(c: Column, ws: Column): Column = {
    val nTokens = size(ws).cast("double")
    val nonspace = length(regexp_replace(c, "\\s", "")).cast("double")
    val avgTok = nonspace / nTokens
    val stopRatio = stopHits(ws, enStop).cast("double") / nTokens
    val q = least(nTokens / 100.0, lit(1.0)) * 0.4 +
      stopRatio * 0.3 +
      least(avgTok / 8.0, lit(1.0)) * 0.3
    // floor(q*1e6 + 0.5)/1e6, not round(q, 6): engines disagree on exact
    // half-way doubles (Spark rounds via decimal HALF_UP, DuckDB on the
    // double's shortest repr); the floor formulation is pure IEEE double
    // arithmetic, bit-identical everywhere.
    floor(q * 1e6 + 0.5) / 1e6
  }

  /** Top-`k` most distinctive terms per document by TF-IDF.
    *
    * Ranking is INTEGER-ONLY — (tf desc, df asc, term asc) — which orders by
    * tf·ln(N/df) within a document wherever that product is decisive and is
    * exactly reproducible by any engine (no float comparisons to drift); the
    * tfidf value itself is emitted via the floor-round trick (see
    * `qualityScore`) as a stable 4-decimal double.
    *
    * Shape at scale: tf is a (doc, term) hash agg with map-side combine, df
    * a second two-phase agg over tf's output, the join is term-keyed (terms
    * are Zipf — AQE's skew split handles "the"), and top-k is a per-doc
    * window. No driver materialization except the corpus row count (one
    * scalar).
    */
  def tfidfTopTerms(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = docs.select(col(idCol).as("doc"),
      explode(tokens(col(textCol))).as("term"))
    // Materialized: tf feeds BOTH the score join and the df aggregate, and
    // without a cut Catalyst plans the (doc, term) aggregation — a full pass
    // over every exploded token — twice (verified in the plan audit). On a
    // cluster this persist targets disk for a 100 TB corpus; the sweep
    // harnesses release the blocks between queries.
    val tf = tok.groupBy(col("doc"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.count().toDouble
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(dfreq, "term")
      .withColumn("tfidf",
        floor(col("tf") * log(lit(n) / col("df")) * 1e4 + 0.5) / 1e4)
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("doc").as(idCol), col("rank"), col("term"), col("tf"),
        col("df"), col("tfidf"))
  }

  /** Per-document mean log-probability under an add-one-smoothed bigram
    * language model trained on `ref` (the corpus itself by default) — the
    * statistical quality score that separates fluent text from gibberish the
    * heuristic ratios miss: score(d) = avg over d's bigrams (w1 w2) of
    * ln((c(w1 w2) + 1) / (c(w1) + V)).
    *
    * Two-phase shape: the model IS two count aggregates (unigram, bigram —
    * map-side combined), and scoring is two key-joins of the corpus bigram
    * stream against them, then a per-doc avg. Bigrams stream from the native
    * `ngram_gen` Generator; nothing driver-side except the vocabulary-size
    * scalar. At 100 TB the count tables are vocabulary-sized (≪ corpus);
    * Zipf skew on the join key ("the …") is AQE skew-split territory, and a
    * reference model would be trained ONCE and reused across scoring runs.
    */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String,
      ref: Option[DataFrame] = None): DataFrame = {
    graft.functions.HashExpressions.register(docs.sparkSession)
    val refWs = ref.getOrElse(docs).select(tokens(col(textCol)).as("ws"))
    // feeds the vocabulary-size scalar AND the scoring join
    val uni = refWs.select(explode(col("ws")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cw"))
      .persist()
    val vocab = uni.count().toDouble
    val bi = refWs.select(expr("ngram_gen(ws, 2)"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("cb"))
    val docBi = docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("ws"))
      .select(col("doc"), expr("ngram_gen(ws, 2)"))
      .select(col("doc"), col("ngram").as("bg"),
        substring_index(col("ngram"), " ", 1).as("w1"))
    val scored = docBi
      .join(bi.select(col("ngram").as("bg"), col("cb")), Seq("bg"), "left")
      .join(uni.select(col("w").as("w1"), col("cw")), Seq("w1"), "left")
      .withColumn("lp", log((coalesce(col("cb"), lit(0L)) + 1.0) /
        (coalesce(col("cw"), lit(0L)) + vocab)))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_bigrams"),
        // floor-round, not round() — see qualityScore
        (floor(avg(col("lp")) * 1e4 + 0.5) / 1e4).as("lm_score"))
      .select(col("doc").as(idCol), col("n_bigrams"), col("lm_score"))
      .orderBy(col(idCol))
    Caching.materializeThenRelease(scored, uni)
  }

  /** Full per-document analysis projection used by the registered queries.
    * Tokenizes ONCE into a bound column, then derives every measure from it —
    * the stopword/langid lambdas are interpreted (CodegenFallback), and an
    * inline `split` subexpression would be re-evaluated per lambda call.
    */
  def analyze(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val c = col(textCol)
    docs
      .select(col("doc_id"), c, tokens(c).as("_ws"))
      .select(
        col("doc_id"),
        size(col("_ws")).as("n_tokens"),
        bpeishCount(c).as("n_bpeish"),
        length(c).as("n_chars_m"),
        langId(col("_ws")).as("lang_pred"),
        qualityScore(c, col("_ws")).as("quality"))
  }
}
