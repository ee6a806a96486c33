package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions

/** Benchmark decontamination: remove corpus documents that share verbatim
  * n-grams with an evaluation/benchmark set — the train/test-overlap hygiene
  * step every LLM data pipeline runs before training.
  *
  * Shape at 100 TB: the eval side is small (benchmarks are thousands of
  * docs, not billions), so its distinct shingle hashes BROADCAST; corpus
  * shingling is scan-side (native `word_shingles` + `xxhash64`, codegen'd),
  * and the only shuffle is the per-doc overlap count over the few documents
  * that hit the broadcast filter. The corpus is never shuffled wholesale and
  * document bodies never leave their scan — only 8-byte hashes move.
  */
object Decontaminate {

  private def shingleHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    HashExpressions.register(df.sparkSession)
    df.select(col(idCol).as("doc"),
      explode(expr(
        s"word_shingles(split(trim(lower($textCol)), '\\\\s+'), $n)"))
        .as("gram"))
      .select(col("doc"), xxhash64(col("gram")).as("gh"))
  }

  /** Corpus docs sharing ≥ `minOverlap` distinct n-grams with `evalSet`:
    * (idCol, n_overlap), one row per contaminated doc.
    */
  def contaminated(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame = {
    val evalGrams = broadcast(
      shingleHashes(evalSet, idCol, textCol, n).select(col("gh")).distinct())
    shingleHashes(corpus, idCol, textCol, n)
      .join(evalGrams, Seq("gh"), "left_semi")
      .groupBy(col("doc"))
      .agg(count_distinct(col("gh")).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("doc").as(idCol), col("n_overlap"))
  }

  /** The clean corpus: anti-join away contaminated docs. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
      textCol: String, n: Int = 8, minOverlap: Int = 1): DataFrame =
    corpus.join(
      contaminated(corpus, evalSet, idCol, textCol, n, minOverlap)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
