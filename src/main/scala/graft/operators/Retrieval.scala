package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rank-fusion retrieval: combine independently-ranked retrieval arms
  * (lexical BM25, vector ANN, …) into one ranking with reciprocal-rank
  * fusion (Cormack/Clarke/Buettcher, SIGIR'09). RRF is the standard
  * "hybrid search" combiner for a training-data pipeline — it needs no
  * score calibration across arms (BM25 scores and cosine similarities are
  * not commensurable; their RANKS are) and a document found by several
  * arms beats a document found by one.
  *
  * Reference scope note: the reference (poc-parquet-publisher) has no
  * retrieval at all (each `cmd/.../handler.go` is scan→project→publish);
  * this is
  * part of the beyond-reference LLM-pipeline surface, composing the
  * existing [[TextAnalysis.bm25TopK]] and [[Similarity]] top-k families.
  *
  * Exactness: each arm's per-rank contribution is snapped to the
  * fixed-point long floor(1e9 / (rrfK + rank)) BEFORE the per-(query, doc)
  * sum. Long addition is associative where double addition is not, so the
  * fused score — and the ranking — is bit-identical in any engine and any
  * partitioning (the same design as BM25's fixed-point contributions). The
  * floor itself is engine-stable: 1e9 and small integer divisors are exact
  * doubles, and the true quotient's distance from any integer is at least
  * 1/(rrfK+rank) — about six orders of magnitude above double rounding
  * error — so no engine can floor across a boundary differently.
  *
  * Shape at scale: the arms have already reduced the corpus to ≤ armK rows
  * per query each, so fusion is a unionByName of #arms tiny per-query
  * tables, one (qid, id) hash agg (map-side combined) and one per-query
  * window over ≤ #arms·armK rows. The corpus-sized work lives in the arms
  * (posting-pruned BM25, bucket-probed ANN); fusion itself shuffles only
  * candidate rows — at 100 TB corpus scale its cost is proportional to the
  * QUERY volume, not the corpus.
  */
object Retrieval {

  /** Fixed-point RRF contribution of one 1-based rank. */
  private def rrfContrib(rrfK: Int): Column =
    floor(lit(1e9) / (lit(rrfK.toDouble) + col("rank"))).cast("long")

  /** Fuse ranked arms into a top-`k` per query.
    *
    * Each arm must carry columns (`qid`, `id`, `rank`) with `rank` 1-based
    * and unique per (arm, qid). Output: (qid, rank, id, score_fx, n_arms)
    * where `score_fx` is the fixed-point fused score (sum of
    * floor(1e9/(rrfK+armRank)) over the arms that returned the doc) and
    * `n_arms` counts those arms. Ties break on ascending id, so the
    * ranking is total and deterministic.
    */
  def rrfFuse(arms: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(arms.nonEmpty, "rrfFuse needs at least one ranked arm")
    val contribs = arms.map(
      _.select(col("qid"), col("id"), rrfContrib(rrfK).as("c")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("score_fx").desc, col("id").asc)
    contribs.reduce(_ unionByName _)
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("c")).as("score_fx"), count(lit(1)).as("n_arms"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("score_fx"),
        col("n_arms"))
  }

  /** Hybrid lexical+vector retrieval over a corpus whose text and
    * embedding live in two id-aligned tables: BM25 arm over
    * (`docs.idCol`, `docs.textCol`), exact-cosine arm over
    * (`vecs.vecIdCol`, `vecs.vecCol`), RRF-fused top-`k` per query.
    * Queries carry (`queryIdCol`, `queryTextCol`, `queryVecCol`).
    *
    * The vector arm here is the exact [[Similarity.bruteForceTopK]]
    * baseline; at corpus scale swap in any of the ANN ladder's top-k
    * forms (same (qid, rank, nid) shape) — fusion is agnostic to how an
    * arm ranked, which is the point of RRF.
    */
  def hybridTopK(docs: DataFrame, vecs: DataFrame, queries: DataFrame,
      idCol: String, textCol: String, vecIdCol: String, vecCol: String,
      queryIdCol: String, queryTextCol: String, queryVecCol: String,
      k: Int, armK: Int, rrfK: Int = 60): DataFrame = {
    val lex = TextAnalysis.bm25TopK(docs,
        queries.select(col(queryIdCol), col(queryTextCol)),
        idCol, textCol, queryIdCol, queryTextCol, armK)
      .select(col(queryIdCol).as("qid"), col(idCol).as("id"), col("rank"))
    val vec = Similarity.bruteForceTopK(vecs,
        queries.select(col(queryIdCol).as(vecIdCol),
          col(queryVecCol).as(vecCol)),
        vecIdCol, vecCol, armK)
      .select(col("qid"), col("nid").as("id"), col("rank"))
    rrfFuse(Seq(lex, vec), k, rrfK)
  }
}
