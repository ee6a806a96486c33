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

  /** Maximal-marginal-relevance re-ranking (Carbonell & Goldstein,
    * SIGIR'98): greedily select `k` of each query's candidates, each pick
    * maximizing λ·rel − (1−λ)·max cos(v, selected) — the standard diversity
    * pass over a retrieval arm's top-N. A pretraining corpus always has
    * near-duplicates, and a pure-relevance top-k returns the same document
    * k times in k disguises; MMR trades a little relevance for coverage.
    *
    * Input columns: (`qid`, `id`, `rel`, `v`) — `rel` on a
    * cosine-comparable scale (pass the vector arm's cosine, or min-max-fold
    * other scores into [0, 1] first; λ trades the two terms and only makes
    * sense when they share a scale). Output: (qid, rank, id, mmr) with the
    * pick-time MMR score. λ = 1 degenerates to pure relevance order — the
    * driver contract pins that case EXACTLY against the arm's own top-k.
    * Deterministic: candidates enter the loop in (rel desc, id) order and
    * score ties break on ascending id, so the selection is a pure function
    * of the candidate SET (partition- and arrival-order-invariant).
    *
    * Shape at scale: the greedy loop is inherently sequential but runs
    * over ONE query's ≤ N candidates (the arm already collapsed the
    * corpus); `flatMapGroups` gives each query's loop to one task — k·N
    * cosines over N ≈ tens of rows — with queries spread across the
    * cluster. The corpus never enters; cost is query-volume-bound, like
    * [[rrfFuse]].
    */
  def mmrRerank(candidates: DataFrame, k: Int,
      lambda: Double = 0.7): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val ds = candidates
      // a NaN rel poisons every score comparison in the greedy loop (all
      // comparisons false → no pick → index -1), and a null vector NPEs
      // the cosine pass: drop such candidates deterministically up front
      .filter(col("rel").isNotNull && !isnan(col("rel")) &&
        col("v").isNotNull)
      .select(col("qid").cast("long"), col("id").cast("long"),
        col("rel").cast("double"), col("v").cast("array<double>"))
      .as[(Long, Long, Double, Seq[Double])]
    ds.groupByKey(_._1).flatMapGroups { (qid, it) =>
      val cand = it.toArray.sortBy(c => (-c._3, c._2))
      val n = cand.length
      val vecs = cand.map(_._4.toArray)
      // the cosine loop indexes both arrays up to a.length: a mixed-
      // dimension candidate set would either throw from an executor
      // (b shorter) or silently truncate the dot product (b longer) —
      // fail loudly with the offending query instead
      require(n == 0 || vecs.forall(_.length == vecs(0).length),
        s"mmrRerank: query $qid has candidates of mixed embedding " +
          s"dimensions ${vecs.map(_.length).distinct.sorted.mkString(",")}")
      val norms = vecs.map(v => math.sqrt(v.map(x => x * x).sum))
      def cos(i: Int, j: Int): Double = {
        val (a, b) = (vecs(i), vecs(j))
        var d = 0.0
        var t = 0
        while (t < a.length) { d += a(t) * b(t); t += 1 }
        val nn = norms(i) * norms(j)
        if (nn == 0.0) 0.0 else d / nn
      }
      val taken = Array.fill(n)(false)
      val maxSim = Array.fill(n)(0.0)
      val out = Array.newBuilder[(Long, Long, Long, Double)]
      var pick = 0
      while (pick < k && pick < n) {
        var best = -1
        var bestScore = Double.NegativeInfinity
        var i = 0
        while (i < n) {
          if (!taken(i)) {
            val pen = if (pick == 0) 0.0 else maxSim(i)
            val sc = lambda * cand(i)._3 - (1 - lambda) * pen
            if (sc > bestScore ||
                (sc == bestScore && (best < 0 || cand(i)._2 < cand(best)._2)))
              { best = i; bestScore = sc }
          }
          i += 1
        }
        taken(best) = true
        out += ((qid, pick + 1L, cand(best)._2, bestScore))
        var j = 0
        while (j < n) {
          if (!taken(j)) {
            val c = cos(j, best)
            if (c > maxSim(j)) maxSim(j) = c
          }
          j += 1
        }
        pick += 1
      }
      out.result().iterator
    }.toDF("qid", "rank", "id", "mmr")
  }

  /** nDCG@k — the standard ranking-quality evaluation, as a distributed
    * operator: a retrieval stack that cannot MEASURE itself cannot be
    * tuned. `ranked` carries (qid, doc, rank); `rels` carries graded
    * relevance (qid, doc, rel ≥ 0) for every candidate the ideal ranking
    * may draw from (docs absent from `rels` count as rel = 0).
    *
    * DCG_q  = Σ_{rank ≤ k} (2^rel − 1) / log2(rank + 1)
    * IDCG_q = the same sum over the query's k highest relevances
    *          (ties broken by doc ascending, so the ideal is unique)
    * nDCG_q = DCG / IDCG (0 when the query has no relevant docs at all)
    *
    * Shape at scale: one equi-join of the k·|Q| ranked rows onto `rels`,
    * one per-query window for the ideal ranks — both shuffles on the qid
    * key, query-volume-bound; the corpus never enters. Gains 2^rel are
    * exact doubles for integer grades; outputs are rounded to 6 decimals
    * (per-query sums of ≤ k log terms — the established float-aggregate
    * posture).
    */
  def ndcgAtK(ranked: DataFrame, rels: DataFrame, qidCol: String,
      docCol: String, rankCol: String, relCol: String, k: Int): DataFrame = {
    import Fixed.round6
    val gain = (r: Column) => (pow(lit(2.0), r) - 1.0)
    val dcg = ranked.filter(col(rankCol) <= k)
      .join(rels.select(col(qidCol), col(docCol), col(relCol)),
        Seq(qidCol, docCol), "left")
      .groupBy(col(qidCol))
      .agg(sum(gain(coalesce(col(relCol), lit(0L)).cast("double")) /
        log2(col(rankCol).cast("double") + 1.0)).as("dcg"))
    val iw = Window.partitionBy(col(qidCol))
      .orderBy(col(relCol).desc, col(docCol).asc)
    val idcg = rels
      .withColumn("irank", row_number().over(iw))
      .filter(col("irank") <= k)
      .groupBy(col(qidCol))
      .agg(sum(gain(col(relCol).cast("double")) /
        log2(col("irank").cast("double") + 1.0)).as("idcg"))
    dcg.join(idcg, Seq(qidCol), "left")
      .select(col(qidCol),
        when(coalesce(col("idcg"), lit(0.0)) > 0.0,
          round6(col("dcg") / col("idcg"))).otherwise(lit(0.0))
          .as("ndcg"),
        round6(col("dcg")).as("dcg"),
        round6(coalesce(col("idcg"), lit(0.0))).as("idcg"))
  }
}
