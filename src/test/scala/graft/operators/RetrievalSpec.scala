package graft.operators

import graft.SparkSpec

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def rrf(rank: Long, rrfK: Int = 60): Long =
    math.floor(1e9 / (rrfK + rank)).toLong

  private def fuse(a: Seq[(Long, Long, Long)], b: Seq[(Long, Long, Long)],
      k: Int = 10) =
    Retrieval.rrfFuse(
        Seq(a.toDF("qid", "id", "rank"), b.toDF("qid", "id", "rank")), k)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(t => (t._1, t._2))

  test("a doc ranked by both arms beats a doc ranked first by one") {
    // doc 30 is rank 2 in BOTH arms; docs 10 and 20 are rank 1 in one arm
    // each. RRF: 2/(60+2) > 1/(60+1), so 30 must fuse first.
    val out = fuse(
      a = Seq((1L, 10L, 1L), (1L, 30L, 2L)),
      b = Seq((1L, 20L, 1L), (1L, 30L, 2L)))
    assert(out.map(t => (t._2, t._3)) ===
      Seq((1L, 30L), (2L, 10L), (3L, 20L)))
    // exact fixed-point scores, recomputed independently
    assert(out.map(_._4) === Seq(2 * rrf(2), rrf(1), rrf(1)))
    assert(out.map(_._5) === Seq(2L, 1L, 1L))
  }

  test("equal fused scores break ties on ascending id") {
    val out = fuse(
      a = Seq((1L, 9L, 1L), (1L, 4L, 2L)),
      b = Seq((1L, 4L, 1L), (1L, 9L, 2L)))
    // both docs score rrf(1)+rrf(2); lower id first
    assert(out.map(_._3) === Seq(4L, 9L))
    assert(out.map(_._4).distinct === Seq(rrf(1) + rrf(2)))
  }

  test("queries fuse independently and k truncates per query") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L))
    val b = Seq((1L, 12L, 1L), (2L, 20L, 2L))
    val out = fuse(a, b, k = 2)
    assert(out.filter(_._1 == 1L).length == 2)
    assert(out.filter(_._1 == 2L).map(t => (t._3, t._4)) ===
      Seq((20L, rrf(1) + rrf(2))))
  }

  test("hybrid equals rrfFuse of the two arms computed separately") {
    val docs = Seq(
      (0L, "apple banana apple"), (1L, "banana cherry"),
      (2L, "cherry date date"), (3L, "apple cherry"),
      (4L, "date banana")).toDF("doc_id", "text")
    val vecs = Seq(
      (0L, Seq(1.0f, 0.0f)), (1L, Seq(0.9f, 0.1f)), (2L, Seq(0.0f, 1.0f)),
      (3L, Seq(0.5f, 0.5f)), (4L, Seq(0.1f, 0.9f)))
      .toDF("vec_id", "embedding")
    val qs = Seq((0L, "apple banana apple", Seq(1.0f, 0.0f)))
      .toDF("query_id", "text", "embedding")

    val hybrid = Retrieval.hybridTopK(docs, vecs, qs,
      "doc_id", "text", "vec_id", "embedding",
      "query_id", "text", "embedding", k = 5, armK = 3)

    import org.apache.spark.sql.functions.col
    val lex = TextAnalysis.bm25TopK(docs, qs.select(col("query_id"),
        col("text")), "doc_id", "text", "query_id", "text", 3)
      .select(col("query_id").as("qid"), col("doc_id").as("id"), col("rank"))
    val vec = Similarity.bruteForceTopK(vecs,
        qs.select(col("query_id").as("vec_id"), col("embedding")),
        "vec_id", "embedding", 3)
      .select(col("qid"), col("nid").as("id"), col("rank"))
    val manual = Retrieval.rrfFuse(Seq(lex, vec), 5)

    assert(hybrid.collect().toSeq === manual.collect().toSeq)
    // doc 0 is the lexical self-match AND the cosine-identical vector is
    // excluded as self only on the VECTOR side, so doc 0 still fuses first
    // through its BM25 rank-1 plus nothing — verify it is present and top.
    val first = hybrid.orderBy(col("qid"), col("rank")).head()
    assert(first.getLong(0) == 0L && first.getLong(1) == 1L)
  }

  test("fusion shuffles candidates, not the corpus (single agg + window)") {
    val a = Seq((1L, 10L, 1L), (1L, 11L, 2L)).toDF("qid", "id", "rank")
    val b = Seq((1L, 12L, 1L)).toDF("qid", "id", "rank")
    val plan = Retrieval.rrfFuse(Seq(a, b), 10)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    // one hash agg pair (partial+final) over the union, one window sort —
    // no join at all in the fusion stage
    assert(!plan.contains("SortMergeJoin"))
  }

  private def mmr(cands: Seq[(Long, Long, Double, Seq[Double])], k: Int,
      lambda: Double) =
    Retrieval.mmrRerank(cands.toDF("qid", "id", "rel", "v"), k, lambda)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))

  test("MMR crowds out a planted near-duplicate that pure relevance keeps") {
    // docs 1 and 2 are near-identical high-relevance hits; doc 3 is an
    // orthogonal lower-relevance hit. Pure relevance (λ=1) takes the twin
    // pair; diversity-weighted MMR takes one twin then the orthogonal doc.
    val cands = Seq(
      (7L, 1L, 0.95, Seq(1.0, 0.0)),
      (7L, 2L, 0.94, Seq(0.999, 0.04)),
      (7L, 3L, 0.60, Seq(0.0, 1.0)))
    assert(mmr(cands, 2, 1.0).map(_._3) === Seq(1L, 2L))
    assert(mmr(cands, 2, 0.5).map(_._3) === Seq(1L, 3L))
  }

  test("MMR selection is a pure function of the candidate set") {
    val cands = (0 until 30).map { i =>
      (1L, i.toLong, 1.0 - i * 0.01,
        Seq(math.sin(i * 0.7), math.cos(i * 1.3), math.sin(i * 2.1)))
    }
    val a = mmr(cands, 5, 0.7)
    val b = Retrieval.mmrRerank(
        cands.toDF("qid", "id", "rel", "v").repartition(7), 5, 0.7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    assert(a === b)
    // fewer candidates than k: emits all, ranks stay 1..n
    val short = mmr(cands.take(3), 5, 0.7)
    assert(short.map(_._2) === Seq(1L, 2L, 3L))
  }

  test("mixed-dimension candidate vectors fail loudly, naming the query") {
    // the cosine loop indexes both vectors up to the first's length: a
    // 2-dim vs 3-dim mix would either throw an opaque executor AIOOBE or
    // silently truncate the dot product depending on pick order
    val cands = Seq(
      (9L, 1L, 0.9, Seq(1.0, 0.0)),
      (9L, 2L, 0.8, Seq(0.5, 0.5, 0.5)))
    val e = intercept[Throwable] {
      Retrieval.mmrRerank(cands.toDF("qid", "id", "rel", "v"), 2, 0.5)
        .collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => String.valueOf(t.getMessage)).mkString(" | ")
    assert(msgs.contains("mixed embedding"), msgs.take(500))
    assert(msgs.contains("query 9"), msgs.take(500))
  }

  private def lg2(x: Double): Double = math.log(x) / math.log(2.0)
  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("ndcgAtK: perfect ranking is exactly 1; a reversed ranking matches " +
      "the hand-computed value; unknown docs gain 0") {
    val rels = Seq((1L, 10L, 3L), (1L, 11L, 2L), (1L, 12L, 1L))
      .toDF("qid", "doc", "rel")
    def run(ranking: Seq[(Long, Long, Long)]): (Double, Double, Double) = {
      val r = Retrieval.ndcgAtK(ranking.toDF("qid", "doc", "rank"), rels,
        "qid", "doc", "rank", "rel", 3).collect().head
      (r.getDouble(1), r.getDouble(2), r.getDouble(3))
    }
    val (n1, d1, i1) = run(Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L)))
    assert(n1 == 1.0 && d1 == i1)
    // reversed: dcg = 1/log2(2) + 3/log2(3) + 7/log2(4)
    val idcg = 7.0 / lg2(2) + 3.0 / lg2(3) + 1.0 / lg2(4)
    val dcgRev = 1.0 / lg2(2) + 3.0 / lg2(3) + 7.0 / lg2(4)
    val (n2, d2, _) = run(Seq((1L, 12L, 1L), (1L, 11L, 2L), (1L, 10L, 3L)))
    assert(d2 == r6(dcgRev) && n2 == r6(dcgRev / idcg) && n2 < 1.0)
    // a ranked doc with no relevance row contributes zero gain
    val (n3, d3, _) = run(Seq((1L, 99L, 1L), (1L, 10L, 2L), (1L, 11L, 3L)))
    assert(d3 == r6(7.0 / lg2(3) + 3.0 / lg2(4)) && n3 < n2)
  }

  test("ndcgAtK: a query with no relevant docs anywhere scores 0, and " +
      "ideal ranks are capped at k") {
    val rels = Seq((1L, 10L, 1L)).toDF("qid", "doc", "rel")
    val ranked = Seq((2L, 20L, 1L)).toDF("qid", "doc", "rank")
    val r = Retrieval.ndcgAtK(ranked, rels, "qid", "doc", "rank", "rel", 3)
      .collect()
    assert(r.length == 1 && r.head.getLong(0) == 2L &&
      r.head.getDouble(1) == 0.0)
    // k caps the ideal: 5 rel-1 docs at k=2 → idcg = 1/log2(2) + 1/log2(3)
    val many = (10L to 14L).map(d => (3L, d, 1L)).toDF("qid", "doc", "rel")
    val rk = Seq((3L, 10L, 1L), (3L, 11L, 2L)).toDF("qid", "doc", "rank")
    val r2 = Retrieval.ndcgAtK(rk, many, "qid", "doc", "rank", "rel", 2)
      .collect().head
    assert(r2.getDouble(3) == r6(1.0 / lg2(2) + 1.0 / lg2(3)))
    assert(r2.getDouble(1) == 1.0)
  }
}
