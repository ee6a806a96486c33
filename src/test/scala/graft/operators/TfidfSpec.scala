package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  // 3 docs: "rare" appears only in doc 1; "common" in all three.
  private lazy val docs = Seq(
    (1L, "common rare rare alpha"),
    (2L, "common beta beta gamma"),
    (3L, "common gamma delta epsilon")).toDF("doc_id", "text")

  private lazy val out =
    TextAnalysis.tfidfTopTerms(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))

  test("tf, df and the score match hand computation") {
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // doc 1: rare has tf=2, df=1 → 2·ln(3/1) = 2.1972;
    // runner-up is alpha (tf=1, df=1) — common (df=3) ranks below it
    assert(d1(0)._3 == "rare" && d1(0)._4 == 2L && d1(0)._5 == 1L)
    assert(math.abs(d1(0)._6 - math.floor(2 * math.log(3.0) * 1e4 + 0.5) / 1e4)
      < 1e-12)
    assert(d1(1)._3 == "alpha" && d1(1)._5 == 1L)
  }

  test("ubiquitous terms score zero and never outrank distinctive ones") {
    // common: df = 3 = N → ln(1) = 0
    val common = out.filter(_._3 == "common")
    assert(common.forall(_._6 == 0.0))
    // with k=2 and every doc having ≥2 distinctive terms, "common" (tf=1,
    // df=3) is outranked everywhere by same-tf lower-df terms
    assert(common.isEmpty || common.forall(_._2 == 2L))
  }

  test("every doc gets at most k ranked rows starting at 1") {
    val byDoc = out.groupBy(_._1)
    assert(byDoc.forall { case (_, rows) =>
      val ranks = rows.map(_._2).sorted
      ranks.head == 1L && ranks.length <= 2 &&
        ranks.sameElements(1L to ranks.length)
    })
  }

  test("ranking is deterministic: ties break by df then term") {
    // doc 3: gamma (tf=1, df=2) vs delta/epsilon (tf=1, df=1) — lower df
    // wins; delta beats epsilon alphabetically
    val d3 = out.filter(_._1 == 3L).sortBy(_._2).map(_._3)
    assert(d3.toSeq == Seq("delta", "epsilon"))
  }
}
