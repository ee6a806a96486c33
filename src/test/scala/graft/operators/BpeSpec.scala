package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables.t

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("learns the classic merge sequence on the Sennrich-style corpus") {
    // low×5 lower×2 newest×6 widest×3 — the worked example family from the
    // BPE paper. Highest-count adjacent pair is ('e','s') with 6+3 = 9
    // (inside newest/widest), then ('es','t') 9, then ('est','</w>') 9...
    val corpus = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val df = Seq(corpus).toDF("text")
    val (merges, words) = Bpe.train(df, "text", nMerges = 4)
    assert(merges.map(m => (m.left, m.right, m.count)).take(3) == Seq(
      ("e", "s", 9L), ("es", "t", 9L), ("est", "</w>", 9L)))
    // after est</w> exists, 'l'+'o' (5+2=7) is the next best
    assert(merges(3).left == "l" && merges(3).right == "o" &&
      merges(3).count == 7L)
    // the learned units actually live in the word table
    val newest = words.filter(col("w") === "newest")
      .select(col("syms")).as[Seq[String]].head()
    assert(newest == Seq("n", "e", "w", "est</w>"))
  }

  test("merge application is greedy left-to-right and single-pass") {
    val df = Seq("aaa").toDF("text")
    val (merges, words) = Bpe.train(df, "text", nMerges = 1)
    // pairs of a a a </w>: (a,a) count 2 wins over (a,</w>) 1
    assert(merges.head.left == "a" && merges.head.right == "a")
    val syms = words.select(col("syms")).as[Seq[String]].head()
    // greedy: aa | a | </w> — the fresh 'aa' does not re-match as 'a'
    assert(syms == Seq("aa", "a", "</w>"))
  }

  test("roundtrip: concatenated symbols reproduce every word; compression is real") {
    val docs = t(spark, sfDir, "documents").limit(200)
    val before = Bpe.wordTable(docs, "text")
      .agg(sum(size(col("syms")))).head().getLong(0)
    val (merges, words) = Bpe.train(docs, "text", nMerges = 12)
    assert(merges.size == 12)
    val bad = words.filter(
      concat_ws("", col("syms")) =!= concat(col("w"), lit("</w>"))).count()
    assert(bad == 0, "decode must reproduce the exact word")
    val after = words.agg(sum(size(col("syms")))).head().getLong(0)
    // each merge strictly reduces weighted symbol count; unweighted table
    // count must drop too since every chosen pair occurs somewhere
    assert(after < before)
  }

  test("training is partition-invariant: exact counts, deterministic tie-break") {
    val docs = t(spark, sfDir, "documents").limit(300)
    val (m1, _) = Bpe.train(docs, "text", nMerges = 8)
    val (m13, _) = Bpe.train(docs.repartition(13), "text", nMerges = 8)
    assert(m1 == m13)
  }

  test("encode under a fixed vocabulary matches the training-side table") {
    val docs = t(spark, sfDir, "documents").limit(150)
    val (merges, trained) = Bpe.train(docs, "text", nMerges = 10)
    val encoded = Bpe.encode(Bpe.wordTable(docs, "text"), merges)
    val diff = trained.select(col("w"), col("syms"))
      .exceptAll(encoded.select(col("w"), col("syms"))).count()
    assert(diff == 0, "encode must replay training's segmentation exactly")
  }
}
