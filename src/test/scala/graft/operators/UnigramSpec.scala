package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(lines: String*) =
    lines.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")

  test("roundtrip: every word's Viterbi pieces concatenate back exactly") {
    val words = Unigram.wordTable(
      corpus("the cat sat on the mat", "a cat and a rat ate the mat"),
      "text")
    val (model, _) = Unigram.train(words, seedSize = 64, iters = 2)
    val enc = Unigram.encode(words, model)
    assert(graft.queries.Contracts.forAll(enc,
      concat_ws("", col("pieces")) === col("w")))
  }

  test("EM objective is non-decreasing across iterations") {
    val words = Unigram.wordTable(corpus(
      "internationalization is the internationalization of nation",
      "the nation and the international nation"), "text")
    val (_, lls) = Unigram.train(words, seedSize = 128, iters = 4)
    assert(lls.length == 4)
    // fixed-point M-step perturbs probs at ~1e-9 relative; allow that
    lls.sliding(2).foreach { w =>
      assert(w(1) >= w(0) - math.abs(w(0)) / 1000000L - 10L,
        s"log-likelihood decreased: ${lls.mkString(", ")}")
    }
  }

  test("a dominant frequent word collapses to a single piece") {
    val line = Seq.fill(50)("abab").mkString(" ") + " ab ba xq"
    val words = Unigram.wordTable(corpus(line), "text")
    val (model, _) = Unigram.train(words, seedSize = 32, iters = 3)
    val enc = Unigram.encode(words, model)
      .select(col("w"), col("pieces")).as[(String, Seq[String])]
      .collect().toMap
    assert(enc("abab") == Seq("abab"))
  }

  test("training and encoding are partition-invariant") {
    val base = corpus("the quick brown fox jumps over the lazy dog",
      "the quick dog naps under the brown fox")
    val w1 = Unigram.wordTable(base, "text")
    val w7 = Unigram.wordTable(base.repartition(7), "text").repartition(5)
    val (m1, ll1) = Unigram.train(w1, seedSize = 64, iters = 3)
    val (m7, ll7) = Unigram.train(w7, seedSize = 64, iters = 3)
    assert(m1.probPpb == m7.probPpb)
    assert(ll1 == ll7)
    val e1 = Unigram.encode(w1, m1)
      .select(col("w"), col("pieces")).as[(String, Seq[String])]
      .collect().toMap
    val e7 = Unigram.encode(w7, m7)
      .select(col("w"), col("pieces")).as[(String, Seq[String])]
      .collect().toMap
    assert(e1 == e7)
  }

  test("unknown characters at encode time fall back to singletons " +
      "instead of failing") {
    val words = Unigram.wordTable(corpus("aa bb aa"), "text")
    val (model, _) = Unigram.train(words, seedSize = 16, iters = 1)
    val unseen = Seq(("zzq", 1L)).toDF("w", "cnt")
    val enc = Unigram.encode(unseen, model)
      .select(col("pieces")).as[Seq[String]].head()
    assert(enc == Seq("z", "z", "q"))
  }
  test("nBest: rank 1 equals Viterbi (incl. the permuted-multiset float " +
      "tie), paths ordered, distinct, and roundtrip") {
    // hand-built model where "fff" has the exact-tie pair [ff,f]/[f,ff]:
    // both score logp(ff)+logp(f) bit-for-bit — rank 1 must match
    // encode's shorter-final-piece greedy, i.e. [ff, f]
    val model = Unigram.Model(
      Map("f" -> 200000000L, "ff" -> 300000000L, "a" -> 250000000L,
        "b" -> 250000000L), maxPieceLen = 4)
    val words = Seq(("fff", 3L), ("ab", 2L), ("fab", 1L))
      .toDF("w", "cnt")
    val nb = Unigram.nBest(words, model, k = 3).collect()
      .map(r => (r.getString(0), r.getInt(2), r.getSeq[String](3).toList,
        r.getLong(4)))
    val vit = Unigram.encode(words, model).collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    // rank 1 == Viterbi for every word
    nb.filter(_._2 == 1).foreach { case (w, _, pieces, _) =>
      assert(pieces == vit(w), s"$w: rank1 $pieces != viterbi ${vit(w)}")
    }
    assert(vit("fff") == List("ff", "f")) // the tie, resolved greedily
    // the tied pair occupies ranks 1 and 2 with EQUAL fixed-point scores
    val fff = nb.filter(_._1 == "fff").sortBy(_._2)
    assert(fff(0)._3 == List("ff", "f") && fff(1)._3 == List("f", "ff"))
    assert(fff(0)._4 == fff(1)._4)
    // scores non-increasing, paths distinct, roundtrip
    nb.groupBy(_._1).foreach { case (w, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._4).sliding(2).forall(s =>
        s.length < 2 || s(1) <= s(0)))
      assert(rows.map(_._3).distinct.length == rows.length)
      rows.foreach { case (_, _, pieces, _) =>
        assert(pieces.mkString("") == w)
      }
    }
  }

  test("sampleEncode: one draw per occurrence, draw shares track the " +
      "exp-score posterior on a hand-built two-path model, deterministic " +
      "and partition-invariant") {
    // the fff tie model: [ff,f] and [f,ff] have EQUAL scores → posterior
    // 50/50 between ranks 1 and 2 (rank 3, [f,f,f], is exp(Δ) lighter)
    val model = Unigram.Model(
      Map("f" -> 200000000L, "ff" -> 300000000L, "a" -> 250000000L,
        "b" -> 250000000L), maxPieceLen = 4)
    val occs = (0 until 2000).map(i => (s"o$i", "fff")).toDF("occ_id", "w")
    val draws = Unigram.sampleEncode(occs, "occ_id", "w", model, k = 3)
      .localCheckpoint()
    assert(draws.count() == 2000L)
    assert(draws.select(col("occ_id")).distinct().count() == 2000L)
    val byRank = draws.groupBy(col("rank")).count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // posterior: p1 = p2 = w1/Z, p3 = w1·exp(Δ)/Z with Δ = score3−score1
    val lp = model.logProb
    val d = (3 * lp("f")) - (lp("ff") + lp("f"))
    val w3 = math.exp(d)
    val z = 2.0 + w3
    val exp1 = 2000.0 / z
    val exp3 = 2000.0 * w3 / z
    Seq(1 -> exp1, 2 -> exp1, 3 -> exp3).foreach { case (r, e) =>
      val got = byRank.getOrElse(r, 0L).toDouble
      val sd = math.sqrt(2000.0 * (e / 2000.0) * (1 - e / 2000.0))
      assert(math.abs(got - e) <= 4.5 * sd + 3.0,
        s"rank $r drew $got, expected ~$e (sd $sd)")
    }
    // deterministic + partition-invariant
    val again = Unigram.sampleEncode(occs.repartition(7), "occ_id", "w",
      model, k = 3)
    assert(graft.queries.Contracts.checksum(draws) ==
      graft.queries.Contracts.checksum(again))
    // every drawn path roundtrips
    assert(graft.queries.Contracts.forAll(draws,
      concat_ws("", col("pieces")) === col("w")))
  }

  test("nBest is partition-invariant and k=1 degenerates to encode") {
    val words = Unigram.wordTable(
      corpus("the cat sat on the mat", "a cat and a rat ate the mat"),
      "text")
    val (model, _) = Unigram.train(words, seedSize = 64, iters = 2)
    val a = Unigram.nBest(words, model, k = 3)
    val b = Unigram.nBest(words.repartition(5), model, k = 3)
    assert(graft.queries.Contracts.checksum(a) ==
      graft.queries.Contracts.checksum(b))
    val one = Unigram.nBest(words, model, k = 1)
      .select(col("w"), col("cnt"), col("pieces"))
    val vit = Unigram.encode(words, model)
      .select(col("w"), col("cnt"), col("pieces"))
    assert(graft.queries.Contracts.checksum(one) ==
      graft.queries.Contracts.checksum(vit))
  }

}
