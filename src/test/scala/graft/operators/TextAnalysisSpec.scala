package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashExpressions

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token counts: whitespace and bpe-ish") {
    val df = Seq("the cat  sat", "a1 b2,c3!", "one").toDF("text")
    val got = df.select(
      TextAnalysis.tokenCount(col("text")).as("ws"),
      TextAnalysis.bpeishCount(col("text")).as("bpe"))
      .as[(Int, Int)].collect()
    assert(got(0) === ((3, 3)))
    // "a1 b2,c3!" → a,1,b,2,",",c,3,"!" = 8 bpe-ish pieces, 2 ws tokens
    assert(got(1) === ((2, 8)))
    assert(got(2) === ((1, 1)))
  }

  test("language id picks the dominant function-word language") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "el perro y la casa en un dia que pasa",
      "der hund und die katze ist ein tier zu hause",
      "xyzzy qwerty plugh").toDF("text")
    val got = df.select(TextAnalysis.langId(TextAnalysis.tokens(col("text"))))
      .as[String].collect()
    assert(got.toSeq === Seq("en", "es", "de", "und"))
  }

  test("quality score is within [0,1] and higher for richer text") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs to the hills in a day",
      "x x x").toDF("text")
    val got = df.select(TextAnalysis.qualityScore(col("text"),
        TextAnalysis.tokens(col("text"))))
      .as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("winnow fingerprint: shared substrings share hashes; short input is empty") {
    HashExpressions.register(spark)
    val df = Seq(
      ("A", "the common long shared substring lives here untouched"),
      ("B", "prefix then the common long shared substring lives here untouched"),
      ("C", "nothing alike whatsoever in any way"),
      ("D", "tiny")).toDF("id", "text")
    val fp = df.select(col("id"),
      expr("winnow_fingerprint(text, 8, 4)").as("fp"))
      .as[(String, Seq[Long])].collect().toMap
    val overlapAB = fp("A").toSet & fp("B").toSet
    val overlapAC = fp("A").toSet & fp("C").toSet
    assert(overlapAB.size > overlapAC.size)
    assert(fp("D").isEmpty)
  }

  test("bigram LM score ranks fluent text above gibberish") {
    val fluent = "the cat sat on the mat and the cat sat on the mat again"
    val df = Seq(
      (1L, fluent), (2L, fluent), (3L, fluent),
      (4L, "zq xv wk jy qn bv td pm lr cx fh gw")
    ).toDF("doc_id", "text")
    val scores = TextAnalysis.bigramLmScore(df, "doc_id", "text")
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    // the fluent docs share every bigram (high counts); the gibberish doc's
    // bigrams each occur once against the full vocabulary denominator
    assert(scores(1L) > scores(4L),
      s"fluent=${scores(1L)} gibberish=${scores(4L)}")
    assert(scores(1L) == scores(2L) && scores(2L) == scores(3L))
  }

  test("bigram LM score can score against a separate reference corpus") {
    val ref = Seq((10L, "alpha beta gamma alpha beta")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "alpha beta gamma"),   // in-model bigrams
      (2L, "delta epsilon zeta")  // all unseen
    ).toDF("doc_id", "text")
    val scores = TextAnalysis
      .bigramLmScore(docs, "doc_id", "text", ref = Some(ref))
      .select("doc_id", "lm_score").as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L))
  }

  test("noveltyScore: df-1 grams count as novel, shared grams do not") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),      // grams: abg, bgd — both unique
      (2L, "one two three four five"),     // otf, ttf, tff — all unique
      (3L, "one two three four six")       // shares "one two three",
                                           // "two three four" with doc 2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out(1L) == ((2L, 2L, 1000000L)))
    assert(out(2L) == ((1L, 3L, 333333L)))
    assert(out(3L) == ((1L, 3L, 333333L)))
  }

  test("noveltyScore short docs fall back to the whole-text shingle") {
    val docs = Seq((1L, "just two"), (2L, "just two")).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // both docs share their single whole-text gram: nothing is novel
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("noveltyIncremental equals from-scratch, snapshot and scores") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "one two three four five")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "one two three nine ten"),   // shares "one two three" w/ doc 2
      (11L, "fresh words only here now") // all novel
    ).toDF("doc_id", "text")
    val all = corpus.unionByName(batch)
    val snap = TextAnalysis.gramDf(corpus, "doc_id", "text")
    val (updated, scores) =
      TextAnalysis.noveltyIncremental(batch, snap, "doc_id", "text")
    // snapshot folds to exactly the from-scratch df table
    val scratch = TextAnalysis.gramDf(all, "doc_id", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val inc = updated.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(inc == scratch)
    // batch scores equal the from-scratch scores of those same docs
    val full = TextAnalysis.noveltyScore(all, "doc_id", "text")
      .filter(col("doc_id") >= 10L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val got = scores.collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got == full)
    // and the corpus overlap actually bit: doc 10 is not fully novel
    assert(got(10L)._3 < 1000000L && got(11L)._3 == 1000000L)
  }

  test("simhash64 registered function rejects wrong input type") {
    HashExpressions.register(spark)
    val err = intercept[Exception] {
      Seq(1).toDF("x").select(expr("simhash64(x)")).collect()
    }
    assert(err.getMessage.contains("array<string>"))
  }
}
