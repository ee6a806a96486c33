package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private def df(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private val evalSet = df(
    1L -> "the quick brown fox jumps over the lazy dog near the river bank",
    2L -> "colorless green ideas sleep furiously under a pale winter moon")

  test("a corpus doc embedding an eval passage is flagged; others are not") {
    val corpus = df(
      10L -> ("intro words here the quick brown fox jumps over the lazy dog " +
        "near the river bank and then some trailing commentary"),
      11L -> "a completely unrelated document about spark shuffle mechanics",
      12L -> "quick brown fox appears but never eight tokens in a row shared")
    val c = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c.keySet == Set(10L))
    assert(c(10L) >= 1)
  }

  test("decontaminate removes exactly the contaminated docs") {
    val corpus = df(
      10L -> ("x y z colorless green ideas sleep furiously under a pale " +
        "winter moon w v u"),
      11L -> "clean document one with plenty of words to go around today",
      12L -> "clean document two with plenty of words to go around today")
    val clean = Decontaminate.decontaminate(corpus, evalSet, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(11L, 12L))
  }

  test("overlap shorter than n tokens is not contamination") {
    // shares a 7-token run with eval doc 1, but never 8
    val corpus = df(
      20L -> "the quick brown fox jumps over the fence into another yard")
    assert(Decontaminate.contaminated(corpus, evalSet, "doc_id", "text",
      n = 8).isEmpty)
  }

  test("minOverlap raises the evidence bar") {
    val corpus = df(
      30L -> ("the quick brown fox jumps over the lazy dog padding " +
        "words only one shared window here"))
    // doc 30 shares a couple of 8-gram windows from one passage
    val loose = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text",
      minOverlap = 1)
    val strict = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text",
      minOverlap = 50)
    assert(!loose.isEmpty && strict.isEmpty)
  }

  test("bloom path equals the exact path on real documents") {
    val docs = graft.Tables.t(spark, sfDir, "documents")
    val corpus = docs.filter(col("doc_id") >= 20)
    val ev = docs.filter(col("doc_id") < 20)
    val exact = Decontaminate.contaminated(corpus, ev, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bloom = Decontaminate.contaminatedBloom(corpus, ev, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "test data should contain a planted contamination")
    assert(bloom === exact)
  }

  test("bloom-only mode never misses a contaminated doc (no false negatives)") {
    val corpus = df(
      10L -> ("intro words here the quick brown fox jumps over the lazy dog " +
        "near the river bank and then some trailing commentary"),
      11L -> "a completely unrelated document about spark shuffle mechanics")
    val flagged = Decontaminate.contaminatedBloom(corpus, evalSet,
        "doc_id", "text", exact = false)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(10L))
  }

  test("eval shingles broadcast; corpus is never shuffled wholesale") {
    val corpus = df((0L until 50L).map(i =>
      i -> s"document number $i with some words for shingling tests"): _*)
    val plan = Decontaminate.contaminated(corpus, evalSet, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fuzzyContaminated equals brute-force cross-corpus Jaccard") {
    // corpus doc 10 is a light edit of eval doc 1 (near-dup, no long
    // verbatim run survives the edits); 11 is clean; 12 shares only a
    // couple of grams (below threshold)
    val corpus = df(
      10L -> ("the quick brown fox leaps over the lazy dog close to the " +
        "river bank"),
      11L -> "a completely unrelated document about spark shuffle mechanics",
      12L -> "the quick brown cat sits still ignoring every dog entirely")
    val got = Decontaminate.fuzzyContaminated(corpus, evalSet,
        "doc_id", "text", n = 3, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // brute-force replay on the driver
    def sh(s: String) = s.trim.toLowerCase.split("\\s+").toSeq
      .sliding(3).map(_.mkString(" ")).toSet
    val expect = for {
      (cid, ct) <- Seq(10L, 11L, 12L).zip(corpus.orderBy("doc_id")
        .collect().map(_.getString(1)))
      (eid, et) <- evalSet.orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      j = BigDecimal(sh(ct).intersect(sh(et)).size.toDouble /
          sh(ct).union(sh(et)).size)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      if j >= 0.2
    } yield (cid, eid, j)
    assert(got.toSet == expect.toSet)
    assert(got.map(_._1).contains(10L) && !got.map(_._1).contains(11L))
  }

  test("fuzzyContaminated joins on broadcast gram hashes (no corpus-wide " +
      "shuffle before the hit aggregation)") {
    val corpus = df((0L until 50L).map(i =>
      i -> s"document number $i with some words for shingling tests"): _*)
    val plan = Decontaminate.fuzzyContaminated(corpus, evalSet,
        "doc_id", "text").queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
    assert(!plan.contains("SortMergeJoin"), plan.take(2000))
  }
}
