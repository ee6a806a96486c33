package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // the operator's exact pipeline, recomputed independently on the driver
  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def bucket(term: String, nBuckets: Int): Int = {
    val h = md5hex(term)
    ((((h(0).toInt * 31 + h(1).toInt) * 31 + h(2).toInt) * 31
      + h(3).toInt) % nBuckets + nBuckets) % nBuckets
  }

  private def referenceWeights(docs: Seq[(Long, String, Boolean)],
      nBuckets: Int): Map[Long, Long] = {
    val tok = docs.flatMap { case (id, text, tgt) =>
      text.trim.toLowerCase.split("\\s+").toSeq
        .map(t => (id, tgt, bucket(t, nBuckets)))
    }
    val nRaw = tok.size.toDouble
    val nTgt = tok.count(_._2).toDouble
    val half = nBuckets / 2.0
    val lrFx = tok.groupBy(_._3).map { case (b, ts) =>
      val raw = ts.size.toDouble
      val tgt = ts.count(_._2).toDouble
      b -> math.floor(math.log(((tgt + 0.5) / (nTgt + half)) /
        ((raw + 0.5) / (nRaw + half))) * 1e6 + 0.5).toLong
    }
    tok.groupBy(_._1).map { case (id, ts) =>
      id -> ts.groupBy(_._3)
        .map { case (b, g) => g.size.toLong * lrFx(b) }.sum
    }
  }

  private lazy val corpus = Seq(
    (0L, "alpha beta alpha gamma", true),
    (1L, "alpha beta beta", true),
    (2L, "delta epsilon zeta", false),
    (3L, "delta delta epsilon", false),
    (4L, "alpha beta gamma gamma", false), // target-ish text, raw label
    (5L, "zeta epsilon zeta delta", false))

  test("weights equal an independent recomputation of the exact pipeline") {
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val got = Selection.importanceWeights(df, "doc_id", "text",
        col("is_tgt"), nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == referenceWeights(corpus, 64))
  }

  test("target-looking documents outweigh off-target ones") {
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val w = Selection.importanceWeights(df, "doc_id", "text",
        col("is_tgt"), nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // doc 4 shares the target vocabulary despite its raw label; doc 5 is
    // pure off-target vocabulary
    assert(w(4L) > w(5L))
    assert(Seq(0L, 1L).map(w).min > Seq(2L, 3L, 5L).map(w).max)
  }

  test("selection flags exactly n docs, all outweighing the unselected") {
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val out = Selection.dsirSelect(df, "doc_id", "text", col("is_tgt"),
        n = 3, nBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.count(_._3) == 3)
    val selMin = out.filter(_._3).map(t => (t._2, -t._1)).min
    val unselMax = out.filterNot(_._3).map(t => (t._2, -t._1)).max
    // (w desc, id asc) order: every selected sorts above every unselected
    assert(selMin._1 > unselMax._1 ||
      (selMin._1 == unselMax._1 && selMin._2 > unselMax._2))
  }

  test("weights are partition-invariant") {
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val a = Selection.importanceWeights(df, "doc_id", "text",
      col("is_tgt"), 64).collect().toSet
    val b = Selection.importanceWeights(df.repartition(7), "doc_id", "text",
      col("is_tgt"), 64).collect().toSet
    assert(a == b)
  }

  test("top-N plans as TakeOrderedAndProject, never a global sort") {
    val df = corpus.toDF("doc_id", "text", "is_tgt")
    val out = Selection.dsirSelect(df, "doc_id", "text", col("is_tgt"), 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("CartesianProduct"))
  }

  test("topPPerDomain keeps the MINIMAL score-desc prefix covering p") {
    // domain A: scores 50,30,10,10 (total 100); p=0.5 → only the 50 row
    // (its exclusive cum 0 < 50; the 30 row's exclusive cum 50 !< 50).
    // domain B: scores 40,40,20 (total 100); p=0.5 → 40+40 (second row's
    // exclusive cum 40 < 50, third's 80 !< 50).
    val df = Seq(
      (0L, "A", 50L), (1L, "A", 30L), (2L, "A", 10L), (3L, "A", 10L),
      (4L, "B", 40L), (5L, "B", 40L), (6L, "B", 20L)
    ).toDF("id", "dom", "score")
    val kept = Selection.topPPerDomain(df, "id", "dom", col("score"),
      pPpm = 500000L).select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 4L, 5L))
  }

  test("topPPerDomain breaks score ties by id and is partition-invariant") {
    val df = (0L until 400L)
      .map(i => (i, if (i % 2 == 0) "X" else "Y", 10L))
      .toDF("id", "dom", "score")
    val kept = Selection.topPPerDomain(df, "id", "dom", col("score"),
      pPpm = 250000L).select("id").collect().map(_.getLong(0)).toSet
    // all scores equal → ties resolve by ascending id: the first quarter
    // of each domain's id order
    val expect = ((0L until 400L by 2).take(50) ++
      (1L until 400L by 2).take(50)).toSet
    assert(kept == expect)
    val again = Selection.topPPerDomain(df.repartition(13), "id", "dom",
      col("score"), pPpm = 250000L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == again)
  }

  test("topPPerDomain shuffles once: both windows share the domain key") {
    val df = (0L until 1000L).map(i => (i, s"d${i % 5}", i % 100))
      .toDF("id", "dom", "score")
    val plan = Selection.topPPerDomain(df, "id", "dom", col("score"),
      pPpm = 500000L).queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected one domain-key exchange, got $ex:\n" +
      plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan)
  }

  test("curriculumInterleave: tiers ordered, domains round-robin in tier") {
    val df = (0L until 600L).map(i => (i, s"d${i % 3}", i % 4))
      .toDF("id", "dom", "difficulty")
    val out = Selection.curriculumInterleave(df, "id", "dom",
        col("difficulty"), "cs1")
      .select("id", "dom", "tier", "rn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // the training order is the (tier, rn, dom) triple: sorting by it puts
    // all of tier t before tier t+1, and within a tier cycles the domains
    val ordered = out.sortBy(t => (t._3, t._4, t._2))
    assert(ordered.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
    // within tier 0, the first 3 rows are one from each domain (rn = 1)
    val tier0 = ordered.filter(_._3 == 0L).take(3)
    assert(tier0.map(_._2).toSet == Set("d0", "d1", "d2"))
    assert(tier0.forall(_._4 == 1L))
  }

  test("curriculumInterleave is partition-invariant and shuffles once") {
    val df = (0L until 600L).map(i => (i, s"d${i % 3}", i % 4))
      .toDF("id", "dom", "difficulty")
    val a = Selection.curriculumInterleave(df, "id", "dom",
        col("difficulty"), "cs2")
      .select("id", "tier", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    val b = Selection.curriculumInterleave(df.repartition(13), "id", "dom",
        col("difficulty"), "cs2")
      .select("id", "tier", "rn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(a.sameElements(b))
    val plan = Selection.curriculumInterleave(df, "id", "dom",
        col("difficulty"), "cs2").queryExecution.executedPlan.toString
    val ex = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(ex == 1, s"expected one (tier, domain) exchange, got $ex:\n" +
      plan.take(2000))
    assert(!plan.contains("SinglePartition"), plan)
  }
}
