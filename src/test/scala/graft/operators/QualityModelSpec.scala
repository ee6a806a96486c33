package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  test("solve: known 3x3 system (partial pivoting path)") {
    // A·x = b with A deliberately needing a row swap at the first pivot
    val a = Array(
      Array(0.0, 2.0, 1.0),
      Array(4.0, 1.0, -1.0),
      Array(2.0, -3.0, 2.0))
    val x = Array(1.5, -2.0, 3.0)
    val b = Array.tabulate(3)(i => a(i).zip(x).map(p => p._1 * p._2).sum)
    val got = QualityModel.solve(a, b)
    got.zip(x).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
  }

  test("plattFit: recovers sign and monotone calibration on hand-built " +
      "bins, survives perfect separation (smoothed targets), converges " +
      "to a fixed point, and is deterministic") {
    // pos rate rises with score → A must come out positive
    val bins = Seq(
      (0.05, 100L, 2L), (0.25, 100L, 10L), (0.45, 100L, 40L),
      (0.65, 100L, 75L), (0.85, 100L, 96L))
    val (a, b) = QualityModel.plattFit(bins)
    assert(a > 0.0, s"rising pos-rate must fit A > 0, got $a")
    def cal(s: Double) = 1.0 / (1.0 + math.exp(-(a * s + b)))
    // calibrated curve tracks the empirical rates to a few percent
    bins.foreach { case (s, n, np) =>
      assert(math.abs(cal(s) - np.toDouble / n) < 0.08,
        s"calibration off at s=$s: ${cal(s)} vs ${np.toDouble / n}")
    }
    // fixed point: 25 and 40 iterations agree to double precision — the
    // engine-replayability argument (float-order noise decays) holds
    val (a40, b40) = QualityModel.plattFit(bins, iters = 40)
    assert(math.abs(a - a40) < 1e-9 && math.abs(b - b40) < 1e-9,
      s"not converged at 25 iters: ($a,$b) vs ($a40,$b40)")
    // PERFECT separation: unsmoothed MLE diverges (A → ∞); Platt's prior
    // smoothing must keep the fit finite
    val sep = Seq((0.1, 50L, 0L), (0.3, 50L, 0L), (0.7, 50L, 50L),
      (0.9, 50L, 50L))
    val (as, bs) = QualityModel.plattFit(sep)
    assert(!as.isNaN && !bs.isNaN && as > 0.0 && math.abs(as) < 200.0,
      s"separated bins must fit finite A: ($as, $bs)")
    // deterministic: same input, same bits
    assert(QualityModel.plattFit(bins) == ((a, b)))
  }

  test("featurize: exact values on a hand-built doc") {
    val df = Seq((1L, "The cat sat on the mat")).toDF("doc_id", "text")
    val r = QualityModel.featurize(df, "doc_id", "text").head()
    assert(r.getDouble(1) === 6.0) // n_tok
    // non-whitespace chars = 17, mean word len = 17/6
    assert(math.abs(r.getDouble(2) - 17.0 / 6.0) < 1e-12)
    // stopwords after lower(): the, on, the → 3/6
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-12)
    // distinct of [the, cat, sat, on, the, mat] = 5/6
    assert(math.abs(r.getDouble(4) - 5.0 / 6.0) < 1e-12)
  }

  test("train on sf0.001 documents: monotone loss, convergence, accuracy") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val fit = QualityModel.train(docs, "doc_id", "text")
    assert(fit.n === docs.count())
    assert(fit.losses.size >= 2)
    fit.losses.sliding(2).foreach(p => assert(p(1) < p(0)))
    // converged: per-corpus-normalized gradient certificate
    assert(fit.gradInf <= 1e-3 * fit.n)
    val scored = QualityModel.score(docs, "doc_id", "text", fit.weights)
    val acc = scored
      .join(QualityModel.featurize(docs, "doc_id", "text")
        .select(col("doc_id"), QualityModel.weakLabel.as("y")), "doc_id")
      .agg(avg(((col("score") >= 0.5) === (col("y") >= 0.5))
        .cast("double"))).head().getDouble(0)
    assert(acc >= 0.75, s"training accuracy $acc below floor")
    // all probabilities valid
    assert(scored.filter(col("score") < 0.0 || col("score") > 1.0 ||
      col("score").isNull).isEmpty)
  }

  test("fit is partition-invariant at score level (unique convex optimum)") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val w1 = QualityModel.train(docs, "doc_id", "text").weights
    val w2 = QualityModel.train(docs.repartition(13), "doc_id", "text")
      .weights
    val s1 = QualityModel.score(docs, "doc_id", "text", w1)
    val s2 = QualityModel.score(docs, "doc_id", "text", w2)
      .select(col("doc_id"), col("score").as("score2"))
    assert(s1.join(s2, "doc_id")
      .filter(abs(col("score") - col("score2")) > 1e-4).isEmpty)
  }

  test("score is a scan-side projection: no exchange in the plan") {
    val docs = graft.Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val w = Array(0.1, -0.2, 0.3, 0.0, 0.05, 0.01)
    val plan = QualityModel.score(docs, "doc_id", "text", w)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
