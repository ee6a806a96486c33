package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained document-quality classifier — the learned counterpart of the
  * heuristic quality batteries ([[TextAnalysis.qualityScore]],
  * `quality_rules`): an L2-regularized logistic regression fit by exact
  * Newton iterations with a backtracking (step-halving) line search, over a
  * fixed scan-side feature map. This is the fastText-style "quality filter
  * trained on weak labels" stage of an LLM data pipeline (cf. the CCNet /
  * GPT-3 data-curation recipe: score every document with a cheap linear
  * model, keep by score), re-expressed Spark-first.
  *
  * Scale story (the reason this shape survives 100 TB):
  *  - The feature map is plain column arithmetic over the text scan —
  *    no UDFs, fully codegen'd, and the training input is reduced ONCE to a
  *    7-double-wide frame (`localCheckpoint`), so Newton passes never
  *    re-read text.
  *  - One Newton iteration = ONE aggregation pass computing the exact
  *    gradient (k sums) and exact Hessian (k(k+1)/2 sums) — map-side
  *    partial aggregation, no wide shuffle; the driver solves a k×k system
  *    (k = 6) and broadcasts the next weight vector as literals. Line-search
  *    probes are single-sum passes over the same checkpointed frame.
  *  - Scoring is a scan-side sigmoid projection with literal weights —
  *    embarrassingly parallel, zero shuffle, usable as a pushdown-friendly
  *    filter stage in a curation funnel.
  *
  * Determinism: the loss is strictly convex (ridge > 0), so Newton converges
  * to the unique global optimum regardless of data partitioning; the line
  * search only ever accepts strictly-improving steps, making the recorded
  * loss sequence strictly decreasing by construction. Two fits on different
  * partitionings agree to far tighter than the 1e-4 score tolerance the
  * contract checks (float-sum reorder noise is ~1e-12 relative; the solver
  * plateau is ~1e-8).
  */
object QualityModel {

  /** Fixed stopword anchor — mirrored verbatim in the DuckDB oracle. */
  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")

  /** Scan-side feature map: token count, mean word length (non-whitespace
    * chars per token), stopword ratio, distinct-token ratio. Every feature
    * is engine-portable column arithmetic (exact integer counts + one IEEE
    * double division), so `quality_features` has an exact DuckDB oracle.
    */
  def featurize(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(trim(lower(col(textCol))), "\\s+")
    val nTok = size(toks).cast("double")
    val nws = length(regexp_replace(col(textCol), "\\s", "")).cast("double")
    docs.select(col(idCol),
      nTok.as("n_tok"),
      (nws / nTok).as("mean_wlen"),
      (size(filter(toks, t => t.isin(stopwords: _*))).cast("double") / nTok)
        .as("stop_ratio"),
      (size(array_distinct(toks)).cast("double") / nTok).as("distinct_ratio"))
  }

  /** Weak label the classifier distils: the curation rule "long enough AND
    * long-worded enough". Deliberately an AND of two thresholds — not
    * linearly separable in the raw features, which is why the design matrix
    * carries an interaction term.
    */
  def weakLabel: Column =
    (col("n_tok") >= 40.0 && col("mean_wlen") >= 4.4).cast("double")

  /** Feature count of the standardized design matrix (incl. intercept). */
  val nFeatures = 6

  /** Standardized design columns x0..x5 over a [[featurize]] frame.
    * Centering/scaling constants are fixed (not data-derived) so the design
    * is a pure per-row projection — partition- and corpus-invariant.
    * x5 = x1·x2 is the interaction that lets a linear model carve the
    * weak label's AND corner.
    */
  def design(features: DataFrame): DataFrame =
    features.select(col("*"),
      lit(1.0).as("x0"),
      ((col("n_tok") - lit(50.0)) / lit(25.0)).as("x1"),
      ((col("mean_wlen") - lit(4.5)) * lit(4.0)).as("x2"),
      (col("stop_ratio") * lit(5.0)).as("x3"),
      ((col("distinct_ratio") - lit(0.5)) * lit(4.0)).as("x4"))
      .withColumn("x5", col("x1") * col("x2"))

  /** Fit result: weights over x0..x5, the accepted-step loss sequence
    * (strictly decreasing by construction), the final gradient inf-norm
    * (convergence certificate) and the training row count.
    */
  case class Fit(weights: Array[Double], losses: Seq[Double],
      gradInf: Double, n: Long)

  private def zCol(w: Array[Double]): Column =
    (0 until nFeatures).map(j => col(s"x$j") * lit(w(j))).reduce(_ + _)

  /** Numerically-stable NLL: sum over rows of max(z,0) − y·z + log1p(e^−|z|)
    * (the softplus form — never exponentiates a large positive z), plus the
    * ridge term. One single-sum aggregation pass.
    */
  private def lossOf(d: DataFrame, w: Array[Double], ridge: Double): Double = {
    val z = zCol(w)
    val nll = d.agg(sum(greatest(z, lit(0.0)) - col("y") * z +
      log1p(exp(-abs(z))))).head().getDouble(0)
    nll + 0.5 * ridge * w.map(x => x * x).sum
  }

  /** Gaussian elimination with partial pivoting on a dense k×k system —
    * k = 6, a driver-side microsolve (same bounded-driver-work class as the
    * k×d codebook literals in the ANN family).
    */
  private[operators] def solve(a: Array[Array[Double]],
      b: Array[Double]): Array[Double] = {
    val k = b.length
    val m = Array.tabulate(k, k + 1)((i, j) => if (j < k) a(i)(j) else b(i))
    for (c <- 0 until k) {
      val piv = (c until k).maxBy(r => math.abs(m(r)(c)))
      val t = m(c); m(c) = m(piv); m(piv) = t
      require(math.abs(m(c)(c)) > 1e-300, "singular normal system")
      for (r <- 0 until k if r != c) {
        val f = m(r)(c) / m(c)(c)
        for (j <- c to k) m(r)(j) -= f * m(c)(j)
      }
    }
    Array.tabulate(k)(i => m(i)(k) / m(i)(i))
  }

  /** Newton-fit the classifier on `docs`. Each iteration aggregates the
    * exact gradient and Hessian in one pass, solves the (ridge-damped)
    * normal system on the driver, and step-halves until the loss strictly
    * improves; stops early when no improving step exists (plateau).
    */
  def train(docs: DataFrame, idCol: String, textCol: String,
      iters: Int = 8, ridge: Double = 1e-6): Fit = {
    val xs = (0 until nFeatures).map(j => s"x$j")
    val d = design(featurize(docs, idCol, textCol))
      .select(xs.map(col) :+ weakLabel.as("y"): _*)
      .localCheckpoint()
    val n = d.count()
    require(n > 0, "empty training corpus")
    var w = Array.fill(nFeatures)(0.0)
    var loss = lossOf(d, w, ridge)
    val losses = scala.collection.mutable.ArrayBuffer(loss)
    var gradInf = Double.MaxValue
    var halted = false
    for (_ <- 1 to iters if !halted) {
      val z = zCol(w)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val resid = p - col("y")
      val curv = p * (lit(1.0) - p)
      val gradAggs = (0 until nFeatures).map(j =>
        sum(resid * col(s"x$j")).as(s"g$j"))
      val hessAggs = for {
        j <- 0 until nFeatures; l <- j until nFeatures
      } yield sum(curv * col(s"x$j") * col(s"x$l")).as(s"h${j}_$l")
      val aggs = gradAggs ++ hessAggs
      val row = d.agg(aggs.head, aggs.tail: _*).head()
      val g = Array.tabulate(nFeatures)(j =>
        row.getDouble(j) + ridge * w(j))
      gradInf = g.map(math.abs).max
      val h = Array.ofDim[Double](nFeatures, nFeatures)
      var idx = nFeatures
      for (j <- 0 until nFeatures; l <- j until nFeatures) {
        val v = row.getDouble(idx); idx += 1
        h(j)(l) = v; h(l)(j) = v
      }
      for (j <- 0 until nFeatures) h(j)(j) += ridge
      val step = solve(h, g)
      var lr = 1.0
      var accepted = false
      while (!accepted && lr >= 1e-4) {
        val w2 = Array.tabulate(nFeatures)(j => w(j) - lr * step(j))
        val l2 = lossOf(d, w2, ridge)
        if (l2 < loss) { w = w2; loss = l2; losses += l2; accepted = true }
        else lr /= 2
      }
      halted = !accepted
    }
    // final-gradient certificate at the returned weights
    if (!halted) {
      val z = zCol(w)
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val aggs = (0 until nFeatures).map(j =>
        sum((p - col("y")) * col(s"x$j")).as(s"g$j"))
      val row = d.agg(aggs.head, aggs.tail: _*).head()
      gradInf = (0 until nFeatures)
        .map(j => math.abs(row.getDouble(j) + ridge * w(j))).max
    }
    d.unpersist()
    Fit(w, losses.toSeq, gradInf, n)
  }

  /** Platt scaling fit on a BINNED reliability table — the classic
    * sigmoid recalibration (Platt 1999): find (A, B) minimizing the
    * soft-target NLL of p = σ(A·s + B) over the bins, where each bin
    * contributes n examples at raw score s with n_pos positives. Platt's
    * prior smoothing (positive target (N⁺+1)/(N⁺+2), negative
    * 1/(N⁻+2)) keeps every target strictly interior, so the optimum is
    * FINITE even when the bins are perfectly separated — the reason this
    * is Newton-safe with no line search.
    *
    * Driver-side microsolve (the [[solve]] class of bounded driver
    * work): the input is ≤ 10 rows — the ppm-integer reliability bins a
    * single distributed pass produced — and each iteration is a 2×2
    * Newton step with a ±`stepClamp` guard, run a FIXED `iters` times
    * (no early exit: the DuckDB oracle replays the identical unrolled
    * iteration, and a data-dependent exit would not be expressible as
    * the same SQL). At convergence the iterate is a fixed point, so
    * engine float-sum order differences decay instead of accumulating;
    * callers snap the result to a 1e-6 grid before scoring (the
    * `score_fx` posture). Bins must be passed in a DEFINED order
    * (sort by bin id) — summation order is part of the contract.
    */
  def plattFit(bins: Seq[(Double, Long, Long)], iters: Int = 25,
      stepClamp: Double = 5.0): (Double, Double) = {
    require(bins.nonEmpty, "plattFit needs at least one bin")
    val nPosTot = bins.map(_._3).sum.toDouble
    val nNegTot = bins.map(b => b._2 - b._3).sum.toDouble
    val tp = (nPosTot + 1.0) / (nPosTot + 2.0)
    val tn = 1.0 / (nNegTot + 2.0)
    var a = 0.0
    var b = 0.0
    for (_ <- 1 to iters) {
      var ga = 0.0; var gb = 0.0
      var haa = 0.0; var hab = 0.0; var hbb = 0.0
      bins.foreach { case (s, n, np) =>
        val t = np * tp + (n - np) * tn
        val p = 1.0 / (1.0 + math.exp(-(a * s + b)))
        val r = n * p - t
        val c = n * p * (1.0 - p)
        ga += r * s; gb += r
        haa += c * s * s; hab += c * s; hbb += c
      }
      val det = haa * hbb - hab * hab
      // a saturated transient (all bins at p ∈ {0,1}) zeroes the Hessian;
      // skipping the step mirrors the oracle's CASE guard exactly
      if (math.abs(det) > 1e-300) {
        val da = (hbb * ga - hab * gb) / det
        val db = (haa * gb - hab * ga) / det
        a -= math.max(-stepClamp, math.min(stepClamp, da))
        b -= math.max(-stepClamp, math.min(stepClamp, db))
      }
    }
    (a, b)
  }

  /** Per-document sigmoid score under fixed weights — a scan-side
    * projection (weights are plan literals, nothing broadcast or joined).
    */
  def score(docs: DataFrame, idCol: String, textCol: String,
      weights: Array[Double]): DataFrame = {
    val d = design(featurize(docs, idCol, textCol))
    val z = (0 until nFeatures).map(j => col(s"x$j") * lit(weights(j)))
      .reduce(_ + _)
    d.select(col(idCol), (lit(1.0) / (lit(1.0) + exp(-z))).as("score"))
  }
}
