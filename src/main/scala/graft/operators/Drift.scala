package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution-drift metrics between a reference and a current dataset:
  * PSI (population stability index, the credit-scoring / feature-monitoring
  * standard) and Jensen-Shannon divergence, over either a numeric column
  * (bucketed at the REFERENCE's quantile edges — the canonical PSI recipe,
  * so bucket boundaries are a pure function of the reference and drift in
  * the current data cannot move them) or a categorical column (one bucket
  * per value).
  *
  * Why an engine needs this: a training-data pipeline that ingests
  * continuously must detect when a source's distribution shifts (a crawler
  * change, an upstream schema bug, seasonality) BEFORE the shifted data
  * contaminates a mix. PSI > 0.25 is the conventional "investigate" line.
  *
  * Shape at scale: edge fitting is ONE exact-percentile aggregation over
  * the reference (at 100 TB the drop-in is `approx_percentile` — same plan,
  * sketch state, the tolerance posture `approx_median_check` pins);
  * histograms are one `groupBy(bucket).count` per side (map-side partial
  * aggregation, ≤ nBuckets rows out); the metric join touches ≤ nBuckets
  * rows. Nothing data-sized ever reaches the driver — the collected edge
  * array is nBuckets-1 doubles (bounded model state, the
  * [[Similarity]]-codebook posture).
  *
  * Cross-engine determinism (the DuckDB-oracle contract): edges are
  * snapped to 6 decimals before bucketing on BOTH engines, so a last-ulp
  * difference in percentile interpolation cannot flip a `value > edge`
  * comparison; proportions are exact count ratios; the ≤ nBuckets-term
  * log sums are rounded to 6 decimals at output (the `pagerank` posture
  * for float aggregates).
  */
object Drift {

  /** Reference-quantile bucket edges for `nBuckets` equal-population
    * buckets: the exact interpolated percentiles at i/nBuckets,
    * i = 1..nBuckets-1, each snapped to 6 decimals.
    */
  def quantileEdges(ref: DataFrame, valueCol: String,
      nBuckets: Int): Array[Double] = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val ps = (1 until nBuckets).map(i => i.toDouble / nBuckets)
    val row = ref.agg(
      expr(s"percentile($valueCol, array(${ps.mkString(",")}))"))
      .head()
    // fail loudly on an empty or all-NULL reference — exactly the
    // upstream-outage state a drift monitor meets; a null-seq NPE here
    // would be undiagnosable
    require(!row.isNullAt(0),
      s"drift reference has no non-NULL '$valueCol' values — " +
        "cannot fit quantile edges")
    row.getSeq[Double](0)
      .map(e => math.floor(e * 1e6 + 0.5) / 1e6).toArray
  }

  /** Bucket index of `c` against snapped `edges`: the count of edges
    * strictly below the value — pure column math (a nBuckets-1-term
    * conditional sum, codegen-friendly), no UDF. NULL-PROPAGATING: a NULL
    * value yields a NULL bucket (not bucket 0 — `when(null > e)` would
    * otherwise fall to the `otherwise` arm), so a caller that skips the
    * isNotNull pre-filter cannot silently inflate the lowest bucket.
    */
  def bucketOf(c: Column, edges: Array[Double]): Column =
    when(c.isNull, lit(null))
      .otherwise(edges.foldLeft(lit(0))((acc, e) =>
        acc + when(c > lit(e), 1).otherwise(0)))

  /** Per-bucket proportions of `valueCol` under `edges`:
    * (bucket, n, p) with p = n / total. NULL values are excluded (they are
    * a completeness concern — [[Expectations]] — not a drift one).
    */
  def histogram(df: DataFrame, valueCol: String,
      edges: Array[Double]): DataFrame =
    proportions(
      df.filter(col(valueCol).isNotNull)
        .groupBy(bucketOf(col(valueCol), edges).as("bucket"))
        .agg(count(lit(1)).as("n")))

  /** Categorical proportions: one bucket per distinct value of `catCol`. */
  def categoricalHistogram(df: DataFrame, catCol: String): DataFrame =
    proportions(
      df.filter(col(catCol).isNotNull)
        .groupBy(col(catCol).cast("string").as("bucket"))
        .agg(count(lit(1)).as("n")))

  /** (bucket, n) counts → (bucket, n, p = n / Σn) via a broadcast one-row
    * total (the `length_trim_stats` shape — no global window, no
    * single-partition exchange). Public because persisted bucket-count
    * segments (the streaming monitor's state) re-enter here.
    */
  def proportions(counts: DataFrame): DataFrame = {
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .select(col("bucket"), col("n"),
        (col("n").cast("double") / col("total").cast("double")).as("p"))
  }

  /** PSI + Jensen-Shannon divergence from two (bucket, p) histograms.
    * Buckets missing on one side enter at the `eps` floor (the standard
    * PSI smoothing — without it one empty bucket sends the metric to
    * infinity). Returns ONE row: (psi, jsd), unrounded (callers round).
    *
    * PSI  = Σ (q - p) · ln(q / p)        [q = current, p = reference]
    * JSD  = ½ Σ p · ln(p / m) + ½ Σ q · ln(q / m),  m = (p + q) / 2
    *
    * JSD is computed over eps-floored, UNRENORMALIZED proportions — the
    * operational monitoring form (bounded, symmetric, 0 iff identical),
    * which both engines replay identically; it is within O(eps) of the
    * renormalized textbook value.
    */
  def compare(refHist: DataFrame, curHist: DataFrame,
      eps: Double = 1e-6): DataFrame = {
    val p = refHist.select(col("bucket"), col("p").as("p_ref"))
    val q = curHist.select(col("bucket"), col("p").as("p_cur"))
    p.join(q, Seq("bucket"), "full_outer")
      .select(
        greatest(coalesce(col("p_ref"), lit(0.0)), lit(eps)).as("p"),
        greatest(coalesce(col("p_cur"), lit(0.0)), lit(eps)).as("q"))
      .agg(
        sum((col("q") - col("p")) * log(col("q") / col("p"))).as("psi"),
        (sum(col("p") * log(col("p") * lit(2.0) / (col("p") + col("q"))))
          * 0.5 +
          sum(col("q") * log(col("q") * lit(2.0) / (col("p") + col("q"))))
            * 0.5).as("jsd"))
  }

  /** Numeric drift in one call: edges from the reference, a histogram per
    * side, the metric row. `(psi, jsd)` doubles, unrounded.
    */
  def numericDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      nBuckets: Int = 10, eps: Double = 1e-6): DataFrame = {
    val edges = quantileEdges(ref, valueCol, nBuckets)
    compare(histogram(ref, valueCol, edges),
      histogram(cur, valueCol, edges), eps)
  }

  /** Categorical drift in one call. `(psi, jsd)` doubles, unrounded. */
  def categoricalDrift(ref: DataFrame, cur: DataFrame, catCol: String,
      eps: Double = 1e-6): DataFrame =
    compare(categoricalHistogram(ref, catCol),
      categoricalHistogram(cur, catCol), eps)
}
