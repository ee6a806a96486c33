package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust per-group outlier flags via median absolute deviation — the
  * curation-side "this document's length/score is wild for its language"
  * signal. MAD is the robust analog of the z-score pass (`zscore_normalize`
  * uses mean/stddev, which a single 10⁶-token document drags arbitrarily
  * far; the median pair moves by at most one rank).
  *
  * Exactness: `percentile` is Spark's EXACT interpolated percentile (the
  * same two-middle-ranks interpolation DuckDB's `median` uses), so on
  * integer inputs both engines produce the identical x.0/x.5 double and
  * the flag comparison is bit-stable. The strict `>` keeps the boundary
  * deterministic.
  *
  * Shape at scale: both percentile windows share the group-key partition
  * spec — ONE hash exchange, two Window nodes (spec-audited). Exact
  * percentile buffers the group's values; at 100 TB swap in
  * `percentile_approx` (same call shape, rank-error-bounded) — the
  * `length_trim_stats` precedent.
  */
object Robust {

  def madOutliers(df: DataFrame, groupCol: String, valueCol: Column,
      k: Double = 3.0): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
    df.withColumn("__v", valueCol.cast("double"))
      .withColumn("med", percentile(col("__v"), lit(0.5)).over(w))
      .withColumn("dev", abs(col("__v") - col("med")))
      .withColumn("mad", percentile(col("dev"), lit(0.5)).over(w))
      .withColumn("is_outlier", col("dev") > lit(k) * col("mad"))
      .drop("__v", "dev")
  }
}
