package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative one-pass data-quality expectations (the deequ / Delta-
  * constraint posture): a suite of named checks, each a METRIC (an
  * aggregate expression over the table) plus an allowed [lo, hi] band,
  * evaluated in a SINGLE aggregation pass and reported as one row per
  * check — (check_name, metric, lo, hi, passed).
  *
  * Why an engine needs this: a 100 TB ingest without machine-checked
  * contracts (completeness, key uniqueness, domain conformance, bounds)
  * discovers its upstream bugs in the loss curve. The single-pass design
  * is the point at scale — N checks cost ONE table scan (deequ's core
  * claim), not N; every metric is an algebraic or sketchable aggregate, so
  * the same suite runs as one map-side-partial aggregation on a cluster.
  *
  * The pass/fail verdict is computed from the 6-decimal-rounded metric, so
  * the verdict an oracle replays is a pure function of values both engines
  * agree on bit-for-bit.
  */
object Expectations {

  /** One expectation: `metric` must land in [lo, hi] (inclusive). */
  final case class Check(name: String, metric: Column, lo: Double,
      hi: Double) {
    require(name.matches("[A-Za-z0-9_]+"),
      s"check name must be an identifier, got '$name'")
  }

  /** Fraction of rows where `c` is non-NULL (deequ Completeness). */
  def completeness(c: String): Column =
    avg(when(col(c).isNull, 0.0).otherwise(1.0))

  /** Distinct ratio of `c`: 1.0 iff the column is a key (deequ
    * Uniqueness-as-distinctness; exact count_distinct — the 100 TB drop-in
    * is approx_count_distinct under the `approx_distinct_check` tolerance
    * posture).
    */
  def uniqueness(c: String): Column =
    // nullif-guarded divisor: on an EMPTY table 0/0 throws under ANSI —
    // the metric must come back NULL (and the coalesced verdict false),
    // not crash the whole suite
    count_distinct(col(c)).cast("double") /
      nullif(count(lit(1)), lit(0L)).cast("double")

  /** Fraction of rows satisfying `cond`; a NULL condition counts as
    * failing (the [[graft.queries.Contracts.forAll]] NULL discipline).
    */
  def conformance(cond: Column): Column =
    avg(when(coalesce(cond, lit(false)), 1.0).otherwise(0.0))

  /** Evaluate the suite in one aggregation pass. Output: one row per
    * check, (check_name, metric, lo, hi, passed), in suite order —
    * `metric` rounded to 6 decimals, `passed` computed from the rounded
    * value.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    val agged = df.agg(
      checks.head.metric.cast("double").as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.metric.cast("double").as(s"m${i + 1}")
      }: _*)
    unpivot(agged, checks, Nil)
  }

  /** The suite evaluated PER GROUP in the same single pass — the
    * per-source / per-language / per-partition gate a heterogeneous 100 TB
    * ingest actually runs (one global verdict hides a broken source inside
    * healthy aggregate numbers). One `groupBy(groupCol)` aggregation (map-
    * side partial), then the same stack unpivot; output
    * (groupCol, check_name, metric, lo, hi, passed).
    */
  def runGrouped(df: DataFrame, groupCol: String,
      checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "empty expectation suite")
    require(groupCol.matches("[A-Za-z0-9_]+"),
      s"group column must be an identifier, got '$groupCol'")
    val agged = df.groupBy(col(groupCol)).agg(
      checks.head.metric.cast("double").as("m0"),
      checks.tail.zipWithIndex.map { case (c, i) =>
        c.metric.cast("double").as(s"m${i + 1}")
      }: _*)
    unpivot(agged, checks, Seq(groupCol))
  }

  /** One generated row per check — the driver never sees the metrics;
    * the plan is scan → agg → generate. Built from TYPED literal columns
    * (never SQL-string splicing): a ±Infinity bound — the natural way to
    * say "no lower bound" — must stay a valid double literal, where
    * string interpolation would emit unparseable SQL.
    */
  private def unpivot(agged: DataFrame, checks: Seq[Check],
      keep: Seq[String]): DataFrame = {
    val rows = checks.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c.name).as("check_name"),
        (floor(col(s"m$i") * 1e6 + 0.5) / 1e6).as("metric"),
        lit(c.lo).as("lo"), lit(c.hi).as("hi"))
    }
    agged
      .select(keep.map(col) :+ explode(array(rows: _*)).as("_c"): _*)
      .select(keep.map(col) ++ Seq(col("_c.check_name"), col("_c.metric"),
        col("_c.lo"), col("_c.hi")): _*)
      // an EMPTY table aggregates avg-based metrics to NULL, making the
      // band test NULL — coalesce to false so a vanished ingest fails
      // loudly instead of slipping past a `passed === false` filter
      .withColumn("passed",
        coalesce(col("metric") >= col("lo") && col("metric") <= col("hi"),
          lit(false)))
  }
}
